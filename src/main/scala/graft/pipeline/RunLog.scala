package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneId}

/** Timestamped run-log sink — the reference's `setup_logging`
  * (`src/utils.py:48-67`) re-expressed: a `logs/` directory created on
  * demand and every line written to BOTH the console and a per-run
  * timestamped file in the `asctime | LEVEL | message` format. Driver-side
  * orchestration logging only (pipeline start/finish/fail, upload
  * throughput) — executor-side work never funnels through this (that
  * would serialize a driver handle into tasks); Spark's own event log is
  * the executor story.
  */
final class RunLog private (val path: Path, echo: Boolean) extends AutoCloseable {
  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss,SSS").withZone(ZoneId.systemDefault())
  private val out = Files.newBufferedWriter(path,
    StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def write(level: String, msg: String): Unit = synchronized {
    val line = s"${fmt.format(Instant.now())} | $level | $msg"
    out.write(line); out.newLine(); out.flush()
    if (echo) Console.out.println(line)
  }

  def info(msg: String): Unit = write("INFO", msg)
  def error(msg: String): Unit = write("ERROR", msg)

  override def close(): Unit = synchronized(out.close())
}

object RunLog {
  /** `logs/graft_etl_<yyyyMMdd_HHmmss>.log` under `dir`, directories
    * created as needed — one file per run, append mode (the reference's
    * `FileHandler(..., mode="a")`). */
  def timestamped(dir: String, echo: Boolean = true): RunLog = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val stamp = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(ZoneId.systemDefault()).format(Instant.now())
    new RunLog(d.resolve(s"graft_etl_$stamp.log"), echo)
  }
}
