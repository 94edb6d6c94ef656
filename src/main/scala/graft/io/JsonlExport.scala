package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) export — the interchange format LLM
  * training stacks actually consume (one JSON object per line; a shard =
  * a part file). The engine side is a single narrow projection:
  * `to_json(struct(*))` rendered by Catalyst's codegen'd JSON writer, then
  * a text write — no driver formatting, no UDFs.
  *
  * Scale posture: shard count IS the write parallelism. The default keeps
  * the frame's own partitioning (a 1000-executor job writes 1000-way);
  * `shards = n` round-robin-repartitions to exactly n part files for
  * loaders that want fixed shard counts — a full shuffle, priced and
  * explicit, never implicit. Compression is a codec option on the text
  * sink (`gzip`/`snappy`/none), applied per shard so decompression
  * parallelism survives.
  *
  * Timestamps render in ISO-8601 with an explicit UTC pin so shards are
  * byte-identical regardless of executor timezone.
  */
object JsonlExport {

  /** Write `df` as JSONL under `path` (a directory of part files). */
  def write(
      df: DataFrame, path: String,
      shards: Option[Int] = None, codec: Option[String] = None): Unit = {
    val sharded = shards.fold(df)(n => df.repartition(n))
    val line = to_json(
      struct(sharded.columns.map(col).toIndexedSeq: _*),
      Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        "timeZone" -> "UTC"))
    val w = sharded.select(line.as("value")).write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).text(path)
  }

  /** Read JSONL back with an explicit schema (training manifests are
    * contract-first; schema inference would silently widen or drop). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Streaming JSONL writer: the same one-line-per-record projection over
    * a STREAMING frame, handed to the exactly-once file sink (per-batch
    * atomic commit via the checkpoint's write-ahead log — replays after
    * failure never duplicate a shard). Caller starts it:
    * `streamWriter(df, ckpt).trigger(...).start(path)` — the sink
    * path stays a normal JSONL directory any batch reader consumes. */
  def streamWriter(
      df: DataFrame, checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val line = to_json(
      struct(df.columns.map(col).toIndexedSeq: _*),
      Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        "timeZone" -> "UTC"))
    df.select(line.as("value")).writeStream
      .format("text")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
  }
}
