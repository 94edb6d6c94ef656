package graft.io

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Arrow IPC STREAM shard sink + reader — the zero-copy interchange
  * format embedding/feature services consume (Spark bundles
  * arrow-vector for its own columnar exchange; this exposes it as an
  * EXPORT surface beside the JSONL and webdataset-TAR sinks). One
  * `.arrows` file per partition, written record-batch-wise so a shard
  * never materializes in memory beyond `batchRows` rows; the manifest
  * comes back as a DataFrame (shard, rows, bytes) — file-count-sized,
  * the bounded-audit shape every export sink here returns.
  *
  * Type surface kept deliberately narrow and loud: BIGINT, DOUBLE, and
  * UTF8 columns (the training-manifest shapes); anything else refuses
  * with the column name rather than writing a shard readers can't
  * round-trip. Nulls round-trip per-value via Arrow validity bits.
  *
  * Scale shape: embarrassingly parallel — per-partition writer with no
  * shuffle (callers choose layout via repartition first), per-partition
  * reader over a file list that distributes one shard per task.
  */
object ArrowExport {

  private def arrowField(f: StructField): Field = f.dataType match {
    case LongType =>
      new Field(f.name, FieldType.nullable(new ArrowType.Int(64, true)), null)
    case DoubleType =>
      new Field(f.name,
        FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    case StringType =>
      new Field(f.name, FieldType.nullable(ArrowType.Utf8.INSTANCE), null)
    case other => throw new IllegalArgumentException(
      s"ArrowExport supports BIGINT/DOUBLE/UTF8 columns; '${f.name}' is ${other.catalogString}")
  }

  /** Write one Arrow IPC stream shard per partition under `path`
    * (created if needed); returns the manifest (shard, rows, bytes).
    *
    * Overwrite semantics: any pre-existing `*.arrows` (and stale
    * `*.arrows.tmp-*`) under `path` is deleted up front — a re-export
    * with fewer partitions must not leave old shards for the globbing
    * reader to silently include. Each task writes to an
    * attempt-unique temp name and atomically renames into place, so a
    * retried/speculative attempt never interleaves bytes with a
    * concurrent one: last rename wins with a complete file either way. */
  def writeShards(df: DataFrame, path: String, batchRows: Int = 4096): DataFrame = {
    require(batchRows >= 1, s"batchRows must be >= 1, got $batchRows")
    val schema = df.schema
    schema.fields.foreach(arrowField) // validate on the driver, loudly
    val dir = new java.io.File(path)
    dir.mkdirs()
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".arrows") || f.getName.contains(".arrows.tmp-"))
      .foreach { stale =>
        require(stale.delete(), s"could not delete stale shard ${stale.getPath}")
      }
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val file = new java.io.File(path, f"part-$pid%05d.arrows")
      val tmp = new java.io.File(path, f"part-$pid%05d.arrows.tmp-${tc.taskAttemptId()}")
      val alloc = new RootAllocator()
      val arrowSchema = new ArrowSchema(schema.fields.map(arrowField).toSeq.asJava)
      val root = VectorSchemaRoot.create(arrowSchema, alloc)
      val fos = new java.io.FileOutputStream(tmp)
      val writer = new ArrowStreamWriter(root, null, java.nio.channels.Channels.newChannel(fos))
      var total = 0L
      try {
        writer.start()
        val batch = new Array[Row](batchRows)
        var n = 0
        def flush(): Unit = if (n > 0) {
          root.setRowCount(n)
          var c = 0
          while (c < schema.length) {
            val vec = root.getVector(c)
            var i = 0
            schema.fields(c).dataType match {
              case LongType =>
                val v = vec.asInstanceOf[BigIntVector]
                while (i < n) {
                  if (batch(i).isNullAt(c)) v.setNull(i)
                  else v.setSafe(i, batch(i).getLong(c))
                  i += 1
                }
              case DoubleType =>
                val v = vec.asInstanceOf[Float8Vector]
                while (i < n) {
                  if (batch(i).isNullAt(c)) v.setNull(i)
                  else v.setSafe(i, batch(i).getDouble(c))
                  i += 1
                }
              case _ =>
                val v = vec.asInstanceOf[VarCharVector]
                while (i < n) {
                  if (batch(i).isNullAt(c)) v.setNull(i)
                  else v.setSafe(i,
                    batch(i).getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
                  i += 1
                }
            }
            c += 1
          }
          writer.writeBatch()
          total += n
          n = 0
        }
        rows.foreach { r =>
          batch(n) = r
          n += 1
          if (n == batchRows) flush()
        }
        flush()
        writer.end()
      } finally {
        writer.close(); fos.close(); root.close(); alloc.close()
      }
      java.nio.file.Files.move(
        tmp.toPath, file.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Iterator((file.getPath, total, file.length()))
    }.toDF("shard", "rows", "bytes")
  }

  /** Read the shards of [[writeShards]] back; `schema` must match what
    * was written (verified against each shard's embedded Arrow schema,
    * loudly). One shard per task via a parallelized file list. */
  def readShards(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    schema.fields.foreach(arrowField)
    val files = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".arrows")).map(_.getPath).sorted
    require(files.nonEmpty, s"no .arrows shards under $path")
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val alloc = new RootAllocator()
        val fis = new java.io.FileInputStream(f)
        val reader = new ArrowStreamReader(fis, alloc)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          val got = reader.getVectorSchemaRoot.getSchema.getFields.asScala
            .map(g => (g.getName, g.getType)).toSeq
          val want = schema.fields.toSeq
            .map(arrowField).map(w => (w.getName, w.getType))
          require(got == want, s"shard $f schema $got != expected $want")
          while (reader.loadNextBatch()) {
            val root = reader.getVectorSchemaRoot
            var i = 0
            while (i < root.getRowCount) {
              val vals = schema.fields.indices.map { c =>
                val vec = root.getVector(c)
                if (vec.isNull(i)) null
                else schema.fields(c).dataType match {
                  case LongType => vec.asInstanceOf[BigIntVector].get(i)
                  case DoubleType => vec.asInstanceOf[Float8Vector].get(i)
                  case _ => new String(vec.asInstanceOf[VarCharVector].get(i),
                    java.nio.charset.StandardCharsets.UTF_8)
                }
              }
              out += Row(vals: _*)
              i += 1
            }
          }
        } finally { reader.close(); fis.close(); alloc.close() }
        out.iterator
      }
    spark.createDataFrame(rdd, schema)
  }
}
