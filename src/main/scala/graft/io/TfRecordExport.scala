package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TFRecord shard sink + reader — the training-data container the TF /
  * JAX data stacks consume, implemented from the PUBLIC specs only:
  *
  *  - framing (TensorFlow's tfrecord format): per record
  *    `[length u64 LE][masked crc32c(length) u32 LE][data bytes]
  *    [masked crc32c(data) u32 LE]`, with
  *    `mask(crc) = ((crc >>> 15) | (crc << 17)) + 0xa282ead8` in u32
  *    arithmetic (the published Snappy/TF masking);
  *  - payload: a hand-encoded `tf.train.Example` protobuf
  *    (feature.proto / example.proto wire format): Example.features(1) →
  *    Features.feature(1) map entries (key(1)=string, value(2)=Feature),
  *    Feature.bytes_list(1) for UTF8 columns and Feature.int64_list(3)
  *    with PACKED values (proto3 default) for BIGINT columns.
  *
  * Type surface deliberately narrow and loud — BIGINT and UTF8 (ids,
  * text, token streams: the manifest shapes) — anything else refuses
  * with the column name. NULL round-trips by the protobuf convention:
  * a null value simply OMITS the feature; the reader yields null for an
  * absent key. Overwrite semantics are the [[ArrowExport]] contract:
  * stale shards cleared up front, attempt-unique temp names, atomic
  * rename. The reader VERIFIES both CRCs per record and refuses loudly
  * on corruption.
  *
  * Scale shape: embarrassingly parallel — one shard per partition with
  * no shuffle (callers pick layout via repartition), reads distribute
  * one shard per task.
  */
object TfRecordExport {

  private val Mask = 0xa282ead8

  private def crc32c(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, 0, bytes.length)
    c.getValue.toInt
  }

  private def masked(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + Mask

  // ---- minimal protobuf wire helpers (public encoding) ----

  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def lenDelimited(out: java.io.ByteArrayOutputStream, tag: Int,
      body: Array[Byte]): Unit = {
    out.write(tag)
    varint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  private def featureBytes(dt: DataType, row: Row, c: Int): Array[Byte] = {
    val inner = new java.io.ByteArrayOutputStream()
    dt match {
      case LongType =>
        val packed = new java.io.ByteArrayOutputStream()
        varint(packed, row.getLong(c))
        val list = new java.io.ByteArrayOutputStream()
        lenDelimited(list, 0x0a, packed.toByteArray) // Int64List.value packed
        lenDelimited(inner, 0x1a, list.toByteArray)  // Feature.int64_list = 3
      case StringType =>
        val list = new java.io.ByteArrayOutputStream()
        lenDelimited(list, 0x0a,
          row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        lenDelimited(inner, 0x0a, list.toByteArray)  // Feature.bytes_list = 1
      case other => throw new IllegalArgumentException(
        s"TfRecordExport supports BIGINT/UTF8 columns; got ${other.catalogString}")
    }
    inner.toByteArray
  }

  /** One row → tf.train.Example bytes (null columns omit their feature). */
  private[graft] def exampleBytes(schema: StructType, row: Row): Array[Byte] = {
    val features = new java.io.ByteArrayOutputStream()
    var c = 0
    while (c < schema.length) {
      if (!row.isNullAt(c)) {
        val entry = new java.io.ByteArrayOutputStream()
        lenDelimited(entry, 0x0a,
          schema.fields(c).name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        lenDelimited(entry, 0x12, featureBytes(schema.fields(c).dataType, row, c))
        lenDelimited(features, 0x0a, entry.toByteArray) // Features.feature entry
      }
      c += 1
    }
    val example = new java.io.ByteArrayOutputStream()
    lenDelimited(example, 0x0a, features.toByteArray)   // Example.features = 1
    example.toByteArray
  }

  private def validate(schema: StructType): Unit = schema.fields.foreach { f =>
    f.dataType match {
      case LongType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"TfRecordExport supports BIGINT/UTF8 columns; '${f.name}' is ${other.catalogString}")
    }
  }

  /** Write one TFRecord shard per partition under `path`; returns the
    * manifest (shard, rows, bytes). Stale `*.tfrecord` files are
    * cleared first (the ArrowExport overwrite contract). */
  def writeShards(df: DataFrame, path: String): DataFrame = {
    val schema = df.schema
    validate(schema)
    val dir = new java.io.File(path)
    dir.mkdirs()
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".tfrecord") || f.getName.contains(".tfrecord.tmp-"))
      .foreach { stale =>
        require(stale.delete(), s"could not delete stale shard ${stale.getPath}")
      }
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val file = new java.io.File(path, f"part-$pid%05d.tfrecord")
      val tmp = new java.io.File(path, f"part-$pid%05d.tfrecord.tmp-${tc.taskAttemptId()}")
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp))
      var total = 0L
      try {
        rows.foreach { r =>
          val data = exampleBytes(schema, r)
          val lenBuf = java.nio.ByteBuffer.allocate(8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(data.length.toLong).array()
          val w32 = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.write(lenBuf)
          out.write(w32.putInt(0, masked(crc32c(lenBuf))).array())
          out.write(data)
          out.write(w32.putInt(0, masked(crc32c(data))).array())
          total += 1
        }
      } finally out.close()
      java.nio.file.Files.move(
        tmp.toPath, file.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Iterator((file.getPath, total, file.length()))
    }.toDF("shard", "rows", "bytes")
  }

  // ---- minimal protobuf wire parser (enough for Example) ----

  /** Parse length-delimited submessages of `bytes`: returns (fieldNo,
    * slice) for every len-delimited field, and (fieldNo, varint) rows
    * via the value callback. Only wire types 0 and 2 appear in Example. */
  private def walk(bytes: Array[Byte], from: Int, to: Int)(
      onLen: (Int, Int, Int) => Unit)(onVarint: (Int, Long) => Unit): Unit = {
    var i = from
    while (i < to) {
      var key = 0L
      var shift = 0
      var b = 0
      do {
        b = bytes(i) & 0xff; i += 1
        key |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      val field = (key >>> 3).toInt
      (key & 7L) match {
        case 0L =>
          var v = 0L; shift = 0
          do {
            b = bytes(i) & 0xff; i += 1
            v |= (b & 0x7fL) << shift; shift += 7
          } while ((b & 0x80) != 0)
          onVarint(field, v)
        case 2L =>
          var len = 0L; shift = 0
          do {
            b = bytes(i) & 0xff; i += 1
            len |= (b & 0x7fL) << shift; shift += 7
          } while ((b & 0x80) != 0)
          onLen(field, i, i + len.toInt)
          i += len.toInt
        case wt => throw new IllegalArgumentException(
          s"unsupported protobuf wire type $wt in Example payload")
      }
    }
  }

  /** Decode one Example into (name → value) for the expected schema:
    * LONG from int64_list (packed or unpacked), STRING from bytes_list. */
  private[graft] def decodeExample(schema: StructType, data: Array[Byte]): Row = {
    val byName = new java.util.HashMap[String, Any]()
    walk(data, 0, data.length) { (f1, s1, e1) =>
      if (f1 == 1) walk(data, s1, e1) { (f2, s2, e2) => // Features.feature entries
        if (f2 == 1) {
          var key: String = null
          var vLong: java.lang.Long = null
          var vStr: String = null
          walk(data, s2, e2) { (f3, s3, e3) =>
            if (f3 == 1) key = new String(data, s3, e3 - s3,
              java.nio.charset.StandardCharsets.UTF_8)
            else if (f3 == 2) walk(data, s3, e3) { (f4, s4, e4) => // Feature oneof
              if (f4 == 3) walk(data, s4, e4) { (f5, s5, e5) => // Int64List packed
                if (f5 == 1) {
                  var i = s5
                  while (i < e5) {
                    var v = 0L; var shift = 0; var b = 0
                    do { b = data(i) & 0xff; i += 1; v |= (b & 0x7fL) << shift; shift += 7 }
                    while ((b & 0x80) != 0)
                    if (vLong == null) vLong = v // first value wins
                  }
                }
              } { (f5, v) => if (f5 == 1 && vLong == null) vLong = v } // unpacked
              else if (f4 == 1) walk(data, s4, e4) { (f5, s5, e5) => // BytesList
                if (f5 == 1 && vStr == null)
                  vStr = new String(data, s5, e5 - s5,
                    java.nio.charset.StandardCharsets.UTF_8)
              } { (_, _) => () }
            } { (_, _) => () }
          } { (_, _) => () }
          if (key != null)
            byName.put(key, if (vLong != null) vLong else vStr)
        }
      } { (_, _) => () }
    } { (_, _) => () }
    Row(schema.fields.map { f =>
      val v = byName.get(f.name)
      (f.dataType, v) match {
        case (_, null) => null
        case (LongType, l: java.lang.Long) => l
        case (StringType, s: String) => s
        case (dt, other) => throw new IllegalArgumentException(
          s"feature '${f.name}' decoded as ${other.getClass.getSimpleName}, " +
            s"schema expects ${dt.catalogString}")
      }
    }.toSeq: _*)
  }

  /** Read [[writeShards]] output back, VERIFYING both masked CRCs per
    * record; one shard per task. */
  def readShards(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    validate(schema)
    val files = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tfrecord")).map(_.getPath).sorted
    require(files.nonEmpty, s"no .tfrecord shards under $path")
    val rdd = spark.sparkContext
      .parallelize(files.toSeq, files.length)
      .flatMap { f =>
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
        val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (buf.remaining() > 0) {
          require(buf.remaining() >= 12, s"truncated record header in $f")
          val lenBytes = new Array[Byte](8)
          buf.get(lenBytes)
          val lenCrc = buf.getInt
          require(lenCrc == masked(crc32c(lenBytes)),
            s"length CRC mismatch in $f at offset ${buf.position() - 12}")
          val len = java.nio.ByteBuffer.wrap(lenBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          require(len >= 0 && len <= buf.remaining() - 4, s"corrupt record length $len in $f")
          val data = new Array[Byte](len.toInt)
          buf.get(data)
          val dataCrc = buf.getInt
          require(dataCrc == masked(crc32c(data)),
            s"data CRC mismatch in $f at offset ${buf.position() - 4 - len}")
          out += decodeExample(schema, data)
        }
        out.iterator
      }
    spark.createDataFrame(rdd, schema)
  }
}
