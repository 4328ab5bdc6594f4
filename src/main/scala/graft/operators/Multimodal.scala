package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal binary-column plumbing (SURVEY.md §2.3 T11).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside. The decode/feature step runs per PARTITION
  * (mapPartitions — the Scala analog of mapInPandas batch processing):
  * one decoder instantiation per partition, streaming over rows, so at
  * 100 TB the decoder setup cost amortizes and memory stays bounded by
  * one row-batch.
  *
  * The actual media decode is STUBBED deterministically (this container
  * has no image/audio codecs — see the brief): `decodeStub` derives
  * "features" from the payload bytes alone, so the schema / partition /
  * batch plumbing is real and testable while the codec is swappable.
  */
object Multimodal {

  /** Deterministic stand-in for a real media decoder. */
  def decodeStub(payload: Array[Byte]): (Int, Double, Long) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      i += 1
    }
    val meanByte =
      if (payload.isEmpty) 0.0
      else {
        var s = 0L; var j = 0
        while (j < payload.length) { s += payload(j) & 0xff; j += 1 }
        s.toDouble / payload.length
      }
    (payload.length, meanByte, checksum)
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("checksum", LongType)
  ))

  // T11: binary payload + metadata struct → per-partition batch "decode"
  // → flat feature table. Oracle-checked: the deterministic stub is pure
  // byte arithmetic, so DuckDB recomputes it from hex(encode(text)) —
  // the wrapping int64 checksum via a HUGEINT fold mod 2^64 mapped back
  // to signed.
  def q51MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    // synthesize the multimodal table: payload = utf8 bytes of text,
    // metadata struct derived deterministically from doc_id
    val media = d.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        (col("doc_id") % 1920 + 1).cast(IntegerType).as("width"),
        (col("doc_id") % 1080 + 1).cast(IntegerType).as("height")
      ).as("meta"))
    val enc = RowEncoder.encoderFor(outputSchema)
    val decoded = media.mapPartitions { rows =>
      // per-partition decoder lifecycle: init once, stream rows
      rows.map { r =>
        val docId = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val meta = r.getStruct(2)
        val (nBytes, meanByte, checksum) = decodeStub(payload)
        Row(docId, meta.getString(0), meta.getInt(1), meta.getInt(2),
          nBytes, meanByte, checksum)
      }
    }(enc)
    decoded.orderBy("doc_id")
  }

  /** Fixed "frame" size for the video payload sampler (q98). */
  val FrameBytes = 256

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("checksum", LongType)
  ))

  // T11b: FRAME SAMPLING — the video half of the multimodal brief. A
  // video payload is a sequence of fixed-size frames; sample every
  // stride-th frame (stride varies per doc, standing in for fps-aware
  // sampling) and stub-decode each sampled frame per partition. The
  // frame EXPLOSION is declarative (sequence + slice — output-sized, no
  // UDF in the row-multiplying step); only the per-frame decode runs in
  // mapPartitions with the swappable codec. Oracle-checked: DuckDB
  // recomputes the same slices from the hex payload and the same stub
  // arithmetic per frame.
  def q98FrameSample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val media = d.filter(col("doc_id") % 3 === 2) // q51's video/mp4 slice
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 5 + 1).cast(LongType).as("stride"))
    val nFrames = greatest(
      ceil(octet_length(col("payload")).cast(DoubleType) / FrameBytes).cast(LongType),
      lit(1L))
    val frames = media
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), nFrames - 1, col("stride"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        col("payload").substr(
          (col("frame_idx") * FrameBytes + 1).cast(IntegerType),
          lit(FrameBytes)).as("frame"))
    val enc = RowEncoder.encoderFor(frameSchema)
    frames.mapPartitions { rows =>
      rows.map { r =>
        val (nBytes, meanByte, checksum) = decodeStub(r.getAs[Array[Byte]](2))
        Row(r.getLong(0), r.getLong(1), nBytes, meanByte, checksum)
      }
    }(enc).orderBy("doc_id", "frame_idx")
  }

  val q98Sql: String = {
    val two64 = "18446744073709551616::HUGEINT"
    val two63 = "9223372036854775808::HUGEINT"
    s"""SELECT doc_id, frame_idx, n_bytes,
       | CASE WHEN n_bytes = 0 THEN 0.0
       |      ELSE CAST(list_sum(bs) AS DOUBLE) / n_bytes END AS mean_byte,
       | CAST(CASE WHEN cs >= $two63 THEN cs - $two64 ELSE cs END AS BIGINT) AS checksum
       |FROM (
       | SELECT doc_id, frame_idx, n_bytes, bs,
       |  list_reduce(list_prepend(CAST(0 AS HUGEINT), bs),
       |   (acc, x) -> (acc * 31 + x) % $two64) AS cs
       | FROM (
       |  SELECT doc_id, frame_idx, CAST(length(fhx) // 2 AS INTEGER) AS n_bytes,
       |   list_transform(range(1, (length(fhx) // 2) + 1),
       |    i -> 16 * (strpos('0123456789ABCDEF', substr(fhx, 2*i-1, 1)) - 1)
       |         + strpos('0123456789ABCDEF', substr(fhx, 2*i, 1)) - 1) AS bs
       |  FROM (
       |   SELECT doc_id, frame_idx,
       |    substr(hx, CAST(frame_idx * ${2 * FrameBytes} + 1 AS BIGINT),
       |      ${2 * FrameBytes}) AS fhx
       |   FROM (
       |    SELECT doc_id,
       |     UNNEST(range(0,
       |       GREATEST(CAST(CEIL(CAST(length(hx) // 2 AS DOUBLE) / $FrameBytes) AS BIGINT), 1),
       |       1 + doc_id % 5)) AS frame_idx,
       |     hx
       |    FROM (SELECT doc_id, hex(encode(text)) AS hx
       |          FROM documents WHERE doc_id % 3 = 2)))))
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  val q51Sql: String = {
    val two64 = "18446744073709551616::HUGEINT"
    val two63 = "9223372036854775808::HUGEINT"
    s"""SELECT doc_id, media_type, width, height, n_bytes,
       | CASE WHEN n_bytes = 0 THEN 0.0
       |      ELSE CAST(list_sum(bytes) AS DOUBLE) / n_bytes END AS mean_byte,
       | CAST(CASE WHEN cs >= $two63 THEN cs - $two64 ELSE cs END AS BIGINT) AS checksum
       |FROM (
       | SELECT doc_id, media_type, width, height, n_bytes, bytes,
       |  list_reduce(list_prepend(CAST(0 AS HUGEINT), bytes),
       |   (acc, x) -> (acc * 31 + x) % $two64) AS cs
       | FROM (
       |  SELECT doc_id, media_type, width, height,
       |   CAST(length(hx) // 2 AS INTEGER) AS n_bytes,
       |   list_transform(range(1, (length(hx) // 2) + 1),
       |    i -> 16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
       |         + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS bytes
       |  FROM (
       |   SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
       |         ELSE 'video/mp4' END AS media_type,
       |    CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
       |    CAST(doc_id % 1080 + 1 AS INTEGER) AS height,
       |    hex(encode(text)) AS hx
       |   FROM documents)))
       |ORDER BY doc_id""".stripMargin
  }
}
