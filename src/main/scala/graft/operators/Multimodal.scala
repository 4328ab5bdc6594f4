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

  // --- T11c / q152: deterministic image-binarization twin ----------------
  // The last reference computation with no engine analog
  // (PRESERVE-FOCUS.ipynb cells 3-6: grayscale threshold + morphological
  // opening + connected-component blob filter before Textract). The
  // codec-free twin runs the EXACT pipeline on a synthesized grayscale
  // grid derived from the T11 payload bytes: threshold -> erosion ->
  // dilation (cross structuring element, zero-padded borders) ->
  // 4-connectivity components -> keep blobs >= MinBlobPx. Per-image
  // imperative work in the mapPartitions codec slot (row-local, no
  // shuffle — the q51 discipline); DuckDB replays the same byte
  // arithmetic with a recursive-CTE closure for the components (the q55
  // pattern), so the blob semantics are oracle-checked end to end.

  val GridW = 16
  val MaxPix = 256
  val FgThresh = 100 // on the position-mixed pixel value, ~39% density
  val MinBlobPx = 4

  /** Grayscale stub: pixel value mixes the payload byte with its
    * position so the fg mask is spatially varied at a sub-percolation
    * density (components stay small and opening is non-trivial).
    */
  private def pixelValue(b: Int, i: Int): Int = (b * 131 + i * 17) % 256

  /** (w, h, n_fg, n_open, n_blobs, n_kept, kept_px) per payload. */
  def binarizeStub(payload: Array[Byte]): (Int, Int, Int, Int, Int, Int, Int) = {
    val npix = (math.min(MaxPix, payload.length) / GridW) * GridW
    val h = npix / GridW
    if (npix == 0) return (GridW, 0, 0, 0, 0, 0, 0)
    val fg = new Array[Boolean](npix)
    var i = 0
    var nFg = 0
    while (i < npix) {
      if (pixelValue(payload(i) & 0xff, i) < FgThresh) { fg(i) = true; nFg += 1 }
      i += 1
    }
    def at(a: Array[Boolean], r: Int, c: Int): Boolean =
      r >= 0 && r < h && c >= 0 && c < GridW && a(r * GridW + c)
    // erosion then dilation with the 4-neighbor cross, zero-padded
    val er = new Array[Boolean](npix)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < GridW) {
        er(r * GridW + c) = at(fg, r, c) && at(fg, r - 1, c) &&
          at(fg, r + 1, c) && at(fg, r, c - 1) && at(fg, r, c + 1)
        c += 1
      }
      r += 1
    }
    val op = new Array[Boolean](npix)
    var nOpen = 0
    r = 0
    while (r < h) {
      var c = 0
      while (c < GridW) {
        val v = at(er, r, c) || at(er, r - 1, c) || at(er, r + 1, c) ||
          at(er, r, c - 1) || at(er, r, c + 1)
        if (v) { op(r * GridW + c) = true; nOpen += 1 }
        c += 1
      }
      r += 1
    }
    // 4-connectivity components over the opened mask (BFS)
    val seen = new Array[Boolean](npix)
    val stack = new java.util.ArrayDeque[Int]()
    var nBlobs = 0
    var nKept = 0
    var keptPx = 0
    i = 0
    while (i < npix) {
      if (op(i) && !seen(i)) {
        nBlobs += 1
        var size = 0
        seen(i) = true
        stack.push(i)
        while (!stack.isEmpty) {
          val p = stack.pop()
          size += 1
          val pr = p / GridW; val pc = p % GridW
          Seq((pr - 1, pc), (pr + 1, pc), (pr, pc - 1), (pr, pc + 1))
            .foreach { case (nr, nc) =>
              if (nr >= 0 && nr < h && nc >= 0 && nc < GridW) {
                val q = nr * GridW + nc
                if (op(q) && !seen(q)) { seen(q) = true; stack.push(q) }
              }
            }
        }
        if (size >= MinBlobPx) { nKept += 1; keptPx += size }
      }
      i += 1
    }
    (GridW, h, nFg, nOpen, nBlobs, nKept, keptPx)
  }

  val binarizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("n_fg", IntegerType),
    StructField("n_open", IntegerType),
    StructField("n_blobs", IntegerType),
    StructField("n_kept", IntegerType),
    StructField("kept_px", IntegerType)
  ))

  def q152Binarize(s: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 === 0) // q51's image/png slice
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val enc = RowEncoder.encoderFor(binarizeSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, nFg, nOpen, nBlobs, nKept, keptPx) =
          binarizeStub(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, h, nFg, nOpen, nBlobs, nKept, keptPx)
      }
    }(enc).orderBy("doc_id")
  }

  val q152Sql: String = {
    // pixel grid from the hex payload (the q51 byte extraction), then
    // the same threshold/erosion/dilation joins and a recursive-CTE
    // transitive closure for 4-connectivity components (the q55 shape)
    s"""WITH RECURSIVE px AS MATERIALIZED (
       | SELECT doc_id, i - 1 AS idx,
       |  ((i - 1) // $GridW) AS r, ((i - 1) % $GridW) AS c,
       |  ((16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
       |     + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) * 131
       |    + (i - 1) * 17) % 256 < $FgThresh AS fg
       | FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents
       |       WHERE doc_id % 3 = 0),
       |  UNNEST(range(1, ((LEAST($MaxPix, length(hx) // 2) // $GridW) * $GridW) + 1)) AS u(i)
       |), er AS MATERIALIZED (
       | SELECT p.doc_id, p.idx, p.r, p.c,
       |  p.fg AND COALESCE(up.fg, FALSE) AND COALESCE(dn.fg, FALSE)
       |       AND COALESCE(lf.fg, FALSE) AND COALESCE(rt.fg, FALSE) AS e
       | FROM px p
       | LEFT JOIN px up ON up.doc_id = p.doc_id AND up.r = p.r - 1 AND up.c = p.c
       | LEFT JOIN px dn ON dn.doc_id = p.doc_id AND dn.r = p.r + 1 AND dn.c = p.c
       | LEFT JOIN px lf ON lf.doc_id = p.doc_id AND lf.r = p.r AND lf.c = p.c - 1
       | LEFT JOIN px rt ON rt.doc_id = p.doc_id AND rt.r = p.r AND rt.c = p.c + 1
       |), op AS MATERIALIZED (
       | SELECT p.doc_id, p.idx, p.r, p.c,
       |  (p.e OR COALESCE(up.e, FALSE) OR COALESCE(dn.e, FALSE)
       |       OR COALESCE(lf.e, FALSE) OR COALESCE(rt.e, FALSE)) AS o
       | FROM er p
       | LEFT JOIN er up ON up.doc_id = p.doc_id AND up.r = p.r - 1 AND up.c = p.c
       | LEFT JOIN er dn ON dn.doc_id = p.doc_id AND dn.r = p.r + 1 AND dn.c = p.c
       | LEFT JOIN er lf ON lf.doc_id = p.doc_id AND lf.r = p.r AND lf.c = p.c - 1
       | LEFT JOIN er rt ON rt.doc_id = p.doc_id AND rt.r = p.r AND rt.c = p.c + 1
       |), opx AS MATERIALIZED (
       | SELECT doc_id, idx, r, c FROM op WHERE o
       |), edges AS MATERIALIZED (
       | SELECT a.doc_id, a.idx AS src, b.idx AS dst
       | FROM opx a JOIN opx b ON b.doc_id = a.doc_id
       |  AND ((b.r = a.r AND ABS(b.c - a.c) = 1) OR (b.c = a.c AND ABS(b.r - a.r) = 1))
       |), reach(doc_id, idx, rt) AS (
       | SELECT doc_id, idx, idx FROM opx
       | UNION
       | SELECT e.doc_id, e.src, r.rt FROM reach r
       | JOIN edges e ON e.doc_id = r.doc_id AND e.dst = r.idx
       |), comp AS (
       | SELECT doc_id, idx, MIN(rt) AS lbl FROM reach GROUP BY doc_id, idx
       |), blobs AS (
       | SELECT doc_id, lbl, COUNT(*) AS sz FROM comp GROUP BY doc_id, lbl
       |), perdoc AS (
       | SELECT d.doc_id,
       |  COALESCE(f.n_fg, 0) AS n_fg, COALESCE(o.n_open, 0) AS n_open,
       |  COALESCE(b.n_blobs, 0) AS n_blobs, COALESCE(b.n_kept, 0) AS n_kept,
       |  COALESCE(b.kept_px, 0) AS kept_px,
       |  CAST((LEAST($MaxPix, octet_length(encode(d.text))) // $GridW) AS INTEGER) AS h
       | FROM (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0) d
       | LEFT JOIN (SELECT doc_id, COUNT(*) AS n_fg FROM px WHERE fg GROUP BY doc_id) f
       |  ON f.doc_id = d.doc_id
       | LEFT JOIN (SELECT doc_id, COUNT(*) AS n_open FROM opx GROUP BY doc_id) o
       |  ON o.doc_id = d.doc_id
       | LEFT JOIN (SELECT doc_id, COUNT(*) AS n_blobs,
       |    COUNT(*) FILTER (WHERE sz >= $MinBlobPx) AS n_kept,
       |    COALESCE(SUM(sz) FILTER (WHERE sz >= $MinBlobPx), 0) AS kept_px
       |   FROM blobs GROUP BY doc_id) b
       |  ON b.doc_id = d.doc_id
       |)
       |SELECT doc_id, $GridW AS w, h,
       | CAST(n_fg AS INTEGER) AS n_fg, CAST(n_open AS INTEGER) AS n_open,
       | CAST(n_blobs AS INTEGER) AS n_blobs, CAST(n_kept AS INTEGER) AS n_kept,
       | CAST(kept_px AS INTEGER) AS kept_px
       |FROM perdoc ORDER BY doc_id""".stripMargin
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
