package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}

/** Round-17 operator surface: q45's bounded serve twin and the q152
  * binarization internals the DuckDB oracle can't see (the BFS labeling
  * against a driver-side replay).
  */
class Round17OpsSpec extends GraftSpec {

  test("serveBruteTopK equals batch q45 bit-for-bit and plans without a window") {
    val corpus = Tables.embeddings(spark, sfDir)
    val probes = corpus.filter(col("vec_id") < Similarity.NumProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val serve = Similarity.serveBruteTopK(probes, corpus, excludeSelf = true)
    val got = serve.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Similarity.q45AnnTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want,
      "serve ranking must equal the oracle-checked batch window bit-for-bit " +
        "(including the un-quantized cos doubles)")

    // the serve plan ranks through the mergeable aggregate, not a
    // per-probe window sort (the r16 5M-doc lesson applied to q45)
    val plan = serve.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), "serve path must not window-rank")
    assert(plan.contains("ScoredTopK") || plan.contains("scoredtopk"),
      s"serve path must rank through the bounded aggregate:\n$plan")

    // default keeps a corpus vector whose id collides with a request id:
    // a corpus vector is its own exact-cosine nearest neighbor (cos 1.0)
    val self = Similarity.serveBruteTopK(probes, corpus).collect()
      .filter(r => r.getLong(1) == 1L)
    assert(self.forall(r => r.getLong(0) == r.getLong(2)),
      "non-excluding serve must rank the colliding corpus vector first")
  }

  test("binarizeStub pipeline invariants on adversarial payloads") {
    // opening never adds foreground beyond the threshold mask's
    // dilation; kept blobs are a subset of opened pixels; empty and
    // sub-row payloads produce the zero row
    assert(Multimodal.binarizeStub(Array.emptyByteArray) ===
      ((Multimodal.GridW, 0, 0, 0, 0, 0, 0)))
    assert(Multimodal.binarizeStub("short".getBytes("UTF-8")) ===
      ((Multimodal.GridW, 0, 0, 0, 0, 0, 0)))
    val payloads = Seq(
      "a b c d e f g h i j k l m n o p q r s t u v w x y z 0 1 2 3",
      ("zz " * 200).trim,
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString)
    payloads.foreach { t =>
      val (w, h, nFg, nOpen, nBlobs, nKept, keptPx) =
        Multimodal.binarizeStub(t.getBytes("UTF-8"))
      assert(w === Multimodal.GridW)
      assert(h > 0 && h <= Multimodal.MaxPix / Multimodal.GridW)
      assert(nOpen <= nFg + 4 * nFg, "dilation is bounded by the cross SE")
      assert(nKept <= nBlobs)
      assert(keptPx <= nOpen)
      assert(keptPx >= nKept * Multimodal.MinBlobPx)
    }
    // driver-side replay of one grid: labeling via an independent
    // union-find must count the same blobs as the BFS
    val t = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val bytes = t.getBytes("UTF-8")
    val npix = (math.min(Multimodal.MaxPix, bytes.length) /
      Multimodal.GridW) * Multimodal.GridW
    val hh = npix / Multimodal.GridW
    val fg = (0 until npix).map(i =>
      ((bytes(i) & 0xff) * 131 + i * 17) % 256 < Multimodal.FgThresh)
    def at(a: IndexedSeq[Boolean], r: Int, c: Int) =
      r >= 0 && r < hh && c >= 0 && c < Multimodal.GridW && a(r * Multimodal.GridW + c)
    val er = (0 until npix).map { i =>
      val r = i / Multimodal.GridW; val c = i % Multimodal.GridW
      at(fg, r, c) && at(fg, r - 1, c) && at(fg, r + 1, c) &&
        at(fg, r, c - 1) && at(fg, r, c + 1)
    }
    val op = (0 until npix).map { i =>
      val r = i / Multimodal.GridW; val c = i % Multimodal.GridW
      at(er, r, c) || at(er, r - 1, c) || at(er, r + 1, c) ||
        at(er, r, c - 1) || at(er, r, c + 1)
    }
    // union-find over opened pixels
    val parent = Array.tabulate(npix)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- 0 until npix if op(i)) {
      val r = i / Multimodal.GridW; val c = i % Multimodal.GridW
      Seq((r, c + 1), (r + 1, c)).foreach { case (nr, nc) =>
        if (at(op, nr, nc)) {
          val j = nr * Multimodal.GridW + nc
          parent(find(i)) = find(j)
        }
      }
    }
    val sizes = (0 until npix).filter(op).groupBy(find).values.map(_.size).toSeq
    val (_, _, nFg2, nOpen2, nBlobs2, nKept2, keptPx2) =
      Multimodal.binarizeStub(bytes)
    assert(nFg2 === fg.count(identity))
    assert(nOpen2 === op.count(identity))
    assert(nBlobs2 === sizes.size, "BFS component count must match union-find")
    assert(nKept2 === sizes.count(_ >= Multimodal.MinBlobPx))
    assert(keptPx2 === sizes.filter(_ >= Multimodal.MinBlobPx).sum)
  }
}
