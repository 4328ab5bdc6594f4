package graft

/** BPE-trainer scale probe (r15 verdict next-round #1): proves the
  * production trainer (one distributed word-frequency aggregate + a
  * local incremental merge loop, Bpe.trainTokenizer) fits a
  * production-depth vocabulary in minutes at corpus rungs where the
  * per-merge distributed loop (q141: one Spark job + one driver argmax
  * collect PER MERGE) cannot amortize. Reports the two costs the
  * design separates — the corpus-sized aggregate and the model-sized
  * merge loop — so the ladder shows the aggregate scaling with docs
  * while the merge loop scales only with vocabulary.
  *
  * The synthetic generator's vocabulary is ~310 distinct words, so the
  * corpus rungs exhaust the merge space around 400 merges — they prove
  * the AGGREGATE side of the split. The `synth:<vocab>` mode generates
  * a deterministic web-corpus-shaped word table (hash-derived words,
  * Zipf frequencies) and times ONLY the local merge loop at real
  * production depth (32k merges over 100k+ distinct words) — the loop
  * cost depends on vocabulary alone, never on corpus size, which is
  * the entire point of the split.
  *
  * Usage: runMain graft.BpeTrainProbe <sfDir>|synth:<vocab> <merges> [reps]
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val merges = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    if (dir.startsWith("synth:")) {
      val vocab = dir.stripPrefix("synth:").toInt
      // deterministic word table: letters from a multiplicative hash,
      // lengths 4..18, frequency ~ Zipf over the rank
      val words = (0 until vocab).map { i =>
        var h = i.toLong * 0x9E3779B97F4A7C15L + 1442695040888963407L
        def next(): Int = { h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 29; (h & 0x7FFFFFFF).toInt }
        val len = 4 + next() % 15
        val sb = new StringBuilder(len)
        (0 until len).foreach(_ => sb.append(('a' + next() % 26).toChar))
        (sb.toString, math.max(1L, (vocab.toLong * 10) / (i + 1)))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq.sortBy(_._1)
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val m = graft.functions.BpeCodec.trainLocalFast(words, merges)
        (m.size, (System.nanoTime() - t0) / 1e9)
      }
      println("=====BPETRAINPROBE=====")
      println(s"""{"mode":"synth","vocab_words":${words.size},""" +
        s""""merges_requested":$merges,"merges_fit":${walls.head._1},""" +
        s""""merge_loop_s":[${walls.map(w => f(w._2)).mkString(",")}]}""")
      return
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession(s"local[$cpus]", cpus)
    import org.apache.spark.sql.functions._

    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val wf = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val t1 = System.nanoTime()
      val m = graft.functions.BpeCodec.trainLocalFast(wf, merges)
      val t2 = System.nanoTime()
      (wf.size, m.size, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

    println("=====BPETRAINPROBE=====")
    println(s"""{"dir":"$dir","merges_requested":$merges,"reps":$reps,""" +
      s""""vocab_words":${walls.head._1},"merges_fit":${walls.head._2},""" +
      s""""wordfreq_agg_s":[${walls.map(w => f(w._3)).mkString(",")}],""" +
      s""""merge_loop_s":[${walls.map(w => f(w._4)).mkString(",")}]}""")
    spark.stop()
  }
}
