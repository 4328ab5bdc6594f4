package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeCodec
import graft.operators.Bpe

/** BPE family (T42-T44, r14 verdict next-round #1).
  *
  * The frozen merges table and the reference tokenizations below are
  * PINNED LITERALS, independently derived (hand-replayed trainer over
  * the fixture vocabulary): a drift in trainLocal/encode semantics
  * fails here instead of silently re-freezing the table. The oracle
  * gate (q140-q142 vs DuckDB's recursive-CTE replay) proves the
  * cross-engine claim; this spec proves the in-engine semantics.
  */
class BpeSpec extends GraftSpec {

  test("frozen merges table is exactly the pinned fixture-trained literal") {
    val expected = Seq(
      ("e", "r"), ("i", "n"), ("o", "r"), ("o", "w"),
      ("s", "t"), ("a", "l"), ("a", "r"), ("a", "t"),
      ("m", "er"), ("p", "ar"), ("u", "p"), ("a", "b"),
      ("a", "g"), ("a", "m"), ("a", "n"), ("a", "s"))
    assert(BpeCodec.Merges == expected,
      s"frozen table drifted: ${BpeCodec.Merges}")
  }

  test("encode matches reference tokenizations on fixture words") {
    val expected = Map(
      "spark" -> Seq("s", "par", "k"),
      "customer" -> Seq("c", "u", "st", "o", "mer"),
      "window" -> Seq("w", "in", "d", "ow"),
      "stream" -> Seq("st", "r", "e", "am"),
      "the" -> Seq("t", "h", "e"),
      "a" -> Seq("a"),
      "batch" -> Seq("b", "at", "c", "h"),
      "query" -> Seq("q", "u", "er", "y"),
      "vector" -> Seq("v", "e", "c", "t", "or"),
      "value" -> Seq("v", "al", "u", "e"))
    expected.foreach { case (w, toks) =>
      assert(BpeCodec.encode(w).toSeq == toks,
        s"encode($w) = ${BpeCodec.encode(w).toSeq}, expected $toks")
    }
  }

  test("encode round-trips and the SQL surface agrees with the Scala loop") {
    import spark.implicits._
    val adversarial = Seq(
      "spark", "a", "", "sstt", "erer", "ererer", "stream", "परीक्षा",
      "año", "straße", "日本", "x", "aaaa", "minmin", "partpart",
      "😀ok", "e😀r") // surrogate pairs must not shear
    val df = adversarial.toDF("w")
      .select(col("w"),
        call_function("bpe_tokens", col("w")).as("toks"),
        call_function("codepoints", col("w")).as("cps"))
      .collect()
    df.foreach { r =>
      val w = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(toks == BpeCodec.encode(w).toSeq, s"SQL/Scala drift on '$w'")
      assert(toks.mkString == w, s"tokens of '$w' do not concatenate back")
      val cps = r.getSeq[String](2)
      assert(cps.mkString == w &&
        cps.forall(c => c.codePointCount(0, c.length) == 1),
        s"codepoints('$w') wrong: $cps")
    }
  }

  test("bpe_count equals the exploded per-word sum on the corpus") {
    val d = Tables.documents(spark, sfDir)
    val direct = d.select(
      sum(call_function("bpe_count", col("text"))).as("n")).collect()(0).getLong(0)
    val exploded = d
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(sum(size(call_function("bpe_tokens", col("w")))).as("n"))
      .collect()(0).getLong(0)
    assert(direct == exploded, s"bpe_count=$direct vs exploded=$exploded")
    assert(direct > 0)
  }

  test("bpe_count handles doubled/leading/trailing spaces like the oracle split") {
    import spark.implicits._
    val rows = Seq("the  spark", " the spark ", "", " ", "the")
      .toDF("text")
      .select(call_function("bpe_count", col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    // the=3 tokens, spark=3 tokens; empty segments contribute nothing
    assert(rows == Seq(6L, 6L, 0L, 0L, 3L), s"got $rows")
  }

  test("distributed q141 trainer equals the local reference trainer") {
    val distributed = Bpe.q141BpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    // local twin over the SAME word-frequency table
    val wf = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val local = BpeCodec.trainLocal(wf, Bpe.TrainRounds)
      .zipWithIndex.map { case ((l, r), i) => (i, l, r, l + r) }
    assert(distributed == local,
      s"distributed=$distributed\nlocal=$local")
  }

  test("trainLocalFast equals trainLocal on the corpus word table at depth") {
    val wf = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // the q141 depth AND a production-ish depth — the incremental
    // pair-count maintenance must track the recount trainer exactly,
    // including exhaustion (both stop when no pair remains)
    Seq(1, Bpe.TrainRounds, 200, 100000).foreach { rounds =>
      val fast = BpeCodec.trainLocalFast(wf, rounds)
      val slow = BpeCodec.trainLocal(wf, rounds)
      assert(fast === slow, s"trainer drift at rounds=$rounds " +
        s"(first diff at ${fast.zip(slow).indexWhere(p => p._1 != p._2)})")
    }
    // adversarial fixture: overlapping pairs (aaaa), cross-word churn
    val adversarial = Seq(("aaaa", 3L), ("aab", 2L), ("baa", 2L),
      ("abab", 1L), ("aaaaaaaa", 1L), ("x", 5L))
    Seq(1, 3, 50).foreach { rounds =>
      assert(BpeCodec.trainLocalFast(adversarial, rounds)
        === BpeCodec.trainLocal(adversarial, rounds),
        s"adversarial trainer drift at rounds=$rounds")
    }
  }

  test("trainTokenizer equals distributed q141 and publishes at depth") {
    val dist = Bpe.q141BpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    val fit = Bpe.trainTokenizer(spark, sfDir, Bpe.TrainRounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(fit === dist,
      "production trainer must reproduce the distributed loop's merges")

    // production-depth fit: >=1024 merges (or exhaustion), published and
    // billed through the same registry surface as the 12-merge fit
    val deep = Bpe.trainTokenizer(spark, sfDir, 1024)
    val deepRows = deep.collect()
    assert(deepRows.length > Bpe.TrainRounds,
      "the sf corpus must support merges beyond the fixture depth")
    assert(deepRows.take(Bpe.TrainRounds).map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
      === dist, "deep fit's prefix must equal the shallow fit")
    val out = java.nio.file.Files.createTempDirectory("graft_tok_deep").toFile
    out.deleteOnExit()
    Bpe.publishTokenizer(deep, out.getAbsolutePath)
    val loadedLit = Bpe.loadTokenizer(spark, out.getAbsolutePath)
    // a deeper table whose prefix is the shallow fit NEVER bills more
    // tokens (the apply loop replays the shared prefix identically,
    // then keeps merging) — and billing stays codegen'd end to end
    val shallowLit = org.apache.spark.sql.functions.typedLit(
      dist.map(t => t._2 + BpeCodec.Sep + t._3))
    val d = Tables.documents(spark, sfDir)
    val cmp = d.select(
        coalesce(call_function("bpe_count_with", col("text"), shallowLit), lit(0L))
          .as("shallow"),
        coalesce(call_function("bpe_count_with", col("text"), loadedLit), lit(0L))
          .as("deep"))
      .agg(sum("shallow").as("s"), sum("deep").as("dp")).collect()(0)
    assert(cmp.getLong(1) <= cmp.getLong(0),
      "extending the merge table must never increase token counts")
    assert(cmp.getLong(1) > 0L)
  }

  test("trainTokenizer minFreq prunes the long tail before the collect") {
    // r16 ADVICE: the HF-tokenizers min_frequency dial — the collected
    // word table must be boundable on a real web corpus's tail.
    // Equivalence oracle: training on a driver-filtered word table.
    val wf = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val cut = wf.map(_._2).sorted.apply(wf.size / 2) // median freq
    val expect = BpeCodec.trainLocalFast(wf.filter(_._2 >= cut), 64)
    val got = Bpe.trainTokenizer(spark, sfDir, 64, minFreq = cut).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got === expect,
      "minFreq trainer must equal training on the filtered word table")
    // default minFreq=1 unchanged: parity with the distributed loop is
    // already pinned above; here pin that the dial default is 1 (no cut)
    val full = Bpe.trainTokenizer(spark, sfDir, 12).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(full === BpeCodec.trainLocalFast(wf, 12))
  }

  test("q140 plans the native bpe_count (no interpreted HOF on the scan)") {
    val plan = Bpe.q140BpeCount(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("bpe_count"), "q140 lost the native bpe_count projection")
    val rows = Bpe.q140BpeCount(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // real tokenization always refines the whitespace estimate upward
      assert(r.getLong(4) >= r.getLong(3),
        s"bpe_tokens < ws_tokens in $r")
    }
  }

  test("q143 selects the budgeted hkey-ordered prefix billed in real tokens") {
    val plan = Bpe.q143BudgetSampleBpe(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_count"), "q143 lost the native bpe_count scan")

    val sel = Bpe.q143BudgetSampleBpe(spark, sfDir).collect()
    assert(sel.nonEmpty)
    sel.foreach { r =>
      assert(r.getLong(4) - r.getLong(3) < r.getLong(5),
        s"budget cut violated in $r")
    }
    // per stratum the selection is exactly the (hkey, doc_id)-ordered
    // prefix under the stratum's budget — recomputed here from the raw
    // corpus with an independent driver-side loop (sf0.001 is tiny)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"),
        call_function("bpe_count", col("text")).as("n"),
        graft.functions.TextFunctions.md5Long(col("doc_id")).as("hkey"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getLong(3), r.getLong(4)))
    val selected = sel.map(_.getLong(0)).toSet
    val budgets = sel.map(r => ((r.getString(1), r.getString(2)), r.getLong(5))).toMap
    docs.groupBy(t => (t._1, t._2)).foreach { case (stratum, rows) =>
      budgets.get(stratum).foreach { budget =>
        var cum = 0L
        rows.sortBy(t => (t._5, t._3)).foreach { t =>
          val take = cum < budget
          cum += t._4
          assert(selected.contains(t._3) == take,
            s"doc ${t._3} in $stratum: selected=${selected.contains(t._3)}, prefix-rule=$take")
        }
      }
    }
  }

  test("bpe_count_with under an explicit table equals a local BpeTable") {
    import spark.implicits._
    import graft.functions.BpeTable
    val merges = Seq(("s", "t"), ("a", "r"), ("st", "ar"))
    val keys = merges.map { case (l, r) => l + BpeCodec.Sep + r }
    val local = new BpeTable(merges)
    val inputs = Seq("star", "starstar", "st ar star", "", " ", "参star参",
      "😀st", "aaaa")
    val got = inputs.toDF("text")
      .select(call_function("bpe_count_with", col("text"), typedLit(keys)).as("n"))
      .collect().map(_.getLong(0)).toSeq
    val want = inputs.map { t =>
      t.split(" ").filter(_.nonEmpty).map(w => local.encode(w).length.toLong).sum
    }
    assert(got == want, s"got $got, want $want")
    // the frozen table through the dynamic path == the frozen expression
    val frozenKeys = BpeCodec.Merges.map { case (l, r) => l + BpeCodec.Sep + r }
    val both = Seq("the spark stream", "customer value").toDF("text")
      .select(
        call_function("bpe_count", col("text")).as("a"),
        call_function("bpe_count_with", col("text"), typedLit(frozenKeys)).as("b"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("bpe_count_with rejects non-foldable and malformed merges") {
    import spark.implicits._
    val df = Seq(("x", Seq("a"))).toDF("w", "m")
    intercept[Exception] { // non-foldable merges column
      df.select(call_function("bpe_count_with", col("w"), col("m"))).collect()
    }
    intercept[Exception] { // key without the  separator
      df.select(call_function("bpe_count_with", col("w"), typedLit(Seq("ab")))).collect()
    }
  }

  test("q144 bills the corpus in its own trained tokenizer's tokens") {
    val plan = Bpe.q144TrainedChain(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_count_with"), "q144 lost the native dynamic-table scan")

    val rows = Bpe.q144TrainedChain(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent driver-side replay: train locally over the corpus
    // word frequencies, encode every word, sum per source
    val wf = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val table = new graft.functions.BpeTable(BpeCodec.trainLocal(wf, Bpe.TrainRounds))
    val expected = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        src -> rs.map(_.getString(1).split(" ").filter(_.nonEmpty)
          .map(w => table.encode(w).length.toLong).sum).sum
      }
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(4) == expected(src),
        s"trained_tokens($src) = ${r.getLong(4)}, local replay = ${expected(src)}")
      // a corpus-fit table always compresses at least as well as
      // counting codepoints: trained tokens <= chars
      assert(r.getLong(4) <= r.getLong(2))
    }
  }

  test("q150 chunks: coverage, costs equal direct chunk tokenization, cap honesty") {
    import org.apache.spark.sql.functions.{call_function, col, lit}
    val got = Bpe.q150RagChunks(spark, sfDir).collect()
    val again = Bpe.q150RagChunks(spark, sfDir).collect()
    assert(got.toSeq === again.toSeq, "q150 must be deterministic")

    val C = Bpe.ChunkWords
    val S = Bpe.ChunkStride
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq).toMap
    // independent replay of the chunk GRID: count, starts, word counts
    got.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val dl = docs(doc).length
      val nChunks = 1 + math.max(0, math.ceil((dl - C).toDouble / S).toLong)
      assert(rows.length === nChunks, s"doc $doc chunk count")
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong)
        assert(r.getLong(2) === i.toLong * S, "start_word = chunk_id * stride")
        val expectWords = math.min(C, dl - i * S)
        assert(r.getLong(3) === expectWords, s"doc $doc chunk $i n_words")
      }
    }
    // every non-empty doc chunked
    assert(got.map(_.getLong(0)).toSet === docs.filter(_._2.nonEmpty).keys.toSet)

    // THE invariant that makes prefix-sum billing honest: a chunk's
    // summed word costs equal bpe_count of the joined chunk text
    val sp = spark
    import sp.implicits._
    val sample = got.filter(r => r.getLong(0) < 20)
      .map { r =>
        val doc = r.getLong(0); val c = r.getLong(1).toInt
        (doc, c, docs(doc).slice(c * S, c * S + C).mkString(" "), r.getLong(4))
      }.toSeq
    assert(sample.nonEmpty)
    val direct = sample.toDF("doc", "c", "chunk_text", "claimed")
      .select(col("doc"), col("c"), col("claimed"),
        call_function("bpe_count", col("chunk_text")).as("direct"))
      .collect()
    direct.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"chunk (${r.getLong(0)}, ${r.getInt(1)}): summed word costs " +
          s"${r.getLong(2)} != direct tokenization ${r.getLong(3)}")
    }
    // the cap must discriminate on the real corpus, not rubber-stamp
    assert(got.exists(_.getBoolean(5)), "no over-cap chunks")
    assert(got.exists(!_.getBoolean(5)), "no under-cap chunks")
  }

  test("bpe_word_counts sums to bpe_count and window_sums replays driver-side") {
    import org.apache.spark.sql.functions.{aggregate, call_function, col, lit}
    // sum parity on the real corpus + adversarial spacing
    val d = Tables.documents(spark, sfDir).select(col("text"))
      .union(spark.sql(
        "SELECT * FROM VALUES (''), (' '), ('  a  b '), ('one'), ('a b c') AS t(text)"))
    val rows = d.select(
      call_function("bpe_count", col("text")).as("total"),
      aggregate(call_function("bpe_word_counts", col("text")),
        lit(0L), (acc, x) => acc + x).as("summed")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
      "bpe_word_counts must sum to bpe_count"))
    // null text → null array
    assert(spark.sql("SELECT bpe_word_counts(cast(null as string))")
      .collect().head.isNullAt(0))

    // window_sums: independent replay over edge-shaped arrays
    def ref(a: Seq[Long], c: Int, s: Int): Seq[Long] = {
      if (a.isEmpty) Seq.empty
      else {
        val nw = 1 + math.max(0L, math.ceil((a.length - c).toDouble / s).toLong).toInt
        (0 until nw).map(k => a.slice(k * s, k * s + c).sum)
      }
    }
    val cases = Seq(Seq.empty[Long], Seq(5L), (1L to 3L).toSeq, (1L to 4L).toSeq,
      (1L to 5L).toSeq, (1L to 8L).toSeq, (1L to 9L).toSeq, (1L to 64L).toSeq)
    cases.foreach { a =>
      val got = spark.sql(
        s"SELECT window_sums(${if (a.isEmpty) "cast(array() as array<bigint>)"
          else a.mkString("array(", "L,", "L)")}, 4, 2)")
        .collect().head.getSeq[Long](0)
      assert(got === ref(a, 4, 2), s"window_sums drift for n=${a.length}")
    }
    // null element poisons; malformed dials rejected
    assert(spark.sql("SELECT window_sums(array(1L, cast(null as bigint)), 4, 2)")
      .collect().head.isNullAt(0))
    val err = intercept[Exception](
      spark.sql("SELECT window_sums(array(1L), 2, 4)").collect())
    assert(err.getMessage.contains("c >= s >= 1"))
  }

  test("tokenizer registry: published merges round-trip and bill identically") {
    import org.apache.spark.sql.functions.{call_function, coalesce, col, lit}
    val merges = Bpe.q141BpeTrain(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_tok").toFile
    out.deleteOnExit()
    Bpe.publishTokenizer(merges, out.getAbsolutePath)
    val loadedLit = Bpe.loadTokenizer(spark, out.getAbsolutePath)
    // the loaded literal equals the in-memory fit's literal
    val inMem = merges.collect()
      .map(r => r.getString(1) + graft.functions.BpeCodec.Sep + r.getString(2)).toSeq
    val loaded = spark.range(1).select(loadedLit.as("m"))
      .collect().head.getSeq[String](0)
    assert(loaded === inMem, "published merges must round-trip in rank order")
    // and billing the corpus under the loaded table equals the
    // in-memory trained chain's counts
    val d = Tables.documents(spark, sfDir)
    val a = d.select(col("doc_id"),
        coalesce(call_function("bpe_count_with", col("text"),
          org.apache.spark.sql.functions.typedLit(inMem)), lit(0L)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = d.select(col("doc_id"),
        coalesce(call_function("bpe_count_with", col("text"), loadedLit), lit(0L)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b, "loaded-tokenizer billing must equal the in-memory fit")
  }

  test("tokenizer registry: manifest versions — torn republish invisible, pinned load survives") {
    import org.apache.spark.sql.functions.col
    val merges = Bpe.q141BpeTrain(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_tok_ver").toFile
    out.deleteOnExit()
    val root = out.getAbsolutePath
    Bpe.publishTokenizer(merges, root)
    assert(graft.sources.ManifestLog.versions(spark, root) === Seq(1L))
    def loadedSeq(version: Option[Long]) =
      spark.range(1).select(Bpe.loadTokenizer(spark, root, version).as("m"))
        .collect().head.getSeq[String](0)
    val v1 = loadedSeq(None)

    // torn republish: a staged gen dir with NO manifest must be invisible
    // (the pre-manifest mode(overwrite) layout had already destroyed the
    // artifact at this point)
    merges.limit(1).select("rank", "lhs", "rhs")
      .write.parquet(s"$root/gen=2/merges")
    assert(loadedSeq(None) === v1,
      "an uncommitted staging dir must not change what load serves")

    // committed republish with a DIFFERENT (truncated) table: current
    // moves to v2, the pinned v1 keeps its full table
    val half = merges.orderBy("rank").limit(1)
    Bpe.publishTokenizer(half, root)
    assert(graft.sources.ManifestLog.versions(spark, root) === Seq(1L, 2L))
    assert(loadedSeq(None).length == 1, "current must serve the republished table")
    assert(loadedSeq(Some(1L)) === v1, "a pinned version keeps its exact merge table")

    // vacuum reclaims EXACTLY the unreferenced set: v1's gen dir and
    // manifest file (the committed republish owns gen=2 — its earlier
    // torn staging was overwritten in place); the current version's
    // files stay and it still loads, the vacuumed pin fails loudly
    val deleted = graft.sources.ManifestLog.vacuumGens(spark, root)
    val deletedNames = deleted.map(_.split("/").last).toSet
    assert(deletedNames === Set("gen=1", "v000000001.json"),
      s"vacuum must reclaim exactly the unreferenced set: $deletedNames")
    assert(loadedSeq(None).length == 1, "current must survive vacuum")
    intercept[Exception](loadedSeq(Some(1L)))

    // legacy flat artifact (pre-manifest layout) still loads
    val legacy = java.nio.file.Files.createTempDirectory("graft_tok_leg").toFile
    legacy.deleteOnExit()
    merges.select("rank", "lhs", "rhs").coalesce(1)
      .write.mode("overwrite").parquet(legacy.getAbsolutePath)
    assert(spark.range(1)
      .select(Bpe.loadTokenizer(spark, legacy.getAbsolutePath).as("m"))
      .collect().head.getSeq[String](0) === v1)
    intercept[Exception](Bpe.loadTokenizer(spark, legacy.getAbsolutePath, Some(1L)))
  }

  test("q150 v2 plan: native row-local chunking, one exchange (the orderBy)") {
    val plan = Bpe.q150RagChunks(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_word_counts"), "word costs must be native")
    assert(plan.contains("window_sums"), "chunk sums must be native")
    assert(!plan.contains("HashAggregate") && !plan.contains("ObjectHashAggregate"),
      "v2 must not re-grow an aggregation")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"v2's only exchange is the output orderBy range partition, found $exchanges:\n$plan")
  }

  test("streamed chunking equals batch q150 across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    def rows(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    val batch = rows(Bpe.q150RagChunks(spark, sfDir).collect())

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.ChunkStream.chunks(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = rows(sp.sql("SELECT * FROM chunk_stream").collect())
    assert(got === batch,
      s"stream-only=${(got -- batch).take(5)} batch-only=${(batch -- got).take(5)}")
  }

  test("merge_pair / token_pairs reject wrong arities and types") {
    import spark.implicits._
    val df = Seq("x").toDF("w")
    intercept[Exception] {
      df.select(call_function("bpe_count", lit(1))).collect()
    }
    intercept[Exception] {
      df.select(call_function("merge_pair", col("w"), lit("a"), lit("b"))).collect()
    }
  }
}
