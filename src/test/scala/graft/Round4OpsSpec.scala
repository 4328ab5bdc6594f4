package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Relational, TextOps, TypedOps}

/** Semantic invariants of the round-4 operators (q71-q77) beyond what the
  * DuckDB oracle pins down.
  */
class Round4OpsSpec extends GraftSpec {

  test("q71 islands are disjoint maximal runs covering every active day") {
    val rows = Relational.q71GapsIslands(spark, sfDir).collect()
    val activeDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(rows.map(_.getLong(3)).sum == activeDays)
    rows.groupBy(_.getLong(0)).foreach { case (_, isl) =>
      val sorted = isl.sortBy(_.getString(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // maximality: the next island starts at least 2 days after the
          // previous one ends (a 1-day gap would have merged them)
          val gap = java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.parse(a.getString(2)),
            java.time.LocalDate.parse(b.getString(1)))
          assert(gap >= 2, s"islands touch: $a $b")
        case _ => ()
      }
      // island length equals its day span
      isl.foreach { r =>
        val span = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(r.getString(1)),
          java.time.LocalDate.parse(r.getString(2)))
        assert(span + 1 == r.getLong(3), s"non-contiguous island: $r")
      }
    }
  }

  test("q72 trailing window equals the naive inequality self-join") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val naive = o.join(
        Tables.orders(spark, sfDir)
          .select(col("o_custkey").as("ck"), col("o_orderdate").as("d2"),
            col("o_totalprice").as("p2")),
        col("ck") === col("o_custkey") &&
          col("d2") <= col("o_orderdate") &&
          col("d2") >= col("o_orderdate") - expr("INTERVAL 30 DAYS"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Relational.q72RangeFrame(spark, sfDir).collect()
      .map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(got == naive)
  }

  test("q73 mode is the true argmax with deterministic tiebreak") {
    val counts = Tables.part(spark, sfDir)
      .groupBy("p_brand", "p_type").count().collect()
      .groupBy(_.getString(0))
    Relational.q73ModeFreq(spark, sfDir).collect().foreach { r =>
      val brand = r.getString(0)
      val byType = counts(brand).map(x => x.getString(1) -> x.getLong(2))
      val maxCnt = byType.map(_._2).max
      val expected = byType.filter(_._2 == maxCnt).map(_._1).min
      assert(r.getString(1) == expected && r.getLong(2) == maxCnt, s"$r")
      assert(r.getLong(3) == byType.length)
    }
  }

  test("q74 cogroup totals reconcile with the raw tables") {
    val out = TypedOps.q74CogroupRecon(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sum == Tables.events(spark, sfDir).count())
    assert(out.map(_.getLong(2)).sum == Tables.orders(spark, sfDir).count())
    out.foreach { r =>
      val (ne, no, st) = (r.getLong(1), r.getLong(2), r.getString(5))
      st match {
        case "both"        => assert(ne > 0 && no > 0 && !r.isNullAt(3) && !r.isNullAt(4))
        case "events_only" => assert(ne > 0 && no == 0 && r.isNullAt(4))
        case "orders_only" => assert(ne == 0 && no > 0 && r.isNullAt(3))
      }
    }
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("q75 passage accounting: ceil(n/8) passages, dup_frac in [0,1]") {
    val nTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Dedup.q75PassageDedup(spark, sfDir).collect()
    assert(out.length == nTokens.size)
    out.foreach { r =>
      val n = nTokens(r.getLong(0))
      assert(r.getLong(1) == (n + Dedup.PassageLen - 1) / Dedup.PassageLen, s"$r")
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0 && r.getLong(2) <= r.getLong(1))
    }
  }

  test("q76 bigram LM: n-1 bigrams per doc, probabilities in (0,1]") {
    val nTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = TextOps.q76BigramLm(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(1) == nTokens(r.getLong(0)) - 1L, s"$r")
      val mean = r.getDouble(3)
      // each p = c2/c1 is in (0,1], so the mean must be too
      assert(mean > 0.0 && mean <= 1.0, s"$r")
    }
  }

  test("q80 shard packing conserves tokens over consecutive contiguous shards") {
    val rows = Curation.q80ShardPack(spark, sfDir).collect()
    val totalTokens = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long")).collect().map(_.getLong(0)).sum
    assert(rows.map(_.getLong(3)).sum == totalTokens)
    rows.groupBy(_.getString(0)).foreach { case (_, shards) =>
      val sorted = shards.sortBy(_.getLong(1))
      // shard 0 always exists (cum_before starts at 0) and ids strictly
      // increase; gaps are LEGAL — a document longer than a whole budget
      // skips shard numbers (cum_before jumps more than one boundary)
      assert(sorted.head.getLong(1) == 0L)
      assert(sorted.map(_.getLong(1)).toSeq == sorted.map(_.getLong(1)).toSeq.sorted.distinct)
      // doc ranges are non-overlapping in shard order
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4), s"$a / $b")
        case _ => ()
      }
      // budget: a shard's tokens exceed the budget only via its LAST doc
      // straddling the boundary, so tokens-minus-one-doc stays below it —
      // with <=99-token docs at a 2048 budget each emitted shard must hold
      // at least 2048/99 ≈ 20 docs except the final partial shard
      sorted.dropRight(1).foreach(r => assert(r.getLong(2) >= 20, s"$r"))
    }
  }

  test("cosine of a zero-norm vector is NULL, not an ANSI fatal error") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Array(0f, 0f), Array(1f, 2f)),
      (2L, Array(3f, 4f), Array(1f, 0f))
    ).toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.VectorFunctions.cosine(col("a"), col("b")).as("cos"))
    val rows = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isEmpty, "zero-norm cosine must be NULL")
    assert(rows(2L).contains(0.6), s"regular cosine wrong: ${rows(2L)}")
  }

  test("q81 semdedup verdicts agree with the q44 ground-truth pairs") {
    val verdicts = operators.Similarity.q81SemDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    // q44 emits every within-cell pair with cos >= the same tau
    val pairs = operators.Dedup.q44EmbedDup(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val expectedDupOf = pairs.groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    verdicts.foreach { case (v, dupOf) =>
      assert(dupOf == expectedDupOf.get(v), s"vec $v")
      dupOf.foreach(d => assert(d < v))
    }
    assert(expectedDupOf.nonEmpty, "fixture should contain semantic dups")
  }

  test("q77 mixing weights: shares sum to 1, sqrt-boost favors small strata") {
    val out = Curation.q77MixWeights(spark, sfDir).collect()
    val wSum = out.map(_.getDouble(4)).sum
    val nSum = out.map(_.getDouble(5)).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weight_share sum $wSum")
    assert(math.abs(nSum - 1.0) < 1e-4, s"natural_share sum $nSum")
    // sqrt temperature: smallest stratum boosted at least as much as largest
    val byDocs = out.sortBy(_.getLong(2))
    assert(byDocs.head.getDouble(6) >= byDocs.last.getDouble(6))
  }
}
