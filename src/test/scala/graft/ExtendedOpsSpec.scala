package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Edgar, Relational}

/** Semantic invariants of the round-3 operators (q16-q19, q34, q62)
  * beyond what the DuckDB oracle pins down.
  */
class ExtendedOpsSpec extends GraftSpec {

  test("q18 hash sample is deterministic and near the 13/256 rate") {
    val a = Relational.q18HashSample(spark, sfDir).collect()
    val b = Relational.q18HashSample(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    val n = Tables.orders(spark, sfDir).count().toDouble
    val rate = a.length / n
    // 13/256 = 5.08%; allow generous sampling noise at sf0.001 (1500 orders)
    assert(rate > 0.02 && rate < 0.10, s"rate $rate")
  }

  test("q17 set ops partition the key space (no custkey tagged twice)") {
    val out = Relational.q17SetOps(spark, sfDir).collect()
    val keys = out.map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
  }

  test("q19 bucketed range join equals the naive inequality join") {
    val e = Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val naive = e.filter(col("event_type") === "purchase")
      .join(clicks, col("cu") === col("user_id") &&
        col("cts") >= col("ts") - expr("INTERVAL 1 HOUR") && col("cts") < col("ts"),
        "left_outer")
      .groupBy("event_id")
      .agg(sum(when(col("cts").isNotNull, 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = Relational.q19RangeJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bucketed == naive)
  }

  test("q34 html round-trip recovers every order with its 2dp price") {
    val parsed = Edgar.q34HtmlExtract(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    assert(parsed.count() == o.count())
    val mismatches = parsed.join(o, Seq("o_orderkey"))
      .filter(col("parsed_price") =!=
        col("o_totalprice").cast("decimal(12,2)").cast("double"))
      .count()
    assert(mismatches == 0)
  }

  test("q35 chunked reassembly is byte-identical to the source payload") {
    val direct = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(lower(hex(encode(col("text"), "UTF-8")))).as("want_md5"))
    val mismatches = Edgar.q35BinaryAssembly(spark, sfDir)
      .join(direct, Seq("doc_id"))
      .filter(col("full_md5") =!= col("want_md5"))
      .count()
    assert(mismatches == 0)
  }

  test("q64 top-k aggregator is partition-order invariant") {
    val base = Relational.q64TopkAgg(spark, sfDir).collect().toSeq
    // same aggregation over a deliberately different partitioning
    val e = Tables.events(spark, sfDir).repartition(13, col("event_id"))
    val top3 = org.apache.spark.sql.functions.udaf(graft.functions.TopKAgg.Top3)
    val alt = e.groupBy("event_type")
      .agg(top3(col("value"), col("event_id")).as("tops"))
      .select(col("event_type"),
        element_at(col("tops"), 1).as("v1"),
        element_at(col("tops"), 2).as("v2"),
        element_at(col("tops"), 3).as("v3"))
      .orderBy("event_type").collect().toSeq
    assert(base == alt)
  }

  test("q62 bloom pre-filter + exact join equals the plain semi join") {
    val d = Tables.documents(spark, sfDir)
    val withH = d.withColumn("h",
      md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))))
    val expected = withH.filter(col("source") =!= "src0")
      .join(withH.filter(col("source") === "src0").select("h").distinct(),
        Seq("h"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Dedup.q62BloomMembership(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }
}
