package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHashExpr

/** T10 custom Catalyst expression: interpreted eval vs codegen parity,
  * determinism, basic hash properties.
  */
class RollingHashSpec extends GraftSpec {

  test("matches the reference scalar implementation") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "ümlaut ✓")
    val fromSpark = inputs.toDF("s")
      .select(RollingHashExpr.rollingHash(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val expected = inputs.map(s => RollingHashExpr.hashBytes(s.getBytes("UTF-8")))
    assert(fromSpark.toSeq == expected)
  }

  test("deterministic across evaluations and plans") {
    val d = Tables.documents(spark, sfDir)
    val a = d.select(col("doc_id"), RollingHashExpr.rollingHash(col("text")).as("h"))
    val b = d.repartition(7).select(col("doc_id"), RollingHashExpr.rollingHash(col("text")).as("h"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("distinct texts rarely collide") {
    val d = Tables.documents(spark, sfDir)
    val n = d.select("text").distinct().count()
    val nh = d.select(RollingHashExpr.rollingHash(col("text"))).distinct().count()
    assert(nh == n) // 61-bit space vs a few hundred docs: collisions ~impossible
  }

  test("usable from SQL text via the injected function") {
    val out = spark.sql("SELECT rolling_hash('hello world') AS h").collect()(0).getLong(0)
    assert(out == RollingHashExpr.hashBytes("hello world".getBytes("UTF-8")))
  }

  test("order sensitivity (polynomial, not bag-of-bytes)") {
    val h1 = RollingHashExpr.hashBytes("ab".getBytes)
    val h2 = RollingHashExpr.hashBytes("ba".getBytes)
    assert(h1 != h2)
  }

  test("rev hash equals the forward hash of the byte-reversed input") {
    val bytes = "the quick brown fox".getBytes("UTF-8")
    assert(RollingHashExpr.hashBytesRev(bytes) ==
      RollingHashExpr.hashBytes(bytes.reverse))
    // SQL-callable and matches the scalar path
    val out = spark.sql("SELECT rolling_hash_rev('hello') AS h").collect()(0).getLong(0)
    assert(out == RollingHashExpr.hashBytesRev("hello".getBytes("UTF-8")))
  }
}
