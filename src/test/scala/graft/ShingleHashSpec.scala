package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Parity proof for the native `shingle_hash` expression: bit-equal to
  * the interpreted-HOF form it replaced, per element, over (a) edge
  * shapes (short arrays, empty tokens from doubled spaces, single
  * token, exactly-n tokens) and (b) the real corpus at every n the
  * engine uses (3 for q41/q55, 5 for q56/q117/q125/ContamStream,
  * variable for q110's per-language grams).
  */
class ShingleHashSpec extends GraftSpec {

  private def bothForms(textCol: String, n: Int) = {
    import org.apache.spark.sql.Column
    val toks = split(col(textCol), " ")
    (TextFunctions.hashedShinglesFromTokens(toks, n): Column,
      TextFunctions.hashedShinglesFromTokensHof(toks, n): Column)
  }

  test("shingle_hash equals the HOF form on edge shapes") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "a", "a b", "a b c", "a b c d",
      "a  b c", "  leading", "trailing  ",
      "x y z w v u t s r q p"
    ).toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val (native, hof) = bothForms("text", n)
      val bad = edge.filter(not(native <=> hof)).count()
      assert(bad === 0L, s"n=$n mismatch")
    }
  }

  test("shingle_hash equals the HOF form on the corpus at n=3 and n=5") {
    val d = Tables.documents(spark, sfDir)
    for (n <- Seq(3, 5)) {
      val (native, hof) = bothForms("text", n)
      val bad = d.filter(not(native <=> hof)).count()
      assert(bad === 0L, s"n=$n corpus mismatch")
    }
  }

  test("shingle_hash ids equal a direct xxhash64 over the window columns") {
    import spark.implicits._
    val df = Seq(("alpha beta gamma delta")).toDF("text")
      .select(TextFunctions.hashedShinglesFromTokens(split(col("text"), " "), 3).as("ids"),
        array(
          xxhash64(lit("alpha"), lit("beta"), lit("gamma")),
          xxhash64(lit("beta"), lit("gamma"), lit("delta"))).as("expected"))
    val r = df.select((col("ids") === col("expected")).as("ok")).collect()
    assert(r.head.getBoolean(0))
  }
}
