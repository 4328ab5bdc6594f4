package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Parity proofs for the native 60-bit md5 forms (r14): `md5_long`
  * bit-equal to the conv-substring-hex chain, and `md5_long_ngrams`
  * bit-equal to md5Long over concat_ws(" ")-joined windows — per
  * element, over edge shapes (empties from doubled spaces, short
  * arrays, unicode) and the real corpus.
  */
class Md5LongSpec extends GraftSpec {

  test("md5_long equals the declarative conv-substring chain") {
    import spark.implicits._
    val vals = Seq("", " ", "a", "hello world", "123", "é日本😀",
      "x" * 500, "0", "-42").toDF("v")
    val bad = vals.filter(not(
      TextFunctions.md5Long(col("v")) <=>
        TextFunctions.md5LongDeclarative(col("v")))).count()
    assert(bad === 0L)
    // non-string inputs go through the same cast in both forms
    val d = Tables.documents(spark, sfDir)
    val badLong = d.filter(not(
      TextFunctions.md5Long(col("doc_id")) <=>
        TextFunctions.md5LongDeclarative(col("doc_id")))).count()
    assert(badLong === 0L)
    val badCorpus = d.filter(not(
      TextFunctions.md5Long(col("text")) <=>
        TextFunctions.md5LongDeclarative(col("text")))).count()
    assert(badCorpus === 0L)
  }

  test("md5_long_ngrams equals md5Long over concat_ws-joined windows") {
    import spark.implicits._
    def viaStrings(n: Int) =
      transform(TextFunctions.shinglesFromTokens(split(col("text"), " "), n),
        s => TextFunctions.md5LongDeclarative(s))
    val edge = Seq("", "a", "a b", "a b c", "a  b c d", " lead", "trail ",
      "x y z w v").toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val bad = edge.filter(not(
        TextFunctions.md5LongNgramsFromTokens(split(col("text"), " "), n) <=>
          viaStrings(n))).count()
      assert(bad === 0L, s"n=$n edge mismatch")
    }
    val d = Tables.documents(spark, sfDir)
    val bad = d.filter(not(
      TextFunctions.md5LongNgramsFromTokens(split(col("text"), " "), 3) <=>
        viaStrings(3))).count()
    assert(bad === 0L)
  }

  test("md5_long is SQL-callable and matches a known value") {
    val viaSql = spark.sql("SELECT md5_long('abc') AS h").collect().head.getLong(0)
    val viaChain = spark.sql(
      "SELECT CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT) AS h")
      .collect().head.getLong(0)
    assert(viaSql === viaChain)
  }
}
