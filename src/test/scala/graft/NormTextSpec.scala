package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Parity proof for the native `norm_text` expression (r14): bit-equal
  * to the declarative regex chain it replaced on (a) a hand-built
  * adversarial set covering every branch of the parity argument in
  * NormTextExpr's scaladoc, and (b) the real sf0.001 documents corpus
  * plus q119's injected variants. The oracle keeps the regex SQL, so
  * the driver gate additionally proves cross-engine equality.
  */
class NormTextSpec extends GraftSpec {

  private val adversarial = Seq(
    "", " ", "   ", "abc", "ABC", "a1b2c9", "007",
    "hello world", "hello  world", " hello world ",
    "a?!b", "?leading", "trailing!", "???", "a\tb\nc",
    "MiXeD 123 CaSe!!", "a,b.c;d:e", "x--y__z",
    "café résumé", "ÉTÉ", "naïve",
    "日本語 text", "emoji 😀 mid",
    "İstanbul", "straße", "1a2b ١٢ 9z",
    "tab\tsep", "multi   space   run", "!@#$%^&*()",
    "ends with digit 5", "5 starts with digit"
  )

  test("norm_text equals the declarative regex chain on adversarial inputs") {
    import spark.implicits._
    val df = adversarial.toDF("text")
      .select(col("text"),
        Dedup.normalizeText(col("text")).as("native"),
        Dedup.normalizeTextDeclarative(col("text")).as("declarative"))
    val bad = df.filter(not(col("native") <=> col("declarative"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("norm_text equals the declarative chain on the corpus + q119 variants") {
    val d = Tables.documents(spark, sfDir)
    val variants = d
      .select(concat(upper(col("text")), lit(" !!!")).as("text"))
      .union(d.select(regexp_replace(col("text"), " ", "  ").as("text")))
    val corpus = d.select(col("text")).union(variants)
    val bad = corpus
      .filter(not(Dedup.normalizeText(col("text")) <=>
        Dedup.normalizeTextDeclarative(col("text"))))
      .count()
    assert(bad === 0L)
  }

  test("norm_text is SQL-callable through the extension registry") {
    spark.sql("SELECT norm_text('A?!b  9') AS n").collect()
      .map(_.getString(0)).toSeq match {
      case Seq(n) => assert(n === "a b 0")
      case other => fail(s"unexpected: $other")
    }
  }
}
