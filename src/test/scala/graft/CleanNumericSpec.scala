package graft

import org.apache.spark.sql.functions._
import graft.functions.CleanNumeric

/** E3 cleaner semantics (reference OCRClean.py:30-88 num_strip). */
class CleanNumericSpec extends GraftSpec {

  private def cleanOne(raw: String): Double = {
    import spark.implicits._
    Seq(raw).toDF("raw")
      .select(CleanNumeric.clean(col("raw")).as("v"))
      .collect()(0).getDouble(0)
  }

  test("plain dollar amount with commas") {
    assert(cleanOne("$1,234.56") == 1234.56)
  }

  test("parentheses mean negative") {
    assert(cleanOne("(1,234.56)") == -1234.56)
  }

  test("OCR I and l read as 1") {
    assert(cleanOne("I,234.5l") == 1234.51)
  }

  test("whitespace tolerated") {
    assert(cleanOne("  987.00 ") == 987.0)
  }

  test("bare dash is zero") {
    assert(cleanOne("-") == 0.0)
  }

  test("leading hyphen is negative (OCRClean.py:62 keeps first-position '-')") {
    assert(cleanOne("-123.45") == -123.45)
    assert(cleanOne("-1,000") == -1000.0)
  }

  test("bare period is zero") {
    assert(cleanOne(".") == 0.0)
  }

  test("empty string is zero") {
    assert(cleanOne("") == 0.0)
  }

  test("multiple periods: last one is the decimal separator") {
    assert(cleanOne("1.234.56") == 1234.56)
  }

  test("more than 2 decimals means thousands separator, not cents") {
    assert(cleanOne("1.234") == 1234.0)
  }

  test("no decimals at all") {
    assert(cleanOne("$5,000") == 5000.0)
  }

  test("trailing period") {
    assert(cleanOne("42.") == 42.0)
  }

  test("messy/clean round-trip on corpus values") {
    val l = Tables.lineitem(spark, sfDir)
    val key = col("l_orderkey") * 31 + col("l_linenumber")
    val checked = l
      .withColumn("variant", key % 6)
      .withColumn("raw", CleanNumeric.messy(col("l_extendedprice"), key))
      .withColumn("back", round(CleanNumeric.clean(col("raw")), 2))
      .withColumn("want",
        when(col("variant") === 1 || col("variant") === 5, -round(col("l_extendedprice"), 2))
          .when(col("variant") === 4, 0.0)
          .otherwise(round(col("l_extendedprice"), 2)))
    assert(checked.filter(col("back") =!= col("want")).count() == 0)
  }
}
