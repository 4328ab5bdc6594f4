package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

import graft.functions.{CleanNumeric, TextFunctions, VectorFunctions}
import graft.operators.TextOps

/** ANSI-totality fuzzing (SURVEY.md §4): Spark 4 runs ANSI mode, where a
  * 0-division, a bad cast, or a bad array index is a FATAL error. These
  * specs drive the reusable column functions with adversarial inputs —
  * junk strings, empty text, emoji, zero vectors — and require a result
  * row for every input (no exceptions, no silently vanishing rows).
  * Deterministic: generators run from a fixed seed.
  */
class TotalitySpec extends GraftSpec {

  /** Materialize n samples from a generator with a fixed seed. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, Seed(0x5eedL + i)))
  }

  private val junkString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString),
    Gen.listOf(Gen.oneOf("(", ")", "-", ".", ",", "$", "I", "l", " ", "0", "9"))
      .map(_.mkString),
    Gen.const(""),
    Gen.const("."),
    Gen.const("-"),
    Gen.const("((((("),
    Gen.const("...1...2..."),
    Gen.const("\u0000\u0001"),
    Gen.const("🙂🙃🙂"))

  test("CleanNumeric.clean never throws and yields a finite double for any input") {
    val sp = spark
    import sp.implicits._
    val inputs = samples(junkString, 300).distinct
    val out = inputs.toDF("raw")
      .select(col("raw"), CleanNumeric.clean(col("raw")).as("v"))
      .collect()
    assert(out.length == inputs.length)
    out.foreach { r =>
      assert(!r.isNullAt(1), s"NULL for input ${r.getString(0)}")
      val v = r.getDouble(1)
      assert(!v.isNaN && !v.isInfinite, s"non-finite $v for ${r.getString(0)}")
    }
  }

  test("quality score is a concrete [0,1]-ish value for any text") {
    val sp = spark
    import sp.implicits._
    val inputs = samples(junkString, 300).distinct
    val out = inputs.toDF("text")
      .select(col("text"), TextOps.qualityExpr(col("text")).as("q"))
      .collect()
    assert(out.length == inputs.length)
    out.foreach { r =>
      assert(!r.isNullAt(1), s"NULL quality for ${r.getString(0)}")
      val q = r.getDouble(1)
      assert(q >= 0.0 && q <= 1.0 && !q.isNaN, s"quality $q for ${r.getString(0)}")
    }
  }

  test("cosine is total over zero, tiny, huge, and mismatched-scale vectors") {
    val sp = spark
    import sp.implicits._
    val vec: Gen[Array[Float]] = Gen.oneOf(
      Gen.const(Array.fill(4)(0f)),
      Gen.listOfN(4, Gen.chooseNum(-1e30f, 1e30f)).map(_.toArray),
      Gen.listOfN(4, Gen.chooseNum(-1e-30f, 1e-30f)).map(_.toArray),
      Gen.listOfN(4, Gen.chooseNum(-1f, 1f)).map(_.toArray))
    val pairs = samples(Gen.zip(vec, vec), 200)
    val out = pairs.toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("cos"))
      .collect()
    assert(out.length == pairs.length)
    out.foreach { r =>
      if (!r.isNullAt(0)) {
        val c = r.getDouble(0)
        // rounding can nudge past 1 by <= 5e-7; NaN/Inf are the failures
        assert(!c.isNaN && math.abs(c) <= 1.000001, s"cosine $c")
      }
    }
  }

  test("variant path extraction is total over malformed JSON") {
    val sp = spark
    import sp.implicits._
    val inputs = samples(junkString, 100).distinct :+ """{"k": "not-a-number"}"""
    val out = inputs.toDF("props")
      .select(
        org.apache.spark.sql.functions.try_variant_get(
          org.apache.spark.sql.functions.try_parse_json(col("props")),
          "$.k", "bigint").as("k"))
      .collect()
    // no row throws; malformed docs and uncastable values land as NULL
    assert(out.length == inputs.length)
  }

  test("from_xml is total over malformed filing pages") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("order", ArrayType(StructType(Seq(
      StructField("_id", StringType),
      StructField("price", DoubleType),
      StructField("status", StringType)))))))
    val inputs = samples(junkString, 100).distinct ++ Seq(
      "<filing><order id=\"O-1\"><price>bad</price></order></filing>",
      "<filing><unclosed>", "<filing/>")
    // PERMISSIVE default: malformed pages land as NULL structs/fields,
    // never an exception — one corrupt filing must not kill the batch
    val out = inputs.toDF("xml")
      .select(org.apache.spark.sql.functions.from_xml(col("xml"), schema).as("p"))
      .collect()
    assert(out.length == inputs.length)
  }

  test("hashed shingles are total on short/empty token arrays") {
    val sp = spark
    import sp.implicits._
    val texts = Seq("", "one", "one two", "one two three", "a b c d e f")
    val out = texts.toDF("text")
      .select(size(TextFunctions.hashedShinglesFromTokens(
        split(col("text"), " "), 3)).as("n"))
      .collect().map(_.getInt(0))
    // 5-token doc -> 3 trigram shingles; shorter than n -> 0, never error
    assert(out.toSeq == Seq(0, 0, 0, 1, 4))
  }
}
