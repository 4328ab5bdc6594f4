package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Round-8 native dot product: the codegen'd vec_dot must be
  * bit-identical to the declarative HOF fold it replaced, on every
  * real embedding pair shape and on the HOF chain's null edges.
  */
class VectorExprsSpec extends GraftSpec {

  test("vec_dot equals the HOF fold bit-for-bit on real embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val pairs = e.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j")).limit(5000)
    val cmp = pairs.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
    // bit-for-bit: compare raw bits, not ==, so -0.0/NaN can't hide
    val bad = cmp.filter(
      expr("(native IS NULL) != (hof IS NULL)") ||
        expr("cast(native as string) != cast(hof as string)") ||
        abs(col("native") - col("hof")) =!= 0.0).count()
    assert(bad == 0, s"$bad pairs diverge between native and HOF dot")
    assert(cmp.count() > 0)
  }

  test("vec_dot mirrors the HOF null semantics: mismatch and null element") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)), // plain: 11.0
      (Seq(1.0f), Seq(1.0f, 1.0f)), // length mismatch -> null
      (Seq.empty[Float], Seq.empty[Float]) // empty -> 0.0
    ).toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null semantics diverge: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"$r")
    }
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 0.0)
    // null ELEMENT poisons to null in both forms
    val withNullElem = sp.sql(
      "SELECT array(cast(1.0 as float), cast(null as float)) AS a, " +
        "array(cast(1.0 as float), cast(1.0 as float)) AS b")
    val ne = withNullElem.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect().head
    assert(ne.isNullAt(0) && ne.isNullAt(1), s"null element not poisoning: $ne")
  }

  test("vec_dot property: parity holds on generated vectors incl. extremes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val sp = spark
    import sp.implicits._
    val genF: Gen[Float] = Gen.oneOf(
      Gen.chooseNum(-1e6f, 1e6f),
      Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
        Float.MinPositiveValue, -0.0f, 0.0f, Float.MaxValue))
    val genPair: Gen[(Seq[Float], Seq[Float])] = for {
      n <- Gen.chooseNum(0, 96)
      a <- Gen.listOfN(n, genF)
      b <- Gen.listOfN(n, genF)
    } yield (a, b)
    // fixed seed: deterministic corpus of 300 adversarial pairs
    val pairs = (0 until 300).flatMap(i =>
      genPair.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = pairs.toDF("a", "b")
    val bad = df.select(
        VectorFunctions.dot(col("a"), col("b")).as("native"),
        VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
      .collect().filterNot { r =>
        // doubleToLongBits (not Raw): canonicalizes NaN — NaN payload
        // bits are hardware-path artifacts, not semantics — while still
        // distinguishing -0.0 from 0.0
        r.isNullAt(0) == r.isNullAt(1) && (r.isNullAt(0) ||
          java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    assert(bad.isEmpty, s"${bad.length} generated pairs diverge: ${bad.take(3).mkString}")
  }

  test("sparse_dot equals the HOF sparse fold bit-for-bit") {
    val sp = spark
    // real sparse entries (q105's TF-IDF shape) against a dense vector
    // of the vocabulary size, via SQL so the struct fields type as
    // (int, double) exactly like the production frame
    val df = sp.sql(
      """SELECT
        |  array(struct(1, 0.5d), struct(3, -2.25d), struct(2, 1.125d)) AS entries,
        |  array(10.0d, 20.0d, 30.0d) AS dense
        |UNION ALL SELECT
        |  array(struct(2, 1e300d), struct(2, -1e300d), struct(1, 1.0d)),
        |  array(3.0d, 7.0d, 0.0d)
        |UNION ALL SELECT array(struct(1, 1.0d)), array(cast(null as double))
        |""".stripMargin)
    val cmp = df.select(
      expr("sparse_dot(entries, dense)").as("native"),
      aggregate(col("entries"), lit(0.0),
        (a, e) => a + e.getField("col2") *
          element_at(col("dense"), e.getField("col1"))).as("hof"))
      .collect()
    cmp.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null semantics diverge: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bits diverge: $r")
    }
    // first row: 0.5*10 + (-2.25)*30 + 1.125*20 = 5 - 67.5 + 22.5
    assert(cmp(0).getDouble(0) == -40.0)
    // third row: null dense element poisons
    assert(cmp(2).isNullAt(0))
  }
}
