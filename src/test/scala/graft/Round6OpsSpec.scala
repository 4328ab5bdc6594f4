package graft

import org.apache.spark.sql.functions._

import graft.operators.Extended

/** Round-6 guards and compositions: the q96 walk's cycle guard, plus
  * invariants for the round's new operators (added below as they land).
  */
class Round6OpsSpec extends GraftSpec {

  test("q96 hierarchy walk fails loudly on cyclic edges instead of looping") {
    import spark.implicits._
    // 100 -> 200 -> 100: a 2-cycle that never reaches a root (< 10)
    val nodes = Seq(100L, 200L).toDF("k")
    val edges = Seq((100L, 200L), (200L, 100L)).toDF("child", "parent")
    val ex = intercept[IllegalStateException] {
      Extended.hierarchyWalk(nodes, edges).collect()
    }
    assert(ex.getMessage.contains("not drained"), ex.getMessage)
  }

  test("q96 hierarchy walk still resolves an acyclic forest through the shared core") {
    import spark.implicits._
    val nodes = Seq(5L, 42L, 421L).toDF("k")
    val edges = Seq((42L, 4L), (421L, 42L)).toDF("child", "parent")
    val rows = Extended.hierarchyWalk(nodes, edges).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 5L, 0L), (42L, 4L, 1L), (421L, 4L, 2L)), got.toString)
  }
}
