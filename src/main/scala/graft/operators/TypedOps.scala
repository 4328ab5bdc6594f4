package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Per-key one-row summary of one side of the reconciliation. Amounts are
  * finalized (decimal-exact sum, rounded, cast) BEFORE the typed merge so
  * the cogroup never folds raw doubles in iterator order. `amt` is an
  * Option: sum() over an all-NULL group is NULL, and a non-nullable
  * Double field would make the Dataset decoder throw on such a group
  * (the q64 encoder lesson).
  */
case class SideAgg(key: Long, n: Long, amt: Option[Double])

/** Reconciliation verdict for one key across the two sources. */
case class Recon(
    key: Long,
    n_events: Long,
    n_orders: Long,
    events_value: Option[Double],
    orders_value: Option[Double],
    status: String)

/** Typed Dataset surface (SURVEY.md §2.1 R36): KeyValueGroupedDataset
  * .cogroup merging two pre-aggregated sources per key — the typed
  * equivalent of a full-outer reconciliation join, used where per-key
  * merge logic is imperative (here: presence classification).
  *
  * Scale shape: both inputs are aggregated to one row per key before the
  * cogroup, so the shuffle carries exactly two keyed one-row streams; the
  * cogroup itself is a co-partitioned merge with no skew surface beyond
  * the keys themselves.
  */
object TypedOps {

  import Relational.{dmoney, out2}

  // R36: typed cogroup reconciliation — events activity vs orders activity
  // per key (user_id vs o_custkey share the same key domain in the corpus).
  def q74CogroupRecon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n"), out2(sum(dmoney(col("value")))).as("amt"))
      .as[SideAgg]
    val od = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n"), out2(sum(dmoney(col("o_totalprice")))).as("amt"))
      .as[SideAgg]
    ev.groupByKey(_.key)
      .cogroup(od.groupByKey(_.key)) { (k, evIt, odIt) =>
        val e = evIt.toSeq.headOption
        val o = odIt.toSeq.headOption
        val status = (e, o) match {
          case (Some(_), Some(_)) => "both"
          case (Some(_), None)    => "events_only"
          case _                  => "orders_only"
        }
        Iterator(Recon(
          k,
          e.map(_.n).getOrElse(0L),
          o.map(_.n).getOrElse(0L),
          e.flatMap(_.amt),
          o.flatMap(_.amt),
          status))
      }
      .toDF()
      .orderBy("key")
  }

  val q74Sql: String =
    """WITH e AS (
      |  SELECT user_id AS key, COUNT(*) AS n,
      |   CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE) AS amt
      |  FROM events GROUP BY 1),
      |o AS (
      |  SELECT o_custkey AS key, COUNT(*) AS n,
      |   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS amt
      |  FROM orders GROUP BY 1)
      |SELECT COALESCE(e.key, o.key) AS key,
      | COALESCE(e.n, 0) AS n_events, COALESCE(o.n, 0) AS n_orders,
      | e.amt AS events_value, o.amt AS orders_value,
      | CASE WHEN e.key IS NOT NULL AND o.key IS NOT NULL THEN 'both'
      |      WHEN e.key IS NOT NULL THEN 'events_only'
      |      ELSE 'orders_only' END AS status
      |FROM e FULL OUTER JOIN o ON e.key = o.key
      |ORDER BY key""".stripMargin
}
