package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, TextOps}
import graft.streaming.KeeperStream
import graft.streaming.KeeperStream.Member

/** T34 streaming twin: the keeper-upgrade stream must converge to the
  * batch q118 selection when every member is inside the watermark
  * horizon, and must IGNORE members that arrive behind the watermark.
  */
class KeeperStreamSpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try body
    finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream keepers converge to q118's batch selection (all in-horizon)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    // the real corpus' cluster members + qualities, stamped in-horizon
    val t0 = Timestamp.valueOf("2024-06-01 12:00:00")
    val members = Dedup.dupClusters(spark, sfDir).select("cluster_id", "doc_id")
      .join(TextOps.qualityScores(spark, sfDir).select("doc_id", "quality"), Seq("doc_id"))
      .collect()
      .map(r => Member(r.getLong(1), r.getLong(0), r.getDouble(2), t0))
      .toSeq
    // two micro-batches split by doc parity: upgrades must carry across
    val (b1, b2) = members.partition(_.doc_id % 2 == 0)

    withRocksDb {
      val stream = MemoryStream[Member]
      val query = KeeperStream.keepers(stream.toDS())
        .writeStream.format("memory").queryName("keepers_out")
        .outputMode("update").start()
      try {
        stream.addData(b1: _*)
        query.processAllAvailable()
        stream.addData(b2: _*)
        query.processAllAvailable()
        // final state per cluster = the emission with the largest
        // n_members (cumulative, strictly increasing per touch)
        val got = sp.sql(
          """SELECT cluster_id, kept_doc, kept_quality, n_members FROM (
            | SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
            |   ORDER BY n_members DESC) AS rk FROM keepers_out) WHERE rk = 1""".stripMargin)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        val want = Curation.q118CanonicalSelect(spark, sfDir)
          .select("cluster_id", "kept_doc", "kept_quality", "n_members")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        assert(got == want, s"stream=${got.size} batch=${want.size}")
      } finally query.stop()
    }
  }

  test("a member behind the watermark cannot retroactively upgrade the keeper") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)

    withRocksDb {
      val stream = MemoryStream[Member]
      val query = KeeperStream.keepers(stream.toDS())
        .writeStream.format("memory").queryName("keepers_late")
        .outputMode("update").start()
      try {
        // batch 1: keeper is doc 10; another cluster's event at 12:00
        // advances the watermark to 11:00
        stream.addData(
          Member(1, 10, 0.5, ts("2024-01-01 10:00:00")),
          Member(2, 99, 0.1, ts("2024-01-01 12:00:00")))
        query.processAllAvailable()
        // batch 2: a BETTER member, but behind the 11:00 watermark → ignored;
        // and an in-horizon upgrade that must land
        stream.addData(
          Member(1, 20, 0.9, ts("2024-01-01 10:30:00")),
          Member(1, 30, 0.8, ts("2024-01-01 11:30:00")))
        query.processAllAvailable()
        val last = sp.sql(
          """SELECT kept_doc, kept_quality, n_members FROM keepers_late
            |WHERE cluster_id = 1 ORDER BY n_members DESC LIMIT 1""".stripMargin).head()
        assert(last.getLong(0) == 30L, s"late member changed the keeper: $last")
        assert(last.getDouble(1) == 0.8)
        // the late member was not counted either
        assert(last.getLong(2) == 2L, s"late member counted: $last")
      } finally query.stop()
    }
  }
}
