package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Dedup

/** q139's SERVING twin (r14 verdict next-round #6): the batch routed
  * dedup has no in-flight form — a production ingest wants each
  * arriving vector's verdict against the published corpus index, not a
  * nightly re-run. This is the q117 stream-static shape applied to the
  * routed operator:
  *
  *   - the INDEX is built batch-side from the corpus (one job, the
  *     exact q139 prefix): in-cap cell members for pair probing, and
  *     per-over-cap-cell representatives for the dense tail;
  *   - an ARRIVING vector signs with the index's pinned dial (bits is
  *     frozen at publish time — a serving index must not re-derive it
  *     per batch), explodes to its band cells, and
  *       - in-cap collisions emit exact-cosine pairs under the same
  *         first-colliding-band gate as batch (each unordered pair
  *         emitted exactly ONCE across the stream: when its larger id
  *         arrives and probes the smaller, already-indexed one);
  *       - dense-cell arrivals take ONE KeeperStream-style verdict
  *         against the representative of their first over-cap cell —
  *         a watermark-bounded min(struct) aggregate, exactly batch's
  *         rn=1 assignment.
  *
  * Streamed-equals-batch contract (RouteStreamSpec): streaming the
  * corpus itself through both paths reproduces batch q139's pair set
  * and verdict rows bit-for-bit.
  *
  * Scale shape: the pair probe never shuffles arriving payloads beyond
  * the (band, key) join — at serving scale the in-cap member index is
  * a bucketed published table co-partitioned on (band, key), so the
  * probe is a map-side lookup; the rep index is n/cap rows and rides
  * as a broadcast. Aggregate state is one min-struct per arriving
  * vector inside the watermark horizon.
  */
object RouteStream {

  /** The published index: everything an arrival needs, with the dial
    * values pinned at build time. `horizon` is the verdict path's
    * watermark + window width (r15 verdict item 4: previously a
    * hardcoded "1 hour") — a SERVING dial pinned at publish like
    * `bits`/`cap`, read from `spark.graft.rplsh.routeHorizon` at build.
    * Re-dialing the horizon changes only how long a late arrival can
    * still be aggregated (verdict TIMING), never a verdict ROW for an
    * in-horizon arrival: the min-struct fold per (window, vec_id) is
    * horizon-independent because each arrival's candidate set is the
    * static broadcast rep index (RouteStreamSpec pins this).
    */
  final case class RoutedIndex(inCap: DataFrame, overCapReps: DataFrame,
      bits: Int, nBands: Int, cap: Long, horizon: String = "1 hour")

  /** The serving-horizon conf, resolved at index build time. */
  private[graft] def routeHorizon(s: SparkSession): String = {
    val h = s.conf.getOption("spark.graft.rplsh.routeHorizon")
      .map(_.trim).filter(_.nonEmpty).getOrElse("1 hour")
    // fail at BUILD, not at the first micro-batch: a malformed interval
    // inside a running stream is a production outage, not a typo report
    require(org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(h))
      != null, s"spark.graft.rplsh.routeHorizon='$h' is not an interval")
    h
  }

  /** Build (and cache) the index from the corpus — the q139 prefix:
    * one signature pass, one (band, key) exchange, occupancy as an
    * in-partition window.
    */
  def buildIndex(s: SparkSession, dir: String): RoutedIndex = {
    val cap = Dedup.routeCap(s)
    require(cap >= 1, s"spark.graft.rplsh.routeCap=$cap must be >= 1")
    val horizon = routeHorizon(s) // validate the dial before any job runs
    val (sigs, nBands) = Dedup.rpSigs(s, dir)
    // pin the dial for arrivals: same derivation as rpSigs, one scalar
    val bits = Dedup.rpConf(s)._2.getOrElse(
      Dedup.rpDerivedBitsFor(
        graft.Tables.embeddings(s, dir)
          .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
          .filter(col("nrm") > 0).count()))
    val exploded = sigs
      .select(col("vec_id"), col("embedding"), col("nrm"), col("keys"),
        posexplode(col("keys")).as(Seq("band", "key")))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("band"), col("key"))
    val withOcc = exploded.withColumn("occ",
      count(lit(1)).over(Window.partitionBy("band", "key")))
    val inCap = withOcc.filter(col("occ") <= cap)
      .select(col("band"), col("key"), col("vec_id").as("v1"),
        col("embedding").as("e1"), col("nrm").as("n1"), col("keys").as("ka"))
      .cache()
    // batch's rep rule, replicated exactly: members are first ASSIGNED
    // to their min-(band, key) over-cap cell, and a cell's rep is the
    // min vec_id among its ASSIGNED members (not all its members — a
    // member assigned to an earlier cell is not rep-eligible here).
    // Every assigned cell has >= 1 assigned member, so an arrival's
    // first over-cap cell always has a rep row to land on.
    val reps = withOcc.filter(col("occ") > cap)
      .select("band", "key", "vec_id", "embedding", "nrm")
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy("band", "key")))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("rep_id",
        min(col("vec_id")).over(Window.partitionBy("band", "key")))
      .filter(col("vec_id") === col("rep_id"))
      .select(col("band"), col("key"), col("rep_id"),
        col("embedding").as("rep_vec"), col("nrm").as("rep_nrm"))
      .cache()
    RoutedIndex(inCap, reps, bits, nBands, cap, horizon)
  }

  /** Persist the routed index (r16 — the FOURTH learned structure
    * under the publish discipline, joining the LR registry, PqIndex
    * and Bm25Index): the in-cap member table (written in its
    * (band, key) exchange layout — at 100 TB this is the bucketed
    * published table the scaladoc's map-side-probe claim rides on),
    * the n/cap-row rep table, and ALL pinned dials (bits/nBands/cap/
    * horizon) so a serving session reconstructs the exact arrival
    * contract without re-deriving anything from the corpus or the
    * ambient conf.
    */
  /** Bucket count for the published in-cap table (pinned in dials). */
  val InCapBuckets = 32

  /** Catalog name for an artifact's in-cap table — deterministic from
    * the artifact path, so any session resolves the same entry.
    */
  private[graft] def inCapTableName(outDir: String): String =
    "graft_incap_" + java.security.MessageDigest.getInstance("MD5")
      .digest(new org.apache.hadoop.fs.Path(outDir).toUri.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

  def publishRoutedIndex(idx: RoutedIndex, outDir: String): Unit = {
    // r17 (r16 verdict #4): inCap goes through the S17 bucketBy surface,
    // clustered on the probe key — a cross-session serve's stream-static
    // (band, key) join then plans with NO Exchange on the corpus-sized
    // side (only the request-sized arrivals hash into the buckets),
    // where the previous exchange-layout parquet paid a full inCap
    // re-shuffle on the first probe of every new session.
    //
    // r17 follow-up: the publish is MANIFEST-COMMITTED (sources
    // .ManifestLog, the index-set discipline). The previous form wrote
    // three tables in place with mode(overwrite) — a crash between
    // inCap and reps/dials left a TORN artifact (new in-cap cells
    // against the old dense-tail reps: pair emissions and verdicts
    // from two different corpus states, undetectable). Now all three
    // pieces stage into a fresh gen=<v> dir and the atomic manifest
    // rename — written last — is the only commit point; the catalog
    // name is derived from the gen dir so every version has its own
    // bucketed table entry.
    val s = idx.inCap.sparkSession
    val v = graft.sources.ManifestLog.versions(s, outDir)
      .lastOption.getOrElse(0L) + 1
    val gen = s"$outDir/gen=$v"
    // overwrite within the fresh gen dir: a crashed earlier attempt at
    // this version never committed, so its leftovers are safe to replace
    s.sql(s"DROP TABLE IF EXISTS ${inCapTableName(gen)}")
    idx.inCap.write.format("parquet")
      .bucketBy(InCapBuckets, "band", "key")
      .option("path", s"$gen/incap_bucketed")
      .mode("overwrite").saveAsTable(inCapTableName(gen))
    idx.overCapReps.write.mode("overwrite").parquet(s"$gen/reps")
    import s.implicits._
    Seq((idx.bits, idx.nBands, idx.cap, idx.horizon, InCapBuckets))
      .toDF("bits", "n_bands", "cap", "horizon", "incap_buckets")
      .write.mode("overwrite").parquet(s"$gen/dials")
    graft.sources.ManifestLog.commit(s, outDir, v,
      s"""{"version": $v, "gen": "$v"}""")
  }

  /** Vacuum old versions: `ManifestLog.vacuumGens` plus dropping the
    * vacuumed gens' bucketed inCap catalog entries — each gen owns its
    * own table name, so a stale entry points at a deleted path (harmless
    * to current serving but metastore litter, and a confusing failure if
    * queried directly). The gen name is re-joined to the caller's
    * `outDir` string before hashing so the dropped name matches the one
    * publish registered — same path-form contract as load.
    */
  def vacuumRoutedIndex(s: SparkSession, outDir: String,
      keepVersions: Int = 1): Seq[String] = {
    val deleted = graft.sources.ManifestLog.vacuumGens(s, outDir, keepVersions)
    deleted.map(_.split("/").last).filter(_.startsWith("gen=")).foreach { nm =>
      s.sql(s"DROP TABLE IF EXISTS ${inCapTableName(s"$outDir/$nm")}")
    }
    deleted
  }

  /** Load resolves inCap through the catalog so the bucket spec reaches
    * the planner. A session (or JVM) without the catalog entry
    * re-registers it over the existing bucketed files — metadata only,
    * no data rewrite. Resolution goes through the manifest log when one
    * exists (no `version` = current; a pinned version keeps serving its
    * exact cells across re-publishes). Artifacts published before the
    * manifest (flat layout) or before the bucketed layout (a plain
    * `incap` dir, 4-column dials) still load with a warning; the latter
    * serve correctly but pay the first-probe re-shuffle.
    */
  def loadRoutedIndex(s: SparkSession, outDir: String,
      version: Option[Long] = None): RoutedIndex = {
    val root =
      if (graft.sources.ManifestLog.versions(s, outDir).nonEmpty) {
        val v = version.getOrElse(
          graft.sources.ManifestLog.currentVersion(s, outDir))
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(graft.sources.ManifestLog.read(s, outDir, Some(v)))
        s"$outDir/gen=${node.get("gen").asText()}"
      } else {
        require(version.isEmpty,
          s"legacy routed index at $outDir has no manifest — cannot pin a version")
        System.err.println(s"[graft] legacy routed index at $outDir: " +
          "un-versioned layout — republish for atomic versioned commits")
        outDir
      }
    loadRoutedIndexFrom(s, root)
  }

  private def loadRoutedIndexFrom(s: SparkSession, outDir: String): RoutedIndex = {
    val dialsDf = s.read.parquet(s"$outDir/dials")
    val d = dialsDf.collect()(0)
    val inCap =
      if (!dialsDf.columns.contains("incap_buckets")) {
        System.err.println(s"[graft] legacy routed index at $outDir: " +
          "unbucketed incap — republish to plan probes exchange-free")
        s.read.parquet(s"$outDir/incap")
      } else {
        val nm = inCapTableName(outDir)
        val buckets = d.getInt(dialsDf.columns.indexOf("incap_buckets"))
        if (!s.catalog.tableExists(nm)) {
          val path = s"$outDir/incap_bucketed"
          val schema = s.read.parquet(path).schema.toDDL
          s.sql(s"CREATE TABLE $nm ($schema) USING parquet " +
            s"CLUSTERED BY (band, key) INTO $buckets BUCKETS " +
            s"LOCATION '$path'")
        }
        s.table(nm)
      }
    RoutedIndex(
      inCap,
      s.read.parquet(s"$outDir/reps"),
      d.getInt(0), d.getInt(1), d.getLong(2), d.getString(3))
  }

  /** Sign an arrivals stream (ts, vec_id, embedding) with the index's
    * pinned dial. Zero-norm arrivals drop, as in batch.
    */
  private def keyed(arrivals: DataFrame, idx: RoutedIndex): DataFrame =
    arrivals
      .withColumn("nrm", sqrt(VectorFunctions.norm2(col("embedding"))))
      .filter(col("nrm") > 0)
      .withColumn("keys", call_function("rp_lsh_keys", col("embedding"),
        lit(idx.bits), lit(idx.nBands), lit(Dedup.RpMaxBits)))

  /** In-cap pair emissions: (v1, v2, cos) with v1 < v2 — batch q139's
    * `kind = pair` rows, emitted as the larger member arrives.
    * Stateless stream-static join: no watermark, no state.
    */
  def pairs(arrivals: DataFrame, idx: RoutedIndex): DataFrame =
    keyed(arrivals, idx)
      .select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2"), col("keys").as("kb"),
        posexplode(col("keys")).as(Seq("band", "key")))
      .join(idx.inCap, Seq("band", "key"))
      .filter(col("v1") < col("v2") && Dedup.rpFirstBandGate(idx.nBands))
      .withColumn("cos",
        round(VectorFunctions.dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 6))
      .filter(col("cos") >= 0.35)
      .select(col("v1"), col("v2"), col("cos"))

  /** Dense-tail verdicts: one row per arriving vector that lands in
    * any over-cap cell — assigned to its FIRST such cell (min (band,
    * key), batch's rn=1 rule) via a watermark-bounded min(struct)
    * aggregate against the broadcast rep index.
    */
  def verdicts(arrivals: DataFrame, idx: RoutedIndex): DataFrame =
    keyed(arrivals, idx)
      .withWatermark("ts", idx.horizon)
      .select(col("ts"), col("vec_id"), col("embedding"), col("nrm"),
        posexplode(col("keys")).as(Seq("band", "key")))
      .join(broadcast(idx.overCapReps), Seq("band", "key"))
      .withColumn("cos", round(
        VectorFunctions.dot(col("embedding"), col("rep_vec")) /
          (col("nrm") * col("rep_nrm")), 6))
      .groupBy(window(col("ts"), idx.horizon), col("vec_id"))
      .agg(min(struct(col("band"), col("key"), col("rep_id"), col("cos"))).as("a"))
      .select(col("a.band").as("band"), col("a.key").as("key"),
        col("vec_id").as("v1"), col("a.rep_id").as("v2"), col("a.cos").as("cos"),
        (col("vec_id") === col("a.rep_id") || col("a.cos") < 0.35).as("kept"))
}
