package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The versioned-manifest commit primitive shared by every published
  * learned artifact (hybrid index set, tokenizer registry, routed dedup
  * index): data lands in fresh version-stamped directories first, then a
  * create-temp + ATOMIC-RENAME manifest file — written LAST — makes the
  * whole version visible in one filesystem metadata operation. The
  * current version is simply the max committed manifest file; a crashed
  * mutation never produced one, so the prior version stays current and
  * its staged directories are invisible orphans.
  *
  * Extracted from operators/IndexSet.scala (r17 verdict #1) so the
  * single-artifact registries share one commit discipline instead of
  * re-deriving it; the file layout (`<root>/manifest/v%09d.json`) is
  * IndexSet's, unchanged.
  */
object ManifestLog {

  private def fsOf(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  def manifestDir(root: String): String = s"$root/manifest"

  def manifestPath(root: String, v: Long): String =
    f"${manifestDir(root)}/v$v%09d.json"

  /** Create-temp then atomic rename into the versioned manifest name. A
    * pre-existing target (concurrent writer) fails loudly — the
    * single-writer contract every registry documents.
    */
  def commit(s: SparkSession, root: String, version: Long,
      payload: String): Unit = {
    val fs = fsOf(s, root)
    val target = new Path(manifestPath(root, version))
    require(!fs.exists(target),
      s"manifest $target already exists — concurrent writer? (single-writer contract)")
    val tmp = new Path(manifestDir(root), s".tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, target),
      s"manifest commit failed renaming $tmp -> $target")
  }

  /** Committed versions, ascending. Empty when the root has no manifest
    * dir — callers use that to detect legacy (pre-manifest) artifacts.
    */
  def versions(s: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(manifestDir(root))
    val fs = fsOf(s, root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case nm if nm.matches("v\\d{9}\\.json") =>
        nm.substring(1, 10).toLong }
      .sorted
  }

  def currentVersion(s: SparkSession, root: String): Long = {
    val vs = versions(s, root)
    require(vs.nonEmpty, s"no committed manifest under ${manifestDir(root)}")
    vs.last
  }

  /** Reclaim what no retained manifest references, for the
    * single-artifact registries whose payload carries a `gen` field
    * (tokenizer, routed index): `gen=<id>` dirs of vacuumed versions
    * and of crashed publishes that never committed, plus the vacuumed
    * manifest FILES themselves (time travel reaches only retained
    * versions afterwards). Returns the deleted paths — the exactness
    * contract IndexSet.vacuum pins for the hybrid family.
    */
  def vacuumGens(s: SparkSession, root: String,
      keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, "must retain at least the current version")
    val vs = versions(s, root)
    require(vs.nonEmpty, s"nothing published under $root")
    val keep = vs.takeRight(keepVersions).toSet
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def genOf(v: Long): String =
      om.readTree(read(s, root, Some(v))).get("gen").asText()
    val liveGens = keep.map(genOf)
    val fs = fsOf(s, root)
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    fs.listStatus(new Path(root)).filter(_.isDirectory).foreach { d =>
      val nm = d.getPath.getName
      if (nm.startsWith("gen=") && !liveGens.contains(nm.drop(4))) {
        fs.delete(d.getPath, true)
        deleted += d.getPath.toString
      }
    }
    vs.filterNot(keep).foreach { v =>
      fs.delete(new Path(manifestPath(root, v)), false)
      deleted += manifestPath(root, v)
    }
    deleted.toSeq
  }

  /** Read one committed manifest's payload. */
  def read(s: SparkSession, root: String,
      version: Option[Long] = None): String = {
    val v = version.getOrElse(currentVersion(s, root))
    val p = new Path(manifestPath(root, v))
    val fs = fsOf(s, root)
    require(fs.exists(p), s"no manifest for version $v under $root")
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(bytes) finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
