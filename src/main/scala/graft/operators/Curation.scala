package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end curation pipeline (capstone of SURVEY.md §2.3): one
  * keep/drop decision per document with the dominating drop reason, the
  * exact query a training-data run executes before tokenization.
  *
  * Composition, in precedence order:
  *  1. exact duplicate (non-keeper of an identical-content group)
  *  2. near-duplicate (non-keeper of a jaccard>=0.8 cluster, q55)
  *  3. contaminated (shares >=3 5-grams with the eval slice, q56)
  *  4. repetitive (top-2-gram fraction > 0.2, q57)
  *  5. low quality (composite < 0.4, q48)
  *
  * Scale shape: one window over md5(text) + three keyed left joins of
  * SMALL flag tables (flagged docs only — each a tiny fraction of the
  * corpus, broadcast at any scale) + the per-doc quality map. The fact
  * table is scanned once.
  */
object Curation {

  def q58CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    // drop the text payload BEFORE the hash window — the shuffle then
    // carries (doc_id, 32-char hash) instead of whole documents.
    val base = d.select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("exact_keeper",
        min(col("doc_id")).over(Window.partitionBy("content_hash")))

    val nearDrop = Dedup.q55DupClusters(s, dir)
      .filter(!col("is_keeper"))
      .select(col("doc_id"), lit(true).as("near_dup"))
    val contam = Dedup.q56Decontaminate(s, dir)
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    val repet = TextOps.q57Repetition(s, dir)
      .filter(col("is_repetitive"))
      .select(col("doc_id"), lit(true).as("repetitive"))
    val quality = TextOps.q48QualityScore(s, dir).select("doc_id", "quality")

    base
      .join(broadcast(nearDrop), Seq("doc_id"), "left_outer")
      .join(broadcast(contam), Seq("doc_id"), "left_outer")
      .join(broadcast(repet), Seq("doc_id"), "left_outer")
      .join(quality, Seq("doc_id"), "left_outer")
      .withColumn("drop_reason",
        when(col("doc_id") =!= col("exact_keeper"), "exact_dup")
          .when(coalesce(col("near_dup"), lit(false)), "near_dup")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .when(coalesce(col("repetitive"), lit(false)), "repetitive")
          .when(col("quality") < 0.4, "low_quality"))
      .withColumn("keep", col("drop_reason").isNull)
      .select(col("doc_id"), col("keep"),
        coalesce(col("drop_reason"), lit("kept")).as("reason"), col("quality"))
      .orderBy("doc_id")
  }

  val q58Sql: String =
    s"""WITH RECURSIVE
       |near AS (SELECT doc_id, TRUE AS near_dup FROM (${Dedup.q55Sql}) WHERE NOT is_keeper),
       |contam AS (SELECT DISTINCT doc_id, TRUE AS contaminated FROM (${Dedup.q56Sql})),
       |repet AS (SELECT doc_id, TRUE AS repetitive FROM (${TextOps.q57Sql}) WHERE is_repetitive),
       |qual AS (SELECT doc_id, quality FROM (${TextOps.q48Sql})),
       |base AS (
       | SELECT doc_id, MIN(doc_id) OVER (PARTITION BY MD5(text)) AS exact_keeper
       | FROM documents)
       |SELECT b.doc_id, reason = 'kept' AS keep, reason, quality FROM (
       | SELECT b.doc_id AS doc_id,
       |  CASE WHEN b.doc_id <> b.exact_keeper THEN 'exact_dup'
       |       WHEN COALESCE(n.near_dup, FALSE) THEN 'near_dup'
       |       WHEN COALESCE(c.contaminated, FALSE) THEN 'contaminated'
       |       WHEN COALESCE(r.repetitive, FALSE) THEN 'repetitive'
       |       WHEN q.quality < 0.4 THEN 'low_quality'
       |       ELSE 'kept' END AS reason,
       |  q.quality AS quality
       | FROM base b
       | LEFT JOIN near n ON b.doc_id = n.doc_id
       | LEFT JOIN contam c ON b.doc_id = c.doc_id
       | LEFT JOIN repet r ON b.doc_id = r.doc_id
       | LEFT JOIN qual q ON b.doc_id = q.doc_id) b
       |ORDER BY doc_id""".stripMargin
}
