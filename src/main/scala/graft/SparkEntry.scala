package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_join_topn" -> (Relational.q02JoinTopN _),
    "q03_star_join" -> (Relational.q03StarJoin _),
    "q04_agg_functions" -> (Relational.q04AggFunctions _),
    "q05_window_rank" -> (Relational.q05WindowRank _),
    "q06_semi_anti" -> (Relational.q06SemiAnti _),
    "q07_pivot_wide" -> (Relational.q07PivotWide _),
    "q08_rollup" -> (Relational.q08Rollup _),
    "q09_exists_totals" -> (Relational.q09ExistsTotals _),
    "q10_asof_join" -> (Relational.q10AsofJoin _),
    "q11_sessionize" -> (Relational.q11Sessionize _),
    "q12_explode_tokens" -> (Relational.q12ExplodeTokens _),
    "q13_approx_distinct" -> (Relational.q13ApproxDistinct _),
    "q14_percentiles" -> (Relational.q14Percentiles _),
    "q15_cube" -> (Relational.q15Cube _),
    "q16_correlated_subquery" -> (Relational.q16CorrelatedSubquery _),
    "q17_setops" -> (Relational.q17SetOps _),
    "q18_hash_sample" -> (Relational.q18HashSample _),
    "q19_range_join" -> (Relational.q19RangeJoin _),
    "q20_edgar_index_parse" -> (Edgar.q20EdgarIndexParse _),
    "q21_cik_registry" -> (Edgar.q21CikRegistry _),
    "q22_clean_numeric" -> (Edgar.q22CleanNumeric _),
    "q23_merge_columns" -> (Edgar.q23MergeColumns _),
    "q24_scale_apply" -> (Edgar.q24ScaleApply _),
    "q25_fuzzy_match" -> (Edgar.q25FuzzyMatch _),
    "q26_bs_split" -> (BalanceSheet.q26BsSplit _),
    "q27_classify_rule" -> (Classify.q27ClassifyRule _),
    "q28_classify_lr" -> (Classify.q28ClassifyLr _),
    "q29_label_override" -> (Classify.q29LabelOverride _),
    "q30_structured_agg" -> (BalanceSheet.q30StructuredAgg _),
    "q31_reconstruction" -> (BalanceSheet.q31Reconstruction _),
    "q32_filename_parse" -> (Edgar.q32FilenameParse _),
    "q33_seq_merge" -> (Edgar.q33SeqMerge _),
    "q34_html_extract" -> (Edgar.q34HtmlExtract _),
    "q40_dedup_exact" -> (Dedup.q40DedupExact _),
    "q41_ngram_jaccard" -> (Dedup.q41NgramJaccard _),
    "q42_minhash_lsh" -> (Dedup.q42MinhashLsh _),
    "q43_simhash" -> (Dedup.q43Simhash _),
    "q44_embed_dup" -> (Dedup.q44EmbedDup _),
    "q45_ann_topk" -> (Similarity.q45AnnTopk _),
    "q46_ann_ivf" -> (Similarity.q46AnnIvf _),
    "q47_lang_id" -> (TextOps.q47LangId _),
    "q48_quality_score" -> (TextOps.q48QualityScore _),
    "q49_token_count" -> (TextOps.q49TokenCount _),
    "q50_fingerprint" -> (TextOps.q50Fingerprint _),
    "q51_multimodal_meta" -> (Multimodal.q51MultimodalMeta _),
    "q52_window_agg" -> (streaming.EventStream.q52WindowAgg _),
    "q53_tfidf" -> (TextOps.q53Tfidf _),
    "q54_redact" -> (TextOps.q54Redact _),
    "q55_dup_clusters" -> (Dedup.q55DupClusters _),
    "q56_decontaminate" -> (Dedup.q56Decontaminate _),
    "q57_repetition" -> (TextOps.q57Repetition _),
    "q58_curation_pipeline" -> (Curation.q58CurationPipeline _),
    "q59_outliers" -> (Relational.q59Outliers _),
    "q60_histogram" -> (Relational.q60Histogram _),
    "q61_merge_upsert" -> (Relational.q61MergeUpsert _),
    "q62_bloom_membership" -> (Dedup.q62BloomMembership _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_join_topn" -> Relational.q02Sql,
    "q03_star_join" -> Relational.q03Sql,
    "q04_agg_functions" -> Relational.q04Sql,
    "q05_window_rank" -> Relational.q05Sql,
    "q06_semi_anti" -> Relational.q06Sql,
    "q07_pivot_wide" -> Relational.q07Sql,
    "q08_rollup" -> Relational.q08Sql,
    "q09_exists_totals" -> Relational.q09Sql,
    "q10_asof_join" -> Relational.q10Sql,
    "q11_sessionize" -> Relational.q11Sql,
    "q12_explode_tokens" -> Relational.q12Sql,
    "q14_percentiles" -> Relational.q14Sql,
    "q15_cube" -> Relational.q15Sql,
    "q16_correlated_subquery" -> Relational.q16Sql,
    "q17_setops" -> Relational.q17Sql,
    "q18_hash_sample" -> Relational.q18Sql,
    "q19_range_join" -> Relational.q19Sql,
    "q20_edgar_index_parse" -> Edgar.q20Sql,
    "q21_cik_registry" -> Edgar.q21Sql,
    "q22_clean_numeric" -> Edgar.q22Sql,
    "q23_merge_columns" -> Edgar.q23Sql,
    "q24_scale_apply" -> Edgar.q24Sql,
    "q25_fuzzy_match" -> Edgar.q25Sql,
    "q26_bs_split" -> BalanceSheet.q26Sql,
    "q27_classify_rule" -> Classify.q27Sql,
    "q29_label_override" -> Classify.q29Sql,
    "q30_structured_agg" -> BalanceSheet.q30Sql,
    "q31_reconstruction" -> BalanceSheet.q31Sql,
    "q32_filename_parse" -> Edgar.q32Sql,
    "q33_seq_merge" -> Edgar.q33Sql,
    "q34_html_extract" -> Edgar.q34Sql,
    "q40_dedup_exact" -> Dedup.q40Sql,
    "q41_ngram_jaccard" -> Dedup.q41Sql,
    "q44_embed_dup" -> Dedup.q44Sql,
    "q45_ann_topk" -> Similarity.q45Sql,
    "q47_lang_id" -> TextOps.q47Sql,
    "q48_quality_score" -> TextOps.q48Sql,
    "q49_token_count" -> TextOps.q49Sql,
    "q46_ann_ivf" -> Similarity.q46Sql,
    "q50_fingerprint" -> TextOps.q50Sql,
    "q51_multimodal_meta" -> Multimodal.q51Sql,
    "q52_window_agg" -> streaming.EventStream.q52Sql,
    "q53_tfidf" -> TextOps.q53Sql,
    "q54_redact" -> TextOps.q54Sql,
    "q55_dup_clusters" -> Dedup.q55Sql,
    "q56_decontaminate" -> Dedup.q56Sql,
    "q57_repetition" -> TextOps.q57Sql,
    "q58_curation_pipeline" -> Curation.q58Sql,
    "q59_outliers" -> Relational.q59Sql,
    "q60_histogram" -> Relational.q60Sql,
    "q61_merge_upsert" -> Relational.q61Sql,
    "q62_bloom_membership" -> Dedup.q62Sql
  )
}
