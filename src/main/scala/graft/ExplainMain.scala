package graft
import org.apache.spark.sql.SparkSession
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    // the localized eval entries return LocalTableScans; their lazy
    // plan twins show the shape the production pass actually executes
    val planOverrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "ann_recall_eval" -> (graft.query.AnnQuery.annRecallEvalPlan _),
      "ann_diagnostics" -> (graft.eval.QueryDiagnostics.annDiagnosticsPlan _))
    for (name <- Seq("q1_pricing", "q6_revenue", "q3_shipping", "q5_local_volume",
        "ann_brute_topk", "ann_lsh_topk", "ann_lsh_topk_distjoin", "dedup_minhash", "neardup_embedding", "simsearch_ivf", "query_token", "embed_quantize",
        "index_insert", "key_deletion", "dedup_clusters", "ann_diagnostics",
        "ann_filtered_topk", "ann_lsh_filtered_topk", "sample_stratified", "seq_pack",
        "multimodal_embed", "data_mix", "decontaminate", "pii_scrub",
        "quality_filter", "ann_multidim_topk", "ann_multidim_brute",
        "ann_recall_eval", "multimodal_resize", "multimodal_frames",
        "text_search_bm25", "hybrid_search_rrf", "knn_join", "dedup_semantic",
        "ann_ivfpq_topk", "embed_pq", "quality_classifier", "text_normalize",
        "corpus_stats", "decontaminate_semantic", "data_mix_temperature",
        "dedup_lines", "dedup_substring", "lm_score", "tfidf_topterms",
        "corpus_shuffle",
        // round 7
        "lm_score_trigram", "lm_score_5gram", "dedup_substring_apply", "url_filter",
        "doc_chunk", "split_overlap", "jsonl_roundtrip", "wet_roundtrip",
        "quality_threshold", "perplexity_bucket", "dsir_select",
        "dsir_sample", "tokenizer_fertility", "corpus_curate",
        // round 8
        "warc_roundtrip", "token_count_unigram", "host_stats",
        "dedup_minhash_tune", "embed_sq", "ann_sq_topk", "ann_ivfsq_topk",
        "ngram_cms_topk",
        // round 9 (ann_tier_report omitted: a driver-side metric
        // report over the component entries' plans, all listed above)
        "dedup_minhash_delta", "corpus_curate_materialized",
        "tokenizer_compare", "lang_id_trained",
        "embed_bq", "ann_bq_topk", "ann_ivfbq_topk", "ivf_stats",
        "data_mix_plan", "corpus_diff", "dedup_minhash_delta_apply",
        "quality_ablation",
        "quality_signals_delta", "dedup_minhash_compact", "ivf_rebalance")) {
      println(s"===== $name =====")
      println(planOverrides.getOrElse(name, SparkEntry.queries(name))(spark, sf)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
