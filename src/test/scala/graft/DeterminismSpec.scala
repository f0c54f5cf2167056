package graft

/** Partitioning invariance: a query's rows must not depend on
  * `spark.sql.shuffle.partitions` — the local proxy for "the same answer on
  * a 1000-executor cluster as on local[4]". Exercises the operators whose
  * implementations interact with physical partitioning the most:
  * withSeqId's range-partitioned id assignment (m1), the rank-window fusion
  * (r4), the iterative connected components (d4), and the LSH candidate
  * path (d2_neardup_lsh). */
class DeterminismSpec extends SparkSpec {

  private val QueriesToPin =
    Seq("m1_add_memories", "r4_hybrid_rrf", "d4_similar_clusters",
      "d2_neardup_lsh", "lsh_minhash_neardup",
      "tc_curation_survivors", "tc_neardup_clusters", "tc_sample_quota",
      "tc_contamination", "tc_repetition", "r2_bm25_indexed",
      "tp_pack_sequences", "tp_mixture_plan", "ann_sq8_topk", "ann_sq8_rerank",
      "ann_ivfsq8_topk", "tp_split_leakage", "tc_curation_incremental",
      "ta_unigram_nll", "tc_repeated_spans",
      // round 5: two-pass exact spans (checkpointed candidates), window
      // ranks (eval), LCG materialization, per-shard windows, paragraph
      // claim windows, micro-unit bigram sums, batch-mode stateful gate,
      // persisted-IVF build+refresh
      "tc_exact_spans", "ev_self_retrieval", "tp_mixture_apply",
      "tp_shuffle_shards", "tc_paragraph_dedup", "ta_bigram_nll",
      "sd_admit_batch", "ann_ivf_indexed", "sk_cms_heavy_terms",
      "st_sessionize",
      // round 6: within-cell pair join (semantic dedup), HOF line filters
      // over synthesized pages, the 8-arm scoped hybrid+PPR A/B
      "tc_semantic_dedup", "tc_c4_filters", "tc_c4_funnel", "ev_graph_lift",
      // round 6 additions: integer-micro-unit graph iteration, per-doc
      // rank window over corpus stats, hashed-bucket integer scoring
      "gr_pagerank", "ta_tfidf_keywords", "tc_dsir_sample", "gr_components",
      "sk_hll_distinct", "tk_bpe_merges", "tk_bpe_tokenize",
      // round 6 corpus-card additions: per-key register groupBy,
      // histogram-cumsum quantiles, id-range-sliced growth curve
      "sk_hll_by_source", "ta_length_quantiles", "ta_vocab_growth",
      "ta_zipf_slope",
      // round 7: per-(id,sub) argmin coding + literal-map ADC fold,
      // degree-ordered wedge join, cross-doc line census + order-preserving
      // reconstruction, LCG-keyed weighted top-n
      "ann_pq_topk", "ann_ivfpq_topk", "gr_triangles",
      "tc_boilerplate_lines", "tc_sample_weighted",
      "ta_pmi_collocations", "ta_term_drift", "ta_js_divergence",
      "ann_ivfpq_indexed", "tc_dup_ngram_frac", "lsh_oph_neardup",
      "tc_top_per_source", "gr_degree_dist", "gr_assortativity",
      "ta_readability", "gr_kcore", "ann_ivf_nprobe_sweep",
      "ev_hard_negatives",
      // round 8 tiers: packed-long Hamming TakeOrdered, histogram-cumsum
      // tercile thresholds, synchronous-LPA struct argmax + modularity sums
      "ann_bq_topk", "tc_ppl_buckets", "gr_communities", "gr_modularity",
      "ann_tier_sweep", "gr_components_stars", "tc_lang_share",
      "st_click_attribution", "gr_local_clustering", "s10_snapshot_diff",
      "ann_ivfbq_topk", "tp_pack_efficiency", "ann_ivf_batch",
      // round 15: the MaxSim blend tails (rank windows over checkpointed
      // bounded pools), the passage index legs (composite-pid fold +
      // probed-cell scan), the shared-probe timeline, and the two new
      // eval instruments (per-qid window ranks + integer-ppm sweep)
      "r19_passage_maxp", "r19_passage_indexed", "ev_maxsim_blend",
      "r18_maxsim_blend", "o3_timeline_indexed", "ev_passage_recall",
      "ev_maxsim_cascade_blend", "ev_maxsim_blend_sweep",
      // round 16: the index-backed evidence packet (probed-cell candidate
      // stage + the rank-key/relation/trail tail over a checkpointed pool)
      "o4_evidence_indexed")

  private def rowsAt(parts: Int, name: String): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try Queries.all(name)(spark, sf()).collect().map(_.toString).toSeq.sorted
    finally spark.conf.set("spark.sql.shuffle.partitions", 4)
  }

  for (name <- QueriesToPin)
    test(s"$name: identical rows at 3 and 8 shuffle partitions") {
      assert(rowsAt(3, name) == rowsAt(8, name))
    }
}
