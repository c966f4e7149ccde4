package graft

/** Per-query wall-time budgets for the bench regression gate — the
  * round-7 driver-run times (BENCH_r07.json, sf0.1, local[32]) plus
  * 40% headroom (the documented host-variance envelope is 10-15%, so
  * a breach is a real plan/operator regression, not noise), floored
  * at 0.5 s so sub-second queries cannot flake the gate.
  *
  * Two consumers:
  *  - [[Bench]] always compares its timed results against these and
  *    self-reports breaches in the metrics JSON ("budget_breaches"),
  *    so every BENCH_rN artifact carries its own regression verdict;
  *  - [[BenchGateSpec]] turns breaches into a red test when
  *    GRAFT_BENCH_GATE=1 (opt-in: wall-time tests on a loaded shared
  *    host would flake the correctness suite otherwise).
  *
  * Queries added after r7 get budgets on the next re-baseline; absent
  * names are exempt by design.
  */
object BenchBudgets {
  val sf01Budgets: Map[String, Double] = Map(
    // r8 additions, baselined from this round's quiet runs × 1.4
    "q268_ivfpq_exact" -> 3.93,
    "q270_fluent_pipeline" -> 1.17,
    "q279_bm25_topk" -> 2.17,
    "q280_winnow_dedup" -> 2.92,
    "q01_agg_basic" -> 1.18,
    "q04_grouping_sets" -> 1.25,
    "q100_tpch_q2" -> 1.42,
    "q103_tpch_q9" -> 2.1,
    "q107_tpch_q21" -> 2.16,
    "q108_dup_span" -> 2.04,
    "q10_join_star" -> 1.26,
    "q111_ds_union_rollup" -> 1.49,
    "q112_ds_yoy_selfjoin" -> 1.33,
    "q116_ds_rollup_rank" -> 1.86,
    "q11_join_left" -> 0.66,
    "q210_bloom_decontaminate" -> 1.58,
    "q211_pq_ann" -> 2.27,
    "q214_surprisal_score" -> 0.91,
    "q21_setop_all" -> 1.55,
    "q220_token_budget_select" -> 1.04,
    "q231_dup_spans_maximal" -> 1.71,
    "q242_avro_roundtrip" -> 0.78,
    "q261_gaussian_outliers" -> 0.81,
    "q262_dim_correlation" -> 1.25,
    "q27_tpch_q5" -> 1.57,
    "q29_tpch_q18" -> 1.66,
    "q30_over_rank" -> 1.26,
    "q35_topn_per_key" -> 0.96,
    "q46_unnest_words" -> 0.63,
    "q52_window_session" -> 1.27,
    "q54_asof_join" -> 0.94,
    "q59_asof_exec" -> 1.01,
    "q64_minhash_sig" -> 0.89,
    "q66_ngram_jaccard" -> 1.55,
    "q70_knn_brute" -> 0.78,
    "q72_lsh_ann" -> 0.54,
    "q73_embed_neardup" -> 1.02,
    "q76_repetition" -> 1.33,
    "q78_curate" -> 0.98,
    "q79_simhash_neardup" -> 0.94,
    "q85_tpch_q7" -> 1.49,
    "q88_cep_nofollow" -> 0.99,
    "q89_tpch_q4" -> 1.89,
    "q91_tpch_q19" -> 0.81)

  /** Names whose measured min exceeds budget (only at the sf0.1 scale
    * the budgets were taken at). */
  def breaches(sfDir: String, results: Seq[(String, Double)]): Seq[(String, Double, Double)] =
    if (!sfDir.endsWith("sf0.1")) Seq.empty
    else results.flatMap { case (n, t) =>
      sf01Budgets.get(n).filter(_ < t).map(b => (n, t, b))
    }
}
