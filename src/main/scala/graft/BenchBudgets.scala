package graft

/** Per-query wall-time budgets for the bench regression gate —
  * re-baselined ROUND 9 from one quiet-host session (min of 3
  * back-to-back sf0.1 local[32] runs, 2026-08-15, load ≈ 1.6) plus
  * 40% headroom (the documented host-variance envelope is 10-15%, so
  * a breach is a real plan/operator regression, not noise), floored
  * at 0.5 s so sub-second queries cannot flake the gate. Every one of
  * the first 47 headline queries carries a budget from the SAME
  * session — the r8 mix of r7-derived and r8-quiet numbers is gone,
  * so the next uniform-drift round is separable from plan regressions
  * by construction; the 4 r9-second-wave additions (q298/q299/q300/
  * q304) are baselined from their own min-of-3 session a day later.
  * The raw mins live in the r9 bench notes; BENCH_r09 is the
  * comparison floor.
  *
  * Two consumers:
  *  - [[Bench]] always compares its timed results against these and
  *    self-reports breaches in the metrics JSON ("budget_breaches"),
  *    so every BENCH_rN artifact carries its own regression verdict;
  *  - [[BenchGateSpec]] turns breaches into a red test when
  *    GRAFT_BENCH_GATE=1 (opt-in: wall-time tests on a loaded shared
  *    host would flake the correctness suite otherwise).
  *
  * Queries added after r9 get budgets on the next re-baseline; absent
  * names are exempt by design.
  */
object BenchBudgets {
  val sf01Budgets: Map[String, Double] = Map(
    "q01_agg_basic" -> 1.18,
    "q04_grouping_sets" -> 1.29,
    "q100_tpch_q2" -> 1.17,
    "q103_tpch_q9" -> 1.83,
    "q107_tpch_q21" -> 2.04,
    "q108_dup_span" -> 2.04,
    "q10_join_star" -> 1.43,
    "q111_ds_union_rollup" -> 1.57,
    "q112_ds_yoy_selfjoin" -> 1.23,
    "q116_ds_rollup_rank" -> 1.69,
    "q11_join_left" -> 0.74,
    "q210_bloom_decontaminate" -> 1.35,
    "q211_pq_ann" -> 2.35,
    "q214_surprisal_score" -> 0.99,
    "q21_setop_all" -> 1.69,
    "q220_token_budget_select" -> 0.82,
    "q231_dup_spans_maximal" -> 1.76,
    "q242_avro_roundtrip" -> 0.81,
    "q261_gaussian_outliers" -> 0.74,
    "q262_dim_correlation" -> 1.14,
    "q268_ivfpq_exact" -> 3.71,
    "q270_fluent_pipeline" -> 1.12,
    "q279_bm25_topk" -> 1.96,
    "q27_tpch_q5" -> 1.65,
    "q280_winnow_dedup" -> 2.87,
    "q288_fluent_over" -> 1.43,
    "q290_bpe_encode" -> 2.63,
    "q291_dup_span_witness" -> 2.94,
    // r9 second wave: min-of-3 sf0.1 runs (2026-08-16, load ≈ 2.5) × 1.4
    "q298_cms_heavy_hitters" -> 1.54,
    "q299_entropy_gate" -> 2.27,
    "q300_zorder_layout" -> 2.68,
    "q304_unigram_em" -> 2.25,
    "q29_tpch_q18" -> 1.58,
    "q30_over_rank" -> 1.3,
    "q35_topn_per_key" -> 0.91,
    "q46_unnest_words" -> 0.56,
    "q52_window_session" -> 1.23,
    "q54_asof_join" -> 0.88,
    "q59_asof_exec" -> 0.81,
    "q64_minhash_sig" -> 0.73,
    "q66_ngram_jaccard" -> 1.45,
    "q70_knn_brute" -> 0.64,
    "q72_lsh_ann" -> 0.5,
    "q73_embed_neardup" -> 0.96,
    "q76_repetition" -> 1.29,
    "q78_curate" -> 0.82,
    "q79_simhash_neardup" -> 0.98,
    "q85_tpch_q7" -> 1.56,
    "q88_cep_nofollow" -> 0.79,
    "q89_tpch_q4" -> 1.59,
    "q91_tpch_q19" -> 0.75)

  /** Names whose measured min exceeds budget (only at the sf0.1 scale
    * the budgets were taken at). */
  def breaches(sfDir: String, results: Seq[(String, Double)]): Seq[(String, Double, Double)] =
    if (!sfDir.endsWith("sf0.1")) Seq.empty
    else results.flatMap { case (n, t) =>
      sf01Budgets.get(n).filter(_ < t).map(b => (n, t, b))
    }
}
