package graft

/** Per-query wall-time budgets for the bench regression gate.
  *
  * Baseline = `sf01QuietMin`: the min of 3 back-to-back sf0.1
  * local[32] runs from ONE session (re-baselined ROUND 10, all 58
  * headline queries from the same session — see the r10 bench notes).
  * Budget = quiet min × 1.4 headroom, floored at 0.5 s so sub-second
  * queries cannot flake the gate.
  *
  * DRIFT NORMALIZATION (round 10 — kills the false breaches the r9
  * driver run produced): a shared loaded host drifts the WHOLE
  * catalog roughly uniformly (r9: 6/6 breaches were load, zero plan
  * changes), so before comparing, every budget is scaled by the
  * MEDIAN of measured/quiet-min across the catalog. A real
  * single-query plan regression cannot move the median, so it still
  * breaches; uniform host load moves every ratio together and is
  * divided back out. The scale is clamped below at 1.0 (a
  * faster-than-baseline host must not mask a regression) and rides
  * the metrics JSON as "drift_scale" so each BENCH_rN artifact
  * records the load it was taken under.
  *
  * Two consumers:
  *  - [[Bench]] always compares its timed results against these and
  *    self-reports breaches in the metrics JSON ("budget_breaches");
  *  - [[BenchGateSpec]] turns breaches into a red test when
  *    GRAFT_BENCH_GATE=1 (opt-in: wall-time tests on a loaded shared
  *    host would flake the correctness suite otherwise).
  *
  * Queries added after the baseline session get budgets on the next
  * re-baseline; absent names are exempt by design.
  */
object BenchBudgets {

  val headroom = 1.4

  /** min-of-3 from one quiet sf0.1 session (re-baselined r10). */
  val sf01QuietMin: Map[String, Double] = Map(
    "q01_agg_basic" -> 0.843,
    "q04_grouping_sets" -> 0.921,
    "q100_tpch_q2" -> 0.836,
    "q103_tpch_q9" -> 1.307,
    "q107_tpch_q21" -> 1.457,
    "q108_dup_span" -> 1.457,
    "q10_join_star" -> 1.021,
    "q111_ds_union_rollup" -> 1.121,
    "q112_ds_yoy_selfjoin" -> 0.879,
    "q116_ds_rollup_rank" -> 1.207,
    "q11_join_left" -> 0.529,
    "q210_bloom_decontaminate" -> 0.964,
    "q211_pq_ann" -> 1.679,
    "q214_surprisal_score" -> 0.707,
    "q21_setop_all" -> 1.207,
    "q220_token_budget_select" -> 0.586,
    "q231_dup_spans_maximal" -> 1.257,
    "q242_avro_roundtrip" -> 0.579,
    "q261_gaussian_outliers" -> 0.529,
    "q262_dim_correlation" -> 0.814,
    "q268_ivfpq_exact" -> 2.650,
    "q270_fluent_pipeline" -> 0.800,
    "q279_bm25_topk" -> 1.400,
    "q27_tpch_q5" -> 1.179,
    "q280_winnow_dedup" -> 2.050,
    "q288_fluent_over" -> 1.021,
    "q290_bpe_encode" -> 1.879,
    "q291_dup_span_witness" -> 2.100,
    "q298_cms_heavy_hitters" -> 1.100,
    "q299_entropy_gate" -> 1.621,
    "q300_zorder_layout" -> 1.914,
    "q304_unigram_em" -> 1.607,
    "q29_tpch_q18" -> 1.129,
    "q30_over_rank" -> 0.929,
    "q35_topn_per_key" -> 0.650,
    "q46_unnest_words" -> 0.400,
    "q52_window_session" -> 0.879,
    "q54_asof_join" -> 0.629,
    "q59_asof_exec" -> 0.579,
    "q64_minhash_sig" -> 0.521,
    "q66_ngram_jaccard" -> 1.036,
    "q70_knn_brute" -> 0.457,
    "q72_lsh_ann" -> 0.357,
    "q73_embed_neardup" -> 0.686,
    "q76_repetition" -> 0.921,
    "q78_curate" -> 0.586,
    "q79_simhash_neardup" -> 0.700,
    "q85_tpch_q7" -> 1.114,
    "q88_cep_nofollow" -> 0.564,
    "q89_tpch_q4" -> 1.136,
    "q91_tpch_q19" -> 0.536)

  /** Budget before drift scaling: quiet min × headroom, ≥ 0.5 s. */
  def budget(n: String): Option[Double] =
    sf01QuietMin.get(n).map(m => math.max(m * headroom, 0.5))

  /** Median measured/quiet-min over the catalog, clamped ≥ 1.0 —
    * uniform host-load drift, divided back out of every budget. */
  def driftScale(results: Seq[(String, Double)]): Double = {
    val ratios = results
      .flatMap { case (n, t) => sf01QuietMin.get(n).map(t / _) }
      .sorted
    if (ratios.isEmpty) 1.0 else math.max(1.0, ratios(ratios.size / 2))
  }

  /** Names whose measured min exceeds the drift-scaled budget (only
    * at the sf0.1 scale the baselines were taken at). */
  def breaches(sfDir: String, results: Seq[(String, Double)]): Seq[(String, Double, Double)] =
    if (!sfDir.endsWith("sf0.1")) Seq.empty
    else {
      val scale = driftScale(results)
      results.flatMap { case (n, t) =>
        budget(n).map(_ * scale).filter(_ < t).map(b => (n, t, b))
      }
    }
}
