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

  /** Wider headroom class for DRIVER-LOOP queries (EM/merge-loop
    * trainers that collect() and re-plan several times per run —
    * q309's two EM rounds, q304's two hard-EM rounds, q290's BPE merge
    * loop): each driver round-trip is an independent exposure to host
    * load, so their measured/quiet ratio legitimately exceeds the
    * catalog median under bursty load (r10's only breach: q309 at
    * 1.49× while the median drifted 1.056×). The plan shapes are
    * separately pinned by PLANS.md, so the wall-clock gate can afford
    * the extra slack without losing regression signal. */
  val driverLoopHeadroom = 2.2
  val driverLoop: Set[String] =
    Set("q304_unigram_em", "q309_unigram_prune", "q290_bpe_encode",
      "q286_bpe_train", "q318_unigram_encode")

  /** Wider headroom class for WRITE-BOUND queries (r11 judge ask —
    * kills the q319-class false breach, round 3 of exactly one):
    * these queries' wall time is dominated by writing whole table /
    * index layouts to a temp dir (q310 writes lineitem twice; q314 and
    * q319 build the manifest table then OPTIMIZE it; q325 writes,
    * splits and swaps a partitioned ANN index; q312 rebuilds index
    * partitions; q328 rewrites merge-touched files). Disk writes on a
    * shared loaded host drift MORE than the catalog's CPU-median
    * (BENCH_r11: q319 1.78× its quiet min while the median drifted
    * 1.225×), so the median normalization under-corrects exactly this
    * class. Plan shapes stay pinned by PLANS.md + SketchLayoutSpec /
    * ManifestSpec, so the wall gate affords IO slack without losing
    * regression signal — same adjudication as [[driverLoop]]. */
  val ioBoundHeadroom = 2.2
  val ioBound: Set[String] =
    Set("q310_zorder_prune", "q314_zorder_optimize",
      "q319_manifest_timetravel", "q325_ivf_rebalance",
      "q312_ivfpq_delete", "q328_manifest_merge",
      // r12 headliners: all manifest-commit protocols (multiple staged
      // writes + image/tombstone files per run) or a 5-commit pipeline
      "q336_manifest_stream", "q337_manifest_cdc",
      "q338_manifest_delete", "q340_curation_pipeline")

  /** Drift cap (ADVICE r10): median normalization must not be able to
    * mask a CATALOG-WIDE regression (a change slowing a shared path —
    * parquet scan, codegen — moves the median and would be divided
    * back out of every budget). Above this the scale stops growing
    * and Bench self-reports "drift_warn" so a genuinely loaded run
    * stays distinguishable from a broad slowdown. 1.5 is the
    * documented host-variance envelope (r9/r10 driver runs measured
    * medians 1.06–1.3 under heavy load). */
  val driftCap = 1.5

  /** min-of-3 from one quiet sf0.1 session (RE-BASELINED r12 after
    * the optimization pass: the r10/r11 mins predate the round's
    * ~18% catalog speedup and would have left every budget loose
    * enough to hide a real regression; drift_raw of the baselining
    * run was 1.0. q336-q340 get first-ever baselines here). */
  val sf01QuietMin: Map[String, Double] = Map(
    "q01_agg_basic" -> 0.795,
    "q04_grouping_sets" -> 1.002,
    "q100_tpch_q2" -> 0.99,
    "q103_tpch_q9" -> 1.604,
    "q107_tpch_q21" -> 1.741,
    "q108_dup_span" -> 1.64,
    "q10_join_star" -> 1.082,
    "q111_ds_union_rollup" -> 1.208,
    "q112_ds_yoy_selfjoin" -> 1.135,
    "q116_ds_rollup_rank" -> 1.402,
    "q11_join_left" -> 0.664,
    "q210_bloom_decontaminate" -> 1.435,
    "q211_pq_ann" -> 1.574,
    "q214_surprisal_score" -> 0.946,
    "q21_setop_all" -> 1.254,
    "q220_token_budget_select" -> 0.869,
    "q231_dup_spans_maximal" -> 1.479,
    "q242_avro_roundtrip" -> 0.661,
    "q261_gaussian_outliers" -> 0.74,
    "q262_dim_correlation" -> 1.02,
    "q268_ivfpq_exact" -> 2.451,
    "q270_fluent_pipeline" -> 1.022,
    "q279_bm25_topk" -> 1.71,
    "q27_tpch_q5" -> 1.157,
    "q280_winnow_dedup" -> 1.903,
    "q288_fluent_over" -> 1.321,
    "q290_bpe_encode" -> 2.33,
    "q291_dup_span_witness" -> 2.423,
    "q298_cms_heavy_hitters" -> 1.281,
    "q299_entropy_gate" -> 1.856,
    "q29_tpch_q18" -> 1.167,
    "q300_zorder_layout" -> 1.664,
    "q304_unigram_em" -> 1.157,
    "q309_unigram_prune" -> 0.881,
    "q30_over_rank" -> 1.006,
    "q310_zorder_prune" -> 2.672,
    "q311_scd2_asof" -> 1.606,
    "q312_ivfpq_delete" -> 3.666,
    "q313_cms_stream" -> 3.502,
    "q314_zorder_optimize" -> 3.062,
    "q315_backoff_lm" -> 1.282,
    "q319_manifest_timetravel" -> 2.663,
    "q322_kll_cube" -> 1.328,
    "q325_ivf_rebalance" -> 4.219,
    "q328_manifest_merge" -> 3.636,
    "q329_theta_setops" -> 0.917,
    "q330_kneser_ney" -> 1.279,
    "q336_manifest_stream" -> 2.256,
    "q337_manifest_cdc" -> 4.569,
    "q338_manifest_delete" -> 2.486,
    "q339_adaptive_salt_join" -> 1.533,
    "q340_curation_pipeline" -> 5.351,
    "q35_topn_per_key" -> 0.701,
    "q46_unnest_words" -> 0.411,
    "q52_window_session" -> 1.052,
    "q54_asof_join" -> 0.811,
    "q59_asof_exec" -> 0.848,
    "q64_minhash_sig" -> 0.69,
    "q66_ngram_jaccard" -> 1.125,
    "q70_knn_brute" -> 0.507,
    "q72_lsh_ann" -> 0.349,
    "q73_embed_neardup" -> 0.795,
    "q76_repetition" -> 1.173,
    "q78_curate" -> 0.802,
    "q79_simhash_neardup" -> 0.769,
    "q85_tpch_q7" -> 1.173,
    "q88_cep_nofollow" -> 0.756,
    "q89_tpch_q4" -> 1.499,
    "q91_tpch_q19" -> 0.597)
  /** Budget before drift scaling: quiet min × headroom, ≥ 0.5 s. */
  def budget(n: String): Option[Double] =
    sf01QuietMin.get(n).map { m =>
      val h =
        if (driverLoop(n)) driverLoopHeadroom
        else if (ioBound(n)) ioBoundHeadroom
        else headroom
      math.max(m * h, 0.5)
    }

  /** Raw median measured/quiet-min over the catalog, clamped ≥ 1.0 —
    * uniform host-load drift. */
  def driftRaw(results: Seq[(String, Double)]): Double = {
    val ratios = results
      .flatMap { case (n, t) => sf01QuietMin.get(n).map(t / _) }
      .sorted
    if (ratios.isEmpty) 1.0 else math.max(1.0, ratios(ratios.size / 2))
  }

  /** The drift actually divided out of budgets: raw, capped at
    * [[driftCap]] so a catalog-wide slowdown stays visible. */
  def driftScale(results: Seq[(String, Double)]): Double =
    math.min(driftRaw(results), driftCap)

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
