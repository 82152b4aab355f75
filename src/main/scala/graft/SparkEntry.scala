package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.analytics contributes (name, query, oracle)
  * triples; queries without DuckDB-expressible semantics contribute None
  * and get the driver's weaker rows-only check.
  */
object SparkEntry {

  private def modules: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    analytics.Relational.defs ++ analytics.ChainOps.defs ++
      analytics.LLMOps.defs ++ analytics.TemporalOps.defs ++
      analytics.CurationOps.defs ++ analytics.ScaleOps.defs ++
      analytics.GraphOps.defs ++ analytics.MiningOps.defs ++
      analytics.StatsOps.defs ++ analytics.EvalOps.defs ++
      analytics.AuditOps.defs ++ analytics.InferOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pricing summary always yields the 6 (returnflag, linestatus)
    * groups regardless of scale factor.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** Members demoted from the DECLARED bench/correctness surface
    * (round 13, PERF.md's suite-budget retire clause, VERDICT r12 ask
    * #2): statistical variants and composites whose PLAN duplicates a
    * kept sibling — one anchor per plan family stays declared (q310
    * midrank, q141 contingency counts, q193 two-sample ECDF, q183
    * serial correlation, q303+q155 layout advisors, q172 conformal,
    * q283 profiling FDs, q171 blocked ER, q125 basket mining,
    * q119/q106/q160 rank-selection quantiles, q258+q57 cell-kernel+CC,
    * q37 banded minhash, q59 curation composition, q56/q95/q100/q262
    * sampling). Every demoted member remains fully implemented and
    * oracled here ([[allQueries]]/[[allOracleSql]]), is pinned by
    * DemotedSurfaceSpec's golden row-hashes at sf0.001, and is still
    * plan-audited by PlanSpec's default-deny sweeps; `graft.Verify`
    * re-includes them under SPARK_GRAFT_INCLUDE_DEMOTED=1 for local
    * wholesale oracle audits. The demotion list and its measured
    * per-pass wall cut live in PERF.md (round 13).
    */
  val demoted: Set[String] = Set(
    // two-phase midrank family (anchor: q310_mann_whitney)
    "q349_ansari_bradley", "q346_wilcoxon_signed_rank", "q320_mood_median",
    "q239_kruskal_wallis", "q248_friedman", "q351_page_trend",
    // contingency/count-test + moment-scalar family (anchor: q141_chi2_terms)
    "q321_g_test", "q294_cramers_v", "q318_cochran_armitage",
    "q247_mcnemar", "q236_prop_test", "q237_cmh_odds", "q240_anova_f",
    "q327_jarque_bera", "q339_effect_size", "q338_wilson_ci",
    "q249_cochran_q",
    // two-sample distribution tests (anchor: q193_ks_test)
    "q345_cvm_test", "q195_welch_drift", "q315_brown_forsythe",
    // serial-correlation scalar family (anchor: q183_autocorr)
    "q263_acf_ljung_box", "q323_durbin_watson", "q341_dickey_fuller",
    "q324_granger_lagf", "q347_pacf", "q322_runs_test",
    // composites / sweeps / per-pair-kernel variants of declared plans
    "q308_percolation_sweep", "q231_threshold_sweep", "q113_dedup_funnel",
    "q89_curation_v2", "q114_mad_outliers", "q271_neyman_sample",
    "q266_conformal", "q337_key_discovery", "q177_er_damerau",
    "q151_basket_triples",
    // layout-advisor family (anchors: q303_zorder_advisor, q155_zorder_layout)
    "q326_rle_advisor", "q314_hilbert_advisor", "q267_zonemap_advisor")

  /** FULL implemented surface, demoted members included — what specs,
    * plan audits, and local wholesale oracle runs exercise. */
  def allQueries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (n, f, _) => n -> f }.toMap

  def allOracleSql: Map[String, String] =
    modules.collect { case (n, _, Some(sql)) => n -> sql.trim }.toMap

  /** One entry per implemented operator from SURVEY.md §2 — the
    * DECLARED surface the driver benches and oracle-checks. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries -- demoted

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOracleSql -- demoted
}
