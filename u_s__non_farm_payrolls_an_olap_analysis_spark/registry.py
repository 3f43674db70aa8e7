"""Assembles the driver contract: ``queries()`` and ``oracle_sql()``.

Each operator module exposes ``QUERIES`` (name → (spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name → DuckDB SQL). This module merges them and enforces the
invariants the driver's correctness gate depends on:

- no duplicate names across modules;
- every oracle key has a query (queries without an oracle are allowed —
  they get the driver's weaker rows-only check and are listed in
  ``NO_ORACLE`` with a reason).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    aggregates,
    analytics,
    custom_udf,
    dedup,
    graph,
    incremental,
    joins,
    json_ops,
    layout,
    llm_prep,
    multimodal,
    olap,
    reshape,
    sampling,
    scalars,
    setops,
    similarity,
    sketches,
    sources,
    sql_api,
    text,
    tpch_analytics,
    tpch_partsupp,
)
from .streaming import stateful, stream_windows

QueryFn = Callable[[SparkSession, str], DataFrame]

# Merge order IS the driver's CORRECTNESS sample order (first 50 keys are
# hashed against their DuckDB oracles each round). Round-5 rotation: the
# tail keys never driver-sampled in rounds 1-4 lead (tpch additions,
# sources, sql_dashboard, round-3/4 joins/aggregates additions, and
# analytics' dq_anomaly_zscore — its module dict is ordered to put that
# key first). The brand-new Q2/Q9/Q20 partsupp shapes lead outright; the
# three keys they displace from slot 47-49 (window_distribution_ranks /
# first_last_nth / trailing_range_frame) all have green r4 rows. The
# LLM-pipeline pack got its rows in round 4 and rotates to the tail; olap
# has rows from rounds 1-3.
_MODULES = [
    tpch_partsupp,
    tpch_analytics,
    sources,
    sql_api,
    joins,
    aggregates,
    analytics,
    dedup,
    similarity,
    graph,
    text,
    llm_prep,
    multimodal,
    json_ops,
    setops,
    custom_udf,
    stream_windows,
    reshape,
    scalars,
    sampling,
    sketches,
    olap,
    layout,
    incremental,
    stateful,
]


# The driver samples the FIRST 50 keys of queries() each round; this
# list leads the iteration so module insertion order can't push a key
# that needs a fresh CORRECTNESS row out of the window. Guarded by
# tests/test_registry_contract.py (subset, duplicate-free, leads
# iteration) — prune entries once their round's JSON records them
# (CLAUDE.md rule 7).
# Round-13 rotation: all 50 keys recorded in CORRECTNESS_r12.json pruned
# (the entire round-12 new-key batch plus holt got fresh green rows).
# What remains is the r6-evidence TPC-H tail that rolled past the window
# two rounds running; new round-13 keys slot in AHEAD of it (a new key
# has no driver row anywhere, so it outranks keys with historical
# evidence). Prune the r13-recorded keys next round.
_SAMPLE_PRIORITY = [
    # NEW in round 13 — Welch unequal-variance t-test (URGENT vs LOW)
    "agg_welch_ttest",
    # NEW in round 13 — one-way ANOVA F across all priorities
    "agg_oneway_anova",
    # NEW in round 13 — Kendall tau-b concordance on the monthly series
    "agg_kendall_tau",
    # NEW in round 13 — Jarque-Bera normality test per ship year
    "agg_jarque_bera",
    # NEW in round 13 — nearest-centroid confusion matrix + per-class F1
    "sim_eval_centroid_confusion",
    # NEW in round 13 — one-vs-rest ROC AUC via the rank-sum identity
    "sim_eval_roc_auc_ovr",
    # NEW in round 13 — QUALIFY dialect mapping (subquery form on Spark)
    "sql_qualify_topk_dialect",
    # NEW in round 13 — ntile/cume_dist/percent_rank decile summary
    "window_cume_dist_deciles",
    # NEW in round 13 — Watts-Strogatz local clustering coefficient
    "graph_clustering_coefficient",
    # NEW in round 13 — Jaccard-coefficient link prediction
    "graph_link_prediction_jaccard",
    # NEW in round 13 — hapax/dis legomena vocabulary stats by source
    "text_hapax_ratio",
    # NEW in round 13 — blocked Levenshtein edit-distance near-dedup
    "dedup_levenshtein_blocked",
    # NEW in round 13 — URGENT/LOW cross-correlation function at ±6 lags
    "timeseries_ccf",
    # NEW in round 13 — Yule-Walker AR(2) fit off the exact correlogram
    "timeseries_ar2_yule_walker",
    # NEW in round 13 — top event-type trigram paths (sequence mining)
    "events_user_path_trigrams",
    # NEW in round 13 — inter-arrival gap statistics per event type
    "events_inter_arrival_stats",
    # NEW in round 13 — Cramér's V / contingency C / Tschuprow T
    "agg_contingency_effect_sizes",
    # NEW in round 13 — bigram collocation mining ranked by exact lift
    "text_collocation_lift",
    # NEW in round 13 — customer revenue Gini + top-decile share
    "agg_gini_customer_revenue",
    # NEW in round 13 — per-column completeness/distinctness profile
    "dq_completeness_profile",
    # NEW in round 13 — DAU/MAU stickiness per month
    "events_dau_mau_stickiness",
    # NEW in round 13 — Cohen's kappa of the nearest-centroid classifier
    "sim_eval_cohens_kappa",
    # NEW in round 13 — deterministic class-balanced downsample
    "sample_balanced_class_downsample",
    # NEW in round 13 — max drawdown vs running peak per priority
    "window_drawdown",
    # NEW in round 13 — hour-of-day activity profile per event type
    "events_hourly_profile",
    # NEW in round 13 — PACF lags 1-3 in closed Cramer form
    "timeseries_pacf",
    # NEW in round 13 — two-proportion z-test of finish rates
    "agg_two_proportion_ztest",
    # NEW in round 13 — Pareto 80/20 event-volume concentration
    "events_pareto_8020",
    # NEW in round 13 — per-source duplication-rate report
    "dedup_rate_by_source",
    # NEW in round 13 — SCD Type-2 priority history build
    "scd2_customer_priority_history",
    # NEW in round 13 — SES alpha grid search by one-step-ahead SSE
    "timeseries_ses_grid_search",
    # NEW in round 13 — accuracy-vs-score-margin reliability table
    "sim_eval_margin_reliability",
    # NEW in round 13 — zero-exchange CEP off the user-bucketed layout
    "events_pattern_match_clustered",
    # NEW in round 13 — sample ACF correlogram, exact-integer z-products
    "timeseries_acf",
    # NEW in round 13 — Resource-Allocation link prediction (posting-list)
    "graph_link_prediction_ra",
    # NEW in round 13 — full iterative BPE merge-learning loop
    "vocab_bpe_learn_merges",
    # NEW in round 13 — MMR diversified retrieval re-ranking
    "sim_search_mmr_diversified",
    # NEW in round 13 — Gonzalez farthest-first k-center coreset
    "sample_coreset_kcenter",
    # NEW in round 13 — Tukey running-median smoother + residuals
    "timeseries_moving_median",
    # NEW in round 13 — seasonal-naive forecast backtest scored by MASE
    "timeseries_seasonal_naive_mase",
    # NEW in round 13 — gaps-and-islands growth streaks
    "window_gaps_islands",
    # NEW in round 13 — exact-integer DFT periodogram at seasonal periods
    "timeseries_periodogram",
    # NEW in round 13 — retrieval eval: MRR + recall@k vs label truth
    "sim_eval_mrr_recall",
    # NEW in round 13 — fixed-round k-core peel of the co-purchase graph
    "graph_kcore_peel",
    # NEW in round 13 — exact population skewness/kurtosis via raw moments
    "agg_skew_kurtosis",
    # NEW in round 13 — Neyman optimal stratified allocation
    "sample_neyman_allocation",
    # NEW in round 13 — ratio-to-report share within year
    "window_share_of_total",
    # NEW in round 13 — Gini/Berger-Parker token concentration
    "corpus_gini_by_source",
    # NEW in round 13 — Wald–Wolfowitz runs test on MoM directions
    "timeseries_runs_test",
    # NEW in round 13 — GROUP BY ALL / ORDER BY ALL shared dialect
    "sql_group_by_all",
    # NEW in round 13 — Ljung–Box portmanteau test over the ACF lags
    "timeseries_ljung_box",
    # NEW in round 13 — distributed PCA top component by power iteration
    "embedding_pca_power_iteration",
    # NEW in round 13 — clustering eval: codebook purity vs labels
    "sim_eval_cluster_purity",
    # NEW in round 13 — Kaplan–Meier censored time-to-convert
    "events_survival_km",
    # NEW in round 13 — Mann–Whitney U rank-sum test (tie-corrected)
    "agg_mann_whitney_u",
    # NEW in round 13 — portable-md5 MinHash-LSH with measured recall
    "dedup_eval_minhash_lsh",
    # NEW in round 13 — Pearson chi-square independence (status x priority)
    "agg_chi_square_independence",
    # NEW in round 13 — deterministic half-sample bootstrap CI
    "agg_halfsample_ci",
    # NEW in round 13 — Bollinger bands (rolling mean ± 2 rolling sd)
    "window_bollinger_bands",
    # NEW in round 13 — per-doc TTR + Guiraud lexical diversity
    "text_lexical_diversity",
    # NEW in round 13 — customer-cohort LTV triangle (cumulative revenue)
    "rollup_cohort_ltv",
    # NEW in round 13 — mutual information / NMI of status x priority
    "agg_mutual_information",
    # NEW in round 13 — AR(1) fit + mean-reversion half-life
    "timeseries_ar1_halflife",
    # NEW in round 13 — candidate-key uniqueness profile (GROUPING SETS)
    "dq_key_uniqueness",
    # NEW in round 13 — rolling 6-month OLS trend slope per priority
    "window_rolling_ols_slope",
    # NEW in round 13 — Flesch reading-ease readability per source
    "text_readability",
    # NEW in round 13 — frontier BFS hop distance from the hub part
    "graph_bfs_hops",
    # NEW in round 13 — lexicon sentiment polarity/subjectivity per doc
    "text_sentiment_lexicon",
    # NEW in round 13 — point-in-time join against the SCD2 history
    "scd2_point_in_time_join",
    # NEW in round 13 — log-log price elasticity of demand per brand
    "agg_price_elasticity",
    # NEW in round 13 — int8-coarse -> exact-cosine cascade rerank
    "sim_search_cascade_rerank",
    # NEW in round 13 — Benjamini-Hochberg FDR over per-year z-tests
    "agg_benjamini_hochberg",
    # NEW in round 13 — exact 10%-trimmed mean per year
    "agg_trimmed_mean",
    # NEW in round 13 — Heaps-law vocabulary-growth fit across sources
    "corpus_heaps_law_fit",
    # NEW in round 13 — FPP trend/seasonal strength off the decompose
    "timeseries_seasonal_strength",
    # NEW in round 13 — rescaled-range (R/S) Hurst exponent
    "agg_hurst_rs",
    # NEW in round 13 — NDCG@k position-discounted retrieval eval
    "sim_eval_ndcg",
    # NEW in round 13 — Tukey IQR boxplot fences per year
    "dq_outlier_iqr_fences",
    # NEW in round 13 — per-source KL divergence from the corpus blend
    "text_kl_divergence_by_source",
    # NEW in round 13 — entropy rate of the event Markov chain
    "events_entropy_rate_markov",
    # NEW in round 13 — Cohen's d / Hedges' g effect size
    "agg_cohens_d_effect_size",
    # NEW in round 13 — Fano-factor term burstiness (top-30 terms)
    "text_burstiness_fano",
    # NEW in round 13 — Kruskal–Wallis H across all priorities
    "agg_kruskal_wallis",
    # NEW in round 13 — Newman degree assortativity coefficient
    "graph_degree_assortativity",
    # NEW in round 13 — two-sample Kolmogorov–Smirnov statistic
    "agg_ks_two_sample",
    # NEW in round 13 — Spearman rank correlation (price vs line count)
    "agg_spearman_rank_corr",
    # NEW in round 13 — Brown-Forsythe robust equality-of-variances test
    "agg_levene_brown_forsythe",
    # NEW in round 13 — Mood's median test at the grand median
    "agg_mood_median_test",
    # NEW in round 13 — Grubbs max-studentized-deviate outlier test
    "agg_grubbs_outlier",
    # NEW in round 13 — Simpson/Gini-Simpson/inverse-Simpson diversity
    "corpus_simpson_diversity",
    # NEW in round 13 — average precision @ k retrieval eval
    "sim_eval_average_precision",
    # NEW in round 13 — damped-trend Holt smoothing (Gardner-McKenzie)
    "timeseries_holt_damped",
    # NEW in round 13 — delta-method SE/CI for the ratio metric
    "agg_delta_method_ratio_ci",
    # NEW in round 13 — HITS hubs/authorities on the purchase graph
    "graph_hits_scores",
    # NEW in round 13 — Cochran-Armitage ordered trend test
    "agg_cochran_armitage_trend",
    # NEW in round 13 — KPSS level-stationarity statistic per priority
    "timeseries_kpss_stat",
    # NEW in round 13 — G-test (likelihood-ratio) independence
    "agg_gtest_independence",
    # NEW in round 13 — exact 10%-winsorized mean per year
    "agg_winsorized_mean",
    # NEW in round 13 — simplified (centroid) silhouette per cluster
    "sim_eval_silhouette",
    # NEW in round 13 — YTD vs prior-year YTD with YoY growth
    "window_ytd_vs_prior_year",
    # NEW in round 13 — hash A/B assignment + sample-ratio-mismatch check
    "agg_srm_assignment_check",
    # NEW in round 13 — streaming per-user inter-arrival EWMA (stateful)
    "stream_interarrival_ewma",
    # NEW in round 13 — Gumbel block-maxima fit + 12-block return level
    "agg_extreme_value_gumbel",
    # NEW in round 13 — McNemar paired year-over-year activity test
    "agg_mcnemar_yearly_activity",
    # NEW in round 13 — daily bounce rate off the 30-min sessionization
    "events_bounce_rate_daily",
    # NEW in round 13 — Chapman capture-recapture coverage estimate
    "agg_capture_recapture_customers",
    # NEW in round 13 — Theta-method forecast (OLS line + SES blend)
    "timeseries_theta_forecast",
    # NEW in round 13 — stationary distribution of the event chain
    "events_markov_stationary",
    # NEW in round 13 — Lorenz curve tabulated at customer deciles
    "agg_lorenz_curve_deciles",
    # NEW in round 13 — leave-one-out Jensen-Shannon divergence
    "text_js_divergence_by_source",
    # NEW in round 13 — Durbin-Watson residual autocorrelation
    "timeseries_durbin_watson",
    # NEW in round 13 — Herfindahl brand concentration per ship year
    "agg_herfindahl_brand_hhi",
    # NEW in round 13 — perceptual-hash dedup over the media column
    "multimodal_phash_dedup",
    # NEW in round 13 — Mann-Kendall nonparametric trend test
    "timeseries_mann_kendall",
    # NEW in round 13 — decision-stump Gini split search
    "agg_decision_stump_gini",
    # NEW in round 13 — expected/maximum calibration error (ECE/MCE)
    "sim_eval_ece",
    # NEW in round 13 — view->purchase conversion latency quantiles
    "events_conversion_latency_quantiles",
    # NEW in round 13 — Laspeyres/Paasche/Fisher price indices
    "agg_price_index_laspeyres",
    # NEW in round 13 — CSV write->schema-pinned-read round-trip
    "source_csv_roundtrip",
    # NEW in round 13 — odds ratio / relative risk with Woolf/Katz CIs
    "agg_odds_ratio_woolf",
    # NEW in round 13 — Hajek IPW treatment effect vs confounded naive
    "agg_ipw_treatment_effect",
    # NEW in round 13 — union-timeline as-of vs DuckDB native ASOF JOIN
    "sql_asof_dialect_duckdb_native",
    # NEW in round 13 — Wilson score interval for finish rates
    "agg_wilson_score_ci",
    # NEW in round 13 — MATTR moving-average type-token ratio
    "text_mattr_diversity",
    # NEW in round 13 — personalized PageRank from the hub part
    "graph_pagerank_personalized",
    # NEW in round 13 — cross-field DQ constraint-violation rules
    "dq_constraint_violations",
    # NEW in round 13 — daily new-vs-returning DAU split
    "events_new_vs_returning",
    # NEW in round 13 — DISTINCT ON dialect mapping (rank-1 on Spark)
    "sql_distinct_on_dialect",
    # NEW in round 13 — randomized-response local DP + debiasing
    "privacy_randomized_response",
    # NEW in round 13 — bigram conditional entropy per source
    "text_bigram_entropy_rate",
    # NEW in round 13 — streaming first-seen daily new users (stateful)
    "stream_daily_new_users",
    # NEW in round 13 — Theil T/L and Atkinson(1) inequality indices
    "agg_theil_atkinson_inequality",
    # NEW in round 13 — cross-sectional peer z-score per month
    "window_peer_zscore",
    # NEW in round 13 — sessions-per-user engagement histogram
    "events_sessions_per_user_hist",
    # NEW in round 13 — trailing growth-stability (Sharpe-style) ratio
    "window_rolling_sharpe",
    # NEW in round 13 — seasonal subseries month-of-year profile
    "timeseries_seasonal_subseries",
    # NEW in round 13 — coefficient-of-variation dispersion table
    "agg_coefficient_of_variation",
    # NEW in round 13 — weekday vs weekend activity split per type
    "events_weekday_weekend_split",
    # latest driver row r6 — oldest surviving evidence, in r6 order
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_pairs",
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q14_promo_revenue_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive_pred",
    "tpch_q20_excess_inventory",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
]


def _merge(attr: str) -> dict:
    out: dict = {}
    for mod in _MODULES:
        d = getattr(mod, attr, {})
        dup = set(out) & set(d)
        if dup:
            raise ValueError(f"duplicate registry keys across modules: {dup}")
        out.update(d)
    return out


def queries() -> dict[str, QueryFn]:
    merged = _merge("QUERIES")
    missing = [k for k in _SAMPLE_PRIORITY if k not in merged]
    if missing:
        raise ValueError(f"sample-priority keys not in registry: {missing}")
    out = {k: merged[k] for k in _SAMPLE_PRIORITY}
    out.update(merged)  # remaining keys keep module merge order
    return out


def oracle_sql() -> dict[str, str]:
    oracles = _merge("ORACLE")
    qs = queries()
    missing = set(oracles) - set(qs)
    if missing:
        raise ValueError(f"oracle without a query: {missing}")
    return oracles
