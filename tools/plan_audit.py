"""Physical-plan audit: dump headline plans, scan for scale red flags.

Checks the properties that matter at 100 TB:
- parquet filters actually pushed (PushedFilters non-empty when the
  query filters a scan column);
- broadcast joins where a dimension is joined (no accidental
  sort-merge of a 25-row table);
- no CartesianProduct anywhere in the registry (BroadcastNestedLoopJoin
  is allowed only for the deliberate disjunctive/inequality joins);
- Python appears only in ArrowEvalPython/MapInPandas nodes (never
  BatchEvalPython row-at-a-time) — enforced across the WHOLE registry.

Importable: :func:`audit_all` returns failures so pytest can assert
(tests/test_plan_audit.py); the CLI writes PLANS.md and exits 1 on
any red flag.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# invariants every registry query's physical plan must satisfy
GLOBAL_FORBID = ["CartesianProduct", "BatchEvalPython"]

# per-query structural expectations (headline set)
AUDIT = {
    "s1_scan_filter": {"expect": ["PushedFilters: \\[.*GreaterThan"], "forbid": []},
    "flagship_curated": {"expect": ["BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    "q1_pricing_summary": {"expect": ["HashAggregate"], "forbid": []},
    "q3_topk_join_agg": {"expect": ["TakeOrderedAndProject"], "forbid": []},
    "q5_multi_join_agg": {"expect": ["BroadcastHashJoin"], "forbid": []},
    "q18_large_orders": {"expect": ["TakeOrderedAndProject"], "forbid": []},
    "q10_returned_items": {"expect": ["TakeOrderedAndProject", "BroadcastHashJoin"], "forbid": []},
    "w1_latest_record": {"expect": ["WindowGroupLimit"], "forbid": []},
    "o1_priority_topk": {"expect": ["TakeOrderedAndProject"], "forbid": []},
    "m1_merge_upsert": {"expect": ["Join FullOuter"], "forbid": []},
    "j1_broadcast_dim_join": {"expect": ["BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    "j2_disjunctive_join": {"expect": ["BroadcastNestedLoopJoin"], "forbid": []},
    "j_semi_join": {"expect": ["LeftSemi"], "forbid": []},
    "j_anti_join": {"expect": ["LeftAnti"], "forbid": []},
    "x1_enrich_lookup": {"expect": ["MapInPandas"], "forbid": []},
    # as-of join must compile to a window over one exchange — a Join
    # node would mean the range-fanout plan snuck back in
    "asof_backward_join": {"expect": ["Window"], "forbid": ["Join"]},
    "asof_forward_join": {"expect": ["Window"], "forbid": ["Join"]},
    # range join must be the binned hash join, not a nested loop
    "range_interval_join": {"expect": ["HashJoin"], "forbid": ["BroadcastNestedLoopJoin"]},
    "q4_order_priority": {"expect": ["LeftSemi"], "forbid": []},
    "q16_supplier_cnt": {"expect": ["LeftAnti"], "forbid": []},
    # the selective part filter must semi-join below the aggregates
    "q2_min_cost_supplier": {"expect": ["TakeOrderedAndProject", "LeftSemi"], "forbid": []},
    "q21_waiting_supplier": {"expect": ["TakeOrderedAndProject"], "forbid": []},
    # multi-join analytics: every dimension leg must broadcast, and
    # the selective filters must reach the parquet scans
    "q7_volume_shipping": {"expect": ["BroadcastHashJoin"], "forbid": []},
    "q8_market_share": {"expect": ["BroadcastHashJoin", "PushedFilters: \\[.*p_type"], "forbid": []},
    "q9_product_profit": {"expect": ["PushedFilters: \\[.*StringContains\\(p_name,bolt"], "forbid": []},
    "q13_customer_distribution": {"expect": ["HashAggregate"], "forbid": []},
    "q20_excess_suppliers": {"expect": ["LeftSemi"], "forbid": []},
    "skew_salted_agg": {"expect": ["HashAggregate"], "forbid": []},
    "events_daily_gapfill": {"expect": [], "forbid": []},
    "text_chunking": {"expect": ["Generate"], "forbid": []},
    "fuzzy_source_pairs": {"expect": ["HashJoin|SortMergeJoin"], "forbid": ["BroadcastNestedLoopJoin"]},
    "sketch_hll_distinct": {"expect": ["HashAggregate"], "forbid": []},
    "dedup_minhash_lsh": {"expect": [], "forbid": []},
    "dedup_simhash": {"expect": ["HashAggregate"], "forbid": []},
    "ann_cosine_topk": {"expect": [], "forbid": []},
    "events_sessionize": {"expect": ["Window"], "forbid": []},
    # round-2 widening: set ops compile to aggregate+join, never loops
    "u_intersect": {"expect": ["HashAggregate"], "forbid": []},
    "u_except_all": {"expect": ["HashAggregate"], "forbid": []},
    "agg_grouping_sets": {"expect": ["Expand"], "forbid": []},
    "events_retention_cohorts": {"expect": ["Window", "HashAggregate"], "forbid": []},
    "events_transition_matrix": {"expect": ["Window", "HashAggregate"], "forbid": []},
    "w_range_frame": {"expect": ["Window"], "forbid": ["Join"]},
    # retrieval suite: tiny stat sides must broadcast; rankings end
    # in TakeOrderedAndProject, not a global sort
    "text_keyword_search": {"expect": ["HashAggregate"], "forbid": ["SortMergeJoin"]},
    "tfidf_top_terms": {"expect": ["BroadcastHashJoin"], "forbid": []},
    "bm25_search": {"expect": ["BroadcastHashJoin", "TakeOrderedAndProject"], "forbid": []},
    "pmi_bigrams": {"expect": ["BroadcastHashJoin", "TakeOrderedAndProject"], "forbid": []},
    "text_token_entropy": {"expect": ["HashAggregate"], "forbid": ["Join"]},
    "agg_histogram": {"expect": ["HashAggregate"], "forbid": ["Join"]},
    "outlier_zscore": {"expect": ["BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    "corpus_token_budget": {"expect": ["BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    "sample_weighted": {"expect": ["TakeOrderedAndProject"], "forbid": ["Exchange hashpartitioning"]},
    # r12: the pair aggregate is frozen (size gate reads its count),
    # so its HashAggregate sits behind the checkpoint RDD leaf; at
    # audit scale the gate picks the single-task Arrow kernel — pin
    # THAT, and forbid any join sneaking into either rank path
    "textrank_keywords": {"expect": ["MapInPandas", "TakeOrderedAndProject"], "forbid": ["CartesianProduct", "SortMergeJoin", "ShuffledHashJoin"]},
    "agg_argmax": {"expect": ["HashAggregate"], "forbid": ["Window", "Join"]},
    "agg_unpivot": {"expect": ["Expand"], "forbid": ["Join"]},
    "j_nullsafe_join": {"expect": ["Join"], "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"]},
    "agg_bitwise": {"expect": ["HashAggregate"], "forbid": ["Join"]},
    "agg_collect_sorted": {"expect": ["HashAggregate|ObjectHashAggregate"], "forbid": ["Join"]},
    "scalar_map_suite": {"expect": [], "forbid": ["Join", "Exchange hashpartitioning"]},
    # prefix-scan consumers: bucket offsets must broadcast back
    "corpus_pack_sequences": {"expect": ["BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    "events_streaks": {"expect": ["Window", "HashAggregate"], "forbid": ["Join"]},
    "agg_ntile_stats": {"expect": ["Window"], "forbid": ["Join"]},
    # OHLC is ONE argmin/argmax aggregate (partial SortAggregate:
    # struct order keys aren't hash-buffer types, but partials still
    # combine map-side so only per-hour rows shuffle) — a Window node
    # here would mean the per-hour full-sort formulation snuck back in
    "events_ohlc_bars": {"expect": ["SortAggregate"], "forbid": ["Window", "Join"]},
    # Python boundaries must be Arrow-vectorized, never row-at-a-time
    "udf_pandas_scalar": {"expect": ["ArrowEvalPython"], "forbid": ["Join"]},
    "udf_grouped_ols": {"expect": ["FlatMapGroupsInPandas"], "forbid": []},
    # r11: eval set is closed into the Arrow kernel — no join at all;
    # only per-doc counts cross the Python boundary
    "dedup_decontaminate": {"expect": ["MapInPandas"], "forbid": ["Join"]},
    "text_unigram_logprob": {"expect": ["BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    # repetition signals: explode + two-level agg, join keyed on doc_id
    "text_repetition_signals": {"expect": ["Generate", "HashAggregate"], "forbid": []},
    # Morton interleave is a codegen fold — no Python, no join
    "layout_zorder": {"expect": ["HashAggregate"], "forbid": ["Join"]},
    # partial-merge is union + re-aggregate, never a join of partials
    "incr_agg_merge": {"expect": ["HashAggregate", "Union"], "forbid": ["Join"]},
    # sliding distinct: explode fan-out + hash aggregates; the
    # observed-days side is tiny and must broadcast
    "events_sliding_distinct": {"expect": ["Generate", "BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    # struct kernel is row-local: no join, no shuffle
    "scalar_struct_suite": {"expect": [], "forbid": ["Join", "Exchange hashpartitioning"]},
    # SCD2 build is one window over the dimension-key shuffle
    "scd2_intervals": {"expect": ["Window"], "forbid": ["Join"]},
    # point-in-time lookup must ride the binned hash join
    "scd2_point_in_time": {"expect": ["HashJoin"], "forbid": ["BroadcastNestedLoopJoin"]},
    # inverted-index shape: two hash aggs over the materialized gram
    # stream; never a pair join. (r11: the explode is frozen once —
    # its Generate sits in the checkpoint job, behind the RDD leaf,
    # so the consumer plan can no longer show it. r12: with the
    # Generate pin gone, forbid the shuffle-join families too — only
    # the broadcast join-back may remain, so a regression that
    # reintroduces a hash/sort-merge pair join is still caught.)
    "dedup_crossdoc_spans": {"expect": ["HashAggregate"], "forbid": ["BroadcastNestedLoopJoin", "SortMergeJoin", "ShuffledHashJoin"]},
    # languages-sized agg + broadcast grand total
    "corpus_mix_weights": {"expect": ["HashAggregate"], "forbid": ["SortMergeJoin"]},
    # degree-oriented wedge join; the only nested-loop joins are the
    # single-row stat frames crossJoined at the end (broadcast-sided
    # by construction) — the global CartesianProduct forbid still
    # guards the pair joins. The member-pairs Generate no longer
    # appears HERE: the co-presence edge build is materialized once
    # per session (_copresence_edges_cached) and this plan consumes
    # the checkpointed edge frame; the Generate shape is asserted by
    # tests/test_graph plan tests on _copresence_edges itself.
    "graph_triangle_count": {"expect": ["HashAggregate", "ObjectHashAggregate"], "forbid": ["CartesianProduct"]},
    # the fixed-size sketch must broadcast into the probe join
    "sketch_countmin_heavy": {"expect": ["BroadcastHashJoin", "Generate"], "forbid": []},
    # merged partial sketches: union + re-sum, probe still broadcast
    "incr_sketch_merge": {"expect": ["BroadcastHashJoin", "Union"], "forbid": []},
    # bloom words frame is bounded -> broadcast; probe stays map-side
    "j_bloom_prefilter": {"expect": ["BroadcastHashJoin", "Generate"], "forbid": ["BroadcastNestedLoopJoin"]},
    # one lead window + one aggregate, no join anywhere
    "events_time_weighted_avg": {"expect": ["Window", "HashAggregate"], "forbid": ["Join"]},
    # pair counting is explode + agg + top-k; never a join
    "text_bpe_pair_counts": {"expect": ["Generate", "HashAggregate", "TakeOrderedAndProject"], "forbid": ["Join"]},
    # percentile agg to a days-sized frame; lag window over that frame
    "events_daily_drift": {"expect": ["Window"], "forbid": ["Join"]},
    # posting-list self-join on the term key; pair joins are equi-joins
    "sparse_cosine_topk": {"expect": ["HashAggregate"], "forbid": ["BroadcastNestedLoopJoin"]},
    # prefix index: distinct + window rank + equi-join — never a loop
    "dedup_setsim_prefix": {"expect": ["HashAggregate"], "forbid": ["BroadcastNestedLoopJoin"]},
    # pure map stage + one final sort: no hash-shuffle anywhere
    "scalar_url_suite": {"expect": [], "forbid": ["Exchange hashpartitioning", "Join"]},
    "stats_chi2_assoc": {"expect": ["HashAggregate"], "forbid": ["SortMergeJoin"]},
    # histogram scan: windows run over (group, distinct value) cells
    "agg_weighted_median": {"expect": ["Window", "HashAggregate"], "forbid": []},
    # the Arrow fan-out kernel is the point
    "mm_frame_sample": {"expect": ["MapInPandas"], "forbid": []},
    "stats_corr_matrix": {"expect": ["HashAggregate"], "forbid": ["BroadcastNestedLoopJoin"]},
    # island merge replaces the quadratic interval self-join
    "events_interval_coverage": {"expect": ["Window"], "forbid": ["Join"]},
    "stats_theilsen_trend": {"expect": ["Window", "HashAggregate"], "forbid": []},
    "events_seasonal_profile": {"expect": ["HashAggregate"], "forbid": ["SortMergeJoin"]},
    # cell equi-join, never a nested-loop theta join
    "geo_grid_radius_join": {"expect": ["Generate"], "forbid": ["BroadcastNestedLoopJoin"]},
    "snapshot_column_diff": {"expect": ["FullOuter"], "forbid": ["BroadcastNestedLoopJoin"]},
    "stats_cuped_adjust": {"expect": ["HashAggregate"], "forbid": ["SortMergeJoin"]},
    # path enumeration: one explode + one agg, never self-join rounds
    "hier_subtree_rollup": {"expect": ["Generate", "HashAggregate"], "forbid": ["Join"]},
    "events_rfm_segments": {"expect": ["Window", "HashAggregate"], "forbid": []},
    "text_vocab_coverage": {"expect": ["Window", "HashAggregate"], "forbid": ["SortMergeJoin"]},
    # rank algebra must run over the value-histogram aggregate, never
    # a global sort of the raw stream (no Sort below the first agg)
    "stats_mannwhitney_u": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    "events_cusum_shift": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    # attribution is the as-of carry: one window, zero joins
    "attribution_last_touch": {"expect": ["Window"], "forbid": ["Join"]},
    "privacy_k_anonymity": {"expect": ["HashAggregate"], "forbid": ["Window", "Join"]},
    "survival_km_curve": {"expect": ["Window", "HashAggregate"], "forbid": []},
    # both the synth and the decode kernel must be Arrow mapInPandas
    "mm_audio_pcm_rms": {"expect": ["MapInPandas"], "forbid": ["Join"]},
    "stats_ks_test": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    # pair fan-out must be the co-partitioned basket self-join; the
    # top-20 frame broadcasts into the item-count join
    "basket_assoc_rules": {"expect": ["TakeOrderedAndProject", "BroadcastHashJoin"], "forbid": ["CartesianProduct"]},
    "stats_benford_digits": {"expect": ["HashAggregate"], "forbid": ["Window"]},
    # N column constraints must compile to ONE aggregate pass (plus
    # the anti-join referential probe) — no window, no repeated scans
    "dq_constraint_report": {"expect": ["HashAggregate", "LeftAnti"], "forbid": ["Window"]},
    "stats_psi_drift": {"expect": ["HashAggregate"], "forbid": ["Window", "SortMergeJoin"]},
    # rank/cumsum over the per-part aggregate, never raw lineitem
    "abc_classification": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    # higher-order-function fold per row: no Python, no window
    "embedding_int8_quantization": {"expect": ["HashAggregate"], "forbid": ["Window", "BatchEvalPython", "MapInPandas"]},
    # lags over the per-(type, day) aggregate frame only
    "events_ewma_smooth": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    "events_top_paths": {"expect": ["Window", "TakeOrderedAndProject"], "forbid": ["Join"]},
    # O(n log n) window skyline — the quadratic domination join is banned
    "pareto_frontier_parts": {"expect": ["Window"], "forbid": ["Join"]},
    "market_concentration_hhi": {"expect": ["BroadcastHashJoin", "HashAggregate"], "forbid": []},
    "events_cohort_ltv": {"expect": ["Window", "BroadcastHashJoin"], "forbid": []},
    "forecast_backtest_smape": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    "graph_link_prediction": {"expect": ["TakeOrderedAndProject", "Generate"], "forbid": ["CartesianProduct", "LeftAnti"]},
    # the sweep's running sum must be the two-level scan: every
    # window below it is bucket- or user-partitioned, none global
    "events_concurrent_sessions": {"expect": ["HashAggregate", "Window"], "forbid": []},
    "privacy_l_diversity": {"expect": ["HashAggregate"], "forbid": ["Window", "Join"]},
    # equi-join on (user, exact cents), day window as post-filter
    "fraud_duplicate_payments": {"expect": ["HashJoin"], "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"]},
    "events_bot_heuristics": {"expect": ["Window", "HashAggregate"], "forbid": ["Join"]},
    "revenue_bridge_decomposition": {"expect": ["HashAggregate"], "forbid": ["Window", "SortMergeJoin"]},
    # the header/detail grain join shuffles on the order key once
    "dq_reconciliation": {"expect": ["HashAggregate"], "forbid": ["Window", "BroadcastNestedLoopJoin"]},
    # the running high-watermark must be the two-level scan: the
    # only unpartitioned window runs on the per-bucket offset frame
    "events_lateness_profile": {"expect": ["HashAggregate", "Window"], "forbid": ["SortMergeJoin"]},
    "price_elasticity_by_brand": {"expect": ["BroadcastHashJoin", "HashAggregate"], "forbid": ["Window", "SortMergeJoin"]},
    "events_weekly_active_mix": {"expect": ["HashAggregate"], "forbid": ["Window", "BroadcastNestedLoopJoin"]},
    # rank/prefix must be the two-level scan: the within-d window is
    # partitioned by (d, user_id-bucket). A windowspecdefinition
    # ORDERING by (d, user_id) with no partition columns is the old
    # global sort of the whole tenant frame sneaking back in (the
    # surviving d-ordered window runs on the distinct-d frame only).
    "fairshare_waterfill": {"expect": ["HashAggregate", "Window"], "forbid": ["SortMergeJoin", r"windowspecdefinition\(d#\d+L? ASC NULLS FIRST, user_id#\d+L? ASC"]},
    "events_power_users_gini": {"expect": ["HashAggregate", "Window"], "forbid": ["Join"]},
    "orders_backlog_aging": {"expect": ["HashAggregate", "PushedFilters: \\[.*o_orderstatus"], "forbid": ["Window"]},
    # trailing-window actives via bounded explode, never a RANGE window
    "events_dau_wau_stickiness": {"expect": ["HashAggregate", "Generate"], "forbid": ["Window"]},
    "events_behavior_entropy": {"expect": ["HashAggregate"], "forbid": ["Window", "SortMergeJoin"]},
    "discount_effectiveness": {"expect": ["HashAggregate"], "forbid": ["Window", "Join"]},
    "segment_migration_matrix": {"expect": ["Window", "HashAggregate", "FullOuter"], "forbid": []},
    # purchase-x-touch match must be the binned hash range join
    "attribution_linear_multi_touch": {"expect": ["HashJoin", "Window"], "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"]},
    # hot-shingle removal must broadcast the SMALL (>50-doc hot) set
    # as a LeftAnti — broadcasting the keeper complement (≈ the whole
    # shingle vocabulary) is the r6 judge's driver-OOM finding
    "text_shingle_containment": {"expect": [r"BroadcastHashJoin .*LeftAnti"], "forbid": []},
    # epoch shuffle surfaces its prefix via distributed top-k, never a
    # global sort exchange
    "corpus_epoch_shuffle": {"expect": ["TakeOrderedAndProject"], "forbid": []},
    # zipf: top-1000 via TakeOrdered; the rank window runs on the
    # survivors only
    "text_zipf_exponent": {"expect": ["TakeOrderedAndProject", "HashAggregate"], "forbid": []},
    # the two one-row census frames cross-join via BNLJ — the right
    # plan for scalar attachment, so only CartesianProduct is banned
    "graph_degree_assortativity": {"expect": ["HashAggregate"], "forbid": ["CartesianProduct"]},
    # r8 additions: spectrum ends in a tiny top-15 TakeOrdered over
    # the count-of-counts agg; spearman (re-shaped r10, two-level)
    # collapses to a joint value histogram FIRST, then the bucket
    # offsets come back via BROADCAST joins (never a shuffle join of
    # the rank maps, and never a single per-flag sort of the whole
    # grid — the windows partition by (flag, unit-bucket)); the plan
    # must show the pre-window HashAggregate, the broadcast, and no
    # sort-merge join anywhere; novelty re-shuffles on the gram key
    # only (distinct -> spread -> attribution), never all-pairs
    "text_freq_spectrum": {"expect": ["TakeOrderedAndProject", "HashAggregate"], "forbid": []},
    "stats_spearman_corr": {"expect": ["Window", "HashAggregate", "BroadcastHashJoin"], "forbid": ["SortMergeJoin"]},
    # r10 sketch algebra: one-row sketch frames attach via broadcast
    # scalar-subquery idiom (BNLJ is the right plan for that); the
    # data-side work is aggregates only — never a sort-merge join
    "sketch_kll_quantile_union": {"expect": ["Aggregate", "BroadcastNestedLoopJoin"], "forbid": ["SortMergeJoin"]},
    "sketch_theta_set_ops": {"expect": ["Aggregate", "BroadcastNestedLoopJoin"], "forbid": ["SortMergeJoin"]},
    "corpus_ngram_novelty": {"expect": ["HashAggregate"], "forbid": []},
    # r8 batch 2: prefix matrix self-joins on the prefix key (hash
    # join, bounded per-key fan-out); fano is two chained aggs on
    # one user_id shuffle; KL weights quantized log-ratios — the
    # small per-source marginal must broadcast, never sort-merge
    "dedup_prefix_overlap_matrix": {"expect": ["HashAggregate"], "forbid": ["CartesianProduct"]},
    "events_burstiness_fano": {"expect": ["HashAggregate"], "forbid": []},
    "text_kl_source_divergence": {"expect": ["BroadcastHashJoin", "HashAggregate"], "forbid": []},
    # r8 batch 3: heaps joins the tiny checkpoint table broadcast;
    # autocorr's lag pairing must be an equi hash join on h+k (an
    # inequality/cartesian lag join would explode); decay is one
    # map-side-combinable agg over a broadcast max-ts row
    "text_heaps_exponent": {"expect": ["HashAggregate"], "forbid": ["CartesianProduct"]},
    "events_autocorr_lag": {"expect": ["HashAggregate"], "forbid": ["CartesianProduct"]},
    "agg_decay_weighted": {"expect": ["HashAggregate"], "forbid": ["SortMergeJoin"]},
    # r8 batch 4: clustering reuses the cached oriented edge build —
    # per-node triangles must stay the compact-forward shape (top-20
    # TakeOrdered at the end); the sentence profile is one explode +
    # one keyed agg
    "graph_clustering_coefficient": {"expect": ["TakeOrderedAndProject"], "forbid": ["CartesianProduct"]},
    "text_sentence_len_profile": {"expect": ["HashAggregate", "Generate"], "forbid": []},
    # r9: sketch NTILE — the whole point is NO global-sort window
    # over the per-user frame; cut points broadcast (BNLJ is the
    # right shape for one-row attachment, only CartesianProduct is
    # banned globally)
    "sketch_ntile_balance": {"expect": ["HashAggregate", "BroadcastExchange"], "forbid": ["Window"]},
    # watermark fit: the same two-level running-max shape as
    # events_lateness_profile (bucket window + broadcast offsets),
    # never a sort-merge join of the offset frame; HLL union: two
    # tiny one-row broadcasts attach to the 5-row per-type frame,
    # no window anywhere
    "events_watermark_fit": {"expect": ["HashAggregate", "Window"], "forbid": ["SortMergeJoin"]},
    "sketch_hll_union": {"expect": ["HashAggregate", "BroadcastExchange"], "forbid": ["Window"]},
}


def _plan_string(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def audit_query(spark, sf: str, name: str) -> tuple[list[str], str]:
    """Audit one registry query's physical plan.

    Returns (problems, condensed_plan)."""
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    plan = _plan_string(spark, REGISTRY[name].fn(spark, sf))
    node_lines = [
        line
        for line in plan.splitlines()
        if re.match(r"^\s*\(\d+\)\s", line) or "PushedFilters" in line
    ]
    condensed = "\n".join(line.strip()[:110] for line in node_lines)
    spec = AUDIT.get(name, {"expect": [], "forbid": []})
    problems = []
    for pat in spec["expect"]:
        if not re.search(pat, plan):
            problems.append(f"MISSING expected `{pat}`")
    for pat in [*spec["forbid"], *GLOBAL_FORBID]:
        if re.search(pat, plan):
            problems.append(f"FOUND forbidden `{pat}`")
    return problems, condensed


def audit_all(spark, sf: str, names=None) -> dict[str, list[str]]:
    """Audit every registry query (or ``names``); returns
    {query: problems} for queries with red flags only."""
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    failures: dict[str, list[str]] = {}
    for name in names or list(REGISTRY):
        problems, _ = audit_query(spark, sf, name)
        if problems:
            failures[name] = problems
    return failures


def main() -> int:
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY
    from etl_pipeline_4handling_listings_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"

    failures: list[str] = []
    sections: list[str] = [
        "# PLANS — physical-plan audit of headline queries\n",
        "Generated by `tools/plan_audit.py` at sf0.01. Node lists are",
        "condensed; (n) markers follow Spark's formatted explain.",
        "Every registry query is additionally screened for"
        f" {GLOBAL_FORBID}; only AUDIT-listed plans are printed.\n",
    ]
    for name in REGISTRY:
        problems, condensed = audit_query(spark, sf, name)
        status = "OK" if not problems else "; ".join(problems)
        if name in AUDIT:
            sections.append(f"## {name} — {status}\n\n```\n{condensed}\n```\n")
        if problems:
            failures.append(f"{name}: {status}")
        print(f"{'OK  ' if not problems else 'FLAG'} {name} {';'.join(problems)}")

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(sections))
    spark.stop()
    if failures:
        print("\nRED FLAGS:\n" + "\n".join(failures))
        return 1
    print("\nall plans clean; PLANS.md written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
