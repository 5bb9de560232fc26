"""Query registry.

Every implemented operator from SURVEY.md §2 (and the scale extensions)
registers here as a named query: a DataFrame builder ``(spark, sf_dir) ->
DataFrame`` plus, when SQL-expressible, the equivalent ANSI SQL string a
DuckDB oracle can run on the same parquet tables. ``__spark_entry__.py``
re-exports this registry to the driver.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name before
value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible ops (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side effects run."""
    from . import (  # noqa: F401
        changefeed,
        dedup,
        events,
        fundetl,
        graph,
        multimodal,
        quality,
        relational,
        relational2,
        relational3,
        scoring,
        textops,
        vectors,
        windows,
    )


# Round-4 rotation policy: the driver caps its correctness sweep at ~50
# queries (in registry order) while 85 are registered, so ordering decides
# who gets a row. Invariant maintained: every query holds a GREEN driver
# row within the last two rounds. This round's front: the 28 queries whose
# only green row is round 2 (they sat past the cap in round 3 — the
# two-round window closes on them NOW), every query whose code or oracle
# changed this round (must re-prove), and the 7 first-appearance queries.
PRIORITY = [
    # only green row is r2 — re-prove or the invariant breaks
    "window_running",
    "salted_skew_agg",
    "pivot_status",
    "text_fingerprint",
    "rollup_priority",
    "when_cascade_tier",
    "dedup_ngram_capped",
    "dedup_simhash",
    "dedup_groups",
    "doc_hash_split",
    "corpus_top_terms",
    "text_repetition_filter",
    "text_scrub",
    "doc_tfidf_topk",
    "dedup_hybrid",
    "dedup_spans",
    "contamination_check",
    "stratified_sample",
    "sequence_packing",
    "range_join_ship_window",
    "dedup_embedding_cosine",
    "dedup_exact",
    "text_lang_id",
    "text_quality",
    "pricing_summary",
    # never held a green row — r4 adds oracles (VERDICT #2/#3); ivf stays
    # rows-only but should record its weak row inside the window too
    "fund_dividend_scaled",
    "vector_ann_lsh",
    "vector_ann_ivf",
    # round-4 code changes — green r3 rows no longer vouch for the new
    # code paths (funnel unpersist+guards, mixture-weight guards,
    # two-phase CC convergence signature)
    "events_funnel",
    "source_mixture_weights",
    "dedup_groups_star",
    # first appearance (rows-only by design: sketch aggregates)
    "event_value_stats_approx",
    # first appearance (exact oracles)
    "epoch_shuffle",
    "leakage_safe_split",
    "doc_chunking",
    "zorder_layout",
    "table_profile",
    "quality_deciles",
    "cdc_latest_snapshot",
    "scd2_intervals",
    "event_value_winsorized",
    "shipping_priority_topk",
    "cdc_incremental_merge",
    "events_hourly_gapfill",
    # round-4 exact-cents hardening (code changed; must re-prove):
    # window_running is already listed above; these two moved back out
    # of DEPRIORITY for the same reason
    "events_sliding_window",
    "agg_stats",
    # first appearance, second batch (exact oracles): TPC-H Q5/Q18 join
    # shapes, BM25 retrieval scoring, trailing-window anomaly gate
    "local_supplier_revenue",
    "large_order_customers",
    "bm25_topk",
    "events_anomaly_zscore",
]
# PRIORITY is at the 50-query driver cap. Ten late round-4 additions —
# user_rolling_7d_spend (time-RANGE window frame), attribution_join
# (batch registration of the stream-stream join's shared builder),
# graph_pagerank (integer-exact iterative centrality), volume_shipping
# (TPC-H Q7 two-role dimension shape), dedup_semantic (SemDeDup
# cluster-scoped embedding dedup), dq_constraint_report (Deequ-style
# contract suite), k_anonymity_audit, source_capped_sample
# (per-source reservoir cap), market_share (TPC-H Q8
# ratio-of-conditional-aggregate) and late_sole_supplier (TPC-H Q21
# decorrelated double-EXISTS) — sit just past the cap this round
# (registration order puts unlisted names right after PRIORITY):
# all ten are exact-oracle-green in the local gate
# (tools/check_correctness.py) and pytest-proven; they are ROUND-5
# FRONT-OF-QUEUE alongside the names rotating back out of DEPRIORITY.


# Names that may safely fall past the driver's cap THIS round: all 35 are
# r3-green with unchanged code, and their machinery is also exercised by
# checked queries. Sized to >= (registered 85 - 50) so the cap's cut is
# wholly chosen here, never an arbitrary registration-order tail. The 12
# unlisted queries (r3-green, diverse machinery) sit between PRIORITY and
# this list in registration order and fill the remaining checked slots.
DEPRIORITY = [
    # r3-green flagships displaced by the second first-appearance batch
    # (Q5/Q18/bm25/zscore): all four are benched every round (BENCH_r4
    # re-executes them at sf0.1) and their machinery is inside checked
    # peers — LSH banding inside vector_ann_lsh + dedup_hybrid, exact
    # percentiles inside quality_deciles/winsorize, the fund cascade
    # inside fund_dividend_scaled, curation signals inside text_c4 peers.
    # They rotate back into PRIORITY next round.
    "dedup_minhash_lsh",
    "event_value_stats",
    "fund_dividend",
    "corpus_curation",
    # r3-green, displaced by the four round-4 first-appearance queries
    # (cdc/scd2/winsorize/q3): machinery covered by checked peers —
    # agg-then-window by quality_deciles + top-k forms, C4 signal columns
    # by corpus_curation, hash-bucket sampling by stratified_sample /
    # epoch_shuffle, tumbling window by the checked sliding/session forms.
    # They rotate back into PRIORITY next round (two-round-green window).
    "top_users_per_event",
    "text_c4_filters",
    "quality_weighted_sample",
    "events_tumbling_window",
    # r3-green, displaced by cdc_incremental_merge: per-user window-MIN
    # machinery also inside the checked scd2_intervals window family
    "user_retention_cohorts",
    # r3-green, displaced by events_hourly_gapfill: event-time bucketing
    # machinery also inside the checked sliding window + gapfill queries
    "events_session_window",
    # keep-best window machinery shared with the checked leakage split's
    # CC stage and dedup_groups_star; r3-green
    "dedup_canonical",
    # when-cascade machinery also inside the checked fund_dividend
    "fund_classify",
    # SQL-only machinery (scalar-subquery rewrite, json path agg,
    # event-time as-of join) re-proven in r3
    "correlated_subquery",
    "json_extract_agg",
    "asof_last_click",
    # Arrow-batch multimodal plumbing re-proven in r3 and by pytests
    "multimodal_binary_stats",
    # date arithmetic re-proven in r3; also inside the checked fund jobs
    "date_math",
    # TPC-H-ish relational forms re-proven in r3; cheap, stable
    "union_slices",
    "distinct_pairs",
    "mixed_sort_key",
    "intersect_nations",
    "except_nations",
    "cast_round_coerce",
    "isin_filter",
    "derived_arithmetic",
    "text_token_count",
    "dedup_ngram_jaccard",
    "semi_join_parts",
    "anti_join_customers",
    "cube_lineitem",
    "grouping_sets_sql",
    "topk_revenue",
    "dim_join_left",
    "group_merge",
    # exact-cosine baseline: same expression tree proven inside the
    # checked vector_ann_lsh rank stage
    "vector_cosine_topk",
    # fund jobs r3-green; the checked fund_dividend + fund_classify +
    # fund_dividend_scaled cover the cascade/extract/normalize machinery
    "fund_dividend_merged",
    "fund_quarantine",
    "fund_purchase_apply",
    "fund_purchase_confirm",
    "fund_redemption_confirm",
    "fund_conversion",
    "fund_manual_apply",
    "fund_manual_confirm",
    "fund_manual_redemption",
    "fund_manual_dividend",
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in PRIORITY if n in src}
    out.update(
        {n: v for n, v in src.items() if n not in out and n not in DEPRIORITY}
    )
    out.update({n: src[n] for n in DEPRIORITY if n in src})
    return out


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES with PRIORITY names first, DEPRIORITY last, others in
    registration order."""
    return _ordered(QUERIES)


def ordered_oracles() -> dict[str, str]:
    return _ordered(ORACLES)
