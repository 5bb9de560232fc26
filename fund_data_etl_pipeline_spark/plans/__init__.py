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
    for non-SQL-expressible ops (driver then does a rows-only check).

    The registered callable wraps ``fn`` in a persist collector
    (operators/caching): operator-internal ``persist_tracked`` caches
    created while building are tied to the returned handle, so every
    registry consumer (driver, bench, tests) reclaims cache storage by
    simply dropping the DataFrame — no clearCache choreography (VERDICT
    r6 next-step #5). The module-level name stays the RAW builder, so
    builder-composing-builder keeps persists flowing to the outermost
    collector (see collected_persists' nesting note)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..operators.caching import (
                collected_persists,
                collector_active,
                release_on_gc,
            )

            if collector_active():
                return fn(spark, sf_dir)
            with collected_persists() as bucket:
                try:
                    out = fn(spark, sf_dir)
                except BaseException:
                    # a builder that dies after persisting must not leak
                    # its caches — there is no handle left to tie them to
                    for d in bucket:
                        try:
                            d.unpersist()
                        except Exception:  # noqa: BLE001 — session gone
                            pass
                    raise
            return release_on_gc(out, *bucket) if bucket else out

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
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


# Round-7 rotation policy (VERDICT r6 next-step #1). Cap is still 50
# driver slots; 106 queries registered (registry FROZEN since r5).
# Invariant: every oracle-bearing query is driver-green within the last
# two rounds, OR on the documented peer-coverage exception list below
# (re-proven by the local gate at all three SFs instead).
#
# This round's 50 slots: (a) the five r6 exception-list names — two
# driver-rounds stale (last row r4), they MUST lead; (b) 45 of the 50
# r5-green names whose two-round window closes at r7. The five r5-green
# names that overflow the cap move to the exception list with peer
# coverage.
PRIORITY = [
    # (a) r6 exception-list names — last driver row r4; they go first
    "dedup_ngram_capped",
    "dedup_embedding_cosine",
    "when_cascade_tier",
    "window_running",
    "rollup_priority",
    # (b) r5-green names whose window closes at r7
    "graph_pagerank",
    "dedup_semantic",
    "volume_shipping",
    "market_share",
    "late_sole_supplier",
    "dq_constraint_report",
    "k_anonymity_audit",
    "source_capped_sample",
    "user_rolling_7d_spend",
    "attribution_join",
    "vector_ann_ivf",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "event_value_stats",
    "top_users_per_event",
    "fund_classify",
    "fund_dividend",
    "fund_dividend_merged",
    "fund_quarantine",
    "fund_purchase_apply",
    "fund_purchase_confirm",
    "fund_redemption_confirm",
    "fund_conversion",
    "multimodal_binary_stats",
    "dim_join_left",
    "group_merge",
    "isin_filter",
    "cast_round_coerce",
    "date_math",
    "derived_arithmetic",
    "union_slices",
    "mixed_sort_key",
    "json_extract_agg",
    "anti_join_customers",
    "semi_join_parts",
    "distinct_pairs",
    "asof_last_click",
    "grouping_sets_sql",
    "correlated_subquery",
    "text_token_count",
    "corpus_curation",
    "text_c4_filters",
    "quality_weighted_sample",
    "events_session_window",
    "user_retention_cohorts",
]

# PRIORITY is exactly at the 50-query driver cap (5 + 45).

# EXCEPTION LIST (this round's cap overflow — 55 oracle-bearing names
# owed a row vs 50 slots, so these five r5-green queries go one round on
# peer coverage). Each is chosen because its machinery is provably
# inside r6-green or r7-PRIORITY peers, and each is re-proven by the
# local gate (tools/check_correctness.py) at sf0.001/0.01/0.1:
#   vector_cosine_topk — the brute-force cosine baseline whose
#     prepped-norm + rounded-cosine expression tree is literally shared
#     with dedup_embedding_cosine (r7 PRIORITY) and against which the
#     r6-green vector_ann_lsh / r7-PRIORITY vector_ann_ivf recall
#     pytests compare;
#   dedup_canonical — keep-best canonicalization over dedup groups: the
#     group machinery is the r6-green dedup_groups/dedup_groups_star,
#     and the keep-best window is the same rank-1 Window as the
#     r7-PRIORITY top_users_per_event;
#   cube_lineitem — CUBE grouping-set expansion; the same expand-node
#     machinery as the r7-PRIORITY rollup_priority and
#     grouping_sets_sql;
#   topk_revenue — window-rank top-k; same rank/limit machinery as the
#     r6-green shipping_priority_topk and r7-PRIORITY
#     top_users_per_event;
#   events_tumbling_window — F.window(ts, w) fixed windows; tumbling is
#     the slide==width special case of the r6-green
#     events_sliding_window (same TimeWindow expansion node).
#
# DEPRIORITY: names that safely fall past the cap this round. The 50
# r6-green names (fresh driver rows, window open through round 8), the
# five exception-list names above, and the rows-only-by-design sketch
# query. 50 + 5 + 1 = 56 = registered 106 - cap 50, so the cap's cut is
# wholly chosen here — nothing falls past by registration-order accident.
DEPRIORITY = [
    # five exception-list names (peer coverage documented above)
    "vector_cosine_topk",
    "dedup_canonical",
    "cube_lineitem",
    "topk_revenue",
    "events_tumbling_window",
    # rows-only by design (KLL/HLL sketch aggregate; rank-contract parity
    # is pytest-asserted) — its weak row adds nothing over r4's
    "event_value_stats_approx",
    # r6-green (driver rows in CORRECTNESS_r06): window open to round 8
    "fund_manual_apply",
    "fund_manual_confirm",
    "fund_manual_redemption",
    "fund_manual_dividend",
    "intersect_nations",
    "except_nations",
    "dedup_semantic_lsh",
    "salted_skew_agg",
    "pivot_status",
    "text_fingerprint",
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
    "dedup_exact",
    "text_lang_id",
    "text_quality",
    "pricing_summary",
    "fund_dividend_scaled",
    "vector_ann_lsh",
    "events_funnel",
    "source_mixture_weights",
    "dedup_groups_star",
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
    "events_sliding_window",
    "agg_stats",
    "local_supplier_revenue",
    "large_order_customers",
    "bm25_topk",
    "events_anomaly_zscore",
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
