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


# Round-8 rotation policy (VERDICT r7 next-step #1). Cap is still 50
# driver slots; 106 queries registered (registry FROZEN since r5).
# Invariant: every oracle-bearing query is driver-green within the last
# two rounds, OR on the documented peer-coverage exception list below
# (re-proven by the local gate at all three SFs instead).
#
# This round's 50 slots: (a) the five r7 exception-list names — last
# driver row r5, two rounds stale, they MUST lead; (b) 45 of the 50
# r6-green names whose two-round window closes at r8. The five r6-green
# names that overflow the cap move to the exception list with peer
# coverage.
PRIORITY = [
    # (a) r7 exception-list names — last driver row r5; they go first
    "vector_cosine_topk",
    "dedup_canonical",
    "cube_lineitem",
    "topk_revenue",
    "events_tumbling_window",
    # (b) r6-green names whose window closes at r8
    "cdc_latest_snapshot",
    "scd2_intervals",
    "event_value_winsorized",
    "cdc_incremental_merge",
    "vector_ann_lsh",
    "dedup_exact",
    "dedup_groups",
    "dedup_groups_star",
    "leakage_safe_split",
    "dedup_spans",
    "contamination_check",
    "dedup_simhash",
    "dedup_hybrid",
    "dedup_semantic_lsh",
    "events_funnel",
    "fund_manual_apply",
    "fund_dividend_scaled",
    "pricing_summary",
    "agg_stats",
    "pivot_status",
    "range_join_ship_window",
    "salted_skew_agg",
    "intersect_nations",
    "except_nations",
    "zorder_layout",
    "table_profile",
    "local_supplier_revenue",
    "large_order_customers",
    "bm25_topk",
    "events_anomaly_zscore",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "quality_deciles",
    "doc_hash_split",
    "stratified_sample",
    "sequence_packing",
    "epoch_shuffle",
    "doc_chunking",
    "corpus_top_terms",
    "text_repetition_filter",
    "text_scrub",
    "source_mixture_weights",
    "doc_tfidf_topk",
    "events_hourly_gapfill",
]

# PRIORITY is exactly at the 50-query driver cap (5 + 45).

# EXCEPTION LIST (this round's cap overflow — 55 oracle-bearing names
# owed a row vs 50 slots, so these five r6-green queries go one round on
# peer coverage). Each is chosen because its machinery is provably
# inside r7-green or r8-PRIORITY peers, and each is re-proven by the
# local gate (tools/check_correctness.py) at sf0.001/0.01/0.1:
#   fund_manual_confirm / fund_manual_redemption / fund_manual_dividend —
#     all four manual-OCR jobs share jobs._manual_base (scan detect →
#     image decode → OCR adapter → candidate-max cascade) and differ only
#     in the per-job spec tables; fund_manual_apply stays in r8 PRIORITY
#     and exercises the shared machinery end-to-end (plus the new
#     run_all OCR-adapter e2e pytest drives all four sinks);
#   events_sliding_window — F.window(ts, w, s) sliding windows; the
#     r8-PRIORITY events_tumbling_window is the same TimeWindow expansion
#     node (tumbling = slide==width special case), and the watermarked
#     streaming twin's parity pytest covers the sliding form;
#   shipping_priority_topk — window-rank top-k; same rank/limit
#     machinery as the r8-PRIORITY topk_revenue and the r7-green
#     top_users_per_event.
#
# DEPRIORITY: names that safely fall past the cap this round. The 50
# r7-green names (fresh driver rows, window open through round 9), the
# five exception-list names above, and the rows-only-by-design sketch
# query. 50 + 5 + 1 = 56 = registered 106 - cap 50, so the cap's cut is
# wholly chosen here — nothing falls past by registration-order accident.
DEPRIORITY = [
    # five exception-list names (peer coverage documented above)
    "fund_manual_confirm",
    "fund_manual_redemption",
    "fund_manual_dividend",
    "events_sliding_window",
    "shipping_priority_topk",
    # rows-only by design (KLL/HLL sketch aggregate; rank-contract parity
    # is pytest-asserted) — its weak row adds nothing over r4's
    "event_value_stats_approx",
    # r7-green (driver rows in CORRECTNESS_r07): window open to round 9
    "dedup_ngram_capped",
    "dedup_embedding_cosine",
    "when_cascade_tier",
    "window_running",
    "rollup_priority",
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
