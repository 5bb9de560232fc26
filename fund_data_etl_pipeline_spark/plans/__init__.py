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


# Round-10 rotation policy (VERDICT r9 next-step #1). Cap is 50 driver
# slots; 110 queries registered (109 + the r10 dim_merge registration —
# VERDICT r9 "What's missing" #2). Invariant: every oracle-bearing query
# is driver-green within the last two rounds, OR on the documented
# peer-coverage exception list below (re-proven by the local gate at all
# three SFs instead).
#
# This round's 50 slots: (a) the three r9 registrations, locally gated
# at r9, never driver-checked — they lead (VERDICT r9 #1); (b) the five
# r9 exception-list names — last driver row r7, their window closes now;
# (c) 42 of the 50 r8-green names whose two-round window closes at r10.
# The other 8 r8-green names move to the exception list with peer
# coverage (the round-5 valve — see note below the list).
PRIORITY = [
    # (a) r9 registrations (local 3-SF gate only so far)
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "dedup_recovery_pairs",
    # (b) r9 exception-list names — last driver row r7; window closes
    "rollup_priority",
    "semi_join_parts",
    "window_running",
    "cast_round_coerce",
    "dedup_embedding_cosine",
    # (c) r8-green names whose window closes at r10 (42 of 50)
    "dedup_canonical",
    "events_tumbling_window",
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
    "pivot_status",
    "range_join_ship_window",
    "salted_skew_agg",
    "zorder_layout",
    "table_profile",
    "local_supplier_revenue",
    "large_order_customers",
    "bm25_topk",
    "events_anomaly_zscore",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
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

# PRIORITY is exactly at the 50-query driver cap (3 + 5 + 42).

# EXCEPTION LIST (round-10 cap overflow — 58 oracle-bearing names owed a
# row vs 50 slots, so these eight r8-green queries go one round on peer
# coverage). Each is chosen because its machinery is provably inside
# r9-green or r10-PRIORITY peers, and each is re-proven by the local
# gate (tools/check_correctness.py) at sf0.001/0.01/0.1 this round:
#   cube_lineitem — CUBE lowers to the same Expand + hash-agg as the
#     r9-green grouping_sets_sql and the r10-PRIORITY rollup_priority
#     (one Expand node, identical aggregate path);
#   topk_revenue — TakeOrderedAndProject over a hash agg; the r9-green
#     shipping_priority_topk is the same plan shape end-to-end;
#   agg_stats — partial-aggregable multi-stat hash agg; the r9-green
#     event_value_stats is the same shape, and run_all's audit pytest
#     executes agg_stats' builder every round;
#   intersect_nations — INTERSECT lowers to LeftSemi + distinct; the
#     r10-PRIORITY semi_join_parts pins the LeftSemi translation and
#     the r9-green distinct_pairs the distinct;
#   except_nations — EXCEPT lowers to LeftAnti + distinct; the r9-green
#     anti_join_customers pins the LeftAnti path;
#   vector_cosine_topk — exact cosine + per-query rank; the r9-green
#     dedup_semantic and vector_ann_ivf exercise the same cosine
#     arithmetic (functions shared via operators/similarity) and rank;
#   quality_deciles — ntile WindowExec; the r9-green
#     user_rolling_7d_spend runs the strictly-harder range-frame window
#     over the same exchange shape;
#   doc_hash_split — deterministic salted-hash split; the r9-green
#     quality_weighted_sample and source_capped_sample exercise the
#     same operators/sampling hash machinery.
#
# NEW REGISTRATION (VERDICT r9 "What's missing" #2): dim_merge — the
# dimension-table upsert (merge_dim operator) — carries an exact DuckDB
# oracle and is verified via the sanctioned local-gate path this round
# (3-SF re-proof); it takes a driver slot at the head of round 11's
# PRIORITY, exactly the r9-registration pattern.
#
# Note on dedup_recovery_pairs (seated in PRIORITY above): its r9
# vacuous-row problem (organic 0/0/1 rows) is FIXED this round — the
# registered query's first pass runs at a one-band budget
# (plans/dedup._RECOVERY_P1_BANDS), so the driver row compares 4
# nontrivial recovered pairs at sf0.01 (6 at sf0.001, 16 at sf0.1),
# hash-exact (VERDICT r9 #3 / ADVICE r9 #2).
#
# DEPRIORITY: names that safely fall past the cap this round. The 50
# r9-green names (fresh driver rows in CORRECTNESS_r09, window open
# through round 11), the eight exception-list names above, the
# rows-only-by-design sketch query, and the new locally-gated dim_merge.
# 50 + 8 + 1 + 1 = 60 = registered 110 - cap 50, so the cap's cut is
# wholly chosen here — nothing falls past by registration-order
# accident.
DEPRIORITY = [
    # eight exception-list names (peer coverage documented above)
    "cube_lineitem",
    "topk_revenue",
    "agg_stats",
    "intersect_nations",
    "except_nations",
    "vector_cosine_topk",
    "quality_deciles",
    "doc_hash_split",
    # rows-only by design (KLL/HLL sketch aggregate; rank-contract parity
    # is pytest-asserted) — its weak row adds nothing over r4's
    "event_value_stats_approx",
    # new this round, locally gated at 3 SFs (leads r11 PRIORITY)
    "dim_merge",
    # r9-green (driver rows in CORRECTNESS_r09): window open to round 11
    "fund_manual_confirm",
    "fund_manual_redemption",
    "fund_manual_dividend",
    "events_sliding_window",
    "shipping_priority_topk",
    "dedup_ngram_capped",
    "when_cascade_tier",
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
    "date_math",
    "derived_arithmetic",
    "union_slices",
    "mixed_sort_key",
    "json_extract_agg",
    "anti_join_customers",
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
