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


# Round-9 rotation policy (VERDICT r8 next-step #1). Cap is still 50
# driver slots; 109 queries registered (the r5 freeze was a
# rotation-bookkeeping device — VERDICT r8 #3 explicitly grows the
# registry with dedup_incremental_exact + dedup_incremental_minhash, both
# documented below; the r9 stretch adds dedup_recovery_pairs the same way). Invariant: every oracle-bearing query is
# driver-green within the last two rounds, OR on the documented
# peer-coverage exception list below (re-proven by the local gate at all
# three SFs instead).
#
# This round's 50 slots: (a) the five r8 exception-list names — last
# driver row r6, two rounds stale, they MUST lead (VERDICT r8 #1);
# (b) 45 of the 50 r7-green names whose two-round window closes at r9.
# The five r7-green names that overflow the cap move to the exception
# list with peer coverage.
PRIORITY = [
    # (a) r8 exception-list names — last driver row r6; they go first
    "fund_manual_confirm",
    "fund_manual_redemption",
    "fund_manual_dividend",
    "events_sliding_window",
    "shipping_priority_topk",
    # (b) r7-green names whose window closes at r9 (45 of 50)
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

# PRIORITY is exactly at the 50-query driver cap (5 + 45).

# EXCEPTION LIST (this round's cap overflow — 55 oracle-bearing names
# owed a row vs 50 slots, so these five r7-green queries go one round on
# peer coverage). Each is chosen because its machinery is provably
# inside r8-green or r9-PRIORITY peers, and each is re-proven by the
# local gate (tools/check_correctness.py) at sf0.001/0.01/0.1:
#   rollup_priority — the same Expand-node rollup/cube/grouping-sets
#     machinery as the r9-PRIORITY grouping_sets_sql and the r8-green
#     cube_lineitem (all three lower to one Expand + hash-agg);
#   semi_join_parts — LeftSemi translation; the r9-PRIORITY
#     anti_join_customers is the same ExistenceJoin planning path
#     (LeftAnti), same broadcast-able dim shape;
#   window_running — running-sum window frame; the r9-PRIORITY
#     user_rolling_7d_spend exercises the same WindowExec with the
#     strictly-harder range frame, and events_sliding_window covers
#     the windows.py module end-to-end;
#   cast_round_coerce — try_cast coerce + round2; the r9-PRIORITY
#     date_math/derived_arithmetic share functions/cleaning + numeric,
#     and round2 is value-hashed in every money-bearing PRIORITY query;
#   dedup_embedding_cosine — exact-cosine threshold pairing; the
#     r9-PRIORITY dedup_semantic and the r8-green vector_cosine_topk
#     exercise the same cosine arithmetic and greedy-min-id keep rule.
#
# NEW REGISTRATIONS (VERDICT r8 #3 + stretch #8):
# dedup_incremental_exact, dedup_incremental_minhash and
# dedup_recovery_pairs (the second-seed straggler-recovery pass) carry
# exact DuckDB oracles and are verified via the sanctioned local-gate
# path this round (the #3 "or via the local gate at 3 SFs" arm) — they
# take driver slots at the head of round 10's PRIORITY. Note on
# dedup_recovery_pairs' organic row counts: seed-1 banding at t=0.8
# catches every near-dup pair in the small organic corpora, so the
# oracle comparison is 0 = 0 rows at sf0.001/0.01 and 1 = 1 at sf0.1;
# the operator's SEMANTICS are pinned by the planted-twin pytest and
# its measured recall by tools/cc_probe.py --recover (80–100% of
# giant-cluster banding stragglers reattached — BASELINE §4.3).
#
# DEPRIORITY: names that safely fall past the cap this round. The 50
# r8-green names (fresh driver rows, window open through round 10), the
# five exception-list names above, the rows-only-by-design sketch query,
# and the three new locally-gated registrations. 50 + 5 + 1 + 3 = 59 =
# registered 109 - cap 50, so the cap's cut is wholly chosen here —
# nothing falls past by registration-order accident.
DEPRIORITY = [
    # five exception-list names (peer coverage documented above)
    "rollup_priority",
    "semi_join_parts",
    "window_running",
    "cast_round_coerce",
    "dedup_embedding_cosine",
    # rows-only by design (KLL/HLL sketch aggregate; rank-contract parity
    # is pytest-asserted) — its weak row adds nothing over r4's
    "event_value_stats_approx",
    # new this round, locally gated at 3 SFs (lead r10 PRIORITY)
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "dedup_recovery_pairs",
    # r8-green (driver rows in CORRECTNESS_r08): window open to round 10
    "vector_cosine_topk",
    "dedup_canonical",
    "cube_lineitem",
    "topk_revenue",
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
