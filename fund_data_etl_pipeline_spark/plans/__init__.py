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


def format_doc(fn, **kw):
    """Late-format a registered query's docstring placeholders on BOTH
    the module function and its registered wrapper — ``register``
    snapshots ``__doc__`` at decoration time, so a post-def ``.format``
    on the module name alone leaves ``QUERIES[name].__doc__`` showing
    raw ``{braces}`` (r11 review). ``(doc or "")`` keeps ``python -OO``
    (stripped docstrings) importable."""
    fn.__doc__ = (fn.__doc__ or "").format(**kw)
    for w in QUERIES.values():
        if getattr(w, "__wrapped__", None) is fn:
            w.__doc__ = fn.__doc__
    return fn


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


# Round-12 rotation policy (VERDICT r11 next-step #3). Cap is 50 driver
# slots; 110 queries registered. Invariant: every oracle-bearing query is
# driver-green within the last two rounds, OR on the documented
# peer-coverage exception list below (re-proven by the local gate at all
# three SFs instead).
#
# This round's 50 slots: (a) the nine r11 exception-valve names — last
# driver row r9, their valve window closes now; (b)
# dedup_incremental_minhash — proves the r12 band_key fix (VERDICT r11
# what's-wrong #1) with a driver row; (c) 40 of the remaining 49
# r10-green names whose two-round window closes at r12. The other 9
# r10-green names move to the exception valve with peer coverage — the
# round-5 valve, see the note below the list.
PRIORITY = [
    # (a) r11 exception-valve names — last driver row r9; window closes
    "fund_manual_confirm",
    "fund_manual_redemption",
    "fund_manual_dividend",
    "events_sliding_window",
    "user_retention_cohorts",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "volume_shipping",
    "quality_weighted_sample",
    # (b) the r12 NULL-propagating band_key fix, proven by a driver row
    "dedup_incremental_minhash",
    # (c) r10-green names whose window closes at r12 (40 of 49)
    "dedup_recovery_pairs",
    "dedup_embedding_cosine",
    "dedup_canonical",
    "cdc_latest_snapshot",
    "scd2_intervals",
    "event_value_winsorized",
    "cdc_incremental_merge",
    "vector_ann_lsh",
    "dedup_exact",
    "dedup_groups",
    "leakage_safe_split",
    "dedup_spans",
    "contamination_check",
    "dedup_simhash",
    "dedup_semantic_lsh",
    "events_funnel",
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

# PRIORITY is exactly at the 50-query driver cap (9 + 1 + 40).

# EXCEPTION LIST (round-12 cap overflow — 60 names owed a row vs 50
# slots, so these nine r10-green queries go one round on peer coverage).
# Each is chosen because its machinery is provably inside r11-green or
# r12-PRIORITY peers, and each is re-proven by the local gate
# (tools/check_correctness.py) at sf0.001/0.01/0.1 this round:
#   fund_manual_apply — runs the SAME _manual_base OCR pipeline
#     (doc-type detect, candidate-max P12, code-repair P13) as the three
#     r12-PRIORITY fund_manual_confirm / fund_manual_redemption /
#     fund_manual_dividend rows (the mirror of r11, which valved those
#     three on fund_manual_apply's r10 row); its apply-specific field
#     set is the same spec-dict machinery the r11-green
#     fund_purchase_apply drives on the text path;
#   dedup_incremental_exact — the content-hash batch collapse + history
#     anti-join; the r12-PRIORITY dedup_exact pins the normalized-md5
#     canonical machinery and dedup_incremental_minhash (r12-PRIORITY)
#     pins the batch-vs-persisted-index incremental join shape;
#   dedup_groups_star — same minhash_lsh_pairs input and the IDENTICAL
#     oracle as the r12-PRIORITY dedup_groups (both must reach the same
#     min-id fixpoint; a two-phase-vs-label-prop parity pytest holds
#     them together); only the large-star/small-star rewrite differs;
#   dedup_hybrid — composes minhash_lsh_pairs (r11-green
#     dedup_minhash_lsh) with the embedding-cosine confirm the
#     r12-PRIORITY dedup_embedding_cosine drives end-to-end;
#   events_tumbling_window — window() lowering; the r12-PRIORITY
#     events_sliding_window is the strict superset (same Expand + agg
#     shape with slide != width), events_session_window is r11-green;
#   window_running — running-sum window exchange; the r11-green
#     user_rolling_7d_spend pins the same partitionBy(user) ordered
#     range frame over events, asof_last_click (r11-green) the ordered
#     last-value form;
#   cast_round_coerce — N2 try_cast-to-NULL + half-away round2; the
#     same functions/cleaning.py coerce+round runs inside every
#     r11-green fund_* row (the money columns) and the r12-PRIORITY
#     fund_dividend_scaled;
#   semi_join_parts — left-semi existence join; the r11-green
#     anti_join_customers is the same existence-join family
#     (left-anti), distinct_pairs (r11-green) the same dedup-projection;
#   rollup_priority — ROLLUP lowering; the r11-green cube_lineitem is
#     the strict superset (CUBE = every ROLLUP grouping set and more,
#     same Expand-based lowering), grouping_sets_sql (r11-green) the
#     general form.
#
# DEPRIORITY: names that safely fall past the cap this round. The 50
# r11-green names (fresh driver rows in CORRECTNESS_r11, window open
# through round 13), the nine exception-list names above, and the
# rows-only-by-design sketch query. 50 + 9 + 1 = 60; with the two
# r12-registered names (dedup_incremental_minhash_indexed and
# vector_ann_ivf_indexed — local 3-SF gate this round, owed driver rows
# r13, the dim_merge precedent; they sit between PRIORITY and DEPRIORITY
# at positions 51-52) that accounts for all 112 registered names —
# nothing falls past by registration-order accident.
DEPRIORITY = [
    # nine exception-list names (peer coverage documented above)
    "fund_manual_apply",
    "dedup_incremental_exact",
    "dedup_groups_star",
    "dedup_hybrid",
    "events_tumbling_window",
    "window_running",
    "cast_round_coerce",
    "semi_join_parts",
    "rollup_priority",
    # rows-only by design (KLL/HLL sketch aggregate; rank-contract parity
    # is pytest-asserted) — its weak row adds nothing over r4's
    "event_value_stats_approx",
    # r11-green (driver rows in CORRECTNESS_r11): window open to round 13
    "dim_merge",
    "cube_lineitem",
    "topk_revenue",
    "agg_stats",
    "intersect_nations",
    "except_nations",
    "vector_cosine_topk",
    "quality_deciles",
    "doc_hash_split",
    "vector_ann_ivf",
    "dedup_ngram_capped",
    "dedup_minhash_lsh",
    "event_value_stats",
    "top_users_per_event",
    "attribution_join",
    "fund_classify",
    "fund_dividend",
    "fund_dividend_merged",
    "fund_quarantine",
    "fund_purchase_apply",
    "fund_purchase_confirm",
    "fund_redemption_confirm",
    "fund_conversion",
    "graph_pagerank",
    "multimodal_binary_stats",
    "dq_constraint_report",
    "k_anonymity_audit",
    "dim_join_left",
    "group_merge",
    "when_cascade_tier",
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
    "shipping_priority_topk",
    "market_share",
    "late_sole_supplier",
    "text_token_count",
    "source_capped_sample",
    "corpus_curation",
    "text_c4_filters",
    "events_session_window",
    "user_rolling_7d_spend",
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
