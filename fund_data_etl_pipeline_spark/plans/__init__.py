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
        dedup,
        events,
        fundetl,
        multimodal,
        relational,
        relational2,
        textops,
        vectors,
        windows,
    )


# Round-3 rotation policy: the driver caps its correctness sweep at ~50
# queries (in registry order) while 78 are registered, so ordering decides
# who gets a row. Invariant maintained: every query has a GREEN driver row
# within the last two rounds. This round's front: the five queries whose
# r02 rows were lost to the events.ts schema change (fixed, must
# re-prove), the round-3 additions (first appearance), then everything
# whose only green row is from round 1 (they sat in DEPRIORITY last
# round).
PRIORITY = [
    # r02 rows errored on the regenerated events.ts encoding — fixed in
    # sources/tables.py; fresh rows prove it at the gate
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "json_extract_agg",
    "asof_last_click",
    # round-3 additions: first-appearance driver rows
    "dedup_canonical",
    "source_mixture_weights",
    "user_retention_cohorts",
    "events_funnel",
    "event_value_stats",
    "corpus_curation",
    "quality_weighted_sample",
    "text_c4_filters",
    "dedup_groups_star",
    "top_users_per_event",
    # green in round 1 only (deprioritized past the cap in round 2)
    "union_slices",
    "distinct_pairs",
    "mixed_sort_key",
    "intersect_nations",
    "except_nations",
    "cast_round_coerce",
    "isin_filter",
    "agg_stats",
    "derived_arithmetic",
    "text_token_count",
    "dedup_ngram_jaccard",
    "semi_join_parts",
    "anti_join_customers",
    "cube_lineitem",
    "grouping_sets_sql",
    "topk_revenue",
    "dim_join_left",
]


# Names that may safely fall past the driver's cap THIS round: all have a
# green round-2 row (or, for the no-oracle trio, their round-2 weak row)
# and exercise machinery other checked queries also cover. Sized to
# >= (registered - 50) so the cap's cut is wholly chosen here, never an
# arbitrary registration-order tail. Least-risky last (the cut eats from
# the end of the ordered dict backwards... i.e. the tail is what the cap
# drops, so the first entries here may still be checked).
DEPRIORITY = [
    # checked-if-slots-remain boundary: fresh r02 green, diverse machinery
    "window_running",
    "salted_skew_agg",
    # r02-green / r02-weak, machinery proven by other checked queries
    "fund_dividend_scaled",
    "vector_ann_lsh",
    "vector_ann_ivf",
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
    # exact-dedup machinery also inside corpus_curation (same hash) and
    # the incremental-dedup pytest lifecycle
    "dedup_exact",
    # stopword-profile machinery also inside text_quality / curation
    "text_lang_id",
    # counting machinery also inside corpus_curation / text_c4_filters
    "text_quality",
    # the entry() smoke and the bench headline prove this one every round
    "pricing_summary",
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
