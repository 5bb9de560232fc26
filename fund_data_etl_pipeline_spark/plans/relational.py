"""Relational operator suite over the synthetic star schema.

Each query maps a ★ operator from SURVEY.md §2 onto the TPC-H-ish tables
(FIXTURES.md §4) so the driver's DuckDB oracle can verify it at sf0.01:

- J1  broadcast left dimension join          -> dim_join_left
- A1  group-merge (sum / ordered-distinct-concat / first) -> group_merge
- A2  counting aggregates                    -> agg_stats
- C1  first-match when-cascade classifier    -> when_cascade_tier
- Q1  isin whitelist filter                  -> isin_filter
- N2  cast-coerce + round                    -> cast_round_coerce
- N3  date defaulting / arithmetic           -> date_math
- N4  arithmetic derivation with fallback    -> derived_arithmetic
- U1  union-all accumulation                 -> union_slices
- O1  mixed-type numeric-first sort key      -> mixed_sort_key
- plus the standard surface the engine gets from Spark: window functions,
  rollup, pivot, semi/anti joins, top-k, distinct, JSON extraction.

Conventions (SURVEY.md §2.14.4, FIXTURES.md §3): money compared after
ROUND(CAST(x AS DOUBLE), 2); dates serialized as strings on both sides;
every computed column aliased identically in Spark and oracle SQL.

Scale notes (100 TB design): every query here is a declarative plan —
filters and projections reach the parquet scan, dimension joins carry an
explicit ``broadcast()`` hint, aggregations use Spark's partial/final
hash-agg (map-side combine), and no operator collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import cents, round2
from ..sources import load_table
from . import _sqlgen as G
from . import register

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan -> filter -> hash agg).
# Reference analogue: the normalize+aggregate tail of every job
# (dividend_extractor.py:1398-1483).
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE       AS sum_base_price,
           ROUND(SUM(l_extendedprice::DECIMAL(12,2)
                     * (1::DECIMAL(4,2) - l_discount::DECIMAL(4,2))), 2)::DOUBLE
                                                                       AS sum_disc_price,
           ROUND(SUM(l_extendedprice::DECIMAL(12,2)
                     * (1::DECIMAL(4,2) - l_discount::DECIMAL(4,2))
                     * (1::DECIMAL(4,2) + l_tax::DECIMAL(4,2))), 2)::DOUBLE
                                                                       AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # money sums in EXACT decimal arithmetic (r11): summing raw doubles
    # is order-dependent (~1e-13 relative), which crosses a half-cent
    # rounding boundary often enough to flake the value hash on large
    # groups (the numeric.cents lesson). price/discount/tax are 2-decimal
    # values, so their decimal products are exact at scale <= 6 and the
    # sums are associative integers underneath — ROUND happens in decimal
    # on BOTH engines, then one cast to double for the output schema.
    price_d = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_d = F.col("l_discount").cast("decimal(4,2)")
    tax_d = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    dp = price_d * (one - disc_d)
    charge = dp * (one + tax_d)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round2(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(price_d), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(dp), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            round2(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J1 — dimension left join, broadcast-hash, unmatched -> NULL
# (reference: `map(product_code_dict)` dividend_extractor.py:1408).
# The dimension is restricted so some fact rows genuinely miss.
# --------------------------------------------------------------------------


@register(
    "dim_join_left",
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey,
           c.c_name       AS cust_name,
           c.c_mktsegment AS segment
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
      ON o.o_custkey = c.c_custkey
    """,
)
def dim_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0)
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


# --------------------------------------------------------------------------
# A1 — group-merge: sum + ordered-distinct platform concat + first(other)
# (dividend_extractor.py:1455-1483). Encounter order there is file order;
# the engine uses sorted order so the result is deterministic under any
# partitioning (documented divergence; merge_platforms order-preserving
# variant lives in operators/aggregate.py for single-partition parity).
# --------------------------------------------------------------------------


@register(
    "group_merge",
    oracle=f"""
    SELECT c.c_nationkey,
           ROUND(SUM({G.cents_sql("o.o_totalprice")}) / 100.0, 2) AS sum_price,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(o.o_orderpriority))), '、')
                                         AS priorities,
           MIN(o.o_orderstatus)          AS first_status,
           COUNT(*)                      AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def group_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            round2(F.sum(cents("o_totalprice")) / 100.0, 2).alias("sum_price"),
            F.concat_ws("、", F.sort_array(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
            F.min("o_orderstatus").alias("first_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# C1 — ordered when-cascade classifier, first match wins, no-match -> NULL
# (dividend_extractor.py:1301-1396). Predicates deliberately overlap so
# the cascade order is observable.
# --------------------------------------------------------------------------


@register(
    "when_cascade_tier",
    oracle=f"""
    SELECT tier, COUNT(*) AS n_parts,
           ROUND(SUM({G.cents_sql("p_retailprice")}) / 100.0, 2) AS sum_price
    FROM (
      SELECT CASE
               WHEN p_type LIKE '%PROMO%' AND p_size > 30 THEN 'promo_large'
               WHEN p_type LIKE '%PROMO%'                 THEN 'promo'
               WHEN p_type LIKE '%ECONOMY%'               THEN 'economy'
               WHEN p_size > 40                           THEN 'oversize'
             END AS tier,
             p_retailprice
      FROM part
    )
    GROUP BY tier
    """,
)
def when_cascade_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    tier = (
        F.when(
            F.col("p_type").contains("PROMO") & (F.col("p_size") > 30), "promo_large"
        )
        .when(F.col("p_type").contains("PROMO"), "promo")
        .when(F.col("p_type").contains("ECONOMY"), "economy")
        .when(F.col("p_size") > 40, "oversize")
    )
    return (
        part.withColumn("tier", tier)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            round2(F.sum(cents("p_retailprice")) / 100.0, 2).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Q1 — isin whitelist (manual_purchase_confirm_extractor.py:407).
# --------------------------------------------------------------------------


@register(
    "isin_filter",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(SUM({G.cents_sql("o_totalprice")}) / 100.0, 2) AS sum_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round2(F.sum(cents("o_totalprice")) / 100.0, 2).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# N2 — cast-coerce (invalid -> NULL) + round(2)
# (`pd.to_numeric(errors='coerce').round(2)` dividend_extractor.py:1406).
# --------------------------------------------------------------------------


@register(
    "cast_round_coerce",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val,
           TRY_CAST(event_type AS DOUBLE)                        AS bogus_num,
           ROUND(CAST(value AS DOUBLE), 2)                       AS value_2dp
    FROM events
    """,
)
def cast_round_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("double").alias("k_val"),
        F.col("event_type").try_cast("double").alias("bogus_num"),
        round2(F.col("value").cast("double"), 2).alias("value_2dp"),
    )


# --------------------------------------------------------------------------
# N3 — date arithmetic + yyyyMMdd serialization (dividend cutoff = date-1,
# dividend_extractor.py:1411-1415; T+n redemption_extractor.py:662-672).
# --------------------------------------------------------------------------


@register(
    "date_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 2)          AS net_price,
           STRFTIME(l_shipdate, '%Y%m%d')                        AS ship_yyyymmdd,
           STRFTIME(l_shipdate - INTERVAL 1 DAY, '%Y%m%d')       AS cutoff_yyyymmdd,
           STRFTIME(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS arrival_date
    FROM lineitem
    """,
)
def date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round2(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "net_price"
        ),
        F.date_format("l_shipdate", "yyyyMMdd").alias("ship_yyyymmdd"),
        F.date_format(F.date_sub("l_shipdate", 1), "yyyyMMdd").alias(
            "cutoff_yyyymmdd"
        ),
        F.date_format(F.date_add("l_shipdate", 30), "yyyy-MM-dd").alias(
            "arrival_date"
        ),
    )


# --------------------------------------------------------------------------
# N4 — arithmetic derivation with NULL fallback (conversion in_amount =
# out_amount - fee, fallback on parse failure, conversion_extractor.py:212-219;
# refund = apply - confirm, manual_purchase_confirm_extractor.py:348-354).
# --------------------------------------------------------------------------


@register(
    "derived_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(COALESCE(l_extendedprice - l_extendedprice * l_discount,
                          l_extendedprice), 2) AS in_amount,
           ROUND(l_extendedprice * l_discount, 2) AS fee,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE ROUND(l_extendedprice / NULLIF(l_discount, 0), 2)
           END AS amount_per_disc
    FROM lineitem
    """,
)
def derived_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fee = F.col("l_extendedprice") * F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round2(F.coalesce(F.col("l_extendedprice") - fee, F.col("l_extendedprice")), 2)
        .alias("in_amount"),
        round2(fee, 2).alias("fee"),
        F.when(F.col("l_discount") == 0, F.lit(None).cast("double"))
        .otherwise(
            round2(
                F.col("l_extendedprice") / F.nullif(F.col("l_discount"), F.lit(0)), 2
            )
        )
        .alias("amount_per_disc"),
    )


# --------------------------------------------------------------------------
# U1 — union-all accumulation (pd.concat, dividend_extractor.py:1420).
# Overlapping slices on purpose: union ALL keeps duplicates like concat.
# --------------------------------------------------------------------------


@register(
    "union_slices",
    oracle="""
    SELECT o_orderkey, o_orderstatus, src FROM (
      SELECT o_orderkey, o_orderstatus, 'urgent' AS src
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, 'big' AS src
      FROM orders WHERE o_totalprice > 100000
    )
    """,
)
def union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus", F.lit("urgent").alias("src")
    )
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        "o_orderkey", "o_orderstatus", F.lit("big").alias("src")
    )
    return urgent.unionByName(big)


# --------------------------------------------------------------------------
# O1 — mixed-type numeric-first sort key (ui/product_code_manager.py:37-73:
# `(0, int(x))` when castable else `(1, str(x))`). Rank materialized so the
# order survives the driver's order-insensitive hash.
# --------------------------------------------------------------------------


@register(
    "mixed_sort_key",
    oracle="""
    SELECT c_custkey, sort_key,
           ROW_NUMBER() OVER (
             ORDER BY CASE WHEN TRY_CAST(sort_key AS INTEGER) IS NULL THEN 1 ELSE 0 END,
                      TRY_CAST(sort_key AS INTEGER),
                      sort_key,
                      c_custkey
           ) AS rank
    FROM (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN c_name
                  ELSE CAST(c_custkey AS VARCHAR) END AS sort_key
      FROM customer
    )
    """,
)
def mixed_sort_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    keyed = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_name"))
        .otherwise(F.col("c_custkey").cast("string"))
        .alias("sort_key"),
    )
    as_int = F.col("sort_key").try_cast("int")
    w = W.orderBy(
        F.when(as_int.isNull(), 1).otherwise(0),
        as_int,
        F.col("sort_key"),
        F.col("c_custkey"),
    )
    return keyed.withColumn("rank", F.row_number().over(w))


# --------------------------------------------------------------------------
# Top-k (engine extension; P12's max is the k=1 analogue).
# --------------------------------------------------------------------------


@register(
    "topk_revenue",
    oracle=f"""
    SELECT o_custkey,
           ROUND(SUM({G.cents_sql("o_totalprice")}) / 100.0, 2) AS revenue
    FROM orders
    GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey
    LIMIT 10
    """,
)
def topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(round2(F.sum(cents("o_totalprice")) / 100.0, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Window functions — running sum + lead (the engine formulation of the
# reference's label-line/value-line pairing, SURVEY §2.5 J2).
# --------------------------------------------------------------------------


@register(
    "window_running",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROW_NUMBER() OVER w AS rn,
           ROUND(SUM(l_quantity) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           LEAD(l_quantity) OVER w AS next_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        round2(
            F.sum("l_quantity").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        ).alias("running_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
    )


# --------------------------------------------------------------------------
# A2 — counting / summary aggregates (audit counters,
# dividend_extractor.py:1422-1438).
# --------------------------------------------------------------------------


@register(
    "agg_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*)                      AS n_events,
           COUNT(DISTINCT user_id)       AS n_users,
           ROUND(SUM({G.cents_sql("value")}) * 1.0
                 / COUNT(*) / 100.0, 3)  AS avg_value,
           ROUND(MIN(value), 3)          AS min_value,
           ROUND(MAX(value), 3)          AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        round2(
            F.sum(cents("value")) * F.lit(1.0)
            / F.count(F.lit(1)) / F.lit(100.0),
            3,
        ).alias("avg_value"),
        round2(F.min("value"), 3).alias("min_value"),
        round2(F.max("value"), 3).alias("max_value"),
    )


# --------------------------------------------------------------------------
# JSON property extraction (the engine treats events.props as a JSON doc;
# reference config JSON is S5).
# --------------------------------------------------------------------------


@register(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           ROUND(AVG(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 3) AS avg_k,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER))           AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return events.groupBy("event_type").agg(
        round2(F.avg(k), 3).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# Semi/anti joins (engine surface beyond the reference, SURVEY §2.5 note).
# --------------------------------------------------------------------------


@register(
    "anti_join_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_no_recent_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_no_recent_orders"))
    )


@register(
    "semi_join_parts",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_sold_parts
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
                  AND l.l_quantity > 45)
    GROUP BY p_brand
    """,
)
def semi_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_sold_parts"))
    )


# --------------------------------------------------------------------------
# Rollup + pivot (engine surface; no grouping sets in the reference,
# SURVEY §2.8 note — Spark provides them natively).
# --------------------------------------------------------------------------


@register(
    "rollup_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM({G.cents_sql("o_totalprice")}) / 100.0, 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        round2(F.sum(cents("o_totalprice")) / 100.0, 2).alias("sum_price"),
    )


@register(
    "pivot_status",
    # COUNT(*) FILTER is BIGINT and never NULL in DuckDB, matching the
    # coalesced BIGINT pivot cells on the Spark side — empty cells are a
    # concrete 0 in BOTH engines so the driver's value hash can't diverge
    # on NULL-vs-absent or int-width (round-1 hash_match=false root cause).
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("bigint").alias(c)
            for c in ("O", "F", "P")
        ],
    )


# --------------------------------------------------------------------------
# Distinct projection (dedup building block).
# --------------------------------------------------------------------------


@register(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct()
