"""Deep multi-join relational shapes: TPC-H Q5 (region-local supplier
revenue, a 6-table join with a cross-dimension equality) and Q18 (large-
quantity orders, aggregate-as-semi-join-filter).

Engine extension (the reference has no relational query surface beyond
its ETL joins — SURVEY §2.5 note): these are the canonical "did the
optimizer pick the right join order / join strategy" probes a Spark user
runs, proven value-exact against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents, round2
from ..sources import load_table
from . import _sqlgen as G
from . import format_doc, register

# the TPC-H revenue term, shared by every cents_sql oracle site
REV = "l_extendedprice * (1 - l_discount)"

_Q5_REGION = "ASIA"
_Q5_FROM = "1996-01-01"
_Q5_TO = "1997-01-01"  # exclusive


@register(
    "local_supplier_revenue",
    oracle=f"""
    SELECT n_name,
           ROUND(SUM({G.cents_sql(REV)}) / 100.0, 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{_Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{_Q5_FROM}'
      AND o_orderdate <  TIMESTAMP '{_Q5_TO}'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the ordering customer and
    the supplying supplier sit in the SAME nation of one region — the
    6-table join whose distinguishing feature is the non-key equality
    c_nationkey = s_nationkey linking two otherwise-independent join
    branches.

    Scale shape: the o_orderdate range predicate reaches the orders scan
    as a PushedFilter; the fact-side spine is the single shuffle
    lineitem ⋈ orders on orderkey. region ⋈ nation collapses to a handful
    of rows and rides a broadcast; customer and supplier get NO explicit
    hint — at this corpus size AQE broadcasts them, while at 100 TB
    (where TPC-H customer/supplier are fact-sized) the same plan falls
    back to shuffle joins on custkey/suppkey — exactly the
    strategy-by-statistics behavior you want, not something hand-pinned.
    The same-nation predicate is applied as the supplier join's second
    conjunct, so mismatching rows die inside the join instead of in a
    post-join filter. Final agg groups 25 nations — partial map-side agg
    collapses everything before one tiny exchange.

    Cross-engine exactness: per-row revenue quantizes to BIGINT cents
    before summing (order-independent); ties in the ORDER BY break on
    n_name.
    """
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q5_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    # region ⋈ nation: dimension-sized forever; explicit broadcast.
    local_nations = F.broadcast(
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey")).select(
            "n_nationkey", "n_name"
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_TO).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(local_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(round2(F.sum(rev_c) / 100.0, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_Q8_NATION = "NATION_3"
_Q8_REGION = "EUROPE"
_Q8_TYPE = "PROMO"
_Q8_FROM = "1995-01-01"
_Q8_TO = "1997-01-01"  # exclusive


@register(
    "market_share",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS INT) AS order_year,
             {G.cents_sql(REV)} AS rev_c,
             n_s.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey AND p_type = '{_Q8_TYPE}'
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n_c ON c_nationkey = n_c.n_nationkey
      JOIN region   ON n_c.n_regionkey = r_regionkey AND r_name = '{_Q8_REGION}'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n_s ON s_nationkey = n_s.n_nationkey
      WHERE o_orderdate >= TIMESTAMP '{_Q8_FROM}'
        AND o_orderdate <  TIMESTAMP '{_Q8_TO}'
    )
    SELECT order_year,
           {G.round_sql(
               f"SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev_c"
               " ELSE 0 END) * 1.0 / SUM(rev_c)", 6)} AS mkt_share
    FROM rev GROUP BY order_year ORDER BY order_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of {t}-part revenue sold into
    one region's customers, by order year — the ratio-of-conditional-
    aggregate pattern (numerator and denominator fold in the SAME
    aggregate pass; never two scans joined back).

    Scale shape: three independent dimension chains prune the fact —
    part filtered to the type (broadcast; a runtime bloom filter prunes
    fact rows behind it on a shuffle plan), customer⋈nation⋈region
    collapses to the region's custkeys, supplier⋈nation ships the
    supplier→nation map — and the orderdate range is a PushedFilter on
    orders. The single fact shuffle is lineitem ⋈ orders on orderkey;
    the share is a map-side conditional sum over BIGINT cents, one tiny
    exchange for ~2 year-groups. The numerator condition rides INTO the
    aggregate as a CASE, so the nation cut costs nothing extra.

    Cross-engine exactness: both sums are exact BIGINT cents; the one
    float op is the final division (identical operands both engines),
    rounded to 6.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q8_REGION
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    region, F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q8_TO).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            round2(
                F.sum(
                    F.when(F.col("supp_nation") == _Q8_NATION, rev_c).otherwise(
                        F.lit(0)
                    )
                )
                * 1.0
                / F.sum(rev_c),
                6,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


format_doc(market_share, t=_Q8_TYPE)


_Q7_NATION_A = "NATION_3"
_Q7_NATION_B = "NATION_7"
_Q7_FROM = "1995-01-01"
_Q7_TO = "1997-01-01"  # exclusive


@register(
    "volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           {G.round_sql(f"SUM({G.cents_sql(REV)}) / 100.0", 2)} AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('{_Q7_NATION_A}', '{_Q7_NATION_B}')
      AND n2.n_name IN ('{_Q7_NATION_A}', '{_Q7_NATION_B}')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '{_Q7_FROM}'
      AND l_shipdate <  TIMESTAMP '{_Q7_TO}'
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — the two-role dimension pattern (nation joins BOTH the supplier
    and the customer branch) with a cross-branch inequality.

    Scale shape: the textbook OR of nation pairs rewrites to an IN
    prefilter on EACH nation role plus one ``supp <> cust`` cut after
    both joins — the prefilter shrinks supplier/customer to the two
    nations' slice BEFORE the fact join (and would partition-prune a
    nation-partitioned layout), which the un-rewritten OR cannot do since
    it correlates the two branches. Both nation dims broadcast; the
    l_shipdate range is a PushedFilter on the fact scan; the one big
    shuffle is lineitem ⋈ orders on orderkey. The 2×2×years result
    collapses map-side.

    Cross-engine exactness: BIGINT-cents volume; the full group key is
    the sort key — total order.
    """
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q7_NATION_A, _Q7_NATION_B)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q7_TO).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    vol_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(round2(F.sum(vol_c) / 100.0, 2).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


_Q21_LATE_DAYS = 60
_Q21_TOPK = 20


@register(
    "late_sole_supplier",
    # The oracle is deliberately the TEXTBOOK doubly-correlated
    # EXISTS / NOT EXISTS form, while the Spark plan is the decorrelated
    # window rewrite — the green row proves the rewrite's semantic
    # equivalence, not just arithmetic agreement.
    oracle=f"""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_suppkey, COUNT(*) AS numwait FROM (
      SELECT DISTINCT l1.l_suppkey AS s_suppkey, l1.l_orderkey
      FROM lo l1
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM lo l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lo l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.late)
    ) t GROUP BY s_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT {_Q21_TOPK}
    """,
)
def late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely to blame for late multi-supplier
    orders — the doubly-correlated EXISTS (another supplier shares the
    order) + NOT EXISTS (no other supplier was also late) pattern, the
    canonical hard case for subquery decorrelation. "Late" is
    l_shipdate > o_orderdate + {days} days (this corpus
    carries no commit/receipt dates).

    Scale shape: instead of two correlated re-probes of the fact table
    (the textbook plan executes the subqueries per outer row), BOTH
    existence tests decorrelate into ONE window pass over the order key
    — per-order distinct-supplier and distinct-late-supplier counts via
    collect_set over the orderkey partition (state bounded by the ~4
    suppliers of an order, never the corpus) — so the whole query costs
    one fact shuffle. The sole-blame filter (late ∧ n_supp ≥ 2 ∧
    n_late = 1) is then map-side, the (supplier, order) distinct
    collapses to one row per blame, and TakeOrderedAndProject caps the
    supplier leaderboard at {k}.

    Cross-engine exactness: pure integer counts; ties break on
    s_suppkey — a total order through the LIMIT cut.
    """
    from pyspark.sql.window import Window

    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_Q21_LATE_DAYS} DAYS"
    )
    lo = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    w = Window.partitionBy("l_orderkey")
    per = lo.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late"),
    )
    sole = (
        per.filter(
            F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .select(F.col("l_suppkey").alias("s_suppkey"), "l_orderkey")
        .distinct()
    )
    return (
        sole.groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(_Q21_TOPK)
    )


_Q18_MIN_QTY = 250  # ~p99 of per-order quantity in this corpus


@register(
    "large_order_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey AS bk, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(total_qty, 1)    AS total_qty
    FROM big
    JOIN orders   ON o_orderkey = bk
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding orders whose summed line
    quantity exceeds a threshold — the aggregate-as-filter pattern where
    a GROUP BY ... HAVING over the fact table gates a join back to the
    header tables.

    Scale shape: the quantity rollup is a partial-aggregable hash agg on
    l_orderkey — map-side combine collapses the 4-line average order
    before the one fact shuffle, and the HAVING cut (~1% survival here)
    happens at the aggregate, so the subsequent joins move only surviving
    orderkeys. The big→orders join shares the orderkey the agg just
    shuffled on, so AQE plans it without re-exchanging the aggregated
    side (or broadcasts it outright — post-HAVING it is tiny). Unlike
    TPC-H's textbook form there is no second lineitem re-join: total_qty
    rides out of the aggregate, saving a whole fact-table pass —
    ``ROWS-per-order`` semantics are identical. TakeOrderedAndProject
    caps the final sort at 100 rows per partition.

    Cross-engine exactness: l_quantity is an integral-valued double
    (1..50), so SUM is exact in both engines; ROUND(total, 1) only
    normalizes the display. Ties in the ORDER BY break on o_orderkey.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > _Q18_MIN_QTY)
        .select(F.col("l_orderkey").alias("bk"), "qty")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("bk"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            round2(F.col("o_totalprice"), 2).alias("o_totalprice"),
            round2(F.col("qty"), 1).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


format_doc(late_sole_supplier, days=_Q21_LATE_DAYS, k=_Q21_TOPK)
