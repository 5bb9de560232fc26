"""Data-governance queries: a Deequ-style declarative data-quality
constraint report and a k-anonymity audit.

Engine extension (SURVEY §2 extensions note): the reference's only
quality surface is its validity gate (F5) and quarantine side-channel
(S7); a production lake adds dataset-level contracts — null rates, key
uniqueness, accepted value sets, numeric ranges, referential integrity —
checked continuously (the AWS Deequ / dbt-test model) and privacy audits
over quasi-identifier groups (Sweeney's k-anonymity). Both are plain
aggregates, so they ship with exact oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import format_doc, register

_ACCEPTED_STATUS = ("O", "F", "P")


def constraint_report(
    orders: DataFrame, lineitem: DataFrame, customer: DataFrame
) -> DataFrame:
    """(rule, violations, status) per declared contract rule.

    Scale shape: every single-table rule folds into ONE side-by-side
    aggregate per table (a single scan computing all of that table's
    metrics map-side — never a per-rule re-scan, the Deequ "analyzer
    batching" trick); the two referential rules are anti-join counts
    whose right sides are key projections (broadcast when dimension-
    sized, shuffle otherwise — AQE's call). The per-table metric rows
    unpivot via ``stack`` and union; total output is one row per rule.
    """
    ostat = F.col("o_orderstatus")
    orders_m = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "dup_keys"
        ),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
        F.count(F.when(~ostat.isin(*_ACCEPTED_STATUS), 1)).alias("bad_status"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("bad_price"),
    ).select(
        F.expr(
            "stack(4,"
            " 'orders.o_orderkey is unique', dup_keys,"
            " 'orders.o_custkey is complete', null_cust,"
            " 'orders.o_orderstatus in (O,F,P)', bad_status,"
            " 'orders.o_totalprice > 0', bad_price"
            ") AS (rule, violations)"
        )
    )
    li_m = lineitem.agg(
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_disc"),
        F.count(
            F.when((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50), 1)
        ).alias("bad_qty"),
    ).select(
        F.expr(
            "stack(2,"
            " 'lineitem.l_discount in [0,1]', bad_disc,"
            " 'lineitem.l_quantity in (0,50]', bad_qty"
            ") AS (rule, violations)"
        )
    )
    li_orphans = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("lineitem.l_orderkey references orders").alias("rule"),
            "violations",
        )
    )
    o_orphans = (
        orders.select("o_custkey")
        .join(
            customer.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("orders.o_custkey references customer").alias("rule"),
            "violations",
        )
    )
    return (
        orders_m.unionByName(li_m)
        .unionByName(li_orphans)
        .unionByName(o_orphans)
        .select(
            "rule",
            "violations",
            F.when(F.col("violations") == 0, F.lit("pass"))
            .otherwise(F.lit("fail"))
            .alias("status"),
        )
    )


@register(
    "dq_constraint_report",
    oracle=f"""
    WITH om AS (
      SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys,
             COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_cust,
             COUNT(CASE WHEN o_orderstatus NOT IN
                   ('{"', '".join(_ACCEPTED_STATUS)}')
                   THEN 1 END) AS bad_status,
             COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS bad_price
      FROM orders
    ),
    lm AS (
      SELECT COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
               AS bad_disc,
             COUNT(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 END)
               AS bad_qty
      FROM lineitem
    ),
    rows_ AS (
      SELECT 'orders.o_orderkey is unique' AS rule, dup_keys AS violations FROM om
      UNION ALL SELECT 'orders.o_custkey is complete', null_cust FROM om
      UNION ALL SELECT 'orders.o_orderstatus in (O,F,P)', bad_status FROM om
      UNION ALL SELECT 'orders.o_totalprice > 0', bad_price FROM om
      UNION ALL SELECT 'lineitem.l_discount in [0,1]', bad_disc FROM lm
      UNION ALL SELECT 'lineitem.l_quantity in (0,50]', bad_qty FROM lm
      UNION ALL SELECT 'lineitem.l_orderkey references orders',
        (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
         ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
      UNION ALL SELECT 'orders.o_custkey references customer',
        (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
         ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
    )
    SELECT rule, violations,
           CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM rows_
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declared contract suite over the corpus star schema."""
    return constraint_report(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


_K_ANON = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS group_size,
           COUNT(*) >= {_K_ANON} AS anonymous
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the (mktsegment, nationkey) quasi-identifier
    pair: any group smaller than k={_K_ANON} re-identifies its members —
    those rows need suppression or generalization before release.

    Scale shape: ONE partial-aggregable hash agg on the quasi-identifier
    key; the flag is a map-side expression on the collapsed groups. The
    release-side suppression (anti-join producing the publishable rows)
    reuses this aggregate as its broadcast side.
    """
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_mktsegment",
            "c_nationkey",
            "group_size",
            (F.col("group_size") >= _K_ANON).alias("anonymous"),
        )
    )


format_doc(k_anonymity_audit, _K_ANON=_K_ANON)
