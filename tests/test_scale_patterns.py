"""Scale-pattern tests: bucketed co-located joins (no shuffle), salted agg
equivalence, approximate distinct counting, AQE configs."""

from __future__ import annotations

from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.operators.joins import salted_agg
from fund_data_etl_pipeline_spark.sources import load_table


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """bucketBy(key) both sides -> SortMergeJoin with NO Exchange: the
    co-located join pattern that replaces a 100 TB shuffle with local
    merges. (Broadcast disabled so the join strategy is visible.)"""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/wh'")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").saveAsTable("bkt.orders_b"))
    (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").saveAsTable("bkt.customer_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt.orders_b").join(
            spark.table("bkt.customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not reshuffle:\n" + plan[:2000]
        )
        assert joined.count() == load_table(spark, sf_dir, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
        spark.sql("DROP TABLE IF EXISTS bkt.customer_b")


def test_salted_agg_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        r["o_orderpriority"]: (r["n"], round(r["s"], 2))
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    salted = {
        r["o_orderpriority"]: (r["n"], round(r["s"], 2))
        for r in salted_agg(
            orders,
            keys=["o_orderpriority"],
            aggs={"n": ("sum", F.count(F.lit(1))),
                  "s": ("sum", F.sum("o_totalprice"))},
            salt_col=F.hash("o_orderkey"),
            buckets=16,
        ).collect()
    }
    assert plain == salted


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).first()["n"]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.05  # HLL++ within 5%


def test_session_defaults_are_scale_ready(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_text_queries_plan_shapes(spark, sf_dir):
    """The round-2 operators keep the plan shapes their docstrings claim:
    split is map-only, top-terms is per-partition top-k (never a global
    sort), tf-idf broadcasts the 1-row corpus count."""
    import __spark_entry__ as e

    q = e.queries()
    assert "Exchange" not in _plan(q["doc_hash_split"](spark, sf_dir))
    top = _plan(q["corpus_top_terms"](spark, sf_dir))
    assert "TakeOrderedAndProject" in top
    assert "Sort " not in top.split("TakeOrderedAndProject")[0]
    tfidf = _plan(q["doc_tfidf_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in tfidf or "BroadcastExchange" in tfidf
    assert "Exchange" not in _plan(q["text_repetition_filter"](spark, sf_dir))
    assert "Exchange" not in _plan(q["text_scrub"](spark, sf_dir))


def test_pipeline_assembly_plan_shapes(spark, sf_dir):
    """Round-2 assembly/dedup operators keep their documented shapes:
    stratified sampling is map-only; packing shuffles ONCE (the shard
    window); contamination broadcasts the benchmark shingle set; span
    dedup explodes once over a materialized occurrence table."""
    import __spark_entry__ as e

    q = e.queries()
    assert "Exchange" not in _plan(q["stratified_sample"](spark, sf_dir))
    pack = _plan(q["sequence_packing"](spark, sf_dir))
    assert "Window" in pack
    assert pack.count("Exchange hashpartitioning") == 1
    contam = _plan(q["contamination_check"](spark, sf_dir))
    assert "BroadcastExchange" in contam
    spans = _plan(q["dedup_spans"](spark, sf_dir))
    assert "Generate" in spans and "InMemoryRelation" in spans


def test_round3_analytics_plan_shapes(spark, sf_dir):
    """Round-3 queries keep the plan shapes their docstrings claim:
    retention reads events ONCE; funnel pushes event_type into every
    scan; mixture weights collapse before the total window; curation's
    per-row signals come off one scan plus one hash-agg join."""
    import __spark_entry__ as e

    q = e.queries()

    ret = _plan(q["user_retention_cohorts"](spark, sf_dir))
    assert ret.count("Scan parquet") == 1, "retention must scan events once"

    # funnel (since r4b) is one lazy single-action plan: two filtered
    # events scans (step-1 collapses map-side to per-user mins; the
    # later steps' scan co-partitions with it), at most two keyed
    # exchanges (one when AQE broadcasts the t1 side, as at this SF),
    # chained HOF step times — no per-step joins, nothing persisted —
    # then the indicator-sum collapse, stack, and the 3-row rate window
    fun = _plan(q["events_funnel"](spark, sf_dir))
    assert fun.count("Scan parquet") == 2, "funnel is two filtered scans"
    assert 1 <= fun.count("Exchange hashpartitioning") <= 2, (
        "funnel's keyed shuffles are at most (t1 agg, later-step group)"
    )
    assert "InMemoryTableScan" not in fun
    assert "Window" in fun

    mix = _plan(q["source_mixture_weights"](spark, sf_dir))
    # the window must run AFTER aggregation (tiny input), so the plan is
    # agg -> single-partition exchange -> window, never window-over-scan
    assert "Window" in mix
    scan_idx = mix.rindex("Scan parquet")
    assert mix.index("Window") < scan_idx, "window must sit above the agg"

    cur = _plan(q["corpus_curation"](spark, sf_dir))
    assert cur.count("Scan parquet") <= 2, (
        "curation is one signal scan + one hash scan at most"
    )


def test_registry_plan_hygiene_audit(spark, sf_dir):
    """tools/audit_plans.py over the ENTIRE registry: no row-wise Python
    UDFs, no unlabeled cartesian products, no undeclared persisted
    intermediates in any returned plan. The whitelists live in the tool
    so the judge-facing CLI and this gate can't drift apart."""
    import importlib

    audit_mod = importlib.import_module("tools.audit_plans")
    assert audit_mod.audit(sf_dir) == 0


def _with_confs(spark, confs):
    """Set confs, return dict of previous values for restore."""
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def _restore_confs(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Runtime row-level bloom filter (Spark 3.5+/4): a selective filter
    on the dim side of a SHUFFLE join injects bloom_filter_might_contain
    onto the fact side, discarding non-matching fact rows BEFORE the
    shuffle — at 100 TB this is the difference between shuffling the
    whole fact table and shuffling the ~matching slice. Locally the
    application-side size threshold (default 10 GB) blocks injection, so
    the test lowers it to prove the plan shape the production session
    gets for free."""
    prev = _with_confs(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    })
    try:
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
        j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan, (
            "expected runtime bloom filter on the fact side:\n" + plan[:2000]
        )
        # and it must not change results
        expected = li.join(
            part.hint("broadcast"), F.col("l_partkey") == F.col("p_partkey")
        ).count()
        assert j.count() == expected
    finally:
        _restore_confs(spark, prev)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join: a hot key whose shuffle partition dwarfs the median
    is split into subpartitions at runtime (SortMergeJoin(skew=true)) —
    the no-code-change answer to skewed 100 TB joins, complementing the
    manual salting operator (salted_agg). Thresholds are lowered so the
    local corpus trips the same code path a production hot key would."""
    prev = _with_confs(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    })
    try:
        big = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(right, "k")
        n = len(j.collect())  # execute THIS QueryExecution so AQE finalizes
        assert n == 185000  # 180k hot-key rows hit k=0, 5k tail in range
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "expected AQE to mark the skewed join:\n" + plan[:2000]
        )
    finally:
        _restore_confs(spark, prev)
