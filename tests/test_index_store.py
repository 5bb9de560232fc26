"""On-disk bucketed index store (r11, VERDICT r10 #2).

Proves the three claims the 100 TB index story rests on:
1. both prebuilt indexes round-trip through bucketed external tables —
   results against the on-disk index are bit-equal to results against
   the in-memory ``index_tables=`` handoff;
2. a FRESH session (no shared catalog state) re-attaches the files from
   the manifest alone and keeps the bucketing metadata;
3. the probe joins plan with NO Exchange on the index side — the
   bucketed scan (``Bucketed: true``) satisfies the join's required
   distribution, so only the (small) probe side shuffles.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _docs(spark, n=400):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n)
    )


def _vecs(spark, n=300):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(n)
    )


def _plan(df) -> str:
    # after execution AQE prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only the final section so scans and
    # exchanges aren't double-counted
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _exchanges(df) -> int:
    return _plan(df).count("Exchange ")


@pytest.fixture()
def no_broadcast(spark):
    """Small test tables would broadcast-join and hide the exchange
    geometry the bucketing exists to remove — force shuffle joins."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _drop(spark, *names):
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS `{n}`")


def test_minhash_index_disk_roundtrip_and_bucketed_probe_plan(
    spark, tmp_path, no_broadcast
):
    from fund_data_etl_pipeline_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )
    from fund_data_etl_pipeline_spark.operators.index_store import (
        load_minhash_index,
        save_minhash_index,
    )

    docs = _docs(spark)
    index_docs = docs.filter("doc_id % 4 != 0")
    batch = docs.filter("doc_id % 4 = 0")
    mem_idx = build_minhash_index(index_docs)
    base = str(tmp_path / "mh")
    prefix = "t_mh_rt"
    try:
        save_minhash_index(mem_idx, base, n_buckets=8, prefix=prefix)

        # fresh-session attach: a session whose catalog has never seen
        # these tables rebuilds them from the manifest DDL alone.
        # newSession() does NOT inherit runtime conf, so re-disable
        # broadcast there too or the exchange geometry is hidden.
        fresh = spark.newSession()
        fresh.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        _drop(fresh, f"{prefix}_prepped", f"{prefix}_bands")
        disk_idx = load_minhash_index(fresh, base, prefix=prefix)

        fresh_batch = _docs(fresh).filter("doc_id % 4 = 0")
        got = incremental_minhash_pairs(
            fresh_batch, index_tables=disk_idx
        )
        want = incremental_minhash_pairs(batch, index_tables=mem_idx)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert want.count() > 0  # non-vacuous corpus

        # plan asserts: both index scans are bucketed, and bucketing
        # removes exactly the two index-side exchanges (candidate join
        # on (band, key) + verify join on the doc id) vs the same plan
        # over plain un-bucketed reads of the SAME files
        plan = _plan(got)
        assert plan.count("Bucketed: true") == 2
        plain_idx = (
            fresh.read.parquet(f"{base}/prepped"),
            fresh.read.parquet(f"{base}/bands"),
        )
        plain = incremental_minhash_pairs(
            fresh_batch, index_tables=plain_idx
        )
        assert _exchanges(got) == _exchanges(plain) - 2
    finally:
        _drop(spark, f"{prefix}_prepped", f"{prefix}_bands")


def test_ivf_index_disk_roundtrip_and_bucketed_probe_plan(
    spark, tmp_path, no_broadcast
):
    from fund_data_etl_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_seed_topk,
    )
    from fund_data_etl_pipeline_spark.operators.index_store import (
        load_ivf_index,
        save_ivf_index,
    )

    vecs = _vecs(spark)
    queries = vecs.filter("vec_id % 29 = 0")
    mem_idx = build_ivf_index(vecs, n_lists=16)
    base = str(tmp_path / "ivf")
    prefix = "t_ivf_rt"
    try:
        save_ivf_index(mem_idx, base, n_buckets=8, prefix=prefix)

        fresh = spark.newSession()
        fresh.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        _drop(fresh, f"{prefix}_assigned")
        disk_idx = load_ivf_index(fresh, base, prefix=prefix)

        fresh_vecs = _vecs(fresh)
        fresh_queries = fresh_vecs.filter("vec_id % 29 = 0")
        got = ivf_seed_topk(
            fresh_vecs, fresh_queries, k=3, n_probe=2, index_tables=disk_idx
        )
        want = ivf_seed_topk(
            vecs, queries, k=3, n_probe=2, index_tables=mem_idx
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert want.count() > 0

        plan = _plan(got)
        assert plan.count("Bucketed: true") == 1
        plain_idx = (
            fresh.read.parquet(f"{base}/seeds"),
            fresh.read.parquet(f"{base}/assigned"),
        )
        plain = ivf_seed_topk(
            fresh_vecs, fresh_queries, k=3, n_probe=2, index_tables=plain_idx
        )
        # the list_id probe join keeps its index side exchange-free
        assert _exchanges(got) == _exchanges(plain) - 1
    finally:
        _drop(spark, f"{prefix}_assigned")


def test_attach_in_separate_jvm(tmp_path):
    """The real fresh-session claim: a SECOND python process (its own
    JVM, its own in-memory catalog) attaches the index from the
    manifest and sees the bucketed scan. Subprocesses are slow (~20 s
    JVM boot each) so this one test covers write-in-A / read-in-B for
    the minhash band table only."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = str(tmp_path / "mh2")
    script = """
import sys, os
sys.path.insert(0, {repo!r})
from fund_data_etl_pipeline_spark.session import get_spark
spark = get_spark("idxstore-proc", master="local[2]", shuffle_partitions=4,
                  extra_conf={{"spark.sql.warehouse.dir": {wh!r},
                               "spark.sql.autoBroadcastJoinThreshold": "-1"}})
phase = sys.argv[1]
if phase == "write":
    from fund_data_etl_pipeline_spark.operators.dedup import build_minhash_index
    from fund_data_etl_pipeline_spark.operators.index_store import save_minhash_index
    docs = (spark.read.parquet("{sf}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(200))
    save_minhash_index(build_minhash_index(docs), {base!r},
                       n_buckets=8, prefix="t_mh_jvm")
else:
    from pyspark.sql import functions as F
    from fund_data_etl_pipeline_spark.operators.index_store import load_minhash_index
    prepped, bands = load_minhash_index(spark, {base!r}, prefix="t_mh_jvm")
    probe = spark.createDataFrame([(0, "x")], "band int, key string")
    j = probe.join(bands, ["band", "key"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    # index side satisfied by bucketing: the only Exchange is the probe's
    assert plan.count("Exchange ") == 1, plan
    assert bands.count() > 0 and prepped.count() > 0
print("PHASE_OK", phase)
""".format(repo=repo, sf=SF, base=base, wh=str(tmp_path / "wh"))
    for phase in ("write", "read"):
        r = subprocess.run(
            [sys.executable, "-c", script, phase],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert f"PHASE_OK {phase}" in r.stdout, (r.stdout, r.stderr[-3000:])


def test_attach_rejects_shadowed_name_at_other_location(spark, tmp_path):
    """A second index saved under the same table name re-points the
    in-session registration; attaching the FIRST location must raise
    instead of silently returning the second index's rows (r11 review:
    the tableExists short-circuit used to hand back whatever the name
    last pointed at)."""
    from fund_data_etl_pipeline_spark.operators.index_store import (
        attach_bucketed_table,
        save_bucketed_table,
    )

    a = spark.range(5).selectExpr("id", "id * 2 AS v")
    b = spark.range(7).selectExpr("id", "id * 3 AS v")
    loc_a, loc_b = str(tmp_path / "ia"), str(tmp_path / "ib")
    name = "t_idx_shadow"
    try:
        save_bucketed_table(a, name, loc_a, ["id"], 4)
        save_bucketed_table(b, name, loc_b, ["id"], 4)  # re-points `name`
        # the honest path: attaching the location the name now points at
        assert attach_bucketed_table(spark, loc_b).count() == 7
        with pytest.raises(ValueError, match="points at"):
            attach_bucketed_table(spark, loc_a)
        # distinct name attaches the shadowed files fine
        got = attach_bucketed_table(spark, loc_a, name="t_idx_shadow_a")
        assert got.count() == 5
    finally:
        for n in (name, "t_idx_shadow_a"):
            spark.sql(f"DROP TABLE IF EXISTS `{n}`")
