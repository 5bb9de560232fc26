"""Streaming twins added in round 4b: the stateful z-score anomaly gate
(parity with the batch window query) and the watermarked stream-stream
attribution join (parity with the batch join)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.streaming.joins import click_purchase_attribution
from fund_data_etl_pipeline_spark.streaming.stateful import streaming_anomaly_zscore

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _mk_events():
    """Two users, flat-with-jitter series, one planted spike each —
    ordered by ts so streamed delivery matches the batch frame order."""
    rows = []
    eid = 0
    for i in range(40):
        for uid, base_v, spike_at in ((1, 10.0, 30), (2, 50.0, 35)):
            v = base_v + (0.05 if i % 2 else -0.05) + (i % 3) * 0.01
            if i == spike_at:
                v = base_v * 40
            rows.append(
                {
                    "event_id": eid,
                    "ts": "2026-01-15 10:%02d:%02d" % (i, uid),
                    "user_id": uid,
                    "event_type": "click" if i % 2 else "view",
                    "value": round(v, 2),
                }
            )
            eid += 1
    return rows


def test_streaming_anomaly_parity_with_batch(spark, tmp_path):
    """Replaying the feed in two micro-batch runs flags the SAME rows
    with the SAME zscores as the batch window query over the union."""
    from fund_data_etl_pipeline_spark.plans.scoring import events_anomaly_zscore

    rows = _mk_events()
    cut = len(rows) // 2  # rows are ts-ordered; split is a time boundary
    src = tmp_path / "stream"
    src.mkdir()
    out = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        q = (
            streaming_anomaly_zscore(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_jsonl(src / "b1.json", rows[:cut])
    run()
    _write_jsonl(src / "b2.json", rows[cut:])
    run()

    streamed = {
        r["event_id"]: (r["user_id"], r["value"], r["zscore"], r["n_window"])
        for r in spark.read.parquet(out).collect()
    }

    batch_dir = str(tmp_path / "batch")
    (
        spark.createDataFrame(
            [tuple(r.values()) for r in rows],
            "event_id long, ts string, user_id long,"
            " event_type string, value double",
        )
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("props", F.lit("{}"))
        .write.mode("overwrite")
        .parquet(os.path.join(batch_dir, "events.parquet"))
    )
    expected = {
        r["event_id"]: (r["user_id"], r["value"], r["zscore"], r["n_window"])
        for r in events_anomaly_zscore(spark, batch_dir).collect()
    }

    assert expected, "planted spikes must flag in batch"
    assert streamed == expected
    # both planted spikes among the flags (spikes are events of users 1/2
    # at i==30/35, i.e. values 400.0 / 2000.0)
    flagged_vals = {v[1] for v in streamed.values()}
    assert 400.0 in flagged_vals and 2000.0 in flagged_vals


def test_streaming_anomaly_state_is_bounded(spark, tmp_path):
    """n_window never exceeds Z_LOOKBACK even with a long history — the
    deque is the bound, not the stream length."""
    from fund_data_etl_pipeline_spark.plans.scoring import Z_LOOKBACK

    rows = _mk_events()
    src = tmp_path / "stream"
    src.mkdir()
    _write_jsonl(src / "all.json", rows)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = (
        streaming_anomaly_zscore(stream)
        .writeStream.format("memory")
        .queryName("zs_bounded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM zs_bounded").collect()
    assert got
    assert all(r["n_window"] <= Z_LOOKBACK for r in got)


def _mk_attribution_feed():
    clicks, purchases = [], []
    # user 1: click 10:00, purchases 10:10 (inside) and 10:45 (outside)
    clicks.append({"event_id": 1, "ts": "2026-01-15 10:00:00", "user_id": 1,
                   "event_type": "click", "value": 0.5})
    purchases.append({"event_id": 100, "ts": "2026-01-15 10:10:00",
                      "user_id": 1, "event_type": "purchase", "value": 9.99})
    purchases.append({"event_id": 101, "ts": "2026-01-15 10:45:00",
                      "user_id": 1, "event_type": "purchase", "value": 5.00})
    # user 2: two clicks before one purchase -> two candidate rows
    clicks.append({"event_id": 2, "ts": "2026-01-15 10:05:00", "user_id": 2,
                   "event_type": "click", "value": 0.1})
    clicks.append({"event_id": 3, "ts": "2026-01-15 10:20:00", "user_id": 2,
                   "event_type": "click", "value": 0.2})
    purchases.append({"event_id": 102, "ts": "2026-01-15 10:25:00",
                      "user_id": 2, "event_type": "purchase", "value": 20.0})
    # user 3: purchase with no prior click -> inner join drops it
    purchases.append({"event_id": 103, "ts": "2026-01-15 10:30:00",
                      "user_id": 3, "event_type": "purchase", "value": 1.0})
    return clicks, purchases


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    clicks, purchases = _mk_attribution_feed()
    cdir, pdir = tmp_path / "clicks", tmp_path / "purchases"
    cdir.mkdir(), pdir.mkdir()
    # two micro-batch files per side, so matches span file boundaries
    _write_jsonl(cdir / "c1.json", clicks[:1])
    _write_jsonl(cdir / "c2.json", clicks[1:])
    _write_jsonl(pdir / "p1.json", purchases[:2])
    _write_jsonl(pdir / "p2.json", purchases[2:])

    cs = spark.readStream.schema(EVENT_SCHEMA).json(str(cdir))
    ps = spark.readStream.schema(EVENT_SCHEMA).json(str(pdir))
    q = (
        click_purchase_attribution(cs, ps)
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }

    cb = spark.read.schema(EVENT_SCHEMA).json(str(cdir))
    pb = spark.read.schema(EVENT_SCHEMA).json(str(pdir))
    batch = {
        (r["purchase_id"], r["click_id"])
        for r in click_purchase_attribution(cb, pb).collect()
    }

    assert streamed == batch
    assert (100, 1) in streamed          # inside the 30-min window
    assert (101, 1) not in streamed      # 45 min later: outside
    assert (102, 2) in streamed and (102, 3) in streamed
    assert all(p != 103 for p, _ in streamed)  # no prior click


def test_stream_static_enrichment_parity(spark, tmp_path):
    """enrich_with_dim over two micro-batch runs row-equals the batch
    left join; rows whose key misses the dim keep NULL attributes."""
    from fund_data_etl_pipeline_spark.streaming.joins import enrich_with_dim

    rows = _mk_events()
    cut = len(rows) // 2
    # dim covers user 1 only — user 2 must surface with NULL segment
    dim = spark.createDataFrame(
        [(1, "premium", "EU")], "user_id long, segment string, region string"
    )
    src = tmp_path / "enrich_stream"
    src.mkdir()
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "enrich_ckpt")

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        q = (
            enrich_with_dim(stream, dim)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_jsonl(src / "b1.json", rows[:cut])
    run()
    _write_jsonl(src / "b2.json", rows[cut:])
    run()

    streamed = {
        r["event_id"]: (r["user_id"], r["segment"], r["region"])
        for r in spark.read.parquet(out).collect()
    }
    batch_src = tmp_path / "enrich_batch.json"
    _write_jsonl(batch_src, rows)
    batch = {
        r["event_id"]: (r["user_id"], r["segment"], r["region"])
        for r in enrich_with_dim(
            spark.read.schema(EVENT_SCHEMA).json(str(batch_src)), dim
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) == len(rows)
    segs = {v[0]: (v[1], v[2]) for v in streamed.values()}
    assert segs[1] == ("premium", "EU")
    assert segs[2] == (None, None)


def test_streaming_minhash_neardup_parity_with_batch(spark, tmp_path):
    """The r8 incremental near-dup twin: the SAME
    incremental_minhash_pairs builder on a two-micro-batch document
    stream must emit exactly the batch run's verified (d1, d2, jaccard)
    pair set — parity by construction, asserted bit-equal. Also pins the
    index-side bucket cap: a boilerplate index bucket fans out at most
    cap ids per band, and the cluster MINIMUM is always among them, so
    the dup flag survives capping."""
    from fund_data_etl_pipeline_spark.functions.text import (
        MINHASH_BUCKET_CAP,
    )
    from fund_data_etl_pipeline_spark.operators.dedup import (
        incremental_minhash_pairs,
    )
    from fund_data_etl_pipeline_spark.streaming.file_ingest import (
        streaming_minhash_neardup,
    )

    doc_schema = "doc_id long, text string"
    boiler = " ".join(f"idx{w}" for w in range(40))
    # index: a boilerplate family LARGER than the cap + distinct rows
    n_fam = MINHASH_BUCKET_CAP + 20
    index_rows = [(i, f"{boiler} u{i}") for i in range(n_fam)]
    index_rows += [
        (500 + i, " ".join(f"solo{i}w{w}" for w in range(30)))
        for i in range(5)
    ]
    index_docs = spark.createDataFrame(index_rows, doc_schema)

    # new batch: near-dups of the boilerplate family, one near-dup of a
    # solo index doc, and novel docs that must emit NO pair
    new_rows = [(1000 + i, f"{boiler} v{i}") for i in range(6)]
    new_rows.append((1100, " ".join(f"solo2w{w}" for w in range(30))))
    new_rows += [
        (1200 + i, " ".join(f"novel{i}w{w}" for w in range(30)))
        for i in range(4)
    ]

    batch = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in incremental_minhash_pairs(
            spark.createDataFrame(new_rows, doc_schema), index_docs
        ).collect()
    }
    # semantic checks on the batch result before the parity compare
    dup_new = {d2 for _, d2, _ in batch}
    assert {1000 + i for i in range(6)} <= dup_new  # family dups caught
    assert 1100 in dup_new  # solo near-dup caught ("solo2w..." ~ "solo2w...")
    assert not dup_new & {1200 + i for i in range(4)}  # novels clean
    # index cap: every attribution for the family is to a kept id, and
    # the family minimum (id 0) is among the attributed d1s
    fam_d1 = {d1 for d1, d2, _ in batch if d2 < 1100}
    assert 0 in fam_d1

    src = tmp_path / "neardup_stream"
    src.mkdir()
    out = str(tmp_path / "neardup_out")
    ckpt = str(tmp_path / "neardup_ckpt")

    def run():
        stream = spark.readStream.schema(doc_schema).json(str(src))
        q = (
            streaming_minhash_neardup(stream, index_docs)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    cut = len(new_rows) // 2
    _write_jsonl(
        src / "b1.json",
        [{"doc_id": i, "text": t} for i, t in new_rows[:cut]],
    )
    run()
    _write_jsonl(
        src / "b2.json",
        [{"doc_id": i, "text": t} for i, t in new_rows[cut:]],
    )
    run()

    streamed = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch

    # r9: the PREBUILT-index streaming form (build_minhash_index written
    # to parquet, passed via index_tables= — the production shape
    # tools/stream_probe.py times) must emit the same set again
    from fund_data_etl_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )

    prepped, bands = build_minhash_index(index_docs)
    pp, bp = str(tmp_path / "idx_prepped"), str(tmp_path / "idx_bands")
    prepped.write.parquet(pp)
    bands.write.parquet(bp)
    out2 = str(tmp_path / "neardup_out2")
    ckpt2 = str(tmp_path / "neardup_ckpt2")
    stream = spark.readStream.schema(doc_schema).json(str(src))
    q = (
        streaming_minhash_neardup(
            stream,
            index_tables=(spark.read.parquet(pp), spark.read.parquet(bp)),
        )
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed2 = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in spark.read.parquet(out2).collect()
    }
    assert streamed2 == batch


def test_streaming_dim_maintenance_parity_with_batch(spark, tmp_path):
    """r10: folding a dimension change feed per micro-batch through
    streaming_dim_maintenance (foreachBatch over THE SAME merge_dim
    builder) ends at exactly the batch merge_dim(base, all changes) —
    including a cross-batch edit chain, a delete, an insert, and a
    same-key conflict resolved by seq across the batch boundary. Also
    pins the version/pointer commit protocol: one immutable vN dir per
    micro-batch, _CURRENT pointing at the last."""
    import os

    from fund_data_etl_pipeline_spark.operators.normalize import merge_dim
    from fund_data_etl_pipeline_spark.streaming.file_ingest import (
        streaming_dim_maintenance,
    )

    base = spark.createDataFrame(
        [
            ("fund-a", "1001", "default"),
            ("fund-b", "1002", "default"),
            ("fund-a", "C100", "conversion"),
        ],
        "product_name string, ledger_code string, map_kind string",
    )
    # seq monotone in arrival order (the documented delivery contract);
    # fund-a edited in batch 1 then re-edited in batch 2 (the cross-batch
    # last-write-wins case), fund-b deleted, fund-c inserted
    feed = [
        {"product_name": "fund-a", "ledger_code": "2001",
         "map_kind": "default", "op": "upsert", "seq": 1},
        {"product_name": "fund-b", "ledger_code": None,
         "map_kind": "default", "op": "delete", "seq": 2},
        {"product_name": "fund-c", "ledger_code": "1003",
         "map_kind": "default", "op": "upsert", "seq": 3},
        {"product_name": "fund-a", "ledger_code": "3001",
         "map_kind": "default", "op": "upsert", "seq": 4},
        {"product_name": "fund-c", "ledger_code": None,
         "map_kind": "default", "op": "delete", "seq": 5},
    ]
    cut = 2
    src = tmp_path / "changes"
    src.mkdir()
    out = str(tmp_path / "dim")
    os.makedirs(out)
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "product_name string, ledger_code string, map_kind string,"
        " op string, seq long"
    )

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = streaming_dim_maintenance(stream, base, out, ckpt)
        q.awaitTermination(120)

    _write_jsonl(src / "b1.json", feed[:cut])
    run()
    _write_jsonl(src / "b2.json", feed[cut:])
    run()

    with open(os.path.join(out, "_CURRENT")) as fh:
        cur = fh.read().strip()
    streamed = {
        (r["product_name"], r["map_kind"]): r["ledger_code"]
        for r in spark.read.parquet(cur).collect()
    }
    changes = spark.createDataFrame(
        [tuple(r.values()) for r in feed], schema
    )
    expected = {
        (r["product_name"], r["map_kind"]): r["ledger_code"]
        for r in merge_dim(base, changes).collect()
    }
    assert streamed == expected
    assert expected == {
        ("fund-a", "default"): "3001",
        ("fund-a", "conversion"): "C100",
    }
    # at least two immutable versions committed, pointer at the newest;
    # r11: versions are namespaced q{queryId8}_v{batchId} — same
    # checkpoint across both runs, so one namespace, ordered suffixes
    import re

    versions = sorted(
        (d for d in os.listdir(out) if re.search(r"_v\d+$", d)),
        key=lambda d: int(d.rsplit("_v", 1)[1]),  # _v10 after _v9, not _v1x
    )
    assert len(versions) >= 2
    assert len({v.split("_v")[0] for v in versions}) == 1
    assert cur.endswith(versions[-1])


def test_streaming_dim_maintenance_committed_replay_guard(spark, tmp_path):
    """r10/r11 replay safety: losing the CHECKPOINT (fresh
    checkpointLocation over the same source) replays batch 0 after the
    old run's version and pointer already committed. r11 keys version
    dirs by the streaming-query id (fresh per checkpoint), so the
    recovery fold lands in a NEW namespace: the old run's committed
    version stays byte-identical (immutable), the pointer moves to the
    new dir, and the re-fold converges to the once-applied merge
    because merge_dim re-application is idempotent under monotone seq
    (ADVICE r10 — the bare v{batchId} naming rewrote committed v0)."""
    import os

    from fund_data_etl_pipeline_spark.operators.normalize import merge_dim
    from fund_data_etl_pipeline_spark.streaming.file_ingest import (
        streaming_dim_maintenance,
    )

    base = spark.createDataFrame(
        [("fund-a", "1001", "default")],
        "product_name string, ledger_code string, map_kind string",
    )
    feed = [
        {"product_name": "fund-a", "ledger_code": "2001",
         "map_kind": "default", "op": "upsert", "seq": 1},
        {"product_name": "fund-b", "ledger_code": "1002",
         "map_kind": "default", "op": "upsert", "seq": 2},
    ]
    src = tmp_path / "changes"
    src.mkdir()
    out = str(tmp_path / "dim")
    os.makedirs(out)
    schema = (
        "product_name string, ledger_code string, map_kind string,"
        " op string, seq long"
    )
    _write_jsonl(src / "b1.json", feed)

    def run(ckpt):
        stream = spark.readStream.schema(schema).json(str(src))
        q = streaming_dim_maintenance(stream, base, out, str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt1")                      # batch 0 folds, pointer -> q1_v0
    with open(os.path.join(out, "_CURRENT")) as fh:
        first_dir = fh.read().strip()
    first_files = {
        f: os.path.getsize(os.path.join(first_dir, f))
        for f in os.listdir(first_dir)
        if f.endswith(".parquet")
    }
    run("ckpt2")                      # lost checkpoint: batch 0 REPLAYS

    with open(os.path.join(out, "_CURRENT")) as fh:
        cur = fh.read().strip()
    assert cur.endswith("_v0")
    # fresh query id => fresh namespace: the old committed version was
    # NOT rewritten (same parquet part files, same sizes) and the
    # pointer moved forward to the recovery fold's own directory
    assert cur != first_dir
    assert {
        f: os.path.getsize(os.path.join(first_dir, f))
        for f in os.listdir(first_dir)
        if f.endswith(".parquet")
    } == first_files
    changes = spark.createDataFrame([tuple(r.values()) for r in feed], schema)
    expected = {
        (r["product_name"], r["map_kind"]): r["ledger_code"]
        for r in merge_dim(base, changes).collect()
    }
    for vdir in (cur, first_dir):
        got = {
            (r["product_name"], r["map_kind"]): r["ledger_code"]
            for r in spark.read.parquet(vdir).collect()
        }
        assert got == expected
    assert expected == {
        ("fund-a", "default"): "2001",
        ("fund-b", "default"): "1002",
    }


def test_streaming_dim_maintenance_crash_before_pointer_swap(spark, tmp_path):
    """r11 (VERDICT r10 #5): the OTHER crash window — a batch's version
    parquet is fully written but the process dies BEFORE the _CURRENT
    pointer swap. On restart, Structured Streaming replays the batch
    (offsets logged, commit log entry missing); the fold must redo the
    merge against the still-pointing-backwards current version,
    overwrite its own deterministic version path, and land _CURRENT on
    a state bit-equal to the uninterrupted run. Simulated by removing
    the checkpoint's commits/1 entry and rolling _CURRENT back to v0
    after a clean two-batch run."""
    import os

    from fund_data_etl_pipeline_spark.operators.normalize import merge_dim
    from fund_data_etl_pipeline_spark.streaming.file_ingest import (
        streaming_dim_maintenance,
    )

    base = spark.createDataFrame(
        [("fund-a", "1001", "default")],
        "product_name string, ledger_code string, map_kind string",
    )
    feed = [
        {"product_name": "fund-a", "ledger_code": "2001",
         "map_kind": "default", "op": "upsert", "seq": 1},
        {"product_name": "fund-b", "ledger_code": "1002",
         "map_kind": "default", "op": "upsert", "seq": 2},
        {"product_name": "fund-a", "ledger_code": "3001",
         "map_kind": "default", "op": "upsert", "seq": 3},
        {"product_name": "fund-b", "ledger_code": None,
         "map_kind": "default", "op": "delete", "seq": 4},
    ]
    src = tmp_path / "changes"
    src.mkdir()
    out = str(tmp_path / "dim")
    os.makedirs(out)
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "product_name string, ledger_code string, map_kind string,"
        " op string, seq long"
    )

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = streaming_dim_maintenance(stream, base, out, ckpt)
        q.awaitTermination(120)

    _write_jsonl(src / "b1.json", feed[:2])
    run()                                   # batch 0 -> pointer q_v0
    with open(os.path.join(out, "_CURRENT")) as fh:
        v0_dir = fh.read().strip()
    _write_jsonl(src / "b2.json", feed[2:])
    run()                                   # batch 1 -> pointer q_v1
    with open(os.path.join(out, "_CURRENT")) as fh:
        v1_dir = fh.read().strip()
    assert v1_dir.endswith("_v1")
    clean = {
        (r["product_name"], r["map_kind"]): r["ledger_code"]
        for r in spark.read.parquet(v1_dir).collect()
    }

    # simulate the crash window: batch 1's parquet exists, but the
    # pointer swap never happened and the streaming commit log has no
    # record of batch 1 — exactly the state after a mid-commit death
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):  # local-FS checksum shadow of the log entry
        os.remove(crc)
    with open(os.path.join(out, "_CURRENT"), "w") as fh:
        fh.write(v0_dir)

    run()                                   # restart: batch 1 REPLAYS
    with open(os.path.join(out, "_CURRENT")) as fh:
        cur = fh.read().strip()
    assert cur == v1_dir
    got = {
        (r["product_name"], r["map_kind"]): r["ledger_code"]
        for r in spark.read.parquet(cur).collect()
    }
    changes = spark.createDataFrame([tuple(r.values()) for r in feed], schema)
    expected = {
        (r["product_name"], r["map_kind"]): r["ledger_code"]
        for r in merge_dim(base, changes).collect()
    }
    assert got == clean == expected == {("fund-a", "default"): "3001"}


def test_streaming_anomaly_chunked_delivery_parity(spark, tmp_path):
    """A key whose micro-batch spans MULTIPLE Arrow chunks must still be
    applied in (ts, event_id) order: the state iterator's chunks carry
    no cross-chunk order guarantee, so the updater must concatenate
    before sorting — sorting each chunk alone folds future values into
    the trailing window (r11 review). maxRecordsPerBatch=7 forces ~6
    chunks over one 40-event key delivered in REVERSE ts order."""
    from fund_data_etl_pipeline_spark.plans.scoring import (
        events_anomaly_zscore,
    )

    rows = [r for r in _mk_events() if r["user_id"] == 1]
    src = tmp_path / "stream"
    src.mkdir()
    _write_jsonl(src / "all.json", list(reversed(rows)))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        q = (
            streaming_anomaly_zscore(stream)
            .writeStream.format("memory")
            .queryName("zs_chunked")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    streamed = {
        r["event_id"]: (r["value"], r["zscore"], r["n_window"])
        for r in spark.sql("SELECT * FROM zs_chunked").collect()
    }
    batch_dir = str(tmp_path / "batch")
    (
        spark.createDataFrame(
            [tuple(r.values()) for r in rows],
            "event_id long, ts string, user_id long,"
            " event_type string, value double",
        )
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("props", F.lit("{}"))
        .write.mode("overwrite")
        .parquet(os.path.join(batch_dir, "events.parquet"))
    )
    expected = {
        r["event_id"]: (r["value"], r["zscore"], r["n_window"])
        for r in events_anomaly_zscore(spark, batch_dir).collect()
    }
    assert expected, "the planted spike must flag in batch"
    assert streamed == expected
