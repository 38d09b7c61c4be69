"""Structured Streaming tests: file-source micro-batches → memory /
foreachBatch sinks, compared against the batch kernels."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.store import MergeStore
from etl_pipeline_4handling_listings_spark.streaming import (
    foreach_batch_upsert,
    stream_hourly_rollup,
    stream_dedup_redelivery,
    stream_latest_record_dedup,
    stream_ohlc_bars,
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "k STRING, ts TIMESTAMP, v DOUBLE, event_type STRING, value DOUBLE"
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_hourly_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        ("a", _ts(1, 5), 1.0, "click", 2.0),
        ("b", _ts(1, 30), 1.0, "click", 3.0),
        ("c", _ts(2, 10), 1.0, "view", 5.0),
    ]
    _write_batch(spark, src, rows)
    df = spark.read.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].hour, r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM rollup").collect()
    }
    assert got == {(1, "click"): (2, 5.0), (2, "view"): (1, 5.0)}


def test_stream_ohlc_bars_matches_batch_semantics(spark, tmp_path):
    """Streaming OHLC: open/close resolve by the (ts, id) composite
    via min_by/max_by inside the windowed aggregate — the streaming
    twin of the events_ohlc_bars batch query."""
    src = str(tmp_path / "src")
    rows = [
        ("a", _ts(1, 5), 1.0, "click", 2.0),
        ("b", _ts(1, 30), 1.0, "click", 3.0),
        ("c", _ts(1, 5), 1.0, "view", 7.0),  # same ts as 'a': id breaks tie
        ("d", _ts(2, 10), 1.0, "view", 5.0),
    ]
    _write_batch(spark, src, rows)
    df = spark.read.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_ohlc_bars(stream, ts_col="ts", id_col="k", value_col="value")
        .writeStream.format("memory")
        .queryName("ohlc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window"]["start"].hour: (
            r["n"], r["open"], r["high"], r["low"], r["close"]
        )
        for r in spark.sql("SELECT * FROM ohlc").collect()
    }
    # hour 1: first by (ts, k) is ('a', 2.0) — 'c' shares the ts but
    # sorts after 'a' on the id; last is 'b' (3.0); high is 'c' (7.0)
    assert got == {1: (3, 2.0, 7.0, 2.0, 3.0), 2: (1, 5.0, 5.0, 5.0, 5.0)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        ("k1", _ts(1, 0), 1.0, "e", 0.0),
        ("k1", _ts(1, 10), 2.0, "e", 0.0),  # duplicate key in window
        ("k2", _ts(1, 20), 3.0, "e", 0.0),
    ]
    _write_batch(spark, src, rows)
    df = spark.read.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_latest_record_dedup(stream, ["k"], "ts")
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT k FROM dedup").collect()
    assert sorted(r["k"] for r in out) == ["k1", "k2"]


def test_foreach_batch_upsert_into_store(spark, tmp_path):
    src = str(tmp_path / "src")
    store_path = str(tmp_path / "store")
    store = MergeStore(spark, store_path, keys=["k"])

    _write_batch(
        spark,
        src,
        [
            ("k1", _ts(1, 0), 10.0, "e", 0.0),
            ("k1", _ts(2, 0), 20.0, "e", 0.0),  # newer wins in-batch
            ("k2", _ts(1, 0), 5.0, "e", 0.0),
        ],
    )
    df = spark.read.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sink = foreach_batch_upsert(store, ["k"], lambda: [F.desc("ts")])
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in store.read().collect()}
    assert got == {"k1": 20.0, "k2": 5.0}

    # second increment arrives: k1 newer again, k3 new
    _write_batch(
        spark, src, [("k1", _ts(3, 0), 30.0, "e", 0.0), ("k3", _ts(1, 0), 7.0, "e", 0.0)]
    )
    q = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in store.read().collect()}
    assert got == {"k1": 30.0, "k2": 5.0, "k3": 7.0}


def test_stateful_sessionize_closes_on_gap(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.streaming.stateful import (
        stateful_sessionize,
    )

    src = str(tmp_path / "ss_src")
    # user 7: two events 5 min apart (one session), then a third event
    # 3 hours later -> the first session must close and emit once the
    # watermark (driven by the later event) passes start+gap
    spark.createDataFrame(
        [
            (7, _ts(1, 0)),
            (7, _ts(1, 5)),
            (7, _ts(4, 0)),
            (9, _ts(1, 0)),
            (9, _ts(4, 30)),
        ],
        "user_id LONG, ts TIMESTAMP",
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP").parquet(src)
    q = (
        stateful_sessionize(stream, gap_minutes=30, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sessions_out"
    ).collect()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in rows
    }
    # in-batch gap splitting must emit the first sessions of both users
    assert (7, _ts(1, 0), _ts(1, 5), 2) in got
    assert (9, _ts(1, 0), _ts(1, 0), 1) in got


def test_stream_interval_join_attributes_within_lag(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.streaming import (
        stream_interval_join,
    )

    lsrc, rsrc = str(tmp_path / "purch"), str(tmp_path / "click")
    spark.createDataFrame(
        [(1, "u1", _ts(3, 0)), (2, "u1", _ts(9, 0)), (3, "u2", _ts(3, 0))],
        "pid LONG, user STRING, pts TIMESTAMP",
    ).coalesce(1).write.mode("append").parquet(lsrc)
    spark.createDataFrame(
        [
            (10, "u1", _ts(2, 30)),  # within 2h of purchase 1
            (11, "u1", _ts(4, 0)),   # AFTER purchase 1, before 2 but lag > 2h
            (12, "u3", _ts(3, 0)),   # wrong user
        ],
        "cid LONG, user STRING, cts TIMESTAMP",
    ).coalesce(1).write.mode("append").parquet(rsrc)

    lstream = spark.readStream.schema(
        spark.read.parquet(lsrc).schema
    ).parquet(lsrc)
    rstream = spark.readStream.schema(
        spark.read.parquet(rsrc).schema
    ).parquet(rsrc)
    q = (
        stream_interval_join(
            lstream, rstream, on="user", left_ts="pts", right_ts="cts",
            max_lag="2 hours",
        )
        .selectExpr("pid", "cid")
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["pid"], r["cid"]) for r in spark.sql("SELECT * FROM attrib").collect()
    )
    # purchase 1 matches only click 10; purchase 2 is >2h past both
    # clicks; purchase 3 has no same-user click
    assert got == [(1, 10)]


def test_stream_static_enrich_broadcasts_dim(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        stream_static_enrich,
    )

    src = str(tmp_path / "src")
    rows = [
        ("a", _ts(1, 5), 1.0, "click", 2.0),
        ("b", _ts(1, 30), 2.0, "view", 3.0),
        ("c", _ts(2, 10), 9.0, "click", 5.0),
    ]
    _write_batch(spark, src, rows)
    df = spark.read.parquet(src)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "passive")],
        "event_type STRING, category STRING",
    )
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_static_enrich(stream, dim, on="event_type")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["category"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == {("click", "engagement"), ("view", "passive")}
    n = spark.sql("SELECT COUNT(*) AS n FROM enriched").collect()[0]["n"]
    assert n == 3


def test_transform_with_state_first_seen(spark, tmp_path):
    """Streaming first-seen dedup end-to-end: first occurrence emits,
    duplicates are swallowed across separate runs via RocksDB state
    recovery. engine="auto" runs transformWithState where its
    protobuf dependency exists and the applyInPandasWithState twin
    otherwise — same contract either way, so this e2e never skips."""
    from etl_pipeline_4handling_listings_spark.streaming.stateful import (
        stateful_first_seen,
    )

    src = str(tmp_path / "fs_src")
    ckpt = str(tmp_path / "fs_ckpt")
    out_dir = str(tmp_path / "fs_out")
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def run_once():
        # file sink, not memory: the memory sink cannot recover from
        # a checkpoint, and cross-run state recovery is the point
        stream = spark.readStream.schema("fp STRING, ts TIMESTAMP").parquet(src)
        q = (
            stateful_first_seen(stream, "fp")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["fp"], r["n_dups_batch"])
            for r in spark.read.parquet(out_dir).collect()
        }

    try:
        spark.createDataFrame(
            [("a", _ts(1, 0)), ("a", _ts(1, 1)), ("b", _ts(1, 2))],
            "fp STRING, ts TIMESTAMP",
        ).coalesce(1).write.mode("append").parquet(src)
        out1 = run_once()
        assert out1 == {("a", 1), ("b", 0)}

        # second run: 'a' and 'b' are already in state -> only 'c' emits
        spark.createDataFrame(
            [("a", _ts(2, 0)), ("c", _ts(2, 1)), ("b", _ts(2, 2))],
            "fp STRING, ts TIMESTAMP",
        ).coalesce(1).write.mode("append").parquet(src)
        out2 = run_once() - out1
        assert out2 == {("c", 0)}
    finally:
        if old is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old)


def test_first_seen_processor_state_machine():
    """The transformWithState processor logic itself, driven with a
    fake ValueState — covers the paths the container's missing
    protobuf keeps the end-to-end test from reaching."""
    import pandas as pd

    from etl_pipeline_4handling_listings_spark.streaming.stateful import (
        FirstSeenProcessor,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttl):
            return self.state

    proc = FirstSeenProcessor()
    handle = FakeHandle()
    proc.init(handle)

    batch = pd.DataFrame({"fp": ["a", "a"], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    out = list(proc.handleInputRows(("a",), iter([batch]), None))
    assert len(out) == 1
    assert out[0]["fp"].iloc[0] == "a"
    assert out[0]["n_dups_batch"].iloc[0] == 1  # 2 rows, 1 duplicate
    assert handle.state.get() == (2,)

    # same key again: nothing emits, the dup counter accumulates
    out2 = list(proc.handleInputRows(("a",), iter([batch.head(1)]), None))
    assert out2 == []
    assert handle.state.get() == (3,)

    # first_ts is the MIN event time, not the first-arrival row,
    # even when rows arrive unordered across Arrow chunks
    proc2 = FirstSeenProcessor()
    h2 = FakeHandle()
    proc2.init(h2)
    late_first = pd.DataFrame(
        {"fp": ["b"], "ts": pd.to_datetime(["2024-01-05"])}
    )
    early_second = pd.DataFrame(
        {"fp": ["b", "b"],
         "ts": pd.to_datetime(["2024-01-01", "2024-01-03"])}
    )
    out3 = list(
        proc2.handleInputRows(("b",), iter([late_first, early_second]), None)
    )
    assert len(out3) == 1
    assert out3[0]["first_ts"].iloc[0] == pd.Timestamp("2024-01-01")
    assert out3[0]["n_dups_batch"].iloc[0] == 2

def test_foreach_batch_sketch_merge_matches_from_scratch(spark, tmp_path):
    """Incrementally-merged streaming CMS == sketch built from all
    rows at once (the merge law, end to end through foreachBatch),
    and replaying a batch does not double-count."""
    import os

    from etl_pipeline_4handling_listings_spark.operators.sketch_cms import (
        cms_build,
    )
    from etl_pipeline_4handling_listings_spark.streaming import (
        foreach_batch_sketch_merge,
    )

    src = str(tmp_path / "src")
    sketch_path = str(tmp_path / "sketch")
    batch1 = [("u%d" % (i % 5), _ts(1, i % 60), 1.0, "e", 0.0) for i in range(40)]
    batch2 = [("u%d" % (i % 7), _ts(2, i % 60), 1.0, "e", 0.0) for i in range(30)]

    _write_batch(spark, src, batch1)
    df = spark.read.parquet(src)
    sink = foreach_batch_sketch_merge(sketch_path, "k", depth=3, width=256)
    for _ in range(2):
        q = (
            spark.readStream.schema(df.schema)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )
        q.awaitTermination(120)
        if _ == 0:
            _write_batch(spark, src, batch2)

    versions = sorted(
        int(d[1:]) for d in os.listdir(sketch_path) if d[1:].isdigit()
    )
    final = spark.read.parquet(os.path.join(sketch_path, f"v{versions[-1]}"))
    whole = cms_build(spark.read.parquet(src), "k", depth=3, width=256)
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, whole.collect())
    )

    # replaying batch 0 against the existing state is a no-op
    sink(spark.read.parquet(src), 0)
    after = spark.read.parquet(os.path.join(sketch_path, f"v{versions[-1]}"))
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, whole.collect())
    )

def test_stream_session_rollup_native_session_window(spark, tmp_path):
    """Native session_window gap sessions: events within the gap
    merge into one session; a gap splits them."""
    from etl_pipeline_4handling_listings_spark.streaming import (
        stream_session_rollup,
    )

    src = str(tmp_path / "src")
    rows = [
        ("u1", _ts(1, 0), 1.0, "e", 10.0),
        ("u1", _ts(1, 20), 1.0, "e", 5.0),   # within 30m gap: same session
        ("u1", _ts(3, 0), 1.0, "e", 2.0),    # >30m later: new session
        ("u2", _ts(1, 5), 1.0, "e", 1.0),
    ]
    _write_batch(spark, src, rows)
    df = spark.read.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_session_rollup(stream, key="k", ts_col="ts", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["session_start"].hour, r["session_start"].minute): (
            r["n_events"],
            r["total_value"],
        )
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == {
        ("u1", 1, 0): (2, 15.0),
        ("u1", 3, 0): (1, 2.0),
        ("u2", 1, 5): (1, 1.0),
    }


def test_stream_dedup_redelivery_differing_event_times(spark, tmp_path):
    """dropDuplicatesWithinWatermark suppresses retried rows whose
    re-delivery carries a LATER event time — the case where putting
    the timestamp into dropDuplicates keys would let the duplicate
    through, and leaving it out would leak state forever."""
    src = str(tmp_path / "src")
    rows = [
        ("k1", _ts(1, 0), 1.0, "e", 0.0),
        ("k1", _ts(1, 7), 1.0, "e", 0.0),   # retry, later event time
        ("k2", _ts(1, 20), 3.0, "e", 0.0),
        ("k2", _ts(1, 21), 3.0, "e", 0.0),  # retry
        ("k3", _ts(1, 30), 4.0, "e", 0.0),
    ]
    _write_batch(spark, src, rows)
    df = spark.read.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_dedup_redelivery(stream, ["k"], "ts")
        .writeStream.format("memory")
        .queryName("dedup_redeliver")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT k FROM dedup_redeliver").collect()
    assert sorted(r["k"] for r in out) == ["k1", "k2", "k3"]


def test_foreach_batch_histogram_drift_matches_from_scratch(spark, tmp_path):
    """Incrementally-merged streaming value histogram == histogram
    of all rows at once (mergeable-state law through foreachBatch);
    PSI of the merged state vs a frozen reference equals the
    batch-computed PSI; replay does not double-count."""
    import os

    from etl_pipeline_4handling_listings_spark.operators.drift import (
        psi,
        value_histogram,
    )
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        foreach_batch_histogram,
    )

    src = str(tmp_path / "src")
    hist_path = str(tmp_path / "hist")
    batch1 = [("u1", _ts(1, i % 60), float(i % 300), "e", 0.0) for i in range(50)]
    batch2 = [("u2", _ts(2, i % 60), float(100 + i % 400), "e", 0.0) for i in range(40)]

    _write_batch(spark, src, batch1)
    df = spark.read.parquet(src)
    sink = foreach_batch_histogram(hist_path, "v", bin_cents=5000, n_bins=10)
    for i in range(2):
        q = (
            spark.readStream.schema(df.schema)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )
        q.awaitTermination(120)
        if i == 0:
            _write_batch(spark, src, batch2)

    versions = sorted(
        int(d[1:]) for d in os.listdir(hist_path) if d[1:].isdigit()
    )
    final = spark.read.parquet(os.path.join(hist_path, f"v{versions[-1]}"))
    whole = value_histogram(spark.read.parquet(src), "v")
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, whole.collect())
    )

    # PSI(frozen ref, streaming state) == PSI(frozen ref, from-scratch)
    ref = value_histogram(spark.read.parquet(src).limit(30), "v")
    a = sorted(map(tuple, psi(ref, final).collect()))
    b = sorted(map(tuple, psi(ref, whole).collect()))
    assert a == b
    # identical distributions -> PSI terms all ~0
    zero = psi(whole, whole).agg(F.sum("psi_term").alias("s")).collect()[0]
    assert abs(zero["s"]) < 1e-9

    # replaying batch 0 is a no-op
    sink(spark.read.parquet(src), 0)
    after = spark.read.parquet(os.path.join(hist_path, f"v{versions[-1]}"))
    assert sorted(map(tuple, after.collect())) == sorted(
        map(tuple, whole.collect())
    )

    # a torn attempt leaves only _tmp_v<id>, never the final dir —
    # the retry must redo the merge (not skip) and clean up
    nxt = versions[-1] + 1
    os.makedirs(os.path.join(hist_path, f"_tmp_v{nxt}"))
    sink(spark.read.parquet(src).limit(0), nxt)
    assert os.path.isdir(os.path.join(hist_path, f"v{nxt}"))
    assert not os.path.isdir(os.path.join(hist_path, f"_tmp_v{nxt}"))
    latest = spark.read.parquet(os.path.join(hist_path, f"v{nxt}"))
    assert sorted(map(tuple, latest.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_foreach_batch_upsert_skips_replayed_batch(spark, tmp_path):
    """The _LAST_BATCH transactional marker: a replayed batch_id must
    neither re-merge nor mint a new store version; a NEW batch id
    advances normally."""
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        foreach_batch_upsert,
    )

    store = MergeStore(spark, str(tmp_path / "sink"), keys=["k"])
    sink = foreach_batch_upsert(
        store, ["k"], lambda: [F.desc("o")]
    )
    b0 = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], ["k", "o", "v"])
    sink(b0, 0)
    assert {r["k"]: r["v"] for r in store.read().collect()} == {1: "b"}
    versions_after_b0 = store.list_versions()

    # replay of batch 0 (post-restart redelivery): no-op
    sink(b0, 0)
    assert store.list_versions() == versions_after_b0

    # next batch applies
    sink(spark.createDataFrame([(2, 1, "c")], ["k", "o", "v"]), 1)
    assert {r["k"]: r["v"] for r in store.read().collect()} == {1: "b", 2: "c"}
    assert len(store.list_versions()) == len(versions_after_b0) + 1


def test_foreach_batch_upsert_auto_optimize(spark, tmp_path):
    """auto_optimize_every=N compacts after every Nth applied batch
    (Delta autoCompact analogue): the optimize commit appears as its
    own store version, rows are untouched, and an off-cadence batch
    does not trigger it."""
    import os as _os

    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        foreach_batch_upsert,
    )

    store = MergeStore(spark, str(tmp_path / "ao"), keys=["k"])
    sink = foreach_batch_upsert(
        store, ["k"], lambda: [F.desc("o")], auto_optimize_every=2
    )
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce_key, "false")  # let small files accrete
    try:
        sink(
            spark.createDataFrame(
                [(i, 1, f"a{i}") for i in range(8)], ["k", "o", "v"]
            ).repartition(4),
            0,
        )
        n_after_b0 = len(store.list_versions())
        # batch 1 completes the cadence -> merge commit + optimize
        # commit = two new versions
        sink(
            spark.createDataFrame([(99, 1, "z")], ["k", "o", "v"]), 1
        )
    finally:
        spark.conf.set(coalesce_key, "true")
    assert len(store.list_versions()) == n_after_b0 + 2
    got = {r["k"]: r["v"] for r in store.read().collect()}
    assert got[99] == "z" and got[0] == "a0" and len(got) == 9
    # compacted: current snapshot holds a single data file
    vdir = store._version_dir(store.current_version())
    data_files = [
        f for f in _os.listdir(vdir) if not f.startswith(("_", "."))
    ]
    assert len(data_files) == 1


def test_foreach_batch_upsert_marker_is_per_app_id(spark, tmp_path):
    """The marker is keyed by txn_app_id (Delta's txnAppId scheme):
    a SECOND query writing the same store, or a restart with a
    reset checkpoint under a fresh app id, must not have its batch 0
    dropped as a 'replay' of the first query's batch ids — while
    each query's OWN replays are still suppressed."""
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        foreach_batch_upsert,
    )

    store = MergeStore(spark, str(tmp_path / "sink2"), keys=["k"])
    sink_a = foreach_batch_upsert(
        store, ["k"], lambda: [F.desc("o")], txn_app_id="query_a"
    )
    sink_b = foreach_batch_upsert(
        store, ["k"], lambda: [F.desc("o")], txn_app_id="query_b"
    )
    sink_a(
        spark.createDataFrame([(1, 1, "a")], ["k", "o", "v"]), 5
    )  # query A is at batch 5
    # query B (fresh checkpoint) starts at batch 0 — must APPLY,
    # not be dropped because 0 <= A's high-water mark
    sink_b(spark.createDataFrame([(2, 1, "b")], ["k", "o", "v"]), 0)
    assert {r["k"]: r["v"] for r in store.read().collect()} == {
        1: "a",
        2: "b",
    }
    n_versions = len(store.list_versions())
    # each query's own replay is still suppressed
    sink_a(spark.createDataFrame([(9, 1, "x")], ["k", "o", "v"]), 5)
    sink_b(spark.createDataFrame([(9, 1, "x")], ["k", "o", "v"]), 0)
    assert len(store.list_versions()) == n_versions
    # one marker FILE per app id (atomic self-contained replace —
    # B's write can never erase A's high-water mark, closing the
    # shared-map read-modify-write race)
    import os as _os

    markers = [
        f
        for f in _os.listdir(store.path)
        if f.startswith("_LAST_BATCH.")
    ]
    assert len(markers) == 2
    a_marker = next(m for m in markers if "query_a" in m)
    with open(_os.path.join(store.path, a_marker)) as f:
        assert f.read().strip() == "5"  # B's writes left A intact
    # a legacy shared plain-int marker is honored as a fallback for
    # the "default" app id (pre-migration store resumes seamlessly)
    with open(_os.path.join(store.path, "_LAST_BATCH"), "w") as f:
        f.write("7")
    sink_default = foreach_batch_upsert(store, ["k"], lambda: [F.desc("o")])
    sink_default(
        spark.createDataFrame([(9, 1, "x")], ["k", "o", "v"]), 7
    )  # replay under the legacy marker: suppressed
    assert len(store.list_versions()) == n_versions
    # and a NEW batch under the default app id still applies
    sink_default(
        spark.createDataFrame([(3, 1, "c")], ["k", "o", "v"]), 8
    )
    assert len(store.list_versions()) == n_versions + 1


def test_lateness_profile_sink_and_watermark_sizing(spark, tmp_path):
    """Streaming twin of events_lateness_profile: lateness measures
    against the PRE-BATCH high-watermark (Spark advances watermarks
    at micro-batch boundaries — this is exactly 'would a watermark
    of X have dropped this row'), counts accumulate exactly-once
    under replay, and suggest_watermark_us sizes the delay from the
    profile."""
    import os

    from etl_pipeline_4handling_listings_spark.streaming import (
        foreach_batch_lateness_profile,
        suggest_watermark_us,
    )

    path = str(tmp_path / "late")
    sink = foreach_batch_lateness_profile(path, "ts_us")
    # batch 0: everything in_order by definition (fresh stream)
    sink(
        spark.createDataFrame([(100,), (200,), (300,)], ["ts_us"]), 0
    )
    # batch 1 vs hw=300: 400 advances (in_order), 250 is 50us late
    sink(spark.createDataFrame([(400,), (250,)], ["ts_us"]), 1)
    prof = spark.read.parquet(os.path.join(path, "v1"))
    counts = {r["band"]: r["n_events"] for r in prof.collect()}
    assert counts["0_in_order"] == 4
    assert counts["1_lt_1s"] == 1
    assert prof.agg({"hw_us": "max"}).collect()[0][0] == 400
    assert prof.agg({"max_late_us": "max"}).collect()[0][0] == 50
    # replay of a committed batch is a no-op (exactly-once counts)
    sink(spark.createDataFrame([(400,), (250,)], ["ts_us"]), 1)
    again = spark.read.parquet(os.path.join(path, "v1"))
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, prof.collect())
    )
    # batch 2: one event 2 minutes behind hw=400 -> lt_10m band
    sink(spark.createDataFrame([(400 - 120_000_000,)], ["ts_us"]), 2)
    prof2 = spark.read.parquet(os.path.join(path, "v2"))
    counts2 = {r["band"]: r["n_events"] for r in prof2.collect()}
    assert counts2["3_lt_10m"] == 1
    assert counts2["0_in_order"] == 4
    # hw never regresses on late data
    assert prof2.agg({"hw_us": "max"}).collect()[0][0] == 400
    # sizing: 99% coverage needs the lt_10m bound; 80% only lt_1s
    assert suggest_watermark_us(prof2, coverage=0.99) == 600_000_000
    assert suggest_watermark_us(prof2, coverage=0.80) == 1_000_000
    # all-in-order profile sizes to a zero-delay watermark
    assert suggest_watermark_us(prof, coverage=0.80) == 0


def test_lateness_profile_restart_matches_batch_twin(spark, tmp_path):
    """Restart recovery x batch-twin equality: a live lateness
    profile built ONE ROW PER MICRO-BATCH (so the pre-batch
    high-watermark is exactly the per-arrival running max), with a
    mid-stream restart — fresh sink instance, checkpoint-style
    replay of the last committed batch — ends with band counts
    EQUAL to the batch twin's keyed_prefix_max math on the same
    arrival sequence (the kernel behind events_watermark_fit /
    events_lateness_profile). This is the strongest cross-check
    available without a driver streaming gate: the live path's
    carried state (high-watermark + counters) survives the restart
    bit-for-bit or the equality breaks."""
    import os

    from etl_pipeline_4handling_listings_spark.operators.prefix import (
        keyed_prefix_max,
    )
    from etl_pipeline_4handling_listings_spark.streaming import (
        foreach_batch_lateness_profile,
        suggest_watermark_us,
    )

    # deterministic arrival sequence with injected disorder: most
    # events advance 1s each; every 5th is 0.5s late, every 7th 90s
    events = []
    for i in range(24):
        base = (i + 1) * 1_000_000
        delay = (
            90_000_000
            if i % 7 == 3
            else (500_000 if i % 5 == 2 else 0)
        )
        events.append((i, base - delay))

    path = str(tmp_path / "late_restart")
    sink = foreach_batch_lateness_profile(path, "ts_us")
    for i, (_eid, t) in enumerate(events[:12]):
        sink(spark.createDataFrame([(t,)], "ts_us long"), i)
    # restart: NEW sink instance (all carried state must come from
    # the store), and the engine replays the last committed batch
    sink2 = foreach_batch_lateness_profile(path, "ts_us")
    sink2(
        spark.createDataFrame([(events[11][1],)], "ts_us long"), 11
    )  # replay -> must be a no-op (exactly-once counts)
    for i, (_eid, t) in enumerate(events[12:], start=12):
        sink2(spark.createDataFrame([(t,)], "ts_us long"), i)
    prof = spark.read.parquet(
        os.path.join(path, f"v{len(events) - 1}")
    )
    # the live profile materializes every band (zero counts
    # included); the batch groupBy only observed ones — compare the
    # nonzero support
    live = {
        r["band"]: r["n_events"]
        for r in prof.collect()
        if r["n_events"] > 0
    }

    # batch twin: per-arrival running max over the same sequence
    arr = keyed_prefix_max(
        spark.createDataFrame(events, "event_id long, ev_ts long"),
        "event_id",
        "ev_ts",
        out_col="hw",
    )
    late = arr.select(
        F.when(
            F.col("hw").isNull() | (F.col("ev_ts") >= F.col("hw")),
            0,
        )
        .otherwise(F.col("hw") - F.col("ev_ts"))
        .alias("late_us")
    )
    band = (
        F.when(F.col("late_us") == 0, "0_in_order")
        .when(F.col("late_us") < 1_000_000, "1_lt_1s")
        .when(F.col("late_us") < 60_000_000, "2_lt_1m")
        .when(F.col("late_us") < 600_000_000, "3_lt_10m")
        .when(F.col("late_us") < 3_600_000_000, "4_lt_1h")
        .otherwise("5_ge_1h")
    )
    batch = {
        r["band"]: r["n"]
        for r in late.groupBy(band.alias("band"))
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert live == batch
    # the high-watermark carried across the restart equals the
    # batch-side global max (hw never regresses on late data)
    assert (
        prof.agg(F.max("hw_us")).collect()[0][0]
        == max(t for _i, t in events)
    )
    # and the sizing decision agrees with the injected disorder:
    # covering the 90s stragglers needs the 10m bound, 80% doesn't
    assert suggest_watermark_us(prof, coverage=0.99) == 600_000_000
