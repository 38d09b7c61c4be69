"""MergeStore as a Spark Data Source (batch + streaming CDF).

Reference semantics: Delta's DataFrame reader / Change Data Feed
(public docs) — the store consumed through the standard
``spark.read.format(...)`` / ``spark.readStream.format(...)``
surface via Spark 4's Python Data Source API.
"""

from __future__ import annotations

import pytest

from etl_pipeline_4handling_listings_spark.sources.datasource import register
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore


def _mk(spark, tmp_path, rows, partition_by=None, name="store"):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    cols = ["k", "v"] + (["p"] if partition_by else [])
    df = spark.createDataFrame(rows, cols)
    store.create_if_absent(df)
    store.merge(df)
    return store


def test_batch_read_matches_store_read(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    store.delete("k = 2")  # deletion vector must be applied
    register(spark)
    out = spark.read.format("mergestore").load(store.path)
    assert {(r["k"], r["v"]) for r in out.collect()} == {
        (1, "a"),
        (3, "c"),
    }
    assert [f.name for f in out.schema.fields] == ["k", "v"]


def test_batch_time_travel_option(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a")])  # v1
    store.merge(spark.createDataFrame([(2, "b")], ["k", "v"]))  # v2
    register(spark)
    old = (
        spark.read.format("mergestore")
        .option("version", 1)
        .load(store.path)
    )
    assert [(r["k"], r["v"]) for r in old.collect()] == [(1, "a")]


def test_batch_partitioned_injects_partition_column(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1), (3, "c", 0)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    register(spark)
    out = spark.read.format("mergestore").load(store.path)
    assert dict(out.dtypes)["p"] == "bigint"
    assert {(r["k"], r["p"]) for r in out.collect()} == {
        (1, 0),
        (2, 1),
        (3, 0),
    }


def test_batch_schema_evolution_nulls_old_files(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    # evolve: add a column via a merge touching only partition 1 —
    # partition 0's files predate the column and must read as NULL
    store.merge(
        spark.createDataFrame([(2, "B", 1, "x")], ["k", "v", "p", "extra"]),
        schema_evolution=True,
    )
    register(spark)
    out = spark.read.format("mergestore").load(store.path)
    got = {r["k"]: (r["v"], r["extra"]) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("B", "x")}


def test_cdc_stream_emits_commit_changes(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1: inserts
    store.merge(
        spark.createDataFrame([(1, "A"), (3, "c")], ["k", "v"])
    )  # v2: update + insert
    store.delete("k = 2")  # v3: merge-on-read delete
    register(spark)
    q = (
        spark.readStream.format("mergestore_cdc")
        .option("keys", "k")
        .option("startingVersion", 0)
        .load(store.path)
        .writeStream.format("memory")
        .queryName("cdc_feed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.sql("select * from cdc_feed").collect()
    }
    assert rows == {
        (1, "insert", "v00001"),
        (2, "insert", "v00001"),
        (1, "update_postimage", "v00002"),
        (3, "insert", "v00002"),
        (2, "delete", "v00003"),
    }


def test_batch_read_change_feed(spark, tmp_path):
    """Delta readChangeFeed analogue: the batch source in CDC mode
    returns every change in (startingVersion, endingVersion]."""
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1
    store.merge(spark.createDataFrame([(1, "A")], ["k", "v"]))  # v2
    store.delete("k = 2")  # v3
    register(spark)
    out = (
        spark.read.format("mergestore")
        .option("readChangeFeed", "true")
        .option("keys", "k")
        .option("startingVersion", 1)
        .load(store.path)
    )
    rows = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in out.collect()
    }
    assert rows == {
        (1, "update_postimage", "v00002"),
        (2, "delete", "v00003"),
    }
    # bounded range: only the v1->v2 step
    only_v2 = (
        spark.read.format("mergestore")
        .option("readChangeFeed", "true")
        .option("keys", "k")
        .option("startingVersion", 1)
        .option("endingVersion", 2)
        .load(store.path)
    )
    assert {
        (r["k"], r["_change_type"]) for r in only_v2.collect()
    } == {(1, "update_postimage")}


def test_cdc_stream_rate_limit_bounds_batches(spark, tmp_path):
    """maxCommitsPerTrigger on the native CDC stream: a 3-commit
    backlog drains one commit of changes per availableNow pass, and
    the cap can never wedge the stream below checkpointed progress
    (commit() is position-monotonic)."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        MergeStoreCDCStreamReader,
    )

    store = _mk(spark, tmp_path, [(1, "a")])  # v1
    store.merge(spark.createDataFrame([(2, "b")], ["k", "v"]))  # v2
    store.merge(spark.createDataFrame([(3, "c")], ["k", "v"]))  # v3
    opts = {
        "path": store.path,
        "keys": "k",
        "startingversion": "0",
        "maxcommitspertrigger": "1",
    }
    r = MergeStoreCDCStreamReader(None, opts)
    assert r.latestOffset() == {"version": 1}
    r.commit({"version": 1})
    assert r.latestOffset() == {"version": 2}
    # stale end below adopted progress cannot regress the position
    r.partitions({"version": 2}, {"version": 2})
    r.commit({"version": 1})
    assert r.latestOffset() == {"version": 3}
    # e2e: each availableNow pass drains one commit
    register(spark)
    q = (
        spark.readStream.format("mergestore_cdc")
        .option("keys", "k")
        .option("startingVersion", 0)
        .option("maxCommitsPerTrigger", 1)
        .load(store.path)
        .writeStream.format("memory")
        .queryName("cdc_rl")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r_["k"], r_["_change_type"], r_["_commit_version"])
        for r_ in spark.sql("select * from cdc_rl").collect()
    }
    assert got == {(1, "insert", "v00001")}


def test_cdc_arrow_diff_matches_dict_diff_and_nested_falls_back(
    spark, tmp_path
):
    """The Arrow full-outer-join diff and the dict diff must agree
    row-for-row on scalar schemas (incl. null and NaN transitions),
    and a NESTED column schema routes to the dict fallback."""
    from pyspark.sql.types import ArrayType
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _arrow_diffable,
        _cdc_schema,
        _diff_rows,
        _diff_rows_arrow,
        _plan_diff_partitions,
    )

    rows = [
        (1, "a", 1.0),
        (2, None, float("nan")),
        (3, "c", 3.0),
        (4, "d", None),
    ]
    store2 = MergeStore(spark, str(tmp_path / "s2"), keys=["k"])
    df = spark.createDataFrame(rows, ["k", "v", "x"])
    store2.create_if_absent(df)
    store2.merge(df)  # v1
    store2.merge(
        spark.createDataFrame(
            [
                (1, "a", 1.0),            # unchanged
                (2, None, float("nan")),  # unchanged (NaN == NaN)
                (3, None, 3.0),           # update: value -> null
                (5, "e", 5.0),            # insert
            ],
            ["k", "v", "x"],
        )
    )  # v2
    store2.delete("k = 4")  # v3
    schema = _cdc_schema(store2.path)
    assert _arrow_diffable(schema)
    for part in _plan_diff_partitions(store2.path, 1, 3, ["k"]):
        via_dict = set(_diff_rows(part, schema))
        via_arrow = set()
        for batch in _diff_rows_arrow(part, schema):
            for r_ in batch.to_pylist():
                via_arrow.add(tuple(r_.values()))

        def norm(ts):
            # NaN != NaN breaks set comparison — canonicalize
            return {
                tuple(
                    "NaN" if isinstance(c, float) and c != c else c
                    for c in t
                )
                for t in ts
            }

        assert norm(via_arrow) == norm(via_dict)
    # nested column -> fallback (correct, Python-speed)
    nested = _cdc_schema(store2.path)
    nested.fields[1].dataType = ArrayType(nested.fields[1].dataType)
    assert not _arrow_diffable(nested)


def test_cdc_bucketed_diff_equals_single_task_feed(spark, tmp_path):
    """An UNPARTITIONED store's snapshot diff must not hold two full
    table versions in one Python task: with a small
    maxBytesPerDiffPartition the planner key-hash-buckets each diff
    step (n_buckets > 1) and the bucketed feed equals the
    single-task feed exactly."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _plan_diff_partitions,
    )

    rows = [(i, f"v{i}") for i in range(40)]
    store = _mk(spark, tmp_path, rows)  # v1: inserts
    store.merge(
        spark.createDataFrame(
            [(i, f"V{i}") for i in range(0, 40, 7)], ["k", "v"]
        )
    )  # v2: updates
    store.delete("k >= 35")  # v3: deletes
    # planner: forced-small target splits every step into buckets
    # that tile the full bucket space
    parts = _plan_diff_partitions(store.path, 1, 3, ["k"], target_bytes=1)
    by_step: dict = {}
    for p in parts:
        by_step.setdefault((p.v_old, p.v_new), []).append(p)
    for step, ps in by_step.items():
        n = ps[0].n_buckets
        assert n > 1, step
        assert sorted(q.bucket for q in ps) == list(range(n))
        assert all(q.n_buckets == n for q in ps)
    register(spark)

    def feed(**extra):
        reader = (
            spark.read.format("mergestore")
            .option("readChangeFeed", "true")
            .option("keys", "k")
            .option("startingVersion", 1)
        )
        for k, v in extra.items():
            reader = reader.option(k, v)
        return {
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in reader.load(store.path).collect()
        }

    single = feed()
    bucketed = feed(maxBytesPerDiffPartition="1")
    assert bucketed == single
    assert {
        (k, c) for k, _v, c, _cv in single if c != "insert"
    } == {(i, "update_postimage") for i in range(0, 40, 7)} | {
        (i, "delete") for i in range(35, 40)
    }


def test_cdc_diff_bucket_filter_is_vectorized():
    """The Arrow diff plane (side read + join/classify + bucket
    mask) must stay vectorized — no to_pylist / per-row hashing in
    it. (The dict fallback and the DV map are per-row by design.)"""
    import inspect

    from etl_pipeline_4handling_listings_spark.sources import (
        datasource as m,
    )

    for fn in (m._read_side_table, m._diff_rows_arrow, m._bucket_ids):
        assert "to_pylist" not in inspect.getsource(fn), fn.__name__
    assert "_bucket_ids" in inspect.getsource(m._read_side_table)
    assert "_bucket_ids" in inspect.getsource(m._diff_side)


def test_cdc_null_merge_keys_degrade_to_dict_diff(spark, tmp_path):
    """A null merge-key row present UNCHANGED on both sides must
    emit nothing (Acero's hash join never matches null keys, so the
    Arrow plane would emit a phantom delete+insert — it must detect
    nulls and degrade to the dict diff), and the degrade must stay
    correct under bucketing because both paths share _bucket_ids."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _arrow_diffable,
        _cdc_schema,
        _diff_rows_arrow,
        _plan_diff_partitions,
    )

    rows = [(i, "k" if i else None, f"v{i}") for i in range(20)]
    store = _mk2(spark, tmp_path, rows)
    store.merge(
        spark.createDataFrame(
            [(0, None, "v0"), (1, "k", "CHANGED")], ["k", "s", "v"]
        )
    )  # v2: null-keyed row 0 unchanged, row 1 updated
    schema = _cdc_schema(store.path)
    assert _arrow_diffable(schema)
    got = set()
    for part in _plan_diff_partitions(store.path, 1, 2, ["k", "s"]):
        for item in _diff_rows_arrow(part, schema):
            if isinstance(item, tuple):  # degraded dict-diff rows
                got.add(item)
            else:
                got |= {
                    tuple(r_.values()) for r_ in item.to_pylist()
                }
    assert got == {(1, "k", "CHANGED", "update_postimage", "v00002")}
    # bucketed: same result, keys tiled by the shared bucket hash
    got_b = set()
    for part in _plan_diff_partitions(
        store.path, 1, 2, ["k", "s"], target_bytes=1
    ):
        assert part.n_buckets > 1
        for item in _diff_rows_arrow(part, schema):
            if isinstance(item, tuple):
                got_b.add(item)
            else:
                got_b |= {
                    tuple(r_.values()) for r_ in item.to_pylist()
                }
    assert got_b == got


def _mk2(spark, tmp_path, rows):
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )

    store = MergeStore(
        spark, str(tmp_path / "s_null"), keys=["k", "s"]
    )
    df = spark.createDataFrame(rows, ["k", "s", "v"])
    store.create_if_absent(df)
    store.merge(df)  # v1
    return store


def test_cdc_partitioned_diffs_only_touched(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    store.merge(
        spark.createDataFrame([(3, "c", 1)], ["k", "v", "p"])
    )  # touches partition 1 only
    register(spark)
    q = (
        spark.readStream.format("mergestore_cdc")
        .option("keys", "k")
        .option("startingVersion", 1)
        .load(store.path)
        .writeStream.format("memory")
        .queryName("cdc_part")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["k"], r["_change_type"])
        for r in spark.sql("select * from cdc_part").collect()
    }
    # the untouched partition contributed no diff work and no rows
    assert rows == {(3, "insert")}


def test_batch_read_after_add_and_drop_columns(spark, tmp_path):
    """ALTER TABLE metadata commits flow through the data source:
    an added column reads NULL (the Arrow plane aligns per-file
    schemas), a dropped column disappears (extra physical bytes are
    projected out, never resurrected), and time travel by version
    keeps each snapshot's own schema."""
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1
    store.add_columns({"score": "double"})  # v2
    store.drop_column("v")  # v3
    register(spark)
    out = spark.read.format("mergestore").load(store.path)
    assert [f.name for f in out.schema.fields] == ["k", "score"]
    assert {(r["k"], r["score"]) for r in out.collect()} == {
        (1, None),
        (2, None),
    }
    old = (
        spark.read.format("mergestore")
        .option("version", 1)
        .load(store.path)
    )
    assert [f.name for f in old.schema.fields] == ["k", "v"]
    assert {(r["k"], r["v"]) for r in old.collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_cdc_stream_skips_optimize_commit(spark, tmp_path):
    """OPTIMIZE composes with the change feed: bin-packing is a
    row-preserving rewrite (Delta CDF ``dataChange=false``), so a
    stream spanning append -> optimize -> append emits exactly the
    two appends' rows, nothing attributed to the optimize version —
    and the planner SKIPS the optimize step rather than paying a
    whole-snapshot diff to discover zero changes."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _plan_diff_partitions,
    )

    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1
    assert store.append(
        spark.createDataFrame([(3, "c")], ["k", "v"])
    ) == "v00002"
    assert store.optimize(min_files=2) == "v00003"  # bin-pack only
    assert store.append(
        spark.createDataFrame([(4, "d")], ["k", "v"])
    ) == "v00004"
    register(spark)
    q = (
        spark.readStream.format("mergestore_cdc")
        .option("keys", "k")
        .option("startingVersion", 0)
        .load(store.path)
        .writeStream.format("memory")
        .queryName("cdc_opt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.sql("select * from cdc_opt").collect()
    }
    assert rows == {
        (1, "insert", "v00001"),
        (2, "insert", "v00001"),
        (3, "insert", "v00002"),
        (4, "insert", "v00004"),
    }
    # planner-level: the optimize step is absent, not merely empty
    steps = {
        p.v_new for p in _plan_diff_partitions(store.path, 0, 4, ["k"])
    }
    assert steps == {"v00001", "v00002", "v00004"}
    # the compacted snapshot still reads complete (nothing lost)
    assert store.read().count() == 4


def test_cdc_apply_chains_stores_medallion(spark, tmp_path):
    """Bronze→silver chaining: a silver store follows a bronze store
    through the streaming change feed + foreach_batch_cdc_apply —
    upserts land as upserts, deletes as deletes, multi-commit batches
    collapse to the last change per key, and a restart resumes from
    the checkpoint without re-churning silver versions."""
    from etl_pipeline_4handling_listings_spark.streaming import (
        foreach_batch_cdc_apply,
    )

    bronze = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1
    bronze.merge(
        spark.createDataFrame([(1, "A"), (3, "c")], ["k", "v"])
    )  # v2
    bronze.delete("k = 2")  # v3
    silver = MergeStore(spark, str(tmp_path / "silver"), keys=["k"])
    register(spark)
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("mergestore_cdc")
            .option("keys", "k")
            .option("startingVersion", 0)
            .load(bronze.path)
            .writeStream.foreachBatch(
                foreach_batch_cdc_apply(silver, ["k"], "bronze-to-silver")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert {(r["k"], r["v"]) for r in silver.read().collect()} == {
        (1, "A"),
        (3, "c"),
    }
    # more upstream commits, then resume from the same checkpoint
    bronze.merge(spark.createDataFrame([(4, "d")], ["k", "v"]))  # v4
    bronze.delete("k = 1")  # v5
    run()
    assert {(r["k"], r["v"]) for r in silver.read().collect()} == {
        (3, "c"),
        (4, "d"),
    }
    # replay safety: nothing new upstream -> no silver version churn
    before = silver.current_version()
    run()
    assert silver.current_version() == before


def test_cdc_apply_collapse_is_numeric_past_version_99999(
    spark, tmp_path
):
    """The per-key collapse must order commits NUMERICALLY: %05d
    zero-padding stops sorting lexicographically at 100,000 commits
    ('v100000' < 'v99999' as strings), and a string max would apply
    the stale change. Drive the sink directly with a fabricated
    two-commit batch straddling the ceiling."""
    from etl_pipeline_4handling_listings_spark.streaming import (
        foreach_batch_cdc_apply,
    )

    silver = MergeStore(spark, str(tmp_path / "silver"), keys=["k"])
    sink = foreach_batch_cdc_apply(silver, ["k"], "ceiling-probe")
    batch = spark.createDataFrame(
        [
            (1, "stale", "update_postimage", "v99999"),
            (1, "fresh", "update_postimage", "v100000"),
            (2, "gone", "delete", "v100000"),
            (2, "older", "update_postimage", "v99999"),
        ],
        ["k", "v", "_change_type", "_commit_version"],
    )
    sink(batch, 0)
    assert {(r["k"], r["v"]) for r in silver.read().collect()} == {
        (1, "fresh")
    }


def test_datasource_write_append_path(spark, tmp_path):
    """df.write.format('mergestore').mode('append'): executors write
    Arrow->parquet scratch, the driver commit rides the store's OCC
    append protocol — rows land as a normal committed version that
    both the engine and the data source read back; txnAppId/
    txnVersion make the job replay-safe."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    register(spark)
    path = str(tmp_path / "dsw")
    store = MergeStore(spark, path, keys=["k"])
    seed = spark.createDataFrame([(1, "a", 1.5)], ["k", "v", "x"])
    store.create_if_absent(seed)
    store.merge(seed)

    batch = spark.createDataFrame([(2, "b", 2.5), (3, "c", None)], ["k", "v", "x"])
    (
        batch.write.format("mergestore")
        .mode("append")
        .option("path", path)
        .option("txnAppId", "job1")
        .option("txnVersion", 0)
        .save()
    )
    got = {r.k: (r.v, r.x) for r in store.read().collect()}
    assert got == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("c", None)}
    versions = store.list_versions()

    # replayed job (same txn): atomically skipped, no version burned
    (
        batch.write.format("mergestore")
        .mode("append")
        .option("path", path)
        .option("txnAppId", "job1")
        .option("txnVersion", 0)
        .save()
    )
    assert store.list_versions() == versions
    assert store.read().count() == 3

    # the data source reads its own writes
    back = (
        spark.read.format("mergestore").option("path", path).load()
    )
    assert back.count() == 3

    # guard rails fail at PLAN time: overwrite, schema drift
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        batch.write.format("mergestore").mode("overwrite").option(
            "path", path
        ).save()
    with _pytest.raises(Exception, match="columns"):
        spark.createDataFrame([(9,)], ["k"]).write.format(
            "mergestore"
        ).mode("append").option("path", path).save()


def test_datasource_streaming_sink_exactly_once(spark, tmp_path):
    """df.writeStream.format('mergestore'): each micro-batch is one
    OCC append commit carrying txn=(app, batch_id); rows land
    exactly once and survive a second availableNow pass over the
    same source (no re-ingest of already-committed batches after
    the checkpoint is consulted)."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    register(spark)
    src = str(tmp_path / "src")
    sinkp = str(tmp_path / "snk")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], ["k", "v"]
    ).coalesce(1).write.mode("append").parquet(src)

    store = MergeStore(spark, sinkp, keys=["k"])
    template = spark.read.parquet(src)
    store.create_if_absent(template)

    def run_once():
        stream = spark.readStream.schema(template.schema).parquet(src)
        q = (
            stream.writeStream.format("mergestore")
            .option("path", sinkp)
            .option("txnAppId", "sq1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {r.k: r.v for r in store.read().collect()} == {1: "a", 2: "b"}

    # new file arrives; a second pass ingests ONLY it
    spark.createDataFrame([(3, "c")], ["k", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert {r.k: r.v for r in store.read().collect()} == {
        1: "a",
        2: "b",
        3: "c",
    }
    # txn watermark reflects the applied stream batches
    assert store.last_txn_version("sq1") >= 1


def test_datasource_filter_pushdown_prunes_files(spark, tmp_path):
    """Spark 4.1 pushFilters: a partition-column predicate plans
    only the matching hive dirs' files, and a stats-indexed range
    predicate skips files whose [min,max] cannot match — both
    over-approximate (rows re-filtered by Spark), verified by
    comparing against the unpruned result."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        MergeStorePushdownBatchReader,
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
        build_store_stats,
    )

    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    path = str(tmp_path / "push")
    store = MergeStore(spark, path, keys=["k"], partition_by="p")
    rows = [(i, i % 4, i * 10) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "p", "v"])
    store.create_if_absent(df)
    store.merge(df.repartition(4))
    build_store_stats(store, ["k"])
    # the stats index lives in the version dir read_store_skip uses;
    # the data source reads the same snapshot
    base = (
        spark.read.format("mergestore")
        .option("path", path)
        .option("pushdown", "true")
        .load()
    )

    # partition pruning: planner-level file count shrinks
    rd_all = MergeStorePushdownBatchReader(
        base.schema, {"path": path}, store.current_version()
    )
    n_all = len(rd_all.partitions())
    rd_part = MergeStorePushdownBatchReader(
        base.schema, {"path": path}, store.current_version()
    )
    from pyspark.sql.datasource import EqualTo, GreaterThan

    residual = list(rd_part.pushFilters([EqualTo(("p",), 2)]))
    assert len(residual) == 1  # everything re-applied by Spark
    n_part = len(rd_part.partitions())
    assert 0 < n_part < n_all

    # stats pruning on k
    rd_stats = MergeStorePushdownBatchReader(
        base.schema, {"path": path}, store.current_version()
    )
    rd_stats.pushFilters([GreaterThan(("k",), 10_000)])
    assert len(rd_stats.partitions()) < n_all  # nothing can match

    # end-to-end correctness: pruned read == plain filter
    got = sorted(
        (r.k, r.v)
        for r in base.filter("p = 2 AND k >= 100").collect()
    )
    want = sorted((k, v) for k, p, v in rows if p == 2 and k >= 100)
    assert got == want


def test_datasource_write_partitioned_hive_layout(spark, tmp_path):
    """df.write on a PARTITIONED store: tasks split Arrow batches
    into pcol=value dirs (value in the dir name, dropped from the
    file — partitionBy's exact layout), the commit records the
    gaining partitions as touched, and both the engine and the data
    source read the result back."""
    import json as _json
    import os as _os

    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    register(spark)
    path = str(tmp_path / "dswp")
    store = MergeStore(spark, path, keys=["k"], partition_by="p")
    seed = spark.createDataFrame([(1, 0, "a"), (2, 1, "b")], ["k", "p", "v"])
    store.create_if_absent(seed)
    store.merge(seed)

    batch = spark.createDataFrame(
        [(3, 0, "c"), (4, 5, "d"), (5, 5, "e")], ["k", "p", "v"]
    )
    (
        batch.write.format("mergestore")
        .mode("append")
        .option("path", path)
        .save()
    )
    v = store.current_version()
    got = {r.k: (r.p, r.v) for r in store.read().collect()}
    assert got == {
        1: (0, "a"),
        2: (1, "b"),
        3: (0, "c"),
        4: (5, "d"),
        5: (5, "e"),
    }
    # hive layout on disk: new partition dir exists, files lack p
    vdir = store._version_dir(v)
    assert _os.path.isdir(_os.path.join(vdir, "p=5"))
    # touched metadata names the gaining partitions
    with open(_os.path.join(path, "_COMMITS", f"{v}.json")) as f:
        rec = _json.load(f)
    assert sorted(rec["touched"]) == ["0", "5"]
    # disjoint-merge fast-forward rules hold against this commit
    prev = f"v{int(v[1:]) - 1:05d}"
    assert store._ff_valid(prev, v, ["1"])
    assert not store._ff_valid(prev, v, ["5"])
    # the data source reads its own partitioned writes
    back = spark.read.format("mergestore").option("path", path).load()
    assert back.filter("p = 5").count() == 2
    # NULL partition values are rejected at task level, job fails
    import pytest as _pytest

    with _pytest.raises(Exception, match="NULL"):
        spark.createDataFrame(
            [(9, None, "x")], "k bigint, p bigint, v string"
        ).write.format("mergestore").mode("append").option(
            "path", path
        ).save()
    assert store.current_version() == v  # nothing committed


def test_datasource_write_fresh_partitioned_table_uses_declared_shape(
    spark, tmp_path
):
    """A FRESH partitioned store has no pcol=value dirs (the empty
    template writes none), so the writer must learn the partition
    column from the declared _TABLE.json — not the layout — or it
    would write root files into a partitioned table."""
    import os as _os

    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    register(spark)
    path = str(tmp_path / "fresh")
    store = MergeStore(spark, path, keys=["k"], partition_by="p")
    store.create_if_absent(
        spark.createDataFrame([(1, 0, "a")], ["k", "p", "v"]).limit(0)
    )
    assert store.table_meta()["partition_by"] == "p"
    spark.createDataFrame(
        [(1, 0, "a"), (2, 3, "b")], ["k", "p", "v"]
    ).write.format("mergestore").mode("append").option("path", path).save()
    vdir = store._version_dir(store.current_version())
    assert _os.path.isdir(_os.path.join(vdir, "p=0"))
    assert _os.path.isdir(_os.path.join(vdir, "p=3"))
    assert {r.k: r.p for r in store.read().collect()} == {1: 0, 2: 3}


def test_datasource_refuses_non_parquet_store(spark, tmp_path):
    """An ORC store must be served through the engine API: the data
    source's Arrow data plane is parquet-only, and misparsing ORC
    files byte-wise would be silent garbage, not an error."""
    import pytest as _pytest

    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    register(spark)
    path = str(tmp_path / "orcstore")
    store = MergeStore(spark, path, keys=["k"], fmt="orc")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    assert store.read().count() == 1  # engine path serves it fine
    with _pytest.raises(Exception, match="parquet-only"):
        spark.read.format("mergestore").option("path", path).load().count()
    with _pytest.raises(Exception, match="parquet-only"):
        df.write.format("mergestore").mode("append").option(
            "path", path
        ).save()


def test_datasource_streaming_sink_requires_query_identity(spark, tmp_path):
    """Without txnAppId or a sink-level checkpointLocation the sink
    has no per-query txn identity — two anonymous queries writing
    one table would share a watermark and silently drop each
    other's batches as 'replays'. The sink must refuse with a named
    error instead of falling back to a shared constant."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    register(spark)
    src = str(tmp_path / "src")
    sinkp = str(tmp_path / "snk")
    spark.createDataFrame([(1, "a")], ["k", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    template = spark.read.parquet(src)
    MergeStore(spark, sinkp, keys=["k"]).create_if_absent(template)

    stream = spark.readStream.schema(template.schema).parquet(src)
    q = None
    conf_key = "spark.sql.streaming.checkpointLocation"
    try:
        # checkpoint via session conf only — Spark accepts the query
        # but does NOT forward the conf into sink options, so the
        # sink must refuse rather than invent a shared identity
        spark.conf.set(conf_key, str(tmp_path / "ckpt_root"))
        with pytest.raises(Exception, match="query identity"):
            q = (
                stream.writeStream.format("mergestore")
                .option("path", sinkp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            if q.exception() is not None:
                raise q.exception()
    finally:
        spark.conf.unset(conf_key)
        if q is not None:
            q.stop()


def test_bucket_ids_are_value_pure_under_null_siblings():
    """A key's bucket must depend only on its VALUE, never on which
    batch it arrives in: an int64 batch containing a null used to
    convert to float64 in pandas and hash every other key of the
    batch differently from a null-free batch — the same key then
    landed in different buckets on the two diff sides (phantom
    delete+insert pairs). The string-canonicalized hash is
    batch-independent for every non-string type."""
    import pyarrow as pa

    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _bucket_ids,
    )

    cases = [
        (pa.int64(), [5, 7, 9], [5, None, 9]),
        (pa.bool_(), [True, False, True], [True, None, True]),
        (pa.float64(), [1.5, 2.5, 3.5], [1.5, None, 3.5]),
        (pa.date32(), [1, 2, 3], [1, None, 3]),
        (pa.string(), ["a", "b", "c"], ["a", None, "c"]),
    ]
    for t, clean_vals, nully_vals in cases:
        clean = _bucket_ids([pa.array(clean_vals, type=t)], ["k"], 8)
        nully = _bucket_ids([pa.array(nully_vals, type=t)], ["k"], 8)
        assert clean[0] == nully[0], (t, clean[0], nully[0])
        assert clean[2] == nully[2], (t, clean[2], nully[2])
