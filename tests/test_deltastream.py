"""Streaming tail source over a foreign Delta log (``delta_tail``).

Reference behavior mirrored: a stock deployment streams from the
curated Delta store (mls_listings_curated.py:321-368) with Delta's
own streaming-source semantics — initial snapshot then append
tailing, append-only discipline with ignoreDeletes/ignoreChanges
escape hatches, OPTIMIZE (dataChange=false) commits skipped.
"""

import json
import os

import pytest
from pyspark.sql import SparkSession

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
)
from etl_pipeline_4handling_listings_spark.sources.deltastream import (
    register_delta_tail,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("deltastream-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _write_parquet_file(spark, tbl_dir, rows, cols, rel):
    staging = os.path.join(tbl_dir, "__stage")
    spark.createDataFrame(rows, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = next(
        n for n in os.listdir(staging) if n.endswith(".parquet")
    )
    dst = os.path.join(tbl_dir, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(os.path.join(staging, part), dst)
    return dst


def _schema_string(*fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _log_write(tbl, version, actions):
    log_dir = os.path.join(tbl, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    with open(
        os.path.join(log_dir, f"{version:020d}.json"), "w"
    ) as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")


def _meta(schema_string, pcols=(), cfg=None):
    return {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": list(pcols),
        "configuration": cfg or {},
        "createdTime": 0,
    }


def _add(rel, f, pv=None):
    return {
        "path": rel,
        "partitionValues": pv or {},
        "size": os.path.getsize(f),
        "modificationTime": 0,
        "dataChange": True,
    }


def _mk_table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl, exist_ok=True)
    f1 = _write_parquet_file(spark, tbl, [(1, "a")], ["k", "v"], "f1.parquet")
    f2 = _write_parquet_file(spark, tbl, [(2, "b")], ["k", "v"], "f2.parquet")
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": _meta(_schema_string(("k", "long"), ("v", "string")))},
            {"add": _add("f1.parquet", f1)},
            {"add": _add("f2.parquet", f2)},
        ],
    )
    return tbl


def _run_pass(spark, tbl, out, ckpt, **opts):
    """One availableNow pass into a parquet sink (supports restart
    recovery from the checkpoint, unlike the memory sink). Returns
    the CUMULATIVE sink contents."""
    reader = spark.readStream.format("delta_tail")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(tbl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ex = q.exception()
    if ex is not None:
        raise ex
    return {tuple(r) for r in spark.read.parquet(out).collect()}


def test_snapshot_then_appends(spark, tmp_path):
    """First pass: the full snapshot. After a new append commit, a
    restart from the SAME checkpoint emits ONLY the new rows
    (exactly-once; sink contents are cumulative)."""
    tbl = _mk_table(spark, tmp_path)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    got = _run_pass(spark, tbl, out, ckpt)
    assert got == {(1, "a"), (2, "b")}
    f3 = _write_parquet_file(
        spark, tbl, [(3, "c")], ["k", "v"], "f3.parquet"
    )
    _log_write(tbl, 1, [{"add": _add("f3.parquet", f3)}])
    got = _run_pass(spark, tbl, out, ckpt)
    # cumulative: snapshot rows NOT re-emitted, only the append
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_starting_version_skips_snapshot(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    f3 = _write_parquet_file(
        spark, tbl, [(3, "c")], ["k", "v"], "f3.parquet"
    )
    _log_write(tbl, 1, [{"add": _add("f3.parquet", f3)}])
    register_delta_tail(spark)
    got = _run_pass(
        spark,
        tbl,
        str(tmp_path / "out_sv"),
        str(tmp_path / "ck_sv"),
        startingVersion=1,
    )
    assert got == {(3, "c")}


def test_delete_commit_refused_then_skipped(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    _log_write(
        tbl,
        1,
        [{"remove": {"path": "f2.parquet", "deletionTimestamp": 1, "dataChange": True}}],
    )
    register_delta_tail(spark)
    with pytest.raises(Exception, match="ignoreDeletes"):
        _run_pass(
            spark,
            tbl,
            str(tmp_path / "out_d"),
            str(tmp_path / "ck_d"),
            startingVersion=1,
        )
    got = _run_pass(
        spark,
        tbl,
        str(tmp_path / "out_d2"),
        str(tmp_path / "ck_d2"),
        ignoreDeletes="true",
    )
    # fresh checkpoint: snapshot at CURRENT latest version already
    # excludes the removed file; the delete-only commit is skipped
    assert got == {(1, "a")}


def test_rewrite_commit_needs_ignore_changes(spark, tmp_path):
    tbl = _mk_table(spark, tmp_path)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_rw"), str(tmp_path / "out_rw")
    assert _run_pass(spark, tbl, out, ckpt) == {(1, "a"), (2, "b")}
    f2b = _write_parquet_file(
        spark, tbl, [(2, "B")], ["k", "v"], "f2b.parquet"
    )
    _log_write(
        tbl,
        1,
        [
            {"remove": {"path": "f2.parquet", "deletionTimestamp": 1, "dataChange": True}},
            {"add": _add("f2b.parquet", f2b)},
        ],
    )
    with pytest.raises(Exception, match="ignoreChanges"):
        _run_pass(spark, tbl, out, ckpt)
    got = _run_pass(spark, tbl, out, ckpt, ignoreChanges="true")
    # the rewritten file re-emitted on top of the earlier snapshot
    assert got == {(1, "a"), (2, "b"), (2, "B")}


def test_optimize_commit_skipped(spark, tmp_path):
    """dataChange=false rewrites (OPTIMIZE) carry no new rows and
    are skipped without any option."""
    tbl = _mk_table(spark, tmp_path)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_opt"), str(tmp_path / "out_opt")
    _run_pass(spark, tbl, out, ckpt)
    fc = _write_parquet_file(
        spark, tbl, [(1, "a"), (2, "b")], ["k", "v"], "compact.parquet"
    )
    _log_write(
        tbl,
        1,
        [
            {"remove": {"path": "f1.parquet", "deletionTimestamp": 1, "dataChange": False}},
            {"remove": {"path": "f2.parquet", "deletionTimestamp": 1, "dataChange": False}},
            {"add": dict(_add("compact.parquet", fc), dataChange=False)},
        ],
    )
    got = _run_pass(spark, tbl, out, ckpt)
    # no duplicates from the compaction — cumulative is unchanged
    assert got == {(1, "a"), (2, "b")}


def test_partitioned_snapshot_injects_partition_values(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl, exist_ok=True)
    f1 = _write_parquet_file(spark, tbl, [(1, "a")], ["k", "v"], "p=10/f1.parquet")
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": _meta(
                _schema_string(("k", "long"), ("v", "string"), ("p", "integer")),
                pcols=["p"],
            )},
            {"add": _add("p=10/f1.parquet", f1, pv={"p": "10"})},
        ],
    )
    register_delta_tail(spark)
    got = _run_pass(
        spark, tbl, str(tmp_path / "out_pv"), str(tmp_path / "ck_pv")
    )
    assert got == {(1, "a", 10)}


def _id_mode_schema_string():
    """Logical (k, v) whose column-mapping metadata records ids and
    physical names, the way delta-spark writes id-mode tables."""
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-aaa",
                    },
                },
                {
                    "name": "v",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-bbb",
                    },
                },
            ],
        }
    )


def _write_id_mode_file(tbl, rel, ks, vs):
    """A parquet file whose column names match NEITHER the logical
    nor the recorded physical names — only the parquet field ids
    line up (legal per spec: in id mode, only the id is
    authoritative)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pa.schema(
        [
            pa.field(
                "whatever-1",
                pa.int64(),
                metadata={b"PARQUET:field_id": b"1"},
            ),
            pa.field(
                "whatever-2",
                pa.string(),
                metadata={b"PARQUET:field_id": b"2"},
            ),
        ]
    )
    dst = os.path.join(tbl, rel)
    os.makedirs(os.path.dirname(dst) or tbl, exist_ok=True)
    pq.write_table(
        pa.table({"whatever-1": ks, "whatever-2": vs}, schema=sch),
        dst,
    )
    return dst


def test_id_mode_streams_by_field_id(spark, tmp_path):
    """columnMapping.mode=id: the tail source resolves data columns
    by parquet field id (file names match neither logical nor
    physical names) and a tailed append commit round-trips too."""
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl, exist_ok=True)
    f1 = _write_id_mode_file(tbl, "f1.parquet", [1, 2], ["a", "b"])
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": _meta(
                _id_mode_schema_string(),
                cfg={"delta.columnMapping.mode": "id"},
            )},
            {"add": _add("f1.parquet", f1)},
        ],
    )
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_id"), str(tmp_path / "out_id")
    got = _run_pass(spark, tbl, out, ckpt)
    assert got == {(1, "a"), (2, "b")}
    f2 = _write_id_mode_file(tbl, "f2.parquet", [3], ["c"])
    _log_write(tbl, 1, [{"add": _add("f2.parquet", f2)}])
    got = _run_pass(spark, tbl, out, ckpt)
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_schema_change_stops_stream_then_restart_resolves(
    spark, tmp_path
):
    """A metaData that ADDS a column while the stream is RUNNING
    stops it by name with the commit version (Delta-source behavior
    — silent projection would drop the new column for every row
    after it); a RESTART re-resolves the new schema and keeps going,
    pre-change files projecting nulls for the added column."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_sc"), str(tmp_path / "out_sc")
    assert _run_pass(spark, tbl, out, ckpt) == {(1, "a"), (2, "b")}
    # a RUNNING reader, resolved at v0, sees the change land at v1
    running = DeltaTailStreamReader(None, {"path": tbl})
    f3 = _write_parquet_file(
        spark, tbl, [(3, "c", 9)], ["k", "v", "extra"], "f3.parquet"
    )
    _log_write(
        tbl,
        1,
        [
            {"metaData": _meta(_schema_string(
                ("k", "long"), ("v", "string"), ("extra", "long")
            ))},
            {"add": _add("f3.parquet", f3)},
        ],
    )
    with pytest.raises(
        DeltaProtocolError, match="schema changed at version 1"
    ):
        running.partitions(
            {"version": 0, "snap": True}, {"version": 1, "snap": True}
        )
    # restart (new query -> new reader) resolves the post-change
    # schema and delivers the new rows; the sink now holds
    # mixed-width files — mergeSchema to inspect
    q = (
        spark.readStream.format("delta_tail")
        .load(tbl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        tuple(r)
        for r in spark.read.option("mergeSchema", "true")
        .parquet(out)
        .collect()
    }
    assert (3, "c", 9) in got


def test_config_only_metadata_does_not_stop_stream(spark, tmp_path):
    """A metaData action that only changes table CONFIGURATION (no
    field-set change) is not a schema change — the stream keeps
    going (the gate compares (name, type) signatures)."""
    tbl = _mk_table(spark, tmp_path)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_cfg"), str(tmp_path / "out_cfg")
    _run_pass(spark, tbl, out, ckpt)
    f3 = _write_parquet_file(
        spark, tbl, [(3, "c")], ["k", "v"], "f3.parquet"
    )
    _log_write(
        tbl,
        1,
        [
            {"metaData": _meta(
                _schema_string(("k", "long"), ("v", "string")),
                cfg={"delta.appendOnly": "true"},
            )},
            {"add": _add("f3.parquet", f3)},
        ],
    )
    got = _run_pass(spark, tbl, out, ckpt)
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_offset_state_dir_caps_first_restart_batch(spark, tmp_path):
    """Cold-start rate limiting: with offsetStateDir the reader
    seeds its position from the sidecar the previous run's commit()
    wrote, so the FIRST post-restart latestOffset is already capped;
    without it the first batch is uncapped (documented)."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    sd = str(tmp_path / "state")
    opts = {
        "path": tbl,
        "maxcommitspertrigger": "1",
        "offsetstatedir": sd,
    }
    r1 = DeltaTailStreamReader(None, opts)
    # the engine commits the snapshot batch -> sidecar persists it
    r1.commit({"version": 0, "snap": True})
    # table grows a 3-commit backlog while the stream is down
    for v in (1, 2, 3):
        f = _write_parquet_file(
            spark, tbl, [(10 + v, "x")], ["k", "v"], f"g{v}.parquet"
        )
        _log_write(tbl, v, [{"add": _add(f"g{v}.parquet", f)}])
    # restart WITH the sidecar: first batch capped at one commit
    r2 = DeltaTailStreamReader(None, opts)
    assert r2.latestOffset() == {"version": 1, "snap": True}
    # restart WITHOUT it: the first batch is uncapped (init resolves
    # at the current latest and the checkpointed position is unseen)
    r3 = DeltaTailStreamReader(
        None, {"path": tbl, "maxcommitspertrigger": "1"}
    )
    assert r3.latestOffset()["version"] == 3


def test_stale_sidecar_below_starting_version_cannot_wedge(
    spark, tmp_path
):
    """A sidecar BELOW the startingVersion position (reused state
    dir after the user moved startingVersion forward) must not
    wedge the stream: the first capped end lands below the true
    start, partitions() adopts the checkpointed start, and commit()
    is position-MONOTONIC so the stale end cannot regress it — the
    next latestOffset makes progress."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    for v in (1, 2, 3):
        f = _write_parquet_file(
            spark, tbl, [(10 + v, "x")], ["k", "v"], f"h{v}.parquet"
        )
        _log_write(tbl, v, [{"add": _add(f"h{v}.parquet", f)}])
    sd = str(tmp_path / "state")
    os.makedirs(sd)
    with open(os.path.join(sd, "offset.json"), "w") as fh:
        json.dump({"version": 0, "snap": True}, fh)
    r = DeltaTailStreamReader(
        None,
        {
            "path": tbl,
            "startingversion": "3",
            "maxcommitspertrigger": "1",
            "offsetstatedir": sd,
        },
    )
    # cold-start cap seeded from the stale sidecar: below the start
    end1 = r.latestOffset()
    assert end1["version"] == 1
    # the engine's checkpointed start (startingVersion contract) is
    # ahead — the planned batch is empty, not an error
    assert r.partitions({"version": 2, "snap": True}, end1) == []
    r.commit(end1)  # monotonic: must NOT regress below version 2
    assert r._committed["version"] == 2
    end2 = r.latestOffset()
    assert end2["version"] == 3  # progress resumed
    parts = r.partitions({"version": 2, "snap": True}, end2)
    assert len(parts) == 1  # commit 3's file


def test_starting_timestamp_resolves_start_version(spark, tmp_path):
    """startingTimestamp mirrors Delta's streaming source: the
    stream tails from the earliest commit at or after the timestamp
    (inCommitTimestamp-aware commit time, entry-mtime fallback);
    before-all resolves to the earliest entry, after-latest is a
    named error, and combining it with startingVersion is refused."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    for v, ict_ms in ((1, 10_000), (2, 20_000)):
        f = _write_parquet_file(
            spark, tbl, [(10 + v, "t")], ["k", "v"], f"ts{v}.parquet"
        )
        _log_write(
            tbl,
            v,
            [
                {"commitInfo": {"inCommitTimestamp": ict_ms}},
                {"add": _add(f"ts{v}.parquet", f)},
            ],
        )
    # commit 0 has no inCommitTimestamp: pin its mtime fallback
    # below the probe timestamps (a fresh file's mtime is "now")
    os.utime(
        os.path.join(tbl, "_delta_log", f"{0:020d}.json"), (5, 5)
    )
    r = DeltaTailStreamReader(
        None, {"path": tbl, "startingtimestamp": "15"}
    )
    # resolved to version 2 (first commit at/after 15s), i.e. the
    # same initial offset startingVersion=2 produces
    assert r._initial == {"version": 1, "snap": True}
    parts = r.partitions(r._initial, {"version": 2, "snap": True})
    assert [os.path.basename(p.abs_path) for p in parts] == [
        "ts2.parquet"
    ]
    # before every commit -> earliest entry (version 0)
    r0 = DeltaTailStreamReader(
        None, {"path": tbl, "startingtimestamp": "0"}
    )
    assert r0._initial == {"version": -1, "snap": True}
    with pytest.raises(DeltaProtocolError):
        DeltaTailStreamReader(
            None, {"path": tbl, "startingtimestamp": "99"}
        )
    with pytest.raises(ValueError):
        DeltaTailStreamReader(
            None,
            {
                "path": tbl,
                "startingversion": "1",
                "startingtimestamp": "15",
            },
        )


def test_max_bytes_splits_one_giant_commit(spark, tmp_path):
    """A single commit whose add list exceeds maxBytesPerTrigger
    must stream as MULTIPLE capped batches (Delta's own
    (reservoirVersion, index) offset model): the offset gains an
    intra-commit index, consecutive batches slice disjoint file
    ranges, and the drain covers every file exactly once —
    restart-safe at any batch boundary because the unit order is
    the commit's deterministic log-entry order."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    adds = []
    for i in range(4):
        f = _write_parquet_file(
            spark, tbl, [(100 + i, "g")], ["k", "v"], f"g{i}.parquet"
        )
        adds.append({"add": _add(f"g{i}.parquet", f)})
    _log_write(tbl, 1, adds)
    one = int(adds[0]["add"]["size"])
    r = DeltaTailStreamReader(
        None,
        {
            "path": tbl,
            "startingversion": "1",
            # budget ~1.5 files: each batch admits the file that
            # crosses the cap (soft), i.e. exactly 2 per batch
            "maxbytespertrigger": str(one + one // 2),
        },
    )
    seen: list[str] = []
    ends = []
    start = dict(r._committed)
    for _ in range(10):
        end = r.latestOffset()
        if r._offset_key(end) <= r._offset_key(start):
            break
        parts = r.partitions(start, end)
        seen.extend(os.path.basename(p.abs_path) for p in parts)
        r.commit(end)
        ends.append(end)
        start = end
    assert seen == [f"g{i}.parquet" for i in range(4)]
    # the cut landed INSIDE the commit: first end is a partial offset
    assert ends[0] == {"version": 1, "snap": True, "index": 2}
    assert ends[-1] == {"version": 1, "snap": True}
    # restart mid-commit: a fresh reader replaying the committed
    # range reproduces exactly the same slice
    r2 = DeltaTailStreamReader(
        None, {"path": tbl, "startingversion": "1"}
    )
    replay = r2.partitions(
        {"version": 0, "snap": True}, {"version": 1, "snap": True, "index": 2}
    )
    assert [os.path.basename(p.abs_path) for p in replay] == [
        "g0.parquet", "g1.parquet",
    ]
    tail = r2.partitions(
        {"version": 1, "snap": True, "index": 2},
        {"version": 1, "snap": True},
    )
    assert [os.path.basename(p.abs_path) for p in tail] == [
        "g2.parquet", "g3.parquet",
    ]


def test_intra_commit_split_end_to_end(spark, tmp_path):
    """End-to-end: a giant commit streams through a real query with
    a byte cap and the cumulative sink holds every row exactly once
    — offsets with an intra-commit index checkpoint/restore through
    Spark's offset log unchanged (they are plain JSON)."""
    register_delta_tail(spark)
    tbl = _mk_table(spark, tmp_path)
    adds = []
    for i in range(4):
        f = _write_parquet_file(
            spark, tbl, [(200 + i, "e")], ["k", "v"], f"e{i}.parquet"
        )
        adds.append({"add": _add(f"e{i}.parquet", f)})
    _log_write(tbl, 1, adds)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # budget = one file: every capped batch carries exactly one of
    # the commit's four files (each availableNow pass = one batch
    # for a Python source, restarting from the checkpoint — i.e.
    # every pass boundary IS a mid-commit restart)
    opts = dict(
        startingVersion="1",
        maxBytesPerTrigger=str(int(adds[0]["add"]["size"])),
    )
    sizes = []
    got = set()
    for _ in range(8):
        prev = len(got)
        got = _run_pass(spark, tbl, out, ckpt, **opts)
        sizes.append(len(got) - prev)
        if len(got) == 4:
            break
    assert got == {(200 + i, "e") for i in range(4)}
    assert len(sizes) > 1, "commit was not split across batches"
    # restart from the checkpoint after one more multi-file commit
    adds2 = []
    for i in range(3):
        f = _write_parquet_file(
            spark, tbl, [(300 + i, "f")], ["k", "v"], f"ee{i}.parquet"
        )
        adds2.append({"add": _add(f"ee{i}.parquet", f)})
    _log_write(tbl, 2, adds2)
    for _ in range(6):
        got = _run_pass(spark, tbl, out, ckpt, **opts)
        if len(got) == 7:
            break
    assert got == {(200 + i, "e") for i in range(4)} | {
        (300 + i, "f") for i in range(3)
    }


def test_cdf_byte_cap_counts_cdc_sizes(spark, tmp_path):
    """In change-feed mode the byte cap must count the EMITTED
    units' sizes (cdc files), not add actions — a cdc-only commit
    stream (delete-heavy feeds) was previously uncapped because its
    add-byte total is zero."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    for v in (1, 2):
        f = _write_parquet_file(
            spark,
            tbl,
            [(v, "d", "delete")],
            ["k", "v", "_change_type"],
            f"_change_data/c{v}.parquet",
        )
        _log_write(
            tbl,
            v,
            [
                {
                    "cdc": {
                        "path": f"_change_data/c{v}.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(f),
                        "dataChange": False,
                    }
                }
            ],
        )
    r = DeltaTailStreamReader(
        None,
        {
            "path": tbl,
            "startingversion": "1",
            "readchangefeed": "true",
            "maxbytespertrigger": "1",
        },
    )
    r._committed = {"version": 0, "snap": True}
    # one cdc commit per trigger, not both
    assert r.latestOffset() == {"version": 1, "snap": True}


def test_max_bytes_per_trigger_soft_cap(spark, tmp_path):
    """maxBytesPerTrigger (Delta's soft byte cap): commits are
    admitted until their cumulative add sizes exceed the budget,
    always at least one."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    sizes = {}
    for v in (1, 2, 3):
        f = _write_parquet_file(
            spark, tbl, [(10 + v, "x")], ["k", "v"], f"b{v}.parquet"
        )
        sizes[v] = os.path.getsize(f)
        _log_write(tbl, v, [{"add": _add(f"b{v}.parquet", f)}])
    # budget = commit 1 + commit 2 exactly: commit 3 must wait
    r = DeltaTailStreamReader(
        None,
        {
            "path": tbl,
            "startingversion": "1",
            "maxbytespertrigger": str(sizes[1] + sizes[2]),
        },
    )
    r._committed = {"version": 0, "snap": True}
    assert r.latestOffset() == {"version": 2, "snap": True}
    # a budget smaller than any single commit still admits one
    r2 = DeltaTailStreamReader(
        None,
        {
            "path": tbl,
            "startingversion": "1",
            "maxbytespertrigger": "1",
        },
    )
    r2._committed = {"version": 0, "snap": True}
    assert r2.latestOffset() == {"version": 1, "snap": True}


def test_in_commit_timestamp_preferred_for_cdf(spark, tmp_path):
    """With the inCommitTimestamps writer feature, the monotonic
    commitInfo.inCommitTimestamp is THE commit time per spec — the
    change-feed metadata must prefer it over the best-effort
    wall-clock timestamp field."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    f3 = _write_parquet_file(
        spark, tbl, [(3, "c")], ["k", "v"], "f3.parquet"
    )
    _log_write(
        tbl,
        1,
        [
            {"commitInfo": {"timestamp": 1111, "inCommitTimestamp": 2222}},
            {"add": _add("f3.parquet", f3)},
        ],
    )
    r = DeltaTailStreamReader(
        None, {"path": tbl, "readchangefeed": "true"}
    )
    parts = r._commit_changes(1)
    assert len(parts) == 1
    assert parts[0].ts_ms == 2222


def test_read_path_is_arrow_batched():
    """The data plane must stay Arrow: no whole-file to_pylist /
    per-row Python emit in the streaming tail source."""
    import etl_pipeline_4handling_listings_spark.sources.deltastream as m

    src = open(m.__file__).read()
    assert "to_pylist" not in src
    assert "iter_batches" in src


def test_tail_streams_mergestore_exported_log(spark, tmp_path):
    """Full interop loop: a MergeStore's exported _delta_log is
    streamable by the tail source — snapshot first, then a store
    APPEND re-exported as a new log entry arrives as exactly its
    rows (what a stock Delta streaming consumer of the exported
    table would see)."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        export_delta_log,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )

    store = MergeStore(spark, str(tmp_path / "store"), keys=["k"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    export_delta_log(store)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_ms"), str(tmp_path / "out_ms")
    got = _run_pass(spark, store.path, out, ckpt)
    assert got == {(1, "a"), (2, "b")}
    store.append(spark.createDataFrame([(3, "c")], ["k", "v"]))
    export_delta_log(store)
    got = _run_pass(spark, store.path, out, ckpt)
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_tail_checkpointed_log_with_cleaned_json(spark, tmp_path):
    """The realistic long-lived foreign table: the log has a parquet
    checkpoint and the pre-checkpoint JSON entries were cleaned up
    (Delta's metadata retention). The snapshot batch replays from
    the checkpoint (pure-Python, no delta-spark), and the stream
    then tails new commits appended after it."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        export_delta_log,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )

    store = MergeStore(spark, str(tmp_path / "store"), keys=["k"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)  # v1
    store.append(spark.createDataFrame([(3, "c")], ["k", "v"]))  # v2
    export_delta_log(store)
    log_dir = os.path.join(store.path, "_delta_log")
    ckpts = [
        n for n in os.listdir(log_dir) if n.endswith(".checkpoint.parquet")
    ]
    assert ckpts, "export should have produced a classic checkpoint"
    ckv = int(ckpts[0].split(".")[0])
    # the exported log already has Delta's retained shape: history
    # at/below the checkpoint exists ONLY in the checkpoint parquet
    # (no JSON entries to fall back to)
    assert not [
        n
        for n in os.listdir(log_dir)
        if n.endswith(".json") and int(n.split(".")[0]) < ckv
    ]
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_ckpt"), str(tmp_path / "out_ckpt")
    got = _run_pass(spark, store.path, out, ckpt)
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # a commit appended after the checkpoint tails normally
    store.append(spark.createDataFrame([(4, "d")], ["k", "v"]))
    export_delta_log(store)
    got = _run_pass(spark, store.path, out, ckpt)
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}


def test_py_snapshot_same_commit_remove_and_readd(spark, tmp_path):
    """The pure-Python replay applies the spec's reconciliation:
    within one commit the add wins over the remove of the same path,
    regardless of line order in the entry."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        _py_snapshot,
    )

    tbl = _mk_table(spark, tmp_path)
    _log_write(
        tbl,
        1,
        [
            {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1, "modificationTime": 5, "dataChange": True}},
            {"remove": {"path": "f1.parquet", "deletionTimestamp": 1, "dataChange": True}},
        ],
    )
    target, _meta_d, adds = _py_snapshot(
        os.path.join(tbl, "_delta_log"), None
    )
    assert target == 1
    by_path = {a["path"]: a for a in adds}
    assert set(by_path) == {"f1.parquet", "f2.parquet"}
    assert by_path["f1.parquet"]["modificationTime"] == 5  # the re-add


def test_max_commits_per_trigger_bounds_batches(spark, tmp_path):
    """Rate limiting: with maxCommitsPerTrigger=1 a 2-commit backlog
    drains one commit per query pass instead of one giant batch
    (Delta's maxFilesPerTrigger analogue at commit granularity)."""
    tbl = _mk_table(spark, tmp_path)
    f3 = _write_parquet_file(spark, tbl, [(3, "c")], ["k", "v"], "f3.parquet")
    f4 = _write_parquet_file(spark, tbl, [(4, "d")], ["k", "v"], "f4.parquet")
    _log_write(tbl, 1, [{"add": _add("f3.parquet", f3)}])
    _log_write(tbl, 2, [{"add": _add("f4.parquet", f4)}])
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_mc"), str(tmp_path / "out_mc")
    got = _run_pass(
        spark, tbl, out, ckpt,
        startingVersion=1, maxCommitsPerTrigger=1,
    )
    assert got == {(3, "c")}  # commit 1 only — backlog held back
    got = _run_pass(
        spark, tbl, out, ckpt,
        startingVersion=1, maxCommitsPerTrigger=1,
    )
    assert got == {(3, "c"), (4, "d")}  # commit 2 on the next pass


def test_read_change_feed_stream(spark, tmp_path):
    """readChangeFeed=true streams the spec CDF: the initial
    snapshot arrives as inserts, a writer-produced cdc commit
    (MergeStore export with change_data) delivers update
    pre/postimages, and delete commits need NO ignore options — the
    feed represents them."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        export_delta_log,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )

    store = MergeStore(spark, str(tmp_path / "store"), keys=["k"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)  # v00001
    export_delta_log(store, change_data=True)
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_cdf"), str(tmp_path / "out_cdf")
    got = _run_pass(spark, store.path, out, ckpt, readChangeFeed="true")
    assert {(r[0], r[1], r[2], r[3]) for r in got} == {
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
    }
    store.merge(spark.createDataFrame([(2, "B")], ["k", "v"]))  # v2
    store.delete("k = 1")  # v3 (DV delete -> cdc files)
    export_delta_log(store, change_data=True)
    got = _run_pass(spark, store.path, out, ckpt, readChangeFeed="true")
    assert {(r[0], r[1], r[2], r[3]) for r in got} == {
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (2, "b", "update_preimage", 2),
        (2, "B", "update_postimage", 2),
        (1, "a", "delete", 3),
    }


def test_read_change_feed_foreign_derivation(spark, tmp_path):
    """A cdc-less foreign log under readChangeFeed: adds derive as
    inserts and a delete-only commit as deletes — the rows of the
    removed (not-yet-vacuumed) file."""
    tbl = _mk_table(spark, tmp_path)
    _log_write(
        tbl,
        1,
        [{"remove": {"path": "f2.parquet", "deletionTimestamp": 1, "dataChange": True}}],
    )
    register_delta_tail(spark)
    got = _run_pass(
        spark,
        tbl,
        str(tmp_path / "out_fcdf"),
        str(tmp_path / "ck_fcdf"),
        readChangeFeed="true",
        startingVersion=0,
    )
    assert {(r[0], r[1], r[2], r[3]) for r in got} == {
        (1, "a", "insert", 0),
        (2, "b", "insert", 0),
        (2, "b", "delete", 1),
    }


def test_change_feed_applies_into_mergestore(spark, tmp_path):
    """Full medallion hop across ENGINES: a stock-shaped Delta table
    (MergeStore export with change_data) streams its CDF through
    delta_tail and foreach_batch_cdc_apply replays it into a second
    MergeStore — final downstream snapshot == upstream state,
    updates and deletes included, preimages dropped."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        export_delta_log,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        foreach_batch_cdc_apply,
    )

    up = MergeStore(spark, str(tmp_path / "up"), keys=["k"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    up.create_if_absent(df)
    up.merge(df)  # v1
    up.merge(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]))
    up.delete("k = 1")  # v3
    export_delta_log(up, change_data=True)

    down = MergeStore(spark, str(tmp_path / "down"), keys=["k"])
    register_delta_tail(spark)
    q = (
        spark.readStream.format("delta_tail")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(up.path)
        .writeStream.foreachBatch(
            foreach_batch_cdc_apply(down, ["k"], "tail-to-down")
        )
        .option("checkpointLocation", str(tmp_path / "ck_apply"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = sorted((r.k, r.v) for r in down.read().collect())
    assert got == sorted((r.k, r.v) for r in up.read().collect())
    assert got == [(2, "B"), (3, "c")]


def test_change_feed_composes_with_rate_limit(spark, tmp_path):
    """readChangeFeed and maxCommitsPerTrigger compose: a 2-commit
    backlog drains one commit of changes per pass."""
    tbl = _mk_table(spark, tmp_path)
    f3 = _write_parquet_file(spark, tbl, [(3, "c")], ["k", "v"], "f3.parquet")
    _log_write(tbl, 1, [{"add": _add("f3.parquet", f3)}])
    _log_write(
        tbl,
        2,
        [{"remove": {"path": "f1.parquet", "deletionTimestamp": 2, "dataChange": True}}],
    )
    register_delta_tail(spark)
    ckpt, out = str(tmp_path / "ck_rlcdf"), str(tmp_path / "out_rlcdf")
    opts = dict(
        readChangeFeed="true",
        startingVersion=1,
        maxCommitsPerTrigger=1,
    )
    got = _run_pass(spark, tbl, out, ckpt, **opts)
    assert {(r[0], r[2], r[3]) for r in got} == {(3, "insert", 1)}
    got = _run_pass(spark, tbl, out, ckpt, **opts)
    assert {(r[0], r[2], r[3]) for r in got} == {
        (3, "insert", 1),
        (1, "delete", 2),
    }


def test_max_bytes_counts_sizeless_removes(spark, tmp_path):
    """``remove.size`` is OPTIONAL per spec — a delete-derived
    change-feed unit whose writer omitted it must still weigh its
    file's actual bytes in the maxBytesPerTrigger walk (stat() of
    the still-on-disk data file), otherwise a delete-heavy backlog
    admits unbounded units exactly in the heavy case the cap exists
    for."""
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = _mk_table(spark, tmp_path)
    f1 = _write_parquet_file(
        spark, tbl, [(1, "a")], ["k", "v"], "r1.parquet"
    )
    _log_write(tbl, 1, [{"add": _add("r1.parquet", f1)}])
    # commit 2 removes it WITHOUT a size; commit 3 adds more data
    _log_write(
        tbl,
        2,
        [
            {
                "remove": {
                    "path": "r1.parquet",
                    "dataChange": True,
                    "partitionValues": {},
                }
            }
        ],
    )
    f3 = _write_parquet_file(
        spark, tbl, [(3, "c")], ["k", "v"], "r3.parquet"
    )
    _log_write(tbl, 3, [{"add": _add("r3.parquet", f3)}])
    r = DeltaTailStreamReader(
        None,
        {
            "path": tbl,
            "startingversion": "2",
            "readchangefeed": "true",
            "maxbytespertrigger": "1",
        },
    )
    r._committed = {"version": 1, "snap": True}
    # the sizeless remove must exhaust the 1-byte budget by itself:
    # commit 3 waits for the next trigger (a 0-weight remove would
    # have admitted it too)
    assert r.latestOffset() == {"version": 2, "snap": True}
