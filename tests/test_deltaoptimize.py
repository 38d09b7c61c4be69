"""Foreign-Delta OPTIMIZE (``optimize_delta``).

Small-file compaction and deletion-vector purge (Delta's REORG)
as one claimed dataChange=false commit: logical content unchanged,
change feeds skip it, appendOnly tables accept it.
"""

import json
import os

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    append_to_delta,
    delete_from_delta,
    optimize_delta,
    read_delta,
    read_delta_changes,
)
from etl_pipeline_4handling_listings_spark.sources.sqldml import run_dml

from test_deltaappend import _entry_lines, _mk_foreign
from test_deltadelete import _seed


def _live_paths(tbl):
    live = {}
    log_dir = os.path.join(tbl, "_delta_log")
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(log_dir, name)) as fh:
            lines = [json.loads(ln) for ln in fh if ln.strip()]
        for ln in lines:
            if "remove" in ln:
                live.pop(ln["remove"]["path"], None)
        for ln in lines:
            if "add" in ln:
                live[ln["add"]["path"]] = ln["add"]
    return live


def test_optimize_compacts_small_files(spark, tmp_path):
    """Three small appends consolidate into one file; the commit
    is all dataChange=false; rows unchanged; re-optimize no-ops;
    appendOnly accepts it."""
    tbl = _mk_foreign(
        tmp_path, cfg={"delta.appendOnly": "true"}, name="opt"
    )
    _seed(spark, tbl, [(1, "a")])
    _seed(spark, tbl, [(2, "b")])
    _seed(spark, tbl, [(3, "c")])
    assert len(_live_paths(tbl)) == 3
    ver, info = optimize_delta(spark, tbl)
    assert info == {
        "files_removed": 3,
        "files_added": 1,
        "partitions": 1,
    }
    lines = _entry_lines(tbl, ver)
    assert lines[0]["commitInfo"]["operation"] == "OPTIMIZE"
    assert all(
        ln["remove"]["dataChange"] is False
        for ln in lines[1:]
        if "remove" in ln
    )
    assert all(
        ln["add"]["dataChange"] is False
        for ln in lines[1:]
        if "add" in ln
    )
    assert len(_live_paths(tbl)) == 1
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # nothing left to compact
    ver2, info2 = optimize_delta(spark, tbl)
    assert ver2 == ver and info2["files_removed"] == 0
    # a lone small file never compacts
    _seed(spark, tbl, [(4, "d")])
    v3, i3 = optimize_delta(spark, tbl)
    # the lone NEW file plus the consolidated one = 2 smalls again
    assert i3["files_removed"] == 2


def test_optimize_partitioned_per_partition(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="optp")
    _seed(
        spark, tbl, [(1, "a", 10)], pcols=("p",), one_file=False
    )
    _seed(
        spark, tbl, [(2, "b", 10)], pcols=("p",), one_file=False
    )
    _seed(
        spark, tbl, [(3, "c", 20)], pcols=("p",), one_file=False
    )
    ver, info = optimize_delta(spark, tbl)
    # only p=10 has >=2 small files; p=20's lone file untouched
    assert info["files_removed"] == 2
    assert info["partitions"] == 1
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert all(
        a["partitionValues"] == {"p": "10"}
        and a["path"].startswith("p=10/")
        for a in adds
    )
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a", 10), (2, "b", 10), (3, "c", 20)]


def test_optimize_bins_by_target_size(spark, tmp_path):
    """Input bytes above the target split into multiple bins —
    one output file per bin, never one giant consolidation."""
    tbl = _mk_foreign(tmp_path, name="optbin")
    sizes = []
    for k in range(4):
        _seed(spark, tbl, [(k, f"v{k}")])
    live = _live_paths(tbl)
    sizes = [a["size"] for a in live.values()]
    # target fits roughly two input files per bin -> 2 bins
    target = int(sum(sizes) / 2 + max(sizes))
    ver, info = optimize_delta(
        spark, tbl, target_file_size_bytes=target
    )
    assert info["files_removed"] == 4
    assert info["files_added"] == 2
    got = sorted(r.k for r in read_delta(spark, tbl).collect())
    assert got == [0, 1, 2, 3]


def test_optimize_null_partition_values(spark, tmp_path):
    """A NULL partition value (hive default dir) must not break
    group ordering; both the null and non-null partitions
    compact."""
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="optnull")
    for row in [
        (1, "a", None),
        (2, "b", None),
        (3, "c", 10),
        (4, "d", 10),
    ]:
        _seed(spark, tbl, [row], pcols=("p",), one_file=False)
    ver, info = optimize_delta(spark, tbl)
    assert info["files_removed"] == 4
    assert info["partitions"] == 2
    got = sorted(
        (r.k, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, None), (2, None), (3, 10), (4, 10)]


def test_optimize_purge_rewrites_dv_masks(spark, tmp_path):
    """REORG PURGE: a DV-masked file rewrites to its surviving
    rows, the new file carries no mask, the change feed skips the
    commit."""
    tbl = _mk_foreign(
        tmp_path,
        cfg={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "changeDataFeed"],
        },
        name="optdv",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    delete_from_delta(spark, tbl, "k = 2", strategy="dv")
    ver, info = run_dml(
        spark,
        "reorg table t apply (purge)",
        tables={"t": tbl},
    )
    assert info["files_removed"] == 1
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert len(adds) == 1 and "deletionVector" not in adds[0]
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    assert removes[0]["deletionVector"]["storageType"]
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (3, "c")]
    # dataChange=false: the change feed has no rows for ver
    ch = read_delta_changes(
        spark, tbl, starting_version=ver, ending_version=ver
    )
    assert ch.count() == 0
    # purge-only: the fresh un-masked file is NOT size-compacted
    ver2, info2 = run_dml(
        spark, "reorg table t apply (purge)", tables={"t": tbl}
    )
    assert ver2 == ver and info2["files_removed"] == 0


def test_optimize_concurrent_rewrite_conflicts(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="optrace")
    _seed(spark, tbl, [(1, "a")])
    _seed(spark, tbl, [(2, "b")])

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                delete_from_delta(spark, tbl, "k = 1")
            return super().create_exclusive(path, payload)

    with pytest.raises(
        DeltaProtocolError, match="ConcurrentDeleteDelete"
    ):
        optimize_delta(spark, tbl, log_store=Racer())

    _seed(spark, tbl, [(5, "e")])  # second small file again

    class Appender(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                append_to_delta(
                    spark.createDataFrame(
                        [(9, "z")], "k long, v string"
                    ),
                    tbl,
                )
            return super().create_exclusive(path, payload)

    # concurrent blind append passes; its file stays un-compacted
    ver, info = optimize_delta(spark, tbl, log_store=Appender())
    assert info["files_removed"] == 2
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(2, "b"), (5, "e"), (9, "z")]


def test_optimize_sql_and_zorder_refusal(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.sources.sqldml import (
        DMLParseError,
    )

    tbl = _mk_foreign(tmp_path, name="optsql")
    _seed(spark, tbl, [(1, "a")])
    _seed(spark, tbl, [(2, "b")])
    ver, info = run_dml(spark, "optimize t", tables={"t": tbl})
    assert info["files_removed"] == 2
    with pytest.raises(DMLParseError, match="ZORDER"):
        run_dml(spark, "optimize t zorder by (k)", tables={"t": tbl})
