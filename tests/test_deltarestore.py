"""Foreign-Delta RESTORE (``restore_delta``).

Delta's ``RESTORE TABLE t TO VERSION|TIMESTAMP AS OF`` against a
stock-owned table: one claimed commit re-adding the files live at
the target version and removing the ones added since, restoring a
changed table metadata alongside — delta-spark's
RestoreTableCommand shape through the same claim/OCC protocol.
"""

import json
import os
import time

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    append_to_delta,
    delete_from_delta,
    read_delta,
    restore_delta,
)
from etl_pipeline_4handling_listings_spark.sources.sqldml import run_dml

from test_deltaappend import _entry_lines, _log_write, _mk_foreign
from test_deltadelete import _seed


def test_restore_round_trip_after_delete_and_append(
    spark, tmp_path
):
    """Seed (v1) -> append (v2) -> delete (v3) -> restore to v1:
    the v2 files are removed, the v3 rewrite is unwound and the v1
    file re-added; a stock reader sees exactly the v1 rows; a
    second restore to the same state commits nothing."""
    tbl = _mk_foreign(tmp_path, name="rst")
    _seed(spark, tbl, [(1, "a"), (2, "b")])  # v1
    _seed(spark, tbl, [(3, "c")])  # v2
    delete_from_delta(spark, tbl, "k = 1")  # v3 rewrite
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    ) == [(2, "b"), (3, "c")]
    ver, info = restore_delta(spark, tbl, version=1)
    assert info["restored_version"] == 1
    assert info["files_added"] == 1  # the v1 file, rewound
    assert info["files_removed"] == 2  # the v2 file + v3 rewrite
    lines = _entry_lines(tbl, ver)
    assert lines[0]["commitInfo"]["operation"] == "RESTORE"
    assert (
        lines[0]["commitInfo"]["operationParameters"]["version"] == 1
    )
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "b")]
    # identical state -> no commit
    ver2, info2 = restore_delta(spark, tbl, version=1)
    assert ver2 == ver
    assert (info2["files_added"], info2["files_removed"]) == (0, 0)


def test_restore_by_timestamp(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="rstts")
    _seed(spark, tbl, [(1, "a")])  # v1
    # make v1's mtime clearly earlier than v2's
    v1 = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    t1 = time.time() - 3600
    os.utime(v1, (t1, t1))
    _seed(spark, tbl, [(2, "b")])  # v2
    mid = time.time() - 1800
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(mid, tz=timezone.utc).isoformat()
    ver, info = restore_delta(spark, tbl, timestamp=ts)
    assert info["restored_version"] == 1
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [1]


def test_restore_restores_metadata(spark, tmp_path):
    """A restore across a schema change re-commits the OLD
    metaData action (delta-spark's behavior) so readers of the
    restored state see the original schema."""
    tbl = _mk_foreign(tmp_path, name="rstmeta")
    _seed(spark, tbl, [(1, "a")])  # v1
    # a stock-style metadata change at v2: add a column
    meta = json.loads(
        json.dumps(
            [
                ln["metaData"]
                for ln in _entry_lines(tbl, 0)
                if "metaData" in ln
            ][0]
        )
    )
    sch = json.loads(meta["schemaString"])
    sch["fields"].append(
        {
            "name": "extra",
            "type": "long",
            "nullable": True,
            "metadata": {},
        }
    )
    meta["schemaString"] = json.dumps(sch)
    _log_write(tbl, 2, [{"metaData": meta}])
    assert "extra" in read_delta(spark, tbl).columns
    ver, info = restore_delta(spark, tbl, version=1)
    lines = _entry_lines(tbl, ver)
    metas = [ln["metaData"] for ln in lines[1:] if "metaData" in ln]
    assert len(metas) == 1 and "extra" not in metas[0]["schemaString"]
    assert read_delta(spark, tbl).columns == ["k", "v"]


def test_restore_through_checkpoint_shaped_replay(spark, tmp_path):
    """A target version resolved THROUGH a stock checkpoint yields
    None-padded pyarrow dicts; the re-added action must be rebuilt
    to its spec fields (no tags:null leakage, dict partitionValues)
    and the metadata comparison must not see phantom drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_deltaappend import _schema_string

    tbl = _mk_foreign(tmp_path, name="rstck")
    _seed(spark, tbl, [(1, "a"), (2, "b")])  # v1
    add1 = next(
        ln["add"] for ln in _entry_lines(tbl, 1)[1:] if "add" in ln
    )
    log_dir = os.path.join(tbl, "_delta_log")
    map_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", map_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("tags", map_t),
            ("stats", pa.string()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_t),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ]
    )
    table = pa.table(
        {
            "protocol": pa.array(
                [
                    {"minReaderVersion": 1, "minWriterVersion": 2},
                    None,
                ],
                type=proto_t,
            ),
            "metaData": pa.array(
                [
                    None,
                    {
                        "id": "foreign-1",
                        "format": {"provider": "parquet"},
                        "schemaString": _schema_string(
                            ("k", "long"), ("v", "string")
                        ),
                        "partitionColumns": [],
                        "configuration": [],
                        "createdTime": 0,
                    },
                ],
                type=meta_t,
            ),
            "add": pa.array(
                [
                    {
                        "path": add1["path"],
                        "partitionValues": [],
                        "size": add1["size"],
                        "modificationTime": add1["modificationTime"],
                        "dataChange": True,
                        "tags": None,
                        "stats": add1.get("stats"),
                    },
                    None,
                ],
                type=add_t,
            ),
        }
    )
    pq.write_table(
        table, os.path.join(log_dir, f"{1:020d}.checkpoint.parquet")
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 2}, f)
    delete_from_delta(spark, tbl, "k >= 1")  # v2: pure remove
    assert read_delta(spark, tbl).count() == 0
    ver, info = restore_delta(spark, tbl, version=1)
    assert info["files_added"] == 1
    lines = _entry_lines(tbl, ver)
    re_add = next(ln["add"] for ln in lines[1:] if "add" in ln)
    # spec fields only — no None-filled checkpoint padding
    assert "tags" not in re_add
    assert re_add["partitionValues"] == {}
    # no phantom-drift metaData action (both states are identical)
    assert not [ln for ln in lines[1:] if "metaData" in ln]
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    ) == [(1, "a"), (2, "b")]


def test_restore_gates_rerun_on_concurrent_appendonly(
    spark, tmp_path
):
    """A concurrent metadata-only ALTER flipping appendOnly=true
    keeps the diff identical but must still refuse the removes —
    the gates re-run on every revalidation."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="rstgate")
    _seed(spark, tbl, [(1, "a")])  # v1
    _seed(spark, tbl, [(2, "b")])  # v2
    meta = [
        ln["metaData"]
        for ln in _entry_lines(tbl, 0)
        if "metaData" in ln
    ][0]
    altered = dict(meta)
    altered["configuration"] = {"delta.appendOnly": "true"}

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                _log_write(tbl, 3, [{"metaData": altered}])
            return super().create_exclusive(path, payload)

    with pytest.raises(DeltaProtocolError, match="append-only"):
        restore_delta(spark, tbl, version=1, log_store=Racer())


def test_restore_cdf_dv_readd_refuses(spark, tmp_path):
    """Re-adding a DV-carrying file on a live-CDF table would
    write a commit no change-feed reader can derive rows from —
    named refusal up front."""
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
        name="rstcdfdv",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])  # v1
    delete_from_delta(spark, tbl, "k = 1", strategy="dv")  # v2: DV1
    delete_from_delta(spark, tbl, "k = 2", strategy="dv")  # v3: DV2
    with pytest.raises(DeltaProtocolError, match="change feed"):
        restore_delta(spark, tbl, version=2)
    # restoring to the DV-free v1 is fine
    ver, info = restore_delta(spark, tbl, version=1)
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [1, 2, 3]


def test_restore_restores_description(spark, tmp_path):
    """name/description changes are part of the restored metadata
    (delta-spark restores the full target snapshot metadata)."""
    tbl = _mk_foreign(tmp_path, name="rstdesc")
    _seed(spark, tbl, [(1, "a")])  # v1
    meta = [
        ln["metaData"]
        for ln in _entry_lines(tbl, 0)
        if "metaData" in ln
    ][0]
    described = dict(meta, description="added later")
    _log_write(tbl, 2, [{"metaData": described}])
    ver, info = restore_delta(spark, tbl, version=1)
    metas = [
        ln["metaData"]
        for ln in _entry_lines(tbl, ver)[1:]
        if "metaData" in ln
    ]
    assert len(metas) == 1
    assert metas[0].get("description") is None


def test_restore_refuses_vacuumed_files(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="rstvac")
    _seed(spark, tbl, [(1, "a")])  # v1
    delete_from_delta(spark, tbl, "k = 1")  # v2: pure remove
    # simulate a vacuum reclaiming the dead file
    dead = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )
    os.remove(os.path.join(tbl, dead))
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        restore_delta(spark, tbl, version=1)


def test_restore_concurrent_commit_conflicts(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="rstrace")
    _seed(spark, tbl, [(1, "a")])  # v1
    _seed(spark, tbl, [(2, "b")])  # v2

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                append_to_delta(
                    spark.createDataFrame(
                        [(9, "raced")], "k long, v string"
                    ),
                    tbl,
                )
            return super().create_exclusive(path, payload)

    with pytest.raises(DeltaProtocolError, match="stale"):
        restore_delta(spark, tbl, version=1, log_store=Racer())


def test_restore_argument_and_appendonly_refusals(spark, tmp_path):
    tbl = _mk_foreign(
        tmp_path, cfg={"delta.appendOnly": "true"}, name="rstao"
    )
    _seed(spark, tbl, [(1, "a")])
    _seed(spark, tbl, [(2, "b")])
    with pytest.raises(ValueError, match="exactly one"):
        restore_delta(spark, tbl)
    with pytest.raises(ValueError, match="exactly one"):
        restore_delta(spark, tbl, version=1, timestamp="2026-01-01")
    # unwinding the v2 append needs a remove: appendOnly refuses
    with pytest.raises(DeltaProtocolError, match="append-only"):
        restore_delta(spark, tbl, version=1)


def test_restore_via_sql_on_foreign_path(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="rstsql")
    _seed(spark, tbl, [(1, "a")])  # v1
    _seed(spark, tbl, [(2, "b")])  # v2
    ver, info = run_dml(
        spark,
        "restore table t to version as of 1",
        tables={"t": tbl},
    )
    assert info["restored_version"] == 1
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [1]
