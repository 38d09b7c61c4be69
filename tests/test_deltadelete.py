"""Foreign-Delta row DELETE (``delete_from_delta``).

The second interop write direction after ``append_to_delta``
(reference: the curated Delta store a stock deployment owns,
mls_listings_curated.py:321-368 — the first GDPR delete on a table
this engine feeds): full-file removes where every row matches,
kept-row rewrites otherwise, one claimed commit through the same
LogStore OCC machinery, Delta's ConcurrentDeleteDelete conflict
rule on a moved head.
"""

import json
import os

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    append_to_delta,
    delete_from_delta,
    read_delta,
)

from test_deltaappend import _entry_lines, _log_write, _mk_foreign


def _seed(spark, tbl, rows, pcols=(), one_file=True):
    """Append seed rows; ``one_file`` coalesces so a mixed-match
    predicate exercises the REWRITE path (local[32] would otherwise
    scatter single-row files where every match is a full remove)."""
    ddl = "k long, v string" + "".join(f", {c} long" for c in pcols)
    df = spark.createDataFrame(rows, ddl)
    if one_file:
        df = df.coalesce(1)
    return append_to_delta(df, tbl)


def test_delete_full_file_remove_only(spark, tmp_path):
    """A predicate matching EVERY row of some files turns them into
    pure remove actions — no rewrite, no new files — and a stock
    reader sees the survivors."""
    tbl = _mk_foreign(tmp_path, name="full")
    # two appends -> two separate file sets
    _seed(spark, tbl, [(1, "dead"), (2, "dead")])
    _seed(spark, tbl, [(3, "live"), (4, "live")])
    n_before = len(
        [ln for ln in _entry_lines(tbl, 1)[1:] if "add" in ln]
    )
    ver, n = delete_from_delta(spark, tbl, "v = 'dead'")
    assert (ver, n) == (3, 2)
    lines = _entry_lines(tbl, 3)
    assert lines[0]["commitInfo"]["operation"] == "DELETE"
    assert (
        lines[0]["commitInfo"]["operationParameters"]["predicate"]
        == "v = 'dead'"
    )
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert len(removes) == n_before and not adds
    assert all(
        r["dataChange"] is True and r["deletionTimestamp"] > 0
        for r in removes
    )
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(3, "live"), (4, "live")]


def test_delete_partial_rewrites_kept_rows(spark, tmp_path):
    """A predicate matching SOME rows of a file rewrites it: the
    commit pairs the remove with adds holding exactly the kept rows
    (stats included), and NULL predicates keep their rows (Delta's
    WHERE rule)."""
    tbl = _mk_foreign(tmp_path, name="partial")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, None), (4, "a")])
    ver, n = delete_from_delta(spark, tbl, "v = 'a'")
    assert n == 2
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert removes and adds
    assert sum(
        json.loads(a["stats"])["numRecords"] for a in adds
    ) == 2
    for a in adds:
        assert os.path.isfile(os.path.join(tbl, a["path"]))
    got = sorted(
        (r.k, r.v)
        for r in read_delta(spark, tbl).collect()
    )
    assert got == [(2, "b"), (3, None)]  # NULL row survives


def test_delete_partitioned_prunes_and_labels(spark, tmp_path):
    """Partition columns re-attach from partitionValues for the
    predicate, untouched partitions keep their files byte-identical,
    and rewritten files land in the right hive dirs with correct
    partitionValues."""
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="part")
    _seed(
        spark,
        tbl,
        [(1, "a", 10), (2, "b", 10), (3, "c", 20), (4, "d", 20)],
        pcols=("p",),
    )
    before = {
        a["add"]["path"]: a["add"]
        for a in _entry_lines(tbl, 1)[1:]
    }
    ver, n = delete_from_delta(
        spark, tbl, "p = 10 AND k = 1"
    )
    assert n == 1
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert all(
        r["partitionValues"] == {"p": "10"} for r in removes
    )
    assert all(
        a["partitionValues"] == {"p": "10"}
        and a["path"].startswith("p=10/")
        for a in adds
    )
    # p=20 files untouched
    assert all(
        "p=20" not in r["path"] for r in removes
    ) and all(
        os.path.isfile(os.path.join(tbl, p))
        for p in before
        if p.startswith("p=20")
    )
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(2, "b", 10), (3, "c", 20), (4, "d", 20)]


def test_delete_no_match_commits_nothing(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="nomatch")
    _seed(spark, tbl, [(1, "a")])
    assert delete_from_delta(spark, tbl, "k = 99") == (1, 0)
    assert not os.path.exists(
        os.path.join(tbl, "_delta_log", f"{2:020d}.json")
    )
    # empty table: nothing to do either
    empty = _mk_foreign(tmp_path, name="empty")
    assert delete_from_delta(spark, empty, "k = 1") == (0, 0)


def test_delete_refusals_are_named(spark, tmp_path):
    df_rows = [(1, "a")]
    # append-only table
    ao = _mk_foreign(
        tmp_path, cfg={"delta.appendOnly": "true"}, name="ao"
    )
    _seed(spark, ao, df_rows)
    with pytest.raises(DeltaProtocolError, match="append-only"):
        delete_from_delta(spark, ao, "k = 1")
    # column mapping without per-field ids (mapped tables WITH ids
    # are writable — see test_delete_column_mapped_round_trip)
    cm = _mk_foreign(
        tmp_path,
        cfg={"delta.columnMapping.mode": "name"},
        name="cm",
    )
    with pytest.raises(
        DeltaProtocolError, match="delta.columnMapping.id"
    ):
        delete_from_delta(spark, cm, "k = 1")
    # unsupported writer feature
    rt = _mk_foreign(
        tmp_path,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["rowTracking"],
        },
        name="rt",
    )
    with pytest.raises(DeltaProtocolError, match="rowTracking"):
        delete_from_delta(spark, rt, "k = 1")


def _mask_row(spark, tbl, version, k_value):
    """Simulate a stock DV delete of the row where k == k_value:
    remove+re-add the file carrying it with an inline DV descriptor
    masking that row's physical index."""
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        inline_dv_descriptor,
    )

    lines = _entry_lines(tbl, version)
    target_add = None
    idx = None
    for ln in lines[1:]:
        if "add" not in ln:
            continue
        f = os.path.join(tbl, ln["add"]["path"])
        # physical order == read order for a single-file scan
        rows = [
            r.k for r in spark.read.parquet(f).select("k").collect()
        ]
        if k_value in rows:
            target_add = ln["add"]
            idx = rows.index(k_value)
            break
    assert target_add is not None
    dv = inline_dv_descriptor([idx])
    new_add = dict(target_add, deletionVector=dv, dataChange=False)
    _log_write(
        tbl,
        version + 1,
        [
            {
                "remove": {
                    "path": target_add["path"],
                    "dataChange": False,
                }
            },
            {"add": new_add},
        ],
    )


def test_delete_applies_existing_deletion_vectors(spark, tmp_path):
    """A live DV on a touched file is APPLIED, not refused: the
    masked row is invisible to the predicate, is never counted, and
    a rewrite never resurrects it."""
    tbl = _mk_foreign(tmp_path, name="dv")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    _mask_row(spark, tbl, 1, 2)  # stock-style DV delete of k=2
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [1, 3]
    ver, n = delete_from_delta(
        spark, tbl, "k = 1", strategy="rewrite"
    )
    assert n == 1
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(3, "c")]  # k=2 stays deleted, k=1 removed
    # a predicate matching ONLY the masked row is a no-op
    assert delete_from_delta(spark, tbl, "k = 2") == (ver, 0)


def test_delete_dv_strategy_round_trip(spark, tmp_path):
    """strategy='dv' (delta-spark's modern shape): no data rewrite —
    the file is re-added with a deletion vector masking the matched
    rows; a second dv delete UNIONS the mask; a delete that empties
    the file's live set becomes a plain remove; the strategy is a
    named refusal without the table features."""
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    tbl = _mk_foreign(tmp_path, protocol=proto, name="dvw")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    data_path = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )
    ver, n = delete_from_delta(spark, tbl, "k = 2", strategy="dv")
    assert n == 1
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert [r["path"] for r in removes] == [data_path]
    assert [a["path"] for a in adds] == [data_path]  # SAME file
    dv = adds[0]["deletionVector"]
    assert dv["storageType"] == "u" and dv["cardinality"] == 1
    assert json.loads(adds[0]["stats"])["tightBounds"] is False
    assert json.loads(adds[0]["stats"])["numRecords"] == 4
    # the DV file exists under the table root
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        dv_file_path,
    )

    assert os.path.isfile(dv_file_path(tbl, dv["pathOrInlineDv"]))
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [1, 3, 4]
    # second dv delete UNIONS the mask (cardinality 2), and the
    # retiring remove names the version's OLD mask
    ver2, n2 = delete_from_delta(spark, tbl, "k = 4", strategy="dv")
    assert n2 == 1
    lines2 = _entry_lines(tbl, ver2)
    rm2 = next(ln["remove"] for ln in lines2[1:] if "remove" in ln)
    assert rm2["deletionVector"]["cardinality"] == 1
    add2 = next(ln["add"] for ln in lines2[1:] if "add" in ln)
    assert add2["deletionVector"]["cardinality"] == 2
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [1, 3]
    # emptying the live set -> plain remove, no re-add
    ver3, n3 = delete_from_delta(spark, tbl, "k >= 1", strategy="dv")
    assert n3 == 2
    lines3 = _entry_lines(tbl, ver3)
    assert not [ln for ln in lines3[1:] if "add" in ln]
    assert read_delta(spark, tbl).count() == 0
    # without the table features the strategy is refused by name
    plain = _mk_foreign(tmp_path, name="dvplain")
    _seed(spark, plain, [(1, "a")])
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        delete_from_delta(spark, plain, "k = 1", strategy="dv")


def test_delete_cdf_writes_change_data(spark, tmp_path):
    """On a live-CDF table the delete materializes its _change_data
    files (cdc actions, _change_type='delete') — and this engine's
    own change-feed reader consumes them exclusively."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableChangeDataFeed": "true"},
        name="cdfw",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    ver, n = delete_from_delta(spark, tbl, "k <= 2")
    assert n == 2
    lines = _entry_lines(tbl, ver)
    cdcs = [ln["cdc"] for ln in lines[1:] if "cdc" in ln]
    assert cdcs and all(
        c["path"].startswith("_change_data/") for c in cdcs
    )
    assert all(c["dataChange"] is False for c in cdcs)
    for c in cdcs:
        assert os.path.isfile(os.path.join(tbl, c["path"]))
    # the engine's own CDF reader surfaces exactly the two deletes
    feed = read_delta_changes(
        spark, tbl, starting_version=ver, ending_version=ver
    )
    got = sorted(
        (r.k, r.v, r._change_type) for r in feed.collect()
    )
    assert got == [(1, "a", "delete"), (2, "b", "delete")]
    assert read_delta(spark, tbl).count() == 1


def test_delete_concurrent_delete_conflict(spark, tmp_path):
    """A racing commit that removes a file this delete also touches
    is Delta's ConcurrentDeleteDelete: named error, never a commit
    built from stale matched counts."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="race")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    victim = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                rival = os.path.join(
                    os.path.dirname(path), f"{2:020d}.json"
                )
                with open(rival, "w") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "remove": {
                                    "path": victim,
                                    "dataChange": True,
                                }
                            }
                        )
                        + "\n"
                    )
            return super().create_exclusive(path, payload)

    with pytest.raises(
        DeltaProtocolError, match="ConcurrentDeleteDelete"
    ):
        delete_from_delta(spark, tbl, "k >= 1", log_store=Racer())


def test_delete_concurrent_append_is_fine(spark, tmp_path):
    """A racing blind APPEND does not conflict (WriteSerializable):
    the delete retries, commits above it, and the appended rows —
    unseen by this predicate — survive."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="aprace")
    _seed(spark, tbl, [(1, "a"), (2, "b")])

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                append_to_delta(
                    spark.createDataFrame(
                        [(9, "a")], "k long, v string"
                    ),
                    tbl,
                )
            return super().create_exclusive(path, payload)

    ver, n = delete_from_delta(
        spark, tbl, "k = 1", log_store=Racer()
    )
    assert (ver, n) == (3, 1)
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(2, "b"), (9, "a")]


def test_delete_ict_monotonic(spark, tmp_path):
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableInCommitTimestamps": "true"},
        name="ict",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    prev = _entry_lines(tbl, 1)[0]["commitInfo"]["inCommitTimestamp"]
    ver, _ = delete_from_delta(spark, tbl, "k = 1")
    ci = _entry_lines(tbl, ver)[0]["commitInfo"]
    assert ci["inCommitTimestamp"] > prev
    assert list(_entry_lines(tbl, ver)[0]) == ["commitInfo"]


def test_delete_then_time_travel(spark, tmp_path):
    """The pre-delete snapshot stays readable at its version — the
    delete is one more commit, not a mutation."""
    tbl = _mk_foreign(tmp_path, name="tt")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    delete_from_delta(spark, tbl, "k = 1")
    assert read_delta(spark, tbl).count() == 1
    old = read_delta(spark, tbl, version=1)
    assert sorted(r.k for r in old.collect()) == [1, 2]


@pytest.mark.parametrize("mode", ["name", "id"])
def test_delete_column_mapped_round_trip(spark, tmp_path, mode):
    """Deletes on column-mapped tables (partitioned by a mapped
    column): the predicate speaks LOGICAL names, the planning scan
    resolves physical ones, rewritten files re-spell physical names
    + field ids, partitionValues stay physical — and the mapped
    reader round-trips."""
    import pyarrow.parquet as pq

    from test_deltaappend import _mk_mapped

    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        append_to_delta,
    )

    tbl = _mk_mapped(tmp_path, mode, f"delmap_{mode}")
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "k long, v string"
    ).coalesce(1)
    append_to_delta(df, tbl)
    ver, n = delete_from_delta(spark, tbl, "k = 1 AND v = 'x'")
    assert n == 1
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    # partial rewrite of the v=x file; v=y untouched
    assert len(removes) == 1 and len(adds) == 1
    assert removes[0]["partitionValues"] == {"col-bbb222": "x"}
    assert adds[0]["partitionValues"] == {"col-bbb222": "x"}
    assert adds[0]["path"].startswith("col-bbb222=x/")
    pf = pq.ParquetFile(os.path.join(tbl, adds[0]["path"]))
    [field] = [f for f in pf.schema_arrow if f.name == "col-aaa111"]
    assert field.metadata[b"PARQUET:field_id"] == b"1"
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(2, "x"), (3, "y")]
    # full-partition delete on the mapped partition column
    ver2, n2 = delete_from_delta(spark, tbl, "v = 'y'")
    assert n2 == 1
    lines2 = _entry_lines(tbl, ver2)
    assert not [ln for ln in lines2[1:] if "add" in ln]
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    ) == [(2, "x")]


def test_delete_survives_concurrent_checkpoint(spark, tmp_path):
    """A stock client's routine CHECKPOINT landing mid-delete is NOT
    a conflict: the revalidated live set replays through the
    checkpoint, whose pyarrow rows pad every absent field with None
    — the conflict check must compare the canonical file identity,
    not raw dicts, or every touched file looks rewritten."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )
    from test_deltaappend import _schema_string

    tbl = _mk_foreign(tmp_path, name="ckrace")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    add1 = next(
        ln["add"] for ln in _entry_lines(tbl, 1)[1:] if "add" in ln
    )
    log_dir = os.path.join(tbl, "_delta_log")

    def write_checkpoint(version):
        map_t = pa.map_(pa.string(), pa.string())
        dv_t = pa.struct(
            [
                ("storageType", pa.string()),
                ("pathOrInlineDv", pa.string()),
                ("offset", pa.int32()),
                ("sizeInBytes", pa.int32()),
                ("cardinality", pa.int64()),
            ]
        )
        add_t = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", map_t),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("tags", map_t),
                ("deletionVector", dv_t),
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
        # the checkpoint pads add1 with tags=None, deletionVector=
        # None, stats as recorded — exactly the None-fill shape
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
                            "modificationTime": add1[
                                "modificationTime"
                            ],
                            "dataChange": True,
                            "tags": None,
                            "deletionVector": None,
                            "stats": add1.get("stats"),
                        },
                        None,
                    ],
                    type=add_t,
                ),
            }
        )
        pq.write_table(
            table,
            os.path.join(
                log_dir, f"{version:020d}.checkpoint.parquet"
            ),
        )
        with open(
            os.path.join(log_dir, "_last_checkpoint"), "w"
        ) as f:
            json.dump({"version": version, "size": 2}, f)

    class CheckpointRacer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                # a no-data rival commit, then its checkpoint
                rival = os.path.join(
                    os.path.dirname(path), f"{2:020d}.json"
                )
                with open(rival, "w") as fh:
                    fh.write(
                        json.dumps(
                            {"commitInfo": {"operation": "OPTIMIZE"}}
                        )
                        + "\n"
                    )
                write_checkpoint(2)
            return super().create_exclusive(path, payload)

    ver, n = delete_from_delta(
        spark, tbl, "k = 1", log_store=CheckpointRacer()
    )
    assert (ver, n) == (3, 1)
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(2, "b")]


def test_delete_dv_readds_spec_fields_from_checkpoint_replay(
    spark, tmp_path
):
    """A DV-strategy delete whose live adds were replayed from a
    stock parquet CHECKPOINT must commit spec-shaped actions: the
    checkpoint row pads the add with ``tags=None``, a
    ``stats_parsed`` struct whose timestamp stats arrive as
    datetime objects (json.dumps cannot take them), and a
    None-filled ``maxRowIndex`` on the DV descriptor. The re-add is
    rebuilt field-by-field and the retiring remove's descriptor is
    cleaned — no foreign keys, no null-filled extras, stock
    round-trip intact."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_deltaappend import _schema_string

    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    tbl = _mk_foreign(tmp_path, protocol=proto, name="ckstats")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    # first dv delete mints a real mask on the file
    ver1, _ = delete_from_delta(spark, tbl, "k = 2", strategy="dv")
    add1 = next(
        ln["add"] for ln in _entry_lines(tbl, ver1)[1:] if "add" in ln
    )
    log_dir = os.path.join(tbl, "_delta_log")

    map_t = pa.map_(pa.string(), pa.string())
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
            ("maxRowIndex", pa.int64()),  # None-filled extra
        ]
    )
    stats_parsed_t = pa.struct(
        [
            ("numRecords", pa.int64()),
            ("minValues", pa.struct([("ts", pa.timestamp("us"))])),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", map_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("tags", map_t),
            ("deletionVector", dv_t),
            ("stats", pa.string()),
            ("stats_parsed", stats_parsed_t),
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
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    dv1 = add1["deletionVector"]
    table = pa.table(
        {
            "protocol": pa.array([proto, None], type=proto_t),
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
                        "deletionVector": {
                            "storageType": dv1["storageType"],
                            "pathOrInlineDv": dv1["pathOrInlineDv"],
                            "offset": dv1.get("offset"),
                            "sizeInBytes": dv1["sizeInBytes"],
                            "cardinality": dv1["cardinality"],
                            "maxRowIndex": None,
                        },
                        "stats": add1.get("stats"),
                        "stats_parsed": {
                            "numRecords": 3,
                            "minValues": {
                                "ts": datetime.datetime(2024, 1, 1)
                            },
                        },
                    },
                    None,
                ],
                type=add_t,
            ),
        }
    )
    pq.write_table(
        table,
        os.path.join(log_dir, f"{ver1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": ver1, "size": 3}, f)

    # second dv delete replays the live set THROUGH the checkpoint
    ver2, n2 = delete_from_delta(spark, tbl, "k = 3", strategy="dv")
    assert n2 == 1
    lines = _entry_lines(tbl, ver2)
    add2 = next(ln["add"] for ln in lines[1:] if "add" in ln)
    rm2 = next(ln["remove"] for ln in lines[1:] if "remove" in ln)
    # re-add: spec fields only, no checkpoint-replay leakage
    assert "stats_parsed" not in add2 and "tags" not in add2
    assert set(add2) <= {
        "path",
        "partitionValues",
        "size",
        "modificationTime",
        "dataChange",
        "stats",
        "deletionVector",
    }
    assert json.loads(add2["stats"])["tightBounds"] is False
    assert add2["deletionVector"]["cardinality"] == 2
    # both descriptors cleaned: no null-filled extras re-serialized
    for desc in (add2["deletionVector"], rm2["deletionVector"]):
        assert all(v is not None for v in desc.values())
    assert "maxRowIndex" not in rm2["deletionVector"]
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == [1]


def test_delete_dv_wide_writes_blobs_executor_side(
    spark, tmp_path, monkeypatch
):
    """A wide dv-strategy delete (every file partially matched) must
    ship only ~150-byte spec DESCRIPTORS to the driver: the packed
    DV storage files are written inside the applyInPandas stage.
    Poisoning the driver-side write/serialize helpers proves no
    blob bytes (or file writes) funnel through the driver — the
    executors' Python workers import dvcodec in their own
    processes, so only a driver-side call can trip the poison. A
    stock-shaped read round-trips every committed mask."""
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    tbl = _mk_foreign(tmp_path, protocol=proto, name="dvwide")
    for i in range(5):
        _seed(
            spark,
            tbl,
            [(10 * i + 1, "a"), (10 * i + 2, "b"), (10 * i + 3, "c")],
        )

    from etl_pipeline_4handling_listings_spark.sources import dvcodec

    def _boom(*a, **k):
        raise AssertionError("DV blob crossed the driver")

    monkeypatch.setattr(dvcodec, "write_dv_blob", _boom)
    monkeypatch.setattr(dvcodec, "serialize_dv", _boom)

    ver, n = delete_from_delta(spark, tbl, "k % 10 = 2", strategy="dv")
    assert n == 5
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert len(adds) == 5
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        dv_file_path,
    )

    for a in adds:
        dv = a["deletionVector"]
        assert dv["storageType"] == "u" and dv["cardinality"] == 1
        assert os.path.isfile(dv_file_path(tbl, dv["pathOrInlineDv"]))
    assert sorted(r.k for r in read_delta(spark, tbl).collect()) == sorted(
        10 * i + j for i in range(5) for j in (1, 3)
    )
