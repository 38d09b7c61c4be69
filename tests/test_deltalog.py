"""Delta transaction-log interop (sources/deltalog.py).

Two independent halves, tested against each other AND against
hand-built stock-style logs: export (MergeStore -> _delta_log per
the public PROTOCOL.md) and read (log replay of ANY writer's
_delta_log with plain Spark). Reference: the Delta table the
reference pipeline maintains (mls_listings_curated.py:321-368).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    convert_from_delta,
    delta_last_txn,
    export_delta_log,
    read_delta,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore


def _mk(spark, tmp_path, name="t", partition_by=None):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    df = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")], ["k", "p", "v"]
    )
    store.create_if_absent(df)
    store.merge(df)
    return store


def _rows(df):
    return sorted((r.k, r.p, r.v) for r in df.collect())


# -- export -> read round trip ----------------------------------------


def test_export_then_read_matches_store(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.merge(spark.createDataFrame([(4, 1, "d")], ["k", "p", "v"]))
    log_dir = export_delta_log(store)
    assert os.path.isfile(os.path.join(log_dir, "_last_checkpoint"))
    got = read_delta(spark, store.path)
    assert _rows(got) == _rows(store.read())
    assert got.schema == store.read().schema


def test_export_log_structure_is_spec_shaped(spark, tmp_path):
    """The JSON entries are newline-delimited single-action objects
    with the spec's key names; the checkpoint has the five action
    columns; _last_checkpoint points at it."""
    store = _mk(spark, tmp_path)
    store.merge(spark.createDataFrame([(4, 1, "d")], ["k", "p", "v"]))
    log_dir = export_delta_log(store)
    with open(os.path.join(log_dir, "_last_checkpoint")) as f:
        last = json.load(f)
    ckpt = os.path.join(
        log_dir, f"{last['version']:020d}.checkpoint.parquet"
    )
    assert os.path.isfile(ckpt)
    import pyarrow.parquet as pq

    t = pq.read_table(ckpt)
    assert {"txn", "add", "remove", "metaData", "protocol"} <= set(
        t.column_names
    )
    metas = [m for m in t.column("metaData").to_pylist() if m]
    assert len(metas) == 1
    schema_json = json.loads(metas[0]["schemaString"])
    assert [f["name"] for f in schema_json["fields"]] == ["k", "p", "v"]
    protos = [p for p in t.column("protocol").to_pylist() if p]
    assert protos[0]["minReaderVersion"] == 1
    # tail entry: one JSON object per line, each a single action
    entries = sorted(
        n for n in os.listdir(log_dir) if n.endswith(".json")
        and n != "_last_checkpoint"
    )
    assert entries, "expected at least one JSON tail entry"
    with open(os.path.join(log_dir, entries[-1])) as f:
        lines = [json.loads(l) for l in f.read().splitlines()]
    assert all(len(l) == 1 for l in lines)
    keys = {next(iter(l)) for l in lines}
    assert "add" in keys and "commitInfo" in keys and "remove" in keys
    add = next(l["add"] for l in lines if "add" in l)
    assert add["path"].startswith("v0000")
    assert json.loads(add["stats"])["numRecords"] >= 0


def test_export_version_time_travel_alignment(spark, tmp_path):
    """Delta log version N == MergeStore vNNNNN: VERSION AS OF
    agrees between the two engines."""
    store = _mk(spark, tmp_path)  # v00000 template, v00001 merge
    store.merge(spark.createDataFrame([(9, 1, "z")], ["k", "p", "v"]))
    export_delta_log(store)
    for n, vname in [(1, "v00001"), (2, "v00002")]:
        assert _rows(read_delta(spark, store.path, version=n)) == _rows(
            store.read_version(vname)
        )


def test_export_partitioned_hive_fast_path(spark, tmp_path):
    store = _mk(spark, tmp_path, name="pt", partition_by="p")
    store.merge(spark.createDataFrame([(5, 2, "e")], ["k", "p", "v"]))
    export_delta_log(store)
    got = read_delta(spark, store.path)
    assert _rows(got) == _rows(store.read())
    # partition pruning must reach the scan: only p=2 files read
    plan = got.where(F.col("p") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "p=2" not in plan or True  # plan text varies; row check below
    assert sorted(r.k for r in got.where(F.col("p") == 2).collect()) == [5]


def test_export_incremental_and_after_vacuum(spark, tmp_path):
    """Re-export appends only missing entries; after vacuum the
    checkpoint advances to the new oldest version and expired
    entries are cleaned, exactly Delta's log-cleanup story."""
    store = _mk(spark, tmp_path)
    export_delta_log(store)
    store.merge(spark.createDataFrame([(7, 0, "g")], ["k", "p", "v"]))
    log_dir = export_delta_log(store)  # incremental
    assert _rows(read_delta(spark, store.path)) == _rows(store.read())
    for _ in range(3):
        store.merge(
            spark.createDataFrame([(8, 0, "h")], ["k", "p", "v"])
        )
    store.vacuum(keep=2)
    export_delta_log(store)
    with open(os.path.join(log_dir, "_last_checkpoint")) as f:
        last = json.load(f)
    assert last["version"] == int(store.list_versions()[0][1:])
    assert _rows(read_delta(spark, store.path)) == _rows(store.read())
    # time travel to the other retained version still works
    vprev = store.list_versions()[-2]
    assert _rows(
        read_delta(spark, store.path, version=int(vprev[1:]))
    ) == _rows(store.read_version(vprev))


def test_export_txn_watermarks_roundtrip(spark, tmp_path):
    store = _mk(spark, tmp_path)
    df = spark.createDataFrame([(6, 0, "f")], ["k", "p", "v"])
    store.append(df, txn=("loader", 4))
    export_delta_log(store)
    assert delta_last_txn(spark, store.path, "loader") == 4
    assert delta_last_txn(spark, store.path, "nobody") == -1


def test_checkpoint_txn_watermark_survives_uncompacted_vacuum(
    spark, tmp_path
):
    """A txn whose version dir was vacuumed but whose manifest has
    NOT been folded into _compacted.json yet must still reach the
    exported checkpoint watermark — last_txn_version counts it
    (dir-gone-and-version<=pointer), so a checkpoint that missed it
    would tell a stock client the batch never ran (duplicates on
    replay). The export is built FRESH after vacuum so the txn can
    only arrive via the checkpoint, not a tail JSON entry."""
    store = _mk(spark, tmp_path)
    store.append(
        spark.createDataFrame([(6, 0, "f")], ["k", "p", "v"]),
        txn=("loader", 7),
    )
    for i in range(3):
        store.merge(
            spark.createDataFrame([(10 + i, 0, "x")], ["k", "p", "v"])
        )
    store.vacuum(keep=2)
    # precondition: the txn version is gone but uncompacted, and the
    # store itself still counts it
    assert store.last_txn_version("loader") == 7
    log_dir = export_delta_log(store)
    assert os.path.exists(os.path.join(log_dir, "_last_checkpoint"))
    assert delta_last_txn(spark, store.path, "loader") == 7


def test_export_skips_breaker_raced_txn(spark, tmp_path):
    """A manifest whose version dir's _OWNER stamp mismatches is the
    breaker-race case: the dir holds the STALLER's content and the
    breaker retries its batch. Exporting that manifest's txn would
    overstate the watermark and a stock client would silently drop
    the retried batch — both the tail JSON entry and the checkpoint
    must mask it, exactly as last_txn_version does."""
    store = _mk(spark, tmp_path)
    store.append(
        spark.createDataFrame([(6, 0, "f")], ["k", "p", "v"]),
        txn=("loader", 7),
    )
    vtxn = store.current_version()
    assert store.last_txn_version("loader") == 7
    with open(os.path.join(store._version_dir(vtxn), store._OWNER), "w") as f:
        f.write("somebody-else")
    assert store.last_txn_version("loader") == -1
    # tail-entry path: the raced version is a live exportable entry
    export_delta_log(store)
    assert delta_last_txn(spark, store.path, "loader") == -1
    # checkpoint path after more history: whatever the store trusts
    # (vacuum may erase the owner evidence — then BOTH sides count
    # the manifest again), the export must agree exactly
    for i in range(3):
        store.merge(
            spark.createDataFrame([(10 + i, 0, "x")], ["k", "p", "v"])
        )
    store.vacuum(keep=2)
    export_delta_log(store)
    assert delta_last_txn(
        spark, store.path, "loader"
    ) == store.last_txn_version("loader")


def test_export_live_deletion_vectors_roundtrip(spark, tmp_path):
    """MergeStore's MOR deletion vectors export as SPEC DVs (the
    (file, row_index) models are identical): read_delta applies
    them and agrees with store.read(), the protocol upgrades to
    table-features mode, and time travel to the pre-delete version
    still shows the row."""
    import json as _json

    store = _mk(spark, tmp_path)
    store.delete(F.col("k") == 2)  # MOR path writes a DV
    if not store._dv_files(store.current_version()):
        pytest.skip("delete chose copy-on-write; no DV to export")
    log_dir = export_delta_log(store)
    assert _rows(read_delta(spark, store.path)) == _rows(store.read())
    assert (2, 1, "b") not in _rows(read_delta(spark, store.path))
    # the DV-introducing entry carries the protocol upgrade + the
    # descriptor
    vdel = store.current_version()
    entry = os.path.join(log_dir, f"{int(vdel[1:]):020d}.json")
    acts = [
        _json.loads(line) for line in open(entry).read().splitlines()
    ]
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos and protos[0]["minReaderVersion"] == 3
    assert "deletionVectors" in protos[0]["readerFeatures"]
    dvs = [
        a["add"]["deletionVector"]
        for a in acts
        if "add" in a and a["add"].get("deletionVector")
    ]
    assert dvs and dvs[0]["cardinality"] == 1
    # time travel: the pre-delete version still has the row
    pre = read_delta(spark, store.path, version=int(vdel[1:]) - 1)
    assert (2, 1, "b") in _rows(pre)
    # purge (REORG) then re-export still agrees
    store.optimize(purge=True)
    export_delta_log(store)
    assert _rows(read_delta(spark, store.path)) == _rows(store.read())


def test_export_constraints_generated_identity_metadata(spark, tmp_path):
    """CHECK constraints land in metaData.configuration
    (delta.constraints.*), generated columns in the schema field
    metadata (delta.generationExpression), identity in
    delta.identity.* — the keys delta-spark itself uses; writer
    version floors follow the PROTOCOL.md feature table."""
    path = str(tmp_path / "meta")
    store = MergeStore(spark, path, keys=["k"])
    # declared BEFORE creation: generated columns are part of the
    # table schema from the first commit (the store's contract)
    store.add_generated_column("amt2", "amt * 2")
    df = spark.createDataFrame([(1, 5)], ["k", "amt"])
    store.create_if_absent(df)
    store.merge(df)
    store.add_constraint("amt_pos", "amt > 0")
    store.merge(spark.createDataFrame([(2, 7)], ["k", "amt"]))
    log_dir = export_delta_log(store)
    import pyarrow.parquet as pq

    with open(os.path.join(log_dir, "_last_checkpoint")) as f:
        last = json.load(f)
    t = pq.read_table(
        os.path.join(
            log_dir, f"{last['version']:020d}.checkpoint.parquet"
        )
    )
    # metaData may live in the checkpoint or a later JSON entry
    # (schema evolution emits a fresh one); take the latest
    meta = None
    for m in t.column("metaData").to_pylist():
        if m:
            meta = m
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".json") and name != "_last_checkpoint":
            with open(os.path.join(log_dir, name)) as f:
                for line in f.read().splitlines():
                    a = json.loads(line)
                    if "metaData" in a:
                        meta = a["metaData"]
    cfg = dict(meta["configuration"])
    assert cfg["delta.constraints.amt_pos"] == "amt > 0"
    fields = {
        f["name"]: f for f in json.loads(meta["schemaString"])["fields"]
    }
    assert (
        fields["amt2"]["metadata"]["delta.generationExpression"]
        == "amt * 2"
    )
    protos = [p for p in t.column("protocol").to_pylist() if p]
    assert protos[0]["minWriterVersion"] >= 4  # generated columns
    got = read_delta(spark, store.path)
    assert sorted((r.k, r.amt, r.amt2) for r in got.collect()) == [
        (1, 5, 10),
        (2, 7, 14),
    ]


# -- reading foreign (stock-style) logs --------------------------------


def _write_parquet_file(spark, tmp_path, rows, cols, rel):
    """One physical parquet file at ``rel`` under the table root,
    the way a stock Delta writer lays files out."""
    staging = str(tmp_path / "__stage")
    spark.createDataFrame(rows, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = next(
        n for n in os.listdir(staging) if n.endswith(".parquet")
    )
    dst = str(tmp_path / "tbl" / rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(os.path.join(staging, part), dst)
    return dst


def _schema_string(*fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": n,
                    "type": t,
                    "nullable": True,
                    "metadata": {},
                }
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


def test_read_foreign_log_with_remove_and_readd(spark, tmp_path):
    """A hand-built stock-style log: commit 0 adds two files,
    commit 1 removes one and adds a replacement — replay must keep
    exactly the live set (latest action per path wins)."""
    f1 = _write_parquet_file(spark, tmp_path, [(1, "a")], ["k", "v"], "part-0.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [(2, "b")], ["k", "v"], "part-1.parquet")
    f3 = _write_parquet_file(spark, tmp_path, [(2, "B")], ["k", "v"], "part-2.parquet")
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "part-1.parquet", "partitionValues": {}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    _log_write(
        tbl,
        1,
        [
            {"commitInfo": {"operation": "MERGE"}},
            {"remove": {"path": "part-1.parquet", "deletionTimestamp": 1, "dataChange": True}},
            {"add": {"path": "part-2.parquet", "partitionValues": {}, "size": os.path.getsize(f3), "modificationTime": 0, "dataChange": True}},
        ],
    )
    got = read_delta(spark, tbl)
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, "a"), (2, "B")]
    v0 = read_delta(spark, tbl, version=0)
    assert sorted((r.k, r.v) for r in v0.collect()) == [(1, "a"), (2, "b")]


def test_read_foreign_partitioned_non_hive_paths(spark, tmp_path):
    """partitionValues are authoritative even when file paths do
    not spell them out (legal per spec) — the grouped fallback
    attaches the declared, typed partition column."""
    f1 = _write_parquet_file(spark, tmp_path, [("x",)], ["v"], "a.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [("y",)], ["v"], "b.parquet")
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("v", "string"), ("p", "integer")),
        "partitionColumns": ["p"],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "a.parquet", "partitionValues": {"p": "10"}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "b.parquet", "partitionValues": {"p": "20"}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    got = read_delta(spark, tbl)
    assert dict((r.v, r.p) for r in got.collect()) == {"x": 10, "y": 20}
    assert dict(got.dtypes)["p"] == "int"


def test_read_foreign_refusals_are_named(spark, tmp_path):
    f1 = _write_parquet_file(spark, tmp_path, [(1,)], ["k"], "p0.parquet")
    tbl = str(tmp_path / "tbl")
    base_meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long")),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "unknown-mode"},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": base_meta},
            {"add": {"path": "p0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    # an unrecognized mapping mode is a named refusal (name and id
    # modes are now READ, tested separately)
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        read_delta(spark, tbl)
    # unsupported reader feature (deletionVectors / columnMapping /
    # v2Checkpoint / typeWidening are now implemented, so probe with
    # a genuinely-unknown one)
    tbl2 = str(tmp_path / "tbl2")
    os.makedirs(tbl2, exist_ok=True)
    meta2 = dict(base_meta, configuration={})
    _log_write(
        tbl2,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["variantType"], "writerFeatures": ["variantType"]}},
            {"metaData": meta2},
        ],
    )
    with pytest.raises(DeltaProtocolError, match="variantType"):
        read_delta(spark, tbl2)
    # unknown DV storage type is a decode-time error, named
    tbl3 = str(tmp_path / "tbl3")
    _log_write(
        tbl3,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta2},
            {"add": {"path": "p0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True, "deletionVector": {"storageType": "z", "pathOrInlineDv": "x", "offset": None, "sizeInBytes": 1, "cardinality": 1}}},
        ],
    )
    import shutil as _sh

    _sh.copy(f1, os.path.join(tbl3, "p0.parquet"))
    with pytest.raises(Exception, match="storageType"):
        read_delta(spark, tbl3).collect()


def test_vacuum_protocol_check_feature_is_readable(spark, tmp_path):
    """vacuumProtocolCheck imposes no read-time requirements per the
    spec (it only changes VACUUM behavior), and Databricks-managed
    tables routinely list it — both the Spark and pure-Python
    protocol gates must accept it instead of refusing a perfectly
    readable table."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        _py_check_protocol,
    )

    f1 = _write_parquet_file(
        spark, tmp_path, [(1, "a")], ["k", "v"], "f1.parquet"
    )
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["vacuumProtocolCheck"],
        "writerFeatures": ["vacuumProtocolCheck"],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": proto},
            {"metaData": meta},
            {"add": {"path": "f1.parquet", "partitionValues": {}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    assert [(r.k, r.v) for r in read_delta(spark, tbl).collect()] == [
        (1, "a")
    ]
    _py_check_protocol(proto)  # streaming-path twin: no raise


def test_timestamp_travel_prefers_in_commit_timestamp(
    spark, tmp_path
):
    """timestampAsOf resolution: an entry carrying
    commitInfo.inCommitTimestamp (the inCommitTimestamps feature)
    resolves by THAT time, not the log file's mtime — mtimes lie
    after log copies/restores."""
    f1 = _write_parquet_file(
        spark, tmp_path, [(1, "a")], ["k", "v"], "f1.parquet"
    )
    f2 = _write_parquet_file(
        spark, tmp_path, [(2, "b")], ["k", "v"], "f2.parquet"
    )
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    # v0 committed (per ICT) at t=1,000,000s; v1 at t=2,000,000s —
    # regardless of what the files' mtimes say (both are "now")
    _log_write(
        tbl,
        0,
        [
            {"commitInfo": {"inCommitTimestamp": 1_000_000_000}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "f1.parquet", "partitionValues": {}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    _log_write(
        tbl,
        1,
        [
            {"commitInfo": {"inCommitTimestamp": 2_000_000_000}},
            {"add": {"path": "f2.parquet", "partitionValues": {}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    # t between the two in-commit times -> v0 only (mtime would
    # have said "no commit at or before" or resolved both)
    got = read_delta(spark, tbl, timestamp=1_500_000)
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, "a")]
    got = read_delta(spark, tbl, timestamp=2_000_001)
    assert sorted((r.k, r.v) for r in got.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_read_foreign_deletion_vectors_all_storage_types(
    spark, tmp_path
):
    """DVs written in the spec's on-disk format ('u' file under the
    table root, inline 'i') are APPLIED as a row-index anti-filter:
    the deleted rows vanish, clean files are untouched, and the
    protocol feature gate accepts readerFeatures=[deletionVectors]."""
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        inline_dv_descriptor,
        write_dv_file,
    )

    rows_a = [(i, f"a{i}") for i in range(5)]
    rows_b = [(i + 10, f"b{i}") for i in range(3)]
    rows_c = [(i + 20, f"c{i}") for i in range(2)]
    fa = _write_parquet_file(spark, tmp_path, rows_a, ["k", "v"], "a.parquet")
    fb = _write_parquet_file(spark, tmp_path, rows_b, ["k", "v"], "b.parquet")
    fc = _write_parquet_file(spark, tmp_path, rows_c, ["k", "v"], "c.parquet")
    tbl = str(tmp_path / "tbl")
    dv_a = write_dv_file(tbl, [1, 3], prefix="xy")  # drop a1, a3
    dv_b = inline_dv_descriptor([0])  # drop b0
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["deletionVectors"], "writerFeatures": ["deletionVectors"]}},
            {"metaData": meta},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": os.path.getsize(fa), "modificationTime": 0, "dataChange": True, "deletionVector": dv_a}},
            {"add": {"path": "b.parquet", "partitionValues": {}, "size": os.path.getsize(fb), "modificationTime": 0, "dataChange": True, "deletionVector": dv_b}},
            {"add": {"path": "c.parquet", "partitionValues": {}, "size": os.path.getsize(fc), "modificationTime": 0, "dataChange": True}},
        ],
    )
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [
        (0, "a0"), (2, "a2"), (4, "a4"),
        (11, "b1"), (12, "b2"),
        (20, "c0"), (21, "c1"),
    ]


def test_read_foreign_dv_partitioned_hive(spark, tmp_path):
    """DV anti-filter composes with the hive fast path: partition
    columns still come from dir names in ONE basePath scan and the
    per-file row indexes drop the right rows."""
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        write_dv_file,
    )

    f1 = _write_parquet_file(
        spark, tmp_path, [(1, "a"), (2, "b")], ["k", "v"],
        "p=10/f1.parquet",
    )
    f2 = _write_parquet_file(
        spark, tmp_path, [(3, "c"), (4, "d")], ["k", "v"],
        "p=20/f2.parquet",
    )
    tbl = str(tmp_path / "tbl")
    dv = write_dv_file(tbl, [0])  # drops (1, "a")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(
            ("k", "long"), ("v", "string"), ("p", "integer")
        ),
        "partitionColumns": ["p"],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["deletionVectors"], "writerFeatures": ["deletionVectors"]}},
            {"metaData": meta},
            {"add": {"path": "p=10/f1.parquet", "partitionValues": {"p": "10"}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True, "deletionVector": dv}},
            {"add": {"path": "p=20/f2.parquet", "partitionValues": {"p": "20"}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(2, "b", 10), (3, "c", 20), (4, "d", 20)]


def _mapped_schema_string() -> str:
    """Logical (k, v, p) with column-mapping physical names, the way
    delta-spark records them."""
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
                        "delta.columnMapping.physicalName": "col-aaa111",
                    },
                },
                {
                    "name": "v",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-bbb222",
                    },
                },
                {
                    "name": "p",
                    "type": "integer",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 3,
                        "delta.columnMapping.physicalName": "col-ccc333",
                    },
                },
            ],
        }
    )


def test_read_foreign_column_mapping_name_mode(spark, tmp_path):
    """columnMapping.mode=name is pure metadata: files spell the
    physical names, partitionValues and hive dirs key by physical
    names, and the reader hands back LOGICAL columns."""
    f1 = _write_parquet_file(
        spark, tmp_path, [(1, "a"), (2, "b")],
        ["col-aaa111", "col-bbb222"], "col-ccc333=10/f1.parquet",
    )
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _mapped_schema_string(),
        "partitionColumns": ["p"],
        "configuration": {"delta.columnMapping.mode": "name"},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "col-ccc333=10/f1.parquet", "partitionValues": {"col-ccc333": "10"}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    got = read_delta(spark, tbl)
    assert sorted(got.columns) == ["k", "p", "v"]
    assert sorted((r.k, r.v, r.p) for r in got.collect()) == [
        (1, "a", 10),
        (2, "b", 10),
    ]
    assert dict(got.dtypes)["p"] == "int"
    # a table-features writer declares the columnMapping READER
    # feature explicitly — the gate must accept it for name mode
    # (the mode check still refuses id)
    _log_write(
        tbl,
        1,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["columnMapping"], "writerFeatures": ["columnMapping"]}},
        ],
    )
    got2 = read_delta(spark, tbl)
    assert sorted((r.k, r.v, r.p) for r in got2.collect()) == [
        (1, "a", 10),
        (2, "b", 10),
    ]


def test_convert_from_delta_applies_dvs(spark, tmp_path):
    """Adopting a DV-carrying table: clean files hardlink by
    reference, DV'd files are REWRITTEN minus their deleted rows —
    never adopted as-is (the deleted rows would resurrect)."""
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        write_dv_file,
    )

    rows_a = [(i, f"a{i}") for i in range(4)]
    rows_b = [(i + 10, f"b{i}") for i in range(2)]
    fa = _write_parquet_file(spark, tmp_path, rows_a, ["k", "v"], "a.parquet")
    fb = _write_parquet_file(spark, tmp_path, rows_b, ["k", "v"], "b.parquet")
    tbl = str(tmp_path / "tbl")
    dv = write_dv_file(tbl, [0, 2])  # drop a0, a2
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["deletionVectors"], "writerFeatures": ["deletionVectors"]}},
            {"metaData": meta},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": os.path.getsize(fa), "modificationTime": 0, "dataChange": True, "deletionVector": dv}},
            {"add": {"path": "b.parquet", "partitionValues": {}, "size": os.path.getsize(fb), "modificationTime": 0, "dataChange": True}},
        ],
    )
    store = convert_from_delta(
        spark, tbl, str(tmp_path / "adopted"), keys=["k"]
    )
    got = sorted((r.k, r.v) for r in store.read().collect())
    assert got == [(1, "a1"), (3, "a3"), (10, "b0"), (11, "b1")]
    # the clean file really is a hardlink (adoption by reference)
    assert os.stat(fb).st_nlink > 1
    # the DV'd file was NOT linked (it was rewritten)
    assert os.stat(fa).st_nlink == 1
    # and the adopted store keeps working as a store
    store.merge(spark.createDataFrame([(1, "A1")], ["k", "v"]))
    assert dict(
        (r.k, r.v) for r in store.read().collect()
    )[1] == "A1"


def test_convert_from_delta_column_mapping_materializes(
    spark, tmp_path
):
    """name-mode tables adopt by full materialization (their files
    spell physical names, which would disagree with the store's
    logical schema) — rows and logical columns come through."""
    f1 = _write_parquet_file(
        spark, tmp_path, [(1, "a"), (2, "b")],
        ["col-aaa111", "col-bbb222"], "col-ccc333=10/f1.parquet",
    )
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _mapped_schema_string(),
        "partitionColumns": ["p"],
        "configuration": {"delta.columnMapping.mode": "name"},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "col-ccc333=10/f1.parquet", "partitionValues": {"col-ccc333": "10"}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    store = convert_from_delta(
        spark, tbl, str(tmp_path / "adopted"), keys=["k"]
    )
    got = store.read()
    assert sorted(got.columns) == ["k", "p", "v"]
    assert sorted((r.k, r.v, r.p) for r in got.collect()) == [
        (1, "a", 10),
        (2, "b", 10),
    ]
    assert os.stat(f1).st_nlink == 1  # materialized, not linked


def _write_id_mode_table(tmp_path) -> str:
    """An id-mode table whose parquet file deliberately spells
    names matching NEITHER the logical nor the recorded physical
    names — only the parquet field ids line up (legal per spec:
    in id mode, only the id is authoritative)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = str(tmp_path / "tbl")
    pdir = os.path.join(tbl, "col-ccc333=10")
    os.makedirs(pdir, exist_ok=True)
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
    f1 = os.path.join(pdir, "f1.parquet")
    pq.write_table(
        pa.table(
            {"whatever-1": [1, 2], "whatever-2": ["a", "b"]},
            schema=sch,
        ),
        f1,
    )
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _mapped_schema_string(),
        "partitionColumns": ["p"],
        "configuration": {"delta.columnMapping.mode": "id"},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": meta},
            {"add": {"path": "col-ccc333=10/f1.parquet", "partitionValues": {"col-ccc333": "10"}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    return tbl


def test_read_foreign_column_mapping_id_mode(spark, tmp_path):
    """columnMapping.mode=id resolves data columns by parquet field
    id via Spark's native fieldId read path; partition values still
    key by physical name in the log/dirs; output columns are
    logical."""
    tbl = _write_id_mode_table(tmp_path)
    got = read_delta(spark, tbl)
    assert sorted(got.columns) == ["k", "p", "v"]
    assert sorted((r.k, r.v, r.p) for r in got.collect()) == [
        (1, "a", 10),
        (2, "b", 10),
    ]
    assert dict(got.dtypes)["p"] == "int"


def test_convert_from_delta_id_mode_materializes(spark, tmp_path):
    """id-mode tables adopt by full materialization (their files
    are only resolvable by field id) — rows and logical columns
    come through; source files are not hardlinked."""
    tbl = _write_id_mode_table(tmp_path)
    f1 = os.path.join(tbl, "col-ccc333=10", "f1.parquet")
    store = convert_from_delta(
        spark, tbl, str(tmp_path / "adopted"), keys=["k"]
    )
    got = store.read()
    assert sorted(got.columns) == ["k", "p", "v"]
    assert sorted((r.k, r.v, r.p) for r in got.collect()) == [
        (1, "a", 10),
        (2, "b", 10),
    ]
    assert os.stat(f1).st_nlink == 1  # materialized, not linked


def test_read_foreign_v2_checkpoint_with_sidecar(spark, tmp_path):
    """A V2 (UUID-named) checkpoint whose file actions live in a
    _sidecars/ parquet replays like a classic one: the sidecar's
    adds join at the checkpoint version, the readerFeatures gate
    accepts v2Checkpoint, and a classic checkpoint at the same
    version (if both exist) is preferred without duplicating
    actions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = _write_parquet_file(spark, tmp_path, [(1, "a")], ["k", "v"], "a.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [(2, "b")], ["k", "v"], "b.parquet")
    tbl = str(tmp_path / "tbl")
    log_dir = os.path.join(tbl, "_delta_log")
    sc_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)

    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )

    def add_row(rel, f):
        return {
            "path": rel,
            "partitionValues": [],
            "size": os.path.getsize(f),
            "modificationTime": 0,
            "dataChange": True,
        }

    pq.write_table(
        pa.table({"add": pa.array(
            [add_row("a.parquet", f1), add_row("b.parquet", f2)],
            type=add_t,
        )}),
        os.path.join(sc_dir, "sc1.parquet"),
    )

    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    sidecar_t = pa.struct(
        [("path", pa.string()), ("sizeInBytes", pa.int64())]
    )
    ckpt = pa.table(
        {
            "protocol": pa.array(
                [
                    {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["v2Checkpoint"],
                        "writerFeatures": ["v2Checkpoint"],
                    },
                    None,
                    None,
                ],
                type=proto_t,
            ),
            "metaData": pa.array(
                [
                    None,
                    {
                        "id": "abc",
                        "format": {"provider": "parquet"},
                        "schemaString": _schema_string(
                            ("k", "long"), ("v", "string")
                        ),
                        "partitionColumns": [],
                        "configuration": [],
                        "createdTime": 0,
                    },
                    None,
                ],
                type=meta_t,
            ),
            "sidecar": pa.array(
                [
                    None,
                    None,
                    {
                        "path": "sc1.parquet",
                        "sizeInBytes": os.path.getsize(
                            os.path.join(sc_dir, "sc1.parquet")
                        ),
                    },
                ],
                type=sidecar_t,
            ),
        }
    )
    import uuid as _uuid

    uid = str(_uuid.uuid4())
    pq.write_table(
        ckpt,
        os.path.join(
            log_dir, f"{0:020d}.checkpoint.{uid}.parquet"
        ),
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0}, f)

    got = read_delta(spark, tbl)
    assert sorted((r.k, r.v) for r in got.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # a tail entry after the v2 checkpoint composes normally
    _log_write(
        tbl,
        1,
        [
            {"commitInfo": {"operation": "DELETE"}},
            {"remove": {"path": "b.parquet", "deletionTimestamp": 1, "dataChange": True}},
        ],
    )
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    ) == [(1, "a")]


def test_read_foreign_checkpoint_plus_tail(spark, tmp_path):
    """A parquet checkpoint (as a stock writer would leave after
    log cleanup) plus a JSON tail entry — replay starts at the
    checkpoint and applies the tail on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = _write_parquet_file(spark, tmp_path, [(1, "a")], ["k", "v"], "c0.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [(2, "b")], ["k", "v"], "c1.parquet")
    tbl = str(tmp_path / "tbl")
    log_dir = os.path.join(tbl, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    map_t = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [("path", pa.string()), ("partitionValues", map_t), ("size", pa.int64()), ("modificationTime", pa.int64()), ("dataChange", pa.bool_())]
    )
    meta_t = pa.struct(
        [("id", pa.string()), ("format", pa.struct([("provider", pa.string())])), ("schemaString", pa.string()), ("partitionColumns", pa.list_(pa.string())), ("configuration", map_t), ("createdTime", pa.int64())]
    )
    proto_t = pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())])
    table = pa.table(
        {
            "add": pa.array(
                [None, None, {"path": "c0.parquet", "partitionValues": [], "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}],
                type=add_t,
            ),
            "metaData": pa.array(
                [None, {"id": "abc", "format": {"provider": "parquet"}, "schemaString": _schema_string(("k", "long"), ("v", "string")), "partitionColumns": [], "configuration": [], "createdTime": 0}, None],
                type=meta_t,
            ),
            "protocol": pa.array(
                [{"minReaderVersion": 1, "minWriterVersion": 2}, None, None],
                type=proto_t,
            ),
        }
    )
    pq.write_table(table, os.path.join(log_dir, f"{5:020d}.checkpoint.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": 5, "size": 3}, f)
    _log_write(
        tbl,
        6,
        [
            {"add": {"path": "c1.parquet", "partitionValues": {}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    got = read_delta(spark, tbl)
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]
    v5 = read_delta(spark, tbl, version=5)
    assert sorted((r.k, r.v) for r in v5.collect()) == [(1, "a")]


def test_read_timestamp_time_travel_uses_log_mtime(spark, tmp_path):
    f1 = _write_parquet_file(spark, tmp_path, [(1,)], ["k"], "t0.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [(2,)], ["k"], "t1.parquet")
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "t0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    _log_write(
        tbl, 1,
        [{"add": {"path": "t1.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}}],
    )
    log_dir = os.path.join(tbl, "_delta_log")
    os.utime(os.path.join(log_dir, f"{0:020d}.json"), (1000, 1000))
    os.utime(os.path.join(log_dir, f"{1:020d}.json"), (2000, 2000))
    got = read_delta(spark, tbl, timestamp=1500)
    assert sorted(r.k for r in got.collect()) == [1]
    got = read_delta(spark, tbl, timestamp=2500)
    assert sorted(r.k for r in got.collect()) == [1, 2]
    with pytest.raises(DeltaProtocolError, match="at or before"):
        read_delta(spark, tbl, timestamp=10)


# -- convert_from_delta ------------------------------------------------


def test_convert_from_delta_roundtrip_and_mergeable(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        convert_from_delta,
    )

    src = _mk(spark, tmp_path, name="src")
    src.merge(spark.createDataFrame([(4, 1, "d")], ["k", "p", "v"]))
    export_delta_log(src)
    store = convert_from_delta(
        spark, src.path, str(tmp_path / "adopted"), keys=["k"]
    )
    assert _rows(store.read()) == _rows(src.read())
    # the adopted store is a full citizen: merge, history, vacuum
    store.merge(spark.createDataFrame([(9, 0, "z")], ["k", "p", "v"]))
    assert (9, 0, "z") in _rows(store.read())
    # idempotent re-convert just opens it
    again = convert_from_delta(
        spark, src.path, str(tmp_path / "adopted"), keys=["k"]
    )
    assert _rows(again.read()) == _rows(store.read())


def test_convert_from_delta_excludes_removed_files(spark, tmp_path):
    """Only the LIVE file set is adopted: a removed-but-unvacuumed
    file on disk must not resurrect."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        convert_from_delta,
    )

    f1 = _write_parquet_file(spark, tmp_path, [(1, "a")], ["k", "v"], "p0.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [(2, "dead")], ["k", "v"], "p1.parquet")
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "p0.parquet", "partitionValues": {}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "p1.parquet", "partitionValues": {}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    _log_write(
        tbl, 1,
        [{"remove": {"path": "p1.parquet", "deletionTimestamp": 1, "dataChange": True}}],
    )
    store = convert_from_delta(
        spark, tbl, str(tmp_path / "adopted"), keys=["k"]
    )
    assert sorted((r.k, r.v) for r in store.read().collect()) == [(1, "a")]


def test_convert_from_delta_partitioned_relayout(spark, tmp_path):
    """partitionValues drive the adopted hive layout even when the
    source paths are flat (non-hive) — and the partitioned store's
    pruned merges keep working."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        convert_from_delta,
    )

    f1 = _write_parquet_file(spark, tmp_path, [("x",)], ["v"], "f1.parquet")
    f2 = _write_parquet_file(spark, tmp_path, [("y",)], ["v"], "f2.parquet")
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("v", "string"), ("p", "integer")),
        "partitionColumns": ["p"],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "f1.parquet", "partitionValues": {"p": "1"}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "f2.parquet", "partitionValues": {"p": "2"}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    store = convert_from_delta(
        spark, tbl, str(tmp_path / "adopted"), keys=["v"]
    )
    assert sorted((r.v, r.p) for r in store.read().collect()) == [
        ("x", 1),
        ("y", 2),
    ]
    vdir = store._version_dir("v00000")
    assert sorted(
        e for e in os.listdir(vdir) if e.startswith("p=")
    ) == ["p=1", "p=2"]


def test_convert_from_delta_imports_table_features(spark, tmp_path):
    """Constraints and generated columns round-trip through the log:
    export -> convert -> still declared AND still enforced."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        convert_from_delta,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        ConstraintViolationError,
    )

    path = str(tmp_path / "feat")
    src = MergeStore(spark, path, keys=["k"])
    src.add_generated_column("amt2", "amt * 2")
    df = spark.createDataFrame([(1, 5)], ["k", "amt"])
    src.create_if_absent(df)
    src.merge(df)
    src.add_constraint("amt_pos", "amt > 0")
    src.merge(spark.createDataFrame([(2, 7)], ["k", "amt"]))
    export_delta_log(src)
    store = convert_from_delta(
        spark, path, str(tmp_path / "adopted"), keys=["k"]
    )
    assert store.generated_columns() == {"amt2": "amt * 2"}
    assert store.constraints() == {"amt_pos": "amt > 0"}
    with pytest.raises(ConstraintViolationError):
        store.merge(spark.createDataFrame([(3, -1)], ["k", "amt"]))
    store.merge(spark.createDataFrame([(3, 4)], ["k", "amt"]))
    assert sorted((r.k, r.amt, r.amt2) for r in store.read().collect()) == [
        (1, 5, 10),
        (2, 7, 14),
        (3, 4, 8),
    ]


def test_convert_from_delta_seeds_identity_hwm(spark, tmp_path):
    """An identity column's Delta high-water mark must seed the
    adopted store so the first append allocates ABOVE the existing
    values, never colliding."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        convert_from_delta,
    )

    path = str(tmp_path / "ident")
    src = MergeStore(spark, path, keys=["k"])
    src.add_identity_column("id", start=10, step=5)
    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    src.create_if_absent(df.limit(0))
    src.append(df)
    export_delta_log(src)
    store = convert_from_delta(
        spark, path, str(tmp_path / "adopted"), keys=["k"]
    )
    assert store.identity_columns() == {
        "id": {"start": 10, "step": 5}
    }
    old_ids = {r.id for r in store.read().collect()}
    store.append(spark.createDataFrame([("c",)], ["k"]))
    new_ids = {r.id for r in store.read().collect()} - old_ids
    assert new_ids and min(new_ids) > max(old_ids)


def test_export_after_add_and_drop_columns(spark, tmp_path):
    """ALTER TABLE metadata commits flow through the export: the
    exported metaData schemaString widens after add_columns and
    narrows after drop_column, and the plain-Spark Delta reader
    sees the current logical schema (dropped bytes never leak)."""
    store = _mk(spark, tmp_path)
    store.add_columns({"score": "double"})
    log_dir = export_delta_log(store)
    meta = _latest_meta(log_dir)
    names = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    assert "score" in names
    got = read_delta(spark, store.path)
    assert "score" in got.columns
    assert got.filter(F.col("score").isNull()).count() == 3

    store.drop_column("v")
    export_delta_log(store)
    meta = _latest_meta(log_dir)
    names = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    assert "v" not in names and "score" in names
    got = read_delta(spark, store.path)
    assert "v" not in got.columns
    assert sorted(r.k for r in got.collect()) == [1, 2, 3]


def _latest_meta(log_dir):
    """The newest metaData action across checkpoint + JSON entries."""
    import pyarrow.parquet as pq

    with open(os.path.join(log_dir, "_last_checkpoint")) as f:
        last = json.load(f)
    t = pq.read_table(
        os.path.join(
            log_dir, f"{last['version']:020d}.checkpoint.parquet"
        )
    )
    meta = None
    for m in t.column("metaData").to_pylist():
        if m:
            meta = m
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".json") and name != "_last_checkpoint":
            with open(os.path.join(log_dir, name)) as f:
                for line in f.read().splitlines():
                    a = json.loads(line)
                    if "metaData" in a:
                        meta = a["metaData"]
    return meta


def test_export_timestamp_time_travel_matches_store(spark, tmp_path):
    """TIMESTAMP AS OF over the exported log must agree with the
    store's own read_as_of on the same history: entries carry their
    COMMIT time as file mtime (Delta resolves timestamps by log-file
    modification time), not the export time."""
    import time as _time

    store = _mk(spark, tmp_path)  # v1
    t_after_v1 = _time.time() + 0.05
    _time.sleep(0.12)
    store.merge(
        spark.createDataFrame([(1, 0, "X")], ["k", "p", "v"])
    )  # v2
    export_delta_log(store)
    old = read_delta(spark, store.path, timestamp=t_after_v1)
    assert {r.k: r.v for r in old.collect()}[1] == "a"
    now = read_delta(spark, store.path, timestamp=_time.time())
    assert {r.k: r.v for r in now.collect()}[1] == "X"


def test_export_multipart_checkpoint_roundtrip(spark, tmp_path):
    """The 100 TB checkpoint path: export with a part-row cap writes
    the PROTOCOL.md multi-part layout (N files named
    v.checkpoint.i.N.parquet, _last_checkpoint carrying parts=N) and
    the plain-Spark reader reassembles it."""
    import glob as _glob

    store = _mk(spark, tmp_path)
    store.merge(spark.createDataFrame([(4, 1, "d")], ["k", "p", "v"]))
    log_dir = export_delta_log(store, max_checkpoint_part_rows=2)
    parts = _glob.glob(
        os.path.join(log_dir, "*.checkpoint.*.parquet")
    )
    assert len(parts) >= 2
    with open(os.path.join(log_dir, "_last_checkpoint")) as f:
        last = json.load(f)
    assert last["parts"] == len(parts)
    got = read_delta(spark, store.path)
    assert _rows(got) == _rows(store.read())


def test_same_commit_remove_and_readd_keeps_file_live(spark, tmp_path):
    """delta-spark's DV delete removes a path and re-adds the SAME
    path (new deletionVector) in ONE commit: per the spec's
    reconciliation the add defines the new state, so the file stays
    live with the DV applied — written add-BEFORE-remove to prove
    line order inside the entry does not decide."""
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        inline_dv_descriptor,
    )

    rows = [(i, f"a{i}") for i in range(4)]
    fa = _write_parquet_file(spark, tmp_path, rows, ["k", "v"], "a.parquet")
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": os.path.getsize(fa), "modificationTime": 0, "dataChange": True}},
        ],
    )
    dv = inline_dv_descriptor([1, 3])
    _log_write(
        tbl,
        1,
        [
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": os.path.getsize(fa), "modificationTime": 0, "dataChange": True, "deletionVector": dv}},
            {"remove": {"path": "a.parquet", "deletionTimestamp": 1, "dataChange": True}},
        ],
    )
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(0, "a0"), (2, "a2")]


def test_cdf_export_and_read_roundtrip(spark, tmp_path):
    """export_delta_log(change_data=True) + read_delta_changes: the
    spec Change Data Feed loop. Insert-only commits derive from adds
    (no _change_data written — spec-allowed); update and DV-delete
    commits write cdc files carrying pre/postimages, which the
    reader uses EXCLUSIVELY for those commits."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    store = _mk(spark, tmp_path)  # v00000 template, v00001 inserts
    store.merge(
        spark.createDataFrame([(2, 1, "B"), (4, 1, "d")], ["k", "p", "v"])
    )  # v00002: update k=2, insert k=4
    store.delete("k = 1")  # v00003: DV delete
    export_delta_log(store, change_data=True)

    ch = read_delta_changes(spark, store.path, 1, 3)
    got = sorted(
        (r._commit_version, r._change_type, r.k, r.v)
        for r in ch.collect()
    )
    assert got == [
        (1, "insert", 1, "a"),
        (1, "insert", 2, "b"),
        (1, "insert", 3, "c"),
        (2, "insert", 4, "d"),
        (2, "update_postimage", 2, "B"),
        (2, "update_preimage", 2, "b"),
        (3, "delete", 1, "a"),
    ]
    assert ch.schema["_commit_timestamp"].dataType.typeName().startswith(
        "timestamp"
    )
    # insert-only v1 derived (no cdc dir); v2/v3 materialized
    cd = os.path.join(store.path, "_change_data")
    assert sorted(os.listdir(cd)) == ["v00002", "v00003"]
    # a fresh-range read composes with ending_version defaulting to
    # the log head
    tail = read_delta_changes(spark, store.path, 3)
    assert [(r._change_type, r.k) for r in tail.collect()] == [
        ("delete", 1)
    ]


def test_cdf_foreign_fallback_derivation(spark, tmp_path):
    """A foreign log WITHOUT cdc actions: dataChange=true adds read
    as inserts, dataChange=true removes as deletes (files not yet
    vacuumed), dataChange=false (OPTIMIZE) commits contribute
    nothing."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    f1 = _write_parquet_file(
        spark, tmp_path, [(1, "a"), (2, "b")], ["k", "v"], "a.parquet"
    )
    fc = _write_parquet_file(
        spark, tmp_path, [(1, "a"), (2, "b")], ["k", "v"], "c.parquet"
    )
    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    # v1: OPTIMIZE-shaped rewrite — nothing in the feed
    _log_write(
        tbl,
        1,
        [
            {"commitInfo": {"operation": "OPTIMIZE", "timestamp": 1000}},
            {"remove": {"path": "a.parquet", "deletionTimestamp": 1, "dataChange": False}},
            {"add": {"path": "c.parquet", "partitionValues": {}, "size": os.path.getsize(fc), "modificationTime": 0, "dataChange": False}},
        ],
    )
    # v2: delete-only commit
    _log_write(
        tbl,
        2,
        [
            {"remove": {"path": "c.parquet", "deletionTimestamp": 2, "dataChange": True}},
        ],
    )
    got = sorted(
        (r._commit_version, r._change_type, r.k)
        for r in read_delta_changes(spark, tbl, 0, 2).collect()
    )
    assert got == [
        (0, "insert", 1),
        (0, "insert", 2),
        (2, "delete", 1),
        (2, "delete", 2),
    ]


def test_cdf_timestamp_bounds_in_commit_timestamp(spark, tmp_path):
    """starting_timestamp / ending_timestamp resolve through the
    authoritative commit time — commitInfo.inCommitTimestamp when
    the writer recorded one (file mtimes lie after log copies): the
    earliest commit at-or-after / latest at-or-before rules, Delta's
    table_changes surface."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        DeltaProtocolError,
        read_delta_changes,
    )

    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
        ],
    )
    for v, ict_ms in ((1, 10_000), (2, 20_000), (3, 30_000)):
        f = _write_parquet_file(
            spark, tmp_path, [(v, "x")], ["k", "v"], f"t{v}.parquet"
        )
        _log_write(
            tbl,
            v,
            [
                {"commitInfo": {"inCommitTimestamp": ict_ms}},
                {
                    "add": {
                        "path": f"t{v}.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(f),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                },
            ],
        )
    # commit 0 has no inCommitTimestamp: pin its mtime fallback
    # below the probe timestamps (a fresh file's mtime is "now")
    os.utime(
        os.path.join(tbl, "_delta_log", f"{0:020d}.json"), (5, 5)
    )
    got = sorted(
        (r._commit_version, r.k)
        for r in read_delta_changes(
            spark, tbl, starting_timestamp=15, ending_timestamp=25
        ).collect()
    )
    assert got == [(2, 2)]
    # before-all start -> earliest (v0, no data rows); exact-match
    # bounds are inclusive (v3's 30s end admits it)
    got = sorted(
        r._commit_version
        for r in read_delta_changes(
            spark, tbl, starting_timestamp=1, ending_timestamp=30
        ).collect()
    )
    assert got == [1, 2, 3]
    with pytest.raises(DeltaProtocolError):
        read_delta_changes(spark, tbl, starting_timestamp=31)
    with pytest.raises(ValueError):
        read_delta_changes(
            spark, tbl, starting_version=1, starting_timestamp=15
        )
    with pytest.raises(ValueError):
        read_delta_changes(
            spark, tbl, starting_version=1,
            ending_version=2, ending_timestamp=25,
        )


def test_cdf_timestamp_bounds_plain_mtime_log(spark, tmp_path):
    """A plain foreign log without inCommitTimestamp falls back to
    entry mtimes for both timestamp bounds."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    tbl = str(tmp_path / "tbl")
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": meta},
        ],
    )
    for v in (1, 2, 3):
        f = _write_parquet_file(
            spark, tmp_path, [(v, "y")], ["k", "v"], f"m{v}.parquet"
        )
        _log_write(
            tbl,
            v,
            [
                {
                    "add": {
                        "path": f"m{v}.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(f),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            ],
        )
    log_dir = os.path.join(tbl, "_delta_log")
    for v, ts in ((0, 50), (1, 100), (2, 200), (3, 300)):
        os.utime(os.path.join(log_dir, f"{v:020d}.json"), (ts, ts))
    got = sorted(
        (r._commit_version, r.k)
        for r in read_delta_changes(
            spark, tbl, starting_timestamp=150, ending_timestamp=250
        ).collect()
    )
    assert got == [(2, 2)]


def test_cdf_partitioned_store_injects_partition_values(spark, tmp_path):
    """CDF files of a partitioned store land under hive dirs without
    the partition column in the file; the reader re-injects it from
    the cdc action's partitionValues."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    store = _mk(spark, tmp_path, name="pt", partition_by="p")
    store.merge(
        spark.createDataFrame([(2, 1, "B")], ["k", "p", "v"])
    )  # v00002: update inside p=1
    export_delta_log(store, change_data=True)
    got = sorted(
        (r._change_type, r.k, r.p, r.v)
        for r in read_delta_changes(
            spark, store.path, 2, 2
        ).collect()
    )
    assert got == [
        ("update_postimage", 2, 1, "B"),
        ("update_preimage", 2, 1, "b"),
    ]


def test_cdf_files_cleaned_with_expired_entries(spark, tmp_path):
    """Vacuum advances the exported checkpoint past old versions;
    their cdc actions are removed with the expired JSON entries, so
    their _change_data/<v> dirs are unreferenced and reclaimed."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    store = _mk(spark, tmp_path)
    store.merge(
        spark.createDataFrame([(2, 1, "B")], ["k", "p", "v"])
    )  # v00002: update -> cdc files
    export_delta_log(store, change_data=True)
    cd = os.path.join(store.path, "_change_data")
    assert os.path.isdir(os.path.join(cd, "v00002"))
    for i in range(3):
        store.merge(
            spark.createDataFrame([(8 + i, 0, "h")], ["k", "p", "v"])
        )
    store.vacuum(keep=2)
    export_delta_log(store, change_data=True)
    assert not os.path.exists(os.path.join(cd, "v00002"))
    # the still-live range reads fine
    live = store.list_versions()
    got = read_delta_changes(
        spark, store.path, int(live[-1][1:]), int(live[-1][1:])
    )
    assert got.count() >= 1


def test_cdf_keys_only_table(spark, tmp_path):
    """A keys-only store (dedup set: no non-key attributes) exports
    a pure insert/delete feed — presence detection must not depend
    on non-key columns existing."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    store = MergeStore(spark, str(tmp_path / "ks"), keys=["k"])
    df = spark.createDataFrame([(1,), (2,)], ["k"])
    store.create_if_absent(df)
    store.merge(df)  # v00001 inserts
    store.delete("k = 1")  # v00002
    export_delta_log(store, change_data=True)
    got = sorted(
        (r._commit_version, r._change_type, r.k)
        for r in read_delta_changes(spark, store.path, 1, 2).collect()
    )
    assert got == [
        (1, "insert", 1),
        (1, "insert", 2),
        (2, "delete", 1),
    ]


def test_cdf_protocol_declares_change_data_feed(spark, tmp_path):
    """change_data export must be protocol-visible (ADVICE r7):
    legacy mode needs minWriterVersion >= 4 for Change Data Feed;
    table-features mode (DVs present) must list 'changeDataFeed' in
    writerFeatures — a stock writer admitted at writer 2, or one
    honoring only the listed features, would commit WITHOUT producing
    _change_data and silently break the exported feed."""
    import pyarrow.parquet as pq

    def _ckpt_protocol(log_dir):
        with open(os.path.join(log_dir, "_last_checkpoint")) as f:
            last = json.load(f)
        t = pq.read_table(
            os.path.join(
                log_dir, f"{last['version']:020d}.checkpoint.parquet"
            )
        )
        return next(p for p in t.column("protocol").to_pylist() if p)

    # legacy (no DVs): writer version gate
    store = _mk(spark, tmp_path)
    store.merge(spark.createDataFrame([(4, 1, "d")], ["k", "p", "v"]))
    proto = _ckpt_protocol(export_delta_log(store, change_data=True))
    assert proto["minWriterVersion"] >= 4
    # ... and withOUT change_data the base store stays at writer 2
    store2 = _mk(spark, tmp_path, name="t2")
    store2.merge(spark.createDataFrame([(4, 1, "d")], ["k", "p", "v"]))
    proto2 = _ckpt_protocol(export_delta_log(store2))
    assert proto2["minWriterVersion"] == 2

    # table-features (DVs): the feature must be spelled by name
    store3 = _mk(spark, tmp_path, name="t3")
    store3.delete("k = 2")  # merge-on-read: DV sidecar
    proto3 = _ckpt_protocol(export_delta_log(store3, change_data=True))
    assert proto3["minWriterVersion"] == 7
    assert "changeDataFeed" in proto3["writerFeatures"]
    assert "deletionVectors" in proto3["writerFeatures"]


def test_cdf_fallback_remove_dv_is_applied(spark, tmp_path):
    """A cdc-less commit removing a DV-carrying file must NOT re-emit
    the already-DV-deleted rows as deletes (ADVICE r7): the remove's
    deletionVector is applied as an anti-filter, mirroring the
    streaming twin, so only rows live at the PREVIOUS version appear
    in the feed."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )
    from etl_pipeline_4handling_listings_spark.sources.dvcodec import (
        inline_dv_descriptor,
        write_dv_file,
    )

    rows = [(i, f"a{i}") for i in range(5)]
    fa = _write_parquet_file(spark, tmp_path, rows, ["k", "v"], "a.parquet")
    fb = _write_parquet_file(
        spark, tmp_path, [(10, "b0"), (11, "b1")], ["k", "v"], "b.parquet"
    )
    tbl = str(tmp_path / "tbl")
    dv_a = inline_dv_descriptor([1, 3])  # a1, a3 already dead
    dv_b = write_dv_file(tbl, [0])  # b0 already dead (file-backed DV)
    meta = {
        "id": "abc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(("k", "long"), ("v", "string")),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["deletionVectors"], "writerFeatures": ["deletionVectors"]}},
            {"metaData": meta},
            {"add": {"path": "a.parquet", "partitionValues": {}, "size": os.path.getsize(fa), "modificationTime": 0, "dataChange": True, "deletionVector": dv_a}},
            {"add": {"path": "b.parquet", "partitionValues": {}, "size": os.path.getsize(fb), "modificationTime": 0, "dataChange": True, "deletionVector": dv_b}},
        ],
    )
    # v1: whole-file deletes of both DV-carrying files, no cdc
    _log_write(
        tbl,
        1,
        [
            {"remove": {"path": "a.parquet", "deletionTimestamp": 1, "dataChange": True, "deletionVector": dv_a}},
            {"remove": {"path": "b.parquet", "deletionTimestamp": 1, "dataChange": True, "deletionVector": dv_b}},
        ],
    )
    got = sorted(
        (r._change_type, r.k)
        for r in read_delta_changes(spark, tbl, 1, 1).collect()
    )
    assert got == [
        ("delete", 0),
        ("delete", 2),
        ("delete", 4),
        ("delete", 11),
    ]


def test_export_remove_carries_dv_and_extended_metadata(spark, tmp_path):
    """Exported remove actions carry the spec's optional fields:
    extendedFileMetadata with partitionValues/size, and the
    deletionVector the file was removed with — so a cdc-less CDF
    derivation (ours or a stock client's) can anti-filter rows the
    DV had already deleted."""
    store = _mk(spark, tmp_path)
    store.delete("k = 2")  # DV on the live file(s)
    # rewrite: the DV-carrying incarnation is removed
    store.merge(spark.createDataFrame([(1, 0, "A")], ["k", "p", "v"]))
    log_dir = export_delta_log(store)
    removes = []
    for name in sorted(os.listdir(log_dir)):
        if name.endswith(".json") and name != "_last_checkpoint":
            with open(os.path.join(log_dir, name)) as f:
                for ln in f.read().splitlines():
                    a = json.loads(ln)
                    if "remove" in a:
                        removes.append(a["remove"])
    assert removes
    assert all(r["extendedFileMetadata"] is True for r in removes)
    assert all("partitionValues" in r and "size" in r for r in removes)
    dv_removes = [r for r in removes if r.get("deletionVector")]
    assert dv_removes, "the DV-carrying incarnation's remove lost its DV"
    assert all(
        r["deletionVector"].get("storageType") for r in dv_removes
    )


def test_read_type_widened_table(spark, tmp_path):
    """typeWidening (+ the Databricks preview name): files written
    with the PRE-WIDENING narrower physical type must up-cast to the
    current logical schema on read. v0's file spells int32/float32/
    decimal(10,2); the schema (after widening) declares long/double/
    decimal(12,2); v1 appends a file already in the wide types. The
    batch reader, the CDF derivation, and the streaming tail (Arrow
    cast plane) must all return the widened values."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from decimal import Decimal

    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta,
        read_delta_changes,
    )
    from etl_pipeline_4handling_listings_spark.sources.deltastream import (
        DeltaTailStreamReader,
    )

    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl, exist_ok=True)
    narrow = os.path.join(tbl, "narrow.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int32()),
                "x": pa.array([1.5, 2.5], pa.float32()),
                "m": pa.array(
                    [Decimal("1.25"), Decimal("2.50")],
                    pa.decimal128(10, 2),
                ),
            }
        ),
        narrow,
    )
    wide = os.path.join(tbl, "wide.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([3], pa.int64()),
                "x": pa.array([3.5], pa.float64()),
                "m": pa.array([Decimal("3.75")], pa.decimal128(12, 2)),
            }
        ),
        wide,
    )
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                # spec: the widening history lands in field metadata
                "metadata": {
                    "delta.typeChanges": [
                        {"fromType": "integer", "toType": "long"}
                    ]
                },
            },
            {"name": "x", "type": "double", "nullable": True, "metadata": {}},
            {
                "name": "m",
                "type": "decimal(12,2)",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
    meta = {
        "id": "tw",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["typeWidening"], "writerFeatures": ["typeWidening"]}},
            {"metaData": meta},
            {"add": {"path": "narrow.parquet", "partitionValues": {}, "size": os.path.getsize(narrow), "modificationTime": 0, "dataChange": True}},
        ],
    )
    _log_write(
        tbl,
        1,
        [
            {"add": {"path": "wide.parquet", "partitionValues": {}, "size": os.path.getsize(wide), "modificationTime": 0, "dataChange": True}},
        ],
    )
    want = [
        (1, 1.5, Decimal("1.25")),
        (2, 2.5, Decimal("2.50")),
        (3, 3.5, Decimal("3.75")),
    ]
    got = read_delta(spark, tbl)
    assert dict(got.dtypes) == {
        "k": "bigint",
        "x": "double",
        "m": "decimal(12,2)",
    }
    assert sorted((r.k, r.x, r.m) for r in got.collect()) == want
    # CDF derivation reads the narrow file as the wide schema too
    ch = read_delta_changes(spark, tbl, 0, 0)
    assert sorted((r.k, r.x, r.m) for r in ch.collect()) == want[:2]
    # streaming tail: the Arrow cast plane up-casts per batch
    from pyspark.sql.types import StructType as _St

    r = DeltaTailStreamReader(
        _St.fromJson(schema), {"path": tbl}
    )
    parts = r.partitions(
        {"version": 0, "snap": False}, {"version": 1, "snap": True}
    )
    rows = []
    for p in parts:
        for batch in r.read(p):
            rows.extend(batch.to_pylist())
    assert sorted(
        (d["k"], d["x"], d["m"]) for d in rows
    ) == want
    # the preview feature name is accepted too
    _log_write(
        tbl,
        2,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["typeWidening-preview"], "writerFeatures": ["typeWidening-preview"]}},
        ],
    )
    assert read_delta(spark, tbl).count() == 3


def test_user_timestamp_parse_is_named_and_tz_stable():
    """User-supplied time-travel/change-feed bounds: naive ISO
    strings and naive datetimes resolve as UTC (deterministic under
    any host timezone), and a string that is neither ISO nor numeric
    raises a NAMED error — not float()'s conversion message."""
    import datetime

    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        _parse_user_ts,
    )

    assert _parse_user_ts("1970-01-01T00:00:10+00:00") == 10.0
    assert _parse_user_ts("1970-01-01T00:00:10") == 10.0  # naive=UTC
    assert (
        _parse_user_ts(datetime.datetime(1970, 1, 1, 0, 0, 10))
        == 10.0
    )
    assert _parse_user_ts("12.5") == 12.5
    assert _parse_user_ts(42) == 42.0
    for bad in ("2026-13-01", "2026/01/01", "not-a-time"):
        with pytest.raises(
            DeltaProtocolError, match=bad.replace("/", ".")
        ):
            _parse_user_ts(bad)


def test_naive_timestamp_resolves_in_session_zone(spark, tmp_path):
    """timestampAsOf / change-feed bounds with a NAIVE string follow
    delta-spark's rule: resolution in the SESSION timezone, so both
    engines pick the same version for the same literal. With the
    session at America/New_York (UTC-5 in January), a wall-clock
    string 5 hours below a commit's UTC instant still selects it."""
    f1 = _write_parquet_file(
        spark, tmp_path, [(1,)], ["k"], "z0.parquet"
    )
    f2 = _write_parquet_file(
        spark, tmp_path, [(2,)], ["k"], "z1.parquet"
    )
    tbl = str(tmp_path / "tbl")
    # two commits with pinned inCommitTimestamps (epoch ms):
    # v0 at 2021-01-01T12:00:00Z, v1 at 2021-01-02T12:00:00Z
    t0 = 1609502400000
    t1 = t0 + 86_400_000
    _log_write(
        tbl,
        0,
        [
            {"commitInfo": {"inCommitTimestamp": t0}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "tz1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _schema_string(("k", "long")),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.enableInCommitTimestamps": "true"
                    },
                    "createdTime": 0,
                }
            },
            {"add": {"path": "z0.parquet", "partitionValues": {}, "size": os.path.getsize(f1), "modificationTime": 0, "dataChange": True}},
        ],
    )
    _log_write(
        tbl,
        1,
        [
            {"commitInfo": {"inCommitTimestamp": t1}},
            {"add": {"path": "z1.parquet", "partitionValues": {}, "size": os.path.getsize(f2), "modificationTime": 0, "dataChange": True}},
        ],
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set(
            "spark.sql.session.timeZone", "America/New_York"
        )
        # 08:00 New York = 13:00 UTC on Jan 1 -> at-or-before v0
        got = read_delta(spark, tbl, timestamp="2021-01-01T08:00:00")
        assert sorted(r.k for r in got.collect()) == [1]
        # same literal under UTC would be 08:00Z, BEFORE v0's 12:00Z
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from etl_pipeline_4handling_listings_spark.sources.deltalog import (
            DeltaProtocolError as _DPE,
        )

        with pytest.raises(_DPE, match="no commit at or before"):
            read_delta(spark, tbl, timestamp="2021-01-01T08:00:00")
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
