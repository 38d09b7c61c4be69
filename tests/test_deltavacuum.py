"""Foreign-Delta VACUUM (``vacuum_delta``).

Physical reclamation of files the current snapshot does not
reference, older than the retention window — delta-spark's
listing-based rule (orphans from crashed writers are reclaimed
too). Live data files, their deletion-vector sidecars, and every
hidden tree except ``_change_data`` are protected.
"""

import os
import time

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    delete_from_delta,
    read_delta,
    restore_delta,
    vacuum_delta,
)
from etl_pipeline_4handling_listings_spark.sources.sqldml import (
    DMLParseError,
    run_dml,
)

from test_deltaappend import _entry_lines, _mk_foreign
from test_deltadelete import _seed


def _age(p, hours=200):
    t = time.time() - hours * 3600
    os.utime(p, (t, t))


def _age_tombstones(tbl, version, hours=200):
    """Backdate every remove action's deletionTimestamp in one log
    entry — a fresh tombstone protects its file for the retention
    window (delta's rule), so reclamation tests must age BOTH the
    file and the tombstone."""
    import json as _json

    p = os.path.join(tbl, "_delta_log", f"{version:020d}.json")
    ts = int((time.time() - hours * 3600) * 1000)
    out = []
    with open(p) as fh:
        for line in fh:
            if not line.strip():
                continue
            a = _json.loads(line)
            if "remove" in a:
                a["remove"]["deletionTimestamp"] = ts
            out.append(_json.dumps(a))
    with open(p, "w") as fh:
        fh.write("\n".join(out) + "\n")


def test_vacuum_reclaims_dead_files_protects_live(spark, tmp_path):
    """A delete's rewritten-away file ages out and is reclaimed;
    the live rewrite, the log, and young dead files survive; a
    second vacuum finds nothing; time travel past the reclaimed
    file now refuses by name."""
    tbl = _mk_foreign(tmp_path, name="vac")
    _seed(spark, tbl, [(1, "dead"), (2, "live")])  # v1
    delete_from_delta(spark, tbl, "v = 'dead'")  # v2 rewrite
    dead = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )
    live = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 2)[1:]
        if "add" in ln
    )
    # young dead file: protected by retention
    out = vacuum_delta(spark, tbl, dry_run=True)
    assert out["files_deleted"] == 0
    _age(os.path.join(tbl, dead))
    # an OLD file with a FRESH tombstone stays protected too —
    # readers of the pre-delete snapshot and CDF reconstruction
    # need it until the tombstone ages out (delta's rule)
    assert vacuum_delta(spark, tbl, dry_run=True)[
        "files_deleted"
    ] == 0
    _age_tombstones(tbl, 2)
    # dry run lists it but deletes nothing
    out = vacuum_delta(spark, tbl, dry_run=True)
    assert out["files"] == [dead]
    assert os.path.isfile(os.path.join(tbl, dead))
    # real run reclaims it
    out = vacuum_delta(spark, tbl)
    assert out["files_deleted"] == 1 and out["files"] == [dead]
    assert not os.path.exists(os.path.join(tbl, dead))
    assert os.path.isfile(os.path.join(tbl, live))
    assert os.path.isdir(os.path.join(tbl, "_delta_log"))
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    ) == [(2, "live")]
    assert vacuum_delta(spark, tbl)["files_deleted"] == 0
    # the restore that would need the reclaimed file refuses
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        restore_delta(spark, tbl, version=1)


def test_vacuum_retention_gate_and_override(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="vacret")
    _seed(spark, tbl, [(1, "a")])  # v1
    delete_from_delta(spark, tbl, "k = 1")  # v2: pure remove
    dead = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )
    _age(os.path.join(tbl, dead), hours=1)
    # below the default week: refuses by name
    with pytest.raises(DeltaProtocolError, match="retention"):
        vacuum_delta(spark, tbl, retention_hours=0)
    out = vacuum_delta(
        spark, tbl, retention_hours=0, enforce_retention=False
    )
    assert out["files_deleted"] == 1
    # a table-configured shorter window lowers the default gate
    tbl2 = _mk_foreign(
        tmp_path,
        cfg={"delta.deletedFileRetentionDuration": "interval 1 hour"},
        name="vacret2",
    )
    _seed(spark, tbl2, [(1, "a")])
    delete_from_delta(spark, tbl2, "k = 1")
    dead2 = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl2, 1)[1:]
        if "add" in ln
    )
    _age(os.path.join(tbl2, dead2), hours=2)
    _age_tombstones(tbl2, 2, hours=2)
    out = vacuum_delta(spark, tbl2)  # default = configured 1h
    assert out["files_deleted"] == 1


def test_vacuum_protects_live_dv_sidecars(spark, tmp_path):
    """A live deletion-vector file is referenced state — never
    reclaimed, however old."""
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableDeletionVectors": "true"},
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        },
        name="vacdv",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    delete_from_delta(spark, tbl, "k = 1", strategy="dv")
    dvs = [
        n
        for n in os.listdir(tbl)
        if n.startswith("deletion_vector") and n.endswith(".bin")
    ]
    assert dvs
    for n in dvs:
        _age(os.path.join(tbl, n))
    out = vacuum_delta(spark, tbl)
    assert out["files_deleted"] == 0
    assert sorted(
        r.k for r in read_delta(spark, tbl).collect()
    ) == [2]


def test_vacuum_reclaims_orphaned_staging_output(spark, tmp_path):
    """Files a crashed writer moved under the root but never
    committed are unreferenced — reclaimed once old enough; hidden
    dot-staging dirs are never entered."""
    tbl = _mk_foreign(tmp_path, name="vacorph")
    _seed(spark, tbl, [(1, "a")])
    orphan = os.path.join(tbl, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"xx")
    _age(orphan)
    staging = os.path.join(tbl, ".delete-deadbeef")
    os.makedirs(staging)
    staged = os.path.join(staging, "part-x.parquet")
    with open(staged, "wb") as f:
        f.write(b"yy")
    _age(staged)
    out = vacuum_delta(spark, tbl)
    assert out["files"] == ["part-orphan.parquet"]
    assert os.path.isfile(staged)  # dot-dirs protected


def test_vacuum_change_data_ages_out(spark, tmp_path):
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableChangeDataFeed": "true"},
        name="vaccdf",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    delete_from_delta(spark, tbl, "k = 1")
    cdc_dir = os.path.join(tbl, "_change_data")
    cdc_files = []
    for root, _d, names in os.walk(cdc_dir):
        cdc_files += [
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet")
        ]
    assert cdc_files
    # young cdc files survive
    assert vacuum_delta(spark, tbl)["files_deleted"] == 0
    for f in cdc_files:
        _age(f)
    out = vacuum_delta(spark, tbl)
    assert out["files_deleted"] == len(cdc_files)


def test_vacuum_via_sql_forms(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="vacsql")
    _seed(spark, tbl, [(1, "a")])
    out = run_dml(
        spark, "vacuum t retain 200 hours dry run", tables={"t": tbl}
    )
    assert out["dry_run"] is True and out["retention_hours"] == 200
    with pytest.raises(DMLParseError, match="HOURS"):
        run_dml(
            spark, "vacuum t retain 2 versions", tables={"t": tbl}
        )
