"""Foreign-Delta shallow CLONE (``clone_delta``).

A new table whose version-0 commit references the source's live
files by absolute path — zero data copied, deletion vectors
re-anchored to their absolute 'p' form, independent from the
first commit on.
"""

import json
import os

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    clone_delta,
    delete_from_delta,
    read_delta,
)
from etl_pipeline_4handling_listings_spark.sources.sqldml import (
    DMLParseError,
    run_dml,
)

from test_deltaappend import _entry_lines, _mk_foreign
from test_deltadelete import _seed


def test_clone_round_trip_and_independence(spark, tmp_path):
    """The clone reads the source's rows without copying a byte;
    later writes to either side never leak to the other."""
    src = _mk_foreign(tmp_path, name="clsrc")
    _seed(spark, src, [(1, "a"), (2, "b")])
    dst = str(tmp_path / "cldst")
    ver, info = clone_delta(spark, src, dst)
    assert (ver, info["files"]) == (0, 1)
    lines = _entry_lines(dst, 0)
    assert lines[0]["commitInfo"]["operation"] == "CLONE"
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert all(a["path"].startswith("/") for a in adds)
    # no data file exists under the clone root
    assert not [
        n for n in os.listdir(dst) if n.endswith(".parquet")
    ]
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, dst).collect()
    ) == [(1, "a"), (2, "b")]
    # append to the SOURCE: invisible to the clone
    _seed(spark, src, [(3, "c")])
    assert sorted(
        r.k for r in read_delta(spark, dst).collect()
    ) == [1, 2]
    # DELETE in the CLONE: the rewrite lands under the clone root,
    # the source is untouched
    ver2, n = delete_from_delta(spark, dst, "k = 1")
    assert n == 1
    assert sorted(
        r.k for r in read_delta(spark, dst).collect()
    ) == [2]
    assert sorted(
        r.k for r in read_delta(spark, src).collect()
    ) == [1, 2, 3]
    rewritten = [
        ln["add"]["path"]
        for ln in _entry_lines(dst, ver2)[1:]
        if "add" in ln
    ]
    assert all(not p.startswith("/") for p in rewritten)
    for p in rewritten:
        assert os.path.isfile(os.path.join(dst, p))


def test_clone_partitioned(spark, tmp_path):
    src = _mk_foreign(tmp_path, pcols=("p",), name="clp")
    _seed(
        spark,
        src,
        [(1, "a", 10), (2, "b", 20)],
        pcols=("p",),
        one_file=False,
    )
    dst = str(tmp_path / "clpdst")
    clone_delta(spark, src, dst)
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, dst).collect()
    )
    assert got == [(1, "a", 10), (2, "b", 20)]


def test_clone_reanchors_deletion_vectors(spark, tmp_path):
    """A source file behind a DV clones with the mask re-anchored
    to its absolute 'p' path — masked rows stay invisible."""
    src = _mk_foreign(
        tmp_path,
        cfg={"delta.enableDeletionVectors": "true"},
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        },
        name="cldv",
    )
    _seed(spark, src, [(1, "a"), (2, "b"), (3, "c")])
    delete_from_delta(spark, src, "k = 2", strategy="dv")
    dst = str(tmp_path / "cldvdst")
    clone_delta(spark, src, dst)
    adds = [
        ln["add"] for ln in _entry_lines(dst, 0)[1:] if "add" in ln
    ]
    dv = adds[0]["deletionVector"]
    assert dv["storageType"] == "p"
    assert os.path.isfile(dv["pathOrInlineDv"])
    assert sorted(
        r.k for r in read_delta(spark, dst).collect()
    ) == [1, 3]


def test_clone_of_clone_carries_absolute_paths_verbatim(
    spark, tmp_path
):
    """Re-cloning a clone must carry already-absolute add paths
    verbatim (joining them against the new source root would
    mangle them)."""
    src = _mk_foreign(tmp_path, name="clcl")
    _seed(spark, src, [(1, "a"), (2, "b")])
    mid = str(tmp_path / "clclmid")
    clone_delta(spark, src, mid)
    dst = str(tmp_path / "clcldst")
    clone_delta(spark, mid, dst)
    adds_mid = [
        ln["add"]["path"]
        for ln in _entry_lines(mid, 0)[1:]
        if "add" in ln
    ]
    adds_dst = [
        ln["add"]["path"]
        for ln in _entry_lines(dst, 0)[1:]
        if "add" in ln
    ]
    assert adds_dst == adds_mid
    assert sorted(
        r.k for r in read_delta(spark, dst).collect()
    ) == [1, 2]


def test_clone_refuses_unsupported_writer_features(
    spark, tmp_path
):
    src = _mk_foreign(
        tmp_path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "rowTracking"],
        },
        name="clrt",
    )
    with pytest.raises(DeltaProtocolError, match="rowTracking"):
        clone_delta(spark, src, str(tmp_path / "clrtdst"))


def test_clone_refusals_and_sql(spark, tmp_path):
    src = _mk_foreign(tmp_path, name="clsql")
    _seed(spark, src, [(1, "a")])
    dst = str(tmp_path / "clsqldst")
    ver, info = run_dml(
        spark,
        "create table d clone s",
        tables={"s": src, "d": dst},
    )
    assert info["files"] == 1
    assert sorted(
        r.k for r in read_delta(spark, dst).collect()
    ) == [1]
    # CREATE, not REPLACE
    with pytest.raises(DeltaProtocolError, match="already has"):
        clone_delta(spark, src, dst)
    # mixed handle kinds refuse
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )

    with pytest.raises(DMLParseError, match="same .*kind"):
        run_dml(
            spark,
            "create table d2 clone s",
            tables={
                "s": src,
                "d2": MergeStore(
                    spark, str(tmp_path / "ms"), keys=["k"]
                ),
            },
        )
