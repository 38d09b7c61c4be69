"""Foreign-Delta row UPDATE (``update_from_delta``).

The third interop write direction (append / delete / update) —
GDPR rectification on a stock-owned table: matched rows transformed
per SET expressions, rewrite or DV-mask strategies, CDF
preimage/postimage materialization, the same claim/OCC machinery.
"""

import json
import os

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    read_delta,
    update_from_delta,
)

from test_deltaappend import _entry_lines, _log_write, _mk_foreign
from test_deltadelete import _seed


def test_update_rewrite_round_trip(spark, tmp_path):
    """Matched rows transformed (cast to the declared type), NULL
    predicates untouched (Delta's WHERE rule), fully-matched files
    rewritten too, commitInfo says UPDATE."""
    tbl = _mk_foreign(tmp_path, name="upd")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, None)])
    ver, n = update_from_delta(
        spark,
        tbl,
        "v = 'a' OR k = 2",
        {"k": "k + 100", "v": "upper(v)"},
    )
    assert n == 2
    lines = _entry_lines(tbl, ver)
    assert lines[0]["commitInfo"]["operation"] == "UPDATE"
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert removes and adds
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(3, None), (101, "A"), (102, "B")]
    # matching nothing commits nothing
    assert update_from_delta(
        spark, tbl, "k = 999", {"v": "'x'"}
    ) == (ver, 0)


def test_update_partitioned_untouched_partitions(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="updpart")
    _seed(
        spark,
        tbl,
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)],
        pcols=("p",),
    )
    ver, n = update_from_delta(
        spark, tbl, "p = 10 AND k = 1", {"v": "'edited'"}
    )
    assert n == 1
    lines = _entry_lines(tbl, ver)
    assert all(
        ln["remove"]["partitionValues"] == {"p": "10"}
        for ln in lines[1:]
        if "remove" in ln
    )
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "edited", 10), (2, "b", 10), (3, "c", 20)]


def test_update_dv_strategy(spark, tmp_path):
    """strategy='dv' (delta-spark's modern UPDATE): matched rows
    masked out of the old file, transformed rows land in FRESH
    files — the unmatched rows are never rewritten."""
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    tbl = _mk_foreign(tmp_path, protocol=proto, name="upddv")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    data_path = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )
    ver, n = update_from_delta(
        spark, tbl, "k = 2", {"v": "'B2'"}, strategy="dv"
    )
    assert n == 1
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    masked = [a for a in adds if a["path"] == data_path]
    fresh = [a for a in adds if a["path"] != data_path]
    assert len(masked) == 1 and len(fresh) == 1
    assert masked[0]["deletionVector"]["cardinality"] == 1
    assert json.loads(fresh[0]["stats"])["numRecords"] == 1
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "B2"), (3, "c")]


def test_update_cdf_pre_and_postimage(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        read_delta_changes,
    )

    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableChangeDataFeed": "true"},
        name="updcdf",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    ver, n = update_from_delta(spark, tbl, "k = 1", {"v": "'z'"})
    assert n == 1
    feed = read_delta_changes(
        spark, tbl, starting_version=ver, ending_version=ver
    )
    got = sorted(
        (r.k, r.v, r._change_type) for r in feed.collect()
    )
    assert got == [
        (1, "a", "update_preimage"),
        (1, "z", "update_postimage"),
    ]


def test_update_moves_rows_between_partitions(spark, tmp_path):
    """SET on a partition column moves the row: the rewritten file
    lands under the hive dir the NEW value names (delta-spark's
    UPDATE semantics), the old partition's file is removed, and the
    untouched partition stays untouched."""
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="updmove")
    _seed(
        spark,
        tbl,
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)],
        pcols=("p",),
    )
    ver, n = update_from_delta(
        spark, tbl, "k = 1", {"p": "p + 90"}
    )
    assert n == 1
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    # only the p=10 file is touched; its survivors rewrite in
    # place and the moved row lands under p=100
    assert sorted(a["partitionValues"]["p"] for a in adds) == [
        "10",
        "100",
    ]
    assert [r["partitionValues"]["p"] for r in removes] == ["10"]
    assert all(
        a["path"].startswith(f"p={a['partitionValues']['p']}/")
        for a in adds
    )
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a", 100), (2, "b", 10), (3, "c", 20)]


def test_update_refusals_are_named(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="updref")
    _seed(spark, tbl, [(1, "a", 10)], pcols=("p",))
    with pytest.raises(DeltaProtocolError, match="unknown column"):
        update_from_delta(spark, tbl, "k = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="at least one"):
        update_from_delta(spark, tbl, "k = 1", {})
    # updates MINT values: live CHECK constraints refuse (deletes
    # on the same table stay permitted)
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        delete_from_delta,
    )

    cc = _mk_foreign(tmp_path, name="updcc")
    _seed(spark, cc, [(1, "a"), (2, "b")])
    # the stock owner adds a CHECK constraint AFTER the data landed
    meta2 = dict(_entry_lines(cc, 0)[1]["metaData"])
    meta2["configuration"] = {"delta.constraints.pos": "k > 0"}
    _log_write(cc, 2, [{"metaData": meta2}])
    with pytest.raises(DeltaProtocolError, match="constraints"):
        update_from_delta(spark, cc, "k = 1", {"v": "'x'"})
    assert delete_from_delta(spark, cc, "k = 2")[1] == 1


def test_update_nonnull_gate(spark, tmp_path):
    """SET writing NULL into a non-nullable column is refused from
    the staged parquet's own footer stats."""
    tbl = str(tmp_path / "updnn")
    os.makedirs(tbl, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "string", "nullable": False,
             "metadata": {}},
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "unn",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ],
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    with pytest.raises(DeltaProtocolError, match="non-nullable"):
        update_from_delta(
            spark, tbl, "k = 1", {"v": "CAST(NULL AS STRING)"}
        )
    # a non-null SET at the same schema commits
    ver, n = update_from_delta(spark, tbl, "k = 1", {"v": "'ok'"})
    assert n == 1
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "ok"), (2, "b")]


@pytest.mark.parametrize("mode", ["name", "id"])
def test_update_column_mapped(spark, tmp_path, mode):
    from test_deltaappend import _mk_mapped

    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        append_to_delta,
    )

    tbl = _mk_mapped(tmp_path, mode, f"updmap_{mode}")
    append_to_delta(
        spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "k long, v string"
        ).coalesce(1),
        tbl,
    )
    ver, n = update_from_delta(
        spark, tbl, "k = 2", {"k": "k * 10"}
    )
    assert n == 1
    adds = [
        ln["add"] for ln in _entry_lines(tbl, ver)[1:] if "add" in ln
    ]
    assert all(
        set(a["partitionValues"]) == {"col-bbb222"} for a in adds
    )
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "x"), (3, "y"), (20, "x")]


def test_update_revalidates_concurrent_tightening(spark, tmp_path):
    """Two races an UPDATE must catch at the claim (its gates ran
    against the OLD metadata): a nullable -> non-nullable tightening
    (the staged-NULL gate no longer covers the staged files) and a
    concurrently ADDED invariant (updates mint values, so live
    enforcement re-runs on every revalidate)."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    def racer_for(tbl, mutate):
        meta2 = dict(_entry_lines(tbl, 0)[1]["metaData"])
        sch = json.loads(meta2["schemaString"])
        mutate(sch, meta2)
        meta2["schemaString"] = json.dumps(sch)

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
                            json.dumps({"metaData": meta2}) + "\n"
                        )
                return super().create_exclusive(path, payload)

        return Racer()

    # (1) nullability tightening on an UNMAPPED table -> re-run path
    t1 = _mk_foreign(tmp_path, name="updnrace")
    _seed(spark, t1, [(1, "a"), (2, "b")])

    def tighten(sch, _m):
        sch["fields"] = [
            dict(fj, nullable=False) if fj["name"] == "v" else fj
            for fj in sch["fields"]
        ]

    with pytest.raises(DeltaProtocolError, match="table layout"):
        update_from_delta(
            spark,
            t1,
            "k = 1",
            {"v": "CAST(NULL AS STRING)"},
            log_store=racer_for(t1, tighten),
        )

    # (2) invariant added mid-flight -> named enforcement refusal
    t2 = _mk_foreign(tmp_path, name="updirace")
    _seed(spark, t2, [(1, "a"), (2, "b")])

    def add_invariant(sch, _m):
        sch["fields"] = [
            dict(
                fj,
                metadata={
                    "delta.invariants":
                        '{"expression":{"expression":"k > 0"}}'
                },
            )
            if fj["name"] == "k"
            else fj
            for fj in sch["fields"]
        ]

    with pytest.raises(DeltaProtocolError, match="invariant"):
        update_from_delta(
            spark,
            t2,
            "k = 1",
            {"v": "'x'"},
            log_store=racer_for(t2, add_invariant),
        )


def test_update_dv_full_match_demotes_to_remove(spark, tmp_path):
    """A dv-strategy UPDATE whose predicate matches EVERY live row
    of a file demotes that file to a pure remove (masking all rows
    would leave a zero-live file in the log); the transformed rows
    land in fresh files."""
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    tbl = _mk_foreign(tmp_path, protocol=proto, name="upddvfull")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    data_path = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )
    ver, n = update_from_delta(
        spark, tbl, "k >= 1", {"v": "upper(v)"}, strategy="dv"
    )
    assert n == 2
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert [r["path"] for r in removes] == [data_path]
    # no masked re-add of the old file; only fresh transformed data
    assert all(a["path"] != data_path for a in adds)
    assert all("deletionVector" not in a for a in adds)
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "A"), (2, "B")]
