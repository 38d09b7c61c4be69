"""Foreign-Delta APPEND write (``append_to_delta``).

The one interop direction beyond read / stream / convert / export:
a stock pipeline owns the table (reference: the curated Delta store
a stock deployment keeps writing, mls_listings_curated.py:321-368)
and this engine contributes rows — data files staged under the
table dir, one add-actions entry claimed via the LogStore
create-if-absent primitive (Delta's next-log-entry OCC rule).
"""

import json
import os

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    append_to_delta,
    read_delta,
)


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


def _mk_foreign(tmp_path, pcols=(), cfg=None, protocol=None, name="tbl"):
    """A stock-style table: protocol + metaData at version 0, no
    data yet (the appends under test provide it)."""
    tbl = str(tmp_path / name)
    os.makedirs(tbl, exist_ok=True)
    fields = [("k", "long"), ("v", "string")]
    if pcols:
        fields += [(c, "long") for c in pcols]
    meta = {
        "id": "foreign-1",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string(*fields),
        "partitionColumns": list(pcols),
        "configuration": cfg or {},
        "createdTime": 0,
    }
    _log_write(
        tbl,
        0,
        [
            {
                "protocol": protocol
                or {"minReaderVersion": 1, "minWriterVersion": 2}
            },
            {"metaData": meta},
        ],
    )
    return tbl


def _entry_lines(tbl, v):
    with open(
        os.path.join(tbl, "_delta_log", f"{v:020d}.json")
    ) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def test_append_roundtrip_unpartitioned(spark, tmp_path):
    """Append -> stock-shaped entry -> read_delta (the stock-reader
    stand-in) sees exactly the appended rows; a second append
    composes; an empty append commits nothing."""
    tbl = _mk_foreign(tmp_path)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    assert append_to_delta(df1, tbl) == 1
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b")]
    lines = _entry_lines(tbl, 1)
    assert lines[0]["commitInfo"]["operation"] == "WRITE"
    adds = [ln["add"] for ln in lines[1:]]
    assert adds and all(a["dataChange"] is True for a in adds)
    assert all("/" not in a["path"] for a in adds)  # root-relative
    assert sum(
        json.loads(a["stats"])["numRecords"] for a in adds
    ) == 2
    # every referenced file exists under the table root
    for a in adds:
        assert os.path.isfile(os.path.join(tbl, a["path"]))
    assert append_to_delta(
        spark.createDataFrame([(3, "c")], ["k", "v"]), tbl
    ) == 2
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # empty append: no entry claimed
    empty = spark.createDataFrame([], "k long, v string")
    assert append_to_delta(empty, tbl) == 2


def test_append_partitioned_records_partition_values(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, pcols=("p",))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 10)], ["k", "v", "p"]
    )
    assert append_to_delta(df, tbl) == 1
    adds = [ln["add"] for ln in _entry_lines(tbl, 1)[1:]]
    assert {a["partitionValues"]["p"] for a in adds} == {"10", "20"}
    assert all(a["path"].startswith("p=") for a in adds)
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a", 10), (2, "b", 20), (3, "c", 10)]


def test_append_refusals_are_named(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    # column mapping
    cm = _mk_foreign(
        tmp_path,
        cfg={"delta.columnMapping.mode": "name"},
        name="cm",
    )
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        append_to_delta(df, cm)
    # unsupported writer feature
    rt = _mk_foreign(
        tmp_path,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "rowTracking"],
        },
        name="rt",
    )
    with pytest.raises(DeltaProtocolError, match="rowTracking"):
        append_to_delta(df, rt)
    # live CHECK constraint
    cc = _mk_foreign(
        tmp_path,
        cfg={"delta.constraints.positive": "k > 0"},
        name="cc",
    )
    with pytest.raises(DeltaProtocolError, match="constraints"):
        append_to_delta(df, cc)
    # schema mismatch
    ok = _mk_foreign(tmp_path, name="ok")
    with pytest.raises(DeltaProtocolError, match="schema mismatch"):
        append_to_delta(
            spark.createDataFrame([(1,)], ["k"]), ok
        )
    # a supported feature set under table features is accepted
    feat = _mk_foreign(
        tmp_path,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "changeDataFeed"],
        },
        cfg={"delta.appendOnly": "true"},
        name="feat",
    )
    assert append_to_delta(df, feat) == 1


def test_append_live_invariant_refused(spark, tmp_path):
    tbl = str(tmp_path / "inv")
    os.makedirs(tbl, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.invariants": '{"expression":{"expression":"k > 0"}}'
                },
            }
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "x",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ],
    )
    with pytest.raises(DeltaProtocolError, match="invariant"):
        append_to_delta(spark.createDataFrame([(1,)], ["k"]), tbl)


def test_append_in_commit_timestamp_monotonic(spark, tmp_path):
    """A table with delta.enableInCommitTimestamps gets a monotonic
    commitInfo.inCommitTimestamp as the entry's first action — even
    when the previous commit's ict is in the future."""
    future_ms = int(4e12)  # ~2096
    tbl = _mk_foreign(
        tmp_path, cfg={"delta.enableInCommitTimestamps": "true"}
    )
    # overwrite v0 to carry the future ict (first action per spec)
    _log_write(
        tbl,
        0,
        [{"commitInfo": {"inCommitTimestamp": future_ms}}]
        + _entry_lines(tbl, 0),
    )
    append_to_delta(
        spark.createDataFrame([(1, "a")], ["k", "v"]), tbl
    )
    ci = _entry_lines(tbl, 1)[0]["commitInfo"]
    assert ci["inCommitTimestamp"] == future_ms + 1


def test_append_occ_lost_race_retries_next_slot(spark, tmp_path):
    """A claim lost to a concurrent stock writer retries against
    the new head: both commits land, neither clobbered."""
    from etl_pipeline_4handling_listings_spark.sources import (
        deltalog as m,
    )
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path)

    class RacingStore(PosixLogStore):
        """Simulates a stock writer winning the first claim: just
        before our create, version 1 appears."""

        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                # the rival's commit: an independent add entry
                rival = os.path.join(
                    os.path.dirname(path), f"{1:020d}.json"
                )
                staged = os.path.join(tbl, "rival.parquet")
                import pyarrow as pa
                import pyarrow.parquet as pq

                pq.write_table(
                    pa.table({"k": [99], "v": ["rival"]}), staged
                )
                with open(rival, "w") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "add": {
                                    "path": "rival.parquet",
                                    "partitionValues": {},
                                    "size": os.path.getsize(staged),
                                    "modificationTime": 0,
                                    "dataChange": True,
                                }
                            }
                        )
                        + "\n"
                    )
            return super().create_exclusive(path, payload)

    v = append_to_delta(
        spark.createDataFrame([(1, "a")], ["k", "v"]),
        tbl,
        log_store=RacingStore(),
    )
    assert v == 2  # slot 1 was lost to the rival
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (99, "rival")]


def test_exporter_refuses_diverged_log(spark, tmp_path):
    """Racing an exporter: a foreign append into a store-exported
    log claims the slot the NEXT export needs — the exporter must
    refuse by name (silently skipping would publish a log whose
    version n is not store vn), while re-export without foreign
    writers stays idempotent."""
    from etl_pipeline_4handling_listings_spark.sources.deltalog import (
        export_delta_log,
    )
    from etl_pipeline_4handling_listings_spark.sources.store import (
        MergeStore,
    )

    store = MergeStore(spark, str(tmp_path / "s"), keys=["k"])
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)  # v1
    export_delta_log(store)
    export_delta_log(store)  # idempotent re-export: fine
    # foreign append claims the next slot (version 2)
    v = append_to_delta(
        spark.createDataFrame([(2, "b")], ["k", "v"]), store.path
    )
    assert v == 2
    # the store commits v2 independently -> next export collides
    store.merge(spark.createDataFrame([(3, "c")], ["k", "v"]))
    with pytest.raises(DeltaProtocolError, match="diverged"):
        export_delta_log(store)


def test_append_non_nullable_column_with_nulls_refused(spark, tmp_path):
    """nullable=false is part of the table contract: appending NULLs
    there would corrupt the table for stock readers — the gate runs
    on the DATA (Spark frames are nullable-typed even when
    null-free), so a null-free frame passes and a null-carrying one
    is refused by name."""
    tbl = str(tmp_path / "nn")
    os.makedirs(tbl, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": False, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "x",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ],
    )
    ok = spark.createDataFrame([(1, "a")], "k long, v string")
    assert append_to_delta(ok, tbl) == 1
    bad = spark.createDataFrame([(None, "b")], "k long, v string")
    with pytest.raises(DeltaProtocolError, match="non-nullable"):
        append_to_delta(bad, tbl)


def test_append_lost_race_adopts_winner_metadata(spark, tmp_path):
    """A lost claim whose winner ENABLED inCommitTimestamps must be
    reflected in the retried entry (a monotonic ict above the
    winner's), and a winner that changed partitionColumns refuses
    by name — the staged files follow the old layout."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="ict_race")
    meta_lines = _entry_lines(tbl, 0)
    winner_meta = dict(meta_lines[1]["metaData"])
    winner_meta["configuration"] = {
        "delta.enableInCommitTimestamps": "true"
    }

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                rival = os.path.join(
                    os.path.dirname(path), f"{1:020d}.json"
                )
                with open(rival, "w") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "commitInfo": {
                                    "inCommitTimestamp": int(9e12)
                                }
                            }
                        )
                        + "\n"
                        + json.dumps({"metaData": winner_meta})
                        + "\n"
                    )
            return super().create_exclusive(path, payload)

    v = append_to_delta(
        spark.createDataFrame([(1, "a")], ["k", "v"]),
        tbl,
        log_store=Racer(),
    )
    assert v == 2
    ci = _entry_lines(tbl, 2)[0]["commitInfo"]
    assert ci["inCommitTimestamp"] == int(9e12) + 1

    # partition-layout change by the winner -> named refusal
    tbl2 = _mk_foreign(tmp_path, name="pcol_race")
    meta2 = dict(_entry_lines(tbl2, 0)[1]["metaData"])
    meta2["partitionColumns"] = ["v"]

    class LayoutRacer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                rival = os.path.join(
                    os.path.dirname(path), f"{1:020d}.json"
                )
                with open(rival, "w") as fh:
                    fh.write(json.dumps({"metaData": meta2}) + "\n")
            return super().create_exclusive(path, payload)

    with pytest.raises(DeltaProtocolError, match="table layout"):
        append_to_delta(
            spark.createDataFrame([(1, "a")], ["k", "v"]),
            tbl2,
            log_store=LayoutRacer(),
        )


def _mk_mapped(tmp_path, mode, name):
    """Stock-style column-mapped table: logical (k, v), partitioned
    by v, physical names + ids the way delta-spark records them."""
    tbl = str(tmp_path / name)
    os.makedirs(tbl, exist_ok=True)
    schema = {
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
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": ["v"],
                    "configuration": {
                        "delta.columnMapping.mode": mode,
                        "delta.columnMapping.maxColumnId": "2",
                    },
                    "createdTime": 0,
                }
            },
        ],
    )
    return tbl


@pytest.mark.parametrize("mode", ["name", "id"])
def test_append_column_mapped_table(spark, tmp_path, mode):
    """Appends into a column-mapped table write PHYSICAL column
    names + parquet field ids, key partitionValues and hive dirs by
    physical name, and round-trip through the mapped reader."""
    import pyarrow.parquet as pq

    tbl = _mk_mapped(tmp_path, mode, f"map_{mode}")
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], ["k", "v"]
    )
    assert append_to_delta(df, tbl) == 1
    adds = [ln["add"] for ln in _entry_lines(tbl, 1)[1:]]
    # spec: physical names everywhere the file layer is concerned
    assert all(a["path"].startswith("col-bbb222=") for a in adds)
    assert {a["partitionValues"]["col-bbb222"] for a in adds} == {
        "x", "y",
    }
    pf = pq.ParquetFile(os.path.join(tbl, adds[0]["path"]))
    [field] = [f for f in pf.schema_arrow if f.name == "col-aaa111"]
    assert field.metadata[b"PARQUET:field_id"] == b"1"
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "x"), (2, "y"), (3, "x")]
    # second append composes
    assert append_to_delta(
        spark.createDataFrame([(4, "z")], ["k", "v"]), tbl
    ) == 2
    assert read_delta(spark, tbl).count() == 4


def test_append_mapped_nested_missing_id_refused(spark, tmp_path):
    """Nested schemas under column mapping are WRITABLE (physical
    renames + field ids are applied recursively) — but only when
    every nested field carries its delta.columnMapping.id; a table
    whose nested field lacks one is refused by name, never written
    with a missing parquet field id."""
    tbl = str(tmp_path / "map_nested")
    os.makedirs(tbl, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "s",
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "a",
                            "type": "long",
                            "nullable": True,
                            "metadata": {},
                        }
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-s",
                },
            }
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "m2",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name"
                    },
                    "createdTime": 0,
                }
            },
        ],
    )
    df = spark.createDataFrame([((1,),)], "s struct<a: long>")
    with pytest.raises(
        DeltaProtocolError, match="delta.columnMapping.id"
    ):
        append_to_delta(df, tbl)


def test_append_revalidates_commits_landed_during_staging(
    spark, tmp_path, monkeypatch
):
    """A commit that lands BETWEEN resolve() and a FIRST-TRY
    successful claim (no lost race) must still be re-validated: the
    winner here enables delta.enableInCommitTimestamps, and the
    append's entry must carry a monotonic ict above the winner's —
    the loop re-gates whenever the head moved past the last
    validated version, not only after a lost claim."""
    from etl_pipeline_4handling_listings_spark.sources import (
        deltalog as m,
    )

    tbl = _mk_foreign(tmp_path, name="during")
    meta = dict(_entry_lines(tbl, 0)[1]["metaData"])
    meta["configuration"] = {"delta.enableInCommitTimestamps": "true"}
    orig = m._latest_log_version
    state = {"fired": False}

    def hooked(log_dir):
        if not state["fired"] and log_dir.startswith(tbl):
            state["fired"] = True
            # the rival commit lands before our first head read
            # inside the claim loop (i.e. "during staging")
            with open(
                os.path.join(log_dir, f"{1:020d}.json"), "w"
            ) as fh:
                fh.write(
                    json.dumps(
                        {"commitInfo": {"inCommitTimestamp": int(8e12)}}
                    )
                    + "\n"
                    + json.dumps({"metaData": meta})
                    + "\n"
                )
        return orig(log_dir)

    monkeypatch.setattr(m, "_latest_log_version", hooked)
    # make the hook fire only in the claim loop, after resolve:
    # resolve() goes through _py_actions, not _latest_log_version
    v = append_to_delta(
        spark.createDataFrame([(1, "a")], ["k", "v"]), tbl
    )
    assert v == 2
    ci = _entry_lines(tbl, 2)[0]["commitInfo"]
    assert ci["inCommitTimestamp"] == int(8e12) + 1


def test_append_dotted_logical_names(spark, tmp_path):
    """Logical names with dots (the reason column mapping exists)
    must not parse as nested-field paths anywhere on the append
    path."""
    tbl = str(tmp_path / "dotted")
    os.makedirs(tbl, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "a.b",
                "type": "long",
                "nullable": False,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-dot1",
                },
            },
            {
                "name": "v",
                "type": "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-dot2",
                },
            },
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "d1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "name"
                    },
                    "createdTime": 0,
                }
            },
        ],
    )
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["a.b", "v"])
    assert append_to_delta(df, tbl) == 1
    got = read_delta(spark, tbl)
    assert sorted(got.columns) == ["a.b", "v"]
    assert sorted(tuple(r) for r in got.collect()) == [
        (1, "x"), (2, "y"),
    ]


def test_append_type_widened_table_accepted(spark, tmp_path):
    """A table whose protocol lists the typeWidening writer feature
    accepts appends at the exact current schema (the append never
    writes narrower types nor edits delta.typeChanges)."""
    tbl = _mk_foreign(
        tmp_path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["typeWidening"],
        },
        name="tw",
    )
    assert append_to_delta(
        spark.createDataFrame([(1, "a")], ["k", "v"]), tbl
    ) == 1
    assert read_delta(spark, tbl).count() == 1


def _mk_mapped_nested(tmp_path, mode, name, nn=False):
    """Stock-style column-mapped table with a NESTED schema:
    logical ``k long, s struct<a long, c struct<d long>>,
    tags array<struct<t string>>`` — physical names + ids at every
    level, the way delta-spark records them. ``nn=True`` declares
    s and s.a non-nullable (an all-non-nullable ancestor chain the
    staged-NULL gate can enforce from footer stats)."""
    tbl = str(tmp_path / name)
    os.makedirs(tbl, exist_ok=True)

    def f(n, t, i, pn, nullable=True):
        return {
            "name": n,
            "type": t,
            "nullable": nullable,
            "metadata": {
                "delta.columnMapping.id": i,
                "delta.columnMapping.physicalName": pn,
            },
        }

    schema = {
        "type": "struct",
        "fields": [
            f("k", "long", 1, "col-k1"),
            f(
                "s",
                {
                    "type": "struct",
                    "fields": [
                        f("a", "long", 3, "col-a3", nullable=not nn),
                        f(
                            "c",
                            {
                                "type": "struct",
                                "fields": [
                                    f("d", "long", 5, "col-d5")
                                ],
                            },
                            4,
                            "col-c4",
                        ),
                    ],
                },
                2,
                "col-s2",
                nullable=not nn,
            ),
            f(
                "tags",
                {
                    "type": "array",
                    "elementType": {
                        "type": "struct",
                        "fields": [f("t", "string", 7, "col-t7")],
                    },
                    "containsNull": True,
                },
                6,
                "col-tags6",
            ),
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "mn1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": mode,
                        "delta.columnMapping.maxColumnId": "7",
                    },
                    "createdTime": 0,
                }
            },
        ],
    )
    return tbl


_NESTED_DDL = (
    "k long, s struct<a: long, c: struct<d: long>>, "
    "tags array<struct<t: string>>"
)


@pytest.mark.parametrize("mode", ["name", "id"])
def test_append_mapped_nested_round_trip(spark, tmp_path, mode):
    """Nested schemas under column mapping: the staged parquet
    spells PHYSICAL names and parquet field ids at every nesting
    level (struct members, structs inside arrays), and the mapped
    reader round-trips the logical values."""
    import pyarrow.parquet as pq

    tbl = _mk_mapped_nested(tmp_path, mode, f"mapnest_{mode}")
    df = spark.createDataFrame(
        [
            (1, (10, (100,)), [("p",), ("q",)]),
            (2, (20, None), []),
            (3, None, None),
        ],
        _NESTED_DDL,
    )
    assert append_to_delta(df, tbl) == 1
    adds = [ln["add"] for ln in _entry_lines(tbl, 1)[1:]]
    pf = pq.ParquetFile(os.path.join(tbl, adds[0]["path"]))
    sch = pf.schema_arrow

    def fid(field):
        return (field.metadata or {}).get(b"PARQUET:field_id")

    by_name = {f.name: f for f in sch}
    assert set(by_name) == {"col-k1", "col-s2", "col-tags6"}
    assert fid(by_name["col-k1"]) == b"1"
    s = by_name["col-s2"]
    assert fid(s) == b"2"
    inner = {s.type.field(i).name: s.type.field(i) for i in range(2)}
    assert set(inner) == {"col-a3", "col-c4"}
    assert fid(inner["col-a3"]) == b"3"
    assert fid(inner["col-c4"]) == b"4"
    d = inner["col-c4"].type.field(0)
    assert d.name == "col-d5" and fid(d) == b"5"
    tags = by_name["col-tags6"]
    assert fid(tags) == b"6"
    t = tags.type.value_type.field(0)
    assert t.name == "col-t7" and fid(t) == b"7"
    got = read_delta(spark, tbl)
    assert got.schema.simpleString() == (
        spark.createDataFrame([], _NESTED_DDL).schema.simpleString()
    )
    rows = {r.k: r for r in got.collect()}
    assert rows[1].s.a == 10 and rows[1].s.c.d == 100
    assert [x.t for x in rows[1].tags] == ["p", "q"]
    assert rows[2].s.a == 20 and rows[2].s.c is None
    assert rows[3].s is None and rows[3].tags is None
    # second append composes
    assert (
        append_to_delta(
            spark.createDataFrame(
                [(4, (40, (400,)), [("r",)])], _NESTED_DDL
            ),
            tbl,
        )
        == 2
    )
    assert read_delta(spark, tbl).count() == 4


def test_append_nested_nonnull_gate(spark, tmp_path):
    """A NULL aimed at a non-nullable nested leaf under an
    all-non-nullable ancestor chain is refused from the staged
    parquet's own footer stats — the refusal names the dotted
    LOGICAL path; valid data at the same schema commits."""
    tbl = _mk_mapped_nested(tmp_path, "name", "mapnest_nn", nn=True)
    bad = spark.createDataFrame(
        [(1, (None, (100,)), [])], _NESTED_DDL
    )
    with pytest.raises(DeltaProtocolError, match="s.a"):
        append_to_delta(bad, tbl)
    # a NULL struct s violates the chain too (folded into the leaf
    # count by parquet definition levels — still a refusal)
    with pytest.raises(DeltaProtocolError, match="non-nullable"):
        append_to_delta(
            spark.createDataFrame([(1, None, [])], _NESTED_DDL), tbl
        )
    ok = spark.createDataFrame([(1, (10, None), [])], _NESTED_DDL)
    assert append_to_delta(ok, tbl) == 1
    assert read_delta(spark, tbl).count() == 1


def test_append_revalidates_nullability_tightening(spark, tmp_path):
    """A concurrent commit that tightens a column from nullable to
    non-nullable between staging and the claim forces the re-run
    error path: the staged-NULL gate validated against the OLD
    contract, so the layout signature must include per-field
    nullability (the race would otherwise commit staged NULLs into
    a now non-nullable column)."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="nn_race")
    meta2 = dict(_entry_lines(tbl, 0)[1]["metaData"])
    sch = json.loads(meta2["schemaString"])
    sch["fields"] = [
        dict(fj, nullable=False) if fj["name"] == "v" else fj
        for fj in sch["fields"]
    ]
    meta2["schemaString"] = json.dumps(sch)

    class NullabilityRacer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                rival = os.path.join(
                    os.path.dirname(path), f"{1:020d}.json"
                )
                with open(rival, "w") as fh:
                    fh.write(json.dumps({"metaData": meta2}) + "\n")
            return super().create_exclusive(path, payload)

    with pytest.raises(DeltaProtocolError, match="table layout"):
        append_to_delta(
            spark.createDataFrame([(1, None)], "k long, v string"),
            tbl,
            log_store=NullabilityRacer(),
        )
