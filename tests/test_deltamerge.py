"""Foreign-Delta MERGE (``merge_into_delta``).

The verb that completes the interop DML square (append / delete /
update / merge): the reference's three curated-pipeline MERGEs
(mls_listings_curated.py:328-353 M1 upsert,
mls_listings_hist_curated.py:183-210 M2 update+delete+insert,
mls_listings_curated_propid_backfill.py:193-219 M3 changed-only
guard) run against a STOCK-owned table through the claim protocol.
"""

import json
import os

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    append_to_delta,
    merge_into_delta,
    read_delta,
    read_delta_changes,
)

from test_deltaappend import _entry_lines, _log_write, _mk_foreign
from test_deltadelete import _seed


def _src(spark, rows, ddl="k long, v string"):
    return spark.createDataFrame(rows, ddl)


def test_merge_upsert_round_trip(spark, tmp_path):
    """M1's shape: matched rows updated, unmatched source rows
    inserted, untouched rows carried; the commit pairs removes with
    adds and a stock reader sees the post-merge state."""
    tbl = _mk_foreign(tmp_path, name="m1")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(2, "B"), (4, "d")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    lines = _entry_lines(tbl, ver)
    assert lines[0]["commitInfo"]["operation"] == "MERGE"
    ops = lines[0]["commitInfo"]["operationParameters"]
    assert ops["predicate"] == "target.k = source.k"
    assert "update" in ops["matchedPredicates"]
    assert "insert" in ops["notMatchedPredicates"]
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert len(removes) == 1 and adds
    assert all(a["dataChange"] is True for a in adds)
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    # idempotent re-merge with the same source: the update fires
    # again (values equal), insert matches now -> no insert
    ver2, counts2 = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(2, "B"), (4, "d")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
    )
    assert counts2 == {"updated": 2, "deleted": 0, "inserted": 0}
    assert sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    ) == got


def test_merge_clause_order_update_then_delete(spark, tmp_path):
    """M2's shape: for a matched pair the update clause is
    evaluated first, then delete, else keep — plus inserts."""
    tbl = _mk_foreign(tmp_path, name="m2")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "A"), (2, None), (9, "i")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        update_condition="source.v IS NOT NULL",
        when_matched_delete=True,
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 1, "deleted": 1, "inserted": 1}
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "A"), (3, "c"), (9, "i")]


def test_merge_changed_only_guard_skips_unchanged_files(
    spark, tmp_path
):
    """M3's changed-columns-only guard: a file whose matched rows
    are ALL unchanged is not rewritten at all — no remove, no
    add — while files with a real change rewrite normally."""
    tbl = _mk_foreign(tmp_path, name="m3")
    _seed(spark, tbl, [(1, "a"), (2, "b")])  # file 1
    _seed(spark, tbl, [(3, "c"), (4, "d")])  # file 2
    # source matches rows in BOTH files; only file 2's row changes
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "a"), (3, "CHANGED")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        update_condition="NOT (target.v <=> source.v)",
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 0}
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    # exactly ONE file rewritten (the one with the changed row)
    assert len(removes) == 1
    file2 = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 2)[1:]
        if "add" in ln
    )
    assert removes[0]["path"] == file2
    assert adds
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b"), (3, "CHANGED"), (4, "d")]
    # nothing changed anywhere -> no commit at all
    ver2, counts2 = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "a")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        update_condition="NOT (target.v <=> source.v)",
    )
    assert ver2 == ver
    assert counts2 == {"updated": 0, "deleted": 0, "inserted": 0}


def test_merge_insert_only_is_append_shaped(spark, tmp_path):
    """Insert-only merge: matched source rows are ignored, the
    commit carries ONLY adds (no removes — nothing is rewritten),
    and appendOnly tables accept it."""
    tbl = _mk_foreign(
        tmp_path, cfg={"delta.appendOnly": "true"}, name="mio"
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(2, "dup"), (5, "e"), (6, "f")]),
        "target.k = source.k",
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 0, "deleted": 0, "inserted": 2}
    lines = _entry_lines(tbl, ver)
    assert not [ln for ln in lines[1:] if "remove" in ln]
    assert [ln for ln in lines[1:] if "add" in ln]
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b"), (5, "e"), (6, "f")]
    # a matched clause on the appendOnly table refuses by name
    with pytest.raises(DeltaProtocolError, match="append-only"):
        merge_into_delta(
            spark,
            tbl,
            _src(spark, [(1, "x")]),
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
        )


def test_merge_insert_by_name_and_mapping_rules(spark, tmp_path):
    """INSERT * fills absent target columns with NULL; a source
    column the table lacks refuses by name; an explicit mapping
    leaves unnamed columns NULL and honors insert_condition."""
    tbl = _mk_foreign(tmp_path, name="mins")
    _seed(spark, tbl, [(1, "a")])
    # narrow source: v missing -> NULL
    ver, counts = merge_into_delta(
        spark,
        tbl,
        spark.createDataFrame([(7,)], "k long"),
        "target.k = source.k",
        when_not_matched_insert=True,
    )
    assert counts["inserted"] == 1
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (7, None)]
    # wide source refuses by name
    with pytest.raises(DeltaProtocolError, match="extra_col"):
        merge_into_delta(
            spark,
            tbl,
            spark.createDataFrame(
                [(8, "x", 1.0)], "k long, v string, extra_col double"
            ),
            "target.k = source.k",
            when_not_matched_insert=True,
        )
    # explicit mapping + condition: only k >= 10 inserts, v unnamed
    ver2, counts2 = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(9, "no"), (10, "yes")]),
        "target.k = source.k",
        when_not_matched_insert={"k": "source.k * 100"},
        insert_condition="source.k >= 10",
    )
    assert counts2["inserted"] == 1
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (7, None), (1000, None)]


def test_merge_cardinality_refusal(spark, tmp_path):
    """Two source rows matching one target row under a matched
    clause is Delta's named MERGE error; with insert-only clauses
    the same source is harmless."""
    tbl = _mk_foreign(tmp_path, name="mdup")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    dup_src = _src(spark, [(1, "x"), (1, "y"), (3, "c")])
    with pytest.raises(
        DeltaProtocolError, match="multiple source rows"
    ):
        merge_into_delta(
            spark,
            tbl,
            dup_src,
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
        )
    # insert-only: the duplicate matched rows are simply ignored
    ver, counts = merge_into_delta(
        spark,
        tbl,
        dup_src,
        "target.k = source.k",
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 0, "deleted": 0, "inserted": 1}
    got = sorted((r.k, r.v) for r in read_delta(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_partitioned_inserts_new_partitions(spark, tmp_path):
    """Inserted rows land under hive dirs for partitions the table
    never had; updates stay in place; untouched partitions keep
    their files; SET on a partition column MOVES the row."""
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="mpart")
    _seed(
        spark,
        tbl,
        [(1, "a", 10), (2, "b", 20)],
        pcols=("p",),
        one_file=False,
    )
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(
            spark,
            [(1, "A", 10), (5, "e", 30)],
            "k long, v string, p long",
        ),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    pvs = sorted(a["partitionValues"]["p"] for a in adds)
    assert pvs == ["10", "30"]
    assert all(
        a["path"].startswith(f"p={a['partitionValues']['p']}/")
        for a in adds
    )
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    assert [r["partitionValues"]["p"] for r in removes] == ["10"]
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A", 10), (2, "b", 20), (5, "e", 30)]
    ver2, counts2 = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "x", 99)], "k long, v string, p long"),
        "target.k = source.k",
        when_matched_update={"p": "source.p"},
    )
    assert counts2 == {"updated": 1, "deleted": 0, "inserted": 0}
    adds2 = [
        ln["add"]
        for ln in _entry_lines(tbl, ver2)[1:]
        if "add" in ln
    ]
    assert "99" in [a["partitionValues"]["p"] for a in adds2]
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A", 99), (2, "b", 20), (5, "e", 30)]


def test_merge_cdf_change_rows(spark, tmp_path):
    """A merge on a live-CDF table materializes the spec's four
    change types under _change_data and the commit carries cdc
    actions; read_delta_changes surfaces them."""
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableChangeDataFeed": "true"},
        name="mcdf",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "A"), (2, None), (9, "i")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        update_condition="source.v IS NOT NULL",
        when_matched_delete=True,
        when_not_matched_insert=True,
    )
    lines = _entry_lines(tbl, ver)
    cdcs = [ln["cdc"] for ln in lines[1:] if "cdc" in ln]
    assert cdcs and all(
        c["path"].startswith("_change_data/") for c in cdcs
    )
    assert all(c["dataChange"] is False for c in cdcs)
    ch = read_delta_changes(
        spark, tbl, starting_version=ver, ending_version=ver
    )
    got = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in ch.collect()
    )
    assert got == [
        (1, "A", "update_postimage"),
        (1, "a", "update_preimage"),
        (2, "b", "delete"),
        (9, "i", "insert"),
    ]


@pytest.mark.parametrize("mode", ["name", "id"])
def test_merge_column_mapped(spark, tmp_path, mode):
    """Column-mapped merges: the condition and clauses speak
    LOGICAL names, rewritten + inserted files spell physical names
    with parquet field ids, partitionValues stay physical."""
    import pyarrow.parquet as pq

    from test_deltaappend import _mk_mapped

    tbl = _mk_mapped(tmp_path, mode, f"mrgmap_{mode}")
    append_to_delta(
        spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "k long, v string"
        ).coalesce(1),
        tbl,
    )
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(2, "x"), (7, "z")]),
        "target.k = source.k AND target.v = source.v",
        when_matched_update={"k": "target.k * 10"},
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    lines = _entry_lines(tbl, ver)
    adds = [ln["add"] for ln in lines[1:] if "add" in ln]
    assert all(
        set(a["partitionValues"]) == {"col-bbb222"} for a in adds
    )
    for a in adds:
        pf = pq.ParquetFile(os.path.join(tbl, a["path"]))
        [field] = [
            f for f in pf.schema_arrow if f.name == "col-aaa111"
        ]
        assert field.metadata[b"PARQUET:field_id"] == b"1"
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "x"), (3, "y"), (7, "z"), (20, "x")]


def test_merge_applies_existing_deletion_vectors(spark, tmp_path):
    """Rows already masked by a deletion vector neither match nor
    suppress inserts — and a rewrite never resurrects them."""
    from test_deltadelete import _mask_row

    tbl = _mk_foreign(
        tmp_path,
        protocol={
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        },
        name="mdv",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    _mask_row(spark, tbl, 1, 2)  # k=2 masked out
    # source row k=2 matches nothing live -> INSERTS; k=3 updates
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(2, "resurrect"), (3, "C")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "resurrect"), (3, "C")]


def test_merge_concurrent_append_conflicts(spark, tmp_path):
    """Unlike predicate deletes, a merge READ the whole table: a
    racing blind append invalidates its insert decisions —
    ConcurrentAppend, named error."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    tbl = _mk_foreign(tmp_path, name="mrace")
    _seed(spark, tbl, [(1, "a")])

    class Racer(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                append_to_delta(
                    spark.createDataFrame(
                        [(5, "raced")], "k long, v string"
                    ),
                    tbl,
                )
            return super().create_exclusive(path, payload)

    with pytest.raises(
        DeltaProtocolError, match="ConcurrentAppend"
    ):
        merge_into_delta(
            spark,
            tbl,
            _src(spark, [(5, "e")]),
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
            when_not_matched_insert=True,
            log_store=Racer(),
        )
    # a racing remove of a read file is ConcurrentDeleteRead
    victim = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 1)[1:]
        if "add" in ln
    )

    class Remover(PosixLogStore):
        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, payload):
            if not self.raced:
                self.raced = True
                _log_write(
                    tbl,
                    3,
                    [
                        {
                            "remove": {
                                "path": victim,
                                "dataChange": True,
                            }
                        }
                    ],
                )
            return super().create_exclusive(path, payload)

    with pytest.raises(
        DeltaProtocolError, match="ConcurrentDeleteRead"
    ):
        merge_into_delta(
            spark,
            tbl,
            _src(spark, [(6, "f")]),
            "target.k = source.k",
            when_not_matched_insert=True,
            log_store=Remover(),
        )


def test_merge_nonnull_gate_on_minted_values(spark, tmp_path):
    """Updated or inserted NULLs aimed at a non-nullable column are
    refused from the staged parquet's own footer stats."""
    tbl = str(tmp_path / "mnn")
    os.makedirs(tbl, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {},
            },
            {
                "name": "v",
                "type": "string",
                "nullable": False,
                "metadata": {},
            },
        ],
    }
    _log_write(
        tbl,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 2,
                }
            },
            {
                "metaData": {
                    "id": "mnn",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ],
    )
    _seed(spark, tbl, [(1, "a")])
    with pytest.raises(DeltaProtocolError, match="non-nullable"):
        merge_into_delta(
            spark,
            tbl,
            spark.createDataFrame([(9,)], "k long"),
            "target.k = source.k",
            when_not_matched_insert=True,  # v absent -> NULL
        )
    with pytest.raises(DeltaProtocolError, match="non-nullable"):
        merge_into_delta(
            spark,
            tbl,
            _src(spark, [(1, None)]),
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
        )


def test_merge_argument_refusals(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="margs")
    _seed(spark, tbl, [(1, "a")])
    src = _src(spark, [(1, "x")])
    with pytest.raises(ValueError, match="at least one clause"):
        merge_into_delta(spark, tbl, src, "target.k = source.k")
    with pytest.raises(ValueError, match="at least one column"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_matched_update={},
        )
    with pytest.raises(ValueError, match="at least one"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_insert={},
        )
    with pytest.raises(DeltaProtocolError, match="unknown column"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_matched_update={"nope": "1"},
        )
    with pytest.raises(DeltaProtocolError, match="unknown column"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_insert={"nope": "1"},
        )
    # a NOT MATCHED condition sees only the source row
    with pytest.raises(
        DeltaProtocolError, match="only the source row"
    ):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_insert=True,
            insert_condition="target.v IS NULL",
        )
    # UPDATE SET * requires full source coverage of table columns
    with pytest.raises(DeltaProtocolError, match="missing"):
        merge_into_delta(
            spark,
            tbl,
            spark.createDataFrame([(1,)], "k long"),
            "target.k = source.k",
            when_matched_update=True,
        )


def test_merge_refuses_misshapen_arguments(spark, tmp_path):
    """Orphaned clause conditions, wrong-typed clause flags and
    reserved source column names refuse loudly instead of silently
    dropping a clause or corrupting fates."""
    tbl = _mk_foreign(tmp_path, name="mshape")
    _seed(spark, tbl, [(1, "a")])
    src = _src(spark, [(1, "x")])
    with pytest.raises(ValueError, match="delete_condition"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
            delete_condition="source.v IS NULL",  # flag forgotten
        )
    with pytest.raises(ValueError, match="insert_condition"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
            insert_condition="source.k > 0",
        )
    with pytest.raises(ValueError, match="must be a bool"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_matched_delete="source.v IS NULL",
        )
    with pytest.raises(ValueError, match="insert-by-name"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_insert=["k", "v"],
        )
    with pytest.raises(ValueError, match="__sp"):
        merge_into_delta(
            spark,
            tbl,
            spark.createDataFrame(
                [(1, True)], "k long, __sp boolean"
            ),
            "target.k = source.k",
            when_matched_delete=True,
        )


def test_merge_dup_match_delete_carveout(spark, tmp_path):
    """delta-spark's carve-out: multiple source rows matching one
    target row are ALLOWED when the only matched clause is an
    unconditional DELETE (idempotent) — counted once, one CDF
    delete row — but a delete_condition re-arms the refusal."""
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableChangeDataFeed": "true"},
        name="mdupdel",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    dup_src = _src(
        spark, [(1, "x"), (1, "y"), (3, "c"), (3, "c")]
    )
    ver, counts = merge_into_delta(
        spark,
        tbl,
        dup_src,
        "target.k = source.k",
        when_matched_delete=True,
        when_not_matched_insert=True,
    )
    # the matched row deletes ONCE; every not-matched source row
    # inserts, duplicates included (Delta's rule)
    assert counts == {"updated": 0, "deleted": 1, "inserted": 2}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(2, "b"), (3, "c"), (3, "c")]
    ch = read_delta_changes(
        spark, tbl, starting_version=ver, ending_version=ver
    )
    dels = [
        r for r in ch.collect() if r["_change_type"] == "delete"
    ]
    assert len(dels) == 1 and dels[0]["k"] == 1
    # a delete CONDITION makes which-match-fires ambiguous again
    with pytest.raises(
        DeltaProtocolError, match="multiple source rows"
    ):
        merge_into_delta(
            spark,
            tbl,
            _src(spark, [(2, "x"), (2, "y")]),
            "target.k = source.k",
            when_matched_delete=True,
            delete_condition="source.v = 'x'",
        )


def test_merge_empty_source_commits_nothing(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="mempty")
    ver0 = _seed(spark, tbl, [(1, "a")])
    ver, counts = merge_into_delta(
        spark,
        tbl,
        spark.createDataFrame([], "k long, v string"),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_matched_delete=True,
        when_not_matched_insert=True,
    )
    assert ver == ver0
    assert counts == {"updated": 0, "deleted": 0, "inserted": 0}
    # merge into an EMPTY table: everything inserts
    tbl2 = _mk_foreign(tmp_path, name="mempty2")
    ver2, counts2 = merge_into_delta(
        spark,
        tbl2,
        _src(spark, [(1, "a"), (2, "b")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
    )
    assert counts2 == {"updated": 0, "deleted": 0, "inserted": 2}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl2).collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_merge_not_matched_by_source(spark, tmp_path):
    """delta-spark 2.3's third clause side: target rows with no
    source match update (clause order: update before delete) or
    delete — the sync-table-to-source idiom — composing with the
    matched and insert sides; CDF carries all the change types."""
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableChangeDataFeed": "true"},
        name="mbs",
    )
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "A"), (9, "i")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
        when_not_matched_by_source_update={
            "v": "concat(target.v, '_stale')"
        },
        by_source_update_condition="target.k = 2",
        when_not_matched_by_source_delete=True,
    )
    assert counts == {"updated": 2, "deleted": 1, "inserted": 1}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A"), (2, "b_stale"), (9, "i")]
    ch = read_delta_changes(
        spark, tbl, starting_version=ver, ending_version=ver
    )
    types = sorted(
        (r["k"], r["_change_type"]) for r in ch.collect()
    )
    assert types == [
        (1, "update_postimage"),
        (1, "update_preimage"),
        (2, "update_postimage"),
        (2, "update_preimage"),
        (3, "delete"),
        (9, "insert"),
    ]
    ops = _entry_lines(tbl, ver)[0]["commitInfo"][
        "operationParameters"
    ]
    assert "update" in ops["notMatchedBySourcePredicates"]
    assert "delete" in ops["notMatchedBySourcePredicates"]


def test_merge_by_source_delete_only_sync(spark, tmp_path):
    """Delete-only sync: rows absent from the source drop, files
    where EVERY row still matches are not rewritten (apply
    pruning works on the by-source side too)."""
    tbl = _mk_foreign(tmp_path, name="mbs2")
    _seed(spark, tbl, [(1, "a"), (2, "b")])  # file 1
    _seed(spark, tbl, [(3, "c"), (4, "d")])  # file 2
    # source covers ALL of file 1 but only k=3 of file 2
    ver, counts = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "a"), (2, "b"), (3, "c")]),
        "target.k = source.k",
        when_not_matched_by_source_delete=True,
    )
    assert counts == {"updated": 0, "deleted": 1, "inserted": 0}
    lines = _entry_lines(tbl, ver)
    removes = [ln["remove"] for ln in lines[1:] if "remove" in ln]
    file2 = next(
        ln["add"]["path"]
        for ln in _entry_lines(tbl, 2)[1:]
        if "add" in ln
    )
    # only file 2 (holding the unmatched k=4) is rewritten
    assert [r["path"] for r in removes] == [file2]
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_by_source_refusals(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="mbsr")
    _seed(spark, tbl, [(1, "a")])
    src = _src(spark, [(1, "x")])
    with pytest.raises(
        DeltaProtocolError, match="only the target row"
    ):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_by_source_delete=True,
            by_source_delete_condition="source.v IS NULL",
        )
    with pytest.raises(ValueError, match="no SET \\* form"):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_by_source_update=True,
        )
    with pytest.raises(
        ValueError, match="by_source_delete_condition"
    ):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_matched_update={"v": "source.v"},
            by_source_delete_condition="target.k > 0",
        )


def test_merge_ict_monotonic(spark, tmp_path):
    tbl = _mk_foreign(
        tmp_path,
        cfg={"delta.enableInCommitTimestamps": "true"},
        name="mict",
    )
    _seed(spark, tbl, [(1, "a")])
    ver, _ = merge_into_delta(
        spark,
        tbl,
        _src(spark, [(1, "A"), (2, "b")]),
        "target.k = source.k",
        when_matched_update={"v": "source.v"},
        when_not_matched_insert=True,
    )
    lines = _entry_lines(tbl, ver)
    ict = lines[0]["commitInfo"]["inCommitTimestamp"]
    prev = _entry_lines(tbl, ver - 1)[0]["commitInfo"].get(
        "inCommitTimestamp",
        _entry_lines(tbl, ver - 1)[0]["commitInfo"]["timestamp"],
    )
    assert ict > prev


def test_merge_refuses_backticked_alias_conditions(spark, tmp_path):
    """A backtick-quoted qualifier (`target`.v / `source`.k) in a
    clause condition hits the same named refusal as the unquoted
    spelling — not a raw Spark unresolved-reference error."""
    tbl = _mk_foreign(tmp_path, name="btick")
    _seed(spark, tbl, [(1, "a")])
    src = _src(spark, [(2, "x")])
    with pytest.raises(
        DeltaProtocolError, match="only the source row"
    ):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_insert=True,
            insert_condition="`target`.v IS NULL",
        )
    with pytest.raises(
        DeltaProtocolError, match="only the target row"
    ):
        merge_into_delta(
            spark,
            tbl,
            src,
            "target.k = source.k",
            when_not_matched_by_source_delete=True,
            by_source_delete_condition="`source`.k > 0",
        )
