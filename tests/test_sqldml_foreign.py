"""The SQL DML front-end over FOREIGN Delta paths.

``run_dml``'s ``tables`` values may be path strings naming a
stock-owned Delta table (delta-spark's ``delta.`/path``` analogue):
the reference's verbatim MERGE / DELETE / UPDATE / INSERT SQL then
routes onto the foreign-DML engine (merge_into_delta,
delete_from_delta, update_from_delta, append_to_delta) through the
same claim/OCC protocol, while store-lifecycle statements refuse a
path by name.
"""

import pytest

from etl_pipeline_4handling_listings_spark.sources.deltalog import (
    DeltaProtocolError,
    read_delta,
)
from etl_pipeline_4handling_listings_spark.sources.sqldml import (
    DMLParseError,
    run_dml,
)

from test_deltaappend import _entry_lines, _mk_foreign
from test_deltadelete import _seed


def test_foreign_merge_m1_upsert(spark, tmp_path):
    """The reference's M1 statement shape, verbatim, against a
    stock-owned path: matched rows update, the rest insert."""
    tbl = _mk_foreign(tmp_path, name="fsql1")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    spark.createDataFrame(
        [(2, "B"), (5, "e")], "k long, v string"
    ).createOrReplaceTempView("src_m1")
    ver, counts = run_dml(
        spark,
        """
        merge into destination using src_m1 as source
        on destination.k = source.k
        when matched then update set *
        when not matched then insert *
        """,
        tables={"destination": tbl},
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    lines = _entry_lines(tbl, ver)
    assert lines[0]["commitInfo"]["operation"] == "MERGE"
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "a"), (2, "B"), (5, "e")]


def test_foreign_merge_m2_clause_order_and_conditions(
    spark, tmp_path
):
    """M2's shape — conditional update, delete, insert — with the
    statement-order precedence encoded into the conditions."""
    tbl = _mk_foreign(tmp_path, name="fsql2")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    spark.createDataFrame(
        [(1, "A"), (2, None), (9, "i")], "k long, v string"
    ).createOrReplaceTempView("src_m2")
    ver, counts = run_dml(
        spark,
        """
        merge into dst using src_m2 as s
        on dst.k = s.k
        when matched and s.v is not null then update set *
        when matched then delete
        when not matched and s.v is not null then insert *
        """,
        tables={"dst": tbl},
    )
    assert counts == {"updated": 1, "deleted": 1, "inserted": 1}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A"), (3, "c"), (9, "i")]


def test_foreign_merge_m3_changed_only_guard(spark, tmp_path):
    """M3's changed-columns guard: an unchanged match rewrites
    nothing (no remove in the commit), a no-op merge commits
    nothing at all."""
    tbl = _mk_foreign(tmp_path, name="fsql3")
    v1 = _seed(spark, tbl, [(1, "a"), (2, "b")])
    spark.createDataFrame(
        [(1, "a")], "k long, v string"
    ).createOrReplaceTempView("src_m3")
    ver, counts = run_dml(
        spark,
        """
        merge into t using src_m3 as s on t.k = s.k
        when matched and not (t.v <=> s.v) then update set *
        """,
        tables={"t": tbl},
    )
    assert ver == v1
    assert counts == {"updated": 0, "deleted": 0, "inserted": 0}


def test_foreign_delete_update_insert(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="fsql4")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    ver, n = run_dml(
        spark,
        "delete from t where v = 'b'",
        tables={"t": tbl},
    )
    assert n == 1
    ver, n = run_dml(
        spark,
        "update t set v = upper(v) where k = 1",
        tables={"t": tbl},
    )
    assert n == 1
    spark.createDataFrame(
        [(7, "g")], "k long, v string"
    ).createOrReplaceTempView("ins_rows")
    ver = run_dml(
        spark,
        "insert into t select * from ins_rows",
        tables={"t": tbl},
    )
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A"), (3, "c"), (7, "g")]
    lines = _entry_lines(tbl, ver)
    assert lines[0]["commitInfo"]["operation"] == "WRITE"


def test_foreign_merge_m1_on_partitioned_table(spark, tmp_path):
    """The reference's verbatim M1 against a PARTITIONED foreign
    table: SET * covers the partition column (the source must
    provide every table column) and a changed partition value
    MOVES the row — delta-spark's semantics."""
    tbl = _mk_foreign(tmp_path, pcols=("p",), name="fsqlp")
    _seed(
        spark,
        tbl,
        [(1, "a", 10), (2, "b", 20)],
        pcols=("p",),
    )
    spark.createDataFrame(
        [(1, "A", 30), (5, "e", 30)], "k long, v string, p long"
    ).createOrReplaceTempView("src_mp")
    ver, counts = run_dml(
        spark,
        """
        merge into destination using src_mp as source
        on destination.k = source.k
        when matched then update set *
        when not matched then insert *
        """,
        tables={"destination": tbl},
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A", 30), (2, "b", 20), (5, "e", 30)]


def test_foreign_merge_source_aliased_target(spark, tmp_path):
    """A source aliased literally 'target' must not corrupt the
    rewritten ON condition (two-phase sentinel rewrite)."""
    tbl = _mk_foreign(tmp_path, name="fsqla")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    spark.createDataFrame(
        [(1, "HIT")], "k long, v string"
    ).createOrReplaceTempView("src_alias")
    ver, counts = run_dml(
        spark,
        """
        merge into t using src_alias as target
        on t.k = target.k
        when matched then update set *
        """,
        tables={"t": tbl},
    )
    # exactly ONE row matches; a corrupted always-true ON would
    # have updated both
    assert counts == {"updated": 1, "deleted": 0, "inserted": 0}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "HIT"), (2, "b")]


def test_foreign_merge_star_ignores_helper_source_columns(
    spark, tmp_path
):
    """A source helper column used only in a clause condition does
    not break SET * (the engine expands over TABLE columns)."""
    tbl = _mk_foreign(tmp_path, name="fsqlh")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    spark.createDataFrame(
        [(1, "one", True), (2, "two", False)],
        "k long, v string, keep boolean",
    ).createOrReplaceTempView("src_help")
    ver, counts = run_dml(
        spark,
        """
        merge into t using src_help as s on t.k = s.k
        when matched and s.keep then update set *
        """,
        tables={"t": tbl},
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 0}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "one"), (2, "b")]


def test_foreign_merge_not_matched_by_source_delete(
    spark, tmp_path
):
    """The sync-to-source statement: WHEN NOT MATCHED BY SOURCE
    THEN DELETE drops target rows absent from the source."""
    tbl = _mk_foreign(tmp_path, name="fsqlb")
    _seed(spark, tbl, [(1, "a"), (2, "b"), (3, "c")])
    spark.createDataFrame(
        [(1, "A"), (5, "e")], "k long, v string"
    ).createOrReplaceTempView("src_sync")
    ver, counts = run_dml(
        spark,
        """
        merge into t using src_sync as s on t.k = s.k
        when matched then update set *
        when not matched then insert *
        when not matched by source and t.k > 2 then delete
        """,
        tables={"t": tbl},
    )
    assert counts == {"updated": 1, "deleted": 1, "inserted": 1}
    got = sorted(
        (r.k, r.v) for r in read_delta(spark, tbl).collect()
    )
    assert got == [(1, "A"), (2, "b"), (5, "e")]
    # the by-source side refuses on a MergeStore handle and for
    # non-delete actions
    with pytest.raises(DMLParseError, match="foreign Delta paths"):
        from etl_pipeline_4handling_listings_spark.sources.store import (  # noqa: E501
            MergeStore,
        )

        run_dml(
            spark,
            """
            merge into t using src_sync as s on t.k = s.k
            when not matched by source then delete
            """,
            tables={
                "t": MergeStore(
                    spark, str(tmp_path / "ms"), keys=["k"]
                )
            },
        )
    with pytest.raises(DMLParseError, match="THEN DELETE"):
        run_dml(
            spark,
            """
            merge into t using src_sync as s on t.k = s.k
            when not matched by source then update set *
            """,
            tables={"t": tbl},
        )


def test_foreign_lifecycle_statements_refuse(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="fsql5")
    for stmt in (
        "optimize t zorder by (k)",
        "alter table t drop column v",
        "alter table t add constraint c check (k > 0)",
    ):
        with pytest.raises(
            DMLParseError, match="foreign Delta|ZORDER"
        ):
            run_dml(spark, stmt, tables={"t": tbl})


def test_foreign_describe_history_and_detail(spark, tmp_path):
    tbl = _mk_foreign(tmp_path, name="fsqld")
    _seed(spark, tbl, [(1, "a"), (2, "b")])
    run_dml(spark, "delete from t where k = 1", tables={"t": tbl})
    hist = run_dml(spark, "describe history t", tables={"t": tbl})
    rows = hist.collect()
    assert [r.version for r in rows] == [2, 1, 0]
    assert rows[0].operation == "DELETE"
    assert rows[0].operationParameters["predicate"] == "k = 1"
    assert rows[1].operation == "WRITE"
    det = run_dml(
        spark, "describe detail t", tables={"t": tbl}
    ).collect()[0]
    assert det.format == "parquet"
    assert det.numFiles == 1 and det.sizeInBytes > 0
    assert det.partitionColumns == []
    assert det.minReaderVersion == 1


def test_foreign_merge_engine_refusals_surface(spark, tmp_path):
    """Engine-level named refusals (cardinality, appendOnly) pass
    through the SQL layer untranslated."""
    tbl = _mk_foreign(tmp_path, name="fsql6")
    _seed(spark, tbl, [(1, "a")])
    spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    ).createOrReplaceTempView("dup_rows")
    with pytest.raises(
        DeltaProtocolError, match="multiple source rows"
    ):
        run_dml(
            spark,
            """
            merge into t using dup_rows as s on t.k = s.k
            when matched then update set *
            """,
            tables={"t": tbl},
        )
