"""SQL DML front-end: the reference's Delta SQL strings run verbatim.

Each MERGE test renders the same statement SHAPE the reference
renders (mls_listings_curated.py:340-353 M1,
mls_listings_hist_curated.py:195-203 M2,
mls_listings_curated_propid_backfill.py:206-212 M3) and checks the
store lands in the same state the Python-API merge produces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.sqldml import (
    DMLParseError,
    run_dml,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore


def _mk(spark, tmp_path, rows, name="t"):
    store = MergeStore(spark, str(tmp_path / name), keys=["mls", "lid"])
    df = spark.createDataFrame(rows, ["mls", "lid", "price", "status"])
    store.create_if_absent(df)
    store.merge(df)
    return store


BASE = [("A", 1, 100, "open"), ("A", 2, 200, "open"), ("B", 1, 300, "open")]


def test_merge_m1_update_all_insert_all(spark, tmp_path):
    """The curated-load statement: unconditional upsert."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 150, "open"), ("C", 9, 900, "new")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    v = run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched then
            update set *
        when not matched then
            insert *
        """,
        tables={"destination": store},
    )
    assert v == "v00002"
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 1): 150, ("A", 2): 200, ("B", 1): 300, ("C", 9): 900}


def test_merge_m2_flagged_update_delete_insert(spark, tmp_path):
    """The history-table statement: update when flagged true AND
    changed, delete when flagged false, insert new flagged rows."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [
            ("A", 1, 150, "open", True),   # flagged + changed -> update
            ("A", 2, 200, "open", True),   # flagged, unchanged -> keep
            ("B", 1, 300, "open", False),  # flagged false -> delete
            ("D", 7, 700, "new", True),    # new + flagged -> insert
            ("E", 8, 800, "new", False),   # new but unflagged -> drop
        ],
        ["mls", "lid", "price", "status", "_insert_update_flag"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched and (source._insert_update_flag = true and
              (not (destination.price <=> source.price))) then
            update set *
        when matched and source._insert_update_flag = false then
            delete
        when not matched and source._insert_update_flag = true then
            insert *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 1): 150, ("A", 2): 200, ("D", 7): 700}


def test_merge_m3_changed_only_guard(spark, tmp_path):
    """The backfill statement: update only when the tracked column
    actually changed; unchanged matches burn no churn."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 100, "open"), ("A", 2, 999, "open")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched and (not (destination.price <=> source.price)) then
            update set *
        when not matched then
            insert *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 1): 100, ("A", 2): 999, ("B", 1): 300}


def test_merge_delete_before_update_clause_order(spark, tmp_path):
    """Delta stops at the first matching clause: with DELETE first,
    a row both clauses claim must be DELETED, not updated."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 150, "kill"), ("A", 2, 999, "ok")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched and source.status = 'kill' then delete
        when matched then update set *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 2): 999, ("B", 1): 300}


def test_merge_subquery_source_and_aliases(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 175, "open", 1), ("A", 1, 150, "open", 2)],
        ["mls", "lid", "price", "status", "rank"],
    ).createOrReplaceTempView("raw")
    run_dml(
        spark,
        """
        merge into destination as d
        using (select mls, lid, price, status from raw where rank = 1) as s
        on d.mls = s.mls and d.lid = s.lid
        when matched then update set *
        when not matched then insert *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got[("A", 1)] == 175


def test_delete_update_insert_vacuum_restore_history(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)
    t = {"t": store}
    run_dml(spark, "DELETE FROM t WHERE status = 'open' AND mls = 'B'", t)
    assert sorted((r.mls, r.lid) for r in store.read().collect()) == [
        ("A", 1),
        ("A", 2),
    ]
    run_dml(spark, "UPDATE t SET price = price + 1 WHERE lid = 2", t)
    assert {r.lid: r.price for r in store.read().collect()}[2] == 201
    spark.createDataFrame(
        [("Z", 5, 500, "new")], ["mls", "lid", "price", "status"]
    ).createOrReplaceTempView("newrows")
    run_dml(spark, "INSERT INTO t TABLE newrows", t)
    assert store.read().count() == 3
    run_dml(
        spark,
        "INSERT INTO t SELECT 'Y' AS mls, 6 AS lid, 600 AS price, "
        "'new' AS status",
        t,
    )
    assert store.read().count() == 4
    hist = run_dml(spark, "DESCRIBE HISTORY t", t)
    assert hist.count() >= 5
    doomed = run_dml(spark, "VACUUM t RETAIN 2 VERSIONS DRY RUN", t)
    assert doomed and all(v.startswith("v") for v in doomed)
    before = store.read().count()
    run_dml(spark, "VACUUM t RETAIN 2 VERSIONS", t)
    assert store.read().count() == before  # current snapshot untouched
    cur = store.current_version()
    run_dml(
        spark,
        f"RESTORE TABLE t TO VERSION AS OF {int(cur[1:]) - 1}",
        t,
    )
    assert store.read().count() == before - 1


def test_dialect_errors_are_named(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)
    t = {"destination": store}
    with pytest.raises(DMLParseError, match="unknown table"):
        run_dml(spark, "DELETE FROM nope", t)
    with pytest.raises(DMLParseError, match="equi-join|side.col"):
        run_dml(
            spark,
            "merge into destination using source on destination.mls "
            "> source.mls when matched then update set *",
            t,
        )
    with pytest.raises(DMLParseError, match="MergeStore.update"):
        spark.createDataFrame(
            [("A", 1, 1, "x")], ["mls", "lid", "price", "status"]
        ).createOrReplaceTempView("source")
        run_dml(
            spark,
            "merge into destination using source on destination.mls = "
            "source.mls and destination.lid = source.lid when matched "
            "then update set price = source.price",
            t,
        )
    with pytest.raises(DMLParseError, match="ON keys"):
        run_dml(
            spark,
            "merge into destination using source on destination.mls = "
            "source.mls when matched then update set *",
            t,
        )
    with pytest.raises(DMLParseError, match="unsupported statement"):
        run_dml(spark, "TRUNCATE TABLE destination", t)


def test_describe_detail_optimize_clone(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)
    t = {"t": store, "t2": MergeStore(spark, str(tmp_path / "t2"), keys=["mls", "lid"])}
    d = run_dml(spark, "DESCRIBE DETAIL t", t).collect()[0]
    assert d.current_version == "v00001"
    assert d.num_files >= 1 and d.size_bytes > 0
    assert d.keys == "lid,mls" or d.keys == "mls,lid"
    v = run_dml(spark, "OPTIMIZE t", t)
    assert v is None or v.startswith("v")  # no-op or a commit
    run_dml(spark, "CREATE TABLE t2 CLONE t", t)
    assert t["t2"].read().count() == store.read().count()
    with pytest.raises(DMLParseError):
        run_dml(spark, "OPTIMIZE t ZORDER", t)


def test_string_literals_never_steer_the_parse(spark, tmp_path):
    """Dots, keywords, and alias names INSIDE string values must
    neither corrupt the statement nor trip qualifier validation —
    parsing runs on literal-masked text."""
    store = _mk(spark, tmp_path, BASE)
    t = {"destination": store, "t": store}
    # literal containing word-dot sequences and the alias name
    spark.createDataFrame(
        [("A", 1, 150, "closed.by.agent")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        "merge into destination using source on destination.mls = "
        "source.mls and destination.lid = source.lid when matched "
        "and source.status = 'closed.by.agent' then update set * "
        "when not matched then insert *",
        t,
    )
    st = {(r.mls, r.lid): r.status for r in store.read().collect()}
    assert st[("A", 1)] == "closed.by.agent"
    # ' where ' inside a literal must not split UPDATE's condition
    run_dml(spark, "UPDATE t SET status = 'a where b' WHERE lid = 2", t)
    st = {(r.mls, r.lid): r.status for r in store.read().collect()}
    assert st[("A", 2)] == "a where b"
    assert st[("A", 1)] == "closed.by.agent"
    # a literal mentioning the destination alias survives verbatim
    run_dml(
        spark,
        "UPDATE t SET status = 'see destination.notes' WHERE mls = 'A' "
        "AND lid = 1",
        t,
    )
    st = {(r.mls, r.lid): r.status for r in store.read().collect()}
    assert st[("A", 1)] == "see destination.notes"


def test_on_clause_is_case_insensitive(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 175, "x")], ["mls", "lid", "price", "status"]
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        "merge into destination using source on destination.MLS = "
        "source.mls and destination.LID = source.lid "
        "when matched then update set *",
        {"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got[("A", 1)] == 175 and got[("B", 1)] == 300


def test_merge_statement_property_vs_direct_api(spark, tmp_path):
    """Property: for random clause-shape combinations, the SQL
    front-end lands the store in exactly the state the direct
    Python-API merge produces. Deterministic enumeration (all 2^3-1
    clause subsets x conditional/unconditional update), one Spark
    session — a hypothesis strategy would re-randomize what is a
    small finite space."""
    from itertools import product

    from etl_pipeline_4handling_listings_spark.operators.merge import (
        merge_upsert,
    )

    src_rows = [
        ("A", 1, 150, "upd"),
        ("A", 2, 200, "del"),
        ("C", 9, 900, "new"),
        ("D", 8, 800, "del"),
    ]
    case_i = 0
    for has_u, has_d, has_i in product([True, False], repeat=3):
        if not (has_u or has_d or has_i):
            continue
        for cond_u in (True, False):
            case_i += 1
            store = _mk(
                spark, tmp_path, BASE, name=f"prop{case_i}"
            )
            spark.createDataFrame(
                src_rows, ["mls", "lid", "price", "status"]
            ).createOrReplaceTempView("source")
            clauses = []
            if has_u:
                clauses.append(
                    "when matched and source.status = 'upd' then "
                    "update set *"
                    if cond_u
                    else "when matched then update set *"
                )
            if has_d:
                clauses.append(
                    "when matched and source.status = 'del' then delete"
                )
            if has_i:
                clauses.append("when not matched then insert *")
            sql = (
                "merge into destination using source on "
                "destination.mls = source.mls and destination.lid = "
                "source.lid " + " ".join(clauses)
            )
            if has_u and not cond_u and has_d:
                # Delta rejects this shape (AnalysisException: only
                # the last MATCHED clause may omit its condition) —
                # the delete clause is unreachable behind the
                # unconditional update; parity means a named error
                with pytest.raises(DMLParseError, match="unreachable"):
                    run_dml(spark, sql, {"destination": store})
                continue
            run_dml(spark, sql, {"destination": store})
            got = sorted(
                (r.mls, r.lid, r.price)
                for r in store.read().collect()
            )
            # oracle: the direct relational merge with equivalent
            # condition callables
            import pyspark.sql.functions as F_

            target = spark.createDataFrame(
                BASE, ["mls", "lid", "price", "status"]
            )
            source = spark.createDataFrame(
                src_rows, ["mls", "lid", "price", "status"]
            )
            upd_c = (
                (lambda t, s: s["status"] == "upd")
                if (has_u and cond_u)
                else None
            )
            # clause order: update first (as rendered), so no
            # delete-guard composition needed
            want_df = merge_upsert(
                target,
                source,
                ["mls", "lid"],
                update_condition=(
                    upd_c
                    if has_u
                    else (lambda t, s: F_.lit(False))
                ),
                delete_condition=(
                    (lambda t, s: s["status"] == "del")
                    if has_d
                    else None
                ),
                insert_condition=(
                    None if has_i else (lambda t, s: F_.lit(False))
                ),
            )
            want = sorted(
                (r.mls, r.lid, r.price) for r in want_df.collect()
            )
            assert got == want, (sql, got, want)


def test_merge_two_update_clauses_first_match_precedence(spark, tmp_path):
    """Two WHEN MATCHED ... UPDATE SET * clauses: Delta updates rows
    matching c1 OR c2 (first matching clause fires; same action, so
    the union). The old parser last-won and updated only c2 rows."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 150, "upd1"), ("A", 2, 250, "upd2"), ("B", 1, 350, "no")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched and source.status = 'upd1' then update set *
        when matched and source.status = 'upd2' then update set *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 1): 150, ("A", 2): 250, ("B", 1): 300}


def test_merge_update_delete_update_statement_order(spark, tmp_path):
    """UPDATE c1 / DELETE c2 / UPDATE c3 in statement order: a row
    matching c1 updates even if it also matches c2 (first clause
    wins); a row matching only c2 deletes; a row matching only c3
    updates."""
    store = _mk(
        spark,
        tmp_path,
        [("A", 1, 100, "o"), ("A", 2, 200, "o"), ("B", 1, 300, "o")],
    )
    spark.createDataFrame(
        # row 1 matches both c1 and c2 -> update (c1 first)
        # row 2 matches only c2 -> delete
        # row 3 matches only c3 -> update
        [("A", 1, 111, "both"), ("A", 2, 222, "del"), ("B", 1, 333, "late")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched and source.status in ('both') then update set *
        when matched and source.status in ('both', 'del') then delete
        when matched and source.status = 'late' then update set *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 1): 111, ("B", 1): 333}


def test_merge_unconditional_delete_deletes(spark, tmp_path):
    """WHEN MATCHED THEN DELETE with no condition must delete every
    matched row (the old parser passed delete_condition=None, which
    the engine reads as 'no delete clause')."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 0, "x"), ("Z", 9, 900, "new")],
        ["mls", "lid", "price", "status"],
    ).createOrReplaceTempView("source")
    run_dml(
        spark,
        """
        merge into destination using source
        on destination.mls = source.mls and destination.lid = source.lid
        when matched then delete
        when not matched then insert *
        """,
        tables={"destination": store},
    )
    got = {(r.mls, r.lid): r.price for r in store.read().collect()}
    assert got == {("A", 2): 200, ("B", 1): 300, ("Z", 9): 900}


def test_merge_unconditional_then_conditional_same_side_rejected(
    spark, tmp_path
):
    """Delta parity: only the LAST clause of a side may omit its
    condition; a clause behind an unconditional one is unreachable
    and the statement is rejected with a named error."""
    store = _mk(spark, tmp_path, BASE)
    spark.createDataFrame(
        [("A", 1, 150, "u")], ["mls", "lid", "price", "status"]
    ).createOrReplaceTempView("source")
    with pytest.raises(DMLParseError, match="unreachable"):
        run_dml(
            spark,
            """
            merge into destination using source
            on destination.mls = source.mls
               and destination.lid = source.lid
            when matched then update set *
            when matched and source.status = 'u' then delete
            """,
            tables={"destination": store},
        )


def test_alter_table_constraints_and_clustering(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)
    t = {"t": store}
    run_dml(
        spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (price > 0)", t
    )
    assert "pos" in store.constraints()
    # the constraint is live: a violating merge must abort
    spark.createDataFrame(
        [("Z", 9, -5, "bad")], ["mls", "lid", "price", "status"]
    ).createOrReplaceTempView("viol")
    with pytest.raises(Exception, match="pos|constraint"):
        run_dml(
            spark,
            "merge into t using viol on t.mls = viol.mls and "
            "t.lid = viol.lid when not matched then insert *",
            t,
        )
    run_dml(spark, "ALTER TABLE t DROP CONSTRAINT pos", t)
    assert "pos" not in store.constraints()
    run_dml(spark, "ALTER TABLE t CLUSTER BY (price)", t)
    assert store.clustering() == ["price"]
    run_dml(spark, "ALTER TABLE t CLUSTER BY NONE", t)
    assert store.clustering() == []


def test_alter_table_add_columns_metadata_only(spark, tmp_path):
    """ALTER TABLE ADD COLUMNS: a metadata-only commit — existing
    rows read NULL for the new columns, time travel keeps the old
    narrow schema, and the change feed skips the commit
    (data_change=false: no phantom all-rows-updated diff)."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _plan_diff_partitions,
    )

    store = _mk(spark, tmp_path, BASE)  # v1
    v = run_dml(
        spark, "ALTER TABLE t ADD COLUMNS (score double, tag string)", t := {"t": store}
    )
    assert v == "v00002"
    out = store.read()
    assert dict(out.dtypes)["score"] == "double"
    assert dict(out.dtypes)["tag"] == "string"
    assert out.filter(F.col("score").isNull()).count() == len(BASE)
    # time travel: the old snapshot keeps its narrower schema
    assert "score" not in store.read_version("v00001").columns
    # duplicate add is a named error
    with pytest.raises(ValueError, match="already exist"):
        store.add_columns({"score": "double"})
    # CDC: the metadata commit is absent from the diff plan
    steps = {p.v_new for p in _plan_diff_partitions(store.path, 0, 2, ["mls", "lid"])}
    assert steps == {"v00001"}
    # the widened schema is writable: a merge filling the column
    spark.createDataFrame(
        [("A", 1, 100, "open", 0.9, "kept")],
        ["mls", "lid", "price", "status", "score", "tag"],
    ).createOrReplaceTempView("fills")
    run_dml(
        spark,
        "merge into t using fills on t.mls = fills.mls and "
        "t.lid = fills.lid when matched then update set *",
        t,
    )
    got = {
        (r["mls"], r["lid"]): (r["score"], r["tag"])
        for r in store.read().collect()
    }
    assert got[("A", 1)] == (0.9, "kept")
    assert got[("B", 1)] == (None, None)


def test_restore_to_timestamp_and_reorg_purge(spark, tmp_path):
    store = _mk(spark, tmp_path, BASE)  # v1
    import json
    import os
    import time

    # pin v1's manifest timestamp well in the past so the boundary
    # is unambiguous without sleeping
    c1 = os.path.join(store.path, "_COMMITS", "v00001.json")
    rec = json.load(open(c1))
    rec["ts"] = time.time() - 3600
    with open(c1, "w") as f:
        json.dump(rec, f)
    cutoff = time.time() - 1800
    spark.createDataFrame(
        [("A", 1, 999, "hot")], ["mls", "lid", "price", "status"]
    ).createOrReplaceTempView("s2")
    run_dml(
        spark,
        "merge into t using s2 on t.mls = s2.mls and t.lid = s2.lid "
        "when matched then update set *",
        {"t": store},
    )  # v2 (now)
    import datetime as dt

    iso = dt.datetime.fromtimestamp(
        cutoff, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    v = run_dml(
        spark,
        f"RESTORE TABLE t TO TIMESTAMP AS OF '{iso}'",
        {"t": store},
    )
    assert v == "v00003"
    prices = {
        (r["mls"], r["lid"]): r["price"] for r in store.read().collect()
    }
    assert prices[("A", 1)] == 100  # v1 content restored
    # REORG APPLY (PURGE): rewrites DV-holding partitions
    store.delete("lid = 2")
    v = run_dml(spark, "REORG TABLE t APPLY (PURGE)", {"t": store})
    assert v is None or v.startswith("v")
    assert store.read().filter("lid = 2").count() == 0


def test_alter_table_drop_column(spark, tmp_path):
    """Logical DROP COLUMN: metadata-only commit, column gone from
    every read path, old versions keep it, the name is retired
    against resurrection, guards refuse structural columns, and the
    change feed skips the commit."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _plan_diff_partitions,
    )

    store = _mk(spark, tmp_path, BASE)  # v1
    t = {"t": store}
    v = run_dml(spark, "ALTER TABLE t DROP COLUMN status", t)
    assert v == "v00002"
    assert "status" not in store.read().columns
    assert "status" in store.read_version("v00001").columns
    # CDC: metadata-only, absent from the diff plan
    steps = {
        p.v_new
        for p in _plan_diff_partitions(store.path, 0, 2, ["mls", "lid"])
    }
    assert steps == {"v00001"}
    # resurrection guard
    with pytest.raises(ValueError, match="previously dropped"):
        store.add_columns({"status": "string"})
    # a different name is fine
    assert store.add_columns({"state": "string"}) == "v00003"
    # guards: merge keys and referenced columns refuse
    with pytest.raises(ValueError, match="merge key"):
        store.drop_column("mls")
    store.add_constraint("pp", "price >= 0")
    with pytest.raises(ValueError, match="constraint"):
        store.drop_column("price")
    # a merge against the narrowed schema round-trips
    spark.createDataFrame(
        [("A", 1, 111, "ok")], ["mls", "lid", "price", "state"]
    ).createOrReplaceTempView("nstate")
    run_dml(
        spark,
        "merge into t using nstate on t.mls = nstate.mls and "
        "t.lid = nstate.lid when matched then update set *",
        t,
    )
    got = {
        (r["mls"], r["lid"]): (r["price"], r["state"])
        for r in store.read().collect()
    }
    assert got[("A", 1)] == (111, "ok")
    assert got[("B", 1)] == (300, None)


def test_drop_column_then_optimize_rewrites_without_it(spark, tmp_path):
    """DROP COLUMN composes with OPTIMIZE: compaction reads through
    the narrowed snapshot schema, so rewritten files physically lose
    the dropped column while time travel to the pre-drop version
    still reads it (its files are untouched)."""
    import glob
    import os

    import pyarrow.parquet as pq

    store = _mk(spark, tmp_path, BASE)  # v1
    store.append(
        spark.createDataFrame(
            [("C", 5, 500, "new")], ["mls", "lid", "price", "status"]
        )
    )  # v2: appended file set so optimize has >=2 files to pack
    store.drop_column("status")  # v3
    v = store.optimize(min_files=2)
    assert v == "v00004"
    # rewritten current files physically lack the dropped column
    vdir = os.path.join(store.path, "v00004")
    phys = set()
    for f in glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True):
        if "_dv" in f:
            continue
        phys |= set(pq.read_schema(f).names)
    assert "status" not in phys
    # current read: narrowed; pre-drop version: still has it
    assert "status" not in store.read().columns
    assert "status" in store.read_version("v00002").columns
    got = {r["mls"]: r["price"] for r in store.read().collect()}
    assert got == {"A": 200, "B": 300, "C": 500} or len(got) == 4


def test_alter_table_rename_column(spark, tmp_path):
    """RENAME COLUMN: explicit-cost rewrite — data carries to the new
    name, the old name is tombstoned (no resurrection through
    ADD COLUMNS), CDC skips the row-preserving commit, old versions
    keep the old name, and structural columns refuse."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        _plan_diff_partitions,
    )

    store = _mk(spark, tmp_path, BASE)  # v1
    t = {"t": store}
    v = run_dml(spark, "ALTER TABLE t RENAME COLUMN status TO state", t)
    assert v == "v00002"
    out = store.read()
    assert "state" in out.columns and "status" not in out.columns
    got = {(r["mls"], r["lid"]): r["state"] for r in out.collect()}
    assert got == {("A", 1): "open", ("A", 2): "open", ("B", 1): "open"}
    # time travel keeps the old name
    assert "status" in store.read_version("v00001").columns
    # old name is retired
    with pytest.raises(ValueError, match="previously dropped"):
        store.add_columns({"status": "string"})
    # the rename commit is invisible to the change feed
    steps = {
        p.v_new
        for p in _plan_diff_partitions(store.path, 0, 2, ["mls", "lid"])
    }
    assert steps == {"v00001"}
    # guards
    with pytest.raises(ValueError, match="merge key"):
        store.rename_column("mls", "mls2")
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("price", "state")
    # merges keep working against the renamed schema
    spark.createDataFrame(
        [("A", 1, 110, "sold")], ["mls", "lid", "price", "state"]
    ).createOrReplaceTempView("rsrc")
    run_dml(
        spark,
        "merge into t using rsrc on t.mls = rsrc.mls and "
        "t.lid = rsrc.lid when matched then update set *",
        t,
    )
    assert {
        r["state"] for r in store.read().filter("lid = 1 and mls = 'A'").collect()
    } == {"sold"}
