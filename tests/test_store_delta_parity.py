"""Delta-parity store surfaces: RESTORE, CHECK constraints, merge
schema evolution, and bloom-filter file skipping.

Reference semantics: Delta Lake's RESTORE TABLE, ALTER TABLE ADD
CONSTRAINT / invariant enforcement, MERGE withSchemaEvolution, and
bloom filter indexes — re-expressed over the MergeStore commit
protocol (reference mls_listings_curated.py:321-368 is the Delta
surface the store stands in for).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.fileindex import (
    build_file_bloom,
    read_with_skip_eq,
)
from etl_pipeline_4handling_listings_spark.sources.store import (
    ConstraintViolationError,
    MergeStore,
    build_store_bloom,
    read_store_skip_eq,
)


def _mk(spark, tmp_path, rows, partition_by=None, name="store"):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    df = spark.createDataFrame(rows, ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    return store


# -- RESTORE -----------------------------------------------------------


def test_restore_roundtrip(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1
    store.merge(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]))
    assert store.current_version() == "v00002"

    restored = store.restore("v00001")
    assert restored == "v00003"
    assert store.current_version() == "v00003"
    assert {r["k"]: r["v"] for r in store.read().collect()} == {
        1: "a",
        2: "b",
    }
    # forward-only: the restored-over version stays time-travelable
    assert {
        r["k"]: r["v"] for r in store.read_version("v00002").collect()
    } == {1: "a", 2: "B", 3: "c"}
    # and the commit log records the operation
    h = {r["version"]: r for r in store.history().collect()}
    assert h["v00003"]["operation"] == "restore"
    assert h["v00003"]["restore_of"] == "v00001"
    assert h["v00001"]["operation"] is None  # plain merge

    # the store keeps working: merge on top of the restore
    store.merge(spark.createDataFrame([(4, "d")], ["k", "v"]))
    assert store.read().count() == 3


def test_restore_unknown_version_raises(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a")])
    with pytest.raises(FileNotFoundError):
        store.restore("v00099")


def test_restore_survives_vacuum_of_newer(spark, tmp_path):
    """Restored snapshot hardlinks: vacuuming the source version
    afterwards must not damage the restored (current) content."""
    store = _mk(spark, tmp_path, [(1, "a")])  # v1
    store.merge(spark.createDataFrame([(1, "x")], ["k", "v"]))  # v2
    store.restore("v00001")  # v3
    store.vacuum(keep=1)
    assert store.list_versions() == ["v00003"]
    assert store.read().collect()[0]["v"] == "a"


# -- timestampAsOf / CONVERT / CLONE -----------------------------------


def test_read_as_of_timestamp(spark, tmp_path):
    import time as _time

    store = _mk(spark, tmp_path, [(1, "a")])  # v1
    t_after_v1 = _time.time() + 0.05
    _time.sleep(0.1)  # commit clocks are second-granularity floats
    store.merge(spark.createDataFrame([(1, "x")], ["k", "v"]))  # v2

    assert store.read_as_of(t_after_v1).collect()[0]["v"] == "a"
    assert store.read_as_of(_time.time()).collect()[0]["v"] == "x"
    with pytest.raises(FileNotFoundError):
        store.read_as_of(0)  # before the table existed


def test_convert_existing_parquet_dir(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], ["k", "v"]
    ).write.parquet(path)

    store = MergeStore.convert(spark, path, keys=["k"])
    assert store.current_version() == "v00000"
    assert {r["k"]: r["v"] for r in store.read().collect()} == {
        1: "a",
        2: "b",
    }
    h = {r["version"]: r for r in store.history().collect()}
    assert h["v00000"]["operation"] == "convert"
    # adopted in place: no stray data files left at the root
    import os

    root_files = [
        e
        for e in os.listdir(path)
        if not e.startswith(("_", ".")) and e != "v00000"
    ]
    assert root_files == []

    # the full merge lifecycle works on the adopted table
    store.merge(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]))
    assert {r["k"]: r["v"] for r in store.read().collect()} == {
        1: "a",
        2: "B",
        3: "c",
    }
    # idempotent: converting again just opens the store
    again = MergeStore.convert(spark, path, keys=["k"])
    assert again.current_version() == store.current_version()


def test_clone_is_independent(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a")])
    store.add_constraint("k_pos", "k > 0")
    clone = store.clone(str(tmp_path / "clone"))

    assert clone.current_version() == "v00000"
    assert clone.read().collect()[0]["v"] == "a"
    assert clone.constraints() == {"k_pos": "k > 0"}

    # diverge both sides: no cross-talk
    store.merge(spark.createDataFrame([(1, "src")], ["k", "v"]))
    clone.merge(spark.createDataFrame([(1, "cln")], ["k", "v"]))
    assert store.read().collect()[0]["v"] == "src"
    assert clone.read().collect()[0]["v"] == "cln"
    # the clone enforces the carried constraint
    with pytest.raises(ConstraintViolationError):
        clone.merge(spark.createDataFrame([(-1, "z")], ["k", "v"]))
    # cloning onto an existing store refuses
    with pytest.raises(FileExistsError):
        store.clone(str(tmp_path / "clone"))


# -- CHECK constraints -------------------------------------------------


def test_constraint_blocks_violating_merge(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a")])
    store.add_constraint("v_not_blank", "length(v) > 0")
    assert store.constraints() == {"v_not_blank": "length(v) > 0"}

    before = store.current_version()
    with pytest.raises(ConstraintViolationError):
        store.merge(spark.createDataFrame([(2, "")], ["k", "v"]))
    # aborted pre-claim: pointer unchanged, no stray snapshot dirs
    assert store.current_version() == before
    assert store.list_versions()[-1] == before

    # a clean merge still commits and a later violation still trips
    store.merge(spark.createDataFrame([(2, "ok")], ["k", "v"]))
    assert store.read().count() == 2
    with pytest.raises(ConstraintViolationError):
        store.merge(spark.createDataFrame([(3, "")], ["k", "v"]))


def test_constraint_null_passes_sql_check_semantics(spark, tmp_path):
    """SQL CHECK: NULL predicate result is NOT a violation."""
    store = _mk(spark, tmp_path, [(1, "a")])
    store.add_constraint("len_gt0", "length(v) > 0")
    store.merge(
        spark.createDataFrame([(5, None)], "k bigint, v string")
    )
    assert store.read().filter(F.col("v").isNull()).count() == 1


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, ""), (2, "b")])
    with pytest.raises(ConstraintViolationError):
        store.add_constraint("v_not_blank", "length(v) > 0")
    assert store.constraints() == {}
    store.drop_constraint("nope")  # dropping a non-constraint is a no-op
    store.add_constraint("k_pos", "k > 0")  # satisfiable one adds fine
    assert "k_pos" in store.constraints()


def test_constraint_enforced_on_partitioned_merge(spark, tmp_path):
    store = MergeStore(
        spark, str(tmp_path / "pstore"), keys=["k"], partition_by="b"
    )
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], ["k", "v", "b"]
    )
    store.create_if_absent(df)
    store.merge(df)
    store.add_constraint("v_not_blank", "length(v) > 0")
    before = store.current_version()
    with pytest.raises(ConstraintViolationError):
        store.merge(
            spark.createDataFrame([(3, "", 0)], ["k", "v", "b"])
        )
    assert store.current_version() == before
    store.merge(spark.createDataFrame([(3, "c", 0)], ["k", "v", "b"]))
    assert store.read().count() == 3


# -- merge schema evolution --------------------------------------------


def test_schema_evolution_adds_column(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])  # v1: (k, v)
    src = spark.createDataFrame(
        [(2, "B", 7), (3, "c", 9)], ["k", "v", "score"]
    )
    store.merge(src, schema_evolution=True)  # v2: (k, v, score)

    cur = store.read()
    assert cur.columns == ["k", "v", "score"]
    got = {r["k"]: (r["v"], r["score"]) for r in cur.collect()}
    assert got == {1: ("a", None), 2: ("B", 7), 3: ("c", 9)}

    # time travel keeps the narrower pre-evolution schema
    assert store.read_version("v00001").columns == ["k", "v"]

    # subsequent merges see the evolved schema without the flag
    store.merge(
        spark.createDataFrame([(4, "d", 1)], ["k", "v", "score"])
    )
    assert store.read().filter("k = 4").collect()[0]["score"] == 1


def test_no_evolution_drops_extra_source_columns(spark, tmp_path):
    """Default merge keeps condition-only helper columns out of the
    table (the pre-existing contract)."""
    store = _mk(spark, tmp_path, [(1, "a")])
    store.merge(
        spark.createDataFrame([(2, "b", True)], ["k", "v", "_changed"])
    )
    assert store.read().columns == ["k", "v"]


def test_schema_evolution_partitioned(spark, tmp_path):
    store = MergeStore(
        spark, str(tmp_path / "pstore"), keys=["k"], partition_by="b"
    )
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], ["k", "v", "b"]
    )
    store.create_if_absent(df)
    store.merge(df)
    # evolve while touching ONLY partition 0: partition 1's files
    # lack the new column on disk and must read as NULL
    store.merge(
        spark.createDataFrame([(3, "c", 0, 5)], ["k", "v", "b", "s"]),
        schema_evolution=True,
    )
    got = {
        r["k"]: r["s"] for r in store.read().collect()
    }
    assert got == {1: None, 2: None, 3: 5}
    assert set(store.read().columns) == {"k", "v", "b", "s"}


def test_evolution_survives_optimize_and_restore(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a")])
    store.merge(
        spark.createDataFrame([(2, "b", 3)], ["k", "v", "s"]),
        schema_evolution=True,
    )  # v2 evolved
    store.merge(spark.createDataFrame([(4, "d", 8)], ["k", "v", "s"]))
    v = store.optimize(min_files=1)
    if v is not None:  # compaction may be a no-op on tiny stores
        assert store.read().columns == ["k", "v", "s"]
    store.restore("v00001")
    assert store.read().columns == ["k", "v"]  # pre-evolution schema
    store.restore(store.list_versions()[-2])  # back to an evolved one
    assert "s" in store.read().columns


# -- bloom-filter file skipping ----------------------------------------


def test_bloom_skip_prunes_files(spark, tmp_path):
    path = str(tmp_path / "t")
    # 8 files, disjoint key ranges -> a point lookup lives in 1 file
    df = spark.range(0, 800).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("uid"),
    )
    df.repartitionByRange(8, "k").write.parquet(path)
    n = build_file_bloom(spark, path, "uid")
    assert n == 8

    hit = read_with_skip_eq(spark, path, "uid", "u123")
    assert [r["k"] for r in hit.collect()] == [123]
    # the bloom pruned the file list well below the full 8
    assert len(hit.inputFiles()) < 8

    # absent value: typically zero files survive; result is empty
    miss = read_with_skip_eq(spark, path, "uid", "u99999")
    assert miss.count() == 0

    # unindexed column: falls back to a full scan, same answer
    full = read_with_skip_eq(spark, path, "k", 123)
    assert full.collect()[0]["uid"] == "u123"
    assert len(full.inputFiles()) == 8


def test_bloom_skip_no_false_negatives(spark, tmp_path):
    """Every present value must be found — bloom prunes may only
    drop files that provably lack the value."""
    path = str(tmp_path / "t")
    spark.range(0, 300).select(
        (F.col("id") % 50).alias("g"), F.col("id").alias("k")
    ).repartition(6).write.parquet(path)
    build_file_bloom(spark, path, "k", num_bits=1 << 10)
    for probe in (0, 7, 123, 299):
        got = read_with_skip_eq(spark, path, "k", probe).count()
        assert got == 1, f"k={probe} lost by bloom pruning"


def test_store_bloom_wrappers(spark, tmp_path):
    store = MergeStore(spark, str(tmp_path / "s"), keys=["k"])
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("doc"),
    )
    store.create_if_absent(df)
    store.merge(df.repartitionByRange(5, "k"))
    assert build_store_bloom(store, "doc") >= 1
    got = read_store_skip_eq(store, "doc", "d42")
    assert [r["k"] for r in got.collect()] == [42]


# -- generated columns + VACUUM DRY RUN --------------------------------


def test_generated_column_filled_and_enforced(spark, tmp_path):
    """GENERATED ALWAYS AS: a merge source missing the column gets
    it computed; a source providing WRONG values is rejected on the
    written rows before any commit claim."""
    store = MergeStore(spark, str(tmp_path / "gen"), keys=["k"])
    store.add_generated_column("vlen", "length(v)")
    df = spark.createDataFrame([(1, "abc"), (2, "de")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)  # vlen absent -> computed
    got = {r["k"]: r["vlen"] for r in store.read().collect()}
    assert got == {1: 3, 2: 2}

    bad = spark.createDataFrame([(3, "xyz", 99)], ["k", "v", "vlen"])
    before = store.current_version()
    with pytest.raises(ConstraintViolationError):
        store.merge(bad)
    assert store.current_version() == before
    # consistent explicit values are fine
    store.merge(spark.createDataFrame([(3, "xyz", 3)], ["k", "v", "vlen"]))
    assert store.read().count() == 3


def test_generated_partition_column_end_to_end(spark, tmp_path):
    """The headline use: a derived partition column writers never
    populate. Generation runs before the merge's touched-partition
    collection, so pruning and conflict metadata see it."""
    import json as _json
    import os

    store = MergeStore(
        spark, str(tmp_path / "genp"), keys=["k"], partition_by="b"
    )
    store.add_generated_column("b", "k % 2")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    v = store.merge(spark.createDataFrame([(4, "c")], ["k", "v"]))
    got = {r["k"]: r["b"] for r in store.read().collect()}
    assert got == {1: 1, 2: 0, 4: 0}
    with open(
        os.path.join(store.path, "_COMMITS", f"{v}.json")
    ) as f:
        assert _json.load(f)["touched"] == ["0"]  # only b=0 rewritten


def test_generated_column_recomputed_on_update(spark, tmp_path):
    store = MergeStore(spark, str(tmp_path / "genu"), keys=["k"])
    store.add_generated_column("vlen", "length(v)")
    df = spark.createDataFrame([(1, "abc")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    store.update("k = 1", {"v": "'longer'"})  # merge-on-read path
    row = store.read().collect()[0]
    assert (row["v"], row["vlen"]) == ("longer", 6)
    store.update("k = 1", {"v": "'x'"}, rewrite=True)  # CoW path
    row = store.read().collect()[0]
    assert (row["v"], row["vlen"]) == ("x", 1)
    with pytest.raises(ValueError, match="GENERATED"):
        store.update("k = 1", {"vlen": "99"})


def test_generated_columns_carry_on_clone(spark, tmp_path):
    store = MergeStore(spark, str(tmp_path / "genc"), keys=["k"])
    store.add_generated_column("vlen", "length(v)")
    df = spark.createDataFrame([(1, "ab")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    clone = store.clone(str(tmp_path / "genc2"))
    assert clone.generated_columns() == {"vlen": "length(v)"}
    clone.merge(spark.createDataFrame([(2, "xyz")], ["k", "v"]))
    got = {r["k"]: r["vlen"] for r in clone.read().collect()}
    assert got == {1: 2, 2: 3}


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    store = MergeStore(spark, str(tmp_path / "vdr"), keys=["k"])
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    store.merge(spark.createDataFrame([(2, "b")], ["k", "v"]))
    doomed = store.vacuum(keep=1, dry_run=True)
    assert doomed == ["v00000", "v00001"]
    assert store.list_versions() == ["v00000", "v00001", "v00002"]
    assert store.vacuum(keep=1) == doomed  # the real run agrees
    assert store.list_versions() == ["v00002"]


def test_clustered_table_layout_enables_skipping(spark, tmp_path):
    """set_clustering (liquid-clustering analogue): a clustered
    table's MERGES and APPENDS range-cluster what they write, so
    the stats index prunes narrow reads continuously — no manual
    OPTIMIZE ZORDER required — and optimize() with no arguments
    compacts on the declared columns."""
    from pyspark.sql import functions as F

    from etl_pipeline_4handling_listings_spark.sources.store import (
        build_store_stats,
        read_store_skip,
    )

    path = str(tmp_path / "clustered")
    store = MergeStore(spark, path, keys=["k"])
    store.set_clustering(["a"])
    assert store.clustering() == ["a"]
    # write hash-scattered data: without clustering every file
    # would cover the whole `a` range
    rows = spark.range(4000).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(4000)).alias("a"),
        (F.col("id") % 7).alias("v"),
    )
    store.create_if_absent(rows)
    # AQE coalesces this tiny fixture to one post-shuffle partition
    # (correct at this size — one file IS the right layout); pin it
    # off so the test exercises the multi-file clustered shape
    ck = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(ck, "false")
    try:
        store.merge(rows.repartition(8))  # scattered input
    finally:
        spark.conf.set(ck, "true")
    build_store_stats(store, ["a"])
    pruned = read_store_skip(store, "a", 0, 99)
    n_all = len(store.read().inputFiles())
    assert n_all >= 2
    assert len(pruned.inputFiles()) < n_all, "clustered files must prune"
    got = sorted(r["k"] for r in pruned.collect())
    want = sorted(
        r["k"] for r in store.read().filter("a between 0 and 99").collect()
    )
    assert got == want
    # appends cluster too
    extra = spark.range(4000, 4400).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 2654435761, F.lit(4000)).alias("a"),
        (F.col("id") % 7).alias("v"),
    )
    spark.conf.set(ck, "false")
    try:
        store.append(extra.repartition(8))
    finally:
        spark.conf.set(ck, "true")
    build_store_stats(store, ["a"])
    pruned2 = read_store_skip(store, "a", 0, 99)
    assert len(pruned2.inputFiles()) < len(store.read().inputFiles())
    # declared clustering may not shadow the partition dimension
    p2 = MergeStore(spark, str(tmp_path / "c2"), keys=["k"], partition_by="p")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition column"):
        p2.set_clustering(["p"])


def test_clone_carries_tombstones_identity_clustering(spark, tmp_path):
    """CLONE must carry the table-level declarations the data files
    imply: dropped-column tombstones (the clone hardlinks the
    source's files, so re-adding a dropped name would resurrect
    stale bytes), identity columns, and the clustering spec."""
    import pytest as _pytest

    src = MergeStore(spark, str(tmp_path / "src"), keys=["k"])
    df = spark.createDataFrame([(1, 7, 5)], ["k", "n", "x"])
    src.create_if_absent(df)
    src.merge(df)
    src.drop_column("x")
    src.add_identity_column("rid", start=10, step=2)
    src.set_clustering(["n"])
    clone = src.clone(str(tmp_path / "cl"))
    assert clone.dropped_columns() == ["x"]
    with _pytest.raises(ValueError, match="previously dropped"):
        clone.add_columns({"x": "bigint"})
    assert clone.identity_columns() == {"rid": {"start": 10, "step": 2}}
    assert clone.clustering() == ["n"]
    # the identity HIGH-WATER MARK travels too: ids allocated on the
    # clone must continue ABOVE the source's, never re-allocate
    src.append(spark.createDataFrame([(5, 9)], ["k", "n"]))
    src_hwm = src._identity_hwm("rid")
    assert src_hwm is not None
    clone2 = src.clone(str(tmp_path / "cl2"))
    clone2.append(spark.createDataFrame([(2, 8)], ["k", "n"]))
    rids = [r.rid for r in clone2.read().filter("k = 2").collect()]
    assert rids and rids[0] is not None and rids[0] > src_hwm
    # and the first clone (no allocations in the source yet) starts
    # at the declared start
    clone.append(spark.createDataFrame([(2, 8)], ["k", "n"]))
    rids = [r.rid for r in clone.read().filter("k = 2").collect()]
    assert rids and rids[0] is not None and rids[0] >= 10


def test_set_clustering_rejects_non_castable_column(spark, tmp_path):
    """A string clustering column must fail AT DECLARATION with a
    named error, not as an ANSI NumberFormatException inside every
    later write's Morton cast."""
    import pytest as _pytest

    s = MergeStore(spark, str(tmp_path / "t"), keys=["k"])
    df = spark.createDataFrame([(1, "a", 5)], ["k", "v", "n"])
    s.create_if_absent(df)
    s.merge(df)
    with _pytest.raises(ValueError, match="integer-castable"):
        s.set_clustering(["v"])
    s.set_clustering(["n"])  # numeric: fine
    assert s.clustering() == ["n"]


def test_schema_evolution_refuses_tombstoned_column(spark, tmp_path):
    """Every evolution door is guarded: merge and append with
    schema_evolution=True must refuse re-adding a dropped name (the
    stale bytes in hardlinked files would resurrect), same as
    add_columns."""
    store = _mk(spark, tmp_path, [(1, "a")])
    store.add_columns({"x": "bigint"})
    store.drop_column("x")
    wide = spark.createDataFrame([(2, "b", 9)], ["k", "v", "x"])
    with pytest.raises(ValueError, match="resurrect"):
        store.merge(wide, schema_evolution=True)
    with pytest.raises(ValueError, match="resurrect"):
        store.append(wide, schema_evolution=True)
    # a renamed column evolves fine
    renamed = spark.createDataFrame([(2, "b", 9)], ["k", "v", "x2"])
    store.merge(renamed, schema_evolution=True)
    assert "x2" in store.read().columns


def test_tombstone_guard_holds_for_hostile_column_names(spark, tmp_path):
    """Tombstone filenames are percent-encoded: a column whose name
    starts with '.' (legal in Spark via backticks) must not vanish
    into the crashed-write temp-file filter, and a name containing
    '/' must not write outside _TOMBSTONES/. Both stay guarded
    against re-add, and legacy raw-name stones still read."""
    import os

    store = _mk(spark, tmp_path, [(1, "a")])
    for hostile in [".hidden", "a/b", "x%2Ey", "sp ace"]:
        store.add_columns({hostile: "bigint"})
        store.drop_column(hostile)
        assert hostile in store.dropped_columns(), hostile
        with pytest.raises(ValueError, match="previously dropped"):
            store.add_columns({hostile: "bigint"})
    # nothing escaped the tombstone dir
    root = str(tmp_path / "store")
    assert not os.path.exists(os.path.join(root, "_TOMBSTONES", "a"))
    # legacy layout: a raw name at the dir root is still honored
    with open(
        os.path.join(root, "_TOMBSTONES", "legacy_col"), "w"
    ):
        pass
    assert "legacy_col" in store.dropped_columns()


def test_stale_tombstone_does_not_wedge_store(spark, tmp_path):
    """drop_column writes its tombstone BEFORE the commit, so a drop
    that permanently fails leaves the name tombstoned while the
    column still lives in the schema. That stale stone must not (a)
    refuse every schema-evolving merge whose source naturally
    carries the column, nor (b) make rename refuse the name with
    the misleading 'previously dropped' error — the accurate
    duplicate refusal fires instead. A GENUINE tombstone (column
    absent) still blocks both."""
    import os

    store = _mk(spark, tmp_path, [(1, "a")])
    store.add_columns({"x": "bigint"})
    # simulate the failed drop: stone written, commit never happened
    store._write_tombstone("x")
    assert "x" in store.dropped_columns()
    assert "x" in store.read().columns
    # (a) evolving merge with the still-live column passes
    wide = spark.createDataFrame([(2, "b", 9)], ["k", "v", "x"])
    store.merge(wide, schema_evolution=True)
    assert [r.x for r in store.read().filter("k = 2").collect()] == [9]
    # (b) rename TO the still-live name: duplicate refusal, not the
    # permanent 'previously dropped' one
    store.add_columns({"y": "bigint"})
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("y", "x")
    # a real drop keeps the guard permanent
    store.drop_column("x")
    assert "x" not in store.read().columns
    with pytest.raises(ValueError, match="previously dropped"):
        store.rename_column("y", "x")
    with pytest.raises(ValueError, match="resurrect"):
        store.merge(wide, schema_evolution=True)


def test_concurrent_drop_columns_both_retire(spark, tmp_path):
    """Two drop_columns racing on different columns: per-name atomic
    tombstone files mean neither loses the other's entry, and the
    OCC loop serializes the two metadata commits — final schema has
    neither column, both names are retired."""
    import threading

    path = str(tmp_path / "race")
    s = MergeStore(spark, path, keys=["k"])
    df = spark.createDataFrame([(1, "v", 1, 2)], ["k", "v", "a", "b"])
    s.create_if_absent(df)
    s.merge(df)
    errs = []

    def dropper(col):
        try:
            MergeStore(spark, path, keys=["k"]).drop_column(col)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    t1 = threading.Thread(target=dropper, args=("a",))
    t2 = threading.Thread(target=dropper, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    assert set(s.read().columns) == {"k", "v"}
    assert s.dropped_columns() == ["a", "b"]
    assert s.current_version() == "v00003"
