"""Partition-value encoding: the ONE representation shared by disk
dir names, commit-manifest touched sets, CoW hardlink exclusion, and
the data source's CDC prefixes.

Regression suite for the round-5 review findings: ``str(True)`` !=
the ``p=true`` Spark writes, and any escapable character (``:`` ``=``
``%`` ...) diverges the same way — pre-fix that silently resurrected
CoW-deleted rows, duplicated updated rows, let racing merges
fast-forward past overlapping deletes, and emitted empty change
feeds. Everything now routes through ``hivepath.hive_part_str``,
pinned here against Spark's actual partitioned writer.
"""

from __future__ import annotations

import datetime
import os

from etl_pipeline_4handling_listings_spark.sources import datasource as ds
from etl_pipeline_4handling_listings_spark.sources.hivepath import (
    DEFAULT_PARTITION,
    hive_part_str,
    unescape_path_name,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore


NASTY = [
    "plain",
    "a:b",
    "a=b",
    "a%b",
    "a#b",
    "a/b",
    "a b",
    "a'b",
    'a"b',
    "a*b",
    "a?b",
    "a\\b",
    "a[b]c",
    "a{b}",
    "a^b",
    "a,b",
    "a&b",
    "a|b",
    "a~b",
    "a+b",
    "naïve",
    "日本",
    "a\tb",
]


def _spark_dirs(spark, out, df, pcol="p"):
    df.write.partitionBy(pcol).parquet(out)
    return sorted(
        d for d in os.listdir(out) if d.startswith(f"{pcol}=")
    )


def test_hive_part_str_matches_spark_writer(spark, tmp_path):
    """The predicted dir name equals what Spark actually writes, for
    every type a partition column realistically has and every
    escapable character class."""
    cases = [
        (
            "s",
            "p string, x int",
            [(v, i) for i, v in enumerate(NASTY + [""])],
        ),
        ("b", "p boolean, x int", [(True, 1), (False, 2)]),
        ("i", "p int, x int", [(7, 1), (-3, 2), (0, 3)]),
        (
            "d",
            "p date, x int",
            [(datetime.date(2021, 3, 4), 1)],
        ),
        (
            "t",
            "p timestamp_ntz, x int",
            [
                (datetime.datetime(2021, 3, 4, 10, 30, 0), 1),
                (datetime.datetime(2021, 3, 4, 10, 30, 0, 123000), 2),
                (datetime.datetime(2021, 3, 4, 10, 30, 0, 123456), 3),
            ],
        ),
        (
            "f",
            "p double, x int",
            [(1.5, 1), (2.0, 2), (0.001, 3)],
        ),
    ]
    for name, schema, rows in cases:
        df = spark.createDataFrame(rows, schema)
        actual = _spark_dirs(spark, str(tmp_path / name), df)
        predicted = sorted(
            {f"p={hive_part_str(v)}" for v, _ in rows}
        )
        assert actual == predicted, f"case {name}"


def test_unescape_inverts_escape():
    for v in NASTY:
        assert unescape_path_name(hive_part_str(v)) == v
    assert hive_part_str(None) == DEFAULT_PARTITION
    assert hive_part_str("") == DEFAULT_PARTITION
    # tolerant of stray % (Hive's unescapePathName behavior)
    assert unescape_path_name("a%b") == "a%b"
    assert unescape_path_name("a%zzb") == "a%zzb"


def _mk(spark, tmp_path, rows, partition_by, name="store"):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    df = spark.createDataFrame(rows, ["k", "v", "p"])
    store.create_if_absent(df)
    store.merge(df)
    return store


def test_cow_delete_boolean_partition_stays_deleted(spark, tmp_path):
    """Pre-fix: touched_dirs={'p=True'} never matched the on-disk
    'p=true', so the base partition was hardlinked in alongside the
    rewrite — deleted rows back, survivors duplicated."""
    rows = [(1, "a", True), (2, "b", True), (3, "c", False)]
    store = _mk(spark, tmp_path, rows, "p")
    store.delete("k = 1", rewrite=True)
    got = sorted((r["k"], r["v"]) for r in store.read().collect())
    assert got == [(2, "b"), (3, "c")]


def test_cow_update_escaped_partition_no_duplicates(spark, tmp_path):
    rows = [(1, "a", "x:1"), (2, "b", "x:1"), (3, "c", "y=2")]
    store = _mk(spark, tmp_path, rows, "p")
    store.update("k = 1", {"v": "'A'"}, rewrite=True)
    got = sorted((r["k"], r["v"]) for r in store.read().collect())
    assert got == [(1, "A"), (2, "b"), (3, "c")]


def test_ff_disjointness_agrees_across_commit_kinds(spark, tmp_path):
    """Merge records hive_part_str touched values; MOR deletes record
    dir-derived ones. _ff_valid compares them, so the encodings MUST
    agree: a merge into partition True must NOT be judged disjoint
    from a delete whose manifest says 'true'."""
    rows = [(1, "a", True), (2, "b", False)]
    store = _mk(spark, tmp_path, rows, "p")
    base = store.current_version()
    v = store.delete("k = 1")  # MOR: touched=['true'] from dir name
    assert store._manifest_touched(v) == ["true"]
    # a merge touching partition True records hive_part_str(True)
    assert not store._ff_valid(base, v, [hive_part_str(True)])
    assert store._ff_valid(base, v, [hive_part_str(False)])


def test_merge_manifest_records_escaped_touched(spark, tmp_path):
    rows = [(1, "a", "x:1"), (2, "b", "y")]
    store = _mk(spark, tmp_path, rows, "p")
    v = store.merge(
        spark.createDataFrame([(1, "A", "x:1")], ["k", "v", "p"])
    )
    assert store._manifest_touched(v) == ["x%3A1"]


def test_cdc_feed_sees_boolean_partition_commits(spark, tmp_path):
    """Pre-fix the CDC planner built prefix 'p=True/' which matched
    zero manifest relpaths — the commit's changes silently vanished
    from the feed."""
    ds.register(spark)
    rows = [(1, "a", True), (2, "b", False)]
    store = _mk(spark, tmp_path, rows, "p")
    store.merge(
        spark.createDataFrame(
            [(1, "A", True), (3, "c", False)], ["k", "v", "p"]
        )
    )
    feed = (
        spark.read.format("mergestore")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .option("keys", "k")
        .load(store.path)
        .collect()
    )
    changes = {(r["k"], r["_change_type"]) for r in feed}
    assert changes == {(1, "update_postimage"), (3, "insert")}


def test_datasource_partition_values_match_native_read(spark, tmp_path):
    """The data source unescapes dir values, so both read paths
    return identical rows for escapable partition values."""
    ds.register(spark)
    rows = [(1, "a", "10:30"), (2, "b", "x=y")]
    store = _mk(spark, tmp_path, rows, "p")
    native = sorted(
        (r["k"], r["v"], r["p"]) for r in store.read().collect()
    )
    viads = sorted(
        (r["k"], r["v"], r["p"])
        for r in spark.read.format("mergestore")
        .load(store.path)
        .collect()
    )
    assert viads == native
    assert {p for _, _, p in viads} == {"10:30", "x=y"}


def test_datasource_empty_store_reads_empty(spark, tmp_path):
    """partitions() == [] makes the planner call read(None) — an
    empty DataFrame, not an AttributeError."""
    ds.register(spark)
    store = MergeStore(spark, str(tmp_path / "empty"), keys=["k"])
    store.create_if_absent(
        spark.createDataFrame([(1, "a")], ["k", "v"])
    )  # limit(0) template: zero data files
    out = spark.read.format("mergestore").load(store.path)
    assert out.count() == 0
    assert out.columns == ["k", "v"]


def test_cdc_empty_version_range_reads_empty(spark, tmp_path):
    ds.register(spark)
    store = _mk(spark, tmp_path, [(1, "a", True)], "p")
    cur = int(store.current_version()[1:])
    out = (
        spark.read.format("mergestore")
        .option("readChangeFeed", "true")
        .option("startingVersion", cur)
        .option("endingVersion", cur)
        .option("keys", "k")
        .load(store.path)
    )
    assert out.count() == 0


def test_convert_rejects_flat_dir_as_partitioned(spark, tmp_path):
    """Adopting a flat directory as partitioned would silently drop
    every root-level file at the first merge — refused up front."""
    import pytest

    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "a", "x")], ["k", "v", "p"]
    ).write.parquet(flat)
    with pytest.raises(ValueError, match="Hive-partitioned layout"):
        MergeStore.convert(spark, flat, keys=["k"], partition_by="p")
    # without partition_by the same directory converts fine
    store = MergeStore.convert(spark, flat, keys=["k"])
    assert store.read().count() == 1


def test_convert_stages_no_root_leftovers(spark, tmp_path):
    """convert commits via stage+rename: afterward the root holds
    only bookkeeping + v00000, and the store round-trips."""
    src = str(tmp_path / "adopt")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], ["k", "v", "p"]
    ).write.partitionBy("p").parquet(src)
    store = MergeStore.convert(
        spark, src, keys=["k"], partition_by="p"
    )
    assert store.read().count() == 2
    leftovers = [
        e
        for e in os.listdir(src)
        if not e.startswith(("_", ".")) and e != "v00000"
    ]
    assert leftovers == []
    store.merge(spark.createDataFrame([(3, "c", "x")], ["k", "v", "p"]))
    assert store.read().count() == 3


def test_datasource_version_pinned_between_schema_and_reader(
    spark, tmp_path
):
    """schema() and reader() resolve the snapshot version ONCE: a
    commit landing in between must not serve new data under the old
    schema."""
    store = _mk(spark, tmp_path, [(1, "a", "x")], "p")
    src = ds.MergeStoreDataSource({"path": store.path})
    src.schema()  # pins the current version
    pinned = src._pin_version()
    store.merge(spark.createDataFrame([(2, "b", "y")], ["k", "v", "p"]))
    reader = src.reader(src.schema())
    assert reader.version == pinned
    assert reader.version != store.current_version()
