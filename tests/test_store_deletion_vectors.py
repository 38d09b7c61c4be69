"""Deletion vectors: merge-on-read DELETE for MergeStore.

Reference semantics: Delta Lake deletion vectors and REORG TABLE ...
APPLY (PURGE) (public docs) — soft-delete rows by (file, position)
sidecar instead of rewriting data files, applied at read via an
anti-join on the parquet scan's _metadata.row_index, purged by the
next rewrite (merge / optimize) of the affected partition. Stands in
for the reference's physical delete loads
(mls_listings_curated.py:321-368 delete branch) at a cost model that
survives 100 TB: a point delete writes O(matched rows), not
O(touched files).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.store import (
    MergeStore,
    build_store_stats,
    read_store_skip,
)


def _mk(spark, tmp_path, rows, partition_by=None, name="store"):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    cols = ["k", "v"] + (["p"] if partition_by else [])
    df = spark.createDataFrame(rows, cols)
    store.create_if_absent(df)
    store.merge(df)
    return store


def _data(store):
    return {r["k"]: r["v"] for r in store.read().collect()}


# -- merge-on-read basics ----------------------------------------------


def test_delete_mor_keeps_data_files(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    base = store.current_version()
    base_manifest = sorted(
        f.split(base)[-1] for f in store._manifest_files(base)
    )

    v = store.delete("k >= 3")
    assert v == "v00002"
    assert _data(store) == {1: "a", 2: "b"}

    # data files are HARDLINKED unchanged — same relative file set,
    # only the _dv sidecar is new
    new_manifest = sorted(
        f.split(v)[-1] for f in store._manifest_files(v)
    )
    assert new_manifest == base_manifest
    assert store._dv_files(v)

    # history records the operation and the added vector rows
    h = {r["version"]: r for r in store.history().collect()}
    assert h[v]["operation"] == "delete"

    # time travel: the pre-delete snapshot still shows every row
    assert len(store.read_version(base).collect()) == 4


def test_delete_noop_returns_none(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a")])
    before = store.current_version()
    assert store.delete("k > 100") is None
    assert store.current_version() == before


def test_delete_accumulates_without_duplicates(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    store.delete("k = 1")
    v2 = store.delete("k <= 2")  # k=1 is already dead: must not rematch
    assert _data(store) == {3: "c", 4: "d"}
    dv = store._dv_frame(v2)
    assert dv.count() == 2  # one vector row per EVER-deleted row
    assert dv.count() == dv.distinct().count()


def test_delete_null_condition_semantics(spark, tmp_path):
    """SQL DELETE kills only rows where the condition is TRUE —
    NULL-evaluating rows survive, on both the merge-on-read and the
    copy-on-write path (the latter is where a bare ``~cond`` would
    silently drop them)."""
    rows = [(1, "a"), (2, None), (3, "a")]
    mor = _mk(spark, tmp_path, rows, name="mor")
    mor.delete("v = 'a'")
    assert _data(mor) == {2: None}

    cow = _mk(spark, tmp_path, rows, name="cow")
    cow.delete("v = 'a'", rewrite=True)
    assert _data(cow) == {2: None}


def test_delete_cow_rewrites_files(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    v = store.delete("k = 2", rewrite=True)
    assert _data(store) == {1: "a", 3: "c"}
    assert store._dv_files(v) == []  # no sidecar: rows physically gone
    raw = spark.read.parquet(store._version_dir(v))
    assert raw.count() == 2


# -- partitioned stores -------------------------------------------------


def test_delete_partitioned_records_touched(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1), (3, "c", 0), (4, "d", 1)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    v = store.delete("k = 3")
    h = {r["version"]: r for r in store.history().collect()}
    # only partition 0 holds matches — the conflict metadata says so,
    # so a racing merge into partition 1 can fast-forward past this
    assert h[v]["touched_partitions"] == "0"
    assert _data(store) == {1: "a", 2: "b", 4: "d"}


def test_merge_after_delete_carries_and_purges(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1), (3, "c", 0), (4, "d", 1)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    store.delete("k = 3")  # vector in partition 0

    # merge into the OTHER partition: the vector must be carried
    store.merge(spark.createDataFrame([(4, "D", 1)], ["k", "v", "p"]))
    assert _data(store) == {1: "a", 2: "b", 4: "D"}
    assert store._dv_frame(store.current_version()).count() == 1

    # merge that REWRITES partition 0 (re-inserting the deleted key):
    # the rewrite applied the vector, so it must be dropped, and the
    # re-inserted row is visible
    store.merge(spark.createDataFrame([(3, "C", 0)], ["k", "v", "p"]))
    assert _data(store) == {1: "a", 2: "b", 3: "C", 4: "D"}
    assert store._dv_frame(store.current_version()) is None


def test_optimize_purges_vectors(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    store.delete("k = 2")
    v = store.optimize(purge=True)
    assert v is not None
    assert _data(store) == {1: "a", 3: "c"}
    assert store._dv_files(v) == []
    # physically gone: a raw scan of the compacted snapshot agrees
    assert spark.read.parquet(store._version_dir(v)).count() == 2


def test_optimize_partitioned_purge_only_affected(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1), (3, "c", 0)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    store.delete("k = 1")  # vector in partition 0 only
    # min_files high: ONLY the purge trigger may choose partitions,
    # so exactly the DV-holding partition is rewritten
    v = store.optimize(min_files=100, purge=True)
    assert v is not None
    assert _data(store) == {2: "b", 3: "c"}
    assert store._dv_files(v) == []
    h = {r["version"]: r for r in store.history().collect()}
    assert h[v]["touched_partitions"] == "0"


# -- composition with the other store surfaces -------------------------


def test_delete_cdc_emits_deletes(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    base = store.current_version()
    store.delete("k >= 2")
    changes = {
        r["k"]: r["_change_type"]
        for r in store.read_changes(base).collect()
    }
    assert changes == {2: "delete", 3: "delete"}


def test_restore_undeletes(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    base = store.current_version()
    store.delete("k = 1")
    assert _data(store) == {2: "b"}
    store.restore(base)
    assert _data(store) == {1: "a", 2: "b"}


def test_skip_read_respects_vectors(spark, tmp_path):
    store = _mk(
        spark, tmp_path, [(i, f"v{i}") for i in range(1, 9)]
    )
    store.delete("k <= 4")
    build_store_stats(store, ["k"])
    out = read_store_skip(store, "k", 1, 8)
    assert sorted(r["k"] for r in out.collect()) == [5, 6, 7, 8]


def test_delete_commit_participates_in_fast_forward(spark, tmp_path):
    """A DV delete records touched-partition conflict metadata, so a
    racing merge into OTHER partitions may fast-forward past it
    (carrying its vectors — covered above), while a merge into the
    SAME partition must re-merge."""
    rows = [(1, "a", 0), (2, "b", 1)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    base = store.current_version()
    v = store.delete("k = 1")  # touched: partition 0
    assert store._ff_valid(base, v, ["1"])  # disjoint: sails past
    assert not store._ff_valid(base, v, ["0"])  # overlap: re-merge


def test_fsck_healthy_and_corrupted(spark, tmp_path):
    """fsck is silent on a healthy store (including one with live
    deletion vectors) and names the broken invariant after damage."""
    import os

    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    store.delete("k = 2")
    assert store.fsck() == []

    # damage: remove one manifest-listed data file from the current
    # snapshot (simulates partial replication / fat-fingered rm)
    v = store.current_version()
    victim = store._manifest_files(v)[0]
    os.remove(victim)
    checks = {f["check"] for f in store.fsck()}
    assert "manifest-missing-file" in checks


def test_vectors_survive_vacuum_and_clone(spark, tmp_path):
    """The sidecar lives INSIDE the version dir, so it rides every
    file-reference operation: vacuum of the pre-delete snapshots
    keeps the DV'd current one readable, and a zero-copy clone of a
    DV'd snapshot carries the vectors."""
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    store.delete("k = 2")  # current snapshot carries a live vector
    store.vacuum(keep=1)
    assert _data(store) == {1: "a", 3: "c"}
    clone = store.clone(str(tmp_path / "clone"))
    assert {r["k"]: r["v"] for r in clone.read().collect()} == {
        1: "a",
        3: "c",
    }


# -- UPDATE (DV-backed and copy-on-write) ------------------------------


def test_update_mor_appends_images_and_vectors(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    base = store.current_version()
    base_rels = {
        f.split(base + "/")[-1] for f in store._manifest_files(base)
    }
    v = store.update("k >= 2", {"v": "upper(v)"})
    assert _data(store) == {1: "a", 2: "B", 3: "C"}
    # old data files are still there (hardlinked), plus appended
    # image files; the matched rows' old positions joined the sidecar
    new_rels = {
        f.split(v + "/")[-1] for f in store._manifest_files(v)
    }
    assert base_rels < new_rels
    assert store._dv_frame(v).count() == 2
    h = {r["version"]: r for r in store.history().collect()}
    assert h[v]["operation"] == "update"
    # time travel: pre-update snapshot unchanged
    assert {r["k"]: r["v"] for r in store.read_version(base).collect()} == {
        1: "a",
        2: "b",
        3: "c",
    }


def test_update_null_condition_and_noop(spark, tmp_path):
    rows = [(1, "a"), (2, None)]
    mor = _mk(spark, tmp_path, rows, name="mor")
    mor.update("v = 'a'", {"v": "'hit'"})
    assert _data(mor) == {1: "hit", 2: None}  # NULL row not matched

    cow = _mk(spark, tmp_path, rows, name="cow")
    cow.update("v = 'a'", {"v": "'hit'"}, rewrite=True)
    assert _data(cow) == {1: "hit", 2: None}

    before = mor.current_version()
    assert mor.update("k > 99", {"v": "'x'"}) is None
    assert mor.current_version() == before


def test_update_rejects_key_and_partition_assignment(spark, tmp_path):
    import pytest

    store = _mk(
        spark, tmp_path, [(1, "a", 0)], partition_by="p"
    )
    with pytest.raises(ValueError, match="key/partition"):
        store.update("true", {"k": "k + 1"})
    with pytest.raises(ValueError, match="key/partition"):
        store.update("true", {"p": "1 - p"})


def test_update_partitioned_touched_and_carry(spark, tmp_path):
    rows = [(1, "a", 0), (2, "b", 1), (3, "c", 0)]
    store = _mk(spark, tmp_path, rows, partition_by="p")
    store.delete("k = 3")  # pre-existing vector in partition 0
    v = store.update("k = 2", {"v": "'B'"})  # touches partition 1
    assert _data(store) == {1: "a", 2: "B"}
    h = {r["version"]: r for r in store.history().collect()}
    assert h[v]["touched_partitions"] == "1"
    # prior delete's vector rode along (hardlinked sidecar) and the
    # update added its own
    assert store._dv_frame(v).count() == 2


def test_update_cdc_emits_postimage(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    base = store.current_version()
    store.update("k = 1", {"v": "'A'"})
    changes = {
        (r["k"], r["v"], r["_change_type"])
        for r in store.read_changes(base).collect()
    }
    assert changes == {(1, "A", "update_postimage")}


def test_update_then_optimize_purges(spark, tmp_path):
    store = _mk(spark, tmp_path, [(1, "a"), (2, "b")])
    store.update("k = 1", {"v": "'A'"})
    v = store.optimize(purge=True)
    assert v is not None
    assert _data(store) == {1: "A", 2: "b"}
    assert store._dv_files(v) == []
    # physical: exactly the live rows remain on disk
    assert spark.read.parquet(store._version_dir(v)).count() == 2
