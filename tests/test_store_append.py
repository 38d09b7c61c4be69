"""Blind APPEND — the high-throughput ingest path.

Reference semantics: Delta ``df.write.mode("append")`` / ``INSERT
INTO`` on the curated tables (the reference's daily loads are
upserts, but its raw/event landing zones are appends —
SURVEY §2.1 S7's sized exports are the other direction of the same
contract). Cost model under the MergeStore commit protocol: rows
written once to scratch, every commit attempt pure hardlinks, lost
races re-link and re-claim without recomputing anything.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.store import (
    ConstraintViolationError,
    MergeStore,
)


def _mk(spark, tmp_path, name="store", partition_by=None):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    df = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b")], ["k", "p", "v"]
    )
    store.create_if_absent(df)
    store.merge(df)
    return store


def test_append_adds_rows_keeps_existing(spark, tmp_path):
    store = _mk(spark, tmp_path)
    v = store.append(
        spark.createDataFrame([(3, 0, "c"), (4, 1, "d")], ["k", "p", "v"])
    )
    assert v == "v00002"
    got = {r.k: r.v for r in store.read().collect()}
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}
    # time travel: the pre-append snapshot is untouched
    assert store.read_version("v00001").count() == 2


def test_append_empty_source_is_a_noop(spark, tmp_path):
    store = _mk(spark, tmp_path)
    before = store.current_version()
    df = spark.createDataFrame([], "k int, p int, v string")
    assert store.append(df) is None
    assert store.current_version() == before


def test_append_does_not_dedup_keys(spark, tmp_path):
    """Blind by contract: appending an existing key duplicates it —
    same as a Delta append under a conceptual primary key. merge()
    is the upsert path."""
    store = _mk(spark, tmp_path)
    store.append(spark.createDataFrame([(1, 0, "DUP")], ["k", "p", "v"]))
    assert store.read().filter(F.col("k") == 1).count() == 2


def test_append_schema_mismatch_raises(spark, tmp_path):
    store = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="missing table columns"):
        store.append(spark.createDataFrame([(9, 0)], ["k", "p"]))
    with pytest.raises(ValueError, match="schema_evolution"):
        store.append(
            spark.createDataFrame([(9, 0, "x", 1.0)], ["k", "p", "v", "w"])
        )


def test_append_schema_evolution_adds_column(spark, tmp_path):
    store = _mk(spark, tmp_path)
    v = store.append(
        spark.createDataFrame([(3, 0, "c", 9.5)], ["k", "p", "v", "score"]),
        schema_evolution=True,
    )
    got = {r.k: r.score for r in store.read().collect()}
    assert got == {1: None, 2: None, 3: 9.5}
    assert "snapshot-schema" in store.protocol()["reader_features"]
    assert v == "v00002"


def test_append_enforces_constraints_and_generated(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.add_constraint("v_nonempty", "length(v) > 0")
    store.add_generated_column("k2", "k * 2")
    with pytest.raises(ConstraintViolationError):
        store.append(spark.createDataFrame([(3, 0, "")], ["k", "p", "v"]))
    assert store.current_version() == "v00001"  # aborted pre-claim
    store.append(spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"]))
    row = store.read().filter(F.col("k") == 3).collect()[0]
    assert row.k2 == 6


def test_partitioned_append_records_touched_and_links_rest(spark, tmp_path):
    store = _mk(spark, tmp_path, partition_by="p")
    v = store.append(
        spark.createDataFrame([(3, 0, "c"), (5, 5, "e")], ["k", "p", "v"])
    )
    with open(os.path.join(store.path, "_COMMITS", f"{v}.json")) as f:
        rec = json.load(f)
    assert sorted(rec["touched"]) == ["0", "5"]
    got = {r.k: (r.p, r.v) for r in store.read().collect()}
    assert got == {1: (0, "a"), 2: (1, "b"), 3: (0, "c"), 5: (5, "e")}
    # a merge into an untouched partition fast-forwards past the
    # append; a merge into a gaining partition must NOT (its rewrite
    # predates these rows — fast-forwarding would drop them)
    prev = f"v{int(v[1:]) - 1:05d}"
    assert store._ff_valid(prev, v, ["1"])
    assert not store._ff_valid(prev, v, ["0"])


def test_append_carries_deletion_vectors(spark, tmp_path):
    """No base file changes, so every DV entry stays valid verbatim
    — the deleted row must not resurrect through an append."""
    store = _mk(spark, tmp_path)
    store.delete(F.col("k") == 1)
    store.append(spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"]))
    assert sorted(r.k for r in store.read().collect()) == [2, 3]


def test_append_null_partition_value_rejected(spark, tmp_path):
    store = _mk(spark, tmp_path, partition_by="p")
    with pytest.raises(ValueError, match="NULL"):
        store.append(
            spark.createDataFrame(
                [(9, None, "x")], "k int, p int, v string"
            )
        )
    assert store.current_version() == "v00001"


def test_append_interleaves_with_merge_and_cdc(spark, tmp_path):
    """Appends are first-class commits: history attributes them,
    the change feed emits their rows as inserts, and a later merge
    sees them as ordinary target rows."""
    store = _mk(spark, tmp_path)
    v2 = store.append(spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"]))
    store.merge(spark.createDataFrame([(3, 0, "C2")], ["k", "p", "v"]))
    assert {r.k: r.v for r in store.read().collect()}[3] == "C2"
    changes = store.read_changes("v00001", v2)
    kinds = {(r.k, r["_change_type"]) for r in changes.collect()}
    assert (3, "insert") in kinds


# -- transactional (idempotent) appends --------------------------------


def test_append_txn_replay_is_atomic_noop(spark, tmp_path):
    """(app_id, version) rides the commit manifest — the commit IS
    the progress marker, so a replay can never duplicate rows even
    though append itself is not key-idempotent."""
    store = _mk(spark, tmp_path)
    df = spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"])
    v = store.append(df, txn=("loader", 7))
    assert v == "v00002"
    assert store.append(df, txn=("loader", 7)) is None  # replay
    assert store.append(df, txn=("loader", 5)) is None  # older replay
    assert store.read().filter(F.col("k") == 3).count() == 1
    assert store.last_txn_version("loader") == 7
    assert store.last_txn_version("other") == -1
    # a different app id is independent
    assert store.append(df, txn=("other", 0)) == "v00003"


def test_append_txn_watermark_survives_vacuum_and_compaction(spark, tmp_path):
    store = _mk(spark, tmp_path)
    df = spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"])
    store.append(df, txn=("loader", 3))
    for i in range(4):
        store.merge(
            spark.createDataFrame([(10 + i, 0, "m")], ["k", "p", "v"])
        )
    store.vacuum(keep=1)
    store.compact_log(claim_expiry_s=0.0)
    assert store.last_txn_version("loader") == 3
    assert store.append(df, txn=("loader", 3)) is None


def test_foreach_batch_append_sink_exactly_once(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.streaming.pipeline import (
        foreach_batch_append,
    )

    store = MergeStore(spark, str(tmp_path / "sink"), keys=["k"])
    sink = foreach_batch_append(store, txn_app_id="q1")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    sink(b0, 0)
    assert store.read().count() == 2
    versions = store.list_versions()
    sink(b0, 0)  # post-restart replay: atomically skipped
    assert store.list_versions() == versions
    assert store.read().count() == 2
    sink(spark.createDataFrame([(3, "c")], ["k", "v"]), 1)
    assert store.read().count() == 3
    # a second query with its own app id appends independently
    sink2 = foreach_batch_append(store, txn_app_id="q2")
    sink2(spark.createDataFrame([(4, "d")], ["k", "v"]), 0)
    assert store.read().count() == 4


def test_concurrent_appends_and_merges_no_lost_rows(spark, tmp_path):
    """Race appends against merges on the same table: every appended
    row and every merged key must land (appends re-link on lost
    races; merges re-merge or fast-forward). Serializable history,
    no lost updates in either direction."""
    import threading

    path = str(tmp_path / "race")
    store = MergeStore(spark, path, keys=["k"], partition_by="p")
    store.create_if_absent(
        spark.createDataFrame([(0, 0, "z")], ["k", "p", "v"])
    )
    store.merge(spark.createDataFrame([(0, 0, "z")], ["k", "p", "v"]))
    errs = []

    def appender():
        try:
            s = MergeStore(spark, path, keys=["k"], partition_by="p")
            for i in range(3):
                s.append(
                    spark.createDataFrame(
                        [(1000 + i, 7, f"a{i}")], ["k", "p", "v"]
                    )
                )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    def merger():
        try:
            s = MergeStore(spark, path, keys=["k"], partition_by="p")
            for i in range(3):
                s.merge(
                    spark.createDataFrame(
                        [(2000 + i, 3, f"m{i}")], ["k", "p", "v"]
                    )
                )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    t1 = threading.Thread(target=appender)
    t2 = threading.Thread(target=merger)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    got = {r["k"]: r["v"] for r in store.read().collect()}
    for i in range(3):
        assert got.get(1000 + i) == f"a{i}", f"lost append {1000+i}"
        assert got.get(2000 + i) == f"m{i}", f"lost merge {2000+i}"


def test_partitioned_append_change_feed_both_modes(spark, tmp_path):
    """CDC over a partitioned append commit (pure file additions —
    no rewrites): both the engine's read_changes and the data
    source's readChangeFeed emit exactly the appended rows as
    inserts, including for a partition that already had data."""
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )

    store = _mk(spark, tmp_path, partition_by="p")
    v = store.append(
        spark.createDataFrame([(3, 0, "c"), (4, 7, "d")], ["k", "p", "v"])
    )
    ch = store.read_changes("v00001", v)
    assert sorted((r.k, r["_change_type"]) for r in ch.collect()) == [
        (3, "insert"),
        (4, "insert"),
    ]
    register(spark)
    out = (
        spark.read.format("mergestore")
        .option("readChangeFeed", "true")
        .option("keys", "k")
        .option("startingVersion", 1)
        .load(store.path)
    )
    assert sorted((r.k, r["_change_type"]) for r in out.collect()) == [
        (3, "insert"),
        (4, "insert"),
    ]


# -- identity columns (GENERATED ALWAYS AS IDENTITY) -------------------


def test_identity_append_allocates_unique_increasing(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.add_identity_column("rid", start=100, step=10)
    assert "identity-columns" in store.protocol()["writer_features"]
    store.append(
        spark.createDataFrame(
            [(3, 0, "c"), (4, 0, "d"), (5, 1, "e")], ["k", "p", "v"]
        ).repartition(3)
    )
    rows = {r.k: r.rid for r in store.read().collect()}
    assigned = sorted(v for k, v in rows.items() if k >= 3)
    assert assigned == [100, 110, 120]
    assert rows[1] is None and rows[2] is None  # pre-identity rows
    # second append continues above the high-water mark
    store.append(spark.createDataFrame([(6, 1, "f")], ["k", "p", "v"]))
    rows = {r.k: r.rid for r in store.read().collect()}
    assert rows[6] == 130
    assert store._identity_hwm("rid") == 130


def test_identity_restrictions_enforced(spark, tmp_path):
    import pytest as _pytest

    store = _mk(spark, tmp_path)
    store.add_identity_column("rid")
    # ALWAYS means the source can never supply it
    with _pytest.raises(ValueError, match="may not be supplied"):
        store.append(
            spark.createDataFrame(
                [(3, 0, "c", 999)], ["k", "p", "v", "rid"]
            )
        )
    # merge is unsupported on identity tables (Delta parity)
    with _pytest.raises(ValueError, match="unsupported"):
        store.merge(spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"]))
    # update may not assign it; delete still works
    store.append(spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"]))
    with _pytest.raises(ValueError, match="never assignable"):
        store.update("k = 3", {"rid": "0"})
    store.update("k = 3", {"v": "'C'"})
    store.delete("k = 1")
    got = {r.k: (r.v, r.rid) for r in store.read().collect()}
    assert got[3] == ("C", 1)
    assert 1 not in got
    # df.write redirects to the engine path
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )

    register(spark)
    with _pytest.raises(Exception, match="identity columns"):
        spark.createDataFrame(
            [(9, 0, "x")],
            "k bigint, p bigint, v string",
        ).write.format("mergestore").mode("append").option(
            "path", store.path
        ).save()


def test_identity_concurrent_appends_no_duplicates(spark, tmp_path):
    """The one conflict identity introduces: two appends allocating
    from the same high-water mark. The pre-claim re-check rebuilds
    the loser's scratch from the winner's mark — every id unique."""
    import threading

    store = _mk(spark, tmp_path)
    store.add_identity_column("rid")
    errs = []

    def writer(lo):
        try:
            s = MergeStore(spark, store.path, keys=["k"])
            for i in range(2):
                s.append(
                    spark.createDataFrame(
                        [(lo + i, 0, f"w{lo}-{i}")], ["k", "p", "v"]
                    )
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(100,))
    t2 = threading.Thread(target=writer, args=(200,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    rids = [r.rid for r in store.read().collect() if r.rid is not None]
    assert len(rids) == 4
    assert len(set(rids)) == 4, f"duplicate identity values: {sorted(rids)}"


def test_append_txn_orphan_claim_does_not_mask_replay(spark, tmp_path):
    """A writer that crashed between claiming a version (manifest
    written, txn riding it) and the staging->version rename left no
    data behind. The txn watermark must NOT count that orphan:
    otherwise the restart 'replay' of the batch is skipped and its
    rows are silently lost."""
    store = _mk(spark, tmp_path)
    df = spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"])
    store.append(df, txn=("loader", 1))
    # simulate the crash: claim manifest for the NEXT version with
    # the txn fields, no version directory ever materialized
    cur = store.current_version()
    nxt = f"v{int(cur[1:]) + 1:05d}"
    manifest = os.path.join(store.path, "_COMMITS", f"{nxt}.json")
    with open(manifest, "w") as f:
        json.dump(
            {
                "version": nxt,
                "owner": "dead-writer",
                "ts": 0.0,
                "txn_app": "loader",
                "txn_ver": 2,
            },
            f,
        )
    # age the orphan past claim expiry so the next writer can break
    # it (a fresh orphan correctly blocks the version until then)
    os.utime(manifest, (1, 1))
    assert store.last_txn_version("loader") == 1  # orphan ignored
    df2 = spark.createDataFrame([(4, 0, "d")], ["k", "p", "v"])
    v = store.append(df2, txn=("loader", 2))  # the restart replay
    assert v is not None
    assert store.read().filter(F.col("k") == 4).count() == 1
    # once genuinely committed, the watermark advances
    assert store.last_txn_version("loader") == 2
    assert store.append(df2, txn=("loader", 2)) is None


def test_append_txn_vacuumed_commit_still_counts(spark, tmp_path):
    """Vacuum removes old version DIRECTORIES but their manifests
    stay live until compact_log folds them — that window must keep
    the watermark (vacuumed implies committed)."""
    store = _mk(spark, tmp_path)
    df = spark.createDataFrame([(3, 0, "c")], ["k", "p", "v"])
    store.append(df, txn=("loader", 9))
    for i in range(3):
        store.merge(
            spark.createDataFrame([(20 + i, 0, "m")], ["k", "p", "v"])
        )
    store.vacuum(keep=1)  # txn commit's dir is gone, manifest live
    assert store.last_txn_version("loader") == 9
    assert store.append(df, txn=("loader", 9)) is None
