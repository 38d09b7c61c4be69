"""Commit-protocol hardening regressions.

Each test pins a failure mode found by adversarial review of the
MergeStore optimistic-concurrency protocol:

- version ORDER must be numeric (lexical order inverts at
  v99999 -> v100000 and freezes the advance-only pointer forever);
- a fast-forward past an intermediate schema-evolution commit must
  not narrow the table schema back;
- a broken-then-revived claim can commit one writer's CONTENT under
  another writer's MANIFEST — the `_OWNER` stamp + cross-check must
  refuse to attribute such commits (else `_ff_valid` green-lights a
  lost update);
- the Morton key must never place an interleaved bit on the bigint
  sign bit (4+ columns at the default 16 bits would);
- a deterministic optimize() error (typo'd zorder column) must fail
  fast with the real message, not spin the lost-race retry loop.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.store import MergeStore, _vnum


def _mk(spark, path, **kw):
    return MergeStore(spark, str(path), keys=["k"], **kw)


def test_version_order_survives_the_five_digit_rollover(spark, tmp_path):
    """v99999 -> v100000: pointer advances, list_versions stays
    ascending, reads serve the new snapshot. Lexical comparison
    would freeze the pointer (\"v100000\" < \"v99999\") and wedge
    every subsequent merge."""
    path = str(tmp_path / "rollover")
    store = _mk(spark, path)
    store.create_if_absent(
        spark.createDataFrame([(1, "a")], ["k", "v"])
    )
    store.merge(spark.createDataFrame([(1, "b")], ["k", "v"]))
    assert store.current_version() == "v00001"

    # teleport the store to the edge: v00001 becomes v99999
    os.rename(
        os.path.join(path, "v00001"), os.path.join(path, "v99999")
    )
    commits = os.path.join(path, "_COMMITS")
    with open(os.path.join(commits, "v00001.json")) as f:
        rec = json.load(f)
    rec["version"] = "v99999"
    with open(os.path.join(commits, "v99999.json"), "w") as f:
        json.dump(rec, f)
    os.remove(os.path.join(commits, "v00001.json"))
    with open(os.path.join(path, "_CURRENT"), "w") as f:
        f.write("v99999")

    store2 = _mk(spark, path)
    v = store2.merge(spark.createDataFrame([(2, "c")], ["k", "v"]))
    assert v == "v100000"
    assert store2.current_version() == "v100000"
    assert store2.list_versions() == ["v00000", "v99999", "v100000"]
    assert [_vnum(x) for x in store2.list_versions()] == [0, 99999, 100000]
    got = {r["k"]: r["v"] for r in store2.read().collect()}
    assert got == {1: "b", 2: "c"}
    # the pointer is still advance-only: a stale flip is refused
    store2._set_current("v99999")
    assert store2.current_version() == "v100000"


def test_fast_forward_keeps_intermediate_schema_evolution(spark, tmp_path):
    """Writer A's schema-evolution commit (adds column x) lands
    BETWEEN writer B's merge computation and B's commit. B's
    fast-forward is disjoint-valid, but its reused merge output was
    computed before x existed — the committed snapshot schema must
    be the UNION, not B's narrower schema, or x silently vanishes
    from the logical table."""
    import types

    path = str(tmp_path / "ffevolve")
    seed = spark.createDataFrame(
        [(0, 0, "z0"), (1, 1, "z1")], ["k", "p", "v"]
    )
    a = _mk(spark, path, partition_by="p")
    a.create_if_absent(seed)
    a.merge(seed)

    b = _mk(spark, path, partition_by="p")
    orig_claim = MergeStore._claim_version
    state = {"fired": False}

    def interleaved_claim(self, version, expiry_s, touched=None, extra=None):
        if not state["fired"]:
            state["fired"] = True
            # A commits an evolution merge on the OTHER partition
            # while B holds its staged (pre-evolution) merge output
            a.merge(
                spark.createDataFrame(
                    [(1, 1, "a1", 7)], ["k", "p", "v", "x"]
                ),
                schema_evolution=True,
            )
            return False  # B loses this claim round
        return orig_claim(
            self, version, expiry_s, touched=touched, extra=extra
        )

    b._claim_version = types.MethodType(interleaved_claim, b)
    b.merge(spark.createDataFrame([(0, 0, "b0")], ["k", "p", "v"]))
    assert b.merge_fast_forwards == 1, "test must exercise the FF path"
    assert b.merge_recomputes == 1

    out = _mk(spark, path, partition_by="p").read()
    assert "x" in out.columns, "fast-forward dropped the evolved column"
    got = {r["k"]: (r["v"], r["x"]) for r in out.collect()}
    assert got == {0: ("b0", None), 1: ("a1", 7)}


def test_broken_claim_owner_mismatch_disables_fast_forward(spark, tmp_path):
    """W1 claims (touched={0}) and stalls past expiry; W2 breaks the
    claim (manifest now says touched={1}); W1 revives and wins the
    dir-rename arbiter. The committed CONTENT rewrote partition 0
    while the MANIFEST says 1 — `_manifest_touched` must refuse to
    attribute it (owner stamp mismatch), so `_ff_valid` conservatively
    re-merges instead of fast-forwarding over a lost update. After
    W1 re-asserts its manifest, attribution heals."""
    path = str(tmp_path / "broken")
    seed = spark.createDataFrame(
        [(0, 0, "z0"), (1, 1, "z1")], ["k", "p", "v"]
    )
    w1 = _mk(spark, path, partition_by="p")
    w1.create_if_absent(seed)
    w1.merge(seed)
    base = w1.current_version()
    nxt = f"v{_vnum(base) + 1:05d}"

    assert w1._claim_version(nxt, expiry_s=300.0, touched=["0"])
    w1_owner = w1._claim_owner
    # age the claim past expiry so W2 can break it
    manifest = os.path.join(path, "_COMMITS", f"{nxt}.json")
    old = time.time() - 1000
    os.utime(manifest, (old, old))
    w2 = _mk(spark, path, partition_by="p")
    assert w2._claim_version(nxt, expiry_s=300.0, touched=["1"])
    assert w2._claim_owner != w1_owner

    # W1 revives and wins the rename arbiter with ITS content
    staging = os.path.join(path, "_STAGING", "w1-revived")
    os.makedirs(staging)
    w1._claim_owner = w1_owner  # what a live W1 still holds
    assert w1._finalize_commit(staging, nxt, touched=["0"])

    # manifest (W2's) contradicts content (W1's)... except W1's
    # finalize re-asserted it — wind the manifest back to W2's to
    # model the crash-before-reassert window
    with open(manifest) as f:
        healed = json.load(f)
    assert healed["owner"] == w1_owner and healed["touched"] == ["0"]
    w2_record = {
        "version": nxt,
        "owner": "someone-else",
        "ts": time.time(),
        "touched": ["1"],
    }
    with open(manifest, "w") as f:
        json.dump(w2_record, f)
    # attribution refused -> no fast-forward in ANY direction
    assert w1._manifest_touched(nxt) is None
    assert not w1._ff_valid(base, nxt, ["0"])
    assert not w1._ff_valid(base, nxt, ["1"])
    # re-assert heals attribution
    w1._reassert_manifest(nxt, touched=["0"])
    assert w1._manifest_touched(nxt) == ["0"]
    assert not w1._ff_valid(base, nxt, ["0"])  # true conflict stays
    assert w1._ff_valid(base, nxt, ["1"])  # true disjoint passes


def test_normal_merge_stamps_owner_matching_manifest(spark, tmp_path):
    """Every claimed commit stamps `_OWNER` inside the snapshot and
    the manifest agrees, so attribution (and thus fast-forward)
    keeps working for the non-racy 99.9% case."""
    path = str(tmp_path / "stamped")
    store = _mk(spark, path, partition_by="p")
    seed = spark.createDataFrame([(0, 0, "a")], ["k", "p", "v"])
    store.create_if_absent(seed)
    v = store.merge(seed)
    owner_path = os.path.join(path, v, "_OWNER")
    assert os.path.isfile(owner_path)
    with open(owner_path) as f:
        stamped = f.read().strip()
    with open(os.path.join(path, "_COMMITS", f"{v}.json")) as f:
        assert json.load(f)["owner"] == stamped
    assert store._manifest_touched(v) == ["0"]


def test_zorder_key_never_touches_the_sign_bit(spark):
    """4 columns at the default 16 bits would interleave one
    dimension's bit 15 onto bigint bit 63 (sign) — rows with that
    bit set would range-partition FIRST, silently breaking the
    Morton layout. The per-column bit cap keeps every key
    non-negative; 5+ columns must not wrap shift counts either."""
    rows = [
        (0, 0, 0, 0, 0),
        (1, 2, 3, 4, 5),
        (40000, 40000, 40000, 40000, 40000),  # bit 15 set everywhere
        (65535, 65535, 65535, 65535, 65535),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c", "d", "e"])
    for cols in (["a", "b", "c", "d"], ["a", "b", "c", "d", "e"]):
        keys = [
            r["z"]
            for r in df.withColumn(
                "z", MergeStore.zorder_key(cols)
            ).collect()
        ]
        assert all(k >= 0 for k in keys), (cols, keys)
        assert len(set(keys)) == len(rows), "distinct inputs collided"
        assert keys == sorted(keys), (
            "componentwise-dominating rows must sort in order"
        )


def test_optimize_rejects_unknown_zorder_column_fast(spark, tmp_path):
    """A typo'd zorder_by column is a deterministic error: it must
    raise ValueError immediately (naming the column), not burn
    max_retries x 30s lost-race waits and blame 'commit races'."""
    store = _mk(spark, tmp_path / "typo")
    store.create_if_absent(
        spark.createDataFrame([(1, 5, "a")], ["k", "s", "v"])
    )
    store.merge(spark.createDataFrame([(1, 5, "a")], ["k", "s", "v"]))
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="scor"):
        store.optimize(zorder_by=["scor"], min_files=1)
    assert time.monotonic() - t0 < 10.0


def test_optimize_compacts_evolved_store_reading_snapshot_schema(
    spark, tmp_path
):
    """A partition whose files PREDATE a schema evolution lacks the
    added column on disk; optimize must compact it under the
    snapshot's committed schema (column reads as NULL) instead of
    failing analysis or silently dropping the column from the
    compacted files."""
    path = str(tmp_path / "evolved")
    store = _mk(spark, path, partition_by="p")
    seed = spark.createDataFrame(
        [(0, 0, "z0"), (1, 1, "z1")], ["k", "p", "v"]
    )
    store.create_if_absent(seed)
    store.merge(seed)
    store.merge(
        spark.createDataFrame([(1, 1, "a1", 7)], ["k", "p", "v", "x"]),
        schema_evolution=True,
    )
    # partition p=0's files have no column x; zorder on x's sibling
    # forces a full rewrite of both partitions
    v = store.optimize(zorder_by=["k"], target_file_bytes=1 << 30)
    assert v is not None
    got = {r["k"]: (r["v"], r["x"]) for r in store.read().collect()}
    assert got == {0: ("z0", None), 1: ("a1", 7)}


def test_restore_does_not_realias_source_owner_stamp(spark, tmp_path):
    """restore() hardlinks the whole source snapshot — including its
    _OWNER stamp. Stamping the staging must go through tmp +
    os.replace (directory-entry swap), because a truncate-in-place
    open("w") writes through the shared inode and rewrites the
    SOURCE version's stamp: its manifest owner then mismatches, the
    commit de-attributes, and fast-forward conservatively dies for
    history that was never touched."""
    path = str(tmp_path / "ownerstamp")
    store = _mk(spark, path)
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    o1_path = os.path.join(store._version_dir("v00001"), "_OWNER")
    before = open(o1_path).read()
    store.restore("v00001")
    assert open(o1_path).read() == before, "source stamp rewritten"
    o2 = open(os.path.join(store._version_dir("v00002"), "_OWNER")).read()
    assert o2 != before, "restore commit must carry its own owner"
    # attribution intact: v00001's manifest owner still matches
    with open(os.path.join(store._commits_dir(), "v00001.json")) as f:
        assert json.load(f)["owner"] == before


# -- pluggable commit-claim backends -----------------------------------
#
# The four storage primitives behind the protocol (claim create,
# claim break, publish, vacuum) are a strategy object
# (sources/logstore.py). PointerLogStore replaces the POSIX
# staging->version rename with an object-store-shaped conditional
# POINTER write (upload to immutable keys, then create-if-absent of
# a name referencing them) — running the same scenarios over both
# proves the protocol never leans on rename atomicity.

from etl_pipeline_4handling_listings_spark.sources.logstore import (  # noqa: E402
    PointerLogStore,
    PosixLogStore,
)

BACKENDS = [PosixLogStore, PointerLogStore]


@pytest.mark.parametrize("backend", BACKENDS)
def test_backend_lifecycle_merge_travel_vacuum(spark, tmp_path, backend):
    store = _mk(spark, tmp_path / "t", log_store=backend())
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)  # v00001
    store.merge(spark.createDataFrame([(1, "A"), (3, "c")], ["k", "v"]))
    store.append(spark.createDataFrame([(4, "d")], ["k", "v"]))
    got = {r["k"]: r["v"] for r in store.read().collect()}
    assert got == {1: "A", 2: "b", 3: "c", 4: "d"}
    # time travel across backend-published snapshots
    old = {r["k"]: r["v"] for r in store.read_version("v00001").collect()}
    assert old == {1: "a", 2: "b"}
    # vacuum reclaims through the backend (pointer + objects for the
    # double), and the survivors still read
    doomed = store.vacuum(keep=2)
    assert "v00001" in doomed
    assert not os.path.exists(store._version_dir("v00001"))
    assert {r["k"] for r in store.read().collect()} == {1, 2, 3, 4}


@pytest.mark.parametrize("backend", BACKENDS)
def test_backend_concurrent_merges_no_lost_update(
    spark, tmp_path, backend
):
    import threading

    path = str(tmp_path / "race")
    s = _mk(spark, path, log_store=backend())
    seed = spark.createDataFrame([(0, "z")], ["k", "v"])
    s.create_if_absent(seed)
    s.merge(seed)
    errs = []

    def writer(k):
        try:
            _mk(spark, path, log_store=backend()).merge(
                spark.createDataFrame([(k, f"w{k}")], ["k", "v"])
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [
        threading.Thread(target=writer, args=(k,)) for k in (1, 2, 3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = {r["k"]: r["v"] for r in s.read().collect()}
    assert got == {0: "z", 1: "w1", 2: "w2", 3: "w3"}


def test_pointer_backend_publish_is_exclusive(tmp_path):
    """Two staged snapshots racing to the same version name: exactly
    one conditional pointer write wins; the loser gets False and its
    uploaded objects are reclaimed — no torn final state."""
    ls = PointerLogStore()
    final = str(tmp_path / "v00001")
    stages = []
    for tag in ("a", "b"):
        st = str(tmp_path / f"stage_{tag}")
        os.makedirs(st)
        with open(os.path.join(st, "data.txt"), "w") as f:
            f.write(tag)
        stages.append(st)
    wins = [ls.publish_snapshot(st, final) for st in stages]
    assert wins == [True, False]
    assert open(os.path.join(final, "data.txt")).read() == "a"
    # loser's staging survives for its retry; winner's was consumed
    assert not os.path.exists(stages[0])
    assert os.path.exists(stages[1])


def test_pointer_backend_crash_before_flip_repairs(spark, tmp_path):
    """Publish succeeded (pointer object exists) but the writer died
    before the _CURRENT flip: _repair_pointer must roll forward over
    a backend-published snapshot exactly as over a renamed one."""
    store = _mk(spark, tmp_path / "t", log_store=PointerLogStore())
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)  # v00001
    # simulate the crash window: retract the pointer to v00000
    with open(store._pointer_path(), "w") as f:
        f.write("v00000")
    fresh = _mk(spark, tmp_path / "t", log_store=PointerLogStore())
    fresh._repair_pointer()
    assert fresh.current_version() == "v00001"
    assert {r["k"] for r in fresh.read().collect()} == {1}


def test_convert_lost_publish_race_raises(spark, tmp_path, monkeypatch):
    """convert must surface a lost v00000 publish (broken-claim
    breaker won) instead of silently unlinking originals whose
    content never became the snapshot."""
    src = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a")], ["k", "v"]).coalesce(
        1
    ).write.parquet(src)
    monkeypatch.setattr(
        PosixLogStore, "publish_snapshot", lambda self, s, f: False
    )
    with pytest.raises(RuntimeError, match="publish race"):
        MergeStore.convert(spark, src, keys=["k"])
    # originals untouched — nothing was unlinked
    assert any(
        n.endswith(".parquet") for n in os.listdir(src)
    )


def test_clone_lost_publish_race_raises(spark, tmp_path, monkeypatch):
    store = _mk(spark, tmp_path / "t")
    store.create_if_absent(
        spark.createDataFrame([(1, "a")], ["k", "v"])
    )
    monkeypatch.setattr(
        PosixLogStore, "publish_snapshot", lambda self, s, f: False
    )
    with pytest.raises(RuntimeError, match="publish race"):
        store.clone(str(tmp_path / "c"))


def test_pointer_guard_closes_the_staging_window(spark, tmp_path):
    """ADVICE r7: the advance-only check must be re-evaluated
    IMMEDIATELY before the atomic swap, not only before staging —
    on slow storage the tmp-write is a wide window where a paused
    flipper could regress the pointer past a newer committed
    version. The LogStore `guard` hook restores the old (pre-
    refactor) guarantee: a newer version landing mid-staging makes
    the slow flipper a no-op."""
    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    path = str(tmp_path / "guarded")
    store = _mk(spark, path)
    store.create_if_absent(spark.createDataFrame([(1, "a")], ["k", "v"]))
    store.merge(spark.createDataFrame([(1, "a")], ["k", "v"]))

    class RacingLogStore(PosixLogStore):
        """Lands a NEWER pointer between a flipper's staging write
        and its atomic swap (the exact widened window)."""

        def __init__(self):
            self.raced = False

        def replace_file(self, p, payload, guard=None):
            if guard is not None and not self.raced:
                self.raced = True
                PosixLogStore.replace_file(self, p, "v99999")
            PosixLogStore.replace_file(self, p, payload, guard)

    racing = RacingLogStore()
    store.log_store = racing
    store._set_current("v00007")  # slow flipper: stale by race time
    assert racing.raced
    assert store.current_version() == "v99999", (
        "pointer regressed: guard did not re-check inside the swap"
    )

    # and the primitive itself: guard=False aborts without touching
    # the target or leaking the staging file
    tgt = os.path.join(path, "probe")
    PosixLogStore().replace_file(tgt, "one")
    PosixLogStore().replace_file(tgt, "two", guard=lambda: False)
    with open(tgt) as f:
        assert f.read() == "one"
    assert [n for n in os.listdir(path) if n.startswith("probe.")] == []


def test_create_exclusive_claims_with_complete_content(tmp_path):
    """The claim name is the PUBLICATION point (a claimed _delta_log
    entry is read by concurrent clients the instant it exists), so
    create_exclusive must make the name appear only with its full
    payload — write-then-link, not open(O_EXCL)-then-write. Racing
    claimers: exactly one wins, the published content is the
    winner's COMPLETE payload, losers leave no tmp residue and never
    truncate the winner."""
    import threading

    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    ls = PosixLogStore()
    path = str(tmp_path / "claims" / "00000000000000000007.json")
    os.makedirs(os.path.dirname(path))
    payloads = {
        tag: (f"payload-{tag}-" + "x" * 256_000 + "\n") * 4
        for tag in "abcdefgh"
    }
    results: dict[str, bool] = {}
    barrier = threading.Barrier(len(payloads))

    def claim(tag):
        barrier.wait()
        results[tag] = ls.create_exclusive(path, payloads[tag])

    threads = [
        threading.Thread(target=claim, args=(t,)) for t in payloads
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [t for t, won in results.items() if won]
    assert len(winners) == 1
    assert open(path).read() == payloads[winners[0]]
    # no tmp residue from winner or losers
    assert os.listdir(os.path.dirname(path)) == [
        os.path.basename(path)
    ]
    # a later claim on the same name loses and changes nothing
    assert ls.create_exclusive(path, "late") is False
    assert open(path).read() == payloads[winners[0]]


def test_create_exclusive_falls_back_without_hardlinks(
    tmp_path, monkeypatch
):
    """Filesystems without hard links (SMB/FAT/some FUSE): os.link
    raising a generic OSError falls back to the exclusive-create
    claim — create-if-absent semantics preserved, payload intact,
    no tmp residue; a lost claim still returns False."""
    import errno

    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    real_link = os.link

    def no_link(src, dst, **kw):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(os, "link", no_link)
    try:
        ls = PosixLogStore()
        d = tmp_path / "claims"
        d.mkdir()
        path = str(d / "00000000000000000003.json")
        assert ls.create_exclusive(path, "payload-one") is True
        assert open(path).read() == "payload-one"
        assert ls.create_exclusive(path, "payload-two") is False
        assert open(path).read() == "payload-one"
        assert sorted(os.listdir(d)) == [os.path.basename(path)]
    finally:
        monkeypatch.setattr(os, "link", real_link)


def test_create_exclusive_sweeps_stale_tmps(tmp_path):
    """Crashed-writer staging files (dot-named .tmp, invisible to
    Delta listings AND vacuum) are reclaimed opportunistically on
    the next create_exclusive; fresh tmps and real entries are
    untouched."""
    import time

    from etl_pipeline_4handling_listings_spark.sources.logstore import (
        PosixLogStore,
    )

    d = str(tmp_path / "_delta_log")
    os.makedirs(d)
    stale = os.path.join(d, ".00000000000000000001.json.dead.tmp")
    with open(stale, "w") as f:
        f.write("{}")
    old = time.time() - 3600
    os.utime(stale, (old, old))
    fresh = os.path.join(d, ".00000000000000000002.json.live.tmp")
    with open(fresh, "w") as f:
        f.write("{}")
    entry = os.path.join(d, "00000000000000000000.json")
    with open(entry, "w") as f:
        f.write("{}\n")
    os.utime(entry, (old, old))

    target = os.path.join(d, "00000000000000000001.json")
    assert PosixLogStore().create_exclusive(target, '{"x": 1}\n')
    assert not os.path.exists(stale)  # reclaimed
    assert os.path.exists(fresh)  # in-flight claim untouched
    assert os.path.exists(entry)  # real entries never swept
    with open(target) as f:
        assert f.read() == '{"x": 1}\n'
