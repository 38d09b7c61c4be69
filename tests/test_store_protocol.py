"""Protocol versioning (Delta reader/writer table features).

Reference semantics: delta-io/delta PROTOCOL.md — a table lists the
features its data depends on; a reader must implement every reader
feature before serving the table, a writer must implement BOTH
sides before mutating it, and an implementation that falls short
must refuse rather than proceed (an unaware reader would resurrect
deletion-vector-deleted rows; an unaware writer would commit stale
generated columns). Re-expressed for MergeStore as one O_EXCL
marker file per feature under ``_PROTOCOL/{reader,writer}/`` —
monotone, race-free protocol upgrades with no read-modify-write.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.sources.store import (
    MergeStore,
    ProtocolUnsupportedError,
    SUPPORTED_READER_FEATURES,
    SUPPORTED_WRITER_FEATURES,
    read_store_skip,
)


def _mk(spark, tmp_path, name="store", partition_by=None):
    store = MergeStore(
        spark, str(tmp_path / name), keys=["k"], partition_by=partition_by
    )
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    store.create_if_absent(df)
    store.merge(df)
    return store


def _inject(store, side, feature):
    d = os.path.join(store.path, "_PROTOCOL", side)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, feature), "w") as f:
        f.write("{}")


def test_baseline_table_has_empty_protocol(spark, tmp_path):
    """A table that never used a feature stays legacy-readable: no
    _PROTOCOL directory at all, empty feature sets."""
    store = _mk(spark, tmp_path)
    assert store.protocol() == {
        "reader_features": [],
        "writer_features": [],
    }
    assert not os.path.exists(os.path.join(store.path, "_PROTOCOL"))
    assert store.read().count() == 3


def test_dv_delete_enables_deletion_vectors_feature(spark, tmp_path):
    """First MOR delete declares deletion-vectors on BOTH sides
    before the commit — a reader that doesn't apply DVs must not be
    able to see a DV-bearing snapshot under a silent protocol."""
    store = _mk(spark, tmp_path)
    store.delete(F.col("k") == 2)
    proto = store.protocol()
    assert "deletion-vectors" in proto["reader_features"]
    assert "deletion-vectors" in proto["writer_features"]
    # this build supports it: reads serve the post-delete image
    assert sorted(r.k for r in store.read().collect()) == [1, 3]


def test_schema_evolution_enables_snapshot_schema(spark, tmp_path):
    store = _mk(spark, tmp_path)
    src = spark.createDataFrame([(4, "d", 9.5)], ["k", "v", "score"])
    store.merge(src, schema_evolution=True)
    assert "snapshot-schema" in store.protocol()["reader_features"]


def test_generated_and_constraints_are_writer_only(spark, tmp_path):
    """Metadata features old READERS can ignore must not poison the
    reader set — a generated column is just a column once written."""
    store = _mk(spark, tmp_path)
    store.add_generated_column("k2", "k * 2")
    store.add_constraint("k_pos", "k > 0")
    proto = store.protocol()
    assert proto["reader_features"] == []
    assert "generated-columns" in proto["writer_features"]
    assert "check-constraints" in proto["writer_features"]


def test_unknown_reader_feature_blocks_reads_and_writes(spark, tmp_path):
    store = _mk(spark, tmp_path)
    _inject(store, "reader", "row-tracking-v9")
    with pytest.raises(ProtocolUnsupportedError, match="row-tracking-v9"):
        store.read()
    with pytest.raises(ProtocolUnsupportedError):
        store.read_version("v00001")
    # stats-index read path refuses too (it bypasses _load_version)
    with pytest.raises(ProtocolUnsupportedError):
        read_store_skip(store, "k", 1, 2)
    # writers must satisfy the reader set as well (Delta's rule)
    with pytest.raises(ProtocolUnsupportedError):
        store.merge(spark.createDataFrame([(9, "z")], ["k", "v"]))
    with pytest.raises(ProtocolUnsupportedError):
        store.delete(F.col("k") == 1)


def test_unknown_writer_feature_blocks_writes_not_reads(spark, tmp_path):
    store = _mk(spark, tmp_path)
    _inject(store, "writer", "row-tracking-v8")
    assert store.read().count() == 3  # serving stays legal
    for op in (
        lambda: store.merge(spark.createDataFrame([(9, "z")], ["k", "v"])),
        lambda: store.delete(F.col("k") == 1),
        lambda: store.update(F.col("k") == 1, {"v": F.lit("x")}),
        lambda: store.optimize(),
        lambda: store.restore("v00001"),
        lambda: store.add_constraint("c", "k > 0"),
        lambda: store.add_generated_column("g", "k + 1"),
    ):
        with pytest.raises(ProtocolUnsupportedError, match="row-tracking-v8"):
            op()
    # the table is exactly as it was: no version burned, no marker
    assert store.current_version() == "v00001"
    assert "row-tracking-v8" not in SUPPORTED_WRITER_FEATURES


def test_datasource_read_refuses_unknown_reader_feature(spark, tmp_path):
    from etl_pipeline_4handling_listings_spark.sources.datasource import (
        register,
    )

    store = _mk(spark, tmp_path)
    register(spark)
    _inject(store, "reader", "future-magic")
    with pytest.raises(Exception, match="future-magic"):
        spark.read.format("mergestore").option("path", store.path).load().count()


def test_clone_carries_protocol(spark, tmp_path):
    """A clone's v00000 hardlinks DV-bearing state, so the protocol
    must travel with it — cloning never downgrades."""
    store = _mk(spark, tmp_path)
    store.delete(F.col("k") == 2)
    clone = store.clone(str(tmp_path / "clone"))
    assert "deletion-vectors" in clone.protocol()["reader_features"]
    assert sorted(r.k for r in clone.read().collect()) == [1, 3]


def test_feature_activation_is_idempotent_and_vacuum_safe(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.delete(F.col("k") == 2)
    store.delete(F.col("k") == 3)  # second activation: no error
    for _ in range(3):
        store.merge(spark.createDataFrame([(10, "x")], ["k", "v"]))
    store.vacuum(keep=1)
    store.compact_log(claim_expiry_s=0.0)
    proto = store.protocol()
    assert "deletion-vectors" in proto["reader_features"]
    assert sorted(r.k for r in store.read().collect()) == [1, 10]


def test_fsck_reports_unsupported_protocol(spark, tmp_path):
    store = _mk(spark, tmp_path)
    _inject(store, "reader", "row-tracking-v9")
    checks = {f["check"] for f in store.fsck()}
    assert "protocol-reader-unsupported" in checks


def test_supported_sets_cover_every_self_enabled_feature():
    """Every feature this build can ENABLE must be one it SUPPORTS —
    otherwise the store would lock itself out of its own tables."""
    enabled_by_this_build = {
        "deletion-vectors",
        "snapshot-schema",
        "generated-columns",
        "check-constraints",
        "identity-columns",
    }
    assert enabled_by_this_build <= (
        SUPPORTED_READER_FEATURES | SUPPORTED_WRITER_FEATURES
    )
    assert enabled_by_this_build <= SUPPORTED_WRITER_FEATURES


# -- in-commit timestamps (Delta inCommitTimestamps analogue) ----------


def test_commit_ts_monotone_under_backward_clock(spark, tmp_path, monkeypatch):
    """A writer whose wall clock reads EARLIER than the predecessor
    commit must still record a strictly later timestamp — version
    order and timestamp order may never disagree, or read_as_of
    resolves the wrong snapshot inside the inverted window."""
    import json as _json
    import os as _os

    store = _mk(spark, tmp_path)
    v1_ts = store._manifest_ts("v00001")
    # simulate clock skew: push v00001's recorded time 1h into the
    # future (a fast-clock writer), then commit v00002 normally
    manifest = _os.path.join(store._commits_dir(), "v00001.json")
    with open(manifest) as f:
        rec = _json.load(f)
    rec["ts"] = v1_ts + 3600.0
    with open(manifest, "w") as f:
        _json.dump(rec, f)
    store.merge(spark.createDataFrame([(9, "z")], ["k", "v"]))
    v1 = store._manifest_ts("v00001")
    v2 = store._manifest_ts("v00002")
    assert v2 > v1, "in-commit timestamp must clamp past the predecessor"
    # timestamp resolution respects the clamped order: just before
    # the (forged) v1 time only v00000 (the empty template) exists;
    # at/after v2 the post-merge image is served
    assert store.read_as_of(v1 - 1.0).count() == 0
    got = store.read_as_of(v2 + 1.0)
    assert sorted(r.k for r in got.collect()) == [1, 2, 3, 9]
    # and fsck stays silent: no inversion was committed
    assert not [f for f in store.fsck() if f["check"] == "timestamp-inversion"]


def test_fsck_flags_legacy_timestamp_inversion(spark, tmp_path):
    import json as _json
    import os as _os

    store = _mk(spark, tmp_path)
    store.merge(spark.createDataFrame([(9, "z")], ["k", "v"]))
    # forge a legacy store: v00002 recorded BEFORE v00001
    manifest = _os.path.join(store._commits_dir(), "v00002.json")
    with open(manifest) as f:
        rec = _json.load(f)
    rec["ts"] = store._manifest_ts("v00001") - 50.0
    with open(manifest, "w") as f:
        _json.dump(rec, f)
    checks = {f["check"] for f in store.fsck()}
    assert "timestamp-inversion" in checks
