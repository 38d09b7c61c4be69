"""Incremental near-dup index: cross-batch detection + idempotency."""

from __future__ import annotations

from etl_pipeline_4handling_listings_spark.functions.text import word_shingles
from etl_pipeline_4handling_listings_spark.operators.neardup_index import (
    NearDupIndex,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about spark query engines and shuffles"),
    (3, "unrelated text mentioning neither foxes nor query engines at all"),
]
BATCH2 = [
    (10, "the quick brown fox jumps over the lazy dog near the river edge"),  # ~dup of 1
    (11, "entirely novel material discussing streaming watermarks and state"),
    (12, "entirely novel material discussing streaming watermarks and states"),  # ~dup of 11
]


def _index(spark, tmp_path):
    store = MergeStore(spark, str(tmp_path / "ndidx"), keys=["doc_id"])
    return NearDupIndex(store, num_hashes=64, bands=32, threshold=0.5)


def test_incremental_cross_batch_pairs(spark, tmp_path):
    idx = _index(spark, tmp_path)
    docs1 = spark.createDataFrame(BATCH1, ["doc_id", "text"])
    pairs1 = idx.add(docs1, "doc_id", word_shingles("text", 3))
    assert pairs1.count() == 0  # batch 1 has no internal dups

    docs2 = spark.createDataFrame(BATCH2, ["doc_id", "text"])
    pairs2 = idx.add(docs2, "doc_id", word_shingles("text", 3))
    found = {(r["id_a"], r["id_b"]) for r in pairs2.collect()}
    # cross-batch dup (1,10) and within-batch dup (11,12)
    assert (1, 10) in found
    assert (11, 12) in found
    assert len(found) == 2
    # the store now holds all six documents
    assert idx.store.read().count() == 6


def test_incremental_readd_idempotent(spark, tmp_path):
    idx = _index(spark, tmp_path)
    docs1 = spark.createDataFrame(BATCH1, ["doc_id", "text"])
    idx.add(docs1, "doc_id", word_shingles("text", 3))
    # re-adding the identical batch: no self-pairs, no growth
    again = idx.add(docs1, "doc_id", word_shingles("text", 3))
    assert again.count() == 0
    assert idx.store.read().count() == 3
