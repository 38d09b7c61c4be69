"""Incremental near-duplicate index: MinHash signatures as state.

One-shot LSH (operators/dedup_approx.py) answers "which pairs in
THIS corpus are near-dups". A continuously-ingesting pipeline needs
the incremental question: "which of TODAY's documents duplicate
anything already accepted?" — without recomputing signatures for
the whole corpus. :class:`NearDupIndex` persists (id, shingles,
signature) in a :class:`MergeStore` and, per batch:

1. signs the new documents (map-only);
2. band-joins new signatures against the stored ones
   (new-vs-corpus) AND against themselves (new-vs-new) — both are
   equi-joins on (band, bandhash), one shuffle each, never a scan
   of corpus × batch;
3. exact-verifies candidates with true Jaccard on the stored
   shingle sets (no false positives);
4. MERGEs the new signatures into the store (idempotent: re-adding
   a batch changes nothing and reports no self-pairs).

Scale: the store can be hash-bucket partitioned like any MergeStore;
at 100 TB you additionally materialize the exploded band table
partitioned by band so step 2 prunes to matching band partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.operators.dedup_approx import (
    jaccard,
    minhash_signature,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore


class NearDupIndex:
    def __init__(
        self,
        store: MergeStore,
        num_hashes: int = 128,
        bands: int = 64,
        threshold: float = 0.5,
    ) -> None:
        assert num_hashes % bands == 0
        self.store = store
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.threshold = threshold

    # -- internals -----------------------------------------------------
    def _banded(self, signed: DataFrame, side: str) -> DataFrame:
        r = self.rows_per_band
        return signed.select(
            F.col("doc_id").alias(side),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.lit(b),
                                F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r)),
                            ).alias("bhash"),
                        )
                        for b in range(self.bands)
                    ]
                )
            ).alias("bv"),
        ).select(side, "bv.band", "bv.bhash")

    def _sign(self, docs: DataFrame, id_col: str, shingles: Column) -> DataFrame:
        parallelism = docs.sparkSession.sparkContext.defaultParallelism
        return (
            docs.repartition(max(parallelism, docs.rdd.getNumPartitions()))
            .select(
                F.col(id_col).alias("doc_id"), shingles.alias("shingles")
            )
            .withColumn("sig", minhash_signature(F.col("shingles"), self.num_hashes))
        )

    def _verify(self, cands: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
        a = left.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("_sa"))
        b = right.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("_sb"))
        return (
            cands.join(a, "id_a")
            .join(b, "id_b")
            .select("id_a", "id_b", jaccard(F.col("_sa"), F.col("_sb")).alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
        )

    # -- public API ----------------------------------------------------
    def add(self, docs: DataFrame, id_col: str, shingles: Column) -> DataFrame:
        """Index a batch; returns verified near-dup pairs
        (id_a, id_b, jaccard) where id_b is from the NEW batch and
        id_a is either an already-indexed doc or an earlier id in
        the same batch. Already-indexed ids are skipped (idempotent).
        """
        new = self._sign(docs, id_col, shingles).persist()
        if self.store.exists():
            corpus = self.store.read().persist()
            seen = corpus.select(F.col("doc_id").alias("_seen"))
            new = new.join(
                seen, new["doc_id"] == seen["_seen"], "left_anti"
            ).persist()
        else:
            corpus = None
            self.store.create_if_absent(new)

        nb = self._banded(new, "id_b")
        pairs = None
        if corpus is not None:
            cb = self._banded(corpus, "id_a")
            cross = (
                cb.join(nb, ["band", "bhash"])
                .select("id_a", "id_b")
                .filter(F.col("id_a") != F.col("id_b"))
                .distinct()
            )
            pairs = self._verify(cross, corpus, new)
        na = self._banded(new, "id_a")
        within = (
            na.join(nb, ["band", "bhash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        wpairs = self._verify(within, new, new)
        out = wpairs if pairs is None else pairs.unionByName(wpairs)
        # materialize results BEFORE mutating the store so the lazy
        # plan cannot observe post-merge state
        result = out.persist()
        result.count()
        self.store.merge(new.select("doc_id", "shingles", "sig"))
        return result
