"""Tests for approximate dedup + similarity search operators.

Strategy: exact brute force is the oracle; the approximate operator
must (a) never report a false positive after verification, and
(b) reach full recall on the clearly-separated planted duplicates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.functions.text import word_shingles
from etl_pipeline_4handling_listings_spark.operators.dedup_approx import (
    hamming64,
    jaccard,
    minhash_dedup_pairs,
    simhash,
    simhash_candidate_pairs,
)
from etl_pipeline_4handling_listings_spark.operators.similarity import (
    cosine_topk,
    rp_lsh_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river edge"),  # ~dup of 0
    (2, "completely different content about spark query engines and shuffles"),
    (3, "completely different content about spark query engines and shuffle"),  # ~dup of 2
    (4, "unrelated text mentioning neither foxes nor query engines at all"),
]


def test_minhash_finds_planted_dups_no_false_positives(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = minhash_dedup_pairs(
        docs, "doc_id", word_shingles("text", 3), threshold=0.5
    ).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert found == {(0, 1), (2, 3)}
    for p in pairs:
        assert p["jaccard"] >= 0.5


def test_minhash_agrees_with_exact_on_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = docs.select("doc_id", word_shingles("text", 3).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("j"))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            docs, "doc_id", word_shingles("text", 3), threshold=0.5
        ).collect()
    }
    assert approx == exact


def test_simhash_near_dup_distance(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    fps = docs.select("doc_id", simhash(toks).alias("sh"))
    rows = {r["doc_id"]: r["sh"] for r in fps.collect()}
    # deterministic across runs
    rows2 = {r["doc_id"]: r["sh"] for r in fps.collect()}
    assert rows == rows2

    dist = (
        spark.createDataFrame(
            [(a, b, rows[a], rows[b]) for a in rows for b in rows if a < b],
            ["a", "b", "ha", "hb"],
        )
        .select("a", "b", hamming64(F.col("ha"), F.col("hb")).alias("d"))
        .collect()
    )
    d = {(r["a"], r["b"]): r["d"] for r in dist}
    # near-dups are much closer in hamming space than unrelated docs
    assert d[(0, 1)] < d[(0, 2)]
    assert d[(2, 3)] < d[(2, 4)]


def test_simhash_block_lsh_candidates(spark):
    # hand-built fingerprints: b differs from a by 2 bits inside one
    # 16-bit block (guaranteed candidate at max_distance>=2 via the
    # pigeonhole: the other 3 blocks are identical); c is far away
    a = 0x0123456789ABCDEF
    b = a ^ 0x3  # flip 2 low bits
    c = ~a & 0x7FFFFFFFFFFFFFFF
    fps = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "sh"]
    )
    cands = simhash_candidate_pairs(fps, "doc_id", "sh", max_distance=3)
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in cands.collect()}
    assert found == {(1, 2): 2}


def test_rp_lsh_is_subset_of_exact_with_high_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, q, k=5)
    approx = rp_lsh_topk(emb, q, k=5, dim=64, planes=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # every approx hit must be a real vector pair with correct sim sign;
    # recall against exact top-5 should be substantial with 4 planes
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"recall {recall}"
    # scores reported by approx must equal exact cosine for same pairs
    ex = {(r["query_id"], r["neighbor_id"]): round(r["cosine_sim"], 9) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]): round(r["cosine_sim"], 9) for r in approx.collect()}
    for k_ in e & a:
        assert ex[k_] == ap[k_]


def test_cosine_topk_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # with exclude_self=False the top hit must be the query itself at sim ~1
    out = cosine_topk(emb, q, k=1, exclude_self=False).collect()
    assert out[0]["neighbor_id"] == 0
    assert abs(out[0]["cosine_sim"] - 1.0) < 1e-9


def test_ivf_topk_recall(spark, sf_dir):
    from etl_pipeline_4handling_listings_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, q, k=5)
    approx = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall}"
    # determinism: same seed, same result
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3).collect()
    }
    assert a == again


def test_simhash_signatures_agg_matches_fold(spark):
    from etl_pipeline_4handling_listings_spark.operators.dedup_approx import (
        simhash_signatures,
    )

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    fold = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash(toks).alias("sh")).collect()}
    agg = {r["doc_id"]: r["simhash64"] for r in simhash_signatures(docs, "doc_id", toks).collect()}
    assert fold == agg


def test_connected_components_clusters(spark):
    from etl_pipeline_4handling_listings_spark.operators.clustering import (
        connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    # components: {0,1,2,3} (chain), {4,5}, {6}, {7}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], ["id_a", "id_b"]
    )
    out = {r["id"]: r["component"] for r in connected_components(vertices, edges).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 7}


def test_prefix_filter_matches_inverted_index_exact(spark, sf_dir):
    """PPJoin prefix filtering is EXACT: its output must equal the
    inverted-index count-closure operator pair-for-pair (both claim
    the same contract through different physical plans)."""
    from etl_pipeline_4handling_listings_spark.operators.dedup_approx import (
        exact_jaccard_pairs,
    )
    from etl_pipeline_4handling_listings_spark.operators.setsim import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.5, 0.8):
        via_counts = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in exact_jaccard_pairs(
                docs, "doc_id", word_shingles("text", 3), threshold=t
            ).collect()
        }
        via_prefix = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in prefix_filter_jaccard_pairs(
                docs, "doc_id", word_shingles("text", 3), threshold=t
            ).collect()
        }
        assert via_prefix == via_counts
        assert via_prefix  # planted dups exist at both thresholds


def test_prefix_filter_planted_dups(spark):
    from etl_pipeline_4handling_listings_spark.operators.setsim import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = prefix_filter_jaccard_pairs(
        docs, "doc_id", word_shingles("text", 3), threshold=0.5
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 1), (2, 3)}
    for p in pairs:
        assert p["jaccard"] >= 0.5
