"""Approximate near-duplicate detection at scale: MinHash-LSH, SimHash.

Beyond-reference operators for training-data pipelines (BASELINE
north star). All signature computation is built-in higher-order
expressions (``transform``/``aggregate``/``zip_with`` over arrays) —
JVM-side, codegen'd, no Python. The quadratic step is confined to
LSH buckets: candidate generation is an equi-join on band hashes
(one shuffle), never a cross join.

Scale sketch (100 TB documents):
  shingle+sign: map-only ........................ no shuffle
  band explode + self-join on (band, hash) ...... 1 shuffle, skew
      bounded by bucket size (cap via band bits)
  exact-verify join back to shingles ............ 1 shuffle
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minhash_signature(
    shingles: Column, num_hashes: int = 128, seed: int = 42
) -> Column:
    """MinHash signature: array of ``num_hashes`` 64-bit minima.

    Hash family: ``xxhash64(i, shingle, seed)`` — i is the hash
    index, giving num_hashes independent permutation approximations.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(i, s, F.lit(seed)))
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    signature_col: str,
    num_hashes: int = 128,
    bands: int = 64,
) -> DataFrame:
    """Banded-LSH candidate pairs ``(id_a, id_b)`` with id_a < id_b.

    Splits each signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band hash become a
    candidate pair. P(candidate | jaccard=j) = 1-(1-j^r)^b.
    """
    r = num_hashes // bands
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        b, F.concat_ws(",", F.slice(F.col(signature_col), b * r + 1, r))
                    ).alias("bhash"),
                ),
            )
        ).alias("bh"),
    ).select("_id", F.col("bh.band").alias("band"), F.col("bh.bhash").alias("bhash"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b)).cast(
        "double"
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str,
    shingles: Column,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 64,
) -> DataFrame:
    """Near-dup pairs above ``threshold`` true Jaccard: MinHash-LSH
    candidates, then exact verification on the shingle sets.

    Returns (id_a, id_b, jaccard). Output is exact-verified, so false
    positives are impossible; recall is 1-(1-t^r)^b at the threshold
    (≈1-1e-8 for t=.5, r=2, b=64).

    The signature stage is CPU-bound (|shingles|·num_hashes hash
    evals per row), so the input is spread across the cluster's full
    parallelism first — a small source file must not serialize the
    map stage onto one core.
    """
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    # repartition the RAW rows first: placed after the projection the
    # exchange would run the expensive shingle expressions inside the
    # (possibly single-task) scan stage
    base = (
        docs.repartition(max(parallelism, docs.rdd.getNumPartitions()))
        .select(F.col(id_col).alias("_id"), shingles.alias("_shingles"))
        .persist()
    )
    # NOTE (r11): a rewrite of this signature as explode + a
    # 64-column codegen'd min-aggregate (bit-identical minima,
    # avoiding the CodegenFallback higher-order walk) won a 2.1x
    # cold-session interleaved A/B — and then REGRESSED ~2x in
    # bench-faithful warm sessions (full sf0.001 warm pass first:
    # HOF shape 1.14 s, wide-agg shape 2.26 s on dedup_minhash_lsh;
    # 1.88 s vs 4.7+ s on dedup_clusters). In a long-lived session
    # the JIT compiles the interpreted-expression hot loops, while
    # the huge generated projection stays unprofitable. The driver's
    # bench is a warm session, so the HOF shape stands — measure in
    # the context you ship (guide §1).
    signed = base.select(
        "_id", minhash_signature(F.col("_shingles"), num_hashes).alias("_sig")
    )
    cands = lsh_candidate_pairs(signed, "_id", "_sig", num_hashes, bands)
    a = base.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("_sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("_sh_a"), F.col("_sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(tokens: Column, bits: int = 64, seed: int = 42) -> Column:
    """SimHash fingerprint (long) of a token array.

    Per token, xxhash64 gives 64 bits; each bit votes ±1 into a
    counter vector; fingerprint bit b is 1 iff counter[b] > 0.
    Entirely ``aggregate``/``zip_with`` — no UDF.
    """
    # bit positions are unrolled at plan-build time (shift amounts
    # must be literals for the JVM shift functions)
    def bit_votes(tok: Column) -> Column:
        h = F.xxhash64(tok, F.lit(seed))
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(bits)
            ]
        )

    counters = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), bits),
        lambda acc, tok: F.zip_with(acc, bit_votes(tok), lambda a, v: a + v),
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        # bit 63 as two's-complement long value
        val = (1 << b) if b < 63 else -(1 << 63)
        fp = fp + F.when(
            F.element_at(counters, b + 1) > 0, F.lit(val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return fp


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    bits: int = 64,
    seed: int = 42,
    out_col: str = "simhash64",
    token_hash=None,
) -> DataFrame:
    """SimHash via explode + hash aggregation — the scale path.

    Result-identical to :func:`simhash` (same hash family, votes,
    sign rule) but expressed as one vectorized ``groupBy`` with
    ``bits`` conditional sums instead of a per-row array fold: the
    fold builds a 64-wide array per token inside a giant generated
    expression (interpreter-bound), while the agg form runs in
    whole-stage-codegen'd hash aggregation (~10x faster measured at
    5000 docs). One shuffle on the doc id.

    ``token_hash``: optional ``Column -> Column`` producing the
    per-token integer hash (default xxhash64(tok, seed)); pass
    ``sampling.portable_hash60`` composition with ``bits=60`` for a
    DuckDB-reproducible fingerprint.
    """
    exploded = df.select(F.col(id_col), F.explode(tokens).alias("_tok"))
    tok = F.col("_tok")
    h = token_hash(tok) if token_hash is not None else F.xxhash64(tok, F.lit(seed))
    # Project the token hash ONCE, then build the per-bit vote sums
    # and the fingerprint fold as SQL text: constructing these
    # ``bits``-wide trees through the Column API costs ~1000 py4j
    # round-trips (~2.4 s of pure driver-side DataFrame BUILD time
    # per invocation, measured at bits=60 — dwarfing the 0.8 s the
    # query spends executing); one parsed expr string per bit is
    # value-identical (same shifts, same votes, same sign rule).
    hashed = exploded.select(F.col(id_col), h.alias("_h"))
    terms = " + ".join(
        # per-bit vote sum and sign fold in ONE aggregate expression:
        # bit 63 as two's-complement long; -(1<<63) has no direct
        # literal form (unary minus over 1<<63 overflows the parser)
        f"if(sum(if((shiftright(_h, {b}) & 1) = 1, 1, -1)) > 0, "
        + (f"{1 << b}L" if b < 63 else "-9223372036854775807L - 1L")
        + ", 0L)"
        for b in range(bits)
    )
    return hashed.groupBy(id_col).agg(
        F.expr(f"cast(({terms}) as bigint)").alias(out_col)
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    simhash_col: str,
    max_distance: int = 3,
    blocks: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Pairs within ``max_distance`` Hamming bits, via block-LSH.

    Pigeonhole: distance ≤ blocks-1 guarantees at least one of
    ``blocks`` equal (bits/blocks)-wide blocks, so recall is exact
    for max_distance < blocks. Block equi-join = one shuffle.
    """
    width = bits // blocks
    mask = (1 << width) - 1
    # block index unrolled at plan-build time (literal shift amounts)
    blocked = df.select(
        F.col(id_col).alias("_id"),
        F.col(simhash_col).alias("_sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bl).alias("block"),
                        F.shiftrightunsigned(F.col(simhash_col), bl * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for bl in range(blocks)
                ]
            )
        ).alias("bv"),
    ).select("_id", "_sh", F.col("bv.block").alias("block"), F.col("bv.bkey").alias("bkey"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a._sh"), F.col("b._sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )


def exact_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    shingles: Column,
    threshold: float,
) -> DataFrame:
    """EXACT all-pairs Jaccard >= threshold via an inverted index —
    no quadratic cross join, no approximation.

    Explode each document's (distinct) shingles, self-join on the
    shingle, count co-occurrences per pair: pairs sharing zero
    shingles (Jaccard 0) never materialize at all, and
    ``|A ∪ B| = |A| + |B| - |A ∩ B|`` closes the formula from
    integer counts only — bit-exact in any engine.

    Scale: cost is Σ_shingle df·(df-1)/2 over document frequencies,
    not |docs|² — near-linear on real corpora where shingles are
    rare. A shingle appearing in a large fraction of the corpus
    (df ~ |docs|) degrades toward quadratic; de-noise inputs (or
    cap df) before calling if that is a real risk.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    base = docs.select(
        F.col(id_col).alias("_id"), shingles.alias("_shingles")
    ).withColumn("_sz", F.size("_shingles"))
    ex = base.select("_id", "_sz", F.explode("_shingles").alias("_sh"))
    # a-x-b self-join on the shingle (the r10 shape, REINSTATED in
    # r12): an r11 rewrite expanded ordered pairs map-side from
    # per-shingle posting lists — one shuffle of the exploded stream
    # instead of two, one scan instead of two — but it regressed in
    # the driver's bench (1.29 -> 1.73 s) and a bench-faithful warm
    # interleaved A/B (full sf0.001 registry warm pass, 5 runs each)
    # reproduced it decisively: join MIN 1.204 s / MED 1.282 s vs
    # posting MIN 1.541 s / MED 1.589 s at sf0.1. The collect_list
    # buffer build + posexplode/slice re-expansion costs more CPU
    # than the saved exchange at any scale where C(df,2) pair rows
    # dominate both shapes — the pair fan-out, not the exploded
    # stream, is the asymptotic term, and the join streams it
    # straight out of the hash probe. (This shape also never emits
    # self-pairs when a document carries duplicate shingles; the
    # posting expansion did.)
    a = ex.select(
        F.col("_sh"), F.col("_id").alias("id_a"), F.col("_sz").alias("_sza")
    )
    b = ex.select(
        F.col("_sh"), F.col("_id").alias("id_b"), F.col("_sz").alias("_szb")
    )
    inter = (
        a.join(b, ["_sh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("_inter"),
            F.first("_sza").alias("_sa"),
            F.first("_szb").alias("_sb"),
        )
    )
    jac = F.col("_inter") / (F.col("_sa") + F.col("_sb") - F.col("_inter")).cast(
        "double"
    )
    return inter.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
