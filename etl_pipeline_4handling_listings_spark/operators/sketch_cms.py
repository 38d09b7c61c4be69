"""Count-Min sketch: fixed-size frequency estimates over a keyed stream.

Beyond-reference sketch family (with HLL distinct and the KLL-style
quantile sketch already in the registry): heavy-hitter detection at
100 TB cannot afford an exact per-key count of the full key universe
— the Count-Min sketch (Cormode & Muthukrishnan 2005) keeps
``depth x width`` counters regardless of cardinality, is mergeable
across partitions/batches (counter-wise sum), and never
underestimates: ``est(k) = min_i counter[i][h_i(k)] >= true(k)``,
with overestimate bounded by ``(e/width) * N`` w.h.p.

Everything is JVM-side integer arithmetic — the hash family is an
affine ``(k' * A_i + B_i) mod P mod width`` over a pre-reduced key
``k' = k mod P31``, chosen so every intermediate fits in a signed
64-bit long under ANSI overflow checking (k' < 2^31, A_i < 2^31,
product < 2^62).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# fixed odd multipliers / offsets (< 2^31) for the affine hash family
# shared 64-bit-safe affine hash family (also used by
# operators/bloomfilter.py — one definition, never two copies)
_A = [2654435761, 2246822519, 3266489917, 668265263, 374761393,
      2166136261, 16777619]
_B = [1013904223, 1640531527, 2027808243, 1103515245, 12345,
      1566083941, 1812433253]
_P31 = 2147483647  # 2^31 - 1 (Mersenne prime)
_P61 = 2305843009213693951  # 2^61 - 1 (Mersenne prime)


def _bucket(key: Column, i: int, width: int) -> Column:
    """Row-``i`` counter index for ``key`` — pure 64-bit-safe math.

    ``xxhash64`` reduces a key of ANY type (string, long, struct)
    to a long before the affine family, so the sketch works on raw
    id/text columns without casts."""
    k = F.pmod(F.xxhash64(key), F.lit(_P31))
    return F.pmod(F.pmod(k * F.lit(_A[i]) + F.lit(_B[i]), F.lit(_P61)), F.lit(width))


def cms_build(
    df: DataFrame, key: str, depth: int = 3, width: int = 2048
) -> DataFrame:
    """Aggregate ``df`` into a Count-Min sketch.

    Returns at most ``depth * width`` rows ``(row, bucket, cnt)`` —
    a fixed-size, broadcastable frame however large ``df`` is. One
    map-side-combinable shuffle: each input row contributes
    ``depth`` (row, bucket) increments via an exploded literal
    array, and partial sums combine before the exchange.
    """
    assert 1 <= depth <= len(_A), "depth exceeds the fixed hash family"
    probes = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _bucket(F.col(key), i, width).alias("bucket"))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, sketch: DataFrame, key: str, depth: int = 3, width: int = 2048
) -> DataFrame:
    """Point-estimate each key's frequency from a built sketch.

    ``est = min`` over the sketch rows the key hashes into; buckets
    absent from the sketch are zero (left join + coalesce). The
    sketch side is broadcast — it is bounded by ``depth * width``
    rows by construction, so the probe never shuffles ``keys``.
    """
    probes = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _bucket(F.col(key), i, width).alias("bucket"))
            for i in range(depth)
        ]
    )
    exploded = keys.select(F.col(key), F.explode(probes).alias("p")).select(
        F.col(key), F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket")
    )
    return (
        exploded.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
