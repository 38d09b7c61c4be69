"""Bloom-filter build/probe as DataFrame operators.

The scale pattern behind Spark's own runtime row-group/join pruning
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), made explicit
and portable: build a fixed-size bit array from a key set, broadcast
it, and prefilter a huge probe side map-side before any exact join.
At 100 TB the win is that the probe side never shuffles — only the
(tiny) surviving candidate set reaches the exact semi-join. The
guarantee that makes it safe as a *pre*filter: no false negatives —
every true match passes; false positives are bounded by
``(1 - e^{-kn/m})^k`` and re-checked exactly downstream.

Representation: the ``m``-bit array as ``ceil(m/62)`` longs, built
with a ``bit_or`` aggregate over per-key set bits (bits 0..61 only,
so no sign-bit edge cases). Hash family: the same 64-bit-safe
affine arithmetic as ``operators/sketch_cms`` — deterministic,
engine-portable, no library dependency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from etl_pipeline_4handling_listings_spark.operators.sketch_cms import (
    _A,
    _B,
    _P31,
    _P61,
)

_WORD_BITS = 62


def _positions(key: Column, num_hashes: int, num_bits: int) -> Column:
    """Array of ``num_hashes`` bit positions in ``[0, num_bits)``.

    ``xxhash64`` reduces a key of ANY type to a long first, so
    fingerprint strings probe directly — no cast, no conv step."""
    k = F.pmod(F.xxhash64(key), F.lit(_P31))
    return F.array(
        *[
            F.pmod(
                F.pmod(k * F.lit(_A[i]) + F.lit(_B[i]), F.lit(_P61)),
                F.lit(num_bits),
            )
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    keys: DataFrame, key: str, num_bits: int = 1 << 18, num_hashes: int = 5
) -> DataFrame:
    """Aggregate a key set into bloom words ``(word_idx, word)``.

    Output is at most ``ceil(num_bits / 62)`` rows regardless of
    input size — always broadcastable. One map-side-combinable
    shuffle (bit_or partials merge before the exchange).
    """
    assert num_hashes <= len(_A)
    pos = F.explode(_positions(F.col(key), num_hashes, num_bits)).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pos % {_WORD_BITS} AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    num_bits: int = 1 << 18,
    num_hashes: int = 5,
) -> DataFrame:
    """Append ``bloom_hit`` (boolean) to ``df``.

    Explodes each probe key's ``num_hashes`` positions, broadcast-
    joins the word table, and requires every probed bit to be set.
    The only shuffle is the per-key ``bool_and`` re-group — and when
    ``df`` carries a unique ``key``, AQE coalesces it to the probe
    side's own partitioning; the bloom side never shuffles.
    """
    probe = df.select(
        F.col(key),
        F.posexplode(_positions(F.col(key), num_hashes, num_bits)).alias("i", "pos"),
    ).select(
        F.col(key),
        F.col("i"),
        (F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, CAST(pos % {_WORD_BITS} AS INT))").alias("bit"),
    )
    hits = (
        probe.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            F.col(key),
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("bit")) != 0)
            ).alias("bit_set"),
        )
        .groupBy(key)
        .agg(F.bool_and("bit_set").alias("bloom_hit"))
    )
    return df.join(hits, key, "left")
