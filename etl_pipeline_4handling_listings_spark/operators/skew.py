"""Skew-mitigation kernels: salted joins and two-stage aggregation.

AQE's skew-join splitting (on in session.py) handles most runtime
skew; these operators are the explicit fallbacks for the cases AQE
cannot fix:

- :func:`salted_join` — a shuffle join where one key dominates
  (e.g. a single MLS board with half the listings): salt the skewed
  side N ways, replicate the other side N times. Turns one hot
  partition into N even ones at the cost of replicating the build
  side rows N×.
- :func:`salted_agg` — two-stage aggregation for high-cardinality
  hot keys when map-side partial aggregation isn't enough (e.g.
  collect-heavy aggs): aggregate on (key, salt) first, then merge.

Both are pure DataFrame compositions — Catalyst still owns the
physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted ``salt_buckets`` ways.

    ``skewed`` gets a random-but-deterministic salt from a stable
    row hash; ``other`` is exploded once per salt value so every
    (key, salt) pair still meets its match. Output drops the salt.

    Only joins that never preserve unmatched ``other`` rows are
    allowed: replication would emit each unmatched ``other`` row
    ``salt_buckets`` times under right/full.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "side would duplicate its unmatched rows; use inner/left/"
            "semi/anti, or salt the other side"
        )
    skew_salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(k) for k in skewed.columns]), F.lit(salt_buckets)),
    )
    other_replicated = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = skew_salted.join(other_replicated, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then keys.

    ``partial_aggs``: name -> aggregate over the salted groups.
    ``final_aggs``: name -> aggregate over the partial columns
    (referencing the partial names).
    """
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[a.alias(n) for n, a in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[a.alias(n) for n, a in final_aggs.items()]
    )
