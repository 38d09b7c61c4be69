"""Sampling operators for training-data pipelines.

Deterministic-by-content sampling — the property a 100 TB corpus
pipeline needs is that re-running the job (different cluster,
different partitioning) selects the SAME rows. Random-seed sampling
(``df.sample``) is partition-layout-dependent; these operators hash
row content instead:

- :func:`hash_split` — train/val/test splits by key hash: stable
  under repartitioning, joins, and incremental growth (a new row
  never moves an old row between splits).
- :func:`hash_sample` — p% sample by key hash, same stability.
- :func:`stratified_sample` — per-stratum exact-ish fractions via
  ``sampleBy`` (seeded; for quota-exact needs use
  :func:`per_key_top_n`).
- :func:`per_key_top_n` — exact per-key quotas with a deterministic
  priority (window rank), e.g. "at most 3 documents per domain".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def _key_hash(key_cols: Sequence[str], salt: str = "") -> Column:
    cols = [F.col(c) for c in key_cols]
    if salt:
        cols = [F.lit(salt), *cols]
    return F.pmod(F.xxhash64(*cols), F.lit(BUCKETS))


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append a split label ('train'/'val'/…) by content hash.

    ``weights`` maps label → fraction (must sum to ≤ 1; remainder
    falls into the last label). Same key ⇒ same split, forever.
    """
    h = _key_hash(key_cols, salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, frac in labels[:-1]:
        acc += frac
        cond = h < int(acc * BUCKETS)
        expr = (
            F.when(cond, label) if expr is None else expr.when(cond, label)
        )
    last_label = labels[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(last_label)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame, key_cols: Sequence[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash."""
    return df.filter(_key_hash(key_cols, salt) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum fractional sample (seeded ``sampleBy``)."""
    return df.sampleBy(stratum_col, fractions, seed)


def per_key_top_n(
    df: DataFrame,
    key_cols: Sequence[str],
    order: Sequence[Column],
    n: int,
) -> DataFrame:
    """Exact per-key quota: best ``n`` rows per key under ``order``
    (deterministic given a unique tiebreak) — the cap-per-domain
    operator of corpus curation."""
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.select("*", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
