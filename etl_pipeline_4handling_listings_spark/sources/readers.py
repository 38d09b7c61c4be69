"""Columnar sources with pushdown-friendly read patterns.

Covers the reference's scan surface (SURVEY §2.1 S1-S4, S10):
filtered raw scans, multi-directory union scans, dimension scans.
Filters are passed as SQL-string or Column predicates applied
directly on the scan so Catalyst pushes them into the parquet/ORC
reader (``PushedFilters``) and prunes partitions — the property the
reference relies on for its ``load_date between`` incremental reads
(reference listings/mls_listings_curated.py:71-77).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    predicate: str | Column | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Read one columnar table with optional pushed filter/projection."""
    df = spark.read.format(fmt).load(path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns is not None:
        df = df.select(*columns)
    return df


def read_union(
    spark: SparkSession,
    paths: Iterable[str],
    fmt: str = "parquet",
    predicate: str | Column | None = None,
) -> DataFrame:
    """Union scan over multiple directories (S2).

    The reference reduces with position-based ``unionAll``
    (curated.py:77) — a latent column-order hazard; we use
    ``unionByName`` with missing columns allowed so schema drift
    across daily directories cannot silently misalign values.
    """
    dfs = [read_table(spark, p, fmt=fmt, predicate=predicate) for p in paths]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def read_dims(
    spark: SparkSession, paths: dict[str, str], fmt: str = "parquet"
) -> dict[str, DataFrame]:
    """Load named dimension tables (S3). Callers broadcast at join
    time — broadcast is a join-site decision, not a read-site one."""
    return {name: read_table(spark, p, fmt=fmt) for name, p in paths.items()}
