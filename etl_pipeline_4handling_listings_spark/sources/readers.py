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


def read_json_lenient(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
):
    """JSON-lines ingestion that captures malformed rows instead of
    failing the job (S10's source side, hardened).

    PERMISSIVE mode parses what it can; a row that does not parse
    lands whole in ``corrupt_col`` with nulls elsewhere. Returns
    (good, bad): ``bad`` carries the raw offending line — route it
    to the reject sink (S8) so ingestion quality is observable, the
    same degrade-don't-fail posture as the enrichment transport.

    ``schema`` must NOT contain ``corrupt_col``; it is added here.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    full = T.StructType(
        [*schema.fields, T.StructField(corrupt_col, T.StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # Spark requires materializing before filtering on the corrupt
    # column (it is populated at parse time, not re-derivable)
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad
