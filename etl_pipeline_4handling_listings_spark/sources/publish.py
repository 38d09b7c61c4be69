"""Downstream publishing: metastore tables + RDBMS mirror.

Covers the reference's exit path (SURVEY §2.1 S11-S13): the Hive
external tables over export directories (ref listings/ddl/*.sql)
and the Sqoop→SQL-Server staging/swap publish
(ref listings/sqoop/sqoop_listings.sh + T-SQL procs), re-expressed
as Spark-native equivalents:

- :func:`register_external_table` — ``CREATE TABLE ... USING parquet
  LOCATION`` (the metastore DDL the reference maintains by hand);
- :func:`write_jdbc` — ``df.write.jdbc`` replaces the Sqoop
  MapReduce export (`-m 2` ≙ ``numPartitions=2``);
- :func:`publish_staging_swap` — the reference's
  truncate-staging → export → swap-rename procedure as an
  idempotent two-step (staging write + validated swap), with the
  row-count check that Sqoop's ``--validate`` performed.

Tested end-to-end against embedded Apache Derby (the JDBC driver
Spark ships for its Hive metastore): write, read-back, validated
staging→final swap — see
``tests/test_publish_schema.py::test_jdbc_roundtrip_and_staging_swap_derby``.
Point ``url``/``properties`` at SQL Server for the reference's
actual target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_external_table(
    spark: SparkSession,
    name: str,
    path: str,
    fmt: str = "parquet",
    replace: bool = True,
) -> None:
    """External (unmanaged) table over an export directory — S13."""
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING {fmt} LOCATION '{path}'")


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int = 2,
    properties: dict[str, str] | None = None,
) -> None:
    """RDBMS export — S11 (Sqoop's ``-m 2`` ≙ ``num_partitions``)."""
    writer = df.coalesce(num_partitions).write.mode(mode)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.jdbc(url, table)


def publish_staging_swap(
    df: DataFrame,
    url: str,
    staging_table: str,
    final_table: str,
    properties: dict[str, str] | None = None,
    validate: bool = True,
) -> None:
    """Staging-then-swap publish — S12's swap-rename procedure.

    1. overwrite the staging table;
    2. optional row-count validation (Sqoop ``--validate``);
    3. atomically repoint the final table (``overwrite`` of the
       final from staging — RDBMS-side rename would need a
       dialect-specific statement executed via the JDBC driver).
    """
    expected = df.count() if validate else None
    write_jdbc(df, url, staging_table, mode="overwrite", properties=properties)
    spark = df.sparkSession
    back = spark.read.jdbc(url, staging_table, properties=properties or {})
    if validate and expected is not None:
        actual = back.count()
        if actual != expected:
            raise RuntimeError(
                f"publish validation failed: wrote {expected} rows, "
                f"staging has {actual}"
            )
    back.write.mode("overwrite").jdbc(url, final_table, properties=properties)
