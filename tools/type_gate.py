"""Registry-wide output-type gate.

The driver canonicalizes both result sets through pandas before
hashing. Three output-type families cannot survive that path
(established experimentally in round 3, VERDICT.md "What's wrong"):

- array/map columns crash pandas' sorter
  (``TypeError: unhashable type: 'list'``);
- Spark DECIMAL arrives as ``decimal.Decimal`` objects while DuckDB
  DECIMAL arrives as float64 — the raw-value hash can never agree;
- DuckDB ``SUM(BIGINT)`` silently widens to HUGEINT -> float64 while
  Spark stays int64.

This module asserts, for EVERY registry query, that

- the Spark output schema contains no ArrayType / MapType /
  DecimalType / StructType (schema analysis only — nothing executes);
- the DuckDB oracle's result type list contains no HUGEINT /
  DECIMAL / LIST / STRUCT (lazy relation ``.types`` — the oracle is
  bound, not executed).

Wired into CI as ``tests/test_type_gate.py`` so this bug class can
never re-enter the registry.

Usage: python tools/type_gate.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_BAD_SPARK = ("ArrayType", "MapType", "DecimalType", "StructType")
_BAD_DUCK = ("HUGEINT", "DECIMAL", "LIST", "[]", "STRUCT", "MAP")


def spark_schema_violations(spark, sf_dir: str) -> list[str]:
    """Queries whose Spark OUTPUT schema has a non-pandas-hashable
    top-level column type. Only builds the lazy plan (analysis)."""
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    bad: list[str] = []
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            tname = type(f.dataType).__name__
            if tname in _BAD_SPARK:
                bad.append(f"{name}.{f.name}: {tname}")
    return bad


def oracle_type_violations(sf_dir: str) -> list[str]:
    """Oracles whose DuckDB result types include a type that pandas
    canonicalization mangles. Binds each oracle lazily over the real
    parquet (no materialization of results)."""
    import duckdb

    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad: list[str] = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        rel = conn.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            s = str(typ).upper()
            if any(b in s for b in _BAD_DUCK):
                bad.append(f"{name}.{col}: {s}")
    conn.close()
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from etl_pipeline_4handling_listings_spark.session import get_spark

    spark = get_spark(app_name="type_gate", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sv = spark_schema_violations(spark, sf_dir)
    ov = oracle_type_violations(sf_dir)
    for v in sv:
        print(f"SPARK  {v}")
    for v in ov:
        print(f"DUCKDB {v}")
    if not sv and not ov:
        print("ALL CLEAN")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
