"""Driver type-contract gate, asserted in CI.

The driver's pandas canonicalization cannot hash array/map columns
(sorter crash), DECIMAL (Decimal-vs-float64 asymmetry), or DuckDB
HUGEINT (float64 widening). Round 3 shipped 8 such queries; this
test scans every registry query's Spark output schema AND every
oracle's DuckDB result types so the class can never re-enter.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.type_gate import (  # noqa: E402
    oracle_type_violations,
    spark_schema_violations,
)


def test_spark_output_schemas_pandas_hashable(spark, sf_dir):
    bad = spark_schema_violations(spark, sf_dir)
    assert not bad, (
        "driver-facing Spark outputs with non-hashable types "
        f"(serialize arrays with concat_ws, stringify decimals): {bad}"
    )


def test_oracle_result_types_pandas_hashable(sf_dir):
    bad = oracle_type_violations(sf_dir)
    assert not bad, (
        "oracle outputs with HUGEINT/DECIMAL/LIST types "
        f"(CAST sums to BIGINT, array_to_string lists): {bad}"
    )


def test_type_gate_catches_spark_array_output(spark, sf_dir, monkeypatch):
    """Guard liveness: a deliberately array-typed registry output must
    be flagged (the gate itself, not just the current registry, is
    what CI certifies)."""
    from etl_pipeline_4handling_listings_spark import queries as qmod
    from etl_pipeline_4handling_listings_spark.queries import QuerySpec

    def bad(spark_, sf_dir_):
        from pyspark.sql import functions as F

        return spark_.range(3).select(F.array(F.lit(1), F.lit(2)).alias("xs"))

    monkeypatch.setitem(
        qmod.REGISTRY, "_gate_probe", QuerySpec("_gate_probe", bad, None, "")
    )
    bad_rows = spark_schema_violations(spark, sf_dir)
    assert any("_gate_probe.xs: ArrayType" in b for b in bad_rows)


def test_type_gate_catches_hugeint_oracle(sf_dir, monkeypatch):
    """Guard liveness on the DuckDB side: an oracle whose SUM widens
    to HUGEINT must be flagged."""
    from etl_pipeline_4handling_listings_spark import queries as qmod
    from etl_pipeline_4handling_listings_spark.queries import QuerySpec

    monkeypatch.setitem(
        qmod.REGISTRY,
        "_gate_probe_sql",
        QuerySpec(
            "_gate_probe_sql",
            lambda s, d: None,
            "SELECT SUM(o_orderkey) AS s FROM orders",
            "",
        ),
    )
    bad_rows = oracle_type_violations(sf_dir)
    assert any("_gate_probe_sql.s: HUGEINT" in b for b in bad_rows)
