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
