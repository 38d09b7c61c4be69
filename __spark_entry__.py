"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship curated-pipeline composition on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY §2 (plus the beyond-reference document-pipeline operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query. Implementations live in
``etl_pipeline_4handling_listings_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path; make the sibling package
# importable regardless of the caller's sys.path
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from etl_pipeline_4handling_listings_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_curated"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries get the
    driver's weaker rows-only check."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
