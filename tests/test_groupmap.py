"""applyInPandas grouped-map: the Python OLS fit must agree with the
registry's built-in covar_pop/var_pop path on the same data."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_4handling_listings_spark.operators.groupmap import (  # noqa: E402
    grouped_ols,
)


def _pts(spark):
    rows = []
    for g in range(5):
        for i in range(20):
            x = float(i)
            y = 2.0 * g * x + 3.0 + (i % 3 - 1) * 0.25  # slope 2g, noise
            rows.append((g, x, y))
    rows.append((9, 1.0, 5.0))  # single-obs group: dropped
    rows.append((8, 4.0, 1.0))  # zero-variance group: dropped
    rows.append((8, 4.0, 2.0))
    return spark.createDataFrame(rows, "g LONG, x DOUBLE, y DOUBLE")


def test_grouped_ols_matches_builtin_aggregate(spark):
    df = _pts(spark)
    py = {
        r["group_key"]: (r["n_obs"], r["slope"], r["intercept"])
        for r in grouped_ols(df, "g", "x", "y").collect()
    }
    jvm = {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in df.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            (F.covar_pop("y", "x") / F.var_pop("x")).alias("slope"),
            (
                F.avg("y") - (F.covar_pop("y", "x") / F.var_pop("x")) * F.avg("x")
            ).alias("intercept"),
        )
        .filter(F.var_pop("x") > 0)
        .collect()
        if r["n"] >= 2
    }
    assert set(py) == set(jvm) == {0, 1, 2, 3, 4}
    for g in py:
        assert py[g][0] == jvm[g][0]
        assert abs(py[g][1] - jvm[g][1]) < 1e-9
        assert abs(py[g][2] - jvm[g][2]) < 1e-9
        assert abs(py[g][1] - 2.0 * g) < 0.1  # recovers the planted slope


def test_grouped_ols_plan_is_arrow_not_row_python(spark):
    df = _pts(spark)
    plan = grouped_ols(df, "g", "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
