"""Grouped-map Python operators via ``applyInPandas``.

The rule in this engine is: per-group statistics that SQL aggregates
can express (means, variances, OLS from covar/var — see the
``events_user_trend`` registry query) run as built-ins, JVM-side.
``applyInPandas`` is reserved for per-group logic that genuinely
needs Python — sklearn-style fits, scipy optimizations, model
scoring — where the shape is: one shuffle on the group key, then an
Arrow-batched pandas frame per group in Python.

``grouped_ols`` is the bridge case implemented both ways: the
pandas path here, the aggregate path in the registry, pytest
asserts they agree (tests/test_groupmap.py). Use it as the template
for real Python-only group fits; the partitioning story is
identical.

Scale: one Exchange on the key; each task holds ONE group's rows in
memory at a time. Groups must individually fit in executor memory —
the same contract as any sklearn-per-group design; pre-aggregate or
sample oversized groups first.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OLS_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.LongType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
    ]
)


def grouped_ols(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    min_obs: int = 2,
) -> DataFrame:
    """Per-group simple OLS fit (population moments): returns
    (group_key, n_obs, slope, intercept) for groups with at least
    ``min_obs`` rows and non-zero x variance."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        var = ((x - x.mean()) ** 2).mean()
        if n < min_obs or var == 0.0:
            return pd.DataFrame(columns=[f.name for f in OLS_SCHEMA.fields])
        cov = ((x - x.mean()) * (y - y.mean())).mean()
        slope = cov / var
        intercept = y.mean() - slope * x.mean()
        return pd.DataFrame(
            {
                "group_key": [int(pdf[key_col].iloc[0])],
                "n_obs": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    # Pin the Python stage's parallelism with an explicit keyed
    # repartition: it satisfies the groupBy's required distribution
    # (no second shuffle) and, unlike the groupBy's own exchange, is
    # NOT size-coalesced by AQE. Size-based coalescing is wrong for
    # grouped-map Python: a few MB of input can carry thousands of
    # groups whose per-call pandas overhead dominates — AQE collapsed
    # this stage to ONE task and serialized every fit through a
    # single worker (measured 8.2 s -> 0.8 s at sf0.1 on local[32]).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key_col, x_col, y_col)
        .repartition(n_parts, key_col)
        .groupBy(key_col)
        .applyInPandas(fit, schema=OLS_SCHEMA)
    )
