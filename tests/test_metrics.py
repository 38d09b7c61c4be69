"""observe() metrics: counts ride the action, no extra jobs."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_4handling_listings_spark.operators.metrics import (  # noqa: E402
    observe_rows,
)


def test_observe_rows_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, None, 2.0), (2, "b", None), (3, "c", 4.0)],
        "k LONG, v STRING, x DOUBLE",
    )
    obs = Observation("t")
    out = observe_rows(
        df,
        obs,
        null_cols=["v", "x"],
        extra=[F.max("k").alias("max_k")],
    )
    # one action drives both the result and the metrics
    assert out.filter(F.col("k") > 1).count() == 2
    got = obs.get
    assert got["rows"] == 3          # observed BEFORE the filter
    assert got["null_v"] == 1
    assert got["null_x"] == 1
    assert got["max_k"] == 3


def test_observe_through_pipeline_stages(spark):
    # the observed node sits mid-pipeline; downstream transforms and
    # the noop sink still trigger exactly one metric emission
    df = spark.range(100).withColumn(
        "grp", (F.col("id") % 10).cast("string")
    )
    obs = Observation("mid")
    staged = observe_rows(df, obs).groupBy("grp").count()
    staged.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 100


def test_psi_full_outer_bins_and_unified_laplace(spark):
    """ADVICE round-4: psi() must not drop bins present on one side
    only, and the Laplace constant must be the unified bin-set
    size."""
    import math

    from etl_pipeline_4handling_listings_spark.operators.drift import psi

    ref = spark.createDataFrame([(0, 10), (1, 30)], "bin LONG, cnt LONG")
    cur = spark.createDataFrame([(1, 20), (2, 20)], "bin LONG, cnt LONG")
    rows = {r["bin"]: r for r in psi(ref, cur).collect()}
    # all three bins present (full outer), missing counts are 0
    assert set(rows) == {0, 1, 2}
    assert rows[0]["c_cur"] == 0 and rows[2]["c_ref"] == 0
    # hand-compute with n_bins = 3 (the UNIFIED grid)
    n_ref, n_cur, nb = 40, 40, 3
    for b in (0, 1, 2):
        p = (rows[b]["c_cur"] + 1) / (n_cur + nb)
        q = (rows[b]["c_ref"] + 1) / (n_ref + nb)
        want = math.floor((p - q) * math.log(p / q) * 1e6 + 0.5) / 1e6
        assert rows[b]["psi_term"] == want
