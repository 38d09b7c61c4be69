"""Sketch-derived NTILE (``operators/quantile.py``) — the
billion-key cut-point path behind events_rfm_segments /
abc_classification's scale notes."""

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.operators.quantile import (
    ntile_by_sketch,
    sketch_cutpoints,
)


def _df(spark, vals, col="x"):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["id", col])


def test_buckets_match_exact_ntile_on_distinct_values(spark):
    """With distinct values and n divisible by the bucket count,
    the sketch buckets equal exact NTILE (the sketch's rank error
    at this accuracy is < 1 row)."""
    from pyspark.sql.window import Window

    vals = [float(7 * i % 1000) for i in range(1000)]  # distinct, shuffled
    df = _df(spark, vals)
    got = ntile_by_sketch(df, "x", 4)
    exact = df.withColumn(
        "nt", F.ntile(4).over(Window.orderBy("x", "id")).cast("long")
    )
    j = got.join(exact, ["id", "x"])
    assert j.filter(F.col("x_score") != F.col("nt")).count() == 0
    # descending mirrors NTILE ... ORDER BY x DESC
    got_d = ntile_by_sketch(df, "x", 4, descending=True)
    exact_d = df.withColumn(
        "nt",
        F.ntile(4).over(Window.orderBy(F.desc("x"), "id")).cast("long"),
    )
    jd = got_d.join(exact_d, ["id", "x"])
    assert jd.filter(F.col("x_score") != F.col("nt")).count() == 0


def test_bucket_populations_within_rank_error(spark):
    """Bucket sizes stay within the sketch's documented rank error
    (num_rows / accuracy) plus tie mass — here ties are absent so
    the bound is tight."""
    n_rows, k, acc = 5000, 10, 1000
    vals = [float((37 * i) % n_rows) for i in range(n_rows)]
    got = ntile_by_sketch(_df(spark, vals), "x", k, accuracy=acc)
    sizes = {
        r["x_score"]: r["n"]
        for r in got.groupBy("x_score").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(1, k + 1))
    tol = n_rows / acc + 1
    for s, cnt in sizes.items():
        assert abs(cnt - n_rows / k) <= tol, (s, cnt)


def test_ties_stay_in_one_bucket(spark):
    """VALUE-determined assignment: identical values never straddle
    a boundary (the semantic NTILE cannot offer)."""
    vals = [1.0] * 50 + [2.0] * 50 + [3.0] * 50 + [4.0] * 50
    got = ntile_by_sketch(_df(spark, vals), "x", 4)
    per_val = (
        got.groupBy("x")
        .agg(F.countDistinct("x_score").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_val)


def test_multi_column_one_sketch_pass_and_no_window(spark):
    """The RFM shape: three metrics bucketed with ONE sketch agg +
    ONE broadcast; the physical plan has no Window and no global
    Sort over the row stream."""
    df = spark.createDataFrame(
        [(i, float(i % 97), float(i % 31), float(i % 7)) for i in range(500)],
        ["id", "r", "f", "m"],
    )
    got = ntile_by_sketch(df, ["r", "f", "m"], 4, descending=True)
    assert {"r_score", "f_score", "m_score"} <= set(got.columns)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # monotone: a larger metric never gets a LARGER descending score
    rows = got.select("r", "r_score").distinct().collect()
    by_v = sorted((r["r"], r["r_score"]) for r in rows)
    for (v1, s1), (v2, s2) in zip(by_v, by_v[1:]):
        assert s1 >= s2, (v1, s1, v2, s2)


def test_nulls_score_null_and_n_guard(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0)], ["id", "x"]
    )
    got = ntile_by_sketch(df, "x", 2)
    assert (
        got.filter(F.col("id") == 1).select("x_score").collect()[0][0]
        is None
    )
    with pytest.raises(ValueError, match="n must be"):
        sketch_cutpoints(df, ["x"], 1)


def test_short_column_names_do_not_shadow_lambda_vars(spark):
    """Columns named 'c' or 'acc' must bucket correctly — a textual
    SQL lambda would shadow them with its own variables ('CASE WHEN
    c > c' is always false) and silently score every row 1; the
    functional API generates unique lambda names."""
    from collections import Counter

    for name in ("c", "acc"):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], ["id", name]
        )
        got = ntile_by_sketch(df, name, 4)
        counts = Counter(
            r[f"{name}_score"]
            for r in got.select(f"{name}_score").collect()
        )
        assert set(counts) == {1, 2, 3, 4}, (name, counts)


def test_cutpoints_near_exact_quantiles(spark):
    vals = [float(i) for i in range(1, 10001)]
    cuts = sketch_cutpoints(_df(spark, vals), ["x"], 4, accuracy=10000)
    [row] = cuts.collect()
    for got, want in zip(row["_cuts_x"], (2500, 5000, 7500)):
        assert abs(got - want) <= 2, (got, want)
