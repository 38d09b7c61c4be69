"""Range-join semantics: bin boundaries, inclusivity, left nulls, plan."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402

from etl_pipeline_4handling_listings_spark.operators.rangejoin import (  # noqa: E402
    point_in_interval_join,
)


def _frames(spark):
    points = spark.createDataFrame(
        [("a", 5, 1), ("a", 10, 2), ("a", 99, 3), ("b", 5, 4)],
        "k STRING, t LONG, pid LONG",
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0, 10, 100),    # spans bins; matches t=5 and t=10 (inclusive end)
            ("a", 5, 7, 101),     # matches t=5 only
            ("a", 90, 110, 102),  # crosses a bin boundary; matches t=99
            ("b", 6, 8, 103),     # no 'b' point inside
        ],
        "k STRING, s LONG, e LONG, iid LONG",
    )
    return points, intervals


def test_inner_matches_exactly_once(spark):
    points, intervals = _frames(spark)
    out = point_in_interval_join(
        points, intervals, on=["k"], point_col="t",
        start_col="s", end_col="e", bin_width=8,
    )
    pairs = sorted((r["pid"], r["iid"]) for r in out.collect())
    # bin_width=8 forces interval replication across bins; each
    # matching pair must still appear exactly once
    assert pairs == [(1, 100), (1, 101), (2, 100), (3, 102)]


def test_bin_width_invariance(spark):
    points, intervals = _frames(spark)
    expected = None
    for w in (1, 3, 8, 1000):
        out = point_in_interval_join(
            points, intervals, on=["k"], point_col="t",
            start_col="s", end_col="e", bin_width=w,
        )
        pairs = sorted((r["pid"], r["iid"]) for r in out.collect())
        if expected is None:
            expected = pairs
        assert pairs == expected, f"bin_width={w} changed the result"


def test_left_keeps_unmatched_points(spark):
    points, intervals = _frames(spark)
    out = point_in_interval_join(
        points, intervals, on=["k"], point_col="t",
        start_col="s", end_col="e", bin_width=8, how="left",
    )
    rows = out.collect()
    assert len(rows) == 5  # 4 matches + unmatched pid=4
    unmatched = [r for r in rows if r["iid"] is None]
    assert [r["pid"] for r in unmatched] == [4]


def test_validation(spark):
    points, intervals = _frames(spark)
    with pytest.raises(ValueError, match="how"):
        point_in_interval_join(
            points, intervals, ["k"], "t", "s", "e", 8, how="full"
        )
    with pytest.raises(ValueError, match="bin_width"):
        point_in_interval_join(points, intervals, ["k"], "t", "s", "e", 0)
    with pytest.raises(ValueError, match="collision"):
        point_in_interval_join(
            points.withColumnRenamed("pid", "iid"),
            intervals, ["k"], "t", "s", "e", 8,
        )


def test_plan_is_hash_join_not_bnlj(spark):
    # the scale contract: equi-join on (keys, bin) -> hash join;
    # never BroadcastNestedLoopJoin/CartesianProduct
    points, intervals = _frames(spark)
    out = point_in_interval_join(
        points, intervals, on=["k"], point_col="t",
        start_col="s", end_col="e", bin_width=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
