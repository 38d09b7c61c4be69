"""As-of join semantics: ties, tolerance, direction, unmatched rows."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pipeline_4handling_listings_spark.operators.asof import asof_join  # noqa: E402

import pytest  # noqa: E402


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("b", 15, 3), ("c", 5, 4)],
        "k STRING, ts LONG, lid LONG",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 100, 1.0),   # tie with left ts=10 (inclusive match)
            ("a", 10, 101, 2.0),   # same ts — larger rid wins backward
            ("a", 18, 102, 3.0),
            ("b", 1, 103, 4.0),
        ],
        "k STRING, rts LONG, rid LONG, rv DOUBLE",
    )
    return left, right


def test_backward_matches_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rv"], tiebreak="rid", matched_ts_col="mts",
    )
    got = {r["lid"]: (r["mts"], r["rv"]) for r in out.collect()}
    assert got[1] == (10, 2.0)   # inclusive tie; rid=101 beats 100
    assert got[2] == (18, 3.0)   # latest at-or-before 20
    assert got[3] == (1, 4.0)
    assert got[4] == (None, None)  # key 'c' has no right rows


def test_backward_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rv"], tiebreak="rid", tolerance=2, matched_ts_col="mts",
    )
    got = {r["lid"]: r["mts"] for r in out.collect()}
    assert got[1] == 10       # gap 0 <= 2
    assert got[2] == 18       # gap 2 <= 2
    assert got[3] is None     # gap 14 > 2 -> nulled


def test_forward_matches(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rv"], direction="forward", tiebreak="rid",
        matched_ts_col="mts",
    )
    got = {r["lid"]: (r["mts"], r["rv"]) for r in out.collect()}
    assert got[1] == (10, 1.0)   # inclusive; smallest rid wins forward
    assert got[2] == (None, None)  # nothing at-or-after 20
    assert got[3] == (None, None)  # right 'b' is at 1 < 15


def test_row_count_preserved_and_validation(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rv"], tiebreak="rid",
    )
    assert out.count() == left.count()
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "ts", "rts", ["rv"], direction="nearest")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "rts", ["lid"])


def test_plan_is_single_window_no_join(spark):
    # the scale contract: one Exchange on the keys, a Window, and NO
    # join node — cost is O(|L|+|R|) rows, no range-join fanout
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rv"], tiebreak="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
