"""Sketch-derived quantile cut points — the billion-key twin of
NTILE.

``events_rfm_segments`` and ``abc_classification`` rank a per-key
AGGREGATE with an exact global-sort window; fine while the key
dimension is bounded, but at billions of keys that single window
partition becomes the bottleneck. This module is the documented
sketch path as a real operator: derive the ``n-1`` cut points with
Spark's mergeable quantile sketch (``percentile_approx`` —
Greenwald-Khanna summaries: bounded state per partial, map-side
combinable, rank error <= num_rows / accuracy), broadcast the
one-row cut array, and assign buckets by COMPARISON. No global
sort, no window over the row stream — two passes over the frame
(one sketch agg + one scoring scan), both embarrassingly parallel.

Semantic contract vs exact NTILE: bucket assignment is
VALUE-determined (every row with the same value lands in the same
bucket), while NTILE splits ties positionally to force exactly
equal bucket sizes. With distinct values the two agree to within
the sketch's rank error; with heavy ties the sketch path is the
more defensible semantics anyway (identical keys should not
straddle a segment boundary). Nulls score null — filter or impute
upstream, exactly as a window ORDER BY would force you to decide.

Reference scale notes this implements:
``queries.events_rfm_segments`` / ``queries.abc_classification``
docstrings (the former "documented sketch path").
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_cutpoints(
    df: DataFrame,
    cols: Sequence[str],
    n: int,
    accuracy: int = 10000,
) -> DataFrame:
    """ONE-row frame with an ascending array of ``n - 1`` interior
    quantile cut points per column (named ``_cuts_<col>``), from
    one mergeable-sketch aggregation over ``df`` — all columns'
    sketches build in a single pass."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    probs = [i / n for i in range(1, n)]
    return df.agg(
        *[
            F.percentile_approx(c, probs, accuracy).alias(f"_cuts_{c}")
            for c in cols
        ]
    )


def _bucket_expr(col: str, cuts: str, descending: bool) -> Column:
    """1-based bucket of ``col`` against the ascending cut array
    ``cuts``. Ascending: 1 + #cuts STRICTLY below the value (a
    value equal to a cut stays in the lower bucket, matching
    NTILE's boundary when the cut is the bucket's max). Descending
    (bucket 1 = the largest values, ``NTILE(n) OVER (ORDER BY col
    DESC)``): 1 + #cuts at or above the value — the same tie side,
    so the two orientations assign mirror buckets.

    Built with the FUNCTIONAL aggregate API, not an F.expr SQL
    lambda: pyspark generates unique lambda-variable names, so a
    data column named ``acc`` or ``c`` can never shadow the lambda
    arguments (with a textual lambda, ``CASE WHEN c > c`` resolved
    both sides to the lambda variable and silently scored every
    row into bucket 1)."""
    value = F.col(col)

    def step(acc: Column, cut: Column) -> Column:
        hit = (value <= cut) if descending else (value > cut)
        return acc + F.when(hit, 1).otherwise(0)

    return F.aggregate(
        F.col(cuts), F.lit(1).cast("int"), step
    ).cast("long")


def ntile_by_sketch(
    df: DataFrame,
    cols: Sequence[str] | str,
    n: int,
    accuracy: int = 10000,
    descending: bool = False,
    suffix: str = "_score",
) -> DataFrame:
    """``df`` plus a ``<col><suffix>`` bucket column (1..n) per
    entry of ``cols`` — NTILE's scale path: mergeable-sketch cut
    points broadcast against the frame, buckets by comparison.
    ``descending=True`` matches ``NTILE(n) OVER (ORDER BY c DESC)``
    (bucket 1 = top values), the RFM orientation. Multiple columns
    share ONE sketch pass and ONE broadcast (the RFM case: three
    metrics, two scans total instead of three global sorts)."""
    if isinstance(cols, str):
        cols = [cols]
    cuts = sketch_cutpoints(df, cols, n, accuracy)
    out = df.crossJoin(F.broadcast(cuts))
    for c in cols:
        # explicit null passthrough: CASE WHEN null > c falls to
        # ELSE 0, which would silently score nulls into bucket 1
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(
                F.col(c).isNull(), F.lit(None).cast("long")
            ).otherwise(_bucket_expr(c, f"_cuts_{c}", descending)),
        )
    return out.drop(*[f"_cuts_{c}" for c in cols])
