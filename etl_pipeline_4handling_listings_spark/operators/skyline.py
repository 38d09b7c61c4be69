"""Distributed 2-D Pareto frontier (skyline).

The correctness lever: for ANY partitioning of the input, the
global skyline is a subset of the union of per-partition local
skylines — a locally-dominated row is dominated by a row in its
own partition, hence globally dominated. So the operator runs in
two phases:

1. **local prune** — the O(n log n) two-window skyline per
   ``spark_partition_id()``: every partition works independently,
   no shuffle, and typically eliminates almost everything (the
   expected skyline of n random 2-D points is O(log n) rows);
2. **global resolve** — the same two windows over the surviving
   rows. This phase IS a single-partition sort, which is exactly
   why phase 1 exists: it runs on the survivor set (partitions ×
   O(log n) rows), not the data.

Never the quadratic NOT-EXISTS domination join. Ties: rows equal
on both dimensions are mutually non-dominating and all kept.

``pareto_frontier_parts`` (queries.py) drives this operator; the
hypothesis differential test checks it against a brute force under
multiple partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _skyline_pass(
    df: DataFrame, minimize_col: str, maximize_col: str, pid: str | None
) -> DataFrame:
    """One two-window skyline pass, optionally per-partition.

    The "strictly cheaper" frame is built over ``dense_rank`` of the
    minimize column, not a raw ``rangeBetween(..., -1)`` on the
    value: a -1 range offset means "value minus one", which only
    equals "strictly smaller" for integer columns — on a double
    column it silently misses dominators within (x-1, x) and emits
    dominated rows. The rank is integral by construction, ties
    share a rank (same-value rows stay out of the strict frame),
    and the extra window rides the SAME sort — no added shuffle —
    so any orderable dtype is now exact.
    """
    part = [pid] if pid else []
    w_rank = Window.partitionBy(*part).orderBy(minimize_col)
    w_cheaper = (
        Window.partitionBy(*part)
        .orderBy("_mrk")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy(*part, minimize_col)
    best_same = F.max(maximize_col).over(w_same)
    return (
        df.withColumn("_mrk", F.dense_rank().over(w_rank))
        .withColumns(
            {"_bc": F.max(maximize_col).over(w_cheaper), "_bs": best_same}
        )
        .filter(
            (F.col("_bc").isNull() | (F.col("_bc") < F.col(maximize_col)))
            & (F.col("_bs") == F.col(maximize_col))
        )
        .drop("_mrk", "_bc", "_bs")
    )


def skyline_2d(
    df: DataFrame, minimize_col: str, maximize_col: str
) -> DataFrame:
    """Rows not dominated on (minimize_col asc, maximize_col desc).

    Exact for any orderable column dtypes (the strict-preceding
    frame is rank-based, not value-offset-based); prefer integer /
    integer-provenance values where cross-engine bit-determinism
    matters.
    """
    local = _skyline_pass(
        df.withColumn("_pid", F.spark_partition_id()),
        minimize_col,
        maximize_col,
        pid="_pid",
    ).drop("_pid")
    return _skyline_pass(local, minimize_col, maximize_col, pid=None)
