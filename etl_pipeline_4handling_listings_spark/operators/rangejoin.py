"""Range (interval) join — points matched into intervals at scale.

``points JOIN intervals ON key AND start <= point <= end`` is a
theta-join; Spark's only generic plan for it is
BroadcastNestedLoopJoin (fine when one side broadcasts) or a
CartesianProduct (never fine). This operator rewrites it as a
*binned equi-join*: quantize time into fixed-width bins, replicate
each interval onto every bin it overlaps, tag each point with its
single bin, then hash-join on ``(keys..., bin)`` and re-check the
exact predicate. That is the standard distributed range-join
rewrite (cf. Spark's own storage-partitioned range join work and
DuckDB/Postgres IEJoin literature): shuffle cost O(|P| + |I| * w/b)
for interval width w and bin width b — pick ``bin_width`` near the
typical interval width so replication stays O(1) per interval.

Each (point, interval) pair meets in EXACTLY one bin — the point's
own — so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_range_bin"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys)
    with ``start_col <= point_col <= end_col``. Inclusive bounds.

    ``bin_width`` trades replication for join selectivity: each
    interval lands on ``1 + (end-start)//bin_width`` bins. ``how``
    is 'inner' or 'left' (left keeps unmatched points with nulls).

    Column names must not collide between the two sides (except
    ``on``, which is coalesced by the equi-join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column collision outside join keys: {sorted(clash)}")

    p = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor(F.col(end_col) / bin_width),
            )
        ),
    )
    cond = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    if how == "inner":
        return p.join(i, on=[*on, _BIN], how="inner").filter(cond).drop(_BIN)
    # left: the exact predicate must live IN the join condition so
    # unmatched points survive with nulls rather than being filtered
    renames = {k: f"_r_{k}" for k in on} | {_BIN: f"_r{_BIN}"}
    ir = i.withColumnsRenamed(renames)
    join_cond = F.lit(True)
    for k in on:
        join_cond = join_cond & (F.col(k) == F.col(f"_r_{k}"))
    join_cond = join_cond & (F.col(_BIN) == F.col(f"_r{_BIN}")) & cond
    return p.join(ir, on=join_cond, how="left").drop(
        _BIN, f"_r{_BIN}", *[f"_r_{k}" for k in on]
    )
