"""Distributed prefix sums without a global single-partition sort.

The running-total family (sequence packing, budget cursors, offset
assignment) needs an EXCLUSIVE prefix sum over a total order — which
a naive ``Window.orderBy(key)`` computes by funneling every row
through one partition. ``keyed_prefix_sum`` is the two-level
equivalent of the classic parallel scan:

1. bucket rows by ``key // bucket_size`` (the key is a unique
   integer, e.g. a dense id); per-bucket value totals are one hash
   aggregate;
2. an exclusive cumulative sum over the per-bucket totals runs on a
   TINY frame (one row per bucket — bounded by key-range /
   bucket_size, not by data size);
3. each bucket's offset broadcasts back, and the within-bucket
   exclusive prefix runs partitioned BY bucket — every window
   partition is at most ``bucket_size`` rows.

At 100 TB with bucket_size tuned so bucket count stays ~1e6, the
unpartitioned step is still a single small task; a third level would
remove even that, but two levels cover practical key ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keyed_prefix_sum(
    df: DataFrame,
    key: str,
    value_col: str,
    out_col: str = "prefix_excl",
    bucket_size: int = 8192,
) -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows with a
    strictly smaller ``key`` (exclusive prefix sum). ``key`` must be
    a unique integer column; values must be integers."""
    tagged = df.withColumn("_pb", (F.col(key) / bucket_size).cast("bigint"))
    per_bucket = tagged.groupBy("_pb").agg(
        F.sum(F.col(value_col).cast("bigint")).alias("_bw")
    )
    wb = Window.orderBy("_pb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_pb", F.coalesce(F.sum("_bw").over(wb), F.lit(0)).alias("_off")
    )
    ww = (
        Window.partitionBy("_pb")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.join(F.broadcast(offsets), "_pb")
        .withColumn(
            out_col,
            F.col("_off")
            + F.coalesce(
                F.sum(F.col(value_col).cast("bigint")).over(ww), F.lit(0)
            ),
        )
        .drop("_pb", "_off")
    )


def keyed_prefix_max(
    df: DataFrame,
    key: str,
    value_col: str,
    out_col: str = "prefix_max",
    bucket_size: int = 8192,
) -> DataFrame:
    """Append ``out_col`` = max of ``value_col`` over all rows with
    a strictly smaller ``key`` (EXCLUSIVE running max — null when no
    prior row exists), same two-level shape as
    :func:`keyed_prefix_sum` with max as the monoid. This is the
    high-watermark kernel: with ``key`` = arrival sequence and
    ``value_col`` = event time, ``out_col`` is the event-time
    watermark each row faced on arrival (consumers:
    ``queries.events_lateness_profile`` / ``events_watermark_fit``
    and the streaming ``foreach_batch_lateness_profile``)."""
    tagged = df.withColumn(
        "_pb", (F.col(key) / bucket_size).cast("bigint")
    )
    per_bucket = tagged.groupBy("_pb").agg(
        F.max(value_col).alias("_bm")
    )
    wb = Window.orderBy("_pb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "_pb", F.max("_bm").over(wb).alias("_prior")
    )
    ww = (
        Window.partitionBy("_pb")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.join(F.broadcast(offsets), "_pb")
        .withColumn(
            out_col,
            F.greatest(
                F.max(value_col).over(ww), F.col("_prior")
            ),
        )
        .drop("_pb", "_prior")
    )
