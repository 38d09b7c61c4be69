"""Distribution-drift primitives: integer value histograms + PSI.

The mergeable-state view of `stats_psi_drift` (queries.py): a
histogram of fixed integer cents-bins is a tiny (n_bins rows)
frame that merges by summing counts — the same mergeability
argument as the Count-Min sketch (operators/sketch_cms.py), so it
supports incremental maintenance: per micro-batch histograms merge
into running state, and PSI against a frozen reference window is
O(n_bins) arithmetic on the merged counts, never a rescan of
history. Streaming twin: streaming/pipeline.foreach_batch_histogram.

Bin assignment is pure integer division (``cents div bin_cents``,
capped) — no float boundary can disagree across engines or
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame,
    value_col: str,
    bin_cents: int = 5000,
    n_bins: int = 10,
) -> DataFrame:
    """Integer cents-binned counts: (bin, cnt), empty bins kept.

    One map-side-combinable aggregate over the stream; the grid
    left-join runs on the n_bins-row frame.
    """
    spark = df.sparkSession
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    # integer `div`, never float division — no representability
    # knife edge at any magnitude
    # clamp BOTH ends: negative values (refunds) land in bin 0
    # instead of a negative bin the grid join would silently drop —
    # counts must be conserved or a drift toward negatives is
    # invisible to the PSI monitor
    binned = df.select(cents.alias("_c")).select(
        F.least(
            F.greatest(
                F.expr(f"_c div {int(bin_cents)}"), F.lit(0).cast("long")
            ),
            F.lit(n_bins - 1).cast("long"),
        ).alias("bin")
    )
    counts = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("cnt")
    )
    grid = spark.range(n_bins).select(F.col("id").alias("bin"))
    return (
        grid.join(counts, "bin", "left")
        .select("bin", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )


def merge_histograms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter-wise merge — the mergeable-state law."""
    return (
        a.unionByName(b)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def psi(ref: DataFrame, cur: DataFrame) -> DataFrame:
    """Per-bin PSI terms between two histograms, Laplace-smoothed
    ((c+1)/(n+n_bins)) so empty bins stay defined; quantized 1e-6.
    Pure arithmetic over the n_bins-row frames.

    The two histograms are FULL-OUTER joined on bin with missing
    counts coalesced to 0: an inner join would silently drop any
    bin present on one side only (histograms built with different
    n_bins, or a sparse builder omitting empty rows), and the
    Laplace constant is the size of the UNIFIED bin set — derived
    lazily from the joined frame itself, so the smoothing
    denominator always matches the grid actually scored (no eager
    count() action, no desync with ref's row count).
    """
    j0 = (
        ref.select("bin", F.col("cnt").alias("c_ref"))
        .join(
            cur.select("bin", F.col("cnt").alias("c_cur")),
            "bin",
            "full_outer",
        )
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0)).cast("long").alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).cast("long").alias("c_cur"),
        )
    )
    tots = j0.agg(
        F.sum("c_ref").cast("long").alias("n_ref"),
        F.sum("c_cur").cast("long").alias("n_cur"),
        F.count("*").cast("long").alias("n_bins"),
    )
    j = j0.crossJoin(F.broadcast(tots))
    p = (F.col("c_cur") + 1).cast("double") / (
        F.col("n_cur") + F.col("n_bins")
    )
    q = (F.col("c_ref") + 1).cast("double") / (
        F.col("n_ref") + F.col("n_bins")
    )
    term = (p - q) * F.log(p / q)
    return j.select(
        "bin",
        "c_ref",
        "c_cur",
        (F.floor(term * 1000000 + F.lit(0.5)) / 1000000).alias("psi_term"),
    ).orderBy("bin")
