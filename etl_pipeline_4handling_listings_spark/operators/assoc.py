"""Market-basket association rules (support / confidence / lift).

The classic co-purchase mining kernel, Spark-first:

- baskets collapse to distinct (basket, item) pairs — one
  map-side-combinable dedup;
- item pairs come from a self equi-join ON THE BASKET KEY with an
  ``a < b`` filter: both sides hash-partition on the basket id, so
  the pair fan-out happens co-located, bounded per basket by the
  basket's own size (never a cross join of the item universe);
- pair/item counts are plain integer hash aggregates; the metric
  arithmetic (support, confidence, lift) happens on the TOP-K
  frame only, after a TakeOrderedAndProject.

At 100 TB the only superlinear term is the per-basket pair
fan-out, quadratic in basket SIZE (bounded: retail baskets are
tens of items, not millions); everything else is linear shuffles
on (basket) and (item-pair) keys. A mega-basket guard drops
baskets above ``max_basket`` items — the standard defense against
a single degenerate basket exploding the join (same skew argument
as operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    top_n: int = 20,
    max_basket: int = 1000,
) -> DataFrame:
    """Top-N item pairs by co-occurrence with support/confidence/lift.

    Returns one row per (item_a, item_b) pair, item_a < item_b:
    ``pair_count``, ``count_a``, ``count_b``, ``n_baskets``, and the
    derived ``support``/``conf_a_to_b``/``lift`` (raw IEEE divisions
    of exact integers — deterministic; quantize at the call site if
    an oracle grid is needed).
    """
    b = F.col(basket_col)
    baskets = df.select(basket_col, item_col).distinct()
    sized = baskets.groupBy(basket_col).agg(F.count("*").alias("_bsz"))
    baskets = baskets.join(
        sized.filter(F.col("_bsz") <= max_basket).select(basket_col),
        basket_col,
    )
    left = baskets.select(b.alias("_bk"), F.col(item_col).alias("item_a"))
    right = baskets.select(b.alias("_bk"), F.col(item_col).alias("item_b"))
    pairs = (
        left.join(right, "_bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "item_a", "item_b")
        .limit(top_n)
    )
    item_counts = baskets.groupBy(item_col).agg(
        F.count("*").cast("long").alias("item_count")
    )
    n_baskets = baskets.select(basket_col).distinct().count()
    ca = item_counts.select(
        F.col(item_col).alias("item_a"), F.col("item_count").alias("count_a")
    )
    cb = item_counts.select(
        F.col(item_col).alias("item_b"), F.col("item_count").alias("count_b")
    )
    # the top-N frame is the tiny side — broadcast IT, stream the
    # item-count table (the item universe is huge at scale; the
    # pairs frame is top_n rows)
    out = (
        F.broadcast(pairs)
        .join(ca, "item_a")
        .join(cb, "item_b")
        .withColumn("n_baskets", F.lit(n_baskets).cast("long"))
    )
    nd = F.col("n_baskets").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        "n_baskets",
        (F.col("pair_count").cast("double") / nd).alias("support"),
        (
            F.col("pair_count").cast("double") / F.col("count_a")
        ).alias("conf_a_to_b"),
        (
            F.col("pair_count").cast("double") * nd
            / (F.col("count_a").cast("double") * F.col("count_b"))
        ).alias("lift"),
    )
