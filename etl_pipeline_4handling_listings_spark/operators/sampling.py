"""Sampling operators for training-data pipelines.

Deterministic-by-content sampling — the property a 100 TB corpus
pipeline needs is that re-running the job (different cluster,
different partitioning) selects the SAME rows. Random-seed sampling
(``df.sample``) is partition-layout-dependent; these operators hash
row content instead:

- :func:`hash_split` — train/val/test splits by key hash: stable
  under repartitioning, joins, and incremental growth (a new row
  never moves an old row between splits).
- :func:`hash_sample` — p% sample by key hash, same stability.
- :func:`stratified_sample` — per-stratum exact-ish fractions via
  ``sampleBy`` (seeded; for quota-exact needs use
  :func:`per_key_top_n`).
- :func:`per_key_top_n` — exact per-key quotas with a deterministic
  priority (window rank), e.g. "at most 3 documents per domain".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1_000_000

# One retained cache per named slot: Spark's SQL cache has NO LRU
# eviction (CacheManager entries and their spilled blocks live until
# an explicit unpersist/clearCache), so an operator that persists an
# intermediate on every call would accumulate cached plans without
# bound in a long-lived driver session. persist_slot releases the
# slot's previous frame before caching the new one — steady-state
# footprint is exactly one cached frame per operator.
_PERSIST_SLOTS: dict[str, DataFrame] = {}


def persist_slot(slot: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK), unpersisting whatever frame
    ``slot`` cached on the previous call. Unpersist is lazy-safe:
    a still-running consumer of the old frame just recomputes."""
    from pyspark import StorageLevel

    prev = _PERSIST_SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session of the old frame may already be stopped
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSIST_SLOTS[slot] = out
    return out


def portable_hash60(cols: Sequence[Column], sep: str = "|") -> Column:
    """Engine-portable 60-bit content hash: the first 15 hex chars of
    md5 over the '|'-joined key, parsed as an integer. Identical in
    DuckDB as ``CAST(concat('0x', substr(md5(concat_ws('|', ...)),
    1, 15)) AS BIGINT)`` — the cross-engine twin xxhash64 lacks.
    ~2-3x slower than xxhash64 (md5 + string round-trip), so it is
    the *oracle-parity* hash; xxhash64 stays the default scale path.
    """
    joined = F.concat_ws(sep, *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def _key_hash(
    key_cols: Sequence[str], salt: str = "", portable: bool = False
) -> Column:
    cols = [F.col(c) for c in key_cols]
    if salt:
        cols = [F.lit(salt), *cols]
    h = portable_hash60(cols) if portable else F.xxhash64(*cols)
    return F.pmod(h, F.lit(BUCKETS))


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Append a split label ('train'/'val'/…) by content hash.

    ``weights`` maps label → fraction (must sum to ≤ 1; remainder
    falls into the last label). Same key ⇒ same split, forever.
    ``portable=True`` swaps xxhash64 for :func:`portable_hash60` so
    the assignment is reproducible outside Spark (and by the DuckDB
    oracle).
    """
    h = _key_hash(key_cols, salt, portable=portable)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, frac in labels[:-1]:
        acc += frac
        cond = h < int(acc * BUCKETS)
        expr = (
            F.when(cond, label) if expr is None else expr.when(cond, label)
        )
    last_label = labels[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(last_label)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    fraction: float,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash."""
    return df.filter(
        _key_hash(key_cols, salt, portable=portable) < int(fraction * BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum fractional sample (seeded ``sampleBy``)."""
    return df.sampleBy(stratum_col, fractions, seed)


def per_key_top_n(
    df: DataFrame,
    key_cols: Sequence[str],
    order: Sequence[Column],
    n: int,
) -> DataFrame:
    """Exact per-key quota: best ``n`` rows per key under ``order``
    (deterministic given a unique tiebreak) — the cap-per-domain
    operator of corpus curation."""
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.select("*", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def budget_select(
    df: DataFrame,
    order: Sequence[Column],
    weight_col: str,
    budget: int,
    bucket: Column,
    persist: bool = True,
) -> DataFrame:
    """Greedy prefix selection under a global weight budget, without
    a global single-partition window.

    Semantically: sort ``df`` by ``order``, take rows while the
    running sum of ``weight_col`` stays ``<= budget`` (the
    token-budget corpus-assembly rule). A naive
    ``Window.orderBy(...)`` cumulative sum funnels the whole table
    through ONE partition; this implementation is the scale-correct
    two-phase equivalent:

    1. aggregate weights per ``bucket`` (a coarse integer grid over
       the leading ``order`` key — higher bucket must sort earlier),
       cumulative-sum over that TINY frame (cardinality = number of
       buckets, bounded by the grid), and classify each bucket as
       fully-in, partial (straddles the budget), or dropped;
    2. rows of fully-in buckets pass through with no window at all;
       only the single partial bucket runs an ordered cumulative sum,
       partitioned by the bucket — bounded work, not a global sort.

    Requirements: ``weight_col`` is a non-negative integer;
    ``bucket`` is monotone non-increasing along ``order`` (i.e.
    sorting by ``bucket DESC`` is a coarsening of ``order``).
    Reference analogue: quota/top-k family (SURVEY §2.7 O1), lifted
    from per-key caps to a global additive budget.

    ``persist`` (default on) caches the tagged input across this
    plan's THREE consumers (per-bucket aggregate + the full and
    partial output branches): without it every branch re-runs the
    caller's upstream pipeline — for corpus_token_budget that was
    three regex-heavy scans of the full document table (5.7 s ->
    ~2 s at sf0.1). The cached frame is the caller's projection
    (typically narrow id/weight columns, NOT the raw text), spilled
    to disk if it outgrows executor memory. SQL-cache entries are
    NOT LRU-evicted — they live until an explicit unpersist or
    ``spark.catalog.clearCache()`` — so this module releases its
    own previous cache on every call (:func:`persist_slot`):
    a long-lived session that calls budget_select repeatedly holds
    at most ONE cached frame, not an unbounded accumulation. The
    final frame is released by the session's next call or the
    caller's ``clearCache()`` (bench.py does this per query).
    Disable for single-shot callers that already persist upstream.
    """
    tagged = df.withColumn("_qb", bucket.cast("bigint")).withColumn(
        "_w", F.col(weight_col).cast("bigint")
    )
    if persist:
        tagged = persist_slot("budget_select", tagged)
    per_bucket = tagged.groupBy("_qb").agg(F.sum("_w").alias("_bw"))
    # tiny frame: one row per bucket — the unpartitioned window is
    # bounded by the bucket-grid cardinality, not the data size
    wb = Window.orderBy(F.desc("_qb")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    classified = (
        per_bucket.withColumn("_cum", F.sum("_bw").over(wb))
        .withColumn("_prev", F.col("_cum") - F.col("_bw"))
        .select(
            "_qb",
            "_prev",
            F.when(F.col("_cum") <= budget, F.lit("full"))
            # <= (not <): a bucket whose predecessors exactly spend
            # the budget may still admit zero-weight prefix rows
            .when(F.col("_prev") <= budget, F.lit("partial"))
            .otherwise(F.lit("drop"))
            .alias("_status"),
        )
    )
    joined = tagged.join(F.broadcast(classified), "_qb")
    helper = ["_qb", "_w", "_prev", "_status"]
    full = joined.filter(F.col("_status") == "full").drop(*helper)
    wp = Window.partitionBy("_qb").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    partial = (
        joined.filter(F.col("_status") == "partial")
        .withColumn("_lc", F.sum("_w").over(wp))
        .filter(F.col("_prev") + F.col("_lc") <= budget)
        .drop("_lc", *helper)
    )
    return full.unionByName(partial)


def weighted_hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    weight: Column,
    n: int,
    tiebreak: Sequence[Column] = (),
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample of ``n`` rows (A-ES / Efraimidis-
    Spirakis): each row draws u ~ U(0,1) from the portable content
    hash and gets priority u^(1/w); the top-n priorities are a
    weighted sample WITHOUT replacement. Hash-derived u means the
    draw is reproducible across engines, runs, and partitionings —
    the corpus-sampling analogue of :func:`hash_split`. One TopK
    (TakeOrderedAndProject), no shuffle of the full data.

    The priority is floor-quantized to 1e-9 before ranking so
    engines whose ``pow`` differs in the last ulp still agree;
    pass unique ``tiebreak`` columns for a total order.
    """
    cols = [F.col(c) for c in key_cols]
    if salt:
        cols = [F.lit(salt), *cols]
    h = F.pmod(portable_hash60(cols), F.lit(BUCKETS))
    u = (h.cast("double") + 0.5) / float(BUCKETS)
    prio = F.floor(
        F.pow(u, F.lit(1.0) / weight.cast("double")) * 1e9 + 0.5
    ) / 1e9
    out = df.withColumn("_prio", prio)
    return (
        out.orderBy(F.desc("_prio"), *tiebreak).limit(n).drop("_prio")
    )
