"""Dedup kernels: latest-record-per-key and exact content dedup.

``latest_record`` is the reference's central query semantic — the
rank-and-filter window that keeps exactly one observation per
business key (reference listings/mls_listings_curated.py:141-164,
W1/W3 in SURVEY §2.6; history variant W4). One shuffle on the
partition keys, no groupBy+self-join.

``exact_dedup`` is the scale-path content dedup for document
pipelines: group on a deterministic fingerprint, keep the row with
the minimal tiebreak key. Same single-shuffle shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROWNUM_COL = "_rownum"


def latest_record(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    carry_forward: dict[str, Column] | None = None,
    keep_rownum: bool = False,
) -> DataFrame:
    """Keep the first row per ``keys`` under ``order``.

    ``order`` is a list of ordering Columns (e.g. ``F.desc(...)``),
    applied as the multi-key tiebreak — the reference uses a 5-deep
    tiebreak (source_as_of_date desc, listing_date desc, entry_date
    asc, load_date desc, _from desc).

    ``carry_forward`` maps output column → whole-partition aggregate
    expression (e.g. ``F.min("create_timestamp")`` /
    ``F.max("asg_primary_id")``) evaluated over the unordered
    partition — the reference's W2 carry-forward of bookkeeping
    columns across superseded observations
    (mls_listings_curated.py:144-160). Computed in the same window
    shuffle, so it's free.
    """
    ordered = Window.partitionBy(*keys).orderBy(*order)
    whole = Window.partitionBy(*keys)
    cols: list[Column] = [F.row_number().over(ordered).alias(ROWNUM_COL)]
    for name, agg in (carry_forward or {}).items():
        cols.append(agg.over(whole).alias(name))
    out = df.select(
        *[c for c in df.columns if c not in (carry_forward or {})], *cols
    )
    out = out.filter(F.col(ROWNUM_COL) == 1)
    return out if keep_rownum else out.drop(ROWNUM_COL)


def superseded_records(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """The complement of :func:`latest_record` — rows outranked by a
    newer observation (the reference's 'outdated' reject side-channel,
    mls_listings_curated.py:183-189)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.select("*", F.row_number().over(w).alias(ROWNUM_COL))
        .filter(F.col(ROWNUM_COL) > 1)
        .drop(ROWNUM_COL)
    )


def exact_dedup(
    df: DataFrame,
    fingerprint: Column,
    tiebreak: Sequence[Column],
    fingerprint_col: str = "_fingerprint",
) -> DataFrame:
    """Exact dedup by content fingerprint: one representative row per
    distinct fingerprint, chosen by ``tiebreak`` ordering.

    Scale note: a hash-partitioned window on the fingerprint — one
    shuffle; near-duplicate groups never co-locate more than their
    own rows, so skew is bounded by the duplicate-group size.
    """
    with_fp = df.select("*", fingerprint.alias(fingerprint_col))
    w = Window.partitionBy(fingerprint_col).orderBy(*tiebreak)
    return (
        with_fp.select("*", F.row_number().over(w).alias(ROWNUM_COL))
        .filter(F.col(ROWNUM_COL) == 1)
        .drop(ROWNUM_COL)
    )
