"""Priority top-k: rank rows by a priority spec, take k globally.

Re-expression of the reference's lookup-quota selection (reference
listings/mls_listings_curated.py:217-227, O1 in SURVEY §2.7): derive
a CASE-based priority number, global multi-key sort, ``limit(k)``.

Scale: Spark executes ``orderBy(...).limit(k)`` as
``TakeOrderedAndProject`` — each partition keeps only its local
top-k, the driver merges k·P rows — no global sort materialization.
This is the plan shape that survives 100 TB; never collect-then-sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def priority_top_k(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    priority_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Append optional derived priority columns, order, take k.

    ``priority_exprs`` maps new column name → expression (e.g. a
    CASE-WHEN rank like the reference's ``_load_status_num``,
    curated.py:225). ``order`` should end with unique tiebreak keys
    for deterministic results.
    """
    if priority_exprs:
        df = df.select("*", *[e.alias(n) for n, e in priority_exprs.items()])
    return df.orderBy(*order).limit(k)
