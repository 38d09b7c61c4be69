"""Change-history kernel: previous-value columns + changed flags.

Re-expression of the reference's SCD2-flavored history builder
(reference listings/mls_listings_hist_curated.py:139-159, W6 in
SURVEY §2.6): for each key ordered by observation time descending,
``F.lead`` pulls the *previous* observation's value for each driving
column into a ``<col>_old`` twin, a null-safe inequality
(``NOT (a <=> b)``) yields ``<col>_changed_flag``, and
``any_changed`` ORs them — the reference's ``_insert_update_flag``
that decides update-vs-delete in the history MERGE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ANY_CHANGED_COL = "_any_changed"


def changed_against_previous(
    df: DataFrame,
    keys: Sequence[str],
    order_desc: Sequence[str | Column],
    driving_cols: Sequence[str],
    old_suffix: str = "_old",
    flag_suffix: str = "_changed_flag",
) -> DataFrame:
    """Append ``<col>_old``, ``<col>_changed_flag`` per driving
    column, plus ``_any_changed``.

    ``order_desc``: columns whose DESCENDING order is
    newest-first (string names are wrapped in ``F.desc``). The
    previous observation is then ``lead(col, 1)`` — lead over a
    descending order is lag over ascending, matching the reference
    exactly (hist_curated.py:139,145-150).

    A row with no previous observation has NULL ``*_old`` and its
    changed flag is TRUE when the current value is non-null
    (null-safe inequality), i.e. first observations count as
    changed — this is what makes brand-new keys insert in the
    history merge.
    """
    order = [F.desc(c) if isinstance(c, str) else c for c in order_desc]
    w = Window.partitionBy(*keys).orderBy(*order)
    cols: list[Column] = []
    flags: list[Column] = []
    for c in driving_cols:
        old = F.lead(F.col(c), 1).over(w)
        cols.append(old.alias(c + old_suffix))
        flags.append(~F.col(c).eqNullSafe(old))
    out = df.select("*", *cols)
    flag_cols = [
        (~F.col(c).eqNullSafe(F.col(c + old_suffix))).alias(c + flag_suffix)
        for c in driving_cols
    ]
    any_changed = None
    for c in driving_cols:
        f = ~F.col(c).eqNullSafe(F.col(c + old_suffix))
        any_changed = f if any_changed is None else (any_changed | f)
    return out.select("*", *flag_cols, any_changed.alias(ANY_CHANGED_COL))
