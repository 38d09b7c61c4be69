"""MERGE/upsert semantics as a pure DataFrame transformation.

The reference's heart is three Delta ``MERGE INTO`` statements
(reference listings/mls_listings_curated.py:328-353 M1,
mls_listings_hist_curated.py:183-210 M2 incl. a DELETE clause,
mls_listings_curated_propid_backfill.py:193-219 M3 with a
changed-columns-only update guard). Without assuming any table
format, the *relational semantics* of a keyed merge are expressible
as one full-outer join:

    result = matched-and-updated  ∪  matched-and-kept
           ∪ target-only-kept     ∪  source-only-inserted
      (matched-and-deleted rows drop out)

:func:`merge_upsert` implements exactly that, returning the merged
DataFrame; the storage layer (sources/store.py) persists it — with
Delta, the same clause structure maps 1:1 onto ``MERGE INTO``.

Scale: a single shuffle (sort-merge or shuffled-hash) on the merge
keys; AQE skew-split applies. Source is typically the small side —
the storage layer may broadcast it when tiny.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A merge-clause condition: receives (target_struct, source_struct)
# and returns a boolean Column. ``None`` means unconditional.
Cond = Callable[[Column, Column], Column] | None


def unchanged_guard(cols: Sequence[str]) -> Callable[[Column, Column], Column]:
    """Update-suppression guard: TRUE when at least one of ``cols``
    differs null-safely between target and source — the reference's
    ``NOT (a <=> b AND ...)`` idiom (M2 :188-192, M3 :199-203)."""

    def cond(t: Column, s: Column) -> Column:
        same = None
        for c in cols:
            eq = t[c].eqNullSafe(s[c])
            same = eq if same is None else (same & eq)
        return ~same

    return cond


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_condition: Cond = None,
    delete_condition: Cond = None,
    insert_condition: Cond = None,
    when_matched_update: bool = True,
    when_not_matched_insert: bool = True,
) -> DataFrame:
    """Relational MERGE: returns the post-merge state of ``target``.

    Clause order mirrors Delta MERGE: for a matched pair the update
    clause is evaluated first, then the delete clause, else the
    target row is kept. Source rows must be unique per key (the same
    precondition Delta MERGE enforces).

    ``*_condition`` callables receive the (target, source) row
    structs, e.g. ``lambda t, s: s["ts"] > t["ts"]``. The source may
    carry extra columns (e.g. a changed-flag) usable in conditions —
    they are dropped from the merged output. A source MISSING target
    columns (a narrow pre-evolution writer merging into a widened
    table) follows Delta's star-clause expansion: UPDATE touches
    only the source's columns (the target's values carry for the
    rest), INSERT fills the missing ones with NULL. Merge keys must
    always be present.
    """
    t_cols = target.columns
    missing = [c for c in t_cols if c not in source.columns]
    absent_keys = [k for k in keys if k in missing]
    if absent_keys:
        raise ValueError(
            f"merge source lacks key column(s) {absent_keys}; "
            f"source has {source.columns}"
        )
    t = target.select(
        F.struct(*t_cols).alias("_t"),
        F.lit(True).alias("_t_present"),
        *[F.col(k).alias(f"_tk_{k}") for k in keys],
    )
    if missing:
        # Delta star-clause parity for narrow sources: the update
        # image takes the TARGET's value for absent columns (filled
        # per-row after the join), the insert image takes NULL —
        # both cast to the target's type so the CASE branches stay
        # one struct type
        s_out_fields = [
            (
                F.col(c)
                if c not in missing
                else F.lit(None).cast(target.schema[c].dataType)
            ).alias(c)
            for c in t_cols
        ]
    else:
        s_out_fields = [F.col(c) for c in t_cols]
    s = source.select(
        F.struct(*source.columns).alias("_s"),
        # projection of the source onto the target schema, used for
        # the update/insert result so both CASE branches are the
        # same struct type even when the source has extra columns
        F.struct(*s_out_fields).alias("_s_out"),
        F.lit(True).alias("_s_present"),
        *[F.col(k).alias(f"_sk_{k}") for k in keys],
    )
    cond = None
    for k in keys:
        eq = t[f"_tk_{k}"].eqNullSafe(s[f"_sk_{k}"])
        cond = eq if cond is None else (cond & eq)
    j = t.join(s, cond, "full_outer")

    t_row, s_row, s_out = F.col("_t"), F.col("_s"), F.col("_s_out")
    matched = F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
    t_only = F.col("_t_present").isNotNull() & F.col("_s_present").isNull()
    s_only = F.col("_t_present").isNull() & F.col("_s_present").isNotNull()

    def _cond(c: Cond) -> Column:
        return F.lit(True) if c is None else c(t_row, s_row)

    upd = F.lit(when_matched_update) & _cond(update_condition)
    dele = F.lit(False) if delete_condition is None else delete_condition(t_row, s_row)
    ins = F.lit(when_not_matched_insert) & _cond(insert_condition)

    if missing:
        # matched-update image: source columns from the source, the
        # absent ones carried from the matched TARGET row (Delta
        # UPDATE SET * never nulls columns the source doesn't have)
        upd_out = F.struct(
            *[
                (
                    s_out[c] if c not in missing else t_row[c]
                ).alias(c)
                for c in t_cols
            ]
        )
    else:
        upd_out = s_out

    # pick the surviving row struct; NULL struct = row deleted/dropped
    result = (
        F.when(matched & upd, upd_out)
        .when(matched & dele, F.lit(None).cast(t.schema["_t"].dataType))
        .when(matched, t_row)
        .when(t_only, t_row)
        .when(s_only & ins, s_out)
    )
    out = j.select(result.alias("_r")).filter(F.col("_r").isNotNull())
    return out.select(*[F.col("_r")[c].alias(c) for c in t_cols])
