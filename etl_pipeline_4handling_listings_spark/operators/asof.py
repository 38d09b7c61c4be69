"""Point-in-time (as-of) join — the time-series join Spark lacks.

For each left row, find the single right row with the greatest
``right_ts <= left_ts`` (backward; ``>=`` / least for forward) per
equality key — e.g. "the last click before each purchase", "the
quote in effect at each trade".

Spark-first design — NOT a pandas ``merge_asof`` port:
the two sides are unioned into one keyed stream and resolved with a
``last(..., ignorenulls=True)`` running window. That is ONE shuffle
on the equality keys + an in-partition sort — the same plan shape a
stream-temporal join uses (cf. Flink temporal joins), and it scales
to 100 TB because no row ever fans out: cost is O(|L|+|R|) rows
through one Exchange, versus the range-join explosion a naive
``l.ts >= r.ts`` theta-join produces.

Tie semantics are exact and deterministic: among right rows with
equal ``right_ts``, the greatest ``tiebreak`` wins (backward;
least for forward) — mirrored 1:1 by the DuckDB LATERAL oracle in
``queries.py`` (``ORDER BY ts DESC, tiebreak DESC LIMIT 1``).

Reference parity: the reference engine has no as-of join; this is
part of the beyond-reference time-series surface (SURVEY §2.9
events suite) a training-data/feature pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_TB = "_asof_tb"
_MATCH = "_asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    tiebreak: str | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right match.

    on          equality keys present on both sides
    left_ts     ordering column on ``left`` (numeric or orderable;
                numeric required when ``tolerance`` is set)
    right_ts    ordering column on ``right``
    value_cols  right columns carried onto matched left rows
                (must not collide with left column names)
    direction   'backward' (right_ts <= left_ts, greatest wins) or
                'forward' (right_ts >= left_ts, least wins)
    tolerance   max |left_ts - right_ts|; farther matches -> null
    tiebreak    right column breaking equal-``right_ts`` ties
                deterministically (default: ``right_ts`` itself)
    matched_ts_col  output column holding the matched right_ts

    Unmatched left rows keep nulls in ``value_cols`` — the join is
    left-outer by construction.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    tb = tiebreak or right_ts

    backward = direction == "backward"
    # union ordering at equal ts decides tie inclusion:
    #   backward: right rows sort BEFORE left rows  -> right_ts == left_ts matches
    #   forward:  right rows sort AFTER  left rows  -> symmetric
    left_side, right_side = (1, 0) if backward else (0, 1)

    payload = [c for c in left.columns]
    l_part = left.select(
        *payload,
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(right.schema[tb].dataType).alias(_TB),
        F.lit(None)
        .cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *value_cols]
            ) + ">"
        )
        .alias(_MATCH),
    )
    r_part = right.select(
        *[
            (
                F.col(k).cast(left.schema[k].dataType)
                if k in on
                else F.lit(None).cast(left.schema[k].dataType)
            ).alias(k)
            for k in payload
        ],
        F.col(right_ts).cast(left.schema[left_ts].dataType).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        F.col(tb).alias(_TB),
        F.struct(F.col(right_ts), *[F.col(c) for c in value_cols]).alias(_MATCH),
    )

    if backward:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(_MATCH, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first(_MATCH, ignorenulls=True).over(w)

    out = (
        l_part.unionByName(r_part)
        .withColumn(_MATCH, matched)
        .filter(F.col(_SIDE) == left_side)
    )
    if tolerance is not None:
        gap = (
            F.col(_TS) - F.col(f"{_MATCH}.{right_ts}")
            if backward
            else F.col(f"{_MATCH}.{right_ts}") - F.col(_TS)
        )
        out = out.withColumn(
            _MATCH, F.when(gap <= F.lit(tolerance), F.col(_MATCH))
        )
    return out.select(
        *payload,
        F.col(f"{_MATCH}.{right_ts}").alias(matched_ts_col),
        *[F.col(f"{_MATCH}.{c}").alias(c) for c in value_cols],
    )
