"""Declarative row-validation: rule table → flags, reasons, split.

Generalizes the reference's ten hand-written 0/1 business-rule flags
plus reject-sum and reason list (reference
listings/mls_listings_transform.py:85-128, V1-V12 in SURVEY §2.5)
into a data-driven operator: each :class:`Rule` is a named predicate
marking a row INVALID when true; :func:`apply_rules` emits one flag
column per rule, an integer ``_reject_flags`` sum, and a
pipe-joined ``_reject_reasons`` string; :func:`split_valid` splits
good/rejected.

All flags are generated in a single ``select`` so the plan stays
flat, and everything is built-in expressions — the whole validation
stage is one codegen'd projection, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REJECT_FLAGS_COL = "_reject_flags"
REJECT_REASONS_COL = "_reject_reasons"


@dataclass(frozen=True)
class Rule:
    """One validation rule.

    ``predicate`` is TRUE when the row is invalid (the flag fires).
    NULL predicates are treated as not-fired.
    """

    name: str
    predicate: Column
    reason: str

    @property
    def flag_col(self) -> str:
        return f"_{self.name}_flag"


class ValidationSplit(NamedTuple):
    valid: DataFrame
    rejected: DataFrame


def apply_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Append per-rule 0/1 flag columns + reject sum + reasons."""
    flag_cols = [
        F.when(r.predicate, 1).otherwise(0).alias(r.flag_col) for r in rules
    ]
    df = df.select("*", *flag_cols)
    total = None
    for r in rules:
        c = F.col(r.flag_col)
        total = c if total is None else total + c
    reasons = F.concat_ws(
        "|", *[F.when(F.col(r.flag_col) == 1, r.reason) for r in rules]
    )
    return df.select(
        "*",
        total.alias(REJECT_FLAGS_COL),
        reasons.alias(REJECT_REASONS_COL),
    )


def split_valid(df: DataFrame, cache: bool = True) -> ValidationSplit:
    """Split into (valid, rejected) on ``_reject_flags``.

    The reference filters the same uncached parent twice, recomputing
    the whole upstream plan per sink
    (mls_listings_transform.py:126-128); we persist the flagged
    frame before the fan-out by default.
    """
    if cache:
        df = df.persist()
    return ValidationSplit(
        valid=df.filter(F.col(REJECT_FLAGS_COL) == 0),
        rejected=df.filter(F.col(REJECT_FLAGS_COL) > 0),
    )


def dimension_miss_rule(name: str, dim_key: str | Column, reason: str) -> Rule:
    """Anti-join-style rule: after a left join against a dimension,
    a NULL dimension key means the row failed the lookup (reference
    V1/V7/V9/V10 idiom, mls_listings_transform.py:104-116)."""
    c = F.col(dim_key) if isinstance(dim_key, str) else dim_key
    return Rule(name=name, predicate=c.isNull(), reason=reason)
