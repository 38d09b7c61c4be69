"""Scalar cleaning/normalization Column functions.

Re-expressions of the reference's helper suite (reference
listings/mls_listings_transform.py:16-51 and the cleaning idioms of
its ~90-column transform block, :141-317) as composable, pure
``Column`` functions. Everything here is built-in Spark SQL
expressions — JVM-side, codegen-friendly, zero Python in the hot
path.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sum_columns(cols: Iterable[str | Column]) -> Column:
    """Arithmetic sum of columns (reference ``sum_columns``, :16-18).

    The reference builds ``F.expr('a+b+...')``; we fold Column ``+``
    which Catalyst flattens identically.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def blank_as_null(col: str | Column) -> Column:
    """Empty-string → NULL (reference ``replace_blank_with_null``, :36-37)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c != "", c)


def instr_any(col: str | Column, needles: Iterable[str]) -> Column:
    """True if any needle occurs in col (reference ``instr_with_expr``
    OR-chains, :31-34, used for the water/septic taxonomies :207-224).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = None
    for needle in needles:
        test = F.instr(c, needle) > 0
        out = test if out is None else (out | test)
    return out


def regexp_like(col: str | Column, pattern: str) -> Column:
    """Anchored regex test. The reference emulates this with a
    replace-to-sentinel trick (``regexp_like_with_expr``, :49-51);
    ``Column.rlike`` with explicit anchors is the idiomatic form.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)


def collapse_whitespace(col: str | Column) -> Column:
    """Collapse runs of whitespace to single spaces and trim.

    Replaces the reference's triple-REPLACE idiom
    (``REPLACE(REPLACE(REPLACE(x,' ','<>'),'><',''),'<>',' ')``,
    :313-314) with one regexp pass.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


_PHONE_BAD_PREFIXES = ("000", "111", "999", "123")


def clean_phone_number(col: str | Column) -> Column:
    """Normalize US phone strings to 10 digits or NULL.

    Semantics mirror the reference's ``clean_phone_number``
    (mls_listings_transform.py:39-47): strip non-digits, drop a
    leading country '1', cut at extensions, reject numbers that are
    not exactly 10 digits or that start with an implausible prefix
    (000/111/999/123).
    """
    c = F.col(col) if isinstance(col, str) else col
    # cut anything from an extension marker on, then strip non-digits
    no_ext = F.regexp_replace(F.lower(c), r"[xX].*$", "")
    digits = F.regexp_replace(no_ext, r"[^0-9]", "")
    digits = F.when(
        (F.length(digits) == 11) & digits.startswith("1"), F.substring(digits, 2, 10)
    ).otherwise(digits)
    bad_prefix = None
    for p in _PHONE_BAD_PREFIXES:
        test = digits.startswith(p)
        bad_prefix = test if bad_prefix is None else (bad_prefix | test)
    return F.when((F.length(digits) == 10) & ~bad_prefix, digits)


def null_if_before_year(col: str | Column, year: int = 1900) -> Column:
    """Date-sanity guard: dates before ``year`` → NULL.

    The reference nulls pre-1900 dates after a vendor shipped
    1800-era dates (mls_listings_transform.py:139-151).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.year(c) >= year, c)


def trim_all_strings(df: DataFrame) -> DataFrame:
    """Trim every string column in one generated projection.

    Mirrors the reference's dtype-driven trim pass
    (mls_listings_transform.py:141-151) but emits a single ``select``
    instead of chained ``withColumn`` so the logical plan stays flat.
    """
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType):
            cols.append(F.trim(F.col(field.name)).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)
