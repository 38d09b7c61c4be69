"""Listings-domain normalization rules.

Re-expressions of the reference's named cleaning rules from the
~90-column transform block (reference
listings/mls_listings_transform.py:141-317) as pure Column
functions. Each is a built-in expression chain — no UDFs — and each
carries the reference citation for parity checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_4handling_listings_spark.functions.cleaning import instr_any

# --- water source classification (ref transform.py:207-219) ----------
# keyword taxonomy -> canonical label, evaluated in priority order
_WATER_TAXONOMY: list[tuple[tuple[str, ...], str]] = [
    (("well", "cistern"), "Well"),
    (("public", "city", "municipal", "county", "district"), "Public"),
    (("none", "no water"), "None"),
]


def classify_water_source(col: str | Column) -> Column:
    """Keyword-priority water-source classification; unmatched
    non-null input -> 'Other', null stays null."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    expr = F.when(c.isNull(), F.lit(None).cast("string"))
    for keywords, label in _WATER_TAXONOMY:
        expr = expr.when(instr_any(c, keywords), F.lit(label))
    return expr.otherwise(F.lit("Other"))


# --- septic/sewer classification (ref transform.py:221-224) ----------
def classify_septic_sewer(col: str | Column) -> Column:
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(instr_any(c, ("septic",)), F.lit("Septic"))
        .when(instr_any(c, ("sewer", "public", "city")), F.lit("Sewer"))
        .otherwise(F.lit("Other"))
    )


# --- Y/N normalization (ref transform.py:230-234) --------------------
def normalize_yn(col: str | Column) -> Column:
    """Free-text boolean-ish field -> 'Y'/'N'/null."""
    c = F.upper(F.trim(F.col(col) if isinstance(col, str) else col))
    return (
        F.when(c.isin("Y", "YES", "TRUE", "1"), F.lit("Y"))
        .when(c.isin("N", "NO", "FALSE", "0"), F.lit("N"))
        .otherwise(F.lit(None).cast("string"))
    )


# --- lot size acres <-> sqft (ref transform.py:192-202) --------------
SQFT_PER_ACRE = 43560
# reference threshold: a "lot_size_acres" value > 50 is assumed to
# actually be square feet (vendor data quality guard)
ACRES_PLAUSIBLE_MAX = 50


def lot_size_acres(acres: str | Column, sqft: str | Column) -> Column:
    """Canonical acres: trust a plausible acres value, else derive
    from sqft; values > 50 'acres' are treated as mislabeled sqft."""
    a = F.col(acres) if isinstance(acres, str) else acres
    s = F.col(sqft) if isinstance(sqft, str) else sqft
    derived = F.round(s / SQFT_PER_ACRE, 4)
    return (
        F.when(a.isNull(), derived)
        .when(a > ACRES_PLAUSIBLE_MAX, F.round(a / SQFT_PER_ACRE, 4))
        .otherwise(a)
    ).cast(T.DecimalType(16, 4))


def lot_size_sqft(acres: str | Column, sqft: str | Column) -> Column:
    """Canonical sqft with int-overflow guard (ref :202,251)."""
    a = F.col(acres) if isinstance(acres, str) else acres
    s = F.col(sqft) if isinstance(sqft, str) else sqft
    derived = F.round(a * SQFT_PER_ACRE, 0)
    out = F.coalesce(s, derived)
    return F.when(out <= 2147483647, out).cast(T.DecimalType(16, 4))


# --- unit extraction from address (ref transform.py:158) -------------
def extract_unit_from_address(col: str | Column) -> Column:
    """'123 Main St #4B' -> '4B' (regexp_extract group 2)."""
    c = F.col(col) if isinstance(col, str) else col
    unit = F.trim(F.regexp_extract(c, r"(.*)#(.*)", 2))
    return F.when(unit != "", unit)


# --- township normalization (ref transform.py:174-185) ---------------
def normalize_township(col: str | Column) -> Column:
    """Accept forms '##N', '##-N', 'T##N' -> canonical '##N';
    anything else null."""
    c = F.upper(F.trim(F.col(col) if isinstance(col, str) else col))
    canon = F.regexp_replace(F.regexp_replace(c, r"^T", ""), r"-", "")
    return F.when(canon.rlike(r"^[0-9]{1,3}[NSEW]$"), canon)


# --- phone-adjacent email sanity (ref transform.py:305) --------------
def sanitize_email(col: str | Column) -> Column:
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c.contains("@") & (F.length(c) >= 5), c)


# --- APN cleanup (ref transform.py:186) ------------------------------
def clean_apn(col: str | Column) -> Column:
    """Assessor parcel number: strip spaces and punctuation except
    dashes, null if nothing alphanumeric remains."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.upper(c), r"[^0-9A-Z-]", "")
    return F.when(F.regexp_replace(cleaned, "-", "") != "", cleaned)
