"""Unit + property tests for the listings-domain cleaning rules."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.functions.cleaning import (
    clean_phone_number,
)
from etl_pipeline_4handling_listings_spark.functions.listings_rules import (
    classify_septic_sewer,
    classify_water_source,
    clean_apn,
    extract_unit_from_address,
    lot_size_acres,
    lot_size_sqft,
    normalize_township,
    normalize_yn,
    sanitize_email,
)


def _one(spark, value, expr):
    return (
        spark.createDataFrame([(value,)], "x STRING")
        .select(expr.alias("y"))
        .collect()[0]["y"]
    )


@pytest.mark.parametrize(
    "raw,want",
    [
        ("City Well Water", "Well"),
        ("Municipal district supply", "Public"),
        ("no water service", "None"),
        ("spring fed", "Other"),
        (None, None),
    ],
)
def test_classify_water_source(spark, raw, want):
    assert _one(spark, raw, classify_water_source("x")) == want


@pytest.mark.parametrize(
    "raw,want",
    [("Septic Tank", "Septic"), ("City Sewer", "Sewer"), ("lagoon", "Other"), (None, None)],
)
def test_classify_septic_sewer(spark, raw, want):
    assert _one(spark, raw, classify_septic_sewer("x")) == want


@pytest.mark.parametrize(
    "raw,want",
    [("yes", "Y"), (" TRUE ", "Y"), ("0", "N"), ("maybe", None), (None, None)],
)
def test_normalize_yn(spark, raw, want):
    assert _one(spark, raw, normalize_yn("x")) == want


def test_lot_size_conversions(spark):
    df = spark.createDataFrame(
        [
            (Decimal("2.5"), None),  # plausible acres
            (None, Decimal("87120")),  # derive 2 acres from sqft
            (Decimal("87120"), None),  # mislabeled: sqft in acres col
        ],
        "acres DECIMAL(16,4), sqft DECIMAL(16,4)",
    )
    out = df.select(
        lot_size_acres("acres", "sqft").alias("a"),
        lot_size_sqft("acres", "sqft").alias("s"),
    ).collect()
    assert [float(r["a"]) for r in out] == [2.5, 2.0, 2.0]
    assert float(out[0]["s"]) == 2.5 * 43560
    assert float(out[1]["s"]) == 87120.0


@pytest.mark.parametrize(
    "raw,want",
    [
        ("123 Main St #4B", "4B"),
        ("9 Oak Ave", None),
        ("77 Pine #", None),
    ],
)
def test_extract_unit(spark, raw, want):
    assert _one(spark, raw, extract_unit_from_address("x")) == want


@pytest.mark.parametrize(
    "raw,want",
    [("12N", "12N"), ("12-N", "12N"), ("T12N", "12N"), ("t3s", "3S"), ("north", None)],
)
def test_normalize_township(spark, raw, want):
    assert _one(spark, raw, normalize_township("x")) == want


@pytest.mark.parametrize(
    "raw,want",
    [("a@b.co", "a@b.co"), ("not-an-email", None), ("@", None)],
)
def test_sanitize_email(spark, raw, want):
    assert _one(spark, raw, sanitize_email("x")) == want


@pytest.mark.parametrize(
    "raw,want",
    [("12-34-567 89", "12-34-56789"), ("...", None), ("ab 12", "AB12")],
)
def test_clean_apn(spark, raw, want):
    assert _one(spark, raw, clean_apn("x")) == want


# --- property-based: the phone cleaner's invariant (SURVEY §5.4) -----


@given(raw=st.text(min_size=0, max_size=30))
@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
def test_phone_cleaner_invariant(spark_global, raw):
    out = _one(spark_global, raw, clean_phone_number("x"))
    # invariant: output is None or exactly 10 digits with a plausible prefix
    if out is not None:
        assert len(out) == 10 and out.isdigit()
        assert not out.startswith(("000", "111", "999", "123"))


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
