"""E2E listings-domain pipeline tests: curated idempotency, the
history update/delete/insert matrix, and the enrichment backfill.

Fixture shapes follow FIXTURES.md (compact core-column instance).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.plans import (
    ListingsDims,
    backfill_property_ids,
    run_curated_load,
    run_history_load,
    validate_listings,
)
from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

TS = datetime.datetime
D = datetime.date

RAW_SCHEMA = (
    "mls STRING, mls_listing_id STRING, source_as_of_date TIMESTAMP,"
    " load_date STRING, listing_date DATE, entry_date DATE,"
    " listing_status STRING, current_price DECIMAL(16,4),"
    " closed_price DECIMAL(16,4), rent_sale STRING, property_type STRING,"
    " property_sub_type STRING, state_raw STRING, zip_raw STRING,"
    " street_address_raw STRING, source_listing_id STRING,"
    " owner_phone STRING, create_timestamp TIMESTAMP,"
    " asg_primary_id BIGINT, asg_primary_id_queried_ts TIMESTAMP"
)


def _row(
    mls="MLSA",
    lid="L1",
    as_of=TS(2024, 1, 1),
    load_date="20240101",
    status="A",
    price=100.0,
    closed=None,
    rent_sale="Sale",
    ptype="SF",
    subtype="House",
    state="CO",
    zipc="80001",
    addr="1 Main St",
    source_lid="S1",
    phone="(303) 555-1234",
):
    from decimal import Decimal

    return (
        mls, lid, as_of, load_date, D(2024, 1, 1), D(2024, 1, 1),
        status, Decimal(str(price)), Decimal(str(closed)) if closed else None,
        rent_sale, ptype, subtype, state, zipc, addr, source_lid, phone,
        TS(2024, 1, 1, 12), None, None,
    )


@pytest.fixture()
def dims(spark):
    return ListingsDims(
        boards=spark.createDataFrame(
            [("MLSA", None), ("MLSB", None), ("MLSOLD", "MLSA"), (None, None)],
            "mls STRING, movedto STRING",
        ),
        states=spark.createDataFrame(
            [("CO", "Colorado"), ("TX", "Texas")], "state STRING, name STRING"
        ),
        zipcodes=spark.createDataFrame(
            [("80001", "CO"), ("75001", "TX")], "zipcode STRING, state STRING"
        ),
        property_sub_types=spark.createDataFrame(
            [("House",), ("Condo",)], "property_sub_type STRING"
        ),
    )


def test_validate_listings_flags(spark, dims):
    raw = spark.createDataFrame(
        [
            _row(),  # clean
            _row(mls="NOPE", lid="L2"),  # unknown board
            _row(lid="L3", status="Z"),  # bad status
            _row(lid="L4", state="Colorado"),  # full-name state (OR join)
            _row(lid="L5", price=0.0),  # invalid price, active
            _row(lid="L6", price=0.0, status="S", closed=250.0),  # sold w/ closed ok
            _row(mls="MLSOLD", lid="L7"),  # merged board remaps to MLSA
        ],
        RAW_SCHEMA,
    )
    good, bad = validate_listings(raw, dims)
    good_ids = {r["mls_listing_id"] for r in good.collect()}
    assert good_ids == {"L1", "L6", "L7"}
    bad_rows = {r["mls_listing_id"]: r["_reject_reasons"] for r in bad.collect()}
    assert "invalid mls" in bad_rows["L2"]
    assert "invalid listing_status" in bad_rows["L3"]
    assert "invalid price" in bad_rows["L5"]
    # full-name state passes the OR state join but (like the
    # reference, transform.py:67,72) fails the zipcode lookup keyed
    # on the raw state string
    assert bad_rows["L4"] == "invalid zipcode"
    # merged board: mls rewritten to successor
    remapped = [r for r in good.collect() if r["mls_listing_id"] == "L7"]
    assert remapped[0]["mls"] == "MLSA"


def test_curated_load_idempotent_and_latest_wins(spark, dims, tmp_path):
    store = MergeStore(spark, str(tmp_path / "curated"), keys=["mls", "mls_listing_id"])
    day1 = spark.createDataFrame(
        [
            _row(as_of=TS(2024, 1, 1), price=100.0),
            _row(as_of=TS(2024, 1, 2), price=120.0),  # newer obs same listing
            _row(lid="L2", as_of=TS(2024, 1, 1), price=50.0),
        ],
        RAW_SCHEMA,
    )
    res = run_curated_load(day1, dims, store)
    cur = {r["mls_listing_id"]: r for r in res.curated.collect()}
    assert float(cur["L1"]["current_price"]) == 120.0  # newest wins
    assert len(cur) == 2
    assert res.outdated.count() == 1  # superseded day-1 observation

    # re-running the same load must be a no-op (idempotency, M1)
    before = sorted(map(tuple, store.read().collect()))
    run_curated_load(day1, dims, store)
    assert sorted(map(tuple, store.read().collect())) == before

    # day 2: newer observation updates, new listing inserts, and the
    # already-stored newest observation survives a replay of older data
    day2 = spark.createDataFrame(
        [
            _row(as_of=TS(2024, 1, 5), price=130.0),
            _row(lid="L3", as_of=TS(2024, 1, 5), price=75.0),
        ],
        RAW_SCHEMA,
    )
    res2 = run_curated_load(day2, dims, store)
    cur2 = {r["mls_listing_id"]: r for r in res2.curated.collect()}
    assert float(cur2["L1"]["current_price"]) == 130.0
    assert float(cur2["L2"]["current_price"]) == 50.0
    assert float(cur2["L3"]["current_price"]) == 75.0
    # carry-forward: create_timestamp keeps the first-seen value
    assert cur2["L1"]["create_timestamp"] == TS(2024, 1, 1, 12)


def test_history_load_update_delete_insert_matrix(spark, dims, tmp_path):
    hist = MergeStore(
        spark,
        str(tmp_path / "hist"),
        keys=["mls", "mls_listing_id", "source_as_of_date"],
    )
    # two observations with a real change (price 100 -> 200), one
    # observation whose driving columns never change (L2)
    load1 = spark.createDataFrame(
        [
            _row(as_of=TS(2024, 1, 1), price=100.0),
            _row(as_of=TS(2024, 1, 2), price=200.0),
            _row(lid="L2", as_of=TS(2024, 1, 1), price=50.0),
        ],
        RAW_SCHEMA,
    )
    out1 = run_history_load(load1, dims, hist)
    keys1 = {
        (r["mls_listing_id"], r["source_as_of_date"]) for r in out1.collect()
    }
    # every first/changed observation inserts
    assert keys1 == {
        ("L1", TS(2024, 1, 1)),
        ("L1", TS(2024, 1, 2)),
        ("L2", TS(2024, 1, 1)),
    }

    # replay where L1@Jan2 now carries the SAME driving values as its
    # previous observation (Jan1, price 100): the Jan2 history row is
    # redundant — M2's DELETE clause removes it (ref
    # hist_curated.py:194-203). A changed re-observation of L2@Jan1
    # updates in place.
    load2 = spark.createDataFrame(
        [
            _row(as_of=TS(2024, 1, 2), price=100.0),  # unchanged vs Jan1 -> DELETE
            _row(lid="L2", as_of=TS(2024, 1, 1), price=50.0, addr="9 Oak Av"),
        ],
        RAW_SCHEMA,
    )
    out2 = run_history_load(load2, dims, hist)
    rows2 = {
        (r["mls_listing_id"], r["source_as_of_date"]): r for r in out2.collect()
    }
    assert ("L1", TS(2024, 1, 2)) not in rows2  # deleted (no change vs previous)
    assert ("L1", TS(2024, 1, 1)) in rows2  # untouched target row kept
    assert rows2[("L2", TS(2024, 1, 1))]["street_address_raw"] == "9 Oak Av"


def test_backfill_property_ids(spark, dims, tmp_path):
    store = MergeStore(spark, str(tmp_path / "curated"), keys=["mls", "mls_listing_id"])
    raw = spark.createDataFrame(
        [_row(), _row(lid="L2"), _row(lid="L3")], RAW_SCHEMA
    )
    run_curated_load(raw, dims, store)

    def transport(rows):
        return [{"asg_primary_id": int(r["mls_listing_id"][1:]) * 100} for r in rows]

    out = backfill_property_ids(store, transport, run_ts="2024-02-01 00:00:00")
    got = {r["mls_listing_id"]: r["asg_primary_id"] for r in out.collect()}
    assert got == {"L1": 100, "L2": 200, "L3": 300}
    stamped = {r["mls_listing_id"]: r["asg_primary_id_queried_ts"] for r in out.collect()}
    assert all(v == TS(2024, 2, 1) for v in stamped.values())


def test_curated_load_empty_input(spark, dims, tmp_path):
    store = MergeStore(spark, str(tmp_path / "empty"), keys=["mls", "mls_listing_id"])
    empty = spark.createDataFrame([], RAW_SCHEMA)
    res = run_curated_load(empty, dims, store)
    assert res.curated.count() == 0
    assert res.rejected.count() == 0
    assert res.outdated.count() == 0
    # a later real load still works against the empty-initialized store
    res2 = run_curated_load(
        spark.createDataFrame([_row()], RAW_SCHEMA), dims, store
    )
    assert res2.curated.count() == 1
