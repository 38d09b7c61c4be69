"""Tests: metastore registration, schema loader, sized export."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_4handling_listings_spark.schema import (
    enforce_schema,
    load_schema,
    save_schema,
)
from etl_pipeline_4handling_listings_spark.sources.publish import (
    register_external_table,
)
from etl_pipeline_4handling_listings_spark.sources.writers import write_export


def test_register_external_table(spark, tmp_path):
    path = str(tmp_path / "export")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).write.parquet(path)
    register_external_table(spark, "test_listings_export", path)
    got = spark.sql("SELECT k, v FROM test_listings_export ORDER BY k").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a"), (2, "b")]
    spark.sql("DROP TABLE test_listings_export")


def test_schema_roundtrip_and_enforcement(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("mls", T.StringType(), False),
            T.StructField("current_price", T.DecimalType(16, 4), True),
            T.StructField("beds", T.IntegerType(), True),
            T.StructField("listing_date", T.DateType(), True),
        ]
    )
    p = tmp_path / "schema.json"
    save_schema(schema, p)
    loaded = load_schema(p)
    assert loaded == schema

    # enforcement: casts, reorders, fills missing columns with nulls
    df = spark.createDataFrame(
        [("99.5", "A", 3)], ["current_price", "mls", "beds"]
    )
    out = enforce_schema(df, loaded)
    assert out.columns == ["mls", "current_price", "beds", "listing_date"]
    row = out.collect()[0]
    assert float(row["current_price"]) == 99.5
    assert row["listing_date"] is None
    assert [f.dataType for f in out.schema.fields] == [
        f.dataType for f in schema.fields
    ]


def test_write_export_sizing(spark, tmp_path):
    df = spark.range(1000).repartition(8)
    path = str(tmp_path / "sized")
    write_export(df, path, num_files=2)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 2
    assert spark.read.parquet(path).count() == 1000
