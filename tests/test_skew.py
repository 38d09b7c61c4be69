"""Salted join / aggregation must be result-identical to the plain form."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.operators.skew import (
    salted_agg,
    salted_join,
)


def test_salted_join_matches_plain_join(spark):
    # one dominant key ("hot") + a tail
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [(f"k{i}", i) for i in range(50)],
        ["k", "v"],
    )
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"T{i}") for i in range(50)], ["k", "label"]
    )
    plain = left.join(right, "k").select("k", "v", "label")
    salted = salted_join(left, right, ["k"], salt_buckets=4).select("k", "v", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    right = spark.createDataFrame([("a", "A")], ["k", "label"])
    out = salted_join(left, right, ["k"], salt_buckets=3, how="left")
    got = {(r["k"], r["v"], r["label"]) for r in out.collect()}
    assert got == {("a", 1, "A"), ("b", 2, None)}


def test_salted_agg_matches_plain_agg(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0)], ["k", "v"]
    )
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs={"pn": F.count("*"), "ps": F.sum("v")},
            final_aggs={"n": F.sum("pn"), "s": F.sum("ps")},
            salt_buckets=4,
        ).collect()
    }
    assert plain == salted


def test_hash_split_stable_and_proportional(spark):
    from etl_pipeline_4handling_listings_spark.operators.sampling import (
        hash_sample,
        hash_split,
        per_key_top_n,
    )

    df = spark.range(10_000).select(F.col("id").cast("string").alias("doc"))
    split = hash_split(df, ["doc"], {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] - 8000) < 300
    assert abs(counts["val"] - 1000) < 150
    assert abs(counts["test"] - 1000) < 150
    # stability: repartitioned input yields identical assignment
    again = hash_split(df.repartition(13), ["doc"], {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc"]: r["split"] for r in split.collect()}
    b = {r["doc"]: r["split"] for r in again.collect()}
    assert a == b
    # monotone growth: a subset's assignments never change
    sub = hash_split(df.filter(F.col("doc") < "5"), ["doc"], {"train": 0.8, "val": 0.1, "test": 0.1})
    for r in sub.collect():
        assert a[r["doc"]] == r["split"]

    samp = hash_sample(df, ["doc"], 0.25)
    assert abs(samp.count() - 2500) < 200

    capped = per_key_top_n(
        df.withColumn("k", F.substring("doc", 1, 1)),
        ["k"],
        [F.asc("doc")],
        n=5,
    )
    per_key = {r["k"]: r["n"] for r in capped.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 5 for v in per_key.values())
