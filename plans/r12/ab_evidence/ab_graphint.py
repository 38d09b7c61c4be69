"""Upper-bound probe for VERDICT r11 #7 (dictionary-encode graph
node ids): run graph_link_prediction's body over (a) the cached
long-keyed edge frame and (b) the same frame CAST to int32 keys —
the cast is a free stand-in for a perfect dictionary encode, so its
delta is an UPPER BOUND on what dense-int encoding could buy before
paying for the dictionary build + decode joins."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def link_pred_body(spark, edges, r, max_middle_degree=1000):
    from etl_pipeline_4handling_listings_spark.operators.graph import (
        member_pairs,
    )

    adj = edges.select(
        F.col("u").alias("a"), F.col("v").alias("w")
    ).unionByName(edges.select(F.col("v").alias("a"), F.col("u").alias("w")))
    adj_grp = adj.groupBy("w").agg(
        F.array_sort(F.collect_list("a")).alias("us")
    ).localCheckpoint(eager=True)
    deg = adj_grp.select(
        F.col("w").alias("node"), F.size("us").cast("long").alias("d")
    )
    cand = (
        member_pairs(adj_grp, "us", max_cell=max_middle_degree)
        .select("u", "v", F.lit(1).cast("long").alias("_w"))
        .unionByName(
            edges.select("u", "v", F.lit(-(1 << 60)).cast("long").alias("_w"))
        )
        .groupBy("u", "v")
        .agg(F.sum("_w").alias("cn"))
        .filter(F.col("cn") > 0)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("deg_v"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
            F.col("cn").alias("common_neighbors"),
            "deg_u",
            "deg_v",
            r(
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(20)
    )


def main():
    from etl_pipeline_4handling_listings_spark.queries import (
        REGISTRY,
        _copresence_edges_cached,
        r,
    )
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab_graphint",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    warm_dir = "/root/testdata/sf0.001"
    t0 = time.perf_counter()
    for name in REGISTRY:
        try:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()
    print(f"warm pass: {time.perf_counter() - t0:.1f}s", flush=True)

    sf = "/root/testdata/sf0.1"
    edges_long = _copresence_edges_cached(spark, sf)
    edges_int = edges_long.select(
        F.col("u").cast("int").alias("u"), F.col("v").cast("int").alias("v")
    ).localCheckpoint(eager=True)

    # identity first
    a = [tuple(x) for x in link_pred_body(spark, edges_long, r).collect()]
    b = [tuple(x) for x in link_pred_body(spark, edges_int, r).collect()]
    assert a == b, "int-cast changed the result"
    print("identity check PASS", flush=True)

    shapes = {
        "long_keys": lambda: link_pred_body(spark, edges_long, r),
        "int_keys": lambda: link_pred_body(spark, edges_int, r),
    }
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results = {k: [] for k in shapes}
    for i in range(runs):
        for name, mk in shapes.items():
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for name, ts in results.items():
        print(f"{name}: {ts} MIN={min(ts):.3f} MED={sorted(ts)[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
