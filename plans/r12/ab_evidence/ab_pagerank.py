"""Interleaved warm A/B: graph_pagerank old (deg unfrozen, distinct
node pass for n + rank init) vs new (frozen deg doubles as node
set)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def pagerank_old(spark, sf_dir):
    from etl_pipeline_4handling_listings_spark.queries import (
        _copresence_edges_cached,
    )

    edges = _copresence_edges_cached(spark, sf_dir)
    dirs = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = dirs.groupBy("src").agg(
        F.count("*").cast("long").alias("d")
    ).withColumnRenamed("src", "node")
    dirs_d = (
        dirs.join(deg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "d")
        .repartition("src")
        .sortWithinPartitions("src")
        .localCheckpoint(eager=True)
    )
    n = dirs_d.select("src").distinct().count()
    scale = 10**12
    base = (3 * scale) // (20 * n)
    pr = (
        dirs_d.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(scale // n).cast("long").alias("pr"))
    )
    for _it in range(6):
        pr = (
            dirs_d.join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("pr div d")).alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.expr("(17 * s) div 20"))
                .cast("long")
                .alias("pr"),
            )
        )
        if _it == 2:
            pr = pr.localCheckpoint(eager=True)
    top = pr.orderBy(F.desc("pr"), F.asc("node")).limit(20)
    return (
        deg.join(F.broadcast(top), "node")
        .select(
            F.col("node").alias("user_id"),
            F.col("d").alias("degree"),
            F.col("pr").alias("pr_e12"),
            (F.col("pr").cast("double") / F.lit(1000000000000.0)).alias(
                "pagerank"
            ),
        )
        .orderBy(F.desc("pr_e12"), F.asc("user_id"))
    )


def main():
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab_pagerank",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    a = [tuple(x) for x in pagerank_old(spark, "/root/testdata/sf0.01").collect()]
    b = [
        tuple(x)
        for x in REGISTRY["graph_pagerank"].fn(spark, "/root/testdata/sf0.01").collect()
    ]
    assert a == b, "old/new pagerank differ"
    print("identity check PASS", flush=True)

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
    from etl_pipeline_4handling_listings_spark.queries import (
        _copresence_edges_cached,
    )

    _copresence_edges_cached(spark, sf)  # shared build outside timing
    shapes = {"old_pr": pagerank_old, "new_pr": REGISTRY["graph_pagerank"].fn}
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results = {k: [] for k in shapes}
    for i in range(runs):
        for name, fn in shapes.items():
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            results[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for name, ts in results.items():
        print(f"{name}: {ts} MIN={min(ts):.3f} MED={sorted(ts)[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
