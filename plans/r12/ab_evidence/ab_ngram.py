"""Interleaved warm A/B: dedup_ngram_jaccard posting-list shape (r11,
committed) vs a-x-b self-join shape (r10). Bench-faithful warm-up
(full sf0.001 registry pass) per tools/warm_profile.py, then N
alternating timed runs of each shape with the noop sink."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def exact_jaccard_pairs_join(docs, id_col, shingles, threshold):
    """r10 a-x-b self-join shape, verbatim from 7014579."""
    base = docs.select(
        F.col(id_col).alias("_id"), shingles.alias("_shingles")
    ).withColumn("_sz", F.size("_shingles"))
    ex = base.select("_id", "_sz", F.explode("_shingles").alias("_sh"))
    a = ex.select(
        F.col("_sh"), F.col("_id").alias("id_a"), F.col("_sz").alias("_sza")
    )
    b = ex.select(
        F.col("_sh"), F.col("_id").alias("id_b"), F.col("_sz").alias("_szb")
    )
    inter = (
        a.join(b, ["_sh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("_inter"),
            F.first("_sza").alias("_sa"),
            F.first("_szb").alias("_sb"),
        )
    )
    jac = F.col("_inter") / (
        F.col("_sa") + F.col("_sb") - F.col("_inter")
    ).cast("double")
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def main():
    from etl_pipeline_4handling_listings_spark.functions.text import (
        word_shingles,
    )
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY, r, tbl
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab_ngram",
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

    def q_join(spark, sf_dir):
        d = (
            tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 600)
            .repartition(spark.sparkContext.defaultParallelism)
        )
        pairs = exact_jaccard_pairs_join(
            d, "doc_id", word_shingles("text", 3), threshold=0.5
        )
        return pairs.select(
            "id_a", "id_b", r(F.col("jaccard"), 6).alias("jaccard")
        )

    q_posting = REGISTRY["dedup_ngram_jaccard"].fn

    shapes = {"posting(r11)": q_posting, "join(r10)": q_join}
    results = {k: [] for k in shapes}
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
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
