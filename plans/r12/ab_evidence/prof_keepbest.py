"""Decompose dedup_keep_best / dedup_clusters cost (VERDICT r11 #5):
phase wall times + Spark JOB COUNTS per phase (statusTracker on a
job group), after a bench-faithful warm pass."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    from etl_pipeline_4handling_listings_spark.functions.text import (
        quality_score,
        word_shingles,
    )
    from etl_pipeline_4handling_listings_spark.operators.clustering import (
        dedup_representatives,
    )
    from etl_pipeline_4handling_listings_spark.operators.dedup_approx import (
        minhash_dedup_pairs,
    )
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY, tbl
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="prof_keepbest",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    warm_dir = "/root/testdata/sf0.001"
    for name in REGISTRY:
        try:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()
    print("warm done", flush=True)

    sf = "/root/testdata/sf0.1"

    def njobs(group):
        return len(sc._jsc.sc().statusTracker().getJobIdsForGroup(group))

    def phase(tag, fn, runs=3):
        best = None
        for i in range(runs):
            g = f"{tag}#{i}"
            sc.setJobGroup(g, tag)
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            best = el if best is None else min(best, el)
            if i == 0:
                print(f"  {tag}: jobs={njobs(g)}", flush=True)
            spark.catalog.clearCache()
        print(f"  {tag}: MIN {best:.3f}s", flush=True)

    def docs():
        return tbl(spark, sf, "documents").filter(F.col("doc_id") < 600)

    def p_pairs():
        d = docs()
        minhash_dedup_pairs(
            d, "doc_id", word_shingles("text", 3), threshold=0.5,
            num_hashes=64, bands=32,
        ).write.format("noop").mode("overwrite").save()

    def p_cc():
        d = docs()
        pairs = minhash_dedup_pairs(
            d, "doc_id", word_shingles("text", 3), threshold=0.5,
            num_hashes=64, bands=32,
        )
        dedup_representatives(d, pairs).write.format("noop").mode(
            "overwrite"
        ).save()

    def p_full():
        REGISTRY["dedup_keep_best"].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    def p_clusters():
        REGISTRY["dedup_clusters"].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    phase("pairs_only", p_pairs)
    phase("pairs+cc", p_cc)
    phase("keep_best_full", p_full)
    phase("clusters_full", p_clusters)
    spark.stop()


if __name__ == "__main__":
    main()
