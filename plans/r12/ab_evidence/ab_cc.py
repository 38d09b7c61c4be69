"""Interleaved warm A/B: old connected_components loop (r11: join +
agg + left-join + observed checkpoint, persisted unsorted sym) vs
new (r12: invariant-frozen sym, union-fold single join+agg). Both
drive the full dedup_keep_best / dedup_clusters pipelines."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Observation, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def cc_old(vertices, edges, id_col, src_col, dst_col, max_iter=15):
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    sym = e.unionByName(
        e.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
    ).persist()
    labels = vertices.select(
        F.col(id_col).alias("_id"), F.col(id_col).alias("_label")
    ).persist()
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["_dst"] == labels["_id"])
            .groupBy("_src")
            .agg(F.min("_label").alias("_nbr_label"))
        )
        updated = labels.join(
            neighbor_min, labels["_id"] == neighbor_min["_src"], "left"
        ).select(
            "_id",
            F.least(
                F.col("_label"), F.coalesce("_nbr_label", F.col("_label"))
            ).alias("_label"),
            (
                F.coalesce("_nbr_label", F.col("_label")) < F.col("_label")
            ).alias("_changed"),
        )
        obs = Observation()
        updated = updated.observe(
            obs, F.count(F.when(F.col("_changed"), 1)).alias("n_changed")
        )
        updated = updated.localCheckpoint(eager=True)
        changed = int(obs.get["n_changed"])
        labels.unpersist()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    sym.unpersist()
    assert changed == 0
    return labels.select(
        F.col("_id").alias(id_col), F.col("_label").alias("component")
    )


def keep_best_old(spark, sf_dir):
    from etl_pipeline_4handling_listings_spark.functions.text import (
        quality_score,
        word_shingles,
    )
    from etl_pipeline_4handling_listings_spark.operators.dedup_approx import (
        minhash_dedup_pairs,
    )
    from etl_pipeline_4handling_listings_spark.queries import tbl

    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    pairs = minhash_dedup_pairs(
        d, "doc_id", word_shingles("text", 3), threshold=0.5,
        num_hashes=64, bands=32,
    )
    cc = cc_old(
        d.select(F.col("doc_id").alias("id")), pairs, "id", "id_a", "id_b"
    )
    labeled = cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    scored = labeled.join(
        d.select("doc_id", quality_score("text").alias("quality")), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    wc = Window.partitionBy("cluster_id")
    return (
        scored.select(
            "*",
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(wc).alias("n_members"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            "quality",
        )
        .orderBy("cluster_id")
    )


def main():
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab_cc", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    # identity check
    a = sorted(map(tuple, keep_best_old(spark, "/root/testdata/sf0.01").collect()))
    b = sorted(
        map(
            tuple,
            REGISTRY["dedup_keep_best"].fn(spark, "/root/testdata/sf0.01").collect(),
        )
    )
    assert a == b, "old/new keep_best differ"
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
    shapes = {
        "old_cc": keep_best_old,
        "new_cc": REGISTRY["dedup_keep_best"].fn,
    }
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
