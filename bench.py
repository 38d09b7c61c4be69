"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is executed fully (noop sink — no driver collect, no
result materialization skew) after a warm-up of the session. Wall
time is per-query, session startup excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_curated",
    "q1_pricing_summary",
    "q3_topk_join_agg",
    "q5_multi_join_agg",
    "q6_forecast_revenue",
    "q18_large_orders",
    "w1_latest_record",
    "w6_lead_changed",
    "v_validation_flags",
    "m1_merge_upsert",
    "m2_history_merge",
    "o1_priority_topk",
    "x1_enrich_lookup",
    "events_hourly_rollup",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    "text_langid",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from etl_pipeline_4handling_listings_spark.session import get_spark
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up pass at the smallest sf: triggers JVM class loading,
    # codegen compilation, and parquet footer caching for the same
    # plan shapes, so the timed pass measures steady-state execution
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        try:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # drop warm-up cached RDDs so the timed pass starts clean
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
