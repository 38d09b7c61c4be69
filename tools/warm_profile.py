"""Bench-faithful warm profiler (guide §1: measure in the context
you ship).

`tools/profile_query.py` times queries in a NEAR-FRESH session
(one sf0.001 warm pass of the named queries only). That harness
mis-ranks optimizations whose cost profile changes once the JVM is
hot: the r11 MinHash signature rewrite won a 2.1x interleaved A/B
there and then REGRESSED ~2x inside bench.py, whose session has
warmed all 233 queries before any timing (C2 compiles the
interpreted-expression hot loops; huge generated projections stay
unprofitable). This tool reproduces bench.py's warm-up exactly —
full registry pass at sf0.001, Arrow worker-pool warm, clearCache —
then times the named queries with the noop sink.

Usage: python tools/warm_profile.py [--sf SF] [--runs N] query ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from etl_pipeline_4handling_listings_spark.queries import REGISTRY
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="warm_profile",
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

    for name in args.queries:
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"warm_profile:{name}#{i}")
            t0 = time.perf_counter()
            try:
                REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"FAIL {name}: {exc}")
                break
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        if times:
            print(f"{name} {times} MIN: {min(times):.3f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
