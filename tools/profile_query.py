"""Per-query profiler for optimization rounds (guide §1).

Times one or more registry queries in isolation with the noop sink
(same methodology as bench.py: warm session, per-query wall time,
clearCache between queries) and optionally dumps
``explain("formatted")`` to a file.

Usage:
    python tools/profile_query.py [--sf SF_DIR] [--runs N]
        [--plan-dir DIR] query [query ...]

Prints one line per query per run plus the min. Writes
``<plan-dir>/<query>.txt`` when --plan-dir is given.
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
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from etl_pipeline_4handling_listings_spark.session import get_spark
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py so numbers are comparable
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm and os.path.isdir(warm_dir):
        for name in args.queries:
            try:
                REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # surface, don't die
                print(f"WARM FAIL {name}: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    for name in args.queries:
        fn = REGISTRY[name].fn
        best = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            try:
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
            except Exception as exc:
                print(f"FAIL {name}: {exc}")
                break
            best = dt if best is None else min(best, dt)
            print(f"{name} run{i}: {dt:.3f}s", flush=True)
            spark.catalog.clearCache()
        if best is not None:
            print(f"{name} MIN: {best:.3f}s", flush=True)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
