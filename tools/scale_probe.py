"""Core-count scaling probe over the heavy queries (VERDICT r11 #6).

Times the named (default: top-10 heaviest) registry queries against
a probe dataset (tools/gen_probe_data.py) with the bench's noop-sink
methodology, reporting MIN of N runs per query plus the shared
edge/token build costs. Run twice — SPARK_GRAFT_CPUS=32 and =8 —
and compare: shuffle/compute-bound queries must show ratios well
above 1 at this data size, which sf0.1 cannot (overhead-bound).

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scale_probe.py --sf /root/probe10
  SPARK_GRAFT_CPUS=8  python tools/scale_probe.py --sf /root/probe10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "stats_spearman_corr",
    "graph_link_prediction",
    "graph_pagerank",
    "graph_clustering_coefficient",
    "graph_kcore",
    "graph_triangle_count",
    "events_concurrent_sessions",
    "text_shingle_containment",
    "tfidf_top_terms",
    "textrank_keywords",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/probe10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from etl_pipeline_4handling_listings_spark.queries import (
        REGISTRY,
        _copresence_edges_cached,
        _tokens,
    )
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name=f"scale_probe_{cpus}c",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # warm plan shapes on the tiny sf (bench-faithful)
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()

    out: dict = {"cpus": int(cpus), "sf_dir": args.sf}
    t0 = time.perf_counter()
    _copresence_edges_cached(spark, args.sf)
    out["shared_edge_build_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _tokens(spark, args.sf)
    out["shared_token_build_sec"] = round(time.perf_counter() - t0, 3)

    times: dict[str, float] = {}
    for name in names:
        best = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"probe:{name}#{i}")
            t0 = time.perf_counter()
            try:
                REGISTRY[name].fn(spark, args.sf).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as exc:
                print(f"FAIL {name}: {exc}", flush=True)
                best = -1.0
                break
            el = round(time.perf_counter() - t0, 3)
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        times[name] = best
        print(f"{name}: {best}", flush=True)
    out["queries"] = times
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
