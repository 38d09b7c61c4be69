"""Generate a ~10x scaling-probe dataset from sf0.1 (VERDICT r11 #6).

sf0.1 is overhead-bound: every 8c/32c bench ratio is ~1 because 229
of 233 queries finish under 2.3 s, so core-count scaling claims rest
on plan shape alone. This tool materializes a K-times larger dataset
(default K=10, "sf1-shaped") by unioning K key-shifted DISJOINT
copies of the sf0.1 tables, so the heavy queries get K times the
real work with the same per-copy density:

- ``lineitem``: keys shifted per copy; prices shifted by i CENTS so
  the distinct-price count grows Kx while the unit-bucket DOMAIN
  stays fixed (the spearman two-level rank design is domain-bounded
  — growing the domain Kx with the data would probe a different,
  artificial shape);
- ``events``: user_id/event_id shifted AND the timestamp shifted by
  K years per copy — (event_type, hour) cells stay per-copy, so the
  co-presence graph is K disjoint copies of the sf0.1 graph (edges,
  wedges, triangles all scale Kx; a naive union without the time
  shift would put 10x the users in each cell and blow C(n,2) up
  100x, which is a different — denser — graph, not a bigger one);
- ``documents``: doc_id shifted and every word salted with the copy
  index, so vocabularies are disjoint per copy — token streams,
  posting lists and pair work scale Kx, not (Kx)^2.

Deterministic (pure column arithmetic on deterministic input), no
RNG. Output is for SCALING MEASUREMENT ONLY (tools/scale_probe.py);
it is not oracle data and nothing in the bench reads it.

Usage: python tools/gen_probe_data.py [--out /root/probe10] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/probe10")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="gen_probe_data",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    SHIFT = 10_000_000  # beyond every sf0.1 key range

    def copies(df, transform):
        out = None
        for i in range(args.k):
            c = transform(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    li = spark.read.parquet(f"{args.src}/lineitem.parquet")
    li_k = copies(
        li,
        lambda d, i: d.select(
            (F.col("l_orderkey") + i * SHIFT).alias("l_orderkey"),
            (F.col("l_partkey") + i * SHIFT).alias("l_partkey"),
            (F.col("l_suppkey") + i * SHIFT).alias("l_suppkey"),
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") + i * 0.01).alias(
                "l_extendedprice"
            ),
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
    )
    li_k.repartition(int(cpus)).write.mode("overwrite").parquet(
        f"{args.out}/lineitem.parquet"
    )
    print("lineitem done", flush=True)

    ev = spark.read.parquet(f"{args.src}/events.parquet")
    # ~K years in microseconds keeps every copy's hour cells disjoint
    YEAR_US = 366 * 24 * 3600 * 1_000_000
    ev_k = copies(
        ev,
        lambda d, i: d.select(
            (F.col("event_id") + i * SHIFT).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.lit(i * YEAR_US / 1e6)))
            .alias("ts"),
            (F.col("user_id") + i * SHIFT).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )
    ev_k.repartition(int(cpus)).write.mode("overwrite").parquet(
        f"{args.out}/events.parquet"
    )
    print("events done", flush=True)

    docs = spark.read.parquet(f"{args.src}/documents.parquet")
    docs_k = copies(
        docs,
        lambda d, i: d.select(
            (F.col("doc_id") + i * SHIFT).alias("doc_id"),
            # salt every word with the copy index: per-copy
            # vocabularies are disjoint, so token/shingle work
            # scales Kx instead of pair work scaling (Kx)^2
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{i}").alias(
                "text"
            ),
            "lang",
            "source",
            "n_chars",
        ),
    )
    docs_k.repartition(int(cpus)).write.mode("overwrite").parquet(
        f"{args.out}/documents.parquet"
    )
    print("documents done", flush=True)

    # small dims copied verbatim (only read by queries outside the
    # probe set, but tbl() must find them)
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "embeddings",
    ]:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")
    print("dims done", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
