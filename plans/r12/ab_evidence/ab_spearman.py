"""Interleaved warm A/B for stats_spearman_corr (VERDICT r11 #4).

Shapes:
  A committed  — two-scan marginal-histogram shape (r11)
  B expand1    — ONE lineitem scan via 2x Expand: tag-0 branch = the
                 (flag, qv) marginal, tag-1 branch = the (flag, pv,
                 qv) joint; rank attach + pmarg re-aggregate from
                 the checkpointed joint (the judge's grouping-sets
                 single-scan ask, made exact for the cross moment)
  C fusedrank  — shape A but the price-rank machinery does ONE
                 exchange of the (flag, pv) marginal (repartition by
                 (flag, bucket); the within-bucket cumulative, the
                 bucket totals, and the offset join all reuse it)
                 instead of two

Verifies all shapes produce IDENTICAL rows at sf0.01 first, then
bench-faithful warm-up and N interleaved timed runs at sf0.1.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _with_rank2(per, vcol, bcol, wcol):
    offs = per.groupBy("flag", bcol).agg(F.sum(wcol).alias("_bw"))
    wb = (
        Window.partitionBy("flag")
        .orderBy(bcol)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = offs.select(
        "flag", bcol, F.coalesce(F.sum("_bw").over(wb), F.lit(0)).alias("_off")
    )
    wv = (
        Window.partitionBy("flag", bcol)
        .orderBy(vcol)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    le = F.col("_off") + F.sum(wcol).over(wv)
    return per.join(F.broadcast(offs), ["flag", bcol]).withColumn(
        "rk2", (2 * le - F.col(wcol) + 1).cast("long")
    )


def _with_rank2_fused(per, vcol, bcol, wcol):
    """One exchange of the big frame: repartition by (flag, bucket);
    bucket totals aggregate on the same keys (exchange reused), the
    within-bucket cumulative window needs no new exchange, offsets
    broadcast back."""
    per2 = per.repartition(F.col("flag"), F.col(bcol))
    offs0 = per2.groupBy("flag", bcol).agg(F.sum(wcol).alias("_bw"))
    wb = (
        Window.partitionBy("flag")
        .orderBy(bcol)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = offs0.select(
        "flag", bcol, F.coalesce(F.sum("_bw").over(wb), F.lit(0)).alias("_off")
    )
    wv = (
        Window.partitionBy("flag", bcol)
        .orderBy(vcol)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    le = F.col("_off") + F.sum(wcol).over(wv)
    return per2.join(F.broadcast(offs), ["flag", bcol]).withColumn(
        "rk2", (2 * le - F.col(wcol) + 1).cast("long")
    )


def _finish(mq, mp, r):
    m = mq.join(F.broadcast(mp), "flag")
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.sqrt(
        (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            F.col("n").cast("double") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return m.select("flag", "n", r(num / den, 6).alias("spearman")).orderBy(
        "flag"
    )


def _mq(qrank):
    return qrank.groupBy("flag").agg(
        F.sum("cq").cast("long").alias("n"),
        F.sum(F.col("cq").cast("decimal(38,0)") * F.col("rk2")).alias("sx"),
        F.sum(
            F.col("cq").cast("decimal(38,0)") * F.col("rk2") * F.col("rk2")
        ).alias("sxx"),
    )


def _mp(prank):
    return prank.groupBy("flag").agg(
        F.sum(F.col("cp").cast("decimal(38,0)") * F.col("rk2")).alias("sy"),
        F.sum(
            F.col("cp").cast("decimal(38,0)") * F.col("rk2") * F.col("rk2")
        ).alias("syy"),
        F.sum(F.col("sxp") * F.col("rk2")).alias("sxy"),
    )


def make_shapes(tbl, r):
    def li(spark, sf_dir):
        return tbl(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").alias("qv"),
            F.col("l_extendedprice").alias("pv"),
        )

    def shape_B(spark, sf_dir):
        src = li(spark, sf_dir)
        ex = src.select(
            "flag", "qv", "pv", F.explode(F.array(F.lit(0), F.lit(1))).alias("_t")
        )
        marg = (
            ex.groupBy(
                "_t",
                "flag",
                F.when(F.col("_t") == 0, F.col("qv"))
                .otherwise(F.col("pv"))
                .alias("v"),
                F.when(F.col("_t") == 1, F.col("qv")).alias("qk"),
            )
            .agg(F.count("*").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        qmarg = marg.filter(F.col("_t") == 0).select(
            "flag", F.col("v").alias("qv"), F.col("cnt").alias("cq")
        )
        qrank = _with_rank2(
            qmarg.withColumn("qb", F.floor("qv").cast("long")), "qv", "qb", "cq"
        ).localCheckpoint(eager=True)
        mq = _mq(qrank)
        joint = marg.filter(F.col("_t") == 1).select(
            "flag", F.col("v").alias("pv"), F.col("qk").alias("qv"), "cnt"
        )
        pmarg = (
            joint.join(
                F.broadcast(
                    qrank.select("flag", "qv", F.col("rk2").alias("rx2"))
                ),
                ["flag", "qv"],
            )
            .groupBy("flag", "pv")
            .agg(
                F.sum("cnt").alias("cp"),
                F.sum(
                    F.col("cnt").cast("decimal(38,0)") * F.col("rx2")
                ).alias("sxp"),
            )
            .localCheckpoint(eager=True)
        )
        prank = _with_rank2(
            pmarg.withColumn("pb", F.floor("pv").cast("long")), "pv", "pb", "cp"
        )
        return _finish(mq, _mp(prank), r)

    def shape_C(spark, sf_dir):
        src = li(spark, sf_dir)
        qmarg = src.groupBy("flag", "qv").agg(F.count("*").alias("cq"))
        qrank = _with_rank2(
            qmarg.withColumn("qb", F.floor("qv").cast("long")), "qv", "qb", "cq"
        ).localCheckpoint(eager=True)
        mq = _mq(qrank)
        pmarg = (
            src.join(
                F.broadcast(
                    qrank.select("flag", "qv", F.col("rk2").alias("rx2"))
                ),
                ["flag", "qv"],
            )
            .groupBy("flag", "pv")
            .agg(
                F.count("*").alias("cp"),
                F.sum(F.col("rx2").cast("decimal(38,0)")).alias("sxp"),
            )
            .localCheckpoint(eager=True)
        )
        prank = _with_rank2_fused(
            pmarg.withColumn("pb", F.floor("pv").cast("long")), "pv", "pb", "cp"
        )
        return _finish(mq, _mp(prank), r)

    return shape_B, shape_C


def main():
    from etl_pipeline_4handling_listings_spark.queries import (
        REGISTRY,
        r,
        tbl,
    )
    from etl_pipeline_4handling_listings_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="ab_spearman",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    shape_B, shape_C = make_shapes(tbl, r)
    shape_A = REGISTRY["stats_spearman_corr"].fn
    shapes = {"A_committed": shape_A, "B_expand1": shape_B, "C_fusedrank": shape_C}

    # correctness first, at sf0.01
    ref = None
    for name, fn in shapes.items():
        rows = [tuple(x) for x in fn(spark, "/root/testdata/sf0.01").collect()]
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} differs: {rows} vs {ref}"
    print("identity check PASS at sf0.01", flush=True)

    # bench-faithful warm-up
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
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
