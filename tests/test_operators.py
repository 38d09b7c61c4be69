"""Unit tests for the core operator kernels on hand-built micro-frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.operators import (
    Rule,
    apply_rules,
    latest_record,
    merge_upsert,
    priority_top_k,
    split_valid,
)
from etl_pipeline_4handling_listings_spark.operators.dedup import (
    exact_dedup,
    superseded_records,
)
from etl_pipeline_4handling_listings_spark.operators.history import (
    changed_against_previous,
)
from etl_pipeline_4handling_listings_spark.operators.merge import unchanged_guard


def _listings(spark):
    # (mls, listing_id, as_of, price)
    return spark.createDataFrame(
        [
            ("A", "1", 1, 100.0),
            ("A", "1", 2, 110.0),
            ("A", "1", 3, 110.0),
            ("A", "2", 1, 50.0),
            ("B", "1", 5, 900.0),
        ],
        ["mls", "listing_id", "as_of", "price"],
    )


def test_latest_record_keeps_one_per_key(spark):
    df = _listings(spark)
    out = latest_record(df, ["mls", "listing_id"], [F.desc("as_of")])
    rows = {(r["mls"], r["listing_id"]): r["as_of"] for r in out.collect()}
    assert rows == {("A", "1"): 3, ("A", "2"): 1, ("B", "1"): 5}


def test_latest_record_carry_forward(spark):
    df = _listings(spark)
    out = latest_record(
        df,
        ["mls", "listing_id"],
        [F.desc("as_of")],
        carry_forward={"first_price": F.min("price"), "max_price": F.max("price")},
    )
    r = {(x["mls"], x["listing_id"]): x for x in out.collect()}
    assert r[("A", "1")]["first_price"] == 100.0
    assert r[("A", "1")]["max_price"] == 110.0


def test_superseded_records_complement(spark):
    df = _listings(spark)
    latest = latest_record(df, ["mls", "listing_id"], [F.desc("as_of")])
    outdated = superseded_records(df, ["mls", "listing_id"], [F.desc("as_of")])
    assert latest.count() + outdated.count() == df.count()
    assert outdated.count() == 2


def test_changed_against_previous_flags(spark):
    df = _listings(spark)
    out = changed_against_previous(
        df, ["mls", "listing_id"], ["as_of"], ["price"]
    ).collect()
    by = {(r["mls"], r["listing_id"], r["as_of"]): r for r in out}
    # first observation: old is NULL, counts as changed
    assert by[("A", "1", 1)]["price_old"] is None
    assert by[("A", "1", 1)]["price_changed_flag"] is True
    # price moved 100 -> 110: changed
    assert by[("A", "1", 2)]["price_old"] == 100.0
    assert by[("A", "1", 2)]["price_changed_flag"] is True
    # unchanged 110 -> 110: not changed, eligible for history DELETE
    assert by[("A", "1", 3)]["price_old"] == 110.0
    assert by[("A", "1", 3)]["price_changed_flag"] is False
    assert by[("A", "1", 3)]["_any_changed"] is False


def test_validation_rules_and_split(spark):
    df = spark.createDataFrame(
        [("A", 10.0), (None, 5.0), ("B", -1.0), (None, -2.0)], ["mls", "price"]
    )
    rules = [
        Rule("null_mls", F.col("mls").isNull(), "mls is null"),
        Rule("bad_price", F.col("price") < 0, "negative price"),
    ]
    flagged = apply_rules(df, rules)
    good, bad = split_valid(flagged, cache=False)
    assert good.count() == 1
    assert bad.count() == 3
    worst = bad.filter(F.col("_reject_flags") == 2).collect()
    assert len(worst) == 1
    assert worst[0]["_reject_reasons"] == "mls is null|negative price"


def test_merge_upsert_basic(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    once = merge_upsert(target, source, ["k"])
    twice = merge_upsert(once, source, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_delete_clause(spark):
    # history semantics: matched + unchanged -> delete (ref M2)
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(1, "a"), (2, "X")], ["k", "v"])
    out = merge_upsert(
        target,
        source,
        ["k"],
        update_condition=unchanged_guard(["v"]),
        delete_condition=lambda t, s: t["v"].eqNullSafe(s["v"]),
    )
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {2: "X"}  # key 1 deleted (unchanged), key 2 updated


def test_merge_narrow_source_star_semantics(spark):
    """Delta star-clause expansion for a source MISSING target
    columns (narrow pre-evolution writer into a widened table):
    UPDATE touches only the source's columns — the target's values
    carry for the rest — and INSERT fills the missing ones with
    NULL. Keys must be present (named error)."""
    import pytest as _pytest

    target = spark.createDataFrame(
        [(1, "a", 0.7), (2, "b", 0.2)], ["k", "v", "score"]
    )
    source = spark.createDataFrame([(1, "A"), (3, "c")], ["k", "v"])
    out = {
        r["k"]: (r["v"], r["score"])
        for r in merge_upsert(target, source, ["k"]).collect()
    }
    assert out == {1: ("A", 0.7), 2: ("b", 0.2), 3: ("c", None)}
    with _pytest.raises(ValueError, match="lacks key column"):
        merge_upsert(
            target, spark.createDataFrame([("x",)], ["v"]), ["k"]
        )


def test_merge_insert_condition(spark):
    target = spark.createDataFrame([(1, "a")], ["k", "v"])
    source = spark.createDataFrame([(2, "ok"), (3, "skip")], ["k", "v"])
    out = merge_upsert(
        target,
        source,
        ["k"],
        insert_condition=lambda t, s: s["v"] != "skip",
    )
    assert {r["k"] for r in out.collect()} == {1, 2}


def test_priority_top_k(spark):
    df = spark.createDataFrame(
        [(i, "HIGH" if i % 3 == 0 else "LOW") for i in range(30)], ["id", "prio"]
    )
    out = priority_top_k(
        df,
        order=[F.asc("p_num"), F.asc("id")],
        k=5,
        priority_exprs={"p_num": F.when(F.col("prio") == "HIGH", 0).otherwise(1)},
    ).collect()
    assert [r["id"] for r in out] == [0, 3, 6, 9, 12]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["id", "text"]
    )
    out = exact_dedup(df, F.md5("text"), [F.asc("id")])
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_merge_upsert_null_keys_match_nullsafe(spark):
    # MERGE keys join null-safely: a NULL key in source matches a
    # NULL key in target (update), not an insert of a duplicate
    target = spark.createDataFrame([(None, "old"), (1, "a")], "k INT, v STRING")
    source = spark.createDataFrame([(None, "NEW")], "k INT, v STRING")
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {None: "NEW", 1: "a"}


def test_budget_select_matches_naive_prefix(spark):
    """budget_select == the naive global-cumsum prefix rule, across
    budgets that land inside full buckets, mid-bucket, and past the
    total; weights include zeros and bucket-straddling order keys."""
    import random

    from pyspark.sql import Window

    from etl_pipeline_4handling_listings_spark.operators.sampling import (
        budget_select,
    )

    rng = random.Random(7)
    rows = [
        (i, round(rng.random(), 4), rng.choice([0, 1, 3, 10, 25]))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id INT, q DOUBLE, w INT")
    order = [F.desc("q"), F.asc("id")]
    naive_w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for budget in (0, 37, 250, 999, 10**6):
        got = sorted(
            r.id
            for r in budget_select(
                df, order, "w", budget, bucket=F.floor(F.col("q") * 10)
            ).collect()
        )
        want = sorted(
            r.id
            for r in df.withColumn("_c", F.sum("w").over(naive_w))
            .filter(F.col("_c") <= budget)
            .collect()
        )
        assert got == want, f"budget={budget}"


def test_keyed_prefix_sum_matches_naive(spark):
    """Two-level scan == naive global window, across sparse keys,
    bucket-boundary keys, and zero values; small bucket_size forces
    many buckets."""
    import random

    from pyspark.sql import Window

    from etl_pipeline_4handling_listings_spark.operators.prefix import (
        keyed_prefix_sum,
    )

    rng = random.Random(11)
    keys = sorted(rng.sample(range(0, 5000), 400)) + [8192, 8193, 16384]
    rows = [(k, rng.choice([0, 1, 7, 50])) for k in keys]
    df = spark.createDataFrame(rows, "k LONG, w LONG")
    got = {
        r.k: r.prefix_excl
        for r in keyed_prefix_sum(
            df, key="k", value_col="w", bucket_size=64
        ).collect()
    }
    naive = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: r.p
        for r in df.select(
            "k", F.coalesce(F.sum("w").over(naive), F.lit(0)).alias("p")
        ).collect()
    }
    assert got == want


def test_keyed_prefix_max_matches_naive(spark):
    """Exclusive running max == naive global window (null for the
    first row), across sparse keys, bucket boundaries, and
    non-monotone values; small bucket_size forces many buckets."""
    import random

    from pyspark.sql import Window

    from etl_pipeline_4handling_listings_spark.operators.prefix import (
        keyed_prefix_max,
    )

    rng = random.Random(13)
    keys = sorted(rng.sample(range(0, 5000), 400)) + [8192, 8193, 16384]
    rows = [(k, rng.randrange(-100, 100)) for k in keys]
    df = spark.createDataFrame(rows, "k LONG, w LONG")
    got = {
        r.k: r.prefix_max
        for r in keyed_prefix_max(
            df, key="k", value_col="w", bucket_size=64
        ).collect()
    }
    naive = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: r.p
        for r in df.select(
            "k", F.max("w").over(naive).alias("p")
        ).collect()
    }
    assert got == want
    assert want[min(want)] is None  # first arrival faced no watermark


def test_association_rules_metrics_and_megabasket_guard(spark):
    from etl_pipeline_4handling_listings_spark.operators.assoc import (
        association_rules,
    )

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "bk INT, item STRING")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "bk", "item", top_n=10).collect()
    }
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2 and ab["n_baskets"] == 4
    assert ab["count_a"] == 3 and ab["count_b"] == 3
    assert abs(ab["support"] - 0.5) < 1e-12
    assert abs(ab["conf_a_to_b"] - 2 / 3) < 1e-12
    assert abs(ab["lift"] - 2 * 4 / 9) < 1e-12

    # a degenerate mega-basket must be dropped, not exploded
    mega = [(99, f"i{i}") for i in range(50)]
    df2 = spark.createDataFrame(rows + mega, "bk INT, item STRING")
    guarded = association_rules(df2, "bk", "item", top_n=100, max_basket=10)
    items = {
        (r["item_a"], r["item_b"]) for r in guarded.collect()
    }
    assert items == set(out)  # mega-basket contributed nothing


def test_expectations_single_pass_and_referential(spark):
    from etl_pipeline_4handling_listings_spark.operators.expectations import (
        expect_between,
        expect_in_set,
        expect_not_null,
        expect_unique,
        referential_integrity,
        run_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (None, "z", 50.0)],
        "k INT, s STRING, v DOUBLE",
    )
    rep = {
        r["constraint"]: r
        for r in run_expectations(
            df,
            [
                expect_not_null("k"),
                expect_unique("k"),
                expect_between("v", 0, 10),
                expect_in_set("s", ["a", "b"]),
            ],
        ).collect()
    }
    assert rep["k_not_null"]["violations"] == 1
    assert not rep["k_not_null"]["passed"]
    # countDistinct ignores the null key: 3 rows - 1 distinct = 2
    assert rep["k_unique"]["violations"] == 2
    assert rep["v_between"]["violations"] == 2  # -2 and 50
    assert rep["s_in_set"]["violations"] == 1  # "z"
    assert all(r["n_rows"] == 3 for r in rep.values())

    ref = spark.createDataFrame([(1,)], "rk INT")
    row = referential_integrity(df, "k", ref, "rk").collect()[0]
    assert row["kind"] == "referential"
    assert row["violations"] == 0 and row["passed"]  # null key skipped

    # orphans are counted per ROW, nulls excluded, report lazy
    df2 = spark.createDataFrame(
        [(1,), (9, ), (9,), (None,)], "k INT"
    )
    row2 = referential_integrity(df2, "k", ref, "rk").collect()[0]
    assert row2["n_rows"] == 4
    assert row2["violations"] == 2 and not row2["passed"]

    # empty expectation list -> empty report, valid schema
    empty = run_expectations(df, [])
    assert empty.count() == 0
    assert empty.columns == [
        "constraint", "kind", "n_rows", "violations", "passed"
    ]

    # a quoted column name must not break the stack() SQL
    dfq = spark.createDataFrame([(1,)], ["it's_col"])
    rep_q = run_expectations(dfq, [expect_not_null("`it's_col`")]).collect()
    assert len(rep_q) == 1 and rep_q[0]["violations"] == 0


def test_skyline_2d_double_minimize_column(spark):
    """ADVICE round-4: the strict-preceding frame is rank-based, so
    double-typed minimize columns are exact — a dominator within
    (x-1, x) of the old value-offset frame must now eliminate the
    dominated row."""
    from etl_pipeline_4handling_listings_spark.operators.skyline import (
        skyline_2d,
    )

    rows = [
        (1.0, 10),   # frontier
        (1.5, 5),    # dominated by (1.0, 10): within (x-1, x) of it
        (2.0, 20),   # frontier
        (2.5, 20),   # dominated (same max, higher min)
        (3.0, 30),   # frontier
    ]
    df = spark.createDataFrame(rows, "cost DOUBLE, value LONG")
    got = sorted(
        (r["cost"], r["value"])
        for r in skyline_2d(df, "cost", "value").collect()
    )
    assert got == [(1.0, 10), (2.0, 20), (3.0, 30)]


def test_session_caches_invalidate_on_input_rewrite(spark, tmp_path):
    """The session-materialized shared frames (_tokens,
    _copresence_edges_cached) are keyed on the input's mtime
    fingerprint: same input -> the SAME checkpointed frame (no
    rebuild), rewritten input -> a fresh build. A stale cache here
    would be silent wrong results, so the contract gets a test."""
    import shutil
    import time as _time

    import etl_pipeline_4handling_listings_spark.queries as Q

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    for t in ("documents", "events"):
        p = os.path.join(src, f"{t}.parquet")
        if os.path.isdir(p):
            shutil.copytree(p, os.path.join(d, f"{t}.parquet"))
        else:
            shutil.copy(p, os.path.join(d, f"{t}.parquet"))

    t1 = Q._tokens(spark, d)
    assert Q._tokens(spark, d) is t1  # cache hit
    n1 = t1.count()

    # rewrite the input with a strict subset; bump mtime past fs
    # timestamp granularity
    sub = spark.read.parquet(os.path.join(d, "documents.parquet")).limit(5)
    pdf = sub.toPandas()
    shutil.rmtree(
        os.path.join(d, "documents.parquet"), ignore_errors=True
    )
    try:
        os.remove(os.path.join(d, "documents.parquet"))
    except OSError:
        pass
    _time.sleep(0.01)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    t2 = Q._tokens(spark, d)
    assert t2 is not t1  # fingerprint changed -> rebuild
    assert t2.count() < n1

    e1 = Q._copresence_edges_cached(spark, d)
    assert Q._copresence_edges_cached(spark, d) is e1
