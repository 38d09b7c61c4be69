"""Property-based invariants for the core kernels (hypothesis).

SURVEY §5.4: the dedup window always keeps exactly one row per key
(and it is the maximum under the ordering); MERGE is idempotent.
Example counts are kept small — every example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_4handling_listings_spark.operators.dedup import latest_record
from etl_pipeline_4handling_listings_spark.operators.merge import merge_upsert

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),  # key
        st.integers(min_value=0, max_value=20),  # ord
        st.integers(min_value=-5, max_value=5),  # val
    ),
    min_size=1,
    max_size=12,
)


@given(rows=rows_strategy)
@settings(
    max_examples=15, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_latest_record_invariant(spark_sess, rows):
    # make the ordering total by adding a unique row id tiebreak
    rows = [(k, o, v, i) for i, (k, o, v) in enumerate(rows)]
    df = spark_sess.createDataFrame(rows, ["k", "o", "v", "rid"])
    out = latest_record(df, ["k"], [F.desc("o"), F.desc("rid")]).collect()
    keys = [r["k"] for r in out]
    # exactly one row per distinct key
    assert sorted(keys) == sorted({k for k, *_ in rows})
    # and it is the max under (o, rid)
    for r in out:
        best = max(
            ((o, rid) for k, o, v, rid in rows if k == r["k"]),
        )
        assert (r["o"], r["rid"]) == best


unique_kv = st.dictionaries(
    st.integers(min_value=0, max_value=8),
    st.sampled_from(["x", "y", "z"]),
    min_size=0,
    max_size=6,
)


@given(target=unique_kv, source=unique_kv)
@settings(
    max_examples=15, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_merge_upsert_semantics_and_idempotency(spark_sess, target, source):
    tdf = spark_sess.createDataFrame(
        list(target.items()) or [(None, None)], "k INT, v STRING"
    )
    sdf = spark_sess.createDataFrame(
        list(source.items()) or [(None, None)], "k INT, v STRING"
    )
    if not target:
        tdf = tdf.filter("k IS NOT NULL")
    if not source:
        sdf = sdf.filter("k IS NOT NULL")
    once = merge_upsert(tdf, sdf, ["k"])
    got = {r["k"]: r["v"] for r in once.collect()}
    assert got == {**target, **source}
    twice = merge_upsert(once, sdf, ["k"])
    assert {r["k"]: r["v"] for r in twice.collect()} == got


import pytest


@pytest.fixture(scope="module")
def spark_sess(spark):
    return spark


# ---------------------------------------------------------------------
# Differential tests: as-of join vs a brute-force reference, range
# join vs a brute-force reference — random data, independent model.
# ---------------------------------------------------------------------

asof_left = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=10,
)
asof_right = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-9, max_value=9),
    ),
    min_size=0,
    max_size=10,
)


@given(left=asof_left, right=asof_right)
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_asof_join_matches_bruteforce(spark_sess, left, right):
    from etl_pipeline_4handling_listings_spark.operators.asof import asof_join

    lrows = [(k, t, i) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, v, 1000 + i) for i, (k, t, v) in enumerate(right)]
    ldf = spark_sess.createDataFrame(lrows, "k STRING, ts LONG, lid LONG")
    rdf = spark_sess.createDataFrame(rrows, "k STRING, rts LONG, rv LONG, rid LONG")
    out = {
        r["lid"]: (r["mts"], r["rv"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
            value_cols=["rv"], tiebreak="rid", matched_ts_col="mts",
        ).collect()
    }
    for k, t, lid in lrows:
        # brute-force reference: greatest (rts, rid) with rts <= t
        cands = [(rt, rid, rv) for rk, rt, rv, rid in rrows if rk == k and rt <= t]
        if cands:
            brt, brid, brv = max((rt, rid, rv) for rt, rid, rv in cands)
            assert out[lid] == (brt, brv)
        else:
            assert out[lid] == (None, None)


ivals = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=15),  # width
    ),
    min_size=0,
    max_size=8,
)


@given(points=asof_left, intervals=ivals, bin_width=st.sampled_from([1, 4, 9, 64]))
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_range_join_matches_bruteforce(spark_sess, points, intervals, bin_width):
    from etl_pipeline_4handling_listings_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    prows = [(k, t, i) for i, (k, t) in enumerate(points)]
    irows = [(k, s, s + w, 100 + i) for i, (k, s, w) in enumerate(intervals)]
    pdf = spark_sess.createDataFrame(prows, "k STRING, t LONG, pid LONG")
    idf = spark_sess.createDataFrame(irows, "k STRING, s LONG, e LONG, iid LONG")
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            pdf, idf, on=["k"], point_col="t", start_col="s",
            end_col="e", bin_width=bin_width,
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for k, t, pid in prows
        for ik, s, e, iid in irows
        if ik == k and s <= t <= e
    )
    assert got == want


def test_money_sums_partition_invariant(spark_sess):
    """The cents-hardening invariant: repartitioning the input (which
    reorders partial aggregation) must not move any money sum — the
    per-row integer-cents floor makes SUM exact in any order. A raw
    double SUM fails this test at some partition count eventually."""
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    for name in [
        "q1_pricing_summary",
        "q9_product_profit",
        "events_hourly_rollup",
        # round-3 statistics: per-cell/per-row integer quantization
        # BEFORE any sum is exactly what this test certifies
        "stats_chi2_assoc",
        "agg_weighted_median",
        "stats_corr_matrix",
        "embedding_cluster_quality",
        # integer half-rank / n*cum-idx*tot formulations: partial-agg
        # order must never move the statistic
        "stats_mannwhitney_u",
        "events_cusum_shift",
        "stats_ks_test",
        # sweep-line + classification kernels: exact-integer claims
        "events_concurrent_sessions",
        "abc_classification",
        "fairshare_waterfill",
        # round-8: doubled average ranks make all five Spearman
        # moments exact integers — the final division is the only
        # float and must not move with partial-agg order
        "stats_spearman_corr",
    ]:
        fn = REGISTRY[name].fn
        base = sorted(map(tuple, fn(spark_sess, sf).collect()))
        old = spark_sess.conf.get("spark.sql.shuffle.partitions")
        try:
            for parts in ["1", "7"]:
                spark_sess.conf.set("spark.sql.shuffle.partitions", parts)
                again = sorted(map(tuple, fn(spark_sess, sf).collect()))
                assert again == base, f"{name} drifted at {parts} partitions"
        finally:
            spark_sess.conf.set("spark.sql.shuffle.partitions", old)


def test_driver_order_hygiene():
    """_DRIVER_ORDER is the driver-certification contract: it must
    cover the registry exactly (no dups, no strays) and keep the
    round-12 rotation's certification window intact: the r11 window
    went green on the last 2 never-certified names, so the registry
    is FULLY driver-certified and all 50 slots are re-observation of
    already-certified names (stalest evidence first, per
    rotate_registry.py). Any later registry additions (no ledger
    rows at all) sit BEHIND slot 50 so they never displace
    certification slots."""
    import glob
    import json
    import os

    from etl_pipeline_4handling_listings_spark.queries import (
        _DRIVER_ORDER,
        REGISTRY,
    )

    assert len(_DRIVER_ORDER) == len(set(_DRIVER_ORDER)), "duplicate names"
    assert sorted(_DRIVER_ORDER) == sorted(REGISTRY)
    assert list(REGISTRY) == _DRIVER_ORDER, "registry iteration order drifted"
    # certified = GREEN rows only (same rule as tools/rotate_registry):
    # the ledgers record failures too, and a red row must be ELIGIBLE
    # for the window (that's how it gets re-observed), not excluded
    certified = set()
    observed = set()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # two-digit round numbers sort lexically only because r01-r09 are
    # zero-padded; keep the numeric sort explicit so r10+ is reached
    ledgers = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
        key=lambda p: int(
            "".join(c for c in os.path.basename(p) if c.isdigit())
        ),
    )
    for ledger in ledgers:
        with open(ledger) as f:
            for name, row in json.load(f).items():
                observed.add(name)
                if all(
                    row.get(k)
                    for k in ("rows_match", "schema_match", "hash_match")
                ):
                    certified.add(name)
    # zero backlog after the green r11 window: every window slot is
    # re-observation of a certified name
    assert certified >= set(REGISTRY), (
        "registry no longer fully certified: "
        f"{set(REGISTRY) - certified}"
    )
    for name in _DRIVER_ORDER[:50]:
        assert name in certified, (
            f"uncertified name {name!r} in the re-observation slots"
        )
    # later additions (never in any ledger) stay behind slot 50
    fresh = set(REGISTRY) - observed
    ahead = fresh & set(_DRIVER_ORDER[:50])
    assert not ahead, f"fresh queries inside the window: {ahead}"


def test_textrank_gate_paths_agree(spark_sess, monkeypatch):
    """The size-gated TextRank paths — single-task Arrow kernel
    below the gate, distributed power iteration above it — must
    produce IDENTICAL quantized ranks for the same pair aggregate
    (the 1e-9 floor grid at every step makes the fixpoint
    trajectory engine- and path-independent), and the gate dispatch
    in the registry query must be result-invariant."""
    import random

    from etl_pipeline_4handling_listings_spark.queries import (
        REGISTRY,
        _textrank_ranks_distributed,
        _textrank_ranks_kernel,
    )

    rng = random.Random(42)
    words = [f"w{i:02d}" for i in range(40)]
    rows, seen = [], set()
    while len(rows) < 120:
        a, b = rng.sample(words, 2)
        wa, wb = min(a, b), max(a, b)
        if (wa, wb) in seen:
            continue
        seen.add((wa, wb))
        rows.append((wa, wb, float(rng.randint(1, 5))))
    und = spark_sess.createDataFrame(
        rows, "wa string, wb string, c double"
    ).localCheckpoint(eager=True)
    k = sorted(map(tuple, _textrank_ranks_kernel(und).collect()))
    d = sorted(map(tuple, _textrank_ranks_distributed(und).collect()))
    assert k == d
    # end-to-end: forcing the gate to 0 pairs flips the registry
    # query onto the distributed path; the declared result must not
    # move (this graph spans the gate in both directions)
    sf = "/root/testdata/sf0.001"
    fn = REGISTRY["textrank_keywords"].fn
    base = [tuple(r) for r in fn(spark_sess, sf).collect()]
    monkeypatch.setenv("SPARK_GRAFT_TEXTRANK_GATE", "0")
    forced = [tuple(r) for r in fn(spark_sess, sf).collect()]
    assert forced == base


token_sets = st.lists(
    st.lists(
        st.sampled_from(list("abcdefgh")), min_size=1, max_size=8
    ),
    min_size=2,
    max_size=8,
)


@given(sets=token_sets, threshold=st.sampled_from([0.3, 0.5, 0.8]))
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_prefix_filter_jaccard_matches_bruteforce(spark_sess, sets, threshold):
    """PPJoin prefix filtering must return EXACTLY the brute-force
    Jaccard pairs at any threshold — filtering is lossless."""
    from etl_pipeline_4handling_listings_spark.operators.setsim import (
        prefix_filter_jaccard_pairs,
    )

    rows = [(i, list(s)) for i, s in enumerate(sets)]
    expected = set()
    dedup = [(i, set(s)) for i, s in rows]
    for i, a in dedup:
        for j, b in dedup:
            if i < j and a and b:
                jac = len(a & b) / len(a | b)
                if jac >= threshold:
                    expected.add((i, j, round(jac, 9)))
    df = spark_sess.createDataFrame(rows, ["doc_id", "toks"])
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", F.col("toks"), threshold=threshold
        ).collect()
    }
    assert got == expected


value_lists = st.lists(
    st.floats(min_value=0.0, max_value=500.0, allow_nan=False,
              allow_infinity=False),
    min_size=0,
    max_size=40,
)


@given(a=value_lists, b=value_lists)
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_histogram_merge_law(spark_sess, a, b):
    """value_histogram(A ∪ B) == merge(hist(A), hist(B)) — the
    mergeable-state law the streaming PSI monitor relies on."""
    from etl_pipeline_4handling_listings_spark.operators.drift import (
        merge_histograms,
        value_histogram,
    )

    schema = "v DOUBLE"
    df_a = spark_sess.createDataFrame([(float(x),) for x in a], schema)
    df_b = spark_sess.createDataFrame([(float(x),) for x in b], schema)
    df_ab = spark_sess.createDataFrame(
        [(float(x),) for x in a + b], schema
    )
    merged = merge_histograms(
        value_histogram(df_a, "v"), value_histogram(df_b, "v")
    )
    whole = value_histogram(df_ab, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


basket_lists = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from("abcdef")),
    min_size=0,
    max_size=30,
)


@given(rows=basket_lists)
@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_association_rules_match_bruteforce(spark_sess, rows):
    """Pair/item counts and metrics equal an itertools brute force."""
    import itertools

    from etl_pipeline_4handling_listings_spark.operators.assoc import (
        association_rules,
    )

    df = spark_sess.createDataFrame(
        [(b, i) for b, i in rows] or [(0, "a")], "bk INT, item STRING"
    )
    data = set(rows) or {(0, "a")}
    baskets = {}
    for b, i in data:
        baskets.setdefault(b, set()).add(i)
    pair_counts = {}
    for items in baskets.values():
        for x, y in itertools.combinations(sorted(items), 2):
            pair_counts[(x, y)] = pair_counts.get((x, y), 0) + 1
    item_counts = {}
    for items in baskets.values():
        for i in items:
            item_counts[i] = item_counts.get(i, 0) + 1
    nb = len(baskets)

    out = association_rules(df, "bk", "item", top_n=1000).collect()
    got = {(r["item_a"], r["item_b"]): r for r in out}
    assert set(got) == set(pair_counts)
    for (x, y), r in got.items():
        c = pair_counts[(x, y)]
        assert r["pair_count"] == c
        assert r["count_a"] == item_counts[x]
        assert r["count_b"] == item_counts[y]
        assert r["n_baskets"] == nb
        assert abs(r["support"] - c / nb) < 1e-12
        assert abs(r["conf_a_to_b"] - c / item_counts[x]) < 1e-12
        assert abs(r["lift"] - c * nb / (item_counts[x] * item_counts[y])) < 1e-9


skyline_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=20),  # price
        st.integers(min_value=1, max_value=10),  # size
    ),
    min_size=1,
    max_size=15,
)


@given(rows=skyline_rows)
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_pareto_frontier_matches_bruteforce(spark_sess, rows, tmp_path_factory):
    """Window-skyline == quadratic domination brute force. The query
    reads a `part` table, so each example writes a miniature one."""
    import uuid

    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    sf_dir = str(tmp_path_factory.mktemp("sky") / uuid.uuid4().hex)
    parts = [
        (i, "n", "b", "t", size, float(price))
        for i, (price, size) in enumerate(rows)
    ]
    spark_sess.createDataFrame(
        parts,
        "p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING,"
        " p_size INT, p_retailprice DOUBLE",
    ).write.parquet(f"{sf_dir}/part.parquet")

    got = sorted(
        r["p_partkey"]
        for r in REGISTRY["pareto_frontier_parts"].fn(
            spark_sess, sf_dir
        ).collect()
    )
    # the distributed operator must agree under ANY partitioning
    from etl_pipeline_4handling_listings_spark.operators.skyline import (
        skyline_2d,
    )

    base = spark_sess.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey",
        F.col("p_retailprice").cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    for parts in (1, 3, 7):
        alt = sorted(
            r["p_partkey"]
            for r in skyline_2d(
                base.repartition(parts), "price_c", "size"
            ).collect()
        )
        assert alt == got, f"skyline drifted at {parts} partitions"
    want = sorted(
        i
        for i, (price, size) in enumerate(rows)
        if not any(
            (p2 <= price and s2 >= size and (p2 < price or s2 > size))
            for j, (p2, s2) in enumerate(rows)
            if j != i
        )
    )
    assert got == want


def test_fairshare_waterfill_conserves_capacity(spark_sess):
    """Water-filling invariants on real data: allocations never
    exceed demand, saturated tenants all sit at the level, and the
    allocation total equals capacity (half of total demand) up to
    the output quantization."""
    from etl_pipeline_4handling_listings_spark.queries import REGISTRY

    rows = REGISTRY["fairshare_waterfill"].fn(
        spark_sess, "/root/testdata/sf0.001"
    ).collect()
    total_demand = sum(r["demand"] for r in rows)
    capacity = total_demand // 2
    assert all(r["allocation"] <= r["demand"] + 1e-9 for r in rows)
    levels = {r["allocation"] for r in rows if r["saturated"]}
    assert len(levels) <= 1  # every saturated tenant gets the level
    got = sum(r["allocation"] for r in rows)
    assert abs(got - capacity) <= 1e-4 * len(rows)


member_groups = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=30),
        min_size=0, max_size=12, unique=True,
    ),
    min_size=1, max_size=5,
)


@given(groups=member_groups, cap=st.sampled_from([3, 8, 1000]))
@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_member_pairs_matches_bruteforce(spark_sess, groups, cap):
    """member_pairs == per-group C(n,2) combinations over sorted
    distinct members, with groups above max_cell dropped entirely —
    for ANY group mix and cap."""
    from itertools import combinations

    from etl_pipeline_4handling_listings_spark.operators.graph import (
        member_pairs,
    )

    df = spark_sess.createDataFrame(
        [(i, sorted(g)) for i, g in enumerate(groups)],
        "g LONG, us ARRAY<BIGINT>",
    )
    got = sorted(
        (r["u"], r["v"])
        for r in member_pairs(df, "us", max_cell=cap).collect()
    )
    want = sorted(
        p
        for g in groups
        if len(g) <= cap
        for p in combinations(sorted(g), 2)
    )
    assert got == want


# ---------------------------------------------------------------------
# Model-based store lifecycle: random merge / delete (merge-on-read
# and copy-on-write) / optimize sequences against a dict model. One
# property subsumes a family of hand-written interleave tests: after
# ANY op sequence, read() equals the model, fsck() is silent, and a
# raw scan never resurrects soft-deleted rows after a purge.
# ---------------------------------------------------------------------

_store_op = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.sampled_from(["a", "b", "c", "d"]),
            ),
            min_size=1,
            max_size=5,
        ),
    ),
    st.tuples(
        st.just("delete_mor"),
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(
        st.just("delete_cow"),
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(
        st.just("update_mor"),
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(
        st.just("update_cow"),
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.sampled_from(["x", "y"]),
            ),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("optimize"), st.just(None)),
)


@given(
    ops=st.lists(_store_op, min_size=1, max_size=5),
    partitioned=st.booleans(),
)
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_store_lifecycle_matches_model(spark_sess, tmp_path, ops, partitioned):
    import uuid as _uuid

    from etl_pipeline_4handling_listings_spark.sources.store import MergeStore

    path = str(tmp_path / _uuid.uuid4().hex)
    pby = "p" if partitioned else None
    store = MergeStore(spark_sess, path, keys=["k"], partition_by=pby)

    def frame(rows):
        data = [
            (k, v) + ((k % 2,) if partitioned else ())
            for k, v in rows
        ]
        cols = ["k", "v"] + (["p"] if partitioned else [])
        return spark_sess.createDataFrame(data, cols)

    # model: key -> list of row values. Blind append can duplicate a
    # key (its documented contract), so the model is a per-key
    # MULTISET; merge/update act on every copy (each matched target
    # row joins the one source row), delete drops them all.
    model: dict = {}
    store.create_if_absent(frame([(0, "a")]))
    for op, arg in ops:
        if op == "merge":
            # merge's contract is one source row per key (W1 dedup is
            # the caller's job) — collapse the drawn batch last-wins
            uniq = {}
            for k, v in arg:
                uniq[k] = v
            store.merge(frame(list(uniq.items())))
            for k, v in uniq.items():
                n = len(model.get(k, []))
                model[k] = [v] * max(n, 1)
        elif op == "append":
            store.append(frame(arg))
            for k, v in arg:
                model.setdefault(k, []).append(v)
        elif op in ("delete_mor", "delete_cow"):
            cond = f"k in ({', '.join(str(k) for k in set(arg))})"
            store.delete(cond, rewrite=(op == "delete_cow"))
            for k in arg:
                model.pop(k, None)
        elif op in ("update_mor", "update_cow"):
            cond = f"k in ({', '.join(str(k) for k in set(arg))})"
            store.update(
                cond, {"v": "'u'"}, rewrite=(op == "update_cow")
            )
            for k in set(arg) & set(model):
                model[k] = ["u"] * len(model[k])
        else:
            store.optimize(min_files=2, purge=True)

    got = sorted((r["k"], r["v"]) for r in store.read().collect())
    want = sorted((k, v) for k, vs in model.items() for v in vs)
    assert got == want
    assert store.fsck() == []
