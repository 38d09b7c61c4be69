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
