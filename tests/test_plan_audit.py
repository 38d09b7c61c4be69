"""Plan-regression guard: physical-plan invariants, asserted in CI.

Keeps future changes honest: no CartesianProduct or row-at-a-time
BatchEvalPython anywhere in the registry, pushed filters stay
pushed, dimension joins stay broadcast, top-k stays
TakeOrderedAndProject. Runs at sf0.001 — plan SHAPE is what is
asserted, and it does not change with scale factor here.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.plan_audit import AUDIT, audit_all, audit_query  # noqa: E402


def test_headline_plan_expectations(spark, sf_dir):
    failures = audit_all(spark, sf_dir, names=list(AUDIT))
    assert not failures, f"plan red flags: {failures}"


def test_registry_global_plan_invariants(spark, sf_dir):
    # every query: no CartesianProduct, no BatchEvalPython
    failures = audit_all(spark, sf_dir)
    assert not failures, f"plan red flags: {failures}"


def test_audit_catches_cartesian(spark, sf_dir):
    # the guard itself must be live: a deliberate cartesian plan
    # would be flagged by the same patterns
    import re

    from tools.plan_audit import _plan_string

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast so the cross join cannot degrade
        # gracefully into BroadcastNestedLoopJoin
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.range(100)
        b = spark.range(100).withColumnRenamed("id", "id2")
        plan = _plan_string(spark, a.crossJoin(b))
        assert re.search("CartesianProduct", plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
