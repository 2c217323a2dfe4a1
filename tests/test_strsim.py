"""PassJoin edit-distance self-join: brute-force Levenshtein
differential (hypothesis — this is the candidate-COMPLETENESS proof the
pigeonhole argument needs), short-string degeneracy, duplicate-value
collapse, and the no-cartesian plan guard."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ophidia_io_server_spark.pipeline.strsim import edit_distance_self_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(vals, tau):
    vs = sorted(set(vals))
    out = []
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            d = _lev(a, b)
            if d <= tau:
                out.append((a, b, d))
    return sorted(out)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    # "é" pins codepoint (not byte) semantics end-to-end: the python
    # reference DP is codepoint-based, and Spark's length/substr/
    # levenshtein must agree on the multi-byte character
    vals=st.lists(st.text(alphabet="abé", min_size=0, max_size=9),
                  min_size=1, max_size=25),
    tau=st.integers(1, 3),
)
def test_passjoin_matches_brute_force(spark, vals, tau):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = sorted((r["a"], r["b"], r["dist"])
                 for r in edit_distance_self_join(df, "s", tau).collect())
    assert got == _brute(vals, tau)


def test_passjoin_short_strings_and_duplicates(spark):
    # strings shorter than tau+1 ride the zero-length-segment fallback;
    # duplicate values collapse (no dist-0 pairs)
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("",), ("ab",), ("abcd",)], "s string")
    got = sorted((r["a"], r["b"], r["dist"])
                 for r in edit_distance_self_join(df, "s", 2).collect())
    assert got == _brute(["a", "b", "", "ab", "abcd"], 2)


def test_passjoin_rejects_tau_zero(spark):
    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ValueError):
        edit_distance_self_join(df, "s", 0)


def test_passjoin_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(f"w{i:04d}",) for i in range(300)], "s string")
    out = edit_distance_self_join(df, "s", 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 0 or out.count() > 0  # executes
