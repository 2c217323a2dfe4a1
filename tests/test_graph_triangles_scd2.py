"""Degree-ordered triangle counting and SCD2 interval build:
brute-force differentials (hypothesis), hub-graph exactness, null-safe
attribute runs."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ophidia_io_server_spark.operators.graph import triangle_counts
from ophidia_io_server_spark.operators.temporal import scd2_intervals


def _brute_triangles(edge_set):
    nodes = sorted({n for e in edge_set for n in e})
    es = {frozenset(e) for e in edge_set}
    counts = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if ({frozenset((a, b)), frozenset((a, c)), frozenset((b, c))} <= es):
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=30))
def test_triangles_match_brute_force(spark, edges):
    df = spark.createDataFrame([(f"n{a}", f"n{b}") for a, b in edges],
                               "src string, dst string")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    want = {f"n{n}": c for n, c in
            _brute_triangles({(a, b) for a, b in edges}).items()}
    assert got == want


def test_triangles_hub_and_duplicate_edges(spark):
    # star K1,5 has no triangles; adding one rim edge makes exactly one.
    rows = [("h", f"r{i}") for i in range(5)] + [("r0", "r1"), ("r1", "r0")]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {"h": 1, "r0": 1, "r1": 1, "r2": 0, "r3": 0, "r4": 0}


def _brute_scd2(events):
    """events: list of (ts, attr) for one key, ts unique."""
    evs = sorted(events)
    runs = []
    for ts, a in evs:
        if runs and runs[-1][2] == a:
            runs[-1][1] += 1
        else:
            runs.append([ts, 1, a])
    out = []
    for i, (vf, n, a) in enumerate(runs):
        vt = runs[i + 1][0] if i + 1 < len(runs) else None
        out.append((a, vf, vt, n, vt is None))
    return sorted(out, key=lambda r: r[1])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.one_of(st.none(), st.integers(0, 2)),
                     min_size=1, max_size=25))
def test_scd2_matches_reference(spark, vals):
    events = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame([(1, ts, v) for ts, v in events],
                               "k long, ts long, a integer")
    got = sorted(
        ((r["a"], r["valid_from"], r["valid_to"], r["n_events"],
          r["is_current"]) for r in
         scd2_intervals(df, ["k"], "ts", "a").collect()),
        key=lambda r: r[1])
    assert [tuple(g) for g in got] == _brute_scd2(events)


def test_scd2_keys_isolated(spark):
    df = spark.createDataFrame(
        [(1, 0, "x"), (1, 5, "y"), (2, 3, "x")], "k long, ts long, a string")
    got = {(r["k"], r["a"]): (r["valid_from"], r["valid_to"], r["is_current"])
           for r in scd2_intervals(df, ["k"], "ts", "a").collect()}
    assert got[(1, "x")] == (0, 5, False)
    assert got[(1, "y")] == (5, None, True)
    assert got[(2, "x")] == (3, None, True)
