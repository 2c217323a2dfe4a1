"""Gap-fill + linear interpolation: pure-python reference differential
(hypothesis over random sparse observations), edge semantics (LOCF tail,
NOCB head, all-obs, single-obs), and per-key window isolation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ophidia_io_server_spark.operators.timeseries import gap_fill_interpolate


def _ref_fill(obs: dict[int, float], n: int):
    """obs: idx -> value.  Returns [(idx, filled, kind)]."""
    idxs = sorted(obs)
    out = []
    for i in range(n):
        if i in obs:
            out.append((i, obs[i], "obs"))
            continue
        prev = max((j for j in idxs if j < i), default=None)
        nxt = min((j for j in idxs if j > i), default=None)
        if prev is not None and nxt is not None:
            frac = (i - prev) / (nxt - prev)
            out.append((i, obs[prev] + (obs[nxt] - obs[prev]) * frac, "interp"))
        elif prev is not None:
            out.append((i, obs[prev], "locf"))
        else:
            out.append((i, obs[nxt], "nocb"))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(obs=st.dictionaries(st.integers(0, 19),
                           st.floats(-100, 100, allow_nan=False, width=32),
                           min_size=1, max_size=10))
def test_gapfill_matches_reference(spark, obs):
    df = spark.createDataFrame([(1, i, float(v)) for i, v in obs.items()],
                               "k long, idx long, v double")
    got = {r["idx"]: (r["v_filled"], r["fill_kind"])
           for r in gap_fill_interpolate(df, ["k"], "idx", "v", 20).collect()}
    for i, want_v, want_kind in _ref_fill({i: float(v) for i, v in obs.items()}, 20):
        assert got[i][1] == want_kind, (i, got[i], want_kind)
        assert abs(got[i][0] - want_v) < 1e-9, (i, got[i], want_v)


def test_gapfill_rejects_nonpositive_steps(spark):
    import pytest

    df = spark.createDataFrame([(1, 0, 1.0)], "k long, idx long, v double")
    with pytest.raises(ValueError):
        gap_fill_interpolate(df, ["k"], "idx", "v", 0)


def test_gapfill_keys_isolated_and_passthrough(spark):
    df = spark.createDataFrame(
        [(1, 0, 10.0, "a"), (1, 3, 40.0, "b"), (2, 2, 5.0, "c")],
        "k long, idx long, v double, tag string")
    out = gap_fill_interpolate(df, ["k"], "idx", "v", 4).collect()
    rows = {(r["k"], r["idx"]): r for r in out}
    assert len(out) == 8
    # key 1: linear 10 -> 40 across the gap
    assert rows[(1, 1)]["v_filled"] == 20.0 and rows[(1, 1)]["fill_kind"] == "interp"
    assert rows[(1, 2)]["v_filled"] == 30.0
    # key 2: NOCB before, LOCF after — never sees key 1's values
    assert rows[(2, 0)]["v_filled"] == 5.0 and rows[(2, 0)]["fill_kind"] == "nocb"
    assert rows[(2, 3)]["v_filled"] == 5.0 and rows[(2, 3)]["fill_kind"] == "locf"
    # passthrough column rides along, NULL on gap rows
    assert rows[(1, 0)]["tag"] == "a" and rows[(1, 1)]["tag"] is None
