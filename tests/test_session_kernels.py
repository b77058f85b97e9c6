"""Property tests for the round-4 tenth-continuation kernels — the
pure-function guts behind the new oracle-gated queries (the oracles gate
end-to-end values; these pin the kernels' algebraic contracts on inputs
the fixed corpus can't produce)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# _pair_intersections (shared by the Jaccard verifiers + minhash_calibration)
# --------------------------------------------------------------------------

@st.composite
def _pair_sets(draw):
    n = draw(st.integers(0, 6))
    pairs = []
    for _ in range(n):
        a = draw(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=3),
                          max_size=8, unique=True))
        b = draw(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=3),
                          max_size=8, unique=True))
        pairs.append((a, b))
    return pairs


@settings(max_examples=200, deadline=None)
@given(_pair_sets())
def test_pair_intersections_matches_set_ops(pairs):
    from semantic_search_system_ray.stages.dedup import _pair_intersections

    la = np.array([len(a) for a, _b in pairs], np.int64)
    lb = np.array([len(b) for _a, b in pairs], np.int64)
    flat_a = np.array([g for a, _b in pairs for g in a], dtype=object)
    flat_b = np.array([g for _a, b in pairs for g in b], dtype=object)
    got = _pair_intersections(la, flat_a, lb, flat_b)
    want = np.array([len(set(a) & set(b)) for a, b in pairs], np.int64)
    assert got.tolist() == want.tolist()


# --------------------------------------------------------------------------
# grouped HLL == global HLL when the group is constant
# --------------------------------------------------------------------------

def test_grouped_hll_matches_global_single_group(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from semantic_search_system_ray.stages.sketch import (
        approx_distinct,
        grouped_approx_distinct,
    )

    vals = [f"u{i % 137}" for i in range(1000)]
    ds = rd.from_arrow(pa.Table.from_pydict(
        {"user_id": vals, "event_type": ["only"] * len(vals)}
    ))
    global_est = approx_distinct(ds, "user_id")
    grouped = grouped_approx_distinct(ds, "user_id", "event_type")
    assert grouped.num_rows == 1
    assert grouped.column("approx_distinct")[0].as_py() == global_est


def test_grouped_hll_null_group_and_value_skipped(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from semantic_search_system_ray.stages.sketch import grouped_approx_distinct

    ds = rd.from_arrow(pa.Table.from_pydict(
        {"user_id": pa.array(["a", "b", None, "c"], pa.string()),
         "event_type": pa.array(["x", None, "x", "x"], pa.string())}
    ))
    out = grouped_approx_distinct(ds, "user_id", "event_type")
    # null group row and null value row both drop: group 'x' sees {a, c}
    assert out.num_rows == 1
    assert out.column("event_type")[0].as_py() == "x"
    assert out.column("approx_distinct")[0].as_py() == 2


# --------------------------------------------------------------------------
# kg_path_transit layer invariant: every intermediate layer's transit
# counts sum to the SAME value (each shortest path crosses each layer once)
# --------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_path_transit_layer_sums_constant():
    import __ray_entry__ as e

    t = e.queries()["kg_path_transit"](SF_DIR)
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    if len(df) == 0:
        pytest.skip("t beyond radius on this corpus")
    by_layer = df.groupby("ds")["n_paths"].sum()
    assert by_layer.nunique() == 1, by_layer.to_dict()
    # and the endpoint layers carry sigma(s,t) itself
    d_max = int(df["ds"].max())
    assert int(df.loc[df["ds"] == 0, "n_paths"].sum()) == int(by_layer.iloc[0])
    assert int(df.loc[df["ds"] == d_max, "n_paths"].sum()) == int(
        by_layer.iloc[0]
    )


# --------------------------------------------------------------------------
# z-order bucketing: bit interleave decodes back to the masked dims
# --------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.integers(0, 1 << 20), st.integers(0, 1 << 20))
def test_zorder_interleave_roundtrip(day, cust):
    d16, c16 = day & 0xFFFF, cust & 0xFFFF
    z = 0
    for i in range(16):
        z |= ((d16 >> i) & 1) << (2 * i + 1)
        z |= ((c16 >> i) & 1) << (2 * i)
    dd = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    cc = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    assert (dd, cc) == (d16, c16)
    assert 0 <= z < (1 << 32)


# --------------------------------------------------------------------------
# log-bucket sketch: the bucket lower bound brackets the value with
# bounded relative error (the events_value_sketch contract)
# --------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.integers(1, 1 << 52))
def test_log_bucket_bound(c):
    if c <= 7:
        key = c
    else:
        _m, ex = np.frexp(float(c))
        bl = int(ex)
        key = 8 * (bl - 3) + ((c >> (bl - 4)) & 7)
    if key <= 7:
        lb = key
    else:
        b, s = divmod(key, 8)
        lb = (8 + s) << (b - 1)
    assert lb <= c
    if c >= 8:
        assert (c - lb) * 8 <= lb  # ≤ 12.5% bucket width → ≤ ±6.25% mid
    else:
        assert lb == c
