"""Bloom-filter join pruning (stages/bloomjoin): no false negatives,
exact semi-join output even under forced false positives, null-key
semantics, and multi-block bitmap merge."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _probe_table(keys, extra=None):
    n = len(keys)
    return pa.Table.from_pydict(
        {"k": pa.array(keys, pa.int64()),
         "payload": pa.array(extra or list(range(n)), pa.int64())}
    )


def test_bloom_prefilter_no_false_negatives(ray_session):
    """Every true member survives the prefilter regardless of bitmap
    size — bloom filters admit false positives, never false negatives."""
    import ray.data as rd

    from semantic_search_system_ray.stages.bloomjoin import (
        bloom_prefilter,
        build_bloom,
    )

    rng = np.random.RandomState(7)
    members = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    build = rd.from_arrow(
        pa.Table.from_pydict({"k": pa.array(members, pa.int64())})
    ).repartition(5)  # multi-block: exercises the partial-bitmap OR merge

    probe_keys = np.concatenate(
        [members, rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)]
    )
    probe = rd.from_arrow(_probe_table(probe_keys.tolist())).repartition(3)

    # tiny 256-bit bitmap: massive FP rate, still zero false negatives
    for log2_bits in (8, 20):
        ref = build_bloom(build, "k", log2_bits=log2_bits, nhash=3)
        kept = set(
            bloom_prefilter(probe, "k", ref, log2_bits=log2_bits, nhash=3)
            .to_pandas()["k"]
        )
        assert set(members.tolist()) <= kept


def test_bloom_semi_join_exact_vs_duckdb(ray_session):
    """Exact EXISTS output under a deliberately tiny bitmap (every probe
    block sees false positives — the cogroup must remove them), with
    null keys on both sides and duplicate build keys."""
    import ray.data as rd

    from semantic_search_system_ray.stages.bloomjoin import bloom_semi_join

    rng = np.random.RandomState(11)
    probe_keys = rng.randint(0, 400, size=1000).tolist()
    probe_tbl = pa.Table.from_pydict(
        {"k": pa.array(probe_keys + [None, None], pa.int64()),
         "payload": pa.array(list(range(1002)), pa.int64())}
    )
    build_keys = rng.randint(0, 400, size=120).tolist()
    build_tbl = pa.Table.from_pydict(
        # duplicates + a null build key (must never match anything)
        {"bk": pa.array(build_keys + build_keys[:30] + [None], pa.int64())}
    )

    probe = rd.from_arrow(probe_tbl).repartition(4)
    build = rd.from_arrow(build_tbl).repartition(3)

    out = bloom_semi_join(
        probe, build, probe_key="k", build_key="bk", log2_bits=8, nhash=2
    ).to_pandas()
    assert list(out.columns) == ["k", "payload"]

    con = duckdb.connect()
    con.register("probe", probe_tbl)
    con.register("build", build_tbl)
    exp = con.execute(
        "SELECT k, payload FROM probe "
        "WHERE EXISTS (SELECT 1 FROM build WHERE bk = k) "
        "ORDER BY payload"
    ).fetch_df()
    got = out.sort_values("payload").reset_index(drop=True)
    assert got["k"].astype("int64").tolist() == exp["k"].astype("int64").tolist()
    assert (
        got["payload"].astype("int64").tolist()
        == exp["payload"].astype("int64").tolist()
    )


def test_bloom_semi_join_empty_build(ray_session):
    import ray.data as rd

    from semantic_search_system_ray.stages.bloomjoin import bloom_semi_join

    probe = rd.from_arrow(_probe_table([1, 2, 3]))
    build = rd.from_arrow(
        pa.Table.from_pydict({"bk": pa.array([], pa.int64())})
    )
    out = bloom_semi_join(probe, build, probe_key="k", build_key="bk")
    assert out.count() == 0


@pytest.mark.parametrize("nhash", [1, 4])
def test_mix2x_h2_odd(nhash):
    """h2 must be odd so the double-hash probe sequence covers distinct
    slots mod a power of two."""
    from semantic_search_system_ray.stages.bloomjoin import _mix2x

    keys = np.arange(-500, 500, dtype=np.int64).view(np.uint64)
    h1, h2 = _mix2x(keys)
    assert (h2 & np.uint64(1)).all()
    assert len(np.unique(h1)) == len(keys)


def test_build_bloom_forced_tree_or(ray_session, monkeypatch):
    """With the OR fan-in forced tiny, the distributed bitmap reduction
    runs multiple levels and still has zero false negatives."""
    import ray
    import ray.data as rd

    from semantic_search_system_ray.stages import bloomjoin as bj

    monkeypatch.setattr(bj, "_OR_FAN_IN", 2)
    members = list(range(0, 4000, 7))
    build = rd.from_arrow(
        pa.Table.from_pydict({"k": pa.array(members, pa.int64())})
    ).repartition(9)
    ref = bj.build_bloom(build, "k", log2_bits=16, nhash=3)
    probe = rd.from_arrow(_probe_table(members + list(range(1, 4000, 7))))
    kept = set(
        bj.bloom_prefilter(probe, "k", ref, log2_bits=16, nhash=3)
        .to_pandas()["k"]
    )
    assert set(members) <= kept
