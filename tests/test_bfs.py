"""Multi-source BFS (stages/graph.bfs_hops): parity between the driver
numpy twin and the distributed min-distance propagation on a random
graph, block-layout invariance, and edge-case semantics (isolated
seeds, the max_hops bound, duplicate seed rows)."""

from __future__ import annotations

import random
from collections import deque

import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.stages.graph import bfs_hops


def _reference_bfs(
    seeds: list[str], edges: list[tuple[str, str]], max_hops: int
) -> dict[str, int]:
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _ds(rows: dict, n_blocks: int) -> rd.Dataset:
    return rd.from_arrow(pa.table(rows)).repartition(n_blocks)


def _run(seeds, edges, max_hops, threshold, n_blocks=3) -> dict[str, int]:
    out = bfs_hops(
        _ds({"node_id": seeds}, n_blocks),
        _ds({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]},
            n_blocks),
        max_hops=max_hops,
        driver_threshold=threshold,
    )
    rows = out.take_all()
    got = {}
    for r in rows:
        assert r["node_id"] not in got, "duplicate node in BFS output"
        got[r["node_id"]] = r["dist"]
    return got


@pytest.mark.parametrize("threshold", [10_000, 0])  # driver / distributed
def test_bfs_random_graph_parity(ray_session, threshold):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(260)
    ]
    seeds = [nodes[0], nodes[50], nodes[99], nodes[0]]  # dup seed row
    for hops in (0, 1, 3):
        want = _reference_bfs(sorted(set(seeds)), edges, hops)
        got = _run(seeds, edges, hops, threshold)
        assert got == want


@pytest.mark.parametrize("threshold", [10_000, 0])
def test_bfs_chain_respects_max_hops(ray_session, threshold):
    # a -- b -- c -- d -- e ; seed {a}: only <=2 hops reached
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _run(["a"], edges, 2, threshold)
    assert got == {"a": 0, "b": 1, "c": 2}


@pytest.mark.parametrize("threshold", [10_000, 0])
def test_bfs_isolated_seed_and_unreached(ray_session, threshold):
    # seed z touches no edge: dist 0; component {x, y} unreached at all
    edges = [("x", "y")]
    got = _run(["z"], edges, 4, threshold)
    assert got == {"z": 0}


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_bfs_block_layout_invariance(ray_session, n_blocks):
    edges = [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c"), ("e", "f")]
    got = _run(["a", "e"], edges, 4, 0, n_blocks=n_blocks)
    assert got == {"a": 0, "e": 0, "b": 1, "d": 1, "f": 1, "c": 2}


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_closeness_from_seeds(ray_session, driver_threshold):
    """Path a-b-c-d with radius 2 from a: reached {b,c}, sum 1+2=3,
    closeness 2/3; an isolated seed (absent from the edge set) reports
    (0, 0, 0.0). Both BFS regimes exercised via the threshold (0
    forces the distributed min-propagation rounds)."""
    import semantic_search_system_ray.stages.graph as graph

    e = pa.table({"src": ["a", "b", "c"], "dst": ["b", "c", "d"]})
    got = (
        graph.closeness_from_seeds(["a", "zzz"], rd.from_arrow(e), radius=2,
                                   driver_threshold=driver_threshold)
        .to_pandas().sort_values("seed").reset_index(drop=True)
    )
    rows = list(zip(got["seed"], got["reached"], got["sum_dist"],
                    got["closeness"]))
    assert rows == [("a", 2, 3, 2.0 / 3.0), ("zzz", 0, 0, 0.0)]
