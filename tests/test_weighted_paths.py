"""Bounded weighted shortest paths (stages/graph.weighted_hops): parity
between the driver numpy twin and the distributed min-plus propagation
on a random weighted graph, the ≤K-edge path bound, and edge cases
(isolated seeds, duplicate seed rows, weight ties)."""

from __future__ import annotations

import itertools
import random

import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.stages.graph import weighted_hops


def _reference(seeds, edges, max_rounds):
    """Exact min total weight over paths of <= max_rounds edges:
    K rounds of Bellman-Ford relaxation from the seed set."""
    INF = float("inf")
    nodes = set(seeds)
    sym = []
    for u, v, w in edges:
        nodes.update([u, v])
        sym += [(u, v, w), (v, u, w)]
    dist = {n: (0 if n in set(seeds) else INF) for n in nodes}
    for _ in range(max_rounds):
        nxt = dict(dist)
        for u, v, w in sym:
            if dist[u] < INF and dist[u] + w < nxt[v]:
                nxt[v] = dist[u] + w
        if nxt == dist:
            break
        dist = nxt
    return {n: d for n, d in dist.items() if d < INF}


def _ds(rows: dict, n_blocks: int) -> rd.Dataset:
    return rd.from_arrow(pa.table(rows)).repartition(n_blocks)


def _run(seeds, edges, max_rounds, threshold, n_blocks=3):
    out = weighted_hops(
        _ds({"node_id": seeds}, n_blocks),
        _ds({"src": [e[0] for e in edges], "dst": [e[1] for e in edges],
             "w": [e[2] for e in edges]}, n_blocks),
        max_rounds=max_rounds,
        driver_threshold=threshold,
    )
    got = {}
    for r in out.take_all():
        assert r["node_id"] not in got, "duplicate node in output"
        got[r["node_id"]] = r["dist"]
    return got


@pytest.mark.parametrize("threshold", [10_000, 0])
def test_weighted_random_graph_parity(ray_session, threshold):
    rng = random.Random(11)
    nodes = [f"n{i:03d}" for i in range(80)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes), rng.randint(1, 9))
        for _ in range(200)
    ]
    seeds = [nodes[0], nodes[40], nodes[79], nodes[0]]  # dup seed row
    for rounds in (0, 1, 4):
        want = _reference(sorted(set(seeds)), edges, rounds)
        got = _run(seeds, edges, rounds, threshold)
        assert got == want


@pytest.mark.parametrize("threshold", [10_000, 0])
def test_weighted_bound_and_shortcut(ray_session, threshold):
    # a -5- b -5- c  and a -20- c: within 2 rounds the two-edge path
    # (10) must beat the direct heavy edge (20); within 1 round the
    # direct edge is all that is reachable at min cost 20.
    edges = [("a", "b", 5), ("b", "c", 5), ("a", "c", 20)]
    assert _run(["a"], edges, 1, threshold) == {"a": 0, "b": 5, "c": 20}
    assert _run(["a"], edges, 2, threshold) == {"a": 0, "b": 5, "c": 10}


@pytest.mark.parametrize("threshold", [10_000, 0])
def test_weighted_isolated_seed(ray_session, threshold):
    assert _run(["z"], [("x", "y", 3)], 4, threshold) == {"z": 0}
