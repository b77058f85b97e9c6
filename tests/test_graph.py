"""Graph analytics (stages/graph.py): degree and integer PageRank parity
against an exact single-process reference on a small multigraph, plus
block-layout invariance (the distributed result must not depend on how
edges are chunked)."""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.stages.graph import (
    DEFAULT_SCALE,
    degree_table,
    pagerank,
    pagerank_topk,
)

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
    ("b", "a"), ("e", "e"), ("a", "b"),  # parallel edge: multigraph
]


def _edges_ds(n_blocks: int) -> rd.Dataset:
    t = pa.table(
        {"src": [e[0] for e in EDGES], "dst": [e[1] for e in EDGES]}
    )
    return rd.from_arrow(t).repartition(n_blocks)


def _reference_pagerank(iterations: int) -> list[tuple[str, int]]:
    base = 15 * DEFAULT_SCALE // 100
    nodes = sorted({n for e in EDGES for n in e})
    od: dict[str, int] = defaultdict(int)
    for s, _ in EDGES:
        od[s] += 1
    pr = {n: DEFAULT_SCALE for n in nodes}
    for _ in range(iterations):
        m: dict[str, int] = defaultdict(int)
        for s, d in EDGES:
            m[d] += pr[s] // od[s]
        pr = {n: base + (85 * m[n]) // 100 for n in nodes}
    return sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_degree_multigraph(ray_session, n_blocks):
    deg = (
        degree_table(_edges_ds(n_blocks))
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    exp_out = {"a": 3, "b": 2, "c": 1, "d": 1, "e": 1}
    exp_in = {"a": 2, "b": 2, "c": 3, "d": 0, "e": 1}
    assert list(deg["node_id"]) == sorted(exp_out)
    for _, r in deg.iterrows():
        assert r["out_degree"] == exp_out[r["node_id"]]
        assert r["in_degree"] == exp_in[r["node_id"]]


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_pagerank_exact_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes of the scale switch — threshold 0 forces the
    distributed coarse-shuffle recurrence, 10k takes the driver numpy
    twin — must be bit-identical to the single-process reference."""
    ref = _reference_pagerank(5)
    got = pagerank_topk(
        pagerank(_edges_ds(n_blocks), iterations=5,
                 driver_threshold=driver_threshold),
        20,
    )
    assert list(zip(got.column("node_id").to_pylist(),
                    got.column("pr").to_pylist())) == ref


def test_pagerank_mass_conservation_bound(ray_session):
    """Total rank never exceeds initial mass (floor division only loses
    mass; dangling mass is dropped by contract). Forced through the
    DISTRIBUTED regime."""
    pr = pagerank(_edges_ds(2), iterations=3, driver_threshold=0).to_pandas()
    assert pr["pr"].sum() <= len(set(sum(map(list, EDGES), []))) * DEFAULT_SCALE
    assert (pr["pr"] >= 15 * DEFAULT_SCALE // 100).all()


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

def _brute_triangles(edge_list: list[tuple[str, str]]) -> int:
    adj: dict[str, set[str]] = defaultdict(set)
    for s, d in edge_list:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    nodes = sorted(adj)
    n = 0
    for i, a in enumerate(nodes):
        for b in (x for x in adj[a] if x > a):
            for c in (x for x in adj[b] if x > b):
                if c in adj[a]:
                    n += 1
    return n


TRI_CASES = [
    # K4 → 4 triangles; direction/duplicates/self-loops must be ignored
    ("k4", [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
            ("b", "d"), ("c", "d"), ("b", "a"), ("a", "a")]),
    ("chain", [("a", "b"), ("b", "c"), ("c", "d")]),
    ("two_tris", [("a", "b"), ("b", "c"), ("c", "a"),
                  ("x", "y"), ("y", "z"), ("z", "x"), ("a", "x")]),
    # hub wedge star: hub connected to 6 leaves, one closing edge
    ("star", [("h", f"l{i}") for i in range(6)] + [("l0", "l1")]),
    ("empty", []),
]


@pytest.mark.parametrize("name,edge_list", TRI_CASES)
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_triangle_count_matches_bruteforce(ray_session, name, edge_list, n_blocks):
    from semantic_search_system_ray.stages.graph import triangle_count

    if edge_list:
        ds = rd.from_items(
            [{"src": s, "dst": d} for s, d in edge_list]
        ).repartition(n_blocks)
    else:
        ds = rd.from_arrow(
            pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
        )
    out = triangle_count(ds)
    assert out.column("triangles").to_pylist() == [_brute_triangles(edge_list)]


def test_triangle_count_random_graph_parity(ray_session):
    import random

    from semantic_search_system_ray.stages.graph import triangle_count

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(40)]
    edge_list = list({
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(260)
    })
    ds = rd.from_items(
        [{"src": s, "dst": d} for s, d in edge_list]
    ).repartition(4)
    out = triangle_count(ds, num_partitions=8)
    assert out.column("triangles").to_pylist() == [_brute_triangles(edge_list)]


def _reference_kcore(edges, k, rounds):
    """Single-process peel over the distinct undirected simple edges."""
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    for _ in range(rounds):
        deg = defaultdict(int)
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        alive = {n for n, d in deg.items() if d >= k}
        new = [(a, b) for a, b in und if a in alive and b in alive]
        if len(new) == len(und):
            break
        und = new
    deg = defaultdict(int)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    return sorted(deg.items())


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_kcore_regime_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes of the scale switch — threshold 0 forces the
    distributed peel (degree agg + two cogroup semi-joins per round),
    10k the driver numpy twin — must match the single-process peel.
    The triangle a-b-c survives k=2; the d/e pendants peel away."""
    from semantic_search_system_ray.stages.graph import kcore

    got = (
        kcore(_edges_ds(n_blocks), k=2, rounds=4,
              driver_threshold=driver_threshold)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    ref = _reference_kcore(EDGES, 2, 4)
    assert list(zip(got["node_id"], got["deg"])) == ref
    assert set(got["node_id"]) == {"a", "b", "c"}


def test_kcore_nonconverged_prefix_is_fixed_rounds(ray_session):
    """rounds=1 on a path graph = exactly one peel step (ends peel, the
    rest stays) — pins the bounded-rounds contract the SQL twin unrolls."""
    from semantic_search_system_ray.stages.graph import kcore

    path = [("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n4", "n5")]
    t = pa.table({"src": [e[0] for e in path], "dst": [e[1] for e in path]})
    got = (
        kcore(rd.from_arrow(t), k=2, rounds=1)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    ref = _reference_kcore(path, 2, 1)
    assert list(zip(got["node_id"], got["deg"])) == ref


def _reference_lpa(edges, rounds):
    """Single-process synchronous LPA over the distinct undirected
    simple edges: neighbor-mode labels, ties to the smallest label."""
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    adj = defaultdict(list)
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = defaultdict(int)
            for m in nbrs:
                cnt[lab[m]] += 1
            new[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return sorted(lab.items())


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_label_propagation_regime_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes of the scale switch — threshold 0 forces the
    distributed rounds (label attach + mode aggregation per round), 10k
    the driver numpy twin — must match the single-process LPA. The e-e
    self-loop drops, so e is absent from the output on both sides."""
    from semantic_search_system_ray.stages.graph import label_propagation

    got = (
        label_propagation(_edges_ds(n_blocks), rounds=3,
                          driver_threshold=driver_threshold)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    ref = _reference_lpa(EDGES, 3)
    assert list(zip(got["node_id"], got["community"])) == ref
    assert "e" not in set(got["node_id"])


@pytest.mark.parametrize("rounds", [1, 2])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_label_propagation_oscillation_is_fixed_rounds(
    ray_session, rounds, driver_threshold
):
    """Synchronous LPA on a single edge oscillates (a<->b swap labels
    every round) — the rounds-prefix contract makes the result exact
    and rounds-dependent on both sides, pinning what the SQL twin
    unrolls."""
    from semantic_search_system_ray.stages.graph import label_propagation

    t = pa.table({"src": ["a"], "dst": ["b"]})
    got = (
        label_propagation(rd.from_arrow(t), rounds=rounds,
                          driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    ref = _reference_lpa([("a", "b")], rounds)
    assert list(zip(got["node_id"], got["community"])) == ref
    exp = [("a", "b"), ("b", "a")] if rounds == 1 else [("a", "a"), ("b", "b")]
    assert ref == exp


def _reference_hits(
    edges: list[tuple[str, str]], rounds: int
) -> list[tuple[str, int, int]]:
    """Single-process integer HITS over the distinct directed simple
    edge set — the exact recurrence stages/graph.hits implements."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for p in e for n in p})
    a = {n: DEFAULT_SCALE for n in nodes}
    h = {n: 0 for n in nodes}
    for _ in range(rounds):
        hr = {n: 0 for n in nodes}
        for s, d in e:
            hr[s] += a[d]
        mx = max(hr.values())
        h = {n: hr[n] * DEFAULT_SCALE // mx for n in nodes}
        ar = {n: 0 for n in nodes}
        for s, d in e:
            ar[d] += h[s]
        mx = max(ar.values())
        a = {n: ar[n] * DEFAULT_SCALE // mx for n in nodes}
    return [(n, h[n], a[n]) for n in nodes]


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_hits_regime_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes of the scale switch — threshold 0 forces the
    distributed half-rounds (score attach + per-node sum + scalar max),
    10k the driver numpy twin — must match the single-process integer
    HITS. Parallel edges collapse (distinct edge set) and the e-e
    self-loop drops, so e is absent on both sides."""
    from semantic_search_system_ray.stages.graph import hits

    got = (
        hits(_edges_ds(n_blocks), rounds=3, driver_threshold=driver_threshold)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    ref = _reference_hits(EDGES, 3)
    assert list(zip(got["node_id"], got["hub"], got["auth"])) == ref
    assert "e" not in set(got["node_id"])


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_hits_hub_auth_asymmetry(ray_session, driver_threshold):
    """On a pure star x->{y1,y2,y3}: x is the only hub (hub=scale,
    auth=0) and the leaves are pure equal authorities — and the
    max-normalization pins every score to an exact integer."""
    from semantic_search_system_ray.stages.graph import hits

    t = pa.table({"src": ["x", "x", "x"], "dst": ["y1", "y2", "y3"]})
    got = (
        hits(rd.from_arrow(t), rounds=2, driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    rows = list(zip(got["node_id"], got["hub"], got["auth"]))
    s = DEFAULT_SCALE
    assert rows == [("x", s, 0), ("y1", 0, s), ("y2", 0, s), ("y3", 0, s)]


def _reference_ppr(iterations: int, seeds: set[str]) -> list[tuple[str, int]]:
    """Single-process personalized variant: restart mass and pr0 only on
    seed nodes — the exact seeded recurrence pagerank(seeds=...) runs."""
    base = 15 * DEFAULT_SCALE // 100
    nodes = sorted({n for e in EDGES for n in e})
    od: dict[str, int] = defaultdict(int)
    for s, _ in EDGES:
        od[s] += 1
    pr = {n: (DEFAULT_SCALE if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        m: dict[str, int] = defaultdict(int)
        for s, d in EDGES:
            m[d] += pr[s] // od[s]
        pr = {
            n: (base if n in seeds else 0) + (85 * m[n]) // 100
            for n in nodes
        }
    return sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_personalized_pagerank_parity(ray_session, n_blocks, driver_threshold):
    """Seeded pagerank, both regimes: restart mass only on seeds {a, d}
    (d is a source-only node; its seed mass must survive the zero-row
    union). Seeds outside the edge set ('zz') are ignored; a duplicate
    seed row is harmless."""
    seeds = rd.from_arrow(
        pa.table({"node_id": ["a", "d", "d", "zz"]})
    ).repartition(2)
    ref = _reference_ppr(5, {"a", "d"})
    got = pagerank_topk(
        pagerank(_edges_ds(n_blocks), iterations=5,
                 driver_threshold=driver_threshold, seeds=seeds),
        20,
    )
    assert list(zip(got.column("node_id").to_pylist(),
                    got.column("pr").to_pylist())) == ref
    # non-seed sink-free nodes still accumulate walked-in mass only
    prs = dict(zip(got.column("node_id").to_pylist(),
                   got.column("pr").to_pylist()))
    assert prs["d"] >= 15 * DEFAULT_SCALE // 100  # seed keeps its base


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_clustering_coefficient(ray_session, n_blocks):
    """Triangle a-b-c plus pendant d: triangles=1. The a-b parallel
    edge collapses and the e-e self-loop drops, so the simple
    undirected edges are a-b, a-c, b-c, c-d → degrees a:2 b:2 c:3 d:1
    → wedges = 1+1+3+0 = 5; cc = 3/5 exactly."""
    from semantic_search_system_ray.stages.graph import clustering_coefficient

    got = clustering_coefficient(_edges_ds(n_blocks))
    assert got.column("triangles").to_pylist() == [1]
    assert got.column("wedges").to_pylist() == [5]
    assert got.column("global_cc").to_pylist() == [3.0 / 5.0]


# ---------------------------------------------------------------------------
# strongly connected components (EXACT, scale-switched)
# ---------------------------------------------------------------------------

# 3-cycle {a,b,c} feeding a second 3-cycle {d,e,f}, a DAG source g, a
# pure-self-loop node h (drops out entirely: self-loops never change
# membership and h has no other edges), and a parallel a->b edge.
SCC_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "d"), ("d", "e"), ("e", "f"), ("f", "d"),
    ("g", "a"),
    ("h", "h"),
    ("a", "b"),
]


def _scc_edges_ds(edge_list, n_blocks: int) -> rd.Dataset:
    t = pa.table(
        {"src": [e[0] for e in edge_list], "dst": [e[1] for e in edge_list]}
    )
    return rd.from_arrow(t).repartition(n_blocks)


def _brute_scc(edge_list) -> list[tuple[str, str]]:
    """Mutual reachability by saturation: scc(v) = min {u : u<->v}."""
    e = {(s, d) for s, d in edge_list if s != d}
    nodes = sorted({n for pair in e for n in pair})
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for s, d in e:
            new = reach[d] - reach[s]
            if new:
                reach[s] |= new
                changed = True
    return sorted(
        (n, min(m for m in nodes if m in reach[n] and n in reach[m]))
        for n in nodes
    )


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_scc_regime_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes — threshold 0 forces the distributed coloring
    algorithm (verified fixpoints), 10k the iterative-Tarjan driver twin
    — must match brute-force mutual reachability exactly: SCC is a pure
    graph property, not a fixed-round prefix. Interlocking cycles,
    a DAG source, parallel edges, and a dropped self-loop node."""
    from semantic_search_system_ray.stages.graph import scc_labels

    got = (
        scc_labels(_scc_edges_ds(SCC_EDGES, n_blocks),
                   driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    ref = _brute_scc(SCC_EDGES)
    assert list(zip(got["node_id"], got["scc"])) == ref
    assert "h" not in set(got["node_id"])
    # spot-check the expected components directly
    m = dict(zip(got["node_id"], got["scc"]))
    assert m["a"] == m["b"] == m["c"] == "a"
    assert m["d"] == m["e"] == m["f"] == "d"
    assert m["g"] == "g"


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_scc_singleton_chain(ray_session, driver_threshold):
    """Adversarial all-singleton chain a->b->c->d: the coloring regime
    peels exactly one color root per outer round (the classic worst
    case), so this exercises the multi-round outer loop; every node is
    its own component in both regimes."""
    from semantic_search_system_ray.stages.graph import scc_labels

    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    got = (
        scc_labels(_scc_edges_ds(chain, 2),
                   driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    assert list(zip(got["node_id"], got["scc"])) == _brute_scc(chain)


def test_scc_exhausted_round_budget_raises(ray_session):
    """SCC semantics are the true fixpoint: the distributed regime must
    raise loudly when the inner round budget is exhausted before a
    verified no-change round — never silently return a prefix."""
    from semantic_search_system_ray.stages.graph import scc_labels

    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    with pytest.raises(RuntimeError, match="fixpoint|budget"):
        scc_labels(_scc_edges_ds(chain, 1), driver_threshold=0,
                   max_rounds=1)


def test_scc_self_loops_only_is_empty(ray_session):
    """A graph whose every edge is a self-loop has no simple edges left
    after normalization: the result is the empty (node_id, scc) table
    with the pinned schema."""
    from semantic_search_system_ray.stages.graph import SCC_SCHEMA, scc_labels

    t = pa.table({"src": ["x", "y"], "dst": ["x", "y"]})
    got = scc_labels(rd.from_arrow(t))
    assert got.count() == 0
    assert got.schema().base_schema.equals(SCC_SCHEMA)


# ---------------------------------------------------------------------------
# condensation DAG + longest-path topological levels
# ---------------------------------------------------------------------------

def _brute_condensation(edge_list) -> list[tuple[str, str]]:
    scc = dict(_brute_scc(edge_list))
    return sorted({
        (scc[s], scc[d]) for s, d in edge_list
        if s != d and scc[s] != scc[d]
    })


def _brute_dag_levels(edge_list) -> list[tuple[str, int]]:
    e = sorted({(s, d) for s, d in edge_list if s != d})
    nodes = sorted({n for pair in e for n in pair})
    lev = {n: 0 for n in nodes}
    for _ in nodes:  # Bellman-Ford max; |V| rounds saturate any DAG
        for s, d in e:
            lev[d] = max(lev[d], lev[s] + 1)
    return sorted(lev.items())


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_condensation_regime_parity(ray_session, n_blocks, driver_threshold):
    """Contracting SCC_EDGES: {a,b,c} and {d,e,f} collapse, the c->d and
    g->a bridges survive as (a,d) and (g,a), intra-component edges and
    the h self-loop vanish — in both regimes."""
    from semantic_search_system_ray.stages.graph import condensation

    got = (
        condensation(_scc_edges_ds(SCC_EDGES, n_blocks),
                     driver_threshold=driver_threshold)
        .to_pandas().sort_values(["src_scc", "dst_scc"])
        .reset_index(drop=True)
    )
    assert (list(zip(got["src_scc"], got["dst_scc"]))
            == _brute_condensation(SCC_EDGES) == [("a", "d"), ("g", "a")])


DAG_EDGES = [
    ("a", "b"), ("b", "c"), ("a", "c"),  # diamond: long path wins
    ("c", "d"), ("x", "d"),              # second source at level 0
    ("a", "b"),                          # parallel edge
]


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_dag_levels_parity(ray_session, n_blocks, driver_threshold):
    """level(v) = LONGEST path ending at v (not shortest): c sits at 2
    via a->b->c even though a->c exists; both sources at 0."""
    from semantic_search_system_ray.stages.graph import dag_levels

    got = (
        dag_levels(_scc_edges_ds(DAG_EDGES, n_blocks),
                   driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    assert (list(zip(got["node_id"], got["level"]))
            == _brute_dag_levels(DAG_EDGES)
            == [("a", 0), ("b", 1), ("c", 2), ("d", 3), ("x", 0)])


def test_dag_levels_cycle_raises_driver(ray_session):
    """Longest-path levels are undefined on a cycle: the Kahn driver
    twin must raise, never emit a truncated layering."""
    from semantic_search_system_ray.stages.graph import dag_levels

    cyc = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    with pytest.raises(RuntimeError, match="cycle"):
        dag_levels(_scc_edges_ds(cyc, 1), driver_threshold=10_000)


def test_dag_levels_cycle_raises_distributed(ray_session):
    """The distributed max-propagation regime detects the same cycle as
    a never-settling level sum and raises at the round budget."""
    from semantic_search_system_ray.stages.graph import dag_levels

    cyc = [("a", "b"), ("b", "a")]
    with pytest.raises(RuntimeError, match="cycle|budget"):
        dag_levels(_scc_edges_ds(cyc, 1), driver_threshold=0, max_rounds=4)


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_condensation_levels_end_to_end(ray_session, driver_threshold):
    """SCC contraction then layering on SCC_EDGES: g (pure source) at 0,
    the {a,b,c} component at 1, the {d,e,f} component at 2."""
    from semantic_search_system_ray.stages.graph import condensation_levels

    got = (
        condensation_levels(_scc_edges_ds(SCC_EDGES, 2),
                            driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    assert list(zip(got["node_id"], got["level"])) == [
        ("a", 1), ("d", 2), ("g", 0)
    ]


# ---------------------------------------------------------------------------
# link prediction (common / pref_attach / resource allocation)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_linkpred_excludes_edges_and_is_integer_exact(
    ray_session, n_blocks, driver_node_threshold
):
    """On the EDGES multigraph (simple undirected form: a-b, a-c, b-c,
    c-d; e's self-loop drops): every wedge pair except (a,d) and (b,d)
    is already an edge and must be anti-joined away. Both survivors
    share exactly neighbor c (deg 3), so ra = SCALE // 3 for each, and
    pref_attach = deg*deg. Tie order: (ra DESC, node_a, node_b).
    Block-layout invariant; threshold 0 forces the distributed wedge
    path, 10k the dense BLAS driver twin — identical output."""
    from semantic_search_system_ray.stages.graph import linkpred_topk

    got = linkpred_topk(_edges_ds(n_blocks), k=10,
                        driver_node_threshold=driver_node_threshold)
    rows = list(zip(
        got.column("node_a").to_pylist(), got.column("node_b").to_pylist(),
        got.column("common").to_pylist(),
        got.column("pref_attach").to_pylist(), got.column("ra").to_pylist(),
    ))
    share = DEFAULT_SCALE // 3
    assert rows == [
        ("a", "d", 1, 2 * 1, share),
        ("b", "d", 1, 2 * 1, share),
    ]


@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_linkpred_ra_sums_over_all_common_neighbors(
    ray_session, driver_node_threshold
):
    """Butterfly x-z1-y, x-z2-y with deg(z1)=deg(z2)=2 and an extra
    pendant on x: (x,y) is a non-edge with two common neighbors, so
    ra = 2 * (SCALE // 2) and common = 2 — per-apex shares really
    accumulate across apexes (and across blocks), in both regimes."""
    from semantic_search_system_ray.stages.graph import linkpred_topk

    ed = [("x", "z1"), ("z1", "y"), ("x", "z2"), ("z2", "y"), ("x", "p")]
    got = linkpred_topk(_scc_edges_ds(ed, 3), k=1,
                        driver_node_threshold=driver_node_threshold)
    assert got.column("node_a").to_pylist() == ["x"]
    assert got.column("node_b").to_pylist() == ["y"]
    assert got.column("common").to_pylist() == [2]
    assert got.column("pref_attach").to_pylist() == [3 * 2]
    assert got.column("ra").to_pylist() == [2 * (DEFAULT_SCALE // 2)]


# ---------------------------------------------------------------------------
# local clustering coefficient + reciprocity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_local_clustering_per_node(ray_session, n_blocks,
                                   driver_node_threshold):
    """Simple form of EDGES: a-b, a-c, b-c, c-d with one triangle
    {a,b,c}. Each member gets tri=1; a and b (deg 2) sit at lcc=1.0,
    c (deg 3) at 1/3, the pendant d at 0.0 via the deg<2 convention,
    and e (self-loop only) is absent. Threshold 0 forces the
    distributed apex-wedge path, 10k the BLAS driver twin."""
    from semantic_search_system_ray.stages.graph import local_clustering

    got = (
        local_clustering(_edges_ds(n_blocks),
                         driver_node_threshold=driver_node_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    rows = list(zip(got["node_id"], got["triangles"], got["deg"], got["lcc"]))
    assert rows == [
        ("a", 1, 2, 1.0), ("b", 1, 2, 1.0),
        ("c", 1, 3, 2.0 / 6.0), ("d", 0, 1, 0.0),
    ]


@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_local_clustering_apex_gets_credit(ray_session,
                                           driver_node_threshold):
    """K4 minus one edge (x-y missing): z1 and z2 each apex two wedges
    but close only one triangle each — per-node counts must credit
    apexes, not just wedge endpoints. Both regimes."""
    from semantic_search_system_ray.stages.graph import local_clustering

    ed = [("x", "z1"), ("x", "z2"), ("y", "z1"), ("y", "z2"), ("z1", "z2")]
    got = (
        local_clustering(_scc_edges_ds(ed, 2),
                         driver_node_threshold=driver_node_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    rows = list(zip(got["node_id"], got["triangles"], got["deg"], got["lcc"]))
    assert rows == [
        ("x", 1, 2, 1.0), ("y", 1, 2, 1.0),
        ("z1", 2, 3, 4.0 / 6.0), ("z2", 2, 3, 4.0 / 6.0),
    ]


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_reciprocity(ray_session, n_blocks):
    """Distinct simple directed EDGES: a->b/b->a and a->c/c->a are the
    two mutual pairs (4 reciprocated of 6 edges); the parallel a->b
    collapses and e's self-loop drops before the ratio."""
    from semantic_search_system_ray.stages.graph import reciprocity

    got = reciprocity(_edges_ds(n_blocks))
    assert got.column("total_edges").to_pylist() == [6]
    assert got.column("reciprocated").to_pylist() == [4]
    assert got.column("reciprocity").to_pylist() == [4.0 / 6.0]


def test_reciprocity_empty_after_selfloop_drop(ray_session):
    """Self-loop-only input: zero simple edges, ratio pinned to 0.0."""
    from semantic_search_system_ray.stages.graph import reciprocity

    t = pa.table({"src": ["x"], "dst": ["x"]})
    got = reciprocity(rd.from_arrow(t))
    assert got.column("total_edges").to_pylist() == [0]
    assert got.column("reciprocity").to_pylist() == [0.0]


# ---------------------------------------------------------------------------
# neighbor jaccard (regime parity for the dense twin)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_neighbor_jaccard_regime_parity(ray_session, n_blocks,
                                        driver_node_threshold):
    """Simple form of EDGES (a-b, a-c, b-c, c-d): all five sharing
    pairs with their exact ratios, ordered (jaccard DESC, node_a,
    node_b) — identical from the distributed wedge path (threshold 0)
    and the dense row-block BLAS twin (10k)."""
    from semantic_search_system_ray.stages.graph import neighbor_jaccard_topk

    got = neighbor_jaccard_topk(_edges_ds(n_blocks), k=10,
                                driver_node_threshold=driver_node_threshold)
    rows = list(zip(
        got.column("node_a").to_pylist(), got.column("node_b").to_pylist(),
        got.column("common").to_pylist(), got.column("jaccard").to_pylist(),
    ))
    assert rows == [
        ("a", "d", 1, 0.5), ("b", "d", 1, 0.5),
        ("a", "b", 1, 1.0 / 3.0),
        ("a", "c", 1, 0.25), ("b", "c", 1, 0.25),
    ]


# ---------------------------------------------------------------------------
# deterministic negative sampling
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_blocks", [1, 3])
def test_linkpred_negative_samples(ray_session, n_blocks):
    """md5 replay, filters, and layout invariance: every emitted
    candidate is exactly the md5-ranked vocabulary pick for its
    (edge, i), never an endpoint, and never an existing edge — and the
    emitted SET is identical however the edges are blocked."""
    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.stages.graph import (
        linkpred_negative_samples,
    )

    rows = sorted(
        (r["node_a"], r["node_b"], r["neg_idx"], r["neg_node"])
        for r in linkpred_negative_samples(_edges_ds(n_blocks), k=3)
        .take_all()
    )
    und = {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")}
    vocab = sorted({n for e in und for n in e})
    expected = []
    for a, b in sorted(und):
        for i in range(3):
            c = vocab[md5_hash64(f"neg:{a}|{b}|{i}") % len(vocab)]
            if c in (a, b):
                continue
            if (min(a, c), max(a, c)) in und:
                continue
            expected.append((a, b, i, c))
    assert rows == sorted(expected)
    assert len(rows) > 0
    for a, b, _i, c in rows:
        assert c not in (a, b)
        assert (min(a, c), max(a, c)) not in und


# ---------------------------------------------------------------------------
# ego-network extraction
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("radius,expected", [
    (1, [("s", "a")]),
    (2, [("a", "b"), ("s", "a")]),
    (3, [("a", "b"), ("b", "c"), ("s", "a")]),
])
def test_ego_edges_radius(ray_session, radius, expected):
    """Path s->a->b->c plus a disconnected x->y: the ego edge set keeps
    exactly the edges with BOTH endpoints within the radius (an edge to
    a node one hop past the boundary must drop), and never the
    disconnected component."""
    from semantic_search_system_ray.stages.graph import ego_edges

    ed = [("s", "a"), ("a", "b"), ("b", "c"), ("x", "y"), ("s", "a")]
    seeds = rd.from_arrow(
        pa.table({"node_id": pa.array(["s"], pa.string())})
    )
    got = sorted(
        (r["src"], r["dst"])
        for r in ego_edges(seeds, _scc_edges_ds(ed, 2), radius=radius)
        .take_all()
    )
    assert got == expected


def _reference_katz(
    edges: list[tuple[str, str]], rounds: int, alpha_inv: int = 4
) -> list[tuple[str, int]]:
    """Single-process integer Katz over the distinct directed simple
    edge set — the exact recurrence stages/graph.katz implements."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({n for p in e for n in p})
    x = {n: DEFAULT_SCALE for n in nodes}
    for _ in range(rounds):
        raw = {n: 0 for n in nodes}
        for s, d in e:
            raw[d] += x[s]
        mx = max(raw.values())
        x = {n: DEFAULT_SCALE + raw[n] * DEFAULT_SCALE // (alpha_inv * mx)
             for n in nodes}
    return [(n, x[n]) for n in nodes]


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_katz_regime_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes of the scale switch — threshold 0 forces the
    distributed rounds (score attach + per-node sum + scalar max), 10k
    the driver numpy twin — must match the single-process integer Katz.
    Parallel edges collapse (distinct edge set) and the e-e self-loop
    drops, so e is absent on both sides."""
    from semantic_search_system_ray.stages.graph import katz

    got = (
        katz(_edges_ds(n_blocks), rounds=4, driver_threshold=driver_threshold)
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    ref = _reference_katz(EDGES, 4)
    assert list(zip(got["node_id"], got["katz"])) == ref
    assert "e" not in set(got["node_id"])


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_katz_restart_floor_and_source_zero(ray_session, driver_threshold):
    """On a chain x->y->z every node keeps the β=scale restart mass; the
    pure source x gets EXACTLY scale (no in-edges), and the round's max
    in-sum node lands on exactly scale + scale//alpha_inv."""
    from semantic_search_system_ray.stages.graph import katz

    t = pa.table({"src": ["x", "y"], "dst": ["y", "z"]})
    got = (
        katz(rd.from_arrow(t), rounds=1, driver_threshold=driver_threshold)
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    rows = list(zip(got["node_id"], got["katz"]))
    s = DEFAULT_SCALE
    # after 1 round: raw = {x:0, y:s, z:s}, mx = s
    assert rows == [("x", s), ("y", s + s // 4), ("z", s + s // 4)]


def _reference_edge_support(
    edges: list[tuple[str, str]]
) -> list[tuple[str, str, int]]:
    """Single-process per-edge triangle support over the undirected
    simple graph — the exact semantics stages/graph.edge_support has."""
    und = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    nbr: dict[str, set[str]] = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    return [(a, b, len(nbr[a] & nbr[b])) for a, b in und]


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_edge_support_regime_parity(
    ray_session, n_blocks, driver_node_threshold
):
    """Both regimes — threshold 0 forces the distributed apex-wedge
    edge-crediting path, 10k the dense BLAS twin — must match the
    single-process common-neighbor counts; the self-loop e-e drops and
    parallel a-b edges collapse, and the triangle-free d-c edge still
    reports (support 0, via the LEFT attach / zero mask)."""
    from semantic_search_system_ray.stages.graph import edge_support

    got = (
        edge_support(
            _edges_ds(n_blocks), driver_node_threshold=driver_node_threshold
        )
        .to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
    )
    ref = _reference_edge_support(EDGES)
    assert list(zip(got["node_a"], got["node_b"], got["support"])) == ref
    # a-b-c is a triangle; the pendant c-d edge must be present with 0
    asdict = {(r[0], r[1]): r[2] for r in ref}
    assert asdict[("a", "b")] == 1 and asdict[("c", "d")] == 0


def test_comention_pairs(ray_session):
    """Bipartite projection semantics: duplicate (doc, ent) rows count
    once (DISTINCT), non-MENTIONS preds are ignored, pairs are
    unordered lo<hi, and the doc count is exact across docs and
    blocks."""
    from semantic_search_system_ray.pipelines.kg_build import comention_pairs

    t = pa.table({
        "subj": ["d1", "d1", "d1", "d1", "d2", "d2", "d3", "d3"],
        "pred": ["MENTIONS"] * 6 + ["HAS_TOPIC", "MENTIONS"],
        "obj":  ["x", "y", "z", "y",          # d1: x,y,z (y dup)
                 "y", "x",                    # d2: x,y
                 "x",                         # d3 topic — ignored
                 "x"],                        # d3: x alone — no pair
    })
    got = (
        comention_pairs(rd.from_arrow(t).repartition(3))
        .to_pandas().sort_values(["ent_a", "ent_b"]).reset_index(drop=True)
    )
    rows = list(zip(got["ent_a"], got["ent_b"], got["docs"]))
    assert rows == [("x", "y", 2), ("x", "z", 1), ("y", "z", 1)]


def _reference_walks(
    edges: list[tuple[str, str]], steps: int, salt: str = "walk"
) -> list[tuple[str, int, str]]:
    """Single-process walk twin: one walk per node of the undirected
    simple graph; move = neighbor minimizing (md5_hash64, id)."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    und = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    nbr: dict[str, list[str]] = {}
    for a, b in und:
        nbr.setdefault(a, []).append(b)
        nbr.setdefault(b, []).append(a)
    rows = []
    for w in sorted(nbr):
        u = w
        rows.append((w, 0, u))
        for r in range(1, steps + 1):
            u = min(nbr[u], key=lambda v: (md5_hash64(f"{salt}:{w}|{r}|{v}"), v))
            rows.append((w, r, u))
    return sorted(rows)


@pytest.mark.parametrize("n_blocks", [1, 3])
@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_random_walks_regime_parity(ray_session, n_blocks, driver_threshold):
    """Both regimes — threshold 0 forces the distributed per-step
    cogroup+argmin rounds, 10k the single-process twin — must produce
    the identical walk corpus (the whole point: determinism under any
    layout). Every node starts a walk; every walk has steps 0..3; the
    self-loop-only node e is absent."""
    from semantic_search_system_ray.stages.graph import random_walks

    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(
            _edges_ds(n_blocks), steps=3, driver_threshold=driver_threshold
        ).take_all()
    )
    assert got == _reference_walks(EDGES, 3)
    walks = {w for w, _, _ in got}
    assert walks == {"a", "b", "c", "d"}
    assert len(got) == 4 * 4  # 4 walks x steps 0..3


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_random_walks_pendant_bounce(ray_session, driver_threshold):
    """A pendant node's walk must bounce back through its only
    neighbor: on x-y (plus y-z), walk x step1 = y regardless of
    hashes — and determinism means re-running gives the identical
    corpus."""
    from semantic_search_system_ray.stages.graph import random_walks

    t = pa.table({"src": ["x", "y"], "dst": ["y", "z"]})
    got1 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(
            rd.from_arrow(t), steps=2, driver_threshold=driver_threshold
        ).take_all()
    )
    got2 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(
            rd.from_arrow(t), steps=2, driver_threshold=driver_threshold
        ).take_all()
    )
    assert got1 == got2
    byws = {(w, s): n for w, s, n in got1}
    assert byws[("x", 0)] == "x" and byws[("x", 1)] == "y"


def test_modularity_exact_integers(ray_session):
    """Two triangles joined by one bridge, labeled as their two
    natural communities: m=7, intra=6, deg sums 7²+7² — Q computed
    from those integers must equal the closed form; and the perfect
    one-community partition scores Q=0 minus the degree term."""
    from semantic_search_system_ray.stages.graph import modularity

    e = pa.table({
        "src": ["a", "a", "b", "x", "x", "y", "c"],
        "dst": ["b", "c", "c", "y", "z", "z", "x"],
    })
    lab = pa.table({
        "node_id": ["a", "b", "c", "x", "y", "z"],
        "community": ["1", "1", "1", "2", "2", "2"],
    })
    got = modularity(rd.from_arrow(e), rd.from_arrow(lab)).take_all()[0]
    assert got["m_edges"] == 7 and got["intra_edges"] == 6
    assert got["sum_deg_sq"] == 49 + 49
    assert got["modularity"] == 6.0 / 7.0 - 98.0 / (4.0 * 7.0 * 7.0)

    one = pa.table({
        "node_id": ["a", "b", "c", "x", "y", "z"],
        "community": ["1"] * 6,
    })
    got1 = modularity(rd.from_arrow(e), rd.from_arrow(one)).take_all()[0]
    assert got1["intra_edges"] == 7
    assert got1["modularity"] == 1.0 - (14 * 14) / (4.0 * 7.0 * 7.0)


def _reference_ktruss(
    edges: list[tuple[str, str]], k: int, rounds: int
) -> list[tuple[str, str]]:
    und = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    for _ in range(rounds):
        nbr: dict[str, set[str]] = {}
        for a, b in und:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        und = [(a, b) for a, b in und if len(nbr[a] & nbr[b]) >= k - 2]
    return und


@pytest.mark.parametrize("driver_node_threshold", [0, 10_000])
def test_ktruss_peels_pendants_and_cascades(
    ray_session, driver_node_threshold
):
    """Triangle a-b-c with pendant chain c-d-e: round 1 drops c-d and
    d-e (no triangles), the triangle survives every round. A
    triangle-plus-tail graph where removal CASCADES (two triangles
    sharing edge, tail breaking one) matches the python twin on both
    edge_support regimes."""
    from semantic_search_system_ray.stages.graph import ktruss_edges

    e = pa.table({
        "src": ["a", "a", "b", "c", "d"],
        "dst": ["b", "c", "c", "d", "e"],
    })
    got = sorted(
        (r["node_a"], r["node_b"])
        for r in ktruss_edges(
            rd.from_arrow(e), k=3, rounds=3,
            driver_node_threshold=driver_node_threshold,
        ).take_all()
    )
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]
    assert got == _reference_ktruss(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")], 3, 3
    )


def test_metapath_topic_coverage(ray_session):
    """Implied vs explicit coverage: doc d1 reaches T via the
    MENTIONS∘IN_TOPIC path AND asserts it directly (both); d2 only via
    the path; d3 only direct; entities with no IN_TOPIC mapping add
    nothing; duplicate MENTIONS rows collapse (DISTINCT doc counts)."""
    from semantic_search_system_ray.pipelines.kg_build import (
        metapath_topic_coverage,
    )

    t = pa.table({
        "subj": ["d1", "d1", "d2", "d2", "d3", "e1", "d1", "d3"],
        "pred": ["MENTIONS", "MENTIONS", "MENTIONS", "MENTIONS",
                 "MENTIONS", "IN_TOPIC", "HAS_TOPIC", "HAS_TOPIC"],
        "obj":  ["e1", "e1", "e1", "e9", "e9", "T", "T", "T"],
    })
    got = (
        metapath_topic_coverage(rd.from_arrow(t).repartition(3))
        .to_pandas().sort_values("topic").reset_index(drop=True)
    )
    rows = list(zip(got["topic"], got["n_via_path"], got["n_direct"],
                    got["n_both"]))
    assert rows == [("T", 2, 2, 1)]


def _reference_sigma(
    edges: list[tuple[str, str]], seed: str, radius: int
) -> list[tuple[str, int, int]]:
    """Single-process Brandes forward pass over the undirected simple
    graph: BFS layers, σ(v) = Σ σ(u) over predecessors one layer up."""
    from collections import deque

    und = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    nbr: dict[str, set[str]] = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    dist = {seed: 0}
    sigma = {seed: 1}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if dist[u] >= radius:
            continue
        for v in sorted(nbr.get(u, ())):
            if v not in dist:
                dist[v] = dist[u] + 1
                sigma[v] = 0
                dq.append(v)
            if dist[v] == dist[u] + 1:
                sigma[v] += sigma[u]
    return sorted((n, dist[n], sigma[n]) for n in dist)


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_shortest_path_counts(ray_session, driver_threshold):
    """Diamond a-b-d / a-c-d then d-e: σ(d)=2 (two shortest paths),
    σ(e)=2 (inherits through d) — matches the single-process Brandes
    forward pass on both BFS regimes, and layers stop at the radius."""
    from semantic_search_system_ray.stages.graph import shortest_path_counts

    e = pa.table({
        "src": ["a", "a", "b", "c", "d"],
        "dst": ["b", "c", "d", "d", "e"],
    })
    got = sorted(
        (r["node_id"], r["dist"], r["sigma"])
        for r in shortest_path_counts(
            "a", rd.from_arrow(e), radius=3,
            driver_threshold=driver_threshold,
        ).take_all()
    )
    ref = _reference_sigma(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "a", 3,
    )
    assert got == ref
    asd = {n: (d, s) for n, d, s in got}
    assert asd["d"] == (2, 2) and asd["e"] == (3, 2)


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_shortest_path_counts_multi_seed_fused(ray_session, driver_threshold):
    """Multi-seed fusion (VERDICT r4 #3): prefixing node ids per seed
    makes disjoint graph copies, so ONE multi-seed run returns exactly
    the per-seed single runs' rows — on both BFS regimes."""
    import pyarrow.compute as pc

    from semantic_search_system_ray.stages.graph import shortest_path_counts

    e = pa.table({
        "src": ["a", "a", "b", "c", "d"],
        "dst": ["b", "c", "d", "d", "e"],
    })
    SEP = "\x1f"
    pref = pa.table({
        "src": [f"{s}{SEP}{u}" for s in ("a", "e")
                for u in e.column("src").to_pylist()],
        "dst": [f"{s}{SEP}{v}" for s in ("a", "e")
                for v in e.column("dst").to_pylist()],
    })
    fused = shortest_path_counts(
        [f"a{SEP}a", f"e{SEP}e"], rd.from_arrow(pref), radius=3,
        driver_threshold=driver_threshold,
    ).take_all()
    for seed in ("a", "e"):
        single = sorted(
            (r["node_id"], r["dist"], r["sigma"])
            for r in shortest_path_counts(
                seed, rd.from_arrow(e), radius=3,
                driver_threshold=driver_threshold,
            ).take_all()
        )
        got = sorted(
            (r["node_id"].split(SEP, 1)[1], r["dist"], r["sigma"])
            for r in fused if r["node_id"].startswith(f"{seed}{SEP}")
        )
        assert got == single, (seed, got, single)


def test_shortest_path_counts_multi_source_semantics(ray_session):
    """A plain (unprefixed) multi-seed run gives MULTI-SOURCE semantics:
    min-dist, sigma summed over min-dist seeds — the documented
    contract for callers that want it."""
    from semantic_search_system_ray.stages.graph import shortest_path_counts

    e = pa.table({"src": ["a", "b"], "dst": ["b", "c"]})
    got = {
        r["node_id"]: (r["dist"], r["sigma"])
        for r in shortest_path_counts(
            ["a", "c"], rd.from_arrow(e), radius=3, driver_threshold=10_000
        ).take_all()
    }
    # b is 1 hop from both seeds: sigma = 1 (from a) + 1 (from c)
    assert got["a"] == (0, 1) and got["c"] == (0, 1)
    assert got["b"] == (1, 2)


def test_shortest_path_counts_duplicate_seed(ray_session):
    """A repeated seed (transit query where s == t) must not double
    sigma contributions — seeds dedupe order-preserving."""
    from semantic_search_system_ray.stages.graph import shortest_path_counts

    e = pa.table({"src": ["a", "b"], "dst": ["b", "c"]})
    single = sorted(
        (r["node_id"], r["dist"], r["sigma"])
        for r in shortest_path_counts(
            "a", rd.from_arrow(e), radius=3, driver_threshold=10_000
        ).take_all()
    )
    doubled = sorted(
        (r["node_id"], r["dist"], r["sigma"])
        for r in shortest_path_counts(
            ["a", "a"], rd.from_arrow(e), radius=3, driver_threshold=10_000
        ).take_all()
    )
    assert doubled == single
