"""Graph analytics over materialized KG edge sets — degree statistics
and deterministic PageRank.

The reference materializes its graph driver-side and delegates analytics
to the graph store (`/root/reference/knowledge_graph/knowledge_graph.py`
builds edges; queries run in Neptune/NetworkX). Here the graph IS a
Dataset of (src, dst) rows and the analytics are shuffle-bounded Ray
Data passes: per-block Arrow combiners → coarse-partition cogroups
(stages/util) — never a driver-side adjacency structure.

PageRank is INTEGER-DETERMINISTIC by construction: ranks are scaled
int64 (``SCALE`` per node at t0) and each iteration computes

    pr'(v) = BASE + (85 * Σ_{u→v} (pr(u) // outdeg(u))) // 100

with ``BASE = 15·SCALE // 100`` — all floor arithmetic on non-negative
int64, so the result is independent of summation order / block layout /
parallelism, and has an exact unrolled-CTE DuckDB twin
(pipelines/text_oracles.sql_kg_pagerank). Dangling-node mass is dropped
(the standard simplified formulation; documented contract). Overflow /
exactness bounds: a per-node in-sum is ≤ total mass = n_nodes·SCALE, so
int64 (and the float64 ride through the null-bearing cogroup union,
exact < 2^53) holds to ~10^9 nodes at the default SCALE=1e6; shrink
SCALE for larger graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from semantic_search_system_ray.stages.util import coarse_partition_apply

DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 damping as an exact ratio
DEFAULT_SCALE = 1_000_000

# Scale switch (same convention as stages/canon): graphs whose edge count
# fits comfortably on the driver run the exact numpy loop — a 48k-edge
# graph costs ~55 s of pure shuffle overhead on the distributed path vs
# <1 s on the driver (measured, BASELINE.md). The edge threshold lives in
# context.ScaleConfig (graph_driver_edges, anchor 2M on the 128-GiB box,
# scaled to the driver node's memory, SSR_GRAPH_DRIVER_EDGES override);
# every algorithm resolves through _resolve_edges at call time.


def _resolve_edges(driver_threshold: int | None) -> int:
    if driver_threshold is not None:
        return driver_threshold
    from semantic_search_system_ray.context import scale_config

    return scale_config().graph_driver_edges

DEGREE_SCHEMA = pa.schema(
    [("node_id", pa.string()), ("out_degree", pa.int64()),
     ("in_degree", pa.int64())]
)
PR_SCHEMA = pa.schema([("node_id", pa.string()), ("pr", pa.int64())])


def _str(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    out = pc.cast(col, pa.string())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def degree_table(
    edges: rd.Dataset, *, src_col: str = "src", dst_col: str = "dst",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """→ (node_id, out_degree, in_degree) for every node appearing as an
    endpoint. Per-block Arrow ``group_by().count()`` combiners collapse
    each block to ≤2·|block distinct endpoints| partial rows before the
    ONE coarse shuffle; the per-partition sum is a pandas C-level
    groupby. Multigraph semantics: every edge row counts (parallel edges
    with different relations each contribute)."""

    def partial(t: pa.Table) -> pa.Table:
        s = t.group_by([src_col]).aggregate([(src_col, "count")])
        d = t.group_by([dst_col]).aggregate([(dst_col, "count")])
        zeros_s = pa.nulls(s.num_rows, pa.int64()).fill_null(0)
        zeros_d = pa.nulls(d.num_rows, pa.int64()).fill_null(0)
        return pa.Table.from_pydict(
            {
                "node_id": pa.concat_arrays(
                    [_str(s.column(src_col)), _str(d.column(dst_col))]
                ),
                "o": pa.concat_arrays(
                    [s.column(f"{src_col}_count").combine_chunks(), zeros_d]
                ),
                "i": pa.concat_arrays(
                    [zeros_s, d.column(f"{dst_col}_count").combine_chunks()]
                ),
            }
        )

    def sum_part(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return DEGREE_SCHEMA.empty_table()
        agg = (
            df.groupby("node_id", sort=False)
            .agg(out_degree=("o", "sum"), in_degree=("i", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=DEGREE_SCHEMA, preserve_index=False
        )

    return coarse_partition_apply(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["node_id"], sum_part, DEGREE_SCHEMA, num_partitions=num_partitions,
    )


def _distinct_nodes(
    edges: rd.Dataset, src_col: str, dst_col: str,
    *, num_partitions: int | None = None,
) -> rd.Dataset:
    """Distinct endpoint ids — per-block combiner + coarse-partition
    distinct (node cardinality is corpus-sized; never a driver set)."""
    schema = pa.schema([("node_id", pa.string())])

    def partial(t: pa.Table) -> pa.Table:
        both = pa.Table.from_pydict(
            {"node_id": pa.concat_arrays(
                [_str(t.column(src_col)), _str(t.column(dst_col))]
            )}
        )
        return both.group_by(["node_id"]).aggregate([])

    def dedup(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return schema.empty_table()
        return pa.Table.from_pandas(
            df.drop_duplicates("node_id"), schema=schema, preserve_index=False
        )

    return coarse_partition_apply(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["node_id"], dedup, schema, num_partitions=num_partitions,
    )


def _pagerank_driver(
    edges: rd.Dataset, iterations: int, scale: int,
    src_col: str, dst_col: str, seed_set: set[str] | None = None,
) -> rd.Dataset:
    """Exact driver-side twin of the distributed recurrence: factorized
    endpoint codes + one ``np.bincount`` per round. Bit-identical to the
    distributed path (all-integer floor arithmetic; the float64 bincount
    accumulator is exact because every partial sum is bounded by total
    mass = n_nodes·scale < 2^53 — same bound as the module contract).
    Null endpoints are not supported (KG edge contract; matches the
    distinct-string grouping of the distributed path only for non-null)."""
    import ray

    edge_schema = pa.schema([(src_col, pa.string()), (dst_col, pa.string())])
    parts = ray.get(edges.select_columns([src_col, dst_col]).to_arrow_refs())
    # blocks can disagree on schema details (zero-column empties,
    # large_string vs string) — normalize each before the concat
    parts = [
        p.select([src_col, dst_col]).cast(edge_schema)
        for p in parts
        if p.num_rows > 0
    ]
    if not parts:
        return rd.from_arrow(PR_SCHEMA.empty_table())
    t = pa.concat_tables(parts)
    src = _str(pc.cast(t.column(src_col), pa.string())).to_numpy(
        zero_copy_only=False
    )
    dst = _str(pc.cast(t.column(dst_col), pa.string())).to_numpy(
        zero_copy_only=False
    )
    nodes = np.unique(np.concatenate([src, dst]))
    s_idx = np.searchsorted(nodes, src)
    d_idx = np.searchsorted(nodes, dst)
    n = len(nodes)
    od = np.bincount(s_idx, minlength=n)  # every src has od >= 1
    base_scaled = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN
    if seed_set is None:
        base_vec: np.ndarray | int = base_scaled
        pr = np.full(n, scale, dtype=np.int64)
    else:  # personalized: restart mass and initial rank only on seeds
        mask = np.isin(nodes, np.array(sorted(seed_set), dtype=object))
        base_vec = np.where(mask, base_scaled, 0).astype(np.int64)
        pr = np.where(mask, scale, 0).astype(np.int64)
    for _ in range(iterations):
        contrib = pr[s_idx] // od[s_idx]
        m = np.bincount(d_idx, weights=contrib, minlength=n).astype(np.int64)
        pr = base_vec + (DAMP_NUM * m) // DAMP_DEN
    return rd.from_arrow(
        pa.Table.from_pydict({"node_id": nodes, "pr": pr}, schema=PR_SCHEMA)
    )


def pagerank(
    edges: rd.Dataset,
    *,
    iterations: int = 5,
    scale: int = DEFAULT_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
    seeds: rd.Dataset | None = None,
) -> rd.Dataset:
    """→ (node_id, pr) after ``iterations`` synchronous rounds of the
    integer recurrence above. Edge sets at or below ``driver_threshold``
    rows take the exact driver numpy twin (``_pagerank_driver``; parity
    pinned by tests/test_graph.py across both regimes); larger graphs run
    the distributed recurrence, where each round is TWO coarse shuffles:

    1. cogroup pr onto edges by src (union + one partition pass) →
       per-partition partial in-sums keyed by dst — the combiner: a
       partition emits at most |distinct dst in partition| rows;
    2. union partials with the zero row of every node (LEFT-join
       semantics: nodes with no in-edges keep BASE) → per-partition sum
       → apply the recurrence.

    The edge set (with outdegree attached) is materialized ONCE and
    re-streamed every round; pr is materialized per round to keep
    lineage O(1) rather than O(iterations), and repartitioned to P
    blocks first — without the bound, each round's groupby inherits the
    union's input block count, the materialized pr grows by ~3P blocks
    per round, and iteration cost goes QUADRATIC in rounds (measured
    9 s → 21 s → 43 s → 70 s → 103 s per round at sf0.1 before the fix;
    flat ~6 s after).

    ``seeds`` (a Dataset with a ``node_id`` column) switches to
    PERSONALIZED PageRank: the restart mass (BASE) lands only on seed
    nodes and the initial rank is ``scale`` on seeds, 0 elsewhere —
    same all-integer floor recurrence, so the personalized variant
    stays bit-reproducible against its unrolled-CTE twin
    (text_oracles.sql_kg_ppr). Seeds outside the edge set are ignored
    (only endpoint nodes rank); duplicate seed rows are harmless. In
    the distributed regime the seed flag rides ONE left coarse_attach
    onto the node table; per-node base then travels the zero-row union
    (the ``b`` column) — no extra shuffle per round."""
    base = DAMP_DEN - DAMP_NUM  # 15
    base_scaled = base * scale // DAMP_DEN

    # The edge lineage (often a whole upstream pipeline) is consumed three
    # times below (nodes, degrees, od-attach) — pin it once. Derive ONE
    # partition count from the pinned edge bytes and reuse it for every
    # coarse call: the in-loop unions are un-executed plans whose size
    # can't be known, so per-call derivation would fall back to the floor
    # anyway, and a constant P keeps iteration cost flat.
    edges = edges.materialize()
    if edges.count() <= _resolve_edges(driver_threshold):  # metadata count: free
        seed_set = None
        if seeds is not None:
            # driver regime: the seed set is a subset of a node table
            # that already fits driver-side by the regime's premise
            seed_set = {str(r["node_id"]) for r in seeds.take_all()}
        return _pagerank_driver(
            edges, iterations, scale, src_col, dst_col, seed_set
        )
    from semantic_search_system_ray.stages.util import _default_partitions

    P = _default_partitions(edges)
    nodes = _distinct_nodes(
        edges, src_col, dst_col, num_partitions=P
    ).repartition(P).materialize()

    # (src, dst, od): outdegree from degree_table (out side only), joined
    # back onto edges via one cogroup — every edge's src has od ≥ 1.
    union_ed = pa.schema(
        [("key", pa.string()), ("dst", pa.string()), ("od", pa.int64()),
         ("is_edge", pa.bool_())]
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [_str(t.column(src_col)), _str(t.column(dst_col)),
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.bool_()).fill_null(True)],
            schema=union_ed,
        )

    def tag_od(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node_id").combine_chunks(), pa.nulls(n, pa.string()),
             t.column("out_degree").combine_chunks(),
             pa.nulls(n, pa.bool_()).fill_null(False)],
            schema=union_ed,
        )

    ed_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("od", pa.int64())]
    )

    def attach_od(df: pd.DataFrame) -> pa.Table:
        eds = df[df["is_edge"]]
        ods = df[~df["is_edge"]][["key", "od"]]
        if eds.empty:
            return ed_schema.empty_table()
        merged = eds[["key", "dst"]].merge(ods, on="key", how="inner")
        return pa.Table.from_pydict(
            {"src": merged["key"].to_numpy(),
             "dst": merged["dst"].to_numpy(),
             # od rode the null-bearing union as float64; exact < 2^53
             "od": merged["od"].to_numpy().astype(np.int64)},
            schema=ed_schema,
        )

    deg = degree_table(edges, src_col=src_col, dst_col=dst_col,
                       num_partitions=P)
    edges_od = coarse_partition_apply(
        edges.map_batches(tag_edge, batch_format="pyarrow").union(
            deg.map_batches(tag_od, batch_format="pyarrow")
        ),
        ["key"], attach_od, ed_schema, num_partitions=P,
    ).repartition(P).materialize()

    # per-node restart mass: constant BASE classically; seeds-only when
    # personalized (the flag rides ONE left attach, then travels the
    # zero-row union as the b column — no extra per-round shuffle)
    nb_schema = pa.schema([("node_id", pa.string()), ("b", pa.int64())])
    if seeds is None:
        nodes_b = nodes.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node_id": t.column("node_id"),
                 "b": pa.nulls(t.num_rows, pa.int64()).fill_null(base_scaled)},
                schema=nb_schema,
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        from semantic_search_system_ray.stages.util import coarse_attach

        seeds_b = seeds.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node_id": _str(t.column("node_id")),
                 "b": pa.nulls(t.num_rows, pa.int64()).fill_null(base_scaled)},
                schema=nb_schema,
            ),
            batch_format="pyarrow",
        )
        nodes_b = coarse_attach(
            nodes, seeds_b, left_key="node_id", right_key="node_id",
            attach_cols=["b"], out_schema=nb_schema,
            num_partitions=P, how="left", fill={"b": 0},
        ).repartition(P).materialize()

    def init_pr(t: pa.Table) -> pa.Table:
        if seeds is None:
            pr0 = pa.nulls(t.num_rows, pa.int64()).fill_null(scale)
        else:  # initial rank = scale on seeds, 0 elsewhere
            pr0 = pc.if_else(
                pc.greater(t.column("b"), pa.scalar(0, pa.int64())),
                pa.scalar(scale, pa.int64()), pa.scalar(0, pa.int64()),
            )
        return pa.Table.from_pydict(
            {"node_id": t.column("node_id"), "pr": pr0}, schema=PR_SCHEMA
        )

    pr = nodes_b.map_batches(init_pr, batch_format="pyarrow").materialize()

    union_pr = pa.schema(
        [("key", pa.string()), ("dst", pa.string()), ("od", pa.int64()),
         ("pr", pa.int64()), ("is_pr", pa.bool_())]
    )
    msum = pa.schema(
        [("node_id", pa.string()), ("m", pa.int64()), ("b", pa.int64())]
    )

    def tag_e2(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("src").combine_chunks(), t.column("dst").combine_chunks(),
             t.column("od").combine_chunks(), pa.nulls(n, pa.int64()),
             pa.nulls(n, pa.bool_()).fill_null(False)],
            schema=union_pr,
        )

    def tag_pr(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node_id").combine_chunks(), pa.nulls(n, pa.string()),
             pa.nulls(n, pa.int64()), t.column("pr").combine_chunks(),
             pa.nulls(n, pa.bool_()).fill_null(True)],
            schema=union_pr,
        )

    def contribs(df: pd.DataFrame) -> pa.Table:
        prs = df[df["is_pr"]][["key", "pr"]]
        eds = df[~df["is_pr"]]
        if eds.empty or prs.empty:
            return msum.empty_table()
        merged = eds[["key", "dst", "od"]].merge(prs, on="key", how="inner")
        # int64 payloads ride the null-bearing union as float64 — exact
        # < 2^53 (see module overflow note); floor-div on int64
        c = merged["pr"].to_numpy().astype(np.int64) // merged[
            "od"
        ].to_numpy().astype(np.int64)
        part = (
            pd.DataFrame({"node_id": merged["dst"].to_numpy(), "m": c})
            .groupby("node_id", sort=False)["m"].sum().reset_index()
        )
        part["b"] = np.int64(0)
        return pa.Table.from_pandas(part, schema=msum, preserve_index=False)

    def tag_zero(t: pa.Table) -> pa.Table:
        # the zero row carries the node's restart mass b (exactly one
        # such row per node, so the partition sum recovers it exactly)
        return pa.Table.from_arrays(
            [t.column("node_id").combine_chunks(),
             pa.nulls(t.num_rows, pa.int64()).fill_null(0),
             pc.cast(t.column("b"), pa.int64()).combine_chunks()],
            schema=msum,
        )

    def apply_rank(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return PR_SCHEMA.empty_table()
        agg = df.groupby("node_id", sort=False)[["m", "b"]].sum().reset_index()
        m = agg["m"].to_numpy().astype(np.int64)
        b = agg["b"].to_numpy().astype(np.int64)
        pr_new = b + (DAMP_NUM * m) // DAMP_DEN
        return pa.Table.from_pydict(
            {"node_id": agg["node_id"].to_numpy(), "pr": pr_new},
            schema=PR_SCHEMA,
        )

    for _ in range(iterations):
        partials = coarse_partition_apply(
            edges_od.map_batches(tag_e2, batch_format="pyarrow").union(
                pr.map_batches(tag_pr, batch_format="pyarrow")
            ),
            ["key"], contribs, msum, num_partitions=P,
        )
        pr = coarse_partition_apply(
            partials.union(
                nodes_b.map_batches(tag_zero, batch_format="pyarrow")
            ),
            ["node_id"], apply_rank, PR_SCHEMA, num_partitions=P,
        ).repartition(P).materialize()
    return pr


def pagerank_topk(pr: rd.Dataset, k: int) -> pa.Table:
    """Deterministic top-k by (pr desc, node_id asc): per-block trim to k
    (combiner) → tiny global sort + limit."""

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("pr", "descending"), ("node_id", "ascending")]
        )
        return t.take(idx)

    out = (
        pr.map_batches(local_topk, batch_format="pyarrow")
        .sort(["pr", "node_id"], descending=[True, False])
        .limit(k)
    )
    return pa.Table.from_pylist(out.take_all(), schema=PR_SCHEMA)


# --------------------------------------------------------------------------
# triangle counting (degree-oriented, shuffle-bounded)
# --------------------------------------------------------------------------

TRI_SCHEMA = pa.schema([("triangles", pa.int64())])
_UND_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])


def undirected_simple_edges(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """→ the distinct undirected simple edge set {(a, b) : a < b} of
    ``edges`` — direction, parallel edges and self-loops dropped.
    Per-block Arrow distinct combiner → ONE coarse partitioned distinct
    (the shared first stage of triangle_count / neighbor_jaccard_topk)."""
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    def norm(t: pa.Table) -> pa.Table:
        s = _str(pc.cast(t.column(src_col), pa.string())).to_numpy(
            zero_copy_only=False
        )
        d = _str(pc.cast(t.column(dst_col), pa.string())).to_numpy(
            zero_copy_only=False
        )
        swap = s > d
        a = np.where(swap, d, s)
        b = np.where(swap, s, d)
        tt = pa.Table.from_pydict(
            {"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())}
        )
        tt = tt.filter(pc.not_equal(tt.column("a"), tt.column("b")))
        return tt.group_by(["a", "b"]).aggregate([])

    def part_distinct(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _UND_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            df.drop_duplicates(["a", "b"]), schema=_UND_SCHEMA,
            preserve_index=False,
        )

    return coarse_partition_apply(
        edges.map_batches(norm, batch_format="pyarrow"),
        ["a", "b"], part_distinct, _UND_SCHEMA,
        num_partitions=num_partitions,
    )


def _simple_degrees(und: rd.Dataset, P: int | None) -> rd.Dataset:
    """(node_id, deg) over the simple undirected edge set."""
    deg = degree_table(und, src_col="a", dst_col="b", num_partitions=P)
    return deg.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": t.column("node_id"),
             "deg": pc.add(t.column("out_degree"), t.column("in_degree"))}
        ),
        batch_format="pyarrow",
    )


_WEDGE_SCHEMA = pa.schema([("x", pa.string()), ("y", pa.string()),
                           ("cnt", pa.int64())])


def _wedge_partials(df: pd.DataFrame, src: str, dst: str) -> pa.Table:
    """Per-apex co-neighbor pairs (x < y, both from the apex's ``dst``
    list), count-combined within the partition into lean (x, y, cnt)
    rows — the shared wedge stage of triangle_count (oriented edges) and
    neighbor_jaccard_topk (symmetrized edges)."""
    if df.empty:
        return _WEDGE_SCHEMA.empty_table()
    xs, ys = [], []
    for _u, g in df.groupby(src, sort=False):
        ns = sorted(g[dst])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                xs.append(ns[i])
                ys.append(ns[j])
    if not xs:
        return _WEDGE_SCHEMA.empty_table()
    part = (
        pd.DataFrame({"x": xs, "y": ys})
        .groupby(["x", "y"], sort=False).size().reset_index(name="cnt")
    )
    return pa.Table.from_pandas(part, schema=_WEDGE_SCHEMA,
                                preserve_index=False)


def triangle_count(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> pa.Table:
    """Global triangle count of the UNDIRECTED simple graph underlying
    ``edges`` (direction / parallel edges / self-loops ignored) — the
    classic degree-oriented distributed algorithm:

    1. normalize + distinct → simple edge set {a<b} (per-block Arrow
       combiner, ONE coarse shuffle);
    2. degree per node over the simple edges;
    3. orient every edge from its lower-(degree, id) endpoint — each
       node's oriented out-degree is O(√m), so wedge generation is
       Σ C(outdeg, 2) ≤ O(m^1.5) TOTAL, immune to hot-entity skew (a
       head entity of degree d contributes O(d) oriented edges but only
       O(m/d · …) wedges from OTHER endpoints — never d²/2 from itself);
    4. per-source wedge pairs, count-combined per partition into lean
       (x, y, cnt) partials;
    5. cogroup wedge partials with the edge set by (x, y): wedges whose
       closing edge exists are triangles; per-partition subtotals sum on
       the driver (P bounded rows).

    Exactly each triangle once (its minimum-(degree, id) vertex is the
    unique wedge apex). Returns a one-row Table — oracle-comparable
    against the 3-way SQL self-join."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    # deg feeds TWO coarse_attach plans; without the pin each would
    # re-execute the degree aggregation over the full edge set
    deg = _simple_degrees(und, P).materialize()

    wa = pa.schema([("a", pa.string()), ("b", pa.string()),
                    ("deg_a", pa.int64())])
    wab = pa.schema([("a", pa.string()), ("b", pa.string()),
                     ("deg_a", pa.int64()), ("deg_b", pa.int64())])
    e2 = coarse_attach(
        und, deg, left_key="a", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_a"], out_schema=wa, num_partitions=P,
    )
    e3 = coarse_attach(
        e2, deg, left_key="b", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_b"], out_schema=wab, num_partitions=P,
    )

    ori_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        # lower (degree, id) first; a < b already ⇒ degree tie → a
        a_first = da <= db
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.Table.from_pydict(
            {"u": pa.array(u, pa.string()), "v": pa.array(v, pa.string())},
            schema=ori_schema,
        )

    oriented = e3.map_batches(orient, batch_format="pyarrow")

    wedge_schema = _WEDGE_SCHEMA

    wedges = coarse_partition_apply(
        oriented, ["u"],
        lambda df: _wedge_partials(df, "u", "v"),
        wedge_schema, num_partitions=P,
    )

    union_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("cnt", pa.int64()),
         ("is_edge", pa.bool_())]
    )

    def tag_wedge(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("x").combine_chunks(), t.column("y").combine_chunks(),
             t.column("cnt").combine_chunks(),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(False)],
            schema=union_schema,
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks(),
             pa.nulls(t.num_rows, pa.int64()).fill_null(0),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(True)],
            schema=union_schema,
        )

    def close_part(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return TRI_SCHEMA.empty_table()
        w = df[~df["is_edge"]]
        e = df[df["is_edge"]][["x", "y"]].drop_duplicates()
        if w.empty or e.empty:
            return TRI_SCHEMA.empty_table()
        closed = w.merge(e, on=["x", "y"], how="inner")
        return pa.Table.from_pydict(
            {"triangles": [int(closed["cnt"].sum())]}, schema=TRI_SCHEMA
        )

    subtotals = coarse_partition_apply(
        wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
            und.map_batches(tag_edge, batch_format="pyarrow")
        ),
        ["x", "y"], close_part, TRI_SCHEMA, num_partitions=P,
    )
    total = sum(r["triangles"] for r in subtotals.take_all())
    return pa.Table.from_pydict({"triangles": [total]}, schema=TRI_SCHEMA)


# --------------------------------------------------------------------------
# neighborhood Jaccard similarity (link-prediction feature)
# --------------------------------------------------------------------------

JACCARD_SCHEMA = pa.schema(
    [("node_a", pa.string()), ("node_b", pa.string()),
     ("common", pa.int64()), ("jaccard", pa.float64())]
)


JACCARD_DRIVER_NODE_THRESHOLD = 8192


def _jaccard_block_kernel(A, deg, lo, hi, k):
    """Per-row-block jaccard candidates against the broadcast adjacency:
    one BLAS product, strictly-upper pairs with >=1 common neighbor,
    jac = common/(da+db-common) (exact-int operands, one double divide
    — the same expression as the distributed path and the SQL oracle),
    block-local top-k by (jac DESC, i, j)."""
    blk = A[lo:hi]
    common = blk @ A
    cols = np.arange(A.shape[1])[None, :]
    rows = np.arange(lo, hi)[:, None]
    keep = (cols > rows) & (common > 0)
    ii, jj = np.nonzero(keep)
    c = common[ii, jj]
    jac = c / (deg[ii + lo] + deg[jj] - c)
    order = np.lexsort((jj, ii + lo, -jac))[:k]
    ii, jj = ii[order], jj[order]
    return (ii + lo, jj, c[order].astype(np.int64), jac[order])


def _jaccard_driver(und: pa.Table, k: int) -> pa.Table:
    """Exact dense twin (same rationale and fan-out as _linkpred_driver:
    small dense graphs are the wedge path's worst case, and the
    sandbox's OMP_NUM_THREADS=1 forces the matmul out as row-block Ray
    tasks over a ray.put adjacency). Regime parity pytested."""
    import ray

    nodes, A = _dense_adjacency(und)
    n = len(nodes)
    deg = A.sum(axis=1)
    A_ref = ray.put(A)
    kern = ray.remote(num_cpus=1)(_jaccard_block_kernel)
    parts = ray.get([
        kern.remote(A_ref, deg, lo, hi, k)
        for lo, hi in _row_blocks(n, _n_matmul_tasks())
    ])
    ii = np.concatenate([p[0] for p in parts])
    jj = np.concatenate([p[1] for p in parts])
    com = np.concatenate([p[2] for p in parts])
    jac = np.concatenate([p[3] for p in parts])
    order = np.lexsort((jj, ii, -jac))[:k]
    iu, ju = ii[order], jj[order]
    return pa.Table.from_pydict(
        {"node_a": pa.array(nodes[iu], pa.string()),
         "node_b": pa.array(nodes[ju], pa.string()),
         "common": pa.array(com[order], pa.int64()),
         "jaccard": pa.array(jac[order], pa.float64())},
        schema=JACCARD_SCHEMA,
    )


def neighbor_jaccard_topk(
    edges: rd.Dataset,
    *,
    k: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    driver_node_threshold: int = JACCARD_DRIVER_NODE_THRESHOLD,
) -> pa.Table:
    """Top-k node pairs by neighborhood Jaccard similarity
    |N(a)∩N(b)| / |N(a)∪N(b)| over the undirected simple graph — the
    classic link-prediction feature (pairs sharing ≥1 neighbor only).

    Shape: symmetrized edges cogroup by apex → per-apex co-neighbor
    pairs, count-combined per partition into lean (x, y, cnt) partials →
    per-pair global sums (second coarse cogroup) → degrees attached via
    two hash-join attaches → jaccard = common / (deg_a + deg_b − common)
    (ONE double cast per exact-int operand, mirrored by the SQL oracle)
    → per-block top-k combiner + tiny global sort. Deterministic order:
    (jaccard DESC, node_a, node_b).

    Cost note: exact co-neighbor counting is inherently Σ C(deg, 2)
    wedges — unlike triangle_count, degree orientation cannot apply
    (the apex must range over ALL shared neighbors). At web scale, cap
    hub degrees upstream or restrict to a candidate pair set.

    Scale switch: node counts at or under ``driver_node_threshold``
    take the dense-adjacency row-block BLAS twin (``_jaccard_driver``)
    — small dense graphs are the wedge path's worst case (measured
    30.8 s → 11.3 s at sf0.1); big sparse graphs run distributed."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    # deg feeds TWO coarse_attach plans; without the pin each would
    # re-execute the degree aggregation over the full edge set
    deg = _simple_degrees(und, P).materialize()

    if deg.count() <= driver_node_threshold:
        import ray

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows > 0]
        if not tables:
            return JACCARD_SCHEMA.empty_table()
        return _jaccard_driver(pa.concat_tables(tables), k)

    sym_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([b, a])],
            schema=sym_schema,
        )

    wedge_schema = _WEDGE_SCHEMA

    partials = coarse_partition_apply(
        und.map_batches(sym, batch_format="pyarrow"),
        ["u"],
        lambda df: _wedge_partials(df, "u", "v"),
        wedge_schema, num_partitions=P,
    )

    def pair_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return wedge_schema.empty_table()
        agg = (
            df.groupby(["x", "y"], sort=False)["cnt"].sum().reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=wedge_schema, preserve_index=False
        )

    common = coarse_partition_apply(
        partials, ["x", "y"], pair_sum, wedge_schema, num_partitions=P
    )

    ca = pa.schema([("x", pa.string()), ("y", pa.string()),
                    ("cnt", pa.int64()), ("deg_a", pa.int64())])
    cab = pa.schema([("x", pa.string()), ("y", pa.string()),
                     ("cnt", pa.int64()), ("deg_a", pa.int64()),
                     ("deg_b", pa.int64())])
    j1 = coarse_attach(
        common, deg, left_key="x", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_a"], out_schema=ca, num_partitions=P,
    )
    j2 = coarse_attach(
        j1, deg, left_key="y", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_b"], out_schema=cab, num_partitions=P,
    )

    def score(t: pa.Table) -> pa.Table:
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        da = t.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64)
        jac = c.astype(np.float64) / (da + db - c).astype(np.float64)
        return pa.Table.from_pydict(
            {"node_a": t.column("x"), "node_b": t.column("y"),
             "common": pa.array(c, pa.int64()),
             "jaccard": pa.array(jac, pa.float64())},
            schema=JACCARD_SCHEMA,
        )

    scored = j2.map_batches(score, batch_format="pyarrow")

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("jaccard", "descending"), ("node_a", "ascending"),
                   ("node_b", "ascending")]
        )
        return t.take(idx)

    out = (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .sort(["jaccard", "node_a", "node_b"],
              descending=[True, False, False])
        .limit(k)
    )
    return pa.Table.from_pylist(out.take_all(), schema=JACCARD_SCHEMA)


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance
# ---------------------------------------------------------------------------

BFS_SCHEMA = pa.schema([("node_id", pa.string()), ("dist", pa.int64())])

_BFS_CG_SCHEMA = pa.schema(
    [("key", pa.string()), ("dst", pa.string()),
     ("dist", pa.int64()), ("is_label", pa.bool_())]
)
_BFS_MSG_SCHEMA = pa.schema([("node_id", pa.string()), ("dist", pa.int64())])


def _bfs_driver(
    seeds: rd.Dataset, edges: rd.Dataset, max_hops: int,
    src_col: str, dst_col: str,
) -> rd.Dataset:
    """Exact driver twin of the distributed propagation: factorized
    endpoints + one frontier-expansion numpy pass per hop. Identical
    output to the distributed path (min hop distance is unique — no
    tie-break surface), parity pinned by tests/test_graph.py."""
    import ray

    edge_schema = pa.schema([(src_col, pa.string()), (dst_col, pa.string())])
    parts = [
        p.select([src_col, dst_col]).cast(edge_schema)
        for p in ray.get(edges.select_columns([src_col, dst_col]).to_arrow_refs())
        if p.num_rows > 0
    ]
    seed_vals = np.unique(
        np.asarray(
            [str(r["node_id"]) for r in seeds.take_all()], dtype=object
        )
    )
    if not parts:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"node_id": seed_vals,
                 "dist": np.zeros(len(seed_vals), np.int64)},
                schema=BFS_SCHEMA,
            )
        )
    t = pa.concat_tables(parts)
    src = _str(pc.cast(t.column(src_col), pa.string())).to_numpy(
        zero_copy_only=False
    )
    dst = _str(pc.cast(t.column(dst_col), pa.string())).to_numpy(
        zero_copy_only=False
    )
    nodes = np.unique(np.concatenate([src, dst, seed_vals]))
    s_idx = np.searchsorted(nodes, src)
    d_idx = np.searchsorted(nodes, dst)
    sym_src = np.concatenate([s_idx, d_idx])
    sym_dst = np.concatenate([d_idx, s_idx])
    dist = np.full(len(nodes), -1, dtype=np.int64)
    seed_idx = np.searchsorted(nodes, seed_vals)
    dist[seed_idx] = 0
    frontier = np.zeros(len(nodes), dtype=bool)
    frontier[seed_idx] = True
    for h in range(1, max_hops + 1):
        cand = np.unique(sym_dst[frontier[sym_src]])
        new = cand[dist[cand] < 0]
        if len(new) == 0:
            break
        dist[new] = h
        frontier[:] = False
        frontier[new] = True
    reached = dist >= 0
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes[reached], "dist": dist[reached]},
            schema=BFS_SCHEMA,
        )
    )


def _bfs_emit_part(df: pd.DataFrame) -> pa.Table:
    """One coarse partition of the dist⋃edge cogroup keyed by the edge
    SOURCE: every reached key re-asserts its own distance and offers
    dist+1 to each neighbor; unreached keys emit nothing (the asymmetry
    vs CC's min-label kernel — BFS labels only exist once reached)."""
    if df.empty:
        return _BFS_MSG_SCHEMA.empty_table()
    lab = df.loc[df["is_label"]].groupby("key", sort=False)["dist"].min()
    if lab.empty:
        return _BFS_MSG_SCHEMA.empty_table()
    edges_part = df.loc[~df["is_label"]]
    edge_lab = lab.reindex(edges_part["key"]).to_numpy()
    m = ~np.isnan(edge_lab)
    out_nodes = np.concatenate(
        [lab.index.to_numpy(), edges_part["dst"].to_numpy()[m]]
    )
    out_dists = np.concatenate(
        [lab.to_numpy().astype(np.int64), edge_lab[m].astype(np.int64) + 1]
    )
    return pa.Table.from_pydict(
        {"node_id": out_nodes, "dist": out_dists}, schema=_BFS_MSG_SCHEMA
    )


def _bfs_min_part(t: pa.Table) -> pa.Table:
    # Arrow-native per-round min fold (runs once per BFS round per
    # partition — no pandas conversion on the hot loop's exchange).
    # Null keys are DROPPED, preserving the previous pandas groupby
    # (dropna=True) semantics — Arrow group_by would keep them.
    if t.column("node_id").null_count:
        t = t.filter(pc.is_valid(t.column("node_id")))
    if t.num_rows == 0:
        return _BFS_MSG_SCHEMA.empty_table()
    g = t.group_by(["node_id"]).aggregate([("dist", "min")])
    return pa.Table.from_pydict(
        {"node_id": g.column("node_id"),
         "dist": pc.cast(g.column("dist_min"), pa.int64())},
        schema=_BFS_MSG_SCHEMA,
    )


def bfs_hops(
    seeds: rd.Dataset,
    edges: rd.Dataset,
    *,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Multi-source BFS over an undirected view of ``edges``:
    seeds(node_id) + edges(src, dst) → (node_id, dist) for every node
    within ``max_hops`` hops of ANY seed (dist = exact minimum hop
    count; seeds at 0, duplicate seed rows collapse via the min).

    Same scale switch as pagerank/CC: edge sets at or below
    ``driver_threshold`` take the exact numpy twin; larger graphs run
    synchronous min-distance propagation — structurally CC's min-label
    loop (stages/cc) with label = hop distance and messages offering
    dist+1, one cogroup + one min-aggregate per round, labels bounded
    to a fixed P blocks per round, checksum early-exit. Rounds are
    bounded by ``max_hops``, so distances are final by construction
    (round r settles exactly the ≤r-hop frontier). Hot high-degree
    nodes are fine: the partition key is the node, per-round messages
    are degree-bounded, and the min-aggregate is a per-block combine.
    Null/absent endpoints follow the KG edge contract (non-null)."""
    from semantic_search_system_ray.stages.cc import label_checksum
    from semantic_search_system_ray.stages.util import _default_partitions

    edges = edges.materialize()
    if edges.count() <= _resolve_edges(driver_threshold):
        return _bfs_driver(seeds, edges, max_hops, src_col, dst_col)

    edges_sym = edges.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": pc.cast(t.column(src_col), pa.string()),
             "dst": pc.cast(t.column(dst_col), pa.string())}
        ),
        batch_format="pyarrow",
    )
    edges_sym = edges_sym.union(
        edges_sym.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t.column("dst"), "dst": t.column("src")}
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    labels = seeds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": pc.cast(t.column("node_id"), pa.string()),
             "dist": pa.array([0] * t.num_rows, pa.int64())},
            schema=_BFS_MSG_SCHEMA,
        ),
        batch_format="pyarrow",
    ).materialize()

    P = _default_partitions(labels, edges_sym)

    # duplicate seed rows must collapse even when no round runs
    labels = (
        coarse_partition_apply(
            labels, ["node_id"], _bfs_min_part, _BFS_MSG_SCHEMA,
            num_partitions=P, fn_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )

    def _labels_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node_id"), pa.array([""] * n, pa.string()),
             t.column("dist"), pa.array([True] * n)],
            schema=_BFS_CG_SCHEMA,
        )

    def _edges_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("src"), t.column("dst"),
             pa.array([0] * n, pa.int64()), pa.array([False] * n)],
            schema=_BFS_CG_SCHEMA,
        )

    def _as_checksum_view(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": t.column("node_id"),
             "label": pc.cast(t.column("dist"), pa.string())}
        )

    def _ck(ds: rd.Dataset) -> int:
        return label_checksum(
            ds.map_batches(_as_checksum_view, batch_format="pyarrow")
        )

    prev = _ck(labels)
    for _ in range(max_hops):
        combined = labels.map_batches(
            _labels_as_cg, batch_format="pyarrow"
        ).union(edges_sym.map_batches(_edges_as_cg, batch_format="pyarrow"))
        messages = coarse_partition_apply(
            combined, ["key"], _bfs_emit_part, _BFS_MSG_SCHEMA,
            num_partitions=P,
        )
        labels = (
            coarse_partition_apply(
                messages, ["node_id"], _bfs_min_part, _BFS_MSG_SCHEMA,
                num_partitions=P, fn_format="pyarrow",
            )
            .repartition(P)
            .materialize()
        )
        cur = _ck(labels)
        if cur == prev:
            break
        prev = cur
    return labels


# ---------------------------------------------------------------------------
# Bounded weighted shortest paths (multi-source Bellman-Ford / min-plus)


_WSP_MSG_SCHEMA = pa.schema([("node_id", pa.string()), ("dist", pa.int64())])
_WSP_CG_SCHEMA = pa.schema(
    [("key", pa.string()), ("dst", pa.string()),
     ("dist", pa.int64()), ("w", pa.int64()), ("is_label", pa.bool_())]
)


def _wsp_driver(
    seeds: rd.Dataset, edges: rd.Dataset, max_rounds: int,
    src_col: str, dst_col: str, weight_col: str,
) -> rd.Dataset:
    """Exact driver twin: factorized endpoints + one vectorized
    ``np.minimum.at`` relaxation pass per round. Identical output to the
    distributed path (min-plus over ≤K-edge paths is unique — no
    tie-break surface); parity pinned by tests/test_graph.py."""
    import ray

    cols = [src_col, dst_col, weight_col]
    parts = [
        p.select(cols)
        for p in ray.get(edges.select_columns(cols).to_arrow_refs())
        if p.num_rows > 0
    ]
    seed_vals = np.unique(
        np.asarray([str(r["node_id"]) for r in seeds.take_all()], dtype=object)
    )
    if not parts:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"node_id": seed_vals,
                 "dist": np.zeros(len(seed_vals), np.int64)},
                schema=_WSP_MSG_SCHEMA,
            )
        )
    t = pa.concat_tables(parts)
    src = _str(pc.cast(t.column(src_col), pa.string())).to_numpy(
        zero_copy_only=False
    )
    dst = _str(pc.cast(t.column(dst_col), pa.string())).to_numpy(
        zero_copy_only=False
    )
    w = pc.cast(t.column(weight_col), pa.int64()).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst, seed_vals]))
    s_idx = np.searchsorted(nodes, src)
    d_idx = np.searchsorted(nodes, dst)
    sym_src = np.concatenate([s_idx, d_idx])
    sym_dst = np.concatenate([d_idx, s_idx])
    sym_w = np.concatenate([w, w])
    INF = np.iinfo(np.int64).max
    dist = np.full(len(nodes), INF, dtype=np.int64)
    dist[np.searchsorted(nodes, seed_vals)] = 0
    for _ in range(max_rounds):
        reached = dist[sym_src] < INF
        nxt = dist.copy()
        np.minimum.at(
            nxt, sym_dst[reached], dist[sym_src[reached]] + sym_w[reached]
        )
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    m = dist < INF
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes[m], "dist": dist[m]}, schema=_WSP_MSG_SCHEMA
        )
    )


def _wsp_emit_part(df: pd.DataFrame) -> pa.Table:
    """One coarse partition of the dist⋃edge cogroup keyed by the edge
    SOURCE: every reached key re-asserts its own distance and offers
    dist + w along each incident edge (the weighted analogue of the BFS
    kernel's dist + 1)."""
    if df.empty:
        return _WSP_MSG_SCHEMA.empty_table()
    lab = df.loc[df["is_label"]].groupby("key", sort=False)["dist"].min()
    if lab.empty:
        return _WSP_MSG_SCHEMA.empty_table()
    edges_part = df.loc[~df["is_label"]]
    edge_lab = lab.reindex(edges_part["key"]).to_numpy()
    m = ~np.isnan(edge_lab)
    out_nodes = np.concatenate(
        [lab.index.to_numpy(), edges_part["dst"].to_numpy()[m]]
    )
    out_dists = np.concatenate(
        [lab.to_numpy().astype(np.int64),
         edge_lab[m].astype(np.int64) + edges_part["w"].to_numpy()[m]]
    )
    return pa.Table.from_pydict(
        {"node_id": out_nodes, "dist": out_dists}, schema=_WSP_MSG_SCHEMA
    )


def weighted_hops(
    seeds: rd.Dataset,
    edges: rd.Dataset,
    *,
    max_rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Multi-source BOUNDED weighted shortest paths over an undirected
    view of ``edges(src, dst, w:int)``: seeds(node_id) → (node_id,
    dist) = exact minimum total weight over paths of at most
    ``max_rounds`` edges from ANY seed (seeds at 0). Integer weights →
    no FP in the relaxation, so the result is bit-deterministic and has
    an exact bounded recursive-CTE SQL twin (min over ≤K-edge paths).

    Same scale switch as bfs_hops/pagerank/CC: edge sets at or below
    ``driver_threshold`` take the exact numpy twin; larger graphs run
    synchronous min-plus relaxation — one source-keyed cogroup emitting
    dist+w offers plus one per-node min per round, labels bounded to a
    fixed P blocks per round, checksum early-exit (a fixpoint of the
    monotone min-plus operator can never change again). Hot
    high-degree nodes: the partition key is the node, messages are
    degree-bounded, and the min is a per-partition vectorized combine."""
    from semantic_search_system_ray.stages.cc import label_checksum
    from semantic_search_system_ray.stages.util import _default_partitions

    edges = edges.materialize()
    if edges.count() <= _resolve_edges(driver_threshold):
        return _wsp_driver(seeds, edges, max_rounds, src_col, dst_col, weight_col)

    def norm(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"src": pc.cast(t.column(src_col), pa.string()),
             "dst": pc.cast(t.column(dst_col), pa.string()),
             "w": pc.cast(t.column(weight_col), pa.int64())}
        )

    e1 = edges.map_batches(norm, batch_format="pyarrow")
    edges_sym = e1.union(
        e1.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t.column("dst"), "dst": t.column("src"),
                 "w": t.column("w")}
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    labels = seeds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": pc.cast(t.column("node_id"), pa.string()),
             "dist": pa.array([0] * t.num_rows, pa.int64())},
            schema=_WSP_MSG_SCHEMA,
        ),
        batch_format="pyarrow",
    ).materialize()

    P = _default_partitions(labels, edges_sym)
    labels = (
        coarse_partition_apply(
            labels, ["node_id"], _bfs_min_part, _WSP_MSG_SCHEMA,
            num_partitions=P, fn_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )

    def _labels_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node_id"), pa.array([""] * n, pa.string()),
             t.column("dist"), pa.array([0] * n, pa.int64()),
             pa.array([True] * n)],
            schema=_WSP_CG_SCHEMA,
        )

    def _edges_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("src"), t.column("dst"),
             pa.array([0] * n, pa.int64()), t.column("w"),
             pa.array([False] * n)],
            schema=_WSP_CG_SCHEMA,
        )

    def _as_checksum_view(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": t.column("node_id"),
             "label": pc.cast(t.column("dist"), pa.string())}
        )

    def _ck(ds: rd.Dataset) -> int:
        return label_checksum(
            ds.map_batches(_as_checksum_view, batch_format="pyarrow")
        )

    prev = _ck(labels)
    for _ in range(max_rounds):
        combined = labels.map_batches(
            _labels_as_cg, batch_format="pyarrow"
        ).union(edges_sym.map_batches(_edges_as_cg, batch_format="pyarrow"))
        messages = coarse_partition_apply(
            combined, ["key"], _wsp_emit_part, _WSP_MSG_SCHEMA,
            num_partitions=P,
        )
        labels = (
            coarse_partition_apply(
                messages, ["node_id"], _bfs_min_part, _WSP_MSG_SCHEMA,
                num_partitions=P, fn_format="pyarrow",
            )
            .repartition(P)
            .materialize()
        )
        cur = _ck(labels)
        if cur == prev:
            break
        prev = cur
    return labels


# ---------------------------------------------------------------------------
# Bounded k-core peeling (synchronous rounds, unrolled-CTE oracle twin)


KCORE_SCHEMA = pa.schema([("node_id", pa.string()), ("deg", pa.int64())])

_KC_NODE_SCHEMA = pa.schema([("node", pa.string())])
_KC_CNT_SCHEMA = pa.schema([("node", pa.string()), ("cnt", pa.int64())])
_KC_EDGE_A_SCHEMA = pa.schema(
    [("key", pa.string()), ("other", pa.string()), ("is_alive", pa.bool_())]
)


def _und_degree_ds(und: rd.Dataset, P: int | None) -> rd.Dataset:
    """(node, cnt) over the simple undirected edge set — per-block
    endpoint count combiners → ONE coarse-partition sum."""

    def partial(t: pa.Table) -> pa.Table:
        both = pa.Table.from_pydict(
            {"node": pa.concat_arrays([_str(t.column("a")), _str(t.column("b"))])}
        )
        g = both.group_by(["node"]).aggregate([("node", "count")])
        return pa.Table.from_pydict(
            {"node": g.column("node"), "cnt": pc.cast(g.column("node_count"), pa.int64())},
            schema=_KC_CNT_SCHEMA,
        )

    def total(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _KC_CNT_SCHEMA.empty_table()
        g = df.groupby("node", sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(g, schema=_KC_CNT_SCHEMA, preserve_index=False)

    return coarse_partition_apply(
        und.map_batches(partial, batch_format="pyarrow"),
        ["node"], total, _KC_CNT_SCHEMA, num_partitions=P,
    )


def _semi_on(und: rd.Dataset, alive: rd.Dataset, col: str, P: int | None) -> rd.Dataset:
    """Semi-join: keep edges whose endpoint ``col`` ('a'|'b') appears in
    ``alive(node)`` — ONE coarse cogroup keyed on that endpoint (never a
    driver-side node set; the alive set is corpus-sized at KG scale)."""
    other = "b" if col == "a" else "a"
    out_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def edge_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [_str(t.column(col)), _str(t.column(other)),
             pa.array([False] * n)],
            schema=_KC_EDGE_A_SCHEMA,
        )

    def alive_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [_str(t.column("node")), pa.array([""] * n, pa.string()),
             pa.array([True] * n)],
            schema=_KC_EDGE_A_SCHEMA,
        )

    combined = und.map_batches(edge_rows, batch_format="pyarrow").union(
        alive.map_batches(alive_rows, batch_format="pyarrow")
    )

    def keep(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        ok = set(df.loc[df["is_alive"], "key"])
        e = df.loc[~df["is_alive"] & df["key"].isin(ok)]
        vals = {col: e["key"].to_numpy(), other: e["other"].to_numpy()}
        return pa.Table.from_pydict(
            {"a": pa.array(vals["a"], pa.string()),
             "b": pa.array(vals["b"], pa.string())},
            schema=out_schema,
        )

    return coarse_partition_apply(combined, ["key"], keep, out_schema, num_partitions=P)


def _kcore_driver(und: pa.Table, k: int, rounds: int) -> rd.Dataset:
    """Exact numpy twin of the distributed peel (factorized endpoints +
    bincount degrees); parity pinned by tests/test_graph.py."""
    a = _str(und.column("a")).to_numpy(zero_copy_only=False)
    b = _str(und.column("b")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    n = len(nodes)
    mask = np.ones(len(ai), dtype=bool)
    for _ in range(rounds):
        deg = np.bincount(ai[mask], minlength=n) + np.bincount(bi[mask], minlength=n)
        alive = deg >= k
        new = mask & alive[ai] & alive[bi]
        if int(new.sum()) == int(mask.sum()):
            break
        mask = new
    deg = np.bincount(ai[mask], minlength=n) + np.bincount(bi[mask], minlength=n)
    keep = deg >= 1
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes[keep], "deg": deg[keep].astype(np.int64)},
            schema=KCORE_SCHEMA,
        )
    )


def kcore(
    edges: rd.Dataset,
    *,
    k: int = 2,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Bounded k-core peeling over the distinct undirected simple edge
    set of ``edges``: ``rounds`` synchronous rounds, each computing
    per-node degrees in the surviving subgraph and dropping every node
    with degree < ``k`` (and its edges) → (node_id, deg) = degree of
    every node still carrying an edge after the last round. When the
    peel converges within the round budget, extra rounds are no-ops and
    this IS the classic k-core; otherwise it is the exact
    ``rounds``-step prefix — the same contract as the unrolled-CTE
    DuckDB twin (pipelines/text_oracles.sql_kg_kcore), so both sides
    are well-defined regardless of convergence. Reference analogue: the
    graph store's centrality/pruning queries run driver-side over
    NetworkX (/root/reference/knowledge_graph/knowledge_graph.py); here
    the subgraph stays a Dataset throughout.

    Scale: same switch as pagerank/BFS — edge sets at or below
    ``driver_threshold`` take the exact numpy twin; larger graphs run
    the distributed peel: per round ONE degree aggregation (per-block
    endpoint count combiners → coarse sum) and TWO cogroup semi-joins
    (endpoint a, then b) — the alive node set is never collected to the
    driver. Early exit when the surviving edge count stops changing."""
    from semantic_search_system_ray.stages.util import _default_partitions

    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    if und.count() <= _resolve_edges(driver_threshold):
        parts = [p for p in und.to_arrow_refs()]
        import ray

        tables = [t for t in ray.get(parts) if t.num_rows > 0]
        if not tables:
            return rd.from_arrow(KCORE_SCHEMA.empty_table())
        return _kcore_driver(pa.concat_tables(tables), k, rounds)

    P = _default_partitions(und, und)
    prev_edges = und.count()
    for _ in range(rounds):
        deg = _und_degree_ds(und, P)
        alive = deg.filter(expr=f"cnt >= {k}")
        und = _semi_on(und, alive, "a", P)
        und = _semi_on(und, alive, "b", P).materialize()
        cur = und.count()
        if cur == prev_edges:
            break
        prev_edges = cur
    deg = _und_degree_ds(und, P).materialize()
    return deg.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": t.column("node"), "deg": t.column("cnt")},
            schema=KCORE_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# label-propagation communities (synchronous, fixed rounds, min-label ties)
# --------------------------------------------------------------------------


LPA_SCHEMA = pa.schema([("node_id", pa.string()), ("community", pa.string())])

_LPA_ADJ_SCHEMA = pa.schema([("node", pa.string()), ("other", pa.string())])
_LPA_LAB_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])
_LPA_NLC_SCHEMA = pa.schema(
    [("node", pa.string()), ("label", pa.string()), ("c", pa.int64())]
)


def _lpa_driver(und: pa.Table, rounds: int) -> rd.Dataset:
    """Exact numpy twin of the distributed propagation (factorized
    endpoints + segment mode); parity pinned by tests/test_graph.py.
    Labels are node INDICES into the sorted node array, so "smallest
    label" in index space equals smallest label string in byte order."""
    a = _str(und.column("a")).to_numpy(zero_copy_only=False)
    b = _str(und.column("b")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    lab = np.arange(len(nodes), dtype=np.int64)
    for _ in range(rounds):
        nl = lab[dst]
        order = np.lexsort((nl, src))
        s, l = src[order], nl[order]
        brk = np.concatenate(
            [[True], (s[1:] != s[:-1]) | (l[1:] != l[:-1])]
        )
        idx = np.nonzero(brk)[0]
        gs, gl = s[idx], l[idx]
        counts = np.diff(np.concatenate([idx, [len(s)]]))
        # per node: max count first, then smallest label
        o2 = np.lexsort((gl, -counts, gs))
        gs2 = gs[o2]
        first = np.concatenate([[True], gs2[1:] != gs2[:-1]])
        new = lab.copy()
        new[gs2[first]] = gl[o2][first]
        lab = new
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes, "community": nodes[lab]}, schema=LPA_SCHEMA
        )
    )


def label_propagation(
    edges: rd.Dataset,
    *,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    made deterministic) over the distinct undirected simple edge set of
    ``edges``: every node starts labeled with its own id; each of the
    fixed ``rounds`` rounds relabels EVERY node with the most frequent
    label among its neighbors, ties broken by the SMALLEST label (binary
    string order — same collation convention as kcore's least/greatest).
    Self-label is not counted (pure neighbor mode; every node in the
    edge set has >= 1 neighbor, so each round is total). Output:
    (node_id, community = label after the last round). Synchronous LPA
    can oscillate on bipartite structures, so the contract is the exact
    ``rounds``-step prefix — identical to the unrolled-CTE DuckDB twin
    (pipelines/text_oracles.sql_kg_communities), well-defined with or
    without convergence. Reference analogue: community queries run
    driver-side over the graph store
    (/root/reference/knowledge_graph/knowledge_graph.py); here labels
    and adjacency stay Datasets throughout.

    Scale: same switch as pagerank/kcore — edge sets at or below
    ``driver_threshold`` take the exact numpy twin; larger graphs run
    the distributed rounds: per round ONE label attach onto the static
    adjacency (coarse_attach — broadcast when the label table is small,
    hash-partitioned cogroup otherwise) and ONE mode aggregation
    (per-block (node, label) count combiners → coarse per-node argmax).
    The label table is never collected to the driver."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
    )

    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    if und.count() <= _resolve_edges(driver_threshold):
        import ray

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows > 0]
        if not tables:
            return rd.from_arrow(LPA_SCHEMA.empty_table())
        return _lpa_driver(pa.concat_tables(tables), rounds)

    P = _default_partitions(und, und)

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "node": pa.concat_arrays(
                    [_str(t.column("a")), _str(t.column("b"))]
                ),
                "other": pa.concat_arrays(
                    [_str(t.column("b")), _str(t.column("a"))]
                ),
            },
            schema=_LPA_ADJ_SCHEMA,
        )

    adj = und.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def init_labels(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LPA_LAB_SCHEMA.empty_table()
        u = df["node"].drop_duplicates()
        return pa.Table.from_pydict(
            {"node": pa.array(u, pa.string()), "label": pa.array(u, pa.string())},
            schema=_LPA_LAB_SCHEMA,
        )

    labels = coarse_partition_apply(
        adj.select_columns(["node"]).map_batches(
            lambda t: t.group_by(["node"]).aggregate([]),
            batch_format="pyarrow",
        ),
        ["node"], init_labels, _LPA_LAB_SCHEMA, num_partitions=P,
    ).materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["node", "label"]).aggregate([("label", "count")])
        return pa.Table.from_pydict(
            {
                "node": g.column("node"),
                "label": g.column("label"),
                "c": pc.cast(g.column("label_count"), pa.int64()),
            },
            schema=_LPA_NLC_SCHEMA,
        )

    def mode_per_node(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LPA_LAB_SCHEMA.empty_table()
        g = (
            df.groupby(["node", "label"], sort=False)["c"].sum().reset_index()
        )
        g = g.sort_values(
            ["node", "c", "label"], ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates(subset="node")
        return pa.Table.from_pandas(
            g[["node", "label"]], schema=_LPA_LAB_SCHEMA, preserve_index=False
        )

    for _ in range(rounds):
        attached = coarse_attach(
            adj, labels,
            left_key="other", right_key="node",
            attach_cols=["label"],
            out_schema=_LPA_LAB_SCHEMA,
            num_partitions=P, how="inner",
        )
        labels = coarse_partition_apply(
            attached.map_batches(partial_counts, batch_format="pyarrow"),
            ["node"], mode_per_node, _LPA_LAB_SCHEMA, num_partitions=P,
        ).materialize()

    return labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": t.column("node"), "community": t.column("label")},
            schema=LPA_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities (deterministic integer recurrence)
# --------------------------------------------------------------------------

HITS_SCHEMA = pa.schema(
    [("node_id", pa.string()), ("hub", pa.int64()), ("auth", pa.int64())]
)
_HITS_E_SCHEMA = pa.schema([("s", pa.string()), ("d", pa.string())])
_HITS_SV_SCHEMA = pa.schema([("node", pa.string()), ("v", pa.int64())])


def _hits_driver(e: pa.Table, rounds: int, scale: int) -> rd.Dataset:
    """Exact numpy twin of the distributed HITS recurrence (factorized
    endpoints + unordered integer scatter-adds — int64 addition is
    associative, so block layout never changes the result); parity
    pinned by tests/test_graph.py across both regimes."""
    s = _str(e.column("s")).to_numpy(zero_copy_only=False)
    d = _str(e.column("d")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([s, d]))
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    n = len(nodes)
    a = np.full(n, scale, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    for _ in range(rounds):
        hr = np.zeros(n, dtype=np.int64)
        np.add.at(hr, si, a[di])
        h = hr * scale // hr.max()
        ar = np.zeros(n, dtype=np.int64)
        np.add.at(ar, di, h[si])
        a = ar * scale // ar.max()
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes, "hub": h, "auth": a}, schema=HITS_SCHEMA
        )
    )


def hits(
    edges: rd.Dataset,
    *,
    rounds: int = 3,
    scale: int = DEFAULT_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Deterministic integer HITS (Kleinberg 1999) over the DISTINCT
    directed simple edge set of ``edges`` (parallel edges and self-loops
    dropped): auth starts at ``scale`` for every node; each of the fixed
    ``rounds`` rounds computes

        hub_raw(u)  = Σ_{u→v} auth(v)        (0 when u has no out-edges)
        hub(u)      = hub_raw(u)·scale // max_w hub_raw(w)
        auth_raw(v) = Σ_{u→v} hub(u)         (0 when v has no in-edges)
        auth(v)     = auth_raw(v)·scale // max_w auth_raw(w)

    — all floor arithmetic on non-negative int64, so the result is
    independent of summation order / block layout / parallelism and has
    an exact unrolled-CTE DuckDB twin (text_oracles.sql_kg_hits). The
    max-normalization keeps every score in [0, scale]; per-round sums
    are ≤ max_degree·scale and the normalization product ≤
    max_degree·scale², so int64 holds to ~9e6 max degree at the default
    scale=1e6 (multiply_checked raises loudly beyond). The max is never
    0 on a non-empty edge set: round 1's hub_raw hits scale·outdeg at
    some node, and every later max-score node passes ≥ scale to a
    neighbor. Output: (node_id, hub, auth) after the last round, every
    endpoint node present.

    Reference analogue: hub/authority-style queries run driver-side over
    the graph store (/root/reference/knowledge_graph/knowledge_graph.py);
    here scores and edges stay Datasets throughout.

    Scale: same switch as pagerank/kcore/LPA — edge sets at or below
    ``driver_threshold`` take the exact numpy twin; larger graphs run
    the distributed recurrence, where each half-round is ONE score
    attach onto the static edge set (coarse_attach) and ONE per-node sum
    (per-block Arrow sum combiners → coarse partition sum, LEFT-union
    with the zero row of every node), plus a tiny scalar ``max()``
    aggregate for the normalization — scores never driver-collect."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
    )

    def norm_e(t: pa.Table) -> pa.Table:
        tt = pa.Table.from_pydict(
            {"s": _str(t.column(src_col)), "d": _str(t.column(dst_col))}
        )
        tt = tt.filter(pc.not_equal(tt.column("s"), tt.column("d")))
        return tt.group_by(["s", "d"]).aggregate([])

    def part_distinct(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _HITS_E_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            df.drop_duplicates(), schema=_HITS_E_SCHEMA, preserve_index=False
        )

    e = coarse_partition_apply(
        edges.map_batches(norm_e, batch_format="pyarrow"),
        ["s", "d"], part_distinct, _HITS_E_SCHEMA,
    ).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(HITS_SCHEMA.empty_table())
    if n_edges <= _resolve_edges(driver_threshold):
        import ray

        tables = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows > 0]
        return _hits_driver(pa.concat_tables(tables), rounds, scale)

    P = _default_partitions(e)
    e = e.repartition(P).materialize()
    nodes = _distinct_nodes(e, "s", "d", num_partitions=P).repartition(
        P
    ).materialize()

    def init_scale(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": _str(t.column("node_id")),
             "v": pa.nulls(t.num_rows, pa.int64()).fill_null(scale)},
            schema=_HITS_SV_SCHEMA,
        )

    def zeros(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": _str(t.column("node_id")),
             "v": pa.nulls(t.num_rows, pa.int64()).fill_null(0)},
            schema=_HITS_SV_SCHEMA,
        )

    def sum_node(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _HITS_SV_SCHEMA.empty_table()
        agg = df.groupby("node", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pydict(
            # v rides the null-bearing cogroup union as float64 — exact
            # < 2^53 (sums ≤ max_degree·scale; see overflow note above)
            {"node": agg["node"].to_numpy(),
             "v": agg["v"].to_numpy().astype(np.int64)},
            schema=_HITS_SV_SCHEMA,
        )

    def half_round(scores: rd.Dataset, join_key: str, sum_key: str) -> rd.Dataset:
        att_schema = pa.schema([(sum_key, pa.string()), ("v", pa.int64())])
        attached = coarse_attach(
            e, scores,
            left_key=join_key, right_key="node",
            attach_cols=["v"], out_schema=att_schema,
            num_partitions=P, how="inner",
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by([sum_key]).aggregate([("v", "sum")])
            return pa.Table.from_pydict(
                {"node": _str(g.column(sum_key)),
                 "v": pc.cast(g.column("v_sum"), pa.int64())},
                schema=_HITS_SV_SCHEMA,
            )

        raw = coarse_partition_apply(
            attached.map_batches(partial, batch_format="pyarrow").union(
                nodes.map_batches(zeros, batch_format="pyarrow")
            ),
            ["node"], sum_node, _HITS_SV_SCHEMA, num_partitions=P,
        ).repartition(P).materialize()
        mx = raw.max("v")

        def normalize(t: pa.Table) -> pa.Table:
            v = pc.cast(t.column("v"), pa.int64()).combine_chunks()
            scaled = pc.multiply_checked(v, pa.scalar(scale, pa.int64()))
            # Arrow integer divide truncates; all values non-negative,
            # so truncation == floor == the numpy twin's //
            return pa.Table.from_pydict(
                {"node": t.column("node"),
                 "v": pc.divide(scaled, pa.scalar(int(mx), pa.int64()))},
                schema=_HITS_SV_SCHEMA,
            )

        return raw.map_batches(normalize, batch_format="pyarrow")

    a = nodes.map_batches(init_scale, batch_format="pyarrow").materialize()
    h = a
    for _ in range(rounds):
        h = half_round(a, join_key="d", sum_key="s").materialize()
        a = half_round(h, join_key="s", sum_key="d").materialize()

    def as_hub(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": t.column("node"), "hub": t.column("v")},
            schema=pa.schema([("node", pa.string()), ("hub", pa.int64())]),
        )

    out = coarse_attach(
        h.map_batches(as_hub, batch_format="pyarrow"), a,
        left_key="node", right_key="node",
        attach_cols=["v"], attach_as=["auth"],
        out_schema=pa.schema(
            [("node", pa.string()), ("hub", pa.int64()), ("auth", pa.int64())]
        ),
        num_partitions=P, how="inner",
    )
    return out.map_batches(
        lambda t: t.rename_columns(["node_id", "hub", "auth"]),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# global clustering coefficient (triangles over wedges)
# --------------------------------------------------------------------------

CLUSTERING_SCHEMA = pa.schema(
    [("triangles", pa.int64()), ("wedges", pa.int64()),
     ("global_cc", pa.float64())]
)


def clustering_coefficient(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """Global clustering coefficient of the undirected simple graph
    underlying ``edges``: 3·triangles / wedges, wedges = Σ_v C(deg_v, 2).
    Triangles reuse the degree-oriented distributed counter
    (``triangle_count``); wedges are one per-block Σ C(deg,2) combiner
    over the degree table (each node appears exactly once per coarse
    partition) plus a scalar sum. Both operands stay EXACT int64; the
    single float divide is mirrored verbatim in the SQL twin
    (text_oracles.sql_kg_clustering). Returns one row
    (triangles, wedges, global_cc)."""
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    tri = int(
        triangle_count(und, src_col="a", dst_col="b")
        .column("triangles")[0].as_py()
    )
    deg = degree_table(und, src_col="a", dst_col="b")

    def wpart(t: pa.Table) -> pa.Table:
        d = pc.add(
            pc.cast(t.column("out_degree"), pa.int64()),
            pc.cast(t.column("in_degree"), pa.int64()),
        ).to_numpy(zero_copy_only=False)
        w = int((d * (d - 1) // 2).sum()) if len(d) else 0
        return pa.Table.from_pydict({"w": pa.array([w], pa.int64())})

    wedges = int(
        deg.map_batches(wpart, batch_format="pyarrow").sum("w") or 0
    )
    cc = (
        0.0 if wedges == 0
        else np.float64(3 * tri) / np.float64(wedges)
    )
    return pa.Table.from_pydict(
        {"triangles": pa.array([tri], pa.int64()),
         "wedges": pa.array([wedges], pa.int64()),
         "global_cc": pa.array([float(cc)], pa.float64())},
        schema=CLUSTERING_SCHEMA,
    )


# --------------------------------------------------------------------------
# strongly connected components (directed; EXACT, scale-switched)
# --------------------------------------------------------------------------


SCC_SCHEMA = pa.schema([("node_id", pa.string()), ("scc", pa.string())])

_SCC_E_SCHEMA = pa.schema([("s", pa.string()), ("d", pa.string())])


def _distinct_directed_edges(
    edges: rd.Dataset, src_col: str, dst_col: str
) -> rd.Dataset:
    """DISTINCT directed simple edge set (parallel edges and self-loops
    dropped — a self-loop never changes SCC membership): per-block Arrow
    distinct combiners, then one coarse-partition dedup (the hits() edge
    prep, shared)."""

    def norm_e(t: pa.Table) -> pa.Table:
        tt = pa.Table.from_pydict(
            {"s": _str(t.column(src_col)), "d": _str(t.column(dst_col))}
        )
        tt = tt.filter(pc.not_equal(tt.column("s"), tt.column("d")))
        return tt.group_by(["s", "d"]).aggregate([])

    def part_distinct(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SCC_E_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            df.drop_duplicates(), schema=_SCC_E_SCHEMA, preserve_index=False
        )

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    return coarse_partition_apply(
        edges.map_batches(norm_e, batch_format="pyarrow"),
        ["s", "d"], part_distinct, _SCC_E_SCHEMA,
    )


def _scc_driver(e: pa.Table) -> rd.Dataset:
    """Exact driver twin: iterative Tarjan over factorized endpoint
    indices (CSR adjacency; explicit work stack — no recursion, so deep
    chains can't blow the interpreter stack). Component label = the
    lexicographically smallest member, matching the distributed
    coloring algorithm's root labels bit-for-bit (parity pytested)."""
    s = _str(e.column("s")).to_numpy(zero_copy_only=False)
    d = _str(e.column("d")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([s, d]))
    n = len(nodes)
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    order = np.argsort(si, kind="stable")
    si, di = si[order], di[order]
    indptr = np.searchsorted(si, np.arange(n + 1))

    UNSET = -1
    index = np.full(n, UNSET, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    stack: list[int] = []
    scc_of = np.full(n, UNSET, dtype=np.int64)
    counter = 0
    for root in range(n):
        if index[root] != UNSET:
            continue
        work = [(root, 0)]
        while work:
            v, ei = work[-1]
            if ei == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            for i in range(indptr[v] + ei, indptr[v + 1]):
                w = int(di[i])
                if index[w] == UNSET:
                    work[-1] = (v, i - indptr[v] + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w] and index[w] < low[v]:
                    low[v] = index[w]
            if advanced:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                # nodes[] is sorted, so min index == lexicographic min
                label = min(comp)
                for w in comp:
                    scc_of[w] = label
            work.pop()
            if work:
                u, _ = work[-1]
                if low[v] < low[u]:
                    low[u] = low[v]
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes, "scc": nodes[scc_of]}, schema=SCC_SCHEMA
        )
    )


def _scc_distributed(
    nodes: rd.Dataset,
    e: rd.Dataset,
    *,
    max_outer: int,
    max_rounds: int,
    P: int,
) -> rd.Dataset:
    """Distributed coloring SCC (Orzan 2004 / FW-coloring): each outer
    round (1) forward min-propagates ``color(v) = min node that reaches
    v`` to a VERIFIED fixpoint, (2) backward-marks, within same-color
    edges only, every node that can reach its color root (lossless: any
    v→…→root path in the full graph stays inside color(v)'s class — a
    smaller-colored node on the path would force color(v) below its
    root), (3) assigns ``scc = color`` to marked nodes and removes them.
    Every pass is cc.min_label_fixpoint cogroups + coarse attaches —
    node/label sets never drive-collect. Worst case (a chain sorted
    against edge direction) needs O(n) outer rounds — the classic bound
    for coloring SCC — so the budget raises loudly rather than
    truncating; real KGs drain in a handful of rounds."""
    from semantic_search_system_ray.stages.cc import min_label_fixpoint
    from semantic_search_system_ray.stages.util import (
        coarse_anti_join,
        coarse_attach,
    )

    _NODE_SCHEMA = pa.schema([("node", pa.string())])
    _ATT1 = pa.schema(
        [("s", pa.string()), ("d", pa.string()), ("cs", pa.string())]
    )
    _ATT2 = pa.schema(
        [("s", pa.string()), ("d", pa.string()),
         ("cs", pa.string()), ("cd", pa.string())]
    )
    _JOIN = pa.schema(
        [("node", pa.string()), ("label", pa.string()), ("m", pa.string())]
    )

    def ident_labels(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": t.column("node"), "label": t.column("node")}
        )

    def swap(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"src": t.column("d"), "dst": t.column("s")}
        )

    def fwd(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"src": t.column("s"), "dst": t.column("d")}
        )

    def mark_init(t: pa.Table) -> pa.Table:
        node = pc.cast(t.column("node"), pa.string()).combine_chunks()
        lab = pc.cast(t.column("label"), pa.string()).combine_chunks()
        is_root = pc.equal(node, lab)
        return pa.Table.from_pydict(
            {"node": node,
             "label": pc.if_else(is_root, pa.scalar("", pa.string()), node)}
        )

    actives = nodes.materialize()
    e = e.materialize()
    done: list[rd.Dataset] = []
    for _ in range(max_outer):
        if actives.count() == 0:
            break
        # (1) forward coloring: v pulls min from in-neighbors → swapped
        # edge rows under the fixpoint's pull-from-dst convention
        colors = min_label_fixpoint(
            actives.map_batches(ident_labels, batch_format="pyarrow"),
            e.map_batches(swap, batch_format="pyarrow"),
            max_rounds=max_rounds, num_partitions=P,
            require_convergence=True,
        )
        # (2) same-color edge subgraph
        att = coarse_attach(
            e, colors, left_key="s", right_key="node",
            attach_cols=["label"], attach_as=["cs"],
            out_schema=_ATT1, num_partitions=P, how="inner",
        )
        att = coarse_attach(
            att, colors, left_key="d", right_key="node",
            attach_cols=["label"], attach_as=["cd"],
            out_schema=_ATT2, num_partitions=P, how="inner",
        )
        same = att.map_batches(
            lambda t: t.filter(
                pc.equal(t.column("cs"), t.column("cd"))
            ).select(["s", "d"]),
            batch_format="pyarrow",
        )
        # backward marking: v pulls along v→w (natural orientation);
        # roots' "" sentinel (minimal string) flows to everything that
        # reaches a root within its class
        marked = min_label_fixpoint(
            colors.map_batches(mark_init, batch_format="pyarrow"),
            same.map_batches(fwd, batch_format="pyarrow"),
            max_rounds=max_rounds, num_partitions=P,
            require_convergence=True,
        )
        # (3) assign + shrink
        joined = coarse_attach(
            colors, marked, left_key="node", right_key="node",
            attach_cols=["label"], attach_as=["m"],
            out_schema=_JOIN, num_partitions=P, how="inner",
        ).map_batches(
            lambda t: t.filter(pc.equal(t.column("m"), pa.scalar(""))),
            batch_format="pyarrow",
        ).materialize()
        done.append(
            joined.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"node_id": t.column("node"), "scc": t.column("label")},
                    schema=SCC_SCHEMA,
                ),
                batch_format="pyarrow",
            ).materialize()
        )
        assigned = joined.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t.column("node")}, schema=_NODE_SCHEMA
            ),
            batch_format="pyarrow",
        )
        actives = coarse_anti_join(
            actives, assigned, left_key="node", right_key="node",
            out_schema=_NODE_SCHEMA, num_partitions=P,
        ).materialize()
        e_ab = e.map_batches(
            lambda t: pa.Table.from_pydict(
                {"a": t.column("s"), "b": t.column("d")}
            ),
            batch_format="pyarrow",
        )
        e_ab = _semi_on(e_ab, actives, "a", P)
        e_ab = _semi_on(e_ab, actives, "b", P)
        e = e_ab.map_batches(
            lambda t: pa.Table.from_pydict(
                {"s": t.column("a"), "d": t.column("b")},
                schema=_SCC_E_SCHEMA,
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        if actives.count() > 0:
            raise RuntimeError(
                f"scc_labels: active nodes remain after max_outer={max_outer} "
                "coloring rounds (pathological chain ordering?); raise the "
                "outer budget"
            )
    if not done:
        return rd.from_arrow(SCC_SCHEMA.empty_table())
    out = done[0]
    for part in done[1:]:
        out = out.union(part)
    return out


def scc_labels(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
    max_outer: int = 50,
    max_rounds: int = 64,
) -> rd.Dataset:
    """EXACT strongly connected components of the directed graph under
    ``edges`` → (node_id, scc) where ``scc`` is the lexicographically
    smallest member of the component — a pure graph property (no
    fixed-round prefix semantics: both regimes compute true SCC, and the
    distributed fixpoints verify convergence or raise). Oracle:
    mutual-reachability recursive CTE over the same edge set
    (text_oracles.sql_kg_scc). Reference analogue: component-style
    queries run driver-side over the NetworkX store
    (/root/reference/knowledge_graph/knowledge_graph.py); here the node
    and label sets stay Datasets on the distributed path.

    Scale: same switch as pagerank/kcore/LPA/HITS — edge sets at or
    below ``driver_threshold`` take the exact iterative-Tarjan driver
    twin (one pass, no shuffles); larger graphs run the distributed
    coloring algorithm (see ``_scc_distributed``). Regime parity is
    pytested on cyclic/dag/interlocking graphs with a forced
    threshold."""
    from semantic_search_system_ray.stages.util import _default_partitions

    e = _distinct_directed_edges(edges, src_col, dst_col).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(SCC_SCHEMA.empty_table())
    if n_edges <= _resolve_edges(driver_threshold):
        import ray

        tables = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows > 0]
        return _scc_driver(pa.concat_tables(tables))
    P = _default_partitions(e)
    e = e.repartition(P).materialize()
    nodes = _distinct_nodes(e, "s", "d", num_partitions=P).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    return _scc_distributed(
        nodes, e, max_outer=max_outer, max_rounds=max_rounds, P=P
    )


# --------------------------------------------------------------------------
# condensation DAG + longest-path topological levels
# --------------------------------------------------------------------------

CONDENSATION_SCHEMA = pa.schema(
    [("src_scc", pa.string()), ("dst_scc", pa.string())]
)

_COND_ATT1 = pa.schema(
    [("s", pa.string()), ("d", pa.string()), ("cs", pa.string())]
)
_COND_ATT2 = pa.schema(
    [("s", pa.string()), ("d", pa.string()),
     ("cs", pa.string()), ("cd", pa.string())]
)


def condensation(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Condensation of the directed graph: contract every strongly
    connected component (scc_labels — exact, scale-switched) to one node
    labeled by its lexicographically smallest member, and emit the
    DISTINCT inter-component edge set (src_scc, dst_scc). Acyclic by
    construction — the classic reduction that turns cyclic reachability
    problems into DAG problems. Reference analogue: component-level
    views are driver-side NetworkX walks
    (/root/reference/knowledge_graph/knowledge_graph.py); here the
    contraction is two coarse attaches over the label Dataset.

    Scale: inherits scc_labels' regime switch; the contraction itself is
    two hash-partitioned attaches plus a distinct — no driver
    materialization on the distributed path."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
    )

    e = _distinct_directed_edges(edges, src_col, dst_col).materialize()
    if e.count() == 0:
        return rd.from_arrow(CONDENSATION_SCHEMA.empty_table())
    labels = scc_labels(
        e, src_col="s", dst_col="d", driver_threshold=driver_threshold
    ).materialize()
    P = _default_partitions(e)
    att = coarse_attach(
        e, labels, left_key="s", right_key="node_id",
        attach_cols=["scc"], attach_as=["cs"],
        out_schema=_COND_ATT1, num_partitions=P, how="inner",
    )
    att = coarse_attach(
        att, labels, left_key="d", right_key="node_id",
        attach_cols=["scc"], attach_as=["cd"],
        out_schema=_COND_ATT2, num_partitions=P, how="inner",
    )

    def contract(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t.column("cs"), t.column("cd")))
        tt = pa.Table.from_pydict(
            {"src_scc": keep.column("cs"), "dst_scc": keep.column("cd")}
        )
        return tt.group_by(["src_scc", "dst_scc"]).aggregate([])

    def part_distinct(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return CONDENSATION_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            df.drop_duplicates(), schema=CONDENSATION_SCHEMA,
            preserve_index=False,
        )

    return coarse_partition_apply(
        att.map_batches(contract, batch_format="pyarrow"),
        ["src_scc", "dst_scc"], part_distinct, CONDENSATION_SCHEMA,
        num_partitions=P,
    )


TOPO_SCHEMA = pa.schema([("node_id", pa.string()), ("level", pa.int64())])


_LEV_SCHEMA = pa.schema([("node", pa.string()), ("level", pa.int64())])
_LEV_ATT = pa.schema(
    [("s", pa.string()), ("d", pa.string()), ("lev", pa.int64())]
)


def _dag_levels_driver(e: pa.Table) -> rd.Dataset:
    """Exact driver twin: Kahn topological order with longest-path DP
    over factorized endpoints; raises on a cycle (some node never
    reaches in-degree 0)."""
    s = _str(e.column("s")).to_numpy(zero_copy_only=False)
    d = _str(e.column("d")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([s, d]))
    n = len(nodes)
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    order = np.argsort(si, kind="stable")
    si_s, di_s = si[order], di[order]
    indptr = np.searchsorted(si_s, np.arange(n + 1))
    indeg = np.bincount(di, minlength=n)
    level = np.zeros(n, dtype=np.int64)
    frontier = list(np.flatnonzero(indeg == 0))
    seen = 0
    while frontier:
        v = frontier.pop()
        seen += 1
        for i in range(indptr[v], indptr[v + 1]):
            w = int(di_s[i])
            if level[v] + 1 > level[w]:
                level[w] = level[v] + 1
            indeg[w] -= 1
            if indeg[w] == 0:
                frontier.append(w)
    if seen != n:
        raise RuntimeError(
            "dag_levels: input graph contains a cycle (longest-path "
            "levels are undefined); condense SCCs first"
        )
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": nodes, "level": level}, schema=TOPO_SCHEMA
        )
    )


def dag_levels(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
    max_rounds: int = 64,
) -> rd.Dataset:
    """Longest-path topological layering of a DAG → (node_id, level)
    where level(v) = the longest directed path ending at v (sources sit
    at level 0) — the canonical "stage number" for scheduling a
    dependency DAG. A pure graph property: both regimes compute the true
    fixpoint, and a cycle RAISES (driver: Kahn leaves nodes unseen;
    distributed: levels keep rising past the round budget) — never a
    silently-truncated prefix. Node domain = endpoints of the distinct
    simple edge set (isolated nodes carry no edge and are absent, same
    convention as the other edge-derived ops).

    Distributed regime: iterative max-propagation — each round attaches
    level(src) to every edge, folds (dst, level+1) messages with a
    coarse per-node max, and stops at the verified fixpoint. Levels are
    MONOTONE nondecreasing under this update, so the global level-sum is
    an exact convergence certificate (unchanged sum ⇔ no label moved);
    rounds needed = DAG depth."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
    )

    e = _distinct_directed_edges(edges, src_col, dst_col).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(TOPO_SCHEMA.empty_table())
    if n_edges <= _resolve_edges(driver_threshold):
        import ray

        tables = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows > 0]
        return _dag_levels_driver(pa.concat_tables(tables))
    P = _default_partitions(e)
    e = e.repartition(P).materialize()

    def init_levels(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": t.column("node_id"),
             "level": pa.array(np.zeros(t.num_rows, np.int64), pa.int64())},
            schema=_LEV_SCHEMA,
        )

    def max_part(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("node", as_index=False, sort=False)["level"].max()
        return pa.Table.from_pandas(
            g, schema=_LEV_SCHEMA, preserve_index=False
        )

    nodes = _distinct_nodes(e, "s", "d", num_partitions=P).map_batches(
        lambda t: t.rename_columns(["node_id"]), batch_format="pyarrow"
    )
    levels = nodes.map_batches(init_levels, batch_format="pyarrow").materialize()
    prev_sum = levels.sum("level", ignore_nulls=True) or 0
    converged = False
    for _ in range(max_rounds):
        msgs = coarse_attach(
            e, levels, left_key="s", right_key="node",
            attach_cols=["level"], attach_as=["lev"],
            out_schema=_LEV_ATT, num_partitions=P, how="inner",
        ).map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t.column("d"),
                 "level": pc.add_checked(
                     pc.cast(t.column("lev"), pa.int64()),
                     pa.scalar(1, pa.int64()))},
                schema=_LEV_SCHEMA,
            ),
            batch_format="pyarrow",
        )
        levels = coarse_partition_apply(
            levels.union(msgs), ["node"], max_part, _LEV_SCHEMA,
            num_partitions=P,
        ).repartition(P).materialize()
        cur_sum = levels.sum("level", ignore_nulls=True) or 0
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"dag_levels: levels still rising after max_rounds={max_rounds} "
            "- the input graph contains a cycle (condense SCCs first) or "
            "the DAG is deeper than the round budget"
        )
    return levels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": t.column("node"), "level": t.column("level")},
            schema=TOPO_SCHEMA,
        ),
        batch_format="pyarrow",
    )


def condensation_levels(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
    max_rounds: int = 64,
) -> rd.Dataset:
    """Topological longest-path levels of the CONDENSATION: contract
    SCCs (exact), then layer the resulting DAG → (node_id=scc label,
    level). The composition is total on any directed graph — the
    condensation is acyclic by construction, so dag_levels' cycle guard
    is purely defensive here."""
    return dag_levels(
        condensation(
            edges, src_col=src_col, dst_col=dst_col,
            driver_threshold=driver_threshold,
        ),
        src_col="src_scc", dst_col="dst_scc",
        driver_threshold=driver_threshold, max_rounds=max_rounds,
    )


# --------------------------------------------------------------------------
# link prediction: common-neighbors / preferential-attachment /
# resource-allocation over non-edges
# --------------------------------------------------------------------------

LINKPRED_SCHEMA = pa.schema(
    [("node_a", pa.string()), ("node_b", pa.string()),
     ("common", pa.int64()), ("pref_attach", pa.int64()),
     ("ra", pa.int64())]
)

_LP_WEDGE_SCHEMA = pa.schema(
    [("x", pa.string()), ("y", pa.string()),
     ("cnt", pa.int64()), ("ra", pa.int64())]
)


def _lp_wedge_partials(df: pd.DataFrame) -> pa.Table:
    """Per-apex co-neighbor pairs carrying the apex's resource-allocation
    contribution SCALE // deg(apex) — numpy triu pair enumeration per
    apex group, count/ra-combined within the partition into lean
    (x, y, cnt, ra) rows."""
    if df.empty:
        return _LP_WEDGE_SCHEMA.empty_table()
    xs, ys, ras = [], [], []
    for (_u, degu), g in df.groupby(["u", "degu"], sort=False):
        ns = np.sort(g["v"].to_numpy())
        m = len(ns)
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, 1)
        xs.append(ns[ii])
        ys.append(ns[jj])
        ras.append(np.full(len(ii), DEFAULT_SCALE // int(degu), np.int64))
    if not xs:
        return _LP_WEDGE_SCHEMA.empty_table()
    part = (
        pd.DataFrame({"x": np.concatenate(xs), "y": np.concatenate(ys),
                      "ra": np.concatenate(ras)})
        .groupby(["x", "y"], sort=False)
        .agg(cnt=("ra", "size"), ra=("ra", "sum"))
        .reset_index()
    )
    return pa.Table.from_pandas(
        part[["x", "y", "cnt", "ra"]], schema=_LP_WEDGE_SCHEMA,
        preserve_index=False,
    )


LINKPRED_DRIVER_NODE_THRESHOLD = 8192


def _dense_adjacency(und: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(sorted node labels, boolean float64 adjacency) from an (a, b)
    simple-edge table — shared by the dense twins."""
    a = _str(und.column("a")).to_numpy(zero_copy_only=False)
    b = _str(und.column("b")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    n = len(nodes)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    A = np.zeros((n, n), dtype=np.float64)
    A[ai, bi] = 1.0
    A[bi, ai] = 1.0
    return nodes, A


def _row_blocks(n: int, n_tasks: int) -> list[tuple[int, int]]:
    bounds = np.linspace(0, n, n_tasks + 1).astype(np.int64)
    return [(int(bounds[i]), int(bounds[i + 1]))
            for i in range(n_tasks) if bounds[i] < bounds[i + 1]]


def _n_matmul_tasks() -> int:
    import ray

    return max(1, int(ray.cluster_resources().get("CPU", 8)))


def _lp_block_kernel(A, share, lo, hi, k):
    """Per-row-block link-prediction candidates: two (hi-lo) x n BLAS
    products against the broadcast adjacency, masked to strictly-upper
    non-edge pairs with >=1 common neighbor, block-local top-k by
    (ra DESC, i, j). Every value integer-exact in float64."""
    blk = A[lo:hi]
    common = blk @ A
    ra = (blk * share[None, :]) @ A  # ra[x,y] = sum_z A[x,z]*share[z]*A[z,y]
    cols = np.arange(A.shape[1])[None, :]
    rows = np.arange(lo, hi)[:, None]
    keep = (cols > rows) & (blk == 0) & (common > 0)
    ii, jj = np.nonzero(keep)
    ras = ra[ii, jj].astype(np.int64)
    order = np.lexsort((jj, ii + lo, -ras))[:k]
    ii, jj = ii[order], jj[order]
    return (ii + lo, jj, common[ii, jj].astype(np.int64), ras[order])


def _linkpred_driver(und: pa.Table, k: int) -> pa.Table:
    """Exact dense twin for small DENSE graphs: boolean adjacency +
    float64 BLAS matmuls (every value integer-exact — common <= n,
    ra <= n * SCALE, both far under 2^53). The wedge path's
    sum C(deg,2) enumeration loses badly exactly when the graph is
    small and dense (the KG entity graph at sf0.1: ~5k nodes, ~48k
    edges -> tens of millions of wedge rows through two shuffles vs
    one n^3 matmul). The matmul itself fans out as ROW-BLOCK Ray tasks
    against the ray.put adjacency (zero-copy plasma reads): the sandbox
    pins OMP_NUM_THREADS=1, so a single-process BLAS call would run
    one-core (measured 18.6 s at n=5020 — parallel blocks cut it to
    ~1 s); each task returns only its block-local top-k, so at most
    tasks x k candidate rows return to the driver. Regime parity is
    pytested with forced thresholds."""
    import ray

    nodes, A = _dense_adjacency(und)
    n = len(nodes)
    deg = A.sum(axis=1)  # exact small ints
    share = (DEFAULT_SCALE // deg.astype(np.int64)).astype(np.float64)
    A_ref = ray.put(A)
    kern = ray.remote(num_cpus=1)(_lp_block_kernel)
    parts = ray.get([
        kern.remote(A_ref, share, lo, hi, k)
        for lo, hi in _row_blocks(n, _n_matmul_tasks())
    ])
    ii = np.concatenate([p[0] for p in parts])
    jj = np.concatenate([p[1] for p in parts])
    com = np.concatenate([p[2] for p in parts])
    ras = np.concatenate([p[3] for p in parts])
    order = np.lexsort((jj, ii, -ras))[:k]
    iu, ju = ii[order], jj[order]
    return pa.Table.from_pydict(
        {"node_a": pa.array(nodes[iu], pa.string()),
         "node_b": pa.array(nodes[ju], pa.string()),
         "common": pa.array(com[order], pa.int64()),
         "pref_attach": pa.array(
             (deg[iu] * deg[ju]).astype(np.int64), pa.int64()),
         "ra": pa.array(ras[order], pa.int64())},
        schema=LINKPRED_SCHEMA,
    )


def linkpred_topk(
    edges: rd.Dataset,
    *,
    k: int = 50,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    driver_node_threshold: int = LINKPRED_DRIVER_NODE_THRESHOLD,
) -> pa.Table:
    """Top-k NON-edges by link-prediction score over the undirected
    simple graph: for every pair (a < b) sharing >=1 neighbor and NOT
    already connected, emit the three classic indices —
    ``common`` = |N(a) ∩ N(b)|, ``pref_attach`` = deg(a)·deg(b), and
    ``ra`` = Σ_{z ∈ N(a)∩N(b)} SCALE // deg(z) (Zhou et al.'s
    resource-allocation index, INTEGER-exact: per-apex floor shares sum
    associatively, so the score is independent of block layout). Order:
    (ra DESC, node_a, node_b). Reference analogue: link suggestions run
    driver-side over the NetworkX store
    (/root/reference/knowledge_graph/knowledge_graph.py); here each
    stage is a bounded cogroup.

    Shape: symmetrized edges + one degree attach → per-apex wedge
    partials carrying SCALE // deg(apex) → per-pair global sums →
    composite-key anti join against the existing edge set → two degree
    attaches → per-block top-k combiner + tiny global sort. Cost note:
    inherits the wedge family's Σ C(deg, 2) bound — cap hub degrees
    upstream at web scale (same caveat as neighbor_jaccard_topk).

    Scale switch: graphs whose NODE count fits ``driver_node_threshold``
    take the dense-adjacency BLAS driver twin (``_linkpred_driver``) —
    small dense graphs (the KG entity graph) are the wedge path's worst
    case and the matmul's best; big sparse graphs run distributed."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_anti_join,
        coarse_attach,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    deg = _simple_degrees(und, P).materialize()

    if deg.count() <= driver_node_threshold:
        import ray

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows > 0]
        if not tables:
            return LINKPRED_SCHEMA.empty_table()
        return _linkpred_driver(pa.concat_tables(tables), k)

    sym_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([b, a])],
            schema=sym_schema,
        )

    symd_schema = pa.schema(
        [("u", pa.string()), ("v", pa.string()), ("degu", pa.int64())]
    )
    symd = coarse_attach(
        und.map_batches(sym, batch_format="pyarrow"), deg,
        left_key="u", right_key="node_id", attach_cols=["deg"],
        attach_as=["degu"], out_schema=symd_schema, num_partitions=P,
    )

    partials = coarse_partition_apply(
        symd, ["u"], _lp_wedge_partials, _LP_WEDGE_SCHEMA,
        num_partitions=P,
    )

    def pair_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LP_WEDGE_SCHEMA.empty_table()
        agg = (
            df.groupby(["x", "y"], sort=False)
            .agg(cnt=("cnt", "sum"), ra=("ra", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            agg[["x", "y", "cnt", "ra"]], schema=_LP_WEDGE_SCHEMA,
            preserve_index=False,
        )

    pairs = coarse_partition_apply(
        partials, ["x", "y"], pair_sum, _LP_WEDGE_SCHEMA, num_partitions=P
    )

    # drop pairs that are ALREADY edges (link prediction scores NEW links)
    SEP = "\x1f"
    keyed_schema = pa.schema(
        [(f.name, f.type) for f in _LP_WEDGE_SCHEMA] + [("pk", pa.string())]
    )

    def key_pairs(t: pa.Table) -> pa.Table:
        pk = pc.binary_join_element_wise(
            pc.cast(t.column("x"), pa.string()),
            pc.cast(t.column("y"), pa.string()), SEP,
        )
        return t.append_column("pk", pk)

    def key_edges(t: pa.Table) -> pa.Table:
        pk = pc.binary_join_element_wise(
            pc.cast(t.column("a"), pa.string()),
            pc.cast(t.column("b"), pa.string()), SEP,
        )
        return pa.Table.from_pydict({"pk": pk})

    non_edges = coarse_anti_join(
        pairs.map_batches(key_pairs, batch_format="pyarrow"),
        und.map_batches(key_edges, batch_format="pyarrow"),
        left_key="pk", right_key="pk",
        out_schema=keyed_schema, num_partitions=P,
    )

    ca = pa.schema([("x", pa.string()), ("y", pa.string()),
                    ("cnt", pa.int64()), ("ra", pa.int64()),
                    ("deg_a", pa.int64())])
    cab = pa.schema([("x", pa.string()), ("y", pa.string()),
                     ("cnt", pa.int64()), ("ra", pa.int64()),
                     ("deg_a", pa.int64()), ("deg_b", pa.int64())])
    j1 = coarse_attach(
        non_edges, deg, left_key="x", right_key="node_id",
        attach_cols=["deg"], attach_as=["deg_a"], out_schema=ca,
        num_partitions=P,
    )
    j2 = coarse_attach(
        j1, deg, left_key="y", right_key="node_id",
        attach_cols=["deg"], attach_as=["deg_b"], out_schema=cab,
        num_partitions=P,
    )

    def score(t: pa.Table) -> pa.Table:
        da = t.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"node_a": t.column("x"), "node_b": t.column("y"),
             "common": pc.cast(t.column("cnt"), pa.int64()),
             "pref_attach": pa.array(da * db, pa.int64()),
             "ra": pc.cast(t.column("ra"), pa.int64())},
            schema=LINKPRED_SCHEMA,
        )

    scored = j2.map_batches(score, batch_format="pyarrow")

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("ra", "descending"), ("node_a", "ascending"),
                   ("node_b", "ascending")]
        )
        return t.take(idx)

    out = (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .sort(["ra", "node_a", "node_b"], descending=[True, False, False])
        .limit(k)
    )
    return pa.Table.from_pylist(out.take_all(), schema=LINKPRED_SCHEMA)


# --------------------------------------------------------------------------
# per-node local clustering coefficient + directed reciprocity
# --------------------------------------------------------------------------

LCC_SCHEMA = pa.schema(
    [("node_id", pa.string()), ("triangles", pa.int64()),
     ("deg", pa.int64()), ("lcc", pa.float64())]
)

_LCC_WEDGE_SCHEMA = pa.schema(
    [("x", pa.string()), ("y", pa.string()), ("apex", pa.string())]
)
_LCC_CREDIT_SCHEMA = pa.schema([("node", pa.string()), ("cnt", pa.int64())])


LCC_DRIVER_NODE_THRESHOLD = 8192


def _lcc_block_kernel(A, lo, hi):
    """Per-row-block triangle counts: ((blk @ A) * blk) row-sum — each
    entry counts 2-paths between adjacent pairs, so the row sum is
    2 x triangles through the row node. Integer-exact in float64."""
    blk = A[lo:hi]
    return ((blk @ A) * blk).sum(axis=1)


def _local_clustering_driver(und: pa.Table) -> rd.Dataset:
    """Exact dense twin for small dense graphs: per-node triangle
    counts via one boolean-adjacency BLAS matmul, tri(v) =
    ((A @ A) * A) row-sum / 2 — every value integer-exact in float64
    (<= n^2 << 2^53). Same rationale as _linkpred_driver, including the
    row-block Ray-task fan-out around the sandbox's OMP_NUM_THREADS=1
    single-core BLAS; regime parity pytested."""
    import ray

    nodes, A = _dense_adjacency(und)
    n = len(nodes)
    deg = A.sum(axis=1).astype(np.int64)
    A_ref = ray.put(A)
    kern = ray.remote(num_cpus=1)(_lcc_block_kernel)
    twice_tri = np.concatenate(ray.get([
        kern.remote(A_ref, lo, hi)
        for lo, hi in _row_blocks(n, _n_matmul_tasks())
    ]))
    tri = (twice_tri / 2).astype(np.int64)
    den = deg * (deg - 1)
    lcc = np.where(
        den > 0,
        (2 * tri).astype(np.float64) / np.maximum(den, 1).astype(np.float64),
        0.0,
    )
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_id": pa.array(nodes, pa.string()),
             "triangles": pa.array(tri, pa.int64()),
             "deg": pa.array(deg, pa.int64()),
             "lcc": pa.array(lcc, pa.float64())},
            schema=LCC_SCHEMA,
        )
    )


def local_clustering(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    driver_node_threshold: int = LCC_DRIVER_NODE_THRESHOLD,
) -> rd.Dataset:
    """Per-node local clustering coefficient over the undirected simple
    graph: (node_id, triangles, deg, lcc) where ``triangles`` counts the
    triangles THROUGH each node and ``lcc`` = 2*triangles / (deg*(deg-1))
    — ONE double cast per exact-int operand, 0.0 for deg < 2 (standard
    convention; mirrored by the SQL oracle). The complement of
    clustering_coefficient's single global ratio.

    Shape: same degree-oriented wedge generation as triangle_count
    (sum C(outdeg, 2) <= O(m^1.5), hot-key immune), but wedges KEEP
    their apex so a closed wedge credits all three vertices: the closure
    cogroup emits per-partition (node, cnt) partials, one more coarse
    sum folds them, and a LEFT degree attach fills triangle-free nodes
    with 0. Scale switch: node counts at or under
    ``driver_node_threshold`` take the dense-adjacency BLAS driver twin
    (``_local_clustering_driver``) — dense small graphs are the wedge
    path's worst case; big sparse graphs run distributed."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    deg = _simple_degrees(und, P).materialize()

    if deg.count() <= driver_node_threshold:
        import ray

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows > 0]
        if not tables:
            return rd.from_arrow(LCC_SCHEMA.empty_table())
        return _local_clustering_driver(pa.concat_tables(tables))

    wa = pa.schema([("a", pa.string()), ("b", pa.string()),
                    ("deg_a", pa.int64())])
    wab = pa.schema([("a", pa.string()), ("b", pa.string()),
                     ("deg_a", pa.int64()), ("deg_b", pa.int64())])
    e2 = coarse_attach(
        und, deg, left_key="a", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_a"], out_schema=wa, num_partitions=P,
    )
    e3 = coarse_attach(
        e2, deg, left_key="b", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_b"], out_schema=wab, num_partitions=P,
    )

    ori_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = da <= db
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.Table.from_pydict(
            {"u": pa.array(u, pa.string()), "v": pa.array(v, pa.string())},
            schema=ori_schema,
        )

    def apex_wedges(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LCC_WEDGE_SCHEMA.empty_table()
        xs, ys, us = [], [], []
        for u, g in df.groupby("u", sort=False):
            ns = np.sort(g["v"].to_numpy())
            m = len(ns)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, 1)
            xs.append(ns[ii])
            ys.append(ns[jj])
            us.append(np.full(len(ii), u, dtype=object))
        if not xs:
            return _LCC_WEDGE_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {"x": pa.array(np.concatenate(xs), pa.string()),
             "y": pa.array(np.concatenate(ys), pa.string()),
             "apex": pa.array(np.concatenate(us), pa.string())},
            schema=_LCC_WEDGE_SCHEMA,
        )

    wedges = coarse_partition_apply(
        e3.map_batches(orient, batch_format="pyarrow"),
        ["u"], apex_wedges, _LCC_WEDGE_SCHEMA, num_partitions=P,
    )

    union_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("apex", pa.string()),
         ("is_edge", pa.bool_())]
    )

    def tag_wedge(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("x").combine_chunks(), t.column("y").combine_chunks(),
             t.column("apex").combine_chunks(),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(False)],
            schema=union_schema,
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks(),
             pa.nulls(t.num_rows, pa.string()).fill_null(""),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(True)],
            schema=union_schema,
        )

    def close_credit(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LCC_CREDIT_SCHEMA.empty_table()
        w = df[~df["is_edge"]]
        e = df[df["is_edge"]][["x", "y"]].drop_duplicates()
        if w.empty or e.empty:
            return _LCC_CREDIT_SCHEMA.empty_table()
        closed = w.merge(e, on=["x", "y"], how="inner")
        if closed.empty:
            return _LCC_CREDIT_SCHEMA.empty_table()
        credit = pd.concat(
            [closed["x"], closed["y"], closed["apex"]], ignore_index=True
        ).to_frame("node")
        agg = credit.groupby("node", sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(
            agg, schema=_LCC_CREDIT_SCHEMA, preserve_index=False
        )

    credits = coarse_partition_apply(
        wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
            und.map_batches(tag_edge, batch_format="pyarrow")
        ),
        ["x", "y"], close_credit, _LCC_CREDIT_SCHEMA, num_partitions=P,
    )

    def credit_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LCC_CREDIT_SCHEMA.empty_table()
        agg = df.groupby("node", sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(
            agg, schema=_LCC_CREDIT_SCHEMA, preserve_index=False
        )

    tri = coarse_partition_apply(
        credits, ["node"], credit_sum, _LCC_CREDIT_SCHEMA, num_partitions=P
    )

    att_schema = pa.schema(
        [("node_id", pa.string()), ("deg", pa.int64()), ("tri", pa.int64())]
    )
    att = coarse_attach(
        deg, tri, left_key="node_id", right_key="node",
        attach_cols=["cnt"], attach_as=["tri"], out_schema=att_schema,
        num_partitions=P, how="left", fill={"tri": 0},
    )

    def finish(t: pa.Table) -> pa.Table:
        tr = t.column("tri").to_numpy(zero_copy_only=False).astype(np.int64)
        dg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        den = dg * (dg - 1)
        lcc = np.where(
            den > 0,
            (2 * tr).astype(np.float64) / np.maximum(den, 1).astype(np.float64),
            0.0,
        )
        return pa.Table.from_pydict(
            {"node_id": t.column("node_id"),
             "triangles": pa.array(tr, pa.int64()),
             "deg": pa.array(dg, pa.int64()),
             "lcc": pa.array(lcc, pa.float64())},
            schema=LCC_SCHEMA,
        )

    return att.map_batches(finish, batch_format="pyarrow")


RECIPROCITY_SCHEMA = pa.schema(
    [("total_edges", pa.int64()), ("reciprocated", pa.int64()),
     ("reciprocity", pa.float64())]
)


def reciprocity(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> pa.Table:
    """Directed reciprocity: over the DISTINCT simple directed edge set
    (self-loops dropped), the fraction of edges (s, d) whose reverse
    (d, s) also exists — one row (total_edges, reciprocated,
    reciprocity) with ONE double divide (0.0 on an empty edge set).
    Shape: the edge set keys itself forward and reversed, one
    composite-key anti join bounds the non-reciprocated count, and only
    two scalars reach the driver."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_anti_join,
    )

    e = _distinct_directed_edges(edges, src_col, dst_col).materialize()
    total = e.count()
    if total == 0:
        return pa.Table.from_pydict(
            {"total_edges": [0], "reciprocated": [0], "reciprocity": [0.0]},
            schema=RECIPROCITY_SCHEMA,
        )
    P = _default_partitions(e)
    SEP = "\x1f"
    key_schema = pa.schema([("pk", pa.string())])

    def fwd_key(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"pk": pc.binary_join_element_wise(
                t.column("s"), t.column("d"), SEP)},
            schema=key_schema,
        )

    def rev_key(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"pk": pc.binary_join_element_wise(
                t.column("d"), t.column("s"), SEP)},
            schema=key_schema,
        )

    unmatched = coarse_anti_join(
        e.map_batches(fwd_key, batch_format="pyarrow"),
        e.map_batches(rev_key, batch_format="pyarrow"),
        left_key="pk", right_key="pk",
        out_schema=key_schema, num_partitions=P,
    ).count()
    recip = total - unmatched
    return pa.Table.from_pydict(
        {"total_edges": [int(total)], "reciprocated": [int(recip)],
         "reciprocity": [float(recip) / float(total)]},
        schema=RECIPROCITY_SCHEMA,
    )


# --------------------------------------------------------------------------
# deterministic negative sampling for link-prediction training
# --------------------------------------------------------------------------

NEGSAMPLE_SCHEMA = pa.schema(
    [("node_a", pa.string()), ("node_b", pa.string()),
     ("neg_idx", pa.int64()), ("neg_node", pa.string())]
)


def linkpred_negative_samples(
    edges: rd.Dataset,
    *,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    salt: str = "neg",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Deterministic NEGATIVE sampling for link-prediction training:
    for every undirected positive edge (a < b) emit up to ``k``
    corrupted pairs (a, neg) where ``neg`` is the node at rank
    md5_hash64('salt:a|b|i') % n_nodes in the SORTED node vocabulary —
    a pure function of the edge, so the training set is identical under
    reshuffles, retries, and resumes (the same property the sampling
    and split operators pin; random.choice would break all three).
    Candidates hitting either endpoint or an EXISTING edge are filtered,
    not resampled — the per-edge negative count is k minus collisions
    (documented contract; resampling loops are not SQL-expressible and
    the loss is a hash-uniform few percent).

    Shape: one broadcast of the sorted node vocabulary (ray.put — the
    entity vocabulary is domain-bounded, the same assumption the other
    KG ops document), a stateless vectorized expand over edge blocks,
    then a composite-key anti join against the edge set for the
    is-edge filter — no shuffle except the anti join."""
    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_anti_join,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    # node vocabulary: domain-bounded (entity set), one driver collect +
    # ray.put — the documented broadcast assumption
    nodes_tbl = _distinct_nodes(und, "a", "b", num_partitions=P)
    import ray

    node_arr = np.sort(np.concatenate([
        t.column(0).to_numpy(zero_copy_only=False)
        for t in ray.get(nodes_tbl.to_arrow_refs()) if t.num_rows > 0
    ] or [np.array([], dtype=object)]))
    n_nodes = len(node_arr)
    if n_nodes == 0:
        return rd.from_arrow(NEGSAMPLE_SCHEMA.empty_table())
    nodes_ref = ray.put(node_arr)

    def expand(t: pa.Table) -> pa.Table:
        nv = ray.get(nodes_ref)
        a = _str(t.column("a")).to_pylist()
        b = _str(t.column("b")).to_pylist()
        oa, ob, oi, on = [], [], [], []
        for x, y in zip(a, b):
            for i in range(k):
                c = nv[md5_hash64(f"{salt}:{x}|{y}|{i}") % n_nodes]
                if c == x or c == y:
                    continue
                oa.append(x)
                ob.append(y)
                oi.append(i)
                on.append(c)
        return pa.Table.from_pydict(
            {"node_a": pa.array(oa, pa.string()),
             "node_b": pa.array(ob, pa.string()),
             "neg_idx": pa.array(oi, pa.int64()),
             "neg_node": pa.array(on, pa.string())},
            schema=NEGSAMPLE_SCHEMA,
        )

    cands = und.map_batches(expand, batch_format="pyarrow")

    # drop candidates where the corrupted pair (a, neg) IS an edge
    SEP = "\x1f"
    keyed = pa.schema(
        [(f.name, f.type) for f in NEGSAMPLE_SCHEMA] + [("pk", pa.string())]
    )

    def key_cand(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t.column("node_a"), t.column("neg_node"))
        hi = pc.max_element_wise(t.column("node_a"), t.column("neg_node"))
        return t.append_column(
            "pk", pc.binary_join_element_wise(lo, hi, SEP)
        )

    def key_edge(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"pk": pc.binary_join_element_wise(
                t.column("a"), t.column("b"), SEP)},
        )

    out = coarse_anti_join(
        cands.map_batches(key_cand, batch_format="pyarrow"),
        und.map_batches(key_edge, batch_format="pyarrow"),
        left_key="pk", right_key="pk",
        out_schema=keyed, num_partitions=P,
    )
    return out.map_batches(
        lambda t: t.select([f.name for f in NEGSAMPLE_SCHEMA]),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# ego-network extraction (radius-bounded subgraph around seeds)
# --------------------------------------------------------------------------

EGO_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def ego_edges(
    seeds: rd.Dataset,
    edges: rd.Dataset,
    *,
    radius: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> rd.Dataset:
    """Radius-bounded EGO network: the distinct simple directed edges
    whose BOTH endpoints lie within ``radius`` undirected hops of any
    seed (bfs_hops distances; seeds at 0) — the subgraph-extraction
    primitive behind 'show me the neighborhood of X' graph exploration
    (the reference answers these driver-side over its NetworkX store,
    /root/reference/knowledge_graph/knowledge_graph.py). Shape: one BFS
    (scale-switched), then two cogroup semi-joins of the edge set
    against the in-radius node set — the node set never lands on the
    driver in the distributed regime."""
    from semantic_search_system_ray.stages.util import _default_partitions

    e = _distinct_directed_edges(edges, src_col, dst_col).materialize()
    if e.count() == 0:
        return rd.from_arrow(EGO_SCHEMA.empty_table())
    P = _default_partitions(e)
    dist = bfs_hops(
        seeds, e, max_hops=radius, src_col="s", dst_col="d"
    ).materialize()
    inside = dist.map_batches(
        lambda t: pa.Table.from_pydict({"node": _str(t.column("node_id"))}),
        batch_format="pyarrow",
    ).materialize()
    ab = e.map_batches(
        lambda t: pa.Table.from_pydict(
            {"a": t.column("s"), "b": t.column("d")}
        ),
        batch_format="pyarrow",
    )
    ab = _semi_on(ab, inside, "a", P)
    ab = _semi_on(ab, inside, "b", P)
    return ab.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("a"), "dst": t.column("b")}, schema=EGO_SCHEMA
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Katz centrality (deterministic integer recurrence, restart + attenuation)
# --------------------------------------------------------------------------

KATZ_SCHEMA = pa.schema([("node_id", pa.string()), ("katz", pa.int64())])
KATZ_ALPHA_INV = 4  # attenuation 1/4 as an exact integer divisor


def _katz_driver(e: pa.Table, rounds: int, scale: int, alpha_inv: int) -> rd.Dataset:
    """Exact numpy twin of the distributed Katz recurrence (factorized
    endpoints + unordered int64 scatter-adds — addition is associative,
    so block layout never changes the result); regime parity pinned by
    tests/test_graph.py."""
    s = _str(e.column("s")).to_numpy(zero_copy_only=False)
    d = _str(e.column("d")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([s, d]))
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    n = len(nodes)
    x = np.full(n, scale, dtype=np.int64)
    for _ in range(rounds):
        raw = np.zeros(n, dtype=np.int64)
        np.add.at(raw, di, x[si])
        mx = int(raw.max())
        x = scale + raw * scale // (alpha_inv * mx)
    return rd.from_arrow(
        pa.Table.from_pydict({"node_id": nodes, "katz": x}, schema=KATZ_SCHEMA)
    )


def katz(
    edges: rd.Dataset,
    *,
    rounds: int = 4,
    scale: int = DEFAULT_SCALE,
    alpha_inv: int = KATZ_ALPHA_INV,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """Deterministic integer KATZ centrality (Katz 1953) over the
    DISTINCT directed simple edge set of ``edges`` (parallel edges and
    self-loops dropped): x_0 = ``scale`` for every endpoint node; each
    of the fixed ``rounds`` rounds computes

        raw(v) = Σ_{u→v} x(u)                       (0 with no in-edges)
        x'(v)  = scale + raw(v)·scale // (alpha_inv · max_w raw(w))

    — the classic β + α·(in-neighbor mass) shape with β = ``scale`` and
    the attenuation α = 1/``alpha_inv`` applied against the round's
    max-normalized mass, all floor arithmetic on non-negative int64, so
    the result is independent of summation order / block layout /
    parallelism and has an exact unrolled-CTE DuckDB twin
    (text_oracles.sql_kg_katz). Scores live in
    [scale, scale + scale//alpha_inv]; a per-node in-sum is ≤
    max_indegree·(scale + scale//alpha_inv) and the normalization
    product ≤ that · scale, so int64 holds to ~7e6 max in-degree at the
    default scale=1e6 (multiply_checked raises loudly beyond). The max
    is never 0 on a non-empty edge set: every x ≥ scale and some node
    has an in-edge.

    Reference analogue: centrality-style 'most connected entities'
    queries answered driver-side over the graph store
    (/root/reference/knowledge_graph/knowledge_graph.py); here scores
    and edges stay Datasets throughout.

    Scale: same switch as pagerank/hits — edge sets at or below
    ``driver_threshold`` take the exact numpy twin; larger graphs run
    the distributed recurrence, one score attach onto the static edge
    set (coarse_attach) + one per-node sum per round, plus a tiny scalar
    ``max()`` aggregate — scores never driver-collect."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
    )

    def norm_e(t: pa.Table) -> pa.Table:
        tt = pa.Table.from_pydict(
            {"s": _str(t.column(src_col)), "d": _str(t.column(dst_col))}
        )
        tt = tt.filter(pc.not_equal(tt.column("s"), tt.column("d")))
        return tt.group_by(["s", "d"]).aggregate([])

    def part_distinct(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _HITS_E_SCHEMA.empty_table()
        return pa.Table.from_pandas(
            df.drop_duplicates(), schema=_HITS_E_SCHEMA, preserve_index=False
        )

    e = coarse_partition_apply(
        edges.map_batches(norm_e, batch_format="pyarrow"),
        ["s", "d"], part_distinct, _HITS_E_SCHEMA,
    ).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(KATZ_SCHEMA.empty_table())
    if n_edges <= _resolve_edges(driver_threshold):
        import ray

        tables = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows > 0]
        return _katz_driver(pa.concat_tables(tables), rounds, scale, alpha_inv)

    P = _default_partitions(e)
    e = e.repartition(P).materialize()
    nodes = _distinct_nodes(e, "s", "d", num_partitions=P).repartition(
        P
    ).materialize()

    def init_scale(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": _str(t.column("node_id")),
             "v": pa.nulls(t.num_rows, pa.int64()).fill_null(scale)},
            schema=_HITS_SV_SCHEMA,
        )

    def zeros(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": _str(t.column("node_id")),
             "v": pa.nulls(t.num_rows, pa.int64()).fill_null(0)},
            schema=_HITS_SV_SCHEMA,
        )

    def sum_node(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _HITS_SV_SCHEMA.empty_table()
        agg = df.groupby("node", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pydict(
            # v rides the null-bearing cogroup union as float64 — exact
            # < 2^53 (sums ≤ max_indegree·1.25·scale; bound above)
            {"node": agg["node"].to_numpy(),
             "v": agg["v"].to_numpy().astype(np.int64)},
            schema=_HITS_SV_SCHEMA,
        )

    x = nodes.map_batches(init_scale, batch_format="pyarrow").materialize()
    att_schema = pa.schema([("d", pa.string()), ("v", pa.int64())])
    for _ in range(rounds):
        attached = coarse_attach(
            e, x, left_key="s", right_key="node",
            attach_cols=["v"], out_schema=att_schema,
            num_partitions=P, how="inner",
        )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["d"]).aggregate([("v", "sum")])
            return pa.Table.from_pydict(
                {"node": _str(g.column("d")),
                 "v": pc.cast(g.column("v_sum"), pa.int64())},
                schema=_HITS_SV_SCHEMA,
            )

        raw = coarse_partition_apply(
            attached.map_batches(partial, batch_format="pyarrow").union(
                nodes.map_batches(zeros, batch_format="pyarrow")
            ),
            ["node"], sum_node, _HITS_SV_SCHEMA, num_partitions=P,
        ).repartition(P).materialize()
        mx = raw.max("v")

        def restart(t: pa.Table, _mx=int(mx)) -> pa.Table:
            v = pc.cast(t.column("v"), pa.int64()).combine_chunks()
            scaled = pc.multiply_checked(v, pa.scalar(scale, pa.int64()))
            # Arrow integer divide truncates; operands non-negative, so
            # truncation == floor == the numpy twin's //
            att = pc.divide(scaled, pa.scalar(alpha_inv * _mx, pa.int64()))
            return pa.Table.from_pydict(
                {"node": t.column("node"),
                 "v": pc.add(att, pa.scalar(scale, pa.int64()))},
                schema=_HITS_SV_SCHEMA,
            )

        x = raw.map_batches(restart, batch_format="pyarrow").materialize()

    return x.map_batches(
        lambda t: t.rename_columns(["node_id", "katz"]),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# per-edge triangle support (the k-truss primitive)
# --------------------------------------------------------------------------

SUPPORT_SCHEMA = pa.schema(
    [("node_a", pa.string()), ("node_b", pa.string()),
     ("support", pa.int64())]
)
_SUP_CREDIT_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("cnt", pa.int64())]
)
SUPPORT_DRIVER_NODE_THRESHOLD = LCC_DRIVER_NODE_THRESHOLD


def _support_block_kernel(A, lo, hi):
    """Per-row-block edge supports: ((blk @ A) * blk)[i, j] counts the
    common neighbors of adjacent (i, j) — exactly the edge's triangle
    support. Restricted to strictly-upper adjacent pairs so each
    undirected edge reports once. Integer-exact in float64."""
    blk = A[lo:hi]
    sup = (blk @ A) * blk
    cols = np.arange(A.shape[1])[None, :]
    rows = np.arange(lo, hi)[:, None]
    keep = (cols > rows) & (blk == 1.0)
    ii, jj = np.nonzero(keep)
    return (ii + lo, jj, sup[ii, jj].astype(np.int64))


def _edge_support_driver(und: pa.Table) -> rd.Dataset:
    """Exact dense twin for small dense graphs (same rationale and
    row-block Ray-task fan-out as _local_clustering_driver — the
    sandbox pins OMP_NUM_THREADS=1, so one big matmul is split across
    zero-copy plasma readers); regime parity pytested."""
    import ray

    nodes, A = _dense_adjacency(und)
    n = len(nodes)
    A_ref = ray.put(A)
    kern = ray.remote(num_cpus=1)(_support_block_kernel)
    parts = ray.get([
        kern.remote(A_ref, lo, hi)
        for lo, hi in _row_blocks(n, _n_matmul_tasks())
    ])
    ii = np.concatenate([p[0] for p in parts])
    jj = np.concatenate([p[1] for p in parts])
    ss = np.concatenate([p[2] for p in parts])
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_a": pa.array(nodes[ii], pa.string()),
             "node_b": pa.array(nodes[jj], pa.string()),
             "support": pa.array(ss, pa.int64())},
            schema=SUPPORT_SCHEMA,
        )
    )


def edge_support(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    driver_node_threshold: int = SUPPORT_DRIVER_NODE_THRESHOLD,
) -> rd.Dataset:
    """Per-EDGE triangle support over the undirected simple graph:
    (node_a < node_b, support) where ``support`` counts the triangles
    containing the edge (|N(a) ∩ N(b)|) — the k-truss primitive (an
    edge is in the k-truss iff support ≥ k-2 after peeling) and the
    cohesion score KG curation uses to keep corroborated relations.

    Shape: the degree-oriented apex wedge generation of
    triangle_count/local_clustering (Σ C(outdeg, 2) ≤ O(m^1.5),
    hot-entity immune), but a CLOSED wedge (x, y, apex) credits its
    three EDGES {x,y}, {x,apex}, {y,apex} (normalized lo<hi) instead of
    its vertices; one coarse sum folds the credits and a LEFT attach
    fills triangle-free edges with 0 — every edge present exactly once.
    Scale switch: node counts at or under ``driver_node_threshold``
    take the dense-adjacency BLAS twin (dense small graphs are the
    wedge path's worst case); big sparse graphs run distributed.

    Reference analogue: relation-corroboration queries answered
    driver-side over the NetworkX store
    (/root/reference/knowledge_graph/knowledge_graph.py)."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    deg = _simple_degrees(und, P).materialize()

    if deg.count() <= driver_node_threshold:
        import ray

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows > 0]
        if not tables:
            return rd.from_arrow(SUPPORT_SCHEMA.empty_table())
        return _edge_support_driver(pa.concat_tables(tables))

    wa = pa.schema([("a", pa.string()), ("b", pa.string()),
                    ("deg_a", pa.int64())])
    wab = pa.schema([("a", pa.string()), ("b", pa.string()),
                     ("deg_a", pa.int64()), ("deg_b", pa.int64())])
    e2 = coarse_attach(
        und, deg, left_key="a", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_a"], out_schema=wa, num_partitions=P,
    )
    e3 = coarse_attach(
        e2, deg, left_key="b", right_key="node_id", attach_cols=["deg"],
        attach_as=["deg_b"], out_schema=wab, num_partitions=P,
    )

    ori_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = da <= db
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.Table.from_pydict(
            {"u": pa.array(u, pa.string()), "v": pa.array(v, pa.string())},
            schema=ori_schema,
        )

    def apex_wedges(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LCC_WEDGE_SCHEMA.empty_table()
        xs, ys, us = [], [], []
        for u, g in df.groupby("u", sort=False):
            ns = np.sort(g["v"].to_numpy())
            m = len(ns)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, 1)
            xs.append(ns[ii])
            ys.append(ns[jj])
            us.append(np.full(len(ii), u, dtype=object))
        if not xs:
            return _LCC_WEDGE_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {"x": pa.array(np.concatenate(xs), pa.string()),
             "y": pa.array(np.concatenate(ys), pa.string()),
             "apex": pa.array(np.concatenate(us), pa.string())},
            schema=_LCC_WEDGE_SCHEMA,
        )

    wedges = coarse_partition_apply(
        e3.map_batches(orient, batch_format="pyarrow"),
        ["u"], apex_wedges, _LCC_WEDGE_SCHEMA, num_partitions=P,
    )

    union_schema = pa.schema(
        [("x", pa.string()), ("y", pa.string()), ("apex", pa.string()),
         ("is_edge", pa.bool_())]
    )

    def tag_wedge(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("x").combine_chunks(), t.column("y").combine_chunks(),
             t.column("apex").combine_chunks(),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(False)],
            schema=union_schema,
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks(),
             pa.nulls(t.num_rows, pa.string()).fill_null(""),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(True)],
            schema=union_schema,
        )

    def close_credit_edges(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SUP_CREDIT_SCHEMA.empty_table()
        w = df[~df["is_edge"]]
        e = df[df["is_edge"]][["x", "y"]].drop_duplicates()
        if w.empty or e.empty:
            return _SUP_CREDIT_SCHEMA.empty_table()
        closed = w.merge(e, on=["x", "y"], how="inner")
        if closed.empty:
            return _SUP_CREDIT_SCHEMA.empty_table()
        x = closed["x"].to_numpy()
        y = closed["y"].to_numpy()
        ap = closed["apex"].to_numpy()
        # the 3 edges of each closed triangle, each normalized lo<hi
        ea = np.concatenate([x, np.minimum(x, ap), np.minimum(y, ap)])
        eb = np.concatenate([y, np.maximum(x, ap), np.maximum(y, ap)])
        agg = (
            pd.DataFrame({"a": ea, "b": eb})
            .groupby(["a", "b"], sort=False).size().reset_index(name="cnt")
        )
        return pa.Table.from_pandas(
            agg, schema=_SUP_CREDIT_SCHEMA, preserve_index=False
        )

    credits = coarse_partition_apply(
        wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
            und.map_batches(tag_edge, batch_format="pyarrow")
        ),
        ["x", "y"], close_credit_edges, _SUP_CREDIT_SCHEMA, num_partitions=P,
    )

    def credit_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SUP_CREDIT_SCHEMA.empty_table()
        agg = df.groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(
            agg, schema=_SUP_CREDIT_SCHEMA, preserve_index=False
        )

    sup = coarse_partition_apply(
        credits, ["a", "b"], credit_sum, _SUP_CREDIT_SCHEMA, num_partitions=P
    )

    def edge_key(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"k": pc.binary_join_element_wise(
                _str(t.column("a")), _str(t.column("b")), "\x1f"),
             "a": t.column("a"), "b": t.column("b")},
        )

    def sup_key(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"k": pc.binary_join_element_wise(
                _str(t.column("a")), _str(t.column("b")), "\x1f"),
             "cnt": t.column("cnt")},
        )

    att_schema = pa.schema(
        [("k", pa.string()), ("a", pa.string()), ("b", pa.string()),
         ("support", pa.int64())]
    )
    att = coarse_attach(
        und.map_batches(edge_key, batch_format="pyarrow"),
        sup.map_batches(sup_key, batch_format="pyarrow"),
        left_key="k", right_key="k",
        attach_cols=["cnt"], attach_as=["support"], out_schema=att_schema,
        num_partitions=P, how="left", fill={"support": 0},
    )
    return att.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_a": t.column("a"), "node_b": t.column("b"),
             "support": t.column("support")},
            schema=SUPPORT_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# deterministic random walks (node2vec-style corpus generation)
# --------------------------------------------------------------------------

WALKS_SCHEMA = pa.schema(
    [("walk_id", pa.string()), ("step", pa.int64()), ("node", pa.string())]
)
_WALK_FRONTIER_SCHEMA = pa.schema(
    [("walk", pa.string()), ("u", pa.string())]
)
_WALK_CAND_SCHEMA = pa.schema(
    [("walk", pa.string()), ("v", pa.string()), ("h", pa.uint64())]
)


def _walk_hash_batch(walks: np.ndarray, step: int, vs: np.ndarray,
                     salt: str) -> np.ndarray:
    """md5_hash64 per (walk, step, candidate) — the same digest slice
    DuckDB's md5_number_lower returns, so the SQL twin recomputes it."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    return np.fromiter(
        (md5_hash64(f"{salt}:{w}|{step}|{v}") for w, v in zip(walks, vs)),
        dtype=np.uint64, count=len(walks),
    )


def _walk_block_kernel(nodes, indptr, indices, lo, hi, steps, salt):
    """All steps for the walk slice [lo, hi) — walks are independent,
    so the driver twin parallelizes over WALKS (the matmul-twin
    pattern: the md5 budget, not BLAS, is the single-core bottleneck
    here — ~Σ_w Σ_r deg(u_{w,r}) digests). Sorted CSR + the (hash, v)
    min over each neighbor slice; neighbor ids come pre-sorted from the
    CSR build, so the first min-hash hit IS the tie winner only if we
    still compare v — md5 ties are 2^-64 but the rule stays total."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    out_w, out_s, out_n = [], [], []
    for wi in range(lo, hi):
        w = nodes[wi]
        u = wi
        out_w.append(w)
        out_s.append(0)
        out_n.append(w)
        for r in range(1, steps + 1):
            nb = indices[indptr[u]:indptr[u + 1]]
            pre = f"{salt}:{w}|{r}|"
            best, best_key = -1, None
            for vi in nb:
                v = nodes[vi]
                k = (md5_hash64(pre + v), v)
                if best_key is None or k < best_key:
                    best, best_key = vi, k
            u = int(best)
            out_w.append(w)
            out_s.append(r)
            out_n.append(nodes[u])
    return pa.Table.from_pydict(
        {"walk_id": pa.array(out_w, pa.string()),
         "step": pa.array(out_s, pa.int64()),
         "node": pa.array(out_n, pa.string())},
        schema=WALKS_SCHEMA,
    )


def _walks_driver(und: pa.Table, steps: int, salt: str) -> rd.Dataset:
    """Exact twin of the distributed walk recurrence (same md5 choice
    rule, tie → min candidate id), fanned out as WALK-SLICE Ray tasks
    against a ray.put CSR adjacency (zero-copy plasma reads for the
    int arrays) — walks are independent, so the twin scales with
    cores instead of paying the full md5 budget single-threaded
    (measured: 31 s → ~2 s at sf0.1/32 CPUs). Regime parity pinned by
    tests/test_graph.py."""
    import ray

    a = _str(und.column("a")).to_numpy(zero_copy_only=False)
    b = _str(und.column("b")).to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(len(nodes) + 1))
    nodes_ref = ray.put(nodes)
    indptr_ref = ray.put(indptr)
    indices_ref = ray.put(dst)
    kern = ray.remote(num_cpus=1)(_walk_block_kernel)
    tables = ray.get([
        kern.remote(nodes_ref, indptr_ref, indices_ref, lo, hi, steps, salt)
        for lo, hi in _row_blocks(len(nodes), _n_matmul_tasks())
    ])
    return rd.from_arrow(pa.concat_tables(tables))


def random_walks(
    edges: rd.Dataset,
    *,
    steps: int = 3,
    salt: str = "walk",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """DETERMINISTIC random walks over the undirected simple graph —
    the corpus-generation primitive node2vec/DeepWalk embeddings train
    on (Grover & Leskovec 2016), made reshuffle/retry/resume-identical
    the same way linkpred_negative_samples is: the step-r move of walk
    ``w`` standing at ``u`` is the neighbor ``v`` minimizing
    (md5_hash64('salt:w|r|v'), v) — a pure function of the walk id and
    step, so no RNG state anywhere, and the tie rule (min candidate id;
    md5 collisions are 2^-64 but the rule is total anyway) makes the
    choice SQL-recomputable (md5_number_lower + two-stage min,
    text_oracles.sql_kg_walks). One walk starts at EVERY node of the
    edge set (walk_id = seed node); undirected neighbor sets mean no
    dead ends. Output: (walk_id, step, node), steps 0..``steps``.

    Shape per step: ONE cogroup of the (walk, u) frontier with the
    symmetric edge set on u (candidate rows = Σ_w deg(u_w), never
    corpus²) and ONE per-walk argmin fold — the md5 evaluations run
    vectorized-per-block inside the cogroup tasks, in parallel across
    partitions. Scale switch: edge sets at or under
    ``driver_threshold`` take the exact single-process twin (per-step
    shuffle overhead dominates at small scale — the pagerank lesson);
    larger graphs run the distributed recurrence."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return rd.from_arrow(WALKS_SCHEMA.empty_table())
    if n_edges <= _resolve_edges(driver_threshold):
        import ray

        tables = [t for t in ray.get(und.to_arrow_refs()) if t.num_rows > 0]
        return _walks_driver(pa.concat_tables(tables), steps, salt)

    sym_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"u": pa.chunked_array([_str(t.column("a")), _str(t.column("b"))]),
             "v": pa.chunked_array([_str(t.column("b")), _str(t.column("a"))])},
            schema=sym_schema,
        )

    sym = und.map_batches(symmetrize, batch_format="pyarrow").materialize()
    nodes = _distinct_nodes(und, "a", "b", num_partitions=P).materialize()

    frontier = nodes.map_batches(
        lambda t: pa.Table.from_pydict(
            {"walk": _str(t.column("node_id")),
             "u": _str(t.column("node_id"))},
            schema=_WALK_FRONTIER_SCHEMA,
        ),
        batch_format="pyarrow",
    ).materialize()
    out = nodes.map_batches(
        lambda t: pa.Table.from_pydict(
            {"walk_id": _str(t.column("node_id")),
             "step": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
             "node": _str(t.column("node_id"))},
            schema=WALKS_SCHEMA,
        ),
        batch_format="pyarrow",
    )

    union_schema = pa.schema(
        [("u", pa.string()), ("other", pa.string()), ("is_edge", pa.bool_())]
    )

    def tag_frontier(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("u").combine_chunks(),
             t.column("walk").combine_chunks(),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(False)],
            schema=union_schema,
        )

    def tag_sym(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("u").combine_chunks(), t.column("v").combine_chunks(),
             pa.nulls(t.num_rows, pa.bool_()).fill_null(True)],
            schema=union_schema,
        )

    sym_tagged = sym.map_batches(tag_sym, batch_format="pyarrow").materialize()

    for r in range(1, steps + 1):
        def expand(df: pd.DataFrame, _r=r) -> pa.Table:
            if df.empty:
                return _WALK_CAND_SCHEMA.empty_table()
            w = df[~df["is_edge"]]
            e = df[df["is_edge"]]
            if w.empty or e.empty:
                return _WALK_CAND_SCHEMA.empty_table()
            m = w.merge(e, on="u", suffixes=("_w", "_e"))
            if m.empty:
                return _WALK_CAND_SCHEMA.empty_table()
            walks = m["other_w"].to_numpy()
            vs = m["other_e"].to_numpy()
            h = _walk_hash_batch(walks, _r, vs, salt)
            # in-partition pre-argmin: one (h, v)-min row per walk
            part = (
                pd.DataFrame({"walk": walks, "v": vs, "h": h})
                .sort_values(["walk", "h", "v"], kind="mergesort")
                .drop_duplicates("walk", keep="first")
            )
            return pa.Table.from_pandas(
                part, schema=_WALK_CAND_SCHEMA, preserve_index=False
            )

        cands = coarse_partition_apply(
            frontier.map_batches(tag_frontier, batch_format="pyarrow").union(
                sym_tagged
            ),
            ["u"], expand, _WALK_CAND_SCHEMA, num_partitions=P,
        )

        def pick(df: pd.DataFrame) -> pa.Table:
            if df.empty:
                return _WALK_FRONTIER_SCHEMA.empty_table()
            best = (
                df.sort_values(["walk", "h", "v"], kind="mergesort")
                .drop_duplicates("walk", keep="first")
            )
            return pa.Table.from_pydict(
                {"walk": best["walk"].to_numpy(),
                 "u": best["v"].to_numpy()},
                schema=_WALK_FRONTIER_SCHEMA,
            )

        frontier = coarse_partition_apply(
            cands, ["walk"], pick, _WALK_FRONTIER_SCHEMA, num_partitions=P
        ).materialize()

        out = out.union(frontier.map_batches(
            lambda t, _r=r: pa.Table.from_pydict(
                {"walk_id": t.column("walk"),
                 "step": pa.nulls(t.num_rows, pa.int64()).fill_null(_r),
                 "node": t.column("u")},
                schema=WALKS_SCHEMA,
            ),
            batch_format="pyarrow",
        ))

    return out


# --------------------------------------------------------------------------
# modularity of a node partition (community quality, exact from integers)
# --------------------------------------------------------------------------

MODULARITY_SCHEMA = pa.schema(
    [("m_edges", pa.int64()), ("intra_edges", pa.int64()),
     ("sum_deg_sq", pa.int64()), ("modularity", pa.float64())]
)


def modularity(
    edges: rd.Dataset,
    labels: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Newman MODULARITY Q of a node partition over the undirected
    simple graph — the community-quality scalar (Newman & Girvan 2004):

        Q = intra_edges/m − Σ_c deg_c² / (4m²)

    computed EXACTLY from three integers (m, intra-community edge
    count, Σ_c (Σ_{v∈c} deg v)²), so the two double divides at the end
    are the only FP ops and the result is independent of block layout /
    summation order — no per-community float accumulation anywhere.
    ``labels`` is any (node_id, community) partition (here: LPA).

    Shape: two label attaches onto the edge set (same-community edges
    counted per block → tiny driver sum), one community cogroup folding
    per-community degree sums, then per-block Σ deg_c² partials — every
    driver collection is P-bounded scalars. int64 bound: deg_c ≤ 2m, so
    deg_c² needs m ≤ ~1.5e9 edges (multiply_checked raises loudly
    beyond).

    Reference analogue: community-quality checks run driver-side in
    NetworkX (/root/reference/knowledge_graph/knowledge_graph.py)."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
        coarse_partition_apply,
    )

    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    P = num_partitions
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col, num_partitions=P
    ).materialize()
    m = und.count()
    if m == 0:
        return rd.from_arrow(
            pa.Table.from_pydict(
                {"m_edges": [0], "intra_edges": [0], "sum_deg_sq": [0],
                 "modularity": [0.0]},
                schema=MODULARITY_SCHEMA,
            )
        )
    lab = labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": _str(t.column("node_id")),
             "comm": _str(t.column("community"))}
        ),
        batch_format="pyarrow",
    ).materialize()

    ea_schema = pa.schema([("b", pa.string()), ("ca", pa.string())])
    eab_schema = pa.schema([("ca", pa.string()), ("cb", pa.string())])
    e1 = coarse_attach(
        und, lab, left_key="a", right_key="node",
        attach_cols=["comm"], attach_as=["ca"], out_schema=ea_schema,
        num_partitions=P, how="inner",
    )
    e2 = coarse_attach(
        e1, lab, left_key="b", right_key="node",
        attach_cols=["comm"], attach_as=["cb"], out_schema=eab_schema,
        num_partitions=P, how="inner",
    )
    intra_parts = e2.map_batches(
        lambda t: pa.Table.from_pydict(
            {"n": [int(pc.sum(
                pc.cast(pc.equal(t.column("ca"), t.column("cb")),
                        pa.int64())).as_py() or 0)]},
        ),
        batch_format="pyarrow",
    )
    intra = sum(r["n"] for r in intra_parts.take_all())

    deg = _simple_degrees(und, P)
    dl_schema = pa.schema([("deg", pa.int64()), ("comm", pa.string())])
    dl = coarse_attach(
        deg, lab, left_key="node_id", right_key="node",
        attach_cols=["comm"], out_schema=dl_schema,
        num_partitions=P, how="inner",
    )
    dc_schema = pa.schema([("comm", pa.string()), ("dc", pa.int64())])

    def comm_deg(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return dc_schema.empty_table()
        agg = df.groupby("comm", sort=False)["deg"].sum().reset_index(name="dc")
        return pa.Table.from_pandas(
            agg, schema=dc_schema, preserve_index=False
        )

    dc = coarse_partition_apply(dl, ["comm"], comm_deg, dc_schema,
                                num_partitions=P)
    sq_parts = dc.map_batches(
        lambda t: pa.Table.from_pydict(
            {"n": [int(pc.sum(pc.multiply_checked(
                pc.cast(t.column("dc"), pa.int64()),
                pc.cast(t.column("dc"), pa.int64()))).as_py() or 0)]},
        ),
        batch_format="pyarrow",
    )
    sum_deg_sq = sum(r["n"] for r in sq_parts.take_all())

    q = float(intra) / float(m) - float(sum_deg_sq) / (4.0 * float(m) * float(m))
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"m_edges": [m], "intra_edges": [intra],
             "sum_deg_sq": [sum_deg_sq], "modularity": [q]},
            schema=MODULARITY_SCHEMA,
        )
    )


# --------------------------------------------------------------------------
# truncated closeness centrality from seed nodes
# --------------------------------------------------------------------------

CLOSENESS_SCHEMA = pa.schema(
    [("seed", pa.string()), ("reached", pa.int64()),
     ("sum_dist", pa.int64()), ("closeness", pa.float64())]
)


def closeness_from_seeds(
    seeds: list[str],
    edges: rd.Dataset,
    *,
    radius: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """RADIUS-TRUNCATED closeness centrality for an explicit seed list
    over the undirected view of ``edges``: per seed, the number of
    nodes within 1..``radius`` hops and the sum of their exact min-hop
    distances; closeness = reached / sum_dist (0.0 when nothing is
    reached) — the bounded variant production systems use (full
    closeness needs all-pairs BFS; truncation at a fixed radius keeps
    the cost one bounded BFS per seed and is the documented semantic,
    mirrored exactly by the SQL twin's bounded reachability CTE).

    Shape: one scale-switched bfs_hops per seed (seed count is an
    explicit small list — the caller picks deterministic seeds from a
    domain-bounded vocabulary, the kg_ego convention); per-seed
    aggregates fold as per-block (reached, sum) partials, driver sum is
    seed-count-bounded scalars. Distances never all-collect."""
    rows_seed, rows_reach, rows_sum, rows_cl = [], [], [], []
    edges = edges.materialize()
    for s in seeds:
        seed_ds = rd.from_arrow(
            pa.Table.from_pydict({"node_id": pa.array([s], pa.string())})
        )
        dist = bfs_hops(
            seed_ds, edges, max_hops=radius,
            src_col=src_col, dst_col=dst_col,
            **({} if driver_threshold is None
               else {"driver_threshold": driver_threshold}),
        )
        parts = dist.map_batches(
            lambda t: pa.Table.from_pydict(
                {"reached": [int(pc.sum(pc.cast(
                    pc.greater_equal(t.column("dist"), 1), pa.int64())
                 ).as_py() or 0)],
                 "sd": [int(pc.sum(pc.if_else(
                    pc.greater_equal(t.column("dist"), 1),
                    pc.cast(t.column("dist"), pa.int64()),
                    pa.scalar(0, pa.int64()))).as_py() or 0)]},
            ),
            batch_format="pyarrow",
        ).take_all()
        reached = sum(r["reached"] for r in parts)
        sd = sum(r["sd"] for r in parts)
        rows_seed.append(s)
        rows_reach.append(reached)
        rows_sum.append(sd)
        rows_cl.append(float(reached) / float(sd) if sd > 0 else 0.0)
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"seed": pa.array(rows_seed, pa.string()),
             "reached": pa.array(rows_reach, pa.int64()),
             "sum_dist": pa.array(rows_sum, pa.int64()),
             "closeness": pa.array(rows_cl, pa.float64())},
            schema=CLOSENESS_SCHEMA,
        )
    )


# --------------------------------------------------------------------------
# k-truss peeling (bounded rounds over edge_support)
# --------------------------------------------------------------------------

KTRUSS_SCHEMA = pa.schema([("node_a", pa.string()), ("node_b", pa.string())])


def _ktruss_driver(und: pa.Table, k: int, rounds: int) -> rd.Dataset:
    """Dense peel twin: build the boolean adjacency ONCE and peel
    in place — each round is one row-block support pass (the
    _support_block_kernel fan-out) followed by zeroing the dropped
    edges, instead of rebuilding edge set + degrees + adjacency
    through Ray per round (measured: 14.0 → 5.9 s for the 3-round
    3-truss at sf0.1). Identical per-round semantics to the
    distributed path (support computed on the CURRENT edge set);
    regime parity pytested."""
    import ray

    nodes, A = _dense_adjacency(und)
    n = len(nodes)
    kern = ray.remote(num_cpus=1)(_support_block_kernel)
    for _ in range(rounds):
        if not A.any():
            break
        A_ref = ray.put(A)
        parts = ray.get([
            kern.remote(A_ref, lo, hi)
            for lo, hi in _row_blocks(n, _n_matmul_tasks())
        ])
        ii = np.concatenate([p[0] for p in parts])
        jj = np.concatenate([p[1] for p in parts])
        ss = np.concatenate([p[2] for p in parts])
        drop = ss < k - 2
        if not drop.any():
            break
        di, dj = ii[drop], jj[drop]
        A[di, dj] = 0.0
        A[dj, di] = 0.0
        # compact to surviving nodes — the first peel round typically
        # drops most edges, so later matmuls run on a much smaller n
        keep = A.any(axis=1)
        if not keep.all():
            # np.ix_ integer gather — measured 0.1 s where boolean
            # 2-axis indexing and chained take() cost seconds on the
            # same matrix
            idx = np.flatnonzero(keep)
            A = A[np.ix_(idx, idx)]
            nodes = nodes[keep]
            n = len(nodes)
    iu, ju = np.nonzero(np.triu(A, 1))
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"node_a": pa.array(nodes[iu], pa.string()),
             "node_b": pa.array(nodes[ju], pa.string())},
            schema=KTRUSS_SCHEMA,
        )
    )


def ktruss_edges(
    edges: rd.Dataset,
    *,
    k: int = 3,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_node_threshold: int = SUPPORT_DRIVER_NODE_THRESHOLD,
) -> rd.Dataset:
    """BOUNDED k-TRUSS peeling over the undirected simple graph: each
    of the fixed ``rounds`` rounds recomputes per-edge triangle support
    on the SURVIVING edge set (stages/graph.edge_support — the wedge
    machinery, scale-switched) and drops edges with support < k-2.
    Like kcore/LPA, the result is the exact ``rounds``-prefix of the
    peel (the kcore convention: a fixed-round prefix is deterministic
    and SQL-unrollable, where run-to-convergence would leave round
    count data-dependent); on graphs whose peel stabilizes within the
    budget it IS the k-truss. Edges surviving round r keep their
    support ≥ k-2 certificate from round r's graph. Below
    ``driver_node_threshold`` nodes the whole peel runs in the dense
    twin (adjacency built once, one row-block support pass + in-place
    zeroing per round — ``_ktruss_driver``); a round that drops
    nothing ends the peel early, equivalently on either path (peeling
    is monotone: an unchanged edge set leaves every support unchanged,
    so all later rounds are no-ops and the early exit IS the
    rounds-prefix).

    Cohesion semantics: the 3-truss drops every edge not backed by a
    triangle — the 'relation corroborated by at least one third party'
    filter for KG cleaning (reference analogue: driver-side NetworkX
    cohesion queries, /root/reference/knowledge_graph/
    knowledge_graph.py). Cost: ``rounds`` × edge_support."""
    import ray

    cur = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    if _simple_degrees(cur, None).count() <= driver_node_threshold:
        tables = [t for t in ray.get(cur.to_arrow_refs()) if t.num_rows > 0]
        if not tables:
            return rd.from_arrow(KTRUSS_SCHEMA.empty_table())
        return _ktruss_driver(pa.concat_tables(tables), k, rounds)
    for _ in range(rounds):
        if cur.count() == 0:
            break
        sup = edge_support(
            cur, src_col="a", dst_col="b",
            driver_node_threshold=driver_node_threshold,
        )
        cur = sup.map_batches(
            lambda t, _k=k: (
                lambda kept: pa.Table.from_pydict(
                    {"a": kept.column("node_a"), "b": kept.column("node_b")},
                    schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
                )
            )(t.filter(pc.greater_equal(t.column("support"), _k - 2))),
            batch_format="pyarrow",
        ).materialize()
    return cur.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_a": t.column("a"), "node_b": t.column("b")},
            schema=KTRUSS_SCHEMA,
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# shortest-path counts from a seed (Brandes sigma — layered DAG DP)
# --------------------------------------------------------------------------

SIGMA_SCHEMA = pa.schema(
    [("node_id", pa.string()), ("dist", pa.int64()), ("sigma", pa.int64())]
)


def shortest_path_counts(
    seed: str | list[str],
    edges: rd.Dataset,
    *,
    radius: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_threshold: int | None = None,
) -> rd.Dataset:
    """σ (SHORTEST-PATH COUNTS) from ``seed`` over the undirected simple
    graph, radius-bounded: for every node within ``radius`` hops, the
    exact number of distinct shortest paths from the seed — the Brandes
    (2001) forward pass and the quantity betweenness/centrality
    estimators accumulate. All-integer (σ sums over BFS-DAG
    predecessors are exact int64 and layer-local, so block layout never
    matters), hence SQL-twinnable as unrolled layer CTEs.

    Shape: one scale-switched BFS for the hop distances, then one
    LAYERED DP round per hop — layer r's σ is ONE edge cogroup (edges
    whose endpoints sit at dist r-1 / r) + ONE per-node sum; σ rows
    live per layer (frontier-sized), never collected. int64 bound: σ
    can reach ~(avg_deg)^radius on dense layers — radius 4 at deg 10³
    is 10¹² (fine); deeper radii on dense graphs need the bound check
    the docstring documents (multiply-free sums can't overflow-check
    cheaply, so callers own the radius choice).

    ``seed`` may be a LIST of seeds: all start at dist 0 / σ=1 and the
    whole run shares ONE plan (one BFS, one layer-DP round per hop —
    half the shuffle rounds of two sequential runs for a pair). With
    multiple seeds the per-node dist/σ are the MULTI-SOURCE values
    (min-dist, σ summed over min-dist seeds); callers needing PER-SEED
    values must separate the seeds structurally — e.g. the
    seed-prefixed disjoint-component trick kg_path_transit uses."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_attach,
        coarse_partition_apply,
    )

    # dedupe while preserving order: a repeated seed (e.g. a transit
    # query whose s and t coincide) must not double sigma contributions
    seeds = [seed] if isinstance(seed, str) else list(dict.fromkeys(seed))
    und = undirected_simple_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    seed_ds = rd.from_arrow(
        pa.Table.from_pydict({"node_id": pa.array(seeds, pa.string())})
    )
    dist = bfs_hops(
        seed_ds, und, max_hops=radius, src_col="a", dst_col="b",
        **({} if driver_threshold is None
           else {"driver_threshold": driver_threshold}),
    ).materialize()
    P = _default_partitions(und)

    # symmetric edges with both endpoint distances attached
    sym = und.map_batches(
        lambda t: pa.Table.from_pydict(
            {"u": pa.chunked_array([_str(t.column("a")), _str(t.column("b"))]),
             "v": pa.chunked_array([_str(t.column("b")), _str(t.column("a"))])},
        ),
        batch_format="pyarrow",
    )
    du_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                           ("du", pa.int64())])
    duv_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("du", pa.int64()), ("dv", pa.int64())])
    e1 = coarse_attach(
        sym, dist, left_key="u", right_key="node_id",
        attach_cols=["dist"], attach_as=["du"], out_schema=du_schema,
        num_partitions=P, how="inner",
    )
    e2 = coarse_attach(
        e1, dist, left_key="v", right_key="node_id",
        attach_cols=["dist"], attach_as=["dv"], out_schema=duv_schema,
        num_partitions=P, how="inner",
    ).materialize()

    sv_schema = pa.schema([("node", pa.string()), ("sigma", pa.int64())])
    frontier = rd.from_arrow(
        pa.Table.from_pydict(
            {"node": pa.array(seeds, pa.string()),
             "sigma": pa.array([1] * len(seeds), pa.int64())},
            schema=sv_schema,
        )
    )
    out_ds = rd.from_arrow(pa.Table.from_pydict(
        {"node_id": pa.array(seeds, pa.string()),
         "dist": pa.array([0] * len(seeds), pa.int64()),
         "sigma": pa.array([1] * len(seeds), pa.int64())},
        schema=SIGMA_SCHEMA,
    ))
    for r in range(1, radius + 1):
        layer_edges = e2.map_batches(
            lambda t, _r=r: t.filter(
                pc.and_(pc.equal(t.column("du"), _r - 1),
                        pc.equal(t.column("dv"), _r))
            ).select(["u", "v"]),
            batch_format="pyarrow",
        )
        att_schema = pa.schema([("v", pa.string()), ("sigma", pa.int64())])
        contrib = coarse_attach(
            layer_edges, frontier, left_key="u", right_key="node",
            attach_cols=["sigma"], out_schema=att_schema,
            num_partitions=P, how="inner",
        )

        def part_sum(t: pa.Table, _sv=sv_schema) -> pa.Table:
            # Arrow-native per-layer sum fold (one per DP round); null
            # keys dropped (previous pandas dropna=True semantics)
            if t.column("node").null_count:
                t = t.filter(pc.is_valid(t.column("node")))
            if t.num_rows == 0:
                return _sv.empty_table()
            agg = t.group_by(["node"]).aggregate([("sigma", "sum")])
            return pa.Table.from_pydict(
                {"node": agg.column("node"),
                 "sigma": pc.cast(agg.column("sigma_sum"), pa.int64())},
                schema=_sv,
            )

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["v"]).aggregate([("sigma", "sum")])
            return pa.Table.from_pydict(
                {"node": _str(g.column("v")),
                 "sigma": pc.cast(g.column("sigma_sum"), pa.int64())},
                schema=sv_schema,
            )

        frontier = coarse_partition_apply(
            contrib.map_batches(partial, batch_format="pyarrow"),
            ["node"], part_sum, sv_schema, num_partitions=P,
            fn_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:
            break
        out_ds = out_ds.union(frontier.map_batches(
            lambda t, _r=r: pa.Table.from_pydict(
                {"node_id": t.column("node"),
                 "dist": pa.nulls(t.num_rows, pa.int64()).fill_null(_r),
                 "sigma": t.column("sigma")},
                schema=SIGMA_SCHEMA,
            ),
            batch_format="pyarrow",
        ))
    return out_ds
