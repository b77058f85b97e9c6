"""Distributed connected components via iterative min-label propagation —
pure Ray Data cogroups (coarse-partition shuffles), no Dataset.join.

Shared by canonicalization (stages/canon.py) and near-dup clustering
(stages/dedup.py). Semantics: given nodes (column ``node``) and undirected
edges (columns ``src``, ``dst``), returns (node, label) where ``label`` is
the lexicographic min node of the component. Converges in O(diameter)
rounds; each round is two coarse shuffles (cogroup + min-aggregate). A
label checksum short-circuits the loop at fixpoint.

Scale notes: the cogroup ships each node's incident edges plus one label
row per round. For star-shaped edge sets (what blocking emits) diameter is
tiny; for arbitrary graphs bound ``max_rounds``. Hot nodes (a label that
half the graph points at) are fine: the partition key is the NODE, and
per-node degree is bounded by the blocking fan-out, not by corpus skew.
Per-round work is fully vectorized — pandas C-level groupby/merge inside
each coarse partition (an earlier version paid Ray's ~25µs-per-group
native groupby plus one Python call per NODE per round; measured removal
in BASELINE.md). Labels are repartitioned to a fixed P before each
round's materialize — without the bound the materialized label set
inherits the union's block count and iteration cost grows quadratically
in rounds (the same pathology measured on stages/graph.pagerank).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from semantic_search_system_ray.functions.hashing import stable_hash64
from semantic_search_system_ray.stages.util import (
    _default_partitions,
    _polars_routing,
    coarse_partition_apply,
)

_CG_SCHEMA = pa.schema(
    [("key", pa.string()), ("src", pa.string()),
     ("label", pa.string()), ("is_label", pa.bool_())]
)
_MSG_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])

_CHECKSUM_MOD = (1 << 31) - 1


def label_checksum(labels: rd.Dataset) -> int:
    """Order-independent fingerprint of a (node, label) set — mod-sum of a
    per-row hash, so block layout / parallelism never changes it. Needs
    only WITHIN-JOB consistency (compared across rounds of one run):
    primary path hashes the joined column with polars (vectorized, same
    driver-decided flag convention as stages/util._route_parts); fallback
    is the per-row stable_hash64 loop."""
    use_polars = _polars_routing()  # driver-decided, captured by value

    def batch_sum(batch: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            pc.cast(batch.column("node"), pa.string()),
            pc.cast(batch.column("label"), pa.string()),
            "\x00",
        )
        if use_polars:
            import polars as pl

            h = pl.from_arrow(joined).hash(seed=0).to_numpy()
            s = int(np.sum(h % _CHECKSUM_MOD, dtype=np.uint64) % _CHECKSUM_MOD)
        else:
            s = 0
            for v in joined.to_pylist():
                s = (s + stable_hash64(v)) % _CHECKSUM_MOD
        return pa.Table.from_pydict({"s": pa.array([s], pa.int64())})

    part = labels.map_batches(batch_sum, batch_format="pyarrow")
    return int(part.sum("s") or 0) % _CHECKSUM_MOD


def _labels_as_cg(t: pa.Table) -> pa.Table:
    n = t.num_rows
    return pa.Table.from_arrays(
        [t.column("node"), pa.array([""] * n, pa.string()),
         t.column("label"), pa.array([True] * n)],
        schema=_CG_SCHEMA,
    )


def _edges_as_cg(t: pa.Table) -> pa.Table:
    n = t.num_rows
    return pa.Table.from_arrays(
        [t.column("dst"), t.column("src"),
         pa.array([""] * n, pa.string()), pa.array([False] * n)],
        schema=_CG_SCHEMA,
    )


def _emit_messages_part(df: pd.DataFrame) -> pa.Table:
    """One coarse partition of the label⋃edge cogroup → min-label
    messages, fully vectorized. Per key: its (unique) label row's label —
    or the key ITSELF when no label row exists (an edge may reference a
    node absent from ``nodes``; min() over empty would poison the string
    schema) — is sent to the key and to every edge src pointing at it."""
    if df.empty:
        return _MSG_SCHEMA.empty_table()
    lab = (
        df.loc[df["is_label"]]
        .groupby("key", sort=False)["label"].min()
    )
    keys = pd.Index(pd.unique(df["key"]))
    lab = lab.reindex(keys)
    missing = lab.isna()
    if missing.any():
        lab[missing] = lab.index[missing]
    edges = df.loc[~df["is_label"]]
    out_nodes = np.concatenate(
        [keys.to_numpy(), edges["src"].to_numpy()]
    )
    out_labels = np.concatenate(
        [lab.to_numpy(), lab.loc[edges["key"]].to_numpy()]
    )
    return pa.Table.from_pydict(
        {"node": out_nodes, "label": out_labels}, schema=_MSG_SCHEMA
    )


def _min_label_part(t: pa.Table) -> pa.Table:
    # Arrow-native per-round min fold (no pandas conversion in the CC
    # loop's exchange; string min is a native Arrow group aggregate).
    # Null keys dropped (previous pandas dropna=True semantics).
    if t.column("node").null_count:
        t = t.filter(pc.is_valid(t.column("node")))
    if t.num_rows == 0:
        return _MSG_SCHEMA.empty_table()
    g = t.group_by(["node"]).aggregate([("label", "min")])
    return pa.Table.from_pydict(
        {"node": g.column("node"), "label": g.column("label_min")},
        schema=_MSG_SCHEMA,
    )


def min_label_fixpoint(
    labels: rd.Dataset,
    edges: rd.Dataset,
    *,
    max_rounds: int = 10,
    num_partitions: int | None = None,
    require_convergence: bool = False,
) -> rd.Dataset:
    """DIRECTED min-label propagation to fixpoint: each round, for every
    edge row (src, dst), ``label(src) ← min(label(src), label(dst))`` —
    labels PULL along edges from dst into src (callers wanting the
    src→dst flow pass swapped edge columns). ``labels`` must carry one
    row per node of interest; edge endpoints absent from ``labels``
    contribute their own id as an implicit label (see
    ``_emit_messages_part``). Checksum early exit at fixpoint; the
    shared loop under ``min_label_components`` (WCC via symmetrized
    edges) and graph.scc_labels' coloring/marking passes.
    ``require_convergence=True`` raises loudly when the round budget is
    exhausted before a no-change round — callers whose SEMANTICS are the
    true fixpoint (SCC) must not silently accept a prefix."""
    edges = edges.materialize()
    labels = labels.materialize()
    P = (
        num_partitions
        if num_partitions is not None
        else _default_partitions(labels, edges)
    )

    prev = label_checksum(labels)
    converged = False
    for _ in range(max_rounds):
        combined = labels.map_batches(_labels_as_cg, batch_format="pyarrow").union(
            edges.map_batches(_edges_as_cg, batch_format="pyarrow")
        )
        messages = coarse_partition_apply(
            combined, ["key"], _emit_messages_part, _MSG_SCHEMA,
            num_partitions=P,
        )
        labels = (
            coarse_partition_apply(
                messages, ["node"], _min_label_part, _MSG_SCHEMA,
                num_partitions=P, fn_format="pyarrow",
            )
            .repartition(P)
            .materialize()
        )
        cur = label_checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if require_convergence and not converged:
        raise RuntimeError(
            f"min_label_fixpoint: no fixpoint within max_rounds={max_rounds} "
            "(label checksum still changing); raise the round budget"
        )
    return labels


def min_label_components(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    *,
    max_rounds: int = 10,
) -> rd.Dataset:
    """nodes(node) + edges(src, dst) → (node, label). Edges need not be
    symmetric (symmetrized internally) and may reference unknown nodes
    (ignored by the final min-aggregate semantics)."""
    edges_sym = edges.union(
        edges.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t.column("dst"), "dst": t.column("src")}
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    labels = nodes.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t.column("node"), "label": t.column("node")}
        ),
        batch_format="pyarrow",
    ).materialize()

    # one partition count for every round (in-loop unions are un-executed
    # plans with unknown size; a constant P keeps iteration cost flat)
    P = _default_partitions(labels, edges_sym)
    return min_label_fixpoint(
        labels, edges_sym, max_rounds=max_rounds, num_partitions=P
    )


def connected_components(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    *,
    max_rounds: int = 10,
    driver_edge_threshold: int | None = None,
) -> rd.Dataset:
    """Scale-switched wrapper over ``min_label_components`` (same
    convention as stages/dedup._cluster_labels and graph.pagerank): edge
    sets at or below ``driver_edge_threshold`` rows run an exact driver
    union-find — on small graphs the iterative distributed path is pure
    shuffle overhead (measured 29.5 s for a 48k-edge WCC at sf0.1 vs
    <1 s driver-side; BASELINE.md) — and only the label dict is
    broadcast; larger edge sets take the distributed propagation.
    Output (node, label) is identical across regimes (parity pytested:
    tests/test_cc.py). Contract: ``nodes`` must cover every edge
    endpoint — endpoints absent from ``nodes`` get label rows on the
    distributed path but not here (the one observable regime
    difference; every caller passes a covering node set)."""
    edges = edges.materialize()
    if driver_edge_threshold is None:
        from semantic_search_system_ray.context import scale_config

        driver_edge_threshold = scale_config().cc_driver_edges
    if edges.count() > driver_edge_threshold:
        return min_label_components(nodes, edges, max_rounds=max_rounds)

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for block in ray.get(
        edges.select_columns(["src", "dst"]).to_arrow_refs()
    ):
        # empty shuffle partitions surface as zero-column blocks
        if block.num_rows == 0 or "src" not in block.schema.names:
            continue
        for u, v in zip(
            pc.cast(block.column("src"), pa.string()).to_pylist(),
            pc.cast(block.column("dst"), pa.string()).to_pylist(),
        ):
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
    labels = {n: find(n) for n in parent}
    ref = ray.put(labels)

    class _Label:
        def __init__(self):
            self.labels = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ns = pc.cast(t.column("node"), pa.string()).to_pylist()
            return pa.Table.from_pydict(
                {"node": pa.array(ns, pa.string()),
                 "label": pa.array(
                     [self.labels.get(n, n) for n in ns], pa.string()
                 )},
                schema=_MSG_SCHEMA,
            )

    # nodes absent from any edge are singletons (identity label) — no
    # shuffle at all on this path
    return nodes.map_batches(_Label, batch_format="pyarrow", concurrency=(1, 8))


def lookup_labels(
    items: rd.Dataset,
    labels: rd.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_key: str = "surface",
    out_value: str = "canonical",
) -> rd.Dataset:
    """Map items[value_col→key_col] through labels(node→label) with a
    cogroup (join-free): returns (out_key=items[value_col], out_value=label
    of items[key_col]); items whose key has no label map to the key itself.
    Per-partition work is a vectorized pandas groupby + map (same shape as
    the round kernel above)."""
    out_schema = pa.schema([(out_key, pa.string()), (out_value, pa.string())])

    def _items_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column(key_col), t.column(value_col),
             pa.array([""] * n, pa.string()), pa.array([False] * n)],
            schema=_CG_SCHEMA,
        )

    def _lookup_part(df: pd.DataFrame) -> pa.Table:
        items_part = df.loc[~df["is_label"]]
        if items_part.empty:
            return out_schema.empty_table()
        lab = (
            df.loc[df["is_label"]]
            .groupby("key", sort=False)["label"].min()
        )
        keys = items_part["key"]
        mapped = keys.map(lab)
        mapped = mapped.where(mapped.notna(), keys)
        return pa.Table.from_pydict(
            {out_key: items_part["src"].to_numpy(),
             out_value: mapped.to_numpy()},
            schema=out_schema,
        )

    combined = labels.map_batches(_labels_as_cg, batch_format="pyarrow").union(
        items.map_batches(_items_as_cg, batch_format="pyarrow")
    )
    return coarse_partition_apply(combined, ["key"], _lookup_part, out_schema)
