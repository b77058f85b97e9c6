"""Distributed connected components via iterative min-label propagation —
pure Ray Data (groupby + map_groups cogroups), no Dataset.join.

Shared by canonicalization (stages/canon.py) and near-dup clustering
(stages/dedup.py). Semantics: given nodes (column ``node``) and undirected
edges (columns ``src``, ``dst``), returns (node, label) where ``label`` is
the lexicographic min node of the component. Converges in O(diameter)
rounds; each round is two hash shuffles (cogroup + min-aggregate). A label
checksum short-circuits the loop at fixpoint.

Scale notes: the cogroup ships each node's incident edges plus one label
row per round. For star-shaped edge sets (what blocking emits) diameter is
tiny; for arbitrary graphs bound ``max_rounds``. Hot nodes (a label that
half the graph points at) are fine: the groupby key is the NODE, and
per-node degree is bounded by the blocking fan-out, not by corpus skew.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min

from semantic_search_system_ray.functions.hashing import stable_hash64
from semantic_search_system_ray.stages.util import ensure_schema

_CG_SCHEMA = pa.schema(
    [("key", pa.string()), ("src", pa.string()),
     ("label", pa.string()), ("is_label", pa.bool_())]
)
_MSG_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def label_checksum(labels: rd.Dataset) -> int:
    mod = (1 << 31) - 1

    def batch_sum(batch: pa.Table) -> pa.Table:
        s = 0
        for n, l in zip(
            batch.column("node").to_pylist(), batch.column("label").to_pylist()
        ):
            s = (s + stable_hash64(f"{n}\x00{l}")) % mod
        return pa.Table.from_pydict({"s": pa.array([s], pa.int64())})

    part = labels.map_batches(batch_sum, batch_format="pyarrow")
    return int(part.sum("s") or 0) % mod


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


def _emit_messages(g: pd.DataFrame) -> pa.Table:
    lab_rows = g.loc[g["is_label"], "label"]  # exactly one label row per KNOWN key
    # an edge may reference a node absent from `nodes`: no label row exists
    # for it — use the key itself as its label (min() over empty → NaN
    # would poison the string schema downstream)
    lab = lab_rows.min() if len(lab_rows) else g["key"].iloc[0]
    nodes = [g["key"].iloc[0]] + list(g.loc[~g["is_label"], "src"])
    return pa.Table.from_arrays(
        [pa.array(nodes, pa.string()), pa.array([lab] * len(nodes), pa.string())],
        schema=_MSG_SCHEMA,
    )


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

    prev = label_checksum(labels)
    for _ in range(max_rounds):
        combined = labels.map_batches(_labels_as_cg, batch_format="pyarrow").union(
            edges_sym.map_batches(_edges_as_cg, batch_format="pyarrow")
        )
        messages = ensure_schema(
            combined.groupby("key").map_groups(_emit_messages, batch_format="pandas"),
            _MSG_SCHEMA,
        )
        labels = (
            messages.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = label_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


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
    of items[key_col]); items whose key has no label map to the key itself."""
    out_schema = pa.schema([(out_key, pa.string()), (out_value, pa.string())])

    def _items_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column(key_col), t.column(value_col),
             pa.array([""] * n, pa.string()), pa.array([False] * n)],
            schema=_CG_SCHEMA,
        )

    def _emit(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["is_label"], "label"]
        canonical = lab.min() if len(lab) else g["key"].iloc[0]
        vals = list(g.loc[~g["is_label"], "src"])
        return pa.Table.from_arrays(
            [pa.array(vals, pa.string()),
             pa.array([canonical] * len(vals), pa.string())],
            schema=out_schema,
        )

    combined = labels.map_batches(_labels_as_cg, batch_format="pyarrow").union(
        items.map_batches(_items_as_cg, batch_format="pyarrow")
    )
    return ensure_schema(
        combined.groupby("key").map_groups(_emit, batch_format="pandas"),
        out_schema,
    )
