"""Distributed canonicalization: union-find connected components over
blocking keys, expressed purely in Ray Data primitives.

Replaces the reference's in-memory complete-linkage phrase clustering
(nlp/topic_modeling.py:31-36) with the scale idiom the north rule pins:

1. normalize each distinct surface form (functions.canon_spec.norm_surface);
2. emit (block_key, norm) rows — TWO blocking keys per form (first token /
   last token), so components can span blocks;
3. per block, ``groupby(block_key).map_groups`` emits star edges linking
   each member to the lexicographic min of its (first, last)-token group —
   O(group) edges, never O(group²) pairs;
4. iterative min-label propagation to fixpoint: repeat
   ``labels(node) = min(labels over node ∪ neighbors)`` using
   ``Dataset.join`` (hash-partitioned) + ``groupby(node).min`` until a
   global label checksum stops changing (≤ max_rounds; component diameter
   here is tiny because edges are stars, but the loop is general);
5. canonical(form) = final label = min normalized form of its component.

Scale notes: everything operates on DISTINCT surface forms (≪ docs; the
head entity collapses to 3 rows no matter how many of the 10^12 docs
mention it — the distinct itself is two-phase: per-batch set, then global
groupby). The final surface→canonical map is applied to triples either by
broadcast (`ray.put`, small map) or by hash join (large map) — see
``apply_canon``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Min

from semantic_search_system_ray.functions.canon_spec import (
    blocking_keys,
    first_last,
    norm_surface,
)
from semantic_search_system_ray.functions.hashing import stable_hash64
from semantic_search_system_ray.stages.util import ensure_schema


def _surface_norms(batch: pa.Table) -> pa.Table:
    surfaces = batch.column("surface").to_pylist()
    return pa.Table.from_pydict(
        {"surface": surfaces, "norm": [norm_surface(s) for s in surfaces]}
    )


def _block_rows(batch: pa.Table) -> pa.Table:
    keys, norms = [], []
    for n in batch.column("norm").to_pylist():
        for k in blocking_keys(n):
            keys.append(k)
            norms.append(n)
    return pa.Table.from_pydict(
        {"block_key": pa.array(keys, pa.string()), "norm": pa.array(norms, pa.string())}
    )


def _block_edges(group: pd.DataFrame) -> pa.Table:
    """Within one block: link members sharing (first, last) tokens via star
    edges to the group's lexicographic min member. Returns Arrow with an
    explicit schema — an empty pandas frame would degrade string columns to
    Arrow ``null`` type and break the downstream join schema."""
    members = sorted(set(group["norm"]))
    by_pair: dict[tuple[str, str], list[str]] = {}
    for n in members:
        by_pair.setdefault(first_last(n), []).append(n)
    src, dst = [], []
    for grp in by_pair.values():
        rep = grp[0]  # sorted → min
        for n in grp[1:]:
            src.append(n)
            dst.append(rep)
    return pa.Table.from_pydict(
        {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
    )


def _label_checksum(labels: rd.Dataset) -> int:
    mod = (1 << 31) - 1  # sums of per-batch partials stay well inside int64

    def batch_sum(batch: pa.Table) -> pa.Table:
        s = 0
        for n, l in zip(
            batch.column("node").to_pylist(), batch.column("label").to_pylist()
        ):
            s = (s + stable_hash64(f"{n}\x00{l}")) % mod
        return pa.Table.from_pydict({"s": pa.array([s], pa.int64())})

    part = labels.map_batches(batch_sum, batch_format="pyarrow")
    return int(part.sum("s") or 0) % mod


def canonical_map_ds(
    surfaces_ds: rd.Dataset,
    *,
    num_partitions: int = 8,
    max_rounds: int = 10,
) -> rd.Dataset:
    """surfaces Dataset (column ``surface``, not necessarily distinct) →
    Dataset of (surface, canonical)."""
    # distinct surfaces (two-phase: per-batch distinct, then groupby)
    surf = (
        surfaces_ds.map_batches(
            lambda t: pa.Table.from_pydict(
                {"surface": pa.array(sorted(set(t.column("surface").to_pylist())))}
            ),
            batch_format="pyarrow",
        )
        .groupby("surface")
        .count()
        .drop_columns(["count()"])
    )
    surf_norm = surf.map_batches(_surface_norms, batch_format="pyarrow")

    norms = (
        surf_norm.select_columns(["norm"]).groupby("norm").count().drop_columns(["count()"])
    )
    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    edges = ensure_schema(
        norms.map_batches(_block_rows, batch_format="pyarrow")
        .groupby("block_key")
        .map_groups(_block_edges, batch_format="pandas"),
        edge_schema,
    )
    # symmetric edge list (min-label must flow both ways)
    edges_sym = edges.union(
        edges.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t.column("dst"), "dst": t.column("src")}
            ),
            batch_format="pyarrow",
        )
    ).materialize()  # small derived table, reused every round

    labels = norms.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t.column("norm"), "label": t.column("norm")}
        ),
        batch_format="pyarrow",
    ).materialize()

    # Label lookup is expressed as a COGROUP (groupby(key).map_groups over
    # the union of label rows and edge rows) rather than Dataset.join:
    # equivalent dataflow (one hash shuffle), and robust to empty hash
    # partitions, which break ray 2.49's join finalize on small inputs.
    cg_schema = pa.schema(
        [("key", pa.string()), ("src", pa.string()),
         ("label", pa.string()), ("is_label", pa.bool_())]
    )
    msg_schema = pa.schema([("node", pa.string()), ("label", pa.string())])

    def _labels_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node"), pa.array([""] * n, pa.string()),
             t.column("label"), pa.array([True] * n)],
            schema=cg_schema,
        )

    def _edges_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("dst"), t.column("src"),
             pa.array([""] * n, pa.string()), pa.array([False] * n)],
            schema=cg_schema,
        )

    def _emit_messages(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["is_label"], "label"].min()  # exactly one label row
        nodes = [g["key"].iloc[0]] + list(g.loc[~g["is_label"], "src"])
        return pa.Table.from_arrays(
            [pa.array(nodes, pa.string()),
             pa.array([lab] * len(nodes), pa.string())],
            schema=msg_schema,
        )

    prev = _label_checksum(labels)
    for _ in range(max_rounds):
        combined = labels.map_batches(_labels_as_cg, batch_format="pyarrow").union(
            edges_sym.map_batches(_edges_as_cg, batch_format="pyarrow")
        )
        messages = ensure_schema(
            combined.groupby("key").map_groups(_emit_messages, batch_format="pandas"),
            msg_schema,
        )
        labels = (
            messages.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = _label_checksum(labels)
        if cur == prev:
            break
        prev = cur

    # surface → canonical: same cogroup pattern on norm
    out_schema = pa.schema([("surface", pa.string()), ("canonical", pa.string())])

    def _surfaces_as_cg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("norm"), t.column("surface"),
             pa.array([""] * n, pa.string()), pa.array([False] * n)],
            schema=cg_schema,
        )

    def _emit_canon(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["is_label"], "label"]
        canonical = lab.min() if len(lab) else g["key"].iloc[0]
        surfs = list(g.loc[~g["is_label"], "src"])
        return pa.Table.from_arrays(
            [pa.array(surfs, pa.string()),
             pa.array([canonical] * len(surfs), pa.string())],
            schema=out_schema,
        )

    combined = labels.map_batches(_labels_as_cg, batch_format="pyarrow").union(
        surf_norm.map_batches(_surfaces_as_cg, batch_format="pyarrow")
    )
    return ensure_schema(
        combined.groupby("key").map_groups(_emit_canon, batch_format="pandas"),
        out_schema,
    )


def canonical_map_dict(surfaces_ds: rd.Dataset, **kwargs) -> dict[str, str]:
    """Materialize the canonical map as a dict (for broadcast application).
    Only valid when the distinct-surface count fits the driver; the
    engine's default for the gazetteer-scale corpora used here."""
    tbl = canonical_map_ds(surfaces_ds, **kwargs).to_pandas()
    return dict(zip(tbl["surface"], tbl["canonical"]))


def apply_canon_broadcast(ds: rd.Dataset, canon: dict[str, str], columns: list[str]) -> rd.Dataset:
    """Map the named string columns through the canonical map (identity for
    unknown values). The map travels via ray.put ONCE; each task reads it
    from the object store (never re-shipped per batch)."""
    ref = ray.put(canon)

    class _Apply:
        def __init__(self):
            self.canon = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            for col in columns:
                vals = batch.column(col).to_pylist()
                mapped = [self.canon.get(v, v) for v in vals]
                batch = batch.set_column(
                    batch.schema.get_field_index(col), col, pa.array(mapped, pa.string())
                )
            return batch

    return ds.map_batches(_Apply, batch_format="pyarrow", concurrency=(1, 8))
