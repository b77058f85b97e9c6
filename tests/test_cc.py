"""Connected components (stages/cc.py): exact semantics of the
vectorized min-label kernel — component min labels, asymmetric input
edges, edges referencing nodes absent from ``nodes``, multi-block
layouts, and the lookup_labels identity fallback."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.stages.cc import (
    connected_components,
    lookup_labels,
    min_label_components,
)


def _ds(rows: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(rows))


@pytest.mark.parametrize("n_blocks", [1, 4])
def test_components_chain_and_singleton(ray_session, n_blocks):
    """Chain d-c-b-a collapses to 'a' (needs >1 round: diameter 3);
    isolated node keeps itself; asymmetric edge direction is irrelevant."""
    nodes = _ds({"node": ["a", "b", "c", "d", "z"]}).repartition(n_blocks)
    edges = _ds({"src": ["d", "c", "b"], "dst": ["c", "b", "a"]})
    got = {
        r["node"]: r["label"]
        for r in min_label_components(nodes, edges, max_rounds=8).take_all()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "z": "z"}


def test_components_unknown_edge_endpoint(ray_session):
    """An edge referencing a node absent from ``nodes`` must not poison
    labels: the unknown key labels itself, and known nodes still get the
    component min."""
    nodes = _ds({"node": ["m", "n"]})
    edges = _ds({"src": ["m", "ghost"], "dst": ["n", "m"]})
    got = {
        r["node"]: r["label"]
        for r in min_label_components(nodes, edges, max_rounds=8).take_all()
    }
    # 'ghost' < 'm': the unknown endpoint participates in propagation via
    # its self-label, so the component min includes it
    assert got["m"] == "ghost" and got["n"] == "ghost"


@pytest.mark.parametrize("driver_threshold", [0, 10_000])
def test_connected_components_regime_parity(ray_session, driver_threshold):
    """Scale-switch wrapper: threshold 0 forces distributed min-label
    propagation, 10k the driver union-find — identical (node, label)
    output on a two-component graph with an isolated node."""
    nodes = _ds({"node": ["a", "b", "c", "p", "q", "lone"]})
    edges = _ds({"src": ["c", "b", "q"], "dst": ["b", "a", "p"]})
    got = {
        r["node"]: r["label"]
        for r in connected_components(
            nodes, edges, max_rounds=8,
            driver_edge_threshold=driver_threshold,
        ).take_all()
    }
    assert got == {"a": "a", "b": "a", "c": "a",
                   "p": "p", "q": "p", "lone": "lone"}


def test_lookup_labels_identity_fallback(ray_session):
    """Items whose key has no label row map to the key itself; others map
    to their component label."""
    labels = _ds({"node": ["x", "y"], "label": ["x", "x"]})
    items = _ds(
        {"k": ["y", "unseen"], "v": ["Surface-Y", "Surface-U"]}
    )
    got = {
        r["surface"]: r["canonical"]
        for r in lookup_labels(
            items, labels, key_col="k", value_col="v"
        ).take_all()
    }
    assert got == {"Surface-Y": "x", "Surface-U": "unseen"}
