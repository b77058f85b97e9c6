"""Execution-context tuning + the centralized scale-switch config.

Ray Data's defaults (min_parallelism=200, hash-shuffle parallelism=200)
are sized for big multi-node clusters; on an N-CPU node they fragment
small shuffles into hundreds of micro-tasks whose fixed cost dominates.
``tune(num_cpus)`` scales those knobs to the session — call it from the
process that owns ``ray.init`` (bench.py, CLIs, test fixture). Library
code never mutates the context: the driver owns it.

At real cluster scale the same function applies: pass total cluster CPUs
and the shuffle fan-out grows back to hundreds of partitions.

``scale_config()`` is the single source of truth for every
driver-twin / broadcast-vs-shuffle regime threshold in the package
(dedup verify, canon fold, iterative graph algorithms, coarse_attach
broadcast, dq domain switch). Each knob was MEASURED on the 32-CPU /
128-GiB reference box (the anchors below) and scales linearly with the
memory the regime actually consumes on a different cluster:

- row/edge knobs gate a DRIVER-side exact twin or a broadcast lookup —
  they scale with the driver node's usable heap (anchor arithmetic per
  knob in ``ScaleConfig``), because that is the memory the collected
  rows land in;
- ``attach_broadcast_bytes`` gates materializing a dimension side into
  every map task — it scales with the PER-NODE object store, because a
  broadcast table is pinned once per node.

Every knob clamps to [anchor/8, anchor*8] so a mis-reported memory
figure can never push a regime past its measured envelope, and every
knob has an ``SSR_<NAME>`` env override (integer) that wins outright —
the operator of a real multi-node cluster retunes with five env vars
instead of a source edit. Library call sites take ``threshold=None``
and resolve through ``scale_config()`` at call time, so overrides set
before the first use always apply.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


def tune(num_cpus: int) -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    par = max(8, 2 * num_cpus)
    ctx.min_parallelism = par
    ctx.default_hash_shuffle_parallelism = par
    # Per-operator CPU reservation splits the session's CPUs across every
    # operator in the DAG; with a multi-stage plan the hot map stage ends
    # up with a fraction of the cores (measured: ~12 of 32 running).
    # Disable it — backpressure still bounds memory via block budgets.
    ctx.op_resource_reservation_enabled = False
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


# ---------------------------------------------------------------------------
# Centralized scale-switch thresholds
# ---------------------------------------------------------------------------

_ANCHOR_MEM_BYTES = 128 << 30        # the measured reference box: 128 GiB
_ANCHOR_STORE_BYTES = 38 << 30       # its default object store (~30% of RAM)


@dataclass(frozen=True)
class ScaleConfig:
    """Every regime threshold in one place, with its memory arithmetic.

    verify_broadcast_rows — dedup near-dup verification attaches
        signatures/grams to candidate pairs via a driver-built broadcast
        map at ~0.5 KiB/doc (sig bytes + serialized grams + dict
        overhead); anchor 1M docs ≈ 0.5 GiB on the driver and pinned
        once per node. Beyond it the pipelines switch to the
        distributed hash-join attach.
    canon_driver_rows — canonical-map construction collects the
        DISTINCT surface rows (~0.25 KiB/row as Python dict entries);
        anchor 200k ≈ 50 MiB. Beyond it the non-identity merges are
        counted distributively and only those collect (or the full
        Dataset regime runs).
    graph_driver_edges — iterative graph algorithms (pagerank/BFS/
        k-core/LPA/SCC/HITS/Katz/walks) run an exact numpy driver twin
        below this many edges (~48 B/edge as two int64 arrays + index
        maps); anchor 2M ≈ 100 MiB driver heap, far cheaper than N
        shuffle rounds. Above it: flat-cost distributed rounds.
    cc_driver_edges — union-find connected components collects edges
        at the same ~48 B/edge but holds the parent dict too; anchor
        500k ≈ 50 MiB.
    attach_broadcast_bytes — coarse_attach materializes a dimension
        side and ships it to every map task when its ESTIMATED size
        fits; anchor 32 MiB (pinned once per node in the object
        store). Scales with per-node object store, not driver heap.
    dq_small_domain_rows — dq checks switch between an exact driver
        domain fold and a distributed distinct; anchor 8M rows of
        mostly-int domain values (~24 B each ≈ 200 MiB).
    """

    verify_broadcast_rows: int
    canon_driver_rows: int
    graph_driver_edges: int
    cc_driver_edges: int
    attach_broadcast_bytes: int
    dq_small_domain_rows: int


_ANCHORS = {
    # name -> (anchor value on the 128-GiB box, scales with object store?)
    "verify_broadcast_rows": (1_000_000, False),
    "canon_driver_rows": (200_000, False),
    "graph_driver_edges": (2_000_000, False),
    "cc_driver_edges": (500_000, False),
    "attach_broadcast_bytes": (32 << 20, True),
    "dq_small_domain_rows": (8_000_000, False),
}

_scale_config: ScaleConfig | None = None
_derived_with_ray: bool = False


def _driver_mem_bytes() -> int:
    """Usable memory on THIS node (the driver's) — what the driver-twin
    and broadcast regimes actually consume. psutil ships with ray."""
    try:
        import psutil

        return int(psutil.virtual_memory().total)
    except Exception:
        return _ANCHOR_MEM_BYTES


def _object_store_bytes() -> int:
    """Per-node object store budget: Ray's own figure when a session is
    live (cluster total / node count), else the ~30% default heuristic."""
    try:
        import ray

        if ray.is_initialized():
            res = ray.cluster_resources()
            store = int(res.get("object_store_memory", 0))
            nodes = max(1, len([n for n in ray.nodes() if n.get("Alive")]))
            if store:
                return store // nodes
    except Exception:
        pass
    return int(_driver_mem_bytes() * 0.30)


def scale_config() -> ScaleConfig:
    """The cached, cluster-derived scale config. Derivation per knob:
    ``anchor × (measured_mem / anchor_mem)``, clamped to
    [anchor/8, anchor×8]; an ``SSR_<NAME>`` env var (integer) wins
    outright and is NOT clamped (the operator knows their cluster)."""
    global _scale_config, _derived_with_ray
    ray_live = _ray_initialized()
    if _scale_config is not None:
        # a config derived BEFORE ray.init used the 30%-heuristic store
        # figure; once a live session exists, re-derive so the
        # broadcast-bytes knob reflects the real per-node object store
        if _derived_with_ray or not ray_live:
            return _scale_config
    mem = _driver_mem_bytes()
    store = _object_store_bytes()
    values: dict[str, int] = {}
    for name, (anchor, uses_store) in _ANCHORS.items():
        env = os.environ.get(f"SSR_{name.upper()}")
        if env is not None:
            values[name] = int(env)
            continue
        basis, anchor_basis = (
            (store, _ANCHOR_STORE_BYTES) if uses_store
            else (mem, _ANCHOR_MEM_BYTES)
        )
        scaled = anchor * basis // anchor_basis
        values[name] = max(anchor // 8, min(anchor * 8, scaled))
    _scale_config = ScaleConfig(**values)
    _derived_with_ray = ray_live
    return _scale_config


def _ray_initialized() -> bool:
    try:
        import ray

        return bool(ray.is_initialized())
    except Exception:
        return False


def reset_scale_config() -> None:
    """Drop the cache (tests; or after env/cluster changes)."""
    global _scale_config, _derived_with_ray
    _scale_config = None
    _derived_with_ray = False
