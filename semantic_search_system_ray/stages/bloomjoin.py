"""Broadcast Bloom-filter join pruning — the pre-shuffle volume reducer
a 100 TB semi/inner join needs when the probe side is huge but the build
side's KEY SET fits a compact bitmap even though its rows do not.

Classic 'bloom join' sideways information passing (Bloom 1970;
Kirsch–Mitzenmacher double hashing — public knowledge, the same trick
every warehouse engine uses to prune a fact-table scan against a
filtered dimension):

1. build side → per-block PARTIAL bitmaps (a ``map_batches`` combiner;
   each block contributes one fixed ``2^log2_bits / 8``-byte row), then
   OR-merged on the driver — the reduction moves #blocks × m/8 bytes,
   bounded by block count, never by row count;
2. the merged bitmap ships ONCE via ``ray.put``; every probe task reads
   it zero-copy from the local object store (never re-shipped per batch);
3. probe blocks drop non-member keys BEFORE any shuffle. False positives
   (rate ≈ (1 - e^{-kn/m})^k) survive the prefilter, so the bloom pass
   is ALWAYS followed by the exact distributed join — which now only
   shuffles the pruned volume. Correctness never depends on the bitmap;
   only shuffle bytes do.

Integer keys only: membership hashing is two vectorized numpy
splitmix64-style mixes over the int64 key column — no per-row Python.

Reference parity note: the reference has no joins at this scale (its
taxonomy join is a broadcast dict, SURVEY §2.4 J1); this stage is part
of the beyond-reference scale suite (SURVEY §2.11).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

logger = logging.getLogger(__name__)

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix2x(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key (vectorized splitmix64-style
    finalizer); h2 forced odd so the double-hash probe sequence
    h1 + i·h2 (mod m) cycles through distinct slots for power-of-two m."""
    with np.errstate(over="ignore"):
        x = keys.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= _MIX1
        x ^= x >> np.uint64(33)
        h1 = x * _MIX2
        h2 = ((x ^ (x >> np.uint64(29))) * _MIX1) | np.uint64(1)
    return h1, h2


def _int_keys(col: pa.ChunkedArray) -> np.ndarray:
    """Non-null key column → uint64 numpy view (null keys never reach the
    bitmap nor the probe mask — SQL join semantics drop them anyway)."""
    arr = col.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    return arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)


def bloom_partial_batch(
    t: pa.Table, key: str, log2_bits: int, nhash: int
) -> pa.Table:
    """One build block → one binary row holding its partial bitmap."""
    m = np.uint64(1 << log2_bits)
    bits = np.zeros((1 << log2_bits) >> 3, dtype=np.uint8)
    keys = _int_keys(t.column(key))
    if len(keys):
        h1, h2 = _mix2x(keys)
        for i in range(nhash):
            with np.errstate(over="ignore"):
                idx = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(
                bits, (idx >> np.uint64(3)).astype(np.int64),
                (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8),
            )
    return pa.Table.from_pydict({"bm": pa.array([bits.tobytes()], pa.binary())})


def _or_batch(t: pa.Table) -> pa.Table:
    """OR a batch of partial bitmaps into one row (the tree-combine
    step)."""
    rows = t.column("bm").to_pylist()
    out = np.frombuffer(rows[0], dtype=np.uint8).copy()
    for b in rows[1:]:
        out |= np.frombuffer(b, dtype=np.uint8)
    return pa.Table.from_pydict({"bm": pa.array([out.tobytes()], pa.binary())})


_OR_FAN_IN = 64


def build_bloom(
    build: rd.Dataset, key: str, *, log2_bits: int = 23, nhash: int = 4
) -> "ray.ObjectRef":
    """Build-side key bitmap → one ``ray.put`` ObjectRef (broadcast once,
    read zero-copy in every probe task).

    The partial bitmaps (one m/8-byte row per build block) are OR-merged
    by a DISTRIBUTED fan-in-64 tree — at web scale the build side has
    ~10^5-10^6 blocks, and a flat take_all would move #blocks × m/8
    bytes (hundreds of GB at m=2^23) to the driver; the tree moves
    ≤ 1/64 of that per level and the driver only ever sees ≤ 64 rows."""
    # materialize() pins each level so count() doesn't re-run the whole
    # build-side scan once per fan-in level plus the final take_all
    # (ADVICE r3 — same fix as heavy_hitters).
    parts = build.map_batches(
        bloom_partial_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(key=key, log2_bits=log2_bits, nhash=nhash),
    ).materialize()
    n = parts.count()
    while n > _OR_FAN_IN:
        parts = (
            parts.repartition(max(1, (n + _OR_FAN_IN - 1) // _OR_FAN_IN))
            .map_batches(_or_batch, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        n = parts.count()
    rows = parts.take_all()
    if not rows:
        return ray.put(np.zeros((1 << log2_bits) >> 3, dtype=np.uint8))
    out = np.frombuffer(rows[0]["bm"], dtype=np.uint8).copy()
    for r in rows[1:]:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return ray.put(out)


def bloom_prefilter(
    probe: rd.Dataset,
    key: str,
    bloom_ref: "ray.ObjectRef",
    *,
    log2_bits: int = 23,
    nhash: int = 4,
) -> rd.Dataset:
    """Drop probe rows whose key is definitely absent from the bitmap.
    Null keys are dropped (they cannot match any equality join)."""
    m = np.uint64(1 << log2_bits)

    def prefilter(t: pa.Table) -> pa.Table:
        col = t.column(key)
        if col.null_count:
            t = t.filter(col.is_valid())
            col = t.column(key)
        if t.num_rows == 0:
            return t
        bits = ray.get(bloom_ref)  # local object store, zero-copy
        keys = _int_keys(col)
        h1, h2 = _mix2x(keys)
        mask = np.ones(len(keys), dtype=bool)
        for i in range(nhash):
            with np.errstate(over="ignore"):
                idx = (h1 + np.uint64(i) * h2) % m
            byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
            mask &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 != 0
        return t.filter(pa.array(mask))

    return probe.map_batches(prefilter, batch_format="pyarrow")


def bloom_semi_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    *,
    probe_key: str,
    build_key: str,
    log2_bits: int = 23,
    nhash: int = 4,
) -> rd.Dataset:
    """EXACT distributed semi join (EXISTS) with bloom pruning ahead of
    the shuffle: bitmap prefilter (step that saves the bytes) → per-block
    distinct-key combiner on the build side → one coarse cogroup
    (``coarse_attach`` inner — the false-positive remover). Output = the
    probe rows with ≥1 build match, probe columns only.

    Size ``log2_bits`` from the expected build-side key cardinality n:
    FP ≈ (1 - e^{-kn/m})^k; the 2^23 default (1 MiB) holds ~1M keys
    under 3% FP at k=4."""
    from semantic_search_system_ray.stages.util import coarse_attach

    ref = build_bloom(build, build_key, log2_bits=log2_bits, nhash=nhash)
    pruned = bloom_prefilter(
        probe, probe_key, ref, log2_bits=log2_bits, nhash=nhash
    )

    def distinct_keys(t: pa.Table) -> pa.Table:
        u = t.column(build_key).unique()
        if u.null_count:
            u = u.drop_null()
        return pa.Table.from_pydict(
            {build_key: u, "__hit": pa.array([1] * len(u), pa.int64())}
        )

    keys = build.map_batches(distinct_keys, batch_format="pyarrow")
    probe_schema = probe.schema().base_schema
    out_schema = pa.schema(
        list(probe_schema) + [pa.field("__hit", pa.int64())]
    )
    joined = coarse_attach(
        pruned, keys, left_key=probe_key, right_key=build_key,
        attach_cols=["__hit"], out_schema=out_schema, how="inner",
    )
    return joined.select_columns([f.name for f in probe_schema])
