"""Small stage utilities: schema coercion and the coarse-partition
shuffle primitives (grouped apply, whole-partition apply, hash-join
attach, anti join) that replace Ray's per-key groupby / Dataset.join on
corpus-cardinality keys (measured ~25µs per GROUP in Ray's shuffle
groupby; join crashes on empty hash partitions in 2.49)."""

from __future__ import annotations

import zlib

import pyarrow as pa

import ray.data as rd


def ensure_schema(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Coerce every block to ``schema``.

    Ray's ``groupby().map_groups`` can emit zero-COLUMN empty blocks for
    shuffle partitions that received no groups; such blocks break schema
    resolution in downstream joins/unions ("No match ... for key field
    reference"). This pass rewrites empty blocks to a typed empty table and
    casts/reorders nonempty ones.
    """

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return schema.empty_table()
        if batch.schema == schema:
            return batch
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow")


# Target bytes per coarse partition: each partition is processed as ONE
# in-memory pandas frame by the per-partition fn, so P must grow with the
# DATA, not just the cluster (verdict r2: a CPU-derived P means partition
# size grows linearly with input). 128 MiB in-memory keeps frame + merge
# scratch well inside a worker heap.
TARGET_PARTITION_BYTES = 128 << 20


def _estimate_size_bytes(ds) -> int | None:
    """Cost-free size estimate: logical-plan metadata only (available for
    reads and materialized datasets), NEVER executes the plan — returns
    None when unknown (e.g. un-executed map outputs)."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def _default_partitions(
    *dss, target_partition_bytes: int | None = None
) -> int:
    """Coarse partition count: CPU floor (2× cluster CPUs keeps every
    core busy at small scale) raised by estimated input bytes / target
    partition bytes, so partition size stays bounded as data grows.
    Datasets whose size can't be known without execution contribute
    nothing (the known sides still raise P — a lower bound beats a
    constant). The floor is derived from live cluster resources, NOT
    ``DataContext.min_parallelism`` — that is a constant 200 default
    unrelated to cluster size, and at small data a 200-way sort shuffle
    is ~4× pure task overhead vs 2×CPUs (measured 2.6 s → 0.7 s per
    coarse call on 48k rows at 32 CPUs; see BASELINE.md)."""
    import math

    import ray
    from ray.data import DataContext

    if target_partition_bytes is None:
        target_partition_bytes = TARGET_PARTITION_BYTES  # late-bound: patchable
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        ncpu = 0
    if ncpu:
        base = max(16, 2 * ncpu)
    else:  # no live cluster info: fall back to Ray's read-parallelism floor
        base = max(16, DataContext.get_current().min_parallelism)
    known = [s for s in (_estimate_size_bytes(d) for d in dss) if s]
    if not known:
        return base
    return max(base, min(65536, math.ceil(sum(known) / target_partition_bytes)))


# Sentinel routing key for null key tuples: binary_join_element_wise emits
# null when ANY component is null, so nulls are hashed via this marker —
# all-null-key rows land in one partition (consistent routing; a real key
# colliding with the sentinel merely shares the partition, never the group).
_NULL_KEY = "\x00\x00__null__"


def _polars_routing() -> bool:
    """Decide the routing hash ONCE, on the DRIVER, at closure-creation
    time — the bool is captured by value into the route closure, so every
    worker uses the SAME hash. A per-process ImportError fallback would
    silently split a key across partitions on a heterogeneous cluster
    (some workers with polars, some without); with the captured flag, a
    worker missing polars fails LOUDLY instead."""
    import importlib.util

    return importlib.util.find_spec("polars") is not None


def _route_parts(
    t: pa.Table, keys: list[str], num_partitions: int, use_polars: bool
) -> pa.Array:
    """Hash of the stringified key tuple, mod P — the coarse routing key.

    Primary path (``use_polars``, decided once per job via
    ``_polars_routing``): polars ``Series.hash`` over the joined Arrow
    column — zero-copy in, vectorized (re-measured at the 2M-doc scaling
    volume: 0.05 s/M rows vs 1.2 s/M for the per-row crc loop, 23×; the
    round-1 \"vectorizing doesn't pay\" note was a small-batch artifact,
    see BASELINE.md). Routing needs only WITHIN-JOB consistency (same key
    → same partition in one run), which any fixed-seed hash provides; the
    true per-key grouping downstream uses the real columns, so hash choice
    never affects results. Fallback: the crc32 loop (battle-tested, no
    polars dependency). Never ``pd.util.hash_pandas_object`` (returns
    corrupt repeated hashes inside Ray workers on this stack).

    Null key components (binary_join_element_wise emits null if ANY
    component is null) route consistently — polars hashes null to a fixed
    value; the crc path uses ``_NULL_KEY``. Per-primitive null-key
    SEMANTICS are documented on each caller (groupby primitives keep null
    groups, joins drop null keys)."""
    import pyarrow.compute as pc

    joined = pc.binary_join_element_wise(
        *[pc.cast(t.column(k), pa.string()) for k in keys], "\x00"
    )
    if use_polars:
        import polars as pl

        h = pl.from_arrow(joined).hash(seed=0) % num_partitions
        out = h.cast(pl.Int32).to_arrow()
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
    crc = zlib.crc32
    return pa.array(
        [crc((s if s is not None else _NULL_KEY).encode()) % num_partitions
         for s in joined.to_pylist()],
        pa.int32(),
    )


def coarse_partition_apply(
    ds: rd.Dataset,
    keys: list[str],
    fn,
    out_schema: pa.Schema,
    *,
    num_partitions: int | None = None,
    fn_format: str = "pandas",
):
    """Route rows into P coarse partitions by key hash (all rows of a key
    land together) and run ``fn(partition) -> pa.Table`` once per
    PARTITION — ``fn`` does its own per-key work fully vectorized
    (pandas groupby/merge or Arrow kernels), so Ray's per-group overhead
    is paid P times total, not per key. Rows with null key components
    are routed (one sentinel partition) and handed to ``fn`` like any
    others — ``fn`` decides their semantics (use ``dropna=False`` in a
    pandas groupby to keep them as a group).

    ``fn_format``: "pandas" (default — ``fn`` takes a ``pd.DataFrame``)
    or "pyarrow" (``fn`` takes the partition's ``pa.Table`` ZERO-COPY —
    the group exchange itself is Arrow either way; only a pandas ``fn``
    pays the conversion, inside its own task)."""
    if num_partitions is None:
        num_partitions = _default_partitions(ds)

    use_polars = _polars_routing()  # driver-decided, captured by value

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", _route_parts(t, keys, num_partitions, use_polars)
        )

    arrow_fn = fn_format == "pyarrow"

    def per_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        return fn(t) if arrow_fn else fn(t.to_pandas())

    return ensure_schema(
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow"),
        out_schema,
    )


# Right sides under this estimated size never shuffle. None defers to
# context.ScaleConfig.attach_broadcast_bytes (anchor 32 MiB, scaled to
# the per-node object store, SSR_ATTACH_BROADCAST_BYTES override);
# setting the attribute pins it for the process (tests).
ATTACH_BROADCAST_BYTES: int | None = None


def _attach_broadcast(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    attach_cols: list[str],
    attach_as: list[str],
    out_schema: pa.Schema,
    how: str,
    fill: dict | None,
    left_cols: list[str],
) -> rd.Dataset:
    """Broadcast plan for ``coarse_attach``: deduped lookup built once on
    the driver (bounded by the caller's byte threshold), shipped once via
    ``ray.put``, Arrow-hash-joined against every left block locally — the
    left side never shuffles. Must mirror the shuffle plan's semantics
    exactly; see the ``coarse_attach`` docstring."""
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    def right_project(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column(right_key), pa.string())
        t = t.filter(pc.is_valid(key))
        key = pc.cast(t.column(right_key), pa.string())
        return pa.Table.from_arrays(
            [key] + [t.column(c) for c in attach_cols],
            names=["__key"] + list(attach_as),
        )

    rdf = right.map_batches(right_project, batch_format="pyarrow").to_pandas()
    cols = ["__key"] + list(attach_as)
    if rdf.empty:
        # a zero-block dataset's to_pandas() has no columns at all
        lookup_df = pd.DataFrame({c: [] for c in cols})
    else:
        # same deterministic dup pick as the shuffle plan: min (key, attach)
        lookup_df = rdf.sort_values(cols, kind="mergesort").drop_duplicates(
            subset="__key"
        )
    lookup = pa.Table.from_arrays(
        [pa.array(lookup_df["__key"], pa.string())]
        + [pa.array(lookup_df[a], type=out_schema.field(a).type,
                    from_pandas=True)
           for a in attach_as],
        names=["__key"] + list(attach_as),
    )
    lookup_ref = ray.put(lookup)
    join_type = "inner" if how == "inner" else "left outer"

    def attach_batch(t: pa.Table) -> pa.Table:
        key = pc.cast(t.column(left_key), pa.string())
        t = t.filter(pc.is_valid(key))  # null keys never match: drop early
        if t.num_rows == 0:
            return out_schema.empty_table()
        key = pc.cast(t.column(left_key), pa.string())
        lhs = pa.Table.from_arrays(
            [key] + [t.column(c) for c in left_cols],
            names=["__key"] + list(left_cols),
        )
        lk = ray.get(lookup_ref)  # local object store, zero-copy Arrow
        joined = lhs.join(lk, keys="__key", join_type=join_type)
        if how == "left" and fill:
            for col, v in fill.items():
                joined = joined.set_column(
                    joined.schema.get_field_index(col), col,
                    pc.fill_null(joined.column(col),
                                 pa.scalar(v, out_schema.field(col).type)),
                )
        return pa.Table.from_arrays(
            [pc.cast(joined.column(f.name), f.type) for f in out_schema],
            schema=out_schema,
        )

    return left.map_batches(attach_batch, batch_format="pyarrow")


def coarse_attach(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    attach_cols: list[str],
    attach_as: list[str] | None = None,
    out_schema: pa.Schema,
    num_partitions: int | None = None,
    how: str = "inner",
    fill: dict | None = None,
    broadcast_bytes: int | None = None,
):
    """Distributed hash join that ATTACHES ``attach_cols`` from ``right``
    onto ``left`` rows by key equality. ``how="inner"`` (default): left
    rows with no match are dropped, mirroring the broadcast-lookup 'skip
    missing' semantics. ``how="left"``: unmatched left rows are KEPT and
    their attach columns take ``fill[col]`` (required for non-nullable
    integer outputs — a NaN can't ride an int64 column) or null — the
    SQL ``LEFT JOIN … COALESCE`` shape.

    Both sides are routed into the same coarse partitions by key hash and
    merged per-partition with pandas' C-level merge — no driver
    materialization of either side, and none of Ray ``Dataset.join``'s
    empty-hash-partition failures. ``out_schema`` = left payload columns
    (minus nothing — list exactly what you want carried) + ``attach_as``.
    Attach columns must be primitive (string/binary/number): serialize
    lists to bytes before attaching (cheap, and it keeps nulls trivial
    through the union).

    Null join keys on either side are DROPPED (SQL inner-join semantics:
    null never equals null — pandas merge would wrongly match NaN keys).

    Duplicate right-side keys: the attach picks ONE right row per key,
    chosen DETERMINISTICALLY as the minimum over (key, *attach columns) —
    block arrival order never decides. Callers with a unique-right-key
    contract (all current ones) are unaffected; callers that can see
    duplicate keys with differing payloads get a stable, documented pick
    rather than a silent arbitrary one.

    Caveat: int64 payload columns ride the null-bearing union as pandas
    float64 inside the partition merge — integer exactness ends at 2^53,
    so pass ids that can exceed it as STRINGS (the dedup pipelines already
    do).

    Join planning: when the right side's ESTIMATED size (metadata-only,
    never executes the plan) fits ``broadcast_bytes`` (default
    ``ATTACH_BROADCAST_BYTES``), the attach switches to a zero-shuffle
    broadcast plan — the deduped lookup is built once on the driver,
    ``ray.put`` once, and every left block Arrow-joins against it locally;
    the fact side never moves. Unknown-size right inputs take the shuffle
    plan (safe). Semantics are identical in both regimes (string-cast
    keys, null-key drops, deterministic min-(key, attach) dup pick, left
    fills) — parity is pinned by ``tests/test_util_primitives.py``.
    Pass ``broadcast_bytes=0`` to force the shuffle plan."""
    if attach_as is None:
        attach_as = attach_cols
    left_cols = [n for n in out_schema.names if n not in attach_as]

    if broadcast_bytes is None:
        broadcast_bytes = ATTACH_BROADCAST_BYTES
    if broadcast_bytes is None:
        from semantic_search_system_ray.context import scale_config

        broadcast_bytes = scale_config().attach_broadcast_bytes
    est = _estimate_size_bytes(right)
    if est is not None and est <= broadcast_bytes:
        return _attach_broadcast(
            left, right, left_key=left_key, right_key=right_key,
            attach_cols=attach_cols, attach_as=attach_as,
            out_schema=out_schema, how=how, fill=fill, left_cols=left_cols,
        )

    if num_partitions is None:
        num_partitions = _default_partitions(left, right)

    union_schema = pa.schema(
        [("__key", pa.string())]
        + [(n, out_schema.field(n).type) for n in left_cols]
        + [(n, out_schema.field(n).type) for n in attach_as]
        + [("__rhs", pa.bool_())]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.cast(t.column(left_key), pa.string())
        t = t.filter(pc.is_valid(key))  # null keys never match: drop early
        key = pc.cast(t.column(left_key), pa.string())
        n = t.num_rows
        arrays = [key]
        arrays += [t.column(c) for c in left_cols]
        arrays += [pa.nulls(n, out_schema.field(a).type) for a in attach_as]
        arrays += [pa.array([False] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.cast(t.column(right_key), pa.string())
        t = t.filter(pc.is_valid(key))
        key = pc.cast(t.column(right_key), pa.string())
        n = t.num_rows
        arrays = [key]
        arrays += [pa.nulls(n, out_schema.field(c).type) for c in left_cols]
        arrays += [t.column(c) for c in attach_cols]
        arrays += [pa.array([True] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge_part(df) -> pa.Table:
        rhs = df[df["__rhs"]]
        lhs = df[~df["__rhs"]]
        if lhs.empty or (rhs.empty and how == "inner"):
            return out_schema.empty_table()
        # deterministic pick among duplicate right keys: min over
        # (key, *attach cols) — never block arrival order
        lookup = (
            rhs.sort_values(["__key"] + list(attach_as), kind="mergesort")
            .drop_duplicates(subset="__key")[["__key"] + list(attach_as)]
        )
        merged = lhs[["__key"] + left_cols].merge(lookup, on="__key", how=how)
        if how == "left" and fill:
            for col, v in fill.items():
                merged[col] = merged[col].fillna(v)
        arrays = []
        for f in out_schema:
            s = merged[f.name]
            if (pa.types.is_integer(f.type) and s.dtype.kind == "f"
                    and not s.isna().any()):
                # int payloads ride the null-bearing union / left merge as
                # float64 — exact < 2^53; restore the declared type
                s = s.astype("int64")
            # from_pandas: any remaining NaN (unfilled left-join miss on an
            # int column) becomes null rather than a conversion crash
            arrays.append(pa.array(s, type=f.type, from_pandas=True))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return coarse_partition_apply(
        combined, ["__key"], merge_part, out_schema, num_partitions=num_partitions
    )


def coarse_map_column(
    ds: rd.Dataset,
    mapping: rd.Dataset,
    *,
    col: str,
    key_col: str,
    value_col: str,
    out_schema: pa.Schema,
    num_partitions: int | None = None,
):
    """Replace ``ds[col]`` with ``mapping[value_col]`` where ``ds[col] ==
    mapping[key_col]``, IDENTITY where no mapping row exists — the
    distributed left-join-with-fallback used to apply a canonical map too
    large to broadcast as a dict (stages/canon). Both sides ride one
    coarse cogroup keyed on the mapped value; pandas C-level merge per
    partition. ``col`` must be a STRING column (the identity fallback
    reuses the stringified key). Null semantics: a null ``ds[col]`` value
    stays null (identity — null never equals a mapping key), and null
    ``mapping[key_col]`` rows are dropped (pandas merge would otherwise
    wrongly match None keys to None). NOTE: the cogroup re-routes rows by
    ``col`` hash, so any
    upstream block-contiguity invariant (e.g. doc-contiguous rows) does
    NOT survive this operator — callers in that regime must follow with a
    shuffle-based distinct, not a block-local one."""
    if num_partitions is None:
        num_partitions = _default_partitions(ds, mapping)
    other_cols = [n for n in out_schema.names if n != col]

    union_schema = pa.schema(
        [("__key", pa.string())]
        + [(n, out_schema.field(n).type) for n in other_cols]
        + [("__mapped", pa.string()), ("__rhs", pa.bool_())]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        arrays = [pc.cast(t.column(col), pa.string())]
        arrays += [t.column(c) for c in other_cols]
        arrays += [pa.nulls(n, pa.string()), pa.array([False] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.cast(t.column(key_col), pa.string())
        t = t.filter(pc.is_valid(key))  # null mapping keys match nothing
        n = t.num_rows
        arrays = [pc.cast(t.column(key_col), pa.string())]
        arrays += [pa.nulls(n, out_schema.field(c).type) for c in other_cols]
        arrays += [pc.cast(t.column(value_col), pa.string()),
                   pa.array([True] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    combined = ds.map_batches(tag_left, batch_format="pyarrow").union(
        mapping.map_batches(tag_right, batch_format="pyarrow")
    )

    def map_part(df) -> pa.Table:
        rhs = df[df["__rhs"]]
        lhs = df[~df["__rhs"]]
        if lhs.empty:
            return out_schema.empty_table()
        lookup = (
            rhs.sort_values(["__key", "__mapped"], kind="mergesort")
            .drop_duplicates(subset="__key")[["__key", "__mapped"]]
        )
        merged = lhs[["__key"] + other_cols].merge(lookup, on="__key", how="left")
        merged[col] = merged["__mapped"].where(
            merged["__mapped"].notna(), merged["__key"]
        )
        return pa.Table.from_arrays(
            [pa.array(merged[f.name].tolist(), f.type) for f in out_schema],
            schema=out_schema,
        )

    return coarse_partition_apply(
        combined, ["__key"], map_part, out_schema, num_partitions=num_partitions
    )


def coarse_anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    out_schema: pa.Schema,
    num_partitions: int | None = None,
):
    """Distributed anti join: left rows whose key has NO match in right.
    Same coarse-partition cogroup as ``coarse_attach`` — the probe-side key
    set only ever exists per-partition (bounded), never on the driver.
    Null keys follow SQL ``NOT EXISTS`` semantics: a null left key never
    matches anything (row KEPT); null right keys are dropped from the
    probe set."""
    if num_partitions is None:
        num_partitions = _default_partitions(left, right)

    union_schema = pa.schema(
        [("__key", pa.string())]
        + [(f.name, f.type) for f in out_schema]
        + [("__rhs", pa.bool_())]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        arrays = [pc.cast(t.column(left_key), pa.string())]
        arrays += [t.column(f.name) for f in out_schema]
        arrays += [pa.array([False] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # per-block distinct combiner: only unique keys ride the shuffle
        keys = pc.cast(t.column(right_key), pa.string()).combine_chunks()
        keys = keys.filter(pc.is_valid(keys))  # null probe keys match nothing
        keys = pa.Table.from_arrays([keys], names=["k"]).group_by(["k"]).aggregate([])
        n = keys.num_rows
        arrays = [keys.column("k")]
        arrays += [pa.nulls(n, f.type) for f in out_schema]
        arrays += [pa.array([True] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def anti_part(df) -> pa.Table:
        probe = set(df.loc[df["__rhs"], "__key"])
        lhs = df[~df["__rhs"]]
        keep = lhs[~lhs["__key"].isin(probe)]
        # from_pandas: NaN→null, so a KEPT null-key row can ride an int64
        # output column as null instead of crashing the conversion
        return pa.Table.from_arrays(
            [pa.array(keep[f.name], type=f.type, from_pandas=True)
             for f in out_schema],
            schema=out_schema,
        )

    return coarse_partition_apply(
        combined, ["__key"], anti_part, out_schema, num_partitions=num_partitions
    )


def coarse_asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_on: str,
    right_on: str,
    out_schema: pa.Schema,
    right_cols: list[str],
    num_partitions: int | None = None,
):
    """Distributed backward AS-OF join — an operator Ray Data lacks
    (SURVEY §2.4 notes the reference has none either; this is part of the
    beyond-reference training-data toolkit). For every left row, attach
    the right row of the same key with the greatest ``right_on`` ≤
    ``left_on`` (inner: left rows with no earlier right row drop, matching
    DuckDB ``ASOF JOIN`` semantics, which is the paired oracle).

    Partitioning assumption: all rows of one KEY fit one coarse partition
    (same contract as every coarse_* primitive). Inside a partition the
    match runs via ``pandas.merge_asof`` (C-level, sorted-merge). If the
    right side can hold duplicate (key, on) rows with DIFFERING payloads,
    dedupe it first — both this and DuckDB pick an arbitrary row among
    exact ties.

    ``out_schema`` = left payload columns (minus the key/on if not listed)
    + ``right_cols``; the ``left_on`` column may be included in the output
    by listing it in ``out_schema``. Same int64-beyond-2^53 caveat as
    ``coarse_attach`` (null-bearing union → pandas float64): use string
    ids at extreme scale."""
    if num_partitions is None:
        num_partitions = _default_partitions(left, right)
    left_cols = [n for n in out_schema.names if n not in right_cols]

    union_schema = pa.schema(
        [("__key", pa.string()), ("__on", pa.timestamp("us"))]
        + [(n, out_schema.field(n).type) for n in left_cols]
        + [(n, out_schema.field(n).type) for n in right_cols]
        + [("__rhs", pa.bool_())]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.cast(t.column(left_key), pa.string())
        on = pc.cast(t.column(left_on), pa.timestamp("us"))
        # null key or null timestamp can never match (inner semantics)
        t = t.filter(pc.and_(pc.is_valid(key), pc.is_valid(on)))
        n = t.num_rows
        arrays = [pc.cast(t.column(left_key), pa.string()),
                  pc.cast(t.column(left_on), pa.timestamp("us"))]
        arrays += [t.column(c) for c in left_cols]
        arrays += [pa.nulls(n, out_schema.field(c).type) for c in right_cols]
        arrays += [pa.array([False] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.cast(t.column(right_key), pa.string())
        on = pc.cast(t.column(right_on), pa.timestamp("us"))
        t = t.filter(pc.and_(pc.is_valid(key), pc.is_valid(on)))
        n = t.num_rows
        arrays = [pc.cast(t.column(right_key), pa.string()),
                  pc.cast(t.column(right_on), pa.timestamp("us"))]
        arrays += [pa.nulls(n, out_schema.field(c).type) for c in left_cols]
        arrays += [t.column(c) for c in right_cols]
        arrays += [pa.array([True] * n)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    combined = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def asof_part(df) -> pa.Table:
        import pandas as pd

        rhs = df[df["__rhs"]]
        lhs = df[~df["__rhs"]]
        if lhs.empty or rhs.empty:
            return out_schema.empty_table()
        lhs = lhs.sort_values("__on", kind="mergesort")
        rhs = rhs.sort_values("__on", kind="mergesort")
        merged = pd.merge_asof(
            lhs[["__key", "__on"] + left_cols],
            rhs[["__key", "__on"] + right_cols],
            on="__on", by="__key", direction="backward",
        )
        merged = merged.dropna(subset=right_cols)  # inner semantics
        return pa.Table.from_arrays(
            [pa.array(merged[f.name].tolist(), f.type) for f in out_schema],
            schema=out_schema,
        )

    return coarse_partition_apply(
        combined, ["__key"], asof_part, out_schema, num_partitions=num_partitions
    )


def key_group_slices(t: pa.Table, keys: list[str]):
    """Yield the per-key groups of ``t`` as ZERO-COPY slices (one gather
    to cluster the rows, then contiguous slices). Group identity comes
    from dictionary CODES per key column (null code -1) combined with
    ``np.unique(axis=0)`` — no stringified composite key, so values
    containing separator bytes and multi-key nulls can never merge two
    distinct groups (pandas ``dropna=False`` semantics: null == null,
    distinct from every value). Group order follows the clustered sort,
    which no caller may rely on (same contract as a hash groupby)."""
    import numpy as np
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return
    cols = []
    for k in keys:
        d = pc.dictionary_encode(t.column(k).combine_chunks())
        idx = d.indices.to_numpy(zero_copy_only=False)
        if idx.dtype.kind == "f":  # nulls decode as NaN
            idx = np.where(np.isnan(idx), -1.0, idx)
        cols.append(idx.astype(np.int64))
    mat = np.stack(cols, axis=1)
    _, ids = np.unique(mat, axis=0, return_inverse=True)
    ids = ids.reshape(-1)
    order = np.argsort(ids, kind="stable")
    sid = ids[order]
    clustered = t.take(pa.array(order, pa.int64()))
    bounds = np.flatnonzero(np.diff(sid)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sid)]))
    for s, e in zip(starts, ends):
        yield clustered.slice(int(s), int(e - s))


def coarse_grouped_apply(
    ds: rd.Dataset,
    keys: list[str],
    fn,
    out_schema: pa.Schema,
    *,
    num_partitions: int | None = None,
    min_group_size: int = 1,
    fn_format: str = "pandas",
):
    """``groupby(keys).map_groups(fn)`` with Ray's per-group overhead
    removed: rows are routed by ``crc32(keys) % P`` (P coarse partitions —
    the ONLY groupby Ray sees), and the true per-key grouping runs inside
    each partition with pandas' C-level groupby (``fn_format="pandas"``,
    default) or Arrow dictionary-code clustering + zero-copy slices
    (``fn_format="pyarrow"`` — no pandas conversion anywhere in the
    path). Measured: Ray's shuffle groupby costs ~25µs per group,
    ruinous for high-cardinality keys (e.g. LSH band buckets, mostly
    singletons); this pays it P times.

    ``fn(group) -> pa.Table`` (group is a ``pd.DataFrame`` or a
    ``pa.Table`` slice per ``fn_format``) must return ``out_schema``
    rows; groups smaller than ``min_group_size`` are skipped (useful for
    candidate-pair generation where singleton buckets are noise). A null
    key is a GROUP (pandas ``dropna=False``), matching Ray's native
    groupby semantics on BOTH formats."""
    if num_partitions is None:
        num_partitions = _default_partitions(ds)

    use_polars = _polars_routing()  # driver-decided, captured by value

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", _route_parts(t, keys, num_partitions, use_polars)
        )

    arrow_fn = fn_format == "pyarrow"

    def per_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        outs = []
        if arrow_fn:
            for g in key_group_slices(t, keys):
                if g.num_rows >= min_group_size:
                    outs.append(fn(g))
        else:
            for _k, g in t.to_pandas().groupby(keys, sort=False, dropna=False):
                if len(g) >= min_group_size:
                    outs.append(fn(g))
        outs = [o for o in outs if o is not None and o.num_rows > 0]
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs).cast(out_schema)

    return ensure_schema(
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow"),
        out_schema,
    )


def grouped_topk(
    ds: rd.Dataset,
    group_cols: list[str],
    sort_cols: list[str],
    *,
    descending: list[bool],
    k: int,
):
    """Per-GROUP top-k (windowed rank) with a COMBINER: every block keeps
    only its local per-group top-k (pandas C-level sort + groupby.head),
    so at most |groups|·k rows per block ride the final single-task
    combine — never the full table. Right for low-cardinality groups
    (priorities, languages, status codes); corpus-cardinality groups
    should use ``coarse_grouped_apply`` instead. Ties beyond the sort
    columns must be broken BY the sort columns (pass a unique last sort
    key) for deterministic output."""

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            sort_cols, ascending=[not d for d in descending], kind="mergesort"
        )
        return pa.Table.from_pandas(
            df.groupby(group_cols, sort=False, dropna=False).head(k),
            schema=t.schema, preserve_index=False,
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topk, batch_format="pyarrow", batch_size=None)
    )


def salted_group_sum(
    ds: rd.Dataset,
    keys: list[str],
    value_col: str,
    *,
    n_salts: int = 16,
    alias: str | None = None,
) -> rd.Dataset:
    """EXPLICIT salted two-phase aggregation — the north rule's
    hot-key treatment spelled out as its own primitive: phase 1 groups
    by (keys…, salt) so a head key's rows split across ``n_salts``
    reducers instead of melting one; phase 2 re-groups the ≤
    |keys|·n_salts partial rows by the true keys. The salt is a
    per-batch row counter modulo S — distribution is all that matters,
    no determinism needed (sums are commutative).

    Most of this repo reaches the same effect more cheaply with
    per-BLOCK combiners (the hot key collapses to one row per block
    before any shuffle); this primitive exists for aggregations whose
    per-block state would be too large to pre-combine (huge value
    payloads per key), and as the explicit, parity-tested form of the
    pattern. Results are identical to a direct groupby — pinned by
    tests/test_util_primitives.py."""
    import numpy as np

    from ray.data.aggregate import Sum

    def add_salt(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__salt",
            pa.array(np.arange(t.num_rows, dtype=np.int64) % n_salts),
        )

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(keys + ["__salt"])
        .aggregate(Sum(value_col, alias_name="__part_sum"))
    )
    out_name = alias or f"sum({value_col})"
    return (
        phase1.groupby(keys)
        .aggregate(Sum("__part_sum", alias_name=out_name))
    )
