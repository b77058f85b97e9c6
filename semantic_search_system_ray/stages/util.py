"""Small stage utilities."""

from __future__ import annotations

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


def coarse_grouped_apply(
    ds: rd.Dataset,
    keys: list[str],
    fn,
    out_schema: pa.Schema,
    *,
    num_partitions: int | None = None,
    min_group_size: int = 1,
):
    """``groupby(keys).map_groups(fn)`` with Ray's per-group overhead
    removed: rows are routed by ``crc32(keys) % P`` (P coarse partitions —
    the ONLY groupby Ray sees), and the true per-key grouping runs inside
    each partition with pandas' C-level groupby. Measured: Ray's shuffle
    groupby costs ~25µs per group, ruinous for high-cardinality keys
    (e.g. LSH band buckets, mostly singletons); this pays it P times.

    ``fn(group: pd.DataFrame) -> pa.Table`` must return ``out_schema``
    rows; groups smaller than ``min_group_size`` are skipped (useful for
    candidate-pair generation where singleton buckets are noise)."""
    import zlib

    import pandas as pd
    import pyarrow.compute as pc
    from ray.data import DataContext

    if num_partitions is None:
        num_partitions = max(16, DataContext.get_current().min_parallelism)
    crc = zlib.crc32

    def route(t: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            *[pc.cast(t.column(k), pa.string()) for k in keys], "\x00"
        )
        parts = [crc(s.encode()) % num_partitions for s in joined.to_pylist()]
        return t.append_column("__part", pa.array(parts, pa.int32()))

    def per_part(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["__part"])
        outs = []
        for _k, g in df.groupby(keys, sort=False):
            if len(g) >= min_group_size:
                outs.append(fn(g))
        outs = [o for o in outs if o is not None and o.num_rows > 0]
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs).cast(out_schema)

    return ensure_schema(
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("__part")
        .map_groups(per_part, batch_format="pandas"),
        out_schema,
    )
