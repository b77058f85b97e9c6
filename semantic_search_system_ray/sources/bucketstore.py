"""Hash-BUCKETED table storage — co-location as a LAYOUT property.

The coarse primitives (stages/util) hash-route rows per QUERY; a bucketed
store pays that routing shuffle ONCE at write time and every subsequent
join / grouped op on the bucket key runs with NO cross-bucket data
movement ("pick ONE partitioning key and reuse it across stages").
Bucket assignment uses the SAME `_route_parts` hash as the coarse
primitives, so a bucketed table is join-compatible with coarse-routed
intermediates.

Layout: ``path/__bucket=<i>/*.parquet`` (hive-partitioned; Ray's
read_parquet restores ``__bucket`` as a column). A ``_BUCKETS`` marker
records the bucket count for validation at read time.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.stages.util import _polars_routing, _route_parts


def write_bucketed(
    ds: rd.Dataset, key_cols: list[str], n_buckets: int, path: str
) -> str:
    """Route rows into ``n_buckets`` by key hash and write one hive
    partition per bucket. Returns ``path``. The one-time all-to-all this
    performs is the amortized cost every later bucket-aligned operation
    skips."""
    use_polars = _polars_routing()

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", _route_parts(t, key_cols, n_buckets, use_polars)
        )

    ds.map_batches(route, batch_format="pyarrow").write_parquet(
        path, partition_cols=["__bucket"]
    )
    with open(os.path.join(path, "_BUCKETS"), "w") as f:
        f.write(str(n_buckets))
    return path


def read_bucket(path: str, i: int, *, columns: list[str] | None = None):
    """One bucket as a Dataset — key-complete by construction: every row
    of any bucketed table whose key hashes to ``i`` is in this directory
    and nowhere else."""
    return rd.read_parquet(f"{path}/__bucket={i}", columns=columns)


def n_buckets_of(path: str) -> int:
    with open(os.path.join(path, "_BUCKETS")) as f:
        return int(f.read().strip())


def bucketed_attach(
    left_path: str,
    right_path: str,
    *,
    left_key: str,
    right_key: str,
    attach_cols: list[str],
    out_schema: pa.Schema,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
) -> rd.Dataset:
    """Join two SAME-KEY-bucketed tables with NO shuffle AT ALL: bucket
    i of the left can only match bucket i of the right (identical
    routing hash), so a tiny bucket-INDEX Dataset drives one task per
    bucket — each task reads its two co-located bucket directories
    straight from storage (task-local pyarrow read; nothing crosses the
    object store) and merges them with Arrow's native hash join
    (``pyarrow.Table.join`` — no pandas round-trip copy; the task's
    working set stays the two mapped bucket files). This is the
    amortized payoff of the one-time layout write: the join that
    coarse_attach runs as route+sort+cogroup becomes a pure map.

    Inner-join semantics; null keys drop (SQL); the right side is
    expected key-unique per the attach contract (duplicates would
    multiply rows like SQL would — callers wanting the deterministic
    min-pick should pre-dedup at write time)."""
    nl, nr = n_buckets_of(left_path), n_buckets_of(right_path)
    if nl != nr:
        raise ValueError(
            f"bucket counts differ ({nl} vs {nr}): tables are not "
            "join-compatible — rewrite one side"
        )
    out_cols = [f.name for f in out_schema]

    def join(batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        outs = []
        for i in batch.column("item").to_pylist():
            # a bucket with no rows on a side has NO directory
            # (hive-partitioned writes create only non-empty buckets);
            # inner-join semantics make either-side-empty → no output
            ldir = f"{left_path}/__bucket={i}"
            rdir = f"{right_path}/__bucket={i}"
            if not (os.path.isdir(ldir) and os.path.isdir(rdir)):
                continue
            lt = pq.read_table(ldir, columns=left_columns)
            rt = pq.read_table(rdir, columns=right_columns)
            lt = lt.filter(pc.is_valid(lt.column(left_key)))
            rt = rt.filter(pc.is_valid(rt.column(right_key)))
            if right_key != left_key:
                rt = rt.rename_columns(
                    [left_key if c == right_key else c for c in rt.column_names]
                )
            merged = lt.join(rt, keys=left_key, join_type="inner")
            outs.append(merged.select(out_cols).cast(out_schema))
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    idx = rd.from_items(list(range(nl))).repartition(nl)
    return idx.map_batches(join, batch_format="pyarrow", batch_size=1)
