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
