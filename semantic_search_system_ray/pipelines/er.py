"""Entity resolution end-to-end — blocking → pairwise verify →
clustering → golden record. The classic record-consolidation pipeline
(Fellegi–Sunter-style ER reduced to its deterministic core), composed
entirely from stages this engine already trusts:

1. **blocking + verification**: ``stages/dedup.edit_distance_pairs`` —
   SymSpell symmetric-delete blocking (lossless for lev ≤ k) + banded-DP
   verification → the exact ≤k-distance pair set over DISTINCT names;
2. **clustering**: ``stages/cc.connected_components`` over those pairs —
   scale-switched (driver union-find small, distributed min-label
   propagation large); the min-name label IS the cluster's entity id;
3. **golden record**: per-entity consolidation (member-name count, row
   count, exact money total) — fact rows shuffle ONCE (by name, into
   per-name stats bounded by the vocabulary), everything after flows at
   vocabulary scale, not row scale.

Money rides as integer cents until the single final divide, so the
output hashes bit-identically against the SQL oracle (levenshtein self
join + recursive-CTE reachability min + grouped aggregate).

Reference parity note: the reference deduplicates nothing (its
OpenSearch index keeps every scraped row); ER is part of the
beyond-reference training-data surface (SURVEY §2.11).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

ER_SCHEMA = pa.schema(
    [("entity_id", pa.string()), ("n_names", pa.int64()),
     ("n_rows", pa.int64()), ("total_retail", pa.float64())]
)

_NAME_STATS = pa.schema(
    [("name", pa.string()), ("n_rows", pa.int64()), ("cents", pa.int64())]
)


def golden_records(
    ds: rd.Dataset, *, name_col: str, money_col: str, k: int = 2
) -> rd.Dataset:
    """→ one (entity_id, n_names, n_rows, total_retail) row per resolved
    entity over ``ds``; see the module docstring for the plan."""
    from semantic_search_system_ray.stages.cc import connected_components
    from semantic_search_system_ray.stages.dedup import edit_distance_pairs
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    # --- per-name stats: the ONLY row-scale shuffle in the pipeline
    def partial(t: pa.Table) -> pa.Table:
        name = t.column(name_col)
        t = t.filter(pc.is_valid(name))
        cents = pc.cast(
            pc.round(pc.multiply(t.column(money_col), pa.scalar(100.0))),
            pa.int64(),
        )
        t2 = pa.Table.from_pydict(
            {"name": t.column(name_col),
             "one": pa.array([1] * t.num_rows, pa.int64()),
             "cents": cents}
        )
        agg = t2.group_by(["name"]).aggregate([("one", "sum"), ("cents", "sum")])
        return agg.rename_columns(["name", "n_rows", "cents"])

    def per_name(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("name", sort=False).agg(
            n_rows=("n_rows", "sum"), cents=("cents", "sum")
        ).reset_index()
        return pa.Table.from_pydict(
            {"name": g["name"], "n_rows": g["n_rows"].astype("int64"),
             "cents": g["cents"].astype("int64")},
            schema=_NAME_STATS,
        )

    name_stats = coarse_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["name"], per_name, _NAME_STATS,
    ).materialize()  # consumed twice: as the CC node set and as facts

    # --- pair graph + clustering over the distinct-name vocabulary.
    # name_stats IS the distinct vocabulary (one row per name), so the
    # blocker skips its own row-scale distinct over the raw fact table —
    # one fewer full-input shuffle at any scale.
    pairs = edit_distance_pairs(
        name_stats, name_col="name", k=k, assume_distinct=True
    )
    edges = pairs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("name_a"), "dst": t.column("name_b")}
        ),
        batch_format="pyarrow",
    )
    nodes = name_stats.map_batches(
        lambda t: pa.Table.from_pydict({"node": t.column("name")}),
        batch_format="pyarrow",
    )
    labels = connected_components(nodes, edges)  # (node, label=min member)

    # --- attach entity ids (vocabulary scale) and consolidate
    tagged = coarse_attach(
        name_stats, labels, left_key="name", right_key="node",
        attach_cols=["label"], attach_as=["entity_id"],
        out_schema=pa.schema(
            [("name", pa.string()), ("n_rows", pa.int64()),
             ("cents", pa.int64()), ("entity_id", pa.string())]
        ),
        how="inner",  # labels cover every name: nodes came from name_stats
    )

    def per_entity(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("entity_id", sort=False).agg(
            n_names=("name", "nunique"), n_rows=("n_rows", "sum"),
            cents=("cents", "sum"),
        ).reset_index()
        return pa.Table.from_pydict(
            {"entity_id": g["entity_id"],
             "n_names": g["n_names"].astype("int64"),
             "n_rows": g["n_rows"].astype("int64"),
             "total_retail": (g["cents"].astype("int64") / 100.0)},
            schema=ER_SCHEMA,
        )

    return coarse_partition_apply(tagged, ["entity_id"], per_entity, ER_SCHEMA)


def q_er_golden_records(sf_dir: str):
    """Gate query: resolve part names (lev ≤ 2 variants are the same
    entity) and consolidate each entity's rows into one golden record."""
    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name", "p_retailprice"]
    )
    return golden_records(ds, name_col="p_name", money_col="p_retailprice")


SQL_ER_GOLDEN_RECORDS = """
WITH RECURSIVE v AS (
  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
),
pr AS (
  SELECT a.name AS src, b.name AS dst
  FROM v a JOIN v b ON a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 2
),
es AS (SELECT src, dst FROM pr UNION SELECT dst, src FROM pr),
reach(node, label) AS (
  SELECT name, name FROM v
  UNION
  SELECT es.dst, r.label FROM reach r JOIN es ON es.src = r.node
),
lab AS (SELECT node, min(label) AS entity_id FROM reach GROUP BY node),
f AS (
  SELECT entity_id, p_name,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part JOIN lab ON p_name = lab.node
)
SELECT entity_id,
       count(DISTINCT p_name) AS n_names,
       count(*) AS n_rows,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS total_retail
FROM f GROUP BY entity_id
"""
