"""Taxonomy builder — the reference's phrase-clustering pipeline
(nlp/topic_modeling.py: clean+distinct → embed → cluster to K broad topics
→ centroid labels → topic→phrases mapping) re-expressed distributed.

Complete-linkage hierarchical clustering (the reference's choice, all-pairs
in memory, :31-36) cannot scale past ~10^5 phrases; the distributed
replacement is seeded Lloyd's k-means over the deterministic hash
embeddings:

- embed: actor-pool ``map_batches`` (A5's SentenceTransformer slot).
- assign: broadcast centroids via ``ray.put``, vectorized argmax per batch.
- update: per-batch partial (sum, count) per cluster → tiny global groupby
  — the two-phase aggregation pattern; K centroids never leave the driver.
- label (G4): phrase nearest its cluster centroid = cluster name;
  singleton clusters label themselves (reference :48-66 semantics).
- output (G5): long table (broad_topic, phrase) — the J1 taxonomy input.

Deterministic: seeded init (first K distinct phrases by hash order),
fixed iteration count + convergence check on centroid movement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from semantic_search_system_ray.functions.embed import hash_embed_many
from semantic_search_system_ray.functions.hashing import stable_hash64
from semantic_search_system_ray.functions.text import clean_text_topic
from semantic_search_system_ray.schemas import EMBED_DIM


class PhraseEmbed:
    """Actor stage: (phrase) → (phrase, embedding). Model slot = __init__."""

    def __init__(self):
        self.dim = EMBED_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        phrases = batch.column("phrase").to_pylist()
        mat = hash_embed_many(phrases, self.dim)
        return pa.Table.from_pydict(
            {
                "phrase": pa.array(phrases, pa.string()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32(), self.dim)
                ),
            }
        )


def distinct_phrases(phrases_ds: rd.Dataset) -> rd.Dataset:
    """clean_text_topic + two-phase distinct (G2)."""

    def clean(t: pa.Table) -> pa.Table:
        vals = sorted(
            {clean_text_topic(p) for p in t.column("phrase").to_pylist()} - {""}
        )
        return pa.Table.from_pydict({"phrase": pa.array(vals, pa.string())})

    return (
        phrases_ds.map_batches(clean, batch_format="pyarrow")
        .groupby("phrase")
        .count()
        .drop_columns(["count()"])
    )


def build_taxonomy(
    phrases_ds: rd.Dataset,
    num_topics: int = 8,
    *,
    max_iters: int = 10,
    tol: float = 1e-4,
    concurrency=(1, 8),
) -> rd.Dataset:
    """phrases (column ``phrase``) → taxonomy (broad_topic, phrase)."""
    emb = distinct_phrases(phrases_ds).map_batches(
        PhraseEmbed, batch_format="pyarrow", concurrency=concurrency
    ).materialize()  # reused every k-means iteration

    # seeded init: K phrases with smallest stable hash (deterministic,
    # order-independent) — computed with a distributed top-k
    def hash_rows(t: pa.Table) -> pa.Table:
        ph = t.column("phrase").to_pylist()
        return pa.Table.from_pydict(
            {"phrase": pa.array(ph, pa.string()),
             "h": pa.array([stable_hash64(p) % (1 << 62) for p in ph], pa.int64())}
        )

    seeds = [
        r["phrase"]
        for r in emb.map_batches(hash_rows, batch_format="pyarrow")
        .sort("h").limit(num_topics).take_all()
    ]
    # fetch ONLY the K seed vectors (vectorized Arrow filter) — never
    # take_all() the full embedding table onto the driver
    import pyarrow.compute as pc

    seed_arr = pa.array(sorted(set(seeds)))
    seed_rows = {
        r["phrase"]: r["embedding"]
        for r in emb.map_batches(
            lambda t: t.filter(pc.is_in(t.column("phrase"), value_set=seed_arr)),
            batch_format="pyarrow",
        ).take_all()
    }
    centroids = np.array([seed_rows[p] for p in seeds], dtype=np.float64)

    def _assign_batches(cent_ref):
        class _Assign:
            def __init__(self):
                self.cent = ray.get(cent_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                from semantic_search_system_ray.stages.ann import list_column_to_matrix

                mat = list_column_to_matrix(t.column("embedding"))
                sims = mat @ self.cent.T  # embeddings are L2-normalized
                cid = np.argmax(sims, axis=1).astype(np.int32)
                return pa.Table.from_pydict(
                    {"phrase": t.column("phrase"),
                     "embedding": t.column("embedding"),
                     "cluster": pa.array(cid, pa.int32()),
                     "sim": pa.array(np.max(sims, axis=1), pa.float64())}
                )

        return _Assign

    assigned = None
    for _ in range(max_iters):
        cent_ref = ray.put(centroids)
        assigned = emb.map_batches(
            _assign_batches(cent_ref), batch_format="pyarrow", concurrency=concurrency
        )

        # two-phase centroid update: per-batch partial sums per cluster
        def partial(t: pa.Table) -> pa.Table:
            from semantic_search_system_ray.stages.ann import list_column_to_matrix

            mat = list_column_to_matrix(t.column("embedding"))
            cid = np.array(t.column("cluster").to_pylist())
            rows = {"cluster": [], "vec_sum": [], "n": []}
            for c in np.unique(cid):
                rows["cluster"].append(int(c))
                rows["vec_sum"].append(mat[cid == c].sum(axis=0).tolist())
                rows["n"].append(int((cid == c).sum()))
            return pa.Table.from_pydict(
                {"cluster": pa.array(rows["cluster"], pa.int32()),
                 "vec_sum": pa.array(rows["vec_sum"], pa.list_(pa.float64(), centroids.shape[1])),
                 "n": pa.array(rows["n"], pa.int64())}
            )

        partials = assigned.map_batches(partial, batch_format="pyarrow").take_all()
        new_cent = centroids.copy()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in partials:
            sums[r["cluster"]] += np.array(r["vec_sum"])
            counts[r["cluster"]] += r["n"]
        for c in range(len(centroids)):
            if counts[c] > 0:
                v = sums[c] / counts[c]
                nv = np.linalg.norm(v)
                new_cent[c] = v / nv if nv > 0 else v
        delta = float(np.abs(new_cent - centroids).max())
        centroids = new_cent
        if delta < tol:
            break

    # final assignment + G4 labels: per cluster, label = phrase with max
    # sim to centroid (ties → lexicographic min phrase)
    cent_ref = ray.put(centroids)
    assigned = emb.map_batches(
        _assign_batches(cent_ref), batch_format="pyarrow", concurrency=concurrency
    ).materialize()

    import pandas as pd

    def label_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["sim", "phrase"], ascending=[False, True])
        label = g["phrase"].iloc[0]
        return pa.Table.from_pydict(
            {"broad_topic": pa.array([label] * len(g), pa.string()),
             "phrase": pa.array(list(g["phrase"]), pa.string())}
        )

    from semantic_search_system_ray.stages.util import ensure_schema

    out_schema = pa.schema([("broad_topic", pa.string()), ("phrase", pa.string())])
    return ensure_schema(
        assigned.drop_columns(["embedding"])
        .groupby("cluster")
        .map_groups(label_group, batch_format="pandas"),
        out_schema,
    )
