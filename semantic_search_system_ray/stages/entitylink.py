"""Dense-embedding entity-link scoring — the north-star M4 stage
(SURVEY §7.5): score mention surfaces against a broadcast
canonical-entity embedding matrix and link each mention to its
argmax-cosine entity. An actor-pool ``map_batches`` stage, GPU-shaped
(``num_gpus`` knob puts each linker actor on a GPU) with the repo's
deterministic hash embedding as the CPU surrogate model.

Reference analogue: ``nlp/pr_aws_nlp.py:100-112`` (Titan 256-d
normalized embeddings, ``normalize: true``) feeding the
knowledge-graph upserts; the reference links by exact phrase match —
this stage generalizes to cosine scoring of mention↔candidate-entity
pairs as the north star requires.

Scale contract: the ENTITY side is the small side (a canonical
vocabulary), embedded ONCE on the driver and broadcast via ``ray.put``
— each actor reads it once in ``__init__``, never per batch. Mentions
stream through ``map_batches`` at corpus scale. Entity vocabularies
beyond ``ENTITY_BROADCAST_THRESHOLD`` rows must go through the
IVF/LSH ANN path (stages/ann.py) instead of a dense broadcast matmul;
the builder raises loudly rather than silently degrading.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from semantic_search_system_ray.functions.embed import hash_embed_many

# 2M × 256-d float32 ≈ 2 GB broadcast matrix — comfortable in a worker
# heap; beyond that, route candidates through stages/ann.py (IVF/LSH).
ENTITY_BROADCAST_THRESHOLD = 2_000_000


def build_entity_index(
    entities: rd.Dataset,
    *,
    id_col: str = "entity_id",
    name_col: str = "name",
    threshold: int = ENTITY_BROADCAST_THRESHOLD,
):
    """entities(id_col, name_col) → ObjectRef of (ids, (E, dim) float32
    matrix). Candidate order is sorted by id, so argmax's
    first-occurrence rule resolves exact ties to the MIN entity id —
    deterministic under any block layout."""
    rows = entities.select_columns([id_col, name_col]).take_all()
    if len(rows) > threshold:
        raise ValueError(
            f"entity vocabulary ({len(rows)} rows) exceeds the dense "
            f"broadcast threshold ({threshold}); use the ANN path "
            "(stages/ann.py ivf/lsh) for candidate scoring instead"
        )
    if not rows:
        raise ValueError("entity vocabulary is empty")
    rows.sort(key=lambda r: str(r[id_col]))
    ids = [str(r[id_col]) for r in rows]
    mat = hash_embed_many([r[name_col] or "" for r in rows])
    return ray.put((ids, mat))


class EntityLinker:
    """Stateful linker actor: reads the broadcast entity index once in
    ``__init__``; per batch, embeds mention strings (the batched-model
    surrogate), computes one (B, E) cosine matmul (both sides
    L2-normalized), and appends (entity_id, link_score, link_margin).
    ``min_score`` nulls the entity (keeps the row) below the cut —
    downstream decides drop-vs-keep semantics."""

    def __init__(self, index_ref, mention_col: str = "mention",
                 min_score: float | None = None):
        self.ids, self.mat = ray.get(index_ref)
        self.id_arr = np.array(self.ids, dtype=object)
        self.mention_col = mention_col
        self.min_score = min_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.mention_col).to_pylist()
        if not texts:
            return (
                batch.append_column("entity_id", pa.array([], pa.string()))
                .append_column("link_score", pa.array([], pa.float64()))
                .append_column("link_margin", pa.array([], pa.float64()))
            )
        emb = hash_embed_many([t if isinstance(t, str) else "" for t in texts])
        scores = emb @ self.mat.T  # (B, E)
        best = np.argmax(scores, axis=1)  # first occurrence = min entity id
        s = scores[np.arange(len(texts)), best].astype(np.float64)
        if self.mat.shape[0] > 1:
            margin = (
                s - np.partition(scores, -2, axis=1)[:, -2].astype(np.float64)
            )
        else:
            margin = s.copy()
        ent = self.id_arr[best]
        if self.min_score is not None:
            ent = np.where(s >= self.min_score, ent, None)
        return (
            batch.append_column("entity_id", pa.array(ent, pa.string()))
            .append_column("link_score", pa.array(s, pa.float64()))
            .append_column("link_margin", pa.array(margin, pa.float64()))
        )


def link_mentions(
    mentions: rd.Dataset,
    entities: rd.Dataset,
    *,
    mention_col: str = "mention",
    id_col: str = "entity_id",
    name_col: str = "name",
    min_score: float | None = None,
    concurrency=(2, 8),
    batch_size: int = 1024,
    num_gpus: float = 0.0,
) -> rd.Dataset:
    """mentions + entities → mentions ⊕ (entity_id, link_score,
    link_margin). ``num_gpus>0`` reserves a GPU per linker actor (the
    real-model deployment shape); the hash-embed surrogate itself is
    CPU-only."""
    ref = build_entity_index(
        entities, id_col=id_col, name_col=name_col
    )
    kwargs: dict = dict(
        fn_constructor_kwargs={
            "index_ref": ref,
            "mention_col": mention_col,
            "min_score": min_score,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return mentions.map_batches(EntityLinker, **kwargs)
