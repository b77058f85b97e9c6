"""Entity-link scoring (stages/entitylink.py): distributed linker parity
against an exact driver numpy reference, deterministic tie-break,
min_score null semantics, and the broadcast-threshold guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.functions.embed import hash_embed_many
from semantic_search_system_ray.stages.entitylink import (
    build_entity_index,
    link_mentions,
)

ENTITIES = ["hash join", "sort merge", "table scan", "window function"]
MENTIONS = [
    "hash join",            # exact → itself, score ~1
    "join hash",            # shares unigrams only → still closest to hash join
    "the sort merge pass",  # superset tokens → sort merge
    "completely unrelated words here",
    "window",               # unigram subset of "window function"
]


def _entities_ds():
    return rd.from_arrow(
        pa.table({"entity_id": ENTITIES, "name": ENTITIES})
    )


def _driver_reference():
    """Exact numpy ground truth: same embeddings, same argmax rule
    (candidates sorted by id; first occurrence wins ties)."""
    ids = sorted(ENTITIES)
    mat = hash_embed_many(ids)
    emb = hash_embed_many(MENTIONS)
    scores = emb @ mat.T
    best = np.argmax(scores, axis=1)
    return {
        m: (ids[b], float(scores[i, b]))
        for i, (m, b) in enumerate(zip(MENTIONS, best))
    }


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_linker_parity_vs_driver(ray_session, n_blocks):
    mentions = rd.from_arrow(pa.table({"mention": MENTIONS})).repartition(
        n_blocks
    )
    got = {
        r["mention"]: (r["entity_id"], r["link_score"])
        for r in link_mentions(
            mentions, _entities_ds(), concurrency=(1, 2), batch_size=2
        ).take_all()
    }
    ref = _driver_reference()
    assert set(got) == set(ref)
    for m in ref:
        assert got[m][0] == ref[m][0], m
        assert got[m][1] == pytest.approx(ref[m][1], abs=1e-6), m
    # exact surface match links to itself at cosine ~1 with real margin
    assert got["hash join"][0] == "hash join"
    assert got["hash join"][1] == pytest.approx(1.0, abs=1e-5)


def test_linker_tie_break_min_entity_id(ray_session):
    """Two entities with IDENTICAL names embed identically — the argmax
    must resolve to the minimum entity id, not block order."""
    entities = rd.from_arrow(
        pa.table({"entity_id": ["z-dup", "a-dup"], "name": ["same", "same"]})
    )
    mentions = rd.from_arrow(pa.table({"mention": ["same"]}))
    out = link_mentions(mentions, entities).take_all()
    assert out[0]["entity_id"] == "a-dup"
    assert out[0]["link_margin"] == pytest.approx(0.0, abs=1e-6)


def test_linker_min_score_nulls_entity(ray_session):
    mentions = rd.from_arrow(
        pa.table({"mention": ["hash join", "zzz qqq unrelated"]})
    )
    out = {
        r["mention"]: r["entity_id"]
        for r in link_mentions(
            mentions, _entities_ds(), min_score=0.9999
        ).take_all()
    }
    assert out["hash join"] == "hash join"
    assert out["zzz qqq unrelated"] is None


def test_entity_index_threshold_guard(ray_session):
    with pytest.raises(ValueError, match="broadcast threshold"):
        build_entity_index(_entities_ds(), threshold=2)
    with pytest.raises(ValueError, match="empty"):
        build_entity_index(
            rd.from_arrow(
                pa.table(
                    {"entity_id": pa.array([], pa.string()),
                     "name": pa.array([], pa.string())}
                )
            )
        )
