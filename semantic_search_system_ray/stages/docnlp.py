"""DocNLP — the per-document NLP actor stage (segmentation + mention
detection + SVO extraction + top-5 selection + summary + embedding).

Design (Ray-Data-first, SURVEY §7.2 M2-M4):
- One ``map_batches`` over the documents Dataset with a CALLABLE CLASS →
  actor pool. The gazetteer automaton is compiled ONCE per actor in
  ``__init__`` (the reference's module-level spaCy/bedrock singletons,
  nlp/pr_local_nlp_pipeline.py:19, nlp/pr_aws_nlp.py:13, become actor
  state); per-batch work is pure matching.
- All computation is DOC-LOCAL: a document's spans arrive in one row, so
  top-5 selection, tie-breaking and span ordering need NO shuffle — the
  wide steps (canonicalization, dedup) happen downstream on much smaller
  derived tables. At 10^12 docs this stage is embarrassingly parallel.
- The gazetteer is broadcast once via ``ray.put`` on the driver and read in
  ``__init__`` (never re-shipped per batch).
- Output is one nested Arrow row per doc (entities/topics/svo/surfaces as
  list columns + 256-dim embedding), preserving ``doc_id`` (J2 key
  stability) — downstream stages flatten what they need.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from semantic_search_system_ray.functions.embed import hash_embed
from semantic_search_system_ray.functions.extraction import (
    GazetteerMatcher,
    process_document,
)
from semantic_search_system_ray.schemas import EMBED_DIM

ENRICHED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field(
            "entities",
            pa.list_(pa.struct([("text", pa.string()), ("label", pa.string())])),
        ),
        pa.field(
            "topics",
            pa.list_(pa.struct([("text", pa.string()), ("label", pa.string())])),
        ),
        pa.field("summary", pa.string()),
        pa.field(
            "svo",
            pa.list_(
                pa.struct(
                    [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
                )
            ),
        ),
        pa.field("surfaces", pa.list_(pa.string())),
        pa.field("embedding", pa.list_(pa.float32(), EMBED_DIM)),
    ]
)


class DocNLP:
    """Actor-pool stage: documents (doc_id, spans) → enriched rows.

    Use as ``ds.map_batches(DocNLP, fn_constructor_kwargs={"gazetteer": ref},
    batch_format="pyarrow", concurrency=N, batch_size=B)`` where ``ref`` is
    ``ray.put(gazetteer_dict)`` (or the dict itself for tests).
    """

    def __init__(self, gazetteer, embed: bool = True):
        if isinstance(gazetteer, ray.ObjectRef):
            gazetteer = ray.get(gazetteer)
        self.matcher = GazetteerMatcher(gazetteer)
        self.embed = embed

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out = {
            "doc_id": [], "entities": [], "topics": [], "summary": [],
            "svo": [], "surfaces": [], "embedding": [],
        }
        zero = np.zeros(EMBED_DIM, dtype=np.float32)
        for doc_id, spans in zip(doc_ids, spans_col):
            r = process_document(doc_id, spans or [], self.matcher)
            out["doc_id"].append(r.doc_id)
            out["entities"].append(r.entities)
            out["topics"].append(r.topics)
            out["summary"].append(r.summary)
            out["svo"].append(
                [{"subj": s, "pred": p, "obj": o} for s, p, o in r.svo]
            )
            out["surfaces"].append(r.mention_surfaces)
            out["embedding"].append(
                hash_embed(r.summary) if (self.embed and r.summary) else zero
            )
        return pa.Table.from_pydict(out, schema=ENRICHED_SCHEMA)


def enrich_documents(
    docs_ds,
    gazetteer: dict[str, str],
    *,
    concurrency=None,
    batch_size: int = 256,
    embed: bool = True,
):
    """documents Dataset → enriched Dataset via a DocNLP actor pool."""
    gaz_ref = ray.put(gazetteer)
    kwargs = dict(
        fn_constructor_kwargs={"gazetteer": gaz_ref, "embed": embed},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return docs_ds.map_batches(DocNLP, **kwargs)
