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

from semantic_search_system_ray.functions.extraction import GazetteerMatcher
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
        # Arrow-kernel span flattening (pc.list_flatten +
        # list_parent_indices), shared with the fused flat path — NOT
        # spans.to_pylist(), which builds one Python dict per span and was
        # the measured 23× per-doc gap between the two paths.
        import pyarrow.compute as pc

        from semantic_search_system_ray.functions.embed import hash_embed_many
        from semantic_search_system_ray.functions.extraction import process_text_spans

        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        flat_struct = pc.list_flatten(spans_col)
        parents = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
        text_mask = pc.equal(flat_struct.field("kind"), "text").to_numpy(
            zero_copy_only=False
        )
        texts_all = flat_struct.field("text").to_pylist()
        offsets_all = flat_struct.field("offset").to_numpy(zero_copy_only=False)
        boundaries = np.searchsorted(parents, np.arange(len(doc_ids) + 1))

        out = {
            "doc_id": [], "entities": [], "topics": [], "summary": [],
            "svo": [], "surfaces": [],
        }
        summaries = []
        for d_idx, doc_id in enumerate(doc_ids):
            lo, hi = boundaries[d_idx], boundaries[d_idx + 1]
            idx = [i for i in range(lo, hi) if text_mask[i] and texts_all[i]]
            idx.sort(key=lambda i: offsets_all[i])  # span order = offset order
            r = process_text_spans(doc_id, [texts_all[i] for i in idx], self.matcher)
            out["doc_id"].append(r.doc_id)
            out["entities"].append(r.entities)
            out["topics"].append(r.topics)
            out["summary"].append(r.summary)
            out["svo"].append(
                [{"subj": s, "pred": p, "obj": o} for s, p, o in r.svo]
            )
            out["surfaces"].append(r.mention_surfaces)
            summaries.append(r.summary)

        if self.embed:
            emb = hash_embed_many(summaries)  # empty summary → zero vector
        else:
            emb = np.zeros((len(summaries), EMBED_DIM), dtype=np.float32)
        out["embedding"] = list(emb)
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


# ---------------------------------------------------------------------------
# Task-based fused path for the KG build: documents → FLAT rows directly
# ---------------------------------------------------------------------------

FLAT_SCHEMA = pa.schema(
    [("rowkind", pa.string()),  # "T" = triple, "S" = mention surface
     ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
)

# Matcher cache keyed by the gazetteer's object ref: Ray reuses worker
# PROCESSES across tasks, so a stateless map task gets actor-like state
# amortization without actor-pool sizing or cold-start ramp — and the
# streaming executor can schedule it on every free CPU immediately.
_MATCHER_CACHE: dict[str, GazetteerMatcher] = {}


def _cached_matcher(gaz_ref) -> GazetteerMatcher:
    key = gaz_ref.hex() if isinstance(gaz_ref, ray.ObjectRef) else str(id(gaz_ref))
    m = _MATCHER_CACHE.get(key)
    if m is None:
        gaz = ray.get(gaz_ref) if isinstance(gaz_ref, ray.ObjectRef) else gaz_ref
        m = GazetteerMatcher(gaz)
        _MATCHER_CACHE[key] = m
    return m


def extract_flat(docs_ds, gazetteer: dict[str, str]):
    """documents → unified FLAT rows (triples "T" + mention surfaces "S")
    in ONE fused task-based pass: segmentation, mention detection, SVO,
    top-5 selection and flattening never leave the task. Per-doc
    normalize_key is applied to topic objects here (reference semantics,
    knowledge_graph/knowledge_graph.py:51-55)."""
    from semantic_search_system_ray.functions.text import normalize_key

    gaz_ref = ray.put(gazetteer)

    import numpy as np
    import pyarrow.compute as pc

    from semantic_search_system_ray.functions.extraction import process_text_spans

    def flat_batch(batch: pa.Table) -> pa.Table:
        matcher = _cached_matcher(gaz_ref)
        # flatten the list<struct> spans column with Arrow kernels instead
        # of to_pylist (which would build one Python dict per span — the
        # dominant allocator churn in this hot path)
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        flat_struct = pc.list_flatten(spans_col)
        parents = pc.list_parent_indices(spans_col).to_numpy(zero_copy_only=False)
        is_text = pc.equal(flat_struct.field("kind"), "text")
        texts_all = flat_struct.field("text").to_pylist()
        offsets_all = flat_struct.field("offset").to_numpy(zero_copy_only=False)
        text_mask = is_text.to_numpy(zero_copy_only=False)

        kind, subj, pred, obj = [], [], [], []
        # parents is non-decreasing (list order); walk doc ranges
        boundaries = np.searchsorted(parents, np.arange(len(doc_ids) + 1))
        for d_idx, doc_id in enumerate(doc_ids):
            lo, hi = boundaries[d_idx], boundaries[d_idx + 1]
            idx = [i for i in range(lo, hi) if text_mask[i] and texts_all[i]]
            idx.sort(key=lambda i: offsets_all[i])  # span order = offset order
            r = process_text_spans(
                doc_id, [texts_all[i] for i in idx], matcher,
                summary_sentences=0,  # flat rows never carry the summary
            )
            for e in r.entities:
                kind.append("T"); subj.append(doc_id)
                pred.append("MENTIONS"); obj.append(e["text"])
            for t in r.topics:
                kind.append("T"); subj.append(doc_id)
                pred.append("HAS_TOPIC"); obj.append(normalize_key(t["text"]))
            for s, p, o in r.svo:
                kind.append("T"); subj.append(s); pred.append(p); obj.append(o)
            for s in r.mention_surfaces:
                kind.append("S"); subj.append(s); pred.append(""); obj.append("")
        return pa.Table.from_pydict(
            {"rowkind": kind, "subj": subj, "pred": pred, "obj": obj},
            schema=FLAT_SCHEMA,
        )

    # bounded batch size: a whole 30k-doc block would build millions of
    # transient Python strings per call (GC/allocator thrash that worsens
    # superlinearly with block size); ~2k docs per call keeps the working
    # set small while still amortizing per-call overhead
    return docs_ds.map_batches(
        flat_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048
    )
