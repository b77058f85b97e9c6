"""The flagship pipeline: documents → enriched NLP → canonicalized,
deduplicated (subj, pred, obj) triples → node/edge/adjacency store.

Dataflow (all lazy ray.data.Dataset stages; shuffles marked ✱):

  documents ──DocNLP actor pool──► enriched (doc-local, no shuffle)
      enriched ─flatten─► raw triples          (doc-local)
      enriched ─flatten─► mention surfaces ─✱distinct─► canonical map
                                               (union-find CC, stages/canon.py)
  taxonomy (tiny) ──ray.put broadcast──► IN_TOPIC triples (driver-side Arrow)
  phrase_docs ──map_batches w/ broadcast taxonomy──► RELATES_TO_DOC triples
  union(all triples) ─apply canon─ ─✱groupby(subj,pred,obj) dedup─► triples
  triples ─► nodes(✱distinct) / edges / adjacency(✱groupby(src))

Reference semantics reproduced (cites into /root/reference):
- per-doc entities/topics/summary contract = results.json / nlp/pr_aws_nlp.py:70-81;
- taxonomy join on normalize_key both sides, inner (phrases missing from
  phrase-docs silently skipped) = knowledge_graph/knowledge_graph.py:138-163;
- per-topic doc dedup (processed_docs_for_topic) = :170-186 — subsumed by
  the global exact triple dedup since the edge tuple is identical;
- exact dedup = hash-partitioned groupby + per-group first (G6).

Scale notes:
- the taxonomy is the SMALL side (80 topics × ~8k phrases in the
  reference) → broadcast dict via ray.put, read once per task — never a
  shuffle join (SURVEY §2.4 J1);
- triple dedup pre-aggregates per batch (pyarrow group_by distinct) before
  the global groupby — the combiner halves shuffle volume on skewed preds;
- nothing materializes the documents Dataset; only small derived tables
  (canon map, taxonomy) are ever collected.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray
import ray.data as rd

from semantic_search_system_ray.functions.text import normalize_key
from semantic_search_system_ray.stages.canon import canonical_map_dict
from semantic_search_system_ray.stages.docnlp import enrich_documents
from semantic_search_system_ray.schemas import TRIPLES_SCHEMA


def _distinct_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: local distinct before the global dedup shuffle."""
    return batch.group_by(batch.column_names).aggregate([])


def triples_from_enriched(enriched: rd.Dataset) -> rd.Dataset:
    """Flatten enriched rows into raw triples. Columns subj/pred/obj plus
    bitmask flags marking which side is an entity surface needing canon."""

    def flatten(batch: pa.Table) -> pa.Table:
        subj, pred, obj, canon_subj, canon_obj = [], [], [], [], []
        doc_ids = batch.column("doc_id").to_pylist()
        ents = batch.column("entities").to_pylist()
        tops = batch.column("topics").to_pylist()
        svos = batch.column("svo").to_pylist()
        for d, es, ts, sv in zip(doc_ids, ents, tops, svos):
            for e in es:
                subj.append(d); pred.append("MENTIONS"); obj.append(e["text"])
                canon_subj.append(False); canon_obj.append(True)
            for t in ts:
                subj.append(d); pred.append("HAS_TOPIC")
                obj.append(normalize_key(t["text"]))
                canon_subj.append(False); canon_obj.append(False)
            for s in sv:
                subj.append(s["subj"]); pred.append(s["pred"]); obj.append(s["obj"])
                canon_subj.append(True); canon_obj.append(True)
        return pa.Table.from_pydict(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(obj, pa.string()),
                "canon_subj": pa.array(canon_subj, pa.bool_()),
                "canon_obj": pa.array(canon_obj, pa.bool_()),
            }
        )

    return enriched.map_batches(flatten, batch_format="pyarrow")


def surfaces_from_enriched(enriched: rd.Dataset) -> rd.Dataset:
    def flatten(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        for surfs in batch.column("surfaces").to_pylist():
            out.extend(surfs)
        return pa.Table.from_pydict({"surface": pa.array(sorted(set(out)), pa.string())})

    return enriched.map_batches(flatten, batch_format="pyarrow")


def taxonomy_triples(taxonomy: pa.Table) -> tuple[pa.Table, dict[str, str]]:
    """IN_TOPIC triples + the broadcastable {phrase_norm: topic_norm} map.
    The taxonomy is tiny (J1 small side) → computed driver-side."""
    phrase_to_topic: dict[str, str] = {}
    subj, pred, obj = [], [], []
    seen = set()
    for row in taxonomy.to_pylist():
        t_norm = normalize_key(row["broad_topic"])
        p_norm = normalize_key(row["phrase"])
        phrase_to_topic.setdefault(p_norm, t_norm)
        key = (p_norm, t_norm)
        if key not in seen:
            seen.add(key)
            subj.append(p_norm); pred.append("IN_TOPIC"); obj.append(t_norm)
    tbl = pa.Table.from_pydict(
        {"subj": subj, "pred": pred, "obj": obj}, schema=TRIPLES_SCHEMA
    )
    return tbl, phrase_to_topic


def relates_to_doc_triples(
    phrase_docs: rd.Dataset, phrase_to_topic: dict[str, str]
) -> rd.Dataset:
    """phrase_docs ⨝ broadcast taxonomy → (topic, RELATES_TO_DOC, doc_id).
    Inner join: phrases absent from the taxonomy are dropped
    (knowledge_graph/knowledge_graph.py:160-163). Dedup happens in the
    global triple dedup (identical tuple ≙ per-topic seen-set)."""
    ref = ray.put(phrase_to_topic)

    class _Join:
        def __init__(self):
            self.map = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            subj, obj = [], []
            for phrase, doc_id in zip(
                batch.column("phrase").to_pylist(), batch.column("doc_id").to_pylist()
            ):
                t = self.map.get(normalize_key(phrase))
                if t is not None:
                    subj.append(t)
                    obj.append(str(doc_id))
            return pa.Table.from_pydict(
                {
                    "subj": pa.array(subj, pa.string()),
                    "pred": pa.array(["RELATES_TO_DOC"] * len(subj), pa.string()),
                    "obj": pa.array(obj, pa.string()),
                }
            )

    return phrase_docs.map_batches(_Join, batch_format="pyarrow", concurrency=(1, 4))


def dedup_triples(triples: rd.Dataset) -> rd.Dataset:
    """Exact distinct on (subj, pred, obj): per-batch combiner distinct,
    then hash-partitioned groupby + first (G6 pattern)."""
    return (
        triples.map_batches(_distinct_batch, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .count()
        .drop_columns(["count()"])
    )


@dataclass
class KGResult:
    triples: rd.Dataset     # distinct (subj, pred, obj)
    enriched: rd.Dataset    # per-doc NLP output (results.json contract)
    canon: dict[str, str]   # surface -> canonical form


def build_triples(
    documents: rd.Dataset,
    taxonomy: pa.Table,
    phrase_docs: rd.Dataset,
    gazetteer: dict[str, str],
    *,
    concurrency=(1, 8),
    batch_size: int = 256,
    embed: bool = False,
) -> KGResult:
    enriched = enrich_documents(
        documents, gazetteer, concurrency=concurrency, batch_size=batch_size, embed=embed
    )
    # Two consumers (raw triples + surfaces) would re-execute the DocNLP
    # pass twice on a lazy Dataset — pin it once. In-memory materialize is
    # the convenience path; at corpus scale use pipelines/runner.py, which
    # writes the enriched shard to parquet instead (same single-pass
    # property, spillable).
    enriched = enriched.materialize()
    raw = triples_from_enriched(enriched)

    canon = canonical_map_dict(surfaces_from_enriched(enriched))

    # canon applies only where the flags say the value is an entity surface
    # (doc_id / normalized-topic fields must never be rewritten even if a
    # surface form happened to collide with them)
    def apply_flags(batch: pa.Table, canon_map=canon) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        cs = batch.column("canon_subj").to_pylist()
        co = batch.column("canon_obj").to_pylist()
        subj = [canon_map.get(s, s) if f else s for s, f in zip(subj, cs)]
        obj = [canon_map.get(o, o) if f else o for o, f in zip(obj, co)]
        return pa.Table.from_pydict(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": batch.column("pred"),
                "obj": pa.array(obj, pa.string()),
            }
        )

    canoned = raw.map_batches(apply_flags, batch_format="pyarrow")

    tax_tbl, phrase_to_topic = taxonomy_triples(taxonomy)
    rel = relates_to_doc_triples(phrase_docs, phrase_to_topic)
    all_triples = canoned.union(rd.from_arrow(tax_tbl), rel)
    return KGResult(
        triples=dedup_triples(all_triples), enriched=enriched, canon=canon
    )


# --- graph materialize -------------------------------------------------------

_NODE_KINDS = {
    "MENTIONS": ("DOC", "ENTITY"),
    "HAS_TOPIC": ("DOC", "TOPIC"),
    "IN_TOPIC": ("PHRASE", "BROAD_TOPIC"),
    "RELATES_TO_DOC": ("BROAD_TOPIC", "DOC"),
}


def nodes_from_triples(triples: rd.Dataset) -> rd.Dataset:
    """Distinct typed nodes. SVO predicates type both ends ENTITY."""

    def emit(batch: pa.Table) -> pa.Table:
        node_id, kind = [], []
        for s, p, o in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
        ):
            ks, ko = _NODE_KINDS.get(p, ("ENTITY", "ENTITY"))
            node_id.append(s); kind.append(ks)
            node_id.append(o); kind.append(ko)
        t = pa.Table.from_pydict(
            {
                "node_id": pa.array(node_id, pa.string()),
                "kind": pa.array(kind, pa.string()),
            }
        )
        return t.group_by(["node_id", "kind"]).aggregate([])

    return (
        triples.map_batches(emit, batch_format="pyarrow")
        .groupby(["node_id", "kind"])
        .count()
        .drop_columns(["count()"])
        .map_batches(
            lambda t: t.append_column("name", t.column("node_id")),
            batch_format="pyarrow",
        )
    )


def edges_from_triples(triples: rd.Dataset) -> rd.Dataset:
    return triples.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("subj"), "dst": t.column("obj"), "rel": t.column("pred")}
        ),
        batch_format="pyarrow",
    )


def adjacency_from_edges(edges: rd.Dataset) -> rd.Dataset:
    """src → sorted list<struct<dst, rel>> (✱groupby(src))."""
    import pandas as pd

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dst", "rel"])
        return pd.DataFrame(
            {
                "src": [g["src"].iloc[0]],
                "neighbors": [
                    [{"dst": d, "rel": r} for d, r in zip(g["dst"], g["rel"])]
                ],
                "degree": [len(g)],
            }
        )

    return edges.groupby("src").map_groups(collect, batch_format="pandas")
