"""Literal single-process reference oracle (the correctness golden).

Reimplements the reference's E2 (doc → NLP → entities/topics, results.json
contract) and E3 (taxonomy ⨝ phrase-docs → topic→doc edges) semantics with
plain loops, dicts, Counter and sets — deliberately the same *style* as the
reference code paths it mirrors:

- per-doc extraction loop ≙ nlp/pr_aws_nlp.py:213-288 / 124-144 (sequential
  per-doc processing) with the local pipeline's top-5 + first-label
  semantics (nlp/pr_local_nlp_pipeline.py:70-93);
- taxonomy join + per-topic seen-set dedup ≙ the triple-nested loop in
  knowledge_graph/knowledge_graph.py:129-196 (normalize_key on both sides,
  inner join silently skipping phrases absent from phrase-docs, per-topic
  ``processed_docs_for_topic`` set);
- canonicalization golden = functions.canon_spec.canonicalize_exact (the
  union-find spec the distributed stage must reproduce).

The distributed Ray pipeline (pipelines/kg_build.py) must match this
oracle's emitted triples at P/R ≥ 0.95 (target: exact).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from semantic_search_system_ray.functions.canon_spec import canonicalize_exact
from semantic_search_system_ray.functions.extraction import (
    ENTITY_LABELS,
    GazetteerMatcher,
    process_document,
)
from semantic_search_system_ray.functions.text import normalize_key
from semantic_search_system_ray.schemas import TRIPLES_SCHEMA


def oracle_doc_nlp(documents: pa.Table, gazetteer: dict[str, str]) -> dict:
    """doc_id → DocNLPResult, sequential loop over docs (E2 analogue)."""
    matcher = GazetteerMatcher(gazetteer)
    out = {}
    for row in documents.to_pylist():
        out[row["doc_id"]] = process_document(row["doc_id"], row["spans"], matcher)
    return out


def oracle_triples(
    documents: pa.Table,
    taxonomy: pa.Table,
    phrase_docs: pa.Table,
    gazetteer: dict[str, str],
) -> set[tuple[str, str, str]]:
    """The full golden triple set:

    - (doc_id, MENTIONS, canon(entity))       from per-doc top-5 entities
    - (doc_id, HAS_TOPIC, normalize_key(t))   from per-doc top-5 topics
    - (canon(subj), pred, canon(obj))         from SVO extraction
    - (phrase_norm, IN_TOPIC, topic_norm)     from the taxonomy
    - (topic_norm, RELATES_TO_DOC, doc_id)    from taxonomy ⨝ phrase_docs
    deduplicated as a set (exact dedup ≙ groupby(subj,pred,obj).first()).
    """
    nlp = oracle_doc_nlp(documents, gazetteer)

    # canonicalization over every surface seen in any doc
    all_surfaces: list[str] = []
    seen = set()
    for res in nlp.values():
        for s in res.mention_surfaces:
            if s not in seen:
                seen.add(s)
                all_surfaces.append(s)
    canon = canonicalize_exact(all_surfaces)

    triples: set[tuple[str, str, str]] = set()
    for doc_id, res in nlp.items():
        for ent in res.entities:
            triples.add((doc_id, "MENTIONS", canon[ent["text"]]))
        for top in res.topics:
            triples.add((doc_id, "HAS_TOPIC", normalize_key(top["text"])))
        for s, p, o in res.svo:
            triples.add((canon[s], p, canon[o]))

    # E3: taxonomy → IN_TOPIC triples; join with phrase_docs → RELATES_TO_DOC
    normalized_topic_mapping: dict[str, list[str]] = defaultdict(list)
    for row in taxonomy.to_pylist():
        normalized_topic_mapping[normalize_key(row["broad_topic"])].append(row["phrase"])
    normalized_topics: dict[str, list[str]] = defaultdict(list)
    for row in phrase_docs.to_pylist():
        normalized_topics[normalize_key(row["phrase"])].append(row["doc_id"])

    processed_docs_for_topic: dict[str, set[str]] = defaultdict(set)
    for broad_topic_norm, phrases in normalized_topic_mapping.items():
        for phrase_raw in phrases:
            phrase_norm = normalize_key(phrase_raw)
            triples.add((phrase_norm, "IN_TOPIC", broad_topic_norm))
            if phrase_norm in normalized_topics:
                for doc_id in normalized_topics[phrase_norm]:
                    doc_id_str = str(doc_id)
                    if doc_id_str in processed_docs_for_topic[broad_topic_norm]:
                        continue
                    triples.add((broad_topic_norm, "RELATES_TO_DOC", doc_id_str))
                    processed_docs_for_topic[broad_topic_norm].add(doc_id_str)
    return triples


def triples_table(triples: set[tuple[str, str, str]]) -> pa.Table:
    rows = sorted(triples)
    return pa.Table.from_pydict(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        },
        schema=TRIPLES_SCHEMA,
    )


def precision_recall(
    engine: set[tuple[str, str, str]], golden: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not engine or not golden:
        return (0.0, 0.0)
    tp = len(engine & golden)
    return (tp / len(engine), tp / len(golden))
