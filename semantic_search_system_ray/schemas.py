"""Arrow schema constants for every logical table in the engine.

The document-corpus schema is the authoritative driver ``input_hint`` shape
(BASELINE.json): interleaved text+media documents, one row per document,
``spans`` as a list of (kind, text, media_ref, offset) structs whose
``offset`` is monotonically increasing within the row and defines span order.
The per-row invariant tested throughout: output span sequence
(kind, text, media_ref, order-by-offset) equals input.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "image" | "audio" | "table"
        pa.field("text", pa.string()),       # sentence text for kind="text", "" otherwise
        pa.field("media_ref", pa.string()),  # "" for text; "media://<hash>" for media kinds
        pa.field("offset", pa.int32()),      # monotone within row; defines span order
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# doc metadata, reference URL/raw record shape (SURVEY §1.1; reference
# ingest/pr_meta_fetch.py:61, ingest/pr_meta_store.py:163-168)
DOC_META_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("pr_url", pa.string()),
        pa.field("pr_title", pa.string()),
        pa.field("pr_date", pa.string()),  # "YYYY-MM-DD"
    ]
)

# taxonomy long table (replaces reference dict[str, list[str]]
# topics/topic_mapping.json; produced by nlp/topic_modeling.py:79-85)
TAXONOMY_SCHEMA = pa.schema(
    [
        pa.field("broad_topic", pa.string()),
        pa.field("phrase", pa.string()),
    ]
)

# phrase → documents long table (reconstructed topics.json schema;
# consumers knowledge_graph/knowledge_graph.py:165-174)
PHRASE_DOCS_SCHEMA = pa.schema(
    [
        pa.field("phrase", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("url", pa.string()),
        pa.field("title", pa.string()),
    ]
)

# flattened sentence/span table (intermediate)
SENTENCES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),   # index of span within doc, by offset order
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

# mentions table (intermediate; SURVEY §1.2)
MENTIONS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("offset", pa.int32()),      # span offset (start-of-span position)
        pa.field("char_start", pa.int32()),  # match position within the span text
        pa.field("mention", pa.string()),    # surface form as matched
        pa.field("label", pa.string()),      # PERSON | ORG | GPE | TOPIC
    ]
)

# triples output (SURVEY §1.2)
TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
    ]
)

TRIPLES_PROV_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("conf", pa.float32()),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        pa.field("node_id", pa.string()),
        pa.field("kind", pa.string()),   # ENTITY | TOPIC | DOC | PHRASE | BROAD_TOPIC
        pa.field("name", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        pa.field("src", pa.string()),
        pa.field("dst", pa.string()),
        pa.field("rel", pa.string()),
    ]
)

EMBED_DIM = 256  # reference contract: 256-dim normalized (nlp/pr_aws_nlp.py:106)
