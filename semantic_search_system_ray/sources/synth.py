"""Seeded synthetic corpus generator: spans-shaped interleaved text+media
documents + gazetteer + taxonomy + phrase_docs (FIXTURES.md F1-F4).

Mirrors the measured properties of the reference corpus (SURVEY §1.1, §6):
- one head entity in ~67% of docs (reference: "John B Larson" in 2,174/3,225
  docs per results.json), with surface-form variants exercising
  canonicalization ("John B Larson" / "John B. Larson" / "John Larson");
- ~15% media spans interleaved between text spans; 3-40 spans per doc;
- sentences drawn from verb templates the triple extractor targets;
- taxonomy keys with mixed case / stray whitespace (require normalize_key);
- phrase_docs containing phrases absent from the taxonomy (silently dropped
  by the inner join, knowledge_graph/knowledge_graph.py:160-163) and
  duplicate (topic, doc) pairs (deduped by the per-topic seen-set, :170-186).

Everything is a pure function of (seed, n_docs) — no wall clock, no global
state — so fixtures are reproducible across processes and rounds.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from semantic_search_system_ray.schemas import (
    DOC_META_SCHEMA,
    DOCUMENTS_SCHEMA,
    PHRASE_DOCS_SCHEMA,
    TAXONOMY_SCHEMA,
)

# ---------------------------------------------------------------------------
# Vocabulary (fixed, seed-independent)
# ---------------------------------------------------------------------------

HEAD_ENTITY_VARIANTS = ["John B Larson", "John B. Larson", "John Larson"]

PEOPLE = [
    "Maria Gonzalez", "Maria C. Gonzalez", "Wei Chen", "Aisha Khan",
    "Robert Ortiz", "Robert J Ortiz", "Elena Petrova", "Samuel Adeyemi",
    "Grace Kim", "Tomas Novak", "Fatima Al-Sayed", "David Stein",
    "Priya Sharma", "Lucas Moreau", "Hana Suzuki", "Ivan Dragovic",
    "Nora Lindqvist", "Omar Haddad", "Julia Costa", "Peter Walsh",
]

ORGS = [
    "Energy Committee", "Hartford Council", "Capitol Works", "Riverside Labs",
    "Atlantic Coalition", "Northstar Alliance", "Civic Data Trust",
    "Green Grid Initiative", "Harbor Transit Authority", "Summit Health Group",
    "Beacon Education Fund", "Liberty Manufacturing", "Valley Farm Bureau",
    "Union Rail Partners", "Apex Research Institute",
]

PLACES = [
    "Hartford", "East Hartford", "New Britain", "Springfield", "Manchester",
    "Glastonbury", "Bristol", "Windsor", "Middletown", "Wethersfield",
]

# broad_topic -> phrases (the taxonomy ground truth; noise added on output)
TOPIC_PHRASES = {
    "energy": ["clean energy", "solar power", "wind energy", "fuel efficiency",
               "energy grid", "carbon capture"],
    "health care": ["health care reform", "medicare coverage", "drug pricing",
                    "public health", "mental health services"],
    "education": ["student loans", "public schools", "teacher training",
                  "early education", "school funding"],
    "transportation": ["rail service", "highway safety", "public transit",
                       "airport expansion", "bridge repair"],
    "economy": ["job growth", "small business", "manufacturing jobs",
                "trade policy", "minimum wage"],
    "veterans": ["veterans benefits", "military families", "va hospitals",
                 "veteran housing"],
    "environment": ["clean water", "air quality", "river restoration",
                    "climate resilience"],
    "technology": ["broadband access", "data privacy", "cyber security",
                   "artificial intelligence"],
}

# verb templates: (template, predicate) — {A}/{B} person-or-org, {O} org,
# {L} place, {PH} topic phrase. The extractor targets exactly these verbs.
SVO_TEMPLATES = [
    ("{A} met with {B} to discuss {PH}.", "MET_WITH"),
    ("{A} announced {PH} funding in {L}.", "ANNOUNCED"),
    ("{A} visited {L} on Tuesday.", "VISITED"),
    ("{A} joined {O} last week.", "JOINED"),
    ("{A} introduced the {PH} act.", "INTRODUCED"),
    ("{A} praised {O} for its work on {PH}.", "PRAISED"),
]

FILLER_TEMPLATES = [
    "The committee discussed {PH} at length.",
    "Residents of {L} raised questions about {PH}.",
    "A report on {PH} was published this month.",
    "Local leaders in {L} reviewed the plan.",
]

MEDIA_KINDS = ["image", "audio", "table"]


@dataclass
class SynthCorpus:
    documents: pa.Table            # DOCUMENTS_SCHEMA
    doc_meta: pa.Table             # DOC_META_SCHEMA
    taxonomy: pa.Table             # TAXONOMY_SCHEMA (with case/ws noise)
    phrase_docs: pa.Table          # PHRASE_DOCS_SCHEMA
    gazetteer: dict = field(default_factory=dict)  # surface -> label

    def write(self, out_dir: str, num_doc_files: int = 1) -> None:
        """Write to parquet. ``num_doc_files > 1`` shards the documents table
        into multiple files — the unit of checkpoint partitioning at scale
        (a real corpus is many Lance fragments / parquet files)."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        if num_doc_files <= 1:
            pq.write_table(self.documents, f"{out_dir}/documents.parquet")
        else:
            os.makedirs(f"{out_dir}/documents", exist_ok=True)
            n = self.documents.num_rows
            per = (n + num_doc_files - 1) // num_doc_files
            for i in range(num_doc_files):
                part = self.documents.slice(i * per, per)
                pq.write_table(part, f"{out_dir}/documents/part-{i:04d}.parquet")
        pq.write_table(self.doc_meta, f"{out_dir}/doc_meta.parquet")
        pq.write_table(self.taxonomy, f"{out_dir}/taxonomy.parquet")
        pq.write_table(self.phrase_docs, f"{out_dir}/phrase_docs.parquet")


def build_gazetteer() -> dict[str, str]:
    """surface form -> label. Deterministic; shared by engine and oracle."""
    gaz: dict[str, str] = {}
    for p in HEAD_ENTITY_VARIANTS + PEOPLE:
        gaz[p] = "PERSON"
    for o in ORGS:
        gaz[o] = "ORG"
    for pl in PLACES:
        gaz[pl] = "GPE"
    for phrases in TOPIC_PHRASES.values():
        for ph in phrases:
            gaz[ph] = "TOPIC"
    return gaz


def _noise_key(rng: random.Random, s: str) -> str:
    """Inject mixed case / stray whitespace so joins require normalize_key."""
    r = rng.random()
    if r < 0.25:
        s = s.title()
    elif r < 0.4:
        s = s.upper()
    if rng.random() < 0.3:
        s = " " + s + " "
    return s


def _gen_doc(seed: int, i: int):
    """Generate one document deterministically from (seed, doc index) —
    per-doc independent RNG streams make generation order-free, so shards
    can be produced in parallel with identical content."""
    rng = random.Random((seed << 24) ^ i)
    all_phrases = [ph for phs in TOPIC_PHRASES.values() for ph in phs]
    people_pool = PEOPLE + list(HEAD_ENTITY_VARIANTS)

    doc_id = f"doc-{i:08d}"
    has_head = rng.random() < 0.67
    head = rng.choice(HEAD_ENTITY_VARIANTS) if has_head else None
    n_spans = rng.randint(3, 40)
    spans = []
    offset = 0
    doc_phrases: set[str] = set()
    for _ in range(n_spans):
        if rng.random() < 0.15:
            ref = hashlib.blake2b(
                f"{doc_id}-{offset}".encode(), digest_size=8
            ).hexdigest()
            spans.append(
                {"kind": rng.choice(MEDIA_KINDS), "text": "",
                 "media_ref": f"media://{ref}", "offset": offset}
            )
            offset += 1
            continue
        a = head if (head and rng.random() < 0.55) else rng.choice(people_pool)
        b = rng.choice([p for p in people_pool if p != a] + ORGS)
        o = rng.choice(ORGS)
        loc = rng.choice(PLACES)
        ph = rng.choice(all_phrases)
        if rng.random() < 0.7:
            tmpl, _pred = rng.choice(SVO_TEMPLATES)
        else:
            tmpl = rng.choice(FILLER_TEMPLATES)
        sent = (
            tmpl.replace("{A}", a).replace("{B}", b).replace("{O}", o)
            .replace("{L}", loc).replace("{PH}", ph)
        )
        if ph in sent:
            doc_phrases.add(ph)
        spans.append({"kind": "text", "text": sent, "media_ref": "", "offset": offset})
        offset += len(sent) + 1

    url = f"https://example.test/pr/{doc_id}"
    title = f"Press release {i}"
    meta = (doc_id, url, title,
            f"{2000 + (i % 26):04d}-{1 + (i % 12):02d}-{1 + (i % 28):02d}")
    pd_rows = []
    for ph in sorted(doc_phrases):
        pd_rows.append((_noise_key(rng, ph), doc_id, url, title))
        if rng.random() < 0.1:  # duplicate (phrase, doc) pair on purpose
            pd_rows.append((ph, doc_id, url, title))
    return doc_id, spans, meta, pd_rows


def _gen_range(seed: int, lo: int, hi: int):
    """Generate docs [lo, hi) → (documents, doc_meta, phrase_docs) tables."""
    doc_ids, spans_col = [], []
    meta_rows = {"doc_id": [], "pr_url": [], "pr_title": [], "pr_date": []}
    phrase_doc_rows: list[tuple[str, str, str, str]] = []
    for i in range(lo, hi):
        doc_id, spans, meta, pd_rows = _gen_doc(seed, i)
        doc_ids.append(doc_id)
        spans_col.append(spans)
        for k, v in zip(meta_rows, meta):
            meta_rows[k].append(v)
        phrase_doc_rows.extend(pd_rows)
    if lo == 0 and doc_ids:
        # phrases present in phrase_docs but absent from taxonomy (dropped
        # by the inner join, knowledge_graph/knowledge_graph.py:160-163)
        for extra in ["orphan phrase", "unlisted topic"]:
            phrase_doc_rows.append(
                (extra, doc_ids[0], meta_rows["pr_url"][0], meta_rows["pr_title"][0])
            )
    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCUMENTS_SCHEMA
    )
    doc_meta = pa.Table.from_pydict(meta_rows, schema=DOC_META_SCHEMA)
    phrase_docs = pa.Table.from_pydict(
        {
            "phrase": [r[0] for r in phrase_doc_rows],
            "doc_id": [r[1] for r in phrase_doc_rows],
            "url": [r[2] for r in phrase_doc_rows],
            "title": [r[3] for r in phrase_doc_rows],
        },
        schema=PHRASE_DOCS_SCHEMA,
    )
    return documents, doc_meta, phrase_docs


def build_taxonomy_table(seed: int) -> pa.Table:
    rng = random.Random((seed << 8) ^ 0x7A3)
    tax_rows = {"broad_topic": [], "phrase": []}
    for topic, phrases in TOPIC_PHRASES.items():
        for ph in phrases:
            tax_rows["broad_topic"].append(_noise_key(rng, topic))
            tax_rows["phrase"].append(_noise_key(rng, ph))
    return pa.Table.from_pydict(tax_rows, schema=TAXONOMY_SCHEMA)


def generate_corpus(n_docs: int = 500, seed: int = 42) -> SynthCorpus:
    documents, doc_meta, phrase_docs = _gen_range(seed, 0, n_docs)
    return SynthCorpus(
        documents=documents,
        doc_meta=doc_meta,
        taxonomy=build_taxonomy_table(seed),
        phrase_docs=phrase_docs,
        gazetteer=build_gazetteer(),
    )


def write_corpus_parallel(
    out_dir: str, n_docs: int, seed: int = 42, num_shards: int = 32
) -> None:
    """Parallel corpus writer for bench-scale corpora: one Ray task per
    shard generates docs [lo, hi) (per-doc RNG → identical content to the
    sequential generator) and writes its own parquet files. Requires an
    initialized Ray session (bench.py owns one)."""
    import os

    import ray

    os.makedirs(f"{out_dir}/documents", exist_ok=True)
    os.makedirs(f"{out_dir}/phrase_docs", exist_ok=True)
    os.makedirs(f"{out_dir}/doc_meta", exist_ok=True)

    @ray.remote
    def gen_shard(k: int, lo: int, hi: int) -> int:
        docs, meta, pdocs = _gen_range(seed, lo, hi)
        pq.write_table(docs, f"{out_dir}/documents/part-{k:04d}.parquet")
        pq.write_table(meta, f"{out_dir}/doc_meta/part-{k:04d}.parquet")
        pq.write_table(pdocs, f"{out_dir}/phrase_docs/part-{k:04d}.parquet")
        return hi - lo

    per = (n_docs + num_shards - 1) // num_shards
    refs = [
        gen_shard.remote(k, k * per, min(n_docs, (k + 1) * per))
        for k in range(num_shards)
        if k * per < n_docs
    ]
    ray.get(refs)
    pq.write_table(build_taxonomy_table(seed), f"{out_dir}/taxonomy.parquet")


# --------------------------------------------------------------------------
# skew-stress corpus (bench): a planted 2/3-mass near-dup family
# --------------------------------------------------------------------------

_SKEW_BASE_WORDS = (
    "stream shuffle merge join filter window aggregate partition broadcast "
    "spill vector batch column sort hash scan index cache lineage replay "
    "checkpoint commit offset bucket salt probe build emit flush drain"
).split()


def _skew_doc(seed: int, i: int, head: bool) -> str:
    """Deterministic doc text. Head docs are ONE near-dup family: the
    fixed 30-word base with a single position mutated among 5 variants —
    pairwise word-shingle Jaccard stays ≈0.65-0.8, so banding routes the
    whole family through the same buckets and verification accepts it
    into one giant component (the worst-case key for the dedup
    shuffles). Non-head docs are seeded random word soup over the same
    vocabulary (shared words, distinct shingles)."""
    if head:
        w = list(_SKEW_BASE_WORDS)
        w[i % len(w)] = f"v{i % 5}"
        return " ".join(w)
    rng = random.Random((seed << 20) ^ (i * 2654435761 & 0x7FFFFFFF))
    return " ".join(
        rng.choice(_SKEW_BASE_WORDS) for _ in range(len(_SKEW_BASE_WORDS))
    )


def write_vector_corpus(
    out_dir: str,
    n_vecs: int,
    dim: int = 64,
    seed: int = 42,
    num_shards: int = 32,
) -> None:
    """Write a (vec_id, embedding list<float32>) table of unit-ish
    random vectors — the bench input for the distributed k-means /
    semantic-dedup throughput entries. Requires an initialized Ray
    session (bench.py owns one)."""
    import os

    import numpy as np
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen_shard(k: int, lo: int, hi: int) -> int:
        rng = np.random.RandomState(seed + k)
        m = rng.randn(hi - lo, dim).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        flat = pa.array(m.reshape(-1), pa.float32())
        emb = pa.FixedSizeListArray.from_arrays(flat, dim).cast(
            pa.list_(pa.float32())
        )
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array(range(lo, hi), pa.int64()), emb],
                names=["vec_id", "embedding"],
            ),
            f"{out_dir}/part-{k:04d}.parquet",
        )
        return hi - lo

    per = (n_vecs + num_shards - 1) // num_shards
    ray.get([
        gen_shard.remote(k, k * per, min(n_vecs, (k + 1) * per))
        for k in range(num_shards)
        if k * per < n_vecs
    ])


def write_skew_corpus(
    out_dir: str,
    n_docs: int,
    head_fraction: float,
    seed: int = 42,
    num_shards: int = 64,
) -> None:
    """Write a (doc_id, text) corpus where ``head_fraction`` of rows (by
    index interleaving, so every shard carries the head key) belong to
    ONE near-dup family — the bench's skew-stress input (r3 verdict #6).
    Requires an initialized Ray session (bench.py owns one)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    mod = 1_000_000
    cut = int(head_fraction * mod)

    @ray.remote
    def gen_shard(k: int, lo: int, hi: int) -> int:
        rows_id, rows_tx = [], []
        for i in range(lo, hi):
            head = ((i * 2654435761) % mod) < cut  # index-hash interleave
            rows_id.append(f"s{i:08d}")
            rows_tx.append(_skew_doc(seed, i, head))
        pq.write_table(
            pa.Table.from_pydict(
                {"doc_id": pa.array(rows_id, pa.string()),
                 "text": pa.array(rows_tx, pa.string())}
            ),
            f"{out_dir}/part-{k:04d}.parquet",
        )
        return hi - lo

    per = (n_docs + num_shards - 1) // num_shards
    ray.get([
        gen_shard.remote(k, k * per, min(n_docs, (k + 1) * per))
        for k in range(num_shards)
        if k * per < n_docs
    ])
