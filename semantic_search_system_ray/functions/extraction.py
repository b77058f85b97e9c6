"""Per-document NLP extraction kernel: gazetteer mention detection,
OpenIE-style SVO triple extraction, top-5 entity/topic selection.

This module is the *semantic spec* — pure per-document Python shared by both
the distributed Ray stages (which call it on doc-local data inside actor
pools) and the literal single-process oracle (pipelines/oracle.py). The
distributed/oracle comparison then validates orchestration: ordering under
parallelism, shuffles, joins, dedup — the parts a cluster can get wrong.

Reference parity:
- mention detection = sandbox surrogate for spaCy NER
  (nlp/pr_local_nlp_pipeline.py:19,70-93 — spaCy not installed, no network):
  longest-first, left-to-right, non-overlapping gazetteer matching with
  word boundaries, case-insensitive.
- top-5 entities by frequency with ``Counter.most_common`` tie semantics —
  ties broken by FIRST-OCCURRENCE order (Counter preserves insertion order;
  nlp/pr_local_nlp_pipeline.py:75-81).
- entity label = label of the FIRST mention in the doc with that text
  (``[ent.label_ for ent in doc.ents if ent.text == entity][0]``,
  nlp/pr_local_nlp_pipeline.py:84-91).
- ≤5 entities + ≤5 topics + short summary per doc = the results.json
  contract (nlp/pr_aws_nlp.py:17-35,70-81).
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass

# verb surface → predicate (targets sources/synth.py SVO_TEMPLATES)
VERB_PREDICATES = [
    ("met with", "MET_WITH"),
    ("announced", "ANNOUNCED"),
    ("visited", "VISITED"),
    ("joined", "JOINED"),
    ("introduced the", "INTRODUCED"),
    ("praised", "PRAISED"),
]

ENTITY_LABELS = frozenset({"PERSON", "ORG", "GPE"})


class GazetteerMatcher:
    """Compiled longest-first gazetteer automaton. Build ONCE per actor
    (in ``__init__``), reuse per batch — the stateful-stage pattern."""

    def __init__(self, gazetteer: dict[str, str]):
        # longest-first so the regex alternation prefers the longest surface
        # at any given start position; \b bounds avoid partial-word matches.
        surfaces = sorted(gazetteer, key=len, reverse=True)
        self._pattern = re.compile(
            r"\b(?:" + "|".join(re.escape(s) for s in surfaces) + r")\b",
            re.IGNORECASE,
        )
        # canonical-case lookup: matched text (lowered) -> (surface, label)
        self._lookup = {s.lower(): (s, gazetteer[s]) for s in gazetteer}
        # Deliberately per-pattern literal searches, NOT one combined
        # alternation: measured 0.41 vs 0.53 ms/doc — CPython's re uses a
        # fast literal-prefix scan for single literal patterns that an
        # alternation with groups cannot, so 6 fast scans beat 1 slow one.
        self._verb_patterns = [
            (re.compile(r"\b" + re.escape(v) + r"\b", re.IGNORECASE), pred)
            for v, pred in VERB_PREDICATES
        ]

    def find_mentions(self, text: str) -> list[tuple[str, str, int, int]]:
        """Non-overlapping, left-to-right matches.

        Returns [(gazetteer_surface, label, char_start, char_end)].
        """
        out = []
        for m in self._pattern.finditer(text):
            surface, label = self._lookup[m.group(0).lower()]
            out.append((surface, label, m.start(), m.end()))
        return out

    def extract_svo(
        self, text: str, mentions: list[tuple[str, str, int, int]]
    ) -> list[tuple[str, str, str]]:
        """For each verb pattern occurring in the sentence: subject = last
        mention ending at/before the verb start, object = first mention
        starting at/after the verb end. Skips patterns missing either side.
        """
        if not mentions:
            return []
        triples = []
        for vp, pred in self._verb_patterns:
            m = vp.search(text)
            if not m:
                continue
            subj = None
            for s, _lbl, _cs, ce in mentions:
                if ce <= m.start():
                    subj = s
                else:
                    break
            obj = None
            for s, _lbl, cs, _ce in mentions:
                if cs >= m.end():
                    obj = s
                    break
            if subj is not None and obj is not None and subj != obj:
                triples.append((subj, pred, obj))
        return triples


@dataclass
class DocNLPResult:
    doc_id: str
    entities: list[dict]           # [{"text": surface, "label": label}] ≤5
    topics: list[dict]             # [{"text": phrase, "label": "TOPIC"}] ≤5
    summary: str
    svo: list[tuple[str, str, str]]
    mention_surfaces: list[str]    # all distinct surfaces seen (for canon)


def top_n_with_first_label(
    ordered_mentions: list[tuple[str, str]], top_n: int = 5
) -> list[dict]:
    """``Counter.most_common(top_n)`` over surfaces with insertion-order
    ties; label = label of the FIRST mention with that text (J4/G1)."""
    counter: Counter[str] = Counter(s for s, _l in ordered_mentions)
    first_label: dict[str, str] = {}
    for s, l in ordered_mentions:
        if s not in first_label:
            first_label[s] = l
    return [
        {"text": s, "label": first_label[s]}
        for s, _freq in counter.most_common(top_n)
    ]


def process_text_spans(
    doc_id: str,
    ordered_texts: list[str],
    matcher: GazetteerMatcher,
    top_n: int = 5,
    summary_sentences: int = 2,
) -> DocNLPResult:
    """Per-doc NLP over the doc's TEXT spans already sorted by offset.

    The semantic core shared by ``process_document`` (dict-span API, used
    by the oracle and enriched mode) and the flat fast path (which feeds
    plain string lists straight from flattened Arrow arrays — media spans
    carry no text and do not contribute)."""
    ent_mentions: list[tuple[str, str]] = []
    top_mentions: list[tuple[str, str]] = []
    svo: list[tuple[str, str, str]] = []
    surfaces: list[str] = []
    seen_surface: set[str] = set()
    find = matcher.find_mentions
    extract = matcher.extract_svo
    for text in ordered_texts:
        mentions = find(text)
        if mentions:
            for m in mentions:
                s, l = m[0], m[1]
                if l in ENTITY_LABELS:
                    ent_mentions.append((s, l))
                elif l == "TOPIC":
                    top_mentions.append((s, l))
                if s not in seen_surface:
                    seen_surface.add(s)
                    surfaces.append(s)
            svo.extend(extract(text, mentions))
    return DocNLPResult(
        doc_id=doc_id,
        entities=top_n_with_first_label(ent_mentions, top_n),
        topics=top_n_with_first_label(top_mentions, top_n),
        summary=" ".join(ordered_texts[:summary_sentences])[:300],
        svo=svo,
        mention_surfaces=surfaces,
    )


def process_document(
    doc_id: str,
    spans: list[dict],
    matcher: GazetteerMatcher,
    top_n: int = 5,
    summary_sentences: int = 2,
) -> DocNLPResult:
    """Full per-doc NLP over the ordered span sequence.

    Spans are processed in offset order (the row's span-sequence order — the
    per-row invariant); mention order within a span is char order. This
    fixes the first-occurrence tie semantics deterministically regardless of
    which Ray block/batch the doc lands in.
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    texts = [s["text"] for s in ordered if s["kind"] == "text" and s["text"]]
    return process_text_spans(doc_id, texts, matcher, top_n, summary_sentences)
