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

# output-order index for the combined-scan SVO path
_VERB_ORDER = {pred: i for i, (_v, pred) in enumerate(VERB_PREDICATES)}


class GazetteerMatcher:
    """Compiled longest-first gazetteer automaton. Build ONCE per actor
    (in ``__init__``), reuse per batch — the stateful-stage pattern.

    Case folding is ``str.lower()`` on BOTH the surfaces and the scanned
    text — one lower pass per span, then case-SENSITIVE scans, which lets
    CPython's re use its fast literal scanners (measured 1.39× over
    ``re.IGNORECASE`` scans of the original text; the two foldings differ
    only on exotic pairs like ſ/s and K/k). All char positions returned
    are coordinates in the LOWERED text; they are only ever compared with
    each other (mention vs verb order inside one span), never applied to
    the original string. (A dict-based token-k-gram automaton was
    prototyped and measured SLOWER than the compiled alternation —
    per-token Python bytecode loses to one C regex scan at this
    gazetteer size — so the regex engine is the only path.)
    """

    def __init__(self, gazetteer: dict[str, str]):
        # longest-first so the regex alternation prefers the longest surface
        # at any given start position; \b bounds avoid partial-word matches.
        surfaces = sorted(gazetteer, key=lambda s: len(s.lower()), reverse=True)
        self._pattern = re.compile(
            r"\b(?:" + "|".join(re.escape(s.lower()) for s in surfaces) + r")\b"
        )
        # canonical-case lookup: matched text (lowered) -> (surface, label)
        self._lookup = {s.lower(): (s, gazetteer[s]) for s in gazetteer}
        # Per-pattern literal searches, NOT one combined alternation, for
        # the verb extraction itself: CPython's re uses a fast literal
        # scan for single literal patterns that an alternation with
        # groups cannot. But a span with NO verb at all (the common case)
        # pays all 6 scans — so a combined alternation PREFILTER decides
        # "any verb here?" in one scan, and only a hit runs the 6.
        self._verb_patterns = [
            (re.compile(r"\b" + re.escape(v) + r"\b"), pred)
            for v, pred in VERB_PREDICATES  # verb surfaces are lowercase
        ]
        self._verb_any = re.compile(
            r"\b(?:"
            + "|".join(re.escape(v) for v, _p in VERB_PREDICATES)
            + r")\b"
        )
        # ONE combined finditer scan can replace the 6 per-verb searches
        # exactly iff no word appears in two verb surfaces: then two verb
        # matches can never overlap (both are \b-aligned whole-token
        # sequences, so overlapping char ranges would share a full token),
        # and the combined scan's non-overlapping consumption sees every
        # per-pattern first occurrence. Checked here, not assumed.
        verb_words = [w for v, _p in VERB_PREDICATES for w in v.split(" ")]
        self._verb_combined_ok = len(verb_words) == len(set(verb_words))
        self._verb_pred_of = {v: pred for v, pred in VERB_PREDICATES}

    def find_mentions(
        self, text: str, lt: str | None = None
    ) -> list[tuple[str, str, int, int]]:
        """Non-overlapping, left-to-right, longest-first matches.

        Returns [(gazetteer_surface, label, char_start, char_end)] with
        positions in lowered-text coordinates. ``lt`` lets a caller that
        also runs extract_svo lower the text ONCE for both scans.
        """
        if lt is None:
            lt = text.lower()
        out = []
        append = out.append
        lookup = self._lookup
        for m in self._pattern.finditer(lt):
            surface, label = lookup[m.group(0)]
            cs, ce = m.span()
            append((surface, label, cs, ce))
        return out

    def extract_svo(
        self, text: str, mentions: list[tuple[str, str, int, int]],
        lt: str | None = None,
    ) -> list[tuple[str, str, str]]:
        """For each verb pattern occurring in the sentence: subject = last
        mention ending at/before the verb start, object = first mention
        starting at/after the verb end. Skips patterns missing either side.
        ``lt`` = the pre-lowered text, if the caller already has it.
        """
        if not mentions:
            return []
        if lt is None:
            lt = text.lower()
        if self._verb_combined_ok:
            # one scan; first occurrence per verb (see __init__ comment)
            first: dict[str, tuple[int, int]] = {}
            for m in self._verb_any.finditer(lt):
                v = m.group(0)
                if v not in first:
                    first[v] = m.span()
            if not first:
                return []
            # emit in VERB_PREDICATES order (the per-pattern loop's order)
            hits = [
                (self._verb_pred_of[v], span) for v, span in first.items()
            ]
            hits.sort(key=lambda h: _VERB_ORDER[h[0]])
        else:
            if self._verb_any.search(lt) is None:
                return []
            hits = []
            for vp, pred in self._verb_patterns:
                m = vp.search(lt)
                if m:
                    hits.append((pred, m.span()))
        triples = []
        for pred, (ms, me) in hits:
            subj = None
            for s, _lbl, _cs, ce in mentions:
                if ce <= ms:
                    subj = s
                else:
                    break
            obj = None
            for s, _lbl, cs, _ce in mentions:
                if cs >= me:
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
    ties; label = label of the FIRST mention with that text (J4/G1).

    Hand-rolled single pass instead of Counter + heapq.nlargest: at the
    ~17-mentions-per-doc scale of the hot extract path the constant
    factors dominate. Stable ``sorted(reverse=True)`` over the
    insertion-ordered dict = exactly ``most_common`` tie semantics
    (nlargest is documented stable-equivalent to sorted[:n])."""
    counts: dict[str, int] = {}
    first_label: dict[str, str] = {}
    for s, l in ordered_mentions:
        if s in counts:
            counts[s] += 1
        else:
            counts[s] = 1
            first_label[s] = l
    top = sorted(counts.items(), key=lambda kv: kv[1], reverse=True)[:top_n]
    return [{"text": s, "label": first_label[s]} for s, _freq in top]


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
        lt = text.lower()  # lowered ONCE for both scans
        mentions = find(text, lt)
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
            svo.extend(extract(text, mentions, lt))
    return DocNLPResult(
        doc_id=doc_id,
        entities=top_n_with_first_label(ent_mentions, top_n),
        topics=top_n_with_first_label(top_mentions, top_n),
        # summary_sentences=0 = skip entirely (the flat fast path never
        # reads it; the join+slice per doc is measurable at corpus scale)
        summary="" if not summary_sentences
        else " ".join(ordered_texts[:summary_sentences])[:300],
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
