"""Parsers/normalizers mirroring the reference's glue functions.

- ``parse_llm_json``       = nlp/pr_aws_nlp.py:54-67 — strip ``` fences,
  parse, require the ``entities``/``topics``/``summary`` keys, else None.
- ``lenient_json_loads``   = explorer_app.py:30-44 — tolerate trailing
  commas before ] or }.
- ``parse_expansion_lines``= utils/search_pipeline.py:29-31 — split LLM
  text by newline, strip, chop a 3-char list prefix ("1. ", "a) ", ...).
- ``preprocess_text``      = nlp/pr_local_nlp_pipeline.py:25-44 — noise
  removal, lowercase, tokenize, stopword removal, lemma-ish normalization
  (sandbox surrogate: suffix stripping instead of WordNet, no nltk here).
- ``extract_html_body``    = ingest/pr_meta_store.py:32-52 — h1 title +
  main-content div text (regex surrogate for bs4, which isn't installed).
"""

from __future__ import annotations

import json
import re

from semantic_search_system_ray.functions.text import clean_text_ingest, tokenize

_STOP = frozenset(
    "i me my we our you your he him his she her it its they them their what which "
    "who this that these those am is are was were be been being have has had do "
    "does did a an the and but if or because as until while of at by for with "
    "about against between into through during before after above below to from "
    "up down in out on off over under again further then once here there when "
    "where why how all any both each few more most other some such no nor not "
    "only own same so than too very s t can will just don should now".split()
)


def parse_llm_json(response_text: str) -> dict | None:
    """Fence-stripping strict-JSON parser; None when malformed or missing
    required keys (the reference treats that as a retryable failure)."""
    s = response_text.strip()
    if s.startswith("```"):
        s = re.sub(r"^```[a-zA-Z]*\n?", "", s)
        s = re.sub(r"\n?```$", "", s)
    try:
        data = json.loads(s)
    except (json.JSONDecodeError, TypeError):
        return None
    if not isinstance(data, dict):
        return None
    if not {"entities", "topics", "summary"} <= set(data):
        return None
    return data


def lenient_json_loads(s: str):
    """JSON load tolerating trailing commas before ] / }."""
    return json.loads(re.sub(r",\s*([\]\}])", r"\1", s))


def parse_expansion_lines(text: str) -> list[str]:
    """'1. foo\\n2. bar' → ['foo', 'bar'] (3-char prefix chop per line)."""
    out = []
    for line in text.split("\n"):
        q = line.strip()
        if len(q) > 3:
            out.append(q[3:].strip())
    return [q for q in out if q]


_SUFFIXES = ("ing", "edly", "ed", "ies", "es", "s", "ly")


def _lemma(word: str) -> str:
    for suf in _SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            base = word[: -len(suf)]
            if suf == "ies":
                base += "y"
            return base
    return word


def preprocess_text(text: str) -> str:
    """Lower, strip noise, tokenize, drop stopwords, lemma-ish normalize."""
    toks = [t.lower() for t in tokenize(clean_text_ingest(text))]
    return " ".join(_lemma(t) for t in toks if t not in _STOP)


_H1_RE = re.compile(r"<h1[^>]*>(.*?)</h1>", re.S | re.I)
_BODY_RE = re.compile(
    r'<div[^>]*class="[^"]*(?:press-release__body|page__content)[^"]*"[^>]*>(.*?)</div>',
    re.S | re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_html_body(html: str) -> dict:
    """{'title': h1 text, 'content': cleaned body-div text}. Regex
    surrogate for the bs4 path (not installed; same output contract)."""
    title_m = _H1_RE.search(html or "")
    title = _TAG_RE.sub("", title_m.group(1)).strip() if title_m else ""
    body_m = _BODY_RE.search(html or "")
    raw = _TAG_RE.sub(" ", body_m.group(1)) if body_m else ""
    return {"title": title, "content": clean_text_ingest(raw)}
