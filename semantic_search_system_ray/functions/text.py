"""Text scalar functions, byte-exact to the reference, plus vectorized
(pyarrow.compute) equivalents used inside ``map_batches`` hot paths.

Reference parity (file:line cites into /root/reference):
- ``clean_text_ingest``  = ingest/pr_meta_store.py:26-29
  (strip non-alnum-non-space, collapse whitespace, strip).
- ``clean_text_topic``   = nlp/topic_modeling.py:13-18
  (lowercase, keep ``\\w\\s-``, collapse whitespace, strip; non-str → "").
- ``clean_text_chat``    = app.py:16-18 (whitespace collapse only).
- ``normalize_key``      = knowledge_graph/knowledge_graph.py:51-55
  (str(), strip, lower) — the join key normalizer for ALL taxonomy joins.
- ``normalize_date``     = ingest/pr_meta_fetch.py:55-59
  ("%B %d, %Y" → "%Y-%m-%d", pass-through on failure).

The Python scalars are the spec (used by the single-process oracle and unit
tests); the ``arrow_*`` functions are the engine's vectorized versions and
must agree element-wise with the scalars.
"""

from __future__ import annotations

import re
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

_RE_NON_ALNUM = re.compile(r"[^a-zA-Z0-9\s]")
_RE_WS = re.compile(r"\s+")
_RE_NON_WORD = re.compile(r"[^\w\s-]")
_RE_SENT = re.compile(r"(?<=[.!?])\s+")
_RE_TOKEN = re.compile(r"\w+(?:'\w+)?", re.UNICODE)


def clean_text_ingest(text: str) -> str:
    """Reference ingest cleaner (ingest/pr_meta_store.py:26-29)."""
    text = _RE_NON_ALNUM.sub("", text)
    text = _RE_WS.sub(" ", text).strip()
    return text


def clean_text_topic(text) -> str:
    """Reference topic cleaner (nlp/topic_modeling.py:13-18)."""
    if not isinstance(text, str):
        return ""
    text = text.lower()
    text = _RE_NON_WORD.sub("", text)
    text = _RE_WS.sub(" ", text).strip()
    return text


def clean_text_chat(text: str) -> str:
    """Reference chat cleaner (app.py:16-18): whitespace collapse only."""
    return _RE_WS.sub(" ", text).strip()


def normalize_key(key_string) -> str:
    """Reference join-key normalizer (knowledge_graph/knowledge_graph.py:51-55)."""
    if not isinstance(key_string, str):
        key_string = str(key_string)
    return key_string.strip().lower()


def normalize_date(date_str: str) -> str:
    """Reference date normalizer (ingest/pr_meta_fetch.py:55-59)."""
    try:
        return datetime.strptime(date_str, "%B %d, %Y").strftime("%Y-%m-%d")
    except (ValueError, TypeError):
        return date_str


def tokenize(text: str) -> list[str]:
    """Regex word tokenizer (sandbox surrogate for nltk word_tokenize,
    nlp/pr_local_nlp_pipeline.py:25-44 — no nltk in this environment)."""
    return _RE_TOKEN.findall(text)


def sentence_split(text: str) -> list[str]:
    """Split on sentence-final punctuation + whitespace; drops empties."""
    return [s for s in (p.strip() for p in _RE_SENT.split(text)) if s]


# ---------------------------------------------------------------------------
# Vectorized Arrow equivalents (zero-copy hot path)
# ---------------------------------------------------------------------------

# Python's unicode \s = Unicode Whitespace = \p{Z} separators plus the
# ASCII controls and the C0 file/group/record/unit separators \x1c-\x1f
# and NEL \x85. RE2's \s is ASCII-only; spell the full class out so the
# Arrow kernels agree with the Python spec (property-tested).
_RE2_WS = r"\s\p{Z}\x0b\x1c-\x1f\x85"


def arrow_clean_text_ingest(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized clean_text_ingest; agrees element-wise with the scalar
    (property-tested; see _RE2_WS for the whitespace-class parity note)."""
    out = pc.replace_substring_regex(
        arr, pattern=rf"[^a-zA-Z0-9{_RE2_WS}]", replacement=""
    )
    out = pc.replace_substring_regex(out, pattern=rf"[{_RE2_WS}]+", replacement=" ")
    return pc.utf8_trim_whitespace(out)


def arrow_clean_text_topic(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized clean_text_topic (nulls → ""), agrees with the scalar.

    Python ``re`` treats ``\\w`` as unicode; Arrow's RE2 treats it as ASCII,
    so the RE2 pattern spells it out as ``\\p{L}\\p{N}_`` (unicode letters,
    digits, underscore). Parity is property-tested for codepoints below
    U+20000; above that RE2's older Unicode tables may classify new CJK
    extension characters differently from CPython — irrelevant to the
    corpus and the DuckDB oracle (also RE2).

    Known lowercase divergence (SpecialCasing.txt): CPython implements
    full case mapping — Σ→ς in Final_Sigma position, İ→'i\\u0307' —
    while Arrow's ``utf8_lower`` (and DuckDB's ``lower``) use the simple
    per-codepoint map (Σ→σ, İ→i̇ single-step). The vectorized functions
    follow the simple map; affects only those two codepoints.
    """
    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(
        out, pattern=rf"[^\p{{L}}\p{{N}}_{_RE2_WS}-]", replacement=""
    )
    out = pc.replace_substring_regex(out, pattern=rf"[{_RE2_WS}]+", replacement=" ")
    out = pc.utf8_trim_whitespace(out)
    return pc.fill_null(out, "")


def arrow_normalize_key(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalize_key: strip + lower."""
    return pc.utf8_lower(pc.utf8_trim_whitespace(arr))
