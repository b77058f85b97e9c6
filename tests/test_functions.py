"""Unit tests for the scalar/vectorized function layer (SURVEY §5 item 1):
clean_text variants byte-exact vs the reference regexes, normalize_key,
Counter.most_common tie semantics, min-max normalization incl. every
degenerate branch, hashing determinism, canonicalization spec."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from semantic_search_system_ray.functions import (
    arrow_clean_text_ingest,
    arrow_clean_text_topic,
    arrow_minmax_normalize_100,
    arrow_normalize_key,
    clean_text_chat,
    clean_text_ingest,
    clean_text_topic,
    content_doc_id,
    hash_embed,
    hash_embed_many,
    minhash_signature,
    normalize_date,
    normalize_key,
    normalize_scores_to_100,
    simhash64,
)
from semantic_search_system_ray.functions.canon_spec import (
    blocking_keys,
    canonicalize_exact,
    norm_surface,
)
from semantic_search_system_ray.functions.extraction import (
    GazetteerMatcher,
    top_n_with_first_label,
)

DIRTY = [
    "Hello, World! 123",
    "  spaced\t\tout\n\nlines  ",
    "semi-colons; and—dashes… ünïcode",
    "",
    "already clean text",
    "a.b.c...d",
    "CAPS and Mixed Case-Words",
]


def _ref_clean_ingest(text):  # literal reference regexes (pr_meta_store.py:26-29)
    text = re.sub(r"[^a-zA-Z0-9\s]", "", text)
    return re.sub(r"\s+", " ", text).strip()


def _ref_clean_topic(text):  # nlp/topic_modeling.py:13-18
    if not isinstance(text, str):
        return ""
    text = text.lower()
    text = re.sub(r"[^\w\s-]", "", text)
    return re.sub(r"\s+", " ", text).strip()


def test_clean_text_ingest_matches_reference():
    for t in DIRTY:
        assert clean_text_ingest(t) == _ref_clean_ingest(t)


def test_clean_text_topic_matches_reference():
    for t in DIRTY + [None, 42]:
        assert clean_text_topic(t) == _ref_clean_topic(t)


def test_clean_text_chat():
    assert clean_text_chat("  a \n b\t c ") == "a b c"


def test_arrow_clean_parity():
    arr = pa.array(DIRTY)
    assert arrow_clean_text_ingest(arr).to_pylist() == [clean_text_ingest(t) for t in DIRTY]
    assert arrow_clean_text_topic(arr).to_pylist() == [clean_text_topic(t) for t in DIRTY]


def test_normalize_key():
    assert normalize_key("  Clean Energy ") == "clean energy"
    assert normalize_key(42) == "42"
    arr = pa.array(["  Clean Energy ", "FOO", "bar "])
    assert arrow_normalize_key(arr).to_pylist() == ["clean energy", "foo", "bar"]


def test_normalize_date():
    assert normalize_date("March 5, 2021") == "2021-03-05"
    assert normalize_date("not a date") == "not a date"
    assert normalize_date(None) is None


# --- score normalization: every degenerate branch of search_pipeline.py:34-64


def test_normalize_scores_empty():
    assert normalize_scores_to_100([]) == []


def test_normalize_scores_no_numeric():
    res = normalize_scores_to_100([{"score": "x"}, {}])
    assert [r["normalized_score_100"] for r in res] == [1.0, 1.0]


def test_normalize_scores_all_equal_positive():
    res = normalize_scores_to_100([{"score": 3.0}, {"score": 3.0}])
    assert [r["normalized_score_100"] for r in res] == [100.0, 100.0]


def test_normalize_scores_all_equal_nonpositive():
    res = normalize_scores_to_100([{"score": 0.0}, {"score": 0.0}])
    assert [r["normalized_score_100"] for r in res] == [1.0, 1.0]


def test_normalize_scores_range_and_clamp():
    res = normalize_scores_to_100([{"score": 0.0}, {"score": 5.0}, {"score": 10.0}, {"score": "bad"}])
    vals = [r["normalized_score_100"] for r in res]
    assert vals[0] == 1.0 and vals[2] == 100.0 and vals[3] == 1.0
    assert abs(vals[1] - 50.5) < 1e-9


def test_arrow_minmax_parity():
    scores = [0.0, 5.0, 10.0, None]
    got = arrow_minmax_normalize_100(pa.array(scores, pa.float64())).to_pylist()
    ref = normalize_scores_to_100([{"score": s} if s is not None else {} for s in scores])
    assert got == pytest.approx([r["normalized_score_100"] for r in ref])


def test_arrow_minmax_degenerate():
    assert arrow_minmax_normalize_100(pa.array([2.0, 2.0])).to_pylist() == [100.0, 100.0]
    assert arrow_minmax_normalize_100(pa.array([-1.0, -1.0])).to_pylist() == [1.0, 1.0]
    assert arrow_minmax_normalize_100(pa.array([], pa.float64())).to_pylist() == []


# --- embeddings / hashing


def test_hash_embed_deterministic_normalized():
    v1, v2 = hash_embed("clean energy"), hash_embed("clean energy")
    assert np.array_equal(v1, v2)
    assert v1.shape == (256,) and v1.dtype == np.float32
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    assert np.linalg.norm(hash_embed("")) == 0.0
    m = hash_embed_many(["a b", "c d"])
    assert m.shape == (2, 256)


def test_minhash_similarity_ordering():
    a = {"the cat sat", "cat sat on", "sat on mat"}
    b = {"the cat sat", "cat sat on", "sat on rug"}
    c = {"totally different", "shingle set", "no overlap"}
    sa, sb, sc = (minhash_signature(x, 128) for x in (a, b, c))
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.4 > sim_ac


def test_simhash_and_content_id():
    assert simhash64(["a", "b", "c"]) == simhash64(["a", "b", "c"])
    assert content_doc_id("x") == content_doc_id("x")
    assert content_doc_id("x") != content_doc_id("y")


# --- top-N tie semantics vs Counter.most_common (crafted ties)


def test_top5_tie_breaking_first_occurrence():
    mentions = [("B", "ORG"), ("A", "PERSON"), ("A", "GPE"), ("C", "ORG"),
                ("B", "ORG"), ("C", "ORG"), ("D", "PERSON")]
    got = top_n_with_first_label(mentions, 3)
    # counts: B=2, A=2, C=2, D=1 → ties by insertion order: B, A, C
    ref = Counter(m[0] for m in mentions).most_common(3)
    assert [g["text"] for g in got] == [r[0] for r in ref] == ["B", "A", "C"]
    # label of A = label of FIRST mention (PERSON, not GPE) — J4 semantics
    assert got[1]["label"] == "PERSON"


def test_gazetteer_longest_first_and_bounds():
    m = GazetteerMatcher({"John Larson": "PERSON", "John B Larson": "PERSON",
                          "Hartford": "GPE", "art": "ORG"})
    found = m.find_mentions("John B Larson visited Hartford.")
    assert found[0][0] == "John B Larson"          # longest wins
    assert ("Hartford", "GPE") in [(s, l) for s, l, _a, _b in found]
    assert all(s != "art" for s, _l, _a, _b in found)  # \b bound: no partial


def test_svo_extraction():
    gaz = {"John Larson": "PERSON", "Hartford Council": "ORG", "clean energy": "TOPIC"}
    m = GazetteerMatcher(gaz)
    text = "John Larson praised Hartford Council for its work on clean energy."
    mentions = m.find_mentions(text)
    assert ("John Larson", "PRAISED", "Hartford Council") in m.extract_svo(text, mentions)


# --- canonicalization spec


def test_canon_head_entity_variants():
    surfaces = ["John B Larson", "John B. Larson", "John Larson", "Hartford",
                "Maria Gonzalez", "Maria C. Gonzalez"]
    canon = canonicalize_exact(surfaces)
    assert canon["John B Larson"] == canon["John B. Larson"] == canon["John Larson"]
    assert canon["John B Larson"] == "john b larson"  # lexicographic min member
    assert canon["Maria Gonzalez"] == canon["Maria C. Gonzalez"]
    assert canon["Hartford"] == "hartford"


def test_canon_no_overmerge():
    canon = canonicalize_exact(["john", "john larson", "health care", "health care reform"])
    assert canon["john"] != canon["john larson"]
    assert canon["health care"] != canon["health care reform"]


def test_blocking_keys():
    assert blocking_keys("john b larson") == ["F:john", "L:larson"]
    assert blocking_keys("hartford") == ["F:hartford"]
    assert norm_surface("John B. Larson") == "john b larson"


def test_rag_ingest_kernel_parity():
    """The vectorized RE2 extraction kernel (pipelines/queries
    .extract_html_kernel) must match the per-row reference surrogate
    (functions/parsing.extract_html_body + clean_text_ingest) on both
    div classes, missing sections, nested tags and multiline bodies."""
    import pyarrow as pa

    from semantic_search_system_ray.functions.parsing import extract_html_body
    from semantic_search_system_ray.functions.text import clean_text_ingest
    from semantic_search_system_ray.pipelines.queries import extract_html_kernel

    htmls = [
        '<html><h1>T One</h1><div class="press-release__body">Body, text! '
        "here</div></html>",
        '<html><h1 id="x">T <b>Two</b></h1><div class="a page__content b">'
        "Line1\nLine2  <span>tag</span> end</div></html>",
        "<html><h1>No body</h1><p>nothing else</p></html>",
        '<html><div class="press-release__body">no title &amp; extras'
        "</div></html>",
        "<html><p>neither</p></html>",
        '<HTML><H1>Upper</H1><DIV CLASS="press-release__body">CASE</DIV>'
        "</HTML>",
    ]
    title, content = extract_html_kernel(pa.array(htmls, pa.string()))
    for h, t_got, c_got in zip(htmls, title.to_pylist(), content.to_pylist()):
        ref = extract_html_body(h)
        assert t_got == ref["title"], h
        assert c_got == ref["content"], h
