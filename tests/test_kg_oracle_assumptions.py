"""The kg_triples DuckDB oracle (text_oracles.sql_kg_triples) collapses
three engine behaviors to closed forms that hold ONLY under documented
corpus/gazetteer properties. These tests pin those properties so silent
drift (new testdata, edited gazetteer) breaks HERE, not at the driver's
hash gate."""

from __future__ import annotations

import os
import re

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corpus_is_clean_word_soup(sf_dir):
    """No sentence punctuation (single-span/12-word-chunk layout), single
    spaces, lowercase a-z only — the oracle's tokenization contract."""
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    bad = re.compile(r"[^a-z ]|  | $|^ ")
    for t in texts.column("text").to_pylist():
        # non-empty matters too: empty docs take engine-only code paths
        # (no spans, all-max minhash sig) that the oracles special-case
        assert t, f"empty text in {sf_dir}"
        assert not bad.search(t), f"dirty text in {sf_dir}"


def test_no_svo_verb_surfaces_in_corpus():
    """The oracle emits no SVO triples; valid only while no verb pattern
    can fire (its first word is absent from the corpus vocabulary)."""
    from semantic_search_system_ray.functions.extraction import VERB_PREDICATES

    first_words = {v.split()[0] for v, _ in VERB_PREDICATES}
    for sf_dir in SF_DIRS:
        texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        vocab = set()
        for t in texts.column("text").to_pylist():
            vocab.update(t.split())
        assert not (vocab & first_words)


def test_driver_gazetteer_canon_is_identity():
    """The oracle omits union-find; valid only while every driver
    gazetteer surface canonicalizes to itself."""
    import __ray_entry__ as e
    from semantic_search_system_ray.functions.canon_spec import canonicalize_exact

    surfaces = sorted(e.TESTDATA_GAZETTEER)
    assert canonicalize_exact(surfaces) == {s: s for s in surfaces}


def test_phrase_docs_fixture_contract(ray_session):
    """The deterministic phrase→docs fixture: doc-contiguous blocks
    (distinct_doc_partitioned's layout contract), the mod-5 rule, and the
    out-of-taxonomy phrase dropping through the inner join."""
    import __ray_entry__ as e
    from semantic_search_system_ray.pipelines.kg_build import (
        relates_to_doc_triples,
        taxonomy_triples,
    )

    sf = SF_DIRS[0]
    pd_ds = e._testdata_phrase_docs(sf)
    rows = pd_ds.take_all()
    assert rows, "fixture must be non-empty (was the r1/r2 empty table)"
    # mod-5 rule + doc-contiguity within the single produced block
    idx = {p: i for i, p in enumerate(e.TESTDATA_PHRASE_LIST)}
    seen_docs, last = set(), None
    for r in rows:
        assert int(r["doc_id"]) % 5 == idx[r["phrase"]] % 5
        if r["doc_id"] != last:
            assert r["doc_id"] not in seen_docs, "doc rows not contiguous"
            seen_docs.add(r["doc_id"])
            last = r["doc_id"]

    _tbl, phrase_to_topic = taxonomy_triples(e._testdata_taxonomy_table())
    rel = relates_to_doc_triples(pd_ds, phrase_to_topic).take_all()
    assert rel and all(r["pred"] == "RELATES_TO_DOC" for r in rel)
    # 'missing phrase' (not in taxonomy) must not leak through
    topics = {r["subj"] for r in rel}
    assert topics <= {"joins", "scans", "exec"}
