"""§2.10 extension-surface tests: taxonomy CRUD semantics (reference
explorer_app.py:113-232 parity), incremental KG refresh after an edit, and
the search strategy registry."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.state.taxonomy import Taxonomy, TaxonomyEditError


def _tax() -> Taxonomy:
    return Taxonomy(topics={"joins": ["hash join", "sort merge"],
                            "scans": ["table scan"]})


def test_topic_crud_semantics():
    t = _tax()
    assert t.add_topic("windows") is True
    assert t.add_topic("windows") is False           # duplicate → warning/no-op
    with pytest.raises(TaxonomyEditError):
        t.add_topic("")
    with pytest.raises(TaxonomyEditError):
        t.rename_topic("joins", "scans")             # collision → error
    t.flag_mismatch("joins", "hash join")
    t.rename_topic("joins", "merges")
    assert "merges" in t.topics and "joins" not in t.topics
    assert ("merges", "hash join") in t.mismatches   # flags follow rename
    assert t.delete_topic("merges") == 2
    assert not t.mismatches                          # flags die with the topic


def test_phrase_crud_semantics():
    t = _tax()
    assert t.add_phrase("joins", "  nested loop  ") is True
    assert t.topics["joins"] == ["hash join", "nested loop", "sort merge"]  # sorted
    assert t.add_phrase("joins", "nested loop") is False
    t.flag_mismatch("joins", "nested loop")
    t.move_phrase("nested loop", "joins", "loops")   # creates target on demand
    assert t.topics["loops"] == ["nested loop"]
    assert ("joins", "nested loop") not in t.mismatches  # move clears the flag
    assert t.delete_phrase("scans", "table scan") is True
    assert t.delete_phrase("scans", "table scan") is False


def test_table_round_trip_and_summary():
    t = _tax()
    t.add_topic("empty")
    tbl = t.to_table()
    back = Taxonomy.from_table(tbl)
    assert back.topics == t.topics                   # empty topics survive
    summary = t.summary_table().to_pydict()
    assert summary["broad_topic"] == ["empty", "joins", "scans"]
    assert summary["phrase_count"] == [0, 2, 1]


def test_refresh_taxonomy_incremental(ray_session, small_corpus, tmp_path):
    """A CRUD edit → refresh_taxonomy recomputes ONLY the taxonomy branches:
    doc-extracted triples are byte-identical, IN_TOPIC reflects the edit."""
    from semantic_search_system_ray.pipelines.runner import refresh_taxonomy, run_kg
    from semantic_search_system_ray.functions.text import normalize_key

    corpus_dir = tmp_path / "corpus"
    small_corpus.write(str(corpus_dir), num_doc_files=2)
    out = str(tmp_path / "kg")
    res = run_kg(
        f"{corpus_dir}/documents", small_corpus.taxonomy,
        rd.from_arrow(small_corpus.phrase_docs), small_corpus.gazetteer, out,
        num_parts=2, concurrency=2, batch_size=64,
    )
    before = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}

    tax = Taxonomy.from_table(small_corpus.taxonomy)
    tax.add_topic("brand new topic")
    tax.add_phrase("brand new topic", "zzz novel phrase")
    refreshed = refresh_taxonomy(
        tax.to_table(), rd.from_arrow(small_corpus.phrase_docs), out
    )
    after = {(r["subj"], r["pred"], r["obj"]) for r in refreshed.take_all()}

    doc_preds = {"MENTIONS", "HAS_TOPIC"}
    assert {t for t in before if t[1] in doc_preds} == {
        t for t in after if t[1] in doc_preds
    }  # extraction untouched
    assert (
        normalize_key("zzz novel phrase"), "IN_TOPIC", normalize_key("brand new topic")
    ) in after
    delta = after - before
    assert delta and all(t[1] in {"IN_TOPIC", "RELATES_TO_DOC"} for t in delta)


def test_resume_plan_mismatch_raises(ray_session, small_corpus, tmp_path):
    from semantic_search_system_ray.pipelines.runner import run_phase_a

    corpus_dir = tmp_path / "corpus"
    small_corpus.write(str(corpus_dir), num_doc_files=4)
    out = str(tmp_path / "kg")
    run_phase_a(f"{corpus_dir}/documents", small_corpus.gazetteer, out,
                num_parts=4, max_parts=2)
    with pytest.raises(RuntimeError, match="resume plan mismatch"):
        run_phase_a(f"{corpus_dir}/documents", small_corpus.gazetteer, out,
                    num_parts=2)  # different plan → must refuse


def test_strategy_registry(ray_session):
    from semantic_search_system_ray.pipelines.search import STRATEGY_REGISTRY, run_search

    docs = rd.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": ["a", "b", "c"],
             "text": ["hash join wins", "table scan loses", "nothing relevant"]}
        )
    )
    assert set(STRATEGY_REGISTRY) == {"lexical", "vector", "hybrid", "expanded", "reranked"}
    got = run_search("lexical", docs, None, "hash join", k=2).take_all()
    assert got[0]["doc_id"] == "a"
    rer = run_search("reranked", docs, None, "table scan", k=1).take_all()
    assert rer[0]["doc_id"] == "b" and "rerank_score" in rer[0]
    with pytest.raises(ValueError, match="unknown search mode"):
        run_search("Pro", docs, None, "x")


def test_json_source_sink_round_trip(ray_session, tmp_path):
    """S4/S5: record-array JSON source, JSONL sink, taxonomy dict JSON."""
    import json

    from semantic_search_system_ray.sources.jsonio import (
        load_taxonomy_json,
        read_json_records,
        save_taxonomy_json,
        write_json_records,
    )

    # reference press_releases.json shape: top-level array of dicts
    arr_path = tmp_path / "records.json"
    records = [{"url": f"u{i}", "title": f"t{i}"} for i in range(5)]
    arr_path.write_text(json.dumps(records, indent=2))
    ds = read_json_records(str(arr_path))
    assert sorted(r["url"] for r in ds.take_all()) == [f"u{i}" for i in range(5)]

    # JSONL sink → re-read through the streaming path
    out = tmp_path / "out"
    write_json_records(ds, str(out))
    back = read_json_records(str(out))
    assert back.count() == 5

    # taxonomy dict shape round-trip with save normalization
    tax_path = tmp_path / "topics.json"
    tax_path.write_text(json.dumps({"joins": ["sort merge", "hash join", "hash join"]}))
    tax = load_taxonomy_json(str(tax_path))
    assert tax.topics == {"joins": ["hash join", "sort merge"]}  # dedup + sort
    tax.add_phrase("joins", "nested loop")
    save_taxonomy_json(tax, str(tax_path))
    assert load_taxonomy_json(str(tax_path)).topics["joins"] == [
        "hash join", "nested loop", "sort merge"
    ]
