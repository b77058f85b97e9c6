"""Resume/checkpoint tests (SURVEY §5 item 5): kill after k partitions
commit, rerun, assert no duplicated/lost triples and lineage counters add
up; rerun idempotence (checksums identical)."""

from __future__ import annotations

import pytest

import ray.data as rd

from semantic_search_system_ray.pipelines.oracle import oracle_triples
from semantic_search_system_ray.pipelines.runner import (
    plan_partitions,
    run_kg,
    run_phase_a,
    run_phase_b,
)
from semantic_search_system_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def sharded_corpus(tmp_path_factory, small_corpus):
    d = tmp_path_factory.mktemp("corpus")
    small_corpus.write(str(d), num_doc_files=4)
    return str(d)


def test_plan_partitions_deterministic(sharded_corpus):
    p1 = plan_partitions(f"{sharded_corpus}/documents", 4)
    p2 = plan_partitions(f"{sharded_corpus}/documents", 4)
    assert p1 == p2 and len(p1) == 4
    assert plan_partitions(f"{sharded_corpus}/documents", 99)  # clamps to #files


def test_crash_resume_no_dup_no_loss(ray_session, small_corpus, sharded_corpus, tmp_path):
    out = str(tmp_path / "kg")
    # simulated crash: only 2 of 4 partitions commit
    m = run_phase_a(
        f"{sharded_corpus}/documents", small_corpus.gazetteer, out,
        num_parts=4, concurrency=2, batch_size=64, max_parts=2,
    )
    assert len(m.committed("raw_triples")) == 2
    with pytest.raises(RuntimeError):
        # Phase B on a partial Phase A works by design (it reads committed
        # parts) — but an EMPTY manifest must refuse:
        run_phase_b(small_corpus.taxonomy, rd.from_arrow(small_corpus.phrase_docs),
                    str(tmp_path / "empty"))

    # resume: full run picks up the remaining 2 partitions only
    res = run_kg(
        f"{sharded_corpus}/documents", small_corpus.taxonomy,
        rd.from_arrow(small_corpus.phrase_docs), small_corpus.gazetteer, out,
        num_parts=4, concurrency=2, batch_size=64,
    )
    m2 = Manifest(out)
    assert len(m2.committed("raw_triples")) == 4

    engine = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    golden = oracle_triples(
        small_corpus.documents, small_corpus.taxonomy,
        small_corpus.phrase_docs, small_corpus.gazetteer,
    )
    assert engine == golden  # resume lost nothing and duplicated nothing

    # lineage counters add up: triples rows_in == sum of partition rows_out
    totals = m2.totals("raw_triples")
    assert totals["partitions"] == 4
    assert totals["rows_in"] == small_corpus.documents.num_rows
    rec = m2.record("triples", 0)
    assert rec.rows_in == totals["rows_out"]
    assert rec.rows_out == len(engine)


def test_rerun_idempotent(ray_session, small_corpus, sharded_corpus, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (out1, out2):
        run_kg(
            f"{sharded_corpus}/documents", small_corpus.taxonomy,
            rd.from_arrow(small_corpus.phrase_docs), small_corpus.gazetteer, out,
            num_parts=2, concurrency=2, batch_size=64,
        )
    r1, r2 = Manifest(out1).record("triples", 0), Manifest(out2).record("triples", 0)
    assert r1.checksum == r2.checksum and r1.rows_out == r2.rows_out
