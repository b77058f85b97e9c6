"""finalize_triples canonicalization regimes (round-2 verdict item 1):
the three scale-switched paths — driver union-find (1), distributed CC +
non-identity broadcast (2), fully distributed join application (3) —
must produce IDENTICAL triples. Thresholds are forced per regime."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.pipelines.kg_build import (
    FLAT_SCHEMA,
    finalize_triples,
)

# Surfaces with real merge structure (reference results.json motivates the
# Larson variants: /root/reference golden output); plus case-only variants
# and loner surfaces that stay identity.
_SURFACES = [
    "John B Larson", "John Larson", "John B. Larson",
    "Acme Corp", "acme corp",
    "widget",  # identity (already normalized)
]


def _flat_table() -> pa.Table:
    rows = []
    # surface rows
    for s in _SURFACES:
        rows.append(("S", s, "", ""))
    # doc-keyed rows, doc-contiguous (sorted by doc)
    rows += [
        ("T", "doc1", "MENTIONS", "John B Larson"),
        ("T", "doc1", "MENTIONS", "John Larson"),      # collapses with prev
        ("T", "doc1", "HAS_TOPIC", "economy"),
        ("T", "doc2", "MENTIONS", "Acme Corp"),
        ("T", "doc2", "MENTIONS", "acme corp"),        # collapses with prev
        ("T", "doc2", "MENTIONS", "widget"),
        ("T", "doc3", "MENTIONS", "John B. Larson"),
        ("T", "doc3", "HAS_TOPIC", "economy"),
    ]
    # SVO rows (vocab-bounded class): both endpoints canon-mapped
    rows += [
        ("T", "John Larson", "MET_WITH", "Acme Corp"),
        ("T", "John B Larson", "MET_WITH", "acme corp"),  # same post-canon
        ("T", "widget", "ANNOUNCED", "John B. Larson"),
    ]
    return pa.Table.from_pydict(
        {
            "rowkind": [r[0] for r in rows],
            "subj": [r[1] for r in rows],
            "pred": [r[2] for r in rows],
            "obj": [r[3] for r in rows],
        },
        schema=FLAT_SCHEMA,
    )


def _run(threshold: int) -> tuple[set, object]:
    flat = rd.from_arrow(_flat_table())
    triples, canon = finalize_triples(flat, canon_driver_threshold=threshold)
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in triples.take_all()
    }
    return got, canon


EXPECTED = {
    ("doc1", "MENTIONS", "john b larson"),
    ("doc1", "HAS_TOPIC", "economy"),
    ("doc2", "MENTIONS", "acme corp"),
    ("doc2", "MENTIONS", "widget"),
    ("doc3", "MENTIONS", "john b larson"),
    ("doc3", "HAS_TOPIC", "economy"),
    ("john b larson", "MET_WITH", "acme corp"),
    ("widget", "ANNOUNCED", "john b larson"),
}


def test_regime1_driver_union_find(ray_session):
    got, canon = _run(10**9)
    assert got == EXPECTED
    assert isinstance(canon, dict)
    assert canon["John Larson"] == "john b larson"


def test_regime2_nonidentity_broadcast(ray_session):
    # vocab = 6 > 5 ≥ non-identity entries (5: three Larsons + two Acmes;
    # "widget" is identity) → regime 2
    got, canon = _run(5)
    assert got == EXPECTED
    assert isinstance(canon, dict)
    assert "widget" not in canon          # identity entries not shipped
    assert canon["John B. Larson"] == "john b larson"
    assert canon["Acme Corp"] == "acme corp"


def test_regime3_distributed_join_application(ray_session):
    # threshold below even the non-identity count → fully distributed
    got, canon = _run(1)
    assert got == EXPECTED
    assert not isinstance(canon, dict)    # regime 3 returns the map Dataset
    m = {r["surface"]: r["canonical"] for r in canon.take_all()}
    assert m["John Larson"] == "john b larson"
