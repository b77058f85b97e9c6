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


# ---------------------------------------------------------------------------
# canonical_map_dict / canonical_map_auto (round-3 verdict item 1): the
# exported helper must decide its regime from DISTRIBUTED counts before
# collecting anything — above the threshold the driver must never pay the
# vocabulary materialization, and the helper returns the map Dataset.
# ---------------------------------------------------------------------------

def _surface_ds() -> rd.Dataset:
    # deliberately NON-distinct input (each surface ×3)
    return rd.from_arrow(
        pa.table({"surface": pa.array(_SURFACES * 3, pa.string())})
    )


def test_canonical_map_dict_regime1_full_map(ray_session):
    from semantic_search_system_ray.stages.canon import canonical_map_dict

    m = canonical_map_dict(_surface_ds(), driver_threshold=10**9)
    assert isinstance(m, dict)
    assert m["John Larson"] == "john b larson"
    assert m["widget"] == "widget"          # full map includes identities


def test_canonical_map_dict_regime2_nonidentity(ray_session):
    from semantic_search_system_ray.stages.canon import canonical_map_dict

    m = canonical_map_dict(_surface_ds(), driver_threshold=5)
    assert isinstance(m, dict)
    assert "widget" not in m                # identities not shipped
    assert m["John B. Larson"] == "john b larson"
    assert m["Acme Corp"] == "acme corp"


def test_canonical_map_dict_never_collects_above_threshold(ray_session):
    """Above the threshold, NO take_all may move more than threshold rows
    to the driver (the round-3 self-defeating-switch bug), and the helper
    returns the parity-correct (surface, canonical) Dataset."""
    from semantic_search_system_ray.stages.canon import canonical_map_dict

    threshold = 1
    orig = rd.Dataset.take_all

    def guarded(self, *a, **k):
        rows = orig(self, *a, **k)
        assert len(rows) <= threshold, (
            f"driver collected {len(rows)} rows above threshold {threshold}"
        )
        return rows

    rd.Dataset.take_all = guarded
    try:
        out = canonical_map_dict(_surface_ds(), driver_threshold=threshold)
    finally:
        rd.Dataset.take_all = orig
    assert not isinstance(out, dict)        # regime 3 → Dataset
    m = {r["surface"]: r["canonical"] for r in out.take_all()}
    assert m["John Larson"] == "john b larson"
    assert m["Acme Corp"] == "acme corp"
    assert "acme corp" not in m            # identities absent by design
    assert "widget" not in m
