"""Direct tests for the exact-distinct machinery: tree and partition
strategies, and doc-partitioned distinct with forced block straddling."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.pipelines.kg_build import (
    distinct_doc_partitioned,
    distinct_rows,
)


def _rows(n_docs=40, rows_per_doc=6, dup_every=3):
    """Doc-contiguous rows with duplicates both within docs and across the
    dataset (same doc repeated rows)."""
    subj, pred, obj = [], [], []
    for d in range(n_docs):
        doc = f"doc-{d:04d}"
        for r in range(rows_per_doc):
            subj.append(doc)
            pred.append("MENTIONS")
            obj.append(f"ent-{r % dup_every}")  # within-doc dups
    return pa.Table.from_pydict({"subj": subj, "pred": pred, "obj": obj})


@pytest.mark.parametrize("strategy", ["tree", "partition"])
def test_distinct_rows_strategies(ray_session, strategy):
    tbl = _rows()
    expected = {
        (s, p, o)
        for s, p, o in zip(*[tbl.column(c).to_pylist() for c in ["subj", "pred", "obj"]])
    }
    ds = rd.from_arrow(tbl)
    got = [
        (r["subj"], r["pred"], r["obj"])
        for r in distinct_rows(ds, ["subj", "pred", "obj"], strategy=strategy).take_all()
    ]
    assert len(got) == len(expected)
    assert set(got) == expected


def test_distinct_doc_partitioned_with_straddling_blocks(ray_session):
    """Force a doc's rows to straddle block boundaries: split the table
    into blocks MID-DOC and assert the boundary repair still yields the
    exact global distinct."""
    tbl = _rows(n_docs=10, rows_per_doc=8, dup_every=2)
    expected = {
        (r["subj"], r["pred"], r["obj"]) for r in tbl.to_pylist()
    }
    # manual mid-doc splits: blocks of 13 rows (8 rows/doc → every block
    # boundary lands inside some doc)
    pieces = [tbl.slice(i, 13) for i in range(0, tbl.num_rows, 13)]
    ds = rd.from_arrow(pieces[0])
    for p in pieces[1:]:
        ds = ds.union(rd.from_arrow(p))
    out = distinct_doc_partitioned(ds, ["subj", "pred", "obj"], doc_col="subj")
    got = [(r["subj"], r["pred"], r["obj"]) for r in out.take_all()]
    assert len(got) == len(expected), "boundary repair must not drop or duplicate"
    assert set(got) == expected


def test_distinct_doc_partitioned_requires_doc_col(ray_session):
    ds = rd.from_arrow(_rows(2, 2))
    with pytest.raises(AssertionError):
        distinct_doc_partitioned(ds, ["pred", "obj"], doc_col="subj")
