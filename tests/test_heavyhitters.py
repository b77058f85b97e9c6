"""Misra–Gries heavy hitters (stages/heavyhitters): the output must be
EXACT in both regimes — certificate-pass (sketch bounds the shuffle) and
certificate-fail (loud fallback to the full groupby)."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pytest


def _corpus():
    # skewed vocabulary: w0 appears 400×, w1 200×, …, long tail of 1×
    docs = []
    for i in range(40):
        parts = []
        for rank, n in enumerate([10, 5, 3, 2, 1]):
            parts += [f"w{rank}"] * n
        parts += [f"tail{i}_{j}" for j in range(30)]
        docs.append(" ".join(parts))
    return docs


def _exact_topk(docs, k):
    c = Counter()
    for d in docs:
        c.update(re.findall(r"\w+", d.lower()))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("capacity,expect_fallback", [(5000, False), (4, True)])
def test_heavy_hitters_exact_both_regimes(
    ray_session, capacity, expect_fallback, caplog
):
    import logging

    import ray.data as rd

    from semantic_search_system_ray.stages.heavyhitters import heavy_hitters

    docs = _corpus()
    ds = rd.from_arrow(
        pa.table({"text": pa.array(docs, pa.string())})
    ).repartition(6)

    with caplog.at_level(logging.WARNING,
                         logger="semantic_search_system_ray.stages.heavyhitters"):
        got = heavy_hitters(ds, col="text", k=5, capacity=capacity)
    exp = _exact_topk(docs, 5)
    assert list(zip(got.column("word").to_pylist(),
                    got.column("cnt").to_pylist())) == exp
    fell_back = any("certificate failed" in r.message for r in caplog.records)
    assert fell_back == expect_fallback


def test_mg_summary_error_bound():
    """Every MG estimate undercounts by at most the tracked decrement
    count d (≤ floor(n/(m+1))), and every item with true count above d
    survives the summary."""
    from semantic_search_system_ray.stages.heavyhitters import mg_summary

    tokens = (["hot"] * 50 + ["warm"] * 20
              + [f"cold{i}" for i in range(200)])
    c, d = mg_summary(tokens, 8)
    assert 0 < d <= len(tokens) // 9
    truth = Counter(tokens)
    for w, est in c.items():
        assert truth[w] - d <= est <= truth[w]
    for w, cnt in truth.items():
        if cnt > d:
            assert w in c, f"{w} ({cnt} > {d}) must survive"


def test_mg_merge_preserves_bound():
    """Tree-merged summaries stay valid MG summaries of the concatenated
    stream: estimates undercount by at most the accumulated error and
    heavy items survive the trim."""
    from semantic_search_system_ray.stages.heavyhitters import (
        _merge_summaries,
        _summary_table,
        mg_summary,
    )

    import pyarrow as pa

    s1 = ["hot"] * 40 + [f"a{i}" for i in range(100)]
    s2 = ["hot"] * 30 + ["warm"] * 25 + [f"b{i}" for i in range(120)]
    m = 8
    c1, d1 = mg_summary(s1, m)
    c2, d2 = mg_summary(s2, m)
    merged, err = _merge_summaries(
        pa.concat_tables([_summary_table(c1, d1), _summary_table(c2, d2)]), m
    )
    assert len(merged) <= m
    truth = Counter(s1 + s2)
    for w, est in merged.items():
        assert truth[w] - err <= est <= truth[w]
    for w, cnt in truth.items():
        if cnt > err:
            assert w in merged, f"{w} ({cnt} > {err}) must survive merge"


def test_heavy_hitters_forced_tree_merge(ray_session, monkeypatch):
    """With fan-in forced tiny, the distributed tree-merge path runs
    multiple levels and the result is still exact."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_search_system_ray.stages import heavyhitters as hh

    monkeypatch.setattr(hh, "_MERGE_FAN_IN", 2)
    docs = _corpus()
    ds = rd.from_arrow(
        pa.table({"text": pa.array(docs, pa.string())})
    ).repartition(10)
    got = hh.heavy_hitters(ds, col="text", k=5, capacity=4096)
    assert list(zip(got.column("word").to_pylist(),
                    got.column("cnt").to_pylist())) == _exact_topk(docs, 5)
