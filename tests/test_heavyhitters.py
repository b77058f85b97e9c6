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
    """Every MG estimate undercounts by at most floor(n/(m+1)) and every
    item with true count above that bound survives the summary."""
    from semantic_search_system_ray.stages.heavyhitters import mg_summary

    tokens = (["hot"] * 50 + ["warm"] * 20
              + [f"cold{i}" for i in range(200)])
    c, n = mg_summary(tokens, 8)
    bound = n // 9
    truth = Counter(tokens)
    for w, est in c.items():
        assert truth[w] - bound <= est <= truth[w]
    for w, cnt in truth.items():
        if cnt > bound:
            assert w in c, f"{w} ({cnt} > {bound}) must survive"
