"""Query-side search surface — the reference's five search strategies
re-expressed as Dataset pipelines (SURVEY §2.10, utils/search_service.py,
utils/search_pipeline.py:169-196).

Strategies:
- lexical:   token-overlap scoring (vectorized), min-max normalized to
             [1,100] (G7), sort desc + limit (T1/T3).
- vector:    embed the query (hash embedder = the sandbox stand-in for
             Titan, same 256-dim normalized contract) → exact cosine top-k
             (≥ HNSW recall, T2).
- hybrid:    0.5·lexical + 0.5·vector on the candidate union.
- expanded:  synonym-table query expansion (A8 surrogate: deterministic
             table instead of an LLM; dedup with list(set) semantics,
             utils/search_service.py:248) feeding lexical.
- reranked:  deterministic lexical-overlap reranker attaching
             ``rerank_score`` and re-sorting top-n (A9 surrogate; index →
             original mapping is by carried doc_id, J3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Max, Min

from semantic_search_system_ray.functions.embed import hash_embed
from semantic_search_system_ray.functions.scores import arrow_minmax_normalize_100
from semantic_search_system_ray.functions.text import tokenize

SYNONYMS: dict[str, list[str]] = {
    "fast": ["quick", "rapid"],
    "query": ["search", "lookup"],
    "join": ["merge"],
    "big": ["large", "huge"],
    "small": ["tiny", "little"],
    "energy": ["power"],
    "school": ["education"],
}


def expand_query(query: str) -> list[str]:
    """query → [query, synonym variants...], deduped (set semantics,
    deterministic order by first occurrence)."""
    out = [query]
    toks = [t.lower() for t in tokenize(query)]
    for i, t in enumerate(toks):
        for syn in SYNONYMS.get(t, []):
            variant = " ".join(toks[:i] + [syn] + toks[i + 1 :])
            out.append(variant)
    seen, dedup = set(), []
    for q in out:
        if q not in seen:
            seen.add(q)
            dedup.append(q)
    return dedup


def _overlap_scores(texts: list[str], q_tokens: frozenset[str]) -> list[float]:
    scores = []
    for t in texts:
        toks = [w.lower() for w in tokenize(t or "")]
        if not toks:
            scores.append(0.0)
            continue
        hits = sum(1 for w in toks if w in q_tokens)
        scores.append(round(hits / len(toks) * (1 + len(q_tokens)), 6))
    return scores


def search_lexical(
    docs: rd.Dataset,
    query: str,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """→ (doc_id, score, normalized_score_100) top-k by overlap score."""
    q_tokens = frozenset(t.lower() for t in tokenize(query))

    def score(t: pa.Table) -> pa.Table:
        s = _overlap_scores(t.column(text_col).to_pylist(), q_tokens)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    [str(v) for v in t.column(id_col).to_pylist()], pa.string()
                ),
                "score": pa.array(s, pa.float64()),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    stats = scored.aggregate(Min("score"), Max("score"))
    mn, mx = stats["min(score)"], stats["max(score)"]

    def norm(t: pa.Table) -> pa.Table:
        return t.append_column(
            "normalized_score_100", arrow_minmax_normalize_100(t.column("score"), mn, mx)
        )

    return (
        scored.map_batches(norm, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def search_expanded(docs: rd.Dataset, query: str, k: int = 10, **kwargs) -> rd.Dataset:
    """Expanded lexical: score against the union of expanded-query tokens."""
    terms = expand_query(query)
    return search_lexical(docs, " ".join(terms), k, **kwargs)


def search_vector(
    embeddings: rd.Dataset,
    query_text: str,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Embed the query with the deterministic hash embedder → exact cosine
    top-k. NOTE: meaningful only against embeddings produced by the same
    embedder (e.g. the enriched KG table); the driver's synthetic
    ``embeddings`` table uses its own vectors — still exercises the path."""
    from semantic_search_system_ray.stages.ann import cosine_topk

    dim_probe = embeddings.take(1)[0][vec_col]
    q = hash_embed(query_text, dim=len(dim_probe))
    return cosine_topk(embeddings, np.asarray(q, dtype=np.float64), k,
                       id_col=id_col, vec_col=vec_col)


def rerank(
    results: rd.Dataset,
    query: str,
    top_n: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Attach ``rerank_score`` (deterministic overlap surrogate for the
    Bedrock reranker) and return the re-sorted top-n, original columns
    preserved (index→original mapping via carried ids, J3)."""
    q_tokens = frozenset(t.lower() for t in tokenize(query))

    def score(t: pa.Table) -> pa.Table:
        s = _overlap_scores(t.column(text_col).to_pylist(), q_tokens)
        return t.append_column("rerank_score", pa.array(s, pa.float64()))

    return (
        results.map_batches(score, batch_format="pyarrow")
        .sort(["rerank_score", id_col], descending=[True, False])
        .limit(top_n)
    )


def search_reranked(
    docs: rd.Dataset,
    query: str,
    k: int = 10,
    *,
    candidates: int | None = None,
) -> rd.Dataset:
    """Lexical retrieve → deterministic rerank (the reference's Pro path:
    retrieve wide, rerank, cut to top-k)."""
    wide = search_lexical(docs, query, candidates or k * 3)
    ids = {r["doc_id"] for r in wide.take_all()}
    cand = docs.map_batches(
        lambda t, ids=ids: t.filter(
            pa.array([str(v) in ids for v in t.column("doc_id").to_pylist()])
        ),
        batch_format="pyarrow",
    )
    return rerank(cand, query, top_n=k)


def _strategy_lexical(docs, embeddings, query, k):
    return search_lexical(docs, query, k)


def _strategy_vector(docs, embeddings, query, k):
    return search_vector(embeddings, query, k)


def _strategy_hybrid(docs, embeddings, query, k):
    return search_hybrid(docs, embeddings, query, k)


def _strategy_expanded(docs, embeddings, query, k):
    return search_expanded(docs, query, k)


def _strategy_reranked(docs, embeddings, query, k):
    return search_reranked(docs, query, k)


#: Mode-string → strategy dispatch — the reference's search registry
#: (utils/utils.py:41-57, main_app.py:42-48: "Simple"/"Advanced"/"Pro"
#: strings select a search function). Uniform signature
#: ``(docs, embeddings, query, k) -> Dataset``; register new strategies by
#: inserting here (the §2.10 extension point).
STRATEGY_REGISTRY: dict[str, "object"] = {
    "lexical": _strategy_lexical,
    "vector": _strategy_vector,
    "hybrid": _strategy_hybrid,
    "expanded": _strategy_expanded,
    "reranked": _strategy_reranked,
}


def run_search(
    mode: str,
    docs: rd.Dataset | None,
    embeddings: rd.Dataset | None,
    query: str,
    k: int = 10,
) -> rd.Dataset:
    """Dispatch a search by mode string. Unknown mode → ValueError naming
    the registered modes (the reference silently returns [] on an unknown
    mode, utils/utils.py:41-57 — an error is strictly more debuggable and
    the contract the registry documents)."""
    try:
        strategy = STRATEGY_REGISTRY[mode]
    except KeyError:
        raise ValueError(
            f"unknown search mode {mode!r}; registered: {sorted(STRATEGY_REGISTRY)}"
        ) from None
    return strategy(docs, embeddings, query, k)


def search_hybrid(
    docs: rd.Dataset,
    embeddings: rd.Dataset,
    query: str,
    k: int = 10,
) -> rd.Dataset:
    """0.5·lexical + 0.5·vector over the union of candidates (both score
    sets min-max normalized first). Joins candidates by id via broadcast
    (both candidate sets are ≤ k·batches — tiny)."""
    lex = {r["doc_id"]: r["normalized_score_100"] for r in
           search_lexical(docs, query, k * 3).take_all()}
    vec = {str(r["vec_id"]): 1.0 + 99.0 * max(0.0, r["score"]) for r in
           search_vector(embeddings, query, k * 3).take_all()}
    ids = sorted(set(lex) | set(vec))
    rows = {
        "doc_id": ids,
        "hybrid_score": [
            round(0.5 * lex.get(i, 1.0) + 0.5 * vec.get(i, 1.0), 4) for i in ids
        ],
    }
    tbl = pa.Table.from_pydict(rows)
    return rd.from_arrow(tbl).sort(
        ["hybrid_score", "doc_id"], descending=[True, False]
    ).limit(k)


def rag_answer(
    docs: rd.Dataset, query: str, *, k: int = 5
) -> rd.Dataset:
    """Grounded extractive QA — the reference's A10 RAG answerer
    (app.py:20-66: retrieve top-k, compose an answer from the retrieved
    text) with the LLM composer replaced by a DETERMINISTIC extractive
    surrogate, same as the NER gazetteer stands in for spaCy: retrieve
    top-k lexically, then per retrieved doc pick the best supporting
    SNIPPET — the 12-word chunk (the corpus' sentence unit; whole text
    when ≤200 chars) containing the most DISTINCT query tokens, first
    chunk on ties. Fully deterministic ⇒ exact SQL oracle
    (text_oracles.sql_rag_answer).

    Output: (rank, doc_id, score, snippet) — rank is the retrieval
    order (score desc, doc_id asc)."""
    top = search_lexical(docs, query, k=k)
    rows = top.take_all()  # k rows — bounded driver fetch
    order = {str(r["doc_id"]): (i + 1, float(r["score"])) for i, r in enumerate(rows)}
    qtoks = sorted({t.lower() for t in tokenize(query)})

    import pyarrow.compute as pc

    ids = pa.array(sorted(order), pa.string())

    def snippet(batch: pa.Table) -> pa.Table:
        out_rank, out_id, out_score, out_snip = [], [], [], []
        for i, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            d = str(i)
            if d not in order:
                continue
            t = t or ""
            # split(" ") (single-space, empties kept), NOT split(): the
            # oracle's string_split(text, ' ') does not split on \n/\t or
            # collapse runs — one convention on both sides
            words = t.split(" ")
            if len(t) > 200:
                chunks = [
                    " ".join(words[j : j + 12]) for j in range(0, len(words), 12)
                ]
            else:
                chunks = [t]
            best_i, best_ov = 0, -1
            for ci, c in enumerate(chunks):
                cw = set(c.lower().split(" "))  # case-folded like retrieval
                ov = sum(1 for q in qtoks if q in cw)
                if ov > best_ov:  # strict: first chunk wins ties
                    best_i, best_ov = ci, ov
            rank, score = order[d]
            out_rank.append(rank)
            out_id.append(d)
            out_score.append(score)
            out_snip.append(chunks[best_i] if chunks else "")
        return pa.Table.from_pydict(
            {
                "rank": pa.array(out_rank, pa.int64()),
                "doc_id": pa.array(out_id, pa.string()),
                "score": pa.array(out_score, pa.float64()),
                "snippet": pa.array(out_snip, pa.string()),
            }
        )

    candidates = docs.map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t.column("doc_id"), pa.string()), value_set=ids)
        ),
        batch_format="pyarrow",
    )
    return candidates.map_batches(snippet, batch_format="pyarrow")


def search_bm25(
    docs: rd.Dataset, query: str, *, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> rd.Dataset:
    """BM25-ranked retrieval (Robertson/Sparck Jones; the classic the
    reference delegates to OpenSearch's default scorer). Deterministic
    cross-system by construction: idf needs only |query| ln() calls
    (same libm as DuckDB on one host) and everything else is IEEE
    +,*,/ on identical inputs, so the SQL oracle reproduces scores
    bit-for-bit before the shared 6dp round.

    Plan shape: ONE tiny aggregate pass (N, total length, per-term df —
    all query-term-bounded) broadcast to a vectorized scoring map; no
    shuffle of the corpus. Output: (rank, doc_id, score).

    Determinism detail: per-term contributions are accumulated in SORTED
    query-token order on both sides — the oracle sums via
    list_sum(list(... ORDER BY q)), not a plain hash-aggregate sum whose
    accumulation order DuckDB does not pin (FP addition is
    non-associative; an unpinned order could flip the shared 6dp round
    at a boundary ulp)."""
    import math

    import numpy as np
    import pyarrow.compute as pc

    qtoks = sorted({t.lower() for t in tokenize(query)})

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        total_len = 0
        dfs = {q: 0 for q in qtoks}
        for t in texts:
            toks = [w.lower() for w in tokenize(t or "")]
            total_len += len(toks)
            s = set(toks)
            for q in qtoks:
                if q in s:
                    dfs[q] += 1
        return pa.Table.from_pydict(
            {"n": [n], "total_len": [total_len],
             **{f"df_{i}": [dfs[q]] for i, q in enumerate(qtoks)}}
        )

    agg = docs.map_batches(stats, batch_format="pyarrow").sum(
        ["n", "total_len"] + [f"df_{i}" for i in range(len(qtoks))]
    )
    n_docs = int(agg["sum(n)"])
    avgdl = (agg["sum(total_len)"] / n_docs) if n_docs else 0.0
    idf = {
        q: math.log(1.0 + (n_docs - int(agg[f"sum(df_{i})"]) + 0.5)
                    / (int(agg[f"sum(df_{i})"]) + 0.5))
        for i, q in enumerate(qtoks)
    }

    def score(batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch.column("doc_id").to_pylist()]
        texts = batch.column("text").to_pylist()
        out = np.zeros(len(ids), dtype=np.float64)
        dls = np.zeros(len(ids), dtype=np.float64)
        tfs = {q: np.zeros(len(ids), dtype=np.float64) for q in qtoks}
        from collections import Counter

        for r, t in enumerate(texts):
            toks = [w.lower() for w in tokenize(t or "")]
            dls[r] = len(toks)
            cnt = Counter(toks)  # one pass, all term frequencies
            for q in qtoks:
                tfs[q][r] = cnt[q]
        denom_base = k1 * (1.0 - b + b * (dls / avgdl)) if avgdl else k1
        for q in qtoks:
            tf = tfs[q]
            out += idf[q] * (tf * (k1 + 1.0)) / (tf + denom_base)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()),
             "score": pc.round(pa.array(out, pa.float64()), 6)}
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)

    def add_rank(t: pa.Table) -> pa.Table:
        # runs on the single coalesced top-k block (k rows), sorted order
        # preserved by repartition(1)
        return pa.Table.from_pydict(
            {"rank": pa.array(range(1, t.num_rows + 1), pa.int64()),
             "doc_id": t.column("doc_id"), "score": t.column("score")}
        )

    return top.repartition(1).map_batches(
        add_rank, batch_format="pyarrow", batch_size=None
    )


def search_rrf(
    docs: rd.Dataset,
    query: str,
    *,
    k: int = 20,
    k_rrf: int = 60,
    scale: int = 10 ** 12,
) -> "pa.Table":
    """Reciprocal-rank fusion (Cormack et al. 2009) of the BM25 and
    lexical-overlap rankings for the same query — the standard hybrid
    retrieval combiner. Each ranking contributes ``scale // (k_rrf +
    rank)`` per doc: INTEGER floor contributions make the fused score an
    exact int64 sum — associative, order-independent, hash-stable — so
    RRF sits on the hard gate without any FP-summation pinning (the
    float 1/(60+r) formulation would be order-dependent). Final order:
    (rrf_score DESC, doc_id).

    Scale shape: all distributed work happens inside the two ranking
    pipelines (each one streaming aggregate + top-k); the fusion folds
    two k-bounded rankings driver-side — ≤2k rows by construction."""
    import pyarrow as pa

    bm = search_bm25(docs, query, k=k).take_all()
    lex = search_lexical(docs, query, k).take_all()
    # re-sort driver-side: deterministic rank regardless of block order
    bm.sort(key=lambda r: (-r["score"], r["doc_id"]))
    lex.sort(key=lambda r: (-r["score"], r["doc_id"]))
    scores: dict[str, int] = {}
    for rows in (bm, lex):
        for i, r in enumerate(rows, start=1):
            d = str(r["doc_id"])
            scores[d] = scores.get(d, 0) + scale // (k_rrf + i)
    fused = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.Table.from_pydict(
        {"rank": pa.array(range(1, len(fused) + 1), pa.int64()),
         "doc_id": pa.array([d for d, _ in fused], pa.string()),
         "rrf_score": pa.array([s for _, s in fused], pa.int64())},
    )
