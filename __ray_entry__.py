"""Driver contract for the graft builder (Ray Data target).

- ``entry()``   — flagship KG pipeline over /root/testdata/sf0.001: adapt
  the flat documents table to the spans-shaped corpus (deterministic), run
  DocNLP → canonicalization → triple dedup, return the triples Dataset.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2 +
  the training-data operator suite); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
  (same column names, same rounding): generated oracles
  (pipelines/text_oracles.py) cover the text-analysis/search suite, the
  flagship ``kg_triples`` pipeline + its graph materializations
  (``kg_nodes``, ``kg_adjacency`` — the matcher collapses to closed form
  over the clean word-soup corpus; assumptions pinned in
  tests/test_kg_oracle_assumptions.py), the FULL minhash clustering
  pipeline, simhash signatures, media span layout + features, and the
  curation ops (md5-based hashing wherever a hash must be
  SQL-recomputable). Since late r3 the HLL sketch and the LSH media
  dedup are on the hard gate too (the sketch is bit-recomputed in SQL;
  the media pair set collapses to an exact join for the injective stub
  features). Since r4 the approximate ANN paths (LSH, IVF) are ALSO
  hash-gated via recall certificates: each emits per-query + mean
  recall-vs-exact pass rows under measured, pinned bounds, and the
  exact side is fully value-oracled (``ann_exact_multi``). The seeded
  iterative k-means taxonomy is gated the same way (a property
  certificate: exact partition, ≤k topics, centroid-member labels,
  rerun-identical) — EVERY queries() entry carries an oracle since r4.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

# Gazetteer for the driver's word-soup documents corpus: multi-word phrases
# exercise longest-first matching; labels split entity-ish vs topic-ish so
# MENTIONS and HAS_TOPIC triples both materialize.
TESTDATA_GAZETTEER: dict[str, str] = {
    "hash join": "TOPIC", "sort merge": "TOPIC", "table scan": "TOPIC",
    "window": "TOPIC", "stream": "TOPIC", "vector": "TOPIC",
    "group query": "TOPIC", "batch": "TOPIC",
    "customer": "ORG", "spark": "ORG", "part": "ORG",
    "column": "GPE", "row": "GPE", "line": "GPE",
    "filter": "PERSON", "merge": "PERSON", "scan": "PERSON",
}

TESTDATA_TAXONOMY = {
    "joins": ["hash join", "sort merge"],
    "scans": ["table scan", "stream"],
    "exec": ["window", "vector", "batch", "group query"],
}


def _testdata_taxonomy_table() -> pa.Table:
    rows = [(t, p) for t, ps in TESTDATA_TAXONOMY.items() for p in ps]
    return pa.Table.from_pydict(
        {"broad_topic": [r[0] for r in rows], "phrase": [r[1] for r in rows]}
    )


# Deterministic phrase→docs fixture (reference ``topics.json`` shape,
# knowledge_graph/knowledge_graph.py:160-186): phrase i (list order below)
# relates to every doc with doc_id % 5 == i % 5. The last phrase is NOT in
# the taxonomy → exercises the inner-join drop. SQL-expressible, so the
# RELATES_TO_DOC branch sits on the driver's hash gate (round-2 verdict
# item 3 — was an always-empty table).
TESTDATA_PHRASE_LIST: list[str] = [
    "hash join", "sort merge", "table scan", "stream",
    "window", "vector", "batch", "group query",
    "missing phrase",  # not in TESTDATA_TAXONOMY → dropped by the join
]


def _testdata_phrase_docs(sf_dir: str):
    """(phrase, doc_id, url, title) rows, doc-contiguous within each block
    (the layout contract of distinct_doc_partitioned's boundary repair)."""
    from semantic_search_system_ray.pipelines.queries import read_docs

    return _phrase_docs_from(read_docs(sf_dir, ["doc_id"]))


def _phrase_docs_from(docs_ds):
    """The deterministic phrase→docs rule over an ARBITRARY docs Dataset
    (doc_id column) — shared by the full-corpus fixture above and the
    curated-corpus flagship composition."""
    import numpy as np

    res_phrases: dict[int, list[str]] = {}
    for i, p in enumerate(TESTDATA_PHRASE_LIST):
        res_phrases.setdefault(i % 5, []).append(p)

    def emit(t: pa.Table) -> pa.Table:
        ids = np.sort(t.column("doc_id").to_numpy(zero_copy_only=False))
        docs_out, phr_out = [], []
        for r, plist in res_phrases.items():
            sel = ids[ids % 5 == r]
            for p in plist:
                docs_out.append(sel)
                phr_out.append(np.full(len(sel), p, dtype=object))
        docs = np.concatenate(docs_out)
        phr = np.concatenate(phr_out)
        order = np.argsort(docs, kind="stable")  # doc-contiguous layout
        docs, phr = docs[order], phr[order]
        n = len(docs)
        return pa.Table.from_pydict(
            {
                "phrase": pa.array(phr, pa.string()),
                "doc_id": pa.array([str(x) for x in docs.tolist()], pa.string()),
                "url": pa.array([""] * n, pa.string()),
                "title": pa.array([""] * n, pa.string()),
            }
        )

    return docs_ds.select_columns(["doc_id"]).map_batches(
        emit, batch_format="pyarrow"
    )


_KG_TRIPLES_CACHE: dict[str, Any] = {}


def _kg_triples(sf_dir: str):
    # Memoized per sf_dir within the session: ~a dozen KG-family gate
    # queries (nodes/adjacency/degree/pagerank/bfs/components/diff/…)
    # each start from the same triples — one materialized build serves
    # them all instead of re-running the flagship per query. The
    # materialized Dataset is bounded (6.1M lean rows at sf0.1) and the
    # cache is process-local (the driver runs one session).
    cached = _KG_TRIPLES_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    from semantic_search_system_ray.pipelines.kg_build import build_triples
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    spans = text_table_to_spans(docs)
    res = build_triples(
        spans, _testdata_taxonomy_table(), _testdata_phrase_docs(sf_dir),
        TESTDATA_GAZETTEER, concurrency=(1, 4), batch_size=128,
    )
    triples = res.triples.materialize()
    _KG_TRIPLES_CACHE[sf_dir] = triples
    return triples


def _q_kg_nodes(sf_dir: str):
    """Graph-materialize node table (distinct typed endpoints) — ON the
    hard gate: its oracle reuses the kg_triples SQL as a subquery."""
    from semantic_search_system_ray.pipelines.kg_build import nodes_from_triples

    return nodes_from_triples(_kg_triples(sf_dir))


def _q_kg_adjacency(sf_dir: str):
    """Graph-materialize adjacency store — ON the hard gate: the
    list<struct> neighbor column is serialized to a 'dst|rel;…' string
    (sorted by (dst, rel), the operator's documented order) so the
    driver's list-free value hash can compare it; the oracle string_aggs
    identically over the kg_triples SQL."""
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import (
        adjacency_from_edges,
        edges_from_triples,
    )

    adj = adjacency_from_edges(edges_from_triples(_kg_triples(sf_dir)))

    def serialize(t: pa.Table) -> pa.Table:
        import numpy as np

        col = t.column("neighbors")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        joined = pc.binary_join_element_wise(
            flat.field("dst"), flat.field("rel"), "|"
        )
        # rebuild offsets from lengths: col.offsets of a zero-copy SLICED
        # block is not rebased to 0 and would misalign against the
        # (correctly de-sliced) list_flatten output
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), joined)
        return pa.Table.from_pydict(
            {
                "src": t.column("src"),
                "neighbors": pc.binary_join(lists, ";"),
                "degree": t.column("degree"),
            }
        )

    return adj.map_batches(serialize, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _kg_triples("/root/testdata/sf0.001")


def _q_minhash_clusters(sf_dir: str):
    """ON the hard gate since r3: md5-based shingle + band hashes make
    the full pipeline (signatures → banding → verified pairs →
    components) recomputable in one SQL statement
    (text_oracles.sql_minhash_clusters — recursive-CTE closure over the
    small verified-edge graph)."""
    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return minhash_lsh_clusters(ds, threshold=0.6)


def _q_split_leakage_free(sf_dir: str):
    """Leakage-free train/val split
    (stages/curation.leakage_free_split): MinHash-LSH clusters first,
    split decision = md5_hash64('lfsplit-' + CLUSTER) % 10 — an entire
    near-dup family lands on one side, closing the eval-contamination
    hole a doc_id-hash split (train_split) leaves open. Oracle: the
    shared sql_minhash_clusters subquery + the same md5 CASE
    (text_oracles.sql_leakage_free_split)."""
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.curation import leakage_free_split

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return leakage_free_split(ds, threshold=0.6)


def _q_cluster_best_rep(sf_dir: str):
    """Quality-aware near-dup collapse
    (stages/curation.cluster_best_representative): per MinHash cluster
    keep the highest-QualityScore member (tie → smallest doc_id) — the
    'of these mirrors keep the cleanest' curation policy, vs
    corpus_near_clean's arbitrary min-id pick. Oracle: minhash + quality
    subqueries joined, row_number argmax
    (text_oracles.sql_cluster_best_rep)."""
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.curation import (
        cluster_best_representative,
    )

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return cluster_best_representative(ds, threshold=0.6)


def _q_dedup_incremental(sf_dir: str):
    """Incremental ingestion dedup (stages/dedup.minhash_incremental):
    the documents table splits deterministically into INDEXED
    (md5_hash64('inc-' + doc_id) % 10 < 7 — DuckDB md5_number_lower on
    the same string) and INCOMING docs; every incoming doc probes the
    indexed corpus through the LSH band buckets (star candidates to the
    bucket-min indexed doc, ≤ bands candidates per doc), signature
    verification, min verified match → (doc_id, status, dup_of). No
    transitive closure — the incremental path is shuffle-bounded.
    Oracle: text_oracles.sql_dedup_incremental over the shared
    sig/band CTE prefix."""
    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.dedup import minhash_incremental

    ds = read_docs(sf_dir, ["doc_id", "text"])

    def side(t, want_indexed):
        import numpy as np

        ids = [str(v) for v in t.column("doc_id").to_pylist()]
        flags = np.array(
            [md5_hash64("inc-" + d) % 10 < 7 for d in ids], dtype=bool
        )
        return t.filter(pa.array(flags if want_indexed else ~flags))

    indexed = ds.map_batches(
        lambda t: side(t, True), batch_format="pyarrow"
    )
    incoming = ds.map_batches(
        lambda t: side(t, False), batch_format="pyarrow"
    )
    return minhash_incremental(indexed, incoming, threshold=0.5)


def _q_ann_range(sf_dir: str):
    """Cosine RANGE search (stages/ann.cosine_range_search): all
    (query, vector) pairs with cosine ≥ 0.3, queries = the 10
    smallest-id embeddings — the recall-everything dual of top-k.
    Integer-exact threshold (semantic_dedup's cross-multiplied test)
    over milli-unit quantized vectors; one broadcast streaming pass,
    zero shuffles. Oracle: stages/ann.sql_cosine_range."""
    import ray.data as rd

    from semantic_search_system_ray.stages.ann import cosine_range_search

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return cosine_range_search(ds, n_queries=10, tau_num=9, tau_den=100)


def _q_kcenter_coreset(sf_dir: str):
    """Greedy k-center coreset selection (stages/kmeans.kcenter_greedy,
    K=8) over the embeddings table: farthest-point sampling with
    int64-quantized exact distances — k−1 broadcast-iterate streaming
    passes, per-block argmax combiners, zero shuffles. Oracle:
    unrolled-CTE DuckDB twin (stages/kmeans.kcenter_sql)."""
    from semantic_search_system_ray.stages.kmeans import q_kcenter_coreset

    return q_kcenter_coreset(sf_dir)


def _sql_kcenter_coreset() -> str:
    from semantic_search_system_ray.stages.kmeans import SQL_KCENTER_CORESET

    return SQL_KCENTER_CORESET


def _sql_ann_range() -> str:
    from semantic_search_system_ray.stages.ann import sql_cosine_range

    return sql_cosine_range(n_queries=10, tau_num=9, tau_den=100)


def _q_simhash(sf_dir: str):
    from semantic_search_system_ray.stages.dedup import simhash_table
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return simhash_table(ds)


def _q_ngram_jaccard(sf_dir: str):
    from semantic_search_system_ray.stages.dedup import ngram_jaccard_pairs
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold=0.8)


def _q_langid(sf_dir: str):
    from semantic_search_system_ray.stages.textstats import LangId
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


def _q_quality(sf_dir: str):
    from semantic_search_system_ray.stages.textstats import QualityScore
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 4))


def _q_fingerprint(sf_dir: str):
    from semantic_search_system_ray.stages.textstats import fingerprint_batch
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# ANN recall-certificate constants: bounds pinned from measured recall at
# sf0.001/0.01/0.1 (per-query min 6/10, mean ≥0.84 at these settings) with
# comfortable margin; seeds fixed → deterministic. The certificate rows are
# constants under the bound, so the DuckDB oracle hash-gates them.
ANN_CERT_QUERIES = 10
ANN_CERT_K = 10
ANN_CERT_PER_QUERY_PPM = 500_000
ANN_CERT_MEAN_PPM = 700_000


def _ann_query_matrix(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", ANN_CERT_QUERIES)],
    ).sort_by("vec_id")
    qm = np.array(qt.column("embedding").to_pylist(), np.float64)
    return qm, qt.column("vec_id").to_numpy()


def _q_ann_exact_multi(sf_dir: str):
    """Fused multi-query EXACT brute-force top-k (one matmul pass for all
    10 queries, per-block per-query combiner) — the exact side of the
    ANN recall certificates, value-oracled in SQL."""
    import ray.data as rd

    from semantic_search_system_ray.stages.ann import multi_query_exact_topk

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qm, qids = _ann_query_matrix(sf_dir)
    return multi_query_exact_topk(ds, qm, qids, k=ANN_CERT_K)


def _q_ann_lsh(sf_dir: str):
    """Multi-probe LSH top-k → HARD-GATED recall certificate (r3 verdict
    ask #3): per-query recall vs the fused exact top-k must be ≥ 0.5 and
    the mean ≥ 0.7 (bounds pinned from measurement, seeds fixed); the
    certificate rows are then constants the DuckDB oracle hash-checks.
    The exact side's values are independently oracled (ann_exact_multi);
    raw recall counts stay pytest-observable (ann_recall_counts)."""
    import ray.data as rd

    from semantic_search_system_ray.stages.ann import (
        ann_recall_certificate,
        lsh_bucket_topk_multi,
        multi_query_exact_topk,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()  # both sides rescan — pin the (tiny-per-block) input
    qm, qids = _ann_query_matrix(sf_dir)
    exact = multi_query_exact_topk(ds, qm, qids, k=ANN_CERT_K)
    approx = lsh_bucket_topk_multi(
        ds, qm, qids, k=ANN_CERT_K, num_planes=4, probes=2
    )
    return ann_recall_certificate(
        exact, approx, k=ANN_CERT_K,
        min_recall_ppm=ANN_CERT_PER_QUERY_PPM,
        mean_min_recall_ppm=ANN_CERT_MEAN_PPM,
    )


def _q_ann_ivf(sf_dir: str):
    """IVF top-k (seeded coarse quantizer, nprobe=8/16 lists) → the same
    HARD-GATED recall-certificate form as ann_lsh."""
    import ray.data as rd

    from semantic_search_system_ray.stages.ann import (
        ann_recall_certificate,
        ivf_topk_multi,
        multi_query_exact_topk,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    qm, qids = _ann_query_matrix(sf_dir)
    exact = multi_query_exact_topk(ds, qm, qids, k=ANN_CERT_K)
    approx = ivf_topk_multi(ds, qm, qids, k=ANN_CERT_K, nlist=16, nprobe=8)
    return ann_recall_certificate(
        exact, approx, k=ANN_CERT_K,
        min_recall_ppm=ANN_CERT_PER_QUERY_PPM,
        mean_min_recall_ppm=ANN_CERT_MEAN_PPM,
    )


def _q_media_features(sf_dir: str):
    """Media span features — ON the hard gate since r3: the span layout
    (md5-derived injection) and the stub feature derivation inputs are
    SQL-recomputable, so the driver hash-checks doc/kind/ref/offset plus
    ``feat_sig`` = md5 of the per-dim hash inputs. The float vector is a
    pure documented function of those inputs (pytest-pinned:
    tests/test_media_textstats.py::test_stub_features_match_sig_inputs)."""
    import hashlib

    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.stages.media import (
        MediaFeatures,
        _decode_hashes,
        flatten_media_spans,
    )
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    media = flatten_media_spans(text_table_to_spans(docs))
    feats = media.map_batches(
        MediaFeatures, batch_format="pyarrow", concurrency=(1, 4), batch_size=64
    )

    def with_sig(t: pa.Table) -> pa.Table:
        sigs = []
        for r, k in zip(t.column("media_ref").to_pylist(),
                        t.column("kind").to_pylist()):
            joined = ",".join(f"{h:016x}" for h in _decode_hashes(r, k))
            sigs.append(hashlib.md5(joined.encode()).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "kind": t.column("kind"),
                "media_ref": t.column("media_ref"),
                "offset": t.column("offset"),
                "feat_sig": pa.array(sigs, pa.string()),
            }
        )

    return feats.map_batches(with_sig, batch_format="pyarrow")


def _q_media_duration_quantiles(sf_dir: str):
    """Per-kind EXACT duration quantiles over media spans (p50/p90 of
    the chunk count) — the capacity-planning stat a multimodal pipeline
    reads before sizing decode actor pools. The stub n_chunks metadata
    (1 + md5 % max_chunks, the media_frame_sample seam — a real probe
    drops in via the same pluggable duration hook) keeps it
    SQL-recomputable; quantiles run on the bounded-cardinality
    histogram (domain = 1..max_chunks, never row-sized), per-block
    (kind, n) combiners → one domain-bounded fold → driver cum-scan —
    the ship_lag_quantiles machinery. Oracle:
    text_oracles.sql_media_duration_quantiles."""
    import numpy as np

    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.stages.media import (
        MEDIA_MAX_CHUNKS,
        flatten_media_spans,
    )
    from semantic_search_system_ray.stages.sketch import _quantile_rank

    media = flatten_media_spans(
        text_table_to_spans(read_docs(sf_dir, ["doc_id", "text"]))
    )

    def hist(t: pa.Table) -> pa.Table:
        kinds = t.column("kind").to_pylist()
        refs = t.column("media_ref").to_pylist()
        n = [1 + md5_hash64(f"{k}:{r}:dur") % MEDIA_MAX_CHUNKS
             for k, r in zip(kinds, refs)]
        t2 = pa.Table.from_pydict(
            {"kind": pa.array(kinds, pa.string()),
             "n_chunks": pa.array(n, pa.int64())}
        )
        out = t2.group_by(["kind", "n_chunks"]).aggregate(
            [("n_chunks", "count")]
        )
        return out.rename_columns(["kind", "n_chunks", "n"])

    rows = (
        media.map_batches(hist, batch_format="pyarrow")
        .groupby(["kind", "n_chunks"]).sum("n")
        .take_all()  # kinds × 1..max_chunks — bounded
    )
    by_k: dict = {}
    for r in rows:
        by_k.setdefault(r["kind"], []).append(
            (int(r["n_chunks"]), int(r["sum(n)"]))
        )
    QS = [0.5, 0.9]
    out = {"kind": [], "q": [], "chunks": []}
    for k in sorted(by_k):
        cells = sorted(by_k[k])
        vals = np.array([v for v, _n in cells], dtype=np.int64)
        cnts = np.array([n for _v, n in cells], dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        for q in QS:
            idx = int(np.searchsorted(cum, _quantile_rank(q, n),
                                      side="left"))
            out["kind"].append(k)
            out["q"].append(q)
            out["chunks"].append(int(vals[idx]))
    return pa.Table.from_pydict(
        {"kind": pa.array(out["kind"], pa.string()),
         "q": pa.array(out["q"], pa.float64()),
         "chunks": pa.array(out["chunks"], pa.int64())}
    )


def _q_media_frame_sample(sf_dir: str):
    """Frame/chunk sampling over media spans (stages/media
    .media_frame_sample) — every stride-th chunk of each asset; the
    md5-derived stub duration + chunk signatures keep the whole layout
    SQL-recomputable, so the sampling plumbing sits on the hard gate."""
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.stages.media import media_frame_sample
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    return media_frame_sample(text_table_to_spans(docs))


def _q_media_dedup(sf_dir: str):
    """Media features joined back into the dedup suite: near-dup media
    span pairs (shared-asset reuse across docs). Runs the LSH-bucketed
    scale path end-to-end. ON the hard gate since late r3: the stub
    features are injective in (kind, media_ref), so the cos ≥ 0.99 pair
    set is exactly the shared-(kind,ref) span self-join — identical
    vectors share every LSH bucket (recall 1 for exact duplicates, no
    approximation in this regime) — and the SQL oracle
    (text_oracles.sql_media_dedup) recomputes it as an exact join. The
    float cos_sim column is projected away (the 1.0 dot product is the
    only float and carries no information here); exact-vs-LSH parity
    stays pytest-gated (tests/test_dedup_ann.py, test_media_textstats.py)."""
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.stages.media import media_near_dups
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    pairs = media_near_dups(text_table_to_spans(docs), strategy="lsh")
    return pairs.select_columns(["id_a", "id_b"])


def _q_approx_users_by_type(sf_dir: str):
    """Per-event-type approximate distinct users — the GROUPED
    HyperLogLog (stages/sketch.grouped_approx_distinct): one streaming
    pass of per-block per-group registers, movement bounded by
    groups × blocks × 4 KB, same bit-recomputable estimator as
    approx_distinct so the grouped sketch sits on the hard gate too
    (text_oracles.sql_grouped_approx_distinct)."""
    import ray.data as rd

    from semantic_search_system_ray.stages.sketch import grouped_approx_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return grouped_approx_distinct(ev, "user_id", "event_type")


def _q_approx_distinct(sf_dir: str):
    """HyperLogLog distinct counts (stages/sketch.py) over events —
    approximate vs COUNT(DISTINCT) by design, but the SKETCH itself is a
    deterministic function of the input, and since late r3 it is
    bit-recomputable in SQL (md5 row hash, exact-integer harmonic sum,
    mirrored estimator branches — text_oracles.sql_approx_distinct), so
    the query sits on the hard gate. Accuracy (±5%) and block-merge
    invariance stay pytest-gated
    (tests/test_util_primitives.py::test_hll_approx_distinct_accuracy)."""
    import pyarrow as pa_
    import ray.data as rd

    from semantic_search_system_ray.stages.sketch import approx_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return pa_.Table.from_pydict(
        {
            "metric": ["approx_distinct_users", "approx_distinct_event_types"],
            "value": [
                approx_distinct(ev, "user_id"),
                approx_distinct(ev, "event_type"),
            ],
        }
    )


def _q_kg_degree(sf_dir: str):
    """Graph analytics over the KG edge set — per-node out/in degree
    (stages/graph.degree_table); oracle reuses the kg_triples SQL as a
    subquery like the other graph materializations."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import degree_table

    return degree_table(edges_from_triples(_kg_triples(sf_dir)))


TESTDATA_LINK_ENTITIES: list[str] = sorted(
    p for p in TESTDATA_GAZETTEER if " " in p
)


def _q_entity_link(sf_dir: str):
    """Dense-embedding entity linking (stages/entitylink — the
    north-star M4 stage): distinct corpus word BIGRAMS stream through
    the actor-pool linker against the broadcast multi-word-gazetteer
    entity matrix. A bigram hashes to 3 embedding features, so cosine
    ≥ 0.9999 occurs exactly for token-identical surfaces — the
    min_score cut reduces the link set to exact matches, which the
    DuckDB oracle reproduces as a membership join. The gate thereby
    hash-checks the full distributed plumbing (broadcast index,
    per-actor init, batched matmul, argmax, threshold); NEAR-match
    ranking is pinned by tests/test_entitylink.py driver-numpy parity."""
    import pyarrow.compute as pc
    import ray.data as rd

    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.entitylink import link_mentions
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = read_docs(sf_dir, ["text"])
    m_schema = pa.schema([("mention", pa.string())])

    def block_bigrams(t: pa.Table) -> pa.Table:
        out = set()
        for txt in t.column("text").to_pylist():
            toks = [w.lower() for w in tokenize(txt or "")]
            out.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return pa.Table.from_pydict({"mention": sorted(out)}, schema=m_schema)

    def distinct_part(df):
        return pa.Table.from_pandas(
            df.drop_duplicates("mention"), schema=m_schema,
            preserve_index=False,
        )

    grams = coarse_partition_apply(
        docs.map_batches(block_bigrams, batch_format="pyarrow"),
        ["mention"], distinct_part, m_schema,
    )
    entities = rd.from_arrow(
        pa.table(
            {"entity_id": TESTDATA_LINK_ENTITIES,
             "name": TESTDATA_LINK_ENTITIES}
        )
    )
    linked = link_mentions(grams, entities, min_score=0.9999)
    return linked.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("entity_id"))).select(
            ["mention", "entity_id"]
        ),
        batch_format="pyarrow",
    )


def _q_kg_triangles(sf_dir: str):
    """Triangle count over the KG edge set — degree-oriented distributed
    counting (stages/graph.triangle_count); oracle is the 3-way
    self-join over the kg_triples SQL subquery."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import triangle_count

    return triangle_count(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_clustering(sf_dir: str):
    """Global clustering coefficient over the KG edge set
    (stages/graph.clustering_coefficient): 3·triangles/wedges — the
    degree-oriented triangle counter plus one Σ C(deg,2) combiner pass;
    both operands exact int64, one mirrored double divide. Oracle:
    text_oracles.sql_kg_clustering."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import clustering_coefficient

    return clustering_coefficient(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_jaccard(sf_dir: str):
    """Top-20 KG node pairs by neighborhood Jaccard similarity — the
    link-prediction feature (stages/graph.neighbor_jaccard_topk); oracle
    is the symmetrized wedge-count SQL over the kg_triples subquery."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import neighbor_jaccard_topk

    return neighbor_jaccard_topk(edges_from_triples(_kg_triples(sf_dir)), k=20)


def _q_fuzzy_name_pairs(sf_dir: str):
    """Levenshtein ≤2 near-duplicate part-name pairs — SymSpell
    symmetric-delete blocking + banded-DP verification
    (stages/dedup.edit_distance_pairs); lossless blocking makes the
    output exactly SQL ``levenshtein``-comparable."""
    import ray.data as rd

    from semantic_search_system_ray.stages.dedup import edit_distance_pairs

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    return edit_distance_pairs(ds, name_col="p_name", k=2)


SQL_FUZZY_NAME_PAIRS = """
WITH v AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM v a JOIN v b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
"""


def _q_kg_components(sf_dir: str):
    """Weakly-connected components over the KG edge set — distributed
    min-label propagation (stages/cc — the same CC core
    canonicalization uses) → (node_id, component = min node of the
    component). Oracle: recursive-CTE reachability min over the
    kg_triples SQL subquery. Scale-switched via cc.connected_components:
    driver union-find for small edge sets, distributed propagation with
    checksum early-exit above the threshold (regimes parity-pytested in
    tests/test_cc.py). The raw triple multigraph is first collapsed to
    its DISTINCT simple undirected edge set — connectivity-preserving
    (parallel edges and self-loops never change components; a
    self-loop-only node stays a singleton via the identity-label path)
    and it lets the scale switch see the TRUE edge cardinality instead
    of the triple count (6.1M triples → 48k simple edges at sf0.1, so
    the exact union-find runs where the multigraph count would have
    forced pointless distributed rounds)."""
    return _kg_wcc_labels(sf_dir)


def _kg_wcc_labels(sf_dir: str):
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.cc import connected_components
    from semantic_search_system_ray.stages.graph import (
        _distinct_nodes,
        undirected_simple_edges,
    )

    edges = edges_from_triples(_kg_triples(sf_dir)).materialize()
    nodes = _distinct_nodes(edges, "src", "dst").map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    simple = undirected_simple_edges(
        edges, src_col="src", dst_col="dst"
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("a"), "dst": t.column("b")}
        ),
        batch_format="pyarrow",
    )
    labels = connected_components(nodes, simple, max_rounds=64)
    return labels.map_batches(
        lambda t: t.rename_columns(["node_id", "component"]),
        batch_format="pyarrow",
    )


def _q_kg_kcore(sf_dir: str):
    """Bounded k-core peeling over the KG edge set
    (stages/graph.kcore, k=2, 4 synchronous rounds) → (node_id, deg) =
    degree within the surviving subgraph. Scale-switched like
    pagerank/BFS: exact numpy twin below the edge threshold,
    distributed peel (degree aggregation + two cogroup semi-joins per
    round) above. Oracle: unrolled chained-CTE peel rounds over the
    kg_triples SQL subquery (text_oracles.sql_kg_kcore)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import kcore

    return kcore(edges_from_triples(_kg_triples(sf_dir)), k=2, rounds=4)


def _q_kg_scc(sf_dir: str):
    """EXACT strongly connected components of the DIRECTED KG edge set
    (stages/graph.scc_labels) → (node_id, scc = lexicographic min
    member). Unlike the fixed-round peel/LPA ops this is a pure graph
    property: the driver regime is iterative Tarjan, the distributed
    regime is the coloring algorithm with VERIFIED fixpoints (raises
    rather than truncating), and both emit identical labels (regime
    parity pytested: tests/test_graph.py). Oracle: mutual-reachability
    recursive CTE over the kg_triples SQL subquery
    (text_oracles.sql_kg_scc)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import scc_labels

    return scc_labels(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_condensation(sf_dir: str):
    """Condensation DAG of the directed KG edge set
    (stages/graph.condensation): every strongly connected component
    contracts to its lexicographically smallest member and the DISTINCT
    inter-component edges survive → (src_scc, dst_scc). Acyclic by
    construction. Oracle: scc CTE prefix shared verbatim with
    sql_kg_scc + a two-way label join (text_oracles.sql_kg_condensation)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import condensation

    return condensation(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_topo_levels(sf_dir: str):
    """Longest-path topological layering of the KG's condensation DAG
    (stages/graph.condensation_levels): level(v) = longest directed path
    ending at component v, sources at 0 — the stage number a scheduler
    would assign. Pure graph property: the distributed regime's
    max-propagation verifies its fixpoint via the monotone level-sum
    certificate and raises on an exhausted budget (cycles are impossible
    here — the condensation is acyclic — so the guard is defensive).
    Oracle: path-length enumeration CTE over the shared scc prefix
    (text_oracles.sql_kg_topo_levels)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import condensation_levels

    return condensation_levels(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_linkpred(sf_dir: str):
    """Link prediction over the KG: top-50 NON-edges sharing >=1
    neighbor, scored by common neighbors, preferential attachment, and
    the integer resource-allocation index sum(SCALE // deg(z))
    (stages/graph.linkpred_topk — wedge partials carry the apex's floor
    share, per-pair sums are exact associative int64, existing edges
    drop via a composite-key anti join). Oracle: the same wedge
    self-join + NOT EXISTS in SQL (text_oracles.sql_kg_linkpred)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import linkpred_topk

    return linkpred_topk(edges_from_triples(_kg_triples(sf_dir)), k=50)


def _q_kg_ego(sf_dir: str):
    """Radius-2 ego network around the lexicographically smallest
    HAS_TOPIC object (stages/graph.ego_edges): one scale-switched BFS,
    two cogroup semi-joins — the 'neighborhood of X' subgraph the
    reference serves from driver-side NetworkX. The seed pick is a
    domain-bounded distinct-collect (topic vocabulary). Oracle: bounded
    reachability CTE + double semi-join (text_oracles.sql_kg_ego)."""
    import pyarrow.compute as pc

    import ray
    import ray.data as rd

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import ego_edges

    triples = _kg_triples(sf_dir).materialize()
    topic_objs = triples.map_batches(
        lambda t: pa.Table.from_pydict(
            {"obj": pc.cast(
                t.filter(pc.equal(t.column("pred"), "HAS_TOPIC"))
                .column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    # topic vocabulary is domain-bounded: tiny distinct-collect for the
    # single-seed pick
    objs = sorted({
        v for tbl in ray.get(
            topic_objs.map_batches(
                lambda t: t.group_by(["obj"]).aggregate([]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        # zero-row blocks can surface with an empty schema — skip them
        if tbl.num_rows > 0 and "obj" in tbl.schema.names
        for v in tbl.column("obj").to_pylist()
    })
    seeds = rd.from_arrow(
        pa.Table.from_pydict({"node_id": pa.array(objs[:1], pa.string())})
    )
    return ego_edges(seeds, edges_from_triples(triples), radius=2)


def _q_kg_linkpred_negs(sf_dir: str):
    """Deterministic negative sampling for link-prediction training
    (stages/graph.linkpred_negative_samples): per positive KG edge,
    up to 3 corrupted pairs via md5-ranked lookup into the sorted node
    vocabulary — a pure function of the edge (reshuffle/retry/resume
    identical), endpoint and existing-edge hits filtered via the
    composite-key anti join, never resampled. Oracle: row_number-ranked
    vocabulary + the same md5 in SQL (text_oracles.sql_kg_linkpred_negs)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import (
        linkpred_negative_samples,
    )

    return linkpred_negative_samples(
        edges_from_triples(_kg_triples(sf_dir)), k=3
    )


def _q_kg_local_clustering(sf_dir: str):
    """Per-node local clustering coefficient over the KG's undirected
    simple graph (stages/graph.local_clustering): degree-oriented apex
    wedges closed against the edge set credit all three triangle
    vertices, one coarse sum folds the credits, a LEFT degree attach
    fills triangle-free nodes, lcc = 2*tri/(deg*(deg-1)) with 0.0 below
    deg 2. Oracle: wedge self-join + closure in SQL with the identical
    double expression (text_oracles.sql_kg_local_clustering)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import local_clustering

    return local_clustering(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_reciprocity(sf_dir: str):
    """Directed reciprocity of the KG edge set
    (stages/graph.reciprocity): the share of distinct simple directed
    edges whose reverse also exists — forward keys anti-joined against
    reversed keys, two scalars to the driver, one double divide.
    Oracle: distinct self LEFT join (text_oracles.sql_kg_reciprocity)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import reciprocity

    return reciprocity(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_communities(sf_dir: str):
    """Label-propagation communities over the KG edge set
    (stages/graph.label_propagation, 3 synchronous rounds): every node
    starts as its own label; each round takes the most frequent
    neighbor label, ties to the smallest label. Scale-switched like
    pagerank/kcore: exact numpy twin below the edge threshold,
    distributed rounds (one label attach + one mode aggregation per
    round) above. Oracle: unrolled chained-CTE rounds over the
    kg_triples SQL subquery (text_oracles.sql_kg_communities)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import label_propagation

    return label_propagation(edges_from_triples(_kg_triples(sf_dir)), rounds=3)


def _q_kg_hits(sf_dir: str):
    """Deterministic integer HITS hubs & authorities
    (stages/graph.hits, 3 synchronous rounds) over the DISTINCT
    directed simple KG edge set: auth starts at SCALE everywhere; each
    round is hub-sum → max-normalize → auth-sum → max-normalize, all
    floor arithmetic on non-negative int64, so the iterative
    distributed computation is bit-reproducible against the
    unrolled-CTE SQL twin (text_oracles.sql_kg_hits). Scale-switched
    like pagerank/kcore/communities: exact numpy twin below the edge
    threshold, distributed half-rounds (one score attach + one per-node
    sum + a scalar max each) above — regimes parity-pytested in
    tests/test_graph.py."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import hits

    return hits(edges_from_triples(_kg_triples(sf_dir)), rounds=3)


def _q_kg_katz(sf_dir: str):
    """Deterministic integer Katz centrality (stages/graph.katz, 4
    synchronous rounds) over the DISTINCT directed simple KG edge set:
    x0 = SCALE everywhere; each round is in-neighbor sum →
    max-normalized attenuation (α = 1/4) plus the β = SCALE restart,
    all floor arithmetic on non-negative int64, so the iterative
    distributed computation is bit-reproducible against the
    unrolled-CTE SQL twin (text_oracles.sql_kg_katz). Scale-switched
    like pagerank/hits: exact numpy twin below the edge threshold,
    distributed rounds (one score attach + one per-node sum + a scalar
    max each) above — regimes parity-pytested in tests/test_graph.py."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import katz

    return katz(edges_from_triples(_kg_triples(sf_dir)), rounds=4)


def _q_kg_edge_support(sf_dir: str):
    """Per-EDGE triangle support over the KG's undirected simple graph
    (stages/graph.edge_support) — the k-truss primitive and the
    relation-corroboration score (an edge backed by many triangles is a
    well-corroborated relation). Same degree-oriented apex-wedge
    machinery as local_clustering, but closed wedges credit their three
    EDGES (normalized lo<hi); LEFT attach fills triangle-free edges
    with 0. Scale-switched below 8192 nodes to the dense row-block BLAS
    twin. Oracle: symmetrized neighbor self-join LEFT-joined onto the
    edge set (text_oracles.sql_kg_edge_support)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import edge_support

    return edge_support(edges_from_triples(_kg_triples(sf_dir)))


def _q_kg_comention(sf_dir: str):
    """Entity co-mention projection of the doc→entity bipartite graph
    (pipelines/kg_build.comention_pairs): per unordered entity pair,
    the number of documents mentioning BOTH — per-doc C(m,2) pair
    generation (m gazetteer-bounded) with in-partition count combiners,
    then one coarse pair sum. Oracle: DISTINCT (doc, ent) self-join
    (text_oracles.sql_kg_comention)."""
    from semantic_search_system_ray.pipelines.kg_build import comention_pairs

    return comention_pairs(_kg_triples(sf_dir))


def _q_kg_comention_pmi(sf_dir: str):
    """Entity-association PMI over the co-mention graph — the
    relatedness feature entity-linking and KG-completion models train
    on: per co-mentioned pair, ln((n_ab·N)/(n_a·n_b)) from four exact
    integers (pair docs, each entity's doc count, corpus mention-doc
    count), one mirrored divide + ln, 6dp floor. Pair and entity
    domains are gazetteer-bounded, so the finish is a bounded driver
    fold over comention_pairs' distributed output; N comes from the
    tree distinct. Oracle: text_oracles.sql_kg_comention_pmi."""
    import math

    import numpy as np
    import pyarrow.compute as pc

    import ray

    from semantic_search_system_ray.pipelines.kg_build import (
        comention_pairs,
        distinct_rows,
    )

    triples = _kg_triples(sf_dir)
    pairs_tbls = [
        t for t in ray.get(comention_pairs(triples).to_arrow_refs())
        if t.num_rows > 0
    ]
    mentions = triples.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc": pc.cast(
                t.filter(pc.equal(t.column("pred"), "MENTIONS"))
                .column("subj"), pa.string()),
             "ent": pc.cast(
                 t.filter(pc.equal(t.column("pred"), "MENTIONS"))
                 .column("obj"), pa.string())},
        ),
        batch_format="pyarrow",
    )
    dm = distinct_rows(mentions, ["doc", "ent"], strategy="tree",
                       out_blocks=8).materialize()
    n_total = distinct_rows(dm, ["doc"], strategy="tree",
                            out_blocks=4).count()
    ent_counts: dict[str, int] = {}
    for t in ray.get(
        dm.map_batches(
            lambda t: t.group_by(["ent"]).aggregate([("ent", "count")]),
            batch_format="pyarrow",
        ).to_arrow_refs()
    ):
        if t.num_rows == 0 or "ent" not in t.schema.names:
            continue
        for e, n in zip(t.column("ent").to_pylist(),
                        t.column("ent_count").to_pylist()):
            ent_counts[e] = ent_counts.get(e, 0) + int(n)

    out = {"ent_a": [], "ent_b": [], "n_docs": [], "pmi": []}
    for t in pairs_tbls:
        for a, b, nab in zip(t.column("ent_a").to_pylist(),
                             t.column("ent_b").to_pylist(),
                             t.column("docs").to_pylist()):
            nab = int(nab)
            ratio = float(nab * n_total) / float(
                ent_counts[a] * ent_counts[b]
            )
            out["ent_a"].append(a)
            out["ent_b"].append(b)
            out["n_docs"].append(nab)
            out["pmi"].append(math.floor(math.log(ratio) * 1e6 + 0.5) / 1e6)
    return pa.Table.from_pydict(
        {"ent_a": pa.array(out["ent_a"], pa.string()),
         "ent_b": pa.array(out["ent_b"], pa.string()),
         "n_docs": pa.array(out["n_docs"], pa.int64()),
         "pmi": pa.array(out["pmi"], pa.float64())}
    )


def _q_kg_walks(sf_dir: str):
    """Deterministic random walks over the KG's undirected simple graph
    (stages/graph.random_walks, 3 steps, one walk per node) — the
    node2vec/DeepWalk corpus-generation primitive with NO RNG state:
    every move is the neighbor minimizing (md5_hash64('walk:w|r|v'),
    v), so the walk corpus is reshuffle/retry/resume-identical and
    SQL-recomputable. Per step: one frontier×edge cogroup + one
    per-walk argmin. Oracle: unrolled chained-CTE rounds with the same
    md5_number_lower and two-stage min (text_oracles.sql_kg_walks)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import random_walks

    return random_walks(edges_from_triples(_kg_triples(sf_dir)), steps=3)


def _q_kg_closeness(sf_dir: str):
    """Radius-4 truncated closeness centrality from the five
    lexicographically smallest HAS_TOPIC objects
    (stages/graph.closeness_from_seeds): one scale-switched BFS per
    seed, per-block (reached, Σ dist) partials, closeness =
    reached/sum_dist as the single FP op. The seed pick is the same
    domain-bounded distinct-collect as kg_ego (topic vocabulary).
    Oracle: bounded seed-carrying reachability CTE
    (text_oracles.sql_kg_closeness)."""
    import pyarrow.compute as pc

    import ray

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import closeness_from_seeds

    triples = _kg_triples(sf_dir).materialize()
    topic_objs = triples.map_batches(
        lambda t: pa.Table.from_pydict(
            {"obj": pc.cast(
                t.filter(pc.equal(t.column("pred"), "HAS_TOPIC"))
                .column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    objs = sorted({
        v for tbl in ray.get(
            topic_objs.map_batches(
                lambda t: t.group_by(["obj"]).aggregate([]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        if tbl.num_rows > 0 and "obj" in tbl.schema.names
        for v in tbl.column("obj").to_pylist()
    })
    return closeness_from_seeds(
        objs[:5], edges_from_triples(triples), radius=4
    )


def _q_kg_metapath(sf_dir: str):
    """Heterogeneous metapath coverage per topic
    (pipelines/kg_build.metapath_topic_coverage): distinct docs
    reaching the topic via MENTIONS∘IN_TOPIC vs direct HAS_TOPIC vs
    both — taxonomy-sized IN_TOPIC broadcast (ray.put) into a
    stateless expand, ONE topic-keyed cogroup for the three
    distinct-doc counts. Oracle: DISTINCT joins over the kg_triples
    subquery (text_oracles.sql_kg_metapath)."""
    from semantic_search_system_ray.pipelines.kg_build import (
        metapath_topic_coverage,
    )

    return metapath_topic_coverage(_kg_triples(sf_dir))


def _q_kg_wcc_sizes(sf_dir: str):
    """Weakly-connected-component SIZE histogram of the KG: (component
    size → number of components) — the fragmentation one-glance (one
    giant component + dust is healthy; many mid-size islands means the
    linker under-merges). Reuses the scale-switched CC pass, then two
    bounded folds (component sizes → size census), the
    dedup_cluster_hist shape on the graph side."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    comp = _kg_wcc_labels(sf_dir)
    size_schema = pa.schema([("component", pa.string()), ("n", pa.int64())])

    def size_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by(["component"]).aggregate([("component", "count")])
        return pa.Table.from_pydict(
            {"component": pc.cast(g.column("component"), pa.string()),
             "n": pc.cast(g.column("component_count"), pa.int64())},
            schema=size_schema,
        )

    def size_fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return size_schema.empty_table()
        agg = df.groupby("component", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=size_schema,
                                    preserve_index=False)

    sizes = coarse_partition_apply(
        comp.map_batches(size_partial, batch_format="pyarrow"),
        ["component"], size_fold, size_schema,
    )
    out_schema = pa.schema(
        [("component_size", pa.int64()), ("n_components", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by(["n"]).aggregate([("n", "count")])
        return pa.Table.from_pydict(
            {"component_size": pc.cast(g.column("n"), pa.int64()),
             "n_components": pc.cast(g.column("n_count"), pa.int64())},
            schema=out_schema,
        )

    def hist_fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("component_size", sort=False)[
            "n_components"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=out_schema,
                                    preserve_index=False)

    return coarse_partition_apply(
        sizes.map_batches(hist_partial, batch_format="pyarrow"),
        ["component_size"], hist_fold, out_schema,
    )


def _q_kg_pred_stats(sf_dir: str):
    """Per-PREDICATE profile of the triple store: triple count plus
    distinct subject/object cardinalities — the KG schema-statistics
    pass a query planner (or a sanity dashboard) reads first. One
    coarse cogroup keyed by pred folds per-block partial (pred, subj,
    obj) distinct sets; pred domain is schema-bounded."""
    return _pred_stats(_kg_triples(sf_dir))


def _pred_stats(triples):
    """The pred-profile fold over an arbitrary triples Dataset — shared
    by kg_pred_stats and the kg_store_roundtrip read-back check."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    out_schema = pa.schema(
        [("pred", pa.string()), ("n_triples", pa.int64()),
         ("n_subj", pa.int64()), ("n_obj", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        rows = []
        for p, g in df.groupby("pred", sort=False):
            rows.append((p, len(g), g["subj"].nunique(), g["obj"].nunique()))
        return pa.Table.from_pydict(
            {"pred": [r[0] for r in rows],
             "n_triples": pa.array([r[1] for r in rows], pa.int64()),
             "n_subj": pa.array([r[2] for r in rows], pa.int64()),
             "n_obj": pa.array([r[3] for r in rows], pa.int64())},
            schema=out_schema,
        )

    return coarse_partition_apply(triples, ["pred"], fold, out_schema)


def _q_kg_node_types(sf_dir: str):
    """NODE-TYPE census of the KG: each node classified by the ROLES it
    plays (sorted role-set string, e.g. doc nodes appear only as
    MENTIONS/HAS_TOPIC subjects, topics as HAS_TOPIC/IN_TOPIC objects)
    → (roles, n_nodes). The heterogeneous-schema audit that catches a
    gazetteer leaking doc ids into entity positions. One coarse cogroup
    keyed by node over (node, role) partials; role vocabulary is
    schema-bounded, the census fold is a bounded second cogroup."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    t = _kg_triples(sf_dir)
    nr_schema = pa.schema([("node", pa.string()), ("role", pa.string())])

    def roles(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        subj = pc.cast(tb.column("subj"), pa.string()).combine_chunks()
        obj = pc.cast(tb.column("obj"), pa.string()).combine_chunks()
        pred = pc.cast(tb.column("pred"), pa.string()).combine_chunks()
        return pa.Table.from_pydict(
            {"node": pa.chunked_array([subj, obj]),
             "role": pa.chunked_array([
                 pc.binary_join_element_wise(
                     pa.array(["s"] * tb.num_rows), pred, ":"),
                 pc.binary_join_element_wise(
                     pa.array(["o"] * tb.num_rows), pred, ":"),
             ])},
            schema=nr_schema,
        )

    rs_schema = pa.schema([("roles", pa.string())])

    def role_set(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return rs_schema.empty_table()
        agg = (
            df.drop_duplicates()
            .sort_values(["node", "role"], kind="mergesort")
            .groupby("node", sort=False)["role"]
            .agg(lambda s: "|".join(s))
        )
        return pa.Table.from_pydict(
            {"roles": agg.to_numpy()}, schema=rs_schema
        )

    sets = coarse_partition_apply(
        t.map_batches(roles, batch_format="pyarrow"),
        ["node"], role_set, rs_schema,
    )
    out_schema = pa.schema([("roles", pa.string()), ("n_nodes", pa.int64())])

    def census_partial(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = tb.group_by(["roles"]).aggregate([("roles", "count")])
        return pa.Table.from_pydict(
            {"roles": g.column("roles"),
             "n_nodes": pc.cast(g.column("roles_count"), pa.int64())},
            schema=out_schema,
        )

    def census(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("roles", sort=False)["n_nodes"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=out_schema,
                                    preserve_index=False)

    return coarse_partition_apply(
        sets.map_batches(census_partial, batch_format="pyarrow"),
        ["roles"], census, out_schema,
    )


def _q_kg_sigma(sf_dir: str):
    """Shortest-path counts σ from the smallest HAS_TOPIC seed, radius
    4 (stages/graph.shortest_path_counts) — the all-integer Brandes
    forward pass (σ at layer r = Σ σ over BFS-DAG predecessors), one
    edge cogroup + one per-node sum per layer over the
    distance-attached edge set. Oracle: bounded reachability CTE +
    unrolled σ layer CTEs (text_oracles.sql_kg_sigma)."""
    import pyarrow.compute as pc

    import ray

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import shortest_path_counts

    triples = _kg_triples(sf_dir).materialize()
    topic_objs = triples.map_batches(
        lambda t: pa.Table.from_pydict(
            {"obj": pc.cast(
                t.filter(pc.equal(t.column("pred"), "HAS_TOPIC"))
                .column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    objs = sorted({
        v for tbl in ray.get(
            topic_objs.map_batches(
                lambda t: t.group_by(["obj"]).aggregate([]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        if tbl.num_rows > 0 and "obj" in tbl.schema.names
        for v in tbl.column("obj").to_pylist()
    })
    return shortest_path_counts(
        objs[0], edges_from_triples(triples), radius=4
    )


def _q_kg_diameter_lb(sf_dir: str):
    """DOUBLE-SWEEP diameter lower bound (the classic 2-BFS heuristic,
    exact on trees, a certified lower bound everywhere): BFS from the
    lexicographically smallest node → farthest node f1 (tie → min id),
    BFS from f1 → eccentricity ecc2 ≥ the first sweep's ecc1, and
    diameter ≥ ecc2. Both sweeps bounded at 16 hops (documented
    truncation — the KG's observed diameter is far below it; the SQL
    twin carries the identical bound). Per-sweep cost: one
    scale-switched bfs_hops + a two-scalar fold. Oracle: two bounded
    reachability CTEs with the same (dist DESC, node) pick
    (text_oracles.sql_kg_diameter_lb)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import (
        _distinct_nodes,
        bfs_hops,
    )

    edges = edges_from_triples(_kg_triples(sf_dir)).materialize()
    nodes = _distinct_nodes(edges, "src", "dst")
    seed = min(
        r["node_id"] for r in nodes.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node_id": [pc.min(t.column("node_id")).as_py()]}
            ) if t.num_rows else pa.Table.from_pydict({"node_id": []}),
            batch_format="pyarrow",
        ).take_all()
    )

    def far(dist_ds):
        # (max dist, min node among max-dist rows) via per-block partials
        parts = dist_ds.map_batches(
            lambda t: (
                lambda mx: pa.Table.from_pydict(
                    {"d": [mx],
                     "node": [pc.min(t.filter(
                         pc.equal(t.column("dist"), mx)
                     ).column("node_id")).as_py()]}
                )
            )(pc.max(t.column("dist")).as_py()),
            batch_format="pyarrow",
        ).take_all()
        mx = max(p["d"] for p in parts)
        node = min(p["node"] for p in parts if p["d"] == mx)
        return mx, node

    seed_ds = rd.from_arrow(
        pa.Table.from_pydict({"node_id": pa.array([seed], pa.string())})
    )
    ecc1, f1 = far(bfs_hops(seed_ds, edges, max_hops=16,
                            src_col="src", dst_col="dst"))
    f1_ds = rd.from_arrow(
        pa.Table.from_pydict({"node_id": pa.array([f1], pa.string())})
    )
    ecc2, _ = far(bfs_hops(f1_ds, edges, max_hops=16,
                           src_col="src", dst_col="dst"))
    return pa.Table.from_pydict(
        {"seed": pa.array([seed], pa.string()),
         "far_node": pa.array([f1], pa.string()),
         "ecc1": pa.array([ecc1], pa.int64()),
         "diameter_lb": pa.array([ecc2], pa.int64())},
    )


def _q_kg_modularity(sf_dir: str):
    """Newman modularity Q of the 3-round LPA communities over the KG's
    undirected simple graph (stages/graph.modularity): computed exactly
    from three integers (m, intra-community edges, Σ_c deg_c²) so the
    two trailing double divides are the ONLY FP ops — block-layout
    independent with no per-community float accumulation. Oracle: the
    sql_kg_communities + kg_triples subqueries with the identical
    one-expression double (text_oracles.sql_kg_modularity)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import (
        label_propagation,
        modularity,
    )

    edges = edges_from_triples(_kg_triples(sf_dir)).materialize()
    labels = label_propagation(edges, rounds=3)
    return modularity(edges, labels)


def _q_kg_ktruss(sf_dir: str):
    """Bounded 3-round 3-truss peel over the KG's undirected simple
    graph (stages/graph.ktruss_edges): each round recomputes per-edge
    triangle support on the surviving edges (scale-switched wedge
    machinery) and drops uncorroborated edges (support < 1) — the
    'relation backed by a third party' KG-cleaning filter, exact
    rounds-prefix semantics like kcore. Oracle: unrolled per-round
    support self-joins (text_oracles.sql_kg_ktruss)."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import ktruss_edges

    return ktruss_edges(edges_from_triples(_kg_triples(sf_dir)), k=3, rounds=3)


def _q_kg_pagerank(sf_dir: str):
    """Deterministic integer PageRank (stages/graph.pagerank, 5 rounds)
    over the KG edge set → top-20 nodes by (pr desc, node_id). The
    scaled-int recurrence makes the iterative distributed computation
    bit-reproducible against the unrolled-CTE SQL twin."""
    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import pagerank, pagerank_topk

    pr = pagerank(edges_from_triples(_kg_triples(sf_dir)), iterations=5)
    return pagerank_topk(pr, 20)


def _q_kg_ppr(sf_dir: str):
    """PERSONALIZED integer PageRank (stages/graph.pagerank with
    seeds = the HAS_TOPIC objects — topic nodes, 5 rounds) over the KG
    edge set → top-20 by (pr desc, node_id). The restart mass lands
    only on seeds and pr0 = scale·[seed]; same all-integer floor
    recurrence as kg_pagerank, so the seeded variant is
    bit-reproducible against the unrolled-CTE SQL twin
    (text_oracles.sql_kg_ppr). The seed flag rides one LEFT
    coarse_attach in the distributed regime; driver regime collects
    the seed set (a subset of the already-driver-resident nodes)."""
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import pagerank, pagerank_topk

    triples = _kg_triples(sf_dir).materialize()
    seeds = triples.filter(expr="pred == 'HAS_TOPIC'").map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": pc.cast(t.column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    pr = pagerank(edges_from_triples(triples), iterations=5, seeds=seeds)
    return pagerank_topk(pr, 20)


def _q_kg_bfs(sf_dir: str):
    """Multi-source BFS hop distance over the KG edge set
    (stages/graph.bfs_hops): seeds = every HAS_TOPIC object (the topic
    nodes), undirected edges, max 4 hops → (node_id, dist) = exact min
    hop count. Scale-switched like pagerank/CC: driver numpy twin below
    the edge threshold, distributed min-distance propagation above
    (regimes parity-pytested in tests/test_graph.py). Oracle: bounded
    recursive-CTE reachability min over the kg_triples SQL subquery."""
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import bfs_hops

    triples = _kg_triples(sf_dir).materialize()
    seeds = triples.filter(
        expr="pred == 'HAS_TOPIC'"
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": pc.cast(t.column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    return bfs_hops(seeds, edges_from_triples(triples), max_hops=4)


def _q_kg_weighted_paths(sf_dir: str):
    """Bounded multi-source WEIGHTED shortest paths
    (stages/graph.weighted_hops): seeds = every HAS_TOPIC object, edge
    weight = length(pred) (integer — no FP in the min-plus relaxation),
    undirected, ≤4 relaxation rounds → (node_id, dist) = exact minimum
    weighted distance over ≤4-edge paths. Scale-switched like
    kg_bfs/pagerank/CC (driver numpy twin below the edge threshold,
    distributed min-plus propagation above; regimes parity-pytested).
    Oracle: bounded recursive-CTE min over the kg_triples subquery."""
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import weighted_hops

    triples = _kg_triples(sf_dir).materialize()
    seeds = triples.filter(expr="pred == 'HAS_TOPIC'").map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": pc.cast(t.column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    edges = edges_from_triples(triples).map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t.column("src"), "dst": t.column("dst"),
             "w": pc.cast(pc.utf8_length(t.column("rel")), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return weighted_hops(seeds, edges, max_rounds=4)


def _q_kg_assortativity(sf_dir: str):
    """Degree ASSORTATIVITY of the KG (Newman's r): the Pearson
    correlation of endpoint degrees over the symmetrized edge stubs —
    the one-scalar diagnostic of hub-to-hub vs hub-to-leaf wiring that
    decides salting strategy for graph ops. Exact integer moment sums
    (arbitrary-precision string partials, the cov_qty_price pattern —
    Σdeg² products overflow int64 on hub-heavy webscale graphs) →
    mirrored one-divide/two-sqrt float chain; NULL when the degree
    variance is zero on either side.

    Scale shape: degrees = one node-bounded groupby; two coarse_attach
    passes put (deg_x, deg_y) on every stub; moment partials leave each
    block as ≤1 row."""
    import math

    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.util import coarse_attach

    triples = _kg_triples(sf_dir).materialize()
    e1 = edges_from_triples(triples).map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": pc.cast(t.column("src"), pa.string()),
             "dst": pc.cast(t.column("dst"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    sym = e1.union(
        e1.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t.column("dst"), "dst": t.column("src")}
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["src"]).aggregate([("src", "count")])
        return out.rename_columns(["node", "d"])

    from ray.data.aggregate import Sum

    deg = (
        sym.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
        .materialize()
    )

    with_x = coarse_attach(
        sym, deg, left_key="src", right_key="node", attach_cols=["deg"],
        attach_as=["deg_x"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("deg_x", pa.int64())]
        ),
    )
    with_xy = coarse_attach(
        with_x, deg, left_key="dst", right_key="node", attach_cols=["deg"],
        attach_as=["deg_y"],
        out_schema=pa.schema(
            [("src", pa.string()), ("dst", pa.string()),
             ("deg_x", pa.int64()), ("deg_y", pa.int64())]
        ),
    )

    partial_schema = pa.schema(
        [("n", pa.int64()), ("sx", pa.string()), ("sy", pa.string()),
         ("sxy", pa.string()), ("sxx", pa.string()), ("syy", pa.string())]
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("deg_x").to_numpy(zero_copy_only=False).astype(object)
        y = t.column("deg_y").to_numpy(zero_copy_only=False).astype(object)
        return pa.Table.from_pydict(
            {"n": [len(x)], "sx": [str(sum(x))], "sy": [str(sum(y))],
             "sxy": [str(sum(x * y))], "sxx": [str(sum(x * x))],
             "syy": [str(sum(y * y))]},
            schema=partial_schema,
        )

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"n": [int(pc.sum(t.column("n")).as_py() or 0)],
             **{c: [str(sum(int(x) for x in t.column(c).to_pylist()))]
                for c in ("sx", "sy", "sxy", "sxx", "syy")}},
            schema=partial_schema,
        )

    # fan-in-64 tree (table_checksum shape): driver sees ≤64 partials
    parts = with_xy.map_batches(moments, batch_format="pyarrow")
    k = parts.count()
    while k > 64:
        parts = parts.repartition(max(1, (k + 63) // 64)).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
        k = parts.count()
    n = sx = sy = sxy = sxx = syy = 0
    for r in parts.take_all():
        n += r["n"]
        sx += int(r["sx"])
        sy += int(r["sy"])
        sxy += int(r["sxy"])
        sxx += int(r["sxx"])
        syy += int(r["syy"])
    num = n * sxy - sx * sy
    dxx = n * sxx - sx * sx
    dyy = n * syy - sy * sy
    r_val = (
        float(num) / (math.sqrt(float(dxx)) * math.sqrt(float(dyy)))
        if dxx > 0 and dyy > 0 else None
    )
    return pa.Table.from_pydict(
        {"n_stubs": pa.array([n], pa.int64()),
         "assortativity": pa.array([r_val], pa.float64())}
    )


KG_DIFF_DROP_TOPIC = "scans"
KG_DIFF_ADD_TOPIC = ("storage", ["column", "row"])


def _kg_diff_taxonomy() -> dict[str, list[str]]:
    mod = {k: v for k, v in TESTDATA_TAXONOMY.items()
           if k != KG_DIFF_DROP_TOPIC}
    mod[KG_DIFF_ADD_TOPIC[0]] = list(KG_DIFF_ADD_TOPIC[1])
    return mod


def _q_kg_diff(sf_dir: str):
    """KG SNAPSHOT DIFF — incremental-maintenance on the hard gate: the
    taxonomy changes (topic 'scans' dropped, topic 'storage' added) and
    the diff emits exactly the (subj, pred, obj) triples added/removed
    between the two KG builds — what a production KG pipeline publishes
    per refresh instead of a full rebuild downstream.

    Scale shape: both builds stream the same corpus; the compare is ONE
    triple-keyed coarse cogroup (per-partition presence flags — neither
    snapshot materializes on the driver). The oracle is the two
    generated kg_triples subqueries EXCEPTed both ways."""
    import pandas as pd
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import build_triples
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    def build(tax: dict[str, list[str]]):
        rows = [(t, p) for t, ps in tax.items() for p in ps]
        tax_table = pa.Table.from_pydict(
            {"broad_topic": [r[0] for r in rows],
             "phrase": [r[1] for r in rows]}
        )
        docs = read_docs(sf_dir, ["doc_id", "text"])
        return build_triples(
            text_table_to_spans(docs), tax_table,
            _testdata_phrase_docs(sf_dir), TESTDATA_GAZETTEER,
            concurrency=(1, 4), batch_size=128,
        ).triples

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"subj": pc.cast(t.column("subj"), pa.string()),
                 "pred": pc.cast(t.column("pred"), pa.string()),
                 "obj": pc.cast(t.column("obj"), pa.string()),
                 "side": pa.array([side] * t.num_rows, pa.int64())}
            )
        return fn

    both = _kg_triples(sf_dir).map_batches(  # memoized base snapshot
        tag(0), batch_format="pyarrow"
    ).union(
        build(_kg_diff_taxonomy()).map_batches(tag(1), batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [("subj", pa.string()), ("pred", pa.string()),
         ("obj", pa.string()), ("status", pa.string())]
    )

    def diff(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        g = df.groupby(["subj", "pred", "obj"])["side"].agg(["min", "max"])
        removed = g[(g["min"] == 0) & (g["max"] == 0)].index
        added = g[(g["min"] == 1) & (g["max"] == 1)].index
        rows = [(s, p, o, "removed") for s, p, o in removed] + \
               [(s, p, o, "added") for s, p, o in added]
        if not rows:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {"subj": [r[0] for r in rows], "pred": [r[1] for r in rows],
             "obj": [r[2] for r in rows], "status": [r[3] for r in rows]},
            schema=out_schema,
        )

    return coarse_partition_apply(
        both, ["subj", "pred", "obj"], diff, out_schema
    )


def _q_corpus_near_clean(sf_dir: str):
    """Near-dup dedup APPLIED (the MinHash analogue of corpus_clean's
    exact dedup): the surviving corpus after LSH near-dup clustering —
    one representative (min doc id) per near-dup cluster, singletons
    untouched — with language provenance attached. The
    curation composition an LLM-data pipeline actually ships: cluster →
    select representative → rebuild corpus.

    Scale shape: the full scale-switched minhash_lsh_clusters pipeline
    (signatures → banding → verified pairs → CC), then a stateless
    representative filter and ONE coarse_attach for the provenance
    column — no driver materialization anywhere."""
    import pyarrow.compute as pc
    import ray.data as rd

    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.stages.util import coarse_attach

    clusters = minhash_lsh_clusters(
        read_docs(sf_dir, ["doc_id", "text"]), threshold=0.6
    )
    reps = clusters.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.filter(
                pc.cast(t.column("doc_id"), pa.string()),
                pc.equal(pc.cast(t.column("doc_id"), pa.string()),
                         pc.cast(t.column("cluster"), pa.string())),
            )}
        ),
        batch_format="pyarrow",
    )
    lang = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t.column("doc_id"), pa.string()),
             "lang": t.column("lang")}
        ),
        batch_format="pyarrow",
    )
    return coarse_attach(
        reps, lang, left_key="doc_id", right_key="doc_id",
        attach_cols=["lang"],
        out_schema=pa.schema([("doc_id", pa.string()), ("lang", pa.string())]),
    )


def _q_centroid_distances(sf_dir: str):
    """EXACT pairwise distances between per-label embedding centroids —
    the cluster-separation diagnostic for IVF/k-means quality. The
    centroid never exists as a float: per-(label, dim) integer sums s
    and counts n (the centroid_by_label scaling), and the squared
    distance between centroids a, b is Σ_k (s_ak·n_b − s_bk·n_a)² —
    an exact integer (common denominator (n_a·n_b·10⁶)²), emitted as a
    decimal string plus ONE mirrored sqrt/divide chain for the human
    number. No order-dependent float summation anywhere.

    Scale shape: the same |labels|·dim-bounded partials as
    centroid_by_label; the pairwise pass is driver math over the
    |labels|²·dim-bounded sums (labels are model classes, never
    row-scale)."""
    import math

    from semantic_search_system_ray.pipelines.queries import (
        q_centroid_by_label,  # noqa: F401  (same scaling contract)
        _p,
    )
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["label", "embedding"])
    part_schema = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()),
         ("s", pa.int64()), ("cnt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        col = t.column("embedding").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        dim = len(col[0])
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        ).reshape(t.num_rows, dim)
        x = mat * 1_000_000.0
        scaled = np.trunc(x + np.copysign(0.5, x)).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, inv, scaled)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        L = len(uniq)
        return pa.Table.from_pydict(
            {"label": np.repeat(uniq, dim),
             "dim": np.tile(np.arange(dim, dtype=np.int64), L),
             "s": sums.reshape(-1),
             "cnt": np.repeat(cnts, dim)},
            schema=part_schema,
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="n"))
        .take_all()  # |labels| × dim — domain-bounded
    )
    by_label: dict = {}
    for r in rows:
        e = by_label.setdefault(int(r["label"]), {})
        e[int(r["dim"])] = (int(r["s"]), int(r["n"]))
    labels = sorted(by_label)
    out = {"label_a": [], "label_b": [], "d2": [], "dist": []}
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            da, db = by_label[a], by_label[b]
            n_a = next(iter(da.values()))[1]
            n_b = next(iter(db.values()))[1]
            d2 = sum(
                (da[k][0] * n_b - db[k][0] * n_a) ** 2 for k in sorted(da)
            )
            out["label_a"].append(a)
            out["label_b"].append(b)
            out["d2"].append(str(d2))
            out["dist"].append(
                math.sqrt(float(d2))
                / (float(n_a * n_b) * 1_000_000.0)
            )
    return pa.Table.from_pydict(
        {"label_a": pa.array(out["label_a"], pa.int64()),
         "label_b": pa.array(out["label_b"], pa.int64()),
         "d2": pa.array(out["d2"], pa.string()),
         "dist": pa.array(out["dist"], pa.float64())}
    )


SQL_CENTROID_DISTANCES = """
WITH u AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS s
  FROM embeddings
),
c AS (
  SELECT CAST(label AS BIGINT) AS label, dim,
         CAST(sum(s) AS HUGEINT) AS s, CAST(count(*) AS HUGEINT) AS n
  FROM u GROUP BY label, dim
),
p AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum((a.s * b.n - b.s * a.n) * (a.s * b.n - b.s * a.n)) AS d2,
         max(a.n) AS n_a, max(b.n) AS n_b
  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
)
SELECT label_a, label_b, CAST(d2 AS VARCHAR) AS d2,
       sqrt(CAST(d2 AS DOUBLE))
         / (CAST(n_a * n_b AS DOUBLE) * 1000000.0) AS dist
FROM p
"""


def _q_search_lexical(sf_dir: str):
    import pyarrow.compute as pc
    from semantic_search_system_ray.pipelines.search import search_lexical
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    out = search_lexical(docs, "hash join table scan", k=20)
    # normalized score rounded to 4dp on BOTH sides of the oracle compare
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("normalized_score_100"),
            "normalized_score_100",
            pc.round(t.column("normalized_score_100"), 4),
        ),
        batch_format="pyarrow",
    )


def _q_search_rerank(sf_dir: str):
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.search import rerank, search_lexical
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    top = search_lexical(docs, "merge sort window", k=30)
    # bounded candidate-id fetch (k ≤ 30) → vectorized is_in filter
    ids = pa.array(sorted({str(r["doc_id"]) for r in top.take_all()}), pa.string())
    candidates = docs.map_batches(
        lambda t, ids=ids: t.filter(
            pc.is_in(pc.cast(t.column("doc_id"), pa.string()), value_set=ids)
        ),
        batch_format="pyarrow",
    )
    return rerank(candidates, "merge sort window", top_n=10)


def _q_search_bm25(sf_dir: str):
    """BM25 retrieval (the reference's OpenSearch default scorer,
    rebuilt): one query-term-bounded aggregate pass broadcast into a
    vectorized scorer — deterministic cross-system (|q| ln() calls on
    one libm; the rest IEEE arithmetic), oracle-checked."""
    from semantic_search_system_ray.pipelines.search import search_bm25
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    return search_bm25(docs, "stream table hash window", k=10)


def _q_search_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 and
    lexical-overlap rankings (pipelines/search.search_rrf) — integer
    floor contributions scale//(60+rank), exact int64 fused scores.
    Oracle: text_oracles.sql_search_rrf over the two ranking twins."""
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.pipelines.search import search_rrf

    docs = read_docs(sf_dir, ["doc_id", "text"])
    return search_rrf(docs, "stream table hash window", k=20)


def _q_rag_answer(sf_dir: str):
    """Grounded RAG QA (reference A10, app.py:20-66) with the LLM
    composer replaced by a deterministic extractive surrogate — same
    stand-in policy as the NER gazetteer; retrieve->rank->compose is the
    real pipeline, fully oracle-checked."""
    from semantic_search_system_ray.pipelines.search import rag_answer
    from semantic_search_system_ray.pipelines.queries import read_docs

    docs = read_docs(sf_dir, ["doc_id", "text"])
    return rag_answer(docs, "stream table hash window", k=5)


def _taxonomy_of(sf_dir: str):
    import ray.data as rd

    from semantic_search_system_ray.pipelines.queries import q_word_topk
    from semantic_search_system_ray.pipelines.topic_model import build_taxonomy

    top_words = q_word_topk(sf_dir).take_all()
    phrases = rd.from_items([{"phrase": r["word"]} for r in top_words])
    return build_taxonomy(phrases, num_topics=6), phrases


def _q_taxonomy_build(sf_dir: str):
    """k-means over hash embeddings is iterative (not SQL-expressible as
    values), so — like the ANN entries since r4 — the gate row form is a
    PROPERTY CERTIFICATE the DuckDB oracle hash-checks as constants:

    - partition_exact: output phrases == the distinct cleaned input
      phrases, each in exactly one topic;
    - topics_le_k: ≤ num_topics distinct topics, ≥ 1;
    - labels_are_members: every topic label is a member of its own topic
      (the reference's centroid-nearest-phrase labeling semantic);
    - rerun_identical: a full second build yields the identical
      (broad_topic, phrase) set — the determinism contract, previously
      only pytest-pinned.

    The taxonomy VALUES stay covered by the seeded-fixture golden in
    tests/test_search_topics_ingest.py and remain available via
    pipelines.topic_model.build_taxonomy."""
    from semantic_search_system_ray.functions.text import clean_text_topic

    tax1, phrases = _taxonomy_of(sf_dir)
    rows1 = {(r["broad_topic"], r["phrase"]) for r in tax1.take_all()}
    tax2, _ = _taxonomy_of(sf_dir)
    rows2 = {(r["broad_topic"], r["phrase"]) for r in tax2.take_all()}

    cleaned = {
        clean_text_topic(r["phrase"]) for r in phrases.take_all()
    } - {""}
    out_phrases = [p for _t, p in rows1]
    by_topic: dict[str, set] = {}
    for t, p in rows1:
        by_topic.setdefault(t, set()).add(p)

    checks = {
        "partition_exact": (
            sorted(out_phrases) == sorted(set(out_phrases))
            and set(out_phrases) == cleaned
        ),
        "topics_le_k": 1 <= len(by_topic) <= 6,
        "labels_are_members": all(t in ps for t, ps in by_topic.items()),
        "rerun_identical": rows1 == rows2,
    }
    return pa.Table.from_pydict(
        {"check_name": pa.array(sorted(checks), pa.string()),
         "ok": pa.array([checks[k] for k in sorted(checks)], pa.bool_())}
    )


SQL_TAXONOMY_CERT = """
SELECT 'labels_are_members' AS check_name, TRUE AS ok
UNION ALL SELECT 'partition_exact', TRUE
UNION ALL SELECT 'rerun_identical', TRUE
UNION ALL SELECT 'topics_le_k', TRUE
"""


def _q_doc_topic_words(sf_dir: str):
    import pyarrow as pa_
    from semantic_search_system_ray.stages.textstats import doc_topic_words_batch
    from semantic_search_system_ray.pipelines.queries import read_docs

    ds = read_docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(doc_topic_words_batch, batch_format="pyarrow")
    # list<string> → ' '-joined string so the driver's value hash is
    # list-free (the SQL oracle string_aggs identically)
    return out.map_batches(
        lambda t: pa_.Table.from_pydict(
            {"doc_id": t.column("doc_id"),
             "topic_words": pa_.array(
                 [" ".join(v) for v in t.column("topic_words").to_pylist()],
                 pa_.string())}
        ),
        batch_format="pyarrow",
    )


_KG_CURATED_CACHE: dict[str, Any] = {}


def _q_kg_curated_triples(sf_dir: str):
    """CURATED FLAGSHIP composition — the KG build consuming the
    engine's own curation funnel, exactly what a training-data KG
    pipeline runs in production: curation_e2e decides per-doc verdicts
    (Gopher rules → exact dedup → decontamination), only 'kept' docs
    flow into spans → DocNLP → canonicalization → triple dedup. The
    keep set semi-joins the corpus by ONE hash attach (doc ids only —
    text never rides the verdict exchange); phrase→doc fixtures are
    regenerated FROM the curated set so RELATES_TO_DOC can't reference
    dropped docs. Oracle: the identical kg_triples matcher SQL over the
    curation CTE's kept rows (text_oracles.sql_kg_curated_triples —
    the corpus relation is a parameter, one source of truth).

    Memoized per sf_dir like _kg_triples: the curated extract serves
    both this query and kg_curation_diff's curated leg — the funnel +
    matcher run once per session, the diff pays only the anti join."""
    cached = _KG_CURATED_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.kg_build import build_triples
    from semantic_search_system_ray.pipelines.queries import QUERIES, read_docs
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.stages.util import coarse_attach

    verdicts = QUERIES["curation_e2e"](sf_dir)
    kept = verdicts.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(
                t.filter(pc.equal(t.column("stage"), "kept"))
                .column("doc_id"), pa.int64()),
             "one": pa.nulls(
                 t.filter(pc.equal(t.column("stage"), "kept")).num_rows,
                 pa.int64())},
        ),
        batch_format="pyarrow",
    )
    docs = read_docs(sf_dir, ["doc_id", "text"])
    docs_kept = coarse_attach(
        docs, kept, left_key="doc_id", right_key="doc_id",
        attach_cols=["one"],
        out_schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()),
             ("one", pa.int64())]
        ),
        how="inner",
    ).select_columns(["doc_id", "text"]).materialize()

    res = build_triples(
        text_table_to_spans(docs_kept), _testdata_taxonomy_table(),
        _phrase_docs_from(docs_kept), TESTDATA_GAZETTEER,
        concurrency=(1, 4), batch_size=128,
    )
    triples = res.triples.materialize()
    _KG_CURATED_CACHE[sf_dir] = triples
    return triples


def _q_kg_store_roundtrip(sf_dir: str):
    """KG STORE materialization + read-back (S15/S16 graph sink as a
    durable parquet store, the north star's 'materialize deduplicated
    triples plus a node/edge store'): the triple set writes to
    PRED-PARTITIONED parquet under /tmp (one directory per predicate —
    the resumable layout: a failed run skips finished partitions), a
    fresh read_parquet loads it back, and the result is the per-pred
    profile of the READ-BACK store — so the oracle (the kg_pred_stats
    SQL over the in-memory triples) passing proves the sink/source
    roundtrip is lossless. Hive partitioning restores the pred column
    from directory keys."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    import ray.data as rd

    # per-invocation unique dir: two concurrent runs on same-basename
    # corpora must not rmtree under each other's read_parquet
    out_dir = tempfile.mkdtemp(prefix="kg_store_")
    try:
        triples = _kg_triples(sf_dir)
        triples.map_batches(
            lambda t: pa.Table.from_pydict(
                {"subj": pc.cast(t.column("subj"), pa.string()),
                 "pred": pc.cast(t.column("pred"), pa.string()),
                 "obj": pc.cast(t.column("obj"), pa.string())},
            ),
            batch_format="pyarrow",
        ).write_parquet(out_dir, partition_cols=["pred"])
        back = rd.read_parquet(out_dir)
        # hive partition values read back as dictionary-encoded strings;
        # normalize to plain utf8 for the shared fold
        back = back.map_batches(
            lambda t: pa.Table.from_pydict(
                {"subj": pc.cast(t.column("subj"), pa.string()),
                 "pred": pc.cast(t.column("pred"), pa.string()),
                 "obj": pc.cast(t.column("obj"), pa.string())},
            ),
            batch_format="pyarrow",
        )
        # materialize the profile before deleting the store files the
        # lazy plan still reads from
        return _pred_stats(back).materialize()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _q_kg_incremental_rebuild(sf_dir: str):
    """INCREMENTAL FLAGSHIP REBUILD (VERDICT r4 #6; the reference's
    ``processed:false`` work-queue semantics,
    ``/root/reference/ingest/pr_meta_store.py:55-63``): the corpus splits
    90/10 by doc_id % 10, the 90% base builds the CHECKPOINTED KG
    (runner Phase A per-partition extract + Phase B global canon/dedup),
    the 10% delta is APPENDED as new parquet shards, and
    ``run_incremental`` re-extracts ONLY the delta partitions (committed
    base partitions untouched — asserted via their manifest checksums)
    before the light global Phase B recommit. The engine then asserts
    the final store's order-independent checksum and row count equal the
    from-scratch flagship build's (``_kg_triples``) — raising loudly on
    drift — and returns the store's per-pred profile. Oracle: the pred
    profile of the full kg_triples matcher SQL (sql_kg_pred_stats), so
    a green row proves the incremental rebuild is lossless and
    bit-identical to the full rebuild."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.pipelines.runner import (
        _triples_checksum,
        run_incremental,
        run_kg,
    )
    from semantic_search_system_ray.sources.documents import text_table_to_spans
    from semantic_search_system_ray.state.manifest import Manifest

    docs_dir = tempfile.mkdtemp(prefix="kg_incr_docs_")
    out_dir = tempfile.mkdtemp(prefix="kg_incr_out_")
    try:
        spans = text_table_to_spans(read_docs(sf_dir, ["doc_id", "text"]))

        def _split(keep_delta: bool):
            def f(t: pa.Table) -> pa.Table:
                ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                mask = (ids % 10 == 0) == keep_delta
                return t.filter(pa.array(mask))
            return f

        spans.map_batches(
            _split(False), batch_format="pyarrow"
        ).write_parquet(docs_dir)
        tax, phrase_docs = _testdata_taxonomy_table(), _testdata_phrase_docs(sf_dir)
        run_kg(
            docs_dir, tax, phrase_docs, TESTDATA_GAZETTEER, out_dir,
            num_parts=8, concurrency=(1, 4), batch_size=128,
        )
        m = Manifest(out_dir)
        base_chk = {
            k: m.record("raw_triples", k).checksum
            for k in m.committed("raw_triples")
        }

        # APPEND the delta shards, rebuild incrementally
        spans.map_batches(
            _split(True), batch_format="pyarrow"
        ).write_parquet(docs_dir)
        res = run_incremental(
            docs_dir, tax, phrase_docs, TESTDATA_GAZETTEER, out_dir,
            concurrency=(1, 4), batch_size=128,
        )

        m2 = Manifest(out_dir)
        for k, chk in base_chk.items():  # base partitions not re-extracted
            if m2.record("raw_triples", k).checksum != chk:
                raise AssertionError(f"base partition {k} was re-extracted")
        full = _kg_triples(sf_dir)
        if _triples_checksum(res.triples) != _triples_checksum(full):
            raise AssertionError("incremental store checksum != full rebuild")
        if res.triples.count() != full.count():
            raise AssertionError("incremental store row count != full rebuild")
        return _pred_stats(res.triples).materialize()
    finally:
        shutil.rmtree(docs_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def _q_kg_curation_diff(sf_dir: str):
    """Curation IMPACT report on the KG: per predicate, triples asserted
    by the full corpus vs by the curated corpus (kg_curated_triples) and
    the drop count — the review artifact that says what knowledge a
    cleaning pass costs. Composite-key distributed ANTI join (full
    minus curated; the probe key set only ever exists per partition) →
    pred-bounded count folds. Oracle: the two matcher SQLs EXCEPT'd
    (text_oracles.sql_kg_curation_diff)."""
    import pyarrow.compute as pc

    import ray

    from semantic_search_system_ray.stages.util import coarse_anti_join

    full = _kg_triples(sf_dir)
    cur = _q_kg_curated_triples(sf_dir)  # memoized materialized handle

    def keyed(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("subj"), pa.string())
        p = pc.cast(t.column("pred"), pa.string())
        o = pc.cast(t.column("obj"), pa.string())
        return pa.Table.from_pydict(
            {"key": pc.binary_join_element_wise(s, p, o, "\x1f"),
             "pred": p}
        )

    dropped = coarse_anti_join(
        full.map_batches(keyed, batch_format="pyarrow"),
        cur.map_batches(keyed, batch_format="pyarrow"),
        left_key="key", right_key="key",
        out_schema=pa.schema([("pred", pa.string())]),
    )

    def pred_counts(ds) -> dict:
        acc: dict[str, int] = {}
        for tbl in ray.get(
            ds.map_batches(
                lambda t: t.group_by(["pred"]).aggregate([("pred", "count")]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        ):
            if tbl.num_rows == 0 or "pred" not in tbl.schema.names:
                continue
            for p, n in zip(tbl.column("pred").to_pylist(),
                            tbl.column("pred_count").to_pylist()):
                acc[p] = acc.get(p, 0) + int(n)
        return acc

    n_full = pred_counts(full)
    n_drop = pred_counts(dropped)
    preds = sorted(n_full)
    return pa.Table.from_pydict(
        {"pred": pa.array(preds, pa.string()),
         "n_full": pa.array([n_full[p] for p in preds], pa.int64()),
         "n_curated": pa.array(
             [n_full[p] - n_drop.get(p, 0) for p in preds], pa.int64()),
         "n_dropped": pa.array(
             [n_drop.get(p, 0) for p in preds], pa.int64())}
    )


def _q_kg_rich_club(sf_dir: str):
    """RICH-CLUB coefficients of the KG's undirected simple graph: for
    degree thresholds k ∈ {2,4,8,16}, how densely the deg>k hubs
    interconnect (phi = 2E/(N(N−1))) — the hub-collusion diagnostic
    that separates a natural entity graph from a boilerplate-dominated
    one. ONE shared simple-edge distinct + degree pass, two hash
    attaches put endpoint degrees on edges, then per-block conditional
    int64 counters per threshold (4 partial rows per block) and a
    driver fold; phi is the single mirrored 6dp-floored divide.
    Oracle: text_oracles.sql_kg_rich_club."""
    import pyarrow.compute as pc

    import ray

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import (
        _simple_degrees,
        undirected_simple_edges,
    )
    from semantic_search_system_ray.stages.util import coarse_attach

    THRESH = (2, 4, 8, 16)
    und = undirected_simple_edges(
        edges_from_triples(_kg_triples(sf_dir))
    ).materialize()
    deg = _simple_degrees(und, None).materialize()

    e1 = coarse_attach(
        und, deg, left_key="a", right_key="node_id", attach_cols=["deg"],
        attach_as=["da"],
        out_schema=pa.schema(
            [("b", pa.string()), ("da", pa.int64())]
        ),
        how="inner",
    )
    e2 = coarse_attach(
        e1, deg, left_key="b", right_key="node_id", attach_cols=["deg"],
        attach_as=["db"],
        out_schema=pa.schema(
            [("da", pa.int64()), ("db", pa.int64())]
        ),
        how="inner",
    )

    part_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def edge_partial(t: pa.Table) -> pa.Table:
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        ks, ns = [], []
        for k in THRESH:
            ks.append(k)
            ns.append(int(((da > k) & (db > k)).sum()))
        return pa.Table.from_pydict(
            {"k": pa.array(ks, pa.int64()), "n": pa.array(ns, pa.int64())},
            schema=part_schema,
        )

    def node_partial(t: pa.Table) -> pa.Table:
        dg = t.column("deg").to_numpy(zero_copy_only=False)
        ks, ns = [], []
        for k in THRESH:
            ks.append(k)
            ns.append(int((dg > k).sum()))
        return pa.Table.from_pydict(
            {"k": pa.array(ks, pa.int64()), "n": pa.array(ns, pa.int64())},
            schema=part_schema,
        )

    def fold(ds) -> dict:
        acc = {k: 0 for k in THRESH}
        for tbl in ray.get(ds.to_arrow_refs()):
            # empty input blocks pass through with their source schema
            if tbl.num_rows == 0 or "k" not in tbl.schema.names:
                continue
            for k, n in zip(tbl.column("k").to_pylist(),
                            tbl.column("n").to_pylist()):
                acc[int(k)] += int(n)
        return acc

    n_k = fold(deg.map_batches(node_partial, batch_format="pyarrow"))
    e_k = fold(e2.map_batches(edge_partial, batch_format="pyarrow"))

    out = {"k": [], "n_nodes": [], "n_edges": [], "phi": []}
    import numpy as np

    for k in THRESH:
        n, e = n_k[k], e_k[k]
        if n < 2:
            continue
        out["k"].append(k)
        out["n_nodes"].append(n)
        out["n_edges"].append(e)
        out["phi"].append(
            float(np.floor(2.0 * float(e) / (float(n) * float(n - 1))
                           * 1e6 + 0.5) / 1e6)
        )
    return pa.Table.from_pydict(
        {"k": pa.array(out["k"], pa.int64()),
         "n_nodes": pa.array(out["n_nodes"], pa.int64()),
         "n_edges": pa.array(out["n_edges"], pa.int64()),
         "phi": pa.array(out["phi"], pa.float64())}
    )


def _q_kg_entity_provenance(sf_dir: str):
    """Per-entity PROVENANCE profile: supporting-doc count, distinct
    source count, and the dominant source (count DESC, source ASC) for
    every entity the KG mentions — the corroboration signal entity
    resolution and fact-confidence scoring read (reference analogue:
    the per-doc metadata the NER writer carries,
    knowledge_graph/knowledge_graph.py MERGE payloads). MENTIONS triples
    attach the doc's source by ONE hash join against a 2-column pruned
    documents read; per-block (entity, source) count combiners → ONE
    entity-keyed coarse cogroup (per-entity source domain is
    schema-bounded). Oracle: text_oracles.sql_kg_entity_provenance."""
    import pandas as pd
    import pyarrow.compute as pc

    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    t = _kg_triples(sf_dir)
    mentions = t.map_batches(
        lambda tb: pa.Table.from_pydict(
            {"d": pc.cast(
                tb.filter(pc.equal(tb.column("pred"), "MENTIONS"))
                .column("subj"), pa.string()),
             "entity": pc.cast(
                 tb.filter(pc.equal(tb.column("pred"), "MENTIONS"))
                 .column("obj"), pa.string())},
        ),
        batch_format="pyarrow",
    )
    docs = read_docs(sf_dir, ["doc_id", "source"])
    with_src = coarse_attach(
        mentions, docs, left_key="d", right_key="doc_id",
        attach_cols=["source"],
        out_schema=pa.schema(
            [("entity", pa.string()), ("source", pa.string())]
        ),
        how="inner",
    )

    part_schema = pa.schema(
        [("entity", pa.string()), ("source", pa.string()),
         ("n", pa.int64())]
    )

    def counts(tb: pa.Table) -> pa.Table:
        g = tb.group_by(["entity", "source"]).aggregate([("source", "count")])
        return pa.Table.from_pydict(
            {"entity": g.column("entity"), "source": g.column("source"),
             "n": pc.cast(g.column("source_count"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("entity", pa.string()), ("n_docs", pa.int64()),
         ("n_sources", pa.int64()), ("top_source", pa.string()),
         ("top_source_docs", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["entity", "source"], sort=False)["n"].sum()
        agg = agg.reset_index().sort_values(
            ["entity", "n", "source"], ascending=[True, False, True],
            kind="mergesort",
        )
        rows = {"entity": [], "n_docs": [], "n_sources": [],
                "top_source": [], "top_source_docs": []}
        for ent, g in agg.groupby("entity", sort=False):
            rows["entity"].append(ent)
            rows["n_docs"].append(int(g["n"].sum()))
            rows["n_sources"].append(len(g))
            rows["top_source"].append(g["source"].iloc[0])
            rows["top_source_docs"].append(int(g["n"].iloc[0]))
        return pa.Table.from_pydict(
            {"entity": pa.array(rows["entity"], pa.string()),
             "n_docs": pa.array(rows["n_docs"], pa.int64()),
             "n_sources": pa.array(rows["n_sources"], pa.int64()),
             "top_source": pa.array(rows["top_source"], pa.string()),
             "top_source_docs": pa.array(rows["top_source_docs"],
                                         pa.int64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        with_src.map_batches(counts, batch_format="pyarrow"),
        ["entity"], fold, out_schema,
    )


def _q_minhash_calibration(sf_dir: str):
    """MinHash estimator calibration over the LSH candidate pairs
    (stages/dedup.minhash_calibration): per exact integer estimate bin
    (signature matches·10 // 64), candidate count and POOLED true
    shingle Jaccard (Σ inter / Σ union — associative int64 sums, one
    trailing divide). The threshold-picking metrology report for the
    near-dup stack. Oracle: the shared sig/band CTE prefix + exact
    shingle self-join (text_oracles.sql_minhash_calibration)."""
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.dedup import minhash_calibration

    return minhash_calibration(read_docs(sf_dir, ["doc_id", "text"]))


def _q_kg_conflicts(sf_dir: str):
    """KG CARDINALITY-VIOLATION audit: per predicate, the 20 worst
    multi-valued subjects (distinct-object fanout) with their sorted
    '|'-joined object lists — the functional-predicate QA report a KG
    curation pass runs before asserting uniqueness constraints
    (reference analogue: the one-entity-one-node assumption of
    knowledge_graph/knowledge_graph.py's MERGE writes). Per-block
    distinct (pred, subj, obj) combiners → ONE coarse cogroup keyed by
    (pred, subj) → per-group fanout + object list → grouped_topk (pred
    domain is schema-bounded, so ≤ 20·preds·blocks rows ride the
    combine). Oracle: text_oracles.sql_kg_conflicts."""
    import pandas as pd
    import pyarrow.compute as pc

    from semantic_search_system_ray.stages.util import (
        coarse_partition_apply,
        grouped_topk,
    )

    t = _kg_triples(sf_dir)
    so_schema = pa.schema(
        [("pred", pa.string()), ("subj", pa.string()), ("obj", pa.string())]
    )

    def narrow(tb: pa.Table) -> pa.Table:
        d = pa.Table.from_pydict(
            {"pred": pc.cast(tb.column("pred"), pa.string()),
             "subj": pc.cast(tb.column("subj"), pa.string()),
             "obj": pc.cast(tb.column("obj"), pa.string())},
            schema=so_schema,
        )
        # per-block distinct: the exchange carries unique rows only
        return d.group_by(["pred", "subj", "obj"]).aggregate([])

    g_schema = pa.schema(
        [("pred", pa.string()), ("subj", pa.string()),
         ("n_obj", pa.int64()), ("objs", pa.string())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return g_schema.empty_table()
        d = df.drop_duplicates().sort_values(
            ["pred", "subj", "obj"], kind="mergesort"
        )
        g = (
            d.groupby(["pred", "subj"], sort=False)["obj"]
            .agg(n_obj="size", objs="|".join)
            .reset_index()
        )
        g = g[g["n_obj"] > 1]
        if g.empty:
            return g_schema.empty_table()
        return pa.Table.from_pydict(
            {"pred": g["pred"].to_numpy(), "subj": g["subj"].to_numpy(),
             "n_obj": g["n_obj"].to_numpy().astype("int64"),
             "objs": g["objs"].to_numpy()},
            schema=g_schema,
        )

    multi = coarse_partition_apply(
        t.map_batches(narrow, batch_format="pyarrow"),
        ["pred", "subj"], fold, g_schema,
    )
    return grouped_topk(
        multi, ["pred"], ["n_obj", "subj"], descending=[True, False], k=20
    )


def _q_kg_walk_pairs(sf_dir: str):
    """SKIP-GRAM co-occurrence pairs over the deterministic walk corpus
    (window 2, the node2vec/word2vec training-pair emission): for every
    walk, ordered (center, context) node pairs with 1 <= |step delta|
    <= 2, counted across all walks. Walks are fixed length (steps+1
    rows), so the per-walk self-join is O(1) rows — ONE coarse cogroup
    keyed by walk id with per-partition vectorized pandas merges, then
    one pair-keyed sum (pair domain is edge-neighborhood-bounded, never
    corpus²). Oracle: the full sql_kg_walks query nested as a
    materialized CTE, self-joined on walk id
    (text_oracles.sql_kg_walk_pairs)."""
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import random_walks
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    walks = random_walks(edges_from_triples(_kg_triples(sf_dir)), steps=3)
    pair_schema = pa.schema(
        [("center", pa.string()), ("context", pa.string()), ("n", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pair_schema.empty_table()
        j = df.merge(df, on="walk_id")
        delta = (j["step_x"] - j["step_y"]).abs()
        j = j[(delta >= 1) & (delta <= 2)]
        if j.empty:
            return pair_schema.empty_table()
        agg = (
            j.groupby(["node_x", "node_y"], sort=False)
            .size().reset_index(name="n")
        )
        return pa.Table.from_pydict(
            {"center": agg["node_x"].to_numpy(),
             "context": agg["node_y"].to_numpy(),
             "n": agg["n"].to_numpy().astype("int64")},
            schema=pair_schema,
        )

    pairs = coarse_partition_apply(walks, ["walk_id"], fold, pair_schema)
    out = pairs.groupby(["center", "context"]).aggregate(
        Sum("n", alias_name="n")
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"center": t.column("center"), "context": t.column("context"),
             "n": pc.cast(t.column("n"), pa.int64())},
            schema=pair_schema,
        ),
        batch_format="pyarrow",
    )


def _q_kg_path_transit(sf_dir: str):
    """s-t SHORTEST-PATH TRANSIT counts — the integer Brandes
    pair-dependency numerator: for the (smallest, largest) HAS_TOPIC
    seed pair, every node v on some shortest s-t path with the exact
    count sigma_s(v) * sigma_t(v) of shortest paths THROUGH it (the
    graph is undirected, so the backward sigma IS a forward run from
    t). The two sigma runs are FUSED into one plan (VERDICT r4 #3):
    edges are duplicated under seed-prefixed node ids (two disjoint
    components), and ONE multi-seed shortest_path_counts run walks
    both — one scale-switched BFS and one layer cogroup per hop total,
    half the shuffle rounds of two sequential runs. Then ONE hash
    attach joins the unprefixed halves, a vectorized filter on
    ds + dt = d(s,t). Radius-4 truncation on both engines. Oracle:
    two suffixed sql_kg_sigma layer stacks joined on node
    (text_oracles.sql_kg_path_transit)."""
    import pyarrow.compute as pc

    import ray

    from semantic_search_system_ray.pipelines.kg_build import edges_from_triples
    from semantic_search_system_ray.stages.graph import shortest_path_counts
    from semantic_search_system_ray.stages.util import coarse_attach

    triples = _kg_triples(sf_dir).materialize()
    topic_objs = triples.map_batches(
        lambda t: pa.Table.from_pydict(
            {"obj": pc.cast(
                t.filter(pc.equal(t.column("pred"), "HAS_TOPIC"))
                .column("obj"), pa.string())}
        ),
        batch_format="pyarrow",
    )
    objs = sorted({
        v for tbl in ray.get(
            topic_objs.map_batches(
                lambda t: t.group_by(["obj"]).aggregate([]),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        if tbl.num_rows > 0 and "obj" in tbl.schema.names
        for v in tbl.column("obj").to_pylist()
    })
    seed_s, seed_t = objs[0], objs[-1]
    edges = edges_from_triples(triples)

    out_schema = pa.schema(
        [("node_id", pa.string()), ("ds", pa.int64()), ("dt", pa.int64()),
         ("n_paths", pa.int64())]
    )
    # fuse the two sigma runs: seed-prefixed node ids make two disjoint
    # copies of the graph, so ONE multi-seed run computes both exactly
    SEP = "\x1f"  # never occurs in entity surfaces (control char)

    def _prefixed(tag: str):
        return edges.map_batches(
            lambda t, _p=tag: pa.Table.from_pydict(
                {"src": pc.binary_join_element_wise(
                    pa.array([_p] * t.num_rows, pa.string()),
                    pc.cast(t.column("src"), pa.string()), SEP),
                 "dst": pc.binary_join_element_wise(
                    pa.array([_p] * t.num_rows, pa.string()),
                    pc.cast(t.column("dst"), pa.string()), SEP)},
            ),
            batch_format="pyarrow",
        )

    sig_all = shortest_path_counts(
        [f"{seed_s}{SEP}{seed_s}", f"{seed_t}{SEP}{seed_t}"],
        _prefixed(seed_s).union(_prefixed(seed_t)), radius=4,
    ).materialize()

    def _half(tag: str):
        pref = f"{tag}{SEP}"

        def strip(t: pa.Table) -> pa.Table:
            keep = pc.starts_with(t.column("node_id"), pref)
            t = t.filter(keep)
            return pa.Table.from_pydict(
                {"node_id": pc.utf8_slice_codeunits(
                    t.column("node_id"), len(pref)),
                 "dist": t.column("dist"), "sigma": t.column("sigma")},
            )

        return sig_all.map_batches(strip, batch_format="pyarrow")

    sig_s = _half(seed_s).materialize()
    sig_t = _half(seed_t).materialize()

    d_rows = sig_s.map_batches(
        lambda t: t.filter(pc.equal(t.column("node_id"), seed_t)),
        batch_format="pyarrow",
    ).take_all()  # <= 1 row: t's distance from s
    if not d_rows:
        return out_schema.empty_table()  # t beyond radius: both engines empty
    dist_st = int(d_rows[0]["dist"])

    renamed = sig_s.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node_id": t.column("node_id"), "ds": t.column("dist"),
             "ss": t.column("sigma")}
        ),
        batch_format="pyarrow",
    )
    joined = coarse_attach(
        renamed, sig_t, left_key="node_id", right_key="node_id",
        attach_cols=["dist", "sigma"], attach_as=["dt", "st"],
        out_schema=pa.schema(
            [("node_id", pa.string()), ("ds", pa.int64()),
             ("ss", pa.int64()), ("dt", pa.int64()), ("st", pa.int64())]
        ),
        how="inner",
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.add(t.column("ds"), t.column("dt")),
                        pa.scalar(dist_st, pa.int64()))
        t = t.filter(keep)
        return pa.Table.from_pydict(
            {"node_id": t.column("node_id"), "ds": t.column("ds"),
             "dt": t.column("dt"),
             "n_paths": pc.multiply(t.column("ss"), t.column("st"))},
            schema=out_schema,
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from semantic_search_system_ray.pipelines.queries import QUERIES

    out = dict(QUERIES)
    out.update(
        {
            "kg_triples": _kg_triples,
            "kg_nodes": _q_kg_nodes,
            "kg_adjacency": _q_kg_adjacency,
            "kg_degree": _q_kg_degree,
            "kg_pagerank": _q_kg_pagerank,
            "kg_bfs": _q_kg_bfs,
            "kg_weighted_paths": _q_kg_weighted_paths,
            "kg_assortativity": _q_kg_assortativity,
            "kg_components": _q_kg_components,
            "kg_kcore": _q_kg_kcore,
            "kg_scc": _q_kg_scc,
            "kg_condensation": _q_kg_condensation,
            "kg_linkpred": _q_kg_linkpred,
            "kg_local_clustering": _q_kg_local_clustering,
            "kg_linkpred_negs": _q_kg_linkpred_negs,
            "kg_ego": _q_kg_ego,
            "kg_reciprocity": _q_kg_reciprocity,
            "kg_topo_levels": _q_kg_topo_levels,
            "kg_communities": _q_kg_communities,
            "kg_hits": _q_kg_hits,
            "kg_katz": _q_kg_katz,
            "kg_edge_support": _q_kg_edge_support,
            "kg_comention": _q_kg_comention,
            "kg_comention_pmi": _q_kg_comention_pmi,
            "kg_walks": _q_kg_walks,
            "kg_modularity": _q_kg_modularity,
            "kg_closeness": _q_kg_closeness,
            "kg_ktruss": _q_kg_ktruss,
            "kg_metapath": _q_kg_metapath,
            "kg_pred_stats": _q_kg_pred_stats,
            "kg_wcc_sizes": _q_kg_wcc_sizes,
            "kg_sigma": _q_kg_sigma,
            "kg_diameter_lb": _q_kg_diameter_lb,
            "kg_node_types": _q_kg_node_types,
            "kg_conflicts": _q_kg_conflicts,
            "kg_walk_pairs": _q_kg_walk_pairs,
            "kg_path_transit": _q_kg_path_transit,
            "kg_ppr": _q_kg_ppr,
            "kg_triangles": _q_kg_triangles,
            "kg_clustering": _q_kg_clustering,
            "kg_jaccard": _q_kg_jaccard,
            "fuzzy_name_pairs": _q_fuzzy_name_pairs,
            "entity_link": _q_entity_link,
            "search_lexical": _q_search_lexical,
            "search_rerank": _q_search_rerank,
            "rag_answer": _q_rag_answer,
            "search_bm25": _q_search_bm25,
            "search_rrf": _q_search_rrf,
            "taxonomy_build": _q_taxonomy_build,
            "doc_topic_words": _q_doc_topic_words,
            "minhash_clusters": _q_minhash_clusters,
            "minhash_calibration": _q_minhash_calibration,
            "kg_entity_provenance": _q_kg_entity_provenance,
            "kg_rich_club": _q_kg_rich_club,
            "kg_curated_triples": _q_kg_curated_triples,
            "kg_curation_diff": _q_kg_curation_diff,
            "kg_store_roundtrip": _q_kg_store_roundtrip,
            "kg_incremental_rebuild": _q_kg_incremental_rebuild,
            "dedup_incremental": _q_dedup_incremental,
            "split_leakage_free": _q_split_leakage_free,
            "cluster_best_rep": _q_cluster_best_rep,
            "kcenter_coreset": _q_kcenter_coreset,
            "ann_range": _q_ann_range,
            "corpus_near_clean": _q_corpus_near_clean,
            "kg_diff": _q_kg_diff,
            "centroid_distances": _q_centroid_distances,
            "simhash": _q_simhash,
            "ngram_jaccard": _q_ngram_jaccard,
            "langid": _q_langid,
            "quality_score": _q_quality,
            "fingerprint": _q_fingerprint,
            "ann_lsh": _q_ann_lsh,
            "ann_ivf": _q_ann_ivf,
            "ann_exact_multi": _q_ann_exact_multi,
            "media_features": _q_media_features,
            "media_frame_sample": _q_media_frame_sample,
            "media_duration_quantiles": _q_media_duration_quantiles,
            "media_dedup": _q_media_dedup,
            "approx_distinct": _q_approx_distinct,
            "approx_users_by_type": _q_approx_users_by_type,
        }
    )
    return out


def _sql_chunk_docs() -> str:
    from semantic_search_system_ray.pipelines import text_oracles as tox
    from semantic_search_system_ray.pipelines.queries import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    return tox.sql_chunk_docs(CHUNK_SIZE, CHUNK_STRIDE)


def _sql_pmi_pairs() -> str:
    from semantic_search_system_ray.pipelines import text_oracles as tox
    from semantic_search_system_ray.pipelines.queries import (
        PMI_PPM,
        PMI_TOP_K,
        PMI_VOCAB_M,
    )

    return tox.sql_pmi_pairs(PMI_VOCAB_M, PMI_TOP_K, PMI_PPM)


def _sql_stratified_sample() -> str:
    from semantic_search_system_ray.pipelines import text_oracles as tox
    from semantic_search_system_ray.pipelines.queries import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
    )
    from semantic_search_system_ray.stages.curation import (
        SAMPLE_MOD,
        sample_thresholds,
    )

    return tox.sql_stratified_sample(
        "lang",
        sample_thresholds(SAMPLE_RATES),
        int(SAMPLE_DEFAULT_RATE * SAMPLE_MOD),
    )


SQL_ANN_EXACT_MULTI = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {ANN_CERT_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(CAST(list_cosine_similarity(e.embedding, q.qv) AS DOUBLE), 4)
           AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id
  ) AS rk FROM scored
)
SELECT query_id, vec_id, score FROM ranked WHERE rk <= {ANN_CERT_K}
"""

SQL_ANN_CERT = f"""
SELECT CAST(vec_id AS BIGINT) AS query_id,
       CAST({ANN_CERT_K} AS BIGINT) AS k,
       CAST({ANN_CERT_PER_QUERY_PPM} AS BIGINT) AS min_recall_ppm,
       TRUE AS recall_ok
FROM embeddings WHERE vec_id < {ANN_CERT_QUERIES}
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST({ANN_CERT_K} AS BIGINT),
       CAST({ANN_CERT_MEAN_PPM} AS BIGINT), TRUE
"""


def oracle_sql() -> dict[str, str]:
    from semantic_search_system_ray.pipelines import text_oracles as tox
    from semantic_search_system_ray.pipelines.queries import ORACLE_SQL

    out = dict(ORACLE_SQL)
    out.update(
        {
            # generated from the same constants the engine stages use
            "kg_triples": tox.sql_kg_triples(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_nodes": tox.sql_kg_nodes(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_adjacency": tox.sql_kg_adjacency(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_degree": tox.sql_kg_degree(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_pagerank": tox.sql_kg_pagerank(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_bfs": tox.sql_kg_bfs(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_weighted_paths": tox.sql_kg_weighted_paths(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_assortativity": tox.sql_kg_assortativity(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_components": tox.sql_kg_components(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_kcore": tox.sql_kg_kcore(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_scc": tox.sql_kg_scc(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_condensation": tox.sql_kg_condensation(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_linkpred": tox.sql_kg_linkpred(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_local_clustering": tox.sql_kg_local_clustering(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_linkpred_negs": tox.sql_kg_linkpred_negs(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_ego": tox.sql_kg_ego(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_reciprocity": tox.sql_kg_reciprocity(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_topo_levels": tox.sql_kg_topo_levels(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_communities": tox.sql_kg_communities(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_hits": tox.sql_kg_hits(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_katz": tox.sql_kg_katz(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_edge_support": tox.sql_kg_edge_support(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_comention": tox.sql_kg_comention(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_walks": tox.sql_kg_walks(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_modularity": tox.sql_kg_modularity(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_closeness": tox.sql_kg_closeness(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_ktruss": tox.sql_kg_ktruss(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_metapath": tox.sql_kg_metapath(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_wcc_sizes": tox.sql_kg_wcc_sizes(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_sigma": tox.sql_kg_sigma(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_diameter_lb": tox.sql_kg_diameter_lb(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_pred_stats": tox.sql_kg_pred_stats(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_conflicts": tox.sql_kg_conflicts(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_walk_pairs": tox.sql_kg_walk_pairs(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_path_transit": tox.sql_kg_path_transit(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_node_types": tox.sql_kg_node_types(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_ppr": tox.sql_kg_ppr(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_triangles": tox.sql_kg_triangles(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_clustering": tox.sql_kg_clustering(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_jaccard": tox.sql_kg_jaccard(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "fuzzy_name_pairs": SQL_FUZZY_NAME_PAIRS,
            "entity_link": tox.sql_entity_link(TESTDATA_LINK_ENTITIES),
            "search_lexical": tox.sql_search_lexical(
                ["hash", "join", "table", "scan"], k=20
            ),
            "search_rerank": tox.sql_search_rerank(
                ["merge", "sort", "window"], k_candidates=30, top_n=10
            ),
            "search_bm25": tox.sql_bm25(
                ["stream", "table", "hash", "window"], k=10
            ),
            "search_rrf": tox.sql_search_rrf(
                ["stream", "table", "hash", "window"], k=20
            ),
            "rag_answer": tox.sql_rag_answer(
                ["stream", "table", "hash", "window"], k=5
            ),
            "ngram_jaccard": tox.sql_ngram_jaccard(n=3, threshold=0.8),
            "fingerprint": tox.sql_fingerprint(window=8),
            "doc_topic_words": tox.sql_doc_topic_words(top_k=10),
            "langid": tox.sql_langid(),
            "quality_score": tox.sql_quality_score(),
            # simhash joined the hard gate in r3: the per-token hash is
            # md5-based (== DuckDB md5_number_lower), so the 64-bit
            # signature is recomputed entirely in SQL
            "simhash": tox.sql_simhash(),
            # media span layout + stub-feature derivation are md5-based
            # since r3 → integer-exact SQL recomputation (no float compare)
            "media_features": tox.sql_media_features(
                __import__(
                    "semantic_search_system_ray.stages.media",
                    fromlist=["MEDIA_FEATURE_DIM"],
                ).MEDIA_FEATURE_DIM
            ),
            "media_frame_sample": tox.sql_media_frame_sample(
                __import__(
                    "semantic_search_system_ray.stages.media",
                    fromlist=["MEDIA_SAMPLE_STRIDE"],
                ).MEDIA_SAMPLE_STRIDE,
                __import__(
                    "semantic_search_system_ray.stages.media",
                    fromlist=["MEDIA_MAX_CHUNKS"],
                ).MEDIA_MAX_CHUNKS,
            ),
            "media_duration_quantiles": tox.sql_media_duration_quantiles(),
            # full minhash pipeline in SQL (md5-based hashes since r3)
            "minhash_clusters": tox.sql_minhash_clusters(threshold=0.6),
            "minhash_calibration": tox.sql_minhash_calibration(),
            "kg_entity_provenance": tox.sql_kg_entity_provenance(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_rich_club": tox.sql_kg_rich_club(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_curated_triples": tox.sql_kg_curated_triples(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_curation_diff": tox.sql_kg_curation_diff(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_store_roundtrip": tox.sql_kg_pred_stats(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_incremental_rebuild": tox.sql_kg_pred_stats(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "kg_comention_pmi": tox.sql_kg_comention_pmi(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
            ),
            "dedup_incremental": tox.sql_dedup_incremental(threshold=0.5),
            "split_leakage_free": tox.sql_leakage_free_split(threshold=0.6),
            "cluster_best_rep": tox.sql_cluster_best_rep(threshold=0.6),
            "kcenter_coreset": _sql_kcenter_coreset(),
            "ann_range": _sql_ann_range(),
            "corpus_near_clean": tox.sql_corpus_near_clean(threshold=0.6),
            "kg_diff": tox.sql_kg_diff(
                TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, _kg_diff_taxonomy(),
                TESTDATA_PHRASE_LIST,
            ),
            "centroid_distances": SQL_CENTROID_DISTANCES,
            # r3 curation ops (stages/curation) — md5 decisions, exact SQL
            "stratified_sample": _sql_stratified_sample(),
            "repetition": tox.sql_repetition(n=3),
            "substring_dups": tox.sql_cross_doc_dups(n=5),
            "pmi_pairs": _sql_pmi_pairs(),
            "chunk_docs": _sql_chunk_docs(),
            "inverted_index": tox.sql_inverted_index(),
            "contamination": tox.sql_contamination(
                __import__(
                    "semantic_search_system_ray.pipelines.queries",
                    fromlist=["BENCHMARK_NGRAMS"],
                ).BENCHMARK_NGRAMS,
                n=3,
            ),
            # late r3: the HLL sketch is bit-recomputed in SQL and the
            # media near-dup pair set collapses to an exact join (the
            # stub features are injective in (kind, media_ref))
            "approx_distinct": tox.sql_approx_distinct(),
            "approx_users_by_type": tox.sql_grouped_approx_distinct(),
            "media_dedup": tox.sql_media_dedup(),
            # r4: fused multi-query exact top-k (full value oracle) and
            # the LSH/IVF recall certificates — approximate results are
            # gated via constant certificate rows (recall_ok must be TRUE
            # for every query and for the mean row; a recall regression
            # flips rows and fails the driver's hash compare)
            "ann_exact_multi": SQL_ANN_EXACT_MULTI,
            "ann_lsh": SQL_ANN_CERT,
            "ann_ivf": SQL_ANN_CERT,
            "taxonomy_build": SQL_TAXONOMY_CERT,
        }
    )
    return out
