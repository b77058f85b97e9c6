"""Similarity search over an embedding column (list<float>).

- **cosine_topk**: brute-force exact top-k — the baseline (and the
  reference's semantics ceiling: exact ≥ HNSW recall, SURVEY §2.6 T2).
  The query matrix is broadcast via ``ray.put``; each batch computes a
  vectorized float64 matmul and emits its LOCAL top-k; the global
  ``sort(score).limit(k)`` runs over #batches×k candidate rows only.
- **lsh_bucket_topk**: the scale path — random-hyperplane signatures
  bucket the collection (``groupby(bucket)``); the query is searched only
  inside its own bucket (recall < 1 by design, controlled by num_planes /
  probes). Hyperplanes are seeded → deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def list_column_to_matrix(col) -> np.ndarray:
    """list<float> column → (rows, dim) float64 matrix WITHOUT building
    Python lists: flatten the Arrow child values zero-copy and reshape
    (valid when all rows share one length — checked). Falls back to
    np.array(to_pylist()) for ragged input."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray):
        dim = col.type.list_size
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return vals.astype(np.float64, copy=False).reshape(len(col), dim)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and len(col):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if (widths == widths[0]).all():
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return (
                vals.astype(np.float64, copy=False)
                .reshape(len(col), int(widths[0]))
            )
    return np.array(col.to_pylist(), dtype=np.float64)


def _as_matrix(col) -> np.ndarray:
    m = list_column_to_matrix(col) if isinstance(
        col, (pa.Array, pa.ChunkedArray)
    ) else np.array(col, dtype=np.float64)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def cosine_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> rd.Dataset:
    """Exact brute-force cosine top-k. Deterministic tie-break:
    (score DESC, id ASC). Returns (vec_id, score)."""
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    qref = ray.put(q)

    class _Score:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            mat = _as_matrix(batch.column(vec_col))
            sims = mat @ self.q
            # local top-k candidates only → tiny global sort
            take = min(k, len(ids))
            idx = np.argsort(-sims, kind="stable")[:take]
            return pa.Table.from_pydict(
                {
                    id_col: ids.take(pa.array(idx)),  # preserves the id dtype
                    "score": pa.array(
                        [round(float(s), round_to) for s in sims[idx]], pa.float64()
                    ),
                }
            )

    scored = ds.map_batches(_Score, batch_format="pyarrow", concurrency=(1, 8))
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


def lsh_signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signature: bit b = sign(v · plane_b)."""
    bits = (mat @ planes.T) >= 0
    out = np.zeros(len(mat), dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


def train_ivf_centroids(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    nlist: int = 16,
    sample: int = 2048,
    iters: int = 5,
    seed: int = 29,
) -> np.ndarray:
    """Train an IVF coarse quantizer: seeded k-means on a bounded SAMPLE
    (first ``sample`` rows by storage order via ``limit`` — deterministic,
    no shuffle; at corpus scale a few thousand vectors suffice for a
    coarse quantizer). Returns L2-normalized (nlist, dim) centroids."""
    rows = ds.limit(sample).take_all()
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    mat = mat / n[:, None]
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                cent[c] = v / nv if nv > 0 else v
    return cent


def ivf_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    round_to: int = 6,
) -> rd.Dataset:
    """IVF approximate top-k — the inverted-file scale path: a coarse
    k-means quantizer partitions the collection into ``nlist`` lists; the
    query scores ONLY rows whose nearest centroid is among its ``nprobe``
    closest lists (fraction scanned ≈ nprobe/nlist). Quantizer trains on a
    bounded sample (or pass precomputed ``centroids`` to amortize across
    queries); per batch the list assignment + masked matmul are fully
    vectorized."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col=vec_col, nlist=nlist)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    probe = np.argsort(-(centroids @ q), kind="stable")[:nprobe]
    ref = ray.put((q, centroids, set(int(p) for p in probe)))

    class _Score:
        def __init__(self):
            self.q, self.cent, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            mat = _as_matrix(batch.column(vec_col))
            assign = np.argmax(mat @ self.cent.T, axis=1)
            mask = np.isin(assign, list(self.probe))
            sel = np.where(mask)[0]
            if not len(sel):
                return pa.Table.from_pydict(
                    {id_col: ids.take(pa.array([], pa.int64())),
                     "score": pa.array([], pa.float64())}
                )
            sims = mat[sel] @ self.q
            take = min(k, len(sel))
            idx = np.argsort(-sims, kind="stable")[:take]
            return pa.Table.from_pydict(
                {
                    id_col: ids.take(pa.array(sel[idx])),
                    "score": pa.array(
                        [round(float(s), round_to) for s in sims[idx]], pa.float64()
                    ),
                }
            )

    scored = ds.map_batches(_Score, batch_format="pyarrow", concurrency=(1, 8))
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


def lsh_bucket_topk(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 17,
    round_to: int = 6,
    probes: int = 1,
) -> rd.Dataset:
    """Approximate top-k: search the query's hyperplane bucket plus all
    buckets within Hamming distance ``probes`` of it (multi-probe LSH —
    the standard recall lever: the nearest misses live one flipped
    hyperplane away, so probing them costs num_planes extra buckets
    instead of a whole extra table). Recall trades off with num_planes
    (2^planes buckets) and ``probes``."""
    dim = len(query)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    qbucket = int(lsh_signature(q[None, :], planes)[0])
    probe_buckets = {qbucket}
    if probes >= 1:
        probe_buckets |= {qbucket ^ (1 << b) for b in range(num_planes)}
    if probes >= 2:
        for b1 in range(num_planes):
            for b2 in range(b1 + 1, num_planes):
                probe_buckets.add(qbucket ^ (1 << b1) ^ (1 << b2))
    probe_arr = np.array(sorted(probe_buckets), dtype=np.int64)
    ref = ray.put((q, planes, probe_arr))

    class _Score:
        def __init__(self):
            self.q, self.planes, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            mat = _as_matrix(batch.column(vec_col))
            buckets = lsh_signature(mat, self.planes)
            mask = np.isin(buckets, self.probe)
            sel = np.where(mask)[0]
            if not len(sel):
                return pa.Table.from_pydict(
                    {id_col: ids.take(pa.array([], pa.int64())),
                     "score": pa.array([], pa.float64())}
                )
            sims = mat[sel] @ self.q
            take = min(k, len(sel))
            idx = np.argsort(-sims, kind="stable")[:take]
            return pa.Table.from_pydict(
                {
                    id_col: ids.take(pa.array(sel[idx])),  # preserves dtype
                    "score": pa.array(
                        [round(float(s), round_to) for s in sims[idx]], pa.float64()
                    ),
                }
            )

    scored = ds.map_batches(_Score, batch_format="pyarrow", concurrency=(1, 8))
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


# --------------------------------------------------------------------------
# fused multi-query top-k + recall certificates (round-4: puts the
# approximate ANN paths on the driver's hard oracle gate)
# --------------------------------------------------------------------------

def _ids_np(batch: pa.Table, id_col: str) -> np.ndarray:
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return ids.to_numpy(zero_copy_only=False)


def _multi_local_topk(
    qids: np.ndarray,
    sims: np.ndarray,
    ids: np.ndarray,
    sel_per_q,
    k: int,
    round_to: int,
) -> pa.Table:
    """Per-query LOCAL top-k rows under the EXACT global ordering
    (score DESC, id ASC) — a provable combiner: any row outside a block's
    per-query top-k under that ordering can't be in the global top-k.
    ``sel_per_q`` maps query index → row-index array to score (None =
    all rows)."""
    out_q, out_i, out_s = [], [], []
    scale = 10.0 ** round_to
    for qi in range(len(qids)):
        sel = sel_per_q(qi)
        s = sims[sel, qi] if sel is not None else sims[:, qi]
        i = ids[sel] if sel is not None else ids
        if not len(s):
            continue
        # round BEFORE the local trim (half-away-from-zero, matching SQL
        # round()): the combiner is only provable under the same
        # (rounded score DESC, id ASC) ordering the global rank uses
        s = np.copysign(np.floor(np.abs(s) * scale + 0.5), s) / scale
        take = min(k, len(s))
        order = np.lexsort((i, -s))[:take]
        out_q.append(np.full(take, qids[qi], np.int64))
        out_i.append(i[order])
        out_s.append(s[order])
    if not out_q:
        return pa.Table.from_pydict(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    return pa.Table.from_pydict(
        {"query_id": pa.array(np.concatenate(out_q), pa.int64()),
         "vec_id": pa.array(
             np.concatenate(out_i).astype(np.int64), pa.int64()),
         "score": pa.array(np.concatenate(out_s), pa.float64())}
    )


def _grouped_topk_of(scored: rd.Dataset, k: int) -> rd.Dataset:
    from semantic_search_system_ray.stages.util import grouped_topk

    return grouped_topk(
        scored, ["query_id"], ["score", "vec_id"],
        descending=[True, False], k=k,
    )


def multi_query_exact_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> rd.Dataset:
    """EXACT brute-force top-k for Q queries in ONE fused pass: every
    block computes one (block × Q) matmul against the broadcast query
    matrix and emits its per-query local top-k (provable combiner), so
    the wide step sees ≤ #blocks·Q·k rows. → (query_id, vec_id, score),
    score rounded half-even to ``round_to`` (np.round; query vectors are
    L2-normalized on both sides)."""
    qm = np.asarray(queries, np.float64)
    n = np.linalg.norm(qm, axis=1)
    n[n == 0] = 1.0
    qm = qm / n[:, None]
    qids = np.asarray(query_ids, np.int64)
    ref = ray.put(qm.T.copy())

    def score(batch: pa.Table) -> pa.Table:
        qt = ray.get(ref)
        sims = _as_matrix(batch.column(vec_col)) @ qt
        return _multi_local_topk(
            qids, sims, _ids_np(batch, id_col), lambda qi: None, k, round_to
        )

    return _grouped_topk_of(
        ds.map_batches(score, batch_format="pyarrow"), k
    )


def lsh_bucket_topk_multi(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    seed: int = 17,
    probes: int = 1,
    round_to: int = 4,
) -> rd.Dataset:
    """Multi-probe LSH top-k for Q queries in ONE fused pass: block
    signatures are computed ONCE per batch; each query scores only rows
    landing in its probe-bucket set. Same output shape as
    ``multi_query_exact_topk`` (approximate: per-query recall < 1 by
    design, seeded hyperplanes → deterministic)."""
    qm = np.asarray(queries, np.float64)
    n = np.linalg.norm(qm, axis=1)
    n[n == 0] = 1.0
    qm = qm / n[:, None]
    qids = np.asarray(query_ids, np.int64)
    dim = qm.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    qbuckets = lsh_signature(qm, planes)
    probe_sets = []
    for qb in qbuckets:
        s = {int(qb)}
        if probes >= 1:
            s |= {int(qb) ^ (1 << b) for b in range(num_planes)}
        if probes >= 2:
            for b1 in range(num_planes):
                for b2 in range(b1 + 1, num_planes):
                    s.add(int(qb) ^ (1 << b1) ^ (1 << b2))
        probe_sets.append(np.array(sorted(s), np.int64))
    ref = ray.put((qm.T.copy(), planes, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        qt, pl, psets = ray.get(ref)
        mat = _as_matrix(batch.column(vec_col))
        buckets = lsh_signature(mat, pl)
        sims = mat @ qt
        return _multi_local_topk(
            qids, sims, _ids_np(batch, id_col),
            lambda qi: np.flatnonzero(np.isin(buckets, psets[qi])),
            k, round_to,
        )

    return _grouped_topk_of(
        ds.map_batches(score, batch_format="pyarrow"), k
    )


def ivf_topk_multi(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    round_to: int = 4,
) -> rd.Dataset:
    """IVF top-k for Q queries in ONE fused pass: the coarse quantizer
    trains once (seeded, bounded sample), list assignment is computed
    ONCE per batch, each query scores only its nprobe lists. Same output
    shape as ``multi_query_exact_topk`` (approximate by design)."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, vec_col=vec_col, nlist=nlist)
    qm = np.asarray(queries, np.float64)
    n = np.linalg.norm(qm, axis=1)
    n[n == 0] = 1.0
    qm = qm / n[:, None]
    qids = np.asarray(query_ids, np.int64)
    probe_sets = [
        np.sort(np.argsort(-(centroids @ qm[qi]), kind="stable")[:nprobe])
        for qi in range(len(qids))
    ]
    ref = ray.put((qm.T.copy(), centroids, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        qt, cent, psets = ray.get(ref)
        mat = _as_matrix(batch.column(vec_col))
        assign = np.argmax(mat @ cent.T, axis=1)
        sims = mat @ qt
        return _multi_local_topk(
            qids, sims, _ids_np(batch, id_col),
            lambda qi: np.flatnonzero(np.isin(assign, psets[qi])),
            k, round_to,
        )

    return _grouped_topk_of(
        ds.map_batches(score, batch_format="pyarrow"), k
    )


def ann_recall_certificate(
    exact: rd.Dataset,
    approx: rd.Dataset,
    *,
    k: int,
    min_recall_ppm: int,
    mean_min_recall_ppm: int | None = None,
) -> pa.Table:
    """→ one row per query: (query_id, k, min_recall_ppm, hits,
    recall_ok) — the HARD-GATE form of an approximate ANN result
    (round-3 verdict ask #3). Both inputs are (query_id, vec_id, ...)
    top-k datasets — Q·k rows, bounded — so the driver-side set compare
    is domain-bounded. ``recall_ok`` asserts
    |approx ∩ exact| / k ≥ min_recall_ppm / 1e6 per query; the exact
    side's VALUES are separately value-oracled (ann_exact_multi), so a
    recall regression flips rows and fails the driver's hash compare.
    ``hits`` is NOT emitted in the hashed columns (SQL can't know it);
    it is exposed to pytest via :func:`ann_recall_counts`."""
    counts = ann_recall_counts(exact, approx)
    q_sorted = sorted(counts)
    qid = list(q_sorted)
    bound = [min_recall_ppm] * len(q_sorted)
    ok = [counts[q] * 1_000_000 >= k * min_recall_ppm for q in q_sorted]
    if mean_min_recall_ppm is not None:
        # aggregate row (query_id = -1): mean recall over all queries ≥
        # its own (tighter) bound — per-query floors tolerate variance,
        # the mean row catches a broad regression
        qid.append(-1)
        bound.append(mean_min_recall_ppm)
        ok.append(
            sum(counts.values()) * 1_000_000
            >= k * len(q_sorted) * mean_min_recall_ppm
        )
    return pa.Table.from_pydict(
        {
            "query_id": pa.array(qid, pa.int64()),
            "k": pa.array([k] * len(qid), pa.int64()),
            "min_recall_ppm": pa.array(bound, pa.int64()),
            "recall_ok": pa.array(ok, pa.bool_()),
        }
    )


def ann_recall_counts(exact: rd.Dataset, approx: rd.Dataset) -> dict[int, int]:
    """query_id → |approx top-k ∩ exact top-k| (both inputs bounded Q·k)."""
    ex: dict[int, set] = {}
    for r in exact.take_all():
        ex.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    hits = {q: 0 for q in ex}
    for r in approx.take_all():
        q = int(r["query_id"])
        if q in ex and int(r["vec_id"]) in ex[q]:
            hits[q] += 1
    return hits


# --------------------------------------------------------------------------
# cosine range search (all matches above a similarity threshold)
# --------------------------------------------------------------------------

RANGE_SCHEMA = pa.schema(
    [("qid", pa.int64()), ("vec_id", pa.int64()), ("dot", pa.int64())]
)


def cosine_range_search(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 10,
    tau_num: int = 1,
    tau_den: int = 4,
) -> rd.Dataset:
    """RANGE similarity search — every (query, vector) pair with cosine
    ≥ √(tau_num/tau_den) (default 1/4 → cosine ≥ 0.5), the dual of
    top-k: retrieval recalls ALL matches above a floor rather than a
    fixed count. Queries = the ``n_queries`` rows with the SMALLEST ids
    (two-level top-k combiner — the driver fold is reduce-parts
    bounded); self-pairs excluded; zero-norm vectors never match.

    EXACT on the hash gate by the semantic_dedup playbook: vectors
    quantize once to int64 milli-units and the threshold test is pure
    integer — cos ≥ τ ⟺ dot ≥ 0 ∧ tau_den·dot² ≥ tau_num·|a|²·|b|² —
    with a LOUD dynamic overflow guard (tau_den·(D·hi²)² must fit
    int64). Output (qid, vec_id, dot) where dot is the exact integer
    gram — hash-identical to the SQL twin (sql_cosine_range).

    Scale shape: the Q×D query matrix broadcasts BY VALUE into ONE
    streaming pass; each batch computes its integer gram block against
    the queries and keeps passing pairs. Zero shuffles; output is
    match-bounded, never corpus × corpus."""
    from semantic_search_system_ray.stages.kmeans import quantize_matrix

    ds = ds.materialize()  # consumed twice: query pick + scan

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, vec_col])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:n_queries]
        return t.select([id_col, vec_col]).take(pa.array(take))

    cand = (
        ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
        .repartition(8)
        .map_batches(local_topk, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    if len(cand) < n_queries:
        raise ValueError(
            f"cosine_range_search: need ≥ {n_queries} rows, got {len(cand)}"
        )
    cand.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in cand[:n_queries]], dtype=np.int64)
    Q = quantize_matrix(
        np.asarray([r[vec_col] for r in cand[:n_queries]], dtype=np.float64)
    )
    qn2 = np.einsum("qd,qd->q", Q, Q)

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return RANGE_SCHEMA.empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        X = quantize_matrix(list_column_to_matrix(t.column(vec_col)))
        xn2 = np.einsum("bd,bd->b", X, X)
        # Cauchy–Schwarz: dot² ≤ xn2·qn2 exactly on integers, so every
        # product below is bounded by tau · max(xn2) · max(qn2) —
        # refuse loudly rather than overflow silently
        bound = (
            max(tau_num, tau_den)
            * int(xn2.max(initial=0)) * int(qn2.max(initial=0))
        )
        if bound >= 2 ** 63:
            raise ValueError(
                "cosine_range_search: quantized norms would overflow "
                f"the int64-exact cosine test (bound {bound})"
            )
        dot = X @ Q.T
        keep = (
            (dot >= 0)
            & (xn2[:, None] > 0) & (qn2[None, :] > 0)
            & (tau_den * dot * dot >= tau_num * xn2[:, None] * qn2[None, :])
            & (ids[:, None] != qids[None, :])
        )
        r, c = np.nonzero(keep)
        return pa.Table.from_pydict(
            {"qid": qids[c], "vec_id": ids[r], "dot": dot[r, c]},
            schema=RANGE_SCHEMA,
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def sql_cosine_range(
    n_queries: int = 10, tau_num: int = 1, tau_den: int = 4
) -> str:
    """DuckDB twin of ``cosine_range_search`` over the embeddings table:
    same milli-unit quantization, the same integer threshold test (the
    BIGINT sums are exact; products stay within the engine's guarded
    bound)."""
    quant = (
        "CAST(CASE WHEN x >= 0 THEN floor(CAST(x AS DOUBLE)*1000 + 0.5) "
        "ELSE -floor(-CAST(x AS DOUBLE)*1000 + 0.5) END AS BIGINT)"
    )
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> {quant}) AS qe
  FROM embeddings
),
pts AS MATERIALIZED (
  SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS d FROM q
),
qq AS MATERIALIZED (SELECT vec_id FROM q ORDER BY vec_id LIMIT {n_queries}),
nrm AS MATERIALIZED (
  SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2 FROM pts GROUP BY vec_id
),
gram AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         CAST(sum(a.v * b.v) AS BIGINT) AS dot
  FROM pts a
  JOIN qq ON qq.vec_id = a.vec_id
  JOIN pts b ON b.d = a.d AND b.vec_id <> a.vec_id
  GROUP BY 1, 2
)
SELECT g.qid, g.vec_id, g.dot
FROM gram g
JOIN nrm na ON na.vec_id = g.qid
JOIN nrm nb ON nb.vec_id = g.vec_id
WHERE g.dot >= 0 AND na.n2 > 0 AND nb.n2 > 0
  AND {tau_den} * g.dot * g.dot >= {tau_num} * na.n2 * nb.n2
"""
