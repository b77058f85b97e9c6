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
