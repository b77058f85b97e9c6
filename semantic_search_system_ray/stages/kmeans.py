"""Distributed Lloyd's k-means over an embedding column — EXACT, on the
hash gate.

Iterative ML is normally unhashable (float sums are order-dependent, so
a distributed run and a SQL twin drift at cluster boundaries). This
operator removes the float entirely:

- vectors are QUANTIZED once to int64 milli-units with the repo's
  copysign-floor half-away rounding (the same idiom the money/score
  paths use — never np.round vs SQL round);
- per-iteration cluster sums are int64 (associative — any block order,
  any combine tree, same result), so the distributed partial-sum
  combine is bit-identical to DuckDB's sequential aggregate;
- centroid update is FLOOR DIVISION sum // count (numpy floor_divide;
  the SQL twin uses the positive-mod identity
  ``(s - ((s % n) + n) % n) // n`` because DuckDB's ``%``/``//``
  truncate while numpy floors — exact for every sign);
- assignment is argmin of integer squared-L2, ties to the LOWEST
  cluster id (np.argmin first-hit == SQL ``ORDER BY dist, cluster``).

Scale shape (the canonical broadcast-iterate pattern): centroids are a
K×D int64 array (a few KB) captured by value into each pass; every
iteration is ONE streaming ``map_batches`` pass emitting ≤K partial
rows (cluster, n, per-dim sums) per block; the driver folds the
bounded partial set (blocks × K rows) and updates centroids. Zero
shuffles at any corpus size; init is a per-block top-k combiner, not a
global sort. Empty clusters keep their previous centroid on BOTH sides.

Deterministic init: the K rows with the smallest ``id_col`` values,
cluster j = rank j in that order.

Reference parity note: the reference has no clustering at all (its
taxonomy is hand-curated: ``taxonomy/core_categories.json``); k-means
is part of the beyond-reference training-data surface (SURVEY §2.11) —
the standard SemDeDup-style pre-step (cluster, then near-dedup within
clusters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.stages.ann import list_column_to_matrix

QUANT = 1000.0  # milli-unit quantization; |x| ≤ ~1 → |q| ≤ ~1000 (int64-safe)

_PARTIAL_SCHEMA = pa.schema(
    [("cluster", pa.int64()), ("n", pa.int64()), ("s", pa.list_(pa.int64()))]
)

KMEANS_SCHEMA = pa.schema(
    [("cluster", pa.int64()), ("n", pa.int64()),
     ("c_sum", pa.int64()), ("c_abs", pa.int64())]
)


def quantize_matrix(mat: np.ndarray) -> np.ndarray:
    """float (B, D) → int64 milli-units, half-away-from-zero (the repo's
    copysign-floor idiom; bit-identical to the SQL CASE/floor twin)."""
    m = mat.astype(np.float64, copy=False)
    return np.copysign(np.floor(np.abs(m) * QUANT + 0.5), m).astype(np.int64)


def _init_centroids(
    ds: rd.Dataset, *, id_col: str, vec_col: str, k: int
) -> np.ndarray:
    """The K rows with the smallest ids, as quantized int64 (K, D) —
    cluster j = rank j. Per-block local top-k combiner + a bounded
    driver fold (blocks × k candidate rows), never a global sort."""
    def local_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return t.select([id_col, vec_col]).take(pa.array(take))

    cand = ds.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).take_all()
    if len(cand) < k:
        raise ValueError(f"kmeans: need ≥ {k} rows, got {len(cand)}")
    cand.sort(key=lambda r: r[id_col])
    mat = np.array([r[vec_col] for r in cand[:k]], dtype=np.float64)
    return quantize_matrix(mat)


def _assign(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_j Σ_d (x_d − C_jd)² — all int64 (x, C in milli-units: the
    cross term is ≲ D·10⁶·10⁶ ≪ 2⁶³), first-hit argmin = lowest cluster
    on ties."""
    x2 = np.einsum("bd,bd->b", x, x)
    c2 = np.einsum("kd,kd->k", cent, cent)
    d = x2[:, None] + c2[None, :] - 2 * (x @ cent.T)
    return np.argmin(d, axis=1)


def kmeans_quantized(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
) -> tuple[np.ndarray, np.ndarray]:
    """Full-data distributed Lloyd's over quantized vectors → (final
    int64 centroids (K, D), final assignment counts (K,)). ``counts``
    are the sizes of the assignment that PRODUCED the final centroids
    (iteration ``iters``'s assignment); empty clusters carry their
    previous centroid and report n = 0."""
    cent = _init_centroids(ds, id_col=id_col, vec_col=vec_col, k=k)
    dim = cent.shape[1]
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(iters):
        frozen = cent  # capture by value: each pass broadcasts K×D ints

        def partials(t: pa.Table, _c=frozen) -> pa.Table:
            x = quantize_matrix(list_column_to_matrix(t.column(vec_col)))
            a = _assign(x, _c)
            cl, ns, ss = [], [], []
            for j in np.unique(a):
                m = x[a == j]
                cl.append(int(j))
                ns.append(len(m))
                ss.append(m.sum(axis=0, dtype=np.int64).tolist())
            return pa.Table.from_pydict(
                {"cluster": cl, "n": ns, "s": ss}, schema=_PARTIAL_SCHEMA
            )

        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in ds.map_batches(
            partials, batch_format="pyarrow", batch_size=None
        ).take_all():  # bounded: ≤ blocks × K rows
            j = int(r["cluster"])
            counts[j] += int(r["n"])
            sums[j] += np.asarray(r["s"], dtype=np.int64)

        nz = counts > 0
        nxt = cent.copy()  # empty cluster → keep previous centroid
        nxt[nz] = np.floor_divide(sums[nz], counts[nz, None])
        cent = nxt
    return cent, counts


def q_kmeans_embeddings(sf_dir: str) -> pa.Table:
    """Gate query: K=8, 3 Lloyd iterations over the embeddings table →
    one (cluster, n, c_sum, c_abs) row per cluster, hash-exact against
    the unrolled-iteration SQL twin."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent, counts = kmeans_quantized(ds, k=8, iters=3)
    return pa.Table.from_pydict(
        {"cluster": np.arange(8, dtype=np.int64),
         "n": counts,
         "c_sum": cent.sum(axis=1),
         "c_abs": np.abs(cent).sum(axis=1)},
        schema=KMEANS_SCHEMA,
    )


def kmeans_sql(k: int = 8, iters: int = 3) -> str:
    """The DuckDB twin: same quantization, same integer arithmetic, the
    ``iters`` Lloyd rounds UNROLLED as chained CTEs (SQL cannot loop;
    the driver hashes this against q_kmeans_embeddings)."""
    quant = (
        "CAST(CASE WHEN x >= 0 THEN floor(CAST(x AS DOUBLE)*1000 + 0.5) "
        "ELSE -floor(-CAST(x AS DOUBLE)*1000 + 0.5) END AS BIGINT)"
    )
    parts = [f"""
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> {quant}) AS qe
  FROM embeddings
),
pts AS (
  SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS d FROM q
),
c0 AS (
  SELECT i.cluster, p.d, p.v AS c
  FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
        FROM q ORDER BY vec_id LIMIT {k}) i
  JOIN pts p ON p.vec_id = i.vec_id
)"""]
    for it in range(1, iters + 1):
        p, c = it - 1, it
        parts.append(f"""
dist{c} AS (
  SELECT p.vec_id, cc.cluster,
         sum((p.v - cc.c) * (p.v - cc.c)) AS dist
  FROM pts p JOIN c{p} cc ON p.d = cc.d
  GROUP BY p.vec_id, cc.cluster
),
a{c} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rk
    FROM dist{c}
  ) WHERE rk = 1
),
n{c} AS (SELECT cluster, count(*) AS n FROM a{c} GROUP BY cluster),
s{c} AS (
  SELECT a.cluster, p.d, CAST(sum(p.v) AS BIGINT) AS s
  FROM a{c} a JOIN pts p ON p.vec_id = a.vec_id
  GROUP BY a.cluster, p.d
),
c{c} AS (
  SELECT s.cluster, s.d,
         (s.s - ((s.s % n.n) + n.n) % n.n) // n.n AS c
  FROM s{c} s JOIN n{c} n ON n.cluster = s.cluster
  UNION ALL
  SELECT cc.cluster, cc.d, cc.c FROM c{p} cc
  WHERE cc.cluster NOT IN (SELECT cluster FROM n{c})
)""")
    last = iters
    return ("WITH " + ",".join(parts) + f"""
SELECT cc.cluster,
       CAST(coalesce(any_value(n.n), 0) AS BIGINT) AS n,
       CAST(sum(cc.c) AS BIGINT) AS c_sum,
       CAST(sum(abs(cc.c)) AS BIGINT) AS c_abs
FROM c{last} cc LEFT JOIN n{last} n ON n.cluster = cc.cluster
GROUP BY cc.cluster
ORDER BY cc.cluster
""")


SQL_KMEANS_EMBEDDINGS = kmeans_sql(8, 3)
