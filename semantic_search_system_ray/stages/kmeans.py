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

from typing import NamedTuple

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
    cluster j = rank j. TWO top-k combiner levels (per input block, then
    per reduce partition), never a global sort: the driver fold sees at
    most ``reduce_parts × k`` rows however many blocks the corpus has."""
    def local_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return t.select([id_col, vec_col]).take(pa.array(take))

    reduce_parts = 16
    cand = (
        ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
        .repartition(reduce_parts)
        .map_batches(local_topk, batch_format="pyarrow", batch_size=None)
        .take_all()
    )  # ≤ reduce_parts × k rows
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


class KMeansResult(NamedTuple):
    centroids: np.ndarray         # int64 (K, D), after the final update
    counts: np.ndarray            # int64 (K,), final-assignment sizes
    assign_centroids: np.ndarray  # the centroids that PRODUCED the
    #                               final assignment (for re-deriving it)


def kmeans_quantized(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
) -> KMeansResult:
    """Full-data distributed Lloyd's over quantized vectors →
    ``KMeansResult``. ``counts`` are the sizes of the assignment that
    PRODUCED the final centroids (iteration ``iters``'s assignment);
    empty clusters carry their previous centroid and report n = 0.
    ``assign_centroids`` (the iteration-``iters - 1`` centroids) let a
    consumer re-derive that exact assignment in one streaming pass."""
    cent = _init_centroids(ds, id_col=id_col, vec_col=vec_col, k=k)
    dim = cent.shape[1]
    counts = np.zeros(k, dtype=np.int64)
    assign_cent = cent

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
        assign_cent = cent
        cent = nxt
    return KMeansResult(cent, counts, assign_cent)


def q_kmeans_embeddings(sf_dir: str) -> pa.Table:
    """Gate query: K=8, 3 Lloyd iterations over the embeddings table →
    one (cluster, n, c_sum, c_abs) row per cluster, hash-exact against
    the unrolled-iteration SQL twin."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    km = kmeans_quantized(ds, k=8, iters=3)
    return pa.Table.from_pydict(
        {"cluster": np.arange(8, dtype=np.int64),
         "n": km.counts,
         "c_sum": km.centroids.sum(axis=1),
         "c_abs": np.abs(km.centroids).sum(axis=1)},
        schema=KMEANS_SCHEMA,
    )


PAIRS_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("cluster", pa.int64())]
)

# |quantized component| bound for the int64-exact cosine test below:
# dot ≤ D·B², 400·dot² must stay < 2⁶³ → B ≤ ~2600 at D = 64. The
# embeddings table is unit-ish (|x| ≤ ~1 → |q| ≤ ~1000); vectors
# outside the bound fail LOUDLY instead of overflowing silently.
_COSINE_Q_BOUND = 2600


def semantic_dedup_pairs(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    tau_num: int = 361,
    tau_den: int = 400,
) -> rd.Dataset:
    """SemDeDup-style semantic near-duplicate pairs: k-means is the
    BLOCKING structure (quadratic work happens only within a cluster —
    choose K ∝ N so clusters stay bounded; K here is the gate-query
    default), then every within-cluster pair with cosine ≥ √(τ²) is
    emitted, where τ² = ``tau_num/tau_den`` (default 361/400 → cosine ≥
    0.95). The threshold test is INTEGER-EXACT on the quantized
    vectors: cos ≥ τ ⟺ dot ≥ 0 ∧ tau_den·dot² ≥ tau_num·|a|²·|b|² —
    no float comparison anywhere, so the SQL twin hashes bit-identically.
    Zero-norm vectors (undefined cosine) never pair. → (id_a, id_b,
    cluster), id_a < id_b.

    Scale shape: one fit (see kmeans_quantized), one streaming
    assignment pass, ONE shuffle grouping rows by cluster, vectorized
    integer gram matrix per cluster group."""
    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    km = kmeans_quantized(
        ds, vec_col=vec_col, id_col=id_col, k=k, iters=iters
    )
    C = km.assign_centroids

    member_schema = pa.schema(
        [("vec_id", pa.int64()), ("cluster", pa.int64()),
         ("q", pa.list_(pa.int64()))]
    )

    def assign_batch(t: pa.Table) -> pa.Table:
        x = quantize_matrix(list_column_to_matrix(t.column(vec_col)))
        hi = int(np.abs(x).max(initial=0))
        if hi > _COSINE_Q_BOUND:
            raise ValueError(
                f"semantic_dedup_pairs: |quantized| {hi} > "
                f"{_COSINE_Q_BOUND} would overflow the int64-exact "
                "cosine test (vectors must be unit-ish)"
            )
        import pyarrow.compute as pc

        a = _assign(x, C)
        return pa.Table.from_pydict(
            {"vec_id": pc.cast(t.column(id_col), pa.int64()),
             "cluster": pa.array(a, pa.int64()),
             "q": pa.array(x.tolist(), pa.list_(pa.int64()))},
            schema=member_schema,
        )

    def cluster_pairs(df) -> pa.Table:
        m = len(df)
        if m < 2:
            return PAIRS_SCHEMA.empty_table()
        ids = df["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.stack(df["q"].to_numpy()[order]).astype(np.int64)
        gram = mat @ mat.T
        nn = np.einsum("bd,bd->b", mat, mat)
        iu, ju = np.triu_indices(m, k=1)
        dot = gram[iu, ju]
        ok = (
            (nn[iu] > 0) & (nn[ju] > 0) & (dot >= 0)
            & (tau_den * dot * dot >= tau_num * nn[iu] * nn[ju])
        )
        return pa.Table.from_pydict(
            {"id_a": ids[iu[ok]], "id_b": ids[ju[ok]],
             "cluster": np.full(int(ok.sum()), int(df["cluster"].iloc[0]),
                                dtype=np.int64)},
            schema=PAIRS_SCHEMA,
        )

    members = ds.map_batches(assign_batch, batch_format="pyarrow")
    return coarse_grouped_apply(
        members, ["cluster"], cluster_pairs, PAIRS_SCHEMA, min_group_size=2
    )


def q_semantic_dedup(sf_dir: str) -> rd.Dataset:
    """Gate query: within-cluster high-cosine pairs over the embeddings
    table, k-means blocking (K=8, 3 iterations). The gate threshold is
    τ = 0.45 (τ² = 81/400) because the synthetic embeddings carry no
    planted near-duplicates (max pairwise cosine ≈ 0.51) — a 0.95 gate
    would hash an always-empty set and verify nothing; the operator
    default stays 0.95 for real near-dup use."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup_pairs(ds, k=8, iters=3, tau_num=81, tau_den=400)


def semantic_dedup_sql(k: int = 8, iters: int = 3,
                       tau_num: int = 361, tau_den: int = 400) -> str:
    """DuckDB twin of semantic_dedup_pairs: the kmeans CTE chain's final
    assignment blocks the pair space; the cosine threshold is the same
    integer test (HUGEINT in SQL — the engine asserts the int64 bound)."""
    base = kmeans_sql(k, iters)
    prefix = base[: base.index("\nSELECT cc.cluster")]
    return (prefix + f""",
nrm AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS nn FROM pts GROUP BY vec_id),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster
  FROM a{iters} a JOIN a{iters} b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.id_a, c.id_b, c.cluster,
         CAST(sum(pa.v * pb.v) AS BIGINT) AS dot
  FROM cand c
  JOIN pts pa ON pa.vec_id = c.id_a
  JOIN pts pb ON pb.vec_id = c.id_b AND pb.d = pa.d
  GROUP BY c.id_a, c.id_b, c.cluster
)
SELECT d.id_a, d.id_b, d.cluster
FROM dots d
JOIN nrm na ON na.vec_id = d.id_a
JOIN nrm nb ON nb.vec_id = d.id_b
WHERE na.nn > 0 AND nb.nn > 0 AND d.dot >= 0
  AND {tau_den} * CAST(d.dot AS HUGEINT) * d.dot
      >= {tau_num} * CAST(na.nn AS HUGEINT) * nb.nn
ORDER BY id_a, id_b
""")


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
SQL_SEMANTIC_DEDUP = semantic_dedup_sql(8, 3, tau_num=81, tau_den=400)


# --------------------------------------------------------------------------
# Greedy k-center coreset selection (farthest-point sampling)
# --------------------------------------------------------------------------

KCENTER_SCHEMA = pa.schema(
    [("rank", pa.int64()), ("vec_id", pa.int64()), ("dist", pa.int64())]
)

_KC_CAND_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("dist", pa.int64()),
     ("vec", pa.list_(pa.float64()))]
)


def kcenter_greedy(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> pa.Table:
    """Greedy k-center / farthest-point coreset selection (Gonzalez
    1985) over an embedding column — the classic diverse-subset pick
    for training-data selection (each new point maximizes its distance
    to everything already chosen, so the k rows 2-approximate the
    optimal k-center cover). EXACT on the hash gate by the kmeans
    playbook: vectors quantize once to int64 milli-units
    (``quantize_matrix``); distances are integer squared-L2 (≤ D·4e6 —
    nowhere near int64); c0 = the row with the SMALLEST id; each round
    selects the not-yet-chosen point with the MAXIMUM min-distance to
    the selected set, ties to the smallest id. Output: (rank, vec_id,
    dist) where dist = the winner's min squared distance to the
    previously selected set (0 for rank 0) — hash-identical to the
    unrolled-CTE DuckDB twin (``kcenter_sql``).

    Scale shape: k−1 streaming passes; each pass broadcasts the ≤K×D
    int64 center matrix BY VALUE into a per-block (argmax dist, tie
    min id) combiner emitting ONE candidate row per block, and the
    driver folds the blocks-bounded candidate set. Zero shuffles at
    any corpus size (the same broadcast-iterate pattern as
    kmeans_quantized)."""
    ds = ds.materialize()  # consumed k times

    def local_min_id(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, vec_col])
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:1]
        return t.select([id_col, vec_col]).take(pa.array(take))

    cand0 = ds.map_batches(
        local_min_id, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not cand0:
        raise ValueError("kcenter: empty input")
    cand0.sort(key=lambda r: r[id_col])
    first = cand0[0]
    sel_ids = [int(first[id_col])]
    dists = [0]
    centers = quantize_matrix(
        np.asarray([first[vec_col]], dtype=np.float64)
    )

    for _rank in range(1, k):
        C = centers.copy()  # captured by value: per-pass broadcast
        excl = np.array(sel_ids, dtype=np.int64)

        def far_block(t: pa.Table, C=C, excl=excl) -> pa.Table:
            if t.num_rows == 0:
                return _KC_CAND_SCHEMA.empty_table()
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            X = quantize_matrix(list_column_to_matrix(t.column(vec_col)))
            x2 = np.einsum("bd,bd->b", X, X)
            c2 = np.einsum("kd,kd->k", C, C)
            d = x2[:, None] + c2[None, :] - 2 * (X @ C.T)
            md = d.min(axis=1)
            mask = ~np.isin(ids, excl)
            if not mask.any():
                return _KC_CAND_SCHEMA.empty_table()
            rows = np.flatnonzero(mask)
            order = np.lexsort((ids[rows], -md[rows]))  # max dist, tie min id
            ri = rows[order[0]]
            return pa.Table.from_pydict(
                {"vec_id": [int(ids[ri])], "dist": [int(md[ri])],
                 "vec": [t.column(vec_col)[ri].as_py()]},
                schema=_KC_CAND_SCHEMA,
            )

        cands = ds.map_batches(
            far_block, batch_format="pyarrow", batch_size=None
        ).take_all()  # ≤ one row per block
        if not cands:
            raise ValueError(f"kcenter: need ≥ {k} distinct rows")
        cands.sort(key=lambda r: (-r["dist"], r["vec_id"]))
        w = cands[0]
        sel_ids.append(int(w["vec_id"]))
        dists.append(int(w["dist"]))
        centers = np.vstack([
            centers,
            quantize_matrix(np.asarray([w["vec"]], dtype=np.float64)),
        ])

    return pa.Table.from_pydict(
        {"rank": np.arange(k, dtype=np.int64),
         "vec_id": np.array(sel_ids, dtype=np.int64),
         "dist": np.array(dists, dtype=np.int64)},
        schema=KCENTER_SCHEMA,
    )


def q_kcenter_coreset(sf_dir: str) -> pa.Table:
    """Gate query: greedy k-center, K=8, over the embeddings table."""
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kcenter_greedy(ds, k=8)


def kcenter_sql(k: int = 8) -> str:
    """The DuckDB twin: same quantization, integer squared-L2, the k−1
    greedy rounds UNROLLED as chained MATERIALIZED CTEs (each round:
    distance to the newest center, running min, argmax with
    (dist DESC, vec_id) tie order, previously chosen ids excluded)."""
    quant = (
        "CAST(CASE WHEN x >= 0 THEN floor(CAST(x AS DOUBLE)*1000 + 0.5) "
        "ELSE -floor(-CAST(x AS DOUBLE)*1000 + 0.5) END AS BIGINT)"
    )
    parts = [f"""
q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> {quant}) AS qe
  FROM embeddings
),
pts AS MATERIALIZED (
  SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS d FROM q
),
s0 AS MATERIALIZED (SELECT min(vec_id) AS vid FROM q)"""]
    prev_sel = ["s0"]
    for i in range(1, k):
        pc_ = i - 1  # center chosen at the previous round
        not_in = " UNION ALL ".join(f"SELECT vid FROM {s}" for s in prev_sel)
        parts.append(f""",
d{pc_} AS MATERIALIZED (
  SELECT p.vec_id, CAST(sum((p.v - c.v) * (p.v - c.v)) AS BIGINT) AS dist
  FROM pts p JOIN (
    SELECT d, v FROM pts WHERE vec_id = (SELECT vid FROM s{pc_})
  ) c ON c.d = p.d
  GROUP BY p.vec_id
),
m{pc_} AS MATERIALIZED (
  {"SELECT vec_id, dist FROM d0" if pc_ == 0 else
   f"SELECT m.vec_id, least(m.dist, d.dist) AS dist "
   f"FROM m{pc_ - 1} m JOIN d{pc_} d ON d.vec_id = m.vec_id"}
),
s{i} AS MATERIALIZED (
  SELECT vec_id AS vid FROM m{pc_}
  WHERE vec_id NOT IN ({not_in})
  ORDER BY dist DESC, vec_id LIMIT 1
)""")
        prev_sel.append(f"s{i}")
    finals = ["SELECT CAST(0 AS BIGINT) AS rank, "
              "(SELECT vid FROM s0) AS vec_id, CAST(0 AS BIGINT) AS dist"]
    for i in range(1, k):
        finals.append(
            f"SELECT CAST({i} AS BIGINT), (SELECT vid FROM s{i}), "
            f"(SELECT dist FROM m{i - 1} WHERE vec_id = "
            f"(SELECT vid FROM s{i}))"
        )
    return "WITH " + "".join(parts) + "\n" + "\nUNION ALL ".join(finals)


SQL_KCENTER_CORESET = kcenter_sql(8)
