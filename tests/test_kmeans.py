"""Distributed quantized k-means (stages/kmeans) — exactness properties.

The oracle gate (tools/verify_oracles.py kmeans_embeddings) checks the
full SQL twin; these tests pin the properties that MAKE it exact:
block-order/split invariance (integer sums are associative), the
empty-cluster carry rule, and parity with a single-process reference
implementation of the same integer arithmetic.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.stages.kmeans import (
    _assign,
    kmeans_quantized,
    quantize_matrix,
)


def _ref_kmeans(mat, ids, k, iters):
    """Single-process reference: same init, same integer rules."""
    order = np.argsort(ids, kind="stable")[:k]
    order = order[np.argsort(ids[order], kind="stable")]
    cent = quantize_matrix(mat[order])
    x = quantize_matrix(mat)
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        a = _assign(x, cent)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        nxt = cent.copy()
        for j in range(k):
            if counts[j]:
                nxt[j] = np.floor_divide(
                    x[a == j].sum(axis=0, dtype=np.int64), counts[j]
                )
        cent = nxt
    return cent, counts


def _ds_from(mat, ids, blocks):
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_matches_reference_and_block_invariant(ray_session):
    rng = np.random.RandomState(7)
    mat = rng.randn(200, 16).astype(np.float32) * 0.4
    ids = rng.permutation(1000)[:200].astype(np.int64)  # sparse, non-dense
    ref_c, ref_n = _ref_kmeans(mat.astype(np.float64), ids, k=5, iters=3)
    for blocks in (1, 7):
        km = kmeans_quantized(_ds_from(mat, ids, blocks), k=5, iters=3)
        np.testing.assert_array_equal(km.centroids, ref_c)
        np.testing.assert_array_equal(km.counts, ref_n)


def test_empty_cluster_carries_centroid(ray_session):
    # ids 0 and 1 are IDENTICAL points → both init centroids equal; ties
    # assign to the lowest cluster, so cluster 1 empties and must carry
    # its (unchanged) centroid with n = 0.
    mat = np.array(
        [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.96, 0.0], [0.0, 0.9]],
        dtype=np.float32,
    )
    ids = np.arange(5, dtype=np.int64)
    km = kmeans_quantized(_ds_from(mat, ids, 2), k=3, iters=1)
    assert km.counts[1] == 0
    np.testing.assert_array_equal(km.centroids[1], quantize_matrix(mat[1:2])[0])
    assert km.counts.sum() == 5


def test_too_few_rows_raises(ray_session):
    mat = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    with pytest.raises(ValueError, match="need"):
        kmeans_quantized(_ds_from(mat, np.array([0, 1]), 1), k=3, iters=1)


def test_semantic_dedup_finds_planted_pairs(ray_session):
    from semantic_search_system_ray.stages.kmeans import semantic_dedup_pairs

    rng = np.random.RandomState(3)
    mat = rng.randn(60, 8).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # plant two exact-duplicate pairs (cosine 1.0 survives quantization)
    mat[10] = mat[11]
    mat[40] = mat[41]
    ids = np.arange(60, dtype=np.int64)
    for blocks in (1, 5):
        got = (
            semantic_dedup_pairs(_ds_from(mat, ids, blocks), k=4, iters=2)
            .to_pandas().sort_values(["id_a", "id_b"])
        )
        planted = set(map(tuple, got[["id_a", "id_b"]].values))
        assert {(10, 11), (40, 41)} <= planted
        # identical vectors always co-cluster, and 0.95 is strict enough
        # that random unit vectors in 8-d rarely pair — but any extra
        # pair must at least be within one cluster (schema sanity)
        assert (got["cluster"] >= 0).all()


def test_semantic_dedup_overflow_guard(ray_session):
    from semantic_search_system_ray.stages.kmeans import semantic_dedup_pairs

    mat = np.full((6, 4), 5.0, dtype=np.float32)  # |q| = 5000 > bound
    with pytest.raises(Exception, match="overflow|unit-ish"):
        semantic_dedup_pairs(
            _ds_from(mat, np.arange(6, dtype=np.int64), 1), k=2, iters=1
        ).materialize()


def test_quantize_half_away_from_zero():
    m = np.array([[0.0005, -0.0005, 0.0004, -0.0014, 0.0]])
    np.testing.assert_array_equal(
        quantize_matrix(m), np.array([[1, -1, 0, -1, 0]])
    )


def _reference_kcenter(ids, vecs, k):
    """Single-process greedy farthest-point twin (integer milli-units)."""
    from semantic_search_system_ray.stages.kmeans import quantize_matrix

    q = quantize_matrix(np.asarray(vecs, dtype=np.float64))
    order = np.argsort(ids, kind="stable")
    sel = [int(ids[order[0]])]
    dists = [0]
    idx_of = {int(i): n for n, i in enumerate(ids)}
    for _ in range(1, k):
        best = None
        for i in ids:
            i = int(i)
            if i in sel:
                continue
            md = min(
                int(((q[idx_of[i]] - q[idx_of[s]]) ** 2).sum()) for s in sel
            )
            key = (-md, i)
            if best is None or key < best[0]:
                best = (key, i, md)
        sel.append(best[1])
        dists.append(best[2])
    return sel, dists


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_kcenter_greedy_matches_reference(ray_session, n_blocks):
    """Greedy k-center matches the single-process twin regardless of
    block layout; rank 0 = smallest id with dist 0; each later dist is
    the winner's min distance to the already-selected set."""
    from semantic_search_system_ray.stages.kmeans import kcenter_greedy

    rng = np.random.default_rng(5)
    ids = np.arange(20, dtype=np.int64) + 100
    vecs = rng.normal(size=(20, 6)).astype(np.float32)
    # plant an extreme outlier that must be picked at rank 1
    vecs[7] = 9.0
    ds = rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]
    })).repartition(n_blocks)
    got = kcenter_greedy(ds, k=5)
    ref_sel, ref_d = _reference_kcenter(ids, vecs, 5)
    assert got.column("vec_id").to_pylist() == ref_sel
    assert got.column("dist").to_pylist() == ref_d
    assert got.column("rank").to_pylist() == [0, 1, 2, 3, 4]
    assert got.column("vec_id").to_pylist()[0] == 100
    assert got.column("vec_id").to_pylist()[1] == 107  # the outlier
