"""Dedup suite + ANN tests: planted near-duplicates must cluster; exact
brute-force cosine must match numpy; LSH variant returns a subset of
plausible neighbors."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from semantic_search_system_ray.stages.ann import cosine_topk, lsh_bucket_topk
from semantic_search_system_ray.stages.dedup import (
    embedding_cosine_dups,
    exact_dedup,
    minhash_lsh_clusters,
    ngram_jaccard_pairs,
    simhash_clusters,
    simhash_table,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the committee "
    "discussed clean energy funding for the riverside district schools "
    "and the harbor transit authority approved the new rail service plan"
)


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    """40 distinct docs + 3 near-dup families (light word swaps) + 2 exact
    copies."""
    rows = []
    rng = np.random.RandomState(5)
    words = BASE.split()
    for i in range(40):
        perm = [words[j] for j in rng.permutation(len(words))]
        rows.append((f"d{i:03d}", " ".join(perm)))
    # near-dup family A: same text, one word changed
    rows.append(("dupA0", BASE))
    rows.append(("dupA1", BASE.replace("quick", "swift")))
    rows.append(("dupA2", BASE.replace("lazy", "idle")))
    # family B
    b = BASE.replace("clean energy", "solar power")
    rows.append(("dupB0", b))
    rows.append(("dupB1", b.replace("fox", "wolf")))
    # exact copies
    rows.append(("exact0", "identical text here"))
    rows.append(("exact1", "identical text here"))
    tbl = pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )
    return rd.from_arrow(tbl)


def test_exact_dedup(dup_corpus):
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(dup_corpus).take_all()}
    assert out["exact0"] == 2
    assert "exact1" not in out  # min-id representative
    assert sum(out.values()) == 47


def test_minhash_clusters_group_planted_dups(dup_corpus):
    labels = {
        r["doc_id"]: r["cluster"]
        for r in minhash_lsh_clusters(dup_corpus, threshold=0.5).take_all()
    }
    assert len(labels) == 47
    assert labels["dupA0"] == labels["dupA1"] == labels["dupA2"]
    assert labels["dupB0"] == labels["dupB1"]
    assert labels["exact0"] == labels["exact1"]
    # random-permutation docs share vocabulary but not shingles
    assert labels["d000"] != labels["dupA0"]


def test_simhash_exact_copy_and_table(dup_corpus):
    tbl = {r["doc_id"]: r["simhash"] for r in simhash_table(dup_corpus).take_all()}
    assert tbl["exact0"] == tbl["exact1"]
    # permuted docs have the SAME unigram multiset → same simhash (property
    # of unigram simhash); near-dup family differs in few bits
    labels = {
        r["doc_id"]: r["cluster"]
        for r in simhash_clusters(dup_corpus, max_hamming=8).take_all()
    }
    assert labels["exact0"] == labels["exact1"]
    assert labels["dupA0"] == labels["dupA1"]


def test_ngram_jaccard_pairs(dup_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.7).take_all()
    }
    assert ("dupA0", "dupA1") in pairs
    assert pairs[("dupA0", "dupA1")] > 0.85
    assert ("exact0", "exact1") in pairs
    assert pairs[("exact0", "exact1")] == 1.0
    assert all(a < b for a, b in pairs)


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    rng = np.random.RandomState(3)
    mat = rng.normal(size=(200, 32))
    tbl = pa.Table.from_pydict(
        {"vec_id": list(range(200)),
         "embedding": [row.tolist() for row in mat.astype(np.float32)]}
    )
    return rd.from_arrow(tbl), mat


def test_cosine_topk_matches_numpy(vec_ds):
    ds, mat = vec_ds
    q = mat[7]
    got = [r["vec_id"] for r in cosine_topk(ds, q, k=5).take_all()]
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ (q / np.linalg.norm(q))
    # float32 storage: recompute reference from the stored precision
    stored = np.array(mat, dtype=np.float32).astype(np.float64)
    stored = stored / np.linalg.norm(stored, axis=1, keepdims=True)
    qs = np.asarray(q, dtype=np.float64)
    sims = stored @ (qs / np.linalg.norm(qs))
    expect = list(np.argsort(-sims, kind="stable")[:5])
    assert got == expect
    assert got[0] == 7


def test_lsh_topk_subset_of_bucket(vec_ds):
    ds, mat = vec_ds
    q = mat[7]
    got = [r["vec_id"] for r in lsh_bucket_topk(ds, q, k=5, num_planes=4).take_all()]
    assert 7 in got  # the query's own vector shares its bucket
    assert len(got) <= 5


def test_minhash_join_verify_parity(dup_corpus):
    """The distributed hash-join verification path must produce the same
    clustering as the broadcast path (the scale switch must be invisible)."""
    broadcast = {
        r["doc_id"]: r["cluster"]
        for r in minhash_lsh_clusters(dup_corpus, threshold=0.5,
                                      verify="broadcast").take_all()
    }
    join = {
        r["doc_id"]: r["cluster"]
        for r in minhash_lsh_clusters(dup_corpus, threshold=0.5,
                                      verify="join").take_all()
    }
    assert broadcast == join


def test_ngram_join_verify_parity(dup_corpus):
    broadcast = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.7,
                                     verify="broadcast").take_all()
    }
    join = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.7,
                                     verify="join").take_all()
    }
    assert broadcast == join


def test_cosine_dups_lsh_recall(ray_session):
    """LSH-bucketed near-dup pairs recover the exact path's high-cosine
    pairs on a planted corpus (8 tables × 8 planes; deterministic seed)."""
    rng = np.random.RandomState(23)
    vecs, ids = [], []
    for fam in range(10):
        base = rng.normal(size=32)
        for j in range(3):  # 3 near-copies per family, cos ≈ 0.999
            v = base + rng.normal(scale=0.02, size=32)
            ids.append(fam * 10 + j)
            vecs.append(v.astype(np.float32).tolist())
    for i in range(100):  # background noise
        ids.append(1000 + i)
        vecs.append(rng.normal(size=32).astype(np.float32).tolist())
    ds = rd.from_arrow(pa.Table.from_pydict({"vec_id": ids, "embedding": vecs}))
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_cosine_dups(ds, threshold=0.99, strategy="exact").take_all()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_cosine_dups(ds, threshold=0.99, strategy="lsh").take_all()}
    assert exact, "planted families must produce exact pairs"
    assert lsh <= exact or not (lsh - exact)  # LSH never invents pairs
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} too low"


def test_embedding_cosine_dups_pairs(ray_session):
    rng = np.random.RandomState(11)
    base = rng.normal(size=32)
    rows = {"vec_id": [0, 1, 2], "embedding": [
        base.astype(np.float32).tolist(),
        (base + rng.normal(scale=0.01, size=32)).astype(np.float32).tolist(),
        rng.normal(size=32).astype(np.float32).tolist(),
    ]}
    ds = rd.from_arrow(pa.Table.from_pydict(rows))
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_cosine_dups(ds, threshold=0.95).take_all()}
    assert (0, 1) in pairs
    assert all(p[1] != 2 and p[0] != 2 for p in pairs)


def test_minhash_distributed_cc_parity(dup_corpus):
    """Forcing the distributed connected-components path (edge threshold 0)
    must yield the same clustering as the driver union-find."""
    driver = {
        r["doc_id"]: r["cluster"]
        for r in minhash_lsh_clusters(dup_corpus, threshold=0.5).take_all()
    }
    dist = {
        r["doc_id"]: r["cluster"]
        for r in minhash_lsh_clusters(
            dup_corpus, threshold=0.5, driver_edge_threshold=0
        ).take_all()
    }
    assert driver == dist


def test_lsh_topk_multiprobe_recall(ray_session):
    """Multi-probe (Hamming ≤ 1, ≤ 2) monotonically improves recall, and
    with probes=2 the PLANTED near-neighbors (cos ≈ 0.99 — the regime LSH
    targets) are all recovered."""
    rng = np.random.RandomState(41)
    q = rng.normal(size=32)
    vecs = [(q + rng.normal(scale=0.05, size=32)).astype(np.float32).tolist()
            for _ in range(5)]                      # ids 0-4: true neighbors
    vecs += [rng.normal(size=32).astype(np.float32).tolist() for _ in range(200)]
    ds = rd.from_arrow(pa.Table.from_pydict(
        {"vec_id": list(range(len(vecs))), "embedding": vecs}
    ))
    exact = {r["vec_id"] for r in cosine_topk(ds, q, k=5).take_all()}
    assert exact == {0, 1, 2, 3, 4}

    def recall(p):
        got = {r["vec_id"] for r in
               lsh_bucket_topk(ds, q, k=5, num_planes=6, probes=p).take_all()}
        return len(got & exact) / len(exact)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2
    assert r2 == 1.0


def test_ivf_topk_recall(ray_session):
    """IVF probe of the nearest lists recovers planted near-neighbors; a
    full probe (nprobe == nlist) equals exact brute force."""
    from semantic_search_system_ray.stages.ann import ivf_topk

    rng = np.random.RandomState(53)
    q = rng.normal(size=32)
    vecs = [(q + rng.normal(scale=0.05, size=32)).astype(np.float32).tolist()
            for _ in range(5)]
    vecs += [rng.normal(size=32).astype(np.float32).tolist() for _ in range(300)]
    ds = rd.from_arrow(pa.Table.from_pydict(
        {"vec_id": list(range(len(vecs))), "embedding": vecs}
    ))
    exact = [r["vec_id"] for r in cosine_topk(ds, q, k=5).take_all()]
    assert set(exact) == {0, 1, 2, 3, 4}
    got = [r["vec_id"] for r in ivf_topk(ds, q, k=5, nlist=8, nprobe=2).take_all()]
    assert set(got) & set(exact), "planted neighbors live in the probed lists"
    recall = len(set(got) & set(exact)) / 5
    assert recall >= 0.8
    full = [r["vec_id"] for r in ivf_topk(ds, q, k=5, nlist=8, nprobe=8).take_all()]
    assert full == exact  # probing every list == brute force


# ---------------------------------------------------------------------------
# edit-distance fuzzy pairs (SymSpell deletion blocking)
# ---------------------------------------------------------------------------

def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_banded_matches_reference():
    from semantic_search_system_ray.stages.dedup import _lev_banded

    words = ["", "a", "ab", "abc", "abd", "xabc", "bc", "abcd", "badc",
             "red widget", "red gadget", "blue bolt"]
    for k in (1, 2):
        for a in words:
            for b in words:
                ref = _lev_ref(a, b)
                got = _lev_banded(a, b, k)
                assert got == (ref if ref <= k else None), (a, b, k)


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("n_blocks", [1, 3])
def test_edit_distance_pairs_bruteforce_parity(ray_session, k, n_blocks):
    import ray.data as rd

    from semantic_search_system_ray.stages.dedup import edit_distance_pairs

    names = [
        "red widget", "red gadget", "red widgets", "blue bolt", "blu bolt",
        "blue bolts", "green ring", "green rings", "greon ring",
        "odd one out entirely", "red widget",  # duplicate collapses
    ]
    ds = rd.from_items([{"p_name": n} for n in names]).repartition(n_blocks)
    got = sorted(
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(ds, name_col="p_name", k=k).take_all()
    )
    uniq = sorted(set(names))
    want = sorted(
        (a, b, _lev_ref(a, b))
        for i, a in enumerate(uniq) for b in uniq[i + 1:]
        if _lev_ref(a, b) <= k
    )
    assert got == want


def test_multi_query_exact_matches_single(vec_ds):
    """The fused multi-query exact path must agree with cosine_topk per
    query (same k, same tie rule) on ids."""
    from semantic_search_system_ray.stages.ann import multi_query_exact_topk

    ds, mat = vec_ds
    qids = [3, 7, 11]
    got = multi_query_exact_topk(ds, mat[qids], qids, k=5).take_all()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for q in qids:
        single = [r["vec_id"] for r in cosine_topk(ds, mat[q], k=5).take_all()]
        assert per_q[q] == single, q


def test_ivf_multi_full_probe_equals_exact(vec_ds):
    """nprobe == nlist probes every list → the 'approximate' result must
    be EXACTLY the exact top-k (identity check on the masking logic)."""
    from semantic_search_system_ray.stages.ann import (
        ivf_topk_multi,
        multi_query_exact_topk,
    )

    ds, mat = vec_ds
    qids = [0, 5]
    ex = multi_query_exact_topk(ds, mat[qids], qids, k=5).take_all()
    ap = ivf_topk_multi(ds, mat[qids], qids, k=5, nlist=4, nprobe=4).take_all()
    key = lambda r: (r["query_id"], r["vec_id"], r["score"])
    assert sorted(map(key, ex)) == sorted(map(key, ap))


def test_lsh_multi_full_probe_equals_exact(vec_ds):
    """probes=2 with num_planes=2 covers ALL 4 buckets → identical to
    exact."""
    from semantic_search_system_ray.stages.ann import (
        lsh_bucket_topk_multi,
        multi_query_exact_topk,
    )

    ds, mat = vec_ds
    qids = [2, 9]
    ex = multi_query_exact_topk(ds, mat[qids], qids, k=5).take_all()
    ap = lsh_bucket_topk_multi(
        ds, mat[qids], qids, k=5, num_planes=2, probes=2
    ).take_all()
    key = lambda r: (r["query_id"], r["vec_id"], r["score"])
    assert sorted(map(key, ex)) == sorted(map(key, ap))


def test_ann_recall_certificate_flags(vec_ds):
    """Certificate rows flip to False exactly when a query's recall is
    below its bound; the mean row aggregates."""
    from semantic_search_system_ray.stages.ann import (
        ann_recall_certificate,
        multi_query_exact_topk,
    )

    ds, mat = vec_ds
    qids = [1, 4]
    ex = multi_query_exact_topk(ds, mat[qids], qids, k=5)
    # perfect approx = exact → all True even at bound 1.0
    cert = ann_recall_certificate(
        ex, ex, k=5, min_recall_ppm=1_000_000, mean_min_recall_ppm=1_000_000
    ).to_pylist()
    assert [r["recall_ok"] for r in cert] == [True, True, True]
    assert [r["query_id"] for r in cert] == [1, 4, -1]
    # empty approx → zero hits → all False at any positive bound
    import ray.data as rd_

    empty = rd_.from_arrow(
        pa.Table.from_pydict(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    )
    cert2 = ann_recall_certificate(
        ex, empty, k=5, min_recall_ppm=1, mean_min_recall_ppm=1
    ).to_pylist()
    assert [r["recall_ok"] for r in cert2] == [False, False, False]


def test_minhash_incremental_semantics(ray_session):
    """Incremental probe: an incoming near-copy of an INDEXED doc is a
    dup (dup_of = the indexed id); an incoming doc whose only near-copy
    is another INCOMING doc stays novel (incremental semantics never
    pairs new with new); unrelated docs are novel. Both verify regimes
    agree."""
    from semantic_search_system_ray.stages.dedup import minhash_incremental

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    other = (
        "completely different text about distributed stream processing "
        "engines shuffling arrow record batches with backpressure"
    )
    third = (
        "yet another unrelated document describing knowledge graph "
        "construction pipelines at terabyte scale with ray data"
    )
    indexed = rd.from_arrow(pa.table({
        "doc_id": ["i1", "i2"],
        "text": [base, other],
    })).repartition(2)
    incoming = rd.from_arrow(pa.table({
        "doc_id": ["n1", "n2", "n3", "n4"],
        "text": [
            base + " extra",          # near-copy of indexed i1 -> dup
            third,                    # near-copy only of n3 -> novel
            third + " indeed",        # near-copy only of n2 -> novel
            "totally novel content about nothing else whatsoever here",
        ],
    })).repartition(2)

    for verify in ("broadcast", "join"):
        got = (
            minhash_incremental(indexed, incoming, threshold=0.5,
                                verify=verify)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        rows = list(zip(got["doc_id"], got["status"], got["dup_of"]))
        assert rows == [
            ("n1", "dup", "i1"),
            ("n2", "novel", ""),
            ("n3", "novel", ""),
            ("n4", "novel", ""),
        ], rows


def test_cosine_range_search_matches_numpy(ray_session, vec_ds):
    """Range search returns EXACTLY the set above the threshold, with
    the exact integer grams, regardless of block layout."""
    from semantic_search_system_ray.stages.ann import cosine_range_search
    from semantic_search_system_ray.stages.kmeans import quantize_matrix

    ds, _mat = vec_ds
    got = (
        cosine_range_search(ds, n_queries=3, tau_num=9, tau_den=100)
        .to_pandas().sort_values(["qid", "vec_id"]).reset_index(drop=True)
    )
    rows = ds.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    Q = quantize_matrix(np.array([r["embedding"] for r in rows[:3]], np.float64))
    X = quantize_matrix(np.array([r["embedding"] for r in rows], np.float64))
    dot = X @ Q.T
    xn2 = np.einsum("bd,bd->b", X, X)
    qn2 = np.einsum("qd,qd->q", Q, Q)
    keep = (
        (dot >= 0) & (xn2[:, None] > 0) & (qn2[None, :] > 0)
        & (100 * dot * dot >= 9 * xn2[:, None] * qn2[None, :])
        & (ids[:, None] != ids[None, :3])
    )
    exp = sorted(
        (int(ids[c]), int(ids[r]), int(dot[r, c]))
        for r, c in zip(*np.nonzero(keep))
    )
    assert list(zip(got["qid"], got["vec_id"], got["dot"])) == exp
    assert len(exp) > 0  # the fixture corpus must exercise matches


def test_minhash_calibration_zero_shingle_docs(ray_session):
    """Regression (ADVICE r4): zero-token docs produce EMPTY shingle
    sets but identical all-0xFFFFFFFF signatures, so they always
    band-collide into candidate pairs. The partial kernel must drop
    their '' placeholder from the flattened gram arrays BEFORE zeroing
    lengths (CSR contract: sum(lens) == len(flat)) — previously this
    raised ValueError and would mis-attribute grams across pairs.
    Engine must match the DuckDB oracle (COALESCE path) exactly."""
    import duckdb
    import pandas as pd

    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_minhash_calibration,
    )
    from semantic_search_system_ray.stages.dedup import minhash_calibration

    rows = [
        ("z0", "!!!"),          # zero tokens -> zero shingles
        ("z1", "..."),          # zero tokens -> zero shingles
        ("z2", ""),             # empty text
        ("dupA0", BASE),
        ("dupA1", BASE.replace("quick", "swift")),
        ("n0", "completely unrelated words about maritime navigation"),
    ]
    tbl = pa.Table.from_pydict(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )
    got = (
        minhash_calibration(rd.from_arrow(tbl))
        .to_pandas().sort_values("est_bin").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = (
        con.execute(sql_minhash_calibration())
        .fetchdf().sort_values("est_bin").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)]
    )
    # the zero-shingle family must actually appear: star pairs over the
    # 3-doc family (2 pairs) with inter=0, union=0 land in the top bin
    # with pooled 0.0
    top = got[got["est_bin"] == 10]
    assert len(top) == 1 and int(top["n_pairs"].iloc[0]) == 2
    assert float(top["pooled_jaccard"].iloc[0]) == 0.0
