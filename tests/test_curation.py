"""Curation operators (stages/curation): deterministic stratified
sampling and benchmark decontamination."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.stages.curation import (
    contamination_check,
    stratified_sample,
)


def test_stratified_sample_rates_and_determinism(ray_session):
    n = 20_000
    langs = ["en", "de", "fr", "zh"]
    t = pa.table({
        "doc_id": list(range(n)),
        "lang": [langs[i % 4] for i in range(n)],
    })
    ds = rd.from_arrow(t)
    out = stratified_sample(
        ds, key_col="lang", id_col="doc_id",
        rates={"en": 0.25, "de": 0.0}, default_rate=1.0,
    ).take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert "de" not in by_lang                      # rate 0 → nothing
    assert len(by_lang["fr"]) == n // 4             # default 1.0 → all
    assert len(by_lang["zh"]) == n // 4
    frac_en = len(by_lang["en"]) / (n // 4)
    assert abs(frac_en - 0.25) < 0.03               # md5 ≈ uniform

    # pure function of the row: identical sample on a reshuffled rerun
    again = stratified_sample(
        rd.from_arrow(t).random_shuffle(seed=5),
        key_col="lang", id_col="doc_id",
        rates={"en": 0.25, "de": 0.0}, default_rate=1.0,
    ).take_all()
    assert {(r["lang"], r["doc_id"]) for r in again} == {
        (r["lang"], r["doc_id"]) for r in out
    }


def test_contamination_ground_truth(ray_session):
    docs = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": [
            "the quick brown fox jumps",        # contains 'quick brown fox'
            "quick brown dog sleeps",           # no benchmark gram
            "THE QUICK BROWN FOX again quick brown fox",  # case-folded; set semantics
            "",                                  # empty
        ],
    })
    out = {
        r["doc_id"]: (r["n_matched"], r["contaminated"])
        for r in contamination_check(
            rd.from_arrow(docs),
            ["quick brown fox", "lazy dog naps"], n=3,
        ).take_all()
    }
    assert out == {
        "a": (1, True), "b": (0, False), "c": (1, True), "d": (0, False)
    }


def test_md5_hash64_matches_duckdb_md5_number_lower():
    """Pin the cross-system hash contract every r3 oracle rests on:
    functions/hashing.md5_hash64 == DuckDB md5_number_lower (md5 digest
    bytes 8..16, little-endian) — checked over ASCII, unicode, and
    edge-case strings."""
    import duckdb

    from semantic_search_system_ray.functions.hashing import md5_hash64

    con = duckdb.connect()
    samples = [
        "", "a", "hello world", "media://asset-07:image:3",
        "0:0", "doc123:17", "üñïçödé ωστε 漢字", "x" * 1000, "\t\n ",
    ]
    for s in samples:
        got = con.execute(
            "SELECT md5_number_lower(?)", [s]
        ).fetchone()[0]
        assert got == md5_hash64(s), s


def test_repetition_score_ground_truth(ray_session):
    from semantic_search_system_ray.stages.curation import repetition_score

    docs = pa.table({
        "doc_id": ["a", "b", "c"],
        "text": [
            "x y z x y z x y z",   # 7 trigrams, 3 distinct → 4/7 repeated
            "p q r s",             # 2 trigrams, both distinct → 0.0
            "u v",                 # shorter than n → 0 grams, ratio 0.0
        ],
    })
    out = {r["doc_id"]: r for r in repetition_score(
        rd.from_arrow(docs), n=3
    ).take_all()}
    assert (out["a"]["n_grams"], out["a"]["n_distinct"]) == (7, 3)
    assert abs(out["a"]["rep_ratio"] - (1 - 3 / 7)) < 1e-12
    assert out["b"]["rep_ratio"] == 0.0
    assert (out["c"]["n_grams"], out["c"]["rep_ratio"]) == (0, 0.0)


def test_inverted_index_postings_and_df_caps(ray_session):
    from semantic_search_system_ray.stages.curation import build_inverted_index

    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta", "beta gamma beta", "gamma beta alpha"],
    })
    ds = rd.from_arrow([docs.slice(0, 2), docs.slice(2)])  # multi-block
    idx = {r["term"]: (r["df"], r["postings"]) for r in
           build_inverted_index(ds).take_all()}
    assert idx == {
        "alpha": (2, "1,3"),
        "beta": (3, "1,2,3"),
        "gamma": (2, "2,3"),
    }
    capped = {r["term"] for r in
              build_inverted_index(ds, min_df=2, max_df=2).take_all()}
    assert capped == {"alpha", "gamma"}  # 'beta' (df=3) capped out


def test_cross_doc_ngram_dups_ground_truth(ray_session):
    from semantic_search_system_ray.stages.curation import cross_doc_ngram_dups

    boiler = "the quick brown fox jumps"
    docs = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "text": [
            f"{boiler} over one lazy dog",     # shares the boiler 5-gram w/ b
            f"intro words {boiler} outro",     # shares the boiler 5-gram w/ a
            "completely different text with no overlap at all here",
            "tiny",                            # < n tokens → zero row
        ],
    })
    ds = rd.from_arrow([docs.slice(0, 2), docs.slice(2)])  # multi-block
    out = {r["doc_id"]: r for r in cross_doc_ngram_dups(ds, n=5).take_all()}
    assert len(out) == 4
    # doc a: tokens=9 → 5 grams; exactly the boiler gram is shared
    assert (out["a"]["n_grams"], out["a"]["n_shared"]) == (5, 1)
    assert abs(out["a"]["dup_frac"] - 1 / 5) < 1e-15
    assert out["b"]["n_shared"] == 1
    assert (out["c"]["n_shared"], out["c"]["dup_frac"]) == (0, 0.0)
    assert (out["d"]["n_grams"], out["d"]["dup_frac"]) == (0, 0.0)


def test_remove_duplicated_spans_ground_truth(ray_session):
    """Planted cross-doc spans: exactly the covered tokens disappear,
    within-doc-only repeats survive, fully-covered docs emit no row."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_search_system_ray.stages.curation import (
        remove_duplicated_spans,
    )

    shared = "alpha beta gamma delta epsilon"  # the duplicated 5-gram
    docs = {
        1: f"intro words here {shared} outro tail",
        2: f"{shared} different ending entirely now",
        3: "unique text with no overlap at all present",
        # 4: within-doc repeat only (one doc) → NOT removed
        4: "rep rep rep rep rep rep rep rep rep",
        5: shared,  # fully covered → no output row
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })).repartition(3)
    got = remove_duplicated_spans(ds, n=5).to_pandas()
    out = dict(zip(got["doc_id"], got["clean_text"]))
    assert out["1"] == "intro words here outro tail"
    assert out["2"] == "different ending entirely now"
    assert out["3"] == docs[3]
    assert out["4"] == docs[4]
    assert "5" not in out and len(out) == 4


def test_domain_mix_deterministic_and_bounded(ray_session):
    """The kept set is a pure function of doc_id (md5 ppm threshold), so
    two runs are bit-identical; per-source kept counts never exceed the
    source size; rates are exactly the integer formula."""
    from semantic_search_system_ray.pipelines.queries import (
        MIX_MOD,
        _mix_weight,
        q_domain_mix,
    )

    sf = "/root/testdata/sf0.001"
    a = q_domain_mix(sf).to_pandas().sort_values("source").reset_index(drop=True)
    b = q_domain_mix(sf).to_pandas().sort_values("source").reset_index(drop=True)
    assert a.equals(b)
    assert (a["kept_docs"] <= a["n_docs"]).all()
    assert (a["rate_ppm"] <= MIX_MOD).all()
    total, sum_w = a["n_docs"].sum(), a["w"].sum()
    for _, r in a.iterrows():
        assert r["w"] == _mix_weight(r["source"])
        assert r["target_docs"] == r["w"] * (total // 2) // sum_w


def test_dsir_weights_bruteforce_parity(ray_session, tmp_path):
    """q_dsir_weights vs a single-process brute-force DSIR on a crafted
    corpus: target docs (src0) are rich in 'alpha beta', raw docs split
    between alpha-heavy (should score high) and 'zzz'-only (low). Exact
    integer parity, including the add-one smoothing and tie order, and a
    second run is bit-identical (pure function of the corpus)."""
    import re
    from collections import Counter

    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.pipelines.queries import (
        DSIR_BUCKETS,
        DSIR_SCALE,
        DSIR_TARGET,
        DSIR_TOP_K,
        q_dsir_weights,
    )

    rows = []
    for i in range(6):
        rows.append((i, DSIR_TARGET, "alpha beta alpha gamma"))
    for i in range(6, 30):
        txt = "alpha beta delta" if i % 2 == 0 else "zzz zzz qqq"
        rows.append((i, f"src{1 + i % 3}", txt))
    rows.append((30, "src1", ""))  # zero-token doc: must not appear
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "documents.parquet"))

    # brute force
    tc: Counter = Counter()
    rc: Counter = Counter()
    for _, src, txt in rows:
        c = tc if src == DSIR_TARGET else rc
        for w in re.findall(r"\w+", txt.lower()):
            c[md5_hash64(w) % DSIR_BUCKETS] += 1
    wts = {
        b: ((tc.get(b, 0) + 1) * DSIR_SCALE) // (rc.get(b, 0) + 1)
        for b in set(tc) | set(rc)
    }
    exp = []
    for did, src, txt in rows:
        if src == DSIR_TARGET:
            continue
        toks = re.findall(r"\w+", txt.lower())
        if not toks:
            continue
        exp.append((did,
                    sum(wts[md5_hash64(w) % DSIR_BUCKETS] for w in toks),
                    len(toks)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    exp = exp[:DSIR_TOP_K]

    got = q_dsir_weights(str(tmp_path))
    got_rows = list(zip(got.column("doc_id").to_pylist(),
                        got.column("dsir_score").to_pylist(),
                        got.column("n_tokens").to_pylist()))
    assert got_rows == exp
    assert 30 not in {r[0] for r in got_rows}
    # alpha-heavy raw docs outrank the zzz docs
    top_ids = [r[0] for r in got_rows[: len(exp) // 2]]
    assert all(i % 2 == 0 for i in top_ids)
    again = q_dsir_weights(str(tmp_path))
    assert got.equals(again)


def test_curation_e2e_precedence_branches(ray_session, tmp_path):
    """q_curation_e2e on a crafted corpus exercising every verdict
    branch and the documented precedence: gopher reject wins over
    dup/contamination; among quality-kept duplicates the min-doc_id
    winner carries the contamination verdict while losers are
    'exact_dup' regardless; unique clean docs are 'kept'. Checked
    against the DuckDB twin per row, and a rerun is bit-identical."""
    import duckdb
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import (
        SQL_CURATION_E2E,
        q_curation_e2e,
    )

    ok = ("the quick brown foxes jump over lazy dogs and run fast near "
          "rivers with great speed while birds sing songs today %s")
    gram = "heldout benchmark gram"  # BENCHMARK_NGRAMS[-1], off-corpus
    rows = [
        (1, f"tiny doc {gram}"),        # gopher:word_count beats contam
        (2, ok % "alpha"), (3, ok % "alpha"),   # kept / exact_dup
        (4, ok % gram), (5, ok % gram),         # contaminated / exact_dup
        (6, ok % "unique"),                     # kept
        (7, ok % f"other {gram} tail"),         # contaminated (unique)
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r["stage"]
        for r in q_curation_e2e(str(tmp_path)).take_all()
    }
    assert got == {
        1: "gopher:word_count",
        2: "kept", 3: "exact_dup",
        4: "contaminated", 5: "exact_dup",
        6: "kept",
        7: "contaminated",
    }

    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    sql = dict(con.execute(SQL_CURATION_E2E).fetchall())
    assert sql == got

    again = {
        r["doc_id"]: r["stage"]
        for r in q_curation_e2e(str(tmp_path)).take_all()
    }
    assert again == got


def test_benchmark_gram_matches_directed_edges():
    """Directed positives/negatives for the vectorized gram kernel: real
    consecutive-token hits, apostrophe-glued tokens that must NOT count
    as their bare words, token-prefix/suffix guards, punctuation
    separators, case folding, and ambient sentinel bytes."""
    import pyarrow as pa

    from semantic_search_system_ray.stages.curation import (
        benchmark_gram_matches,
    )

    grams = ["the cat sat", "don't stop now"]
    cases = [
        ("The CAT sat on a mat", [True, False]),       # case fold
        ("well, the cat... sat!", [True, False]),      # punct separators
        ("the cat sat", [True, False]),
        ("xthe cat sat", [False, False]),              # token prefix guard
        ("the cat sat'y here", [False, False]),        # suffix glue: sat'y
        ("the cat's sat", [False, False]),             # cat's != cat
        ("don't stop now", [False, True]),             # apostrophe token
        ("don t stop now", [False, False]),            # split != don't
        ("a\x01the cat\x01sat", [True, False]),        # ambient sentinels
        ("the bad cat sat", [False, False]),           # not consecutive
        ("", [False, False]),
        (None, [False, False]),                        # null text
    ]
    m = benchmark_gram_matches(
        pa.chunked_array([pa.array([c[0] for c in cases], pa.string())]),
        grams, n=3,
    )
    assert m.tolist() == [c[1] for c in cases]


# ---------------------------------------------------------------------------
# leakage-free split + best-quality cluster representative
# ---------------------------------------------------------------------------

_BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
         "away home tonight while the moon rises over the quiet river")


def _dup_corpus() -> rd.Dataset:
    # docs 1 and 2 are near-dups (identical token stream; 2 differs only
    # in punctuation, which shingling ignores but quality punishes);
    # 3 and 4 are distinct singletons
    t = pa.table({
        "doc_id": ["1", "2", "3", "4"],
        "text": [
            _BASE + " !!!! ???? !!!! ???? !!!!",   # worse punct_ratio
            _BASE,                                  # cleanest copy
            "completely different content about distributed arrow "
            "pipelines and shuffle economics at terabyte scale",
            "yet another unrelated document concerning taxonomy "
            "curation policies for web corpora and quality filters",
        ],
    })
    return rd.from_arrow(t).repartition(2)


def test_leakage_free_split_keeps_clusters_together(ray_session):
    """Near-dup docs 1 and 2 share a cluster, so they MUST share a split
    (the whole point vs id-hash splitting); the decision replays the
    documented md5 formula on the cluster label."""
    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.stages.curation import leakage_free_split

    out = {r["doc_id"]: r for r in leakage_free_split(_dup_corpus()).take_all()}
    assert out["1"]["cluster"] == out["2"]["cluster"] == "1"
    assert out["1"]["split"] == out["2"]["split"]
    for r in out.values():
        want = "train" if md5_hash64(f"lfsplit-{r['cluster']}") % 10 < 8 else "val"
        assert r["split"] == want
    assert len(out) == 4


def test_cluster_best_rep_prefers_quality_over_min_id(ray_session):
    """Doc 2 (clean) outscores doc 1 (punctuation-ridden near-dup), so
    the cluster labeled '1' keeps doc 2 — argmax by quality, NOT the
    min-id pick; singletons keep themselves."""
    from semantic_search_system_ray.stages.curation import (
        cluster_best_representative,
    )

    rows = {r["cluster"]: r
            for r in cluster_best_representative(_dup_corpus()).take_all()}
    assert set(rows) == {"1", "3", "4"}
    assert rows["1"]["kept_doc"] == "2"
    assert rows["3"]["kept_doc"] == "3"
    assert rows["4"]["kept_doc"] == "4"
