"""Media-span plumbing + text-analysis stage tests."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.stages.media import (
    MEDIA_FEATURE_DIM,
    MediaFeatures,
    flatten_media_spans,
    media_kind_stats,
)
from semantic_search_system_ray.stages.textstats import (
    LangId,
    QualityScore,
    fingerprint_batch,
    token_count_batch,
)


def test_media_flatten_and_features(ray_session, small_corpus):
    docs = rd.from_arrow(small_corpus.documents)
    media = flatten_media_spans(docs)
    rows = media.take_all()
    expected = sum(
        sum(1 for s in r["spans"] if s["kind"] != "text")
        for r in small_corpus.documents.to_pylist()
    )
    assert len(rows) == expected
    assert all(r["media_ref"].startswith("media://") for r in rows[:20])

    feats = media.map_batches(
        MediaFeatures, batch_format="pyarrow", concurrency=2, batch_size=64
    ).take(10)
    for f in feats:
        assert len(f["features"]) == MEDIA_FEATURE_DIM
    # deterministic: same ref → same features
    f0 = feats[0]
    again = media.map_batches(
        MediaFeatures, batch_format="pyarrow", concurrency=2, batch_size=64
    ).take(10)
    match = [g for g in again if g["media_ref"] == f0["media_ref"]][0]
    assert list(match["features"]) == list(f0["features"])

    stats = {r["kind"]: r["count()"] for r in media_kind_stats(docs).take_all()}
    assert set(stats) <= {"image", "audio", "table"}
    assert sum(stats.values()) == expected


def test_textstats_stages(ray_session):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                "the quick brown fox and the lazy dog in the park",
                "",
                "word " * 30,
            ],
        }
    )
    ds = rd.from_arrow(tbl)
    toks = {r["doc_id"]: r["n_tokens"] for r in ds.map_batches(token_count_batch, batch_format="pyarrow").take_all()}
    assert toks == {"a": 11, "b": 0, "c": 30}

    q = {r["doc_id"]: r for r in ds.map_batches(QualityScore, batch_format="pyarrow", concurrency=1).take_all()}
    assert q["a"]["stop_ratio"] > 0.3
    assert q["b"]["n_words"] == 0 and q["b"]["quality"] <= 0.5
    assert 0.0 <= q["a"]["quality"] <= 1.0

    langs = {r["doc_id"]: r["lang_pred"] for r in ds.map_batches(LangId, batch_format="pyarrow", concurrency=1).take_all()}
    assert langs["a"] == "en"
    assert langs["b"] == "und"

    fps = {r["doc_id"]: r["fingerprint"] for r in ds.map_batches(fingerprint_batch, batch_format="pyarrow").take_all()}
    assert len(set(fps.values())) == 3
    fps2 = {r["doc_id"]: r["fingerprint"] for r in ds.map_batches(fingerprint_batch, batch_format="pyarrow").take_all()}
    assert fps == fps2


def test_media_near_dups_shared_assets(ray_session):
    """Spans embedding the SAME asset in different docs must pair up
    (features joined back into the dedup suite); distinct assets must not."""
    from semantic_search_system_ray.stages.media import media_near_dups

    spans_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("spans", pa.list_(pa.struct(
                [("kind", pa.string()), ("text", pa.string()),
                 ("media_ref", pa.string()), ("offset", pa.int32())]))),
        ]
    )

    def doc(doc_id, refs):
        spans = [{"kind": "text", "text": "intro words here", "media_ref": "", "offset": 0}]
        for i, ref in enumerate(refs):
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": 10 + i})
        return {"doc_id": doc_id, "spans": spans}

    docs = rd.from_arrow(
        pa.Table.from_pylist(
            [
                doc("a", ["media://shared-1", "media://only-a"]),
                doc("b", ["media://shared-1"]),
                doc("c", ["media://only-c"]),
            ],
            schema=spans_schema,
        )
    )
    pairs = media_near_dups(docs, strategy="exact").take_all()
    keyed = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("a#10#media://shared-1", "b#10#media://shared-1") in keyed
    assert all("only" not in a and "only" not in b for a, b in keyed)

    # LSH path finds the same shared-asset pair
    lsh = {(r["id_a"], r["id_b"])
           for r in media_near_dups(docs, strategy="lsh").take_all()}
    assert ("a#10#media://shared-1", "b#10#media://shared-1") in lsh


def test_redact_pii(ray_session):
    from semantic_search_system_ray.stages.textstats import redact_pii_batch

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["mail me at a.b+c@ex-ample.co.uk now",
                 "call 555-123-4567 or 555.987.6543; ssn 123-45-6789",
                 "clean text with no pii"],
    })
    out = rd.from_arrow(t).map_batches(
        redact_pii_batch, batch_format="pyarrow"
    ).take_all()
    red = {r["doc_id"]: r["text_redacted"] for r in out}
    assert red[1] == "mail me at <EMAIL> now"
    assert red[2] == "call <PHONE> or <PHONE>; ssn <SSN>"
    assert red[3] == "clean text with no pii"


def test_media_decode_hook_injected_end_to_end(ray_session, small_corpus):
    """Verdict r2 item 10: a replacement decoder drops into MediaFeatures
    (fn_constructor_kwargs seam) and flows through media_near_dups without
    touching the pipeline."""
    from semantic_search_system_ray.stages.media import (
        flatten_media_spans,
        media_features,
        media_near_dups,
    )

    def _fake_decoder(media_ref: str, kind: str):
        # closure -> cloudpickled BY VALUE (a test-module-level function
        # would pickle by reference and fail to import inside Ray workers)
        import numpy as np

        basis = {"image": 0, "audio": 1, "table": 2}
        v = np.zeros(4, dtype=np.float32)
        v[basis.get(kind, 3)] = 1.0
        return v

    docs = rd.from_arrow(small_corpus.documents)
    feats = media_features(docs, decode=_fake_decoder, dim=4).take_all()
    assert feats and all(len(f["features"]) == 4 for f in feats)
    kinds = {f["kind"] for f in feats}

    pairs = media_near_dups(
        docs, decode=_fake_decoder, dim=4, strategy="exact", threshold=0.999
    ).take_all()
    # one-hot by kind → every same-kind span pair is a dup: expect exactly
    # sum over kinds of C(n_kind, 2) pairs
    n_by_kind = {}
    media_rows = flatten_media_spans(docs).take_all()
    for r in media_rows:
        n_by_kind[r["kind"]] = n_by_kind.get(r["kind"], 0) + 1
    expected_pairs = sum(n * (n - 1) // 2 for n in n_by_kind.values())
    assert len(pairs) == expected_pairs
    assert kinds == set(n_by_kind)


def test_stub_features_match_sig_inputs():
    """The media_features oracle verifies the integer HASH INPUTS
    (feat_sig); this pins the float vector as the documented pure
    function of those inputs, closing the loop: sig match + this test
    => vector match."""
    import numpy as np

    from semantic_search_system_ray.stages.media import (
        MEDIA_FEATURE_DIM,
        _decode,
        _decode_hashes,
    )

    for ref, kind in [("media://asset-07", "image"), ("media://asset-63", "table")]:
        hs = np.array(_decode_hashes(ref, kind), dtype=np.float64)
        v = (hs / float(1 << 64)) * 2.0 - 1.0
        n = np.linalg.norm(v)
        expected = (v / n if n > 0 else v).astype(np.float32)
        got = _decode(ref, kind)
        assert got.shape == (MEDIA_FEATURE_DIM,)
        assert np.array_equal(got, expected)


def test_media_frame_sample_layout_and_duration_hook(ray_session, small_corpus):
    """Stub path: chunk rows follow the md5 duration + stride rule;
    injected duration hook: a fake metadata probe drives the sampling
    end-to-end (the MediaFrameSampler pluggable seam)."""
    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.stages.media import (
        MEDIA_MAX_CHUNKS,
        MEDIA_SAMPLE_STRIDE,
        media_frame_sample,
    )

    docs = rd.from_arrow(small_corpus.documents)
    rows = media_frame_sample(docs).take_all()
    assert rows, "fixture corpus must contain media spans"
    by_span: dict = {}
    for r in rows:
        n = 1 + md5_hash64(f"{r['kind']}:{r['media_ref']}:dur") % MEDIA_MAX_CHUNKS
        assert r["n_chunks"] == n
        assert r["chunk_idx"] % MEDIA_SAMPLE_STRIDE == 0
        assert 0 <= r["chunk_idx"] < n
        sig_input = "{}:{}:chunk:{}".format(
            r["kind"], r["media_ref"], r["chunk_idx"]
        )
        assert r["chunk_sig"] == f"{md5_hash64(sig_input):016x}"
        key = (r["doc_id"], r["offset"], r["media_ref"])
        by_span.setdefault(key, []).append(r["chunk_idx"])
    for idxs in by_span.values():
        assert sorted(idxs) == list(range(0, max(idxs) + 1, MEDIA_SAMPLE_STRIDE))

    # injected probe: constant 5 chunks -> indices {0, 2, 4} per span
    fixed = media_frame_sample(docs, duration=lambda ref, kind: 5).take_all()
    per_span: dict = {}
    for r in fixed:
        assert r["n_chunks"] == 5
        per_span.setdefault((r["doc_id"], r["offset"], r["media_ref"]), set()).add(
            r["chunk_idx"]
        )
    assert all(v == {0, 2, 4} for v in per_span.values())


def test_gopher_rules_every_branch_and_duckdb_parity():
    """Crafted docs hit each rule in documented order (the synthetic
    corpus only ever fails word_count/stopwords); per-row reasons match
    a DuckDB run of the oracle SQL on the same rows — pins the RE2 count
    semantics (non-overlapping '...', \\b word bounds) on both sides."""
    import duckdb
    import pyarrow as pa

    from semantic_search_system_ray.pipelines.queries import SQL_GOPHER_FILTER
    from semantic_search_system_ray.stages.textstats import gopher_rules_batch

    base = "the data and a value " * 5  # 25 tokens, passes everything
    docs = {
        "ok": base,
        "word_count": "the a short doc",
        # 20 long tokens -> mean word length > 10
        "mean_word_len": " ".join(["thisisaverylongword"] * 20),
        # 33 '#' chars vs 24 tokens -> ratio > 0.1 (tokens long enough to
        # keep the mean-word-length rule from firing first)
        "symbol_ratio": ("the and " + "### wordword " * 11).strip(),
        # 24 tokens, only 4 alphabetic -> alpha fraction 1/6 < 0.8
        # (numeric tokens 4 chars so mean word length stays >= 3)
        "alpha_fraction": "the a of to " + " ".join(["1234"] * 20),
        "stopwords": " ".join(["data"] * 25),
    }
    t = pa.table(
        {"doc_id": list(range(len(docs))), "text": list(docs.values())}
    )
    out = gopher_rules_batch(t).to_pylist()
    got = {r["doc_id"]: (r["reason"], r["keep"]) for r in out}
    for i, expect in enumerate(docs):
        assert got[i] == (expect, expect == "ok"), (i, expect, got[i])

    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    sql = con.execute(SQL_GOPHER_FILTER).df().set_index("doc_id")
    for i, expect in enumerate(docs):
        assert sql.loc[i, "reason"] == expect
        assert bool(sql.loc[i, "keep"]) == (expect == "ok")
