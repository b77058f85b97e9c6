"""Property-based tests (hypothesis): parity, idempotence, and
partition-invariance properties that unit examples can miss."""

from __future__ import annotations

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from semantic_search_system_ray.functions.canon_spec import canonicalize_exact
from semantic_search_system_ray.functions.scores import normalize_scores_to_100
from semantic_search_system_ray.functions.text import (
    arrow_clean_text_ingest,
    arrow_clean_text_topic,
    arrow_normalize_key,
    clean_text_ingest,
    clean_text_topic,
    normalize_key,
)

# Alphabet capped at U+2FFF (Latin/Greek/Cyrillic/Hebrew/Arabic scripts,
# all punctuation and separator blocks): Arrow's RE2 ships older Unicode
# tables than CPython, so characters ADDED in recent Unicode versions
# (e.g. U+31350 CJK Ext H, U+1E030 Cyrillic Ext-D — both Unicode 15)
# classify differently — a documented, data-free divergence. Within the
# capped range parity must be exact; CJK-basic is spot-checked below.
# Two SpecialCasing.txt lowercase exceptions are also excluded — CPython
# implements full case mapping (Σ→ς in Final_Sigma position; İ→i+U+0307),
# Arrow's utf8_lower is the simple per-codepoint map. Documented in
# arrow_clean_text_topic/arrow_normalize_key (functions/text.py).
text_st = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        blacklist_characters="İΣ",
        max_codepoint=0x2FFF,
    ),
    max_size=80,
)


def test_cjk_basic_parity():
    texts = ["汉字 text", "テスト、です。", "한국어!"]
    arr = pa.array(texts, pa.string())
    assert arrow_clean_text_topic(arr).to_pylist() == [clean_text_topic(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=8))
def test_arrow_python_cleaner_parity(texts):
    arr = pa.array(texts, pa.string())
    assert arrow_clean_text_ingest(arr).to_pylist() == [
        clean_text_ingest(t) for t in texts
    ]
    assert arrow_clean_text_topic(arr).to_pylist() == [
        clean_text_topic(t) for t in texts
    ]
    assert arrow_normalize_key(arr).to_pylist() == [normalize_key(t) for t in texts]


@settings(max_examples=100, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=12))
def test_canonicalize_idempotent_and_order_free(surfaces):
    c1 = canonicalize_exact(surfaces)
    # order-free: shuffled input gives identical mapping
    c2 = canonicalize_exact(list(reversed(surfaces)))
    assert c1 == c2
    # idempotent: canonical forms map to themselves
    canon_forms = sorted(set(c1.values()) - {""})
    if canon_forms:
        c3 = canonicalize_exact(canon_forms)
        assert all(c3[f] == f for f in canon_forms)
    # canonical of each surface is in the same component as the surface
    for s, canon in c1.items():
        assert canonicalize_exact([s, canon])[s] == canonicalize_exact([s, canon])[canon]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.none(),
            st.text(max_size=3),
        ),
        max_size=10,
    )
)
def test_normalize_scores_bounds(scores):
    res = normalize_scores_to_100([{"score": s} for s in scores])
    for r in res:
        v = r["normalized_score_100"]
        assert 1.0 <= v <= 100.0


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=30), st.integers(1, 5))
def test_top_n_matches_counter(parts, n):
    from collections import Counter

    from semantic_search_system_ray.functions.extraction import top_n_with_first_label

    mentions = [(p, "X") for p in parts]
    got = [e["text"] for e in top_n_with_first_label(mentions, n)]
    ref = [k for k, _v in Counter(parts).most_common(n)]
    assert got == ref


# --- r4: the vectorized pair-key Jaccard kernel must equal set math -------

from hypothesis import given, settings, strategies as st


@st.composite
def _gram_pairs(draw):
    n = draw(st.integers(0, 12))
    vocab = [f"g{i}" for i in range(12)]
    pairs = []
    for i in range(n):
        a = draw(st.sets(st.sampled_from(vocab), max_size=8))
        b = draw(st.sets(st.sampled_from(vocab), max_size=8))
        pairs.append((f"a{i}", f"b{i}", sorted(a), sorted(b)))
    return pairs


@given(_gram_pairs(), st.sampled_from([0.0, 0.3, 0.7, 1.0]))
@settings(max_examples=200, deadline=None)
def test_jaccard_pairs_vectorized_matches_sets(pairs, threshold):
    import numpy as np

    from semantic_search_system_ray.stages.dedup import (
        _jaccard_pairs_vectorized,
    )

    src = np.array([p[0] for p in pairs], dtype=object)
    dst = np.array([p[1] for p in pairs], dtype=object)
    la = np.array([len(p[2]) for p in pairs], np.int64)
    lb = np.array([len(p[3]) for p in pairs], np.int64)
    flat_a = np.array([g for p in pairs for g in p[2]], dtype=object)
    flat_b = np.array([g for p in pairs for g in p[3]], dtype=object)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in _jaccard_pairs_vectorized(
            src, dst, la, flat_a, lb, flat_b, threshold
        ).to_pylist()
    }
    expect = {}
    for s, d, a, b in pairs:
        a, b = set(a), set(b)
        inter = len(a & b)
        if not inter:
            continue
        jac = inter / len(a | b)
        if jac >= threshold:
            x, y = (s, d) if s < d else (d, s)
            expect[(x, y)] = round(jac, 6)  # kernel emits 6dp (pinned)
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9, k


def test_ragged_take_gathers_rows():
    import numpy as np

    from semantic_search_system_ray.stages.dedup import _ragged_take

    off = np.array([0, 3, 3, 7, 9], np.int64)  # rows of len 3,0,4,2
    flat = np.arange(9)
    rows = np.array([2, 0, 1, 2], np.int64)
    lens = off[rows + 1] - off[rows]
    got = flat[_ragged_take(off, rows, lens)]
    assert got.tolist() == [3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6]
    assert _ragged_take(off, np.array([1], np.int64),
                        np.array([0], np.int64)).tolist() == []


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_gopher_rules_duckdb_parity_property(texts):
    """Engine gopher rules vs the DuckDB oracle SQL on arbitrary unicode
    text: token/symbol/alpha counts come from RE2 on BOTH sides and every
    threshold is an integer comparison, so reason and n_tokens must agree
    per row — the property the hash gate relies on, checked off-corpus."""
    import duckdb
    import pyarrow as pa

    from semantic_search_system_ray.pipelines.queries import SQL_GOPHER_FILTER
    from semantic_search_system_ray.stages.textstats import gopher_rules_batch

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    eng = gopher_rules_batch(t).to_pandas().set_index("doc_id")
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    sql = con.execute(SQL_GOPHER_FILTER).df().set_index("doc_id")
    for i in range(len(texts)):
        assert eng.loc[i, "reason"] == sql.loc[i, "reason"], texts[i]
        assert int(eng.loc[i, "n_tokens"]) == int(sql.loc[i, "n_tokens"])


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_benchmark_gram_matches_duckdb_parity_property(texts):
    """The vectorized RE2 gram-containment kernel vs the DuckDB oracle's
    regexp_extract_all + n-gram join, on arbitrary unicode (including
    apostrophe glue and the \\x01 sentinel itself): n_matched must agree
    per row — the exactness argument in benchmark_gram_matches, checked
    off-corpus."""
    import duckdb
    import pyarrow as pa

    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_contamination,
    )
    from semantic_search_system_ray.stages.curation import (
        benchmark_gram_matches,
    )

    # grams chosen to hit apostrophe tokens, sentinel chars and unicode
    grams = [
        "the cat sat",
        "don't stop now",
        "a b c",
        "x \x01 y",          # sentinel inside a "gram": never matches
        "café au lait",  # non-ASCII is NOT \w under RE2
        "one two",            # 2 tokens: all-False under n=3
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    m = benchmark_gram_matches(t.column("text"), grams, n=3)
    eng = m.sum(axis=1).astype(int)

    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    sql = {
        int(r[0]): int(r[1])
        for r in con.execute(sql_contamination(grams, 3)).fetchall()
    }
    for i, txt in enumerate(texts):
        assert int(eng[i]) == sql[i], (txt, grams)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=4)),
            st.one_of(st.none(), st.integers(-3, 3)),
            st.integers(0, 100),
        ),
        max_size=60,
    )
)
def test_key_group_slices_matches_pandas_groupby(rows):
    """key_group_slices (the Arrow group splitter behind
    fn_format='pyarrow') must partition rows EXACTLY like pandas
    groupby(dropna=False): same group count, same multiset of
    (key-tuple, size), every slice key-homogeneous, all rows covered —
    for any mix of nulls, separator-prone strings and multi-type keys."""
    import pandas as pd
    import pyarrow as pa

    from semantic_search_system_ray.stages.util import key_group_slices

    t = pa.table({
        "a": pa.array([r[0] for r in rows], pa.string()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = list(key_group_slices(t, ["a", "b"]))
    # every slice is key-homogeneous
    for g in got:
        keys = set(zip(g.column("a").to_pylist(), g.column("b").to_pylist()))
        assert len(keys) == 1
    # rows fully covered, nothing duplicated
    assert sum(g.num_rows for g in got) == t.num_rows
    got_counts = sorted(
        (str(g.column("a").to_pylist()[0]), str(g.column("b").to_pylist()[0]),
         g.num_rows)
        for g in got
    )
    if t.num_rows:
        df = t.to_pandas()
        exp_counts = sorted(
            (str(k[0] if pd.notna(k[0]) else None),
             str(int(k[1]) if pd.notna(k[1]) else None), len(g))
            for k, g in df.groupby(["a", "b"], sort=False, dropna=False)
        )
        assert got_counts == exp_counts
    else:
        assert got == []
