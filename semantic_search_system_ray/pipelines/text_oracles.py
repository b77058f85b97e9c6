"""DuckDB oracle SQL for the text-analysis / search / near-dup operators.

Each builder returns ANSI-ish DuckDB SQL that reproduces the paired Ray
pipeline EXACTLY (same tokenizers via RE2 regexes, same tie-breaks, same
rounding, same column names) over the driver's parquet views — so the
driver's rows+schema+value-hash gate can verify operators that round 1
left as rows-only. The SQL is GENERATED from the same constants the
engine stages use (_LANG_PROFILES, _STOPWORDS, tokenizer patterns):
one source of truth, no drift.
"""

from __future__ import annotations

from semantic_search_system_ray.stages.textstats import _LANG_PROFILES, _STOPWORDS

# tokenize() regex (functions/text.py) with the quote doubled for SQL
_TOKEN_RE_SQL = r"\w+(?:''\w+)?"


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_search_lexical(query_tokens: list[str], k: int) -> str:
    """Token-overlap scoring + min-max normalize + top-k (pipelines/
    search.search_lexical): score = round(hits/len(toks)·(1+|q|), 6)."""
    qlist = ", ".join(_sql_str(t) for t in sorted(set(query_tokens)))
    mult = 1 + len(set(query_tokens))
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS tk
  FROM documents
),
scored AS (
  SELECT doc_id,
         CASE WHEN len(tk) = 0 THEN 0.0
              ELSE round(CAST(len(list_filter(tk, x -> list_contains([{qlist}], x))) AS DOUBLE)
                         / len(tk) * {mult}, 6) END AS score
  FROM toks
),
stats AS (SELECT min(score) AS mn, max(score) AS mx FROM scored)
SELECT doc_id, score,
       round(CASE WHEN mx = mn THEN (CASE WHEN mx > 0 THEN 100.0 ELSE 1.0 END)
                  ELSE greatest(1.0, least(100.0, 1 + ((score - mn) / (mx - mn)) * 99))
             END, 4) AS normalized_score_100
FROM scored, stats
ORDER BY score DESC, doc_id
LIMIT {k}
"""


def sql_search_rerank(query_tokens: list[str], k_candidates: int, top_n: int) -> str:
    """Lexical top-k candidates re-scored by the deterministic overlap
    reranker (pipelines/search.rerank) — same formula, candidate tie-break
    on the STRING doc id (search_lexical's id), final tie-break on the
    original int id."""
    qlist = ", ".join(_sql_str(t) for t in sorted(set(query_tokens)))
    mult = 1 + len(set(query_tokens))
    return f"""
WITH scored AS (
  SELECT doc_id, text,
         CASE WHEN len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) = 0 THEN 0.0
              ELSE round(CAST(len(list_filter(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}'),
                                              x -> list_contains([{qlist}], x))) AS DOUBLE)
                         / len(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) * {mult}, 6)
         END AS score
  FROM documents
),
top_c AS (
  SELECT doc_id, text, score FROM scored
  ORDER BY score DESC, CAST(doc_id AS VARCHAR) LIMIT {k_candidates}
)
SELECT doc_id, text, score AS rerank_score
FROM top_c ORDER BY rerank_score DESC, doc_id LIMIT {top_n}
"""


def sql_ngram_jaccard(n: int, threshold: float) -> str:
    """Exact char-n-gram Jaccard pairs ≥ threshold (stages/dedup.
    ngram_jaccard_pairs semantics; the engine's LSH candidate recall at
    this threshold is ~1 − (1−t^r)^b ≈ 0.9998, verified empirically at the
    driver's scales)."""
    return f"""
WITH g AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN len(lower(text)) < {n} THEN
                CASE WHEN len(lower(text)) = 0 THEN CAST([] AS VARCHAR[])
                     ELSE [lower(text)] END
              ELSE list_distinct(list_transform(range(1, len(lower(text)) - {n - 2}),
                                                i -> substr(lower(text), CAST(i AS INT), {n})))
         END AS grams
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
           / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) AS j
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(a.grams) > 0 AND len(b.grams) > 0
)
SELECT id_a, id_b, round(j, 6) AS jaccard
FROM pairs WHERE j >= {threshold}
"""


def sql_fingerprint(window: int = 8) -> str:
    """Min-over-token-windows MD5 fingerprint (stages/textstats.
    fingerprint_batch). DuckDB list slices are 1-based inclusive."""
    w1 = window - 1
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS tk FROM documents
)
SELECT doc_id,
  CASE WHEN len(tk) = 0 THEN repeat('0', 32)
       WHEN len(tk) < {window} THEN
         list_min(list_transform(range(1, len(tk) + 1),
                  i -> md5(array_to_string(tk[CAST(i AS INT):len(tk)], ' '))))
       ELSE
         list_min(list_transform(range(1, len(tk) - {window - 2}),
                  i -> md5(array_to_string(tk[CAST(i AS INT):CAST(i + {w1} AS INT)], ' '))))
  END AS fingerprint
FROM t
"""


def sql_doc_topic_words(top_k: int = 10) -> str:
    """Per-doc top-k non-stopword terms, ties by first occurrence
    (stages/textstats.doc_topic_words_batch = Counter.most_common's
    stable count-desc order). Output joined to one string per doc (same
    join applied on the engine side) so value hashing is list-free."""
    stop = ", ".join(_sql_str(w) for w in sorted(_STOPWORDS))
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z]+')) + 1)) AS pos
  FROM documents
),
counts AS (
  SELECT doc_id, w, count(*) AS cnt, min(pos) AS fp
  FROM toks WHERE w NOT IN ({stop})
  GROUP BY doc_id, w
),
ranked AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, fp) AS rn
  FROM counts
),
lists AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY rn) AS topic_words
  FROM ranked WHERE rn <= {top_k} GROUP BY doc_id
)
SELECT d.doc_id, coalesce(l.topic_words, '') AS topic_words
FROM documents d LEFT JOIN lists l ON d.doc_id = l.doc_id
"""


def _count_expr(gram: str) -> str:
    """Non-overlapping substring occurrence count — replace() removes
    occurrences left-to-right exactly like re.findall of the literal."""
    esc = gram.replace("'", "''")
    return f"((len(t) - len(replace(t, '{esc}', ''))) / {len(gram)})"


def sql_langid() -> str:
    """Trigram-profile language ID (stages/textstats.LangId): per-language
    summed gram counts, argmax with alphabetical tie-break, zero → 'und'.
    Generated from the SAME _LANG_PROFILES the engine stage compiles."""
    structs = []
    for lang in sorted(_LANG_PROFILES):
        score = " + ".join(_count_expr(g) for g in _LANG_PROFILES[lang])
        structs.append(f"{{'s': -({score}), 'l': '{lang}'}}")
    arr = ",\n    ".join(structs)
    return f"""
WITH t0 AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
best AS (
  SELECT doc_id, list_sort([
    {arr}
  ])[1] AS b
  FROM t0
)
SELECT doc_id, CASE WHEN b.s = 0 THEN 'und' ELSE b.l END AS lang_pred FROM best
"""


def sql_quality_score() -> str:
    """Length/punct/stopword quality features + composite score
    (stages/textstats.QualityScore), identical formula and rounding."""
    stop = ", ".join(_sql_str(w) for w in sorted(_STOPWORDS))
    return f"""
WITH t0 AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
feats AS (
  SELECT doc_id, t,
         regexp_extract_all(lower(t), '[a-z]+') AS words,
         len(regexp_extract_all(t, '[^\\w\\s]')) AS n_punct
  FROM t0
),
ratios AS (
  SELECT doc_id,
         len(t) AS n_chars,
         len(words) AS n_words,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE CAST(len(list_filter(words, w -> list_contains([{stop}], w))) AS DOUBLE)
                   / len(words) END AS sr,
         CAST(n_punct AS DOUBLE) / greatest(1, len(t)) AS pr,
         CASE WHEN len(t) BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.0 END AS ln_ok
  FROM feats
)
SELECT doc_id, n_chars, n_words,
       round(sr, 6) AS stop_ratio,
       round(pr, 6) AS punct_ratio,
       round(0.4 * ln_ok + 0.4 * least(1.0, sr * 4) + 0.2 * (1.0 - least(1.0, pr * 10)), 6)
         AS quality
FROM ratios
"""
