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


def _lexical_score_sql(qlist: str, mult: int, text_expr: str = "text") -> str:
    """The ONE lexical overlap-score expression shared by every oracle
    that ranks documents (search_lexical / search_rerank / rag_answer):
    round(hits / n_tokens * (1 + |q|), 6), 0.0 for token-less docs.
    Single source of truth — a tokenization or rounding change here
    tracks all three oracles at once."""
    toks = f"regexp_extract_all(lower({text_expr}), '{_TOKEN_RE_SQL}')"
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 "
        f"ELSE round(CAST(len(list_filter({toks}, "
        f"x -> list_contains([{qlist}], x))) AS DOUBLE) "
        f"/ len({toks}) * {mult}, 6) END"
    )


def sql_search_lexical(query_tokens: list[str], k: int) -> str:
    """Token-overlap scoring + min-max normalize + top-k (pipelines/
    search.search_lexical): score = round(hits/len(toks)·(1+|q|), 6)."""
    qlist = ", ".join(_sql_str(t) for t in sorted(set(query_tokens)))
    mult = 1 + len(set(query_tokens))
    return f"""
WITH scored AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         {_lexical_score_sql(qlist, mult)} AS score
  FROM documents
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
         {_lexical_score_sql(qlist, mult)} AS score
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


def sql_kg_triples(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    docs_relation: str = "documents",
    prelude: str = "",
) -> str:
    """DuckDB oracle for the FLAGSHIP kg_triples pipeline over the driver's
    word-soup documents (round-2 verdict item 2 — the headline pipeline
    joins the hard rows+schema+hash gate).

    Reproduces, in SQL, exactly what the engine computes on THIS corpus:

    - span layout (sources/documents._spans_for_text): the corpus has no
      sentence punctuation and single-space words (asserted by the paired
      pytest), so a doc is ONE span when len(text) <= 200, else 12-word
      chunks; media spans carry no text. Chunk = regex match scope.
    - gazetteer matching (functions/extraction.GazetteerMatcher): longest-
      first, left-to-right, non-overlapping, word-bounded. Over clean
      word-soup this reduces to: a 2-word phrase matches at word i iff
      (w[i], w[i+1]) is a phrase, both words in the same chunk, and i is
      not consumed by a previous match. Consecutive pairable positions
      form runs in which matches land at even offsets (the greedy
      recurrence collapsed to closed form); a 1-word surface matches when
      its position is neither consumed nor a 2-word match start.
    - top-5 per class: Counter.most_common semantics = count DESC, first
      occurrence ASC (insertion-order ties) — ROW_NUMBER over
      (cnt DESC, min(pos) ASC).
    - canonicalization: for THIS gazetteer every surface is lowercase with
      a unique (first,last)-token signature, so the canonical map is the
      identity (asserted by the paired pytest) and the SQL omits the
      union-find; the engine still runs its full canon machinery.
    - no SVO triples: the corpus vocabulary contains none of the verb
      surfaces (asserted by the paired pytest).
    - IN_TOPIC from the taxonomy VALUES; RELATES_TO_DOC from the
      deterministic phrase->docs rule (phrase i -> docs with doc_id % 5 ==
      i % 5), inner-joined to the taxonomy (phrases outside it drop).

    ``docs_relation`` substitutes the corpus relation (a table/CTE name)
    so compositions can run the SAME matcher SQL over a filtered corpus;
    ``prelude`` injects extra leading CTEs (must end with ', ' when
    non-empty) — defaults leave every existing oracle byte-identical.
    """
    pairs = sorted(s for s in gazetteer if " " in s)
    singles = sorted(s for s in gazetteer if " " not in s)
    # degenerate gazetteers (no pairs / no singles) must still generate
    # valid SQL: `IN ()` is a parser error; '' can never equal a token
    pair_list = ", ".join(_sql_str(s) for s in pairs) or "''"
    single_list = ", ".join(_sql_str(s) for s in singles) or "''"
    gaz_values = ", ".join(
        f"({_sql_str(s)}, {_sql_str(l)})" for s, l in sorted(gazetteer.items())
    )
    tax_rows = []
    phrase_to_topic = {}
    for topic, ps in taxonomy.items():
        for p in ps:
            phrase_to_topic.setdefault(p.strip().lower(), topic.strip().lower())
            tax_rows.append((p.strip().lower(), topic.strip().lower()))
    # empty VALUES lists are parser errors: sentinel rows that the
    # trailing filter removes keep degenerate inputs valid
    tax_values = ", ".join(
        f"({_sql_str(p)}, {_sql_str(t)})" for p, t in sorted(set(tax_rows))
    ) or "('', '')"
    relates_rows = sorted(
        {
            (phrase_to_topic[p.strip().lower()], i % 5)
            for i, p in enumerate(phrase_list)
            if p.strip().lower() in phrase_to_topic
        }
    )
    relates_values = ", ".join(
        f"({_sql_str(t)}, {r})" for t, r in relates_rows
    ) or "('', -1)"
    return f"""
WITH {prelude}doc AS (
  SELECT doc_id AS did, CAST(doc_id AS VARCHAR) AS d,
         length(text) > 200 AS chunked,
         string_split(text, ' ') AS ws
  FROM {docs_relation}
),
words AS (
  SELECT d, chunked,
         unnest(ws) AS w,
         unnest(generate_series(1, len(ws))) - 1 AS pos
  FROM doc
),
marks AS (
  SELECT d, pos, w,
         CASE WHEN chunked THEN pos // 12 ELSE 0 END AS chunk,
         lead(w) OVER (PARTITION BY d ORDER BY pos) AS w2,
         CASE WHEN chunked THEN (pos + 1) // 12 ELSE 0 END AS next_chunk
  FROM words
),
pairable AS (
  SELECT d, pos, w, chunk, w2,
         (w2 IS NOT NULL AND chunk = next_chunk
          AND (w || ' ' || w2) IN ({pair_list})) AS is_pair
  FROM marks
),
match2 AS (
  SELECT d, pos, w || ' ' || w2 AS surface
  FROM (
    SELECT d, pos, w, w2,
           ROW_NUMBER() OVER (PARTITION BY d, chunk, run_id ORDER BY pos) - 1 AS off
    FROM (
      SELECT d, pos, w, chunk, w2,
             pos - ROW_NUMBER() OVER (PARTITION BY d, chunk ORDER BY pos) AS run_id
      FROM pairable WHERE is_pair
    )
  )
  WHERE off % 2 = 0
),
match1 AS (
  SELECT p.d, p.pos, p.w AS surface
  FROM pairable p
  LEFT JOIN match2 cur ON cur.d = p.d AND cur.pos = p.pos
  LEFT JOIN match2 prev ON prev.d = p.d AND prev.pos = p.pos - 1
  WHERE p.w IN ({single_list}) AND cur.pos IS NULL AND prev.pos IS NULL
),
matches AS (
  SELECT m.d, m.pos, m.surface, g.label
  FROM (SELECT * FROM match2 UNION ALL SELECT * FROM match1) m
  JOIN (VALUES {gaz_values}) AS g(surface, label) ON g.surface = m.surface
),
ranked AS (
  SELECT d, surface,
         CASE WHEN label = 'TOPIC' THEN 'topic' ELSE 'ent' END AS cls,
         count(*) AS cnt, min(pos) AS first_pos
  FROM matches
  WHERE label IN ('TOPIC', 'PERSON', 'ORG', 'GPE')
  GROUP BY d, surface, label
),
top5 AS (
  SELECT d, surface, cls FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY d, cls ORDER BY cnt DESC, first_pos) AS rk
    FROM ranked
  ) WHERE rk <= 5
)
SELECT subj, pred, obj FROM (
  SELECT d AS subj, 'MENTIONS' AS pred, surface AS obj FROM top5 WHERE cls = 'ent'
  UNION
  SELECT d, 'HAS_TOPIC', surface FROM top5 WHERE cls = 'topic'
  UNION
  SELECT phrase, 'IN_TOPIC', topic
  FROM (VALUES {tax_values}) AS t(phrase, topic) WHERE phrase <> ''
  UNION
  SELECT r.topic, 'RELATES_TO_DOC', doc.d
  FROM (VALUES {relates_values}) AS r(topic, res)
  JOIN doc ON doc.did % 5 = r.res AND r.res >= 0
)
"""


def sql_simhash() -> str:
    """DuckDB oracle for the per-doc 64-bit SimHash signature
    (stages/dedup.simhash_table). Recomputable in SQL because the
    per-token hash is md5-based (functions/hashing.md5_hash64 ==
    DuckDB ``md5_number_lower``: digest bytes 8..16, little-endian).
    Bit b of the signature is set iff the frequency-weighted ±1 vote of
    that bit over all token occurrences is > 0. Powers of two are exact
    (2**i is a pure power — double-exact up to 2^63, cast to HUGEINT
    before the integer sum, so no float accumulation)."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS w
  FROM documents
),
th AS (SELECT doc_id, md5_number_lower(w) AS h FROM toks),
bits AS (
  SELECT doc_id, bi.i AS i,
         sum(CASE WHEN (h >> bi.i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) bi
  GROUP BY doc_id, bi.i
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0
                       THEN CAST(2::HUGEINT ** i AS HUGEINT)
                       ELSE 0::HUGEINT END) AS UBIGINT) AS sim
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(lpad(lower(hex(s.sim)), 16, '0'), '0000000000000000') AS simhash
FROM (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc_id FROM documents) d
LEFT JOIN sh s USING (doc_id)
"""


def _sql_media_spans_cte() -> str:
    """Shared CTE chain reproducing the md5-derived media span layout
    (sources/documents._spans_for_text — media injected after sentence i
    when md5_hash64(doc:i) % 7 == 0, kind/ref from the same hash,
    cumulative offsets). Ends with the ``media`` relation
    (doc_id, kind, media_ref, offset); reused by sql_media_features and
    sql_media_frame_sample (one source of truth)."""
    return """
WITH doc AS (
  SELECT CAST(doc_id AS VARCHAR) AS d, text,
         length(text) > 200 AS chunked,
         string_split(text, ' ') AS ws
  FROM documents
),
sent AS (
  SELECT d, i, sent_len FROM (
    SELECT d, pos // 12 AS i,
           sum(length(w)) + count(*) - 1 AS sent_len
    FROM (
      SELECT d, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) - 1 AS pos
      FROM doc WHERE chunked
    )
    GROUP BY d, pos // 12
  )
  UNION ALL
  -- empty text yields NO sentence (engine: sentence_split('') -> []) and
  -- therefore no media injection slot
  SELECT d, 0 AS i, length(text) AS sent_len
  FROM doc WHERE NOT chunked AND length(text) > 0
),
hashed AS (
  SELECT d, i, sent_len, md5_number_lower(d || ':' || CAST(i AS VARCHAR)) AS h
  FROM sent
),
placed AS (
  SELECT d, i, h,
         sum(sent_len + 1) OVER (
           PARTITION BY d ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + coalesce(sum(CASE WHEN h % 7 = 0 THEN 1 ELSE 0 END) OVER (
             PARTITION BY d ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS media_offset
  FROM hashed
),
media AS (
  SELECT d AS doc_id,
         CASE ((h // 7) % 3)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'table' END AS kind,
         'media://asset-' || lpad(CAST((h // 21) % 64 AS VARCHAR), 2, '0')
           AS media_ref,
         CAST(media_offset AS INTEGER) AS "offset"
  FROM placed WHERE h % 7 = 0
)"""


def sql_media_features(dim: int) -> str:
    """DuckDB oracle for the media_features query: the shared media-span
    CTE (_sql_media_spans_cte) plus the stub feature derivation inputs
    (stages/media._decode_hashes) as ``feat_sig`` — all integer/string
    exact, no float comparisons. The float vector is a pure pinned
    function of those inputs (see pytest)."""
    return f"""{_sql_media_spans_cte()}
SELECT doc_id, kind, media_ref, "offset",
       md5(array_to_string(
         list_transform(generate_series(0, {dim - 1}),
           j -> lpad(lower(hex(md5_number_lower(
                  kind || ':' || media_ref || ':' || CAST(j AS VARCHAR)))),
                16, '0')),
         ',')) AS feat_sig
FROM media
"""


def sql_media_frame_sample(stride: int, max_chunks: int) -> str:
    """DuckDB oracle for media_frame_sample: every media span unnests to
    its sampled chunk rows — chunk count 1 + md5(ref-scoped 'dur') %
    max_chunks (the stub duration metadata), indices 0, stride, 2·stride
    … < n, per-chunk md5 signature — all integer/string exact."""
    return f"""{_sql_media_spans_cte()},
dur AS (
  SELECT *, CAST(1 + md5_number_lower(
           kind || ':' || media_ref || ':dur') % {max_chunks} AS BIGINT)
         AS n_chunks
  FROM media
),
sampled AS (
  SELECT doc_id, kind, media_ref, "offset", n_chunks,
         CAST(unnest(generate_series(0, CAST(n_chunks AS INTEGER) - 1,
                                     {stride})) AS BIGINT) AS chunk_idx
  FROM dur
)
SELECT doc_id, kind, media_ref, "offset", n_chunks, chunk_idx,
       lpad(lower(hex(md5_number_lower(
         kind || ':' || media_ref || ':chunk:'
         || CAST(chunk_idx AS VARCHAR)))), 16, '0') AS chunk_sig
FROM sampled
"""


def _sql_minhash_sig_band(
    num_perm: int, bands: int, shingle_k: int, seed: int
) -> str:
    """Shared CTE prefix for the MinHash oracles (sql_minhash_clusters,
    sql_dedup_incremental): shingling, universal-hash signatures and
    band-bucket rows over ``documents`` — ONE source of truth so the
    incremental twin can never drift from the clustering twin."""
    from semantic_search_system_ray.functions.hashing import (
        _MERSENNE_P,
        _minhash_params,
    )

    a, b = _minhash_params(num_perm, seed)
    perm_values = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm)
    )
    rows_per_band = num_perm // bands
    return f"""doc AS (
  SELECT CAST(doc_id AS VARCHAR) AS d,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
pos AS (
  SELECT d, ws,
         unnest(generate_series(1, greatest(len(ws) - {shingle_k - 1}, 1))) AS i
  FROM doc WHERE len(ws) >= 1
),
shing AS (
  SELECT DISTINCT d,
         CASE WHEN len(ws) < {shingle_k} THEN array_to_string(ws, ' ')
              ELSE array_to_string(ws[i : i + {shingle_k - 1}], ' ') END AS s
  FROM pos
),
sigv AS (
  SELECT d, p.i AS perm,
         CAST(min((CAST(p.a AS HUGEINT)
                   * CAST(md5_number_lower(sh.s) % {_MERSENNE_P} AS HUGEINT)
                   + p.b) % {_MERSENNE_P}) % 4294967296 AS UBIGINT) AS sv
  FROM shing sh CROSS JOIN (VALUES {perm_values}) AS p(i, a, b)
  GROUP BY d, p.i
  UNION ALL
  -- zero-token docs: the engine's empty-shingle signature is all
  -- 0xFFFFFFFF (matches nothing except other empties — which therefore
  -- band together and cluster, exactly as the engine does)
  SELECT d, p.i AS perm, CAST(4294967295 AS UBIGINT) AS sv
  FROM doc CROSS JOIN (VALUES {perm_values}) AS p(i, a, b)
  WHERE len(ws) = 0
),
sig AS (
  SELECT d, list(CAST(sv AS VARCHAR) ORDER BY perm) AS sl,
         list(sv ORDER BY perm) AS slv
  FROM sigv GROUP BY d
),
band AS (
  SELECT d, bb.b AS band,
         substr(md5(array_to_string(
           sl[{rows_per_band} * bb.b + 1 : {rows_per_band} * bb.b + {rows_per_band}],
           ',')), 1, 16) AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS b) bb
)"""


def sql_minhash_clusters(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.6,
    seed: int = 1,
) -> str:
    """DuckDB oracle for the FULL minhash_lsh_clusters pipeline
    (stages/dedup): shingling → universal-hash MinHash signatures →
    LSH banding → star candidate pairs → signature verification →
    connected components, all in one SQL statement.

    Expressible because (r3): the shingle hash is md5-based
    (functions/hashing.md5_hash64 == ``md5_number_lower``), the band
    bucket key is an md5 prefix (same hash ⇒ identical buckets,
    collisions included), the (a, b) Mersenne universal-hash parameters
    are deterministic seeded CONSTANTS inlined as VALUES, the mulmod is
    exact in HUGEINT ((a·h + b) mod (2^61−1), products < 2^122), and the
    min-label components of the (small) verified-edge graph are a
    recursive transitive closure. Mask-after-min matches the engine
    (min over 61-bit values, then low 32 bits)."""
    prefix = _sql_minhash_sig_band(num_perm, bands, shingle_k, seed)
    return f"""
WITH RECURSIVE {prefix},
cand AS (
  SELECT DISTINCT b1.d AS src, m.mn AS dst
  FROM band b1
  JOIN (SELECT band, band_hash, min(d) AS mn, count(*) AS n
        FROM band GROUP BY band, band_hash) m
    USING (band, band_hash)
  WHERE m.n >= 2 AND b1.d <> m.mn
),
edge AS (
  SELECT c.src, c.dst
  FROM cand c
  JOIN sig sa ON sa.d = c.src
  JOIN sig sb ON sb.d = c.dst
  WHERE CAST(len(list_filter(generate_series(1, {num_perm}),
                             i -> sa.slv[i] = sb.slv[i])) AS DOUBLE)
        / {num_perm} >= {threshold}
),
sym AS (
  SELECT src AS a, dst AS b FROM edge
  UNION SELECT dst, src FROM edge
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
labels AS (
  SELECT a AS d, least(a, min(b)) AS cluster FROM reach GROUP BY a
)
SELECT dd.d AS doc_id, coalesce(l.cluster, dd.d) AS cluster
FROM doc dd LEFT JOIN labels l ON l.d = dd.d
"""


def sql_kg_diff(
    gazetteer: dict[str, str],
    taxonomy_a: dict[str, list[str]],
    taxonomy_b: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the kg_diff gate query: the two generated kg_triples
    subqueries (same corpus, taxonomy A vs B) EXCEPTed both ways with a
    status tag — the published per-refresh delta."""
    a = sql_kg_triples(gazetteer, taxonomy_a, phrase_list)
    b = sql_kg_triples(gazetteer, taxonomy_b, phrase_list)
    return f"""
WITH a AS ({a}), b AS ({b})
SELECT subj, pred, obj, 'removed' AS status
FROM (SELECT subj, pred, obj FROM a EXCEPT SELECT subj, pred, obj FROM b)
UNION ALL
SELECT subj, pred, obj, 'added'
FROM (SELECT subj, pred, obj FROM b EXCEPT SELECT subj, pred, obj FROM a)
"""


def sql_corpus_near_clean(threshold: float = 0.6) -> str:
    """Oracle for the corpus_near_clean gate query: the surviving corpus
    after MinHash-LSH near-dup clustering — representatives (doc_id ==
    cluster, singletons included) with language attached. Built over
    the full sql_minhash_clusters subquery (one source of truth)."""
    inner = sql_minhash_clusters(threshold=threshold)
    return f"""
WITH cl AS ({inner})
SELECT cl.doc_id, d.lang
FROM cl JOIN documents d ON cl.doc_id = CAST(d.doc_id AS VARCHAR)
WHERE cl.doc_id = cl.cluster
"""


def sql_leakage_free_split(
    threshold: float = 0.6, train_pct: int = 8, salt: str = "lfsplit"
) -> str:
    """Oracle for stages/curation.leakage_free_split: the full
    sql_minhash_clusters subquery (one source of truth) + the identical
    md5 split decision on the CLUSTER label (md5_number_lower ==
    functions/hashing.md5_hash64), so whole near-dup families land on
    one side on both engines."""
    inner = sql_minhash_clusters(threshold=threshold)
    return f"""
WITH cl AS ({inner})
SELECT doc_id, cluster,
       CASE WHEN md5_number_lower('{salt}-' || cluster) % 10 < {train_pct}
            THEN 'train' ELSE 'val' END AS split
FROM cl
"""


def sql_cluster_best_rep(threshold: float = 0.6) -> str:
    """Oracle for stages/curation.cluster_best_representative: minhash
    clusters joined to the quality_score subquery (both already gated
    individually — one source of truth each), per-cluster argmax by
    (quality DESC, doc_id) via row_number. Quality is rounded to 6dp on
    both sides before the comparison, so the argmax ordering is
    identical."""
    inner = sql_minhash_clusters(threshold=threshold)
    quality = sql_quality_score()
    return f"""
WITH cl AS ({inner}), q AS ({quality}),
j AS (
  SELECT cl.cluster, cl.doc_id, q.quality
  FROM cl JOIN q ON CAST(q.doc_id AS VARCHAR) = cl.doc_id
)
SELECT cluster, doc_id AS kept_doc, quality
FROM (SELECT j.*, row_number() OVER (
        PARTITION BY cluster ORDER BY quality DESC, doc_id) AS rn
      FROM j)
WHERE rn = 1
"""


def sql_stratified_sample(
    key_col: str, thresholds: dict[str, int], default_threshold: int
) -> str:
    """DuckDB oracle for stages/curation.stratified_sample: identical
    md5-based keep decision (md5_number_lower == md5_hash64), integer
    thresholds computed once and inlined (engine uses the same ints)."""
    whens = " ".join(
        f"WHEN {_sql_str(k)} THEN {t}" for k, t in sorted(thresholds.items())
    )
    # a WHEN-less CASE is a parser error: with no per-stratum overrides
    # the threshold is simply the default
    case = (
        f"CASE {key_col} {whens} ELSE {default_threshold} END"
        if whens else str(default_threshold)
    )
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, {key_col}
FROM documents
WHERE md5_number_lower({key_col} || ':' || CAST(doc_id AS VARCHAR)) % 1000000
      < {case}
"""


def sql_contamination(benchmark_ngrams: list[str], n: int) -> str:
    """DuckDB oracle for stages/curation.contamination_check: same word
    n-grams (token regex parity), count of DISTINCT benchmark grams
    present per doc."""
    # empty benchmark set must still generate valid SQL (nothing matches '')
    bench_values = ", ".join(
        f"({_sql_str(g)})" for g in sorted(set(benchmark_ngrams))
    ) or "('')"
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[i : i + {n - 1}], ' ') AS g
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - {n - 1}, 0))) AS i
    FROM toks WHERE len(ws) >= {n}
  )
),
hits AS (
  SELECT doc_id, count(*) AS n_matched
  FROM grams JOIN (VALUES {bench_values}) AS b(g) USING (g)
  GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(h.n_matched, 0) AS n_matched,
       coalesce(h.n_matched, 0) > 0 AS contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
"""


def sql_kg_nodes(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the graph-materialize node table: distinct typed
    endpoints of the kg_triples oracle (reused verbatim as a subquery —
    one source of truth). Kind mapping mirrors kg_build._NODE_KINDS
    (SVO predicates would type both ends ENTITY; none occur on this
    corpus, which the kg oracle's assumption tests pin)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples})
SELECT DISTINCT node_id, kind, node_id AS name FROM (
  SELECT subj AS node_id,
         CASE pred WHEN 'MENTIONS' THEN 'DOC' WHEN 'HAS_TOPIC' THEN 'DOC'
                   WHEN 'IN_TOPIC' THEN 'PHRASE'
                   WHEN 'RELATES_TO_DOC' THEN 'BROAD_TOPIC'
                   ELSE 'ENTITY' END AS kind
  FROM t
  UNION ALL
  SELECT obj,
         CASE pred WHEN 'MENTIONS' THEN 'ENTITY' WHEN 'HAS_TOPIC' THEN 'TOPIC'
                   WHEN 'IN_TOPIC' THEN 'BROAD_TOPIC'
                   WHEN 'RELATES_TO_DOC' THEN 'DOC'
                   ELSE 'ENTITY' END
  FROM t
)
"""


def sql_kg_adjacency(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the adjacency store (kg_build.adjacency_from_edges):
    per-src neighbor list serialized 'dst|rel;…' in (dst, rel) order —
    the operator's documented sort — plus degree; built over the
    kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples})
SELECT subj AS src,
       string_agg(obj || '|' || pred, ';' ORDER BY obj, pred) AS neighbors,
       count(*) AS degree
FROM t GROUP BY subj
"""


def sql_kg_degree(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.degree_table over the KG edge set: per
    endpoint, out/in edge counts (multigraph: every triple counts), built
    over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e AS (SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst FROM t)
SELECT node_id, CAST(sum(o) AS BIGINT) AS out_degree,
       CAST(sum(i) AS BIGINT) AS in_degree
FROM (SELECT src AS node_id, 1 AS o, 0 AS i FROM e
      UNION ALL SELECT dst, 0, 1 FROM e)
GROUP BY node_id
"""


def sql_kg_pagerank(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    iterations: int = 5,
    scale: int = 1_000_000,
    k: int = 20,
) -> str:
    """Oracle for stages/graph.pagerank: the integer recurrence
    ``pr'(v) = BASE + (85·Σ(pr(u)//od(u)))//100`` unrolled into one CTE
    per iteration (no recursion needed for a fixed round count — every
    engine round maps to a CTE verbatim). All arithmetic is floor
    integer, so engine and SQL agree bit-for-bit; top-k by
    (pr DESC, node_id) is the operator's documented tie order."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    base_scaled = (100 - 85) * scale // 100
    ctes = []
    for i in range(1, iterations + 1):
        ctes.append(f"""pr{i} AS (
  SELECT n.node_id,
         CAST({base_scaled} + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node_id, sum(p.pr // o.od) AS m
    FROM e JOIN pr{i - 1} p ON p.node_id = e.src
           JOIN od o ON o.src = e.src
    GROUP BY e.dst) s ON s.node_id = n.node_id)""")
    chain = ",\n".join(ctes)
    return f"""
WITH t AS ({triples}),
e AS (SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst FROM t),
od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
nodes AS (SELECT src AS node_id FROM e UNION SELECT dst FROM e),
pr0 AS (SELECT node_id, CAST({scale} AS BIGINT) AS pr FROM nodes),
{chain}
SELECT node_id, pr FROM pr{iterations}
ORDER BY pr DESC, node_id LIMIT {k}
"""


def sql_kg_components(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/cc.min_label_components over the KG edge set:
    weakly-connected components as min-reachable-node labels. The
    recursive CTE enumerates every (node, reachable-node) pair over the
    symmetrized edges (UNION dedups, so it terminates) and MIN-aggregates
    — exactly the fixpoint of the engine's min-label propagation. Built
    over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst FROM t),
es AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
reach(node_id, label) AS (
  SELECT DISTINCT src, src FROM es
  UNION
  SELECT es.dst, r.label FROM reach r JOIN es ON es.src = r.node_id
)
SELECT node_id, min(label) AS component FROM reach GROUP BY node_id
"""


def sql_kg_scc(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.scc_labels: STRONGLY connected components
    of the DIRECTED distinct simple edge set (self-loops dropped — they
    never change membership), labeled by the lexicographically smallest
    member. ``reach`` enumerates directed reachability (UNION dedups and
    the pair domain is finite, so it terminates); two reach rows joined
    both ways give mutual reachability, and the MIN over a node's mutual
    partners (every node is mutually reachable with itself via the base
    rows) is exactly the component's smallest member — the same label
    both engine regimes emit. Built over the kg_triples oracle subquery
    (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE {_kg_scc_ctes(triples)}
SELECT node_id, scc FROM scc
"""


def _kg_scc_ctes(triples: str) -> str:
    """Shared CTE prefix ending in ``scc(node_id, scc)`` — ONE source of
    truth for the SCC twin, reused verbatim by the condensation and
    topo-level oracles so the three can never drift. Must sit inside a
    ``WITH RECURSIVE`` clause (``reach`` recurses)."""
    return f"""t AS ({triples}),
e AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
nodes AS (SELECT src AS node_id FROM e UNION SELECT dst FROM e),
reach(a, b) AS (
  SELECT node_id, node_id FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
scc AS (
  SELECT r1.a AS node_id, min(r1.b) AS scc
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  GROUP BY r1.a
)"""


def sql_kg_condensation(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.condensation over the KG edge set:
    contract each SCC to its smallest-member label and keep the DISTINCT
    inter-component edges. Shares the SCC CTE prefix with sql_kg_scc."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE {_kg_scc_ctes(triples)}
SELECT DISTINCT s1.scc AS src_scc, s2.scc AS dst_scc
FROM e
JOIN scc s1 ON s1.node_id = e.src
JOIN scc s2 ON s2.node_id = e.dst
WHERE s1.scc <> s2.scc
"""


def sql_kg_topo_levels(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.condensation_levels: longest directed
    path ending at each condensation node (sources at 0). ``p``
    enumerates (node, path length) pairs — UNION-deduped and bounded by
    |nodes| x depth on the acyclic condensation, so it terminates; the
    per-node MAX is exactly the longest-path level both engine regimes
    emit. Shares the SCC CTE prefix with sql_kg_scc."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE {_kg_scc_ctes(triples)},
ce AS (
  SELECT DISTINCT s1.scc AS src_scc, s2.scc AS dst_scc
  FROM e
  JOIN scc s1 ON s1.node_id = e.src
  JOIN scc s2 ON s2.node_id = e.dst
  WHERE s1.scc <> s2.scc
),
cn AS (SELECT src_scc AS v FROM ce UNION SELECT dst_scc FROM ce),
p(v, l) AS (
  SELECT v, CAST(0 AS BIGINT) FROM cn
  UNION
  SELECT ce.dst_scc, p.l + 1 FROM p JOIN ce ON ce.src_scc = p.v
)
SELECT v AS node_id, max(l) AS level FROM p GROUP BY v
"""


def sql_kg_bfs(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    max_hops: int = 4,
) -> str:
    """Oracle for stages/graph.bfs_hops over the KG edge set: exact
    minimum hop distance from the topic seed set (every HAS_TOPIC
    object) over the symmetrized edges, bounded at ``max_hops``. The
    recursive CTE enumerates (node, dist) pairs — UNION dedups and dist
    is bounded, so it terminates — and MIN-aggregates: precisely the
    fixpoint of the engine's synchronous min-distance propagation.
    Built over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst FROM t),
es AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
seeds AS (
  SELECT DISTINCT CAST(obj AS VARCHAR) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC'
),
reach(node_id, dist) AS (
  SELECT node_id, 0 FROM seeds
  UNION
  SELECT es.dst, r.dist + 1
  FROM reach r JOIN es ON es.src = r.node_id
  WHERE r.dist < {max_hops}
)
SELECT node_id, CAST(min(dist) AS BIGINT) AS dist FROM reach GROUP BY node_id
"""


def sql_kg_weighted_paths(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    max_rounds: int = 4,
) -> str:
    """Oracle for stages/graph.weighted_hops over the KG edge set:
    exact minimum WEIGHTED distance (edge weight = length(pred), an
    integer — no FP in the relaxation) from the topic seed set over the
    symmetrized edges, restricted to paths of at most ``max_rounds``
    edges — precisely what K synchronous min-plus relaxation rounds
    compute. The recursive CTE tracks (node, dist, hops); hops is
    bounded and UNION dedups, so it terminates. Built over the
    kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE t AS ({triples}),
e0 AS (
  SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst,
         CAST(length(pred) AS BIGINT) AS w
  FROM t
),
es AS (SELECT src, dst, w FROM e0 UNION SELECT dst, src, w FROM e0),
seeds AS (
  SELECT DISTINCT CAST(obj AS VARCHAR) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC'
),
reach(node_id, dist, hops) AS (
  SELECT node_id, CAST(0 AS BIGINT), 0 FROM seeds
  UNION
  SELECT es.dst, r.dist + es.w, r.hops + 1
  FROM reach r JOIN es ON es.src = r.node_id
  WHERE r.hops < {max_rounds}
)
SELECT node_id, min(dist) AS dist FROM reach GROUP BY node_id
"""


def sql_kg_assortativity(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the kg_assortativity gate query: Newman's degree
    assortativity over the symmetrized KG edge stubs — exact HUGEINT
    moment sums mirroring the engine's arbitrary-precision partials,
    then the identical one-divide/two-sqrt double chain. NULL when the
    degree variance is zero. Built over the kg_triples oracle subquery
    (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst FROM t),
es AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
d AS (SELECT src AS node, count(*) AS deg FROM es GROUP BY src),
xy AS (
  SELECT CAST(d1.deg AS HUGEINT) AS x, CAST(d2.deg AS HUGEINT) AS y
  FROM es JOIN d d1 ON es.src = d1.node JOIN d d2 ON es.dst = d2.node
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_stubs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS assortativity
FROM s
"""


def sql_entity_link(entity_names: list[str]) -> str:
    """Oracle for the entity_link gate query (stages/entitylink via
    __ray_entry__._q_entity_link): distinct corpus word BIGRAMS linked at
    cosine ≥ 0.9999 against the multi-word entity vocabulary. A bigram
    hashes to 3 embedding features, so the only surfaces clearing that
    cut are token-identical to an entity name — which SQL reproduces as
    exact membership (token regex parity with the engine tokenizer).
    Near-match ranking is deliberately NOT in the oracle (feature-hash
    cosine isn't SQL-expressible); tests/test_entitylink.py pins it."""
    vals = ", ".join(
        f"({_sql_str(e)})" for e in sorted(set(entity_names))
    ) or "('')"
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
big AS (
  SELECT DISTINCT array_to_string(ws[i : i + 1], ' ') AS mention
  FROM (
    SELECT ws, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i
    FROM toks WHERE len(ws) >= 2
  )
)
SELECT b.mention, b.mention AS entity_id
FROM big b JOIN (VALUES {vals}) AS e(mention) USING (mention)
"""


def sql_repetition(n: int) -> str:
    """DuckDB oracle for stages/curation.repetition_score: same token
    n-grams; the ratio is one integer division on both sides (bit-equal
    doubles, no rounding step to diverge on)."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
counts AS (
  SELECT doc_id,
         greatest(len(ws) - {n - 1}, 0) AS n_grams,
         CASE WHEN len(ws) >= {n} THEN (
           SELECT count(DISTINCT array_to_string(t.ws[i : i + {n - 1}], ' '))
           FROM unnest(generate_series(1, len(t.ws) - {n - 1})) AS u(i)
         ) ELSE 0 END AS n_distinct
  FROM toks t
)
SELECT doc_id, n_grams, n_distinct,
       CASE WHEN n_grams > 0
            THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_grams
            ELSE 0.0 END AS rep_ratio
FROM counts
"""


def sql_chunk_docs(size: int, stride: int) -> str:
    """DuckDB oracle for pipelines/queries.q_chunk_docs: overlapping
    token windows with stride-multiple starts (DuckDB list slices are
    1-based, end-inclusive)."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
s AS (
  SELECT doc_id, ws,
         unnest(generate_series(0, len(ws) - 1, {stride})) AS start
  FROM toks WHERE len(ws) > 0
)
SELECT doc_id,
       CAST(start // {stride} AS BIGINT) AS chunk_id,
       CAST(least(len(ws) - start, {size}) AS BIGINT) AS n_tokens,
       array_to_string(
         ws[CAST(start + 1 AS INT):CAST(least(start + {size}, len(ws)) AS INT)],
         ' ') AS chunk_text
FROM s
"""


def sql_pmi_pairs(m: int, k: int, ppm: int = 1_000_000) -> str:
    """DuckDB oracle for pipelines/queries.q_pmi_pairs: top-k collocation
    pairs by integer lift over the top-m df vocabulary. HUGEINT products
    mirror the engine's exact Python-int arithmetic; vocab and pair ties
    break lexicographically on both sides."""
    return f"""
WITH wd AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS d,
         unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS w
  FROM documents
),
df AS (SELECT w, count(*) AS df FROM wd GROUP BY w),
vocab AS (SELECT w, df FROM df ORDER BY df DESC, w LIMIT {m}),
total AS (SELECT count(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.w AS w_a, b.w AS w_b, count(*) AS n_ab
  FROM wd a JOIN wd b ON a.d = b.d AND a.w < b.w
  JOIN vocab va ON va.w = a.w
  JOIN vocab vb ON vb.w = b.w
  GROUP BY a.w, b.w
)
SELECT p.w_a, p.w_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(va.df AS BIGINT) AS n_a, CAST(vb.df AS BIGINT) AS n_b,
       CAST(CAST(p.n_ab AS HUGEINT) * t.n_docs * {ppm}
            // (CAST(va.df AS HUGEINT) * vb.df) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN vocab va ON va.w = p.w_a
JOIN vocab vb ON vb.w = p.w_b, total t
ORDER BY lift_ppm DESC, p.w_a, p.w_b LIMIT {k}
"""


def sql_cross_doc_dups(n: int) -> str:
    """DuckDB oracle for stages/curation.cross_doc_ngram_dups: per doc,
    distinct word n-grams that also occur in ≥1 other doc. Same token
    regex/gram construction as the engine; zero rows for too-short docs;
    the fraction is one int→double division on both sides."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ws) >= {n}
         THEN list_distinct(list_transform(range(1, len(ws) - {n - 2}),
                i -> array_to_string(ws[CAST(i AS INT):CAST(i + {n - 1} AS INT)], ' ')))
         ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM toks
),
gc AS (SELECT g, count(*) AS nd FROM grams GROUP BY g),
sh AS (SELECT gr.doc_id, count(*) AS n_grams,
              sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END) AS n_shared
       FROM grams gr JOIN gc USING (g) GROUP BY gr.doc_id)
SELECT t.doc_id,
       CAST(coalesce(sh.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN coalesce(sh.n_grams, 0) > 0
            THEN CAST(sh.n_shared AS DOUBLE) / sh.n_grams
            ELSE 0.0 END AS dup_frac
FROM toks t LEFT JOIN sh USING (doc_id)
"""


def sql_inverted_index(min_df: int = 1, max_df: int | None = None) -> str:
    """DuckDB oracle for stages/curation.build_inverted_index: distinct
    (term, doc) pairs → df + ','-joined postings in ascending string
    order."""
    having = f"HAVING count(*) >= {min_df}"
    if max_df is not None:
        having += f" AND count(*) <= {max_df}"
    return f"""
WITH td AS (
  SELECT DISTINCT
         unnest(regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}')) AS term,
         CAST(doc_id AS VARCHAR) AS d
  FROM documents
)
SELECT term, count(*) AS df,
       string_agg(d, ',' ORDER BY d) AS postings
FROM td GROUP BY term {having}
"""


def sql_rag_answer(query_tokens: list[str], k: int) -> str:
    """DuckDB oracle for the grounded extractive RAG surrogate
    (pipelines/search.rag_answer): lexical top-k (same generated scoring
    as sql_search_lexical) + per-doc best 12-word-chunk snippet by
    DISTINCT-query-token overlap, first chunk on ties."""
    qlist = ", ".join(_sql_str(t) for t in sorted(set(query_tokens))) or "''"
    mult = 1 + len(set(query_tokens))
    return f"""
WITH scored AS (
  SELECT CAST(doc_id AS VARCHAR) AS d, text,
         {_lexical_score_sql(qlist, mult)} AS score
  FROM documents
),
topk AS (
  SELECT d, text, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, d) AS "rank"
  FROM scored ORDER BY score DESC, d LIMIT {k}
),
chunks AS (
  SELECT d, "rank", score, chunk_i,
         string_agg(w, ' ' ORDER BY pos) AS chunk
  FROM (
    SELECT d, "rank", score,
           CASE WHEN length(text) > 200 THEN pos // 12 ELSE 0 END AS chunk_i,
           pos, w
    FROM (
      SELECT d, "rank", score, text,
             unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos
      FROM topk
    )
  ) GROUP BY d, "rank", score, chunk_i
),
best AS (
  SELECT d, "rank", score, chunk,
         ROW_NUMBER() OVER (PARTITION BY d ORDER BY ov DESC, chunk_i) AS rk
  FROM (
    SELECT *,
           len(list_filter([{qlist}],
               q -> list_contains(string_split(lower(chunk), ' '), q))) AS ov
    FROM chunks
  )
)
SELECT "rank", d AS doc_id, score, chunk AS snippet FROM best WHERE rk = 1
"""


def sql_bm25(query_tokens: list[str], k: int, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB oracle for pipelines/search.search_bm25 — bit-identical
    scores: idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (same libm as the
    engine on one host), tf saturation in IEEE +,*,/ on identical
    inputs, shared 6dp round."""
    qlist = ", ".join(_sql_str(t) for t in sorted(set(query_tokens))) or "''"
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS d,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS tk
  FROM documents
),
stats AS (
  SELECT count(*) AS n, CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
  FROM toks
),
term AS (
  SELECT q, count(*) FILTER (WHERE list_contains(tk, q)) AS df
  FROM toks CROSS JOIN (SELECT unnest([{qlist}]) AS q) qq
  GROUP BY q
),
idf AS (
  SELECT q, ln(1.0 + (s.n - df + 0.5) / (df + 0.5)) AS w
  FROM term, stats s
),
scored AS (
  -- list_sum over a q-ORDERED list pins the FP accumulation order to the
  -- engine's sorted-token loop (a plain hash-aggregate sum() leaves the
  -- order unspecified; FP addition is non-associative)
  SELECT t.d,
         round(list_sum(list(
           i.w * (tf * ({k1} + 1.0))
               / (tf + {k1} * (1.0 - {b} + {b} * (len(t.tk) / s.avgdl)))
           ORDER BY i.q
         )), 6) AS score
  FROM toks t CROSS JOIN stats s
  CROSS JOIN idf i
  CROSS JOIN LATERAL (
    SELECT CAST(len(list_filter(t.tk, x -> x = i.q)) AS DOUBLE) AS tf
  ) f
  GROUP BY t.d
)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, d) AS "rank",
       d AS doc_id, score
FROM scored ORDER BY score DESC, d LIMIT {k}
"""


def sql_kg_triangles(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.triangle_count over the KG edge set: the
    triangle count of the undirected simple graph — 3-way self-join over
    the normalized distinct edge set with a < b < c ordering (each
    triangle counted exactly once, matching the engine's unique
    minimum-(degree, id) wedge apex). Built over the kg_triples oracle
    subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0)
SELECT count(*) AS triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
"""


def sql_kg_jaccard(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    k: int = 20,
) -> str:
    """Oracle for stages/graph.neighbor_jaccard_topk over the KG edge
    set: co-neighbor counts via the symmetrized-edge wedge self-join,
    degrees from the symmetrized edges, jaccard = common/(da+db−common)
    with one DOUBLE cast per exact-int operand (bit-equal to the
    engine's numpy expression), top-k by (jaccard DESC, node_a, node_b).
    Built over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
wedge AS (
  SELECT s1.v AS x, s2.v AS y, count(*) AS common
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
  GROUP BY 1, 2
),
deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1)
SELECT x AS node_a, y AS node_b, common,
       CAST(common AS DOUBLE)
         / CAST(dx.deg + dy.deg - common AS DOUBLE) AS jaccard
FROM wedge JOIN deg dx ON dx.u = x JOIN deg dy ON dy.u = y
ORDER BY jaccard DESC, node_a, node_b LIMIT {k}
"""


def sql_kg_linkpred(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    k: int = 50,
    scale: int = 1_000_000,
) -> str:
    """Oracle for stages/graph.linkpred_topk over the KG edge set:
    non-edge pairs sharing >=1 neighbor scored by common-neighbor count,
    preferential attachment deg(a)*deg(b), and the INTEGER
    resource-allocation index sum(scale // deg(z)) over shared neighbors
    z — every operand exact int64 (DuckDB ``//`` == numpy int64 floor
    division on non-negative operands; the per-apex shares sum
    associatively so no FP pinning is needed). Existing edges are
    excluded via NOT EXISTS, mirroring the engine's composite-key anti
    join. Top-k by (ra DESC, node_a, node_b). Built over the kg_triples
    oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
wedge AS (
  SELECT s1.v AS x, s2.v AS y,
         CAST(count(*) AS BIGINT) AS common,
         CAST(sum(CAST({scale} AS BIGINT) // d.deg) AS BIGINT) AS ra
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
  JOIN deg d ON d.u = s1.u
  GROUP BY 1, 2
),
ne AS (
  SELECT w.* FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = w.x AND e.b = w.y)
)
SELECT x AS node_a, y AS node_b, common,
       dx.deg * dy.deg AS pref_attach, ra
FROM ne JOIN deg dx ON dx.u = x JOIN deg dy ON dy.u = y
ORDER BY ra DESC, node_a, node_b LIMIT {k}
"""


def sql_kg_ego(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    radius: int = 2,
) -> str:
    """Oracle for stages/graph.ego_edges around the lexicographically
    smallest HAS_TOPIC object: bounded undirected reachability CTE
    (same shape as sql_kg_bfs), then the distinct simple directed edges
    with BOTH endpoints inside the radius. Built over the kg_triples
    oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE t AS ({triples}),
e AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
es AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
seed AS (
  SELECT min(CAST(obj AS VARCHAR)) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC'
),
reach(node_id, dist) AS (
  SELECT node_id, 0 FROM seed
  UNION
  SELECT es.dst, r.dist + 1
  FROM reach r JOIN es ON es.src = r.node_id
  WHERE r.dist < {radius}
),
inside AS (SELECT DISTINCT node_id FROM reach)
SELECT e.src, e.dst
FROM e
JOIN inside a ON a.node_id = e.src
JOIN inside b ON b.node_id = e.dst
"""


def sql_kg_closeness(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    radius: int = 4,
    n_seeds: int = 5,
) -> str:
    """Oracle for stages/graph.closeness_from_seeds over the KG edge
    set, seeded at the ``n_seeds`` lexicographically smallest HAS_TOPIC
    objects: bounded undirected reachability CTE carrying the seed
    (same shape as sql_kg_ego), per-(seed, node) min dist, then the
    reached/sum aggregates and the single closeness divide. Built over
    the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE t AS ({triples}),
e AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
es AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
seeds AS (
  SELECT DISTINCT CAST(obj AS VARCHAR) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC' ORDER BY 1 LIMIT {n_seeds}
),
reach(seed, node_id, dist) AS (
  SELECT node_id, node_id, 0 FROM seeds
  UNION
  SELECT r.seed, es.dst, r.dist + 1
  FROM reach r JOIN es ON es.src = r.node_id
  WHERE r.dist < {radius}
),
mind AS (
  SELECT seed, node_id, min(dist) AS d FROM reach GROUP BY 1, 2
)
SELECT seed,
       CAST(COALESCE(sum(CASE WHEN d >= 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS reached,
       CAST(COALESCE(sum(CASE WHEN d >= 1 THEN d ELSE 0 END), 0)
            AS BIGINT) AS sum_dist,
       CASE WHEN COALESCE(sum(CASE WHEN d >= 1 THEN d ELSE 0 END), 0) = 0
            THEN 0.0
            ELSE CAST(sum(CASE WHEN d >= 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CASE WHEN d >= 1 THEN d ELSE 0 END) AS DOUBLE)
       END AS closeness
FROM mind GROUP BY seed
"""


def sql_kg_sigma(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    radius: int = 4,
) -> str:
    """Oracle for stages/graph.shortest_path_counts seeded at the
    lexicographically smallest HAS_TOPIC object: bounded reachability
    CTE → min hop distance per node, then ``radius`` unrolled σ layer
    CTEs (σ at layer r = Σ of σ over BFS-DAG predecessors at r-1) —
    all-integer Brandes forward pass. Built over the kg_triples oracle
    subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"""WITH RECURSIVE t AS ({triples}),
e AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
es AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
seed AS (
  SELECT min(CAST(obj AS VARCHAR)) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC'
),
reach(node_id, dist) AS (
  SELECT node_id, 0 FROM seed
  UNION
  SELECT es.dst, r.dist + 1
  FROM reach r JOIN es ON es.src = r.node_id
  WHERE r.dist < {radius}
),
mind AS (SELECT node_id, min(dist) AS d FROM reach GROUP BY 1),
s0 AS (SELECT node_id, CAST(1 AS BIGINT) AS sigma FROM seed)"""
    ]
    for r in range(1, radius + 1):
        parts.append(
            f""",
s{r} AS (
  SELECT mv.node_id, CAST(sum(sp.sigma) AS BIGINT) AS sigma
  FROM mind mv
  JOIN es ON es.dst = mv.node_id
  JOIN mind mu ON mu.node_id = es.src AND mu.d = {r - 1}
  JOIN s{r - 1} sp ON sp.node_id = es.src
  WHERE mv.d = {r}
  GROUP BY 1
)"""
        )
    selects = ["SELECT node_id, CAST(0 AS BIGINT) AS dist, sigma FROM s0"]
    for r in range(1, radius + 1):
        selects.append(
            f"SELECT node_id, CAST({r} AS BIGINT) AS dist, sigma FROM s{r}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


def sql_kg_diameter_lb(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    max_hops: int = 16,
) -> str:
    """Oracle for the double-sweep diameter lower bound: two bounded
    undirected reachability CTEs; the far pick is (dist DESC, node)
    exactly as the engine's (max dist, min node) fold. Built over the
    kg_triples oracle subquery."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH RECURSIVE t AS ({triples}),
e AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
es AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
seed AS (
  SELECT min(node) AS node_id FROM
    (SELECT src AS node FROM e UNION SELECT dst FROM e)
),
r1(node_id, dist) AS (
  SELECT node_id, 0 FROM seed
  UNION
  SELECT es.dst, r.dist + 1 FROM r1 r JOIN es ON es.src = r.node_id
  WHERE r.dist < {max_hops}
),
m1 AS (SELECT node_id, min(dist) AS d FROM r1 GROUP BY 1),
f1 AS (SELECT node_id, d FROM m1 ORDER BY d DESC, node_id LIMIT 1),
r2(node_id, dist) AS (
  SELECT node_id, 0 FROM f1
  UNION
  SELECT es.dst, r.dist + 1 FROM r2 r JOIN es ON es.src = r.node_id
  WHERE r.dist < {max_hops}
),
m2 AS (SELECT node_id, min(dist) AS d FROM r2 GROUP BY 1)
SELECT (SELECT node_id FROM seed) AS seed,
       (SELECT node_id FROM f1) AS far_node,
       CAST((SELECT d FROM f1) AS BIGINT) AS ecc1,
       CAST((SELECT max(d) FROM m2) AS BIGINT) AS diameter_lb
"""


def sql_kg_linkpred_negs(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    k: int = 3,
    salt: str = "neg",
) -> str:
    """Oracle for stages/graph.linkpred_negative_samples over the KG
    edge set: per positive edge, k md5-ranked corruption candidates
    (md5_number_lower == functions/hashing.md5_hash64; rank =
    row_number over the binary-collated sorted node vocabulary ==
    numpy's sort for this ASCII alphabet), endpoint and existing-edge
    collisions filtered, never resampled. Built over the kg_triples
    oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
nd AS (SELECT a AS node FROM e UNION SELECT b FROM e),
rk AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS r FROM nd),
cnt AS (SELECT count(*) AS c FROM nd),
cand AS (
  SELECT e.a, e.b, i.i,
         md5_number_lower('{salt}:' || e.a || '|' || e.b || '|'
                          || CAST(i.i AS VARCHAR))
           % (SELECT c FROM cnt) AS r
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i) i
)
SELECT w.a AS node_a, w.b AS node_b, CAST(w.i AS BIGINT) AS neg_idx,
       w.neg AS neg_node
FROM (SELECT c.a, c.b, c.i, rk.node AS neg
      FROM cand c JOIN rk ON rk.r = c.r) w
WHERE w.neg <> w.a AND w.neg <> w.b
  AND NOT EXISTS (SELECT 1 FROM e
                  WHERE e.a = least(w.a, w.neg)
                    AND e.b = greatest(w.a, w.neg))
"""


def sql_kg_local_clustering(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.local_clustering over the KG edge set:
    per-node triangle counts via the symmetrized wedge self-join closed
    against the simple edge set, lcc = 2*tri / (deg*(deg-1)) with ONE
    double cast per exact-int operand and 0.0 for deg < 2 — bit-equal to
    the engine's numpy expression. Built over the kg_triples oracle
    subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
tri AS (
  SELECT s1.u AS v, CAST(count(*) AS BIGINT) AS tr
  FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
  JOIN e ON e.a = s1.v AND e.b = s2.v
  GROUP BY 1
)
SELECT d.u AS node_id,
       CAST(COALESCE(tri.tr, 0) AS BIGINT) AS triangles,
       d.deg AS deg,
       CASE WHEN d.deg < 2 THEN 0.0
            ELSE CAST(2 * COALESCE(tri.tr, 0) AS DOUBLE)
                   / CAST(d.deg * (d.deg - 1) AS DOUBLE) END AS lcc
FROM deg d LEFT JOIN tri ON tri.v = d.u
"""


def sql_kg_edge_support(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.edge_support over the KG edge set:
    per-edge triangle support (common-neighbor count of the edge's
    endpoints) via the symmetrized neighbor self-join, LEFT-joined back
    onto the distinct simple undirected edge set so triangle-free edges
    report 0. Built over the kg_triples oracle subquery (one source of
    truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
sup AS (
  SELECT s1.u AS a, s2.u AS b, CAST(count(*) AS BIGINT) AS c
  FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
  GROUP BY 1, 2
)
SELECT e.a AS node_a, e.b AS node_b,
       CAST(COALESCE(sup.c, 0) AS BIGINT) AS support
FROM e LEFT JOIN sup ON sup.a = e.a AND sup.b = e.b
"""


def sql_kg_comention(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for pipelines/kg_build.comention_pairs: the bipartite
    doc→entity projection — for each unordered entity pair the number
    of docs whose MENTIONS sets contain both, via the DISTINCT
    (doc, ent) self-join on doc with ent_a < ent_b. Built over the
    kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
m AS (SELECT DISTINCT CAST(subj AS VARCHAR) AS doc,
                      CAST(obj AS VARCHAR) AS ent
      FROM t WHERE pred = 'MENTIONS')
SELECT m1.ent AS ent_a, m2.ent AS ent_b, CAST(count(*) AS BIGINT) AS docs
FROM m m1 JOIN m m2 ON m1.doc = m2.doc AND m1.ent < m2.ent
GROUP BY 1, 2
"""


def sql_kg_walks(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    steps: int = 3,
    salt: str = "walk",
) -> str:
    """Oracle for stages/graph.random_walks over the KG edge set:
    ``steps`` unrolled walk rounds, chained CTEs. One walk per node of
    the undirected simple edge set; the step-r move of walk w at u is
    the symmetric neighbor v minimizing (md5_number_lower(
    'salt:w|r|v'), v) — md5_number_lower == functions/hashing.
    md5_hash64, and the two-stage min (min h per walk, then min v among
    h-ties) is the engine's exact tie rule. Built over the kg_triples
    oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"WITH t AS MATERIALIZED ({triples}),\n",
        "e0 AS MATERIALIZED (SELECT CAST(subj AS VARCHAR) AS s, "
        "CAST(obj AS VARCHAR) AS d FROM t "
        "WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),\n",
        "e AS MATERIALIZED (SELECT DISTINCT least(s, d) AS a, "
        "greatest(s, d) AS b FROM e0),\n",
        "sym AS MATERIALIZED (SELECT a AS u, b AS v FROM e "
        "UNION ALL SELECT b, a FROM e),\n",
        "f0 AS MATERIALIZED (SELECT DISTINCT u AS walk, u FROM sym)",
    ]
    for r in range(1, steps + 1):
        parts.append(
            f""",
cand{r} AS MATERIALIZED (
  SELECT f.walk, s.v,
         md5_number_lower('{salt}:' || f.walk || '|{r}|' || s.v) AS h
  FROM f{r - 1} f JOIN sym s ON s.u = f.u
),
mn{r} AS MATERIALIZED (
  SELECT walk, min(h) AS mh FROM cand{r} GROUP BY walk
),
f{r} AS MATERIALIZED (
  SELECT c.walk, min(c.v) AS u
  FROM cand{r} c JOIN mn{r} m ON m.walk = c.walk AND c.h = m.mh
  GROUP BY c.walk
)"""
        )
    selects = ["SELECT walk AS walk_id, CAST(0 AS BIGINT) AS step, "
               "u AS node FROM f0"]
    for r in range(1, steps + 1):
        selects.append(
            f"SELECT walk AS walk_id, CAST({r} AS BIGINT) AS step, "
            f"u AS node FROM f{r}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


def sql_kg_modularity(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.modularity over the LPA communities of
    the KG edge set: Q = intra/m − Σ_c deg_c²/(4m²) with all three
    operands exact BIGINTs and the identical one-expression double at
    the end. Communities come from the sql_kg_communities subquery and
    edges from the kg_triples subquery (one source of truth each)."""
    comm = sql_kg_communities(gazetteer, taxonomy, phrase_list)
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH comm AS MATERIALIZED ({comm}),
t AS MATERIALIZED ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS MATERIALIZED (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
intra AS (
  SELECT CAST(count(*) AS BIGINT) AS c
  FROM e JOIN comm ca ON ca.node_id = e.a
         JOIN comm cb ON cb.node_id = e.b
  WHERE ca.community = cb.community
),
sym AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
dc AS (
  SELECT c.community, CAST(sum(d.deg) AS BIGINT) AS dc
  FROM deg d JOIN comm c ON c.node_id = d.u GROUP BY 1
),
sq AS (SELECT CAST(sum(dc * dc) AS BIGINT) AS s FROM dc)
SELECT mm.m AS m_edges, intra.c AS intra_edges, sq.s AS sum_deg_sq,
       CAST(intra.c AS DOUBLE) / CAST(mm.m AS DOUBLE)
         - CAST(sq.s AS DOUBLE)
           / (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE))
         AS modularity
FROM mm, intra, sq
"""


def sql_kg_ktruss(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    k: int = 3,
    rounds: int = 3,
) -> str:
    """Oracle for stages/graph.ktruss_edges over the KG edge set:
    ``rounds`` unrolled peel rounds, each recomputing per-edge support
    (the sql_kg_edge_support self-join) on the surviving edge set and
    keeping support >= k-2. AS MATERIALIZED per round (the kcore
    lesson). The per-round INNER join against the support rows is only
    equivalent to the engine's zero-filled LEFT attach when k-2 >= 1
    (0-support edges must drop anyway), hence the k >= 3 guard. Built
    over the kg_triples oracle subquery."""
    if k < 3:
        raise ValueError("sql_kg_ktruss requires k >= 3 (see docstring)")
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"WITH t AS MATERIALIZED ({triples}),\n",
        "e0raw AS (SELECT CAST(subj AS VARCHAR) AS s, "
        "CAST(obj AS VARCHAR) AS d FROM t "
        "WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),\n",
        "t0 AS MATERIALIZED (SELECT DISTINCT least(s, d) AS a, "
        "greatest(s, d) AS b FROM e0raw)",
    ]
    for r in range(rounds):
        parts.append(
            f""",
sym{r} AS MATERIALIZED (SELECT a AS u, b AS v FROM t{r}
                        UNION ALL SELECT b, a FROM t{r}),
sup{r} AS MATERIALIZED (
  SELECT s1.u AS a, s2.u AS b, count(*) AS c
  FROM sym{r} s1 JOIN sym{r} s2 ON s1.v = s2.v AND s1.u < s2.u
  GROUP BY 1, 2
),
t{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM t{r} e
  JOIN sup{r} s ON s.a = e.a AND s.b = e.b
  WHERE s.c >= {k - 2}
)"""
        )
    parts.append(
        f"""
SELECT a AS node_a, b AS node_b FROM t{rounds}"""
    )
    return "".join(parts)


def sql_kg_metapath(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for pipelines/kg_build.metapath_topic_coverage: per
    topic, distinct docs reaching it via MENTIONS∘IN_TOPIC, distinct
    docs asserting it via HAS_TOPIC, and the overlap — plain DISTINCT
    joins over the kg_triples subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS MATERIALIZED ({triples}),
m AS (SELECT DISTINCT CAST(subj AS VARCHAR) AS doc,
                      CAST(obj AS VARCHAR) AS ent
      FROM t WHERE pred = 'MENTIONS'),
it AS (SELECT DISTINCT CAST(subj AS VARCHAR) AS ent,
                       CAST(obj AS VARCHAR) AS topic
       FROM t WHERE pred = 'IN_TOPIC'),
via AS (SELECT DISTINCT m.doc, it.topic FROM m JOIN it ON it.ent = m.ent),
direct AS (SELECT DISTINCT CAST(subj AS VARCHAR) AS doc,
                           CAST(obj AS VARCHAR) AS topic
           FROM t WHERE pred = 'HAS_TOPIC'),
topics AS (SELECT topic FROM via UNION SELECT topic FROM direct)
SELECT tp.topic,
       CAST((SELECT count(*) FROM via v WHERE v.topic = tp.topic)
            AS BIGINT) AS n_via_path,
       CAST((SELECT count(*) FROM direct d WHERE d.topic = tp.topic)
            AS BIGINT) AS n_direct,
       CAST((SELECT count(*) FROM via v JOIN direct d
             ON d.doc = v.doc AND d.topic = v.topic
             WHERE v.topic = tp.topic) AS BIGINT) AS n_both
FROM topics tp
"""


def sql_kg_wcc_sizes(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the WCC size histogram: the sql_kg_components
    subquery → per-component counts → size census."""
    comp = sql_kg_components(gazetteer, taxonomy, phrase_list)
    return f"""
WITH comp AS MATERIALIZED ({comp}),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS n
          FROM comp GROUP BY 1)
SELECT n AS component_size, CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY 1
"""


def sql_kg_pred_stats(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the per-predicate schema statistics: plain grouped
    count + distinct cardinalities over the kg_triples subquery."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples})
SELECT pred, CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
       CAST(count(DISTINCT obj) AS BIGINT) AS n_obj
FROM t GROUP BY 1
"""


def sql_kg_node_types(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the node-type census: per node the sorted distinct
    (side:pred) role set joined by '|', counted per role-set string.
    Built over the kg_triples subquery."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
nr AS (
  SELECT CAST(subj AS VARCHAR) AS node, 's:' || pred AS role FROM t
  UNION
  SELECT CAST(obj AS VARCHAR), 'o:' || pred FROM t
),
rs AS (
  SELECT node, string_agg(role, '|' ORDER BY role) AS roles
  FROM nr GROUP BY node
)
SELECT roles, CAST(count(*) AS BIGINT) AS n_nodes FROM rs GROUP BY 1
"""


def sql_kg_reciprocity(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.reciprocity over the KG edge set:
    fraction of distinct simple directed edges whose reverse also exists
    — the LEFT self-join has multiplicity <= 1 (edges are distinct), so
    the conditional sum counts exactly the reciprocated edges; one
    double divide, 0.0 on empty. Built over the kg_triples oracle
    subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT DISTINCT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR))
SELECT CAST(count(*) AS BIGINT) AS total_edges,
       CAST(COALESCE(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS reciprocated,
       CASE WHEN count(*) = 0 THEN 0.0
            ELSE CAST(COALESCE(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0
                                   END), 0) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) END AS reciprocity
FROM e0 LEFT JOIN e0 r ON r.s = e0.d AND r.d = e0.s
"""


def sql_media_dedup() -> str:
    """Oracle for the media_dedup query (media_near_dups, LSH path,
    pair ids only). The stub feature vector is a pure injective function
    of (kind, media_ref) — see stages/media._decode — so the cos ≥ 0.99
    pair set is EXACTLY the set of distinct span pairs sharing
    (kind, media_ref): identical vectors sit at cos = 1.0 and always
    share every LSH bucket (recall 1 for exact duplicates, no
    approximation for this feature family), while two different md5
    hash vectors never reach 0.99. Span identity mirrors
    media_near_dups: doc_id#offset#media_ref, ordered lexicographically
    (binary collation == Python str compare for this ASCII alphabet)."""
    return f"""{_sql_media_spans_cte()},
sp AS (
  SELECT kind, media_ref,
         doc_id || '#' || CAST("offset" AS VARCHAR) || '#' || media_ref
           AS span_id
  FROM media
)
SELECT a.span_id AS id_a, b.span_id AS id_b
FROM sp a JOIN sp b
  ON a.kind = b.kind AND a.media_ref = b.media_ref
 AND a.span_id < b.span_id
"""


def sql_approx_distinct(p: int = 12) -> str:
    """Oracle for the HyperLogLog approx_distinct query: recomputes the
    SKETCH itself, bit for bit, in SQL — per-row md5 hash
    (md5_number_lower == functions/hashing.md5_hash64), bucket = top p
    bits, register = MAX leading-zero rank of the remaining bits
    (generated integer-threshold CASE, no float log2), harmonic
    denominator as an EXACT HUGEINT Σ 2^(64-reg) with absent buckets
    contributing 2^64, one IEEE divide against the α·m²·2^64 numerator
    embedded verbatim from stages/sketch.hll_numerator, the
    linear-counting branch as m·ln(m/zeros) (the repo's one-libm-ln
    determinism contract), and FLOOR(x+0.5) rounding. Approximate vs
    COUNT(DISTINCT), exact vs the engine."""
    from semantic_search_system_ray.stages.sketch import hll_numerator

    m = 1 << p
    lo = 1 << (64 - p)
    max_rank = 64 - p + 1
    num = repr(hll_numerator(m))
    rank_case = " ".join(
        f"WHEN rest >= {1 << (64 - r)} THEN {r}" for r in range(1, 64 - p + 1)
    )
    contrib_case = " ".join(
        f"WHEN reg = {r} THEN CAST('{1 << (64 - r)}' AS HUGEINT)"
        for r in range(1, max_rank + 1)
    )

    def one(metric: str, col: str) -> str:
        return f"""SELECT '{metric}' AS metric, (
  WITH h0 AS (
    SELECT CAST(md5_number_lower(CAST({col} AS VARCHAR)) AS HUGEINT) AS h
    FROM events WHERE {col} IS NOT NULL
  ),
  rk AS (
    SELECT h // {lo} AS bucket,
           CASE {rank_case} ELSE {max_rank} END AS rnk
    FROM (SELECT h, (h % {lo}) * {1 << p} AS rest FROM h0)
  ),
  reg AS (SELECT bucket, MAX(rnk) AS reg FROM rk GROUP BY bucket),
  s AS (
    SELECT COALESCE(SUM(CASE {contrib_case} END), CAST(0 AS HUGEINT))
             + ({m} - COUNT(*)) * CAST('{1 << 64}' AS HUGEINT) AS intsum,
           {m} - COUNT(*) AS zeros
    FROM reg
  )
  SELECT CAST(FLOOR(
    CASE WHEN {num} / CAST(intsum AS DOUBLE) <= {2.5 * m!r} AND zeros > 0
         THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
         ELSE {num} / CAST(intsum AS DOUBLE) END + 0.5) AS BIGINT)
  FROM s
) AS value"""

    return (
        one("approx_distinct_users", "user_id")
        + "\nUNION ALL\n"
        + one("approx_distinct_event_types", "event_type")
    )


def sql_dedup_spans(n: int) -> str:
    """Oracle for stages/curation.remove_duplicated_spans: tokens covered
    by any cross-document duplicated n-gram are removed; survivors
    string_agg back in position order. Same token regex, gram slices and
    ≥2-distinct-docs rule as the engine; docs with zero surviving tokens
    produce no group on either side."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(ws) AS w,
         unnest(range(0, len(ws))) AS pos
  FROM toks
),
grams AS (
  SELECT doc_id,
         unnest(range(0, len(ws) - {n - 1})) AS pos,
         unnest(list_transform(range(1, len(ws) - {n - 2}),
            i -> array_to_string(ws[CAST(i AS INT):CAST(i + {n - 1} AS INT)],
                                 ' '))) AS g
  FROM toks WHERE len(ws) >= {n}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
cover AS (
  SELECT DISTINCT gr.doc_id, gr.pos + r.o AS pos
  FROM grams gr JOIN dup USING (g)
  CROSS JOIN (SELECT unnest(range(0, {n})) AS o) r
),
kept AS (
  SELECT t.doc_id, t.pos, t.w
  FROM tok t LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
)
SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text
FROM kept GROUP BY doc_id
"""


def sql_kg_kcore(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    k: int = 2,
    rounds: int = 4,
) -> str:
    """Oracle for stages/graph.kcore over the KG edge set: ``rounds``
    unrolled synchronous peel rounds (the same fixed-round contract as
    the engine — extra rounds after convergence are no-ops), chained
    CTEs exactly like sql_kg_pagerank's unrolled iterations. u0 is the
    distinct undirected simple edge set {(a,b): a<b} (binary string
    collation on both sides); each round recomputes integer degrees and
    keeps nodes with deg >= k. Built over the kg_triples oracle
    subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"WITH t AS MATERIALIZED ({triples}),\n",
        "raw AS MATERIALIZED (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d FROM t),\n",
        "u0 AS MATERIALIZED (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b "
        "FROM raw WHERE s <> d)",
    ]
    for r in range(rounds):
        parts.append(
            f""",
d{r} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM u{r} UNION ALL SELECT b AS node FROM u{r}
  ) GROUP BY node
),
n{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
u{r + 1} AS MATERIALIZED (
  SELECT u.a, u.b FROM u{r} u
  JOIN n{r} x ON u.a = x.node
  JOIN n{r} y ON u.b = y.node
)"""
        )
    parts.append(
        f"""
SELECT node AS node_id, CAST(deg AS BIGINT) AS deg FROM (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM u{rounds} UNION ALL SELECT b AS node FROM u{rounds}
  ) GROUP BY node
)"""
    )
    return "".join(parts)


def sql_kg_communities(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    rounds: int = 3,
) -> str:
    """Oracle for stages/graph.label_propagation over the KG edge set:
    ``rounds`` unrolled synchronous label-propagation rounds (the exact
    fixed-round prefix contract — synchronous LPA may oscillate, and
    both sides compute the same prefix). l0 labels every node of the
    distinct undirected simple edge set with its own id; each round
    relabels every node with the most frequent neighbor label, ties to
    the SMALLEST label (DuckDB binary collation = the engine's byte
    order). Chained CTEs stay AS MATERIALIZED like sql_kg_kcore — each
    l{r} is referenced once per round, but materializing pins the plan.
    Built over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"WITH t AS MATERIALIZED ({triples}),\n",
        "raw AS MATERIALIZED (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d FROM t),\n",
        "u0 AS MATERIALIZED (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b "
        "FROM raw WHERE s <> d),\n",
        "adj AS MATERIALIZED (SELECT a AS node, b AS other FROM u0 "
        "UNION ALL SELECT b AS node, a AS other FROM u0),\n",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj)",
    ]
    for r in range(rounds):
        parts.append(
            f""",
l{r + 1} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label, row_number() OVER (
      PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM (
      SELECT e.node AS node, l.label AS label, count(*) AS c
      FROM adj e JOIN l{r} l ON l.node = e.other
      GROUP BY e.node, l.label
    )
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"\nSELECT node AS node_id, label AS community FROM l{rounds}"
    )
    return "".join(parts)


def sql_kg_hits(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    rounds: int = 3,
    scale: int = 1_000_000,
) -> str:
    """Oracle for stages/graph.hits over the KG edge set: ``rounds``
    unrolled synchronous hub/authority rounds, chained CTEs like
    sql_kg_pagerank / sql_kg_kcore. e0 is the DISTINCT directed simple
    edge set (parallel edges and self-loops dropped); a0 = ``scale`` for
    every endpoint node; each round is hub-sum → max-normalize →
    auth-sum → max-normalize, every step floor arithmetic on
    non-negative BIGINTs (DuckDB ``//`` truncates; all operands
    non-negative, so truncation == the engine's floor). The per-round
    SUM is cast back to BIGINT before the ``· scale``, keeping both
    sides in int64 range (bound documented on the engine). CTEs stay AS
    MATERIALIZED — the kcore lesson: DuckDB otherwise inlines the
    chained references and the plan grows exponentially in rounds.
    Built over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"WITH t AS MATERIALIZED ({triples}),\n",
        "raw AS MATERIALIZED (SELECT CAST(subj AS VARCHAR) AS s, "
        "CAST(obj AS VARCHAR) AS d FROM t),\n",
        "e AS MATERIALIZED (SELECT DISTINCT s, d FROM raw WHERE s <> d),\n",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT s AS node FROM e UNION ALL SELECT d AS node FROM e)),\n",
        f"a0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS v "
        "FROM nodes)",
    ]
    for r in range(rounds):
        parts.append(
            f""",
hr{r} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(x.sv, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.s AS node, SUM(a.v) AS sv
    FROM e JOIN a{r} a ON a.node = e.d GROUP BY e.s
  ) x ON x.node = n.node
),
h{r + 1} AS MATERIALIZED (
  SELECT node, CAST((v * {scale}) // (SELECT MAX(v) FROM hr{r}) AS BIGINT) AS v
  FROM hr{r}
),
ar{r} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(x.sv, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.d AS node, SUM(h.v) AS sv
    FROM e JOIN h{r + 1} h ON h.node = e.s GROUP BY e.d
  ) x ON x.node = n.node
),
a{r + 1} AS MATERIALIZED (
  SELECT node, CAST((v * {scale}) // (SELECT MAX(v) FROM ar{r}) AS BIGINT) AS v
  FROM ar{r}
)"""
        )
    parts.append(
        f"""
SELECT h.node AS node_id, h.v AS hub, a.v AS auth
FROM h{rounds} h JOIN a{rounds} a ON a.node = h.node"""
    )
    return "".join(parts)


def sql_kg_katz(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    rounds: int = 4,
    scale: int = 1_000_000,
    alpha_inv: int = 4,
) -> str:
    """Oracle for stages/graph.katz over the KG edge set: ``rounds``
    unrolled synchronous Katz rounds, chained CTEs like sql_kg_hits.
    e is the DISTINCT directed simple edge set; x0 = ``scale`` for
    every endpoint node; each round is in-neighbor sum → max-normalized
    attenuation + restart, every step floor arithmetic on non-negative
    BIGINTs (DuckDB ``//`` truncates; operands non-negative, so
    truncation == the engine's floor). CTEs stay AS MATERIALIZED — the
    kcore lesson: DuckDB otherwise inlines chained references and the
    plan grows exponentially in rounds. Built over the kg_triples
    oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"WITH t AS MATERIALIZED ({triples}),\n",
        "raw AS MATERIALIZED (SELECT CAST(subj AS VARCHAR) AS s, "
        "CAST(obj AS VARCHAR) AS d FROM t),\n",
        "e AS MATERIALIZED (SELECT DISTINCT s, d FROM raw WHERE s <> d),\n",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT s AS node FROM e UNION ALL SELECT d AS node FROM e)),\n",
        f"x0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS v "
        "FROM nodes)",
    ]
    for r in range(rounds):
        parts.append(
            f""",
xr{r} AS MATERIALIZED (
  SELECT n.node, CAST(COALESCE(m.sv, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.d AS node, SUM(x.v) AS sv
    FROM e JOIN x{r} x ON x.node = e.s GROUP BY e.d
  ) m ON m.node = n.node
),
x{r + 1} AS MATERIALIZED (
  SELECT node, CAST({scale} + (v * {scale})
         // ({alpha_inv} * (SELECT MAX(v) FROM xr{r})) AS BIGINT) AS v
  FROM xr{r}
)"""
        )
    parts.append(
        f"""
SELECT node AS node_id, v AS katz FROM x{rounds}"""
    )
    return "".join(parts)


def sql_kg_ppr(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    iterations: int = 5,
    scale: int = 1_000_000,
    k: int = 20,
) -> str:
    """Oracle for PERSONALIZED stages/graph.pagerank (seeds = the
    HAS_TOPIC objects, i.e. the topic nodes): the same unrolled integer
    recurrence as sql_kg_pagerank but the restart mass (BASE) lands only
    on seed nodes and pr0 is ``scale`` on seeds, 0 elsewhere. All floor
    integer arithmetic — bit-identical to the engine's seeded variant."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    base_scaled = (100 - 85) * scale // 100
    ctes = []
    for i in range(1, iterations + 1):
        ctes.append(f"""pr{i} AS (
  SELECT n.node_id,
         CAST(CASE WHEN n.node_id IN (SELECT node_id FROM seeds)
                   THEN {base_scaled} ELSE 0 END
              + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node_id, sum(p.pr // o.od) AS m
    FROM e JOIN pr{i - 1} p ON p.node_id = e.src
           JOIN od o ON o.src = e.src
    GROUP BY e.dst) s ON s.node_id = n.node_id)""")
    chain = ",\n".join(ctes)
    return f"""
WITH t AS ({triples}),
e AS (SELECT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst FROM t),
od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
nodes AS (SELECT src AS node_id FROM e UNION SELECT dst FROM e),
seeds AS (SELECT DISTINCT CAST(obj AS VARCHAR) AS node_id FROM t
          WHERE pred = 'HAS_TOPIC'),
pr0 AS (SELECT node_id,
               CAST(CASE WHEN node_id IN (SELECT node_id FROM seeds)
                         THEN {scale} ELSE 0 END AS BIGINT) AS pr
        FROM nodes),
{chain}
SELECT node_id, pr FROM pr{iterations}
ORDER BY pr DESC, node_id LIMIT {k}
"""


def sql_dedup_incremental(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
) -> str:
    """DuckDB oracle for stages/dedup.minhash_incremental over the
    documents table, split deterministically into INDEXED
    (md5_number_lower('inc-' || doc_id) % 10 < 7 — the engine's
    functions.hashing.md5_hash64 on the same string) and INCOMING docs:
    the shared sig/band prefix (_sql_minhash_sig_band — one source of
    truth with sql_minhash_clusters), per-bucket (incoming →
    bucket-min indexed) star candidates, the same signature-equality
    verification, min verified match per incoming doc, LEFT join back
    onto every incoming doc. No transitive closure — incremental
    semantics reports a direct verified match or 'novel'."""
    prefix = _sql_minhash_sig_band(num_perm, bands, shingle_k, seed)
    return f"""
WITH {prefix},
side AS (
  SELECT d, (md5_number_lower('inc-' || d) % 10) < 7 AS indexed FROM doc
),
bucket_old AS (
  SELECT b.band, b.band_hash, min(b.d) AS old_min
  FROM band b JOIN side s ON s.d = b.d AND s.indexed
  GROUP BY b.band, b.band_hash
),
cand AS (
  SELECT DISTINCT b.d AS src, o.old_min AS dst
  FROM band b
  JOIN side s ON s.d = b.d AND NOT s.indexed
  JOIN bucket_old o ON o.band = b.band AND o.band_hash = b.band_hash
),
edge AS (
  SELECT c.src, c.dst
  FROM cand c
  JOIN sig sa ON sa.d = c.src
  JOIN sig sb ON sb.d = c.dst
  WHERE CAST(len(list_filter(generate_series(1, {num_perm}),
                             i -> sa.slv[i] = sb.slv[i])) AS DOUBLE)
        / {num_perm} >= {threshold}
),
dup AS (SELECT src AS d, min(dst) AS dup_of FROM edge GROUP BY src)
SELECT s.d AS doc_id,
       CASE WHEN du.dup_of IS NULL THEN 'novel' ELSE 'dup' END AS status,
       coalesce(du.dup_of, '') AS dup_of
FROM side s LEFT JOIN dup du ON du.d = s.d
WHERE NOT s.indexed
"""


def sql_kg_clustering(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for stages/graph.clustering_coefficient over the KG edge
    set: triangles via the 3-way self-join (same CTE shape as
    sql_kg_triangles), wedges = Σ C(deg, 2) over the symmetrized simple
    edges, global_cc = one mirrored CAST/CAST double divide of the two
    exact BIGINTs. Built over the kg_triples oracle subquery."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
tri AS (
  SELECT count(*) AS tri
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
w AS (SELECT CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT)
        AS wedges FROM deg)
SELECT CAST(tri.tri AS BIGINT) AS triangles, w.wedges,
       CASE WHEN w.wedges = 0 THEN 0.0
            ELSE CAST(3 * tri.tri AS DOUBLE) / CAST(w.wedges AS DOUBLE)
       END AS global_cc
FROM tri, w
"""


def sql_search_rrf(
    query_tokens: list[str],
    *,
    k: int = 20,
    k_rrf: int = 60,
    scale: int = 10 ** 12,
) -> str:
    """Oracle for pipelines/search.search_rrf: the two ranking oracles
    (sql_bm25, sql_search_lexical — same query, same k) wrapped as
    derived tables, ranks re-derived by the shared (score DESC, doc_id)
    order, integer floor contributions scale // (k_rrf + rank) summed
    per doc, top-k by (rrf_score DESC, doc_id)."""
    bm = sql_bm25(query_tokens, k)
    lex = sql_search_lexical(query_tokens, k)
    return f"""
WITH bm AS (SELECT * FROM ({bm})),
lex AS (SELECT * FROM ({lex})),
bmr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bm
),
lexr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM lex
),
contrib AS (
  SELECT doc_id, CAST({scale} // ({k_rrf} + r) AS BIGINT) AS c FROM bmr
  UNION ALL
  SELECT doc_id, CAST({scale} // ({k_rrf} + r) AS BIGINT) AS c FROM lexr
),
fused AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score
  FROM contrib GROUP BY doc_id
)
SELECT ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS "rank",
       doc_id, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {k}
"""


def sql_media_duration_quantiles() -> str:
    """Oracle for the per-kind media duration quantiles: the shared
    media-spans CTE + the stub n_chunks metadata (1 + md5 % max_chunks,
    identical to media_frame_sample's), quantile_disc per kind — all
    integers."""
    from semantic_search_system_ray.stages.media import MEDIA_MAX_CHUNKS

    return f"""{_sql_media_spans_cte()},
dur AS (
  SELECT kind, CAST(1 + md5_number_lower(
           kind || ':' || media_ref || ':dur') % {MEDIA_MAX_CHUNKS}
         AS BIGINT) AS n_chunks
  FROM media
)
SELECT kind,
       unnest([0.5, 0.9]) AS q,
       unnest(quantile_disc(n_chunks, [0.5, 0.9])) AS chunks
FROM dur GROUP BY kind
"""


def sql_kg_conflicts(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    k: int = 20,
) -> str:
    """Oracle for the KG cardinality-violation audit: per predicate the
    ``k`` worst multi-valued subjects (distinct-object fanout DESC,
    subj ASC — subj is unique within the group, so the cut is total),
    each carrying its sorted '|'-joined object list. Built over the
    kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
d AS (
  SELECT DISTINCT pred, CAST(subj AS VARCHAR) AS subj,
         CAST(obj AS VARCHAR) AS obj
  FROM t
),
g AS (
  SELECT pred, subj, CAST(count(*) AS BIGINT) AS n_obj,
         string_agg(obj, '|' ORDER BY obj) AS objs
  FROM d GROUP BY 1, 2 HAVING count(*) > 1
),
r AS (
  SELECT pred, subj, n_obj, objs,
         row_number() OVER (PARTITION BY pred
                            ORDER BY n_obj DESC, subj) AS rn
  FROM g
)
SELECT pred, subj, n_obj, objs FROM r WHERE rn <= {k}
"""


def sql_kg_walk_pairs(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    steps: int = 3,
    window: int = 2,
    salt: str = "walk",
) -> str:
    """Oracle for the skip-gram co-occurrence table over the
    deterministic walk corpus: the full sql_kg_walks query nested as
    ONE materialized CTE, self-joined on walk id with |step delta| <=
    ``window`` — exactly the (center, context) pair emission word2vec
    trains on."""
    walks = sql_kg_walks(
        gazetteer, taxonomy, phrase_list, steps=steps, salt=salt
    )
    return f"""
WITH w AS MATERIALIZED ({walks})
SELECT a.node AS center, b.node AS context, CAST(count(*) AS BIGINT) AS n
FROM w a
JOIN w b ON a.walk_id = b.walk_id AND a.step <> b.step
        AND abs(a.step - b.step) <= {window}
GROUP BY 1, 2
"""


def sql_kg_path_transit(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    radius: int = 4,
) -> str:
    """Oracle for the s-t shortest-path TRANSIT counts (the integer
    Brandes pair-dependency numerator): two suffixed copies of the
    sql_kg_sigma layer stack — forward from the smallest HAS_TOPIC
    object, forward from the largest (the graph is undirected, so the
    reverse sigma IS a forward run from t) — joined on the nodes where
    ds + dt equals the s-t distance; transit = sigma_s * sigma_t, all
    int64. Nodes farther than ``radius`` from either endpoint fall out
    of both engines identically (documented truncation)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    parts = [
        f"""WITH RECURSIVE t AS ({triples}),
e AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS src, CAST(obj AS VARCHAR) AS dst
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
es AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
seed_s AS (
  SELECT min(CAST(obj AS VARCHAR)) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC'
),
seed_t AS (
  SELECT max(CAST(obj AS VARCHAR)) AS node_id FROM t
  WHERE pred = 'HAS_TOPIC'
)"""
    ]
    for sfx in ("s", "t"):
        parts.append(
            f""",
reach_{sfx}(node_id, dist) AS (
  SELECT node_id, 0 FROM seed_{sfx}
  UNION
  SELECT es.dst, r.dist + 1
  FROM reach_{sfx} r JOIN es ON es.src = r.node_id
  WHERE r.dist < {radius}
),
mind_{sfx} AS (SELECT node_id, min(dist) AS d FROM reach_{sfx} GROUP BY 1),
s0_{sfx} AS (SELECT node_id, CAST(1 AS BIGINT) AS sigma FROM seed_{sfx})"""
        )
        for r in range(1, radius + 1):
            parts.append(
                f""",
s{r}_{sfx} AS (
  SELECT mv.node_id, CAST(sum(sp.sigma) AS BIGINT) AS sigma
  FROM mind_{sfx} mv
  JOIN es ON es.dst = mv.node_id
  JOIN mind_{sfx} mu ON mu.node_id = es.src AND mu.d = {r - 1}
  JOIN s{r - 1}_{sfx} sp ON sp.node_id = es.src
  WHERE mv.d = {r}
  GROUP BY 1
)"""
            )
        selects = [
            f"SELECT node_id, CAST(0 AS BIGINT) AS dist, sigma FROM s0_{sfx}"
        ]
        for r in range(1, radius + 1):
            selects.append(
                f"SELECT node_id, CAST({r} AS BIGINT) AS dist, sigma "
                f"FROM s{r}_{sfx}"
            )
        parts.append(
            f""",
sig_{sfx} AS (
{chr(10).join('  ' + s if i == 0 else 'UNION ALL ' + s
              for i, s in enumerate(selects))}
)"""
        )
    parts.append(
        """
SELECT a.node_id, a.dist AS ds, b.dist AS dt,
       CAST(a.sigma * b.sigma AS BIGINT) AS n_paths
FROM sig_s a JOIN sig_t b ON a.node_id = b.node_id
WHERE a.dist + b.dist = (
  SELECT d FROM mind_s
  WHERE node_id = (SELECT node_id FROM seed_t)
)"""
    )
    return "".join(parts)


def sql_minhash_calibration(
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
) -> str:
    """Oracle for stages/dedup.minhash_calibration: the shared sig/band
    prefix (_sql_minhash_sig_band — one source of truth with the
    clustering and incremental twins), the clustering pipeline's star
    candidate pairs, then per pair the signature match count (exact
    integer bin = matches·10 // num_perm) against the TRUE shingle-set
    intersection/union, pooled per bin as two exact BIGINT sums and one
    trailing divide. Zero-shingle docs have no ``shing`` rows → size 0,
    matching the engine's empty-set lengths."""
    prefix = _sql_minhash_sig_band(num_perm, bands, shingle_k, seed)
    return f"""
WITH {prefix},
cand AS (
  SELECT DISTINCT b1.d AS src, m.mn AS dst
  FROM band b1
  JOIN (SELECT band, band_hash, min(d) AS mn, count(*) AS n
        FROM band GROUP BY band, band_hash) m
    USING (band, band_hash)
  WHERE m.n >= 2 AND b1.d <> m.mn
),
m AS (
  SELECT c.src, c.dst,
         CAST(len(list_filter(generate_series(1, {num_perm}),
                              i -> sa.slv[i] = sb.slv[i])) AS BIGINT)
           AS matches
  FROM cand c
  JOIN sig sa ON sa.d = c.src
  JOIN sig sb ON sb.d = c.dst
),
sizes AS (SELECT d, CAST(count(*) AS BIGINT) AS sz FROM shing GROUP BY 1),
ints AS (
  SELECT c.src, c.dst, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN shing a ON a.d = c.src
  JOIN shing b ON b.d = c.dst AND b.s = a.s
  GROUP BY 1, 2
),
pairs AS (
  SELECT m.matches * 10 // {num_perm} AS est_bin,
         COALESCE(i.i, 0) AS inter,
         COALESCE(za.sz, 0) + COALESCE(zb.sz, 0) - COALESCE(i.i, 0) AS un
  FROM m
  LEFT JOIN ints i ON i.src = m.src AND i.dst = m.dst
  LEFT JOIN sizes za ON za.d = m.src
  LEFT JOIN sizes zb ON zb.d = m.dst
)
SELECT est_bin, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(inter) AS BIGINT) AS sum_inter,
       CAST(sum(un) AS BIGINT) AS sum_union,
       CASE WHEN sum(un) = 0 THEN 0.0
            ELSE floor(CAST(sum(inter) AS DOUBLE)
                       / CAST(sum(un) AS DOUBLE) * 1000000 + 0.5) / 1000000
       END AS pooled_jaccard
FROM pairs GROUP BY 1
"""


def sql_kg_entity_provenance(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the per-entity PROVENANCE profile: MENTIONS triples
    (doc → entity) joined back to the documents table's source column,
    then per entity the supporting-doc count, distinct-source count and
    the dominant source (count DESC, source ASC — total order). Built
    over the kg_triples oracle subquery (one source of truth)."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
m AS (
  SELECT CAST(subj AS VARCHAR) AS d, CAST(obj AS VARCHAR) AS entity
  FROM t WHERE pred = 'MENTIONS'
),
j AS (
  SELECT m.entity, doc.source
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.d
),
per AS (
  SELECT entity, source, CAST(count(*) AS BIGINT) AS n
  FROM j GROUP BY 1, 2
),
ranked AS (
  SELECT entity, source, n,
         row_number() OVER (PARTITION BY entity
                            ORDER BY n DESC, source) AS rn
  FROM per
),
agg AS (
  SELECT entity, CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM per GROUP BY 1
)
SELECT a.entity, a.n_docs, a.n_sources,
       r.source AS top_source, r.n AS top_source_docs
FROM agg a JOIN ranked r ON r.entity = a.entity AND r.rn = 1
"""


def sql_kg_rich_club(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
    *,
    thresholds: tuple = (2, 4, 8, 16),
) -> str:
    """Oracle for the rich-club coefficients over the KG's undirected
    simple graph: for each degree threshold k, the node/edge counts of
    the deg>k induced subgraph and phi = 2·E/(N·(N−1)), one mirrored
    floor(x·1e6+0.5) divide; thresholds with N < 2 drop on both sides.
    Built over the kg_triples oracle subquery."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    ks = ", ".join(str(int(k)) for k in thresholds)
    return f"""
WITH t AS ({triples}),
e0 AS (
  SELECT DISTINCT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
  FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)
),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS dg
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY 1
),
ks AS (SELECT unnest([{ks}]) AS k),
nk AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
  FROM ks JOIN deg ON dg > k GROUP BY 1
),
ek AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_edges
  FROM ks
  JOIN e ON TRUE
  JOIN deg da ON da.node = e.a
  JOIN deg db ON db.node = e.b
  WHERE da.dg > k AND db.dg > k
  GROUP BY 1
)
SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes,
       COALESCE(ek.n_edges, 0) AS n_edges,
       floor(2.0 * CAST(COALESCE(ek.n_edges, 0) AS DOUBLE)
             / (CAST(nk.n_nodes AS DOUBLE)
                * CAST(nk.n_nodes - 1 AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes >= 2
"""


def sql_kg_curated_triples(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the CURATED flagship: the exact kg_triples matcher SQL
    (one source of truth — sql_kg_triples with its corpus relation
    swapped) over only the documents the curation funnel keeps
    (queries.SQL_CURATION_E2E nested as a materialized CTE, stage =
    'kept'). The RELATES_TO_DOC branch follows the filter automatically
    because it joins the same doc CTE."""
    from semantic_search_system_ray.pipelines.queries import SQL_CURATION_E2E

    prelude = f"""cur AS MATERIALIZED ({SQL_CURATION_E2E}),
docs_kept AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN cur ON cur.doc_id = d.doc_id
  WHERE cur.stage = 'kept'
),
"""
    return sql_kg_triples(
        gazetteer, taxonomy, phrase_list,
        docs_relation="docs_kept", prelude=prelude,
    )


def sql_kg_curation_diff(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the curation IMPACT report on the KG: per predicate,
    how many triples the full corpus asserts, how many survive when the
    KG is built only from curation-kept docs, and how many drop — the
    two matcher SQLs (full + curated, one source of truth) EXCEPT'd and
    folded per predicate."""
    full = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    cur = sql_kg_curated_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH full_t AS MATERIALIZED ({full}),
cur_t AS MATERIALIZED ({cur}),
dropped AS (
  SELECT pred FROM (
    SELECT subj, pred, obj FROM full_t
    EXCEPT
    SELECT subj, pred, obj FROM cur_t
  )
)
SELECT f.pred,
       CAST(count(*) AS BIGINT) AS n_full,
       CAST(count(*) AS BIGINT) - COALESCE(d.n_dropped, 0) AS n_curated,
       COALESCE(d.n_dropped, 0) AS n_dropped
FROM full_t f
LEFT JOIN (
  SELECT pred, CAST(count(*) AS BIGINT) AS n_dropped
  FROM dropped GROUP BY 1
) d USING (pred)
GROUP BY f.pred, d.n_dropped
"""


def sql_grouped_approx_distinct(
    col: str = "user_id", group_col: str = "event_type", p: int = 12
) -> str:
    """Oracle for stages/sketch.grouped_approx_distinct over events: the
    sql_approx_distinct register/estimator machinery with the group
    column carried through — per (group, bucket) MAX rank, per-group
    exact HUGEINT harmonic sum, the same two estimator branches and
    FLOOR(x+0.5)."""
    from semantic_search_system_ray.stages.sketch import hll_numerator

    m = 1 << p
    lo = 1 << (64 - p)
    max_rank = 64 - p + 1
    num = repr(hll_numerator(m))
    rank_case = " ".join(
        f"WHEN rest >= {1 << (64 - r)} THEN {r}" for r in range(1, 64 - p + 1)
    )
    contrib_case = " ".join(
        f"WHEN reg = {r} THEN CAST('{1 << (64 - r)}' AS HUGEINT)"
        for r in range(1, max_rank + 1)
    )
    return f"""
WITH h0 AS (
  SELECT CAST({group_col} AS VARCHAR) AS g,
         CAST(md5_number_lower(CAST({col} AS VARCHAR)) AS HUGEINT) AS h
  FROM events WHERE {col} IS NOT NULL AND {group_col} IS NOT NULL
),
rk AS (
  SELECT g, h // {lo} AS bucket,
         CASE {rank_case} ELSE {max_rank} END AS rnk
  FROM (SELECT g, h, (h % {lo}) * {1 << p} AS rest FROM h0)
),
reg AS (SELECT g, bucket, MAX(rnk) AS reg FROM rk GROUP BY 1, 2),
s AS (
  SELECT g,
         COALESCE(SUM(CASE {contrib_case} END), CAST(0 AS HUGEINT))
           + ({m} - COUNT(*)) * CAST('{1 << 64}' AS HUGEINT) AS intsum,
         {m} - COUNT(*) AS zeros
  FROM reg GROUP BY g
)
SELECT g AS {group_col},
       CAST(FLOOR(
         CASE WHEN {num} / CAST(intsum AS DOUBLE) <= {2.5 * m!r}
                   AND zeros > 0
              THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
              ELSE {num} / CAST(intsum AS DOUBLE) END + 0.5) AS BIGINT)
         AS approx_distinct
FROM s
"""


def sql_kg_comention_pmi(
    gazetteer: dict[str, str],
    taxonomy: dict[str, list[str]],
    phrase_list: list[str],
) -> str:
    """Oracle for the entity-association PMI table: pointwise mutual
    information per co-mentioned entity pair, ln((n_ab·N)/(n_a·n_b))
    from four exact integers with one mirrored double divide + ln,
    floor(x·1e6+0.5)-rounded (the zipf/entropy libm contract). Built
    over the kg_triples oracle subquery."""
    triples = sql_kg_triples(gazetteer, taxonomy, phrase_list)
    return f"""
WITH t AS ({triples}),
m AS (SELECT DISTINCT CAST(subj AS VARCHAR) AS doc,
                      CAST(obj AS VARCHAR) AS ent
      FROM t WHERE pred = 'MENTIONS'),
pairs AS (
  SELECT m1.ent AS a, m2.ent AS b, CAST(count(*) AS BIGINT) AS n_ab
  FROM m m1 JOIN m m2 ON m1.doc = m2.doc AND m1.ent < m2.ent
  GROUP BY 1, 2
),
ec AS (SELECT ent, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT doc) AS BIGINT) AS nn FROM m)
SELECT p.a AS ent_a, p.b AS ent_b, p.n_ab AS n_docs,
       floor(ln(CAST(p.n_ab * tot.nn AS DOUBLE)
                / CAST(ea.n * eb.n AS DOUBLE)) * 1000000 + 0.5) / 1000000
         AS pmi
FROM pairs p
JOIN ec ea ON ea.ent = p.a
JOIN ec eb ON eb.ent = p.b
CROSS JOIN tot
"""
