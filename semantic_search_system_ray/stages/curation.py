"""Corpus-curation operators a large-scale training-data pipeline needs
beyond the reference's own surface: deterministic stratified sampling
(corpus rebalancing) and benchmark decontamination. Both are stateless
``map_batches`` filters — embarrassingly parallel, no shuffle — with
md5-based decisions so each has an exact DuckDB oracle
(pipelines/text_oracles.sql_stratified_sample / sql_contamination).

- **stratified_sample**: per-stratum keep rates (e.g. downsample the
  dominant language: the classic data-mixture rebalance). Keep decision =
  md5_hash64(key:id) % 1e6 < rate·1e6 — a pure function of the row, so
  the sample is reproducible, resumable (re-running a failed shard keeps
  the same rows), and joinable across pipelines. Never random(): a real
  10^12-doc run must sample identically on retry.
- **contamination_check**: flag documents sharing word n-grams with a
  broadcast benchmark set (decontamination against eval suites, à la
  GPT-3/PaLM n-gram overlap checks). The benchmark set is the SMALL side:
  ray.put once, read per actor — never shuffled.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd

from semantic_search_system_ray.functions.hashing import md5_hash64
from semantic_search_system_ray.functions.text import tokenize

SAMPLE_MOD = 1_000_000


def sample_thresholds(rates: dict[str, float]) -> dict[str, int]:
    """rate → integer threshold (rate·1e6, floor) — computed ONCE so the
    engine and the generated SQL literal agree exactly."""
    return {k: int(v * SAMPLE_MOD) for k, v in rates.items()}


def stratified_sample(
    ds: rd.Dataset,
    *,
    key_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> rd.Dataset:
    """Keep each row iff md5_hash64(f"{key}:{id}") % 1e6 < rate(key)·1e6.
    Deterministic per row; strata not in ``rates`` use ``default_rate``."""
    thresholds = sample_thresholds(rates)
    default_thr = int(default_rate * SAMPLE_MOD)

    def keep(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch.column(key_col).to_pylist()]
        ids = [str(v) for v in batch.column(id_col).to_pylist()]
        mask = pa.array(
            [
                md5_hash64(f"{k}:{i}") % SAMPLE_MOD
                < thresholds.get(k, default_thr)
                for k, i in zip(keys, ids)
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# Sentinel wrapped around every token by benchmark_gram_matches. \x01 can
# never be part of a TOKEN (not \w, can't be glued by '), so replacing it
# with ' ' first never changes the token sequence — it only guarantees the
# canonical form has no ambient sentinels.
_GRAM_SENTINEL = "\x01"
# Must mirror functions/text._RE_TOKEN and text_oracles._TOKEN_RE_SQL —
# evaluated by Arrow's RE2, the same engine as DuckDB's regexp functions,
# so \w is ASCII on BOTH sides (Python re's unicode \w is NOT the twin).
_TOKEN_RE_RAW = r"\w+(?:'\w+)?"


def benchmark_gram_matches(
    text: pa.ChunkedArray | pa.Array, grams: list[str], *, n: int = 3
):
    """→ bool ndarray (len(text), len(grams)): grams[j] occurs as n
    CONSECUTIVE tokens of ``lower(text[i])`` under the oracle's RE2
    token regex. Fully vectorized — one RE2 rewrite pass canonicalizes
    the token stream (each token wrapped in \\x01 sentinels), then one
    RE2 containment scan per benchmark gram; no per-doc Python.

    Exactness argument: a gram w1..wn is in the doc's n-gram set iff the
    canonical form contains \\x01w1\\x01 [no-sentinel run] \\x01w2\\x01 …
    — the no-sentinel separator run is exactly "no other token between
    them". Grams whose token count ≠ n are all-False (the SQL twin joins
    n-token gram strings only, which can never equal a k≠n-token string)."""
    import re as _re

    import numpy as np
    import pyarrow.compute as pc

    clean = pc.replace_substring(
        pc.utf8_lower(pc.fill_null(text, "")),
        pattern=_GRAM_SENTINEL,
        replacement=" ",
    )
    canon = pc.replace_substring_regex(
        clean,
        pattern=f"({_TOKEN_RE_RAW})",
        replacement=_GRAM_SENTINEL + r"\1" + _GRAM_SENTINEL,
    )
    cols = []
    for g in grams:
        toks = g.split(" ")
        if len(toks) != n:
            cols.append(np.zeros(len(text), np.bool_))
            continue
        pat = "[^\x01]*".join(
            "\x01" + _re.escape(t) + "\x01" for t in toks
        )
        cols.append(
            pc.match_substring_regex(canon, pattern=pat)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
    return np.column_stack(cols) if cols else np.zeros((len(text), 0), np.bool_)


def contamination_check(
    ds: rd.Dataset,
    benchmark_ngrams: list[str],
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """→ (doc_id, n_matched, contaminated): per doc, how many DISTINCT
    benchmark word n-grams occur in the doc's n-gram set; contaminated =
    any match. The benchmark set broadcasts once via ray.put; matching is
    the vectorized RE2 kernel (benchmark_gram_matches) — no per-doc
    tokenize/set-build Python in the hot path."""
    bench = sorted(set(benchmark_ngrams))
    ref = ray.put(bench)

    class _Check:
        def __init__(self):
            self.bench = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = benchmark_gram_matches(batch.column(text_col), self.bench, n=n)
            n_matched = m.sum(axis=1).astype("int64")
            return pa.Table.from_pydict(
                {
                    "doc_id": pc.cast(batch.column(id_col), pa.string()),
                    "n_matched": pa.array(n_matched, pa.int64()),
                    "contaminated": pa.array(n_matched > 0),
                }
            )

    return ds.map_batches(_Check, batch_format="pyarrow", concurrency=(1, 4))


def repetition_score(
    ds: rd.Dataset,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Gopher-style intra-document repetition metric: the fraction of
    word n-gram OCCURRENCES that are repeats of an earlier n-gram in the
    same doc — ``rep_ratio = 1 - distinct/total`` (0 for docs shorter
    than n tokens). High values flag boilerplate/spammy docs; compose
    with the quality gate. Doc-local → shuffle-free. The ratio is ONE
    integer division (no rounding), so the engine and the SQL oracle
    produce bit-identical doubles."""

    def score(batch: pa.Table) -> pa.Table:
        ids, total, distinct, ratio = [], [], [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            toks = [w.lower() for w in tokenize(t or "")]
            tot = max(len(toks) - n + 1, 0)
            dis = len({" ".join(toks[j : j + n]) for j in range(tot)})
            ids.append(str(i))
            total.append(tot)
            distinct.append(dis)
            ratio.append(1.0 - dis / tot if tot else 0.0)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.string()),
                "n_grams": pa.array(total, pa.int64()),
                "n_distinct": pa.array(distinct, pa.int64()),
                "rep_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def cross_doc_ngram_dups(
    ds: rd.Dataset,
    *,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Cross-document duplicated-substring detection (the self-corpus
    counterpart of ``contamination_check``, à la Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better": find
    text spans that recur ACROSS documents). Per doc: how many of its
    distinct word n-grams also occur in ≥1 OTHER doc, and the duplicated
    fraction — the boilerplate/near-copy signal that drives span-level
    dedup decisions.

    Shape: per-doc distinct n-grams (doc-local combiner — lean
    (gram, doc) rows) → ONE coarse shuffle keyed by gram (a gram's full
    posting lands in one partition, so "appears in ≥2 docs" is
    partition-local) emitting per-doc PARTIAL counts → one coarse sum
    keyed by doc. Docs too short for any n-gram ride a zero row. The
    fraction is one int→double division (bit-equal to the SQL oracle,
    pipelines/text_oracles.sql_cross_doc_dups)."""
    import numpy as np
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    pair_schema = pa.schema([("g", pa.string()), ("doc_id", pa.string())])
    partial_schema = pa.schema(
        [("doc_id", pa.string()), ("tg", pa.int64()), ("sg", pa.int64())]
    )
    out_schema = pa.schema(
        [("doc_id", pa.string()), ("n_grams", pa.int64()),
         ("n_shared", pa.int64()), ("dup_frac", pa.float64())]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        gs, ids = [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            toks = [w.lower() for w in tokenize(t or "")]
            d = str(i)
            for g in {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}:
                gs.append(g)
                ids.append(d)
        return pa.Table.from_pydict(
            {"g": pa.array(gs, pa.string()), "doc_id": pa.array(ids, pa.string())},
            schema=pair_schema,
        )

    def per_gram(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return partial_schema.empty_table()
        # rows are distinct (gram, doc): per-gram row count == doc count
        nd = df.groupby("g", sort=False)["doc_id"].transform("size")
        agg = (
            pd.DataFrame(
                {"doc_id": df["doc_id"], "s": (nd >= 2).to_numpy().astype(np.int64)}
            )
            .groupby("doc_id", sort=False)
            .agg(tg=("s", "size"), sg=("s", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, schema=partial_schema, preserve_index=False)

    partials = coarse_partition_apply(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["g"], per_gram, partial_schema, num_partitions=num_partitions,
    )

    def zeros(batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch.column(id_col).to_pylist()]
        z = pa.nulls(len(ids), pa.int64()).fill_null(0)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), z, z], schema=partial_schema
        )

    def final(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = (
            df.groupby("doc_id", sort=False)
            .agg(n_grams=("tg", "sum"), n_shared=("sg", "sum"))
            .reset_index()
        )
        tg = agg["n_grams"].to_numpy().astype(np.int64)
        sg = agg["n_shared"].to_numpy().astype(np.int64)
        frac = np.where(tg > 0, sg / np.maximum(tg, 1), 0.0)
        return pa.Table.from_pydict(
            {"doc_id": agg["doc_id"].to_numpy(), "n_grams": tg,
             "n_shared": sg, "dup_frac": frac},
            schema=out_schema,
        )

    return coarse_partition_apply(
        partials.union(ds.map_batches(zeros, batch_format="pyarrow")),
        ["doc_id"], final, out_schema, num_partitions=num_partitions,
    )


def build_inverted_index(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> rd.Dataset:
    """Materialize a term → postings inverted index: (term, df, postings)
    with postings = ','-joined doc ids in ascending STRING order — the
    search-system core the reference delegates to OpenSearch (S14), here
    a first-class Dataset materialization.

    Shape: per-block DISTINCT (term, doc) pairs (the combiner — a
    stopword term collapses to ≤1 row per block per doc, never one per
    occurrence), then ONE coarse partition pass per term hash builds the
    posting strings fully vectorized (sort + group offsets + Arrow list
    join — same zero-copy pattern as the KG adjacency store).
    ``min_df``/``max_df`` drop too-rare/too-common terms (at web scale a
    stopword posting row is corpus-sized; cap it out explicitly)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    def pairs(batch: pa.Table) -> pa.Table:
        terms, docs = [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            d = str(i)
            for w in set(tokenize((t or "").lower())):
                terms.append(w)
                docs.append(d)
        t2 = pa.Table.from_pydict(
            {"term": pa.array(terms, pa.string()), "d": pa.array(docs, pa.string())}
        )
        return t2.group_by(["term", "d"]).aggregate([])  # block-local distinct

    out_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
    )

    def build(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.drop_duplicates(["term", "d"]).sort_values(
            ["term", "d"], kind="mergesort"
        )
        terms = df["term"].to_numpy()
        starts = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
        offsets = np.r_[starts, len(terms)].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(df["d"].to_numpy(), pa.string()),
        )
        dfreq = np.diff(offsets).astype(np.int64)
        keep = dfreq >= min_df
        if max_df is not None:
            keep &= dfreq <= max_df
        return pa.Table.from_arrays(
            [pa.array(terms[starts], pa.string()),
             pa.array(dfreq, pa.int64()),
             pc.binary_join(lists, ",")],
            schema=out_schema,
        ).filter(pa.array(keep))

    return coarse_partition_apply(
        ds.map_batches(pairs, batch_format="pyarrow"), ["term"], build, out_schema
    )


def remove_duplicated_spans(
    ds: rd.Dataset,
    *,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Span-level self-dedup TRANSFORM (Lee et al. 2021 applied, not just
    scored): REMOVE every token covered by a word n-gram that occurs in
    ≥2 distinct documents, and emit the cleaned text — the actual
    dedup-the-training-data operation downstream of
    ``cross_doc_ngram_dups``'s signal.

    Shape (two shuffles, both combiner-fed):
    1. per doc: token rows (doc, pos, w) + ALL n-gram occurrence rows
       (gram, doc, pos);
    2. gram-keyed cogroup: a gram's full posting is partition-local, so
       "≥2 distinct docs" decides there; flagged occurrences explode into
       (doc, covered-pos) rows — n per occurrence, vectorized np.repeat;
    3. doc-keyed cogroup: tokens anti-merged against cover positions,
       survivors re-joined in position order.

    Output (doc_id VARCHAR, clean_text): lowercased surviving tokens
    joined by ' ' (both engine and oracle tokenize identically, so the
    join is exact); docs whose every token is covered — or with no
    tokens at all — emit no row, mirroring the SQL group-by."""
    import numpy as np
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    gram_schema = pa.schema(
        [("g", pa.string()), ("doc_id", pa.string()), ("pos", pa.int64())]
    )
    tok_schema = pa.schema(
        [("doc_id", pa.string()), ("pos", pa.int64()), ("w", pa.string())]
    )
    cover_schema = pa.schema(
        [("doc_id", pa.string()), ("pos", pa.int64())]
    )
    union_schema = pa.schema(
        [("doc_id", pa.string()), ("pos", pa.int64()), ("w", pa.string())]
    )
    out_schema = pa.schema(
        [("doc_id", pa.string()), ("clean_text", pa.string())]
    )

    def toks_of(batch: pa.Table):
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            yield str(i), [w.lower() for w in tokenize(t or "")]

    def tok_rows(batch: pa.Table) -> pa.Table:
        ids, poss, ws = [], [], []
        for d, toks in toks_of(batch):
            ids.extend([d] * len(toks))
            poss.extend(range(len(toks)))
            ws.extend(toks)
        return pa.Table.from_pydict(
            {"doc_id": ids, "pos": poss, "w": ws}, schema=tok_schema
        )

    def gram_rows(batch: pa.Table) -> pa.Table:
        gs, ids, poss = [], [], []
        for d, toks in toks_of(batch):
            for j in range(len(toks) - n + 1):
                gs.append(" ".join(toks[j:j + n]))
                ids.append(d)
                poss.append(j)
        return pa.Table.from_pydict(
            {"g": gs, "doc_id": ids, "pos": poss}, schema=gram_schema
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")

    def per_gram(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return cover_schema.empty_table()
        nd = df.groupby("g", sort=False)["doc_id"].transform("nunique")
        hit = df[nd >= 2]
        if hit.empty:
            return cover_schema.empty_table()
        ids = np.repeat(hit["doc_id"].to_numpy(), n)
        pos = np.repeat(hit["pos"].to_numpy(np.int64), n) + np.tile(
            np.arange(n, dtype=np.int64), len(hit)
        )
        return pa.Table.from_pydict(
            {"doc_id": ids.tolist(), "pos": pos}, schema=cover_schema
        )

    cover = coarse_partition_apply(
        grams, ["g"], per_gram, cover_schema, num_partitions=num_partitions
    )

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")
    combined = toks.union(
        cover.map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc_id": t.column("doc_id"), "pos": t.column("pos"),
                 "w": pa.nulls(t.num_rows, pa.string())},  # null w = cover
                schema=union_schema,
            ),
            batch_format="pyarrow",
        )
    )

    def per_doc(df: pd.DataFrame) -> pa.Table:
        tk = df[df["w"].notna()]
        cv = df[df["w"].isna()][["doc_id", "pos"]].drop_duplicates()
        if not cv.empty:
            m = tk.merge(cv, on=["doc_id", "pos"], how="left", indicator=True)
            tk = m[m["_merge"] == "left_only"]
        if tk.empty:
            return out_schema.empty_table()
        tk = tk.sort_values(["doc_id", "pos"], kind="mergesort")
        agg = tk.groupby("doc_id", sort=False)["w"].agg(" ".join).reset_index()
        return pa.Table.from_pydict(
            {"doc_id": agg["doc_id"], "clean_text": agg["w"]},
            schema=out_schema,
        )

    return coarse_partition_apply(
        combined, ["doc_id"], per_doc, out_schema,
        num_partitions=num_partitions,
    )


# --------------------------------------------------------------------------
# near-dup-cluster-aware curation: leakage-free splits + best-quality
# representative selection
# --------------------------------------------------------------------------

LF_SPLIT_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("cluster", pa.string()),
     ("split", pa.string())]
)


def leakage_free_split(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    train_pct: int = 8,
    salt: str = "lfsplit",
) -> rd.Dataset:
    """Train/val split that can NEVER leak a near-duplicate across the
    boundary: MinHash-LSH clusters first (stages/dedup), then the split
    decision hashes the CLUSTER label — md5_hash64(salt-cluster) % 10 —
    so an entire near-dup family lands on one side (hashing doc_id, as
    plain train_split does, puts paraphrases of one document in both
    train and val: the classic eval-contamination bug). Deterministic,
    resumable, and a pure function of content → the same corpus always
    splits the same way. Output: (doc_id, cluster, split)."""
    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters

    clusters = minhash_lsh_clusters(
        ds, text_col=text_col, id_col=id_col, threshold=threshold
    )

    def assign(t: pa.Table) -> pa.Table:
        cl = t.column("cluster").to_pylist()
        memo: dict[str, str] = {}
        split = []
        for c in cl:
            s = memo.get(c)
            if s is None:
                s = memo[c] = (
                    "train"
                    if md5_hash64(f"{salt}-{c}") % 10 < train_pct else "val"
                )
            split.append(s)
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "cluster": t.column("cluster"),
             "split": pa.array(split, pa.string())},
            schema=LF_SPLIT_SCHEMA,
        )

    return clusters.map_batches(assign, batch_format="pyarrow")


BEST_REP_SCHEMA = pa.schema(
    [("cluster", pa.string()), ("kept_doc", pa.string()),
     ("quality", pa.float64())]
)


def cluster_best_representative(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Quality-aware near-dup collapse: per MinHash-LSH cluster keep the
    HIGHEST-quality member (stages/textstats.QualityScore composite; tie
    → lexicographically smallest doc_id), not the arbitrary min-id
    representative corpus_near_clean keeps — the curation policy real
    training pipelines want ("of these 9 mirrors, keep the cleanest").
    Output: (cluster, kept_doc, quality), one row per cluster, singletons
    included.

    Shape: the cluster pass and ONE quality pass over the corpus, a
    coarse attach of quality onto (doc_id, cluster), then a per-cluster
    argmax cogroup — no driver materialization anywhere."""
    import pandas as pd

    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.stages.textstats import QualityScore
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    clusters = minhash_lsh_clusters(
        ds, text_col=text_col, id_col=id_col, threshold=threshold
    )
    quality = ds.map_batches(
        QualityScore, concurrency=(1, 4), batch_size=4096,
        batch_format="pyarrow",
    ).select_columns(["doc_id", "quality"])

    joined_schema = pa.schema(
        [("doc_id", pa.string()), ("cluster", pa.string()),
         ("quality", pa.float64())]
    )
    joined = coarse_attach(
        clusters, quality, left_key="doc_id", right_key="doc_id",
        attach_cols=["quality"], out_schema=joined_schema,
        num_partitions=num_partitions, how="inner",
    )

    def argmax_part(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return BEST_REP_SCHEMA.empty_table()
        best = (
            df.sort_values(["cluster", "quality", "doc_id"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("cluster", sort=False)
            .head(1)
        )
        return pa.Table.from_pydict(
            {"cluster": best["cluster"], "kept_doc": best["doc_id"],
             "quality": best["quality"]},
            schema=BEST_REP_SCHEMA,
        )

    return coarse_partition_apply(
        joined, ["cluster"], argmax_part, BEST_REP_SCHEMA,
        num_partitions=num_partitions,
    )
