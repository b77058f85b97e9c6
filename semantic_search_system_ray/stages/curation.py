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
    any match. The benchmark set broadcasts once via ray.put."""
    bench = frozenset(benchmark_ngrams)
    ref = ray.put(bench)

    class _Check:
        def __init__(self):
            self.bench = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, n_matched = [], []
            for i, t in zip(
                batch.column(id_col).to_pylist(),
                batch.column(text_col).to_pylist(),
            ):
                toks = [w.lower() for w in tokenize(t or "")]
                grams = {
                    " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
                }
                ids.append(str(i))
                n_matched.append(len(grams & self.bench))
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.string()),
                    "n_matched": pa.array(n_matched, pa.int64()),
                    "contaminated": pa.array([m > 0 for m in n_matched]),
                }
            )

    return ds.map_batches(_Check, batch_format="pyarrow", concurrency=(1, 4))
