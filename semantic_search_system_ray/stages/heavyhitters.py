"""Exact top-k heavy hitters via a Misra–Gries two-pass — the
streaming-sketch answer to "most frequent items" when the item domain is
too large to shuffle (full-vocabulary groupby = an all-to-all exchange
whose volume is the distinct-item count; a web corpus has billions).

Classic algorithm (Misra & Gries 1982, public knowledge):

1. each block builds a capacity-m MG summary (≤ m counters; when full,
   all decrement — per-block undercount ≤ floor(N_b/(m+1)));
2. summaries → driver (#blocks × (m+1) lean rows, independent of the
   domain size); candidate set = union of summary keys. Any item with
   true global count > Σ_b floor(N_b/(m+1)) MUST survive in ≥1 summary;
3. exact second pass counts ONLY the candidates (broadcast set, one
   combiner row per (block, candidate)) → exact counts, top-k;
4. **exactness certificate**: the k-th candidate's exact count must
   exceed the summed MG error bound (the max count any non-candidate
   could hide). If it doesn't — or fewer than k candidates exist — the
   operator LOUDLY falls back to the exact full groupby.

The output is therefore always EXACT (SQL-oracle-comparable); the sketch
only bounds the shuffle, never the answer.

Reference parity note: the reference's word statistics are driver-side
Counters over 3k docs (`nlp/topic_modeling.py`); this stage is part of
the beyond-reference scale suite (SURVEY §2.11).
"""

from __future__ import annotations

import logging
import re
from collections import Counter
from typing import Callable

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

logger = logging.getLogger(__name__)

_WORD_RE = re.compile(r"\w+")

_SUMMARY_SCHEMA = pa.schema(
    [("word", pa.string()), ("est", pa.int64()), ("toks", pa.int64())]
)


def tokens_lower(t: pa.Table, col: str) -> list[str]:
    out: list[str] = []
    for txt in t.column(col).to_pylist():
        out.extend(_WORD_RE.findall((txt or "").lower()))
    return out


def mg_summary(tokens: list[str], m: int) -> tuple[Counter, int]:
    """Capacity-m Misra–Gries summary of ``tokens`` → (counters, n)."""
    c: Counter[str] = Counter()
    for w in tokens:
        if w in c or len(c) < m:
            c[w] += 1
        else:
            # decrement-all step; drop zeros
            dead = []
            for key in c:
                c[key] -= 1
                if c[key] == 0:
                    dead.append(key)
            for key in dead:
                del c[key]
    return c, len(tokens)


def heavy_hitters(
    ds: rd.Dataset,
    *,
    col: str,
    k: int = 20,
    capacity: int = 512,
    tokenize: Callable[[pa.Table, str], list[str]] = tokens_lower,
) -> pa.Table:
    """→ the EXACT (word, cnt) top-k (cnt DESC, word ASC) of the
    tokenized ``col``, computed with domain-independent shuffle volume
    when the certificate holds; see module docstring."""

    def summarize(t: pa.Table) -> pa.Table:
        c, n = mg_summary(tokenize(t, col), capacity)
        words = list(c.keys()) + [None]
        ests = [int(v) for v in c.values()] + [0]
        toks = [0] * len(c) + [n]  # sentinel row carries the block size
        return pa.Table.from_pydict(
            {"word": words, "est": ests, "toks": toks},
            schema=_SUMMARY_SCHEMA,
        )

    rows = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    candidates = {r["word"] for r in rows if r["word"] is not None}
    total_err = sum(
        r["toks"] // (capacity + 1) for r in rows if r["word"] is None
    )

    def topk_of(counter_of: Callable[[pa.Table], Counter]) -> "pd.DataFrame":
        def count_batch(t: pa.Table) -> pa.Table:
            c = counter_of(t)
            return pa.Table.from_pydict(
                {"word": pa.array(list(c.keys()), pa.string()),
                 "cnt": pa.array([int(v) for v in c.values()], pa.int64())}
            )

        return (
            ds.map_batches(count_batch, batch_format="pyarrow")
            .groupby("word")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .sort(["cnt", "word"], descending=[True, False])
            .limit(k)
            .to_pandas()
        )

    def as_table(top) -> pa.Table:
        return pa.Table.from_pydict(
            {"word": top["word"].tolist(),
             "cnt": top["cnt"].astype("int64").tolist()},
            schema=pa.schema([("word", pa.string()), ("cnt", pa.int64())]),
        )

    if len(candidates) >= k:
        cand_ref = ray.put(frozenset(candidates))

        def cand_counter(t: pa.Table) -> Counter:
            cand = ray.get(cand_ref)  # once per batch, local object store
            return Counter(w for w in tokenize(t, col) if w in cand)

        top = topk_of(cand_counter)
        if len(top) == k and int(top["cnt"].iloc[-1]) > total_err:
            return as_table(top)

    # certificate failed: a non-candidate could outrank the k-th — run
    # the exact full groupby instead (correctness over shuffle savings)
    logger.warning(
        "heavy_hitters certificate failed (candidates=%d, err_bound=%d); "
        "falling back to full exact groupby", len(candidates), total_err,
    )
    return as_table(topk_of(lambda t: Counter(tokenize(t, col))))
