"""Exact top-k heavy hitters via a Misra–Gries two-pass — the
streaming-sketch answer to "most frequent items" when the item domain is
too large to shuffle (full-vocabulary groupby = an all-to-all exchange
whose volume is the distinct-item count; a web corpus has billions).

Classic algorithm (Misra & Gries 1982; summary MERGEABILITY per
Agarwal et al. 2012 — both public knowledge):

1. each block builds a capacity-m MG summary (≤ m counters; when full,
   all decrement), carrying its EXACT decrement count d_b (the true
   per-summary undercount bound, tighter than N_b/(m+1));
2. summaries tree-merge DISTRIBUTEDLY (fan-in 64): per level, counters
   sum by key and trim back to capacity by subtracting the (m+1)-th
   largest value t (the standard mergeable-summary step), accumulating
   err += t — at web scale a flat driver union would move
   #blocks × (m+1) rows; the tree moves ≤ 1/64 per level and the driver
   sees ≤ 64 summaries. Any item with true global count > Σ err
   survives the merged summary;
3. exact second pass counts ONLY the ≤ m surviving candidates
   (broadcast set, one combiner row per (block, candidate)) → exact
   counts, top-k;
4. **exactness certificate**: the k-th candidate's exact count must
   exceed the accumulated error (the max count any non-candidate could
   hide). If it doesn't — or fewer than k candidates exist — the
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
    [("word", pa.string()), ("est", pa.int64()), ("err", pa.int64())]
)

_MERGE_FAN_IN = 64


def tokens_lower(t: pa.Table, col: str) -> list[str]:
    out: list[str] = []
    for txt in t.column(col).to_pylist():
        out.extend(_WORD_RE.findall((txt or "").lower()))
    return out


def mg_summary(tokens: list[str], m: int) -> tuple[Counter, int]:
    """Capacity-m Misra–Gries summary of ``tokens`` →
    (counters, decrement count d). Any item's true count within the
    stream is undercounted by AT MOST d (each decrement-all step costs
    every item at most 1)."""
    c: Counter[str] = Counter()
    d = 0
    for w in tokens:
        if w in c or len(c) < m:
            c[w] += 1
        else:
            d += 1
            # decrement-all step; drop zeros
            dead = []
            for key in c:
                c[key] -= 1
                if c[key] == 0:
                    dead.append(key)
            for key in dead:
                del c[key]
    return c, d


def _summary_table(c: Counter, err: int) -> pa.Table:
    words = list(c.keys()) + [None]
    ests = [int(v) for v in c.values()] + [0]
    errs = [0] * len(c) + [int(err)]  # sentinel row carries the error
    return pa.Table.from_pydict(
        {"word": words, "est": ests, "err": errs}, schema=_SUMMARY_SCHEMA
    )


def _merge_summaries(t: pa.Table, m: int) -> tuple[Counter, int]:
    """Mergeable-summaries step (Agarwal et al. 2012): sum counters by
    key, then trim back to ≤ m entries by subtracting the (m+1)-th
    largest value; the subtraction adds exactly that much to the
    undercount bound."""
    c: Counter[str] = Counter()
    err = 0
    for w, est, e in zip(t.column("word").to_pylist(),
                         t.column("est").to_pylist(),
                         t.column("err").to_pylist()):
        if w is None:
            err += int(e)
        else:
            c[w] += int(est)
    if len(c) > m:
        cut = sorted(c.values(), reverse=True)[m]  # (m+1)-th largest
        err += cut
        c = Counter({w: v - cut for w, v in c.items() if v > cut})
    return c, err


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
        c, d = mg_summary(tokenize(t, col), capacity)
        return _summary_table(c, d)

    def merge_batch(t: pa.Table) -> pa.Table:
        return _summary_table(*_merge_summaries(t, capacity))

    # distributed fan-in tree: the driver never sees more than
    # _MERGE_FAN_IN summaries no matter how many input blocks exist
    # materialize() pins each level: count() on a lazy Dataset would
    # re-run the whole tokenize+MG pass once per fan-in level plus the
    # final take_all (ADVICE r3) — same reason pagerank pins its edges.
    parts = ds.map_batches(summarize, batch_format="pyarrow").materialize()
    n_rows = parts.count()
    max_rows = _MERGE_FAN_IN * (capacity + 1)
    while n_rows > max_rows:
        parts = (
            parts.repartition(max(1, (n_rows + max_rows - 1) // max_rows))
            .map_batches(merge_batch, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        n_rows = parts.count()
    merged, total_err = _merge_summaries(
        pa.Table.from_pylist(parts.take_all(), schema=_SUMMARY_SCHEMA),
        capacity,
    )
    candidates = set(merged.keys())

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
