"""Mergeable approximate aggregates — HyperLogLog distinct counting.

The reference has no sketches (SURVEY §2.5 notes none), but a
training-data engine at 10^12 rows needs cardinality WITHOUT a
corpus-sized distinct shuffle: HLL registers are a fixed 2^p bytes per
BLOCK, merge by elementwise max, and the whole reduction moves ~KB
regardless of input size. Deterministic (blake2b row hashes, no RNG) so
re-runs agree.

Estimator: standard HLL with the linear-counting small-range correction
(Flajolet et al. 2007; the bias thresholds follow the paper's published
constants — public knowledge).

Since r3 the row hash is md5 (functions/hashing.md5_hash64 == DuckDB
``md5_number_lower``) and the harmonic denominator is an EXACT integer
sum (Σ 2^(64-reg) instead of an order-dependent float Σ 2^-reg), so the
whole estimate — registers, both estimator branches, final rounding —
is bit-recomputable in plain SQL (text_oracles.sql_approx_distinct) and
the sketch sits on the driver's hash gate despite being approximate
with respect to COUNT(DISTINCT)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.functions.hashing import md5_hash64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_register_batch(batch: pa.Table, col: str, p: int) -> pa.Table:
    """One input block → one row holding the block's 2^p HLL registers
    (uint8 bytes). The combiner: everything after this moves ~2^p bytes
    per block, never per row."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    # NULLs are skipped (SQL COUNT(DISTINCT) semantics; the oracle's
    # md5(CAST(x AS VARCHAR)) is NULL for NULL rows and drops out too)
    vals = [v for v in batch.column(col).to_pylist() if v is not None]
    if vals:
        idx, rank = _hll_ranks(
            np.array([md5_hash64(str(v)) for v in vals], dtype=np.uint64), p
        )
        np.maximum.at(regs, idx, rank)
    return pa.Table.from_pydict({"regs": pa.array([regs.tobytes()], pa.binary())})


def _hll_ranks(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket index, leading-one rank) per hash — the shared register
    kernel of the global and grouped sketches."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rank = position of the first 1-bit in the remaining bits (1-based);
    # all-zero rest → max rank (64 - p + 1)
    rank = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
    found = np.zeros(len(hashes), dtype=bool)
    for r in range(1, 64 - p + 1):
        bit = (rest >> np.uint64(64 - r)) & np.uint64(1)
        hit = (~found) & (bit == 1)
        rank[hit] = r
        found |= hit
    return idx, rank


def hll_merge(parts: list[bytes], p: int) -> np.ndarray:
    m = 1 << p
    out = np.zeros(m, dtype=np.uint8)
    for b in parts:
        out = np.maximum(out, np.frombuffer(b, dtype=np.uint8))
    return out


def hll_numerator(m: int) -> float:
    """α·m²·2^64 as ONE Python double — the same constant is embedded
    verbatim (repr) in the SQL oracle so both sides perform the single
    identical IEEE divide by the exact integer denominator."""
    return _alpha(m) * m * m * (2.0 ** 64)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    # EXACT integer harmonic denominator: Σ 2^(64-reg) over all m
    # registers (reg=0 contributes 2^64) — order-independent, arbitrary
    # precision, so the estimate is bit-reproducible at any block layout
    # and recomputable by the SQL oracle (a float Σ 2^-reg would be
    # summation-order-dependent)
    counts = np.bincount(regs.astype(np.int64))
    intsum = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    est = hll_numerator(m) / float(intsum)
    if est <= 2.5 * m:
        zeros = int(counts[0]) if len(counts) else 0
        if zeros:
            est = m * math.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col). Per-block registers (combiner) →
    driver merge of #blocks × 4 KB partials (bounded by block count, not
    rows). Standard error ≈ 1.04/√(2^p) ≈ 1.6% at p=12."""
    parts = ds.map_batches(
        hll_register_batch, batch_format="pyarrow", fn_kwargs=dict(col=col, p=p)
    ).take_all()
    regs = hll_merge([r["regs"] for r in parts], p)
    # floor(x+0.5), not round(): Python round() is banker's; the SQL
    # twin is CAST(FLOOR(x+0.5) AS BIGINT) — identical in all run modes
    return int(math.floor(hll_estimate(regs) + 0.5))


def _quantile_rank(q: float, n: int) -> int:
    """Exact 1-based rank for the quantile_disc rule ceil(q*n): float
    multiply overshoots by one whenever q*n lands an ulp above an
    integer (e.g. 0.55*100 = 55.000...01 → ceil 56, but DuckDB returns
    the 55th element). Convert q through its DECIMAL string so the rank
    is computed in exact integer arithmetic."""
    from fractions import Fraction

    fq = Fraction(str(q))
    return max(int(-(-fq.numerator * n // fq.denominator)), 1)


def exact_quantiles_histogram(
    ds, col: str, qs: list[float], *, scale: int = 100
):
    """EXACT distributed quantiles for fixed-precision numeric columns —
    the bounded-cardinality trick: values scale to integers (default
    cents), per-block Arrow ``group_by().count()`` histograms combine
    into one global histogram whose size is the DISTINCT-VALUE count
    (bounded by the value domain, NOT the row count — ~10^4 cells for a
    2dp metric regardless of 10^12 rows), and quantiles read off the
    cumulative counts on the driver. Matches DuckDB ``quantile_disc``:
    element at index ceil(q·n) − 1 of the sorted multiset.

    Returns a list of (q, value) tuples; value = cell/scale as one
    float division (same double both engine- and oracle-side)."""

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column(col), float(scale))), pa.int64()
        )
        t2 = pa.Table.from_pydict({"cell": cents})
        out = t2.group_by(["cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["cell", "n"])

    parts = ds.map_batches(hist, batch_format="pyarrow")
    merged = parts.groupby("cell").sum("n")
    rows = merged.take_all()  # bounded by the VALUE DOMAIN, not row count
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    counts = np.array([r["sum(n)"] for r in rows], dtype=np.int64)
    order = np.argsort(cells)
    cells, counts = cells[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append((q, None))
            continue
        target = _quantile_rank(q, n)
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append((q, cells[idx] / float(scale)))
    return out


def exact_quantiles_histogram_multi(
    ds, cols: list[str], qs: list[float], *, scale: int = 100
):
    """Fused multi-column variant of ``exact_quantiles_histogram``:
    per-block (dim, cell, n) histograms for ALL requested columns in ONE
    streaming pass, ONE coarse combine (bounded by the SUM of the value
    domains — still domain-bounded, never row-bounded), per-column
    quantiles off the driver-side cumulative counts. Same
    ``quantile_disc`` rank rule and the same single cell/scale float
    division as the single-column helper, so results are bit-identical
    to calling it per column — at one pass + one shuffle instead of
    |cols| of each (rfm_segments' three threshold passes measured
    ~3x the one fused pass). Returns {col: [(q, value), ...]}."""

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    hist_schema = pa.schema(
        [("dim", pa.int64()), ("cell", pa.int64()), ("n", pa.int64())]
    )

    def hist(t: pa.Table) -> pa.Table:
        parts = []
        for i, col in enumerate(cols):
            cents = pc.cast(
                pc.round(pc.multiply(t.column(col), float(scale))), pa.int64()
            )
            g = pa.Table.from_pydict({"cell": cents}).group_by(
                ["cell"]
            ).aggregate([("cell", "count")])
            parts.append(
                pa.Table.from_pydict(
                    {
                        "dim": pa.nulls(g.num_rows, pa.int64()).fill_null(i),
                        "cell": g.column("cell").combine_chunks(),
                        "n": pc.cast(g.column("cell_count"), pa.int64()),
                    },
                    schema=hist_schema,
                )
            )
        return pa.concat_tables(parts)

    def sum_cells(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return hist_schema.empty_table()
        agg = df.groupby(["dim", "cell"], sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(
            agg, schema=hist_schema, preserve_index=False
        )

    merged = coarse_partition_apply(
        ds.map_batches(hist, batch_format="pyarrow"),
        ["dim", "cell"], sum_cells, hist_schema,
    )
    rows = merged.take_all()  # bounded by the SUM of value domains
    dims = np.array([r["dim"] for r in rows], dtype=np.int64)
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    counts = np.array([r["n"] for r in rows], dtype=np.int64)
    out: dict[str, list] = {}
    for i, col in enumerate(cols):
        m = dims == i
        c, cnt = cells[m], counts[m]
        order = np.argsort(c)
        c, cnt = c[order], cnt[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1]) if len(cum) else 0
        res = []
        for q in qs:
            if n == 0:
                res.append((q, None))
                continue
            target = _quantile_rank(q, n)
            idx = int(np.searchsorted(cum, target, side="left"))
            res.append((q, c[idx] / float(scale)))
        out[col] = res
    return out


def exact_grouped_quantiles_histogram(
    ds, group_col: str, col: str, qs: list[float], *, scale: int = 100
):
    """Per-GROUP exact quantiles, same bounded-cardinality histogram trick
    as ``exact_quantiles_histogram``: per-block (group, cell) count
    histograms → one global groupby over |groups|·|value domain| cells →
    per-group cumulative counts on the driver (bounded by domain size,
    not row count). Returns a pyarrow-ready dict of columns
    (group, q, value)."""

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column(col), float(scale))), pa.int64()
        )
        t2 = pa.Table.from_pydict({"g": t.column(group_col), "cell": cents})
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    parts = ds.map_batches(hist, batch_format="pyarrow")
    merged = parts.groupby(["g", "cell"]).sum("n")
    rows = merged.take_all()  # |groups| x |value domain| — bounded
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append((r["cell"], r["sum(n)"]))
    out_g, out_q, out_v = [], [], []
    # null group sorts last (Ray's groupby keeps the None key, matching
    # SQL GROUP BY's NULL group — plain sorted() would TypeError on it)
    for g in sorted(by_g, key=lambda x: (x is None, x)):
        cells = np.array([c for c, _ in by_g[g]], dtype=np.int64)
        counts = np.array([n for _, n in by_g[g]], dtype=np.int64)
        order = np.argsort(cells)
        cells, counts = cells[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for q in qs:
            target = _quantile_rank(q, n)
            idx = int(np.searchsorted(cum, target, side="left"))
            out_g.append(g)
            out_q.append(q)
            out_v.append(cells[idx] / float(scale))
    return {"group": out_g, "q": out_q, "value": out_v}


def grouped_hll_register_batch(
    batch: pa.Table, col: str, group_col: str, p: int
) -> pa.Table:
    """One input block → one (group, regs) row PER GROUP present in the
    block — the grouped combiner: downstream movement is
    groups × blocks × 2^p bytes, never per row."""
    m = 1 << p
    groups = batch.column(group_col).to_pylist()
    vals = batch.column(col).to_pylist()
    pairs = [(g, v) for g, v in zip(groups, vals)
             if g is not None and v is not None]
    out_g, out_r = [], []
    if pairs:
        import pandas as pd

        df = pd.DataFrame({"g": [g for g, _v in pairs],
                           "h": np.array(
                               [md5_hash64(str(v)) for _g, v in pairs],
                               dtype=np.uint64)})
        for g, sub in df.groupby("g", sort=False):
            regs = np.zeros(m, dtype=np.uint8)
            idx, rank = _hll_ranks(
                sub["h"].to_numpy().astype(np.uint64), p
            )
            np.maximum.at(regs, idx, rank)
            out_g.append(str(g))
            out_r.append(regs.tobytes())
    return pa.Table.from_pydict(
        {"group": pa.array(out_g, pa.string()),
         "regs": pa.array(out_r, pa.binary())}
    )


def grouped_approx_distinct(
    ds: rd.Dataset, col: str, group_col: str, *, p: int = 12
) -> pa.Table:
    """Approximate per-group COUNT(DISTINCT col) — the grouped HLL: one
    streaming pass of per-block per-group registers, a driver merge
    bounded by groups × blocks × 4 KB (group domain must be bounded —
    event types, languages, sources; corpus-cardinality groups belong
    in an exact grouped distinct). Same md5 registers, exact-integer
    harmonic sum, estimator branches and floor(x+0.5) rounding as the
    global sketch, so the whole table is SQL-recomputable
    (text_oracles.sql_grouped_approx_distinct)."""
    parts = ds.map_batches(
        grouped_hll_register_batch, batch_format="pyarrow",
        fn_kwargs=dict(col=col, group_col=group_col, p=p),
    ).take_all()
    by_g: dict[str, list[bytes]] = {}
    for r in parts:
        by_g.setdefault(r["group"], []).append(r["regs"])
    gs = sorted(by_g)
    ests = [
        int(math.floor(hll_estimate(hll_merge(by_g[g], p)) + 0.5))
        for g in gs
    ]
    return pa.Table.from_pydict(
        {group_col: pa.array(gs, pa.string()),
         "approx_distinct": pa.array(ests, pa.int64())}
    )
