"""Edge-case semantics for the round-3 relational additions:
- late_suppliers (TPC-H Q21 shape): the EXISTS / NOT-EXISTS decorrelation
  must count per late LINE and only in sole-late-supplier multi-supplier
  orders.
- events_mad: middle-pair medians must agree with a direct numpy
  reference on both odd and even group sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _write(tmp_path, name, df):
    df.to_parquet(tmp_path / f"{name}.parquet")


def test_late_suppliers_q21_semantics(ray_session, tmp_path):
    base = pd.Timestamp("2020-01-01")
    late = base + pd.Timedelta(days=90)   # > 60 days after orderdate
    ontime = base + pd.Timedelta(days=10)
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [1, 1, 1, 1],
        "o_orderstatus": ["F"] * 4,
        "o_totalprice": [1.0] * 4,
        "o_orderdate": [base] * 4,
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    # order 1: supp 10 late twice, supp 20 on time  -> supp 10 counts 2
    # order 2: both supp 10 and 20 late             -> nobody (two late)
    # order 3: supp 10 alone and late               -> nobody (single supp)
    # order 4: supp 30 late once, supp 20 on time   -> supp 30 counts 1
    li = pd.DataFrame({
        "l_orderkey":  [1, 1, 1, 2, 2, 3, 4, 4],
        "l_suppkey":   [10, 10, 20, 10, 20, 10, 30, 20],
        "l_shipdate":  [late, late, ontime, late, late, late, late, ontime],
    })
    supplier = pd.DataFrame({
        "s_suppkey": [10, 20, 30],
        "s_name": ["Supp#10", "Supp#20", "Supp#30"],
        "s_nationkey": [0, 0, 0],
        "s_acctbal": [0.0, 0.0, 0.0],
    })
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    _write(tmp_path, "supplier", supplier)

    from semantic_search_system_ray.pipelines.queries import q_late_suppliers

    rows = q_late_suppliers(str(tmp_path)).take_all()
    got = [(r["s_name"], r["numwait"]) for r in rows]
    assert got == [("Supp#10", 2), ("Supp#30", 1)]


def test_events_mad_matches_numpy(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    frames = []
    eid = 0
    for etype, n in [("a", 101), ("b", 100)]:  # odd and even group sizes
        vals = np.round(rng.uniform(-50, 50, size=n), 2)
        frames.append(pd.DataFrame({
            "event_id": np.arange(eid, eid + n),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": etype,
            "value": vals,
            "props": "{}",
        }))
        eid += n
    ev = pd.concat(frames, ignore_index=True)
    _write(tmp_path, "events", ev)

    from semantic_search_system_ray.pipelines.queries import q_events_mad

    out = q_events_mad(str(tmp_path)).to_pandas().set_index("event_type")
    for etype in ["a", "b"]:
        cents = np.round(
            ev.loc[ev.event_type == etype, "value"].to_numpy() * 100
        ).astype(np.int64)
        med = np.median(cents) / 100.0
        mad = np.median(np.abs(cents - np.median(cents))) / 100.0
        assert out.loc[etype, "n"] == len(cents)
        assert abs(out.loc[etype, "median_value"] - med) < 1e-9
        assert abs(out.loc[etype, "mad"] - mad) < 1e-9


def test_fifo_match_allocations(ray_session, tmp_path):
    """Grants [100, 50] consumed FIFO by purchases [30, 80, 60]:
    p1←g1:30, p2←g1:70 + g2:10, p3←g2:40 (the final 20 is unfunded and
    emits nothing). Equal-ts rows order by event_id."""
    ts = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "event_id":  [1, 2, 3, 4, 5],
        "ts":        [ts, ts, ts, ts, ts],  # all equal → event_id order
        "user_id":   [7, 7, 7, 7, 7],
        "event_type": ["signup", "signup", "purchase", "purchase", "purchase"],
        "value":     [1.00, 0.50, 0.30, 0.80, 0.60],
        "props":     ["{}"] * 5,
    })
    _write(tmp_path, "events", ev)

    from semantic_search_system_ray.pipelines.queries import q_fifo_match

    rows = q_fifo_match(str(tmp_path)).take_all()
    got = sorted((r["grant_id"], r["purchase_id"], r["matched_cents"])
                 for r in rows)
    assert got == [(1, 3, 30), (1, 4, 70), (2, 4, 10), (2, 5, 40)]


def test_user_trailing_sum_equal_ts_peers(ray_session, tmp_path):
    """SQL RANGE CURRENT ROW includes ALL equal-ts peers — including ones
    that sort AFTER the current row (pandas rolling and ROWS frames both
    get this wrong)."""
    t0 = pd.Timestamp("2024-01-01 12:00:00")
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": [t0, t0, t0, t0 + pd.Timedelta(minutes=11)],
        "user_id": [5, 5, 5, 5],
        "event_type": ["view"] * 4,
        "value": [0.01, 0.02, 0.03, 0.50],
        "props": ["{}"] * 4,
    })
    _write(tmp_path, "events", ev)

    from semantic_search_system_ray.pipelines.queries import q_user_trailing_sum

    got = {r["event_id"]: r["trail_cents"]
           for r in q_user_trailing_sum(str(tmp_path)).take_all()}
    # the three equal-ts rows each see all three peers (1+2+3 cents);
    # the row 11 minutes later is outside the 10-minute frame of them all
    assert got == {1: 6, 2: 6, 3: 6, 4: 50}


def test_user_trailing_sum_overflow_fallback_parity(ray_session, tmp_path):
    """A 40-year span times >4k users per partition overflows the int64
    composite; the per-user segment fallback must agree with a direct
    pandas reference."""
    rng = np.random.RandomState(13)
    n = 40_000
    # 280-year span × ~2.5k users per coarse partition → u_count·span
    # ≈ 2e19 > 2^62 in EVERY partition, so the composite fast path is
    # rejected and the per-user segment fallback runs throughout
    base = pd.Timestamp("1678-01-01").value // 1000
    span = int(280 * 365.25 * 24 * 3600 * 1e6)
    users = rng.randint(0, 20_000, size=n)
    ts = base + rng.randint(0, span, size=n)
    # plant clusters so some windows are non-trivial
    ts[: n // 4] = base + rng.randint(0, 10**9, size=n // 4)
    vals = np.round(rng.uniform(0.01, 5.0, size=n), 2)
    ev = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": users,
        "event_type": "view",
        "value": vals,
        "props": "{}",
    })
    _write(tmp_path, "events", ev)

    from semantic_search_system_ray.pipelines.queries import q_user_trailing_sum

    got = {r["event_id"]: r["trail_cents"]
           for r in q_user_trailing_sum(str(tmp_path)).take_all()}

    W = 10 * 60 * 1_000_000
    cents = np.round(vals * 100).astype(np.int64)
    want = {}
    df = pd.DataFrame({"e": np.arange(n), "u": users, "t": ts, "c": cents})
    for _u, g in df.groupby("u"):
        g = g.sort_values(["t", "e"], kind="mergesort")
        tt = g["t"].to_numpy()
        cum = np.concatenate([[0], np.cumsum(g["c"].to_numpy())])
        hi = np.searchsorted(tt, tt, side="right")
        lo = np.searchsorted(tt, tt - W, side="left")
        for e, v in zip(g["e"].to_numpy(), cum[hi] - cum[lo]):
            want[int(e)] = int(v)
    assert got == want


def test_orders_rank_ties_gap_rank(ray_session, tmp_path):
    """rank() gap semantics with planted ties: three rows tie at the top
    (all rank 1) → the next price has rank 4 and is EXCLUDED; two-way
    tie at rank 1 → next price has rank 3 and is INCLUDED."""
    base = pd.Timestamp("2024-01-01")
    orders = pd.DataFrame({
        "o_orderkey":      [1, 2, 3, 4, 5, 6, 7],
        "o_custkey":       [1] * 7,
        "o_orderstatus":   ["F"] * 7,
        "o_totalprice":    [9.99, 9.99, 9.99, 5.00,   # pri A: 3-way tie
                            7.00, 7.00, 3.00],        # pri B: 2-way tie
        "o_orderdate":     [base] * 7,
        "o_orderpriority": ["A", "A", "A", "A", "B", "B", "B"],
    })
    orders.to_parquet(tmp_path / "orders.parquet")

    from semantic_search_system_ray.pipelines.queries import q_orders_rank_ties

    rows = q_orders_rank_ties(str(tmp_path)).to_pandas()
    got = sorted(map(tuple, rows[["o_orderpriority", "o_orderkey", "rk"]]
                     .itertuples(index=False)))
    assert got == [("A", 1, 1), ("A", 2, 1), ("A", 3, 1),
                   ("B", 5, 1), ("B", 6, 1), ("B", 7, 3)]


def test_price_band_join_band_straddle(ray_session, tmp_path):
    """Pairs within δ must count EXACTLY once whether they share a band
    or straddle adjacent bands; pairs past δ and cross-brand pairs must
    not count. Prices chosen to land on both sides of the c//100 band
    boundary: 99 vs 101 straddles (diff 2), 150 vs 249 shares band 1
    (diff 99), 150 vs 251 is out (diff 101)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import q_price_band_join

    df = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5, 6],
        "p_name": ["x"] * 6,
        "p_brand": ["B1", "B1", "B1", "B1", "B1", "B2"],
        "p_type": ["t"] * 6,
        "p_size": [1] * 6,
        "p_retailprice": [0.99, 1.01, 1.50, 2.49, 2.51, 0.99],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "part.parquet"))
    got = q_price_band_join(str(tmp_path)).to_pandas()
    # qualifying B1 pairs: (1,2) diff 2, (3,4) diff 99, (4,5) diff 2,
    # (2,3) diff 49... check: 101 vs 150 = 49 <= 100 ✓, (1,3) 51 ✓,
    # (2,4) 148 ✗, (1,4) 150 ✗, (3,5) 101 ✗
    assert dict(zip(got["brand"], got["n_pairs"])) == {"B1": 5}


def test_embedding_dim_stats_exact_integers(ray_session, tmp_path):
    """Quantized moments must be exact: dims fold across blocks, the
    floor(x*1e6+0.5) idiom handles negatives, and variance comes from
    the integer sums (constant column -> variance exactly 0.0)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import (
        q_embedding_dim_stats,
    )

    emb = [[0.5, -0.5], [1.5, -0.5], [-2.0, -0.5]]
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
        "label": pa.array(["a", "b", "c"]),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = (
        q_embedding_dim_stats(str(tmp_path))
        .to_pandas().sort_values("dim").reset_index(drop=True)
    )
    # dim1 q: 500000, 1500000, -2000000 -> sum 0, mean 0
    assert got.loc[0, "sum_q"] == 0 and got.loc[0, "mean"] == 0.0
    # dim2 constant -0.5 -> q = floor(-500000 + 0.5) = -499999... wait:
    # floor(-0.5*1e6 + 0.5) = floor(-499999.5) = -500000 exactly
    assert got.loc[1, "sum_q"] == -1500000
    assert got.loc[1, "variance"] == 0.0
