"""Edge semantics for the round-3 statistics wave: tiny-n IQM (no
trimming), largest-remainder allocation with zero leftover, and the
lower weighted median under an even total-weight split."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _orders(tmp_path, prices, priorities=None):
    n = len(prices)
    pd.DataFrame({
        "o_orderkey": np.arange(n),
        "o_custkey": np.ones(n, dtype=np.int64),
        "o_orderstatus": ["F"] * n,
        "o_totalprice": prices,
        "o_orderdate": [pd.Timestamp("2024-01-01")] * n,
        "o_orderpriority": priorities or ["1-URGENT"] * n,
    }).to_parquet(tmp_path / "orders.parquet")


def test_iqm_tiny_n_keeps_everything(ray_session, tmp_path):
    # n = 3 → k = n//4 = 0 → nothing trimmed; IQM == plain mean
    _orders(tmp_path, [1.00, 2.00, 6.00])
    from semantic_search_system_ray.pipelines.queries import q_iqm_price

    row = q_iqm_price(str(tmp_path)).to_pandas().iloc[0]
    assert row["n"] == 3 and row["n_kept"] == 3
    assert abs(row["iqm"] - 3.0) < 1e-9


def test_iqm_trims_by_rank(ray_session, tmp_path):
    # n = 4 → k = 1 → drop the single lowest and highest BY RANK
    _orders(tmp_path, [1.00, 2.00, 4.00, 100.00])
    from semantic_search_system_ray.pipelines.queries import q_iqm_price

    row = q_iqm_price(str(tmp_path)).to_pandas().iloc[0]
    assert row["n_kept"] == 2
    assert abs(row["iqm"] - 3.0) < 1e-9  # mean(2, 4)


def test_allocation_zero_leftover(ray_session, tmp_path):
    # two priorities with revenue 3:1 → 1,000,000 splits exactly with
    # no remainder pennies; allocation must still sum to the budget
    _orders(tmp_path, [3.00, 1.00], priorities=["A", "B"])
    from semantic_search_system_ray.pipelines.queries import (
        ALLOC_TOTAL,
        q_allocate_budget,
    )

    df = q_allocate_budget(str(tmp_path)).to_pandas()
    assert df["alloc_cents"].sum() == ALLOC_TOTAL
    a = dict(zip(df["pri"], df["alloc_cents"]))
    assert a == {"A": 750_000, "B": 250_000}


def test_weighted_median_lower_pick(ray_session, tmp_path):
    # weights split the mass 3/3 across two prices → the LOWER weighted
    # median rule (cum >= ceil(W/2)) picks the smaller price
    n = 2
    pd.DataFrame({
        "l_orderkey": np.arange(n),
        "l_partkey": np.ones(n, dtype=np.int64),
        "l_suppkey": np.ones(n, dtype=np.int64),
        "l_linenumber": np.arange(n, dtype=np.int32),
        "l_quantity": [3.0, 3.0],
        "l_extendedprice": [10.00, 20.00],
        "l_discount": [0.0] * n,
        "l_tax": [0.0] * n,
        "l_returnflag": ["N"] * n,
        "l_linestatus": ["O"] * n,
        "l_shipdate": [pd.Timestamp("2024-01-01")] * n,
    }).to_parquet(tmp_path / "lineitem.parquet")
    from semantic_search_system_ray.pipelines.queries import (
        q_weighted_median_price,
    )

    row = q_weighted_median_price(str(tmp_path)).to_pandas().iloc[0]
    assert row["total_qty"] == 6
    assert abs(row["wmedian_price"] - 10.0) < 1e-9


def test_events_cusum_matches_recursion(ray_session, tmp_path):
    """The prefix-sum/running-min identity must equal the textbook
    recursion s_t = max(0, s_{t-1} + (x_t - K)) per user, with the peak
    as the statistic; ts ties break by event_id on both sides."""
    rows = [
        # user 1: drifts up then down; user 2: flat below K (stat 0)
        (1, 1, "2024-01-01 00:00:00", 100.00),
        (2, 1, "2024-01-01 00:00:01", 200.00),
        (3, 1, "2024-01-01 00:00:01", 10.00),   # ts tie -> event_id order
        (4, 1, "2024-01-01 00:00:02", 500.00),
        (5, 2, "2024-01-01 00:00:00", 5.00),
        (6, 2, "2024-01-01 00:00:01", 1.00),
    ]
    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows]),
        "user_id": [r[1] for r in rows],
        "event_type": ["t"] * len(rows),
        "value": [r[3] for r in rows],
        "props": ["{}"] * len(rows),
    }).to_parquet(tmp_path / "events.parquet")
    from semantic_search_system_ray.pipelines.queries import q_events_cusum

    got = (
        q_events_cusum(str(tmp_path)).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )

    K = 6000
    def ref(vals):
        s = peak = 0
        for v in vals:
            s = max(0, s + int(round(v * 100)) - K)
            peak = max(peak, s)
        return peak

    exp1 = ref([100.00, 200.00, 10.00, 500.00])
    exp2 = ref([5.00, 1.00])
    assert got["cusum_stat"].tolist() == [exp1, exp2]
    assert exp1 > 0 and exp2 == 0
    assert got["alarm"].tolist() == [exp1 > 50000, False]


def test_conversion_survival_censoring(ray_session, tmp_path):
    """Users without a qualifying purchase are right-CENSORED at the
    corpus horizon (they stay in at_risk for every earlier day), not
    dropped; deaths land on the exact whole-day lag."""
    rows = [
        # u1 signs up day 0, converts day 2
        (1, 1, "2024-01-01 00:00:00", "signup"),
        (2, 1, "2024-01-03 00:00:00", "purchase"),
        # u2 signs up day 0, never converts (censored at horizon day 9)
        (3, 2, "2024-01-01 00:00:00", "signup"),
        # u3 signs up day 0, converts same day
        (4, 3, "2024-01-01 00:00:00", "signup"),
        (5, 3, "2024-01-01 12:00:00", "purchase"),
        # horizon-setting unrelated event
        (6, 4, "2024-01-10 00:00:00", "click"),
    ]
    pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows]),
        "user_id": [r[1] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    }).to_parquet(tmp_path / "events.parquet")
    from semantic_search_system_ray.pipelines.queries import (
        q_conversion_survival,
    )

    got = q_conversion_survival(str(tmp_path)).to_pandas()
    # deaths at day 0 (u3) and day 2 (u1); u2 censored at day 9 keeps
    # at_risk = 3 at day 0 and 2 at day 2
    assert got[["day", "at_risk", "deaths"]].values.tolist() == [
        [0, 3, 1], [2, 2, 1]
    ]


def test_events_ewma_lockstep_matches_sequential(ray_session, tmp_path):
    """The jagged lockstep scan must equal the naive per-user
    sequential recurrence s_1=c_1, s_t=(c_t+s_{t-1})//2 — including
    interleaved users across blocks and the (ts, event_id) tie rule."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import q_events_ewma

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:00",
            "2024-01-02 00:00:00", "2024-01-01 12:00:00",
            "2024-01-03 00:00:00", "2024-01-01 00:00:00",
        ]),
        "user_id": [7, 7, 7, 7, 9, 9],
        "event_type": ["a"] * 6,
        "value": [10.00, 3.33, 7.77, 0.01, 5.55, 2.22],
        "props": ["{}"] * 6,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (
        q_events_ewma(str(tmp_path))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )

    def naive(vals):
        s, out = None, []
        for v in vals:
            c = int(round(v * 100))
            s = c if s is None else (c + s) // 2
            out.append(s / 100.0)
        return out

    # user 7 order by (ts, event_id): e1, e2 (tie -> id), e4, e3
    u7 = naive([10.00, 3.33, 0.01, 7.77])
    u9 = naive([2.22, 5.55])
    exp = {1: u7[0], 2: u7[1], 4: u7[2], 3: u7[3], 6: u9[0], 5: u9[1]}
    assert {int(r.event_id): r.ewma for r in got.itertuples()} == exp
