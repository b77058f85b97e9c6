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
