"""CDC MERGE/upsert (q_merge_upsert): the gate data exercises only
matched updates/deletes (every order's custkey is a valid customer), so
this pytest feeds a synthetic base+change-log pair that forces ALL five
rule-table rows — matched U, matched D, base-only keep, change-only U
(insert), change-only D (no-op) — and multi-change last-writer-wins,
then compares against the same SQL the driver oracle runs."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def merge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("merge_sf")
    rng = np.random.RandomState(3)
    base = pa.Table.from_pydict(
        {"c_custkey": pa.array(range(100), pa.int64()),
         "c_acctbal": pa.array(rng.uniform(-100, 100, 100).round(2),
                               pa.float64()),
         "c_mktsegment": pa.array(
             [["BUILDING", "MACHINERY"][i % 2] for i in range(100)],
             pa.string())}
    )
    # change log: keys 50..149 — half unknown to the base (insert path);
    # 3 changes per key with interleaved seq so last-writer-wins matters.
    keys, seqs, totals = [], [], []
    for k in range(50, 150):
        for j in range(3):
            keys.append(k)
            # orderkey unique and NOT monotone in j: seq order != row order
            seqs.append((k * 7 + j * 131) % 10000 * 19 + (k + j) % 19)
            totals.append(round(float(k) + j * 0.25, 2))
    changes = pa.Table.from_pydict(
        {"o_orderkey": pa.array(seqs, pa.int64()),
         "o_custkey": pa.array(keys, pa.int64()),
         "o_totalprice": pa.array(totals, pa.float64())}
    )
    pq.write_table(base, d / "customer.parquet")
    pq.write_table(changes, d / "orders.parquet")
    return str(d)


def test_merge_upsert_all_rule_rows(ray_session, merge_dir):
    from semantic_search_system_ray.pipelines.queries import (
        SQL_MERGE_UPSERT,
        q_merge_upsert,
    )

    got = q_merge_upsert(merge_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{merge_dir}/customer.parquet')"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{merge_dir}/orders.parquet')"
    )
    exp = con.execute(SQL_MERGE_UPSERT).fetch_df()

    got = got.sort_values("c_custkey").reset_index(drop=True)
    exp = exp.sort_values("c_custkey").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["c_custkey"].tolist() == exp["c_custkey"].astype("int64").tolist()
    # balances pass through both engines untouched → bit-identical
    assert got["c_acctbal"].tolist() == exp["c_acctbal"].tolist()
    assert got["c_mktsegment"].tolist() == exp["c_mktsegment"].tolist()

    # the fixture really exercised every branch
    inserted = got[got["c_mktsegment"] == "NEW"]
    assert len(inserted) > 0, "insert path not exercised"
    assert got["c_custkey"].max() >= 100, "no unknown-key inserts survived"
    deleted = set(range(100)) - set(got["c_custkey"])  # matched D
    assert deleted, "delete path not exercised"
    kept_untouched = got[got["c_custkey"] < 50]
    assert len(kept_untouched) == 50, "base-only keep path broken"
    # change-only D is a no-op: any unknown key whose LAST change is a
    # delete must be absent from the output
    ch = pd.read_parquet(f"{merge_dir}/orders.parquet")
    last = ch.sort_values("o_orderkey").groupby("o_custkey").last()
    unknown_deleted = [
        k for k in last.index
        if k >= 100 and last.loc[k, "o_orderkey"] % 19 == 0
    ]
    if unknown_deleted:
        assert not set(unknown_deleted) & set(got["c_custkey"])


def test_merge_upsert_last_writer_wins(ray_session, merge_dir):
    """The surviving balance for a multi-change key equals the payload of
    its MAX-seq change, not the last-arriving block's."""
    from semantic_search_system_ray.pipelines.queries import q_merge_upsert

    got = q_merge_upsert(merge_dir).to_pandas()
    ch = pd.read_parquet(f"{merge_dir}/orders.parquet")
    last = ch.sort_values("o_orderkey").groupby("o_custkey").last()
    for k in (60, 110):
        if k in set(got["c_custkey"]):
            assert (
                got.loc[got["c_custkey"] == k, "c_acctbal"].iloc[0]
                == last.loc[k, "o_totalprice"]
            )
