"""Data-quality suite (stages/dq): the sf tables are clean (all checks
0), so this fixture PLANTS violations of every kind — duplicate PKs,
dangling FKs (incl. a null child key), out-of-range quantities,
non-positive totals, out-of-bounds dates, null balances/values, empty
and null text — and compares the distributed report against the same
SQL the driver oracle runs."""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_sf")
    ok = dt.datetime(1997, 6, 1)
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 2, 3, 4], pa.int64()),  # dup PK
        "c_acctbal": pa.array([10.0, None, 5.0, None, 1.0], pa.float64()),
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 11, 12, 13], pa.int64()),  # dup PK
        "o_custkey": pa.array([1, 99, None, 3, 4], pa.int64()),  # dangling+null
        "o_totalprice": pa.array([5.0, -1.0, 0.0, 2.0, 3.0], pa.float64()),
        "o_orderdate": pa.array(
            [ok, dt.datetime(1980, 1, 1), dt.datetime(2005, 1, 1), ok, ok],
            pa.timestamp("us")),
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 77, None], pa.int64()),
        "l_quantity": pa.array([0.0, 25.0, 51.0, 10.0], pa.float64()),
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello", "", None], pa.string()),
    }), d / "documents.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "value": pa.array([1.5, None], pa.float64()),
    }), d / "events.parquet")
    return str(d)


def test_dq_report_matches_sql(ray_session, dirty_dir):
    from semantic_search_system_ray.stages.dq import SQL_DQ_CHECKS, dq_report

    got = dq_report(dirty_dir).to_pandas()

    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{dirty_dir}/{t}.parquet')"
        )
    exp = con.execute(SQL_DQ_CHECKS).fetch_df()
    assert got["check_name"].tolist() == exp["check_name"].tolist()
    assert got["violations"].tolist() == exp["violations"].astype("int64").tolist()

    # the fixture really hits every check
    v = dict(zip(got["check_name"], got["violations"]))
    assert all(n > 0 for n in v.values()), v
    # dangling (99) + null child key both violate NOT EXISTS
    assert v["fk_orders_customer"] == 2
    assert v["fk_lineitem_orders"] == 2  # 77 + null
    assert v["customer_pk_dup"] == 1 and v["orders_pk_dup"] == 1


def test_distinct_count_and_fk_violations_primitives(ray_session, dirty_dir):
    """The standalone primitives (kept as public API next to the fused
    key_domain_checks): exact COUNT DISTINCT excludes nulls; FK
    violations count null child keys without shuffling them."""
    import ray.data as rd

    from semantic_search_system_ray.stages.dq import (
        distinct_count,
        fk_violations,
    )

    cust = rd.read_parquet(f"{dirty_dir}/customer.parquet",
                           columns=["c_custkey"])
    assert distinct_count(cust, "c_custkey") == 4  # 1,2,3,4 (2 dup'd)

    orders = rd.read_parquet(f"{dirty_dir}/orders.parquet",
                             columns=["o_custkey"])
    # dangling 99 + null child key
    assert fk_violations(orders, "o_custkey", cust, "c_custkey") == 2


def test_key_domain_checks_matches_primitives(ray_session, dirty_dir):
    import ray.data as rd

    from semantic_search_system_ray.stages.dq import key_domain_checks

    cust = rd.read_parquet(f"{dirty_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(f"{dirty_dir}/orders.parquet",
                             columns=["o_custkey"])
    pk, viol = key_domain_checks(cust, "c_custkey", orders, "o_custkey")
    assert (pk, viol) == (1, 2)


def test_key_domain_checks_regime_parity(ray_session, dirty_dir, monkeypatch):
    """The large regime (sorted cogroup) and the small regime (single
    concat task) must agree — force the cogroup by zeroing the row
    threshold and compare against the default small-regime answer."""
    import ray.data as rd

    from semantic_search_system_ray.stages import dq

    cust = rd.read_parquet(f"{dirty_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(f"{dirty_dir}/orders.parquet",
                             columns=["o_custkey"])
    monkeypatch.setattr(dq, "SMALL_DOMAIN_ROWS", 0)
    assert dq.key_domain_checks(
        cust, "c_custkey", orders, "o_custkey") == (1, 2)


def test_dq_report_clean_testdata(ray_session):
    """sf0.001 is clean: every check reports 0."""
    from semantic_search_system_ray.stages.dq import dq_report

    got = dq_report("/root/testdata/sf0.001").to_pandas()
    assert got["violations"].tolist() == [0] * len(got)
