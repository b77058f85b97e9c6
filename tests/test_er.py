"""Entity-resolution golden records (pipelines/er): known-cluster
synthetic corpus vs the same SQL the driver oracle runs, plus structural
expectations (transitive merge, singleton survival, exact money)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def part_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("er_sf")
    # cluster A: chain aaaa—aaab—aabb (transitive: aaaa↔aabb is dist 2);
    # cluster B: zzzz alone; xx1/xx2 pair; plus duplicate rows per name
    names = ["aaaa", "aaab", "aabb", "zzzz", "xx1", "xx2",
             "aaaa", "xx1", "xx1"]
    price = [1.25, 2.50, 3.00, 10.00, 5.75, 6.00, 0.75, 1.00, 2.00]
    pq.write_table(pa.table({
        "p_name": pa.array(names, pa.string()),
        "p_retailprice": pa.array(price, pa.float64()),
    }), d / "part.parquet")
    return str(d)


def test_golden_records_vs_sql(ray_session, part_dir):
    from semantic_search_system_ray.pipelines.er import (
        SQL_ER_GOLDEN_RECORDS,
        q_er_golden_records,
    )

    got = q_er_golden_records(part_dir).to_pandas().sort_values(
        "entity_id"
    ).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{part_dir}/part.parquet')"
    )
    exp = con.execute(SQL_ER_GOLDEN_RECORDS).fetch_df().sort_values(
        "entity_id"
    ).reset_index(drop=True)
    assert got["entity_id"].tolist() == exp["entity_id"].tolist()
    assert got["n_names"].tolist() == exp["n_names"].astype("int64").tolist()
    assert got["n_rows"].tolist() == exp["n_rows"].astype("int64").tolist()
    assert got["total_retail"].tolist() == exp["total_retail"].tolist()

    by_id = got.set_index("entity_id")
    # transitive merge: the aaaa chain is ONE entity labelled by its min
    assert by_id.loc["aaaa", "n_names"] == 3
    assert by_id.loc["aaaa", "n_rows"] == 4  # aaaa twice
    assert by_id.loc["aaaa", "total_retail"] == pytest.approx(7.50)
    # singleton survives with its own label
    assert by_id.loc["zzzz", "n_rows"] == 1
    # xx1/xx2 merge under min name xx1, with xx1's three rows
    assert by_id.loc["xx1", "n_names"] == 2
    assert by_id.loc["xx1", "n_rows"] == 4
    assert len(got) == 3
