"""Driver-mimic correctness gate: run every queries() entry with an
oracle_sql() twin side-by-side with DuckDB at sf0.001 and compare
(row-count + column names + order-insensitive values) — the same contract
the external driver applies at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _oracle_pairs():
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    assert set(sql) <= set(qs), "every oracle needs a query"
    return sorted(sql)


@pytest.mark.parametrize("name", _oracle_pairs())
def test_query_matches_duckdb(name, ray_session, ddb):
    import __ray_entry__ as e

    ray_df = _normalize(_to_pandas(e.queries()[name](SF_DIR)))
    sql_df = _normalize(ddb.execute(e.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=1e-6)


def test_rows_only_queries_run(ray_session):
    """Non-SQL queries must at least execute and yield a stable schema."""
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    for name in sorted(set(qs) - set(sql)):
        if name == "kg_triples":
            continue  # covered by test_entry_smoke
        res = qs[name](SF_DIR)
        df = _to_pandas(res.limit(50) if hasattr(res, "limit") else res)
        assert df.shape[1] >= 2, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert sorted(df.columns) == ["obj", "pred", "subj"]
    assert {"MENTIONS", "HAS_TOPIC", "IN_TOPIC"} <= set(df["pred"])


def test_funnel_strict_ordering(ray_session, tmp_path):
    """Out-of-order and equal-timestamp steps must NOT advance the
    funnel: purchase before click doesn't count; a click at exactly the
    view's entry time doesn't count (strict >)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import q_funnel

    t0 = dt.datetime(2000, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: clean in-order funnel → reaches stage 3
        (1, s(0), "view"), (1, s(1), "click"), (1, s(2), "purchase"),
        # u2: purchase BEFORE click → stops at stage 2
        (2, s(0), "view"), (2, s(2), "click"), (2, s(1), "purchase"),
        # u3: click at the SAME instant as view → stops at stage 1
        (3, s(0), "view"), (3, s(0), "click"),
        # u4: no view → never enters
        (4, s(0), "click"), (4, s(1), "purchase"),
        # u5: retries past the bad ordering (click after early purchase,
        # then a later purchase) → reaches stage 3
        (5, s(0), "view"), (5, s(1), "purchase"), (5, s(2), "click"),
        (5, s(3), "purchase"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_funnel(str(tmp_path)).to_pandas().set_index("stage")["users"]
    assert got["1_view"] == 4      # u1 u2 u3 u5
    assert got["2_click"] == 3     # u1 u2 u5
    assert got["3_purchase"] == 2  # u1 u5


def test_time_weighted_value_edges(ray_session, tmp_path):
    """Equal-timestamp events (deterministic event_id tiebreak,
    zero-duration holding) and users whose TOTAL holding time is zero
    (excluded — no 0/0) must match the SQL twin exactly."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import (
        SQL_TIME_WEIGHTED_VALUE,
        q_time_weighted_value,
    )

    t0 = dt.datetime(2000, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: normal holding windows
        (1, 1, s(0), 10.00), (1, 2, s(60), 20.00), (1, 3, s(180), 5.00),
        # u2: two events at the SAME instant then one later — the
        # zero-duration pair contributes nothing, tiebreak by event_id
        (2, 4, s(0), 100.00), (2, 5, s(0), 1.00), (2, 6, s(30), 7.00),
        # u3: all events at one instant → total duration 0 → excluded
        (3, 7, s(0), 5.00), (3, 8, s(0), 6.00),
        # u4: single event → no holding window → excluded
        (4, 9, s(0), 9.00),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }), tmp_path / "events.parquet")

    got = q_time_weighted_value(str(tmp_path)).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = con.execute(SQL_TIME_WEIGHTED_VALUE).fetch_df().sort_values(
        "user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == exp["user_id"].astype("int64").tolist()
    assert got["twa"].tolist() == exp["twa"].tolist()  # bit-identical
    assert set(got["user_id"]) == {1, 2}  # u3/u4 excluded


def test_compact_roundtrip_file_count(ray_session):
    """Compaction actually compacts: the scratch sink holds the target
    file count and the full row count survives the roundtrip."""
    import os

    from semantic_search_system_ray.pipelines.queries import (
        q_compact_roundtrip,
    )

    ds = q_compact_roundtrip("/root/testdata/sf0.001")
    assert ds.count() == 500
    out_dir = "/tmp/compact_rt_sf0.001"
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 4


def test_table_checksum_order_independent(ray_session, tmp_path):
    """The anti-entropy checksum is layout-invariant: shuffled row order
    and a different block count produce the identical fingerprint; one
    flipped payload value changes it."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import q_table_checksum

    rng = np.random.RandomState(9)
    n = 400
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
        "n_chars": pa.array(rng.randint(1, 999, n).tolist(), pa.int64()),
        "text": pa.array(["x"] * n), "source": pa.array(["s"] * n),
    })
    orders = pa.table({
        "o_orderkey": pa.array(range(50), pa.int64()),
        "o_custkey": pa.array([i % 7 for i in range(50)], pa.int64()),
        "o_orderpriority": pa.array([f"P{i % 3}" for i in range(50)]),
    })
    d1, d2 = tmp_path / "v1", tmp_path / "v2"
    d1.mkdir(), d2.mkdir()
    pq.write_table(docs, d1 / "documents.parquet")
    pq.write_table(orders, d1 / "orders.parquet")
    perm = rng.permutation(n).tolist()
    pq.write_table(docs.take(perm), d2 / "documents.parquet",
                   row_group_size=37)  # shuffled + different layout
    pq.write_table(orders, d2 / "orders.parquet")

    c1 = q_table_checksum(str(d1)).to_pandas().set_index("table_name")
    c2 = q_table_checksum(str(d2)).to_pandas().set_index("table_name")
    assert c1["checksum"].to_dict() == c2["checksum"].to_dict()

    flipped = docs.set_column(
        2, "n_chars",
        pa.array([docs["n_chars"][0].as_py() + 1]
                 + docs["n_chars"][1:].to_pylist(), pa.int64()),
    )
    pq.write_table(flipped, d2 / "documents.parquet")
    c3 = q_table_checksum(str(d2)).to_pandas().set_index("table_name")
    assert c3.loc["documents", "checksum"] != c1.loc["documents", "checksum"]
    assert c3.loc["orders", "checksum"] == c1.loc["orders", "checksum"]


def test_events_locf_leading_nulls_and_ties(ray_session, tmp_path):
    """LOCF semantics pinned on a crafted log: clicks are 'missing' and
    carry the last prior reading; a user whose first rows are clicks
    stays NULL until the first reading; equal timestamps break by
    event_id on both engine and oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import (
        SQL_EVENTS_LOCF,
        q_events_locf,
    )

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01",
         "2024-01-01 00:00:01", "2024-01-01 00:00:02",
         "2024-01-01 00:00:00", "2024-01-01 00:00:03"]
    )
    tbl = pa.table({
        "event_id": pa.array([1, 3, 2, 4, 10, 11], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        # user 7: view(1.5) then tie at :01 — click(id 2) before
        # view(id 3, 2.5) — then click; user 8: clicks only → all NULL
        "event_type": pa.array(
            ["view", "view", "click", "click", "click", "click"]
        ),
        "value": pa.array([1.5, 2.5, 99.0, 98.0, 97.0, 96.0], pa.float64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (
        q_events_locf(str(tmp_path)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    by_id = got.set_index("event_id")["locf_value"]
    assert by_id[1] == 1.5
    assert by_id[2] == 1.5      # tie at :01 → id 2 precedes the reading
    assert by_id[3] == 2.5
    assert by_id[4] == 2.5
    assert pd.isna(by_id[10]) and pd.isna(by_id[11])

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = (
        con.execute(SQL_EVENTS_LOCF).fetchdf()
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_event_transitions_counts_and_probs(ray_session, tmp_path):
    """Transition counts pinned on a crafted log: single-event users
    contribute nothing; probabilities sum to 1 per prev type; pairs
    never leak across users."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import q_event_transitions

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:02",
        "2024-01-01 00:00:00", "2024-01-01 00:00:01",
        "2024-01-01 00:00:00",
    ])
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        # u1: view->click->view ; u2: view->click ; u3: purchase (alone)
        "event_type": pa.array(
            ["view", "click", "view", "view", "click", "purchase"]
        ),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = q_event_transitions(str(tmp_path)).to_pandas()
    rows = {
        (r.prev_type, r.event_type): (r.n, r.p) for r in got.itertuples()
    }
    assert rows[("view", "click")] == (2, 1.0)
    assert rows[("click", "view")] == (1, 1.0)
    assert len(rows) == 2  # no cross-user pair (click->view u1/u2 bleed)
    per_prev = got.groupby("prev_type")["p"].sum()
    assert (per_prev == 1.0).all()


def test_skyline_bruteforce_parity_and_ties(ray_session, tmp_path):
    """_skyline_np vs the O(n²) dominance definition on a random set
    plus crafted ties: duplicate frontier points all survive; the
    blockwise combiner (skyline of skylines) equals the global skyline
    at any block layout."""
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import (
        _skyline_np,
        q_orders_skyline,
    )

    rng = random.Random(3)
    n = 300
    dates = np.array([rng.randrange(0, 40) for _ in range(n)], np.int64)
    prices = np.array([rng.randrange(0, 50) * 100 for _ in range(n)], np.int64)
    # force exact duplicates of one likely-frontier point
    dates[5] = dates[6] = dates.min()
    prices[5] = prices[6] = prices.max()
    keys = np.arange(n, dtype=np.int64)

    def dominated(i):
        return any(
            dates[j] <= dates[i] and prices[j] >= prices[i]
            and (dates[j] < dates[i] or prices[j] > prices[i])
            for j in range(n)
        )

    want = {int(k) for k in keys if not dominated(k)}
    kk, _, _ = _skyline_np(keys, dates, prices)
    assert set(kk.tolist()) == want
    assert {5, 6} <= want  # both duplicates survive

    # end-to-end through the query at two block layouts
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(dates, unit="D")
    tbl = pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_orderdate": pa.array(ts, pa.timestamp("us")),
        "o_totalprice": pa.array(prices.astype(np.float64) / 100.0),
    })
    pq.write_table(tbl, tmp_path / "orders.parquet")
    got = q_orders_skyline(str(tmp_path))
    assert set(got.column("o_orderkey").to_pylist()) == want


def test_gapfill_emits_zero_days(ray_session, tmp_path):
    """Days with no events inside the global range appear with n=0 for
    every type; days outside the range do not appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import (
        q_events_daily_gapfill,
    )

    ts = pd.to_datetime(
        ["2024-01-01 05:00", "2024-01-01 06:00", "2024-01-04 07:00"]
    )
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "view"]),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = q_events_daily_gapfill(str(tmp_path)).to_pandas()
    # 4 days x 2 types
    assert len(got) == 8
    z = got.set_index(["day", "event_type"])["n"]
    assert z[("2024-01-02", "view")] == 0
    assert z[("2024-01-03", "click")] == 0
    assert z[("2024-01-01", "view")] == 1
    assert z[("2024-01-04", "view")] == 1
    assert got["n"].sum() == 3


def test_small_qty_revenue_integer_predicate(ray_session, tmp_path):
    """The decorrelated predicate is the exact integer rewrite
    5·q·cnt < sum_q — pinned on a crafted part where q = avg/5 exactly
    (must be EXCLUDED: strict less) and one just below (included)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.queries import q_small_qty_revenue

    # part 1: quantities 5,45 -> avg 25, threshold 5 -> q=5 excluded
    # part 2: quantities 4,46 -> avg 25, threshold 5 -> q=4 included
    tbl = pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_quantity": pa.array([5.0, 45.0, 4.0, 46.0]),
        "l_extendedprice": pa.array([10.00, 20.00, 40.00, 80.00]),
    })
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = q_small_qty_revenue(str(tmp_path))
    assert got.column("avg_yearly").to_pylist() == [40.00 / 7.0]


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_events_ohlc_cross_block_and_ties(ray_session, tmp_path, n_blocks):
    """The OHLC combiner must pick the same open/close when a (user,
    bucket) group is split across blocks, and equal-timestamp ties must
    break by event_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from semantic_search_system_ray.pipelines.queries import (
        OHLC_BUCKET_US,
        q_events_ohlc,
    )

    ts = pd.to_datetime(
        ["2024-01-01 01:00", "2024-01-01 01:00",   # tie: ids 2 < 5
         "2024-01-01 03:00", "2024-01-01 05:59",
         "2024-01-01 05:59",                        # tie at close: 9 > 7
         "2024-01-01 07:00"]                        # next bucket
    )
    tbl = pa.table({
        "event_id": pa.array([5, 2, 3, 7, 9, 11], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 1], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([50.0, 20.0, 30.0, 70.0, 90.0, 11.0]),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    if n_blocks > 1:
        # tiny row groups let Ray split the single file into multiple
        # blocks, so the (user, bucket) group genuinely spans partials
        pq.write_table(tbl, tmp_path / "events.parquet", row_group_size=2)

    got = q_events_ohlc(str(tmp_path)).to_pandas().sort_values(
        "bucket"
    ).reset_index(drop=True)
    b0 = got.iloc[0]
    assert b0["n"] == 5
    assert b0["open"] == 20.0      # id 2 wins the 01:00 tie
    assert b0["close"] == 90.0     # id 9 wins the 05:59 tie
    assert b0["high"] == 90.0 and b0["low"] == 20.0
    b1 = got.iloc[1]
    assert (b1["n"], b1["open"], b1["close"]) == (1, 11.0, 11.0)


def test_rows_only_set_is_pinned():
    """EVERY queries() entry carries an oracle since r4 — approximate /
    iterative ops (ann_lsh, ann_ivf, taxonomy_build) moved onto the hard
    gate via hash-checked recall/property certificates. New operators
    cannot silently land without a SQL twin."""
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    assert set(qs) - set(sql) == set()


def test_kg_memo_keyed_by_sf(ray_session, tmp_path):
    """The session-level kg-triples memo must not cross sf directories."""
    import __ray_entry__ as e

    e._KG_TRIPLES_CACHE.clear()
    t1 = e._kg_triples(SF_DIR)
    assert SF_DIR in e._KG_TRIPLES_CACHE
    assert e._kg_triples(SF_DIR) is t1  # cached hit
    assert str(tmp_path) not in e._KG_TRIPLES_CACHE
