"""Relational operator coverage over the driver's TPC-H-ish tables —
the ``queries()`` / ``oracle_sql()`` surface of ``__ray_entry__.py``.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column NAMES and VALUES match the paired ANSI-SQL string in ``ORACLE_SQL``
(run by the driver through DuckDB on the same parquet). Floats are rounded
identically on both sides; dates/timestamps are stringified on both sides.

Operator ↔ SURVEY §2 mapping:
- q_filter_date_range / q_filter_eq: predicate sources S10-S13 (pushdown).
- q_topk_orders: T2/T3 sort-limit with deterministic tie-break.
- q_groupby_lineitem: G-class grouped aggregation, two-phase (per-batch
  pyarrow combiner → global groupby) — the salted/partial pattern.
- q_region_rollup: J1 broadcast hash join (dims via ray.put).
- q_revenue_by_priority: large-large join as ONE coarse-partition cogroup
  (combiner pre-aggregation on the fact side; scaled-int money sums).
- q_distinct_segments: §2.7 set ops.
- q_minmax_normalize: G7 min-max score normalization (two-phase).
- q_dedup_exact: exact dedup by content hash (§2.7 + dedup suite).
- q_events_hourly: tumbling-window aggregate over the events stream table.
- q_token_count / q_word_topk / q_lang_stats: text analysis (vectorized RE2
  kernels; two-phase word counts).
- q_ann_cosine: brute-force cosine top-k over embeddings (T2 exact).
- q_cosine_dups: embedding-cosine near-dup pairs.
- q_customers_without_orders: distributed anti join (coarse cogroup).
- q_orders_asof / q_purchase_click_window: as-of + interval range joins.
- q_events_sliding / q_sessionize: sliding windows / session windows.
- q_train_split / q_redact_pii: training-data split + PII scrub.
"""

from __future__ import annotations

from collections import Counter

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from semantic_search_system_ray.functions.scores import arrow_minmax_normalize_100
from semantic_search_system_ray.pipelines.er import SQL_ER_GOLDEN_RECORDS
from semantic_search_system_ray.stages.dq import SQL_DQ_CHECKS
from semantic_search_system_ray.stages.ann import cosine_topk
from semantic_search_system_ray.stages.dedup import embedding_cosine_dups, exact_dedup
from semantic_search_system_ray.stages.textstats import (
    gopher_rules_batch,
    token_count_batch,
)
from semantic_search_system_ray.stages.util import ensure_schema


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    """Read the documents table with blocks sized to the cluster: a
    SINGLE parquet file otherwise yields 1-2 blocks, serializing every
    per-doc CPU stage downstream (minhash, lang-id, NLP). At real scale
    the corpus is many files and the override is a no-op-ish ceiling."""
    n = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return rd.read_parquet(
        _p(sf_dir, "documents"), columns=columns, override_num_blocks=n
    )


# --------------------------------------------------------------------------
# filters / sources (S10-S13)
# --------------------------------------------------------------------------

def q_filter_date_range(sf_dir: str):
    """Orders in [1996-01-01, 1997-01-01) — projection + predicate pushdown
    at the read (columns= / filter= hit parquet row groups)."""
    import datetime as dt

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(dt.datetime(1996, 1, 1)))
            & (pc.field("o_orderdate") < pa.scalar(dt.datetime(1997, 1, 1)))
        ),
    )
    return ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_totalprice": pc.round(t.column("o_totalprice"), 2),
                "o_orderdate": pc.strftime(t.column("o_orderdate"), format="%Y-%m-%d"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_FILTER_DATE_RANGE = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


def q_filter_eq(sf_dir: str):
    """events with event_type = 'purchase' (exact-match source, S13)."""
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(pc.field("event_type") == "purchase"),
    )
    return ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value": pc.round(t.column("value"), 4),
            }
        ),
        batch_format="pyarrow",
    )


SQL_FILTER_EQ = """
SELECT event_id, user_id, round(value, 4) AS value
FROM events WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# sort / top-k (T2/T3)
# --------------------------------------------------------------------------

def q_topk_orders(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "o_totalprice": pc.round(t.column("o_totalprice"), 2)}
        ),
        batch_format="pyarrow",
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# grouped aggregation, two-phase combiner (TPC-H Q1 shape)
# --------------------------------------------------------------------------

def q_groupby_lineitem(sf_dir: str):
    """Pricing summary: per-batch pyarrow partial aggregation (combiner),
    then a global groupby over ~|groups|×|batches| partial rows — the
    two-phase pattern that tames skewed keys at scale."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    import datetime as dt

    cutoff = pa.scalar(dt.datetime(1998, 9, 2))

    def partial(t: pa.Table) -> pa.Table:
        # Money/quantity sums run in SCALED INTEGERS (cents / scale-4):
        # float addition is order-dependent (partial-sum + shuffle order ≠
        # DuckDB's order), and a last-ulp difference at a .005 boundary
        # flips a 2dp round — observed at sf0.001. Integer sums are
        # order-independent; both sides then do the IDENTICAL bigint→double
        # division before rounding, so the lossy step is bit-equal too.
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        qty_c = pc.cast(pc.round(pc.multiply(t.column("l_quantity"),
                                             pa.scalar(100.0))), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        dp_s4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        t2 = pa.Table.from_pydict(
            {"l_returnflag": t.column("l_returnflag"),
             "l_linestatus": t.column("l_linestatus"),
             "qty_c": qty_c, "price_c": price_c, "dp_s4": dp_s4}
        )
        return t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("dp_s4", "sum"),
             ("qty_c", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c_sum", alias_name="qty_c"),
        Sum("price_c_sum", alias_name="price_c"),
        Sum("dp_s4_sum", alias_name="dp_s4"),
        Sum("qty_c_count", alias_name="count_order"),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Rounding is done in INTEGER space too (half-away = (2x+d)//(2d)
        # for positive x): DuckDB's and Arrow's round(double, n) scale by
        # 10^n with different intermediate precision and can disagree by
        # one ulp at .5 boundaries — with integer rounding both sides
        # divide the SAME integer by the same power of ten, bit-equal.
        qty_c = t.column("qty_c")
        price_c = t.column("price_c")
        n = t.column("count_order")
        two = pa.scalar(2, pa.int64())
        disc_r2 = pc.divide(pc.add(t.column("dp_s4"), pa.scalar(50, pa.int64())),
                            pa.scalar(100, pa.int64()))
        avg_num = pc.add(pc.multiply(pc.multiply(qty_c, pa.scalar(100, pa.int64())), two), n)
        avg_r4 = pc.divide(avg_num, pc.multiply(two, n))
        return pa.Table.from_pydict(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pc.divide(pc.cast(qty_c, pa.float64()), pa.scalar(100.0)),
                "sum_base_price": pc.divide(pc.cast(price_c, pa.float64()), pa.scalar(100.0)),
                "sum_disc_price": pc.divide(pc.cast(disc_r2, pa.float64()), pa.scalar(100.0)),
                "avg_qty": pc.divide(pc.cast(avg_r4, pa.float64()), pa.scalar(10000.0)),
                "count_order": n,
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


SQL_GROUPBY_LINEITEM = """
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS dp_s4
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST((sum(dp_s4) + 50) // 100 AS DOUBLE) / 100.0 AS sum_disc_price,
       CAST((2 * sum(qty_c) * 100 + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0
         AS avg_qty,
       count(*) AS count_order
FROM s GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# broadcast join over dimensions (J1)
# --------------------------------------------------------------------------

def q_region_rollup(sf_dir: str):
    """customer ⨝ nation ⨝ region: dims are tiny → ray.put broadcast dicts
    read once per actor; the fact table streams (no shuffle)."""
    nation = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    region = rd.read_parquet(_p(sf_dir, "region")).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({n: r2name[r] for n, r in n2r.items()})

    class _Tag:
        def __init__(self):
            self.n2rname = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            rname = [self.n2rname[n] for n in t.column("c_nationkey").to_pylist()]
            # cents (scaled int): order-independent exact sums; the data
            # is 2dp so round(x·100) is never at a .5 boundary
            cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"),
                                                 pa.scalar(100.0))), pa.int64())
            return pa.Table.from_pydict(
                {"r_name": pa.array(rname, pa.string()), "acct_c": cents}
            )

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"])
    tagged = cust.map_batches(_Tag, batch_format="pyarrow", concurrency=(1, 4))
    out = tagged.groupby("r_name").aggregate(
        Count(alias_name="num_customers"), Sum("acct_c", alias_name="acct_c")
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"r_name": t.column("r_name"),
             "num_customers": t.column("num_customers"),
             "total_acctbal": pc.divide(pc.cast(t.column("acct_c"), pa.float64()),
                                        pa.scalar(100.0))}
        ),
        batch_format="pyarrow",
    )


SQL_REGION_ROLLUP = """
SELECT r_name, count(*) AS num_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# large-large hash join (Dataset.join) with fact-side combiner
# --------------------------------------------------------------------------

def q_revenue_by_priority(sf_dir: str):
    """Large-large join expressed as ONE coarse-partition cogroup: lineitem
    partials and orders are routed by orderkey hash into the same P
    partitions; inside each partition a vectorized pandas merge joins them
    and pre-aggregates to ≤5 priority rows — so the only global groupby is
    over P×5 rows. (Replaces ``Dataset.join num_partitions=4``, which
    starved a 32-CPU box: 15.2s → the cogroup uses every core.)"""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    union_schema = pa.schema(
        [("key", pa.int64()), ("rev", pa.int64()), ("priority", pa.string())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        # combiner: per-order partial revenue BEFORE the shuffle — in
        # SCALED INTEGERS (cents × discount-hundredths, scale 4): float
        # sums are addition-order-dependent and a last-ulp difference at a
        # rounding boundary flips the 2dp output vs the oracle
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        t2 = pa.Table.from_pydict({"key": t.column("l_orderkey"), "rev": rev})
        agg = t2.group_by(["key"]).aggregate([("rev", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("rev_sum"),
             pa.nulls(agg.num_rows, pa.string())],
            schema=union_schema,
        )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.float64()),
             t.column("o_orderpriority")],
            schema=union_schema,
        )

    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    combined = li.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    part_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("rev_part", pa.int64()),
         ("n_part", pa.int64())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["priority"].isna()]
        od_rows = df[df["priority"].notna()]
        if li_rows.empty or od_rows.empty:
            return part_schema.empty_table()
        # nullable Int64 keeps the sums integer-exact (the null-bearing
        # union column would otherwise coerce to float64, whose integer
        # exactness ends at 2^53 — too small for scale-4 cents at corpus
        # scale)
        rev = (
            li_rows.assign(rev=li_rows["rev"].astype("Int64"))
            .groupby("key", sort=False)["rev"].sum()
        )
        j = od_rows[["key", "priority"]].merge(
            rev.rename("revenue"), left_on="key", right_index=True, how="inner"
        )
        agg = j.groupby("priority", sort=False)["revenue"].agg(["sum", "size"])
        return pa.Table.from_pydict(
            {"o_orderpriority": agg.index.to_list(),
             "rev_part": agg["sum"].astype("int64").to_list(),
             "n_part": agg["size"].to_list()},
            schema=part_schema,
        )

    parts = coarse_partition_apply(combined, ["key"], cogroup, part_schema)
    out = parts.groupby("o_orderpriority").aggregate(
        Sum("rev_part", alias_name="rev_s4"), Sum("n_part", alias_name="num_orders")
    )

    def finish(t: pa.Table) -> pa.Table:
        # integer half-away round to cents, then one bigint→double divide —
        # bit-identical to the oracle's (sum + 50) // 100 / 100.0
        cents = pc.divide(pc.add(t.column("rev_s4"), pa.scalar(50, pa.int64())),
                          pa.scalar(100, pa.int64()))
        return pa.Table.from_pydict(
            {"o_orderpriority": t.column("o_orderpriority"),
             "revenue": pc.divide(pc.cast(cents, pa.float64()), pa.scalar(100.0)),
             "num_orders": t.column("num_orders")}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_REVENUE_BY_PRIORITY = """
WITH li AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_s4
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderpriority,
       CAST((sum(rev_s4) + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       count(*) AS num_orders
FROM li JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# distinct / set ops
# --------------------------------------------------------------------------

def q_distinct_segments(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_mktsegment"])
    return ds.groupby("c_mktsegment").count().drop_columns(["count()"])


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


# --------------------------------------------------------------------------
# min-max normalization (G7, two-phase)
# --------------------------------------------------------------------------

def q_minmax_normalize(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    stats = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    mn, mx = stats["min(o_totalprice)"], stats["max(o_totalprice)"]

    def norm(t: pa.Table) -> pa.Table:
        s = arrow_minmax_normalize_100(t.column("o_totalprice"), mn, mx)
        return pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "normalized_score_100": pc.round(s, 4)}
        )

    return ds.map_batches(norm, batch_format="pyarrow")


SQL_MINMAX_NORMALIZE = """
WITH stats AS (SELECT min(o_totalprice) mn, max(o_totalprice) mx FROM orders)
SELECT o_orderkey,
       round(greatest(1.0, least(100.0, 1 + ((o_totalprice - mn) / (mx - mn)) * 99)), 4)
         AS normalized_score_100
FROM orders, stats
"""


# --------------------------------------------------------------------------
# exact dedup (content hash)
# --------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    ds = read_docs(sf_dir, ["doc_id", "text"])
    return exact_dedup(ds, text_col="text", id_col="doc_id")


SQL_DEDUP_EXACT = """
SELECT CAST(min(doc_id) AS VARCHAR) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


# --------------------------------------------------------------------------
# tumbling-window aggregate over the events table
# --------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.strftime(pc.floor_temporal(t.column("ts"), unit="hour"),
                           format="%Y-%m-%d %H:00:00")
        t2 = pa.Table.from_pydict(
            {"event_type": t.column("event_type"), "hour": hour, "value": t.column("value")}
        )
        return t2.group_by(["event_type", "hour"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("value_sum", alias_name="sum_value"),
                   Sum("value_count", alias_name="n_events"))
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"event_type": t.column("event_type"), "hour": t.column("hour"),
             "sum_value": pc.round(t.column("sum_value"), 3),
             "n_events": t.column("n_events")}
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_HOURLY = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       round(sum(value), 3) AS sum_value, count(*) AS n_events
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

# Corpus-rebalance fixture: downsample the dominant 'en' stratum (the
# classic data-mixture rebalance); other languages keep everything.
SAMPLE_RATES = {"en": 0.3}
SAMPLE_DEFAULT_RATE = 1.0

# Decontamination fixture: word trigrams "from an eval benchmark" — four
# that really occur in the word-soup corpus plus one that cannot.
BENCHMARK_NGRAMS = [
    "stream table hash",
    "row column sort",
    "window fast query",
    "part filter scan",
    "heldout benchmark gram",
]


def q_stratified_sample(sf_dir: str):
    """Deterministic per-stratum hash sampling (stages/curation) — the
    corpus-rebalance op: md5-keyed keep decision, reproducible and
    resumable (identical sample on retry; never random())."""
    from semantic_search_system_ray.stages.curation import stratified_sample

    docs = read_docs(sf_dir, ["doc_id", "text", "lang"])
    out = stratified_sample(
        docs, key_col="lang", id_col="doc_id",
        rates=SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE,
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t.column("doc_id"), pa.string()),
             "lang": t.column("lang")}
        ),
        batch_format="pyarrow",
    )


def q_contamination(sf_dir: str):
    """Benchmark n-gram decontamination (stages/curation): flag docs
    sharing word trigrams with the broadcast benchmark set."""
    from semantic_search_system_ray.stages.curation import contamination_check

    docs = read_docs(sf_dir, ["doc_id", "text"])
    return contamination_check(docs, BENCHMARK_NGRAMS, n=3)


def q_events_percent_rank(sf_dir: str):
    """Per-group ``percent_rank()`` window function over the full events
    table — the rank-class window that naively needs a per-group global
    sort. Exact-at-scale shape: per-(group, value-cell) integer
    histograms (bounded by group-count × value domain, not row count)
    combine once; the per-group exclusive-CDF broadcasts via ray.put;
    every row's rank is then one vectorized searchsorted — no sort, no
    per-row shuffle. pct = count_less / (n−1) is a single int→double
    division, bit-equal to SQL ``percent_rank()`` (ties share a rank on
    both sides; the 2dp value↔cell bijection is the same contract the
    exact-quantile operators pin)."""
    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        t2 = pa.Table.from_pydict(
            {"event_type": t.column("event_type"), "cell": cents}
        )
        out = t2.group_by(["event_type", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["event_type", "cell", "n"])

    rows = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["event_type", "cell"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded by #groups × value domain
    )
    cdf: dict[str, tuple] = {}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["cell"], r["n"]))
    for et, cells in by_type.items():
        cells.sort()
        c = np.array([x[0] for x in cells], dtype=np.int64)
        n = np.array([x[1] for x in cells], dtype=np.int64)
        cum_before = np.concatenate([[0], np.cumsum(n)[:-1]])
        cdf[et] = (c, cum_before, int(n.sum()))
    ref = ray.put(cdf)

    def assign(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        pct = np.zeros(len(cents), dtype=np.float64)
        for et in np.unique(types):
            m = types == et
            c, cum_before, n = d[et]
            less = cum_before[np.searchsorted(c, cents[m], side="left")]
            if n > 1:
                pct[m] = less / (n - 1)
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "event_type": t.column("event_type"),
             "pct": pct}
        )

    return ev.map_batches(assign, batch_format="pyarrow")


SQL_EVENTS_PERCENT_RANK = """
SELECT event_id, event_type,
       percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pct
FROM events
"""


def q_daily_new_users(sf_dir: str):
    """Running DISTINCT count: per day, how many users appear for the
    first time, and the cumulative user count — the retention/growth
    analytic whose naive form (count(DISTINCT) over a window) rescans
    every prior day. Exact-at-scale shape: distinct is reduced to a
    per-user MIN (first-seen day) via coarse partitions (one shuffle,
    vectorized per partition), the per-day counts are partial-summed
    (#days is calendar-bounded), and only the tiny day table takes the
    driver-side cumulative sum."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    day_schema = pa.schema([("day", pa.string()), ("c", pa.int64())])

    def first_seen_days(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return day_schema.empty_table()
        fs = df.groupby("user_id", sort=False)["ts"].min()
        days = fs.dt.strftime("%Y-%m-%d").value_counts()
        return pa.Table.from_pydict(
            {"day": days.index.to_numpy(), "c": days.to_numpy()},
            schema=day_schema,
        )

    per_day = (
        coarse_partition_apply(ev, ["user_id"], first_seen_days, day_schema)
        .groupby("day")
        .aggregate(Sum("c", alias_name="new_users"))
    )
    rows = sorted(per_day.take_all(), key=lambda r: r["day"])  # calendar-bounded
    days = [r["day"] for r in rows]
    new = np.array([r["new_users"] for r in rows], dtype=np.int64)
    return pa.Table.from_pydict(
        {"day": pa.array(days, pa.string()),
         "new_users": pa.array(new, pa.int64()),
         "cum_users": pa.array(np.cumsum(new), pa.int64())}
    )


SQL_DAILY_NEW_USERS = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
d AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
"""


def q_customer_order_stats(sf_dir: str):
    """LEFT OUTER join (completing the join family: broadcast/inner
    cogroup/anti/asof/range are covered elsewhere): every customer with
    their order count and total spend, zeros for customers who never
    ordered. Fact side pre-aggregates per block (combiner) before the
    ONE coarse shuffle; money rides as scaled int64 cents
    (stages/util.coarse_attach how='left' + fill)."""
    from semantic_search_system_ray.stages.util import coarse_attach

    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict({"o_custkey": t.column("o_custkey"), "cents": cents})
        return t2.group_by(["o_custkey"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )

    agg = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("cents_count", alias_name="n_orders"),
            Sum("cents_sum", alias_name="spent_c"),
        )
    )
    joined_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("n_orders", pa.int64()), ("spent_c", pa.int64())]
    )
    joined = coarse_attach(
        cust, agg,
        left_key="c_custkey", right_key="o_custkey",
        attach_cols=["n_orders", "spent_c"],
        out_schema=joined_schema,
        how="left", fill={"n_orders": 0, "spent_c": 0},
    )
    return joined.map_batches(
        lambda t: pa.Table.from_pydict(
            {"c_custkey": t.column("c_custkey"), "c_name": t.column("c_name"),
             "n_orders": t.column("n_orders"),
             "total_spent": pc.divide(
                 pc.cast(t.column("spent_c"), pa.float64()), pa.scalar(100.0)
             )}
        ),
        batch_format="pyarrow",
    )


SQL_CUSTOMER_ORDER_STATS = """
SELECT c.c_custkey, c.c_name,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       coalesce(o.spent_c, 0) / 100.0 AS total_spent
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spent_c
  FROM orders GROUP BY o_custkey) o ON o.o_custkey = c.c_custkey
"""


CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def q_chunk_docs(sf_dir: str):
    """RAG-prep chunking: split every doc into overlapping token windows
    (size 32, stride 24) with deterministic chunk ids — the fan-out
    (flat_map) stage every retrieval pipeline runs before embedding.
    Doc-local → shuffle-free; output rows ≈ tokens/stride per doc.
    Chunk starts are the stride multiples below the token count, so the
    layout is a pure function of the text (reproducible on retry,
    joinable downstream)."""
    from semantic_search_system_ray.functions.text import tokenize

    docs = read_docs(sf_dir, ["doc_id", "text"])
    out_schema = pa.schema(
        [("doc_id", pa.string()), ("chunk_id", pa.int64()),
         ("n_tokens", pa.int64()), ("chunk_text", pa.string())]
    )

    def chunks(t: pa.Table) -> pa.Table:
        ids, cids, lens, texts = [], [], [], []
        for i, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = [w.lower() for w in tokenize(txt or "")]
            d = str(i)
            for c, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
                piece = toks[start : start + CHUNK_SIZE]
                ids.append(d)
                cids.append(c)
                lens.append(len(piece))
                texts.append(" ".join(piece))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()),
             "chunk_id": pa.array(cids, pa.int64()),
             "n_tokens": pa.array(lens, pa.int64()),
             "chunk_text": pa.array(texts, pa.string())},
            schema=out_schema,
        )

    return docs.map_batches(chunks, batch_format="pyarrow")


PMI_VOCAB_M = 40
PMI_TOP_K = 30
PMI_PPM = 1_000_000


def q_pmi_pairs(sf_dir: str):
    """Corpus collocation mining: top-K word pairs by PMI-style lift over
    the top-M document-frequency vocabulary — the classic two-pass
    co-occurrence analysis (count df → broadcast vocab → count pair
    co-occurrence) every corpus-linguistics pipeline needs.

    Scale shape: pass 1 is the proven word-count shape (per-block
    distinct-in-doc combiner → word groupby → tiny top-M sort); the M
    words broadcast via ray.put; pass 2 emits per-block pair-count
    partials over the ≤M·(M−1)/2 pair space (bounded — never
    corpus-sized) → one small groupby. The lift is computed in exact
    arbitrary-precision Python ints over the ≤780 final rows
    (lift_ppm = n_ab·N·1e6 // (n_a·n_b)), so no intermediate overflow at
    any corpus size; the SQL twin uses HUGEINT for the same products."""
    docs = read_docs(sf_dir, ["doc_id", "text"])
    from semantic_search_system_ray.functions.text import tokenize

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column("text").to_pylist():
            for w in {w.lower() for w in tokenize(txt or "")}:
                c[w] += 1
        return pa.Table.from_pydict(
            {"w": pa.array(list(c.keys()), pa.string()),
             "c": pa.array(list(c.values()), pa.int64())}
        )

    df_rows = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="df"))
        .sort(["df", "w"], descending=[True, False])
        .limit(PMI_VOCAB_M)
        .take_all()
    )
    vocab_df = {r["w"]: int(r["df"]) for r in df_rows}
    n_docs = docs.count()  # metadata-only on parquet
    ref = ray.put(frozenset(vocab_df))

    def pair_partial(t: pa.Table) -> pa.Table:
        vocab = ray.get(ref)
        c: Counter = Counter()
        for txt in t.column("text").to_pylist():
            ws = sorted({w.lower() for w in tokenize(txt or "")} & vocab)
            for i in range(len(ws)):
                for j in range(i + 1, len(ws)):
                    c[(ws[i], ws[j])] += 1
        keys = list(c.keys())
        return pa.Table.from_pydict(
            {"w_a": pa.array([k[0] for k in keys], pa.string()),
             "w_b": pa.array([k[1] for k in keys], pa.string()),
             "c": pa.array([c[k] for k in keys], pa.int64())}
        )

    pair_rows = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["w_a", "w_b"])
        .aggregate(Sum("c", alias_name="n_ab"))
        .take_all()  # bounded: ≤ M·(M−1)/2 rows
    )
    scored = []
    for r in pair_rows:
        n_a, n_b = vocab_df[r["w_a"]], vocab_df[r["w_b"]]
        n_ab = int(r["n_ab"])
        lift = n_ab * n_docs * PMI_PPM // (n_a * n_b)  # exact Python ints
        scored.append((r["w_a"], r["w_b"], n_ab, n_a, n_b, lift))
    scored.sort(key=lambda x: (-x[5], x[0], x[1]))
    top = scored[:PMI_TOP_K]
    return pa.Table.from_pydict(
        {"w_a": [x[0] for x in top], "w_b": [x[1] for x in top],
         "n_ab": pa.array([x[2] for x in top], pa.int64()),
         "n_a": pa.array([x[3] for x in top], pa.int64()),
         "n_b": pa.array([x[4] for x in top], pa.int64()),
         "lift_ppm": pa.array([x[5] for x in top], pa.int64())}
    )


def q_substring_dups(sf_dir: str):
    """Cross-document duplicated-substring detection (stages/curation.
    cross_doc_ngram_dups): per doc, how many distinct word 5-grams recur
    in other docs — the span-level self-dedup signal (Lee et al. 2021)."""
    from semantic_search_system_ray.stages.curation import cross_doc_ngram_dups

    return cross_doc_ngram_dups(read_docs(sf_dir, ["doc_id", "text"]), n=5)


def q_repetition(sf_dir: str):
    """Gopher-style intra-doc n-gram repetition metric (stages/curation):
    boilerplate/spam flagging for the curation suite."""
    from semantic_search_system_ray.stages.curation import repetition_score

    return repetition_score(read_docs(sf_dir, ["doc_id", "text"]), n=3)


def q_inverted_index(sf_dir: str):
    """Term → postings inverted-index materialization (stages/curation):
    the search-system core, as a first-class Dataset op."""
    from semantic_search_system_ray.stages.curation import build_inverted_index

    return build_inverted_index(read_docs(sf_dir, ["doc_id", "text"]))


def q_events_quantiles(sf_dir: str):
    """EXACT distributed quantiles via bounded-cardinality integer
    histograms (stages/sketch.exact_quantiles_histogram): per-block
    Arrow histograms combine into one global histogram sized by the
    VALUE DOMAIN (~10^4 cells for a 2dp metric), not the row count —
    exact p50/p90/p99 at any scale without a global sort."""
    from semantic_search_system_ray.stages.sketch import exact_quantiles_histogram

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    rows = exact_quantiles_histogram(ev, "value", [0.5, 0.9, 0.99])
    return pa.Table.from_pydict(
        {"q": [r[0] for r in rows], "value": [r[1] for r in rows]}
    )


SQL_EVENTS_QUANTILES = """
SELECT unnest([0.5, 0.9, 0.99]) AS q,
       unnest(quantile_disc(value, [0.5, 0.9, 0.99])) AS value
FROM events
"""


def q_events_quantiles_by_type(sf_dir: str):
    """Per-GROUP exact quantiles (grouped variant of the histogram
    trick): p50/p95 of event value per event_type."""
    from semantic_search_system_ray.stages.sketch import (
        exact_grouped_quantiles_histogram,
    )

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    cols = exact_grouped_quantiles_histogram(ev, "event_type", "value", [0.5, 0.95])
    return pa.Table.from_pydict(
        {"event_type": cols["group"], "q": cols["q"], "value": cols["value"]}
    )


SQL_EVENTS_QUANTILES_BY_TYPE = """
SELECT event_type,
       unnest([0.5, 0.95]) AS q,
       unnest(quantile_disc(value, [0.5, 0.95])) AS value
FROM events GROUP BY event_type
"""


def q_orders_topk_per_priority(sf_dir: str):
    """Per-GROUP top-k (windowed rank) with a combiner
    (stages/util.grouped_topk): top-3 orders by price per priority —
    each block pre-trims to its local per-group top-3, so only
    |groups|·k rows per block reach the final combine."""
    from semantic_search_system_ray.stages.util import grouped_topk

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
    )
    out = grouped_topk(
        ds, ["o_orderpriority"], ["o_totalprice", "o_orderkey"],
        descending=[True, False], k=3,
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"o_orderpriority": t.column("o_orderpriority"),
             "o_orderkey": t.column("o_orderkey"),
             "o_totalprice": pc.round(t.column("o_totalprice"), 2)}
        ),
        batch_format="pyarrow",
    )


SQL_ORDERS_TOPK_PER_PRIORITY = """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_corpus_clean(sf_dir: str):
    """The canonical training-data CURATION composition: exact dedup
    (min-id representative per distinct text) ∘ quality gate — the
    surviving corpus with provenance (n_copies, quality). Stages compose
    lazily: QualityScore actor map → exact_dedup (hash-only shuffle) →
    distributed semi join (coarse_attach) of quality onto the
    representatives; nothing materializes driver-side."""
    from semantic_search_system_ray.stages.dedup import exact_dedup
    from semantic_search_system_ray.stages.textstats import QualityScore
    from semantic_search_system_ray.stages.util import coarse_attach

    docs = read_docs(sf_dir, ["doc_id", "text"])
    reps = exact_dedup(docs)  # (doc_id: string, n_copies)
    quality = docs.map_batches(
        QualityScore, batch_format="pyarrow", concurrency=(1, 4)
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t.column("doc_id"), pa.string()),
             "quality": t.column("quality")}
        ),
        batch_format="pyarrow",
    )
    joined = coarse_attach(
        reps, quality, left_key="doc_id", right_key="doc_id",
        attach_cols=["quality"],
        out_schema=pa.schema(
            [("doc_id", pa.string()), ("n_copies", pa.int64()),
             ("quality", pa.float64())]
        ),
    )
    return joined.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("quality"), 0.68)),
        batch_format="pyarrow",
    )


def _sql_corpus_clean() -> str:
    """Compose the oracle from the SAME generated quality SQL the
    quality_score oracle uses — one formula, no drift."""
    from semantic_search_system_ray.pipelines.text_oracles import sql_quality_score

    return f"""
WITH q AS ({sql_quality_score()}),
reps AS (
  SELECT CAST(min(doc_id) AS VARCHAR) AS doc_id, count(*) AS n_copies
  FROM documents GROUP BY text
)
SELECT r.doc_id, r.n_copies, q.quality
FROM reps r JOIN q ON r.doc_id = CAST(q.doc_id AS VARCHAR)
WHERE q.quality >= 0.68
"""


SQL_CORPUS_CLEAN = _sql_corpus_clean()


def q_trigram_logprob(sf_dir: str):
    """Perplexity-style quality signal: per-doc mean add-one-smoothed log
    probability of its char trigrams under a model TRAINED ON THE CORPUS
    ITSELF (two passes: vocabulary-bounded count aggregation → broadcast →
    per-doc scoring). Low scores flag out-of-distribution / junk text —
    the KenLM-filtering shape without a model download."""
    import ray as ray_

    from semantic_search_system_ray.stages.textstats import (
        TrigramLogProb,
        trigram_model,
    )

    docs = read_docs(sf_dir, ["doc_id", "text"])
    model = trigram_model(docs)
    ref = ray_.put(model)
    return docs.map_batches(
        TrigramLogProb, fn_constructor_kwargs={"model_ref": ref},
        batch_format="pyarrow", concurrency=(1, 4),
    )


SQL_TRIGRAM_LOGPROB = """
WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(s) - 1),
                               i -> substr(s, CAST(i AS INT), 3))) AS gram
  FROM t WHERE len(s) >= 3
),
counts AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
tot AS (SELECT (SELECT count(*) FROM g) AS n, (SELECT count(*) FROM counts) AS v)
SELECT t.doc_id,
       coalesce(lp.v, 0.0) AS trigram_logprob
FROM t LEFT JOIN (
  SELECT g.doc_id,
         round(avg(ln((counts.c + 1.0) / (tot.n + tot.v))), 6) AS v
  FROM g JOIN counts USING (gram), tot
  GROUP BY g.doc_id
) lp ON t.doc_id = lp.doc_id
"""


def q_train_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split by id hash
    (stages/textstats.train_split_batch) — split assignment is a pure
    function of the id, so it survives reshuffles and corpus growth."""
    from semantic_search_system_ray.stages.textstats import train_split_batch

    ds = read_docs(sf_dir, ["doc_id"])
    return ds.map_batches(train_split_batch, batch_format="pyarrow")


def _sql_train_split() -> str:
    from semantic_search_system_ray.stages.textstats import SPLIT_BOUNDS

    (t_name, t_bound), (v_name, v_bound) = SPLIT_BOUNDS
    return f"""
SELECT doc_id,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{t_bound}' THEN '{t_name}'
            WHEN md5(CAST(doc_id AS VARCHAR)) < '{v_bound}' THEN '{v_name}'
            ELSE 'test' END AS split
FROM documents
"""


SQL_TRAIN_SPLIT = _sql_train_split()


# ---------------------------------------------------------------------------
# Deterministic domain-mixture sampling (training-data mixing)

MIX_MOD = 1_000_000  # ppm acceptance rates — integer arithmetic end to end


def _mix_weight(source: str) -> int:
    """Target mixture weight for a source: 1 + (trailing integer % 10).
    A pure function of the source NAME (no hard-coded domain dict), so
    the operator is scale-free: new sources at bigger corpora get
    well-defined weights without code changes."""
    m = re.search(r"(\d+)$", source)
    return 1 + (int(m.group(1)) % 10 if m else 0)


def q_domain_mix(sf_dir: str):
    """Reshape the corpus toward a target per-source mixture at half the
    corpus size: per-source target share ∝ _mix_weight(source), then a
    deterministic ppm-rate Bernoulli keep via md5_number_lower('mix-' ||
    doc_id) — the same hash on both engine and oracle sides, so the kept
    SET (not just counts) is reproducible under reshuffles and resumes
    (the property data-mixing needs: re-running the job keeps the same
    docs). Two passes: (1) per-block source-count combiners → tiny
    groupby; the per-source rate table is DOMAIN-BOUNDED (one row per
    source) and computed driver-side with pure integer arithmetic;
    (2) one streaming keep pass with per-block kept-count combiners.
    Returns the per-source summary (n_docs, weight, target, rate_ppm,
    kept_docs) — all int64, on the exact hash gate."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    docs = read_docs(sf_dir, ["doc_id", "source"])

    def src_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source"]).aggregate([("source", "count")])
        return pa.Table.from_pydict(
            {"source": g.column("source"),
             "n": pc.cast(g.column("source_count"), pa.int64())}
        )

    counts = (
        docs.map_batches(src_partial, batch_format="pyarrow")
        .groupby("source").sum("n")
    )
    n_by = {r["source"]: int(r["sum(n)"]) for r in counts.take_all()}
    total = sum(n_by.values())
    target_total = total // 2
    w_by = {s: _mix_weight(s) for s in n_by}
    sum_w = sum(w_by.values())
    t_by = {s: w_by[s] * target_total // sum_w for s in n_by}
    rate_by = {
        s: min(MIX_MOD, t_by[s] * MIX_MOD // n_by[s]) for s in n_by
    }

    def keep_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        kept: Counter[str] = Counter()
        for i, s in zip(ids, srcs):
            if md5_hash64(f"mix-{i}") % MIX_MOD < rate_by[s]:
                kept[s] += 1
        return pa.Table.from_pydict(
            {"source": pa.array(list(kept), pa.string()),
             "kept": pa.array([kept[s] for s in kept], pa.int64())}
        )

    kept_by = {
        r["source"]: int(r["sum(kept)"])
        for r in docs.map_batches(keep_partial, batch_format="pyarrow")
        .groupby("source").sum("kept").take_all()
    }
    order = sorted(n_by)
    return pa.table(
        {
            "source": pa.array(order, pa.string()),
            "n_docs": pa.array([n_by[s] for s in order], pa.int64()),
            "w": pa.array([w_by[s] for s in order], pa.int64()),
            "target_docs": pa.array([t_by[s] for s in order], pa.int64()),
            "rate_ppm": pa.array([rate_by[s] for s in order], pa.int64()),
            "kept_docs": pa.array(
                [kept_by.get(s, 0) for s in order], pa.int64()
            ),
        }
    )


def q_quality_prune(sf_dir: str):
    """Per-SOURCE adaptive quality pruning: keep docs whose whitespace
    token count is at or above their own source's EXACT lower median —
    the per-domain-threshold curation pattern (a global cutoff
    over-prunes verbose domains and under-prunes terse ones). Exact at
    any scale via the engine's bounded-cardinality histogram idiom: one
    streaming pass builds per-(source, n_tokens) count combiners (domain
    ≤ sources × distinct token counts — tiny, and independent of row
    count), the driver reads each source's median off the cumulative
    histogram with pure integer arithmetic, and a second streaming pass
    counts survivors against the broadcast thresholds. No sort, no
    row-scale shuffle, nothing corpus-sized on the driver."""
    docs = read_docs(sf_dir, ["doc_id", "source", "text"])

    def hist_partial(t: pa.Table) -> pa.Table:
        nt = pc.cast(
            pc.count_substring_regex(t.column("text"), pattern=r"\S+"),
            pa.int64(),
        )
        g = (
            pa.Table.from_pydict({"source": t.column("source"), "nt": nt})
            .group_by(["source", "nt"]).aggregate([("nt", "count")])
        )
        return pa.Table.from_pydict(
            {"source": g.column("source"), "nt": g.column("nt"),
             "c": pc.cast(g.column("nt_count"), pa.int64())}
        )

    hist = (
        docs.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["source", "nt"]).sum("c")
    )
    # domain-bounded collect: one row per (source, distinct token count)
    rows = sorted(
        (r["source"], int(r["nt"]), int(r["sum(c)"])) for r in hist.take_all()
    )
    n_by: dict[str, int] = Counter()
    for s, _nt, c in rows:
        n_by[s] += c
    med_by: dict[str, int] = {}
    cum: Counter[str] = Counter()
    for s, nt, c in rows:  # sorted by (source, nt) → cumulative is exact
        cum[s] += c
        if s not in med_by and cum[s] >= (n_by[s] + 1) // 2:
            med_by[s] = nt

    def kept_partial(t: pa.Table) -> pa.Table:
        nt = pc.cast(
            pc.count_substring_regex(t.column("text"), pattern=r"\S+"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        srcs = t.column("source").to_pylist()
        thr = np.array([med_by[s] for s in srcs], np.int64)
        kept: Counter[str] = Counter()
        for s in np.asarray(srcs, dtype=object)[nt >= thr]:
            kept[s] += 1
        return pa.Table.from_pydict(
            {"source": pa.array(list(kept), pa.string()),
             "kept": pa.array([kept[s] for s in kept], pa.int64())}
        )

    kept_by = {
        r["source"]: int(r["sum(kept)"])
        for r in docs.map_batches(kept_partial, batch_format="pyarrow")
        .groupby("source").sum("kept").take_all()
    }
    order = sorted(n_by)
    return pa.table(
        {
            "source": pa.array(order, pa.string()),
            "n_docs": pa.array([n_by[s] for s in order], pa.int64()),
            "median_tokens": pa.array([med_by[s] for s in order], pa.int64()),
            "kept_docs": pa.array([kept_by.get(s, 0) for s in order], pa.int64()),
        }
    )


SQL_QUALITY_PRUNE = r"""
WITH f AS (
  SELECT source, len(regexp_extract_all(text, '\S+')) AS nt FROM documents
),
n AS (SELECT source, count(*) AS n_docs FROM f GROUP BY source),
h AS (SELECT source, nt, count(*) AS c FROM f GROUP BY source, nt),
cum AS (
  SELECT source, nt,
         sum(c) OVER (PARTITION BY source ORDER BY nt) AS cc
  FROM h
),
med AS (
  SELECT c.source, min(c.nt) AS median_tokens
  FROM cum c JOIN n ON n.source = c.source
  WHERE c.cc >= (n.n_docs + 1) // 2
  GROUP BY c.source
),
k AS (
  SELECT f.source, count(*) AS kept_docs
  FROM f JOIN med m ON m.source = f.source
  WHERE f.nt >= m.median_tokens
  GROUP BY f.source
)
SELECT n.source, CAST(n.n_docs AS BIGINT) AS n_docs,
       CAST(m.median_tokens AS BIGINT) AS median_tokens,
       CAST(k.kept_docs AS BIGINT) AS kept_docs
FROM n JOIN med m ON m.source = n.source
       JOIN k ON k.source = n.source
"""


SQL_DOMAIN_MIX = rf"""
WITH n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
w AS (
  SELECT source, n_docs,
         1 + (CAST(coalesce(nullif(regexp_extract(source, '(\d+)$', 1), ''),
                            '0') AS BIGINT) % 10) AS w
  FROM n
),
r AS (
  SELECT source, n_docs, w,
         (w * ((SELECT sum(n_docs) FROM n) // 2))
           // (SELECT sum(w) FROM w) AS target_docs
  FROM w
),
rr AS (
  SELECT source, n_docs, w, target_docs,
         least({MIX_MOD}, target_docs * {MIX_MOD} // n_docs) AS rate_ppm
  FROM r
),
k AS (
  SELECT d.source, count(*) AS kept_docs
  FROM documents d JOIN rr ON rr.source = d.source
  WHERE md5_number_lower('mix-' || CAST(d.doc_id AS VARCHAR))
          % {MIX_MOD} < rr.rate_ppm
  GROUP BY d.source
)
SELECT rr.source, CAST(rr.n_docs AS BIGINT) AS n_docs,
       CAST(rr.w AS BIGINT) AS w,
       CAST(rr.target_docs AS BIGINT) AS target_docs,
       CAST(rr.rate_ppm AS BIGINT) AS rate_ppm,
       CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs
FROM rr LEFT JOIN k ON k.source = rr.source
"""


DSIR_TARGET = "src0"
DSIR_BUCKETS = 1024
DSIR_SCALE = 1_000_000
DSIR_TOP_K = 50


def q_dsir_weights(sf_dir: str):
    """DSIR-style hashed-ngram importance weights for training-data
    selection (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling", made integer-exact): hash word unigrams into
    ``DSIR_BUCKETS`` buckets with the md5 token hash the engine shares
    with DuckDB (functions/hashing.md5_hash64 == md5_number_lower), count
    each bucket in the TARGET domain (source = ``DSIR_TARGET``) and in
    the RAW pool (every other source), and score every raw doc by
    Σ_tokens ⌊(t[b]+1)·10⁶ / (r[b]+1)⌋ — an add-one-smoothed integer
    importance ratio, so the (score DESC, doc_id ASC) top-k is
    bit-deterministic cross-system. Reference analogue: the reference
    has no data-selection stage (its corpus is curated upstream); this
    is a beyond-reference curation operator like gopher_filter.

    Scale shape: pass 1 streams per-block (bucket, target?) count
    combiners into a ≤2·1024-row groupby (bounded by the BUCKET domain,
    never the corpus); the 1024-entry weight table broadcasts once via
    ray.put; pass 2 streams per-doc scores and keeps only each block's
    top-k, so the driver merges blocks × k candidate rows — no
    corpus-sized collection, no row-scale shuffle, no sort. int64 score
    bound: tokens/doc × max-weight ≈ 10³ × 10¹³ « 2⁶³ (holds to ~10¹²
    target tokens per bucket; past that raise DSIR_BUCKETS)."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    docs = read_docs(sf_dir, ["doc_id", "source", "text"])

    def bucket_partial(t: pa.Table) -> pa.Table:
        import re as _re

        tc: Counter = Counter()
        rc: Counter = Counter()
        memo: dict[str, int] = {}
        for src, txt in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            c = tc if src == DSIR_TARGET else rc
            for w in _re.findall(r"\w+", (txt or "").lower()):
                b = memo.get(w)
                if b is None:
                    b = memo[w] = md5_hash64(w) % DSIR_BUCKETS
                c[b] += 1
        bkts = sorted(set(tc) | set(rc))
        return pa.Table.from_pydict(
            {"bkt": pa.array(bkts, pa.int64()),
             "tc": pa.array([tc.get(b, 0) for b in bkts], pa.int64()),
             "rc": pa.array([rc.get(b, 0) for b in bkts], pa.int64())}
        )

    counts = (
        docs.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bkt").aggregate(Sum("tc", alias_name="t"),
                                  Sum("rc", alias_name="r"))
        .take_all()  # ≤ DSIR_BUCKETS rows — domain-bounded
    )
    weights = {
        int(r["bkt"]): ((int(r["t"]) + 1) * DSIR_SCALE) // (int(r["r"]) + 1)
        for r in counts
    }
    wref = ray.put(weights)

    def score_partial(t: pa.Table) -> pa.Table:
        import re as _re

        w = ray.get(wref)  # local object store, shipped once per node
        memo: dict[str, int] = {}
        out: list[tuple[int, int, int]] = []
        for did, src, txt in zip(
            t.column("doc_id").to_pylist(),
            t.column("source").to_pylist(),
            t.column("text").to_pylist(),
        ):
            if src == DSIR_TARGET:
                continue
            toks = _re.findall(r"\w+", (txt or "").lower())
            if not toks:
                continue  # SQL twin: zero-token docs never unnest a row
            s = 0
            for tok in toks:
                b = memo.get(tok)
                if b is None:
                    b = memo[tok] = md5_hash64(tok) % DSIR_BUCKETS
                s += w[b]
            out.append((did, s, len(toks)))
        out.sort(key=lambda x: (-x[1], x[0]))
        out = out[:DSIR_TOP_K]  # block-local top-k combiner
        return pa.Table.from_pydict(
            {"doc_id": pa.array([o[0] for o in out], pa.int64()),
             "dsir_score": pa.array([o[1] for o in out], pa.int64()),
             "n_tokens": pa.array([o[2] for o in out], pa.int64())}
        )

    cand = sorted(
        (
            (int(r["doc_id"]), int(r["dsir_score"]), int(r["n_tokens"]))
            for r in docs.map_batches(
                score_partial, batch_format="pyarrow"
            ).take_all()  # blocks × k rows — bounded
        ),
        key=lambda x: (-x[1], x[0]),
    )[:DSIR_TOP_K]
    return pa.table(
        {"doc_id": pa.array([c[0] for c in cand], pa.int64()),
         "dsir_score": pa.array([c[1] for c in cand], pa.int64()),
         "n_tokens": pa.array([c[2] for c in cand], pa.int64())}
    )


SQL_DSIR_WEIGHTS = rf"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '\w+')) AS w
  FROM documents
),
b AS (
  SELECT doc_id, source,
         CAST(md5_number_lower(w) % {DSIR_BUCKETS} AS BIGINT) AS bkt
  FROM tok
),
cnt AS (
  SELECT bkt,
         sum(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS t,
         sum(CASE WHEN source <> '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS r
  FROM b GROUP BY bkt
),
wts AS (
  SELECT bkt, (CAST(t + 1 AS HUGEINT) * {DSIR_SCALE}) // (r + 1) AS w
  FROM cnt
),
scores AS (
  SELECT b.doc_id, sum(w.w) AS score, count(*) AS n_tokens
  FROM b JOIN wts w USING (bkt)
  WHERE b.source <> '{DSIR_TARGET}'
  GROUP BY b.doc_id
)
SELECT doc_id, CAST(score AS BIGINT) AS dsir_score,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM scores
ORDER BY score DESC, doc_id
LIMIT {DSIR_TOP_K}
"""


def q_redact_pii(sf_dir: str):
    """PII scrub over the documents table (emails/phones/SSNs → tokens) —
    byte-exact vs the oracle because BOTH sides run the same patterns
    through RE2 (Arrow kernel / DuckDB regexp_replace)."""
    from semantic_search_system_ray.stages.textstats import redact_pii_batch

    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(redact_pii_batch, batch_format="pyarrow")


def _sql_redact_pii() -> str:
    from semantic_search_system_ray.stages.textstats import PII_PATTERNS

    expr = "text"
    for pattern, token in PII_PATTERNS:
        # DuckDB '...' literals are not backslash-escaped: only quotes double
        esc = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{esc}', '{token}', 'g')"
    return f"SELECT doc_id, {expr} AS text_redacted FROM documents"


SQL_REDACT_PII = _sql_redact_pii()


def q_token_count(sf_dir: str):
    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


SQL_TOKEN_COUNT = r"""
SELECT doc_id, len(regexp_extract_all(text, '\w+')) AS n_tokens FROM documents
"""


def q_gopher_filter(sf_dir: str):
    """Gopher-style quality-rule filter (stages/textstats
    .gopher_rules_batch): per-doc keep/reject with the FIRST failing
    rule as the reason — word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, alphabetic-word fraction, stopword presence.
    Integer-exact (cross-multiplied ratio comparisons, RE2 counts on
    both sides); one streaming map_batches pass, no shuffle."""
    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(gopher_rules_batch, batch_format="pyarrow")


def _sql_gopher_cte() -> str:
    """The gopher f/r CTE bodies, shared by SQL_GOPHER_FILTER and
    SQL_CURATION_E2E so the rule text has one source of truth."""
    from semantic_search_system_ray.stages.textstats import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    stop_expr = " + ".join(
        f"CAST(regexp_matches(text, '\\b{sw}\\b') AS BIGINT)"
        for sw in GOPHER_STOPWORDS
    )
    return rf"""f AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\S')) AS n_nonspace,
    len(regexp_extract_all(text, '#'))
      + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
    len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS n_alpha,
    ({stop_expr}) AS stop_hits
  FROM documents
), r AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
    CASE
      WHEN n_tokens < {GOPHER_MIN_WORDS}
        OR n_tokens > {GOPHER_MAX_WORDS} THEN 'word_count'
      WHEN n_nonspace < 3 * n_tokens
        OR n_nonspace > 10 * n_tokens THEN 'mean_word_len'
      WHEN 10 * n_sym > n_tokens THEN 'symbol_ratio'
      WHEN 5 * n_alpha < 4 * n_tokens THEN 'alpha_fraction'
      WHEN stop_hits < 2 THEN 'stopwords'
      ELSE 'ok'
    END AS reason
  FROM f
)"""


def _sql_gopher_filter() -> str:
    return rf"""
WITH {_sql_gopher_cte()}
SELECT doc_id, n_tokens, (reason = 'ok') AS keep, reason FROM r
"""


SQL_GOPHER_FILTER = _sql_gopher_filter()


def q_curation_e2e(sf_dir: str):
    """End-to-end training-data curation funnel, composed from the
    engine's own curation operators in documented precedence: (1) Gopher
    quality rules (first-failing reason), then among quality-kept docs
    (2) exact dedup (min-doc_id winner per distinct text), then (3)
    benchmark-trigram decontamination of the surviving winners — output
    is one row per INPUT doc with the first stage that dropped it
    ('gopher:<reason>' / 'exact_dup' / 'contaminated') or 'kept'.

    Scale shape: ONE fused streaming map_batches pass computes the
    Gopher reason (Arrow RE2 kernels), the contamination flag (benchmark
    grams broadcast once via ray.put) and a 128-bit content hash; the
    fused table (4 narrow columns, no text) is pinned with
    ``materialize()`` because two consumers read it (the
    heavy_hitters/build_bloom double-scan lesson). Gopher rejects never
    enter the exchange — their verdict is block-local; only quality-kept
    docs ship (doc_id, hash, contaminated) ≈ 50 bytes/doc through ONE
    hash-grouped shuffle where each text-group decides
    exact_dup / contaminated / kept. At 100 TB the exchange volume is
    independent of document length and the text column never moves."""
    from semantic_search_system_ray.functions.hashing import stable_hash128_hex
    from semantic_search_system_ray.stages.curation import benchmark_gram_matches
    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    bench_ref = ray.put(sorted(set(BENCHMARK_NGRAMS)))
    out_schema = pa.schema([("doc_id", pa.int64()), ("stage", pa.string())])

    class _Fused:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = gopher_rules_batch(batch)
            contam = benchmark_gram_matches(
                batch.column("text"), self.bench, n=3
            ).any(axis=1)
            hashes = [  # md5 is per-row by nature; grams/rules are RE2
                stable_hash128_hex(t or "")
                for t in batch.column("text").to_pylist()
            ]
            return pa.Table.from_pydict(
                {"doc_id": g.column("doc_id"),
                 "reason": g.column("reason"),
                 "contaminated": pa.array(contam),
                 "content_hash": pa.array(hashes, pa.string())}
            )

    docs = read_docs(sf_dir, ["doc_id", "text"])
    fused = docs.map_batches(
        _Fused, batch_format="pyarrow", concurrency=(1, 8)
    ).materialize()

    def reject_stage(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.not_equal(t.column("reason"), "ok"))
        stage = pc.binary_join_element_wise(
            pa.array(["gopher"] * len(t2), pa.string()), t2.column("reason"),
            ":",
        )
        return pa.Table.from_pydict(
            {"doc_id": t2.column("doc_id"), "stage": stage},
            schema=out_schema,
        )

    rejects = fused.map_batches(reject_stage, batch_format="pyarrow")

    ok = fused.map_batches(
        lambda t: t.filter(pc.equal(t.column("reason"), "ok")).select(
            ["doc_id", "contaminated", "content_hash"]
        ),
        batch_format="pyarrow",
    )

    def verdict_part(t: pa.Table) -> pa.Table:
        # whole-PARTITION vectorized verdict (hash groups are mostly
        # singletons — corpus-cardinality keys — so a per-group fn pays
        # one Python call per doc; this pays one lexsort per partition):
        # cluster rows by (hash, doc_id); the first row of each hash run
        # is the min-doc_id winner, everything else is exact_dup
        if t.num_rows == 0:
            return out_schema.empty_table()
        h = pc.dictionary_encode(
            t.column("content_hash").combine_chunks()
        ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        contam = t.column("contaminated").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        hs, iss, cs = h[order], ids[order], contam[order]
        first = np.ones(len(hs), bool)
        first[1:] = hs[1:] != hs[:-1]
        stage = np.where(
            first, np.where(cs, "contaminated", "kept"), "exact_dup"
        )
        return pa.Table.from_pydict(
            {"doc_id": iss, "stage": stage.astype(object)},
            schema=out_schema,
        )

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    survivors = coarse_partition_apply(
        ok, ["content_hash"], verdict_part, out_schema, fn_format="pyarrow"
    )
    return rejects.union(survivors)


def _sql_curation_e2e() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import _TOKEN_RE_SQL

    bench_values = ", ".join(
        "('" + g.replace("'", "''") + "')" for g in sorted(set(BENCHMARK_NGRAMS))
    )
    return rf"""
WITH {_sql_gopher_cte()},
okd AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN r ON d.doc_id = r.doc_id
  WHERE r.reason = 'ok'
),
w AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS winner
  FROM okd
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_RE_SQL}') AS ws
  FROM okd
),
contam AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, array_to_string(ws[i : i + 2], ' ') AS g
    FROM (
      SELECT doc_id, ws,
             unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i
      FROM toks WHERE len(ws) >= 3
    )
  ) JOIN (VALUES {bench_values}) AS b(g) USING (g)
)
SELECT r.doc_id,
  CASE WHEN r.reason <> 'ok' THEN 'gopher:' || r.reason
       WHEN r.doc_id <> w.winner THEN 'exact_dup'
       WHEN c.doc_id IS NOT NULL THEN 'contaminated'
       ELSE 'kept' END AS stage
FROM r
LEFT JOIN w ON r.doc_id = w.doc_id
LEFT JOIN contam c ON r.doc_id = c.doc_id
"""


SQL_CURATION_E2E = _sql_curation_e2e()


def q_word_topk(sf_dir: str):
    """Global top-50 words: per-batch Counter partials (combiner — the head
    word collapses to one row per batch regardless of skew), global sum,
    deterministic (cnt DESC, word ASC) top-k."""
    ds = read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        import re as _re

        for txt in t.column("text").to_pylist():
            c.update(_re.findall(r"\w+", (txt or "").lower()))
        return pa.Table.from_pydict(
            {"word": pa.array(list(c.keys()), pa.string()),
             "cnt": pa.array(list(c.values()), pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return counts.sort(["cnt", "word"], descending=[True, False]).limit(50)


SQL_WORD_TOPK = r"""
SELECT w AS word, count(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w FROM documents)
GROUP BY w ORDER BY cnt DESC, word LIMIT 50
"""


def q_lang_stats(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"lang": t.column("lang"), "n_docs": t.column("n_docs"),
             "avg_chars": pc.round(
                 pc.divide(pc.cast(t.column("total_chars"), pa.float64()),
                           pc.cast(t.column("n_docs"), pa.float64())), 2)}
        ),
        batch_format="pyarrow",
    )


SQL_LANG_STATS = """
SELECT lang, count(*) AS n_docs, round(sum(n_chars) * 1.0 / count(*), 2) AS avg_chars
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

def _query_vec(sf_dir: str) -> np.ndarray:
    emb = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    row = emb.map_batches(
        lambda t: t.filter(pc.equal(t.column("vec_id"), 0)), batch_format="pyarrow"
    ).take(1)[0]
    return np.asarray(row["embedding"], dtype=np.float64)


def q_ann_cosine(sf_dir: str):
    """Exact brute-force cosine top-10 vs the vec_id=0 embedding; score
    rounded to 4dp (float32 storage → float64 compute matches DuckDB)."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = cosine_topk(ds, _query_vec(sf_dir), k=10, round_to=4)
    return out


SQL_ANN_COSINE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(CAST(list_cosine_similarity(embedding, (SELECT qv FROM q)) AS DOUBLE), 4)
           AS score
  FROM embeddings
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""


def q_cosine_dups(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = embedding_cosine_dups(ds, threshold=0.4)
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"id_a": t.column("id_a"), "id_b": t.column("id_b"),
             "cos_sim": pc.round(t.column("cos_sim"), 3)}
        ),
        batch_format="pyarrow",
    )


SQL_COSINE_DUPS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 3)
         AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


# --------------------------------------------------------------------------
# anti join (broadcast key set)
# --------------------------------------------------------------------------

def q_customers_without_orders(sf_dir: str):
    """Customers with no order since 2000-01-01 — DISTRIBUTED anti join
    (stages/util.coarse_anti_join): both sides route by key hash into the
    same coarse partitions; the probe key set only ever exists
    per-partition (bounded), never on the driver. Probe keys are
    per-block distinct-ed before the shuffle (combiner)."""
    import datetime as dt

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey"],
        filter=(pc.field("o_orderdate") >= pa.scalar(dt.datetime(2000, 1, 1))),
    )
    cust = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    from semantic_search_system_ray.stages.util import coarse_anti_join

    return coarse_anti_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey",
        out_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
"""


# --------------------------------------------------------------------------
# substring search filter (query-side S13/T1 surface)
# --------------------------------------------------------------------------

def q_search_like(sf_dir: str):
    ds = read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t.filter(pc.match_substring(t.column("text"), "hash join")).column("doc_id")}
        ),
        batch_format="pyarrow",
    )


SQL_SEARCH_LIKE = """
SELECT doc_id FROM documents WHERE text LIKE '%hash join%'
"""


# --------------------------------------------------------------------------
# part / supplier coverage + set ops + per-group extrema
# --------------------------------------------------------------------------

def q_parts_by_brand(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_brand", "p_retailprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"p_brand": t.column("p_brand"),
             "price_c": pc.cast(pc.round(pc.multiply(t.column("p_retailprice"),
                                                     pa.scalar(100.0))), pa.int64())}
        )

    out = ds.map_batches(to_cents, batch_format="pyarrow").groupby("p_brand").aggregate(
        Count(alias_name="n_parts"), Sum("price_c", alias_name="price_c")
    )

    def finish(t: pa.Table) -> pa.Table:
        # integer half-away average to cents: (2·sum + n) // (2n), then one
        # bigint→double divide — bit-identical to the oracle
        n = t.column("n_parts")
        two = pa.scalar(2, pa.int64())
        avg_c = pc.divide(pc.add(pc.multiply(t.column("price_c"), two), n),
                          pc.multiply(two, n))
        return pa.Table.from_pydict(
            {"p_brand": t.column("p_brand"), "n_parts": n,
             "avg_price": pc.divide(pc.cast(avg_c, pa.float64()), pa.scalar(100.0))}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_PARTS_BY_BRAND = """
SELECT p_brand, count(*) AS n_parts,
       CAST((2 * sum(CAST(round(p_retailprice * 100) AS BIGINT)) + count(*))
            // (2 * count(*)) AS DOUBLE) / 100.0 AS avg_price
FROM part GROUP BY p_brand
"""


def q_supplier_topk(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_acctbal"])
    out = ds.sort(["s_acctbal", "s_suppkey"], descending=[True, False]).limit(5)
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"s_suppkey": t.column("s_suppkey"), "s_name": t.column("s_name"),
             "s_acctbal": pc.round(t.column("s_acctbal"), 2)}
        ),
        batch_format="pyarrow",
    )


SQL_SUPPLIER_TOPK = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 5
"""


def q_part_size_filter(sf_dir: str):
    ds = rd.read_parquet(
        _p(sf_dir, "part"),
        columns=["p_partkey", "p_name", "p_size"],
        filter=((pc.field("p_size") >= 10) & (pc.field("p_size") < 20)),
    )
    return ds


SQL_PART_SIZE_FILTER = """
SELECT p_partkey, p_name, p_size FROM part WHERE p_size >= 10 AND p_size < 20
"""


def q_union_names(sf_dir: str):
    """ds.union of two renamed sources (§2.7 set ops; UNION ALL semantics)."""
    r = rd.read_parquet(_p(sf_dir, "region"), columns=["r_name"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {"name": t.column("r_name"), "src": pa.array(["region"] * t.num_rows)}
        ),
        batch_format="pyarrow",
    )
    n = rd.read_parquet(_p(sf_dir, "nation"), columns=["n_name"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {"name": t.column("n_name"), "src": pa.array(["nation"] * t.num_rows)}
        ),
        batch_format="pyarrow",
    )
    return r.union(n)


SQL_UNION_NAMES = """
SELECT r_name AS name, 'region' AS src FROM region
UNION ALL
SELECT n_name AS name, 'nation' AS src FROM nation
"""


def q_events_extrema(sf_dir: str):
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Min("value", alias_name="min_value"), Max("value", alias_name="max_value")
    )
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"event_type": t.column("event_type"),
             "min_value": pc.round(t.column("min_value"), 4),
             "max_value": pc.round(t.column("max_value"), 4)}
        ),
        batch_format="pyarrow",
    )


SQL_EVENTS_EXTREMA = """
SELECT event_type, round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
FROM events GROUP BY event_type
"""


def q_orders_per_customer_topk(sf_dir: str):
    """Two-phase count per customer → deterministic top-20."""
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["o_custkey"]).aggregate([("o_custkey", "count")])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("o_custkey_count", alias_name="n_orders"))
    )
    return out.sort(["n_orders", "o_custkey"], descending=[True, False]).limit(20)


SQL_ORDERS_PER_CUSTOMER_TOPK = """
SELECT o_custkey, count(*) AS n_orders
FROM orders GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 20
"""


def q_sessionize(sf_dir: str):
    """Session windows over the events stream: per user, a new session
    starts when the gap to the previous event exceeds 30 minutes.

    Scale shape: user_id is a corpus-cardinality key, so this routes users
    into coarse partitions (stages/util.coarse_partition_apply — the ONLY
    groupby Ray sees has P groups) and runs the whole window computation
    VECTORIZED per partition: one sort + shift/diff + one pandas groupby,
    no per-user Python work."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()), ("n_sessions", pa.int64())]
    )

    def sessions(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff() > pd.Timedelta(minutes=30)
        starts = (new_user | gap).astype("int64")
        agg = (
            df.assign(__start=starts)
            .groupby("user_id", sort=False)
            .agg(n_events=("ts", "size"), n_sessions=("__start", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(agg, schema=out_schema, preserve_index=False)

    return coarse_partition_apply(ds, ["user_id"], sessions, out_schema)


SQL_SESSIONIZE = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN prev_ts IS NULL
                 OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions
FROM (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
GROUP BY user_id
"""


def q_events_sliding(sf_dir: str):
    """SLIDING time-window aggregate (beyond the tumbling q_events_hourly):
    per event_type, the 3-hour trailing sum of values at each hour bucket.
    Two-phase hourly partials (combiner) → the only shuffle is the tiny
    (type, hour) groupby → per-type vectorized window via cumsum +
    searchsorted (event_type cardinality is small, so a plain
    ``groupby.map_groups`` is the right tool — no coarse routing needed).

    Values are fixed-precision (2dp) → summed as SCALED INT64 cents, one
    bigint→double divide + round at the end, mirrored exactly by the SQL
    oracle — float partial sums are order-dependent under Ray's parallel
    aggregation and np.round is banker's vs DuckDB's half-away, the same
    last-ulp hash-flip class the money queries eliminated."""
    import numpy as np
    import pandas as pd

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        t2 = pa.Table.from_pydict(
            {"event_type": t.column("event_type"), "hour": hour, "cents": cents}
        )
        return t2.group_by(["event_type", "hour"]).aggregate([("cents", "sum")])

    hourly = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("cents_sum", alias_name="hour_cents"))
    )
    out_schema = pa.schema(
        [("event_type", pa.string()), ("hour", pa.string()),
         ("sliding_sum", pa.float64())]
    )

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour", kind="mergesort")
        hours = g["hour"].to_numpy()
        sums = g["hour_cents"].to_numpy().astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(sums)])
        lo = np.searchsorted(hours, hours - np.timedelta64(2, "h"), side="left")
        sliding_cents = csum[np.arange(1, len(sums) + 1)] - csum[lo]
        # one int→double divide; 2dp payload means round(x, 3) is exact on
        # both sides (identical doubles in engine and oracle)
        sliding = np.round(sliding_cents / 100.0, 3)
        return pd.DataFrame(
            {"event_type": g["event_type"],
             "hour": pd.Series(g["hour"]).dt.strftime("%Y-%m-%d %H:00:00"),
             "sliding_sum": sliding}
        )

    return ensure_schema(
        hourly.groupby("event_type").map_groups(window, batch_format="pandas"),
        out_schema,
    )


SQL_EVENTS_SLIDING = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       round(sum(sum(CAST(round(value * 100) AS BIGINT))) OVER (
             PARTITION BY event_type
             ORDER BY date_trunc('hour', ts)
             RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)
             / 100.0, 3)
         AS sliding_sum
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_orders_asof(sf_dir: str):
    """Backward AS-OF join (stages/util.coarse_asof_join — an operator Ray
    Data lacks): for every event, the date of the user's most recent order
    at-or-before the event timestamp. Right side pre-distincts to
    (custkey, date) so exact-tie payloads are deterministic (DuckDB ASOF
    picks an arbitrary row among ties, as documented on the operator)."""
    from semantic_search_system_ray.stages.util import coarse_asof_join

    events = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def dedup_dates(t: pa.Table) -> pa.Table:
        t = t.group_by(["o_custkey", "o_orderdate"]).aggregate([])
        return t.append_column(
            "last_order_date", pc.strftime(t.column("o_orderdate"), format="%Y-%m-%d")
        )

    right = orders.map_batches(dedup_dates, batch_format="pyarrow")
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("last_order_date", pa.string())]
    )
    return coarse_asof_join(
        events, right,
        left_key="user_id", right_key="o_custkey",
        left_on="ts", right_on="o_orderdate",
        out_schema=out_schema, right_cols=["last_order_date"],
    )


SQL_ORDERS_ASOF = """
SELECT e.event_id, e.user_id, strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_date
FROM events e ASOF JOIN
     (SELECT DISTINCT o_custkey, o_orderdate FROM orders) o
ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_purchase_click_window(sf_dir: str):
    """RANGE JOIN (another operator Ray Data lacks): per 'purchase' event,
    how many of the same user's 'click' events landed in the hour before
    it — the classic funnel-attribution interval join. One coarse-partition
    cogroup keyed by user; inside a partition the interval counting is
    fully vectorized — clicks collapse to a composite (key_code·C +
    ts_rel) sorted array and every purchase's window becomes two
    np.searchsorted probes. If the partition's time span is too wide for
    the composite (C = 2^(62-bitlen(n_keys)) µs), a per-key lexsorted
    fallback runs instead — correct at any span, checked in every run
    mode (not an assert)."""
    import numpy as np
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"],
        filter=(pc.field("event_type").isin(["purchase", "click"])),
    )
    union_schema = pa.schema(
        [("key", pa.int64()), ("ts", pa.timestamp("us")),
         ("event_id", pa.int64())]  # null event_id ⇒ click (probe side)
    )

    def tag(t: pa.Table) -> pa.Table:
        is_purchase = pc.equal(t.column("event_type"), "purchase")
        eid = pc.if_else(is_purchase, t.column("event_id"),
                         pa.nulls(t.num_rows, pa.int64()))
        return pa.Table.from_arrays(
            [t.column("user_id"), pc.cast(t.column("ts"), pa.timestamp("us")), eid],
            schema=union_schema,
        )

    combined = ds.map_batches(tag, batch_format="pyarrow")
    out_schema = pa.schema([("event_id", pa.int64()), ("n_clicks", pa.int64())])
    HOUR = np.int64(3_600_000_000)  # 1h in µs

    def count_window(df: pd.DataFrame) -> pa.Table:
        purch_mask = df["event_id"].notna().to_numpy()
        if not purch_mask.any() or purch_mask.all():
            return out_schema.empty_table()
        ts_all = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys, codes_all = np.unique(df["key"].to_numpy(), return_inverse=True)
        codes_all = codes_all.astype(np.int64)
        C = np.int64(1) << np.int64(62 - int(len(keys)).bit_length())
        rel = ts_all - ts_all.min() + HOUR  # keep window starts ≥ 0
        p_eids = df["event_id"].to_numpy()[purch_mask].astype(np.int64)
        if rel.max() < C:
            # fast path: (key, ts) packs into one int64 composite — two
            # global searchsorted probes cover every purchase
            composite = codes_all * C + rel
            click_comp = np.sort(composite[~purch_mask])
            p_comp = composite[purch_mask]
            lo = np.searchsorted(click_comp, p_comp - HOUR, side="left")
            hi = np.searchsorted(click_comp, p_comp, side="left")  # strictly before
        else:
            # composite would overflow (partition time span ≥ C given this
            # key cardinality) — fall back to per-key searchsorted over a
            # (code, ts)-lexsorted click array. Loud and correct in every
            # run mode (the old `assert` vanished under python -O).
            cl_codes = codes_all[~purch_mask]
            cl_ts = rel[~purch_mask]
            order = np.lexsort((cl_ts, cl_codes))
            cl_codes, cl_ts = cl_codes[order], cl_ts[order]
            p_codes = codes_all[purch_mask]
            p_ts = rel[purch_mask]
            blk_lo = np.searchsorted(cl_codes, p_codes, side="left")
            blk_hi = np.searchsorted(cl_codes, p_codes, side="right")
            lo = np.empty(len(p_ts), dtype=np.int64)
            hi = np.empty(len(p_ts), dtype=np.int64)
            for i in range(len(p_ts)):  # per-purchase probe, overflow regime only
                a, b = blk_lo[i], blk_hi[i]
                lo[i] = a + np.searchsorted(cl_ts[a:b], p_ts[i] - HOUR, side="left")
                hi[i] = a + np.searchsorted(cl_ts[a:b], p_ts[i], side="left")
        n = hi - lo
        keep = n > 0
        return pa.Table.from_pydict(
            {"event_id": p_eids[keep], "n_clicks": n[keep]},
            schema=out_schema,
        )

    return coarse_partition_apply(combined, ["key"], count_window, out_schema)


SQL_PURCHASE_CLICK_WINDOW = """
SELECT p.event_id, count(*) AS n_clicks
FROM events p JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


def q_user_running_sum(sf_dir: str):
    """Per-key ROW-frame window function: the running (cumulative) sum of
    event value per user in (ts, event_id) order — the
    ``SUM() OVER (PARTITION BY … ORDER BY … ROWS UNBOUNDED PRECEDING)``
    family, complementing the RANGE (sliding/asof) and session windows
    already covered.

    Scale shape: user_id is corpus-cardinality → coarse partitions route
    each user's rows together and the whole computation is ONE vectorized
    pass per partition (sort + pandas C-level groupby.cumsum), never
    per-user Python. Values are fixed 2dp → cumulated as scaled int64
    cents with a single int→double divide per row — float accumulation
    would be order-dependent under parallel execution."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.string()), ("running_sum", pa.float64())]
    )

    def running(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        run = pd.Series(cents).groupby(df["user_id"].to_numpy(), sort=False).cumsum()
        return pa.Table.from_pydict(
            {"event_id": df["event_id"].to_numpy(),
             "user_id": df["user_id"].to_numpy(),
             "ts": df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
             "running_sum": run.to_numpy() / 100.0},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], running, out_schema)


def q_doc_novelty(sf_dir: str):
    """Per-document NOVELTY score — the curation signal dual to
    repetition/near-dup checks: the fraction of a doc's distinct
    3-word shingles that appear in NO other document (df = 1 across
    the corpus). Boilerplate-heavy docs score near 0, genuinely novel
    text near 1. Shingling is byte-identical to the MinHash family
    (functions/hashing.word_shingles == the shared shing CTE text in
    text_oracles._sql_minhash_sig_band, so this op and the dedup twins
    can never disagree about what a shingle is).

    Scale shape: per-doc DISTINCT shingles stream out of one pass; ONE
    shingle-keyed coarse cogroup computes df and immediately folds to
    per-doc (uniq, total) PARTIALS inside the partition (gram-scale
    rows never leave twice); ONE doc-keyed coarse sum finishes. The
    single float divide is floor-half-away 6dp on both sides."""
    import pandas as pd

    from semantic_search_system_ray.functions.hashing import word_shingles
    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    K = 3
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    gram_schema = pa.schema([("s", pa.string()), ("d", pa.string())])

    def grams(t: pa.Table) -> pa.Table:
        ss, dd = [], []
        for i, txt in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            toks = [w.lower() for w in tokenize(txt or "")]
            for s in set(word_shingles(toks, K)):
                ss.append(s)
                dd.append(str(i))
        return pa.Table.from_pydict(
            {"s": pa.array(ss, pa.string()), "d": pa.array(dd, pa.string())},
            schema=gram_schema,
        )

    part_schema = pa.schema(
        [("d", pa.string()), ("uniq", pa.int64()), ("total", pa.int64())]
    )

    def df_fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        dfc = df.groupby("s", sort=False)["d"].transform("size")
        out = (
            pd.DataFrame({"d": df["d"], "u": (dfc == 1).astype(np.int64)})
            .groupby("d", sort=False)
            .agg(uniq=("u", "sum"), total=("u", "size"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            out, schema=part_schema, preserve_index=False
        )

    partials = coarse_partition_apply(
        ds.map_batches(grams, batch_format="pyarrow"),
        ["s"], df_fold, part_schema,
    )

    def doc_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        agg = (
            df.groupby("d", sort=False)[["uniq", "total"]].sum().reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=part_schema, preserve_index=False
        )

    per_doc = coarse_partition_apply(partials, ["d"], doc_sum, part_schema)

    out_schema = pa.schema(
        [("doc_id", pa.string()), ("n_shingles", pa.int64()),
         ("n_unique", pa.int64()), ("novelty", pa.float64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        total = t.column("total").to_numpy(zero_copy_only=False)
        uniq = t.column("uniq").to_numpy(zero_copy_only=False)
        nv = np.where(
            total > 0,
            np.floor(uniq.astype(np.float64) / total.astype(np.float64)
                     * 1e6 + 0.5) / 1e6,
            0.0,
        )
        return pa.Table.from_pydict(
            {"doc_id": t.column("d"), "n_shingles": total, "n_unique": uniq,
             "novelty": nv},
            schema=out_schema,
        )

    # LEFT-complete over every doc (zero-shingle docs emit 0/0/0.0):
    # union zero rows for all ids, dedup-preferring the real row via max
    ids = ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"d": pa.array([str(v) for v in t.column("doc_id").to_pylist()],
                           pa.string()),
             "uniq": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
             "total": pa.nulls(t.num_rows, pa.int64()).fill_null(0)},
            schema=part_schema,
        ),
        batch_format="pyarrow",
    )
    complete = coarse_partition_apply(
        per_doc.union(ids), ["d"], doc_sum, part_schema
    )
    return complete.map_batches(finish, batch_format="pyarrow")


SQL_DOC_NOVELTY = r"""
WITH doc AS (
  SELECT CAST(doc_id AS VARCHAR) AS d,
         regexp_extract_all(lower(text), '\w+(?:''\w+)?') AS ws
  FROM documents
),
pos AS (
  SELECT d, ws,
         unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
  FROM doc WHERE len(ws) >= 1
),
shing AS (
  SELECT DISTINCT d,
         CASE WHEN len(ws) < 3 THEN array_to_string(ws, ' ')
              ELSE array_to_string(ws[i : i + 2], ' ') END AS s
  FROM pos
),
dfc AS (SELECT s, count(*) AS df FROM shing GROUP BY s),
per AS (
  SELECT sh.d, count(*) AS total,
         count(*) FILTER (WHERE dfc.df = 1) AS uniq
  FROM shing sh JOIN dfc ON dfc.s = sh.s GROUP BY sh.d
)
SELECT dd.d AS doc_id,
       CAST(coalesce(p.total, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.uniq, 0) AS BIGINT) AS n_unique,
       CASE WHEN coalesce(p.total, 0) = 0 THEN 0.0
            ELSE floor(CAST(p.uniq AS DOUBLE) / CAST(p.total AS DOUBLE)
                       * 1000000 + 0.5) / 1000000
       END AS novelty
FROM doc dd LEFT JOIN per p ON p.d = dd.d
"""


def q_entropy_by_source(sf_dir: str):
    """Token Shannon entropy per source — the corpus-diversity signal
    curation pipelines use to catch template/boilerplate-dominated
    sources (low entropy = few distinct tokens dominate): H = ln N −
    (Σ_w n_w·ln n_w)/N in nats, over each source's token multiset.

    FP determinism: the Σ over words is accumulated in SORTED word
    order on BOTH sides (np.cumsum left fold == DuckDB list_sum over a
    word-ORDERED list — the bm25 pinning idiom; a hash-aggregate sum's
    order is unspecified and FP addition is non-associative), ln is the
    one shared libm, and the final round is the repo's floor(x·1e6+0.5)
    half-away idiom, never np.round-vs-SQL-round drift.

    Scale shape: per-block (source, word, n) Arrow count combiners →
    ONE coarse shuffle keyed by source (each source's vocabulary lands
    in one partition — vocabulary-bounded, not token-bounded); the
    per-partition fold is vectorized pandas + one cumsum per source."""
    import pandas as pd

    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    part_schema = pa.schema(
        [("source", pa.string()), ("w", pa.string()), ("n", pa.int64())]
    )

    def wc(t: pa.Table) -> pa.Table:
        srcs, words = [], []
        for s, txt in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            for w in tokenize((txt or "").lower()):
                srcs.append(s)
                words.append(w)
        if not srcs:
            return part_schema.empty_table()
        g = pa.Table.from_pydict(
            {"source": pa.array(srcs, pa.string()),
             "w": pa.array(words, pa.string())}
        ).group_by(["source", "w"]).aggregate([("w", "count")])
        return pa.Table.from_pydict(
            {"source": g.column("source"), "w": g.column("w"),
             "n": pc.cast(g.column("w_count"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("source", pa.string()), ("n_tokens", pa.int64()),
         ("entropy", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["source", "w"], sort=False)["n"].sum().reset_index()
        rows = []
        for src, g in agg.groupby("source", sort=False):
            g = g.sort_values("w", kind="mergesort")
            n = g["n"].to_numpy().astype(np.float64)
            s = np.cumsum(n * np.log(n))[-1]  # left fold in word order
            total = int(g["n"].sum())
            h = np.log(np.float64(total)) - s / np.float64(total)
            rows.append(
                (src, total, np.floor(h * 1e6 + 0.5) / 1e6)
            )
        rows.sort()
        return pa.Table.from_pydict(
            {"source": [r[0] for r in rows],
             "n_tokens": [r[1] for r in rows],
             "entropy": [r[2] for r in rows]},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ds.map_batches(wc, batch_format="pyarrow"), ["source"], fold,
        out_schema,
    )


SQL_ENTROPY_BY_SOURCE = r"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '\w+(?:''\w+)?')) AS w
  FROM documents
),
wc AS (SELECT source, w, count(*) AS n FROM toks GROUP BY source, w),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nn FROM wc GROUP BY source),
s AS (
  SELECT source,
         list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                       ORDER BY w)) AS sw
  FROM wc GROUP BY source
)
SELECT t.source, t.nn AS n_tokens,
       floor((ln(CAST(t.nn AS DOUBLE)) - s.sw / CAST(t.nn AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS entropy
FROM tot t JOIN s ON s.source = t.source
"""


def q_conversion_survival(sf_dir: str):
    """Kaplan-Meier SURVIVAL TABLE for signup→purchase conversion — the
    censoring-aware view of time-to-convert (q_conversion_lag drops
    non-converters; survival analysis keeps them as right-censored at
    the corpus horizon): per conversion day t, at_risk = users whose
    conversion-or-censor day ≥ t and deaths = conversions exactly at t.
    Emitting the EXACT integer (day, at_risk, deaths) triples instead
    of the Ŝ(t) product keeps the op on the hash gate (the KM product
    is an ordered float Π — consumers derive it in one pass).

    Scale shape: one tiny max(ts) aggregate (the censor horizon,
    broadcast by value), ONE user-keyed cogroup emitting per-user
    (day, converted) rows, then per-block (day, converted) count
    combiners → a day-domain-bounded driver fold (reverse cumsum =
    at_risk). Never row-scale on the driver."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    DAY_US = 86_400_000_000

    ev_all = rd.read_parquet(_p(sf_dir, "events"), columns=["ts"])
    mx_us = int(
        pc.cast(pa.scalar(ev_all.max("ts")), pa.timestamp("us")).cast(
            pa.int64()
        ).as_py()
    )

    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type").isin(["signup", "purchase"])),
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "is_signup": pc.equal(t.column("event_type"), "signup")}
        )

    per_user = pa.schema(
        [("day", pa.int64()), ("converted", pa.bool_()), ("n", pa.int64())]
    )

    def fold_user(df: pd.DataFrame) -> pa.Table:
        s = df[df["is_signup"]].groupby("user_id")["ts_us"].min()
        if s.empty:
            return per_user.empty_table()
        p = df[~df["is_signup"]].merge(
            s.rename("s_us"), left_on="user_id", right_index=True
        )
        p = p[p["ts_us"] >= p["s_us"]].reset_index(drop=True)
        fp = p.groupby("user_id")["ts_us"].min()
        conv = fp.reindex(s.index)
        day = np.where(
            conv.notna(),
            (conv.to_numpy() - s.to_numpy()) // DAY_US,
            (mx_us - s.to_numpy()) // DAY_US,
        ).astype(np.int64)
        out = (
            pd.DataFrame({"day": day, "converted": conv.notna().to_numpy()})
            .groupby(["day", "converted"], sort=False).size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(
            out, schema=per_user, preserve_index=False
        )

    parts = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"),
        ["user_id"], fold_user, per_user,
    ).take_all()  # day-domain-bounded (≤ 2·horizon rows per partition)

    agg: dict[tuple[int, bool], int] = {}
    for r in parts:
        key = (int(r["day"]), bool(r["converted"]))
        agg[key] = agg.get(key, 0) + int(r["n"])
    days = sorted({d for d, _c in agg})
    totals = np.array(
        [agg.get((d, True), 0) + agg.get((d, False), 0) for d in days],
        dtype=np.int64,
    )
    at_risk = totals[::-1].cumsum()[::-1]  # users with day >= t
    out_schema = pa.schema(
        [("day", pa.int64()), ("at_risk", pa.int64()), ("deaths", pa.int64())]
    )
    rows = [
        (d, int(at_risk[i]), agg.get((d, True), 0))
        for i, d in enumerate(days)
        if agg.get((d, True), 0) > 0
    ]
    return pa.Table.from_pydict(
        {"day": [r[0] for r in rows], "at_risk": [r[1] for r in rows],
         "deaths": [r[2] for r in rows]},
        schema=out_schema,
    )


SQL_CONVERSION_SURVIVAL = """
WITH mx AS (SELECT max(ts) AS m FROM events),
s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
  GROUP BY e.user_id
),
u AS (
  SELECT s.user_id,
         CASE WHEN p.p_ts IS NULL
              THEN (epoch_us((SELECT m FROM mx)) - epoch_us(s.s_ts))
                   // 86400000000
              ELSE (epoch_us(p.p_ts) - epoch_us(s.s_ts)) // 86400000000
         END AS day,
         p.p_ts IS NOT NULL AS converted
  FROM s LEFT JOIN p USING (user_id)
),
d AS (
  SELECT day,
         count(*) FILTER (WHERE converted) AS deaths,
         count(*) AS total
  FROM u GROUP BY day
),
w AS (
  SELECT day,
         CAST(sum(total) OVER (
           ORDER BY day DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS at_risk,
         CAST(deaths AS BIGINT) AS deaths
  FROM d
)
SELECT day, at_risk, deaths FROM w WHERE deaths > 0
"""


def q_rare_label_collapse(sf_dir: str):
    """Tail-category bucketing — the standard feature-engineering
    transform before one-hot/embedding layers: labels whose corpus
    count is below MIN_COUNT collapse to 'OTHER', everything else
    passes through. A per-ROW transform (one output row per part), not
    a rollup, so downstream joins keep working.

    Scale shape: label counts are vocabulary-bounded → one per-block
    count combiner pass + a tiny groupby collects the keep-set to the
    driver (|labels| rows, documented bound), which broadcasts into a
    stateless vectorized relabel map — zero row-scale shuffles."""
    MIN_COUNT = 70

    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_brand"])

    def cpart(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand"]).aggregate([("p_brand", "count")])
        return g.rename_columns(["p_brand", "n"])

    counts = (
        ds.map_batches(cpart, batch_format="pyarrow")
        .groupby("p_brand").sum("n").take_all()
    )  # vocabulary-bounded (25 brands)
    keep = {r["p_brand"] for r in counts if r["sum(n)"] >= MIN_COUNT}
    keep_arr = pa.array(sorted(keep), pa.string())

    def relabel(t: pa.Table) -> pa.Table:
        b = pc.cast(t.column("p_brand"), pa.string())
        lbl = pc.if_else(
            pc.is_in(b, value_set=keep_arr),
            b, pa.scalar("OTHER", pa.string()),
        )
        return pa.Table.from_pydict(
            {"p_partkey": t.column("p_partkey"), "p_brand": b, "label": lbl}
        )

    return ds.map_batches(relabel, batch_format="pyarrow")


SQL_RARE_LABEL_COLLAPSE = """
WITH c AS (SELECT p_brand, count(*) AS n FROM part GROUP BY p_brand)
SELECT p.p_partkey, p.p_brand,
       CASE WHEN c.n >= 70 THEN p.p_brand ELSE 'OTHER' END AS label
FROM part p JOIN c ON c.p_brand = p.p_brand
"""


def q_events_cusum(sf_dir: str):
    """Per-user CUSUM drift detection — the classic sequential
    change-point statistic data pipelines run to catch upward value
    drift: s_t = max(0, s_{t-1} + (x_t − K_REF)), alarm when the peak
    exceeds H. The recursion is ELIMINATED by the prefix-sum identity
    s_t = P_t − min(0, min_{i≤t} P_i) with P = running sum of
    (cents − K_REF), so both sides are two window scans + a max — no
    recursive CTE, no per-row Python. All arithmetic is int64 cents;
    order is (ts, event_id) like the other per-user window ops.

    Scale shape: ONE user-keyed coarse cogroup; inside the partition
    the whole computation is vectorized pandas (sort + groupby
    cumsum/cummin/max). Output: one row per user
    (user_id, cusum_stat, alarm)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    K_REF, H = 6000, 50000  # 60.00 drift allowance, 500.00 alarm level

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("cusum_stat", pa.int64()),
         ("alarm", pa.bool_())]
    )

    def cusum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        dev = (
            np.round(df["value"].to_numpy() * 100.0).astype(np.int64) - K_REF
        )
        g = df["user_id"].to_numpy()
        p = pd.Series(dev).groupby(g, sort=False).cumsum()
        cm = p.groupby(g, sort=False).cummin()
        s = p - np.minimum(cm, 0)
        stat = s.groupby(g, sort=False).max()
        users = stat.index.to_numpy().astype(np.int64)
        vals = stat.to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {"user_id": users, "cusum_stat": vals, "alarm": vals > H},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], cusum, out_schema)


SQL_EVENTS_CUSUM = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) - 6000 AS dev
  FROM events
),
p AS (
  SELECT user_id, ts, event_id,
         sum(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pp
  FROM d
),
s AS (
  SELECT user_id,
         pp - least(min(pp) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sv
  FROM p
)
SELECT user_id, CAST(max(sv) AS BIGINT) AS cusum_stat,
       max(sv) > 50000 AS alarm
FROM s GROUP BY user_id
"""


SQL_USER_RUNNING_SUM = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       sum(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         AS running_sum
FROM events
"""


def q_value_deciles(sf_dir: str):
    """Global quantile BUCKETING: assign every event to a decile by the
    exact corpus-wide value deciles, then aggregate per bucket — the
    threshold-ntile pattern (deterministic under ties, unlike SQL
    ``ntile()``, which splits equal values by physical row order:
    bucket := #thresholds strictly below the value).

    Scale shape: thresholds come from the bounded-cardinality integer
    histogram (exact at any row count, no global sort — see
    stages/sketch.exact_quantiles_histogram), are broadcast into a
    stateless vectorized assign (one np.searchsorted per batch), and the
    final groupby has ≤10 groups. Money-class sums ride as scaled int64
    cents with one int→double divide at the end."""
    from semantic_search_system_ray.stages.sketch import exact_quantiles_histogram

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    qs = [i / 10.0 for i in range(1, 10)]
    thresholds = np.array(
        [v for _q, v in exact_quantiles_histogram(ev, "value", qs)],
        dtype=np.float64,
    )

    def assign(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        dec = np.searchsorted(thresholds, v, side="left").astype(np.int64)
        cents = np.round(v * 100.0).astype(np.int64)
        t2 = pa.Table.from_pydict(
            {"decile": dec, "cents": cents, "value": t.column("value")}
        )
        return t2.group_by(["decile"]).aggregate(
            [("cents", "count"), ("cents", "sum"),
             ("value", "min"), ("value", "max")]
        )

    agg = (
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            Sum("cents_count", alias_name="n_events"),
            Sum("cents_sum", alias_name="sum_cents"),
            Min("value_min", alias_name="min_value"),
            Max("value_max", alias_name="max_value"),
        )
    )
    t = pa.Table.from_pylist(agg.take_all())  # ≤10 rows
    return pa.Table.from_pydict(
        {"decile": t.column("decile"),
         "n_events": t.column("n_events"),
         "sum_value": pc.divide(pc.cast(t.column("sum_cents"), pa.float64()),
                                pa.scalar(100.0)),
         "min_value": t.column("min_value"),
         "max_value": t.column("max_value")}
    )


SQL_VALUE_DECILES = """
WITH thr AS (
  SELECT quantile_disc(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS ts
  FROM events
)
SELECT (SELECT count(*) FROM unnest(thr.ts) AS u(t) WHERE e.value > t)
         AS decile,
       count(*) AS n_events,
       sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS sum_value,
       min(e.value) AS min_value,
       max(e.value) AS max_value
FROM events e, thr
GROUP BY 1
"""


# --------------------------------------------------------------------------
# round-3 continuation: LAG windows, grouping sets, pivot, mode, semi join,
# string_agg collect, INTERSECT, tf-idf ranking
# --------------------------------------------------------------------------

def q_events_lag_delta(sf_dir: str):
    """Per-key LAG window: microseconds since the user's previous event
    (``LAG(ts) OVER (PARTITION BY user ORDER BY ts)``) — the look-behind
    row-offset window family, complementing the running-sum (ROWS frame),
    sliding (RANGE) and session windows already covered.

    Scale shape: coarse partitions route each user's rows together; the
    delta is ONE vectorized pass per partition (mergesort + pandas
    C-level groupby.diff on int64 epoch-µs — integers, so no FP order
    dependence). First event per user yields a NULL delta on both
    sides."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.string()), ("delta_us", pa.int64())]
    )

    def lag(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # explicit µs view — pandas may hold either ns or us resolution
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        delta = pd.Series(us).groupby(df["user_id"].to_numpy(), sort=False).diff()
        return pa.Table.from_pydict(
            {"event_id": df["event_id"].to_numpy(),
             "user_id": df["user_id"].to_numpy(),
             "ts": df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
             "delta_us": pa.Array.from_pandas(delta, type=pa.int64())},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], lag, out_schema)


SQL_EVENTS_LAG_DELTA = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS delta_us
FROM events
"""


def q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, status): detail rows plus per-priority
    and grand-total super-aggregates, rolled-up levels marked 'ALL'.

    Scale shape: ONE distributed two-phase aggregate at the finest grain
    (priority × status ≤ 15 groups — bounded dimension cardinality, like
    lang_stats); the super-aggregate levels are derived on the driver
    from that bounded result, never from a second scan. Money sums ride
    as scaled int64 cents end-to-end."""
    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"priority": t.column("o_orderpriority"),
             "status": t.column("o_orderstatus"),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("o_totalprice"),
                                      pa.scalar(100.0))), pa.int64())}
        ).group_by(["priority", "status"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )

    base = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby(["priority", "status"])
        .aggregate(Sum("cents_count", alias_name="n_orders"),
                   Sum("cents_sum", alias_name="sum_cents"))
        .take_all()  # bounded: |priorities| × |statuses| ≤ 15 rows
    )
    rows = [(r["priority"], r["status"], r["n_orders"], r["sum_cents"])
            for r in base]
    by_p: dict[str, list[int]] = {}
    for p, _s, n, c in rows:
        acc = by_p.setdefault(p, [0, 0])
        acc[0] += n
        acc[1] += c
    rows += [(p, "ALL", n, c) for p, (n, c) in by_p.items()]
    rows.append(("ALL", "ALL", sum(n for _, (n, _c) in by_p.items()),
                 sum(c for _, (_n, c) in by_p.items())))
    return pa.Table.from_pydict(
        {"priority": pa.array([r[0] for r in rows], pa.string()),
         "status": pa.array([r[1] for r in rows], pa.string()),
         "n_orders": pa.array([r[2] for r in rows], pa.int64()),
         "total_price": pa.array([r[3] / 100.0 for r in rows], pa.float64())}
    )


SQL_ORDERS_ROLLUP = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(priority, status) — all four grouping sets (the
    rollup's sibling; completes the grouping-sets family). Same scale
    shape as q_orders_rollup: ONE distributed two-phase aggregate at the
    finest grain (≤15 bounded groups), every super-aggregate level
    derived on the driver from that bounded result — never a second
    scan. Money sums ride as scaled int64 cents end-to-end."""
    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"priority": t.column("o_orderpriority"),
             "status": t.column("o_orderstatus"),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("o_totalprice"),
                                      pa.scalar(100.0))), pa.int64())}
        ).group_by(["priority", "status"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )

    base = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby(["priority", "status"])
        .aggregate(Sum("cents_count", alias_name="n_orders"),
                   Sum("cents_sum", alias_name="sum_cents"))
        .take_all()  # bounded: |priorities| × |statuses| ≤ 15 rows
    )
    rows = [(r["priority"], r["status"], r["n_orders"], r["sum_cents"])
            for r in base]
    by_p: dict[str, list[int]] = {}
    by_s: dict[str, list[int]] = {}
    for p, s, n, c in rows:
        for key, acc in ((p, by_p), (s, by_s)):
            a = acc.setdefault(key, [0, 0])
            a[0] += n
            a[1] += c
    rows += [(p, "ALL", n, c) for p, (n, c) in by_p.items()]
    rows += [("ALL", s, n, c) for s, (n, c) in by_s.items()]
    rows.append(("ALL", "ALL", sum(n for n, _c in by_p.values()),
                 sum(c for _n, c in by_p.values())))
    return pa.Table.from_pydict(
        {"priority": pa.array([r[0] for r in rows], pa.string()),
         "status": pa.array([r[1] for r in rows], pa.string()),
         "n_orders": pa.array([r[2] for r in rows], pa.int64()),
         "total_price": pa.array([r[3] / 100.0 for r in rows], pa.float64())}
    )


SQL_ORDERS_CUBE = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


def q_median_price_by_priority(sf_dir: str):
    """Per-group INTERPOLATED median (``percentile_cont(0.5)`` — the
    continuous sibling of the quantile_disc family): same
    bounded-cardinality integer-histogram shape as
    exact_grouped_quantiles_histogram, but the driver picks BOTH
    straddling order statistics (ranks ⌈n/2⌉ and ⌊n/2⌋+1) and
    interpolates. (lo+hi) < 2^53 ⇒ the half-sum is an exactly
    representable double, so any interpolation formula (DuckDB's
    included) yields the same bits; the /100.0 descale is one IEEE
    divide on both sides. Driver cost is |groups|·|value domain| cells —
    for value domains beyond ~10^7 distinct cells, coarsen ``scale``
    (dollar instead of cent cells trade exactness for 100× fewer cells)
    or switch to iterative count-below bisection; this fixture's price
    domain fits."""
    ds = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        t2 = pa.Table.from_pydict(
            {"g": t.column("o_orderpriority"), "cell": cents}
        )
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    merged = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).sum("n")
    )
    by_g: dict = {}
    for r in merged.take_all():  # |groups| × |price domain| — bounded
        by_g.setdefault(r["g"], []).append((r["cell"], r["sum(n)"]))
    out_g, out_m = [], []
    for g in sorted(by_g, key=lambda x: (x is None, x)):
        cells = np.array([c for c, _ in by_g[g]], dtype=np.int64)
        counts = np.array([n for _, n in by_g[g]], dtype=np.int64)
        order = np.argsort(cells)
        cells, counts = cells[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        lo_rank, hi_rank = (n + 1) // 2, n // 2 + 1
        lo = int(cells[np.searchsorted(cum, lo_rank, side="left")])
        hi = int(cells[np.searchsorted(cum, hi_rank, side="left")])
        out_g.append(g)
        out_m.append(float(lo + hi) / 2.0 / 100.0)
    return pa.Table.from_pydict(
        {"priority": pa.array(out_g, pa.string()),
         "median_price": pa.array(out_m, pa.float64())}
    )


SQL_MEDIAN_PRICE_BY_PRIORITY = """
SELECT o_orderpriority AS priority,
       median(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
         AS median_price
FROM orders GROUP BY 1
"""


_PIVOT_PRIORITIES = [
    ("1-URGENT", "n_urgent"), ("2-HIGH", "n_high"), ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_notspec"), ("5-LOW", "n_low"),
]


def q_orders_pivot(sf_dir: str):
    """PIVOT / crosstab: order counts per year with one column per
    priority (the fixed TPC-H priority domain — pivot requires a known
    column domain on both sides, so it is declared, not discovered).

    Scale shape: per-batch Arrow (year, priority) combiner → global
    groupby over ≤ years×5 groups; the driver only reshapes that bounded
    result into wide columns (missing cells fill 0, matching FILTER)."""
    ds = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
             "priority": t.column("o_orderpriority")}
        ).group_by(["year", "priority"]).aggregate([("priority", "count")])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["year", "priority"])
        .aggregate(Sum("priority_count", alias_name="n"))
        .take_all()  # bounded: |years| × 5 rows
    )
    cells = {(r["year"], r["priority"]): r["n"] for r in counts}
    years = sorted({y for y, _p in cells})
    cols: dict[str, list[int]] = {"year": years}
    for pval, cname in _PIVOT_PRIORITIES:
        cols[cname] = [cells.get((y, pval), 0) for y in years]
    return pa.Table.from_pydict(
        {k: pa.array(v, pa.int64()) for k, v in cols.items()}
    )


SQL_ORDERS_PIVOT = """
SELECT year(o_orderdate) AS year,
       count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
       count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
       count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
       count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
FROM orders
GROUP BY year(o_orderdate)
"""


def q_user_top_event(sf_dir: str):
    """Per-group MODE (argmax aggregate): each user's most frequent event
    type, ties broken lexicographically — the ``row_number()=1`` /
    ``arg_max`` family over a corpus-cardinality group key.

    Scale shape: per-batch Arrow (user, type) combiner collapses the
    stream to ≤ users×5 partial rows BEFORE any shuffle; the partials
    then ride ONE coarse cogroup keyed on user (never Ray's ~25µs/group
    native groupby at user cardinality) where each user's ≤5×blocks rows
    are summed and argmaxed in pandas."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")]
        ).rename_columns(["user_id", "event_type", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()), ("cnt", pa.int64())]
    )

    def top1(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("event_type", sort=False)["cnt"].sum().reset_index()
        agg = agg.sort_values(["cnt", "event_type"], ascending=[False, True],
                              kind="mergesort").head(1)
        return pa.Table.from_pydict(
            {"user_id": pa.array([int(g["user_id"].iloc[0])], pa.int64()),
             "event_type": pa.array([agg["event_type"].iloc[0]], pa.string()),
             "cnt": pa.array([int(agg["cnt"].iloc[0])], pa.int64())}
        )

    return coarse_grouped_apply(partials, ["user_id"], top1, out_schema)


SQL_USER_TOP_EVENT = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type, cnt FROM r WHERE rn = 1
"""


def q_suppliers_with_sales(sf_dir: str):
    """Distributed SEMI join (EXISTS): suppliers with at least one
    lineitem shipped in 1997 — the keep-matching complement of the anti
    join (customers_without_orders).

    Scale shape: the probe side is pruned at the read (two columns +
    shipdate row-group filter), collapsed to distinct keys per block by
    an Arrow combiner, and semi-joined via ONE coarse cogroup
    (coarse_attach inner — duplicate right keys carry identical payload,
    the documented deterministic-pick contract)."""
    import datetime as dt

    from semantic_search_system_ray.stages.util import coarse_attach

    sup = rd.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_acctbal"]
    )
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_suppkey", "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(dt.datetime(1997, 1, 1)))
            & (pc.field("l_shipdate") < pa.scalar(dt.datetime(1998, 1, 1)))
        ),
    )

    def distinct_keys(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"l_suppkey": t.column("l_suppkey").unique(),
             "hit": pa.array(
                 [1] * len(t.column("l_suppkey").unique()), pa.int64())}
        )

    keys = li.map_batches(distinct_keys, batch_format="pyarrow")
    out_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("s_acctbal", pa.float64()), ("hit", pa.int64())]
    )
    joined = coarse_attach(
        sup, keys, left_key="s_suppkey", right_key="l_suppkey",
        attach_cols=["hit"], out_schema=out_schema, how="inner",
    )
    return joined.select_columns(["s_suppkey", "s_name", "s_acctbal"])


SQL_SUPPLIERS_WITH_SALES = """
SELECT s_suppkey, s_name, s_acctbal FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01')
"""


def q_brand_types(sf_dir: str):
    """Grouped collect / ``string_agg``: per brand the sorted distinct
    part types serialized 'a;b;c' — the list-collect shape the KG
    adjacency sink uses, here on the driver hard gate.

    Scale shape: per-block Arrow distinct-pair combiner, then ONE coarse
    cogroup keyed on brand; each group is deduped + sorted + joined in
    pandas/Python over its (bounded: |types|) distinct rows."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    ds = rd.read_parquet(_p(sf_dir, "part"), columns=["p_brand", "p_type"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["p_brand", "p_type"]).aggregate([])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    out_schema = pa.schema(
        [("brand", pa.string()), ("types", pa.string()), ("n_types", pa.int64())]
    )

    def collect(g: pd.DataFrame) -> pa.Table:
        types = sorted(set(g["p_type"]))
        return pa.Table.from_pydict(
            {"brand": pa.array([g["p_brand"].iloc[0]], pa.string()),
             "types": pa.array([";".join(types)], pa.string()),
             "n_types": pa.array([len(types)], pa.int64())}
        )

    return coarse_grouped_apply(pairs, ["p_brand"], collect, out_schema)


SQL_BRAND_TYPES = """
SELECT p_brand AS brand,
       string_agg(p_type, ';' ORDER BY p_type) AS types,
       count(*) AS n_types
FROM (SELECT DISTINCT p_brand, p_type FROM part)
GROUP BY p_brand
"""


def q_nations_both(sf_dir: str):
    """Set INTERSECT (completing the §2.7 family next to UNION and
    EXCEPT/anti): nation keys present in BOTH customer and supplier.

    Scale shape: each side collapses to per-block distinct keys with an
    Arrow combiner, then the two bounded key sets meet in ONE coarse
    cogroup (inner attach) — no driver set, no native groupby."""
    from semantic_search_system_ray.stages.util import coarse_attach

    def side(table: str, col: str) -> rd.Dataset:
        ds = rd.read_parquet(_p(sf_dir, table), columns=[col])

        def distinct(t: pa.Table) -> pa.Table:
            u = pc.cast(t.column(col).unique(), pa.int64())
            return pa.Table.from_pydict({"nationkey": u, "one": pa.array([1] * len(u), pa.int64())})

        return ds.map_batches(distinct, batch_format="pyarrow")

    cust = side("customer", "c_nationkey")
    supp = side("supplier", "s_nationkey")
    out_schema = pa.schema([("nationkey", pa.int64()), ("one", pa.int64())])
    met = coarse_attach(
        cust, supp, left_key="nationkey", right_key="nationkey",
        attach_cols=["one"], out_schema=out_schema, how="inner",
    )

    def dedup(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"nationkey": t.column("nationkey").unique()})

    # per-block duplicates survive the combiner; collapse inside the
    # partition (keys are already co-located by the attach shuffle)
    return met.map_batches(dedup, batch_format="pyarrow", batch_size=None)


SQL_NATIONS_BOTH = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top-3 terms by tf·idf (idf = ln(N/df)) — the
    classic relevance weighting underneath the BM25 stage, as a
    corpus-statistics + per-doc ranking pipeline.

    Scale shape: pass 1 computes document frequency with a per-batch
    set-of-terms combiner → small groupby (vocabulary is Heaps-law
    sublinear; guarded at 2M terms like the entity-link vocabulary —
    beyond that the idf must be attached by key join, not broadcast);
    the idf dict is broadcast once via ray.put and pass 2 is doc-LOCAL:
    tf, scoring and top-3 all inside one map_batches, zero shuffle.
    Scores stay raw float64 — both sides compute tf·ln(N/df) from the
    same integers with one libm ln and one multiply, so the bits match
    (the BM25-established determinism contract)."""
    import math
    import re as _re

    ds = read_docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata only

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for txt in t.column("text").to_pylist():
            c.update(set(_re.findall(r"\w+", (txt or "").lower())))
        return pa.Table.from_pydict(
            {"term": pa.array(list(c.keys()), pa.string()),
             "df": pa.array(list(c.values()), pa.int64())}
        )

    df_rows = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .take_all()
    )
    if len(df_rows) > 2_000_000:
        raise ValueError(
            "vocabulary too large to broadcast idf; attach idf by term "
            "key join (stages/util.coarse_map_column) instead"
        )
    idf = {r["term"]: math.log(n_docs / r["df"]) for r in df_rows}
    idf_ref = ray.put(idf)

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("rank", pa.int64()),
         ("term", pa.string()), ("score", pa.float64())]
    )

    class Score:
        def __init__(self):
            self.idf = ray.get(idf_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            doc_ids, ranks, terms, scores = [], [], [], []
            for did, txt in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
                tf = Counter(_re.findall(r"\w+", (txt or "").lower()))
                scored = [(term, n * self.idf[term]) for term, n in tf.items()]
                scored.sort(key=lambda kv: (-kv[1], kv[0]))
                for rank, (term, s) in enumerate(scored[:3], 1):
                    doc_ids.append(did)
                    ranks.append(rank)
                    terms.append(term)
                    scores.append(s)
            return pa.Table.from_pydict(
                {"doc_id": pa.array(doc_ids, pa.int64()),
                 "rank": pa.array(ranks, pa.int64()),
                 "term": pa.array(terms, pa.string()),
                 "score": pa.array(scores, pa.float64())},
                schema=out_schema,
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 8))


SQL_TFIDF_TOP_TERMS = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
), s AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n / df.df) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM s
)
SELECT doc_id, rank, term, score FROM r WHERE rank <= 3
"""


def q_events_json_stats(sf_dir: str):
    """Semi-structured field extraction: pull the integer ``k`` out of the
    ``props`` JSON column and aggregate it per event type — the
    json_extract / payload-parsing family (reference M8 parses LLM JSON
    the same way: functions/parsing.py).

    Scale shape: extraction is ONE vectorized RE2 kernel per batch
    (``pc.extract_regex`` — the props payloads are flat
    ``{"k": <int>}`` objects, pinned by the oracle; a general nested
    payload would route through functions/parsing.parse_json_lenient),
    followed by a per-batch Arrow combiner and a ≤5-group global agg."""
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.Table.from_pydict(
            {"event_type": t.column("event_type"), "k": k}
        ).group_by(["event_type"]).aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("k_count", alias_name="n"),
            Sum("k_sum", alias_name="sum_k"),
            Min("k_min", alias_name="min_k"),
            Max("k_max", alias_name="max_k"),
        )
    )


SQL_EVENTS_JSON_STATS = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def q_cov_qty_price(sf_dir: str):
    """Statistical aggregate: sample covariance of (quantity, price) per
    returnflag, EXACT — the moment sums ride as arbitrary-precision
    Python ints serialized to decimal strings in the per-batch partials
    (Σ(cents·qty) overflows int64 near 1e12 rows, so a fixed-width
    shuffle column can't carry it at corpus scale), tree-combined on the
    driver over the bounded (#blocks × |flags|) partial rows. The final
    covariance is ONE int→double cast per operand and one IEEE divide,
    mirrored exactly by the oracle's HUGEINT→DOUBLE casts."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    partial_schema = pa.schema(
        [("flag", pa.string()), ("n", pa.int64()), ("sx", pa.string()),
         ("sy", pa.string()), ("sxy", pa.string())]
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = np.round(t.column("l_quantity").to_numpy(zero_copy_only=False)).astype(np.int64)
        cents = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        flags = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        rows = {"flag": [], "n": [], "sx": [], "sy": [], "sxy": []}
        for f in np.unique(flags):
            sel = flags == f
            q, c = qty[sel], cents[sel]
            rows["flag"].append(str(f))
            rows["n"].append(int(sel.sum()))
            rows["sx"].append(str(int(q.sum())))
            rows["sy"].append(str(int(c.sum())))
            rows["sxy"].append(str(int((q * c).sum())))
        return pa.Table.from_pydict(rows, schema=partial_schema)

    acc: dict[str, list[int]] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["flag"], [0, 0, 0, 0])
        a[0] += r["n"]
        a[1] += int(r["sx"])
        a[2] += int(r["sy"])
        a[3] += int(r["sxy"])
    out = {"flag": [], "n": [], "cov_qty_price": []}
    for f in sorted(acc):
        n, sx, sy, sxy = acc[f]
        out["flag"].append(f)
        out["n"].append(n)
        out["cov_qty_price"].append(
            float(n * sxy - sx * sy) / float(n * (n - 1) * 100)
            if n > 1 else None
        )
    return pa.Table.from_pydict(
        {"flag": pa.array(out["flag"], pa.string()),
         "n": pa.array(out["n"], pa.int64()),
         "cov_qty_price": pa.array(out["cov_qty_price"], pa.float64())}
    )


SQL_COV_QTY_PRICE = """
WITH s AS (
  SELECT l_returnflag AS flag, count(*) AS n,
         sum(CAST(round(l_quantity) AS HUGEINT)) AS sx,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT flag, n,
       CASE WHEN n > 1 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * (n - 1) * 100 AS DOUBLE)
       END AS cov_qty_price
FROM s
"""


def q_user_first_event(sf_dir: str):
    """``first_value`` / ``DISTINCT ON``: each user's earliest event
    (type + timestamp, (ts, event_id) order) — the per-group argmin
    family next to mode (user_top_event) and top-k.

    Scale shape: a per-block combiner (pandas mergesort + C-level
    groupby.head(1)) collapses every block to ≤|users-in-block| rows
    before any shuffle; the survivors ride ONE coarse cogroup keyed on
    user where the same argmin picks the global first. All comparisons
    are on (timestamp, int) — total order, no FP."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_grouped_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def local_first(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        return pa.Table.from_pandas(
            df.groupby("user_id", sort=False).head(1), schema=t.schema,
            preserve_index=False,
        )

    firsts = ds.map_batches(local_first, batch_format="pyarrow")
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("first_type", pa.string()),
         ("first_ts", pa.string())]
    )

    def pick(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").head(1)
        return pa.Table.from_pydict(
            {"user_id": pa.array([int(g["user_id"].iloc[0])], pa.int64()),
             "first_type": pa.array([g["event_type"].iloc[0]], pa.string()),
             "first_ts": pa.array(
                 g["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"), pa.string())},
            schema=out_schema,
        )

    return coarse_grouped_apply(firsts, ["user_id"], pick, out_schema)


SQL_USER_FIRST_EVENT = """
WITH r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type AS first_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
FROM r WHERE rn = 1
"""


def _exact_sq_sum(c: np.ndarray) -> int:
    """Exact Σc² for int64 ``c`` (|c| < 2^40) WITHOUT leaving vectorized
    int64 math: cents² ≈ 1e14 per row overflows int64 near 1e5-row
    blocks, so split c = h·K + l (K = 2^20, 0 ≤ l < K — numpy floor
    division/mod keep the identity for negative c) and combine
    K²Σh² + 2KΣhl + Σl² in arbitrary-precision Python int. Each term
    is < 2^40, so int64 partial sums are exact for slices up to 2^22
    rows; larger arrays accumulate slice-wise (the Python-int total
    never overflows)."""
    K = 1 << 20
    h, l = c // K, c % K
    total = 0
    step = 1 << 22
    for i in range(0, len(c), step):
        hh, ll = h[i:i + step], l[i:i + step]
        total += (
            K * K * int((hh * hh).sum()) + 2 * K * int((hh * ll).sum())
            + int((ll * ll).sum())
        )
    return total


def q_corr_qty_price(sf_dir: str):
    """Pearson correlation of (quantity, price) per returnflag — the
    corr/cov statistical-aggregate family shares the exact-int moment
    pattern (q_cov_qty_price): per-batch partials of
    (n, Σx, Σy, Σx², Σy², Σxy) ride as arbitrary-precision Python ints
    serialized to decimal strings (Σ(cents²) overflows int64 far below
    corpus scale), tree-combined on the driver over the bounded
    (#blocks × |flags|) partial rows. The final value is ONE double cast
    per exact-int operand and the IEEE expression
    num / (sqrt(dx)·sqrt(dy)) — sqrt/mul/div are correctly-rounded IEEE
    on both sides, mirrored by the oracle's HUGEINT→DOUBLE casts."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    partial_schema = pa.schema(
        [("flag", pa.string()), ("n", pa.int64()), ("sx", pa.string()),
         ("sy", pa.string()), ("sxx", pa.string()), ("syy", pa.string()),
         ("sxy", pa.string())]
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = np.round(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cents = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        flags = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        rows = {k: [] for k in ("flag", "n", "sx", "sy", "sxx", "syy", "sxy")}
        for f in np.unique(flags):
            sel = flags == f
            q, c = qty[sel], cents[sel]
            rows["flag"].append(str(f))
            rows["n"].append(int(sel.sum()))
            rows["sx"].append(str(int(q.sum())))
            rows["sy"].append(str(int(c.sum())))
            # qty² ≤ 2500 → Σ safe in int64; cents² needs the exact
            # split accumulation (overflows int64 near 1e5-row blocks)
            rows["sxx"].append(str(int((q * q).sum())))
            rows["syy"].append(str(_exact_sq_sum(c)))
            rows["sxy"].append(str(int((q * c).sum())))
        return pa.Table.from_pydict(rows, schema=partial_schema)

    import math

    acc: dict[str, list[int]] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["flag"], [0, 0, 0, 0, 0, 0])
        a[0] += r["n"]
        for i, k in enumerate(("sx", "sy", "sxx", "syy", "sxy")):
            a[i + 1] += int(r[k])
    out = {"flag": [], "n": [], "corr_qty_price": []}
    for f in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[f]
        num, dx, dy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        out["flag"].append(f)
        out["n"].append(n)
        out["corr_qty_price"].append(
            float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
            if n > 1 and dx > 0 and dy > 0 else None
        )
    return pa.Table.from_pydict(
        {"flag": pa.array(out["flag"], pa.string()),
         "n": pa.array(out["n"], pa.int64()),
         "corr_qty_price": pa.array(out["corr_qty_price"], pa.float64())}
    )


SQL_CORR_QTY_PRICE = """
WITH s AS (
  SELECT l_returnflag AS flag, count(*) AS n,
         sum(CAST(round(l_quantity) AS HUGEINT)) AS sx,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_quantity) AS HUGEINT)) AS sxx,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy,
         sum(CAST(round(l_quantity) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT flag, n,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr_qty_price
FROM s
"""


def q_zscore_normalize(sf_dir: str):
    """Per-group z-score normalization (the standardization sibling of
    q_minmax_normalize): each order's totalprice standardized against its
    priority group's sample mean/std. Two-phase: per-batch exact-int cent
    moments per priority (bounded groups — decimal-string partials like
    the cov/corr family), driver combine → per-group (μ, σ) as ONE
    double expression each, broadcast by closure; the row pass is a
    vectorized (x−μ)/σ over the group-code gather. Both μ, σ and the
    per-row expression are mirrored op-for-op by the oracle (IEEE
    sub/div + correctly-rounded sqrt ⇒ bit-equal doubles)."""
    import math

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    partial_schema = pa.schema(
        [("pri", pa.string()), ("n", pa.int64()), ("sx", pa.string()),
         ("sxx", pa.string())]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        rows = {"pri": [], "n": [], "sx": [], "sxx": []}
        for p in np.unique(pri):
            sel = pri == p
            c = cents[sel]
            rows["pri"].append(str(p))
            rows["n"].append(int(sel.sum()))
            rows["sx"].append(str(int(c.sum())))
            rows["sxx"].append(str(_exact_sq_sum(c)))
        return pa.Table.from_pydict(rows, schema=partial_schema)

    acc: dict[str, list[int]] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["pri"], [0, 0, 0])
        a[0] += r["n"]
        a[1] += int(r["sx"])
        a[2] += int(r["sxx"])
    stats: dict[str, tuple[float, float]] = {}
    for p, (n, sx, sxx) in acc.items():
        if n > 1 and n * sxx - sx * sx > 0:
            mu = float(sx) / float(n)
            sd = math.sqrt(float(n * sxx - sx * sx) / float(n * (n - 1)))
            stats[p] = (mu, sd)

    def zrow(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        )
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pri, return_inverse=True)
        mu = np.array([stats.get(p, (np.nan, np.nan))[0] for p in uniq])
        sd = np.array([stats.get(p, (np.nan, np.nan))[1] for p in uniq])
        z = (cents - mu[inv]) / sd[inv]
        mask = ~np.isnan(z)
        return pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "pri": t.column("o_orderpriority"),
             "zscore": pa.array(
                 np.where(mask, z, np.nan), pa.float64(),
                 mask=~mask)}
        )

    return ds.map_batches(zrow, batch_format="pyarrow")


SQL_ZSCORE_NORMALIZE = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority AS pri,
         CAST(round(o_totalprice * 100) AS HUGEINT) AS cents
  FROM orders
),
s AS (SELECT pri, count(*) AS n, sum(cents) AS sx,
             sum(cents * cents) AS sxx
      FROM c GROUP BY 1)
SELECT o_orderkey, pri,
       CASE WHEN n > 1 AND n * sxx - sx * sx > 0 THEN
         (CAST(cents AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                / CAST(n * (n - 1) AS DOUBLE))
       END AS zscore
FROM c JOIN s USING (pri)
"""


def q_events_orders_outer(sf_dir: str):
    """FULL OUTER join — completes the join family (inner / left /
    semi / anti / as-of / range): purchase-event counts per user vs
    urgent-order counts per customer over the shared id domain, keeping
    ids present on EITHER side (both sides contribute unmatched rows on
    this fixture). Shape: per-block Arrow count combiners collapse each
    side to ≤|ids-in-block| partial rows tagged (id, n_events, n_orders)
    with zeros for the other side; the union rides ONE coarse cogroup
    where a pandas C-level group-sum realizes the outer semantics —
    missing side = its zero contribution (the SQL COALESCE(…, 0))."""
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "event_type"])
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]
    )
    out_schema = pa.schema(
        [("id", pa.int64()), ("n_events", pa.int64()), ("n_orders", pa.int64())]
    )

    # Null-id policy (explicit, mirrored by the oracle's IS NOT NULL):
    # null ids are dropped on BOTH sides. Without the filters the engine
    # and SQL would silently diverge — Arrow's count skips nulls and
    # pandas groupby drops the null group, while SQL GROUP BY keeps a
    # null group whose COALESCE'd id stays null.
    def ev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.equal(t.column("event_type"), "purchase"),
                    pc.is_valid(t.column("user_id")))
        )
        g = t.group_by(["user_id"]).aggregate([("user_id", "count")])
        n = g.num_rows
        return pa.Table.from_pydict(
            {"id": pc.cast(g.column("user_id"), pa.int64()),
             "n_events": pc.cast(g.column("user_id_count"), pa.int64()),
             "n_orders": pa.nulls(n, pa.int64()).fill_null(0)},
            schema=out_schema,
        )

    def ord_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.equal(t.column("o_orderpriority"), "1-URGENT"),
                    pc.is_valid(t.column("o_custkey")))
        )
        g = t.group_by(["o_custkey"]).aggregate([("o_custkey", "count")])
        n = g.num_rows
        return pa.Table.from_pydict(
            {"id": pc.cast(g.column("o_custkey"), pa.int64()),
             "n_events": pa.nulls(n, pa.int64()).fill_null(0),
             "n_orders": pc.cast(g.column("o_custkey_count"), pa.int64())},
            schema=out_schema,
        )

    both = ev.map_batches(ev_partial, batch_format="pyarrow").union(
        orders.map_batches(ord_partial, batch_format="pyarrow")
    )

    def sum_part(df) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = (
            df.groupby("id", sort=False)[["n_events", "n_orders"]]
            .sum().reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=out_schema, preserve_index=False
        )

    return coarse_partition_apply(both, ["id"], sum_part, out_schema)


SQL_EVENTS_ORDERS_OUTER = """
WITH e AS (SELECT user_id AS id, count(*) AS n_events
           FROM events
           WHERE event_type = 'purchase' AND user_id IS NOT NULL
           GROUP BY 1),
c AS (SELECT o_custkey AS id, count(*) AS n_orders
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL
      GROUP BY 1)
SELECT COALESCE(e.id, c.id) AS id,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(n_orders, 0) AS n_orders
FROM e FULL OUTER JOIN c ON e.id = c.id
"""


def q_user_retention(sf_dir: str):
    """Cohort retention — the funnel/retention analytics family: users
    cohorted by their FIRST event date; a user is retained if any event
    lands in [first_ts + 1 day, first_ts + 8 days). All per-user work
    happens inside ONE coarse cogroup on user_id (min-ts + window flag,
    vectorized pandas per partition) emitting bounded per-partition
    cohort partials; the global roll-up is a tiny groupby over ~60
    cohort dates. Timestamp-only comparisons — no FP."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    part_schema = pa.schema(
        [("cohort_date", pa.string()), ("n_users", pa.int64()),
         ("n_retained", pa.int64())]
    )

    def per_part(df: "pd.DataFrame") -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        first = (
            df.groupby("user_id", sort=False)["ts"].min()
            .rename("first_ts").reset_index()
        )
        m = df.merge(first, on="user_id")
        day = pd.Timedelta(days=1)
        ret = (
            (m["ts"] >= m["first_ts"] + day)
            & (m["ts"] < m["first_ts"] + 8 * day)
        ).astype(np.int64)
        per_user = (
            pd.DataFrame(
                {"user_id": m["user_id"], "first_ts": m["first_ts"],
                 "ret": ret}
            )
            .groupby("user_id", sort=False)
            .agg(first_ts=("first_ts", "first"), ret=("ret", "max"))
            .reset_index()
        )
        per_user["cohort_date"] = per_user["first_ts"].dt.strftime("%Y-%m-%d")
        agg = (
            per_user.groupby("cohort_date", sort=False)
            .agg(n_users=("user_id", "size"), n_retained=("ret", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=part_schema, preserve_index=False
        )

    partials = coarse_partition_apply(ev, ["user_id"], per_part, part_schema)
    return partials.groupby("cohort_date").aggregate(
        Sum("n_users", alias_name="n_users"),
        Sum("n_retained", alias_name="n_retained"),
    )


SQL_USER_RETENTION = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
r AS (
  SELECT f.user_id, f.first_ts,
         max(CASE WHEN e.ts >= f.first_ts + INTERVAL 1 DAY
                   AND e.ts < f.first_ts + INTERVAL 8 DAY
              THEN 1 ELSE 0 END) AS ret
  FROM f JOIN events e ON e.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT strftime(CAST(first_ts AS DATE), '%Y-%m-%d') AS cohort_date,
       count(*) AS n_users, CAST(sum(ret) AS BIGINT) AS n_retained
FROM r GROUP BY 1
"""


def q_user_moving_sum(sf_dir: str):
    """Bounded ROWS-frame window (moving sum over the last 3 events per
    user, (ts, event_id) order) — the finite-frame sibling of
    q_user_running_sum's unbounded frame. One coarse cogroup on user_id;
    inside each partition the frame sum is a vectorized shifted-cumsum
    (no per-row Python). Values ride as scaled int64 cents; the final
    /100.0 descale is the only FP op, mirrored by the oracle."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("moving_sum", pa.float64())]
    )

    def per_part(df: "pd.DataFrame") -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        users = df["user_id"].to_numpy()
        idx = np.arange(len(cents))
        is_start = np.concatenate([[True], users[1:] != users[:-1]])
        # frame start = max(row - 2, first row of this user): the frame
        # never crosses a user boundary
        start_idx = np.maximum.accumulate(np.where(is_start, idx, 0))
        lo = np.maximum(idx - 2, start_idx)
        cum0 = np.concatenate([[0], np.cumsum(cents)])
        win = cum0[idx + 1] - cum0[lo]
        return pa.Table.from_pydict(
            {"event_id": df["event_id"].to_numpy().astype(np.int64),
             "moving_sum": win.astype(np.float64) / 100.0},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], per_part, out_schema)


SQL_USER_MOVING_SUM = """
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id,
       sum(cents) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0 AS moving_sum
FROM c
"""


def q_orders_dense_rank(sf_dir: str):
    """Per-group DENSE_RANK (price rank within priority, descending) —
    the gap-free sibling of q_events_percent_rank, same no-sort shape:
    the bounded distinct (priority, cents) value table is aggregated
    once, the per-priority sorted value arrays broadcast by closure, and
    the row pass is one vectorized searchsorted per batch — no global
    sort, no per-row Python."""
    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def distinct_cells(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {"pri": t.column("o_orderpriority"), "cents": cents}
        ).group_by(["pri", "cents"]).aggregate([])

    cells = (
        ds.map_batches(distinct_cells, batch_format="pyarrow")
        .groupby(["pri", "cents"]).count()
        .take_all()  # |priorities| × |distinct prices| — bounded
    )
    by_pri: dict[str, list[int]] = {}
    for r in cells:
        by_pri.setdefault(r["pri"], []).append(r["cents"])
    sorted_vals = {p: np.sort(np.array(v, dtype=np.int64))
                   for p, v in by_pri.items()}

    def rank_rows(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        out = np.empty(len(cents), dtype=np.int64)
        for p in np.unique(pri):
            sel = pri == p
            vals = sorted_vals[p]
            # dense rank DESC = #distinct strictly greater + 1
            out[sel] = len(vals) - np.searchsorted(vals, cents[sel], "left")
        return pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "pri": t.column("o_orderpriority"),
             "price_rank": pa.array(out, pa.int64())}
        )

    return ds.map_batches(rank_rows, batch_format="pyarrow")


SQL_ORDERS_DENSE_RANK = """
SELECT o_orderkey, o_orderpriority AS pri,
       CAST(dense_rank() OVER (
         PARTITION BY o_orderpriority
         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC
       ) AS BIGINT) AS price_rank
FROM orders
"""


def q_rag_ingest(sf_dir: str):
    """The reference's web-RAG loader shape (S17, app.py:131-175:
    fetch → parse → clean → chunkable rows) with the NETWORK stub
    replaced by deterministic synthesized HTML payloads — the parse +
    clean stages are the real M2/M1 contract (functions/parsing
    .extract_html_body + functions/text.clean_text_ingest), here as
    fully VECTORIZED RE2 kernels (one pc.extract_regex /
    replace_substring_regex chain per batch, no per-row Python);
    per-row parity with the reference per-doc function is pinned by
    tests (test_functions.test_rag_ingest_kernel_parity)."""
    docs = read_docs(sf_dir, ["doc_id", "text"])

    def parse(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.string())
        html = pc.binary_join_element_wise(
            "<html><h1>Doc ", ids,
            '</h1><p>nav chrome</p><div class="press-release__body">',
            t.column("text"), "</div></html>", "",
        )
        title, content = extract_html_kernel(html)
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "title": title,
             "content": content}
        )

    return docs.map_batches(parse, batch_format="pyarrow")


def extract_html_kernel(html):
    """Vectorized (RE2) twin of functions/parsing.extract_html_body +
    clean_text_ingest: → (title, content) arrays. Parity with the
    per-row reference function is pytest-pinned."""
    tm = pc.extract_regex(html, r"(?is)<h1[^>]*>(?P<g>.*?)</h1>")
    title = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.coalesce(pc.struct_field(tm, "g"), ""), r"<[^>]+>", ""
        )
    )
    bm = pc.extract_regex(
        html,
        r'(?is)<div[^>]*class="[^"]*(?:press-release__body'
        r'|page__content)[^"]*"[^>]*>(?P<g>.*?)</div>',
    )
    raw = pc.replace_substring_regex(
        pc.coalesce(pc.struct_field(bm, "g"), ""), r"<[^>]+>", " "
    )
    content = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.replace_substring_regex(raw, r"[^a-zA-Z0-9\s]", ""),
            r"\s+", " ",
        )
    )
    return title, content


SQL_RAG_INGEST = r"""
WITH h AS (
  SELECT doc_id,
         '<html><h1>Doc ' || CAST(doc_id AS VARCHAR)
         || '</h1><p>nav chrome</p><div class="press-release__body">'
         || text || '</div></html>' AS html
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(
         coalesce(regexp_extract(html, '(?is)<h1[^>]*>(.*?)</h1>', 1), ''),
         '<[^>]+>', '', 'g')) AS title,
       trim(regexp_replace(regexp_replace(
         regexp_replace(
           coalesce(regexp_extract(html,
             '(?is)<div[^>]*class="[^"]*(?:press-release__body|page__content)[^"]*"[^>]*>(.*?)</div>',
             1), ''),
           '<[^>]+>', ' ', 'g'),
         '[^a-zA-Z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS content
FROM h
"""


# Token budget per packed training sequence (pack_sequences).
SEQ_TOKEN_BUDGET = 512


def q_pack_sequences(sf_dir: str):
    """Sequence packing for LLM pretraining: assign docs (in doc_id
    order) to fixed token-budget training sequences — doc d lands in
    sequence floor(prefix_tokens_before(d) / BUDGET). The engine shape is
    a DISTRIBUTED ORDERED PREFIX SUM: doc_ids are RANGE-partitioned
    (p = doc_id // width, width from max id / P so ranges align with the
    global order); pass 1 computes per-range token subtotals (P bounded
    rows to the driver), an exclusive scan over them yields each range's
    global starting offset, broadcast by closure; pass 2 is one
    partition-parallel pass — sort the range by doc_id, local exclusive
    cumsum + range offset = the global prefix, all int64. The oracle is
    the equivalent single window sum (ROWS UNBOUNDED PRECEDING … 1
    PRECEDING)."""
    from semantic_search_system_ray.stages.util import (
        _default_partitions,
        coarse_partition_apply,
    )

    docs = read_docs(sf_dir, ["doc_id", "text"])
    toks = docs.map_batches(
        token_count_batch, batch_format="pyarrow"
    ).materialize()
    max_id = toks.max("doc_id")
    P = _default_partitions(toks)
    width = max(1, (int(max_id) + P) // P)

    def with_range(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return pa.Table.from_pydict(
            {"doc_id": ids,
             "n_tokens": t.column("n_tokens"),
             "rng": pc.divide(ids, width)}
        )

    ranged = toks.map_batches(with_range, batch_format="pyarrow")

    # pass 1: per-range subtotals (≤P rows) → driver exclusive scan
    def subtotal(t: pa.Table) -> pa.Table:
        g = t.group_by(["rng"]).aggregate([("n_tokens", "sum")])
        return pa.Table.from_pydict(
            {"rng": g.column("rng"),
             "sub": pc.cast(g.column("n_tokens_sum"), pa.int64())}
        )

    totals: dict[int, int] = {}
    for r in ranged.map_batches(subtotal, batch_format="pyarrow").take_all():
        totals[int(r["rng"])] = totals.get(int(r["rng"]), 0) + int(r["sub"])
    offsets: dict[int, int] = {}
    run = 0
    for rng in sorted(totals):
        offsets[rng] = run
        run += totals[rng]

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("seq_id", pa.int64())]
    )

    # pass 2: hash-routing on rng still co-locates each range; a
    # partition may hold several ranges — handled groupwise
    def assign(df) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        parts = []
        for rng, g in df.groupby("rng", sort=True):
            g = g.sort_values("doc_id", kind="mergesort")
            ntok = g["n_tokens"].to_numpy().astype(np.int64)
            prev = offsets[int(rng)] + np.concatenate(
                [[0], np.cumsum(ntok)[:-1]]
            )
            parts.append(
                pa.Table.from_pydict(
                    {"doc_id": g["doc_id"].to_numpy().astype(np.int64),
                     "n_tokens": ntok,
                     "seq_id": prev // SEQ_TOKEN_BUDGET},
                    schema=out_schema,
                )
            )
        return pa.concat_tables(parts)

    return coarse_partition_apply(ranged, ["rng"], assign, out_schema)


SQL_PACK_SEQUENCES = rf"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '\w+')) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prev // {SEQ_TOKEN_BUDGET} AS BIGINT) AS seq_id
FROM w
"""


def q_orders_bloom_semi(sf_dir: str):
    """Bloom-pruned SEMI join: orders placed by AUTOMOBILE-segment
    customers. Same EXISTS semantics as ``suppliers_with_sales`` but
    through ``stages/bloomjoin.bloom_semi_join``: the build side's key
    set is OR-merged into a 1 MiB bitmap (per-block partials, bounded by
    block count), broadcast ONCE via ray.put, and every probe block drops
    non-member keys BEFORE the shuffle — the exact coarse cogroup then
    only sees the pruned volume (plus bloom false positives, which it
    removes). Correctness never depends on the bitmap; only shuffle
    bytes do.

    Scale shape: at 100 TB the probe side (orders) is the fact table; the
    bitmap prefilter cuts the all-to-all exchange to ~selectivity × FP
    margin of the input, while the build side ships #blocks × 1 MiB
    partials + one 1 MiB broadcast."""
    from semantic_search_system_ray.stages.bloomjoin import bloom_semi_join

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )
    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == pa.scalar("AUTOMOBILE")),
    ).select_columns(["c_custkey"])
    return bloom_semi_join(
        orders, cust, probe_key="o_custkey", build_key="c_custkey"
    )


SQL_ORDERS_BLOOM_SEMI = """
SELECT o_orderkey, o_custkey FROM orders
WHERE EXISTS (
  SELECT 1 FROM customer
  WHERE c_custkey = o_custkey AND c_mktsegment = 'AUTOMOBILE')
"""


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — the 6-table join-PLANNING showcase: revenue per
    ASIA nation from 1995 orders where the customer and supplier share a
    nation. One query, three join strategies picked by side size:

    - region ⋈ nation (≤5 × ≤25 rows): collapsed on the DRIVER into a
      nationkey→name dict, broadcast by closure — never a shuffle;
    - lineitem ⋈ orders (fact-fact): ONE coarse cogroup on orderkey with
      a per-block revenue combiner ahead of it (the revenue_by_priority
      pattern) — AND a bloom prefilter built from the date-filtered
      order keys, so lineitem partials for the ~5/6 of orders outside
      the window are dropped before they ever shuffle (sideways
      information passing; false positives are removed by the exact
      cogroup);
    - customer / supplier nationkey attach (fact-dimension, dimension too
      big to assume driver-resident at 100 TB): hash-partitioned
      `coarse_attach`, customer pruned to ASIA nations AT THE READ so
      only matching rows ever leave storage.

    Money rides as scale-4 integers (cents × discount-hundredths) end to
    end; the single bigint→double divide happens once at the ≤25-row
    finish, mirrored by the oracle. Per-(cust,supp) partial sums stay
    far below 2^53, so the float64 ride through coarse_attach's
    null-bearing union is exact."""
    import datetime as dt

    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    nat = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    reg = rd.read_parquet(_p(sf_dir, "region")).to_pandas()
    asia_regs = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nat_name = {
        int(r["n_nationkey"]): r["n_name"]
        for _, r in nat.iterrows()
        if r["n_regionkey"] in asia_regs
    }
    asia_keys = sorted(nat_name)

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(dt.datetime(1995, 1, 1)))
            & (pc.field("o_orderdate") < pa.scalar(dt.datetime(1996, 1, 1)))
        ),
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("supp", pa.int64()), ("rev", pa.int64()),
         ("cust", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        t2 = pa.Table.from_pydict(
            {"key": t.column("l_orderkey"), "supp": t.column("l_suppkey"),
             "rev": rev}
        )
        agg = t2.group_by(["key", "supp"]).aggregate([("rev", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("supp"), agg.column("rev_sum"),
             pa.nulls(agg.num_rows, pa.int64())],
            schema=union_schema,
        )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.int64()),
             pa.nulls(t.num_rows, pa.int64()), t.column("o_custkey")],
            schema=union_schema,
        )

    from semantic_search_system_ray.stages.bloomjoin import (
        bloom_prefilter,
        build_bloom,
    )

    bloom_ref = build_bloom(orders, "o_orderkey")
    li_pruned = bloom_prefilter(
        li.map_batches(li_partial, batch_format="pyarrow"), "key", bloom_ref
    )
    combined = li_pruned.union(
        orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    pair_schema = pa.schema(
        [("o_custkey", pa.int64()), ("l_suppkey", pa.int64()),
         ("rev_s4", pa.int64())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["cust"].isna()]
        od_rows = df[df["cust"].notna()]
        if li_rows.empty or od_rows.empty:
            return pair_schema.empty_table()
        j = od_rows[["key", "cust"]].merge(
            li_rows[["key", "supp", "rev"]], on="key", how="inner"
        )
        if j.empty:
            return pair_schema.empty_table()
        agg = (
            j.assign(rev=j["rev"].astype("Int64"))
            .groupby(["cust", "supp"], sort=False)["rev"].sum().reset_index()
        )
        return pa.Table.from_pydict(
            {"o_custkey": agg["cust"].astype("int64"),
             "l_suppkey": agg["supp"].astype("int64"),
             "rev_s4": agg["rev"].astype("int64")},
            schema=pair_schema,
        )

    pairs = coarse_partition_apply(combined, ["key"], cogroup, pair_schema)

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(asia_keys),
    )
    with_cnat = coarse_attach(
        pairs, cust, left_key="o_custkey", right_key="c_custkey",
        attach_cols=["c_nationkey"],
        out_schema=pa.schema(
            [("o_custkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("rev_s4", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        how="inner",
    )
    supp = rd.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(asia_keys),
    )
    with_snat = coarse_attach(
        with_cnat, supp, left_key="l_suppkey", right_key="s_suppkey",
        attach_cols=["s_nationkey"],
        out_schema=pa.schema(
            [("l_suppkey", pa.int64()), ("rev_s4", pa.int64()),
             ("c_nationkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
        how="inner",
    )

    name_schema = pa.schema([("n_name", pa.string()), ("rev_s4", pa.int64())])

    def to_nation(t: pa.Table) -> pa.Table:
        # local-supplier predicate + broadcast name map + per-block partial
        keep = pc.equal(t.column("c_nationkey"), t.column("s_nationkey"))
        t = t.filter(keep)
        if t.num_rows == 0:
            return name_schema.empty_table()
        names = pa.array(
            [nat_name[k] for k in t.column("c_nationkey").to_pylist()],
            pa.string(),
        )
        t2 = pa.Table.from_pydict({"n_name": names, "rev_s4": t.column("rev_s4")})
        agg = t2.group_by(["n_name"]).aggregate([("rev_s4", "sum")])
        return agg.rename_columns(["n_name", "rev_s4"])

    out = with_snat.map_batches(to_nation, batch_format="pyarrow").groupby(
        "n_name"
    ).aggregate(Sum("rev_s4", alias_name="rev_sum"))

    def finish(t: pa.Table) -> pa.Table:
        cents = pc.divide(pc.add(t.column("rev_sum"), pa.scalar(50, pa.int64())),
                          pa.scalar(100, pa.int64()))
        return pa.Table.from_pydict(
            {"n_name": t.column("n_name"),
             "revenue": pc.divide(pc.cast(cents, pa.float64()), pa.scalar(100.0))}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_LOCAL_SUPPLIER_VOLUME = """
WITH j AS (
  SELECT n_name,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_s4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND c_nationkey = s_nationkey
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
)
SELECT n_name, CAST((sum(rev_s4) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM j GROUP BY n_name
"""


# deterministic CDC change-log rule derived from orders (no external data):
# each order is a change event on its customer — op D every 19th orderkey,
# else U setting the balance to that order's total; LAST (max orderkey)
# change per customer wins.
MERGE_DELETE_MOD = 19


def q_merge_upsert(sf_dir: str):
    """CDC MERGE / upsert: apply a keyed change log (insert / update /
    delete with a sequence number, last-writer-wins) onto a base table —
    the incremental-materialization primitive every warehouse MERGE INTO
    provides and Ray Data lacks.

    Scale shape: the change log is COMPACTED per block first (max-seq row
    per key — an Arrow-side combiner, so the shuffle carries one row per
    (key, block), not one per change), then base and compacted changes
    ride ONE coarse cogroup keyed on the merge key; inside each partition
    the final last-writer pick and the matched/unmatched rule table are
    vectorized pandas. Balances pass through UNTOUCHED (no arithmetic),
    so doubles hash bit-identically against the oracle."""
    import numpy as np
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    base = rd.read_parquet(
        _p(sf_dir, "customer"),
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )
    changes = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("bal", pa.float64()), ("seg", pa.string()),
         ("seq", pa.int64()), ("op", pa.string())]
    )

    def base_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("c_custkey"), t.column("c_acctbal"),
             t.column("c_mktsegment"), pa.nulls(t.num_rows, pa.int64()),
             pa.nulls(t.num_rows, pa.string())],
            schema=union_schema,
        )

    def change_compact(t: pa.Table) -> pa.Table:
        # per-block change-log compaction: keep only the max-seq change
        # per key before anything shuffles
        df = t.to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_orderkey"], ascending=[True, False],
            kind="mergesort",
        ).drop_duplicates("o_custkey")
        op = np.where(df["o_orderkey"] % MERGE_DELETE_MOD == 0, "D", "U")
        return pa.Table.from_pydict(
            {"key": df["o_custkey"].to_numpy(np.int64),
             "bal": df["o_totalprice"].to_numpy(np.float64),
             "seg": pa.nulls(len(df), pa.string()),
             "seq": df["o_orderkey"].to_numpy(np.int64),
             "op": pa.array(op.tolist(), pa.string())},
            schema=union_schema,
        )

    combined = base.map_batches(base_tag, batch_format="pyarrow").union(
        changes.map_batches(change_compact, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_acctbal", pa.float64()),
         ("c_mktsegment", pa.string())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        b = df[df["op"].isna()]
        ch = df[df["op"].notna()]
        if len(ch):
            ch = ch.sort_values(
                ["key", "seq"], ascending=[True, False], kind="mergesort"
            ).drop_duplicates("key")
        m = b[["key", "bal", "seg"]].merge(
            ch[["key", "op", "bal"]].rename(columns={"bal": "new_bal"}),
            on="key", how="outer",
        )
        # rule table: matched U → update; matched D → delete; base-only →
        # keep; change-only U → insert (segment 'NEW'); change-only D → no-op
        m = m[m["op"].isna() | (m["op"] == "U")]
        if m.empty:
            return out_schema.empty_table()
        upd = (m["op"] == "U").to_numpy()
        bal = np.where(upd, m["new_bal"].to_numpy(np.float64),
                       m["bal"].to_numpy(np.float64))
        seg = m["seg"].where(m["seg"].notna(), "NEW")
        return pa.Table.from_pydict(
            {"c_custkey": m["key"].to_numpy().astype(np.int64),
             "c_acctbal": bal,
             "c_mktsegment": pa.array(seg.tolist(), pa.string())},
            schema=out_schema,
        )

    return coarse_partition_apply(combined, ["key"], cogroup, out_schema)


def q_heavy_hitters(sf_dir: str):
    """Exact top-20 words via Misra–Gries two-pass
    (``stages/heavyhitters``): per-block capacity-512 MG summaries →
    driver candidate union (#blocks × 513 lean rows, independent of the
    vocabulary size) → broadcast candidate set → exact second-pass count
    of candidates only → exactness certificate (k-th count vs summed MG
    error bound), loud fallback to the full groupby if it fails. The
    sketch bounds the SHUFFLE, never the answer — output is always exact
    and oracle-comparable."""
    from semantic_search_system_ray.pipelines.queries import read_docs
    from semantic_search_system_ray.stages.heavyhitters import heavy_hitters

    ds = read_docs(sf_dir, ["text"])
    return heavy_hitters(ds, col="text", k=20, capacity=512)


SQL_HEAVY_HITTERS = r"""
SELECT w AS word, count(*) AS cnt
FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w FROM documents)
GROUP BY w ORDER BY cnt DESC, word LIMIT 20
"""


GROUPED_SAMPLE_K = 10


def q_grouped_sample(sf_dir: str):
    """Deterministic fixed-size per-group sample: 10 documents per
    language, chosen by md5(doc_id) order — the reservoir-sampling shape
    made reproducible (every id keeps its sample membership across
    re-runs and corpus growth, like the train/val/test splitter).

    Scale shape: ``grouped_topk`` — every block keeps only its local
    per-group top-10 by hash, so at most |langs|·10 rows per block ride
    the single final combine; the corpus never shuffles."""
    import hashlib

    from semantic_search_system_ray.stages.util import grouped_topk

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "lang"])

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(str(v).encode("utf-8")).hexdigest()
              for v in t.column("doc_id").to_pylist()]
        return t.append_column("h", pa.array(hs, pa.string()))

    sampled = grouped_topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        ["lang"], ["h", "doc_id"], descending=[False, False],
        k=GROUPED_SAMPLE_K,
    )
    return sampled.select_columns(["lang", "doc_id"])


SQL_GROUPED_SAMPLE = f"""
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
SELECT lang, doc_id FROM r WHERE rn <= {GROUPED_SAMPLE_K}
"""


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel(sf_dir: str):
    """Ordered-sequence funnel analysis: how many users did
    view → click → purchase IN ORDER (each step strictly after the
    previous user's step-entry time — the standard first-touch funnel)?

    Scale shape: events pruned to the three funnel types AT THE READ,
    then ONE coarse cogroup keyed on user; inside each partition the
    step-entry times resolve as three vectorized pandas merge+min passes
    (no per-user Python), and only per-partition stage COUNTS leave —
    the final table is 3 rows."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(FUNNEL_STEPS),
    )
    part_schema = pa.schema([("stage", pa.string()), ("users", pa.int64())])

    def per_part(df: pd.DataFrame) -> pa.Table:
        t_entry = None  # per-user entry time of the previous step
        counts = []
        for step in FUNNEL_STEPS:
            ev = df[df["event_type"] == step]
            if t_entry is not None:
                ev = ev.merge(t_entry, on="user_id", how="inner")
                ev = ev[ev["ts"] > ev["t_prev"]]
            t_entry = (
                ev.groupby("user_id", sort=False)["ts"].min()
                .rename("t_prev").reset_index()
            )
            counts.append(len(t_entry))
        return pa.Table.from_pydict(
            {"stage": [f"{i + 1}_{s}" for i, s in enumerate(FUNNEL_STEPS)],
             "users": counts},
            schema=part_schema,
        )

    parts = coarse_partition_apply(ds, ["user_id"], per_part, part_schema)
    return parts.groupby("stage").aggregate(Sum("users", alias_name="users"))


SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT * FROM (
  SELECT '1_view' AS stage, count(*) AS users FROM v
  UNION ALL SELECT '2_click', count(*) FROM c
  UNION ALL SELECT '3_purchase', count(*) FROM p
)
"""


def q_scd2_history(sf_dir: str):
    """SCD Type-2 dimension history from a change log — the versioned
    complement of ``merge_upsert``: each customer's orders (ordered by
    orderkey) become balance VERSIONS with [valid_from, valid_to)
    effective ranges; the current version's valid_to is NULL. This is
    the LEAD window (look-AHEAD — ``events_lag_delta`` covers
    look-behind).

    Scale shape: pruned read → ONE coarse cogroup keyed on customer →
    per-partition vectorized sort + groupby shift(-1); no per-row
    Python, timestamps pass through untouched (bit-exact vs the
    oracle)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"],
    )
    out_schema = pa.schema(
        [("c_custkey", pa.int64()), ("version", pa.int64()),
         ("bal", pa.float64()), ("valid_from", pa.timestamp("us")),
         ("valid_to", pa.timestamp("us"))]
    )

    def per_part(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_custkey", "o_orderkey"], kind="mergesort")
        g = df.groupby("o_custkey", sort=False)
        version = g.cumcount() + 1
        valid_to = g["o_orderdate"].shift(-1)
        return pa.Table.from_pydict(
            {"c_custkey": df["o_custkey"].to_numpy(np.int64),
             "version": version.to_numpy(np.int64),
             "bal": df["o_totalprice"].to_numpy(np.float64),
             "valid_from": pa.array(df["o_orderdate"], pa.timestamp("us"),
                                    from_pandas=True),
             "valid_to": pa.array(valid_to, pa.timestamp("us"),
                                  from_pandas=True)},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["o_custkey"], per_part, out_schema)


SQL_SCD2_HISTORY = """
SELECT o_custkey AS c_custkey,
       row_number() OVER w AS version,
       o_totalprice AS bal,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
"""


def q_time_weighted_value(sf_dir: str):
    """Per-user TIME-WEIGHTED average event value (the telemetry
    integral: each value holds until the user's next event) — the
    window-join hybrid a metering/billing pipeline needs.

    Exactness: value→cents (int64) × holding seconds (int64) — products
    ≤ ~1e13 here, sums safely inside int64 (loud guard) — summed
    distributedly, then ONE mirrored float chain
    ``(num/den)/100`` on both engine and oracle. Users whose total
    holding time is zero are excluded on both sides (no 0/0)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_id", "ts", "value"]
    )
    out_schema = pa.schema([("user_id", pa.int64()), ("twa", pa.float64())])

    def per_part(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.round(df["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        sec = (df["ts"].astype("int64").to_numpy() // 1_000_000)
        g = df.groupby("user_id", sort=False)
        nxt = g["ts"].shift(-1)
        has_next = nxt.notna().to_numpy()
        dur = np.zeros(len(df), dtype=np.int64)
        dur[has_next] = (
            nxt[has_next].astype("int64").to_numpy() // 1_000_000
        ) - sec[has_next]
        if len(dur) and int(dur.max(initial=0)) > 2**40:
            raise ValueError(
                "time_weighted_value: holding window exceeds the int64 "
                "product headroom — rescale durations before summing"
            )
        agg = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64),
             "num": cents * dur, "den": dur}
        ).groupby("user_id", sort=False).sum()
        agg = agg[agg["den"] > 0]
        twa = (agg["num"].to_numpy(np.float64)
               / agg["den"].to_numpy(np.float64)) / 100.0
        return pa.Table.from_pydict(
            {"user_id": agg.index.to_numpy(np.int64), "twa": twa},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], per_part, out_schema)


SQL_TIME_WEIGHTED_VALUE = """
WITH w AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec,
         date_diff('second', TIMESTAMP '1970-01-01',
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS nxt
  FROM events
)
SELECT user_id,
       (CAST(sum(cents * (nxt - sec)) AS DOUBLE)
        / CAST(sum(nxt - sec) AS DOUBLE)) / 100.0 AS twa
FROM w WHERE nxt IS NOT NULL
GROUP BY user_id HAVING sum(nxt - sec) > 0
"""


COPURCHASE_TOP_K = 20


def q_copurchase_pairs(sf_dir: str):
    """Market-basket co-occurrence: the top-20 part pairs most often
    bought together in one order (the recommendation-candidate miner).

    Scale shape: basket sizes are bounded (≤7 lineitems/order), so pair
    expansion is O(rows·basket) — lineitems ride ONE coarse cogroup
    keyed on order; inside each partition the pair generation is a
    vectorized pandas SELF-MERGE on orderkey (p1 < p2, distinct parts
    per order first), pre-counted per partition; the global groupby only
    sees (pair, partial-count) rows. Top-k = (cnt DESC, part_a, part_b)
    deterministic."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"]
    )
    pair_schema = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()), ("cnt", pa.int64())]
    )

    def per_part(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates()  # distinct part per order
        j = df.merge(df, on="l_orderkey")
        j = j[j["l_partkey_x"] < j["l_partkey_y"]]
        if j.empty:
            return pair_schema.empty_table()
        agg = (
            j.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size().reset_index(name="cnt")
        )
        return pa.Table.from_pydict(
            {"part_a": agg["l_partkey_x"].to_numpy(np.int64),
             "part_b": agg["l_partkey_y"].to_numpy(np.int64),
             "cnt": agg["cnt"].to_numpy(np.int64)},
            schema=pair_schema,
        )

    pairs = coarse_partition_apply(ds, ["l_orderkey"], per_part, pair_schema)

    def count_part(df: pd.DataFrame) -> pa.Table:
        # all partials of a pair land here → counts are FINAL; emit only
        # this partition's local top-k (global top-k ⊆ union of local)
        agg = (
            df.groupby(["part_a", "part_b"], sort=False)["cnt"].sum()
            .reset_index()
        )
        agg = agg.sort_values(
            ["cnt", "part_a", "part_b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(COPURCHASE_TOP_K)
        return pa.Table.from_pydict(
            {"part_a": agg["part_a"].to_numpy(np.int64),
             "part_b": agg["part_b"].to_numpy(np.int64),
             "cnt": agg["cnt"].to_numpy(np.int64)},
            schema=pair_schema,
        )

    # pair-keyed cogroup finalizes counts; only P×k candidate rows reach
    # the single-task final top-k — no global sort of the pair domain
    local = coarse_partition_apply(
        pairs, ["part_a", "part_b"], count_part, pair_schema
    )

    def final_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["cnt", "part_a", "part_b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(COPURCHASE_TOP_K)
        return pa.Table.from_pydict(
            {"part_a": df["part_a"].to_numpy(np.int64),
             "part_b": df["part_b"].to_numpy(np.int64),
             "cnt": df["cnt"].to_numpy(np.int64)},
            schema=pair_schema,
        )

    return local.repartition(1).map_batches(
        final_topk, batch_format="pyarrow", batch_size=None
    )


SQL_COPURCHASE_PAIRS = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS cnt
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY cnt DESC, part_a, part_b LIMIT {COPURCHASE_TOP_K}
"""


def q_event_transitions(sf_dir: str):
    """Markov transition counts over per-user event sequences: for every
    (previous event type → event type) adjacent pair, the global count
    and the conditional probability P(next | prev) — the sequence-mining
    primitive behind session modeling and next-action prediction.

    Scale shape: coarse partitions route each user's rows together; per
    partition ONE vectorized pass (mergesort + groupby.shift + pandas
    value_counts) emits at most |types|² (≤25) partial rows, so only
    P·25 lean rows ever leave the shuffle. The finish is a driver
    groupby over that bounded set. The probability is the single
    int→double divide mirrored by the oracle (n and the per-prev total
    are exact integers on both sides)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    part_schema = pa.schema(
        [("prev_type", pa.string()), ("event_type", pa.string()),
         ("n", pa.int64())]
    )

    def pairs(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        m = prev.notna()
        if not m.any():
            return part_schema.empty_table()
        c = (
            pd.DataFrame(
                {"prev_type": prev[m].to_numpy(),
                 "event_type": df.loc[m, "event_type"].to_numpy()}
            )
            .groupby(["prev_type", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(c, schema=part_schema, preserve_index=False)

    partials = coarse_partition_apply(ds, ["user_id"], pairs, part_schema)
    agg = (
        partials.to_pandas()
        .groupby(["prev_type", "event_type"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    n = agg["n"].to_numpy(dtype=np.int64)
    tot = agg.groupby("prev_type", sort=False)["n"].transform("sum").to_numpy(
        dtype=np.int64
    )
    return pa.Table.from_pydict(
        {"prev_type": agg["prev_type"].to_numpy(),
         "event_type": agg["event_type"].to_numpy(),
         "n": pa.array(n, pa.int64()),
         "p": pa.array(
             n.astype(np.float64) / tot.astype(np.float64), pa.float64()
         )},
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM c
"""


def q_events_locf(sf_dir: str):
    """Last-observation-carried-forward backfill: treating 'click' rows
    as missing readings, every event carries the user's most recent
    non-click value (NULL until the first reading) — the gap-fill /
    telemetry-imputation primitive. Values pass through with NO
    arithmetic, so doubles hash bit-identically to the oracle's
    ``last_value(… IGNORE NULLS)`` window.

    Scale shape: coarse partitions route each user's rows together; the
    fill is ONE vectorized pass per partition (mergesort + pandas
    C-level groupby.ffill)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.string()), ("locf_value", pa.float64())]
    )

    def locf(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        reading = df["value"].where(df["event_type"].to_numpy() != "click")
        filled = reading.groupby(df["user_id"].to_numpy(), sort=False).ffill()
        return pa.Table.from_pydict(
            {"event_id": df["event_id"].to_numpy(),
             "user_id": df["user_id"].to_numpy(),
             "ts": df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
             "locf_value": pa.Array.from_pandas(filled, type=pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], locf, out_schema)


SQL_EVENTS_LOCF = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       last_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM events
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — a correlated aggregate subquery DEcorrelated
    into a self-join: yearly revenue lost if low-quantity lineitems
    (quantity < 1/5 of the part's average) were dropped. The correlated
    ``WHERE l_quantity < 0.2 * avg(...)`` is rewritten EXACTLY in
    integers: q < sum_q/(5·cnt) ⇔ 5·q·cnt < sum_q — no FP in the
    predicate, so the row set is bit-deterministic on both sides.

    Scale shape: per-part (sum_q, cnt) stats via per-block Arrow
    combiners → one small groupby (part-vocabulary-sized); stats attach
    back onto the fact side with coarse_attach (broadcast plan when the
    stats fit, hash cogroup otherwise); the filtered cents sum
    tree-combines. Money rides as int64 cents (exact to ~1e11 rows);
    ONE double cast + two mirrored divides at the finish."""
    from semantic_search_system_ray.stages.util import coarse_attach

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def stats_partial(t: pa.Table) -> pa.Table:
        t2 = pa.Table.from_pydict(
            {"l_partkey": t.column("l_partkey"),
             "q": pc.cast(t.column("l_quantity"), pa.int64())}
        )
        return t2.group_by(["l_partkey"]).aggregate(
            [("q", "sum"), ("q", "count")]
        )

    # materialized: the stats are part-vocabulary-bounded, and a known
    # size lets coarse_attach pick its zero-shuffle broadcast plan (an
    # unexecuted groupby estimates None → needless shuffle; measured
    # 9.6 s → re-timed after this change in BASELINE.md)
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    stats_schema = pa.schema(
        [("l_partkey", pa.int64()), ("sum_q", pa.int64()),
         ("cnt", pa.int64())]
    )

    def stats_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return stats_schema.empty_table()
        agg = (
            df.groupby("l_partkey", sort=False)
            .agg(sum_q=("q_sum", "sum"), cnt=("q_count", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=stats_schema, preserve_index=False
        )

    stats = coarse_partition_apply(
        li.map_batches(stats_partial, batch_format="pyarrow"),
        ["l_partkey"], stats_sum, stats_schema,
    ).materialize()

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"pk": t.column("l_partkey"),
             "q": pc.cast(t.column("l_quantity"), pa.int64()),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
                 pa.int64(),
             )}
        )

    joined_schema = pa.schema(
        [("pk", pa.int64()), ("q", pa.int64()), ("cents", pa.int64()),
         ("sum_q", pa.int64()), ("cnt", pa.int64())]
    )
    joined = coarse_attach(
        li.map_batches(proj, batch_format="pyarrow"), stats,
        left_key="pk", right_key="l_partkey",
        attach_cols=["sum_q", "cnt"], out_schema=joined_schema,
    )

    def fsum(t: pa.Table) -> pa.Table:
        keep = pc.less(
            pc.multiply(
                pc.multiply(t.column("q"), pa.scalar(5, pa.int64())),
                t.column("cnt"),
            ),
            t.column("sum_q"),
        )
        s = pc.sum(pc.filter(t.column("cents"), keep))
        return pa.Table.from_pydict(
            {"s": pa.array([s.as_py() or 0], pa.int64())}
        )

    total = int(joined.map_batches(fsum, batch_format="pyarrow").sum("s") or 0)
    return pa.Table.from_pydict(
        {"avg_yearly": pa.array(
            [np.float64(total) / 100.0 / 7.0], pa.float64()
        )}
    )


SQL_SMALL_QTY_REVENUE = """
WITH s AS (
  SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sum_q,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(coalesce(
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) AS DOUBLE)
       / 100.0 / 7.0 AS avg_yearly
FROM lineitem l JOIN s USING (l_partkey)
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_q
"""


def q_events_daily_gapfill(sf_dir: str):
    """Calendar densification: per (day × event type) counts with
    explicit ZERO rows for every missing day in the global [min_day,
    max_day] range — the gap-fill a time-series feature pipeline needs
    before windowed models (missing ≠ absent). The distributed part is
    one per-block (day, type) count combiner + a groupby over the
    bounded day×type domain; the dense grid is derived driver-side from
    that bounded result (days × |types| rows — calendar-sized, never
    row-scale)."""
    import pandas as pd

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.Table.from_pydict(
            {"day": pc.strftime(t.column("ts"), format="%Y-%m-%d"),
             "event_type": t.column("event_type")}
        )
        return t2.group_by(["day", "event_type"]).aggregate([("day", "count")])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("day_count", alias_name="n"))
        .to_pandas()
    )
    days = pd.date_range(
        counts["day"].min(), counts["day"].max(), freq="D"
    ).strftime("%Y-%m-%d")
    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [days, types], names=["day", "event_type"]
    ).to_frame(index=False)
    out = grid.merge(counts, on=["day", "event_type"], how="left")
    return pa.Table.from_pydict(
        {"day": out["day"].to_numpy(),
         "event_type": out["event_type"].to_numpy(),
         "n": pa.array(
             out["n"].fillna(0).to_numpy(dtype=np.int64), pa.int64()
         )}
    )


SQL_EVENTS_DAILY_GAPFILL = """
WITH b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
           FROM events),
days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
         FROM b),
types AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
SELECT strftime(days.day, '%Y-%m-%d') AS day, types.event_type,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM days CROSS JOIN types
LEFT JOIN c ON c.day = days.day AND c.event_type = types.event_type
"""


def _skyline_np(keys, dates, prices):
    """Pareto frontier on (date: earlier-better, price: higher-better).
    A row is dominated iff some row has date ≤ AND price ≥ with one
    strict; exact (date, price) duplicates of a frontier point all
    survive (neither dominates). One lexsort + per-date max + prefix
    max — O(n log n), no pairwise work."""
    order = np.lexsort((-prices, dates))
    d, pr, k = dates[order], prices[order], keys[order]
    if len(d) == 0:
        return k, d, pr
    newdate = np.r_[True, d[1:] != d[:-1]]
    dmax = pr[newdate]
    date_ids = np.cumsum(newdate) - 1
    prefix = np.maximum.accumulate(dmax)
    prevmax = np.r_[np.iinfo(np.int64).min, prefix[:-1]]
    keep = (pr == dmax[date_ids]) & (pr > prevmax[date_ids])
    return k[keep], d[keep], pr[keep]


def q_orders_skyline(sf_dir: str):
    """Skyline / Pareto-frontier query over orders on (order date:
    earlier-better, total price: higher-better) — the multi-objective
    'best tradeoffs' operator. The skyline of a union equals the
    skyline of the blocks' skylines (dominance is transitive), so each
    block reduces to its own frontier as a COMBINER and only those
    survivors — frontier-sized, not row-scale — reach the driver
    finish. Exact: no sampling, no cap; duplicates of a frontier point
    all survive on both sides. Oracle: the independent NOT-EXISTS
    dominance definition. Money as int64 cents; dates as int64 µs."""
    import pandas as pd

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    part_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("d", pa.int64()), ("price_c", pa.int64())]
    )

    def block_sky(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(t.column("o_orderdate"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        pr = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        kk, dd, pp = _skyline_np(k, d, pr)
        return pa.Table.from_pydict(
            {"o_orderkey": kk, "d": dd, "price_c": pp}, schema=part_schema
        )

    surv = ds.map_batches(block_sky, batch_format="pyarrow").to_pandas()
    kk, dd, pp = _skyline_np(
        surv["o_orderkey"].to_numpy(), surv["d"].to_numpy(),
        surv["price_c"].to_numpy(),
    )
    return pa.Table.from_pydict(
        {"o_orderkey": pa.array(kk, pa.int64()),
         "o_orderdate": pd.to_datetime(pd.Series(dd), unit="us").dt.strftime(
             "%Y-%m-%d"
         ).to_numpy(),
         "o_totalprice": pa.array(
             pp.astype(np.float64) / 100.0, pa.float64()
         )}
    )


SQL_ORDERS_SKYLINE = """
WITH o AS (
  SELECT o_orderkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
)
SELECT y.o_orderkey, strftime(y.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       y.price_c / 100.0 AS o_totalprice
FROM o y
WHERE NOT EXISTS (
  SELECT 1 FROM o x
  WHERE x.o_orderdate <= y.o_orderdate AND x.price_c >= y.price_c
    AND (x.o_orderdate < y.o_orderdate OR x.price_c > y.price_c)
)
"""


def q_centroid_by_label(sf_dir: str):
    """Per-label embedding centroid (long format: label, dim, value) —
    the vector-aggregation primitive behind IVF/k-means training and
    class prototypes. Exactness: each float32 component is scaled by
    1e6 on the IDENTICAL double product and rounded half-away-from-zero
    on both sides (DuckDB ``round`` mirrored by trunc(x + copysign(.5))
    — exact for |x| « 2^52), summed as int64 (safe to ~9e12 rows per
    (label, dim) at |v| ≤ 1), finished with one mirrored double-divide
    chain. Scale shape: per-block partials are |labels|·dim lean rows
    (zero-copy Arrow list flatten → one np.add.at pass); the global
    groupby runs over that bounded domain, never row-scale."""
    import pandas as pd

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["label", "embedding"])
    part_schema = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()),
         ("s", pa.int64()), ("cnt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        col = t.column("embedding").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        dim = len(col[0])
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        ).reshape(t.num_rows, dim)
        x = mat * 1_000_000.0
        scaled = np.trunc(x + np.copysign(0.5, x)).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, inv, scaled)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        L = len(uniq)
        return pa.Table.from_pydict(
            {"label": np.repeat(uniq, dim),
             "dim": np.tile(np.arange(dim, dtype=np.int64), L),
             "s": sums.reshape(-1),
             "cnt": np.repeat(cnts, dim)},
            schema=part_schema,
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    return pa.Table.from_pydict(
        {"label": pa.array(agg["label"].to_numpy(np.int64), pa.int64()),
         "dim": pa.array(agg["dim"].to_numpy(np.int64), pa.int64()),
         "centroid": pa.array(
             agg["s"].to_numpy(np.int64).astype(np.float64)
             / 1_000_000.0
             / agg["n"].to_numpy(np.int64).astype(np.float64),
             pa.float64(),
         )},
    )


SQL_CENTROID_BY_LABEL = """
WITH u AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS s
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(sum(s) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)
         AS centroid
FROM u GROUP BY label, dim
"""


OHLC_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour resample window


def q_events_ohlc(sf_dir: str):
    """Time-series resample: per (user, 6-hour bucket) OHLC —
    open/high/low/close + count — the telemetry/market downsampling
    primitive. Fully TWO-PHASE (no per-user partitioning needed):
    each block reduces to one partial row per (user, bucket) carrying
    its extreme (ts, event_id) endpoints, and partials merge in one
    coarse cogroup via argmin/argmax on those endpoints — open/close
    are PICKS (no arithmetic), so doubles hash bit-identically to the
    oracle's row_number windows. Bucket alignment is epoch-floored
    µs // W (6 h divides a day, so it matches DuckDB time_bucket's
    2000-01-01 origin). Ties on equal timestamps break by event_id on
    both sides."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    part_schema = pa.schema(
        [("user_id", pa.int64()), ("b", pa.int64()), ("n", pa.int64()),
         ("open", pa.float64()), ("close", pa.float64()),
         ("high", pa.float64()), ("low", pa.float64()),
         ("ts_min", pa.int64()), ("eid_min", pa.int64()),
         ("ts_max", pa.int64()), ("eid_max", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        us = pc.cast(
            pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        d = pd.DataFrame(
            {"user_id": t.column("user_id").to_numpy(zero_copy_only=False),
             "b": (us // OHLC_BUCKET_US) * OHLC_BUCKET_US,
             "ts": us,
             "eid": t.column("event_id").to_numpy(zero_copy_only=False),
             "v": t.column("value").to_numpy(zero_copy_only=False)}
        ).sort_values(["user_id", "b", "ts", "eid"], kind="mergesort")
        g = d.groupby(["user_id", "b"], sort=False)
        part = g.agg(
            n=("v", "size"), open=("v", "first"), close=("v", "last"),
            high=("v", "max"), low=("v", "min"),
            ts_min=("ts", "first"), eid_min=("eid", "first"),
            ts_max=("ts", "last"), eid_max=("eid", "last"),
        ).reset_index()
        return pa.Table.from_pandas(part, schema=part_schema,
                                    preserve_index=False)

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("bucket", pa.string()), ("n", pa.int64()),
         ("open", pa.float64()), ("high", pa.float64()),
         ("low", pa.float64()), ("close", pa.float64())]
    )

    def merge(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        k = ["user_id", "b"]
        a = (
            df.sort_values(k + ["ts_min", "eid_min"], kind="mergesort")
            .groupby(k, sort=False)
            .agg(open=("open", "first"), high=("high", "max"),
                 low=("low", "min"), n=("n", "sum"))
        )
        c = (
            df.sort_values(
                k + ["ts_max", "eid_max"],
                ascending=[True, True, False, False], kind="mergesort",
            )
            .groupby(k, sort=False)["close"].first()
        )
        a = a.join(c).reset_index()
        return pa.Table.from_pydict(
            {"user_id": a["user_id"].to_numpy(),
             "bucket": pd.to_datetime(a["b"], unit="us").dt.strftime(
                 "%Y-%m-%d %H:%M:%S"
             ).to_numpy(),
             "n": a["n"].to_numpy(dtype=np.int64),
             "open": a["open"].to_numpy(), "high": a["high"].to_numpy(),
             "low": a["low"].to_numpy(), "close": a["close"].to_numpy()},
            schema=out_schema,
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return coarse_partition_apply(partials, ["user_id", "b"], merge, out_schema)


SQL_EVENTS_OHLC = """
WITH b AS (
  SELECT user_id, time_bucket(INTERVAL 6 HOUR, ts) AS bucket,
         ts, event_id, value
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, bucket
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b
)
SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       count(*) AS n,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close
FROM r GROUP BY user_id, bucket
"""


def q_orders_unpivot(sf_dir: str):
    """UNPIVOT / melt (the reshape complement of q_orders_pivot): wide
    order measures → long (key, name, value) rows. Embarrassingly
    parallel — one zero-shuffle map_batches that interleaves the
    measure columns; values pass through with no arithmetic beyond the
    same int→double cast the oracle applies."""
    ds = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_custkey"]
    )
    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("name", pa.string()),
         ("value", pa.float64())]
    )

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        tp = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.Table.from_pydict(
            {"o_orderkey": np.concatenate([k, k]),
             "name": np.concatenate(
                 [np.repeat("totalprice", n), np.repeat("custkey", n)]
             ),
             "value": np.concatenate([tp, ck])},
            schema=out_schema,
        )

    return ds.map_batches(melt, batch_format="pyarrow")


SQL_ORDERS_UNPIVOT = """
SELECT o_orderkey, name, value FROM (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
         CAST(o_custkey AS DOUBLE) AS custkey
  FROM orders)
UNPIVOT (value FOR name IN (totalprice, custkey))
"""


def q_compact_roundtrip(sf_dir: str):
    """Small-file compaction + sink/readback on the HARD gate: write the
    documents table to scratch parquet compacted into ~4 target files
    (the lakehouse maintenance op that keeps file counts sane at scale),
    read it back, and return the content columns — the driver's
    rows/schema/hash compare then certifies the WRITE path end-to-end
    (no row lost, duplicated, or corrupted by the layout change), which
    the sink otherwise only gets from pytest.

    Scale shape: compaction is a repartition to the target file count —
    streaming, no driver materialization; at 100 TB you'd size
    ``target_files`` from bytes (the runner's partitioned sink does) and
    compact per partition directory, not globally."""
    import shutil

    out_dir = f"/tmp/compact_rt_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    ds.repartition(4).write_parquet(out_dir)
    return rd.read_parquet(out_dir)


SQL_COMPACT_ROUNDTRIP = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_table_checksum(sf_dir: str):
    """Order-independent table content fingerprint — the anti-entropy /
    replica-drift primitive: Σ md5_64(canonical row string) per table, a
    COMMUTATIVE integer sum, so any partitioning, block order or
    parallelism produces the identical checksum, and two 100 TB replicas
    compare by exchanging one integer each.

    Scale shape: per-block partial sums as arbitrary-precision Python
    ints serialized to strings (the cov/corr partial pattern — Σ of
    uint64 hashes overflows int64 fast), tree-combined; one row per
    table. Oracle: DuckDB ``sum(md5_number_lower(...))`` HUGEINT cast to
    VARCHAR."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    out_schema = pa.schema(
        [("table_name", pa.string()), ("checksum", pa.string())]
    )

    def checksum_of(ds: rd.Dataset, row_strings) -> str:
        part_schema = pa.schema([("s", pa.string())])

        def partial(t: pa.Table) -> pa.Table:
            total = sum(md5_hash64(s) for s in row_strings(t))
            return pa.Table.from_pydict({"s": [str(total)]}, schema=part_schema)

        def combine(t: pa.Table) -> pa.Table:
            total = sum(int(s) for s in t.column("s").to_pylist())
            return pa.Table.from_pydict({"s": [str(total)]}, schema=part_schema)

        # fan-in tree over the per-block partials: the driver sees ≤ 64
        # rows however many blocks the table has (same shape as
        # bloomjoin/heavyhitters reductions)
        parts = ds.map_batches(partial, batch_format="pyarrow")
        n = parts.count()
        while n > 64:
            parts = parts.repartition(max(1, (n + 63) // 64)).map_batches(
                combine, batch_format="pyarrow", batch_size=None
            )
            n = parts.count()
        return str(sum(int(r["s"]) for r in parts.take_all()))

    docs = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def doc_rows(t: pa.Table):
        return (
            f"{i}|{la}|{n}"
            for i, la, n in zip(t.column("doc_id").to_pylist(),
                                t.column("lang").to_pylist(),
                                t.column("n_chars").to_pylist())
        )

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderpriority"],
    )

    def order_rows(t: pa.Table):
        return (
            f"{k}|{c}|{p}"
            for k, c, p in zip(t.column("o_orderkey").to_pylist(),
                               t.column("o_custkey").to_pylist(),
                               t.column("o_orderpriority").to_pylist())
        )

    return pa.Table.from_pydict(
        {"table_name": ["documents", "orders"],
         "checksum": [checksum_of(docs, doc_rows),
                      checksum_of(orders, order_rows)]},
        schema=out_schema,
    )


SQL_TABLE_CHECKSUM = """
SELECT 'documents' AS table_name,
       CAST(sum(md5_number_lower(
         CAST(doc_id AS VARCHAR) || '|' || lang || '|'
           || CAST(n_chars AS VARCHAR))) AS VARCHAR) AS checksum
FROM documents
UNION ALL
SELECT 'orders',
       CAST(sum(md5_number_lower(
         CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || o_orderpriority)) AS VARCHAR)
FROM orders
"""


def q_table_diff(sf_dir: str):
    """Snapshot diff / change-data-feed generation: compare table
    version A against version B and emit (key, added|removed|changed) —
    the reverse of MERGE, what an incremental consumer reads. Version B
    is derived deterministically from A (drop key%97, bump n_chars on
    key%13, insert shifted copies of key%101) so the whole diff is
    SQL-recomputable; swap B for a real second snapshot in production.

    Scale shape: both versions tagged + unioned, ONE coarse cogroup on
    the key, per-partition vectorized outer merge + payload compare —
    only differing rows leave."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    a = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    union_schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("n_chars", pa.int64()), ("__b", pa.bool_())]
    )

    def tag_a(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("lang"), t.column("n_chars"),
             pa.array([False] * t.num_rows)],
            schema=union_schema,
        )

    def tag_b(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % 97 != 0
        bumped = t.column("n_chars").to_numpy(zero_copy_only=False) + (
            ids % 13 == 0
        ).astype(np.int64)
        base = pa.Table.from_pydict(
            {"doc_id": ids[keep],
             "lang": t.column("lang").filter(pa.array(keep)),
             "n_chars": bumped[keep],
             "__b": pa.array([True] * int(keep.sum()))},
            schema=union_schema,
        )
        ins = ids % 101 == 0
        inserted = pa.Table.from_pydict(
            {"doc_id": ids[ins] + 10_000_000,
             "lang": t.column("lang").filter(pa.array(ins)),
             "n_chars": t.column("n_chars").to_numpy(zero_copy_only=False)[ins],
             "__b": pa.array([True] * int(ins.sum()))},
            schema=union_schema,
        )
        return pa.concat_tables([base, inserted])

    combined = a.map_batches(tag_a, batch_format="pyarrow").union(
        a.map_batches(tag_b, batch_format="pyarrow")
    )
    out_schema = pa.schema([("doc_id", pa.int64()), ("change", pa.string())])

    def per_part(df: pd.DataFrame) -> pa.Table:
        av = df[~df["__b"]][["doc_id", "lang", "n_chars"]]
        bv = df[df["__b"]][["doc_id", "lang", "n_chars"]]
        m = av.merge(bv, on="doc_id", how="outer", suffixes=("_a", "_b"),
                     indicator=True)
        change = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed", "changed"),
        )
        same = (
            (m["_merge"] == "both")
            & (m["lang_a"] == m["lang_b"])
            & (m["n_chars_a"] == m["n_chars_b"])
        )
        m = m[~same.to_numpy()]
        change = change[~same.to_numpy()]
        return pa.Table.from_pydict(
            {"doc_id": m["doc_id"].to_numpy().astype(np.int64),
             "change": pa.array(change.tolist(), pa.string())},
            schema=out_schema,
        )

    return coarse_partition_apply(combined, ["doc_id"], per_part, out_schema)


SQL_TABLE_DIFF = """
WITH b AS (
  SELECT doc_id, lang,
         n_chars + CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + 10000000, lang, n_chars FROM documents
  WHERE doc_id % 101 = 0
),
a AS (SELECT doc_id, lang, n_chars FROM documents)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL
   OR a.lang <> b.lang OR a.n_chars <> b.n_chars
"""


def q_dedup_spans(sf_dir: str):
    """Span-level self-dedup applied (Lee et al.): emit each document's
    CLEANED text with all cross-document duplicated 5-gram spans removed
    — see ``stages/curation.remove_duplicated_spans``."""
    from semantic_search_system_ray.stages.curation import (
        remove_duplicated_spans,
    )

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    return remove_duplicated_spans(ds, n=5)


def _sql_dedup_spans() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_dedup_spans,
    )

    return sql_dedup_spans(5)


def _er_golden_records(sf_dir: str):
    """Entity resolution end-to-end (blocking → verify → cluster →
    golden record) — see ``pipelines/er.golden_records``."""
    from semantic_search_system_ray.pipelines.er import q_er_golden_records

    return q_er_golden_records(sf_dir)


def q_dq_checks(sf_dir: str):
    """Data-quality expectations suite over the warehouse tables — see
    ``stages/dq.dq_report`` (fused row-local scans, distributed exact
    COUNT DISTINCT for PK checks, anti-join FK integrity)."""
    from semantic_search_system_ray.stages.dq import dq_report

    return dq_report(sf_dir)


def _kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means (K=8, 3 iterations) over the
    embeddings table, EXACT on the hash gate via integer-quantized
    arithmetic — see ``stages/kmeans``."""
    from semantic_search_system_ray.stages.kmeans import q_kmeans_embeddings

    return q_kmeans_embeddings(sf_dir)


def _sql_kmeans_embeddings() -> str:
    from semantic_search_system_ray.stages.kmeans import SQL_KMEANS_EMBEDDINGS

    return SQL_KMEANS_EMBEDDINGS


def _semantic_dedup(sf_dir: str):
    """SemDeDup-style within-cluster cosine near-dup pairs (k-means
    blocking + integer-exact threshold) — see ``stages/kmeans``."""
    from semantic_search_system_ray.stages.kmeans import q_semantic_dedup

    return q_semantic_dedup(sf_dir)


def _sql_semantic_dedup() -> str:
    from semantic_search_system_ray.stages.kmeans import SQL_SEMANTIC_DEDUP

    return SQL_SEMANTIC_DEDUP


SQL_MERGE_UPSERT = f"""
WITH ch AS (
  SELECT o_custkey AS key,
         arg_max(CASE WHEN o_orderkey % {MERGE_DELETE_MOD} = 0
                      THEN 'D' ELSE 'U' END, o_orderkey) AS op,
         arg_max(o_totalprice, o_orderkey) AS new_bal
  FROM orders GROUP BY o_custkey
),
m AS (
  SELECT c.c_custkey AS base_key, c.c_acctbal, c.c_mktsegment,
         ch.key, ch.op, ch.new_bal
  FROM customer c FULL OUTER JOIN ch ON c.c_custkey = ch.key
)
SELECT COALESCE(base_key, key) AS c_custkey,
       CASE WHEN op = 'U' THEN new_bal ELSE c_acctbal END AS c_acctbal,
       COALESCE(c_mktsegment, 'NEW') AS c_mktsegment
FROM m
WHERE op IS NULL OR op = 'U'
"""


def q_late_suppliers(sf_dir: str):
    """TPC-H Q21 shape — DOUBLE correlated quantifier (EXISTS + NOT
    EXISTS against the same fact table) DEcorrelated into per-order
    aggregates: suppliers that were the SOLE late supplier (shipdate >
    orderdate + 60 days) in a multi-supplier order, counted per late
    LINE (the classic Q21 count), top-20 by (numwait DESC, s_name).

    Decorrelation: both quantifiers collapse to two per-order distinct
    counts — ``EXISTS(other supplier)`` ⇔ n_supp > 1 and ``NOT
    EXISTS(other late supplier)`` ⇔ n_late_supp = 1 ∧ this supplier
    late — computed in ONE order-keyed coarse cogroup, fully
    vectorized. The date predicate is exact int64 microseconds (no FP).

    Scale shape: orders' dates attach onto lineitem via coarse_attach
    (planner picks broadcast when orders fit, hash cogroup otherwise);
    one order-keyed shuffle whose partition fn emits per-supplier
    PARTIAL counts (supplier-vocabulary-bounded rows leave each
    partition); the final groupby + name attach + top-20 sort run over
    |suppliers| rows, never line-scale."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    LATE_US = 60 * 86400 * 1_000_000  # 60 days in microseconds

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "odate_us": pc.cast(
                 pc.cast(t.column("o_orderdate"), pa.timestamp("us")), pa.int64()
             )}
        ),
        batch_format="pyarrow",
    ).materialize()  # known size → coarse_attach can pick broadcast

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"l_orderkey": t.column("l_orderkey"),
             "l_suppkey": t.column("l_suppkey"),
             "ship_us": pc.cast(
                 pc.cast(t.column("l_shipdate"), pa.timestamp("us")), pa.int64()
             )}
        )

    joined = coarse_attach(
        li.map_batches(proj, batch_format="pyarrow"), orders,
        left_key="l_orderkey", right_key="o_orderkey",
        attach_cols=["odate_us"],
        out_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("ship_us", pa.int64()), ("odate_us", pa.int64())]
        ),
    )

    part_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("w", pa.int64())]
    )

    def per_order(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        late = df["ship_us"].to_numpy() > (df["odate_us"].to_numpy() + LATE_US)
        n_supp = df.groupby("l_orderkey")["l_suppkey"].nunique()
        ldf = df[late]
        if ldf.empty:
            return part_schema.empty_table()
        n_late = ldf.groupby("l_orderkey")["l_suppkey"].nunique()
        ok = n_late.index[(n_late == 1) & (n_supp.reindex(n_late.index) > 1)]
        blamed = ldf[ldf["l_orderkey"].isin(ok)]
        cnt = blamed.groupby("l_suppkey").size()
        return pa.Table.from_pydict(
            {"s_suppkey": pa.array(cnt.index.to_numpy(), pa.int64()),
             "w": pa.array(cnt.to_numpy(), pa.int64())},
            schema=part_schema,
        )

    partials = coarse_partition_apply(joined, ["l_orderkey"], per_order, part_schema)
    counts = partials.groupby("s_suppkey").aggregate(Sum("w", alias_name="numwait"))

    names = rd.read_parquet(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    named = coarse_attach(
        counts, names, left_key="s_suppkey", right_key="s_suppkey",
        attach_cols=["s_name"],
        out_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("numwait", pa.int64()),
             ("s_name", pa.string())]
        ),
    )
    return (
        named.select_columns(["s_name", "numwait"])
        .sort(["numwait", "s_name"], descending=[True, False])
        .limit(20)
    )


SQL_LATE_SUPPLIERS = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_events_mad(sf_dir: str):
    """Per-group robust statistics: median and MEDIAN ABSOLUTE DEVIATION
    of event value per event_type — the outlier-resistant spread metric
    feature pipelines use where stddev is skew-poisoned. EXACT at any
    scale with NO global sort: two bounded-cardinality integer-histogram
    passes (the events_quantiles trick). Medians of even counts are kept
    as INTEGER middle-pair sums (m2 = lo+hi cents, m4 = lo+hi
    half-cent deviations) so the only float ops are the two final
    divides, mirrored verbatim in the oracle.

    Pass 1: per-block (type, cents) histograms → global groupby over
    the value domain → per-type m2. Pass 2: deviations d2 = |2·cents −
    m2| (broadcast per-type m2 dict) histogrammed the same way → m4.
    Driver work is domain-bounded, never row-scale."""
    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
        t2 = pa.Table.from_pydict({"g": t.column("event_type"), "cell": cents})
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    def middle_pair_sum(rows: list) -> dict:
        """group → (n, lo+hi middle-cell sum) from (g, cell, n) rows."""
        by_g: dict = {}
        for r in rows:
            by_g.setdefault(r["g"], []).append((r["cell"], r["sum(n)"]))
        out = {}
        for g, pairs in by_g.items():
            cells = np.array([c for c, _ in pairs], dtype=np.int64)
            counts = np.array([n for _, n in pairs], dtype=np.int64)
            order = np.argsort(cells)
            cells, counts = cells[order], counts[order]
            cum = np.cumsum(counts)
            n = int(cum[-1])
            lo = int(cells[np.searchsorted(cum, (n + 1) // 2, side="left")])
            hi = int(cells[np.searchsorted(cum, n // 2 + 1, side="left")])
            out[g] = (n, lo + hi)
        return out

    m2_by_g = middle_pair_sum(
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).sum("n").take_all()
    )
    m2_ref = ray.put({g: m2 for g, (_, m2) in m2_by_g.items()})

    def dev_hist(t: pa.Table) -> pa.Table:
        m2 = ray.get(m2_ref)
        g = t.column("event_type").to_pylist()
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        m2v = np.array([m2[x] for x in g], dtype=np.int64)
        d2 = np.abs(2 * cents - m2v)
        t2 = pa.Table.from_pydict({"g": pa.array(g, pa.string()),
                                   "cell": pa.array(d2, pa.int64())})
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    m4_by_g = middle_pair_sum(
        ev.map_batches(dev_hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).sum("n").take_all()
    )
    gs = sorted(m2_by_g)
    return pa.Table.from_pydict(
        {"event_type": pa.array(gs, pa.string()),
         "n": pa.array([m2_by_g[g][0] for g in gs], pa.int64()),
         "median_value": pa.array(
             [np.float64(m2_by_g[g][1]) / 200.0 for g in gs], pa.float64()),
         "mad": pa.array(
             [np.float64(m4_by_g[g][1]) / 400.0 for g in gs], pa.float64())}
    )


SQL_EVENTS_MAD = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
),
m AS (
  SELECT event_type, max(n) AS n,
         sum(CASE WHEN rk = (n + 1) // 2 THEN cents ELSE 0 END)
       + sum(CASE WHEN rk = n // 2 + 1 THEN cents ELSE 0 END) AS m2
  FROM r GROUP BY event_type
),
d AS (
  SELECT c.event_type, abs(2 * c.cents - m.m2) AS d2
  FROM c JOIN m USING (event_type)
),
r2 AS (
  SELECT event_type, d2,
         row_number() OVER (PARTITION BY event_type ORDER BY d2) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
m4 AS (
  SELECT event_type,
         sum(CASE WHEN rk = (n + 1) // 2 THEN d2 ELSE 0 END)
       + sum(CASE WHEN rk = n // 2 + 1 THEN d2 ELSE 0 END) AS m4
  FROM r2 GROUP BY event_type
)
SELECT m.event_type, m.n,
       CAST(m.m2 AS DOUBLE) / 200.0 AS median_value,
       CAST(m4.m4 AS DOUBLE) / 400.0 AS mad
FROM m JOIN m4 USING (event_type)
"""


DISTINCTIVE_MIN_COUNT = 5
DISTINCTIVE_TOP_K = 10


def q_distinctive_terms(sf_dir: str):
    """Per-source keyword extraction by EXACT integer lift: for each
    document source, the top-10 terms most over-represented vs the
    corpus — score_ppm = ⌊n_st · T · 10⁶ / (n_t · T_s)⌋ where n_st =
    occurrences of term t in source s, T_s = tokens in s, n_t = global
    occurrences, T = total tokens. The score is computed in
    arbitrary-precision integers (Python ints / HUGEINT) — the ~1e20
    intermediate product never touches a float, so the (score DESC,
    term ASC) ranking is bit-deterministic cross-system.

    Scale shape: ONE pass of per-block (source, term) Counter combiners
    → global groupby; the scored table is |sources| × |vocabulary| rows
    (domain-bounded, never corpus-scale), so marginals + ranking run on
    the driver like pmi_pairs. Low-count terms (< 5) are floored out."""
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import re as _re

        c: Counter = Counter()
        for src, txt in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            for w in _re.findall(r"\w+", (txt or "").lower()):
                c[(src, w)] += 1
        keys = list(c.keys())
        return pa.Table.from_pydict(
            {"source": pa.array([k[0] for k in keys], pa.string()),
             "term": pa.array([k[1] for k in keys], pa.string()),
             "c": pa.array([c[k] for k in keys], pa.int64())}
        )

    rows = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("c", alias_name="n_st"))
        .take_all()  # |sources| × |vocab| — domain-bounded
    )
    n_t: Counter = Counter()
    t_s: Counter = Counter()
    for r in rows:
        n_t[r["term"]] += int(r["n_st"])
        t_s[r["source"]] += int(r["n_st"])
    total = sum(t_s.values())
    scored: dict = {}
    for r in rows:
        n_st = int(r["n_st"])
        if n_st < DISTINCTIVE_MIN_COUNT:
            continue
        s, t = r["source"], r["term"]
        score = n_st * total * 1_000_000 // (n_t[t] * t_s[s])  # exact ints
        scored.setdefault(s, []).append((t, n_st, score))
    out_s, out_t, out_n, out_score, out_rk = [], [], [], [], []
    for s in sorted(scored):
        ranked = sorted(scored[s], key=lambda x: (-x[2], x[0]))
        for rk, (t, n_st, score) in enumerate(ranked[:DISTINCTIVE_TOP_K], 1):
            out_s.append(s)
            out_t.append(t)
            out_n.append(n_st)
            out_score.append(score)
            out_rk.append(rk)
    return pa.Table.from_pydict(
        {"source": pa.array(out_s, pa.string()),
         "term": pa.array(out_t, pa.string()),
         "n_st": pa.array(out_n, pa.int64()),
         "score_ppm": pa.array(out_score, pa.int64()),
         "rk": pa.array(out_rk, pa.int64())}
    )


SQL_DISTINCTIVE_TERMS = rf"""
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
),
st AS (
  SELECT source, term, count(*) AS n_st FROM tok GROUP BY source, term
),
marg AS (
  SELECT term, sum(n_st) AS n_t FROM st GROUP BY term
),
srctot AS (
  SELECT source, sum(n_st) AS t_s FROM st GROUP BY source
),
tot AS (SELECT sum(n_st) AS total FROM st),
scored AS (
  SELECT st.source, st.term, st.n_st,
         CAST(st.n_st AS HUGEINT) * tot.total * 1000000
           // (CAST(marg.n_t AS HUGEINT) * srctot.t_s) AS score_ppm
  FROM st
  JOIN marg USING (term)
  JOIN srctot ON st.source = srctot.source
  CROSS JOIN tot
  WHERE st.n_st >= {DISTINCTIVE_MIN_COUNT}
)
SELECT source, term, n_st, CAST(score_ppm AS BIGINT) AS score_ppm, rk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY score_ppm DESC, term
  ) AS rk FROM scored
) WHERE rk <= {DISTINCTIVE_TOP_K}
"""


def q_price_qty_regression(sf_dir: str):
    """Per-group OLS simple linear regression (the DuckDB regr_slope /
    regr_intercept shape) of extended price on quantity, per return
    flag — exact two-phase: the five sufficient statistics (n, Σx, Σy,
    Σxy, Σx²) accumulate as integers (qty int64, price int64 cents) in
    per-block Arrow combiners → one |groups|-sized groupby; slope and
    intercept come out of big-int numerators with mirrored float
    chains (one cast + divide each), so doubles hash bit-identically.

    Scale note: per-block partials are int64; the GLOBAL Σxy sum stays
    exact to ~1e18 (≈1e9 rows at these magnitudes) — past that, swap
    the final groupby sums to Python-int tree combines like
    table_checksum does."""
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column("l_quantity"), pa.int64())
        y = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"g": t.column("l_returnflag"), "one": pa.array(
                np.ones(len(x), dtype=np.int64)),
             "x": x, "y": y, "xy": pc.multiply(x, y), "xx": pc.multiply(x, x)}
        )
        out = t2.group_by(["g"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"),
             ("xy", "sum"), ("xx", "sum")]
        )
        return out.rename_columns(["g", "n", "sx", "sy", "sxy", "sxx"])

    rows = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                   Sum("sxx", alias_name="sxx"))
        .take_all()  # |groups| rows
    )
    out_g, out_n, out_slope, out_icept = [], [], [], []
    for r in sorted(rows, key=lambda r: r["g"]):
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx = int(r["sxy"]), int(r["sxx"])
        slope = np.float64(n * sxy - sx * sy) / np.float64(n * sxx - sx * sx) / 100.0
        icept = (np.float64(sy) / 100.0 - slope * np.float64(sx)) / np.float64(n)
        out_g.append(r["g"])
        out_n.append(n)
        out_slope.append(slope)
        out_icept.append(icept)
    return pa.Table.from_pydict(
        {"l_returnflag": pa.array(out_g, pa.string()),
         "n": pa.array(out_n, pa.int64()),
         "slope": pa.array(out_slope, pa.float64()),
         "intercept": pa.array(out_icept, pa.float64())}
    )


SQL_PRICE_QTY_REGRESSION = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(CAST(l_quantity AS HUGEINT)) AS sx,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
         sum(CAST(l_quantity AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy,
         sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope,
       (CAST(sy AS DOUBLE) / 100.0
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0)
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
FROM s
"""


def q_rolling_distinct_users(sf_dir: str):
    """Trailing-window COUNT DISTINCT — the classic 'weekly active
    users per day' metric that naive windowing can't do distributed
    (distinct isn't decomposable over overlapping windows). Reduced to
    a decomposable form by COVERAGE EXPANSION: an event on day d makes
    its user active for cover-days d..d+6, so WAU(day) = |distinct
    (user, cover_day) pairs| — dedup, a bounded ×7 expansion, dedup,
    count.

    Scale shape: ONE user-keyed shuffle; both dedups and the expansion
    are vectorized per partition (a (user, cover_day) pair lives in
    exactly one user partition, so per-partition counts sum globally);
    what leaves each partition is day-domain-bounded (day, n) partials.
    No global sort, no per-day re-scan."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    WINDOW = 7

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(t.column("ts"), pa.timestamp("us")), pa.date32()
        )
        t2 = pa.Table.from_pydict(
            {"user_id": t.column("user_id"),
             "day": pc.cast(day, pa.int32())}
        )
        # per-block pre-dedup: (user, day) pairs collapse before shuffle
        return t2.group_by(["user_id", "day"]).aggregate([])

    part_schema = pa.schema([("day", pa.int32()), ("n", pa.int64())])

    def per_user(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop_duplicates(["user_id", "day"])
        u = np.repeat(df["user_id"].to_numpy(), WINDOW)
        cd = np.repeat(df["day"].to_numpy().astype(np.int32), WINDOW)
        cd = cd + np.tile(np.arange(WINDOW, dtype=np.int32), len(df))
        pairs = pd.DataFrame({"u": u, "cd": cd}).drop_duplicates()
        cnt = pairs.groupby("cd").size()
        return pa.Table.from_pydict(
            {"day": pa.array(cnt.index.to_numpy(), pa.int32()),
             "n": pa.array(cnt.to_numpy(), pa.int64())},
            schema=part_schema,
        )

    partials = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        per_user, part_schema,
    )
    out = partials.groupby("day").aggregate(Sum("n", alias_name="n_users"))
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"day": pc.strftime(
                pc.cast(pc.cast(pc.cast(t.column("day"), pa.int32()),
                                pa.date32()),
                        pa.timestamp("us")),
                format="%Y-%m-%d",
            ),
             "n_users": t.column("n_users")}
        ),
        batch_format="pyarrow",
    )


SQL_ROLLING_DISTINCT_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cov AS (
  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS cday
  FROM ud, range(0, 7) t(i)
)
SELECT strftime(cday, '%Y-%m-%d') AS day, count(*) AS n_users
FROM cov GROUP BY cday
"""


def q_fifo_match(sf_dir: str):
    """FIFO allocation matching — the accounting/inventory primitive
    (realized-cost lot matching, credit consumption): per user, signup
    events GRANT value and purchase events CONSUME it first-in-first-out;
    emit every (grant, purchase, matched_cents) allocation. FIFO becomes
    a stateless INTERVAL INTERSECTION: grant i covers the cumulative
    range [ΣG_{<i}, ΣG_{≤i}) and purchase j consumes [ΣP_{<j}, ΣP_{≤j});
    matched = overlap — exact int64 cents, no sequential scan, ties on
    equal ts break by event_id on both sides.

    Scale shape: ONE user-keyed shuffle; cumsums and the per-user
    grant×purchase pairing are vectorized per partition (pandas
    C-level groupby.cumsum + merge). The pairing is |G_u|·|P_u| per
    user — bounded for behavioral data (events per user, not corpus
    size); a heavy-user cap would salt the user, same as sessionize."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "ts", "event_type", "value"],
        filter=(pc.field("event_type").isin(["signup", "purchase"])),
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "is_grant": pc.equal(t.column("event_type"), "signup"),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
             )}
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("grant_id", pa.int64()),
         ("purchase_id", pa.int64()), ("matched_cents", pa.int64())]
    )

    def match(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        sides = {}
        for flag, name in [(True, "g"), (False, "p")]:
            s = df[df["is_grant"] == flag].copy()
            s["hi"] = s.groupby("user_id", sort=False)["cents"].cumsum()
            s["lo"] = s["hi"] - s["cents"]
            sides[name] = s[["user_id", "event_id", "lo", "hi"]]
        pairs = sides["g"].merge(
            sides["p"], on="user_id", suffixes=("_g", "_p")
        )
        if pairs.empty:
            return out_schema.empty_table()
        matched = (
            np.minimum(pairs["hi_g"].to_numpy(), pairs["hi_p"].to_numpy())
            - np.maximum(pairs["lo_g"].to_numpy(), pairs["lo_p"].to_numpy())
        )
        keep = matched > 0
        return pa.Table.from_pydict(
            {"user_id": pairs["user_id"].to_numpy()[keep],
             "grant_id": pairs["event_id_g"].to_numpy()[keep],
             "purchase_id": pairs["event_id_p"].to_numpy()[keep],
             "matched_cents": matched[keep]},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        match, out_schema,
    )


SQL_FIFO_MATCH = """
WITH base AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('signup', 'purchase')
),
g AS (
  SELECT user_id, event_id,
         sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS hi,
         sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - cents AS lo
  FROM base WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, event_id,
         sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS hi,
         sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - cents AS lo
  FROM base WHERE event_type = 'purchase'
)
SELECT g.user_id, g.event_id AS grant_id, p.event_id AS purchase_id,
       CAST(least(g.hi, p.hi) - greatest(g.lo, p.lo) AS BIGINT)
         AS matched_cents
FROM g JOIN p USING (user_id)
WHERE least(g.hi, p.hi) - greatest(g.lo, p.lo) > 0
"""


def q_session_paths(sf_dir: str):
    """Session PATH mining: the top-10 most common within-session
    event-type sequences (30-minute inactivity gap, the q_sessionize
    session definition, ties on equal ts broken by event_id on both
    sides) — the behavioral-analytics complement of q_funnel (which
    fixes the pattern; this DISCOVERS the patterns).

    Scale shape: ONE user-keyed shuffle; session assignment is the
    vectorized diff+cumsum pass; what leaves each partition is (path,
    n) partial counts (path-vocabulary-bounded), so the final groupby +
    top-10 never see row-scale data."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    GAP_US = 30 * 60 * 1_000_000

    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "event_type": t.column("event_type")}
        )

    part_schema = pa.schema([("path", pa.string()), ("n", pa.int64())])

    def paths(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        # vectorized path building: event types factorize to single
        # bytes (type vocabulary is tiny), one separator-inserted blob
        # splits into per-session byte codes with ONE C-level split,
        # and only the DISTINCT code paths (path-vocabulary bounded)
        # are translated back to '/'-joined names — no per-session
        # Python string assembly
        codes, names = pd.factorize(df["event_type"].to_numpy())
        if len(names) > 200:  # keep each code one printable byte
            raise ValueError("event_type vocabulary too large to byte-code")
        n = len(df)
        n_sess = int(brk.sum())
        blob = np.empty(n + n_sess, dtype=np.uint8)
        sep_pos = np.flatnonzero(brk) + np.arange(n_sess)  # boundary slots
        blob[sep_pos] = 0
        mask = np.ones(n + n_sess, dtype=bool)
        mask[sep_pos] = False
        blob[mask] = codes.astype(np.uint8) + 1
        pieces = blob.tobytes().split(b"\x00")[1:]  # leading separator
        cnt: Counter = Counter(pieces)
        trans = {
            bs: "/".join(names[c - 1] for c in bs) for bs in cnt
        }  # distinct paths only — path-vocabulary bounded
        return pa.Table.from_pydict(
            {"path": pa.array([trans[k] for k in cnt], pa.string()),
             "n": pa.array(list(cnt.values()), pa.int64())},
            schema=part_schema,
        )

    partials = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        paths, part_schema,
    )
    out = partials.groupby("path").aggregate(Sum("n", alias_name="n"))
    return out.sort(["n", "path"], descending=[True, False]).limit(10)


SQL_SESSION_PATHS = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
),
p AS (
  SELECT user_id, sid,
         string_agg(event_type, '/' ORDER BY ts, event_id) AS path
  FROM s2 GROUP BY user_id, sid
)
SELECT path, count(*) AS n FROM p GROUP BY path ORDER BY n DESC, path LIMIT 10
"""


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation — the classic CRM / lifecycle-marketing
    rollup: score every customer 1-4 on Recency (last order day),
    Frequency (order count) and Monetary (lifetime cents) by EXACT
    corpus-wide quartiles, then profile the ≤64 segments. Quartile q
    values (0.25/0.5/0.75) are exactly representable doubles, so the
    quantile_disc rank ceil(q·n) is ulp-exact on both sides; scores use
    the threshold-ntile rule (#thresholds strictly below + 1 —
    deterministic under ties, unlike SQL ntile()).

    Scale shape: one customer-keyed coarse groupby with per-block
    combiners builds the (R, F, M) profile; thresholds come from ONE
    fused bounded-cardinality integer histogram pass over the profile
    (exact_quantiles_histogram_multi — R = day domain, F = small ints,
    M quantized to whole dollars to keep the histogram domain-bounded);
    scoring is a stateless vectorized searchsorted; the final combine
    has ≤64 groups (per-block ≤64-row partials → one coarse sum)."""
    from semantic_search_system_ray.stages.sketch import (
        exact_quantiles_histogram_multi,
    )
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    QS = [0.25, 0.5, 0.75]

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(
                pc.cast(
                    pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                    pa.date32(),
                ),
                pa.int32(),
            ),
            pa.int64(),
        )
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"), "day": day,
             "one": pa.array(np.ones(len(day), np.int64)), "cents": cents}
        )
        out = t2.group_by(["o_custkey"]).aggregate(
            [("day", "max"), ("one", "sum"), ("cents", "sum")]
        )
        return out.rename_columns(["o_custkey", "r", "f", "m"])

    cust_schema = pa.schema(
        [("o_custkey", pa.int64()), ("r", pa.int64()), ("f", pa.int64()),
         ("m", pa.int64())]
    )

    def cust_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return cust_schema.empty_table()
        agg = (
            df.groupby("o_custkey", sort=False)
            .agg(r=("r", "max"), f=("f", "sum"), m=("m", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=cust_schema, preserve_index=False
        )

    cust = coarse_partition_apply(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], cust_sum, cust_schema,
    )

    def with_md(t: pa.Table) -> pa.Table:
        # monetary thresholds over WHOLE DOLLARS (integer div, exact)
        # to keep the histogram domain-bounded at web scale
        md = t.column("m").to_numpy(zero_copy_only=False) // 100
        return t.append_column("md", pa.array(md, pa.int64()))

    cust_md = cust.map_batches(with_md, batch_format="pyarrow").materialize()
    thr_multi = exact_quantiles_histogram_multi(
        cust_md, ["r", "f", "md"], QS, scale=1
    )
    thr = {
        dim: np.array([v for _q, v in thr_multi[dim]], dtype=np.float64)
        for dim in ("r", "f", "md")
    }

    def score(t: pa.Table) -> pa.Table:
        out = {"m": t.column("m")}
        for dim, col in [("r", "r"), ("f", "f"), ("md", "md")]:
            v = pc.cast(t.column(col), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            out[f"{dim}_score"] = pa.array(
                np.searchsorted(thr[dim], v, side="left").astype(np.int64) + 1
            )
        t2 = pa.Table.from_pydict(
            {"r_score": out["r_score"], "f_score": out["f_score"],
             "m_score": out["md_score"], "m": out["m"]}
        )
        return t2.group_by(["r_score", "f_score", "m_score"]).aggregate(
            [("m", "count"), ("m", "sum")]
        )

    seg_schema = pa.schema(
        [("r_score", pa.int64()), ("f_score", pa.int64()),
         ("m_score", pa.int64()), ("n_customers", pa.int64()),
         ("sum_cents", pa.int64())]
    )

    def seg_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return seg_schema.empty_table()
        agg = (
            df.groupby(["r_score", "f_score", "m_score"], sort=False)
            .agg(n_customers=("m_count", "sum"), sum_cents=("m_sum", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(
            agg, schema=seg_schema, preserve_index=False
        )

    agg = coarse_partition_apply(
        cust_md.map_batches(score, batch_format="pyarrow"),
        ["r_score", "f_score", "m_score"], seg_sum, seg_schema,
    )
    t = pa.Table.from_pylist(agg.take_all(), schema=seg_schema)  # ≤64 rows
    return pa.Table.from_pydict(
        {"r_score": t.column("r_score"), "f_score": t.column("f_score"),
         "m_score": t.column("m_score"),
         "n_customers": t.column("n_customers"),
         "total_value": pc.divide(
             pc.cast(t.column("sum_cents"), pa.float64()), pa.scalar(100.0)
         )}
    )


SQL_RFM_SEGMENTS = """
WITH cust AS (
  SELECT o_custkey,
         CAST(CAST(max(o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS r,
         count(*) AS f,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m
  FROM orders GROUP BY o_custkey
),
c2 AS (SELECT *, (m - m % 100) // 100 AS md FROM cust),
thr AS (
  SELECT quantile_disc(r, [0.25, 0.5, 0.75]) AS rt,
         quantile_disc(f, [0.25, 0.5, 0.75]) AS ft,
         quantile_disc(md, [0.25, 0.5, 0.75]) AS mt
  FROM c2
),
scored AS (
  SELECT
    (SELECT count(*) FROM unnest(thr.rt) u(t) WHERE c.r > t) + 1 AS r_score,
    (SELECT count(*) FROM unnest(thr.ft) u(t) WHERE c.f > t) + 1 AS f_score,
    (SELECT count(*) FROM unnest(thr.mt) u(t) WHERE c.md > t) + 1 AS m_score,
    c.m
  FROM c2 c, thr
)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(CAST(sum(m) AS BIGINT) AS DOUBLE) / 100.0 AS total_value
FROM scored GROUP BY r_score, f_score, m_score
"""


def q_scd2_asof_lookup(sf_dir: str):
    """POINT-IN-TIME lookup against the SCD Type-2 dimension — the
    bitemporal-join shape warehouse pipelines need ("what was this
    customer's balance version when the event happened?"): every event
    joins the q_scd2_history version whose [valid_from, valid_to)
    range covers the event ts (open current versions match everything
    after valid_from). Versions whose ranges overlap (the change log
    isn't date-monotone) match multiply — exactly the SQL range-join
    semantics, mirrored.

    Scale shape: the version history builds in its own user-keyed
    coarse pass (q_scd2_history's kernel), then ONE shared user-keyed
    cogroup (coarse_partition_apply over the tagged union) merges
    events against versions per partition with pandas' C-level merge +
    a vectorized range filter; per-user version counts are change-log
    bounded, so the per-partition pairing never explodes."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"key": t.column("user_id"),
             "event_id": t.column("event_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "version": pa.array([0] * t.num_rows, pa.int64()),
             "bal": pa.array([0.0] * t.num_rows, pa.float64()),
             "from_us": pa.array([0] * t.num_rows, pa.int64()),
             "to_us": pa.array([0] * t.num_rows, pa.int64()),
             "is_event": pa.array([True] * t.num_rows)}
        ),
        batch_format="pyarrow",
    )

    NULL_TO = np.iinfo(np.int64).max  # open current version

    def hist_rows(t: pa.Table) -> pa.Table:
        to_us = pc.cast(
            pc.cast(t.column("valid_to"), pa.timestamp("us")), pa.int64()
        )
        to_us = pc.fill_null(to_us, NULL_TO)
        return pa.Table.from_pydict(
            {"key": t.column("c_custkey"),
             "event_id": pa.array([0] * t.num_rows, pa.int64()),
             "ts_us": pa.array([0] * t.num_rows, pa.int64()),
             "version": t.column("version"),
             "bal": t.column("bal"),
             "from_us": pc.cast(
                 pc.cast(t.column("valid_from"), pa.timestamp("us")), pa.int64()
             ),
             "to_us": to_us,
             "is_event": pa.array([False] * t.num_rows)}
        )

    hist = q_scd2_history(sf_dir).map_batches(hist_rows, batch_format="pyarrow")

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("version", pa.int64()), ("bal", pa.float64())]
    )

    def lookup(df: pd.DataFrame) -> pa.Table:
        e = df[df["is_event"]]
        h = df[~df["is_event"]]
        if e.empty or h.empty:
            return out_schema.empty_table()
        pairs = e[["key", "event_id", "ts_us"]].merge(
            h[["key", "version", "bal", "from_us", "to_us"]], on="key"
        )
        if pairs.empty:
            return out_schema.empty_table()
        ts = pairs["ts_us"].to_numpy()
        keep = (ts >= pairs["from_us"].to_numpy()) & (
            ts < pairs["to_us"].to_numpy()
        )
        kept = pairs[keep]
        return pa.Table.from_pydict(
            {"event_id": kept["event_id"].to_numpy(np.int64),
             "user_id": kept["key"].to_numpy(np.int64),
             "version": kept["version"].to_numpy(np.int64),
             "bal": kept["bal"].to_numpy(np.float64)},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ev.union(hist), ["key"], lookup, out_schema
    )


SQL_SCD2_ASOF_LOOKUP = f"""
WITH h AS ({SQL_SCD2_HISTORY})
SELECT e.event_id, e.user_id, h.version, h.bal
FROM events e
JOIN h ON e.user_id = h.c_custkey
WHERE e.ts >= h.valid_from
  AND (h.valid_to IS NULL OR e.ts < h.valid_to)
"""


def q_user_trailing_sum(sf_dir: str):
    """True RANGE-frame time window — per event, the sum of the SAME
    user's values in the trailing 10 minutes INCLUDING equal-timestamp
    peers (SQL ``RANGE … PRECEDING AND CURRENT ROW`` peer semantics,
    which ROWS frames and pandas ``rolling`` both get wrong on ties).
    Exact int64 cents.

    Scale shape: ONE user-keyed shuffle; per partition the frame bounds
    come from two vectorized searchsorted calls over a composite
    (user, rel-time) int64 axis (span-padded so windows can't bleed
    across users — the purchase_click_window composite) against one
    prefix-sum array; falls back to per-user segment searchsorted when
    the span × user-count product would overflow the composite."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    W_US = 10 * 60 * 1_000_000

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
             )}
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("trail_cents", pa.int64())]
    )

    def trail(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        cents = df["cents"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        u_idx = np.cumsum(np.r_[False, u[1:] != u[:-1]]).astype(np.int64)
        rel = ts - ts.min()
        span = int(rel.max()) + W_US + 1
        cum = np.concatenate([[0], np.cumsum(cents)])
        n_users = int(u_idx[-1]) + 1
        if n_users * span < 2**62:  # composite fast path
            comp = u_idx * span + rel
            hi = np.searchsorted(comp, comp, side="right")
            lo = np.searchsorted(comp, comp - W_US, side="left")
        else:  # per-user segment fallback (wide span × many users)
            bounds = np.r_[starts, len(u)]
            hi = np.empty(len(u), np.int64)
            lo = np.empty(len(u), np.int64)
            for i in range(len(starts)):
                s, e = bounds[i], bounds[i + 1]
                seg = ts[s:e]
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
                lo[s:e] = s + np.searchsorted(seg, seg - W_US, side="left")
        return pa.Table.from_pydict(
            {"event_id": df["event_id"].to_numpy(np.int64),
             "user_id": u,
             "trail_cents": cum[hi] - cum[lo]},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        trail, out_schema,
    )


SQL_USER_TRAILING_SUM = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trail_cents
FROM events
"""


def q_concurrent_sessions(sf_dir: str):
    """Occupancy / concurrency counting — per hour, how many user
    sessions (the 30-minute-gap q_sessionize definition) were ACTIVE
    during that hour: the interval-overlap metric capacity planning
    needs (concurrent connections, active devices). A session [start,
    end] covers every hour bucket it touches, so the count reduces to a
    bounded coverage expansion — no pairwise interval join, no sweep
    line over a global sort.

    Scale shape: ONE user-keyed shuffle; session building is the
    vectorized diff+cumsum pass; the hour expansion is np.repeat over
    session-hour spans (gap-bounded); what leaves each partition is
    (hour, n) partials, domain-bounded by the calendar."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    GAP_US = 30 * 60 * 1_000_000
    HOUR_US = 3_600_000_000

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             )}
        )

    part_schema = pa.schema([("h", pa.int64()), ("n", pa.int64())])

    def hours(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        sid = np.cumsum(brk)
        s = pd.DataFrame({"sid": sid, "ts": ts}).groupby("sid")["ts"]
        h0 = (s.min().to_numpy() // HOUR_US).astype(np.int64)
        h1 = (s.max().to_numpy() // HOUR_US).astype(np.int64)
        spans = h1 - h0 + 1
        cov = np.repeat(h0, spans) + (
            np.arange(int(spans.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(spans) - spans, spans)
        )
        vals, cnts = np.unique(cov, return_counts=True)
        return pa.Table.from_pydict(
            {"h": pa.array(vals, pa.int64()),
             "n": pa.array(cnts.astype(np.int64), pa.int64())},
            schema=part_schema,
        )

    partials = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        hours, part_schema,
    )
    out = partials.groupby("h").aggregate(Sum("n", alias_name="n_active"))
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"hour": pc.strftime(
                pc.cast(
                    pc.multiply(t.column("h"), pa.scalar(HOUR_US, pa.int64())),
                    pa.timestamp("us"),
                ),
                format="%Y-%m-%d %H:00",
            ),
             "n_active": t.column("n_active")}
        ),
        batch_format="pyarrow",
    )


SQL_CONCURRENT_SESSIONS = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
),
sess AS (
  SELECT user_id, sid,
         epoch_us(min(ts)) // 3600000000 AS h0,
         epoch_us(max(ts)) // 3600000000 AS h1
  FROM s2 GROUP BY user_id, sid
),
cov AS (
  SELECT unnest(generate_series(h0, h1)) AS h FROM sess
)
SELECT strftime(to_timestamp(h * 3600), '%Y-%m-%d %H:00') AS hour,
       count(*) AS n_active
FROM cov GROUP BY h
"""


def q_conversion_lag(sf_dir: str):
    """Time-to-convert — per user, the lag in WHOLE SECONDS (exact µs
    integer subtraction + floor division on both sides) between the
    first signup and the first purchase AT OR AFTER it: the funnel
    metric with a time dimension (q_funnel counts conversions; this
    measures them). Users without a qualifying purchase drop (inner
    join).

    Scale shape: predicate-pushdown read of the two event types; ONE
    user-keyed shuffle; per-partition pandas C-level groupby mins +
    merge — no window sort, no driver state."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type").isin(["signup", "purchase"])),
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "is_signup": pc.equal(t.column("event_type"), "signup")}
        )

    out_schema = pa.schema([("user_id", pa.int64()), ("lag_s", pa.int64())])

    def lag(df: pd.DataFrame) -> pa.Table:
        s = df[df["is_signup"]].groupby("user_id")["ts_us"].min()
        if s.empty:
            return out_schema.empty_table()
        p = df[~df["is_signup"]].merge(
            s.rename("s_us"), left_on="user_id", right_index=True
        )
        p = p[p["ts_us"] >= p["s_us"]]
        if p.empty:
            return out_schema.empty_table()
        first = p.groupby("user_id").agg(
            p_us=("ts_us", "min"), s_us=("s_us", "first")
        )
        return pa.Table.from_pydict(
            {"user_id": pa.array(first.index.to_numpy(), pa.int64()),
             "lag_s": pa.array(
                 (first["p_us"].to_numpy() - first["s_us"].to_numpy())
                 // 1_000_000,
                 pa.int64(),
             )},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        lag, out_schema,
    )


SQL_CONVERSION_LAG = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
  GROUP BY e.user_id
)
SELECT user_id,
       (epoch_us(p_ts) - epoch_us(s_ts)) // 1000000 AS lag_s
FROM s JOIN p USING (user_id)
"""


def q_forget_users(sf_dir: str):
    """Right-to-be-forgotten CASCADE — the privacy-compliance operation a
    production corpus must support: the deletion set (every user who
    emitted an 'error' event) is derived from the data, then erased
    across THREE tables (events by user_id, orders and customer by
    custkey); the certificate row per table carries n_deleted, n_kept
    and the commutative md5 checksum of the SURVIVING rows, so the purge
    is verifiable replica-to-replica without moving data.

    Scale shape: the deletion set stays distributed — each purge is a
    coarse_anti_join (hash-partitioned cogroup; the user set is never a
    driver/broadcast structure, it's web-scale by assumption); counts
    and checksums reduce through per-block partials (checksum sums ride
    as arbitrary-precision strings, the table_checksum pattern)."""
    from semantic_search_system_ray.functions.hashing import md5_hash64
    from semantic_search_system_ray.stages.util import coarse_anti_join

    bad = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "event_type"],
        filter=(pc.field("event_type") == "error"),
    ).map_batches(
        lambda t: pa.Table.from_pydict({"bad_key": t.column("user_id")})
        .group_by(["bad_key"]).aggregate([]),
        batch_format="pyarrow",
    ).materialize()

    part_schema = pa.schema(
        [("n", pa.int64()), ("s", pa.string())]
    )

    def survivors_cert(ds, row_strings) -> tuple[int, int]:
        def partial(t: pa.Table) -> pa.Table:
            total = sum(md5_hash64(s) for s in row_strings(t))
            return pa.Table.from_pydict(
                {"n": [t.num_rows], "s": [str(total)]}, schema=part_schema
            )

        def combine(t: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"n": [int(pc.sum(t.column("n")).as_py() or 0)],
                 "s": [str(sum(int(x) for x in t.column("s").to_pylist()))]},
                schema=part_schema,
            )

        # fan-in-64 tree over per-block partials (the table_checksum
        # shape) — the driver sees ≤64 rows at any block count
        parts = ds.map_batches(partial, batch_format="pyarrow")
        k = parts.count()
        while k > 64:
            parts = parts.repartition(max(1, (k + 63) // 64)).map_batches(
                combine, batch_format="pyarrow", batch_size=None
            )
            k = parts.count()
        n = cs = 0
        for r in parts.take_all():
            n += r["n"]
            cs += int(r["s"])
        return n, cs

    specs = [
        ("events", ["event_id", "user_id"], "user_id",
         lambda t: (f"{e}|{u}" for e, u in zip(
             t.column("event_id").to_pylist(), t.column("user_id").to_pylist()))),
        ("orders", ["o_orderkey", "o_custkey"], "o_custkey",
         lambda t: (f"{o}|{c}" for o, c in zip(
             t.column("o_orderkey").to_pylist(), t.column("o_custkey").to_pylist()))),
        ("customer", ["c_custkey", "c_mktsegment"], "c_custkey",
         lambda t: (f"{c}|{m}" for c, m in zip(
             t.column("c_custkey").to_pylist(), t.column("c_mktsegment").to_pylist()))),
    ]
    out = {"table_name": [], "n_deleted": [], "n_kept": [], "checksum": []}
    for name, cols, key, row_strings in specs:
        ds = rd.read_parquet(_p(sf_dir, name), columns=cols)
        total = ds.count()  # metadata-only on parquet
        kept_ds = coarse_anti_join(
            ds, bad, left_key=key, right_key="bad_key",
            out_schema=pa.schema(
                [(c, pa.int64() if c != "c_mktsegment" else pa.string())
                 for c in cols]
            ),
        )
        n_kept, cs = survivors_cert(kept_ds, row_strings)
        out["table_name"].append(name)
        out["n_deleted"].append(total - n_kept)
        out["n_kept"].append(n_kept)
        out["checksum"].append(str(cs))
    return pa.Table.from_pydict(
        {"table_name": pa.array(out["table_name"], pa.string()),
         "n_deleted": pa.array(out["n_deleted"], pa.int64()),
         "n_kept": pa.array(out["n_kept"], pa.int64()),
         "checksum": pa.array(out["checksum"], pa.string())}
    )


SQL_FORGET_USERS = """
WITH bad AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
SELECT 'events' AS table_name,
       (SELECT count(*) FROM events) - count(*) AS n_deleted,
       count(*) AS n_kept,
       CAST(coalesce(sum(md5_number_lower(
         CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
       )), 0) AS VARCHAR) AS checksum
FROM events WHERE user_id NOT IN (SELECT user_id FROM bad)
UNION ALL
SELECT 'orders',
       (SELECT count(*) FROM orders) - count(*),
       count(*),
       CAST(coalesce(sum(md5_number_lower(
         CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
       )), 0) AS VARCHAR)
FROM orders WHERE o_custkey NOT IN (SELECT user_id FROM bad)
UNION ALL
SELECT 'customer',
       (SELECT count(*) FROM customer) - count(*),
       count(*),
       CAST(coalesce(sum(md5_number_lower(
         CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment
       )), 0) AS VARCHAR)
FROM customer WHERE c_custkey NOT IN (SELECT user_id FROM bad)
"""


def q_dow_priority_contingency(sf_dir: str):
    """Categorical-association diagnostics: the day-of-week × order
    priority CONTINGENCY table with expected counts and per-cell chi²
    contributions — the independence test a data-quality / seasonality
    audit runs. Marginals and counts are exact integers; each cell's
    (expected, chi2_cell) is ONE mirrored float chain (no cross-cell
    float summation — per-cell values are order-independent, so the
    hash gate holds; the global χ² is the trivial driver sum of the
    emitted cells if a consumer wants it).

    Scale shape: per-block (dow, priority) count combiners → one
    groupby over the ≤7×|priorities| domain; everything after is
    driver math on a calendar-bounded table."""
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority"]
    )

    def partial(t: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.cast(
                pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                pa.date32(),
            ),
            pa.int32(),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday; DuckDB Sunday=0
        t2 = pa.Table.from_pydict(
            {"dow": pa.array(dow, pa.int64()),
             "pri": t.column("o_orderpriority")}
        )
        out = t2.group_by(["dow", "pri"]).aggregate([("pri", "count")])
        return out.rename_columns(["dow", "pri", "o"])

    rows = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "pri"])
        .aggregate(Sum("o", alias_name="o"))
        .take_all()  # ≤ 7 × |priorities|
    )
    row_tot: Counter = Counter()
    col_tot: Counter = Counter()
    n = 0
    for r in rows:
        row_tot[r["dow"]] += int(r["o"])
        col_tot[r["pri"]] += int(r["o"])
        n += int(r["o"])
    out = {"dow": [], "pri": [], "o": [], "expected": [], "chi2_cell": []}
    for r in sorted(rows, key=lambda r: (r["dow"], r["pri"])):
        o = int(r["o"])
        e = np.float64(row_tot[r["dow"]] * col_tot[r["pri"]]) / np.float64(n)
        d = np.float64(o) - e
        out["dow"].append(int(r["dow"]))
        out["pri"].append(r["pri"])
        out["o"].append(o)
        out["expected"].append(e)
        out["chi2_cell"].append(d * d / e)
    return pa.Table.from_pydict(
        {"dow": pa.array(out["dow"], pa.int64()),
         "pri": pa.array(out["pri"], pa.string()),
         "o": pa.array(out["o"], pa.int64()),
         "expected": pa.array(out["expected"], pa.float64()),
         "chi2_cell": pa.array(out["chi2_cell"], pa.float64())}
    )


SQL_DOW_PRIORITY_CONTINGENCY = """
WITH c AS (
  SELECT dayofweek(o_orderdate) AS dow, o_orderpriority AS pri,
         count(*) AS o
  FROM orders GROUP BY 1, 2
),
r AS (SELECT dow, sum(o) AS rt FROM c GROUP BY dow),
k AS (SELECT pri, sum(o) AS ct FROM c GROUP BY pri),
n AS (SELECT sum(o) AS n FROM c)
SELECT c.dow, c.pri, c.o,
       CAST(r.rt * k.ct AS DOUBLE) / CAST(n.n AS DOUBLE) AS expected,
       (CAST(c.o AS DOUBLE) - CAST(r.rt * k.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
         * (CAST(c.o AS DOUBLE)
            - CAST(r.rt * k.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
         / (CAST(r.rt * k.ct AS DOUBLE) / CAST(n.n AS DOUBLE)) AS chi2_cell
FROM c JOIN r USING (dow) JOIN k USING (pri) CROSS JOIN n
"""


def q_yoy_revenue(sf_dir: str):
    """Year-over-year growth reporting — LAG over an AGGREGATED time
    series (not over raw rows): revenue cents per (year, priority),
    then each year's growth vs the same priority's prior year as an
    EXACT integer ppm ratio ((cur−prev)·10⁶ // prev — no FP in the
    growth figure). First year per priority emits NULL growth (no
    prior), mirroring SQL LAG.

    Scale shape: per-block (year, priority) cent-sum combiners → one
    groupby over the calendar×priority domain; the lag runs on that
    bounded table driver-side. Money rides as int64 cents."""
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority",
                                       "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.cast(
            pc.year(pc.cast(t.column("o_orderdate"), pa.timestamp("us"))),
            pa.int64(),
        )
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"yr": yr, "pri": t.column("o_orderpriority"), "cents": cents}
        )
        out = t2.group_by(["yr", "pri"]).aggregate([("cents", "sum")])
        return out.rename_columns(["yr", "pri", "cents"])

    rows = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["yr", "pri"])
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # |years| × |priorities| — calendar-bounded
    )
    rows.sort(key=lambda r: (r["pri"], r["yr"]))
    out = {"yr": [], "pri": [], "revenue": [], "yoy_ppm": []}
    prev: dict = {}
    for r in rows:
        c = int(r["cents"])
        p = prev.get(r["pri"])
        out["yr"].append(int(r["yr"]))
        out["pri"].append(r["pri"])
        out["revenue"].append(np.float64(c) / 100.0)
        if p is not None and p != 0:
            # DuckDB // truncates toward zero; Python // floors — mirror
            # truncation explicitly so NEGATIVE growth agrees
            num = (c - p) * 1_000_000
            out["yoy_ppm"].append((1 if num >= 0 else -1) * (abs(num) // p))
        else:
            out["yoy_ppm"].append(None)
        prev[r["pri"]] = c
    return pa.Table.from_pydict(
        {"yr": pa.array(out["yr"], pa.int64()),
         "pri": pa.array(out["pri"], pa.string()),
         "revenue": pa.array(out["revenue"], pa.float64()),
         "yoy_ppm": pa.array(out["yoy_ppm"], pa.int64())}
    )


SQL_YOY_REVENUE = """
WITH a AS (
  SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
),
l AS (
  SELECT yr, pri, cents,
         lag(cents) OVER (PARTITION BY pri ORDER BY yr) AS prev
  FROM a
)
SELECT CAST(yr AS BIGINT) AS yr, pri,
       CAST(CAST(cents AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
       CASE WHEN prev IS NOT NULL AND prev <> 0
            THEN CAST((CAST(cents AS HUGEINT) - prev) * 1000000 // prev
                      AS BIGINT)
       END AS yoy_ppm
FROM l
"""


def q_order_intervals(sf_dir: str):
    """Inter-event interval analytics — the repeat-purchase cadence
    metric: per customer, the gaps in whole days between CONSECUTIVE
    orders (ordered by date, ties by orderkey), then the EXACT global
    p50/p90 of those gaps plus the gap count. A quantile over a
    DERIVED per-key sequence: the derivation is a per-partition
    vectorized diff, the quantiles come from the bounded-cardinality
    integer histogram (day-domain cells) — no global sort at either
    stage.

    Scale shape: ONE customer-keyed shuffle emits per-partition
    (gap_days, n) histogram partials; the global groupby is
    day-domain-sized."""
    import pandas as pd

    from semantic_search_system_ray.stages.sketch import _quantile_rank
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    QS = [0.5, 0.9]

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def proj(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(
                pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                pa.date32(),
            ),
            pa.int32(),
        )
        return pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"),
             "o_orderkey": t.column("o_orderkey"),
             "day": pc.cast(day, pa.int64())}
        )

    part_schema = pa.schema([("gap", pa.int64()), ("n", pa.int64())])

    def gaps(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["o_custkey", "day", "o_orderkey"],
                            kind="mergesort")
        u = df["o_custkey"].to_numpy()
        d = df["day"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gap = np.empty(len(df), np.int64)
        gap[1:] = d[1:] - d[:-1]
        gap = gap[same]
        if not len(gap):
            return part_schema.empty_table()
        vals, cnts = np.unique(gap, return_counts=True)
        return pa.Table.from_pydict(
            {"gap": pa.array(vals, pa.int64()),
             "n": pa.array(cnts.astype(np.int64), pa.int64())},
            schema=part_schema,
        )

    rows = (
        coarse_partition_apply(
            orders.map_batches(proj, batch_format="pyarrow"), ["o_custkey"],
            gaps, part_schema,
        )
        .groupby("gap").aggregate(Sum("n", alias_name="n"))
        .take_all()  # day-domain-bounded
    )
    cells = np.array([r["gap"] for r in rows], dtype=np.int64)
    counts = np.array([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(cells)
    cells, counts = cells[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in QS:
        out_q.append(q)
        if n == 0:
            out_v.append(None)
        else:
            idx = int(np.searchsorted(cum, _quantile_rank(q, n), side="left"))
            out_v.append(int(cells[idx]))
    return pa.Table.from_pydict(
        {"q": pa.array(out_q, pa.float64()),
         "gap_days": pa.array(out_v, pa.int64()),
         "n_gaps": pa.array([n] * len(QS), pa.int64())}
    )


SQL_ORDER_INTERVALS = """
WITH g AS (
  SELECT CAST(o_orderdate AS DATE)
           - lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
                                               o_orderkey
             ) AS gap
  FROM orders
),
d AS (SELECT CAST(gap AS BIGINT) AS gap FROM g WHERE gap IS NOT NULL)
SELECT unnest([0.5, 0.9]) AS q,
       unnest(quantile_disc(gap, [0.5, 0.9])) AS gap_days,
       count(*) AS n_gaps
FROM d
"""


def q_orders_rank_ties(sf_dir: str):
    """Per-group top-k WITH TIES — SQL ``rank()`` (gap rank) ≤ 3, the
    tie-preserving variant of q_orders_topk_per_priority's ROW_NUMBER
    cut. Prices compare as exact cents ints (no float-order ties).

    Combiner correctness: a row with rank ≤ 3 has ≤ 2 distinct prices
    above it globally, hence ≤ 2 within its own block — so keeping each
    block's rows at its top-3 DISTINCT prices per group is a provable
    superset, and every row above a surviving row is itself a candidate,
    so ranks recomputed over the candidate set alone are EXACT. What
    leaves each block is |groups|·3·(ties) rows — output-bounded."""
    import pandas as pd

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
    )

    def keep_candidates(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"pri": t.column("o_orderpriority").to_pandas(),
             "key": t.column("o_orderkey").to_pandas(),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                 pa.int64(),
             ).to_pandas()}
        )
        top3 = (
            df[["pri", "cents"]].drop_duplicates()
            .sort_values(["pri", "cents"], ascending=[True, False],
                         kind="mergesort")
            .groupby("pri", sort=False).head(3)
        )
        kept = df.merge(top3, on=["pri", "cents"])
        return pa.Table.from_pydict(
            {"pri": kept["pri"].to_numpy(),
             "key": kept["key"].to_numpy(np.int64),
             "cents": kept["cents"].to_numpy(np.int64)}
        )

    cand = pd.DataFrame(
        orders.map_batches(keep_candidates, batch_format="pyarrow").take_all()
    )
    # exact gap-rank over the candidate superset (see docstring proof)
    cand = cand.sort_values(["pri", "cents", "key"],
                            ascending=[True, False, True], kind="mergesort")
    above = cand.groupby("pri", sort=False).cumcount()
    first_of_price = ~cand.duplicated(["pri", "cents"])
    rk = above.where(first_of_price).groupby(
        [cand["pri"], cand["cents"]], sort=False
    ).transform("first") + 1
    cand = cand[rk <= 3]
    rk = rk[rk <= 3]
    return pa.Table.from_pydict(
        {"o_orderpriority": pa.array(cand["pri"].to_numpy(), pa.string()),
         "o_orderkey": pa.array(cand["key"].to_numpy(np.int64), pa.int64()),
         "o_totalprice": pa.array(
             cand["cents"].to_numpy(np.float64) / 100.0, pa.float64()),
         "rk": pa.array(rk.to_numpy(np.int64), pa.int64())}
    )


SQL_ORDERS_RANK_TIES = """
SELECT o_orderpriority, o_orderkey,
       CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0
         AS o_totalprice,
       rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         rank() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC
         ) AS rk
  FROM orders
) WHERE rk <= 3
"""


K_ANON = 10


def q_k_anonymity(sf_dir: str):
    """k-ANONYMITY generalization ladder — the privacy-release
    transform: quasi-identifier (nation, segment) groups smaller than
    k=10 GENERALIZE up the hierarchy nation → region → '*' until they
    clear k (the last level pools by segment and is emitted regardless —
    the suppression bucket). Output: one row per released group with
    its generalization level. Counts are exact integers end-to-end.

    Scale shape: ONE groupby over the bounded QI domain (|nations| ×
    |segments|) with per-block count combiners; the ladder itself is
    driver math over that domain-bounded table plus the tiny nation
    dimension (broadcast-read once)."""
    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_nationkey", "c_mktsegment"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.Table.from_pydict(
            {"nk": pc.cast(t.column("c_nationkey"), pa.int64()),
             "seg": t.column("c_mktsegment")}
        )
        out = t2.group_by(["nk", "seg"]).aggregate([("seg", "count")])
        return out.rename_columns(["nk", "seg", "n"])

    rows = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "seg"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # |nations| × |segments| — domain-bounded
    )
    nat = {
        r["n_nationkey"]: (r["n_name"], int(r["n_regionkey"]))
        for r in rd.read_parquet(_p(sf_dir, "nation")).take_all()
    }
    out = {"qi": [], "seg": [], "n": [], "level": []}
    roll1: Counter = Counter()
    for r in rows:
        n = int(r["n"])
        name, rk = nat[r["nk"]]
        if n >= K_ANON:
            out["qi"].append(name)
            out["seg"].append(r["seg"])
            out["n"].append(n)
            out["level"].append(0)
        else:
            roll1[(rk, r["seg"])] += n
    roll2: Counter = Counter()
    for (rk, seg), n in roll1.items():
        if n >= K_ANON:
            out["qi"].append(f"REGION_{rk}")
            out["seg"].append(seg)
            out["n"].append(n)
            out["level"].append(1)
        else:
            roll2[seg] += n
    for seg, n in roll2.items():
        out["qi"].append("*")
        out["seg"].append(seg)
        out["n"].append(n)
        out["level"].append(2)
    return pa.Table.from_pydict(
        {"qi": pa.array(out["qi"], pa.string()),
         "seg": pa.array(out["seg"], pa.string()),
         "n": pa.array(out["n"], pa.int64()),
         "level": pa.array(out["level"], pa.int64())}
    )


SQL_K_ANONYMITY = f"""
WITH c0 AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg, count(*) AS n
  FROM customer GROUP BY 1, 2
),
j AS (
  SELECT c0.*, n.n_name, n.n_regionkey
  FROM c0 JOIN nation n ON c0.nk = n.n_nationkey
),
lvl0 AS (SELECT n_name AS qi, seg, n FROM j WHERE n >= {K_ANON}),
c1 AS (
  SELECT n_regionkey AS rk, seg, sum(n) AS n
  FROM j WHERE n < {K_ANON} GROUP BY 1, 2
),
lvl1 AS (
  SELECT 'REGION_' || CAST(rk AS VARCHAR) AS qi, seg, n
  FROM c1 WHERE n >= {K_ANON}
),
lvl2 AS (
  SELECT '*' AS qi, seg, sum(n) AS n
  FROM c1 WHERE n < {K_ANON} GROUP BY seg
)
SELECT qi, seg, CAST(n AS BIGINT) AS n, CAST(0 AS BIGINT) AS level FROM lvl0
UNION ALL
SELECT qi, seg, CAST(n AS BIGINT), CAST(1 AS BIGINT) FROM lvl1
UNION ALL
SELECT qi, seg, CAST(n AS BIGINT), CAST(2 AS BIGINT) FROM lvl2
"""


def q_mv_delta_refresh(sf_dir: str):
    """INCREMENTAL materialized-view maintenance — the delta-merge that
    keeps an aggregate MV current without rescanning history: the MV is
    revenue cents per priority; the change log updates every order with
    orderkey % 10 == 0 to price + 10% (exact integer cents' = c + c//10).
    The refreshed MV = base MV ⊕ per-priority DELTA contributions
    (new − old = c//10), where the delta pass reads ONLY the changed
    rows — the self-maintainable-view property, exercised end-to-end.

    Scale shape: both passes are per-block cent-sum combiners → one
    |priorities|-sized groupby each; the ⊕ merge is driver math over
    the bounded MV. The oracle recomputes from scratch over the
    modified table — incremental must equal full recompute."""
    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def base_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"pri": t.column("o_orderpriority"), "cents": cents}
        )
        out = t2.group_by(["pri"]).aggregate([("cents", "sum")])
        return out.rename_columns(["pri", "cents"])

    def delta_partial(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        sel = keys % 10 == 0
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)[sel]
        pri = t.column("o_orderpriority").to_numpy(zero_copy_only=False)[sel]
        t2 = pa.Table.from_pydict(
            {"pri": pa.array(pri, pa.string()),
             "d": pa.array(cents // 10, pa.int64()),
             "one": pa.array(np.ones(sel.sum(), np.int64))}
        )
        out = t2.group_by(["pri"]).aggregate([("d", "sum"), ("one", "sum")])
        return out.rename_columns(["pri", "d", "n"])

    base = {
        r["pri"]: int(r["cents"])
        for r in orders.map_batches(base_partial, batch_format="pyarrow")
        .groupby("pri").aggregate(Sum("cents", alias_name="cents")).take_all()
    }
    delta: dict = {}
    for r in (
        orders.map_batches(delta_partial, batch_format="pyarrow")
        .groupby("pri")
        .aggregate(Sum("d", alias_name="d"), Sum("n", alias_name="n"))
        .take_all()
    ):
        delta[r["pri"]] = (int(r["d"]), int(r["n"]))
    out = {"pri": [], "revenue": [], "n_updated": []}
    for pri in sorted(base):
        d, n = delta.get(pri, (0, 0))
        out["pri"].append(pri)
        out["revenue"].append(np.float64(base[pri] + d) / 100.0)
        out["n_updated"].append(n)
    return pa.Table.from_pydict(
        {"pri": pa.array(out["pri"], pa.string()),
         "revenue": pa.array(out["revenue"], pa.float64()),
         "n_updated": pa.array(out["n_updated"], pa.int64())}
    )


SQL_MV_DELTA_REFRESH = """
WITH c AS (
  SELECT o_orderpriority AS pri,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         (o_orderkey % 10 = 0) AS upd
  FROM orders
)
SELECT pri,
       CAST(CAST(sum(CASE WHEN upd THEN cents + cents // 10
                          ELSE cents END) AS BIGINT) AS DOUBLE)
         / 100.0 AS revenue,
       CAST(sum(CASE WHEN upd THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
FROM c GROUP BY pri
"""


def q_distinct_users_by_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT) — the canonical cardinality
    aggregate done EXACTLY at scale (the HLL sketch's exact sibling):
    distinct users per event type via ONE user-keyed shuffle — a
    (type, user) pair lives in exactly one user partition after the
    per-block pre-dedup, so per-partition distinct counts sum globally
    without a second distinct pass."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    part_schema = pa.schema([("event_type", pa.string()), ("n", pa.int64())])

    def per_user(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        cnt = df.drop_duplicates(["event_type", "user_id"]) \
                .groupby("event_type").size()
        return pa.Table.from_pydict(
            {"event_type": pa.array(cnt.index.to_numpy(), pa.string()),
             "n": pa.array(cnt.to_numpy(), pa.int64())},
            schema=part_schema,
        )

    partials = coarse_partition_apply(
        ev.map_batches(pre, batch_format="pyarrow"), ["user_id"],
        per_user, part_schema,
    )
    return partials.groupby("event_type").aggregate(
        Sum("n", alias_name="n_users")
    )


SQL_DISTINCT_USERS_BY_TYPE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q_source_vocab_overlap(sf_dir: str):
    """Pairwise corpus-segment similarity — the domain-shift diagnostic
    a data-mixture pipeline runs: Jaccard overlap of the distinct
    vocabularies of every source pair, exact (intersection/union counts
    are integers; the ratio is an exact integer ppm — no FP ranking).

    Scale shape: per-block distinct (source, term) pre-dedup → one
    term-keyed coarse shuffle where each partition emits per-PAIR
    intersection partials and per-source vocab partials (a term's
    source set is tiny — |sources| bounded); the final groupbys run
    over |sources|² rows. The vocabulary itself never reaches the
    driver."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        import re as _re

        seen = set()
        for src, txt in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            for w in set(_re.findall(r"\w+", (txt or "").lower())):
                seen.add((src, w))
        return pa.Table.from_pydict(
            {"source": pa.array([s for s, _ in seen], pa.string()),
             "term": pa.array([w for _, w in seen], pa.string())}
        )

    part_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n", pa.int64())]
    )

    def per_term(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop_duplicates(["source", "term"])
        # vectorized: pair intersections via one C-level self-merge on
        # term (per-term fanout ≤ |sources|²), marginals via one groupby
        # — no per-term Python loop (the vocabulary is web-scale)
        m = df.merge(df, on="term", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        pair_n = m.groupby(["source_a", "source_b"]).size()
        vocab_n = df.groupby("source").size()
        return pa.Table.from_pydict(
            {"a": pa.array(
                list(pair_n.index.get_level_values(0))
                + list(vocab_n.index), pa.string()),
             "b": pa.array(
                 list(pair_n.index.get_level_values(1))
                 + [""] * len(vocab_n), pa.string()),
             "n": pa.array(
                 list(pair_n.to_numpy()) + list(vocab_n.to_numpy()),
                 pa.int64())},
            schema=part_schema,
        )

    rows = (
        coarse_partition_apply(
            docs.map_batches(pairs, batch_format="pyarrow"), ["term"],
            per_term, part_schema,
        )
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
        .take_all()  # |sources|² — domain-bounded
    )
    vocab = {r["a"]: int(r["n"]) for r in rows if r["b"] == ""}
    out = {"src_a": [], "src_b": [], "inter": [], "unions": [],
           "jaccard_ppm": []}
    for r in sorted(rows, key=lambda r: (r["a"], r["b"])):
        if r["b"] == "":
            continue
        inter = int(r["n"])
        union = vocab[r["a"]] + vocab[r["b"]] - inter
        out["src_a"].append(r["a"])
        out["src_b"].append(r["b"])
        out["inter"].append(inter)
        out["unions"].append(union)
        out["jaccard_ppm"].append(inter * 1_000_000 // union)
    return pa.Table.from_pydict(
        {"src_a": pa.array(out["src_a"], pa.string()),
         "src_b": pa.array(out["src_b"], pa.string()),
         "inter": pa.array(out["inter"], pa.int64()),
         "unions": pa.array(out["unions"], pa.int64()),
         "jaccard_ppm": pa.array(out["jaccard_ppm"], pa.int64())}
    )


SQL_SOURCE_VOCAB_OVERLAP = r"""
WITH st AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
),
v AS (SELECT source, count(*) AS nv FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.inter,
       va.nv + vb.nv - i.inter AS unions,
       CAST(CAST(i.inter AS HUGEINT) * 1000000
            // (va.nv + vb.nv - i.inter) AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN v va ON i.src_a = va.source
JOIN v vb ON i.src_b = vb.source
"""


BUCKET_N = 16


def q_bucketed_join(sf_dir: str):
    """BUCKETED-STORAGE join — co-location as a DATA LAYOUT property:
    lineitem and orders are written ONCE into hash-bucketed layouts on
    the join key (`sources/bucketstore`, same routing hash as the
    coarse primitives), and the join then runs as a union of per-bucket
    single-task cogroups with ZERO cross-bucket movement — the
    pay-the-shuffle-once-at-write-time pattern every warehouse uses to
    amortize co-location across queries on the same key. Result:
    revenue per priority (cents-exact), identical to the shuffle-join
    plan — bench compares the two.

    Scale shape: the one-time layout write is the only all-to-all;
    bucket pairs join independently (bucket count sized so a bucket
    pair fits one task's memory); the final groupby is
    |priorities|-sized over per-block combiners."""
    import os

    from semantic_search_system_ray.sources.bucketstore import (
        bucketed_attach,
        write_bucketed,
    )

    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    store = f"/tmp/bucketstore_{sf_name}_{BUCKET_N}"
    marker = os.path.join(store, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(store, exist_ok=True)
        write_bucketed(
            rd.read_parquet(_p(sf_dir, "lineitem"),
                            columns=["l_orderkey", "l_extendedprice"]),
            ["l_orderkey"], BUCKET_N, os.path.join(store, "lineitem"),
        )
        write_bucketed(
            rd.read_parquet(_p(sf_dir, "orders"),
                            columns=["o_orderkey", "o_orderpriority"]),
            ["o_orderkey"], BUCKET_N, os.path.join(store, "orders"),
        )
        open(marker, "w").write("ok")

    joined = bucketed_attach(
        os.path.join(store, "lineitem"), os.path.join(store, "orders"),
        left_key="l_orderkey", right_key="o_orderkey",
        attach_cols=["o_orderpriority"],
        out_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_extendedprice", pa.float64()),
             ("o_orderpriority", pa.string())]
        ),
        left_columns=["l_orderkey", "l_extendedprice"],
        right_columns=["o_orderkey", "o_orderpriority"],
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        t2 = pa.Table.from_pydict(
            {"pri": t.column("o_orderpriority"), "cents": cents}
        )
        out = t2.group_by(["pri"]).aggregate([("cents", "sum")])
        return out.rename_columns(["pri", "cents"])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("pri")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()
    )
    agg.sort(key=lambda r: r["pri"])
    return pa.Table.from_pydict(
        {"pri": pa.array([r["pri"] for r in agg], pa.string()),
         "revenue": pa.array(
             [np.float64(int(r["cents"])) / 100.0 for r in agg], pa.float64())}
    )


SQL_BUCKETED_JOIN = """
SELECT o_orderpriority AS pri,
       CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS DOUBLE) / 100.0 AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderpriority
"""


def q_revenue_concentration(sf_dir: str):
    """Pareto / 80-20 concentration — what share of total revenue comes
    from the top-decile customers: per-customer lifetime cents → the
    exact p90 revenue threshold (bounded-cardinality histogram over
    whole-dollar cells, the rfm_segments quantization) → share of cents
    at-or-above it. Counts and sums are exact integers; the two shares
    are ONE mirrored divide each.

    Scale shape: one customer-keyed groupby with per-block combiners;
    the threshold comes from the dollar-domain histogram; the final
    conditional sum is another combiner pass over the customer
    profile. Nothing row-scale reaches the driver."""
    from semantic_search_system_ray.stages.sketch import exact_quantiles_histogram

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"), "cents": cents}
        )
        out = t2.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return out.rename_columns(["o_custkey", "cents"])

    cust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()
    )

    def with_dollars(t: pa.Table) -> pa.Table:
        d = t.column("cents").to_numpy(zero_copy_only=False) // 100
        return t.append_column("dollars", pa.array(d, pa.int64()))

    cust_d = cust.map_batches(with_dollars, batch_format="pyarrow").materialize()
    thr = exact_quantiles_histogram(cust_d, "dollars", [0.9], scale=1)[0][1]

    def cond_partial(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        d = t.column("dollars").to_numpy(zero_copy_only=False)
        top = d >= thr
        return pa.Table.from_pydict(
            {"n_top": pa.array([int(top.sum())], pa.int64()),
             "n_all": pa.array([len(c)], pa.int64()),
             "c_top": pa.array([int(c[top].sum())], pa.int64()),
             "c_all": pa.array([int(c.sum())], pa.int64())}
        )

    agg = (
        cust_d.map_batches(cond_partial, batch_format="pyarrow")
        .sum(["n_top", "n_all", "c_top", "c_all"])
    )
    n_top, n_all = int(agg["sum(n_top)"]), int(agg["sum(n_all)"])
    c_top, c_all = int(agg["sum(c_top)"]), int(agg["sum(c_all)"])
    return pa.Table.from_pydict(
        {"n_top": pa.array([n_top], pa.int64()),
         "n_customers": pa.array([n_all], pa.int64()),
         "revenue_share": pa.array(
             [np.float64(c_top) / np.float64(c_all)], pa.float64()),
         "customer_share": pa.array(
             [np.float64(n_top) / np.float64(n_all)], pa.float64())}
    )


SQL_REVENUE_CONCENTRATION = """
WITH cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
c2 AS (SELECT cents, cents // 100 AS dollars FROM cust),
thr AS (SELECT quantile_disc(dollars, 0.9) AS t FROM c2)
SELECT CAST(sum(CASE WHEN dollars >= thr.t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_top,
       count(*) AS n_customers,
       CAST(CAST(sum(CASE WHEN dollars >= thr.t THEN cents ELSE 0 END)
                 AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) AS revenue_share,
       CAST(CAST(sum(CASE WHEN dollars >= thr.t THEN 1 ELSE 0 END)
                 AS BIGINT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS customer_share
FROM c2, thr
"""


def q_event_type_affinity(sf_dir: str):
    """Behavior-affinity mining — which event types co-occur in the
    same users' histories beyond what popularity predicts: per
    unordered type pair, the users doing BOTH, with exact integer lift
    (⌊n_ab·N·10⁶/(n_a·n_b)⌋) — the market-basket measure over user
    behavior instead of order baskets.

    Scale shape: ONE user-keyed shuffle; each partition reduces its
    users to per-pair partial counts over the tiny type domain
    (|types|² pairs); marginals derive from the same rows. Exact
    big-int scoring driver-side over the domain-bounded table."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    part_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n", pa.int64())]
    )

    def per_user(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop_duplicates(["user_id", "event_type"])
        # vectorized: pair co-occurrence via one C-level self-merge on
        # user (fanout ≤ |types|² per user), marginals + distinct-user
        # count via groupbys — no per-user Python loop (users are
        # row-scale)
        m = df.merge(df, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        pair_n = m.groupby(["event_type_a", "event_type_b"]).size()
        marg_n = df.groupby("event_type").size()
        n_users = df["user_id"].nunique()
        return pa.Table.from_pydict(
            {"a": pa.array(
                list(pair_n.index.get_level_values(0))
                + list(marg_n.index) + [""], pa.string()),
             "b": pa.array(
                 list(pair_n.index.get_level_values(1))
                 + [""] * len(marg_n) + [""], pa.string()),
             "n": pa.array(
                 list(pair_n.to_numpy()) + list(marg_n.to_numpy())
                 + [int(n_users)], pa.int64())},
            schema=part_schema,
        )

    rows = (
        coarse_partition_apply(
            ev.map_batches(pre, batch_format="pyarrow"), ["user_id"],
            per_user, part_schema,
        )
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
        .take_all()  # |types|² — domain-bounded
    )
    marg = {r["a"]: int(r["n"]) for r in rows if r["b"] == "" and r["a"] != ""}
    n_users = next(int(r["n"]) for r in rows if r["a"] == "" and r["b"] == "")
    out = {"type_a": [], "type_b": [], "n_both": [], "lift_ppm": []}
    for r in sorted(rows, key=lambda r: (r["a"], r["b"])):
        if r["b"] == "":
            continue
        n_ab = int(r["n"])
        out["type_a"].append(r["a"])
        out["type_b"].append(r["b"])
        out["n_both"].append(n_ab)
        out["lift_ppm"].append(
            n_ab * n_users * 1_000_000 // (marg[r["a"]] * marg[r["b"]])
        )
    return pa.Table.from_pydict(
        {"type_a": pa.array(out["type_a"], pa.string()),
         "type_b": pa.array(out["type_b"], pa.string()),
         "n_both": pa.array(out["n_both"], pa.int64()),
         "lift_ppm": pa.array(out["lift_ppm"], pa.int64())}
    )


SQL_EVENT_TYPE_AFFINITY = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT count(DISTINCT user_id) AS n FROM ut),
m AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both,
       CAST(CAST(p.n_both AS HUGEINT) * nu.n * 1000000
            // (ma.n * mb.n) AS BIGINT) AS lift_ppm
FROM p
JOIN m ma ON p.type_a = ma.event_type
JOIN m mb ON p.type_b = mb.event_type
CROSS JOIN nu
"""


def q_benford_digits(sf_dir: str):
    """Benford's-law forensics — the fraud/data-quality screen: the
    first significant digit distribution of order totals vs the
    Benford expectation log10(1 + 1/d). Digit counts are exact
    integers; each digit's (expected, chi2_cell) is ONE mirrored
    float chain (libm log10 — bit-identical cross-system on the same
    platform; no cross-digit float summation).

    Scale shape: per-block digit-count combiners (first digit via
    string of the cents int — no float log in the hot path) → one
    9-row groupby; the expectation math is driver-side."""
    import math

    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        first = pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1
        )
        t2 = pa.Table.from_pydict({"d": first})
        out = t2.group_by(["d"]).aggregate([("d", "count")])
        return out.rename_columns(["d", "n"])

    rows = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("d").aggregate(Sum("n", alias_name="n"))
        .take_all()  # ≤ 9 rows
    )
    total = sum(int(r["n"]) for r in rows)
    out = {"digit": [], "n": [], "expected": [], "chi2_cell": []}
    for r in sorted(rows, key=lambda r: r["d"]):
        d = int(r["d"])
        n = int(r["n"])
        e = np.float64(total) * math.log10(1.0 + 1.0 / np.float64(d))
        diff = np.float64(n) - e
        out["digit"].append(d)
        out["n"].append(n)
        out["expected"].append(e)
        out["chi2_cell"].append(diff * diff / e)
    return pa.Table.from_pydict(
        {"digit": pa.array(out["digit"], pa.int64()),
         "n": pa.array(out["n"], pa.int64()),
         "expected": pa.array(out["expected"], pa.float64()),
         "chi2_cell": pa.array(out["chi2_cell"], pa.float64())}
    )


SQL_BENFORD_DIGITS = """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
g AS (SELECT digit, count(*) AS n FROM c GROUP BY digit),
t AS (SELECT sum(n) AS total FROM g)
SELECT g.digit, g.n,
       CAST(t.total AS DOUBLE) * log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))
         AS expected,
       (CAST(g.n AS DOUBLE)
        - CAST(t.total AS DOUBLE)
          * log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE)))
       * (CAST(g.n AS DOUBLE)
          - CAST(t.total AS DOUBLE)
            * log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE)))
       / (CAST(t.total AS DOUBLE)
          * log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))) AS chi2_cell
FROM g CROSS JOIN t
"""


def q_ks_value_test(sf_dir: str):
    """EXACT two-sample Kolmogorov–Smirnov distance between the value
    distributions of 'purchase' and 'click' events — the drift /
    distribution-shift test, done with NO approximation and NO sort:
    D = max |CDF_a − CDF_b| evaluated on the merged bounded-cardinality
    integer histogram, where the max runs over the integer
    cross-products |cum_a·n_b − cum_b·n_a| (exact), and the only float
    op is the single final divide by n_a·n_b — mirrored verbatim.

    Scale shape: per-block (type, cents) histogram combiners → one
    value-domain-sized groupby; the CDF scan is driver math over the
    domain-bounded cells."""
    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_type", "value"],
        filter=(pc.field("event_type").isin(["purchase", "click"])),
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        t2 = pa.Table.from_pydict(
            {"g": t.column("event_type"), "cell": cents}
        )
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    rows = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).sum("n")
        .take_all()  # value-domain-bounded
    )
    cells: dict[int, list[int]] = {}
    for r in rows:
        e = cells.setdefault(int(r["cell"]), [0, 0])
        e[0 if r["g"] == "purchase" else 1] += int(r["sum(n)"])
    na = sum(v[0] for v in cells.values())
    nb = sum(v[1] for v in cells.values())
    ca = cb = 0
    d_num = 0
    for cell in sorted(cells):
        ca += cells[cell][0]
        cb += cells[cell][1]
        d_num = max(d_num, abs(ca * nb - cb * na))
    return pa.Table.from_pydict(
        {"n_purchase": pa.array([na], pa.int64()),
         "n_click": pa.array([nb], pa.int64()),
         "ks": pa.array(
             [np.float64(d_num) / np.float64(na * nb)], pa.float64())}
    )


SQL_KS_VALUE_TEST = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell
  FROM events WHERE event_type IN ('purchase', 'click')
),
h AS (
  SELECT cell,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nb
  FROM c GROUP BY cell
),
t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
      FROM h),
cum AS (
  SELECT sum(na) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS ca,
         sum(nb) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cb
  FROM h
)
SELECT t.ta AS n_purchase, t.tb AS n_click,
       CAST(max(abs(CAST(ca AS HUGEINT) * t.tb
                    - CAST(cb AS HUGEINT) * t.ta)) AS DOUBLE)
         / CAST(t.ta * t.tb AS DOUBLE) AS ks
FROM cum CROSS JOIN t
GROUP BY t.ta, t.tb
"""


def q_dup_payments(sf_dir: str):
    """Suspicious-payment screen — the payments-ops fraud query: pairs
    of orders by the SAME customer in the SAME $10k amount band within
    30 days of each other (orderkey_a < orderkey_b). Exact integers
    throughout: band = cents // 10⁶ (no float rounding-mode surface)
    and a µs window predicate.

    Scale shape: ONE customer-keyed shuffle; each partition
    self-merges on (customer, band) — candidates collapse to same-band
    collisions per customer (per-key bounded) before the window
    filter; no global self-join."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    WINDOW_US = 30 * 86400 * 1_000_000
    BAND_CENTS = 1_000_000  # $10k bands

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"),
             "o_orderkey": t.column("o_orderkey"),
             "ts_us": pc.cast(
                 pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                 pa.int64(),
             ),
             "band": pa.array(
                 pc.cast(
                     pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                     pa.int64(),
                 ).to_numpy(zero_copy_only=False) // BAND_CENTS,
                 pa.int64(),
             )}
        )

    out_schema = pa.schema(
        [("o_custkey", pa.int64()), ("orderkey_a", pa.int64()),
         ("orderkey_b", pa.int64()), ("band", pa.int64())]
    )

    def dups(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        m = df.merge(df, on=["o_custkey", "band"], suffixes=("_a", "_b"))
        m = m[m["o_orderkey_a"] < m["o_orderkey_b"]]
        m = m[(m["ts_us_a"] - m["ts_us_b"]).abs() <= WINDOW_US]
        return pa.Table.from_pydict(
            {"o_custkey": m["o_custkey"].to_numpy(np.int64),
             "orderkey_a": m["o_orderkey_a"].to_numpy(np.int64),
             "orderkey_b": m["o_orderkey_b"].to_numpy(np.int64),
             "band": m["band"].to_numpy(np.int64)},
            schema=out_schema,
        )

    return coarse_partition_apply(
        orders.map_batches(proj, batch_format="pyarrow"), ["o_custkey"],
        dups, out_schema,
    )


SQL_DUP_PAYMENTS = """
SELECT a.o_custkey,
       a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
       CAST(round(a.o_totalprice * 100) AS BIGINT) // 1000000 AS band
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND CAST(round(a.o_totalprice * 100) AS BIGINT) // 1000000
     = CAST(round(b.o_totalprice * 100) AS BIGINT) // 1000000
 AND a.o_orderkey < b.o_orderkey
 AND abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate))
     <= 2592000000000
"""


def q_bounce_rate(sf_dir: str):
    """Session BOUNCE RATE — the engagement-quality scalar: share of
    sessions (30-minute-gap definition) containing exactly one event.
    Counts are exact integers from the same vectorized session pass as
    q_session_paths; ONE mirrored divide at the end.

    Scale shape: one user-keyed shuffle emitting two-integer partials
    per partition; the rate is driver math."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    GAP_US = 30 * 60 * 1_000_000

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             )}
        )

    part_schema = pa.schema(
        [("n_sessions", pa.int64()), ("n_bounces", pa.int64())]
    )

    def bounce(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        sid = np.cumsum(brk)
        sizes = np.bincount(sid)[1:]
        return pa.Table.from_pydict(
            {"n_sessions": pa.array([int(len(sizes))], pa.int64()),
             "n_bounces": pa.array([int((sizes == 1).sum())], pa.int64())},
            schema=part_schema,
        )

    agg = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        bounce, part_schema,
    ).sum(["n_sessions", "n_bounces"])
    ns, nb = int(agg["sum(n_sessions)"]), int(agg["sum(n_bounces)"])
    return pa.Table.from_pydict(
        {"n_sessions": pa.array([ns], pa.int64()),
         "n_bounces": pa.array([nb], pa.int64()),
         "bounce_rate": pa.array(
             [np.float64(nb) / np.float64(ns)], pa.float64())}
    )


SQL_BOUNCE_RATE = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
  SELECT user_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
),
sess AS (SELECT user_id, sid, count(*) AS n FROM s2 GROUP BY user_id, sid)
SELECT count(*) AS n_sessions,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS bounce_rate
FROM sess
"""


def q_key_skew_report(sf_dir: str):
    """KEY-SKEW diagnostics — the partitioning/salting decision input:
    for each candidate shuffle key (orders.o_custkey, events.user_id),
    the key count, hottest-key share, and the EXACT Gini coefficient of
    the per-key row counts, all in integer arithmetic (Gini via the
    count-of-counts histogram: a multiplicity-m run of equal counts v
    occupying ranks r+1..r+m contributes v·(m·r + m(m+1)/2) to Σi·cᵢ —
    no sort of the key table, no floats until the two final ppm
    divides, which are exact integer // on both sides).

    Scale shape: one count-combiner groupby per key (key-scale but
    pre-combined) → a COUNT-OF-COUNTS histogram (domain = distinct
    per-key counts, tiny) → driver integer math."""
    def skew_of(table: str, key: str):
        ds = rd.read_parquet(_p(sf_dir, table), columns=[key])

        def cnt_partial(t: pa.Table) -> pa.Table:
            out = t.group_by([key]).aggregate([(key, "count")])
            return out.rename_columns(["k", "c"])

        counts = (
            ds.map_batches(cnt_partial, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("c", alias_name="c"))
        )

        def coc_partial(t: pa.Table) -> pa.Table:
            out = t.group_by(["c"]).aggregate([("c", "count")])
            return out.rename_columns(["v", "m"])

        rows = (
            counts.map_batches(coc_partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("m", alias_name="m"))
            .take_all()  # distinct count values — tiny
        )
        pairs = sorted((int(r["v"]), int(r["m"])) for r in rows)
        n = sum(m for _v, m in pairs)
        s = sum(v * m for v, m in pairs)
        r = 0
        weighted = 0  # Σ i·c_i over counts sorted ascending
        vmax = 0
        for v, m in pairs:
            weighted += v * (m * r + m * (m + 1) // 2)
            r += m
            vmax = max(vmax, v)
        gini_ppm = (2 * weighted - (n + 1) * s) * 1_000_000 // (n * s)
        max_share_ppm = vmax * 1_000_000 // s
        return n, s, max_share_ppm, gini_ppm

    # the two table legs are independent Dataset jobs — overlap them via
    # driver threads (the dq_checks pattern) instead of paying two
    # serial executor ramp-ups
    from concurrent.futures import ThreadPoolExecutor

    legs = [("orders", "o_custkey"), ("events", "user_id")]
    with ThreadPoolExecutor(max_workers=len(legs)) as ex:
        results = list(ex.map(lambda tk: skew_of(*tk), legs))
    out = {"table_key": [], "n_keys": [], "n_rows": [],
           "max_share_ppm": [], "gini_ppm": []}
    for (table, key), (n, s, mx, g) in zip(legs, results):
        out["table_key"].append(f"{table}.{key}")
        out["n_keys"].append(n)
        out["n_rows"].append(s)
        out["max_share_ppm"].append(mx)
        out["gini_ppm"].append(g)
    return pa.Table.from_pydict(
        {"table_key": pa.array(out["table_key"], pa.string()),
         "n_keys": pa.array(out["n_keys"], pa.int64()),
         "n_rows": pa.array(out["n_rows"], pa.int64()),
         "max_share_ppm": pa.array(out["max_share_ppm"], pa.int64()),
         "gini_ppm": pa.array(out["gini_ppm"], pa.int64())}
    )


SQL_KEY_SKEW_REPORT = """
WITH oc AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
ork AS (
  SELECT c, row_number() OVER (ORDER BY c) AS i FROM oc
),
os AS (
  SELECT count(*) AS n, sum(c) AS s, sum(i * c) AS w, max(c) AS vmax
  FROM ork
),
ec AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
erk AS (
  SELECT c, row_number() OVER (ORDER BY c) AS i FROM ec
),
es AS (
  SELECT count(*) AS n, sum(c) AS s, sum(i * c) AS w, max(c) AS vmax
  FROM erk
)
SELECT 'orders.o_custkey' AS table_key,
       n AS n_keys, CAST(s AS BIGINT) AS n_rows,
       CAST(CAST(vmax AS HUGEINT) * 1000000 // s AS BIGINT)
         AS max_share_ppm,
       CAST((2 * CAST(w AS HUGEINT) - (n + 1) * s) * 1000000 // (n * s)
            AS BIGINT) AS gini_ppm
FROM os
UNION ALL
SELECT 'events.user_id', n, CAST(s AS BIGINT),
       CAST(CAST(vmax AS HUGEINT) * 1000000 // s AS BIGINT),
       CAST((2 * CAST(w AS HUGEINT) - (n + 1) * s) * 1000000 // (n * s)
            AS BIGINT)
FROM es
"""


def q_quantile_normalize(sf_dir: str):
    """EXACT two-sample QUANTILE NORMALIZATION — the batch-effect /
    domain-adaptation preprocessing: every distinct 'click' value maps
    to the 'purchase' value at the same CDF position (map = the
    purchase element of rank ⌈cum_click·n_p / n_c⌉, the quantile_disc
    rule) — so the click distribution, re-expressed, exactly matches
    purchase marginals. All arithmetic is integer (histogram cums +
    one ceiling cross-multiply); the mapped value is a table LOOKUP,
    never interpolated floats.

    Scale shape: two bounded-cardinality histogram passes (one per
    distribution — same combiner shape as events_quantiles); the
    mapping is a driver searchsorted over the value-domain-bounded
    cells."""
    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_type", "value"],
        filter=(pc.field("event_type").isin(["purchase", "click"])),
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        t2 = pa.Table.from_pydict(
            {"g": t.column("event_type"), "cell": cents}
        )
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    rows = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).sum("n")
        .take_all()  # value-domain-bounded
    )
    h: dict[str, dict[int, int]] = {"purchase": {}, "click": {}}
    for r in rows:
        h[r["g"]][int(r["cell"])] = h[r["g"]].get(int(r["cell"]), 0) + int(
            r["sum(n)"]
        )
    p_cells = np.array(sorted(h["purchase"]), dtype=np.int64)
    p_cum = np.cumsum([h["purchase"][c] for c in p_cells])
    n_p = int(p_cum[-1])
    c_cells = np.array(sorted(h["click"]), dtype=np.int64)
    c_cum = np.cumsum([h["click"][c] for c in c_cells])
    n_c = int(c_cum[-1])
    out = {"click_cents": [], "n": [], "mapped_cents": []}
    for cell, cum in zip(c_cells, c_cum):
        target = (int(cum) * n_p + n_c - 1) // n_c  # ceil, exact ints
        idx = int(np.searchsorted(p_cum, max(target, 1), side="left"))
        out["click_cents"].append(int(cell))
        out["n"].append(h["click"][int(cell)])
        out["mapped_cents"].append(int(p_cells[idx]))
    return pa.Table.from_pydict(
        {"click_cents": pa.array(out["click_cents"], pa.int64()),
         "n": pa.array(out["n"], pa.int64()),
         "mapped_cents": pa.array(out["mapped_cents"], pa.int64())}
    )


SQL_QUANTILE_NORMALIZE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell
  FROM events WHERE event_type IN ('purchase', 'click')
),
ph AS (
  SELECT cell, count(*) AS n FROM c WHERE event_type = 'purchase'
  GROUP BY cell
),
pcum AS (
  SELECT cell, sum(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cum
  FROM ph
),
pt AS (SELECT CAST(sum(n) AS BIGINT) AS n_p FROM ph),
ch AS (
  SELECT cell, count(*) AS n FROM c WHERE event_type = 'click'
  GROUP BY cell
),
ccum AS (
  SELECT cell, n,
         sum(n) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cum
  FROM ch
),
ct AS (SELECT CAST(sum(n) AS BIGINT) AS n_c FROM ch),
tgt AS (
  SELECT ccum.cell AS click_cents, ccum.n,
         -CAST(greatest((CAST(ccum.cum AS HUGEINT) * pt.n_p + ct.n_c - 1)
                        // ct.n_c, 1) AS BIGINT) AS neg_target
  FROM ccum CROSS JOIN pt CROSS JOIN ct
),
pneg AS (SELECT cell, -CAST(cum AS BIGINT) AS neg_cum FROM pcum)
-- min cum ≥ target via negation + ASOF (largest neg_cum ≤ neg_target)
SELECT t.click_cents, CAST(t.n AS BIGINT) AS n,
       p.cell AS mapped_cents
FROM tgt t ASOF JOIN pneg p ON t.neg_target >= p.neg_cum
"""


def q_csv_roundtrip(sf_dir: str):
    """CSV sink/source on the HARD gate (the parquet analogue is
    q_compact_roundtrip): orders' key columns stream out through
    ``write_csv`` and back through ``read_csv``, and the driver's
    rows/schema/hash compare certifies the text round-trip lost or
    corrupted NOTHING — the delimiter/quoting/typing surface a data
    platform must guarantee, not assume. Money survives as exact cents
    (int64 column in the CSV, no float re-parse surface)."""
    import os
    import shutil

    src = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "o_orderpriority": t.column("o_orderpriority"),
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                 pa.int64(),
             )}
        ),
        batch_format="pyarrow",
    )
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = f"/tmp/csv_roundtrip_{sf_name}"
    shutil.rmtree(out, ignore_errors=True)
    src.write_csv(out)
    back = rd.read_csv(out)
    return back.map_batches(
        lambda t: pa.Table.from_pydict(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "o_orderpriority": t.column("o_orderpriority"),
             "cents": pc.cast(t.column("cents"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


SQL_CSV_ROUNDTRIP = """
SELECT o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
"""


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink/source on the HARD gate (reference S4/S5,
    sources/jsonio): the documents' metadata columns stream out through
    ``write_json`` (JSONL) and back through ``read_json``; the content
    identity rides the driver's hash compare — the schema-on-read
    surface (string escaping, int typing) certified end-to-end."""
    import os
    import shutil

    from semantic_search_system_ray.sources.jsonio import (
        read_json_records,
        write_json_records,
    )

    src = rd.read_parquet(
        _p(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = f"/tmp/jsonl_roundtrip_{sf_name}"
    shutil.rmtree(out, ignore_errors=True)
    write_json_records(src, out)
    back = read_json_records(out)
    return back.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
             "lang": t.column("lang"),
             "n_chars": pc.cast(t.column("n_chars"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_weighted_median_price(sf_dir: str):
    """Per-group WEIGHTED median — the volume-weighted price statistic
    (each lineitem counts by its quantity): the smallest price whose
    cumulative weight reaches ⌈W/2⌉ (the lower weighted median —
    deterministic under any tie/ordering). Same bounded-cardinality
    histogram trick as events_quantiles with integer WEIGHTS instead of
    row counts — exact at any scale, no sort; one mirrored divide for
    the dollar output.

    Scale shape: per-block (flag, cents)→Σqty combiners → one
    value-domain groupby → driver cum-scan over the bounded cells."""
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        q = pc.cast(t.column("l_quantity"), pa.int64())
        t2 = pa.Table.from_pydict(
            {"g": t.column("l_returnflag"), "cell": cents, "w": q}
        )
        out = t2.group_by(["g", "cell"]).aggregate([("w", "sum")])
        return out.rename_columns(["g", "cell", "w"])

    rows = (
        li.map_batches(hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).aggregate(Sum("w", alias_name="w"))
        .take_all()  # |groups| × value domain — bounded
    )
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append((int(r["cell"]), int(r["w"])))
    out = {"l_returnflag": [], "total_qty": [], "wmedian_price": []}
    for g in sorted(by_g):
        cells = sorted(by_g[g])
        total = sum(w for _c, w in cells)
        target = (total + 1) // 2
        cum = 0
        med = cells[-1][0]
        for c, w in cells:
            cum += w
            if cum >= target:
                med = c
                break
        out["l_returnflag"].append(g)
        out["total_qty"].append(total)
        out["wmedian_price"].append(np.float64(med) / 100.0)
    return pa.Table.from_pydict(
        {"l_returnflag": pa.array(out["l_returnflag"], pa.string()),
         "total_qty": pa.array(out["total_qty"], pa.int64()),
         "wmedian_price": pa.array(out["wmedian_price"], pa.float64())}
    )


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH h AS (
  SELECT l_returnflag AS g,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cell,
         sum(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT g, cell, w,
         sum(w) OVER (PARTITION BY g ORDER BY cell
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY g) AS total
  FROM h
)
SELECT g AS l_returnflag,
       CAST(max(total) AS BIGINT) AS total_qty,
       CAST(min(CASE WHEN cum >= (total + 1) // 2 THEN cell END)
            AS DOUBLE) / 100.0 AS wmedian_price
FROM c GROUP BY g
"""


def q_ab_conversion(sf_dir: str):
    """A/B EXPERIMENT readout — the experimentation-platform primitive:
    users assign deterministically to arms by md5 hex (the train_split
    idiom: arm A iff md5(user) < '8' — 50/50, reproducible on retry,
    never random()), the metric is signup→first-purchase conversion
    (the q_conversion_lag event logic), and the readout is per-arm
    exposed/converted counts with a mirrored-divide rate plus the exact
    integer ppm lift of B over A (DuckDB-truncation mirrored).

    Scale shape: one user-keyed shuffle computes per-user
    (arm, exposed, converted) — per-partition pandas; two-integer-row
    partials leave each partition; arm math is driver-side."""
    import hashlib

    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type").isin(["signup", "purchase"])),
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "is_signup": pc.equal(t.column("event_type"), "signup")}
        )

    part_schema = pa.schema(
        [("arm", pa.string()), ("exposed", pa.int64()),
         ("converted", pa.int64())]
    )

    def per_user(df: pd.DataFrame) -> pa.Table:
        s = df[df["is_signup"]].groupby("user_id")["ts_us"].min()
        if s.empty:
            return part_schema.empty_table()
        p = df[~df["is_signup"]].merge(
            s.rename("s_us"), left_on="user_id", right_index=True
        )
        conv_users = set(p.loc[p["ts_us"] >= p["s_us"], "user_id"])
        uids = s.index.to_numpy()
        # per-user md5 is irreducible (same cost as the train_split
        # assignment); everything around it is numpy
        is_a = np.fromiter(
            (hashlib.md5(str(u).encode()).hexdigest() < "8" for u in uids),
            dtype=bool, count=len(uids),
        )
        conv = s.index.isin(list(conv_users)).astype(bool) \
            if conv_users else np.zeros(len(uids), bool)
        return pa.Table.from_pydict(
            {"arm": pa.array(["A", "B"], pa.string()),
             "exposed": pa.array(
                 [int(is_a.sum()), int((~is_a).sum())], pa.int64()),
             "converted": pa.array(
                 [int(conv[is_a].sum()), int(conv[~is_a].sum())],
                 pa.int64())},
            schema=part_schema,
        )

    rows = (
        coarse_partition_apply(
            ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
            per_user, part_schema,
        )
        .groupby("arm")
        .aggregate(Sum("exposed", alias_name="exposed"),
                   Sum("converted", alias_name="converted"))
        .take_all()
    )
    by_arm = {r["arm"]: (int(r["exposed"]), int(r["converted"]))
              for r in rows}
    out = {"arm": [], "exposed": [], "converted": [], "rate": []}
    for arm in sorted(by_arm):
        e, c = by_arm[arm]
        out["arm"].append(arm)
        out["exposed"].append(e)
        out["converted"].append(c)
        out["rate"].append(np.float64(c) / np.float64(e))
    return pa.Table.from_pydict(
        {"arm": pa.array(out["arm"], pa.string()),
         "exposed": pa.array(out["exposed"], pa.int64()),
         "converted": pa.array(out["converted"], pa.int64()),
         "rate": pa.array(out["rate"], pa.float64())}
    )


SQL_AB_CONVERSION = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
),
armed AS (
  SELECT s.user_id,
         CASE WHEN md5(CAST(s.user_id AS VARCHAR)) < '8'
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS c
  FROM s LEFT JOIN conv ON s.user_id = conv.user_id
)
SELECT arm, count(*) AS exposed,
       CAST(sum(c) AS BIGINT) AS converted,
       CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS rate
FROM armed GROUP BY arm
"""


CENTROID_TOP_DIMS_K = 5


def q_centroid_top_dims(sf_dir: str):
    """Per-label FEATURE IMPORTANCE — the model-debugging readout: the
    top-5 embedding dimensions by |centroid| per label. Because every
    dim of a label shares the same count n, ranking |s/n| equals
    ranking the INTEGER |Σ scaled components| — so the order is exact
    (ties break dim-ascending), and only the displayed centroid value
    is a mirrored two-op float chain.

    Scale shape: the centroid_by_label integer partials (|labels|·dim
    bounded) → per-label top-k driver-side over that bounded table."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["label", "embedding"])
    part_schema = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()),
         ("s", pa.int64()), ("cnt", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        col = t.column("embedding").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        dim = len(col[0])
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        ).reshape(t.num_rows, dim)
        x = mat * 1_000_000.0
        scaled = np.trunc(x + np.copysign(0.5, x)).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), np.int64)
        np.add.at(sums, inv, scaled)
        cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        L = len(uniq)
        return pa.Table.from_pydict(
            {"label": np.repeat(uniq, dim),
             "dim": np.tile(np.arange(dim, dtype=np.int64), L),
             "s": sums.reshape(-1),
             "cnt": np.repeat(cnts, dim)},
            schema=part_schema,
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="n"))
        .take_all()  # |labels| × dim — domain-bounded
    )
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(int(r["label"]), []).append(
            (int(r["dim"]), int(r["s"]), int(r["n"]))
        )
    out = {"label": [], "rk": [], "dim": [], "centroid": []}
    for label in sorted(by_label):
        ranked = sorted(by_label[label], key=lambda x: (-abs(x[1]), x[0]))
        for rk, (dim, s, n) in enumerate(ranked[:CENTROID_TOP_DIMS_K], 1):
            out["label"].append(label)
            out["rk"].append(rk)
            out["dim"].append(dim)
            out["centroid"].append(
                np.float64(s) / 1_000_000.0 / np.float64(n)
            )
    return pa.Table.from_pydict(
        {"label": pa.array(out["label"], pa.int64()),
         "rk": pa.array(out["rk"], pa.int64()),
         "dim": pa.array(out["dim"], pa.int64()),
         "centroid": pa.array(out["centroid"], pa.float64())}
    )


SQL_CENTROID_TOP_DIMS = f"""
WITH u AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS s
  FROM embeddings
),
c AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
         CAST(sum(s) AS BIGINT) AS s, count(*) AS n
  FROM u GROUP BY label, dim
),
r AS (
  SELECT label, dim, s, n,
         row_number() OVER (
           PARTITION BY label ORDER BY abs(s) DESC, dim
         ) AS rk
  FROM c
)
SELECT label, rk, dim,
       CAST(s AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS centroid
FROM r WHERE rk <= {CENTROID_TOP_DIMS_K}
"""


INTERP_GRID_US = 6 * 3600 * 1_000_000  # 6-hour grid


def q_events_interp_grid(sf_dir: str):
    """Linear-INTERPOLATION resample — the smooth complement of
    q_events_locf's step-fill: per user, the value at every 6-hour grid
    timestamp inside the user's observed span, interpolated between the
    bracketing events (v0 + (v1−v0)·(g−t0)/(t1−t0), ONE mirrored float
    chain per grid point — no summation, so doubles hash exactly).
    Bracket ties at equal timestamps are pinned: backward neighbor =
    max (ts, event_id), forward = min (ts, event_id), mirrored by the
    oracle's arg_max/arg_min over [ts, event_id] lists; a grid point on
    an event takes that event's value (t1 = t0 guard).

    Scale shape: ONE user-keyed shuffle; grids are span-bounded per
    user and built vectorized; both neighbor lookups are pandas
    merge_asof (C-level, by=user)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "value": t.column("value")}
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("g_us", pa.int64()),
         ("value_interp", pa.float64())]
    )

    P = INTERP_GRID_US

    def interp(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["ts_us", "event_id"], kind="mergesort")
        b = df.groupby("user_id")["ts_us"].agg(["min", "max"])
        gstart = -(-b["min"].to_numpy() // P) * P
        gend = (b["max"].to_numpy() // P) * P
        npts = np.maximum((gend - gstart) // P + 1, 0)
        if npts.sum() == 0:
            return out_schema.empty_table()
        users = np.repeat(b.index.to_numpy(), npts)
        offs = np.arange(int(npts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(npts) - npts, npts
        )
        gs = np.repeat(gstart, npts) + offs * P
        grid = pd.DataFrame({"user_id": users, "g": gs}).sort_values(
            "g", kind="mergesort"
        )
        back = pd.merge_asof(
            grid, df.rename(columns={"ts_us": "t0", "value": "v0"})[
                ["user_id", "t0", "v0"]],
            left_on="g", right_on="t0", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        both = pd.merge_asof(
            back, df.rename(columns={"ts_us": "t1", "value": "v1"})[
                ["user_id", "t1", "v1"]],
            left_on="g", right_on="t1", by="user_id",
            direction="forward", allow_exact_matches=True,
        )
        t0 = both["t0"].to_numpy(np.int64)
        t1 = both["t1"].to_numpy(np.int64)
        v0 = both["v0"].to_numpy(np.float64)
        v1 = both["v1"].to_numpy(np.float64)
        g = both["g"].to_numpy(np.int64)
        same = t1 == t0
        frac = np.zeros(len(g), np.float64)
        np.divide(
            (g - t0).astype(np.float64), (t1 - t0).astype(np.float64),
            out=frac, where=~same,
        )
        val = np.where(same, v0, v0 + (v1 - v0) * frac)
        return pa.Table.from_pydict(
            {"user_id": both["user_id"].to_numpy(np.int64),
             "g_us": g, "value_interp": val},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        interp, out_schema,
    )


SQL_EVENTS_INTERP_GRID = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
),
b AS (
  SELECT user_id,
         ((min(ts_us) + {INTERP_GRID_US} - 1) // {INTERP_GRID_US})
           * {INTERP_GRID_US} AS gstart,
         (max(ts_us) // {INTERP_GRID_US}) * {INTERP_GRID_US} AS gend
  FROM e GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(gstart, gend, {INTERP_GRID_US}))
           AS g
  FROM b WHERE gstart <= gend
),
nb AS (
  SELECT gr.user_id, gr.g,
         max(e.ts_us) FILTER (WHERE e.ts_us <= gr.g) AS t0,
         min(e.ts_us) FILTER (WHERE e.ts_us >= gr.g) AS t1
  FROM grid gr JOIN e USING (user_id)
  GROUP BY gr.user_id, gr.g
),
-- tie pins at the bracket timestamps: backward = max event_id,
-- forward = min event_id (the engine's merge_asof order)
vb AS (
  SELECT nb.user_id, nb.g, nb.t0, nb.t1,
         arg_max(e0.value, e0.event_id) AS v0
  FROM nb JOIN e e0 ON e0.user_id = nb.user_id AND e0.ts_us = nb.t0
  GROUP BY nb.user_id, nb.g, nb.t0, nb.t1
),
vf AS (
  SELECT vb.user_id, vb.g, vb.t0, vb.t1, vb.v0,
         arg_min(e1.value, e1.event_id) AS v1
  FROM vb JOIN e e1 ON e1.user_id = vb.user_id AND e1.ts_us = vb.t1
  GROUP BY vb.user_id, vb.g, vb.t0, vb.t1, vb.v0
)
SELECT user_id, g AS g_us,
       CASE WHEN t1 = t0 THEN v0
            ELSE v0 + (v1 - v0)
                 * (CAST(g - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
       END AS value_interp
FROM vf
"""


ATTRIB_WINDOW_US = 24 * 3600 * 1_000_000


def q_purchase_attribution(sf_dir: str):
    """LAST-TOUCH attribution — the marketing-analytics primitive: each
    purchase credits the user's most recent NON-purchase event within
    the 24h before it (strictly earlier ts; ties at the bracket ts pin
    to max event_id), and the rollup counts purchases per credited
    touch type plus the unattributed remainder. Exact integer time
    arithmetic; counts only.

    Scale shape: ONE user-keyed shuffle; the per-partition lookup is a
    pandas merge_asof (C-level, by=user, backward, exclusive); what
    leaves each partition is (touch_type, n) partials over the tiny
    type domain."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "event_type": t.column("event_type")}
        )

    part_schema = pa.schema([("touch", pa.string()), ("n", pa.int64())])

    def attrib(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["ts_us", "event_id"], kind="mergesort")
        purchases = df[df["event_type"] == "purchase"][
            ["user_id", "ts_us"]].copy()
        touches = df[df["event_type"] != "purchase"].rename(
            columns={"ts_us": "t_ts", "event_type": "touch"}
        )[["user_id", "t_ts", "touch"]]
        if purchases.empty:
            return part_schema.empty_table()
        m = pd.merge_asof(
            purchases, touches, left_on="ts_us", right_on="t_ts",
            by="user_id", direction="backward", allow_exact_matches=False,
        )
        in_window = m["t_ts"].notna() & (
            m["ts_us"] - m["t_ts"] <= ATTRIB_WINDOW_US
        )
        credited = m.loc[in_window, "touch"]
        cnt = credited.value_counts()
        touches_out = list(cnt.index) + ["(none)"]
        ns = list(cnt.to_numpy()) + [int((~in_window).sum())]
        return pa.Table.from_pydict(
            {"touch": pa.array(touches_out, pa.string()),
             "n": pa.array([int(x) for x in ns], pa.int64())},
            schema=part_schema,
        )

    out = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        attrib, part_schema,
    ).groupby("touch").aggregate(Sum("n", alias_name="n_purchases"))
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"touch": t.column("touch"),
             "n_purchases": t.column("n_purchases")}
        ),
        batch_format="pyarrow",
    )


SQL_PURCHASE_ATTRIBUTION = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
p AS (SELECT event_id AS p_id, user_id, ts_us FROM e
      WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts_us AS t_ts, event_id, event_type
      FROM e WHERE event_type <> 'purchase'),
last_ts AS (
  SELECT p.p_id, p.user_id, p.ts_us,
         max(t.t_ts) FILTER (WHERE t.t_ts < p.ts_us) AS t_ts
  FROM p LEFT JOIN t USING (user_id)
  GROUP BY p.p_id, p.user_id, p.ts_us
),
credited AS (
  SELECT l.user_id, l.ts_us, l.t_ts,
         CASE WHEN l.t_ts IS NOT NULL
                   AND l.ts_us - l.t_ts <= {ATTRIB_WINDOW_US}
              THEN (SELECT arg_max(t2.event_type, t2.event_id)
                    FROM t t2
                    WHERE t2.user_id = l.user_id AND t2.t_ts = l.t_ts)
              ELSE '(none)' END AS touch
  FROM last_ts l
)
SELECT touch, count(*) AS n_purchases
FROM credited GROUP BY touch
"""


def q_longest_quiet_run(sf_dir: str):
    """GAPS-AND-ISLANDS — the outage/monitoring pattern: the longest run
    of consecutive MINUTES with zero events (the quiet window), with
    its start minute (ties → earliest). Presence reduces to the
    bounded minute-bucket domain, so the island scan never touches
    row-scale data and needs no global sort of events.

    Scale shape: per-block distinct-minute combiners → one groupby over
    the calendar-minute domain → driver lag-scan for the runs."""
    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["ts"])
    MIN_US = 60 * 1_000_000

    def mins(t: pa.Table) -> pa.Table:
        m = pc.cast(
            pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False) // MIN_US
        return pa.Table.from_pydict(
            {"m": pa.array(np.unique(m), pa.int64())}
        )

    rows = (
        ev.map_batches(mins, batch_format="pyarrow")
        .groupby("m").count()
        .take_all()  # calendar-minute domain — bounded
    )
    present = np.sort(np.array([r["m"] for r in rows], dtype=np.int64))
    gaps = present[1:] - present[:-1] - 1
    if len(gaps) == 0 or gaps.max() == 0:
        return pa.Table.from_pydict(
            {"start": pa.array([], pa.string()),
             "quiet_minutes": pa.array([], pa.int64())}
        )
    best = int(gaps.max())
    idx = int(np.argmax(gaps))  # first occurrence → earliest start
    start_min = int(present[idx]) + 1
    start = pa.array([start_min * MIN_US], pa.int64())
    return pa.Table.from_pydict(
        {"start": pc.strftime(
            pc.cast(start, pa.timestamp("us")), format="%Y-%m-%d %H:%M"
        ),
         "quiet_minutes": pa.array([best], pa.int64())}
    )


SQL_LONGEST_QUIET_RUN = """
WITH h AS (
  SELECT DISTINCT epoch_us(ts) // 60000000 AS m FROM events
),
g AS (SELECT m, lag(m) OVER (ORDER BY m) AS prev FROM h),
runs AS (
  SELECT prev + 1 AS start_m, m - prev - 1 AS quiet
  FROM g WHERE prev IS NOT NULL AND m - prev > 1
)
SELECT strftime(to_timestamp(start_m * 60), '%Y-%m-%d %H:%M') AS start,
       CAST(quiet AS BIGINT) AS quiet_minutes
FROM runs
ORDER BY quiet DESC, start_m
LIMIT 1
"""


def q_longest_streak(sf_dir: str):
    """Per-user longest CONSECUTIVE-DAY activity streak, top-10 users
    (ties → user_id asc) — the engagement-streak islands problem (the
    per-key counterpart of q_longest_quiet_run's global gaps). Runs are
    computed in one vectorized pass over per-user distinct days
    (boundary mask + segment lengths — no row_number trick needed
    engine-side); each partition pre-trims to its local top-10, so the
    driver sees ≤ P·10 rows.

    Scale shape: ONE user-keyed shuffle; day dedup, run segmentation
    and the per-user max are all numpy over the sorted partition."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(
                pc.cast(t.column("ts"), pa.timestamp("us")), pa.date32()
            ),
            pa.int32(),
        )
        t2 = pa.Table.from_pydict(
            {"user_id": t.column("user_id"),
             "day": pc.cast(day, pa.int64())}
        )
        return t2.group_by(["user_id", "day"]).aggregate([])

    part_schema = pa.schema([("user_id", pa.int64()), ("streak", pa.int64())])

    def streaks(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
        seg = np.cumsum(brk)
        lengths = np.bincount(seg)[1:]
        seg_user = u[brk]
        per_user = pd.Series(lengths).groupby(seg_user).max().reset_index()
        per_user.columns = ["user_id", "streak"]
        # local trim with the GLOBAL tie-break (streak desc, user asc) —
        # a value-only trim could cut a smaller-id tied user that the
        # global ordering would keep
        top = per_user.sort_values(
            ["streak", "user_id"], ascending=[False, True], kind="mergesort"
        ).head(10)
        return pa.Table.from_pydict(
            {"user_id": pa.array(top["user_id"].to_numpy(), pa.int64()),
             "streak": pa.array(top["streak"].to_numpy(), pa.int64())},
            schema=part_schema,
        )

    out = coarse_partition_apply(
        ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
        streaks, part_schema,
    )
    return out.sort(["streak", "user_id"], descending=[True, False]).limit(10)


SQL_LONGEST_STREAK = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
  FROM events
),
g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM ud
),
runs AS (
  SELECT user_id, count(*) AS len FROM g GROUP BY user_id, grp
),
best AS (SELECT user_id, max(len) AS streak FROM runs GROUP BY user_id)
SELECT user_id, CAST(streak AS BIGINT) AS streak
FROM best ORDER BY streak DESC, user_id LIMIT 10
"""


def q_region_share(sf_dir: str):
    """Percent-of-PARENT rollup — the BI hierarchy ratio: each nation's
    share of its region's customer account balance, exact integer ppm
    (cents // cents, truncation mirrored). The two hierarchy levels
    aggregate in ONE pass (nation-level cents), the region level derives
    from it driver-side (nation domain is tiny), and the dims broadcast.

    Scale shape: per-block (nationkey, cents) combiners over customer →
    one |nations|-sized groupby; dims (nation, region) are driver-read
    small tables."""
    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("c_acctbal"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"nk": pc.cast(t.column("c_nationkey"), pa.int64()),
             "cents": cents}
        )
        out = t2.group_by(["nk"]).aggregate([("cents", "sum")])
        return out.rename_columns(["nk", "cents"])

    rows = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("nk").aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # |nations|
    )
    nat = {
        r["n_nationkey"]: (r["n_name"], int(r["n_regionkey"]))
        for r in rd.read_parquet(_p(sf_dir, "nation")).take_all()
    }
    region_tot: Counter = Counter()
    for r in rows:
        region_tot[nat[r["nk"]][1]] += int(r["cents"])
    out = {"n_name": [], "r_key": [], "share_ppm": []}
    for r in sorted(rows, key=lambda r: r["nk"]):
        name, rk = nat[r["nk"]]
        c = int(r["cents"])
        tot = region_tot[rk]
        # balances can be negative: mirror DuckDB truncation explicitly
        num = c * 1_000_000
        share = (1 if (num >= 0) == (tot >= 0) else -1) * (
            abs(num) // abs(tot)
        )
        out["n_name"].append(name)
        out["r_key"].append(rk)
        out["share_ppm"].append(share)
    return pa.Table.from_pydict(
        {"n_name": pa.array(out["n_name"], pa.string()),
         "r_key": pa.array(out["r_key"], pa.int64()),
         "share_ppm": pa.array(out["share_ppm"], pa.int64())}
    )


SQL_REGION_SHARE = """
WITH n AS (
  SELECT c.c_nationkey AS nk,
         sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS cents
  FROM customer c GROUP BY 1
),
j AS (
  SELECT nat.n_name, CAST(nat.n_regionkey AS BIGINT) AS r_key, n.cents
  FROM n JOIN nation nat ON n.nk = nat.n_nationkey
),
r AS (SELECT r_key, sum(cents) AS tot FROM j GROUP BY r_key)
SELECT j.n_name, j.r_key,
       CAST(CAST(j.cents AS HUGEINT) * 1000000 // r.tot AS BIGINT)
         AS share_ppm
FROM j JOIN r USING (r_key)
"""


GAP_BUCKET = 1024


def q_orderkey_gaps(sf_dir: str):
    """Distributed ID-GAP detection — the data-integrity audit for
    expected-contiguous key sequences (missing invoices / lost
    messages), exercised on the naturally sparse URGENT-order key
    subsequence: the top-20 largest gaps, found WITHOUT a global sort
    via bucketed presence: keys route into 1024-key buckets; each
    bucket partition emits its interior top-20 gaps (a gap lives
    entirely inside one bucket, and local (gap desc, start asc) top-20
    provably contains every globally-selected gap from that bucket)
    plus a (kmin, kmax) summary row; cross-bucket gaps stitch from the
    bucket-domain-bounded summaries on the driver. Ties: (gap desc,
    start asc) — heavily exercised (the subsequence has many equal
    gaps)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )
    B = GAP_BUCKET

    def proj(t: pa.Table) -> pa.Table:
        k = np.unique(t.column("o_orderkey").to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict(
            {"k": pa.array(k, pa.int64()),
             "b": pa.array(k // B, pa.int64())}
        )

    part_schema = pa.schema(
        [("b", pa.int64()), ("is_summary", pa.bool_()),
         ("kmin", pa.int64()), ("kmax", pa.int64()),
         ("gap", pa.int64()), ("start", pa.int64())]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop_duplicates(["k"]).sort_values(["b", "k"],
                                                   kind="mergesort")
        k = df["k"].to_numpy()
        b = df["b"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = b[1:] != b[:-1]
        seg_starts = np.flatnonzero(brk)
        kmin = np.minimum.reduceat(k, seg_starts)
        kmax = np.maximum.reduceat(k, seg_starts)
        gaps = np.zeros(len(df), np.int64)
        starts = np.zeros(len(df), np.int64)
        gaps[1:] = np.where(~brk[1:], k[1:] - k[:-1] - 1, 0)
        starts[1:] = k[:-1] + 1
        seg = np.cumsum(brk) - 1
        gdf = pd.DataFrame({"seg": seg, "gap": gaps, "start": starts})
        gdf = gdf[gdf["gap"] > 0]
        # per-bucket top-20 under the GLOBAL ordering (see docstring)
        top = gdf.sort_values(["gap", "start"],
                              ascending=[False, True],
                              kind="mergesort").groupby(
            "seg", sort=False
        ).head(20)
        n_sum = len(kmin)
        n_gap = len(top)
        return pa.Table.from_pydict(
            {"b": pa.array(
                np.concatenate([b[seg_starts],
                                b[seg_starts][top["seg"].to_numpy()]]),
                pa.int64()),
             "is_summary": pa.array([True] * n_sum + [False] * n_gap),
             "kmin": pa.array(
                 np.concatenate([kmin, np.zeros(n_gap, np.int64)]),
                 pa.int64()),
             "kmax": pa.array(
                 np.concatenate([kmax, np.zeros(n_gap, np.int64)]),
                 pa.int64()),
             "gap": pa.array(
                 np.concatenate([np.zeros(n_sum, np.int64),
                                 top["gap"].to_numpy()]), pa.int64()),
             "start": pa.array(
                 np.concatenate([np.zeros(n_sum, np.int64),
                                 top["start"].to_numpy()]), pa.int64())},
            schema=part_schema,
        )

    rows = coarse_partition_apply(
        orders.map_batches(proj, batch_format="pyarrow"), ["b"],
        per_bucket, part_schema,
    ).take_all()  # bucket-domain bounded
    summaries = sorted(
        ((int(r["b"]), int(r["kmin"]), int(r["kmax"]))
         for r in rows if r["is_summary"]),
    )
    cands = [(int(r["gap"]), int(r["start"]))
             for r in rows if not r["is_summary"]]
    prev_max = None
    for _b, kmin, kmax in summaries:
        if prev_max is not None and kmin - prev_max > 1:
            cands.append((kmin - prev_max - 1, prev_max + 1))
        prev_max = kmax
    cands.sort(key=lambda x: (-x[0], x[1]))
    top = cands[:20]
    return pa.Table.from_pydict(
        {"gap_start": pa.array([s for _g, s in top], pa.int64()),
         "gap_len": pa.array([g for g, _s in top], pa.int64())}
    )


SQL_ORDERKEY_GAPS = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
           WHERE o_orderpriority = '1-URGENT'),
g AS (SELECT k, lag(k) OVER (ORDER BY k) AS prev FROM k),
gaps AS (
  SELECT prev + 1 AS gap_start, k - prev - 1 AS gap_len
  FROM g WHERE prev IS NOT NULL AND k - prev > 1
)
SELECT gap_start, CAST(gap_len AS BIGINT) AS gap_len
FROM gaps ORDER BY gap_len DESC, gap_start LIMIT 20
"""


ALLOC_TOTAL = 1_000_000  # cents to allocate


def q_allocate_budget(sf_dir: str):
    """Largest-remainder (Hamilton) ALLOCATION — the penny-allocation
    problem every billing/settlement system has: split a fixed budget
    across priorities proportional to revenue such that the integer
    parts sum EXACTLY to the total. floor shares first, then the
    leftover pennies go to the largest remainders (ties → priority
    asc) — all integer arithmetic, mirrored by the oracle's
    remainder-ranked window.

    Scale shape: the distributed part is the revenue aggregate
    (per-block cent combiners → |priorities| groupby); the allocation
    is driver math over the bounded result."""
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"pri": t.column("o_orderpriority"), "cents": cents}
        )
        out = t2.group_by(["pri"]).aggregate([("cents", "sum")])
        return out.rename_columns(["pri", "cents"])

    rows = sorted(
        ((r["pri"], int(r["cents"])) for r in
         orders.map_batches(partial, batch_format="pyarrow")
         .groupby("pri").aggregate(Sum("cents", alias_name="cents"))
         .take_all()),
    )
    total = sum(c for _p, c in rows)
    floors = [(p, c, ALLOC_TOTAL * c // total, ALLOC_TOTAL * c % total)
              for p, c in rows]
    leftover = ALLOC_TOTAL - sum(f for _p, _c, f, _r in floors)
    # leftover pennies to the largest remainders, ties priority-asc
    order = sorted(floors, key=lambda x: (-x[3], x[0]))
    bump = {p for p, _c, _f, _r in order[:leftover]}
    out = {"pri": [], "alloc_cents": []}
    for p, _c, f, _r in floors:
        out["pri"].append(p)
        out["alloc_cents"].append(f + (1 if p in bump else 0))
    if sum(out["alloc_cents"]) != ALLOC_TOTAL:  # loud in ALL run modes
        raise ValueError("allocation does not sum to the budget")
    return pa.Table.from_pydict(
        {"pri": pa.array(out["pri"], pa.string()),
         "alloc_cents": pa.array(out["alloc_cents"], pa.int64())}
    )


SQL_ALLOCATE_BUDGET = f"""
WITH a AS (
  SELECT o_orderpriority AS pri,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
t AS (SELECT CAST(sum(cents) AS HUGEINT) AS total FROM a),
f AS (
  SELECT a.pri,
         {ALLOC_TOTAL} * CAST(a.cents AS HUGEINT) // t.total AS fl,
         {ALLOC_TOTAL} * CAST(a.cents AS HUGEINT) % t.total AS rem
  FROM a CROSS JOIN t
),
l AS (SELECT {ALLOC_TOTAL} - CAST(sum(fl) AS BIGINT) AS leftover FROM f),
r AS (
  SELECT pri, fl,
         row_number() OVER (ORDER BY rem DESC, pri) AS rk
  FROM f
)
SELECT r.pri,
       CAST(r.fl + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_cents
FROM r CROSS JOIN l
"""


def q_interarrival_hist(sf_dir: str):
    """LOG-SCALE inter-arrival histogram — the telemetry latency/burst
    profile: per event type, counts of per-user consecutive-event gaps
    bucketed by ⌊log2(gap seconds)⌋ (gap 0 → bucket −1). The bucket
    function is the same libm log2 double on both sides (bit-identical
    here); everything else is integer.

    Scale shape: ONE user-keyed shuffle; lag + bucketing vectorized
    per partition; (type, bucket, n) partials are domain-bounded."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"event_id": t.column("event_id"),
             "user_id": t.column("user_id"),
             "ts_us": pc.cast(
                 pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
             ),
             "event_type": t.column("event_type")}
        )

    part_schema = pa.schema(
        [("event_type", pa.string()), ("bucket", pa.int64()),
         ("n", pa.int64())]
    )

    def hist(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gap_s = np.zeros(len(df), np.int64)
        gap_s[1:] = (ts[1:] - ts[:-1]) // 1_000_000
        et = df["event_type"].to_numpy()
        g = gap_s[same]
        t_ = et[same]
        bucket = np.full(len(g), -1, np.int64)
        pos = g > 0
        bucket[pos] = np.floor(np.log2(g[pos].astype(np.float64))).astype(
            np.int64
        )
        out = pd.DataFrame({"event_type": t_, "bucket": bucket}).groupby(
            ["event_type", "bucket"]
        ).size()
        idx = out.index
        return pa.Table.from_pydict(
            {"event_type": pa.array(
                list(idx.get_level_values(0)), pa.string()),
             "bucket": pa.array(
                 idx.get_level_values(1).to_numpy(np.int64), pa.int64()),
             "n": pa.array(out.to_numpy(np.int64), pa.int64())},
            schema=part_schema,
        )

    return (
        coarse_partition_apply(
            ev.map_batches(proj, batch_format="pyarrow"), ["user_id"],
            hist, part_schema,
        )
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_INTERARRIVAL_HIST = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts)
          - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) // 1000000
           AS gap_s
  FROM events
),
b AS (
  SELECT event_type,
         CASE WHEN gap_s > 0
              THEN CAST(floor(log2(CAST(gap_s AS DOUBLE))) AS BIGINT)
              ELSE -1 END AS bucket
  FROM g WHERE gap_s IS NOT NULL
)
SELECT event_type, bucket, count(*) AS n
FROM b GROUP BY event_type, bucket
"""


VOCAB_CHECKPOINTS = [50, 100, 200, 500]


def q_vocab_growth(sf_dir: str):
    """VOCABULARY GROWTH curve (Heaps'-law measurement) — the
    corpus-statistics readout a tokenizer/dedup budget is planned
    against: |distinct terms| within the first N docs (doc_id order)
    at fixed checkpoints. Prefix-distinct counting decomposes exactly:
    a term's contribution is its FIRST-occurrence doc position, so one
    term-keyed min-aggregate + a cumulative count over checkpoint
    buckets replaces any sequential scan.

    Scale shape: per-block (term, min doc) partials → one vocab-keyed
    groupby min → per-checkpoint counts via one more combiner pass;
    only |checkpoints| rows reach the driver."""
    docs = rd.read_parquet(_p(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import re as _re

        first: dict = {}
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            for w in set(_re.findall(r"\w+", (txt or "").lower())):
                if w not in first or did < first[w]:
                    first[w] = did
        return pa.Table.from_pydict(
            {"term": pa.array(list(first.keys()), pa.string()),
             "first_doc": pa.array(list(first.values()), pa.int64())}
        )

    firsts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("first_doc", alias_name="first_doc"))
    )

    cps = np.array(VOCAB_CHECKPOINTS, dtype=np.int64)

    def bucket(t: pa.Table) -> pa.Table:
        fd = t.column("first_doc").to_numpy(zero_copy_only=False)
        # count terms whose first doc is < each checkpoint (doc_id is
        # 0-based: first N docs = ids 0..N-1)
        counts = np.array(
            [(fd < c).sum() for c in cps], dtype=np.int64
        )
        return pa.Table.from_pydict(
            {"checkpoint": pa.array(cps, pa.int64()),
             "n": pa.array(counts, pa.int64())}
        )

    return (
        firsts.map_batches(bucket, batch_format="pyarrow")
        .groupby("checkpoint")
        .aggregate(Sum("n", alias_name="vocab_size"))
    )


SQL_VOCAB_GROWTH = rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
),
f AS (SELECT term, min(doc_id) AS first_doc FROM tok GROUP BY term)
SELECT CAST(cp AS BIGINT) AS checkpoint, count(*) AS vocab_size
FROM f, unnest([{", ".join(str(c) for c in VOCAB_CHECKPOINTS)}]) t(cp)
WHERE f.first_doc < cp
GROUP BY cp
"""


def q_iqm_price(sf_dir: str):
    """INTERQUARTILE MEAN (25% two-sided trimmed mean) of order totals —
    the robust average that survives fat tails: drop the lowest and
    highest ⌊n/4⌋ values BY RANK and average the rest, computed exactly
    on the bounded integer histogram with partial boundary-cell counts
    (kept_in_cell = overlap of the cell's rank run with the kept rank
    range — pure integers; ONE mirrored divide at the end). No sort, no
    approximation.

    Scale shape: per-block cent histograms → one value-domain groupby →
    driver integer scan."""
    orders = rd.read_parquet(_p(sf_dir, "orders"), columns=["o_totalprice"])

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict({"cell": cents})
        out = t2.group_by(["cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["cell", "n"])

    rows = (
        orders.map_batches(hist, batch_format="pyarrow")
        .groupby("cell").sum("n")
        .take_all()  # value-domain-bounded
    )
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    counts = np.array([r["sum(n)"] for r in rows], dtype=np.int64)
    order = np.argsort(cells)
    cells, counts = cells[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    k = n // 4
    lo_rank, hi_rank = k + 1, n - k
    first = cum - counts + 1
    kept = np.maximum(
        0, np.minimum(cum, hi_rank) - np.maximum(first, lo_rank) + 1
    )
    total = int((cells * kept).sum())
    n_kept = hi_rank - lo_rank + 1
    return pa.Table.from_pydict(
        {"n": pa.array([n], pa.int64()),
         "n_kept": pa.array([n_kept], pa.int64()),
         "iqm": pa.array(
             [np.float64(total) / np.float64(n_kept) / 100.0], pa.float64())}
    )


SQL_IQM_PRICE = """
WITH h AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cell,
         count(*) AS cnt
  FROM orders GROUP BY 1
),
c AS (
  SELECT cell, cnt,
         sum(cnt) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER () AS n
  FROM h
),
b AS (
  SELECT cell, n,
         greatest(0, least(cum, n - n // 4)
                     - greatest(cum - cnt + 1, n // 4 + 1) + 1) AS kept
  FROM c
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(max(n) - 2 * (max(n) // 4) AS BIGINT) AS n_kept,
       CAST(CAST(sum(cell * kept) AS HUGEINT) AS DOUBLE)
         / CAST(max(n) - 2 * (max(n) // 4) AS DOUBLE) / 100.0 AS iqm
FROM b
"""


def q_spearman_qty_price(sf_dir: str):
    """EXACT Spearman rank correlation at scale — the monotonic-
    association test, with NO global sort: tied values take average
    ranks, and 2·avgrank(v) = 2·cum_{<v} + m_v + 1 is an INTEGER from
    the bounded value-domain histogram, so ρ = Pearson over the
    2×-scaled ranks computes from exact big-int moments (the ×2
    cancels; arbitrary-precision string partials, the corr pattern)
    with the one-divide/two-sqrt mirrored chain at the end.

    Scale shape: two histogram passes build the rank maps (domain-
    bounded, ray.put broadcast); one map_batches pass emits per-block
    moment partials; driver math is O(domain)."""
    import math

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_quantity", "l_extendedprice"]
    )

    def hist(t: pa.Table) -> pa.Table:
        q = pc.cast(t.column("l_quantity"), pa.int64())
        c = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        )
        tq = pa.Table.from_pydict({"which": ["q"] * len(q), "v": q})
        tc = pa.Table.from_pydict({"which": ["c"] * len(c), "v": c})
        both = pa.concat_tables([tq, tc])
        out = both.group_by(["which", "v"]).aggregate([("v", "count")])
        return out.rename_columns(["which", "v", "m"])

    rows = (
        li.map_batches(hist, batch_format="pyarrow")
        .groupby(["which", "v"]).sum("m")
        .take_all()  # value domains — bounded
    )
    maps = {}
    for which in ("q", "c"):
        sub = sorted(
            (int(r["v"]), int(r["sum(m)"])) for r in rows
            if r["which"] == which
        )
        vals = np.array([v for v, _m in sub], dtype=np.int64)
        ms = np.array([m for _v, m in sub], dtype=np.int64)
        cum_prev = np.cumsum(ms) - ms
        maps[which] = (vals, 2 * cum_prev + ms + 1)  # integer 2·avgrank
    ref = ray.put(maps)

    partial_schema = pa.schema(
        [("n", pa.int64()), ("sx", pa.string()), ("sy", pa.string()),
         ("sxy", pa.string()), ("sxx", pa.string()), ("syy", pa.string())]
    )

    def moments(t: pa.Table) -> pa.Table:
        mp = ray.get(ref)
        q = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        c = pc.cast(
            pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        qv, qr = mp["q"]
        cv, cr = mp["c"]
        x = qr[np.searchsorted(qv, q)].astype(object)
        y = cr[np.searchsorted(cv, c)].astype(object)
        return pa.Table.from_pydict(
            {"n": [len(x)], "sx": [str(sum(x))], "sy": [str(sum(y))],
             "sxy": [str(sum(x * y))], "sxx": [str(sum(x * x))],
             "syy": [str(sum(y * y))]},
            schema=partial_schema,
        )

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"n": [int(pc.sum(t.column("n")).as_py() or 0)],
             **{c: [str(sum(int(x) for x in t.column(c).to_pylist()))]
                for c in ("sx", "sy", "sxy", "sxx", "syy")}},
            schema=partial_schema,
        )

    # fan-in-64 tree (the table_checksum shape): ≤64 partials on driver
    parts = li.map_batches(moments, batch_format="pyarrow")
    k = parts.count()
    while k > 64:
        parts = parts.repartition(max(1, (k + 63) // 64)).map_batches(
            combine, batch_format="pyarrow", batch_size=None
        )
        k = parts.count()
    n = sx = sy = sxy = sxx = syy = 0
    for r in parts.take_all():
        n += r["n"]
        sx += int(r["sx"])
        sy += int(r["sy"])
        sxy += int(r["sxy"])
        sxx += int(r["sxx"])
        syy += int(r["syy"])
    num = n * sxy - sx * sy
    dxx = n * sxx - sx * sx
    dyy = n * syy - sy * sy
    rho = (
        float(num) / (math.sqrt(float(dxx)) * math.sqrt(float(dyy)))
        if dxx > 0 and dyy > 0 else None
    )
    return pa.Table.from_pydict(
        {"n": pa.array([n], pa.int64()),
         "spearman": pa.array([rho], pa.float64())}
    )


SQL_SPEARMAN_QTY_PRICE = """
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
),
qh AS (SELECT q, count(*) AS m FROM base GROUP BY q),
qr AS (
  SELECT q, 2 * (sum(m) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) - m)
            + m + 1 AS x
  FROM qh
),
ch AS (SELECT c, count(*) AS m FROM base GROUP BY c),
cr AS (
  SELECT c, 2 * (sum(m) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) - m)
            + m + 1 AS y
  FROM ch
),
j AS (
  SELECT CAST(qr.x AS HUGEINT) AS x, CAST(cr.y AS HUGEINT) AS y
  FROM base JOIN qr USING (q) JOIN cr USING (c)
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS spearman
FROM s
"""


def q_mannwhitney_value(sf_dir: str):
    """EXACT Mann–Whitney U — the rank-sum two-sample test (the
    nonparametric sibling of q_ks_value_test): purchase vs click
    values, with tied values taking POOLED average ranks. Everything is
    integer via the 2× trick (2·avgrank = 2·cum_{<v} + m_v + 1 over the
    pooled histogram; 2U = 2·S_a − n_a(n_a+1)); the common-language
    effect size U/(n_a·n_b) is ONE mirrored divide.

    Scale shape: one per-block (type, cents) histogram combiner pass →
    value-domain groupby → driver integer scan. No sort, no
    approximation."""
    ev = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_type", "value"],
        filter=(pc.field("event_type").isin(["purchase", "click"])),
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        t2 = pa.Table.from_pydict(
            {"g": t.column("event_type"), "cell": cents}
        )
        out = t2.group_by(["g", "cell"]).aggregate([("cell", "count")])
        return out.rename_columns(["g", "cell", "n"])

    rows = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["g", "cell"]).sum("n")
        .take_all()  # value-domain-bounded
    )
    cells: dict[int, list[int]] = {}
    for r in rows:
        e = cells.setdefault(int(r["cell"]), [0, 0])
        e[0 if r["g"] == "purchase" else 1] += int(r["sum(n)"])
    na = sum(v[0] for v in cells.values())
    nb = sum(v[1] for v in cells.values())
    cum = 0
    s2a = 0  # 2 × (sum of pooled avg ranks of sample A)
    for cell in sorted(cells):
        ma, mb = cells[cell]
        m = ma + mb
        r2 = 2 * cum + m + 1  # integer 2·avgrank of this pooled value
        s2a += ma * r2
        cum += m
    u2 = s2a - na * (na + 1)  # 2·U_a, exact integer
    return pa.Table.from_pydict(
        {"n_purchase": pa.array([na], pa.int64()),
         "n_click": pa.array([nb], pa.int64()),
         "u2": pa.array([u2], pa.int64()),
         "effect": pa.array(
             [np.float64(u2) / np.float64(2 * na * nb)], pa.float64())}
    )


SQL_MANNWHITNEY_VALUE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cell
  FROM events WHERE event_type IN ('purchase', 'click')
),
h AS (
  SELECT cell,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ma,
         count(*) AS m
  FROM c GROUP BY cell
),
r AS (
  SELECT cell, ma, m,
         2 * (sum(m) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) - m)
           + m + 1 AS r2
  FROM h
),
t AS (
  SELECT CAST(sum(ma) AS BIGINT) AS na,
         CAST(sum(m) - sum(ma) AS BIGINT) AS nb,
         CAST(sum(ma * r2) AS HUGEINT) AS s2a
  FROM r
)
SELECT na AS n_purchase, nb AS n_click,
       CAST(s2a - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
       CAST(s2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE)
         / CAST(2 * na * nb AS DOUBLE) AS effect
FROM t
"""


ANOM_WINDOW_H = 24


def q_anomalous_hours(sf_dir: str):
    """EXACT anomaly ranking — the monitoring alert query: the top-5
    hours whose event-value total deviates most from their trailing
    24-hour window mean. The mean never exists as a float: the
    deviation |W·v_h − Σwindow| is an exact cross-multiplied integer
    (W = hours actually in the window, so partial leading windows are
    handled exactly), ranked (dev desc, hour asc); only the displayed
    score divides once.

    Scale shape: per-block (hour, cents) combiners → one
    calendar-bounded groupby → driver prefix-sum scan."""
    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["ts", "value"])
    HOUR_US = 3_600_000_000

    def hist(t: pa.Table) -> pa.Table:
        h = pc.cast(
            pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False) // HOUR_US
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        hh, inv = np.unique(h, return_inverse=True)
        sums = np.zeros(len(hh), np.int64)
        np.add.at(sums, inv, cents)
        return pa.Table.from_pydict(
            {"h": pa.array(hh, pa.int64()),
             "cents": pa.array(sums, pa.int64())}
        )

    rows = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby("h").aggregate(Sum("cents", alias_name="cents"))
        .take_all()  # calendar-hour domain — bounded
    )
    pairs = sorted((int(r["h"]), int(r["cents"])) for r in rows)
    hours = np.array([h for h, _c in pairs], dtype=np.int64)
    vals = np.array([c for _h, c in pairs], dtype=np.int64)
    lo, hi = int(hours.min()), int(hours.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[hours - lo] = vals
    cum = np.concatenate([[0], np.cumsum(dense)])
    scored = []
    for h, v in pairs:
        i = h - lo
        w0 = max(0, i - ANOM_WINDOW_H + 1)
        wsum = int(cum[i + 1] - cum[w0])
        w = i + 1 - w0  # hours actually inside the trailing window
        dev = abs(w * v - wsum)  # exact cross-multiply, no float mean
        scored.append((dev, h, v, w, wsum))
    scored.sort(key=lambda x: (-x[0], x[1]))
    top = scored[:5]
    return pa.Table.from_pydict(
        {"hour": pc.strftime(
            pc.cast(
                pa.array([h * HOUR_US for _d, h, _v, _w, _s in top],
                         pa.int64()),
                pa.timestamp("us"),
            ),
            format="%Y-%m-%d %H:00",
        ),
         "cents": pa.array([v for _d, _h, v, _w, _s in top], pa.int64()),
         "dev": pa.array([d for d, _h, _v, _w, _s in top], pa.int64())}
    )


SQL_ANOMALOUS_HOURS = f"""
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hr,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
w AS (
  SELECT hr, cents,
         sum(cents) OVER (ORDER BY hr
                          RANGE BETWEEN {ANOM_WINDOW_H - 1} PRECEDING
                          AND CURRENT ROW) AS wsum,
         count(*) OVER (ORDER BY hr
                        RANGE BETWEEN {ANOM_WINDOW_H - 1} PRECEDING
                        AND CURRENT ROW) AS wn
  FROM h
),
-- empty hours contribute zero to the sum but DO count in the engine's
-- window width: widen wn to the calendar width (bounded by the span)
b AS (
  SELECT hr, cents, wsum,
         least(hr - (SELECT min(hr) FROM h) + 1, {ANOM_WINDOW_H}) AS wn
  FROM w
)
SELECT strftime(to_timestamp(hr * 3600), '%Y-%m-%d %H:00') AS hour,
       CAST(cents AS BIGINT) AS cents,
       CAST(abs(wn * cents - wsum) AS BIGINT) AS dev
FROM b
ORDER BY abs(wn * cents - wsum) DESC, hr
LIMIT 5
"""


def q_cohort_revenue(sf_dir: str):
    """COHORT REVENUE matrix — the lifetime-value readout
    (q_user_retention counts users; this follows the MONEY): customers
    cohorted by FIRST-order month, revenue cents per (cohort month,
    months-since-first) cell. Month index = 12·year + month (exact
    integer calendar math, mirrored).

    Scale shape: ONE customer-keyed cogroup computes each customer's
    first month and per-(customer, month) cents partials in a single
    vectorized pass; what leaves a partition is (cohort, months_since,
    cents) rows over the bounded calendar² domain."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def proj(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("o_orderdate"), pa.timestamp("us"))
        m = pc.add(
            pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                        pa.scalar(12, pa.int64())),
            pc.cast(pc.month(ts), pa.int64()),
        )
        return pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"), "m": m,
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                 pa.int64(),
             )}
        )

    part_schema = pa.schema(
        [("cohort_m", pa.int64()), ("months_since", pa.int64()),
         ("cents", pa.int64())]
    )

    def cells(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        first = df.groupby("o_custkey")["m"].transform("min")
        out = pd.DataFrame({
            "cohort_m": first,
            "months_since": df["m"].to_numpy() - first.to_numpy(),
            "cents": df["cents"].to_numpy(),
        }).groupby(["cohort_m", "months_since"])["cents"].sum()
        idx = out.index
        return pa.Table.from_pydict(
            {"cohort_m": pa.array(
                idx.get_level_values(0).to_numpy(np.int64), pa.int64()),
             "months_since": pa.array(
                 idx.get_level_values(1).to_numpy(np.int64), pa.int64()),
             "cents": pa.array(out.to_numpy(np.int64), pa.int64())},
            schema=part_schema,
        )

    agg = (
        coarse_partition_apply(
            orders.map_batches(proj, batch_format="pyarrow"), ["o_custkey"],
            cells, part_schema,
        )
        .groupby(["cohort_m", "months_since"])
        .aggregate(Sum("cents", alias_name="cents"))
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {"cohort_m": t.column("cohort_m"),
             "months_since": t.column("months_since"),
             "revenue": pc.divide(
                 pc.cast(t.column("cents"), pa.float64()), pa.scalar(100.0)
             )}
        ),
        batch_format="pyarrow",
    )


SQL_COHORT_REVENUE = """
WITH o AS (
  SELECT o_custkey,
         12 * year(o_orderdate) + month(o_orderdate) AS m,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1)
SELECT f.cohort_m, o.m - f.cohort_m AS months_since,
       CAST(CAST(sum(o.cents) AS BIGINT) AS DOUBLE) / 100.0 AS revenue
FROM o JOIN f USING (o_custkey)
GROUP BY f.cohort_m, months_since
"""


def q_ar_aging(sf_dir: str):
    """A/R AGING buckets — the finance close report: orders bucketed by
    age relative to the NEWEST order date (current / 31-60 / 61-90 /
    90+ days), counts + exact cent totals per bucket. The as-of date is
    data-derived (max order date — one metadata-cheap aggregate), age
    is integer days, bucket edges are integer compares.

    Scale shape: one tiny max-aggregate; then one per-block
    bucket-combiner pass → a 4-row groupby."""
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def day_col(t: pa.Table):
        return pc.cast(
            pc.cast(
                pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                pa.date32(),
            ),
            pa.int32(),
        )

    as_of = int(
        orders.map_batches(
            lambda t: pa.Table.from_pydict(
                {"d": [int(day_col(t).to_numpy(zero_copy_only=False).max())]}
            ),
            batch_format="pyarrow",
        ).max("d")
    )

    EDGES = [30, 60, 90]
    LABELS = ["0-30", "31-60", "61-90", "90+"]

    def bucket(t: pa.Table) -> pa.Table:
        age = as_of - day_col(t).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # side="right": age == 30 belongs to '31-60' (SQL `age < 30`)
        b = np.searchsorted(np.array(EDGES, np.int64), age, side="right")
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        t2 = pa.Table.from_pydict(
            {"bucket": pa.array([LABELS[i] for i in b], pa.string()),
             "cents": pa.array(cents, pa.int64()),
             "one": pa.array(np.ones(len(b), np.int64))}
        )
        out = t2.group_by(["bucket"]).aggregate(
            [("one", "sum"), ("cents", "sum")]
        )
        return out.rename_columns(["bucket", "n", "cents"])

    agg = (
        orders.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("cents", alias_name="cents"))
    )
    return agg.map_batches(
        lambda t: pa.Table.from_pydict(
            {"bucket": t.column("bucket"),
             "n_orders": t.column("n_orders"),
             "total": pc.divide(
                 pc.cast(t.column("cents"), pa.float64()), pa.scalar(100.0)
             )}
        ),
        batch_format="pyarrow",
    )


SQL_AR_AGING = """
WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS as_of FROM orders),
b AS (
  SELECT CASE
           WHEN mx.as_of - CAST(o_orderdate AS DATE) < 30 THEN '0-30'
           WHEN mx.as_of - CAST(o_orderdate AS DATE) < 60 THEN '31-60'
           WHEN mx.as_of - CAST(o_orderdate AS DATE) < 90 THEN '61-90'
           ELSE '90+' END AS bucket,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders CROSS JOIN mx
)
SELECT bucket, count(*) AS n_orders,
       CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS total
FROM b GROUP BY bucket
"""


def q_activity_joint_hist(sf_dir: str):
    """Cross-table behavioral JOINT profile — the 2-D count-of-counts
    linking the order and event streams: for every shared id, the
    (n_orders, n_events) pair, rolled to (n_orders, n_events, n_ids).
    Exact integers; the profile domain is per-key activity levels, not
    row scale.

    Scale shape: per-table per-block count combiners → two key-scale
    groupbys → ONE key-keyed cogroup attach → a domain-bounded final
    groupby."""
    from semantic_search_system_ray.stages.util import coarse_attach

    def counts_of(table: str, key: str, alias: str):
        ds = rd.read_parquet(_p(sf_dir, table), columns=[key])

        def partial(t: pa.Table) -> pa.Table:
            out = t.group_by([key]).aggregate([(key, "count")])
            return out.rename_columns(["k", "c"])

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("c", alias_name=alias))
        )

    oc = counts_of("orders", "o_custkey", "n_orders").materialize()
    ec = counts_of("events", "user_id", "n_events").materialize()
    joined = coarse_attach(
        oc, ec, left_key="k", right_key="k", attach_cols=["n_events"],
        out_schema=pa.schema(
            [("k", pa.int64()), ("n_orders", pa.int64()),
             ("n_events", pa.int64())]
        ),
    )

    def pairs(t: pa.Table) -> pa.Table:
        t2 = pa.Table.from_pydict(
            {"n_orders": t.column("n_orders"),
             "n_events": t.column("n_events"),
             "one": pa.array(np.ones(t.num_rows, np.int64))}
        )
        out = t2.group_by(["n_orders", "n_events"]).aggregate(
            [("one", "sum")]
        )
        return out.rename_columns(["n_orders", "n_events", "n"])

    return (
        joined.map_batches(pairs, batch_format="pyarrow")
        .groupby(["n_orders", "n_events"])
        .aggregate(Sum("n", alias_name="n_ids"))
    )


SQL_ACTIVITY_JOINT_HIST = """
WITH oc AS (SELECT o_custkey AS k, count(*) AS n_orders
            FROM orders GROUP BY 1),
ec AS (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1)
SELECT oc.n_orders, ec.n_events, count(*) AS n_ids
FROM oc JOIN ec USING (k)
GROUP BY oc.n_orders, ec.n_events
"""


def q_ship_lag_quantiles(sf_dir: str):
    """Fulfillment SLA report — grouped EXACT quantiles over a JOINED
    derived value: p50/p90 of ship lag (l_shipdate − o_orderdate, whole
    days) per order month. Composes the distributed join
    (coarse_attach, planner-chosen) with the bounded-cardinality
    grouped histogram — the lag domain is days, the group domain is
    calendar months, so the quantile pass never sorts or samples.

    Scale shape: one orderkey-keyed attach puts the order date on each
    lineitem; per-block (month, lag) histograms → one domain-bounded
    groupby → driver cum-scan per group."""
    from semantic_search_system_ray.stages.sketch import _quantile_rank
    from semantic_search_system_ray.stages.util import coarse_attach

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"l_orderkey": t.column("l_orderkey"),
             "ship_day": pc.cast(
                 pc.cast(
                     pc.cast(t.column("l_shipdate"), pa.timestamp("us")),
                     pa.date32(),
                 ),
                 pa.int32(),
             )}
        ),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "ord_day": pc.cast(
                 pc.cast(
                     pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                     pa.date32(),
                 ),
                 pa.int32(),
             ),
             "m": pc.add(
                 pc.multiply(
                     pc.cast(
                         pc.year(pc.cast(t.column("o_orderdate"),
                                         pa.timestamp("us"))),
                         pa.int64(),
                     ),
                     pa.scalar(12, pa.int64()),
                 ),
                 pc.cast(
                     pc.month(pc.cast(t.column("o_orderdate"),
                                      pa.timestamp("us"))),
                     pa.int64(),
                 ),
             )}
        ),
        batch_format="pyarrow",
    ).materialize()

    joined = coarse_attach(
        li, orders, left_key="l_orderkey", right_key="o_orderkey",
        attach_cols=["ord_day", "m"],
        out_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("ship_day", pa.int32()),
             ("ord_day", pa.int32()), ("m", pa.int64())]
        ),
    )

    def hist(t: pa.Table) -> pa.Table:
        lag = (
            t.column("ship_day").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            - t.column("ord_day").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )
        t2 = pa.Table.from_pydict(
            {"m": t.column("m"), "lag": pa.array(lag, pa.int64())}
        )
        out = t2.group_by(["m", "lag"]).aggregate([("lag", "count")])
        return out.rename_columns(["m", "lag", "n"])

    rows = (
        joined.map_batches(hist, batch_format="pyarrow")
        .groupby(["m", "lag"]).sum("n")
        .take_all()  # months × lag-day domain — bounded
    )
    by_m: dict = {}
    for r in rows:
        by_m.setdefault(int(r["m"]), []).append(
            (int(r["lag"]), int(r["sum(n)"]))
        )
    QS = [0.5, 0.9]
    out = {"m": [], "q": [], "lag_days": []}
    for m in sorted(by_m):
        cells = sorted(by_m[m])
        vals = np.array([v for v, _n in cells], dtype=np.int64)
        cnts = np.array([n for _v, n in cells], dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        for q in QS:
            idx = int(np.searchsorted(cum, _quantile_rank(q, n),
                                      side="left"))
            out["m"].append(m)
            out["q"].append(q)
            out["lag_days"].append(int(vals[idx]))
    return pa.Table.from_pydict(
        {"m": pa.array(out["m"], pa.int64()),
         "q": pa.array(out["q"], pa.float64()),
         "lag_days": pa.array(out["lag_days"], pa.int64())}
    )


SQL_SHIP_LAG_QUANTILES = """
WITH j AS (
  SELECT 12 * year(o.o_orderdate) + month(o.o_orderdate) AS m,
         CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
              AS BIGINT) AS lag
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(m AS BIGINT) AS m,
       unnest([0.5, 0.9]) AS q,
       unnest(quantile_disc(lag, [0.5, 0.9])) AS lag_days
FROM j GROUP BY m
"""


def q_comparable_growth(sf_dir: str):
    """COMPARABLE ("same-store") growth — the retail metric that holds
    the population fixed: revenue growth from the penultimate to the
    final calendar year computed ONLY over customers active in BOTH
    years (an intersection-constrained aggregate — naive YoY confounds
    growth with churn/acquisition). Exact cents; growth is integer ppm
    with DuckDB truncation mirrored.

    Scale shape: per-block (customer, year) cent combiners → one
    customer-keyed groupby; the both-years filter and the two
    conditional sums run as per-partition vectorized partials via the
    same coarse cogroup; driver sees two integers."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_orderdate",
                                       "o_totalprice"],
    )

    def proj(t: pa.Table) -> pa.Table:
        yr = pc.cast(
            pc.year(pc.cast(t.column("o_orderdate"), pa.timestamp("us"))),
            pa.int64(),
        )
        return pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"), "yr": yr,
             "cents": pc.cast(
                 pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                 pa.int64(),
             )}
        )

    proj_ds = orders.map_batches(proj, batch_format="pyarrow").materialize()
    y2 = int(proj_ds.max("yr"))
    y1 = y2 - 1

    part_schema = pa.schema(
        [("n", pa.int64()), ("c1", pa.int64()), ("c2", pa.int64())]
    )

    def partials(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df[df["yr"].isin([y1, y2])]
        g = df.groupby(["o_custkey", "yr"])["cents"].sum().unstack("yr")
        if y1 not in g.columns or y2 not in g.columns:
            return part_schema.empty_table()
        both = g.dropna(subset=[y1, y2])
        return pa.Table.from_pydict(
            {"n": pa.array([len(both)], pa.int64()),
             "c1": pa.array([int(both[y1].sum())], pa.int64()),
             "c2": pa.array([int(both[y2].sum())], pa.int64())},
            schema=part_schema,
        )

    agg = coarse_partition_apply(
        proj_ds, ["o_custkey"], partials, part_schema
    ).sum(["n", "c1", "c2"])
    n = int(agg["sum(n)"])
    c1, c2 = int(agg["sum(c1)"]), int(agg["sum(c2)"])
    num = (c2 - c1) * 1_000_000
    growth = (1 if num >= 0 else -1) * (abs(num) // c1) if c1 else None
    return pa.Table.from_pydict(
        {"y1": pa.array([y1], pa.int64()),
         "y2": pa.array([y2], pa.int64()),
         "n_comparable": pa.array([n], pa.int64()),
         "growth_ppm": pa.array([growth], pa.int64())}
    )


SQL_COMPARABLE_GROWTH = """
WITH o AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ys AS (SELECT max(yr) AS y2, max(yr) - 1 AS y1 FROM o),
per AS (
  SELECT o.o_custkey,
         sum(CASE WHEN o.yr = ys.y1 THEN o.cents END) AS c1,
         sum(CASE WHEN o.yr = ys.y2 THEN o.cents END) AS c2
  FROM o CROSS JOIN ys
  GROUP BY o.o_custkey
),
b AS (SELECT * FROM per WHERE c1 IS NOT NULL AND c2 IS NOT NULL)
SELECT CAST(ys.y1 AS BIGINT) AS y1, CAST(ys.y2 AS BIGINT) AS y2,
       (SELECT count(*) FROM b) AS n_comparable,
       CAST((CAST((SELECT sum(c2) FROM b) AS HUGEINT)
             - (SELECT sum(c1) FROM b)) * 1000000
            // (SELECT sum(c1) FROM b) AS BIGINT) AS growth_ppm
FROM ys
"""


def q_lorenz_curve(sf_dir: str):
    """LORENZ CURVE points — the inequality profile behind
    q_revenue_concentration's single number and q_key_skew_report's
    Gini: at each customer-count decile (quantile_disc ranks), the
    cumulative share of revenue held by the poorest-k/10 of customers,
    exact integer ppm. Customers order by their whole-dollar total (the
    rfm quantization keeps the cell domain bounded); a decile landing
    inside a cell contributes a deterministic partial
    (target − cumN_prev) · cell_cents // cell_n — integer truncation,
    mirrored.

    Scale shape: one customer-keyed groupby → one dollar-cell groupby
    carrying (n customers, exact cents) per cell → driver scan over the
    bounded cells."""
    from semantic_search_system_ray.stages.sketch import _quantile_rank

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def per_cust(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
        )
        t2 = pa.Table.from_pydict(
            {"o_custkey": t.column("o_custkey"), "cents": cents}
        )
        out = t2.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return out.rename_columns(["o_custkey", "cents"])

    cust = (
        orders.map_batches(per_cust, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("cents", alias_name="cents"))
    )

    def cells(t: pa.Table) -> pa.Table:
        c = t.column("cents").to_numpy(zero_copy_only=False)
        d = c // 100
        t2 = pa.Table.from_pydict(
            {"dollars": pa.array(d, pa.int64()),
             "cents": pa.array(c, pa.int64()),
             "one": pa.array(np.ones(len(c), np.int64))}
        )
        out = t2.group_by(["dollars"]).aggregate(
            [("one", "sum"), ("cents", "sum")]
        )
        return out.rename_columns(["dollars", "cn", "cc"])

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("dollars")
        .aggregate(Sum("cn", alias_name="cn"), Sum("cc", alias_name="cc"))
        .take_all()  # dollar-cell domain — bounded
    )
    rows.sort(key=lambda r: r["dollars"])
    cns = np.array([int(r["cn"]) for r in rows], dtype=np.int64)
    ccs = np.array([int(r["cc"]) for r in rows], dtype=np.int64)
    cum_n = np.cumsum(cns)
    cum_c = np.cumsum(ccs)
    n = int(cum_n[-1])
    total = int(cum_c[-1])
    out = {"decile": [], "cum_share_ppm": []}
    for k in range(1, 10):
        target = _quantile_rank(k / 10, n)
        i = int(np.searchsorted(cum_n, target, side="left"))
        prev_n = int(cum_n[i - 1]) if i > 0 else 0
        prev_c = int(cum_c[i - 1]) if i > 0 else 0
        part = prev_c + (target - prev_n) * int(ccs[i]) // int(cns[i])
        out["decile"].append(k)
        out["cum_share_ppm"].append(part * 1_000_000 // total)
    return pa.Table.from_pydict(
        {"decile": pa.array(out["decile"], pa.int64()),
         "cum_share_ppm": pa.array(out["cum_share_ppm"], pa.int64())}
    )


SQL_LORENZ_CURVE = """
WITH cust AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
cells AS (
  SELECT cents // 100 AS dollars, count(*) AS cn, sum(cents) AS cc
  FROM cust GROUP BY 1
),
c AS (
  SELECT dollars, cn, cc,
         sum(cn) OVER (ORDER BY dollars ROWS UNBOUNDED PRECEDING) AS cum_n,
         sum(cc) OVER (ORDER BY dollars ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM cells
),
t AS (SELECT CAST(sum(cn) AS BIGINT) AS n, CAST(sum(cc) AS HUGEINT)
             AS total FROM cells),
k AS (
  SELECT unnest(generate_series(1, 9)) AS decile
),
tgt AS (
  -- quantile_disc rank: ceil(k/10 · n), exact in integers
  SELECT k.decile, (k.decile * t.n + 9) // 10 AS target
  FROM k CROSS JOIN t
),
pick AS (
  SELECT tgt.decile, tgt.target, min(c.cum_n) AS cum_n
  FROM tgt JOIN c ON c.cum_n >= tgt.target
  GROUP BY tgt.decile, tgt.target
),
calc AS (
  SELECT p.decile,
         coalesce(prev.cum_c, 0)
           + (p.target - coalesce(prev.cum_n, 0))
             * cell.cc // cell.cn AS part
  FROM pick p
  JOIN c cell ON cell.cum_n = p.cum_n
  LEFT JOIN c prev ON prev.cum_n = (
    SELECT max(c2.cum_n) FROM c c2 WHERE c2.cum_n < p.cum_n
  )
)
SELECT CAST(calc.decile AS BIGINT) AS decile,
       CAST(CAST(calc.part AS HUGEINT) * 1000000 // t.total AS BIGINT)
         AS cum_share_ppm
FROM calc CROSS JOIN t
"""


KNN_QUERIES = 10
KNN_K = 10


def q_knn_classify(sf_dir: str):
    """k-NN CLASSIFICATION — the exact-retrieval ML op on the gate: for
    each of the first 10 vectors, the majority label of its 10 nearest
    neighbors by cosine (self excluded; scores rounded to 4dp on both
    sides; neighbor ties (score desc, vec_id asc); vote ties → smaller
    label). One FUSED pass scores every block against the broadcast
    query matrix; each block pre-trims to its per-query top-10 under
    the EXACT global ordering (rounded score, id — a provable
    combiner), so the global rank sees |blocks|·q·k lean rows.

    Scale shape: one broadcast (ray.put) of the 10×dim matrix, one
    map_batches matmul pass, grouped_topk with per-block combiners,
    and a 100-row driver vote."""
    import pandas as pd

    from semantic_search_system_ray.stages.ann import _as_matrix
    from semantic_search_system_ray.stages.util import grouped_topk

    ds = rd.read_parquet(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )

    import pyarrow.parquet as pq

    qt = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", KNN_QUERIES)],
    ).sort_by("vec_id")
    qm = _as_matrix(qt.column("embedding"))  # rows already L2-normalized
    qref = ray.put(qm.T.copy())

    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(qref)  # dim × 10
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        labels = pc.cast(t.column("label"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        raw = _as_matrix(t.column("embedding")) @ q  # B×10
        # round half-away-from-zero at 4dp to match DuckDB round();
        # np.round is banker's (half-to-even) and would diverge on exact
        # binary halfway points like 0.03125 (ADVICE r3).
        sims = np.copysign(np.floor(np.abs(raw) * 1e4 + 0.5), raw) / 1e4
        outs = {"qid": [], "vec_id": [], "label": [], "score": []}
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            keep = ids != qids[qi]  # self excluded by ACTUAL vec_id
            order = np.lexsort((ids[keep], -s[keep]))[:KNN_K]
            sel = np.flatnonzero(keep)[order]
            outs["qid"].append(np.full(len(sel), qids[qi], np.int64))
            outs["vec_id"].append(ids[sel])
            outs["label"].append(labels[sel])
            outs["score"].append(s[sel])
        return pa.Table.from_pydict(
            {"qid": pa.array(np.concatenate(outs["qid"]), pa.int64()),
             "vec_id": pa.array(
                 np.concatenate(outs["vec_id"]).astype(np.int64), pa.int64()),
             "label": pa.array(np.concatenate(outs["label"]), pa.int64()),
             "score": pa.array(np.concatenate(outs["score"]), pa.float64())}
        )

    top = grouped_topk(
        ds.map_batches(score, batch_format="pyarrow"),
        ["qid"], ["score", "vec_id"], descending=[True, False], k=KNN_K,
    )
    rows = top.take_all()  # 10 queries × k — bounded
    votes: dict = {}
    for r in rows:
        votes.setdefault(int(r["qid"]), Counter())[int(r["label"])] += 1
    out = {"query_id": [], "pred_label": [], "n_votes": []}
    for qid in sorted(votes):
        lab, n = sorted(votes[qid].items(), key=lambda x: (-x[1], x[0]))[0]
        out["query_id"].append(qid)
        out["pred_label"].append(lab)
        out["n_votes"].append(n)
    return pa.Table.from_pydict(
        {"query_id": pa.array(out["query_id"], pa.int64()),
         "pred_label": pa.array(out["pred_label"], pa.int64()),
         "n_votes": pa.array(out["n_votes"], pa.int64())}
    )


SQL_KNN_CLASSIFY = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id < {KNN_QUERIES}
),
scored AS (
  SELECT q.qid, e.vec_id, CAST(e.label AS BIGINT) AS label,
         round(CAST(list_cosine_similarity(e.embedding, q.qv) AS DOUBLE), 4)
           AS score
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY score DESC, vec_id
  ) AS rk
  FROM scored
),
votes AS (
  SELECT qid, label, count(*) AS n
  FROM ranked WHERE rk <= {KNN_K}
  GROUP BY qid, label
)
SELECT qid AS query_id, label AS pred_label, CAST(n AS BIGINT) AS n_votes
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY n DESC, label
  ) AS vr FROM votes
) WHERE vr = 1
"""


def q_ab_significance(sf_dir: str):
    """Two-proportion z-test for the A/B readout — the significance
    number next to q_ab_conversion's rates: z = (p_B − p_A) / √(p̂(1−p̂)
    (1/n_A + 1/n_B)) with the pooled proportion p̂. Inputs are the exact
    integer arm counts (the same distributed pass as ab_conversion);
    the z value is ONE mirrored float chain (identical parenthesization
    both sides, no summation — bit-stable)."""
    import math

    counts = {
        r["arm"]: (int(r["exposed"]), int(r["converted"]))
        for r in q_ab_conversion(sf_dir).to_pylist()
    }
    ea, ca = counts["A"]
    eb, cb = counts["B"]
    pa_ = np.float64(ca) / np.float64(ea)
    pb_ = np.float64(cb) / np.float64(eb)
    pool = np.float64(ca + cb) / np.float64(ea + eb)
    se = math.sqrt(
        pool * (1.0 - pool) * (1.0 / np.float64(ea) + 1.0 / np.float64(eb))
    )
    return pa.Table.from_pydict(
        {"n_a": pa.array([ea], pa.int64()),
         "n_b": pa.array([eb], pa.int64()),
         "z": pa.array([(pb_ - pa_) / se], pa.float64())}
    )


SQL_AB_SIGNIFICANCE = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
),
armed AS (
  SELECT s.user_id,
         CASE WHEN md5(CAST(s.user_id AS VARCHAR)) < '8'
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS c
  FROM s LEFT JOIN conv ON s.user_id = conv.user_id
),
t AS (
  SELECT
    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ea,
    CAST(sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS BIGINT) AS ca,
    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS eb,
    CAST(sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS BIGINT) AS cb
  FROM armed
)
SELECT ea AS n_a, eb AS n_b,
       (CAST(cb AS DOUBLE) / CAST(eb AS DOUBLE)
        - CAST(ca AS DOUBLE) / CAST(ea AS DOUBLE))
       / sqrt(
           (CAST(ca + cb AS DOUBLE) / CAST(ea + eb AS DOUBLE))
           * (1.0 - CAST(ca + cb AS DOUBLE) / CAST(ea + eb AS DOUBLE))
           * (1.0 / CAST(ea AS DOUBLE) + 1.0 / CAST(eb AS DOUBLE))
         ) AS z
FROM t
"""


QUERIES = {
    "ab_significance": q_ab_significance,
    "knn_classify": q_knn_classify,
    "lorenz_curve": q_lorenz_curve,
    "comparable_growth": q_comparable_growth,
    "ship_lag_quantiles": q_ship_lag_quantiles,
    "ar_aging": q_ar_aging,
    "activity_joint_hist": q_activity_joint_hist,
    "cohort_revenue": q_cohort_revenue,
    "anomalous_hours": q_anomalous_hours,
    "mannwhitney_value": q_mannwhitney_value,
    "spearman_qty_price": q_spearman_qty_price,
    "iqm_price": q_iqm_price,
    "vocab_growth": q_vocab_growth,
    "allocate_budget": q_allocate_budget,
    "interarrival_hist": q_interarrival_hist,
    "region_share": q_region_share,
    "orderkey_gaps": q_orderkey_gaps,
    "longest_streak": q_longest_streak,
    "longest_quiet_run": q_longest_quiet_run,
    "purchase_attribution": q_purchase_attribution,
    "events_interp_grid": q_events_interp_grid,
    "ab_conversion": q_ab_conversion,
    "centroid_top_dims": q_centroid_top_dims,
    "weighted_median_price": q_weighted_median_price,
    "csv_roundtrip": q_csv_roundtrip,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "quantile_normalize": q_quantile_normalize,
    "key_skew_report": q_key_skew_report,
    "dup_payments": q_dup_payments,
    "bounce_rate": q_bounce_rate,
    "ks_value_test": q_ks_value_test,
    "revenue_concentration": q_revenue_concentration,
    "event_type_affinity": q_event_type_affinity,
    "benford_digits": q_benford_digits,
    "bucketed_join": q_bucketed_join,
    "mv_delta_refresh": q_mv_delta_refresh,
    "distinct_users_by_type": q_distinct_users_by_type,
    "source_vocab_overlap": q_source_vocab_overlap,
    "orders_rank_ties": q_orders_rank_ties,
    "k_anonymity": q_k_anonymity,
    "yoy_revenue": q_yoy_revenue,
    "order_intervals": q_order_intervals,
    "forget_users": q_forget_users,
    "dow_priority_contingency": q_dow_priority_contingency,
    "conversion_lag": q_conversion_lag,
    "concurrent_sessions": q_concurrent_sessions,
    "scd2_asof_lookup": q_scd2_asof_lookup,
    "user_trailing_sum": q_user_trailing_sum,
    "rfm_segments": q_rfm_segments,
    "fifo_match": q_fifo_match,
    "session_paths": q_session_paths,
    "rolling_distinct_users": q_rolling_distinct_users,
    "late_suppliers": q_late_suppliers,
    "events_mad": q_events_mad,
    "distinctive_terms": q_distinctive_terms,
    "price_qty_regression": q_price_qty_regression,
    "corr_qty_price": q_corr_qty_price,
    "orders_bloom_semi": q_orders_bloom_semi,
    "local_supplier_volume": q_local_supplier_volume,
    "merge_upsert": q_merge_upsert,
    "dq_checks": q_dq_checks,
    "er_golden_records": _er_golden_records,
    "kmeans_embeddings": _kmeans_embeddings,
    "semantic_dedup": _semantic_dedup,
    "heavy_hitters": q_heavy_hitters,
    "grouped_sample": q_grouped_sample,
    "funnel": q_funnel,
    "scd2_history": q_scd2_history,
    "time_weighted_value": q_time_weighted_value,
    "copurchase_pairs": q_copurchase_pairs,
    "compact_roundtrip": q_compact_roundtrip,
    "table_checksum": q_table_checksum,
    "table_diff": q_table_diff,
    "dedup_spans": q_dedup_spans,
    "zscore_normalize": q_zscore_normalize,
    "events_orders_outer": q_events_orders_outer,
    "pack_sequences": q_pack_sequences,
    "user_retention": q_user_retention,
    "orders_cube": q_orders_cube,
    "median_price_by_priority": q_median_price_by_priority,
    "rag_ingest": q_rag_ingest,
    "user_moving_sum": q_user_moving_sum,
    "orders_dense_rank": q_orders_dense_rank,
    "user_first_event": q_user_first_event,
    "events_json_stats": q_events_json_stats,
    "cov_qty_price": q_cov_qty_price,
    "events_lag_delta": q_events_lag_delta,
    "orders_rollup": q_orders_rollup,
    "orders_pivot": q_orders_pivot,
    "user_top_event": q_user_top_event,
    "suppliers_with_sales": q_suppliers_with_sales,
    "brand_types": q_brand_types,
    "nations_both": q_nations_both,
    "tfidf_top_terms": q_tfidf_top_terms,
    "stratified_sample": q_stratified_sample,
    "contamination": q_contamination,
    "repetition": q_repetition,
    "substring_dups": q_substring_dups,
    "pmi_pairs": q_pmi_pairs,
    "chunk_docs": q_chunk_docs,
    "customer_order_stats": q_customer_order_stats,
    "daily_new_users": q_daily_new_users,
    "events_percent_rank": q_events_percent_rank,
    "inverted_index": q_inverted_index,
    "events_quantiles": q_events_quantiles,
    "events_quantiles_by_type": q_events_quantiles_by_type,
    "user_running_sum": q_user_running_sum,
    "events_cusum": q_events_cusum,
    "rare_label_collapse": q_rare_label_collapse,
    "conversion_survival": q_conversion_survival,
    "entropy_by_source": q_entropy_by_source,
    "doc_novelty": q_doc_novelty,
    "value_deciles": q_value_deciles,
    "orders_topk_per_priority": q_orders_topk_per_priority,
    "search_like": q_search_like,
    "events_sliding": q_events_sliding,
    "orders_asof": q_orders_asof,
    "purchase_click_window": q_purchase_click_window,
    "train_split": q_train_split,
    "redact_pii": q_redact_pii,
    "corpus_clean": q_corpus_clean,
    "trigram_logprob": q_trigram_logprob,
    "sessionize": q_sessionize,
    "parts_by_brand": q_parts_by_brand,
    "supplier_topk": q_supplier_topk,
    "part_size_filter": q_part_size_filter,
    "union_names": q_union_names,
    "events_extrema": q_events_extrema,
    "orders_per_customer_topk": q_orders_per_customer_topk,
    "filter_date_range": q_filter_date_range,
    "filter_eq": q_filter_eq,
    "topk_orders": q_topk_orders,
    "groupby_lineitem": q_groupby_lineitem,
    "region_rollup": q_region_rollup,
    "revenue_by_priority": q_revenue_by_priority,
    "distinct_segments": q_distinct_segments,
    "minmax_normalize": q_minmax_normalize,
    "dedup_exact": q_dedup_exact,
    "event_transitions": q_event_transitions,
    "events_locf": q_events_locf,
    "small_qty_revenue": q_small_qty_revenue,
    "events_daily_gapfill": q_events_daily_gapfill,
    "orders_skyline": q_orders_skyline,
    "centroid_by_label": q_centroid_by_label,
    "events_ohlc": q_events_ohlc,
    "orders_unpivot": q_orders_unpivot,
    "events_hourly": q_events_hourly,
    "token_count": q_token_count,
    "gopher_filter": q_gopher_filter,
    "curation_e2e": q_curation_e2e,
    "domain_mix": q_domain_mix,
    "quality_prune": q_quality_prune,
    "dsir_weights": q_dsir_weights,
    "word_topk": q_word_topk,
    "lang_stats": q_lang_stats,
    "ann_cosine": q_ann_cosine,
    "cosine_dups": q_cosine_dups,
    "customers_without_orders": q_customers_without_orders,
}

ORACLE_SQL = {
    "ab_significance": SQL_AB_SIGNIFICANCE,
    "knn_classify": SQL_KNN_CLASSIFY,
    "lorenz_curve": SQL_LORENZ_CURVE,
    "comparable_growth": SQL_COMPARABLE_GROWTH,
    "ship_lag_quantiles": SQL_SHIP_LAG_QUANTILES,
    "ar_aging": SQL_AR_AGING,
    "activity_joint_hist": SQL_ACTIVITY_JOINT_HIST,
    "cohort_revenue": SQL_COHORT_REVENUE,
    "anomalous_hours": SQL_ANOMALOUS_HOURS,
    "mannwhitney_value": SQL_MANNWHITNEY_VALUE,
    "spearman_qty_price": SQL_SPEARMAN_QTY_PRICE,
    "iqm_price": SQL_IQM_PRICE,
    "vocab_growth": SQL_VOCAB_GROWTH,
    "allocate_budget": SQL_ALLOCATE_BUDGET,
    "interarrival_hist": SQL_INTERARRIVAL_HIST,
    "region_share": SQL_REGION_SHARE,
    "orderkey_gaps": SQL_ORDERKEY_GAPS,
    "longest_streak": SQL_LONGEST_STREAK,
    "longest_quiet_run": SQL_LONGEST_QUIET_RUN,
    "purchase_attribution": SQL_PURCHASE_ATTRIBUTION,
    "events_interp_grid": SQL_EVENTS_INTERP_GRID,
    "ab_conversion": SQL_AB_CONVERSION,
    "centroid_top_dims": SQL_CENTROID_TOP_DIMS,
    "weighted_median_price": SQL_WEIGHTED_MEDIAN_PRICE,
    "csv_roundtrip": SQL_CSV_ROUNDTRIP,
    "jsonl_roundtrip": SQL_JSONL_ROUNDTRIP,
    "quantile_normalize": SQL_QUANTILE_NORMALIZE,
    "key_skew_report": SQL_KEY_SKEW_REPORT,
    "dup_payments": SQL_DUP_PAYMENTS,
    "bounce_rate": SQL_BOUNCE_RATE,
    "ks_value_test": SQL_KS_VALUE_TEST,
    "revenue_concentration": SQL_REVENUE_CONCENTRATION,
    "event_type_affinity": SQL_EVENT_TYPE_AFFINITY,
    "benford_digits": SQL_BENFORD_DIGITS,
    "bucketed_join": SQL_BUCKETED_JOIN,
    "mv_delta_refresh": SQL_MV_DELTA_REFRESH,
    "distinct_users_by_type": SQL_DISTINCT_USERS_BY_TYPE,
    "source_vocab_overlap": SQL_SOURCE_VOCAB_OVERLAP,
    "orders_rank_ties": SQL_ORDERS_RANK_TIES,
    "k_anonymity": SQL_K_ANONYMITY,
    "yoy_revenue": SQL_YOY_REVENUE,
    "order_intervals": SQL_ORDER_INTERVALS,
    "forget_users": SQL_FORGET_USERS,
    "dow_priority_contingency": SQL_DOW_PRIORITY_CONTINGENCY,
    "conversion_lag": SQL_CONVERSION_LAG,
    "concurrent_sessions": SQL_CONCURRENT_SESSIONS,
    "scd2_asof_lookup": SQL_SCD2_ASOF_LOOKUP,
    "user_trailing_sum": SQL_USER_TRAILING_SUM,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "fifo_match": SQL_FIFO_MATCH,
    "session_paths": SQL_SESSION_PATHS,
    "rolling_distinct_users": SQL_ROLLING_DISTINCT_USERS,
    "late_suppliers": SQL_LATE_SUPPLIERS,
    "events_mad": SQL_EVENTS_MAD,
    "distinctive_terms": SQL_DISTINCTIVE_TERMS,
    "price_qty_regression": SQL_PRICE_QTY_REGRESSION,
    "corr_qty_price": SQL_CORR_QTY_PRICE,
    "orders_bloom_semi": SQL_ORDERS_BLOOM_SEMI,
    "local_supplier_volume": SQL_LOCAL_SUPPLIER_VOLUME,
    "merge_upsert": SQL_MERGE_UPSERT,
    "dq_checks": SQL_DQ_CHECKS,
    "er_golden_records": SQL_ER_GOLDEN_RECORDS,
    "kmeans_embeddings": _sql_kmeans_embeddings(),
    "semantic_dedup": _sql_semantic_dedup(),
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "grouped_sample": SQL_GROUPED_SAMPLE,
    "funnel": SQL_FUNNEL,
    "scd2_history": SQL_SCD2_HISTORY,
    "time_weighted_value": SQL_TIME_WEIGHTED_VALUE,
    "copurchase_pairs": SQL_COPURCHASE_PAIRS,
    "compact_roundtrip": SQL_COMPACT_ROUNDTRIP,
    "table_checksum": SQL_TABLE_CHECKSUM,
    "table_diff": SQL_TABLE_DIFF,
    "dedup_spans": _sql_dedup_spans(),
    "zscore_normalize": SQL_ZSCORE_NORMALIZE,
    "events_orders_outer": SQL_EVENTS_ORDERS_OUTER,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "user_retention": SQL_USER_RETENTION,
    "orders_cube": SQL_ORDERS_CUBE,
    "median_price_by_priority": SQL_MEDIAN_PRICE_BY_PRIORITY,
    "rag_ingest": SQL_RAG_INGEST,
    "user_moving_sum": SQL_USER_MOVING_SUM,
    "orders_dense_rank": SQL_ORDERS_DENSE_RANK,
    "user_first_event": SQL_USER_FIRST_EVENT,
    "events_json_stats": SQL_EVENTS_JSON_STATS,
    "cov_qty_price": SQL_COV_QTY_PRICE,
    "events_lag_delta": SQL_EVENTS_LAG_DELTA,
    "orders_rollup": SQL_ORDERS_ROLLUP,
    "orders_pivot": SQL_ORDERS_PIVOT,
    "user_top_event": SQL_USER_TOP_EVENT,
    "suppliers_with_sales": SQL_SUPPLIERS_WITH_SALES,
    "brand_types": SQL_BRAND_TYPES,
    "nations_both": SQL_NATIONS_BOTH,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "search_like": SQL_SEARCH_LIKE,
    "events_sliding": SQL_EVENTS_SLIDING,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "events_quantiles_by_type": SQL_EVENTS_QUANTILES_BY_TYPE,
    "user_running_sum": SQL_USER_RUNNING_SUM,
    "events_cusum": SQL_EVENTS_CUSUM,
    "rare_label_collapse": SQL_RARE_LABEL_COLLAPSE,
    "conversion_survival": SQL_CONVERSION_SURVIVAL,
    "entropy_by_source": SQL_ENTROPY_BY_SOURCE,
    "doc_novelty": SQL_DOC_NOVELTY,
    "value_deciles": SQL_VALUE_DECILES,
    "customer_order_stats": SQL_CUSTOMER_ORDER_STATS,
    "daily_new_users": SQL_DAILY_NEW_USERS,
    "events_percent_rank": SQL_EVENTS_PERCENT_RANK,
    "orders_topk_per_priority": SQL_ORDERS_TOPK_PER_PRIORITY,
    "orders_asof": SQL_ORDERS_ASOF,
    "purchase_click_window": SQL_PURCHASE_CLICK_WINDOW,
    "train_split": SQL_TRAIN_SPLIT,
    "redact_pii": SQL_REDACT_PII,
    "corpus_clean": SQL_CORPUS_CLEAN,
    "trigram_logprob": SQL_TRIGRAM_LOGPROB,
    "sessionize": SQL_SESSIONIZE,
    "parts_by_brand": SQL_PARTS_BY_BRAND,
    "supplier_topk": SQL_SUPPLIER_TOPK,
    "part_size_filter": SQL_PART_SIZE_FILTER,
    "union_names": SQL_UNION_NAMES,
    "events_extrema": SQL_EVENTS_EXTREMA,
    "orders_per_customer_topk": SQL_ORDERS_PER_CUSTOMER_TOPK,
    "filter_date_range": SQL_FILTER_DATE_RANGE,
    "filter_eq": SQL_FILTER_EQ,
    "topk_orders": SQL_TOPK_ORDERS,
    "groupby_lineitem": SQL_GROUPBY_LINEITEM,
    "region_rollup": SQL_REGION_ROLLUP,
    "revenue_by_priority": SQL_REVENUE_BY_PRIORITY,
    "distinct_segments": SQL_DISTINCT_SEGMENTS,
    "minmax_normalize": SQL_MINMAX_NORMALIZE,
    "dedup_exact": SQL_DEDUP_EXACT,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "events_locf": SQL_EVENTS_LOCF,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "events_daily_gapfill": SQL_EVENTS_DAILY_GAPFILL,
    "orders_skyline": SQL_ORDERS_SKYLINE,
    "centroid_by_label": SQL_CENTROID_BY_LABEL,
    "events_ohlc": SQL_EVENTS_OHLC,
    "orders_unpivot": SQL_ORDERS_UNPIVOT,
    "events_hourly": SQL_EVENTS_HOURLY,
    "token_count": SQL_TOKEN_COUNT,
    "gopher_filter": SQL_GOPHER_FILTER,
    "curation_e2e": SQL_CURATION_E2E,
    "domain_mix": SQL_DOMAIN_MIX,
    "quality_prune": SQL_QUALITY_PRUNE,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "word_topk": SQL_WORD_TOPK,
    "lang_stats": SQL_LANG_STATS,
    "ann_cosine": SQL_ANN_COSINE,
    "cosine_dups": SQL_COSINE_DUPS,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
}


# ---------------------------------------------------------------------------
# Winsorization at exact distributed quantiles
# ---------------------------------------------------------------------------

def q_events_winsorize(sf_dir: str):
    """Winsorize event values at the exact P05/P95 — the standard
    outlier clamp before averaging a heavy-tailed metric. Thresholds
    come from the bounded-cardinality histogram quantiles
    (stages/sketch.exact_quantiles_histogram == DuckDB quantile_disc,
    already gated), so the clamp bounds are bit-identical to the SQL
    twin; the clamp itself is two vectorized element-wise min/max — a
    stateless single pass, no sort, no shuffle."""
    from semantic_search_system_ray.stages.sketch import (
        exact_quantiles_histogram,
    )

    ev = rd.read_parquet(_p(sf_dir, "events"), columns=["event_id", "value"])
    (_, lo), (_, hi) = exact_quantiles_histogram(ev, "value", [0.05, 0.95])

    def clamp(t: pa.Table) -> pa.Table:
        v = t.column("value")
        w = pc.min_element_wise(
            pc.max_element_wise(v, pa.scalar(lo, pa.float64())),
            pa.scalar(hi, pa.float64()),
        )
        return pa.Table.from_pydict(
            {"event_id": pc.cast(t.column("event_id"), pa.int64()),
             "value": v, "value_wins": w}
        )

    return ev.map_batches(clamp, batch_format="pyarrow")


SQL_EVENTS_WINSORIZE = """
WITH th AS (
  SELECT quantile_disc(value, 0.05) AS lo, quantile_disc(value, 0.95) AS hi
  FROM events
)
SELECT CAST(event_id AS BIGINT) AS event_id, value,
       least(greatest(value, (SELECT lo FROM th)), (SELECT hi FROM th))
         AS value_wins
FROM events
"""


# ---------------------------------------------------------------------------
# Per-language near-dup rate (curation analytics)
# ---------------------------------------------------------------------------

def q_dedup_rate_by_lang(sf_dir: str):
    """Per-language near-duplication report: of each language's docs,
    how many are non-representative members of a MinHash-LSH cluster
    (doc_id != cluster) — the dashboard number a curation run watches
    to catch a crawl source gone degenerate. One cluster pass, one
    coarse attach of lang, per-block (lang, n, dups) combiners, and a
    language-DOMAIN-bounded driver fold."""
    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.stages.util import coarse_attach

    docs = read_docs(sf_dir, ["doc_id", "text", "lang"])
    clusters = minhash_lsh_clusters(
        docs.select_columns(["doc_id", "text"]), threshold=0.6
    )
    joined_schema = pa.schema(
        [("doc_id", pa.string()), ("cluster", pa.string()),
         ("lang", pa.string())]
    )
    joined = coarse_attach(
        clusters, docs.select_columns(["doc_id", "lang"]),
        left_key="doc_id", right_key="doc_id",
        attach_cols=["lang"], out_schema=joined_schema, how="inner",
    )

    def partial(t: pa.Table) -> pa.Table:
        dup = pc.not_equal(t.column("doc_id"), t.column("cluster"))
        tt = pa.Table.from_pydict(
            {"lang": t.column("lang"),
             "dup": pc.cast(dup, pa.int64()),
             "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64())}
        )
        return tt.group_by(["lang"]).aggregate(
            [("one", "sum"), ("dup", "sum")]
        ).rename_columns(["lang", "n", "dups"])

    # language domain is tiny and bounded — the driver fold is over
    # (n_blocks x n_langs) partial rows, annotated like lang_stats
    parts = joined.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        acc = agg.setdefault(r["lang"], [0, 0])
        acc[0] += int(r["n"])
        acc[1] += int(r["dups"])
    langs = sorted(agg)
    return pa.Table.from_pydict(
        {"lang": pa.array(langs, pa.string()),
         "n_docs": pa.array([agg[la][0] for la in langs], pa.int64()),
         "n_dups": pa.array([agg[la][1] for la in langs], pa.int64()),
         "dup_rate": pa.array(
             [float(agg[la][1]) / float(agg[la][0]) for la in langs],
             pa.float64())},
    )


def _sql_dedup_rate_by_lang() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_minhash_clusters,
    )

    inner = sql_minhash_clusters(threshold=0.6)
    return f"""
WITH cl AS ({inner})
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cl.doc_id <> cl.cluster THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dups,
       CAST(sum(CASE WHEN cl.doc_id <> cl.cluster THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate
FROM cl JOIN documents d ON CAST(d.doc_id AS VARCHAR) = cl.doc_id
GROUP BY d.lang
"""


QUERIES["events_winsorize"] = q_events_winsorize
ORACLE_SQL["events_winsorize"] = SQL_EVENTS_WINSORIZE
QUERIES["dedup_rate_by_lang"] = q_dedup_rate_by_lang
ORACLE_SQL["dedup_rate_by_lang"] = _sql_dedup_rate_by_lang()


def q_events_ewma(sf_dir: str):
    """Per-user EWMA smoothing of event values — the exponential decay
    feature online anomaly/trend models consume — with the DYADIC
    INTEGER recurrence s_1 = c_1, s_t = (c_t + s_{t-1}) // 2 over
    scaled int64 cents in (ts, event_id) order: α = 1/2 with floor
    arithmetic, so the sequential chain is bit-exact on both engines
    (float EWMA would drift engine-vs-SQL on rounding; the repo pins FP
    order everywhere else for the same reason).

    Scale shape: ONE coarse cogroup routes each user's rows together;
    inside the partition the chain runs as a JAGGED LOCKSTEP scan —
    sort once, then iterate over the within-user POSITION k (bounded by
    the max events-per-user, 86 at sf0.01, never the row count), each
    iteration one vectorized numpy step across ALL users at position k.
    No per-user Python, no per-row Python. Oracle: recursive CTE
    stepping rn → rn+1 with the identical floor expression."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.string()), ("ewma", pa.float64())]
    )

    def ewma(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        c = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        # within-user position: arange minus each group's start offset
        starts = np.flatnonzero(new_user)
        pos = np.arange(len(uid)) - np.repeat(starts, np.diff(np.r_[starts, len(uid)]))
        s = c.copy()
        maxpos = int(pos.max()) if len(pos) else 0
        for k in range(1, maxpos + 1):
            idx = np.flatnonzero(pos == k)
            if len(idx) == 0:
                break
            s[idx] = (c[idx] + s[idx - 1]) // 2
        return pa.Table.from_pydict(
            {"event_id": df["event_id"].to_numpy(),
             "user_id": uid,
             "ts": df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
             "ewma": s / 100.0},
            schema=out_schema,
        )

    return coarse_partition_apply(ds, ["user_id"], ewma, out_schema)


SQL_EVENTS_EWMA = """
WITH RECURSIVE seq AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
ew AS (
  SELECT event_id, user_id, ts, rn, c AS s FROM seq WHERE rn = 1
  UNION ALL
  SELECT q.event_id, q.user_id, q.ts, q.rn, (q.c + e.s) // 2 AS s
  FROM ew e JOIN seq q ON q.user_id = e.user_id AND q.rn = e.rn + 1
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       s / 100.0 AS ewma
FROM ew
"""

QUERIES["events_ewma"] = q_events_ewma
ORACLE_SQL["events_ewma"] = SQL_EVENTS_EWMA


def q_price_band_join(sf_dir: str):
    """BAND (range) self-join: per brand, the number of part pairs
    whose retail prices lie within one dollar of each other — the
    interval/band-join shape (|x−y| ≤ δ) that equality-keyed shuffles
    can't express directly. Distributed plan: bucket prices into
    δ-wide bands (cents // δ); a qualifying pair can only straddle
    adjacent bands, so each row is emitted to bands b and b+1 and ONE
    coarse cogroup on (brand, band) sees every candidate pair exactly
    twice-bounded — the max(b_i, b_j) == band rule counts each pair in
    exactly ONE group (proof in comments). Per-group pair enumeration
    is bounded by band occupancy (output-size-inherent, same as the
    SQL join), prices compare as exact scaled int64 cents.

    Oracle: the direct non-equi self-join with abs(c1−c2) <= 100."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    DELTA = 100  # cents (one dollar)
    ds = rd.read_parquet(
        _p(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_retailprice"],
    )
    emit_schema = pa.schema(
        [("b", pa.string()), ("grp", pa.int64()), ("k", pa.int64()),
         ("c", pa.int64()), ("band", pa.int64())]
    )

    def emit(t: pa.Table) -> pa.Table:
        c = np.round(
            t.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        band = c // DELTA
        k = t.column("p_partkey").to_numpy(zero_copy_only=False)
        b = t.column("p_brand").to_numpy(zero_copy_only=False)
        # each row lands in its own band and the next one up: a pair
        # with |diff| <= DELTA differs by at most one band, so the
        # group at max(b_i, b_j) contains both rows exactly once
        return pa.Table.from_pydict(
            {"b": pa.array(np.concatenate([b, b]), pa.string()),
             "grp": pa.array(np.concatenate([band, band + 1]), pa.int64()),
             "k": pa.array(np.concatenate([k, k]), pa.int64()),
             "c": pa.array(np.concatenate([c, c]), pa.int64()),
             "band": pa.array(np.concatenate([band, band]), pa.int64())},
            schema=emit_schema,
        )

    cnt_schema = pa.schema([("brand", pa.string()), ("n_pairs", pa.int64())])

    def pair_count(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return cnt_schema.empty_table()
        out: dict[str, int] = {}
        for (brand, grp), g in df.groupby(["b", "grp"], sort=False):
            m = len(g)
            if m < 2:
                continue
            cs = g["c"].to_numpy()
            bd = g["band"].to_numpy()
            ii, jj = np.triu_indices(m, 1)
            ok = (
                (np.abs(cs[ii] - cs[jj]) <= DELTA)
                & (np.maximum(bd[ii], bd[jj]) == grp)
            )
            n = int(ok.sum())
            if n:
                out[brand] = out.get(brand, 0) + n
        if not out:
            return cnt_schema.empty_table()
        return pa.Table.from_pydict(
            {"brand": list(out), "n_pairs": list(out.values())},
            schema=cnt_schema,
        )

    partials = coarse_partition_apply(
        ds.map_batches(emit, batch_format="pyarrow"),
        ["b", "grp"], pair_count, cnt_schema,
    )

    def brand_sum(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return cnt_schema.empty_table()
        agg = df.groupby("brand", sort=False)["n_pairs"].sum().reset_index()
        return pa.Table.from_pandas(
            agg, schema=cnt_schema, preserve_index=False
        )

    return coarse_partition_apply(partials, ["brand"], brand_sum, cnt_schema)


SQL_PRICE_BAND_JOIN = """
WITH p AS (
  SELECT p_partkey AS k, p_brand AS b,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
)
SELECT p1.b AS brand, CAST(count(*) AS BIGINT) AS n_pairs
FROM p p1 JOIN p p2
  ON p1.b = p2.b AND p1.k < p2.k AND abs(p1.c - p2.c) <= 100
GROUP BY 1
"""

QUERIES["price_band_join"] = q_price_band_join
ORACLE_SQL["price_band_join"] = SQL_PRICE_BAND_JOIN


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): orders whose total line
    quantity exceeds 250, with their date and price — the
    aggregate-then-semi-join pattern where the fact table filters
    ITSELF through a grouped threshold before touching the dimension.

    Scale shape: per-block (orderkey, qty) partial sums BEFORE the one
    orderkey shuffle (combiner — hot orders fold early); the surviving
    key set is threshold-bounded and attaches to orders via ONE more
    cogroup, never a driver collect. Quantities are integer-valued
    doubles → exact int64 sums."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    THRESH = 250
    li = rd.read_parquet(_p(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])
    part_schema = pa.schema([("k", pa.int64()), ("q", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("l_quantity", "sum")])
        return pa.Table.from_pydict(
            {"k": pc.cast(g.column("l_orderkey"), pa.int64()),
             "q": pc.cast(pc.round(g.column("l_quantity_sum")), pa.int64())},
            schema=part_schema,
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        agg = df.groupby("k", sort=False)["q"].sum().reset_index()
        agg = agg[agg["q"] > THRESH]
        return pa.Table.from_pandas(agg, schema=part_schema,
                                    preserve_index=False)

    big = coarse_partition_apply(
        li.map_batches(partial, batch_format="pyarrow"),
        ["k"], fold, part_schema,
    )
    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderdate", pa.string()),
         ("o_totalprice", pa.float64()), ("total_qty", pa.int64())]
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
             "o_orderdate": pc.strftime(t.column("o_orderdate"), "%Y-%m-%d"),
             "o_totalprice": t.column("o_totalprice")},
        )

    return coarse_attach(
        orders.map_batches(fmt, batch_format="pyarrow"), big,
        left_key="o_orderkey", right_key="k",
        attach_cols=["q"], attach_as=["total_qty"], out_schema=out_schema,
        how="inner",
    )


SQL_LARGE_ORDERS = """
WITH big AS (
  SELECT l_orderkey AS k,
         CAST(round(sum(l_quantity)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1
  HAVING CAST(round(sum(l_quantity)) AS BIGINT) > 250
)
SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice, big.q AS total_qty
FROM orders o JOIN big ON big.k = o.o_orderkey
"""


def q_waiting_customers(sf_dir: str):
    """TPC-H Q22 shape (waiting customers): per market segment, the
    count and total balance of customers whose account balance exceeds
    the mean POSITIVE balance of the segment family AND who have placed
    no order since 2001-06-01 (the "lapsed but well-funded" cohort) —
    the global-scalar-broadcast + anti-join composition.

    Scale shape: the mean threshold folds from per-block (Σ cents, n)
    integer partials (two driver scalars, exact); the filtered
    customers anti-join orders via the distributed coarse_anti_join
    (probe keys per-block distinct-ed, never driver-resident); money
    rides as int64 cents with one trailing /100.0."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_anti_join,
        coarse_partition_apply,
    )

    SEGS = ("AUTOMOBILE", "BUILDING")
    cust = rd.read_parquet(
        _p(sf_dir, "customer"),
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    ).map_batches(
        lambda t: t.filter(pc.is_in(
            t.column("c_mktsegment"), value_set=pa.array(list(SEGS)))),
        batch_format="pyarrow",
    ).materialize()

    def bal_parts(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("c_acctbal"), 0.0))
        cents = np.round(
            pos.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {"s": [int(cents.sum())], "n": [len(cents)]},
        )

    parts = cust.map_batches(bal_parts, batch_format="pyarrow").take_all()
    tot = sum(r["s"] for r in parts)
    n = sum(r["n"] for r in parts)
    avg_cents = float(tot) / float(n) if n else 0.0

    rich_schema = pa.schema(
        [("c_custkey", pa.int64()), ("seg", pa.string()),
         ("cents", pa.int64())]
    )

    def rich(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keep = cents.astype(np.float64) > avg_cents
        return pa.Table.from_pydict(
            {"c_custkey": pc.cast(t.column("c_custkey"), pa.int64())
                .to_numpy(zero_copy_only=False)[keep],
             "seg": t.column("c_mktsegment")
                .to_numpy(zero_copy_only=False)[keep],
             "cents": cents[keep]},
            schema=rich_schema,
        )

    import datetime as dt

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_custkey"],
        filter=(pc.field("o_orderdate")
                >= pa.scalar(dt.datetime(2001, 6, 1))),
    )
    waiting = coarse_anti_join(
        cust.map_batches(rich, batch_format="pyarrow"), orders,
        left_key="c_custkey", right_key="o_custkey",
        out_schema=rich_schema,
    )
    out_schema = pa.schema(
        [("mktsegment", pa.string()), ("n_waiting", pa.int64()),
         ("total_bal", pa.float64())]
    )

    def seg_agg(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("seg", sort=False)["cents"].agg(["count", "sum"])
        agg = agg.reset_index()
        return pa.Table.from_pydict(
            {"mktsegment": agg["seg"].to_numpy(),
             "n_waiting": agg["count"].to_numpy().astype(np.int64),
             "total_bal": agg["sum"].to_numpy().astype(np.int64) / 100.0},
            schema=out_schema,
        )

    return coarse_partition_apply(waiting, ["seg"], seg_agg, out_schema)


SQL_WAITING_CUSTOMERS = """
WITH fam AS (
  SELECT c_custkey, c_mktsegment AS seg,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
),
avgc AS (
  SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS a
  FROM fam WHERE cents > 0
),
w AS (
  SELECT * FROM fam
  WHERE CAST(cents AS DOUBLE) > (SELECT a FROM avgc)
    AND c_custkey NOT IN (SELECT o_custkey FROM orders
                          WHERE o_orderdate >= TIMESTAMP '2001-06-01')
)
SELECT seg AS mktsegment, CAST(count(*) AS BIGINT) AS n_waiting,
       CAST(sum(cents) AS BIGINT) / 100.0 AS total_bal
FROM w GROUP BY 1
"""

QUERIES["large_orders"] = q_large_orders
ORACLE_SQL["large_orders"] = SQL_LARGE_ORDERS
QUERIES["waiting_customers"] = q_waiting_customers
ORACLE_SQL["waiting_customers"] = SQL_WAITING_CUSTOMERS


def q_embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION moment statistics of the embedding column — the
    feature-scaling pass (mean/variance per dim) embedding pipelines
    run before quantization or whitening. Determinism: components are
    quantized to int64 micro-units with the repo's floor(x·1e6 + 0.5)
    idiom (identical floor on both engines, valid for negatives), so
    Σ and Σ² fold as EXACT integers in any order; mean and variance
    are two trailing double expressions from those integers.

    Scale shape: one stateless pass emitting per-BLOCK (dim, n, Σ, Σ²)
    partial vectors (64 rows per block, never row-count-sized), then
    one dim-keyed fold — the dimension axis is schema-bounded. int64
    bound: |x| ≤ ~1 → Σ² ≤ 1e12·rows, safe to ~9e6 rows per... the
    FULL corpus Σ² is what matters: safe to ~9·10⁶ billion-row
    corpora at unit scale (documented; multiply in float would lose
    exactness first)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["embedding"])
    part_schema = pa.schema(
        [("dim", pa.int64()), ("n", pa.int64()), ("s", pa.int64()),
         ("ss", pa.int64())]
    )

    def parts(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        if t.num_rows == 0:
            return part_schema.empty_table()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        d = len(flat) // t.num_rows
        m = flat.reshape(t.num_rows, d)
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        return pa.Table.from_pydict(
            {"dim": np.arange(1, d + 1, dtype=np.int64),
             "n": np.full(d, t.num_rows, dtype=np.int64),
             "s": q.sum(axis=0),
             "ss": (q * q).sum(axis=0)},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("dim", pa.int64()), ("n", pa.int64()), ("sum_q", pa.int64()),
         ("sum_sq", pa.int64()), ("mean", pa.float64()),
         ("variance", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("dim", sort=False).agg(
            n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")
        ).reset_index()
        n = agg["n"].to_numpy().astype(np.float64)
        s = agg["s"].to_numpy().astype(np.float64)
        ss = agg["ss"].to_numpy().astype(np.float64)
        return pa.Table.from_pydict(
            {"dim": agg["dim"].to_numpy(),
             "n": agg["n"].to_numpy().astype(np.int64),
             "sum_q": agg["s"].to_numpy().astype(np.int64),
             "sum_sq": agg["ss"].to_numpy().astype(np.int64),
             "mean": s / n,
             "variance": (ss - s * s / n) / n},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ds.map_batches(parts, batch_format="pyarrow"),
        ["dim"], fold, out_schema,
    )


SQL_EMBEDDING_DIM_STATS = """
WITH flat AS (
  SELECT i.i AS dim,
         CAST(floor(CAST(embedding[i.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings,
       (SELECT unnest(generate_series(1, 64)) AS i) i
),
agg AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(q * q) AS BIGINT) AS ss
  FROM flat GROUP BY 1
)
SELECT dim, n, s AS sum_q, ss AS sum_sq,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       (CAST(ss AS DOUBLE)
        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       / CAST(n AS DOUBLE) AS variance
FROM agg
"""

QUERIES["embedding_dim_stats"] = q_embedding_dim_stats
ORACLE_SQL["embedding_dim_stats"] = SQL_EMBEDDING_DIM_STATS


def q_dedup_cluster_hist(sf_dir: str):
    """Near-dup CLUSTER-SIZE histogram: (cluster size → number of
    MinHash-LSH clusters of that size) — the one-glance shape of the
    corpus's duplication structure (a heavy tail of big clusters means
    a template/mirror problem; all-1s means clean). One cluster pass,
    then two bounded aggregations: per-block (cluster, n) combiners →
    one coarse size fold → per-block (size, n) combiners → one
    size-DOMAIN-bounded fold. Sizes never collect per-doc rows to the
    driver."""
    import pandas as pd

    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = read_docs(sf_dir, ["doc_id", "text"])
    clusters = minhash_lsh_clusters(docs, threshold=0.6)

    size_schema = pa.schema([("cluster", pa.string()), ("n", pa.int64())])

    def size_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["cluster"]).aggregate([("cluster", "count")])
        return pa.Table.from_pydict(
            {"cluster": pc.cast(g.column("cluster"), pa.string()),
             "n": pc.cast(g.column("cluster_count"), pa.int64())},
            schema=size_schema,
        )

    def size_fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return size_schema.empty_table()
        agg = df.groupby("cluster", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=size_schema,
                                    preserve_index=False)

    sizes = coarse_partition_apply(
        clusters.map_batches(size_partial, batch_format="pyarrow"),
        ["cluster"], size_fold, size_schema,
    )
    out_schema = pa.schema(
        [("cluster_size", pa.int64()), ("n_clusters", pa.int64())]
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["n"]).aggregate([("n", "count")])
        return pa.Table.from_pydict(
            {"cluster_size": pc.cast(g.column("n"), pa.int64()),
             "n_clusters": pc.cast(g.column("n_count"), pa.int64())},
            schema=out_schema,
        )

    def hist_fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("cluster_size", sort=False)["n_clusters"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=out_schema,
                                    preserve_index=False)

    return coarse_partition_apply(
        sizes.map_batches(hist_partial, batch_format="pyarrow"),
        ["cluster_size"], hist_fold, out_schema,
    )


def _sql_dedup_cluster_hist() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_minhash_clusters,
    )

    inner = sql_minhash_clusters(threshold=0.6)
    return f"""
WITH cl AS ({inner}),
sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n FROM cl GROUP BY 1)
SELECT n AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY 1
"""


def q_tokenizer_fertility(sf_dir: str):
    """Per-language TOKENIZER FERTILITY (tokens per character) — the
    multilinguality dashboard number that decides per-language sampling
    budgets (a language whose fertility is 2× pays 2× the context). Two
    exact integer sums per language (regex token count, n_chars) folded
    from per-block partials over the language DOMAIN, one trailing
    divide."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = read_docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    part_schema = pa.schema(
        [("lang", pa.string()), ("toks", pa.int64()), ("chars", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        ntok = pc.count_substring_regex(t.column("text"), pattern=r"\w+")
        t2 = pa.Table.from_pydict(
            {"lang": t.column("lang"),
             "toks": pc.cast(ntok, pa.int64()),
             "chars": pc.cast(t.column("n_chars"), pa.int64())},
        )
        g = t2.group_by(["lang"]).aggregate([("toks", "sum"), ("chars", "sum")])
        return pa.Table.from_pydict(
            {"lang": g.column("lang"),
             "toks": pc.cast(g.column("toks_sum"), pa.int64()),
             "chars": pc.cast(g.column("chars_sum"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("lang", pa.string()), ("total_tokens", pa.int64()),
         ("total_chars", pa.int64()), ("fertility", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("lang", sort=False).agg(
            toks=("toks", "sum"), chars=("chars", "sum")
        ).reset_index()
        return pa.Table.from_pydict(
            {"lang": agg["lang"].to_numpy(),
             "total_tokens": agg["toks"].to_numpy().astype(np.int64),
             "total_chars": agg["chars"].to_numpy().astype(np.int64),
             "fertility": agg["toks"].to_numpy().astype(np.float64)
                          / agg["chars"].to_numpy().astype(np.float64)},
            schema=out_schema,
        )

    return coarse_partition_apply(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang"], fold, out_schema,
    )


SQL_TOKENIZER_FERTILITY = r"""
SELECT lang,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS DOUBLE)
         / CAST(sum(n_chars) AS DOUBLE) AS fertility
FROM documents GROUP BY 1
"""

QUERIES["dedup_cluster_hist"] = q_dedup_cluster_hist
ORACLE_SQL["dedup_cluster_hist"] = _sql_dedup_cluster_hist()
QUERIES["tokenizer_fertility"] = q_tokenizer_fertility
ORACLE_SQL["tokenizer_fertility"] = SQL_TOKENIZER_FERTILITY


def q_zipf_slope(sf_dir: str):
    """Per-source ZIPF SLOPE: the least-squares slope of ln(freq) over
    ln(rank) across the source's word frequency spectrum — natural text
    sits near −1; templated/boilerplate sources flatten toward 0, and a
    crawler stuck in a loop spikes steep. The companion diagnostic to
    entropy_by_source, sharing its FP-determinism contract: all four
    regression sums fold in RANK order on both sides (np.cumsum left
    fold == DuckDB list_sum over a rank-ORDERED list — the bm25/entropy
    pinning idiom), rank is row_number over the exact (n DESC, w) tie
    rule, ln is the one shared libm, and the slope is ONE mirrored
    double expression from the four sums, floor(x·1e6+0.5)-rounded to
    6dp on both sides (numpy's SIMD log and libm ln agree to well
    inside a ULP budget that 6dp absorbs — the entropy_by_source
    contract).

    Scale shape: per-block (source, word, n) Arrow count combiners →
    ONE coarse shuffle keyed by source (vocabulary-bounded); the
    per-partition fold is one sort + four cumsums per source."""
    import pandas as pd

    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    part_schema = pa.schema(
        [("source", pa.string()), ("w", pa.string()), ("n", pa.int64())]
    )

    def wc(t: pa.Table) -> pa.Table:
        srcs, words = [], []
        for s, txt in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            for w in tokenize((txt or "").lower()):
                srcs.append(s)
                words.append(w)
        if not srcs:
            return part_schema.empty_table()
        g = pa.Table.from_pydict(
            {"source": pa.array(srcs, pa.string()),
             "w": pa.array(words, pa.string())}
        ).group_by(["source", "w"]).aggregate([("w", "count")])
        return pa.Table.from_pydict(
            {"source": g.column("source"), "w": g.column("w"),
             "n": pc.cast(g.column("w_count"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("source", pa.string()), ("vocab", pa.int64()),
         ("slope", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["source", "w"], sort=False)["n"].sum().reset_index()
        srcs, vocabs, slopes = [], [], []
        for src, g in agg.groupby("source", sort=False):
            g = g.sort_values(["n", "w"], ascending=[False, True],
                              kind="mergesort")
            n = g["n"].to_numpy().astype(np.float64)
            v = len(n)
            if v < 2:
                continue
            x = np.log(np.arange(1, v + 1, dtype=np.float64))
            y = np.log(n)
            sx = np.cumsum(x)[-1]
            sy = np.cumsum(y)[-1]
            sxy = np.cumsum(x * y)[-1]
            sxx = np.cumsum(x * x)[-1]
            srcs.append(src)
            vocabs.append(v)
            raw = (v * sxy - sx * sy) / (v * sxx - sx * sx)
            slopes.append(np.floor(raw * 1e6 + 0.5) / 1e6)
        if not srcs:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {"source": srcs,
             "vocab": pa.array(vocabs, pa.int64()),
             "slope": pa.array(slopes, pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ds.map_batches(wc, batch_format="pyarrow"),
        ["source"], fold, out_schema,
    )


SQL_ZIPF_SLOPE = r"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '\w+(?:''\w+)?')) AS w
  FROM documents
),
counts AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
),
ranked AS (
  SELECT source, w, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, w) AS r
  FROM counts
),
sums AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS v,
         list_sum(list(ln(CAST(r AS DOUBLE)) ORDER BY r)) AS sx,
         list_sum(list(ln(CAST(n AS DOUBLE)) ORDER BY r)) AS sy,
         list_sum(list(ln(CAST(r AS DOUBLE)) * ln(CAST(n AS DOUBLE))
                       ORDER BY r)) AS sxy,
         list_sum(list(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))
                       ORDER BY r)) AS sxx
  FROM ranked GROUP BY 1
)
SELECT source, v AS vocab,
       floor((v * sxy - sx * sy) / (v * sxx - sx * sx) * 1000000 + 0.5)
         / 1000000 AS slope
FROM sums WHERE v >= 2
"""

QUERIES["zipf_slope"] = q_zipf_slope
ORACLE_SQL["zipf_slope"] = SQL_ZIPF_SLOPE


def q_kg_degree_hist(sf_dir: str):
    """KG DEGREE DISTRIBUTION histogram: nodes bucketed by
    ⌊log2(undirected simple degree)⌋ — the is-it-scale-free one-glance
    plot (a straight log-log decay = power law; a spike = a gazetteer
    artifact). Buckets from the same libm log2 double on both sides
    (bit-identical on exact int inputs); counts exact. One degree pass
    (per-block combiners → one node-keyed fold), then a
    bucket-DOMAIN-bounded fold."""
    import pandas as pd

    from semantic_search_system_ray.pipelines.kg_build import (
        edges_from_triples,
    )
    from semantic_search_system_ray.stages.graph import (
        _simple_degrees,
        undirected_simple_edges,
    )
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    from __ray_entry__ import _kg_triples  # registered pipeline source

    und = undirected_simple_edges(
        edges_from_triples(_kg_triples(sf_dir)), src_col="src", dst_col="dst"
    ).materialize()
    deg = _simple_degrees(und, None)
    out_schema = pa.schema([("bucket", pa.int64()), ("n_nodes", pa.int64())])

    def bucketize(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(np.log2(d)).astype(np.int64)  # deg >= 1 always
        g = pa.Table.from_pydict({"bucket": pa.array(b, pa.int64())})
        agg = g.group_by(["bucket"]).aggregate([("bucket", "count")])
        return pa.Table.from_pydict(
            {"bucket": pc.cast(agg.column("bucket"), pa.int64()),
             "n_nodes": pc.cast(agg.column("bucket_count"), pa.int64())},
            schema=out_schema,
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("bucket", sort=False)["n_nodes"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=out_schema,
                                    preserve_index=False)

    return coarse_partition_apply(
        deg.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], fold, out_schema,
    )


def _sql_kg_degree_hist() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_kg_triples,
    )

    from __ray_entry__ import (
        TESTDATA_GAZETTEER,
        TESTDATA_PHRASE_LIST,
        TESTDATA_TAXONOMY,
    )

    triples = sql_kg_triples(
        TESTDATA_GAZETTEER, TESTDATA_TAXONOMY, TESTDATA_PHRASE_LIST
    )
    return f"""
WITH t AS ({triples}),
e0 AS (SELECT CAST(subj AS VARCHAR) AS s, CAST(obj AS VARCHAR) AS d
       FROM t WHERE CAST(subj AS VARCHAR) <> CAST(obj AS VARCHAR)),
e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
sym AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1)
SELECT CAST(floor(log2(CAST(deg AS DOUBLE))) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1
"""


def q_user_event_entropy(sf_dir: str):
    """Per-USER event-type Shannon entropy — the behavioral-diversity
    feature (one-trick users near 0, explorers near ln |types|) at
    CORPUS-cardinality keys (millions of users), unlike
    entropy_by_source's bounded domain. Same FP contract: the Σ over
    types folds in SORTED type order on both sides, ln is the shared
    libm, result floor(x·1e6+0.5)-rounded. One user-keyed coarse
    cogroup; per-partition fold is vectorized (type domain bounded, so
    the per-user loop is a pandas groupby over ≤|types| rows each)."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ev = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["user_id", "event_type"])
    part_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")]
        )
        return pa.Table.from_pydict(
            {"user_id": pc.cast(g.column("user_id"), pa.int64()),
             "event_type": g.column("event_type"),
             "n": pc.cast(g.column("event_type_count"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()),
         ("entropy", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = (
            df.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum().reset_index()
            .sort_values(["user_id", "event_type"], kind="mergesort")
        )
        uids, totals, ents = [], [], []
        for uid, g in agg.groupby("user_id", sort=False):
            n = g["n"].to_numpy().astype(np.float64)
            nn = int(n.sum())
            s = np.cumsum(n * np.log(n))[-1]  # left fold in type order
            h = np.log(float(nn)) - s / float(nn)
            uids.append(uid)
            totals.append(nn)
            ents.append(np.floor(h * 1e6 + 0.5) / 1e6)
        return pa.Table.from_pydict(
            {"user_id": pa.array(uids, pa.int64()),
             "n_events": pa.array(totals, pa.int64()),
             "entropy": pa.array(ents, pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], fold, out_schema,
    )


SQL_USER_EVENT_ENTROPY = """
WITH wc AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nn FROM wc GROUP BY 1),
s AS (
  SELECT user_id,
         list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                       ORDER BY event_type)) AS sw
  FROM wc GROUP BY 1
)
SELECT t.user_id, t.nn AS n_events,
       floor((ln(CAST(t.nn AS DOUBLE)) - s.sw / CAST(t.nn AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS entropy
FROM tot t JOIN s ON s.user_id = t.user_id
"""

QUERIES["kg_degree_hist"] = q_kg_degree_hist
ORACLE_SQL["kg_degree_hist"] = _sql_kg_degree_hist()
QUERIES["user_event_entropy"] = q_user_event_entropy
ORACLE_SQL["user_event_entropy"] = SQL_USER_EVENT_ENTROPY


def q_bpe_pair_counts(sf_dir: str):
    """One BPE MERGE ROUND's candidate table: corpus-wide counts of
    adjacent character pairs inside words, weighted by word frequency —
    the argmax of this table IS the next byte-pair merge a tokenizer
    trainer would take (Sennrich 2016), so the top-20 with the exact
    (count DESC, pair) tie rule is the deterministic training
    primitive. Tokenization is byte-identical to the
    zipf/entropy/minhash family (functions.text.tokenize == the shared
    regex).

    Scale shape: per-block (word, n) count combiners, pair extraction
    per DISTINCT word (vocabulary-bounded per block, weighted by n, so
    gram work never scales with token count), per-block (pair, cnt)
    partials → one pair-keyed coarse fold (pair domain ≤ alphabet² —
    tiny) → bounded driver sort for the top-20."""
    import pandas as pd

    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])
    pair_schema = pa.schema([("pair", pa.string()), ("cnt", pa.int64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        wc: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            for w in tokenize((txt or "").lower()):
                wc[w] = wc.get(w, 0) + 1
        pc_: dict[str, int] = {}
        for w, n in wc.items():
            for i in range(len(w) - 1):
                p = w[i:i + 2]
                pc_[p] = pc_.get(p, 0) + n
        if not pc_:
            return pair_schema.empty_table()
        return pa.Table.from_pydict(
            {"pair": list(pc_), "cnt": list(pc_.values())},
            schema=pair_schema,
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pair_schema.empty_table()
        agg = df.groupby("pair", sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=pair_schema,
                                    preserve_index=False)

    folded = coarse_partition_apply(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["pair"], fold, pair_schema,
    )
    rows = sorted(
        ((r["pair"], r["cnt"]) for r in folded.take_all()),
        key=lambda x: (-x[1], x[0]),
    )[:20]
    return pa.Table.from_pydict(
        {"pair": pa.array([r[0] for r in rows], pa.string()),
         "cnt": pa.array([r[1] for r in rows], pa.int64())},
        schema=pair_schema,
    )


SQL_BPE_PAIR_COUNTS = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\w+(?:''\w+)?')) AS w
  FROM documents
),
wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
exploded AS (
  SELECT w, n, unnest(generate_series(1, len(w) - 1)) AS i
  FROM wc WHERE len(w) >= 2
),
agg AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair,
         CAST(sum(n) AS BIGINT) AS cnt
  FROM exploded GROUP BY 1
)
SELECT pair, cnt FROM agg ORDER BY cnt DESC, pair LIMIT 20
"""

QUERIES["bpe_pair_counts"] = q_bpe_pair_counts
ORACLE_SQL["bpe_pair_counts"] = SQL_BPE_PAIR_COUNTS


def q_hapax_ratio(sf_dir: str):
    """Per-source HAPAX LEGOMENA ratio: the share of the source's
    vocabulary occurring exactly once — the classic lexical-richness /
    OCR-noise signal (clean natural text runs ~0.4–0.6; template spam
    collapses toward 0, OCR garbage explodes toward 1). Exact integers
    end to end, one trailing divide. Same tokenization and scale shape
    as entropy_by_source / zipf_slope: per-block (source, word, n)
    combiners → ONE source-keyed coarse fold over the vocabulary."""
    import pandas as pd

    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])
    part_schema = pa.schema(
        [("source", pa.string()), ("w", pa.string()), ("n", pa.int64())]
    )

    def wc(t: pa.Table) -> pa.Table:
        srcs, words = [], []
        for s, txt in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            for w in tokenize((txt or "").lower()):
                srcs.append(s)
                words.append(w)
        if not srcs:
            return part_schema.empty_table()
        g = pa.Table.from_pydict(
            {"source": pa.array(srcs, pa.string()),
             "w": pa.array(words, pa.string())}
        ).group_by(["source", "w"]).aggregate([("w", "count")])
        return pa.Table.from_pydict(
            {"source": g.column("source"), "w": g.column("w"),
             "n": pc.cast(g.column("w_count"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("source", pa.string()), ("vocab", pa.int64()),
         ("hapax", pa.int64()), ("hapax_ratio", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["source", "w"], sort=False)["n"].sum().reset_index()
        rows = []
        for src, g in agg.groupby("source", sort=False):
            v = len(g)
            h = int((g["n"].to_numpy() == 1).sum())
            rows.append((src, v, h, float(h) / float(v)))
        return pa.Table.from_pydict(
            {"source": [r[0] for r in rows],
             "vocab": pa.array([r[1] for r in rows], pa.int64()),
             "hapax": pa.array([r[2] for r in rows], pa.int64()),
             "hapax_ratio": pa.array([r[3] for r in rows], pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ds.map_batches(wc, batch_format="pyarrow"),
        ["source"], fold, out_schema,
    )


SQL_HAPAX_RATIO = r"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '\w+(?:''\w+)?')) AS w
  FROM documents
),
wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n
       FROM toks GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS hapax_ratio
FROM wc GROUP BY 1
"""


def q_cross_lang_dups(sf_dir: str):
    """CROSS-LANGUAGE near-duplication report: MinHash cluster members
    whose language differs from their cluster representative's — the
    translation-leak / copy-with-lang-mislabel signal an eval-decontam
    pass checks (same-content-different-lang pairs inflate multilingual
    eval scores). Reuses the one minhash cluster pass; two lang
    attaches (doc's and representative's) via coarse_attach; output
    per (member_lang, rep_lang) pair counts with member_lang <>
    rep_lang. Lang domain bounded → tiny fold."""
    import pandas as pd

    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    docs = read_docs(sf_dir, ["doc_id", "text", "lang"]).materialize()
    clusters = minhash_lsh_clusters(
        docs.select_columns(["doc_id", "text"]), threshold=0.6
    )
    langs = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"d": pc.cast(t.column("doc_id"), pa.string()),
             "lang": t.column("lang")},
        ),
        batch_format="pyarrow",
    ).materialize()

    s1 = pa.schema([("doc_id", pa.string()), ("cluster", pa.string()),
                    ("member_lang", pa.string())])
    withm = coarse_attach(
        clusters, langs, left_key="doc_id", right_key="d",
        attach_cols=["lang"], attach_as=["member_lang"], out_schema=s1,
        how="inner",
    )
    s2 = pa.schema([("doc_id", pa.string()), ("cluster", pa.string()),
                    ("member_lang", pa.string()), ("rep_lang", pa.string())])
    withr = coarse_attach(
        withm, langs, left_key="cluster", right_key="d",
        attach_cols=["lang"], attach_as=["rep_lang"], out_schema=s2,
        how="inner",
    )
    out_schema = pa.schema(
        [("member_lang", pa.string()), ("rep_lang", pa.string()),
         ("n_docs", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t.column("member_lang"),
                                  t.column("rep_lang")))
        g = f.group_by(["member_lang", "rep_lang"]).aggregate(
            [("doc_id", "count")]
        )
        return pa.Table.from_pydict(
            {"member_lang": g.column("member_lang"),
             "rep_lang": g.column("rep_lang"),
             "n_docs": pc.cast(g.column("doc_id_count"), pa.int64())},
            schema=out_schema,
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["member_lang", "rep_lang"], sort=False)[
            "n_docs"].sum().reset_index()
        return pa.Table.from_pandas(agg, schema=out_schema,
                                    preserve_index=False)

    return coarse_partition_apply(
        withr.map_batches(partial, batch_format="pyarrow"),
        ["member_lang", "rep_lang"], fold, out_schema,
    )


def _sql_cross_lang_dups() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_minhash_clusters,
    )

    inner = sql_minhash_clusters(threshold=0.6)
    return f"""
WITH cl AS ({inner})
SELECT dm.lang AS member_lang, dr.lang AS rep_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM cl
JOIN documents dm ON CAST(dm.doc_id AS VARCHAR) = cl.doc_id
JOIN documents dr ON CAST(dr.doc_id AS VARCHAR) = cl.cluster
WHERE dm.lang <> dr.lang
GROUP BY 1, 2
"""

QUERIES["hapax_ratio"] = q_hapax_ratio
ORACLE_SQL["hapax_ratio"] = SQL_HAPAX_RATIO
QUERIES["cross_lang_dups"] = q_cross_lang_dups
ORACLE_SQL["cross_lang_dups"] = _sql_cross_lang_dups()


def q_doc_len_quantiles(sf_dir: str):
    """Per-LANGUAGE document-length quantiles (p25/p50/p90 of n_chars)
    — the curation length-profile that decides per-language chunking
    and Gopher length bounds. Composes the bounded-cardinality grouped
    histogram (length domain ≈ hundreds of distinct values regardless
    of corpus size — the ship_lag_quantiles machinery) with the exact
    quantile_disc rank rule: per-block (lang, n_chars) count combiners
    → one domain-bounded groupby → driver cum-scan per language."""
    from semantic_search_system_ray.stages.sketch import _quantile_rank

    docs = rd.read_parquet(_p(sf_dir, "documents"),
                           columns=["lang", "n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.Table.from_pydict(
            {"lang": g.column("lang"),
             "len": pc.cast(g.column("n_chars"), pa.int64()),
             "n": pc.cast(g.column("n_chars_count"), pa.int64())},
        )

    rows = (
        docs.map_batches(hist, batch_format="pyarrow")
        .groupby(["lang", "len"]).sum("n")
        .take_all()  # langs × length domain — bounded
    )
    by_l: dict = {}
    for r in rows:
        by_l.setdefault(r["lang"], []).append((int(r["len"]), int(r["sum(n)"])))
    QS = [0.25, 0.5, 0.9]
    out = {"lang": [], "q": [], "n_chars": []}
    for lang in sorted(by_l):
        cells = sorted(by_l[lang])
        vals = np.array([v for v, _n in cells], dtype=np.int64)
        cnts = np.array([n for _v, n in cells], dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        for q in QS:
            idx = int(np.searchsorted(cum, _quantile_rank(q, n), side="left"))
            out["lang"].append(lang)
            out["q"].append(q)
            out["n_chars"].append(int(vals[idx]))
    return pa.Table.from_pydict(
        {"lang": pa.array(out["lang"], pa.string()),
         "q": pa.array(out["q"], pa.float64()),
         "n_chars": pa.array(out["n_chars"], pa.int64())},
    )


SQL_DOC_LEN_QUANTILES = """
SELECT lang,
       unnest([0.25, 0.5, 0.9]) AS q,
       unnest(quantile_disc(CAST(n_chars AS BIGINT), [0.25, 0.5, 0.9]))
         AS n_chars
FROM documents GROUP BY lang
"""

QUERIES["doc_len_quantiles"] = q_doc_len_quantiles
ORACLE_SQL["doc_len_quantiles"] = SQL_DOC_LEN_QUANTILES


def q_numeric_density(sf_dir: str):
    """Per-source NUMERIC DENSITY profile: total digit characters vs
    total characters, plus the count of numeric-heavy docs (digit share
    > 30%, decided by the exact integer cross-multiply 10·digits >
    3·chars — no per-doc float) — the tables/price-list/boilerplate
    detector quality pipelines pair with the Gopher rules. Digit counts
    are RE2 `[0-9]` matches on both engines; everything is int64 until
    the one trailing density divide. Per-block (source, …) partial sums
    → one domain-bounded fold."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = rd.read_parquet(_p(sf_dir, "documents"),
                           columns=["source", "text", "n_chars"])
    part_schema = pa.schema(
        [("source", pa.string()), ("docs", pa.int64()),
         ("digits", pa.int64()), ("chars", pa.int64()),
         ("heavy", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        dg = pc.cast(
            pc.count_substring_regex(t.column("text"), pattern="[0-9]"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        ch = pc.cast(t.column("n_chars"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        heavy = (10 * dg > 3 * ch).astype(np.int64)
        df = pd.DataFrame({
            "source": t.column("source").to_numpy(zero_copy_only=False),
            "digits": dg, "chars": ch, "heavy": heavy,
        })
        agg = df.groupby("source", sort=False).agg(
            docs=("digits", "size"), digits=("digits", "sum"),
            chars=("chars", "sum"), heavy=("heavy", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(
            agg[["source", "docs", "digits", "chars", "heavy"]],
            schema=part_schema, preserve_index=False,
        )

    out_schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("total_digits", pa.int64()), ("total_chars", pa.int64()),
         ("n_numeric_heavy", pa.int64()), ("density", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("source", sort=False).agg(
            docs=("docs", "sum"), digits=("digits", "sum"),
            chars=("chars", "sum"), heavy=("heavy", "sum"),
        ).reset_index()
        return pa.Table.from_pydict(
            {"source": agg["source"].to_numpy(),
             "n_docs": agg["docs"].to_numpy().astype(np.int64),
             "total_digits": agg["digits"].to_numpy().astype(np.int64),
             "total_chars": agg["chars"].to_numpy().astype(np.int64),
             "n_numeric_heavy": agg["heavy"].to_numpy().astype(np.int64),
             "density": agg["digits"].to_numpy().astype(np.float64)
                        / agg["chars"].to_numpy().astype(np.float64)},
            schema=out_schema,
        )

    return coarse_partition_apply(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], fold, out_schema,
    )


SQL_NUMERIC_DENSITY = """
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits,
         CAST(n_chars AS BIGINT) AS chars
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(digits) AS BIGINT) AS total_digits,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN 10 * digits > 3 * chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_numeric_heavy,
       CAST(sum(digits) AS DOUBLE) / CAST(sum(chars) AS DOUBLE) AS density
FROM d GROUP BY 1
"""

QUERIES["numeric_density"] = q_numeric_density
ORACLE_SQL["numeric_density"] = SQL_NUMERIC_DENSITY

# --------------------------------------------------------------------------
# TPC-H Q7/Q9/Q10 join shapes over the driver's tables (round-4 widening)
# --------------------------------------------------------------------------

def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape — BILATERAL trade volume: revenue shipped between
    every (supplier nation, customer nation) pair per ship YEAR in the
    1996-1997 window, cross-nation flows only. The three-strategy join
    plan of local_supplier_volume, reused verbatim:

    - nation (≤25 rows) collapses to a driver dict broadcast by closure;
    - lineitem ⋈ orders (fact-fact) is ONE coarse cogroup on orderkey,
      with the ship-date filter pushed to the parquet READ and a
      per-block (orderkey, suppkey, year) revenue combiner ahead of the
      shuffle, so only pre-aggregated partials move;
    - customer / supplier nationkey attaches are hash-partitioned
      `coarse_attach` (dimension too big to assume driver-resident at
      100 TB; the helper auto-broadcasts when the side measures small).

    Money rides as scale-4 integers end to end; the single
    bigint→double divide happens at the ≤ 25·25·2-row finish, mirrored
    by the oracle."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    nat = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    nat_name = {int(r["n_nationkey"]): r["n_name"] for _, r in nat.iterrows()}

    import datetime as dt

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(dt.datetime(1996, 1, 1)))
            & (pc.field("l_shipdate") < pa.scalar(dt.datetime(1998, 1, 1)))
        ),
    )
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("supp", pa.int64()), ("yr", pa.int64()),
         ("rev", pa.int64()), ("cust", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        t2 = pa.Table.from_pydict(
            {"key": t.column("l_orderkey"), "supp": t.column("l_suppkey"),
             "yr": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
             "rev": rev}
        )
        agg = t2.group_by(["key", "supp", "yr"]).aggregate([("rev", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("supp"), agg.column("yr"),
             agg.column("rev_sum"), pa.nulls(agg.num_rows, pa.int64())],
            schema=union_schema,
        )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.int64()),
             pa.nulls(t.num_rows, pa.int64()),
             pa.nulls(t.num_rows, pa.int64()), t.column("o_custkey")],
            schema=union_schema,
        )

    combined = li.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    pair_schema = pa.schema(
        [("cust", pa.int64()), ("supp", pa.int64()), ("yr", pa.int64()),
         ("rev_s4", pa.int64())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["cust"].isna()]
        od_rows = df[df["cust"].notna()]
        if li_rows.empty or od_rows.empty:
            return pair_schema.empty_table()
        j = od_rows[["key", "cust"]].merge(
            li_rows[["key", "supp", "yr", "rev"]], on="key", how="inner"
        )
        if j.empty:
            return pair_schema.empty_table()
        agg = (
            j.groupby(["cust", "supp", "yr"], sort=False)["rev"]
            .sum().reset_index()
        )
        return pa.Table.from_pydict(
            {"cust": agg["cust"].astype("int64"),
             "supp": agg["supp"].astype("int64"),
             "yr": agg["yr"].astype("int64"),
             "rev_s4": agg["rev"].astype("int64")},
            schema=pair_schema,
        )

    pairs = coarse_partition_apply(combined, ["key"], cogroup, pair_schema)

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    with_cnat = coarse_attach(
        pairs, cust, left_key="cust", right_key="c_custkey",
        attach_cols=["c_nationkey"],
        out_schema=pa.schema(
            [("supp", pa.int64()), ("yr", pa.int64()), ("rev_s4", pa.int64()),
             ("c_nationkey", pa.int64())]
        ),
        how="inner",
    )
    supp = rd.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    with_snat = coarse_attach(
        with_cnat, supp, left_key="supp", right_key="s_suppkey",
        attach_cols=["s_nationkey"],
        out_schema=pa.schema(
            [("yr", pa.int64()), ("rev_s4", pa.int64()),
             ("c_nationkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
        how="inner",
    )

    part_schema = pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()),
         ("l_year", pa.int64()), ("rev_s4", pa.int64())]
    )

    def to_names(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("c_nationkey"), t.column("s_nationkey"))
        t = t.filter(keep)
        if t.num_rows == 0:
            return part_schema.empty_table()
        sn = pa.array(
            [nat_name[k] for k in t.column("s_nationkey").to_pylist()],
            pa.string(),
        )
        cn = pa.array(
            [nat_name[k] for k in t.column("c_nationkey").to_pylist()],
            pa.string(),
        )
        t2 = pa.Table.from_pydict(
            {"supp_nation": sn, "cust_nation": cn,
             "l_year": t.column("yr"), "rev_s4": t.column("rev_s4")}
        )
        agg = t2.group_by(
            ["supp_nation", "cust_nation", "l_year"]
        ).aggregate([("rev_s4", "sum")])
        return agg.rename_columns(
            ["supp_nation", "cust_nation", "l_year", "rev_s4"]
        )

    out = with_snat.map_batches(to_names, batch_format="pyarrow").groupby(
        ["supp_nation", "cust_nation", "l_year"]
    ).aggregate(Sum("rev_s4", alias_name="rev_sum"))

    def finish(t: pa.Table) -> pa.Table:
        cents = np.floor_divide(
            t.column("rev_sum").to_numpy(zero_copy_only=False) + 50, 100
        )
        return pa.Table.from_pydict(
            {"supp_nation": t.column("supp_nation"),
             "cust_nation": t.column("cust_nation"),
             "l_year": t.column("l_year"),
             "revenue": pa.array(cents.astype(np.float64) / 100.0,
                                 pa.float64())}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_NATION_TRADE_VOLUME = """
WITH j AS (
  SELECT s_nationkey, c_nationkey,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_s4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND s_nationkey <> c_nationkey
)
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, l_year,
       CAST((sum(rev_s4) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM j
JOIN nation ns ON j.s_nationkey = ns.n_nationkey
JOIN nation nc ON j.c_nationkey = nc.n_nationkey
GROUP BY 1, 2, 3
"""

QUERIES["nation_trade_volume"] = q_nation_trade_volume
ORACLE_SQL["nation_trade_volume"] = SQL_NATION_TRADE_VOLUME


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape — top-20 customers by revenue lost to RETURNED
    items in 1995-Q4 orders. Plan: the return-flag AND order-date
    filters are pushed to the parquet READS; a bloom built from the
    quarter's order keys prunes lineitem partials before the ONE
    fact-fact cogroup on orderkey (Q5's sideways pass — the quarter
    keeps ~1/28 of orders, so most R-partials never shuffle); customer
    revenue folds through per-block combiners + one groupby; the top-20
    finish is per-block local top-k → a ≤ 20·blocks driver fold
    (deterministic tie rule revenue DESC, custkey ASC); the 20 winners'
    names attach from a key-pruned customer read + the ≤25-row nation
    dict. Money rides scale-4 ints until the final divide."""
    import datetime as dt

    import pandas as pd

    from semantic_search_system_ray.stages.bloomjoin import (
        bloom_prefilter,
        build_bloom,
    )
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(dt.datetime(1995, 10, 1)))
            & (pc.field("o_orderdate") < pa.scalar(dt.datetime(1996, 1, 1)))
        ),
    )
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("rev", pa.int64()), ("cust", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        t2 = pa.Table.from_pydict(
            {"key": t.column("l_orderkey"), "rev": rev}
        )
        agg = t2.group_by(["key"]).aggregate([("rev", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("rev_sum"),
             pa.nulls(agg.num_rows, pa.int64())],
            schema=union_schema,
        )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.int64()),
             t.column("o_custkey")],
            schema=union_schema,
        )

    bloom_ref = build_bloom(orders, "o_orderkey")
    li_pruned = bloom_prefilter(
        li.map_batches(li_partial, batch_format="pyarrow"), "key", bloom_ref
    )
    combined = li_pruned.union(
        orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    cust_schema = pa.schema([("cust", pa.int64()), ("rev_s4", pa.int64())])

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["cust"].isna()]
        od_rows = df[df["cust"].notna()]
        if li_rows.empty or od_rows.empty:
            return cust_schema.empty_table()
        j = od_rows[["key", "cust"]].merge(
            li_rows[["key", "rev"]], on="key", how="inner"
        )
        if j.empty:
            return cust_schema.empty_table()
        agg = j.groupby("cust", sort=False)["rev"].sum().reset_index()
        return pa.Table.from_pydict(
            {"cust": agg["cust"].astype("int64"),
             "rev_s4": agg["rev"].astype("int64")},
            schema=cust_schema,
        )

    per_cust = coarse_partition_apply(
        combined, ["key"], cogroup, cust_schema
    ).groupby("cust").aggregate(Sum("rev_s4", alias_name="rev_sum"))

    K = 20

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas().sort_values(
            ["rev_sum", "cust"], ascending=[False, True], kind="mergesort"
        ).head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    # ≤ K per block reaches the driver — bounded regardless of corpus size
    folded = pa.concat_tables(
        [t for t in ray.get(
            per_cust.map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
    )
    top = folded.to_pandas().sort_values(
        ["rev_sum", "cust"], ascending=[False, True], kind="mergesort"
    ).head(K)
    keys = [int(k) for k in top["cust"]]

    cust_rows = rd.read_parquet(
        _p(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pc.field("c_custkey").isin(keys),
    ).to_pandas()
    nat = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    j = top.merge(cust_rows, left_on="cust", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    cents = np.floor_divide(j["rev_sum"].to_numpy().astype(np.int64) + 50, 100)
    return pa.Table.from_pydict(
        {"c_custkey": pa.array(j["c_custkey"].astype("int64")),
         "c_name": pa.array(j["c_name"], pa.string()),
         "n_name": pa.array(j["n_name"], pa.string()),
         "revenue": pa.array(cents.astype(np.float64) / 100.0, pa.float64())}
    )


SQL_RETURNED_REVENUE = """
WITH rev AS (
  SELECT o_custkey AS cust,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_s4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-10-01'
    AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY 1
),
top AS (
  SELECT cust, rev_s4 FROM rev ORDER BY rev_s4 DESC, cust LIMIT 20
)
SELECT c_custkey, c_name, n_name,
       CAST((rev_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM top
JOIN customer ON cust = c_custkey
JOIN nation ON c_nationkey = n_nationkey
"""

QUERIES["returned_revenue"] = q_returned_revenue
ORACLE_SQL["returned_revenue"] = SQL_RETURNED_REVENUE


def q_product_profit(sf_dir: str):
    """TPC-H Q9 shape — PRODUCT-LINE PROFIT by supplier nation × order
    year for parts whose name contains 'widget': profit = revenue −
    retail cost (the schema has no partsupp, so p_retailprice is the
    cost basis — a faithful Q9 plan over the tables that exist). Plan:
    the part name filter is pushed to the READ and the pruned part side
    attaches by hash (`coarse_attach` auto-broadcasts when it measures
    small); per-row profit lands in ONE scale-4 integer; per-block
    (orderkey, suppkey) combiners pre-shrink the fact side before the
    single fact-fact cogroup with orders (which carries the year);
    supplier nationkey attaches by hash; nation is a driver dict.
    Profit sums may be NEGATIVE (discounted lines sell below retail) —
    the cents finish mirrors DuckDB's `//`, which TRUNCATES toward zero
    on negatives (measured: -7 // 2 = -3), via sign·(|v|//100)."""
    import datetime as dt  # noqa: F401  (parity with sibling shapes)

    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    part = rd.read_parquet(
        _p(sf_dir, "part"), columns=["p_partkey", "p_retailprice"],
        filter=pc.match_substring(pc.field("p_name"), "widget"),
    )
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    with_part = coarse_attach(
        li, part, left_key="l_partkey", right_key="p_partkey",
        attach_cols=["p_retailprice"],
        out_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
             ("l_discount", pa.float64()), ("p_retailprice", pa.float64())]
        ),
        how="inner",
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("supp", pa.int64()), ("profit", pa.int64()),
         ("cust_yr", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        retail_c = pc.cast(pc.round(pc.multiply(t.column("p_retailprice"),
                                                pa.scalar(100.0))), pa.int64())
        qty = pc.cast(pc.round(t.column("l_quantity")), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        cost = pc.multiply(pc.multiply(retail_c, qty),
                           pa.scalar(100, pa.int64()))
        profit = pc.subtract(rev, cost)
        t2 = pa.Table.from_pydict(
            {"key": t.column("l_orderkey"), "supp": t.column("l_suppkey"),
             "profit": profit}
        )
        agg = t2.group_by(["key", "supp"]).aggregate([("profit", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("supp"),
             agg.column("profit_sum"), pa.nulls(agg.num_rows, pa.int64())],
            schema=union_schema,
        )

    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.int64()),
             pa.nulls(t.num_rows, pa.int64()),
             pc.cast(pc.year(t.column("o_orderdate")), pa.int64())],
            schema=union_schema,
        )

    combined = with_part.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    pair_schema = pa.schema(
        [("supp", pa.int64()), ("o_year", pa.int64()),
         ("profit_s4", pa.int64())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["cust_yr"].isna()]
        od_rows = df[df["cust_yr"].notna()]
        if li_rows.empty or od_rows.empty:
            return pair_schema.empty_table()
        j = od_rows[["key", "cust_yr"]].merge(
            li_rows[["key", "supp", "profit"]], on="key", how="inner"
        )
        if j.empty:
            return pair_schema.empty_table()
        agg = (
            j.groupby(["supp", "cust_yr"], sort=False)["profit"]
            .sum().reset_index()
        )
        return pa.Table.from_pydict(
            {"supp": agg["supp"].astype("int64"),
             "o_year": agg["cust_yr"].astype("int64"),
             "profit_s4": agg["profit"].astype("int64")},
            schema=pair_schema,
        )

    pairs = coarse_partition_apply(combined, ["key"], cogroup, pair_schema)

    supp = rd.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    with_snat = coarse_attach(
        pairs, supp, left_key="supp", right_key="s_suppkey",
        attach_cols=["s_nationkey"],
        out_schema=pa.schema(
            [("o_year", pa.int64()), ("profit_s4", pa.int64()),
             ("s_nationkey", pa.int64())]
        ),
        how="inner",
    )

    nat = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    nat_name = {int(r["n_nationkey"]): r["n_name"] for _, r in nat.iterrows()}
    part_schema2 = pa.schema(
        [("n_name", pa.string()), ("o_year", pa.int64()),
         ("profit_s4", pa.int64())]
    )

    def to_names(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema2.empty_table()
        names = pa.array(
            [nat_name[k] for k in t.column("s_nationkey").to_pylist()],
            pa.string(),
        )
        t2 = pa.Table.from_pydict(
            {"n_name": names, "o_year": t.column("o_year"),
             "profit_s4": t.column("profit_s4")}
        )
        agg = t2.group_by(["n_name", "o_year"]).aggregate(
            [("profit_s4", "sum")]
        )
        return agg.rename_columns(["n_name", "o_year", "profit_s4"])

    out = with_snat.map_batches(to_names, batch_format="pyarrow").groupby(
        ["n_name", "o_year"]
    ).aggregate(Sum("profit_s4", alias_name="profit_sum"))

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("profit_sum").to_numpy(zero_copy_only=False) + 50
        cents = np.sign(v) * (np.abs(v) // 100)  # trunc == DuckDB //
        return pa.Table.from_pydict(
            {"n_name": t.column("n_name"),
             "o_year": t.column("o_year"),
             "profit": pa.array(cents.astype(np.float64) / 100.0,
                                pa.float64())}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_PRODUCT_PROFIT = """
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS retail_c
  FROM part WHERE p_name LIKE '%widget%'
),
l AS (
  SELECT l_orderkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))
         - retail_c * CAST(round(l_quantity) AS BIGINT) * 100 AS profit_s4
  FROM lineitem JOIN p ON l_partkey = p_partkey
),
j AS (
  SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         profit_s4
  FROM l
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, o_year,
       CAST((sum(profit_s4) + 50) // 100 AS DOUBLE) / 100.0 AS profit
FROM j GROUP BY 1, 2
"""

QUERIES["product_profit"] = q_product_profit
ORACLE_SQL["product_profit"] = SQL_PRODUCT_PROFIT


def q_events_autocorr(sf_dir: str):
    """LAG-k AUTOCORRELATION (k = 1..3) of the DAILY event-count series
    over the dense [min_day, max_day] calendar grid (missing days count
    0 — the gap convention events_daily_gapfill pins) — the seasonality
    probe a pipeline runs before picking retraining cadence. Exactness
    contract: the series is INTEGER counts, so all five regression sums
    (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64 on both engines; r is
    ONE mirrored double expression — num / sqrt(A·B) with A, B the
    integer variance terms cast to double BEFORE the product (int64·
    int64 could overflow at petabyte-scale daily counts; the double
    product can't), floor(x·1e6+0.5)-rounded to 6dp. Zero-variance
    lags drop on both sides. Scale shape: per-block (day, n) Arrow
    count combiners → one calendar-bounded groupby → a driver fold over
    the day domain (thousands of rows at any corpus size)."""
    import math

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts"])
    part_schema = pa.schema([("day", pa.string()), ("n", pa.int64())])

    def day_counts(t: pa.Table) -> pa.Table:
        d = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        g = pa.Table.from_pydict({"day": d}).group_by(["day"]).aggregate(
            [("day", "count")]
        )
        return pa.Table.from_pydict(
            {"day": g.column("day"),
             "n": pc.cast(g.column("day_count"), pa.int64())},
            schema=part_schema,
        )

    rows = (
        ds.map_batches(day_counts, batch_format="pyarrow")
        .groupby("day").sum("n")
        .take_all()  # calendar-bounded
    )
    import datetime as dt

    by_day = {
        dt.date.fromisoformat(r["day"]).toordinal(): int(r["sum(n)"])
        for r in rows
    }
    lo, hi = min(by_day), max(by_day)
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    for o, n in by_day.items():
        c[o - lo] = n

    out = {"lag": [], "n_pairs": [], "r": []}
    for k in (1, 2, 3):
        if len(c) <= k:
            continue
        x, y = c[:-k], c[k:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        a_var = n * sxx - sx * sx
        b_var = n * syy - sy * sy
        if a_var <= 0 or b_var <= 0:
            continue
        num = float(n * sxy - sx * sy)
        den = math.sqrt(float(a_var) * float(b_var))
        out["lag"].append(k)
        out["n_pairs"].append(n)
        out["r"].append(math.floor(num / den * 1e6 + 0.5) / 1e6)
    return pa.Table.from_pydict(
        {"lag": pa.array(out["lag"], pa.int64()),
         "n_pairs": pa.array(out["n_pairs"], pa.int64()),
         "r": pa.array(out["r"], pa.float64())}
    )


SQL_EVENTS_AUTOCORR = """
WITH days AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM days),
grid AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
dense AS (
  SELECT COALESCE(d.c, 0) AS c,
         row_number() OVER (ORDER BY g.day) AS i
  FROM grid g LEFT JOIN days d ON d.day = g.day
),
lags AS (SELECT unnest([1, 2, 3]) AS lag),
pairs AS (
  SELECT l.lag, a.c AS x, b.c AS y
  FROM lags l
  JOIN dense a ON TRUE
  JOIN dense b ON b.i = a.i + l.lag
),
sums AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       floor(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                    * CAST(n_pairs * syy - sy * sy AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS r
FROM sums
WHERE n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
"""

QUERIES["events_autocorr"] = q_events_autocorr
ORACLE_SQL["events_autocorr"] = SQL_EVENTS_AUTOCORR


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — SHIPPING PRIORITY: the 10 highest-revenue
    unshipped BUILDING-segment orders as of 1998-01-01 (order placed
    before the date, some lineitem ships after it). Plan: the segment
    filter prunes customer AT THE READ and attaches by hash to the
    date-filtered orders (inner — non-BUILDING orders drop before the
    fact-fact join); a bloom built from surviving order keys prunes the
    ship-date-filtered lineitem partials before the ONE cogroup on
    orderkey; the top-10 finish is per-block local top-k → a bounded
    driver fold (revenue DESC, orderkey ASC — total order). Money rides
    scale-4 ints until the final divide; dates stringify identically on
    both engines."""
    import datetime as dt

    import pandas as pd

    from semantic_search_system_ray.stages.bloomjoin import (
        bloom_prefilter,
        build_bloom,
    )
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    D = dt.datetime(1998, 1, 1)
    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    )
    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < pa.scalar(D),
    )

    def orders_narrow(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"o_orderkey": t.column("o_orderkey"),
             "o_custkey": t.column("o_custkey"),
             "o_orderdate": pc.strftime(t.column("o_orderdate"),
                                        format="%Y-%m-%d"),
             "o_orderpriority": t.column("o_orderpriority")}
        )

    bld_orders = coarse_attach(
        orders.map_batches(orders_narrow, batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.Table.from_pydict(
                {"c_custkey": t.column("c_custkey"),
                 "one": pa.nulls(t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize(),  # restore the size estimate → broadcast plan
        left_key="o_custkey", right_key="c_custkey", attach_cols=["one"],
        out_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.string()),
             ("o_orderpriority", pa.string()), ("one", pa.int64())]
        ),
        how="inner",
    ).materialize()  # consumed twice: bloom build + the cogroup union

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pa.scalar(D),
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("rev", pa.int64()), ("odate", pa.string()),
         ("oprio", pa.string())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        agg = pa.Table.from_pydict(
            {"key": t.column("l_orderkey"), "rev": rev}
        ).group_by(["key"]).aggregate([("rev", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("rev_sum"),
             pa.nulls(agg.num_rows, pa.string()),
             pa.nulls(agg.num_rows, pa.string())],
            schema=union_schema,
        )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.int64()),
             t.column("o_orderdate"), t.column("o_orderpriority")],
            schema=union_schema,
        )

    bloom_ref = build_bloom(bld_orders, "o_orderkey")
    li_pruned = bloom_prefilter(
        li.map_batches(li_partial, batch_format="pyarrow"), "key", bloom_ref
    )
    combined = li_pruned.union(
        bld_orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    ord_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("rev_s4", pa.int64()),
         ("o_orderdate", pa.string()), ("o_orderpriority", pa.string())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["odate"].isna()]
        od_rows = df[df["odate"].notna()]
        if li_rows.empty or od_rows.empty:
            return ord_schema.empty_table()
        j = od_rows[["key", "odate", "oprio"]].merge(
            li_rows[["key", "rev"]], on="key", how="inner"
        )
        if j.empty:
            return ord_schema.empty_table()
        agg = (
            j.groupby(["key", "odate", "oprio"], sort=False)["rev"]
            .sum().reset_index()
        )
        return pa.Table.from_pydict(
            {"o_orderkey": agg["key"].astype("int64"),
             "rev_s4": agg["rev"].astype("int64"),
             "o_orderdate": agg["odate"], "o_orderpriority": agg["oprio"]},
            schema=ord_schema,
        )

    per_order = coarse_partition_apply(combined, ["key"], cogroup, ord_schema)

    K = 10

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas().sort_values(
            ["rev_s4", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        ).head(K)
        return pa.Table.from_pandas(df, schema=t.schema, preserve_index=False)

    folded = pa.concat_tables(
        [t for t in ray.get(
            per_order.map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
    )
    top = folded.to_pandas().sort_values(
        ["rev_s4", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(K)
    cents = np.floor_divide(top["rev_s4"].to_numpy().astype(np.int64) + 50,
                            100)
    return pa.Table.from_pydict(
        {"o_orderkey": pa.array(top["o_orderkey"].astype("int64")),
         "revenue": pa.array(cents.astype(np.float64) / 100.0, pa.float64()),
         "o_orderdate": pa.array(top["o_orderdate"], pa.string()),
         "o_orderpriority": pa.array(top["o_orderpriority"], pa.string())}
    )


SQL_SHIPPING_PRIORITY = """
WITH j AS (
  SELECT o_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_s4,
         strftime(min(o_orderdate), '%Y-%m-%d') AS o_orderdate,
         min(o_orderpriority) AS o_orderpriority
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT o_orderkey,
       CAST((rev_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       o_orderdate, o_orderpriority
FROM j ORDER BY rev_s4 DESC, o_orderkey LIMIT 10
"""

QUERIES["shipping_priority"] = q_shipping_priority
ORACLE_SQL["shipping_priority"] = SQL_SHIPPING_PRIORITY


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape — NATIONAL MARKET SHARE: among 1996-1997 orders
    placed by ASIA-region customers for 'widget' parts, the yearly
    revenue share supplied by the lexicographically first ASIA nation
    (a deterministic stand-in for Q8's parameter). Reuses the Q7/Q9
    machinery end to end: part filter pushed to the read + inner hash
    attach, per-block (orderkey, suppkey) revenue combiners, ONE
    fact-fact cogroup with the date-filtered orders (which carry the
    year), customer attach pruned to ASIA nationkeys AT THE READ,
    supplier attach, ≤ 2-row finish. Share = national / total from two
    exact int64 sums, floor(x·1e6+0.5)-rounded — the single FP op."""
    import datetime as dt

    import pandas as pd

    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    nat = rd.read_parquet(_p(sf_dir, "nation")).to_pandas()
    reg = rd.read_parquet(_p(sf_dir, "region")).to_pandas()
    asia_regs = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    asia = nat[nat["n_regionkey"].isin(asia_regs)]
    asia_keys = sorted(int(k) for k in asia["n_nationkey"])
    target_key = int(
        asia.sort_values("n_name", kind="mergesort")["n_nationkey"].iloc[0]
    )

    part = rd.read_parquet(
        _p(sf_dir, "part"), columns=["p_partkey"],
        filter=pc.match_substring(pc.field("p_name"), "widget"),
    )
    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )
    with_part = coarse_attach(
        li, part.map_batches(
            lambda t: pa.Table.from_pydict(
                {"p_partkey": t.column("p_partkey"),
                 "one": pa.nulls(t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize(),  # mapped side loses its size estimate: without
        # this the attach takes the shuffle plan and the FACT side moves
        left_key="l_partkey", right_key="p_partkey", attach_cols=["one"],
        out_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
             ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
             ("one", pa.int64())]
        ),
        how="inner",
    )

    union_schema = pa.schema(
        [("key", pa.int64()), ("supp", pa.int64()), ("rev", pa.int64()),
         ("cust", pa.int64()), ("yr", pa.int64())]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        agg = pa.Table.from_pydict(
            {"key": t.column("l_orderkey"), "supp": t.column("l_suppkey"),
             "rev": rev}
        ).group_by(["key", "supp"]).aggregate([("rev", "sum")])
        return pa.Table.from_arrays(
            [agg.column("key"), agg.column("supp"), agg.column("rev_sum"),
             pa.nulls(agg.num_rows, pa.int64()),
             pa.nulls(agg.num_rows, pa.int64())],
            schema=union_schema,
        )

    orders = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(dt.datetime(1996, 1, 1)))
            & (pc.field("o_orderdate") < pa.scalar(dt.datetime(1998, 1, 1)))
        ),
    )

    def orders_tag(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("o_orderkey"), pa.nulls(t.num_rows, pa.int64()),
             pa.nulls(t.num_rows, pa.int64()), t.column("o_custkey"),
             pc.cast(pc.year(t.column("o_orderdate")), pa.int64())],
            schema=union_schema,
        )

    combined = with_part.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(orders_tag, batch_format="pyarrow")
    )
    pair_schema = pa.schema(
        [("cust", pa.int64()), ("supp", pa.int64()), ("yr", pa.int64()),
         ("rev_s4", pa.int64())]
    )

    def cogroup(df: pd.DataFrame) -> pa.Table:
        li_rows = df[df["cust"].isna()]
        od_rows = df[df["cust"].notna()]
        if li_rows.empty or od_rows.empty:
            return pair_schema.empty_table()
        j = od_rows[["key", "cust", "yr"]].merge(
            li_rows[["key", "supp", "rev"]], on="key", how="inner"
        )
        if j.empty:
            return pair_schema.empty_table()
        agg = (
            j.groupby(["cust", "supp", "yr"], sort=False)["rev"]
            .sum().reset_index()
        )
        return pa.Table.from_pydict(
            {"cust": agg["cust"].astype("int64"),
             "supp": agg["supp"].astype("int64"),
             "yr": agg["yr"].astype("int64"),
             "rev_s4": agg["rev"].astype("int64")},
            schema=pair_schema,
        )

    pairs = coarse_partition_apply(combined, ["key"], cogroup, pair_schema)

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey"],
        filter=pc.field("c_nationkey").isin(asia_keys),
    )
    with_cust = coarse_attach(
        pairs, cust.map_batches(
            lambda t: pa.Table.from_pydict(
                {"c_custkey": t.column("c_custkey"),
                 "one": pa.nulls(t.num_rows, pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize(),  # restore the size estimate → broadcast plan
        left_key="cust", right_key="c_custkey", attach_cols=["one"],
        out_schema=pa.schema(
            [("supp", pa.int64()), ("yr", pa.int64()), ("rev_s4", pa.int64()),
             ("one", pa.int64())]
        ),
        how="inner",
    )
    supp = rd.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    )
    with_snat = coarse_attach(
        with_cust, supp, left_key="supp", right_key="s_suppkey",
        attach_cols=["s_nationkey"],
        out_schema=pa.schema(
            [("yr", pa.int64()), ("rev_s4", pa.int64()),
             ("s_nationkey", pa.int64())]
        ),
        how="inner",
    )

    part_schema2 = pa.schema(
        [("o_year", pa.int64()), ("nat_s4", pa.int64()),
         ("tot_s4", pa.int64())]
    )

    def shares_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema2.empty_table()
        is_nat = pc.cast(
            pc.equal(t.column("s_nationkey"),
                     pa.scalar(target_key, pa.int64())),
            pa.int64(),
        )
        t2 = pa.Table.from_pydict(
            {"o_year": t.column("yr"),
             "nat_s4": pc.multiply(t.column("rev_s4"), is_nat),
             "tot_s4": t.column("rev_s4")}
        )
        agg = t2.group_by(["o_year"]).aggregate(
            [("nat_s4", "sum"), ("tot_s4", "sum")]
        )
        return agg.rename_columns(["o_year", "nat_s4", "tot_s4"])

    out = with_snat.map_batches(
        shares_partial, batch_format="pyarrow"
    ).groupby("o_year").aggregate(
        Sum("nat_s4", alias_name="nat_sum"), Sum("tot_s4", alias_name="tot_sum")
    )

    def finish(t: pa.Table) -> pa.Table:
        nat_f = t.column("nat_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        tot_f = t.column("tot_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        share = np.floor(nat_f / tot_f * 1e6 + 0.5) / 1e6
        return pa.Table.from_pydict(
            {"o_year": t.column("o_year"),
             "mkt_share": pa.array(share, pa.float64())}
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_MARKET_SHARE = """
WITH asia AS (
  SELECT n_nationkey, n_name FROM nation
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
target AS (SELECT min_by(n_nationkey, n_name) AS k FROM asia),
j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         s_nationkey,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_s4
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_name LIKE '%widget%'
    AND c_nationkey IN (SELECT n_nationkey FROM asia)
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       floor(CAST(sum(CASE WHEN s_nationkey = (SELECT k FROM target)
                           THEN rev_s4 ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_s4) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS mkt_share
FROM j GROUP BY 1
"""

QUERIES["market_share"] = q_market_share
ORACLE_SQL["market_share"] = SQL_MARKET_SHARE


def q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape — PROMO revenue share for the 1997-09 ship
    month: 100 × revenue from PROMO-type parts / total revenue. The
    ship-month filter is pushed to the lineitem READ; p_type attaches
    by hash (inner); both sums ride ONE pass of per-block conditional
    int64 combiners; the finish is two exact bigints → one mirrored
    divide, floor(x·1e6+0.5)-rounded."""
    import datetime as dt

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(dt.datetime(1997, 9, 1)))
            & (pc.field("l_shipdate") < pa.scalar(dt.datetime(1997, 10, 1)))
        ),
    )
    part = rd.read_parquet(_p(sf_dir, "part"), columns=["p_partkey", "p_type"])

    from semantic_search_system_ray.stages.util import coarse_attach

    with_type = coarse_attach(
        li, part, left_key="l_partkey", right_key="p_partkey",
        attach_cols=["p_type"],
        out_schema=pa.schema(
            [("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
             ("p_type", pa.string())]
        ),
        how="inner",
    )

    part_schema = pa.schema(
        [("promo_s4", pa.int64()), ("tot_s4", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_h))
        is_promo = pc.cast(pc.equal(t.column("p_type"), "PROMO"), pa.int64())
        return pa.Table.from_pydict(
            {"promo_s4": pa.array(
                [pc.sum(pc.multiply(rev, is_promo)).as_py() or 0], pa.int64()
            ),
             "tot_s4": pa.array([pc.sum(rev).as_py() or 0], pa.int64())},
            schema=part_schema,
        )

    sums = with_type.map_batches(partial, batch_format="pyarrow").take_all()
    promo = sum(int(r["promo_s4"]) for r in sums)
    tot = sum(int(r["tot_s4"]) for r in sums)
    share = (
        np.floor(100.0 * float(promo) / float(tot) * 1e6 + 0.5) / 1e6
        if tot else 0.0
    )
    return pa.Table.from_pydict(
        {"promo_share": pa.array([share], pa.float64())}
    )


SQL_PROMO_REVENUE_SHARE = """
WITH j AS (
  SELECT p_type,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_s4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT floor(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_s4
                                   ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_s4) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS promo_share
FROM j
"""

QUERIES["promo_revenue_share"] = q_promo_revenue_share
ORACLE_SQL["promo_revenue_share"] = SQL_PROMO_REVENUE_SHARE


def q_length_gini(sf_dir: str):
    """Per-source GINI COEFFICIENT of document lengths — the
    inequality-of-contribution dashboard number that flags sources
    where a few giant documents dominate the token budget (the
    complement of doc_len_quantiles). Exactness: G = (2·Σ i·x_(i)) /
    (n·Σx) − (n+1)/n needs the rank-weighted sum, which is invariant to
    rank assignment WITHIN equal lengths — so the engine computes it
    from the bounded (source, len, count) histogram (per run of c equal
    values after cum docs d: Σ ranks = c·(2d+c+1)/2, exact int64) while
    the SQL twin uses row_number; both reduce to the same three
    integers per source, then ONE mirrored double expression,
    floor(x·1e6+0.5)-rounded. Scale shape: per-block histogram
    combiners → one length-domain-bounded groupby → driver fold over
    (sources × length domain)."""
    docs = rd.read_parquet(_p(sf_dir, "documents"),
                           columns=["source", "n_chars"])
    part_schema = pa.schema(
        [("source", pa.string()), ("len", pa.int64()), ("n", pa.int64())]
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "n_chars"]).aggregate(
            [("n_chars", "count")]
        )
        return pa.Table.from_pydict(
            {"source": g.column("source"),
             "len": pc.cast(g.column("n_chars"), pa.int64()),
             "n": pc.cast(g.column("n_chars_count"), pa.int64())},
            schema=part_schema,
        )

    rows = (
        docs.map_batches(hist, batch_format="pyarrow")
        .groupby(["source", "len"]).sum("n")
        .take_all()  # sources × length domain — bounded
    )
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (int(r["len"]), int(r["sum(n)"]))
        )
    out = {"source": [], "n_docs": [], "total_chars": [], "gini": []}
    for src in sorted(by_src):
        cells = sorted(by_src[src])
        n = sum(c for _v, c in cells)
        sx = sum(v * c for v, c in cells)
        if n == 0 or sx == 0:
            continue
        rank_sum = 0  # Σ i·x_(i), exact
        d = 0
        for v, c in cells:
            rank_sum += v * (c * (2 * d + c + 1) // 2)
            d += c
        g = 2.0 * float(rank_sum) / (float(n) * float(sx)) \
            - (float(n) + 1.0) / float(n)
        out["source"].append(src)
        out["n_docs"].append(n)
        out["total_chars"].append(sx)
        out["gini"].append(np.floor(g * 1e6 + 0.5) / 1e6)
    return pa.Table.from_pydict(
        {"source": pa.array(out["source"], pa.string()),
         "n_docs": pa.array(out["n_docs"], pa.int64()),
         "total_chars": pa.array(out["total_chars"], pa.int64()),
         "gini": pa.array(out["gini"], pa.float64())}
    )


SQL_LENGTH_GINI = """
WITH ranked AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         row_number() OVER (PARTITION BY source ORDER BY n_chars)
           AS i
  FROM documents
),
sums AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(i * x) AS BIGINT) AS rank_sum
  FROM ranked GROUP BY 1
)
SELECT source, n AS n_docs, sx AS total_chars,
       floor((2.0 * CAST(rank_sum AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
              - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS gini
FROM sums WHERE n > 0 AND sx > 0
"""

QUERIES["length_gini"] = q_length_gini
ORACLE_SQL["length_gini"] = SQL_LENGTH_GINI


def q_events_burstiness(sf_dir: str):
    """Per-user BURSTINESS (Fano factor) of daily event counts over the
    user's OWN active-day span: F = Var(c)/Mean(c) over the dense
    [first_day, last_day] grid (zero-filled gaps — the same calendar
    convention as events_autocorr). Users with a single active day drop
    (zero variance span). Exactness: per-user (m, Σc, Σc²) are exact
    int64 on both engines — the engine derives the zero-day
    contribution algebraically (zeros add nothing to Σc, Σc²; m comes
    from the date span), the SQL twin materializes the grid; F =
    (m·Σc² − (Σc)²) / (m·Σc) is ONE mirrored double expression,
    floor(x·1e6+0.5)-rounded. Scale shape: per-block (user, day, n)
    combiners → ONE user-keyed coarse cogroup (per-user day counts are
    calendar-bounded); population variance (ddof 0)."""
    import datetime as dt

    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["user_id", "ts"])
    part_schema = pa.schema(
        [("user_id", pa.string()), ("day", pa.string()), ("n", pa.int64())]
    )

    def day_counts(t: pa.Table) -> pa.Table:
        d = pc.strftime(t.column("ts"), format="%Y-%m-%d")
        g = pa.Table.from_pydict(
            {"user_id": pc.cast(t.column("user_id"), pa.string()), "day": d}
        ).group_by(["user_id", "day"]).aggregate([("day", "count")])
        return pa.Table.from_pydict(
            {"user_id": g.column("user_id"), "day": g.column("day"),
             "n": pc.cast(g.column("day_count"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("user_id", pa.string()), ("active_days", pa.int64()),
         ("span_days", pa.int64()), ("fano", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["user_id", "day"], sort=False)["n"].sum()
        agg = agg.reset_index()
        agg["ord"] = agg["day"].map(
            lambda s: dt.date.fromisoformat(s).toordinal()
        )
        rows = {"user_id": [], "active_days": [], "span_days": [],
                "fano": []}
        for uid, g in agg.groupby("user_id", sort=False):
            m = int(g["ord"].max() - g["ord"].min()) + 1
            if m < 2:
                continue  # single-day span: zero-variance denominator
            c = g["n"].to_numpy().astype(np.int64)
            sc = int(c.sum())
            sc2 = int((c * c).sum())
            fano = float(m * sc2 - sc * sc) / float(m * sc)
            rows["user_id"].append(uid)
            rows["active_days"].append(len(c))
            rows["span_days"].append(m)
            rows["fano"].append(np.floor(fano * 1e6 + 0.5) / 1e6)
        if not rows["user_id"]:
            return out_schema.empty_table()
        return pa.Table.from_pydict(
            {"user_id": pa.array(rows["user_id"], pa.string()),
             "active_days": pa.array(rows["active_days"], pa.int64()),
             "span_days": pa.array(rows["span_days"], pa.int64()),
             "fano": pa.array(rows["fano"], pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ds.map_batches(day_counts, batch_format="pyarrow"),
        ["user_id"], fold, out_schema,
    )


SQL_EVENTS_BURSTINESS = """
WITH days AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(day) AS lo, max(day) AS hi,
         CAST(count(*) AS BIGINT) AS active_days
  FROM days GROUP BY 1
),
grid AS (
  SELECT s.user_id,
         CAST(unnest(generate_series(CAST(s.lo AS TIMESTAMP),
                                     CAST(s.hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans s
),
dense AS (
  SELECT g.user_id, COALESCE(d.c, 0) AS c
  FROM grid g LEFT JOIN days d
    ON d.user_id = g.user_id AND d.day = g.day
),
sums AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS sc2
  FROM dense GROUP BY 1
)
SELECT s.user_id, sp.active_days, s.m AS span_days,
       floor(CAST(s.m * s.sc2 - s.sc * s.sc AS DOUBLE)
             / CAST(s.m * s.sc AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS fano
FROM sums s JOIN spans sp ON sp.user_id = s.user_id
WHERE s.m >= 2
"""

QUERIES["events_burstiness"] = q_events_burstiness
ORACLE_SQL["events_burstiness"] = SQL_EVENTS_BURSTINESS


def q_dedup_savings(sf_dir: str):
    """Per-source DEDUP SAVINGS forecast: document/character totals vs
    what survives near-dup deduplication (MinHash-LSH cluster
    representatives = docs whose cluster label is themselves) — the
    storage/compute-budget number a 100 TB curation run is sized by.
    ONE hash attach of the cluster label onto a 3-column pruned
    documents read, per-block (source, …) int64 partial sums → one
    domain-bounded fold; the two ratios are the only FP ops,
    floor(x·1e6+0.5)-rounded."""
    import pandas as pd

    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters
    from semantic_search_system_ray.stages.util import (
        coarse_attach,
        coarse_partition_apply,
    )

    docs = read_docs(sf_dir, ["doc_id", "text", "source", "n_chars"])
    clusters = minhash_lsh_clusters(
        docs.select_columns(["doc_id", "text"]), threshold=0.6
    )
    slim = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": pc.cast(t.column("doc_id"), pa.string()),
             "source": t.column("source"),
             "n_chars": pc.cast(t.column("n_chars"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    with_cl = coarse_attach(
        slim, clusters, left_key="doc_id", right_key="doc_id",
        attach_cols=["cluster"],
        out_schema=pa.schema(
            [("doc_id", pa.string()), ("source", pa.string()),
             ("n_chars", pa.int64()), ("cluster", pa.string())]
        ),
        how="inner",
    )

    part_schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("total_chars", pa.int64()), ("kept_docs", pa.int64()),
         ("kept_chars", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        kept = pc.cast(
            pc.equal(t.column("doc_id"), t.column("cluster")), pa.int64()
        )
        df = pd.DataFrame(
            {"source": t.column("source").to_numpy(zero_copy_only=False),
             "n_chars": t.column("n_chars").to_numpy(zero_copy_only=False),
             "kept": kept.to_numpy(zero_copy_only=False)}
        )
        df["kept_chars"] = df["n_chars"] * df["kept"]
        agg = df.groupby("source", sort=False).agg(
            n_docs=("kept", "size"), total_chars=("n_chars", "sum"),
            kept_docs=("kept", "sum"), kept_chars=("kept_chars", "sum"),
        ).reset_index()
        return pa.Table.from_pydict(
            {"source": agg["source"].to_numpy(),
             "n_docs": agg["n_docs"].to_numpy().astype(np.int64),
             "total_chars": agg["total_chars"].to_numpy().astype(np.int64),
             "kept_docs": agg["kept_docs"].to_numpy().astype(np.int64),
             "kept_chars": agg["kept_chars"].to_numpy().astype(np.int64)},
            schema=part_schema,
        )

    out_schema = pa.schema(
        list(part_schema)
        + [pa.field("doc_keep_rate", pa.float64()),
           pa.field("char_keep_rate", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
            kept_docs=("kept_docs", "sum"), kept_chars=("kept_chars", "sum"),
        ).reset_index()
        dkr = np.floor(
            agg["kept_docs"].to_numpy().astype(np.float64)
            / agg["n_docs"].to_numpy().astype(np.float64) * 1e6 + 0.5
        ) / 1e6
        ckr = np.floor(
            agg["kept_chars"].to_numpy().astype(np.float64)
            / np.maximum(agg["total_chars"].to_numpy(), 1).astype(np.float64)
            * 1e6 + 0.5
        ) / 1e6
        return pa.Table.from_pydict(
            {"source": agg["source"].to_numpy(),
             "n_docs": agg["n_docs"].to_numpy().astype(np.int64),
             "total_chars": agg["total_chars"].to_numpy().astype(np.int64),
             "kept_docs": agg["kept_docs"].to_numpy().astype(np.int64),
             "kept_chars": agg["kept_chars"].to_numpy().astype(np.int64),
             "doc_keep_rate": pa.array(dkr, pa.float64()),
             "char_keep_rate": pa.array(ckr, pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        with_cl.map_batches(partial, batch_format="pyarrow"),
        ["source"], fold, out_schema,
    )


def _sql_dedup_savings() -> str:
    from semantic_search_system_ray.pipelines.text_oracles import (
        sql_minhash_clusters,
    )

    inner = sql_minhash_clusters(threshold=0.6)
    return f"""
WITH cl AS ({inner}),
j AS (
  SELECT d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
         CASE WHEN cl.doc_id = cl.cluster THEN 1 ELSE 0 END AS kept
  FROM cl JOIN documents d ON CAST(d.doc_id AS VARCHAR) = cl.doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(kept) AS BIGINT) AS kept_docs,
       CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars,
       floor(CAST(sum(kept) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS doc_keep_rate,
       floor(CAST(sum(kept * n_chars) AS DOUBLE)
             / CAST(greatest(sum(n_chars), 1) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS char_keep_rate
FROM j GROUP BY 1
"""

QUERIES["dedup_savings"] = q_dedup_savings
ORACLE_SQL["dedup_savings"] = _sql_dedup_savings()


def q_source_share_drift(sf_dir: str):
    """Corpus-MIX DRIFT between two deterministic snapshot halves
    (doc_id parity — the stand-in for consecutive crawl snapshots):
    per-source share of each half in exact integer ppm
    (count·1e6 // half_total) and the absolute drift — the monitoring
    number that pages the crawl team when a source's share moves. One
    streaming pass of per-block (source, parity) count combiners → a
    source-domain-bounded fold; no floats anywhere."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = rd.read_parquet(_p(sf_dir, "documents"),
                           columns=["doc_id", "source"])
    part_schema = pa.schema(
        [("source", pa.string()), ("n_a", pa.int64()), ("n_b", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        par = pc.cast(
            pc.equal(
                pc.bit_wise_and(pc.cast(t.column("doc_id"), pa.int64()),
                                pa.scalar(1, pa.int64())),
                pa.scalar(0, pa.int64()),
            ),
            pa.int64(),
        )
        t2 = pa.Table.from_pydict(
            {"source": t.column("source"), "a": par,
             "b": pc.subtract(pa.scalar(1, pa.int64()), par)}
        )
        g = t2.group_by(["source"]).aggregate([("a", "sum"), ("b", "sum")])
        return pa.Table.from_pydict(
            {"source": g.column("source"),
             "n_a": pc.cast(g.column("a_sum"), pa.int64()),
             "n_b": pc.cast(g.column("b_sum"), pa.int64())},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("source", pa.string()), ("n_a", pa.int64()), ("n_b", pa.int64()),
         ("share_a_ppm", pa.int64()), ("share_b_ppm", pa.int64()),
         ("drift_ppm", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("source", sort=False).agg(
            n_a=("n_a", "sum"), n_b=("n_b", "sum")
        ).reset_index()
        ta = max(int(agg["n_a"].sum()), 1)
        tb = max(int(agg["n_b"].sum()), 1)
        sa = agg["n_a"].to_numpy().astype(np.int64) * 1_000_000 // ta
        sb = agg["n_b"].to_numpy().astype(np.int64) * 1_000_000 // tb
        return pa.Table.from_pydict(
            {"source": agg["source"].to_numpy(),
             "n_a": agg["n_a"].to_numpy().astype(np.int64),
             "n_b": agg["n_b"].to_numpy().astype(np.int64),
             "share_a_ppm": pa.array(sa, pa.int64()),
             "share_b_ppm": pa.array(sb, pa.int64()),
             "drift_ppm": pa.array(np.abs(sa - sb), pa.int64())},
            schema=out_schema,
        )

    # the fold needs BOTH half totals, so it runs as ONE partition over
    # the source-domain-bounded partials (sources ≪ corpus)
    return coarse_partition_apply(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], fold, out_schema, num_partitions=1,
    )


SQL_SOURCE_SHARE_DRIFT = """
WITH halves AS (
  SELECT source,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b
  FROM documents GROUP BY 1
),
tot AS (
  SELECT greatest(sum(n_a), 1) AS ta, greatest(sum(n_b), 1) AS tb
  FROM halves
)
SELECT source, n_a, n_b,
       CAST(n_a * 1000000 // ta AS BIGINT) AS share_a_ppm,
       CAST(n_b * 1000000 // tb AS BIGINT) AS share_b_ppm,
       CAST(abs(n_a * 1000000 // ta - n_b * 1000000 // tb) AS BIGINT)
         AS drift_ppm
FROM halves, tot
"""

QUERIES["source_share_drift"] = q_source_share_drift
ORACLE_SQL["source_share_drift"] = SQL_SOURCE_SHARE_DRIFT


def q_tokenizer_oov_rate(sf_dir: str):
    """Per-source OUT-OF-VOCABULARY rate against the corpus's own
    top-1000 word vocabulary — the coverage check run before freezing a
    tokenizer/vocab for training. Two-phase word counts (per-block
    Arrow combiners → ONE vocabulary-bounded shuffle), exact top-1000
    by (count DESC, word ASC), vocabulary broadcast by closure into a
    stateless vectorized membership pass; per-source totals are exact
    int64 and the rate is integer ppm (oov·1e6 // total) — no floats
    anywhere."""
    import pandas as pd

    from semantic_search_system_ray.functions.text import tokenize
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["source", "text"])

    wc_schema = pa.schema(
        [("source", pa.string()), ("w", pa.string()), ("n", pa.int64())]
    )

    def wc(t: pa.Table) -> pa.Table:
        srcs, words = [], []
        for s, txt in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            for w in tokenize((txt or "").lower()):
                srcs.append(s)
                words.append(w)
        if not srcs:
            return wc_schema.empty_table()
        g = pa.Table.from_pydict(
            {"source": pa.array(srcs, pa.string()),
             "w": pa.array(words, pa.string())}
        ).group_by(["source", "w"]).aggregate([("w", "count")])
        return pa.Table.from_pydict(
            {"source": g.column("source"), "w": g.column("w"),
             "n": pc.cast(g.column("w_count"), pa.int64())},
            schema=wc_schema,
        )

    counts = (
        ds.map_batches(wc, batch_format="pyarrow")
        .groupby(["source", "w"]).sum("n")
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {"source": t.column("source"), "w": t.column("w"),
                 "n": pc.cast(t.column("sum(n)"), pa.int64())},
                schema=wc_schema,
            ),
            batch_format="pyarrow",
        )
        .materialize()  # reused: vocab top-k + per-source folds
    )

    K = 1000
    # global top-K: per-block local top-K over per-block word sums →
    # bounded driver fold (the word domain is source-split here, so fold
    # the (w, n) partials first)
    gw = counts.map_batches(
        lambda t: pa.Table.from_pydict(
            {"w": t.column("w"), "n": t.column("n")}
        ).group_by(["w"]).aggregate([("n", "sum")]),
        batch_format="pyarrow",
    ).groupby("w").sum("n_sum")
    gw_rows = gw.take_all()  # vocabulary-bounded
    vocab_df = pd.DataFrame(
        {"w": [r["w"] for r in gw_rows],
         "n": [int(r["sum(n_sum)"]) for r in gw_rows]}
    ).sort_values(["n", "w"], ascending=[False, True], kind="mergesort")
    vocab = set(vocab_df["w"].head(K))

    out_schema = pa.schema(
        [("source", pa.string()), ("total_tokens", pa.int64()),
         ("oov_tokens", pa.int64()), ("oov_ppm", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby(["source", "w"], sort=False)["n"].sum().reset_index()
        agg["oov"] = (~agg["w"].isin(vocab)).astype(np.int64) * agg["n"]
        g = agg.groupby("source", sort=False).agg(
            total=("n", "sum"), oov=("oov", "sum")
        ).reset_index()
        tot = g["total"].to_numpy().astype(np.int64)
        oov = g["oov"].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {"source": g["source"].to_numpy(),
             "total_tokens": tot, "oov_tokens": oov,
             "oov_ppm": oov * 1_000_000 // np.maximum(tot, 1)},
            schema=out_schema,
        )

    return coarse_partition_apply(counts, ["source"], fold, out_schema)


SQL_TOKENIZER_OOV_RATE = r"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '\w+(?:''\w+)?')) AS w
  FROM documents
),
counts AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1, 2
),
vocab AS (
  SELECT w FROM (
    SELECT w, sum(n) AS n,
           row_number() OVER (ORDER BY sum(n) DESC, w) AS rn
    FROM counts GROUP BY w
  ) WHERE rn <= 1000
),
per AS (
  SELECT c.source, CAST(sum(c.n) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN v.w IS NULL THEN c.n ELSE 0 END) AS BIGINT)
           AS oov_tokens
  FROM counts c LEFT JOIN vocab v ON v.w = c.w
  GROUP BY 1
)
SELECT source, total_tokens, oov_tokens,
       CAST(oov_tokens * 1000000 // greatest(total_tokens, 1) AS BIGINT)
         AS oov_ppm
FROM per
"""

QUERIES["tokenizer_oov_rate"] = q_tokenizer_oov_rate
ORACLE_SQL["tokenizer_oov_rate"] = SQL_TOKENIZER_OOV_RATE


def q_embedding_int8_error(sf_dir: str):
    """INT8-QUANTIZATION error profile of the embeddings table — the
    accuracy-loss audit run before shipping a quantized ANN index
    (reference analogue: the int8 Cohere embedding path, test.py:18-50).
    Quantization rule, identical on both engines: per-vector scale m =
    max|x|; q = clip(floor(127·x/m + 0.5), −127, 127); x̂ = q·m/127
    (floor(x+0.5), NOT round() — numpy rounds half-to-even, DuckDB
    half-away; the floor idiom is the repo's standard). Per-element
    |x−x̂| quantizes to int64 nano-units BEFORE summing, so the
    per-label means are exact associative sums with one trailing
    divide; zero vectors drop on both sides. One streaming vectorized
    pass → per-block (label, n, Σerr, max_err) partials → a
    label-bounded fold."""
    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    ds = rd.read_parquet(_p(sf_dir, "embeddings"),
                         columns=["label", "embedding"])
    part_schema = pa.schema(
        [("label", pa.int64()), ("n_vecs", pa.int64()),
         ("sum_err_nano", pa.int64()), ("max_err_nano", pa.int64()),
         ("dim", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        emb = t.column("embedding").combine_chunks()
        dim = (emb.type.list_size
               if isinstance(emb.type, pa.FixedSizeListType)
               else None)
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        if dim is None:
            lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
            dim = int(lens[0]) if len(lens) else 0
        X = flat.reshape(-1, dim)
        labels = pc.cast(t.column("label"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        m = np.abs(X).max(axis=1)
        keep = m > 0
        X, labels, m = X[keep], labels[keep], m[keep]
        if len(labels) == 0:
            return part_schema.empty_table()
        q = np.clip(np.floor(127.0 * X / m[:, None] + 0.5), -127, 127)
        err = np.abs(X - q * m[:, None] / 127.0)
        err_nano = np.floor(err * 1e9 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {"label": labels, "s": err_nano.sum(axis=1),
             "mx": err_nano.max(axis=1)}
        )
        g = df.groupby("label", sort=False).agg(
            n_vecs=("s", "size"), sum_err_nano=("s", "sum"),
            max_err_nano=("mx", "max"),
        ).reset_index()
        g["dim"] = dim
        return pa.Table.from_pydict(
            {"label": g["label"].astype("int64"),
             "n_vecs": g["n_vecs"].astype("int64"),
             "sum_err_nano": g["sum_err_nano"].astype("int64"),
             "max_err_nano": g["max_err_nano"].astype("int64"),
             "dim": g["dim"].astype("int64")},
            schema=part_schema,
        )

    out_schema = pa.schema(
        [("label", pa.int64()), ("n_vecs", pa.int64()),
         ("mean_abs_err", pa.float64()), ("max_abs_err", pa.float64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        g = df.groupby("label", sort=False).agg(
            n_vecs=("n_vecs", "sum"), s=("sum_err_nano", "sum"),
            mx=("max_err_nano", "max"), dim=("dim", "max"),
        ).reset_index()
        mean = np.floor(
            g["s"].to_numpy().astype(np.float64)
            / (g["n_vecs"].to_numpy() * g["dim"].to_numpy()).astype(
                np.float64
            ) / 1e9 * 1e6 + 0.5
        ) / 1e6
        return pa.Table.from_pydict(
            {"label": g["label"].astype("int64"),
             "n_vecs": g["n_vecs"].astype("int64"),
             "mean_abs_err": pa.array(mean, pa.float64()),
             "max_abs_err": pa.array(
                 np.floor(g["mx"].to_numpy().astype(np.float64) / 1e9 * 1e6
                          + 0.5) / 1e6, pa.float64())},
            schema=out_schema,
        )

    return coarse_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label"], fold, out_schema,
    )


SQL_EMBEDDING_INT8_ERROR = """
WITH el AS (
  SELECT CAST(label AS BIGINT) AS label, vec_id,
         unnest(embedding) AS xf
  FROM embeddings
),
e AS (SELECT label, vec_id, CAST(xf AS DOUBLE) AS x FROM el),
scales AS (
  SELECT vec_id, max(abs(x)) AS m, CAST(count(*) AS BIGINT) AS dim
  FROM e GROUP BY 1
),
errs AS (
  SELECT e.label, e.vec_id, s.dim,
         CAST(floor(abs(e.x
               - greatest(least(floor(127.0 * e.x / s.m + 0.5), 127.0),
                          -127.0) * s.m / 127.0) * 1000000000 + 0.5)
              AS BIGINT) AS err_nano
  FROM e JOIN scales s ON s.vec_id = e.vec_id
  WHERE s.m > 0
),
per_vec AS (
  SELECT label, vec_id, max(dim) AS dim,
         CAST(sum(err_nano) AS BIGINT) AS s,
         CAST(max(err_nano) AS BIGINT) AS mx
  FROM errs GROUP BY 1, 2
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       floor(CAST(sum(s) AS DOUBLE)
             / CAST(sum(dim) AS DOUBLE) / 1000000000 * 1000000 + 0.5)
         / 1000000 AS mean_abs_err,
       floor(CAST(max(mx) AS DOUBLE) / 1000000000 * 1000000 + 0.5)
         / 1000000 AS max_abs_err
FROM per_vec GROUP BY 1
"""

QUERIES["embedding_int8_error"] = q_embedding_int8_error
ORACLE_SQL["embedding_int8_error"] = SQL_EMBEDDING_INT8_ERROR


def q_pii_density_by_source(sf_dir: str):
    """Per-source PII DENSITY profile: hit counts for each PII class
    (email / phone / SSN — the shared textstats.PII_PATTERNS, RE2 on
    both engines) plus hits-per-million-chars — the audit that decides
    which sources need the redaction pass before training. ONE
    streaming pass of vectorized count_substring_regex kernels →
    per-block (source, …) int64 partials → a source-bounded fold;
    density is integer ppm (hits·1e6 // chars)."""
    import pandas as pd

    from semantic_search_system_ray.stages.textstats import PII_PATTERNS
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    docs = rd.read_parquet(_p(sf_dir, "documents"),
                           columns=["source", "text", "n_chars"])
    part_schema = pa.schema(
        [("source", pa.string()), ("chars", pa.int64()),
         ("emails", pa.int64()), ("phones", pa.int64()),
         ("ssns", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        cols = {"source": t.column("source").to_numpy(zero_copy_only=False),
                "chars": pc.cast(t.column("n_chars"), pa.int64()).to_numpy(
                    zero_copy_only=False)}
        for name, (pattern, _tok) in zip(("emails", "phones", "ssns"),
                                         PII_PATTERNS):
            cols[name] = pc.cast(
                pc.count_substring_regex(t.column("text"), pattern=pattern),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(cols)
        agg = df.groupby("source", sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, schema=part_schema,
                                    preserve_index=False)

    out_schema = pa.schema(
        [("source", pa.string()), ("total_chars", pa.int64()),
         ("emails", pa.int64()), ("phones", pa.int64()),
         ("ssns", pa.int64()), ("pii_ppm", pa.int64())]
    )

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("source", sort=False).sum().reset_index()
        hits = (agg["emails"] + agg["phones"] + agg["ssns"]).to_numpy()
        chars = agg["chars"].to_numpy().astype(np.int64)
        return pa.Table.from_pydict(
            {"source": agg["source"].to_numpy(),
             "total_chars": chars,
             "emails": agg["emails"].to_numpy().astype(np.int64),
             "phones": agg["phones"].to_numpy().astype(np.int64),
             "ssns": agg["ssns"].to_numpy().astype(np.int64),
             "pii_ppm": hits.astype(np.int64) * 1_000_000
                        // np.maximum(chars, 1)},
            schema=out_schema,
        )

    return coarse_partition_apply(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], fold, out_schema,
    )


def _sql_pii_density_by_source() -> str:
    from semantic_search_system_ray.stages.textstats import PII_PATTERNS

    exprs = []
    for name, (pattern, _tok) in zip(("emails", "phones", "ssns"),
                                     PII_PATTERNS):
        esc = pattern.replace("'", "''")
        exprs.append(
            f"CAST(sum(len(regexp_extract_all(text, '{esc}'))) AS BIGINT)"
            f" AS {name}"
        )
    cols = ",\n       ".join(exprs)
    return f"""
SELECT source, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       {cols},
       CAST((sum(len(regexp_extract_all(text,
              '{PII_PATTERNS[0][0].replace("'", "''")}')))
           + sum(len(regexp_extract_all(text,
              '{PII_PATTERNS[1][0].replace("'", "''")}')))
           + sum(len(regexp_extract_all(text,
              '{PII_PATTERNS[2][0].replace("'", "''")}'))))
          * 1000000 // greatest(sum(n_chars), 1) AS BIGINT) AS pii_ppm
FROM documents GROUP BY 1
"""

QUERIES["pii_density_by_source"] = q_pii_density_by_source
ORACLE_SQL["pii_density_by_source"] = _sql_pii_density_by_source()


def q_events_value_sketch(sf_dir: str):
    """MERGEABLE log-bucket quantile sketch (DDSketch-shaped) over the
    UNBOUNDED-domain events.value — the scale primitive the exact
    bounded-histogram quantiles (ship_lag_quantiles machinery) can't
    cover when the value domain isn't enumerable. Bucketing is EXACT
    integer bit arithmetic, so the SQL twin matches bit-for-bit (no
    float log whose last-ulp could flip a bucket): c = floor(100·v +
    0.5) cents; c ≤ 7 → bucket c; else bucket = 8·(bitlen(c)−3) +
    (top-3-bits-after-MSB) — one octave split into 8 sub-buckets, ≤
    ±6.25% relative error, ≤ ~8·62 buckets for ALL int64 cents.
    Reported quantile = the bucket's exact LOWER BOUND under the
    quantile_disc rank rule (both engines: the engine folds cumulative
    bucket counts with _quantile_rank; the twin runs quantile_disc over
    per-row lower bounds — same element). Per-block bucket-count
    combiners → one ≤500-row groupby → driver fold; engine bit length
    via np.frexp seeded then corrected with exact integer shifts, so
    it is exact for ALL int64 cents (frexp alone can round up at
    power-of-two boundaries above 2^53)."""
    from semantic_search_system_ray.stages.sketch import _quantile_rank

    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["value"])
    part_schema = pa.schema([("key", pa.int64()), ("n", pa.int64())])

    def bucketize(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        key = np.zeros(len(c), np.int64)
        small = (c >= 1) & (c <= 7)
        key[small] = c[small]
        big = c >= 8
        cb = c[big]
        _m, ex = np.frexp(cb.astype(np.float64))  # ex ≈ bitlen (±1 ≥2^53)
        bl = ex.astype(np.int64)
        # exact-shift correction: bitlen b satisfies (c >> (b-1)) >= 1
        # and (c >> b) == 0; float64 rounding can only overshoot at
        # power-of-two boundaries, but correct both directions anyway
        bl[(cb >> np.minimum(bl - 1, 63)) == 0] -= 1
        bl[(cb >> np.minimum(bl, 63)) != 0] += 1
        key[big] = 8 * (bl - 3) + ((cb >> (bl - 4)) & 7)
        tt = pa.Table.from_pydict({"key": pa.array(key, pa.int64())})
        g = tt.group_by(["key"]).aggregate([("key", "count")])
        return pa.Table.from_pydict(
            {"key": g.column("key"),
             "n": pc.cast(g.column("key_count"), pa.int64())},
            schema=part_schema,
        )

    rows = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("key").sum("n")
        .take_all()  # ≤ ~500 buckets regardless of corpus size
    )
    cells = sorted((int(r["key"]), int(r["sum(n)"])) for r in rows)
    keys = np.array([k for k, _n in cells], dtype=np.int64)
    cnts = np.array([n for _k, n in cells], dtype=np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0

    def lower_bound(k: int) -> int:
        if k <= 7:
            return k
        b, s = divmod(k, 8)
        return (8 + s) << (b - 1)

    out = {"q": [], "approx_value": []}
    for q in (0.5, 0.9, 0.99):
        if n == 0:
            continue
        idx = int(np.searchsorted(cum, _quantile_rank(q, n), side="left"))
        out["q"].append(q)
        out["approx_value"].append(lower_bound(int(keys[idx])) / 100.0)
    return pa.Table.from_pydict(
        {"q": pa.array(out["q"], pa.float64()),
         "approx_value": pa.array(out["approx_value"], pa.float64())}
    )


SQL_EVENTS_VALUE_SKETCH = """
WITH c AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
k AS (
  SELECT CASE
           WHEN c < 1 THEN 0
           WHEN c <= 7 THEN c
           ELSE 8 * (len(bin(c)) - 3) + ((c >> (len(bin(c)) - 4)) & 7)
         END AS key
  FROM c
),
lb AS (
  SELECT CASE WHEN key <= 7 THEN key
              ELSE (8 + key % 8) << (key // 8 - 1) END AS lo
  FROM k
)
SELECT unnest([0.5, 0.9, 0.99]) AS q,
       unnest(quantile_disc(CAST(lo AS DOUBLE) / 100.0, [0.5, 0.9, 0.99]))
         AS approx_value
FROM lb
"""

QUERIES["events_value_sketch"] = q_events_value_sketch
ORACLE_SQL["events_value_sketch"] = SQL_EVENTS_VALUE_SKETCH


def q_orders_zorder_buckets(sf_dir: str):
    """Z-ORDER (Morton-curve) layout profile of orders over the
    (orderdate, custkey) plane — the multi-dimensional clustering
    technique a lakehouse layout pass uses so BOTH date-range and
    customer-range scans prune: interleave the low 16 bits of
    days-since-1995-01-01 with the low 16 bits of custkey into a 32-bit
    z-value, drop the low 14 bits to form the bucket, and report per-bucket
    row count plus the min/max of both dimensions — the
    locality-quality report (tight per-bucket ranges = good pruning).
    All integer bit arithmetic, identical unrolled on both engines; one
    streaming pass of per-block combiners → a ≤1024-row groupby."""
    import datetime as dt

    import pandas as pd

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    EPOCH = dt.datetime(1995, 1, 1)
    orders = rd.read_parquet(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"]
    )
    part_schema = pa.schema(
        [("bucket", pa.int64()), ("n", pa.int64()),
         ("min_day", pa.int64()), ("max_day", pa.int64()),
         ("min_cust", pa.int64()), ("max_cust", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        # naive timestamps: day index via epoch-day arithmetic, no tz
        day = (us // 86_400_000_000) - (EPOCH - dt.datetime(1970, 1, 1)).days
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d16 = day & 0xFFFF
        c16 = cust & 0xFFFF
        z = np.zeros(len(day), np.int64)
        for i in range(16):
            z |= ((d16 >> i) & 1) << (2 * i + 1)
            z |= ((c16 >> i) & 1) << (2 * i)
        bucket = z >> 14
        df = pd.DataFrame({"bucket": bucket, "day": day, "cust": cust})
        agg = df.groupby("bucket", sort=False).agg(
            n=("day", "size"), min_day=("day", "min"), max_day=("day", "max"),
            min_cust=("cust", "min"), max_cust=("cust", "max"),
        ).reset_index()
        return pa.Table.from_pandas(agg, schema=part_schema,
                                    preserve_index=False)

    out_schema = part_schema

    def fold(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return out_schema.empty_table()
        agg = df.groupby("bucket", sort=False).agg(
            n=("n", "sum"), min_day=("min_day", "min"),
            max_day=("max_day", "max"), min_cust=("min_cust", "min"),
            max_cust=("max_cust", "max"),
        ).reset_index()
        return pa.Table.from_pandas(agg, schema=out_schema,
                                    preserve_index=False)

    return coarse_partition_apply(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], fold, out_schema,
    )


def _sql_orders_zorder_buckets() -> str:
    terms = []
    for i in range(16):
        terms.append(f"(((day >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((cust >> {i}) & 1) << {2 * i})")
    z = " | ".join(terms)
    return f"""
WITH base AS (
  SELECT CAST(datediff('day', DATE '1995-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         CAST(o_custkey AS BIGINT) AS cust
  FROM orders
),
masked AS (
  SELECT day, cust, (day & 65535) AS d16, (cust & 65535) AS c16 FROM base
),
zv AS (
  SELECT day, cust, ({z.replace('day >>', 'd16 >>').replace('cust >>', 'c16 >>')}) AS z
  FROM masked
)
SELECT (z >> 14) AS bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(min(day) AS BIGINT) AS min_day,
       CAST(max(day) AS BIGINT) AS max_day,
       CAST(min(cust) AS BIGINT) AS min_cust,
       CAST(max(cust) AS BIGINT) AS max_cust
FROM zv GROUP BY 1
"""

QUERIES["orders_zorder_buckets"] = q_orders_zorder_buckets
ORACLE_SQL["orders_zorder_buckets"] = _sql_orders_zorder_buckets()


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — FORECAST REVENUE CHANGE: the discount revenue
    recovered by dropping small discounts on low-quantity 1996 lines
    (sum of extendedprice·discount over the filtered band). Every
    predicate is pushed to the parquet READ (date range + quantity +
    discount band hit row-group stats); the sum rides ONE streaming
    pass of per-block scale-4 int64 partials — the minimal
    filter-aggregate every engine demo starts with, included to
    complete the classic suite."""
    import datetime as dt

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(dt.datetime(1996, 1, 1)))
            & (pc.field("l_shipdate") < pa.scalar(dt.datetime(1997, 1, 1)))
            & (pc.field("l_quantity") < 24.0)
            & (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
        ),
    )
    part_schema = pa.schema([("rev_s4", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_h = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, disc_h)
        return pa.Table.from_pydict(
            {"rev_s4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
             "n": pa.array([t.num_rows], pa.int64())},
            schema=part_schema,
        )

    rows = li.map_batches(partial, batch_format="pyarrow").take_all()
    s4 = sum(int(r["rev_s4"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)
    cents = (s4 + 50) // 100
    return pa.Table.from_pydict(
        {"revenue": pa.array([cents / 100.0], pa.float64()),
         "n_lines": pa.array([n], pa.int64())}
    )


SQL_FORECAST_REVENUE = """
SELECT CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100
            AS DOUBLE) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 24
  AND l_discount >= 0.05 AND l_discount <= 0.07
"""

QUERIES["forecast_revenue"] = q_forecast_revenue
ORACLE_SQL["forecast_revenue"] = SQL_FORECAST_REVENUE


def q_events_value_sketch_by_type(sf_dir: str):
    """GROUPED log-bucket quantile sketch: per event TYPE, the p50/p90
    approximate value from the same exact-integer bit-bucketing as
    events_value_sketch — the per-segment latency/value dashboard at
    unbounded domains. Per-block (type, bucket) count combiners → one
    (types × ≤500)-row groupby → driver fold per type; identical bucket
    lower-bound + quantile_disc rank rule on both engines."""
    from semantic_search_system_ray.stages.sketch import _quantile_rank

    ds = rd.read_parquet(_p(sf_dir, "events"),
                         columns=["event_type", "value"])
    part_schema = pa.schema(
        [("event_type", pa.string()), ("key", pa.int64()),
         ("n", pa.int64())]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        key = np.zeros(len(c), np.int64)
        small = (c >= 1) & (c <= 7)
        key[small] = c[small]
        big = c >= 8
        cb = c[big]
        _m, ex = np.frexp(cb.astype(np.float64))
        bl = ex.astype(np.int64)
        key[big] = 8 * (bl - 3) + ((cb >> (bl - 4)) & 7)
        tt = pa.Table.from_pydict(
            {"event_type": t.column("event_type"),
             "key": pa.array(key, pa.int64())}
        )
        g = tt.group_by(["event_type", "key"]).aggregate([("key", "count")])
        return pa.Table.from_pydict(
            {"event_type": g.column("event_type"), "key": g.column("key"),
             "n": pc.cast(g.column("key_count"), pa.int64())},
            schema=part_schema,
        )

    rows = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["event_type", "key"]).sum("n")
        .take_all()  # types × bucket domain — bounded
    )
    by_t: dict = {}
    for r in rows:
        by_t.setdefault(r["event_type"], []).append(
            (int(r["key"]), int(r["sum(n)"]))
        )

    def lower_bound(k: int) -> int:
        if k <= 7:
            return k
        b, s = divmod(k, 8)
        return (8 + s) << (b - 1)

    out = {"event_type": [], "q": [], "approx_value": []}
    for et in sorted(by_t):
        cells = sorted(by_t[et])
        keys = np.array([k for k, _n in cells], dtype=np.int64)
        cum = np.cumsum(np.array([n for _k, n in cells], dtype=np.int64))
        n = int(cum[-1])
        for q in (0.5, 0.9):
            idx = int(np.searchsorted(cum, _quantile_rank(q, n),
                                      side="left"))
            out["event_type"].append(et)
            out["q"].append(q)
            out["approx_value"].append(lower_bound(int(keys[idx])) / 100.0)
    return pa.Table.from_pydict(
        {"event_type": pa.array(out["event_type"], pa.string()),
         "q": pa.array(out["q"], pa.float64()),
         "approx_value": pa.array(out["approx_value"], pa.float64())}
    )


SQL_EVENTS_VALUE_SKETCH_BY_TYPE = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
k AS (
  SELECT event_type, CASE
           WHEN c < 1 THEN 0
           WHEN c <= 7 THEN c
           ELSE 8 * (len(bin(c)) - 3) + ((c >> (len(bin(c)) - 4)) & 7)
         END AS key
  FROM c
),
lb AS (
  SELECT event_type,
         CASE WHEN key <= 7 THEN key
              ELSE (8 + key % 8) << (key // 8 - 1) END AS lo
  FROM k
)
SELECT event_type,
       unnest([0.5, 0.9]) AS q,
       unnest(quantile_disc(CAST(lo AS DOUBLE) / 100.0, [0.5, 0.9]))
         AS approx_value
FROM lb GROUP BY event_type
"""

QUERIES["events_value_sketch_by_type"] = q_events_value_sketch_by_type
ORACLE_SQL["events_value_sketch_by_type"] = SQL_EVENTS_VALUE_SKETCH_BY_TYPE


def q_embedding_top_pc(sf_dir: str):
    """TOP PRINCIPAL DIRECTION of the embedding matrix by DETERMINISTIC
    integer power iteration (uncentered: the top right-singular vector)
    — the distributed linear-algebra pattern (matvec as per-block
    partial sums, spectral methods, embeddings whitening) on the
    kmeans/HITS exact-integer playbook. Elements quantize ONCE to int64
    micro-units (floor(x·1e6+0.5), both engines); each round is two
    matvecs — z = E·w (row-local, no shuffle) and y = Eᵀ·z' (per-block
    64-long partial-sum VECTORS → driver fold) — with an integer
    max-normalization (v·1e4 // max|v|, floor division on BOTH engines)
    between them, so every number is exact int64 end to end and the SQL
    twin unrolls the two rounds as lockstep-unnest CTEs. Integer division
    is TRUNCATION toward zero on both engines (DuckDB `//` truncates on
    negatives — measured, NOT floor; the engine mirrors with
    sign·(|v|//m)). Start vector = all 1e4 (deterministic); output
    (dim, weight) with weight scaled to max 1e4."""
    ds = rd.read_parquet(_p(sf_dir, "embeddings"), columns=["embedding"])
    DIM = 64
    SCALE_W = 10_000

    def quantized(t: pa.Table) -> np.ndarray:
        emb = t.column("embedding").combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(flat * 1e6 + 0.5).astype(np.int64).reshape(-1, DIM)

    def matvec_round(w: np.ndarray) -> np.ndarray:
        """One power round: returns the UN-normalized y = Eᵀ·z' where
        z' = (E·w)·1e4 // max|E·w| — two streaming passes, partials only."""
        # pass 1: global max|z| (per-block max fold, one scalar per block)
        def zmax(t: pa.Table) -> pa.Table:
            E = quantized(t)
            z = E @ w
            m = int(np.abs(z).max()) if len(z) else 0
            return pa.Table.from_pydict({"m": pa.array([m], pa.int64())})

        mz = max(int(r["m"]) for r in
                 ds.map_batches(zmax, batch_format="pyarrow").take_all())
        if mz == 0:
            return [0] * DIM

        # pass 2: per-block y partial vectors (64 int64 per block)
        def ypart(t: pa.Table) -> pa.Table:
            E = quantized(t)
            z = E @ w
            zs = z * SCALE_W
            zq = np.sign(zs) * (np.abs(zs) // mz)  # trunc == DuckDB //
            # loud overflow guard: the block partial Eᵀ·zq is bounded by
            # n_rows·max|E|·max|zq|; int64 wraps SILENTLY in numpy while
            # the SQL twin's BIGINT sum raises — match it by raising
            if E.size:
                bound = int(E.shape[0]) * int(np.abs(E).max()) * SCALE_W
                if bound >= 2 ** 63:
                    raise OverflowError(
                        "embedding_top_pc block partial may exceed int64 "
                        f"(bound {bound}); shrink target block size"
                    )
            y = E.T @ zq
            return pa.Table.from_pydict(
                {"j": pa.array(np.arange(DIM), pa.int64()),
                 "y": pa.array(y.astype(np.int64), pa.int64())}
            )

        # driver fold in PYTHON ints (arbitrary precision): the sum of
        # per-block int64 partials can exceed int64 at very large
        # corpora even though each partial fits
        acc = [0] * DIM
        for r in ds.map_batches(ypart, batch_format="pyarrow").take_all():
            acc[int(r["j"])] += int(r["y"])
        return acc

    w = np.full(DIM, SCALE_W, dtype=np.int64)
    for _round in range(2):
        y = matvec_round(w)  # python ints — exact at any magnitude
        my = max(abs(v) for v in y)
        if my == 0:
            break
        # normalization in python ints too (y·1e4 can exceed int64);
        # the result is bounded by SCALE_W so the np.int64 cast is safe
        w = np.array(
            [(1 if v >= 0 else -1) * (abs(v) * SCALE_W // my) for v in y],
            dtype=np.int64,
        )
    return pa.Table.from_pydict(
        {"dim": pa.array(np.arange(DIM), pa.int64()),
         "weight": pa.array(w, pa.int64())}
    )


def _sql_embedding_top_pc() -> str:
    parts = ["""
WITH e AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) - 1 AS j,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
),
w0 AS (SELECT j, CAST(10000 AS BIGINT) AS w
       FROM (SELECT unnest(generate_series(0, 63)) AS j))"""]
    for r in (1, 2):
        parts.append(f""",
z{r} AS (
  SELECT e.vec_id, CAST(sum(e.v * w.w) AS BIGINT) AS z
  FROM e JOIN w{r - 1} w ON w.j = e.j GROUP BY 1
),
mz{r} AS (SELECT max(abs(z)) AS m FROM z{r}),
zq{r} AS (SELECT vec_id, z * 10000 // (SELECT m FROM mz{r}) AS zq
          FROM z{r}),
y{r} AS (
  SELECT e.j, CAST(sum(e.v * q.zq) AS BIGINT) AS y
  FROM e JOIN zq{r} q ON q.vec_id = e.vec_id GROUP BY 1
),
my{r} AS (SELECT max(abs(y)) AS m FROM y{r}),
w{r} AS (SELECT j, y * 10000 // (SELECT m FROM my{r}) AS w FROM y{r})""")
    parts.append("""
SELECT j AS dim, CAST(w AS BIGINT) AS weight FROM w2""")
    return "".join(parts)


QUERIES["embedding_top_pc"] = q_embedding_top_pc
ORACLE_SQL["embedding_top_pc"] = _sql_embedding_top_pc()


def q_transition_entropy(sf_dir: str):
    """Per-state TRANSITION ENTROPY of the user event chain: for each
    previous event type, H = Σ (n/tot)·ln(tot/n) over its next-type
    distribution — the sequence-predictability score (low = funnel-like
    deterministic flows, ln|types| = uniform noise). Reuses the
    event_transitions distributed path end to end (per-user coarse
    cogroup → ≤|types|² lean partials); the entropy fold happens over
    that bounded set with the entropy_by_source FP contract: terms fold
    in next-type order on both engines (Python left fold == DuckDB
    list_sum over an ORDER BY list), one shared libm ln per term,
    floor(x·1e6+0.5) to 6dp."""
    import math

    tbl = q_event_transitions(sf_dir)
    df = tbl.to_pandas() if hasattr(tbl, "to_pandas") else tbl
    df = df.sort_values(["prev_type", "event_type"], kind="mergesort")
    out = {"prev_type": [], "n_total": [], "n_next_types": [],
           "entropy": []}
    for prev, g in df.groupby("prev_type", sort=True):
        tot = int(g["n"].sum())
        h = 0.0
        for n in g["n"]:  # event_type-ordered left fold
            n = int(n)
            h += float(n) / float(tot) * math.log(float(tot) / float(n))
        out["prev_type"].append(prev)
        out["n_total"].append(tot)
        out["n_next_types"].append(len(g))
        out["entropy"].append(math.floor(h * 1e6 + 0.5) / 1e6)
    return pa.Table.from_pydict(
        {"prev_type": pa.array(out["prev_type"], pa.string()),
         "n_total": pa.array(out["n_total"], pa.int64()),
         "n_next_types": pa.array(out["n_next_types"], pa.int64()),
         "entropy": pa.array(out["entropy"], pa.float64())}
    )


SQL_TRANSITION_ENTROPY = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS k
  FROM c GROUP BY 1
)
SELECT c.prev_type, tot.tot AS n_total, tot.k AS n_next_types,
       floor(list_sum(list(CAST(c.n AS DOUBLE) / tot.tot
                           * ln(CAST(tot.tot AS DOUBLE) / c.n)
                           ORDER BY c.event_type)) * 1000000 + 0.5)
         / 1000000 AS entropy
FROM c JOIN tot USING (prev_type)
GROUP BY c.prev_type, tot.tot, tot.k
"""

QUERIES["transition_entropy"] = q_transition_entropy
ORACLE_SQL["transition_entropy"] = SQL_TRANSITION_ENTROPY
