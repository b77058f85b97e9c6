"""Data-quality validation suite — the "expectations" pass a training-data
pipeline runs before anything expensive: primary-key uniqueness,
referential integrity, range / null / empty-value checks, each computed
distributed and reported as one (check_name, violations) row.

Scale shape:
- all ROW-LOCAL checks for a table fuse into ONE pruned-column scan
  (``map_batches`` partial counters → a ≤#checks-row groupby), so adding
  a check never adds a pass;
- PK uniqueness = total − exact distinct (per-block unique combiner →
  per-coarse-partition ``nunique``, summed — the key set never exists in
  one place);
- FK integrity = the distributed ``coarse_anti_join`` row count (null
  child keys count as violations, matching SQL ``NOT EXISTS``).

Reference parity note: the reference validates nothing before indexing
(`document_processor.py` trusts its scraper output); this suite is part
of the beyond-reference training-data surface (SURVEY §2.11).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

DQ_SCHEMA = pa.schema(
    [("check_name", pa.string()), ("violations", pa.int64())]
)


def scan_counts(
    ds: rd.Dataset, counters: dict[str, Callable[[pa.Table], int]]
) -> dict[str, int]:
    """Run every row-local counter in ONE pass over ``ds``: each block
    emits one partial row per check; a ≤#checks-row groupby sums them."""
    names = sorted(counters)

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"check_name": names,
             "violations": [int(counters[n](t)) for n in names]},
            schema=DQ_SCHEMA,
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("check_name")
        .aggregate(Sum("violations", alias_name="v"))
    )
    return {r["check_name"]: int(r["v"]) for r in out.take_all()}


def distinct_count(ds: rd.Dataset, key: str) -> int:
    """Exact distributed COUNT(DISTINCT key), nulls excluded (SQL
    semantics): per-block unique combiner, then per-coarse-partition
    ``nunique`` summed — only #partitions ints reach the driver."""
    from semantic_search_system_ray.stages.util import coarse_partition_apply

    def uniq(t: pa.Table) -> pa.Table:
        u = t.column(key).unique()
        if u.null_count:
            u = u.drop_null()
        return pa.Table.from_pydict({key: u})

    schema = pa.schema([("n", pa.int64())])

    def cnt(df) -> pa.Table:
        return pa.Table.from_pydict(
            {"n": [int(df[key].nunique())]}, schema=schema
        )

    parts = coarse_partition_apply(
        ds.map_batches(uniq, batch_format="pyarrow"), [key], cnt, schema
    )
    return sum(int(r["n"]) for r in parts.take_all())


def fk_violations(
    child: rd.Dataset, child_key: str, parent: rd.Dataset, parent_key: str
) -> int:
    """Referential-integrity violation count: child rows whose key has no
    parent — SQL ``NOT EXISTS``. Null child keys never match anything, so
    they ALWAYS violate; they're counted in the cheap scan pass and never
    enter the anti-join shuffle at all."""
    from semantic_search_system_ray.stages.util import coarse_anti_join

    child = child.select_columns([child_key])
    n_null = scan_counts(
        child, {"n": lambda t: t.column(child_key).null_count}
    )["n"]

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(child_key)))

    key_type = child.schema().base_schema.field(child_key).type
    dangling = coarse_anti_join(
        child.map_batches(drop_null, batch_format="pyarrow"),
        parent.select_columns([parent_key]),
        left_key=child_key, right_key=parent_key,
        out_schema=pa.schema([(child_key, key_type)]),
    ).count()
    return n_null + dangling


def _bool_count(mask: pa.ChunkedArray) -> int:
    """Count TRUE in a possibly-null boolean mask (null = not violating,
    mirroring SQL WHERE)."""
    s = pc.sum(pc.cast(mask, pa.int64()))
    return int(s.as_py() or 0)


def dq_report(sf_dir: str) -> pa.Table:
    """The full suite over the warehouse tables → one
    (check_name, violations) row per check, sorted by name."""
    import datetime as dt

    results: dict[str, int] = {}

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    results.update(scan_counts(li, {
        "lineitem_qty_range": lambda t: _bool_count(
            pc.or_(pc.less(t.column("l_quantity"), pa.scalar(1.0)),
                   pc.greater(t.column("l_quantity"), pa.scalar(50.0)))),
    }))

    orders_scan = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderdate"]
    )
    lo = pa.scalar(dt.datetime(1992, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(2002, 1, 1), pa.timestamp("us"))
    results.update(scan_counts(orders_scan, {
        "orders_nonpos_total": lambda t: _bool_count(
            pc.less_equal(t.column("o_totalprice"), pa.scalar(0.0))),
        "orders_date_bounds": lambda t: _bool_count(
            pc.or_(pc.less(t.column("o_orderdate"), lo),
                   pc.greater_equal(t.column("o_orderdate"), hi))),
    }))

    cust_scan = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_acctbal"]
    )
    results.update(scan_counts(cust_scan, {
        "customer_acctbal_null": lambda t: t.column("c_acctbal").null_count,
    }))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    results.update(scan_counts(docs, {
        "documents_empty_text": lambda t: (
            t.column("text").null_count
            + _bool_count(pc.equal(t.column("text"), pa.scalar("")))),
    }))

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    results.update(scan_counts(events, {
        "events_value_null": lambda t: t.column("value").null_count,
    }))

    cust_pk = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    results["customer_pk_dup"] = cust_pk.count() - distinct_count(
        cust_pk, "c_custkey"
    )
    ord_pk = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    results["orders_pk_dup"] = ord_pk.count() - distinct_count(
        ord_pk, "o_orderkey"
    )

    results["fk_orders_customer"] = fk_violations(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
        "o_custkey",
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]),
        "c_custkey",
    )
    results["fk_lineitem_orders"] = fk_violations(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]),
        "l_orderkey",
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"]),
        "o_orderkey",
    )

    names = sorted(results)
    return pa.Table.from_pydict(
        {"check_name": names,
         "violations": [results[n] for n in names]},
        schema=DQ_SCHEMA,
    )


SQL_DQ_CHECKS = """
SELECT * FROM (
  SELECT 'customer_acctbal_null' AS check_name,
         (SELECT count(*) FROM customer WHERE c_acctbal IS NULL) AS violations
  UNION ALL SELECT 'customer_pk_dup',
         (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
  UNION ALL SELECT 'documents_empty_text',
         (SELECT count(*) FROM documents WHERE text IS NULL OR text = '')
  UNION ALL SELECT 'events_value_null',
         (SELECT count(*) FROM events WHERE value IS NULL)
  UNION ALL SELECT 'fk_lineitem_orders',
         (SELECT count(*) FROM lineitem WHERE NOT EXISTS
            (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
  UNION ALL SELECT 'fk_orders_customer',
         (SELECT count(*) FROM orders WHERE NOT EXISTS
            (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
  UNION ALL SELECT 'lineitem_qty_range',
         (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
  UNION ALL SELECT 'orders_date_bounds',
         (SELECT count(*) FROM orders
          WHERE o_orderdate < TIMESTAMP '1992-01-01'
             OR o_orderdate >= TIMESTAMP '2002-01-01')
  UNION ALL SELECT 'orders_nonpos_total',
         (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
  UNION ALL SELECT 'orders_pk_dup',
         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
)
ORDER BY check_name
"""
