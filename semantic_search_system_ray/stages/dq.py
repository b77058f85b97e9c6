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

# The fsspec http-import race workaround this module used to install
# inline now lives in the package bootstrap (``_compat.py``), version-
# guarded — importing dq has no process-global side effects (ADVICE r3).

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

    def cnt(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"n": [int(pc.count_distinct(t.column(key)).as_py() or 0)]},
            schema=schema,
        )

    parts = coarse_partition_apply(
        ds.map_batches(uniq, batch_format="pyarrow"), [key], cnt, schema,
        fn_format="pyarrow",
    )
    return sum(int(r["n"]) for r in parts.take_all())


# Key domains at or below this many INPUT rows (both sides, parquet
# metadata counts) finish in one concat task instead of a sorted cogroup;
# the summary the task sees is bounded by distinct keys ≤ input rows, so
# 8M rows ≈ 136 MB of (int64, int64, bool) — comfortably one worker heap.
# None defers to context.ScaleConfig.dq_small_domain_rows (anchor 8M,
# SSR_DQ_SMALL_DOMAIN_ROWS override); setting the attribute pins it
# for the process (tests force the cogroup regime with 0).
SMALL_DOMAIN_ROWS: int | None = None


def key_domain_checks(
    base: rd.Dataset, base_key: str, child: rd.Dataset, child_key: str
) -> tuple[int, int]:
    """PK-duplicate count on ``base`` AND FK-violation count of ``child``
    against it, fused into ONE coarse cogroup over their shared key
    domain — one shuffle per key domain, not one per check, and both
    sides ride as per-block (key, n) COUNT COMBINERS, so the exchange
    carries distinct-keys-per-block rows, never raw rows.

    Returns ``(pk_dup, fk_violations)`` where pk_dup = total − distinct
    (nulls excluded, SQL COUNT DISTINCT) and fk_violations = child rows
    whose key is null or has no base row (SQL NOT EXISTS)."""
    import numpy as np

    from semantic_search_system_ray.stages.util import coarse_partition_apply

    # Carry the key in its NATIVE type when the two sides agree (int64 for
    # every warehouse PK/FK) — the exchange ships fewer bytes and the
    # per-partition pandas ops hash ints, not strings. Mixed-type pairs
    # fall back to string so the union schema stays consistent.
    b_type = base.schema().base_schema.field(base_key).type
    c_type = child.schema().base_schema.field(child_key).type
    key_type = b_type if b_type.equals(c_type) else pa.string()
    union_schema = pa.schema(
        [("__key", key_type), ("n", pa.int64()), ("__rhs", pa.bool_())]
    )

    def combine(key_col: str, rhs: bool):
        def fn(t: pa.Table) -> pa.Table:
            key = t.column(key_col)
            if not key.type.equals(key_type):
                key = pc.cast(key, key_type)
            agg = (
                pa.table({"__key": key})
                .group_by(["__key"])
                .aggregate([([], "count_all")])
            )
            return pa.Table.from_arrays(
                [agg.column("__key"),
                 pc.cast(agg.column("count_all"), pa.int64()),
                 pa.array(np.full(agg.num_rows, rhs))],
                schema=union_schema,
            )
        return fn

    combined = base.map_batches(
        combine(base_key, False), batch_format="pyarrow"
    ).union(child.map_batches(combine(child_key, True), batch_format="pyarrow"))

    part_schema = pa.schema([("pk_dup", pa.int64()), ("viol", pa.int64())])

    def per_part(t: pa.Table) -> pa.Table:
        # Arrow-native (no pandas conversion on the group exchange):
        # filters + count_distinct + is_in cover both checks exactly
        rhs = t.column("__rhs")
        b = t.filter(pc.invert(rhs))
        c = t.filter(rhs)
        b_nonnull = b.filter(pc.is_valid(b.column("__key")))
        n_base = pc.sum(b_nonnull.column("n")).as_py() or 0
        n_dist = pc.count_distinct(b_nonnull.column("__key")).as_py() or 0
        pk_dup = int(n_base) - int(n_dist)
        ckey = c.column("__key")
        # or_kleene: null-key child rows must be violations even where
        # is_in yields null (plain or_ would propagate the null and the
        # filter would silently drop the row)
        bad = pc.or_kleene(
            pc.is_null(ckey),
            pc.invert(pc.is_in(
                ckey, value_set=b_nonnull.column("__key").combine_chunks()
            )),
        )
        viol = pc.sum(c.filter(bad).column("n")).as_py() or 0
        return pa.Table.from_pydict(
            {"pk_dup": [pk_dup], "viol": [int(viol)]},
            schema=part_schema,
        )

    # Scale switch, decided from parquet METADATA row counts (count() on a
    # fresh read is a metadata lookup, no execution). Small domains skip
    # the sorted cogroup entirely: the per-block combiners have already
    # shrunk both sides to distinct-keys-per-block, so one concat task
    # (repartition(1), measured 2.4× faster than the cogroup at 750k input
    # rows) finishes the job. Large domains keep the hash cogroup — the
    # single-task path would concentrate the whole key domain on one
    # worker.
    small_rows = SMALL_DOMAIN_ROWS
    if small_rows is None:
        from semantic_search_system_ray.context import scale_config

        small_rows = scale_config().dq_small_domain_rows
    if base.count() + child.count() <= small_rows:
        from semantic_search_system_ray.stages.util import ensure_schema

        parts = ensure_schema(
            combined.repartition(1).map_batches(
                per_part, batch_format="pyarrow", batch_size=None
            ),
            part_schema,
        ).take_all()  # exactly one row
    else:
        parts = coarse_partition_apply(
            combined, ["__key"], per_part, part_schema, fn_format="pyarrow"
        ).take_all()  # ≤ #partitions rows
    return (sum(int(r["pk_dup"]) for r in parts),
            sum(int(r["viol"]) for r in parts))


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
    (check_name, violations) row per check, sorted by name.

    The nine component jobs are INDEPENDENT, so they run concurrently
    (driver threads, each blocking on its own Dataset execution — Ray
    schedules the streams side by side): the suite's wall time is the
    slowest check plus overlap, not the sum of ten job fixed costs."""
    import datetime as dt
    from concurrent.futures import ThreadPoolExecutor

    lo = pa.scalar(dt.datetime(1992, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(dt.datetime(2002, 1, 1), pa.timestamp("us"))

    # ALL read_parquet calls happen here on the MAIN thread: Ray resolves
    # paths/filesystems at dataset-construction time through a lazy fsspec
    # import that is not concurrent-first-import safe (a half-initialized
    # fsspec.implementations.http raises ImportError where the sequential
    # path raises the caught ModuleNotFoundError). The pool threads below
    # only EXECUTE already-constructed plans.
    ds_li_qty = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    ds_orders_scan = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderdate"])
    ds_cust_bal = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
    ds_docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    ds_events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    ds_cust_pk = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    ds_ord_pk = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    ds_ord_fk = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    ds_li_fk = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])

    def li_scan() -> dict[str, int]:
        return scan_counts(ds_li_qty, {
            "lineitem_qty_range": lambda t: _bool_count(
                pc.or_(pc.less(t.column("l_quantity"), pa.scalar(1.0)),
                       pc.greater(t.column("l_quantity"), pa.scalar(50.0)))),
        })

    def orders_scan() -> dict[str, int]:
        return scan_counts(ds_orders_scan, {
            "orders_nonpos_total": lambda t: _bool_count(
                pc.less_equal(t.column("o_totalprice"), pa.scalar(0.0))),
            "orders_date_bounds": lambda t: _bool_count(
                pc.or_(pc.less(t.column("o_orderdate"), lo),
                       pc.greater_equal(t.column("o_orderdate"), hi))),
        })

    def cust_scan() -> dict[str, int]:
        return scan_counts(ds_cust_bal, {
            "customer_acctbal_null": lambda t: t.column("c_acctbal").null_count,
        })

    def docs_scan() -> dict[str, int]:
        return scan_counts(ds_docs, {
            "documents_empty_text": lambda t: (
                t.column("text").null_count
                + _bool_count(pc.equal(t.column("text"), pa.scalar("")))),
        })

    def events_scan() -> dict[str, int]:
        return scan_counts(ds_events, {
            "events_value_null": lambda t: t.column("value").null_count,
        })

    def customer_domain() -> dict[str, int]:
        # PK dup + FK integrity fused: ONE shuffle over the custkey domain
        pk, viol = key_domain_checks(
            ds_cust_pk, "c_custkey", ds_ord_fk, "o_custkey"
        )
        return {"customer_pk_dup": pk, "fk_orders_customer": viol}

    def orders_domain() -> dict[str, int]:
        pk, viol = key_domain_checks(
            ds_ord_pk, "o_orderkey", ds_li_fk, "l_orderkey"
        )
        return {"orders_pk_dup": pk, "fk_lineitem_orders": viol}

    results: dict[str, int] = {}
    with ThreadPoolExecutor(max_workers=4) as pool:
        for frag in pool.map(lambda f: f(), [
            orders_domain, customer_domain, li_scan, orders_scan, cust_scan,
            docs_scan, events_scan,
        ]):
            results.update(frag)

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
