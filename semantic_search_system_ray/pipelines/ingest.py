"""Ingest pipeline — the reference's E1 chain (fetch → clean → flag →
id-assign → store) re-expressed as one streaming Dataset pass with an
immutable, partition-pruned output layout.

Reference semantics reproduced:
- HTML body extract + clean (M2 + M1, ingest/pr_meta_store.py:26-52) —
  regex surrogate for bs4.
- date normalize "%B %d, %Y" → ISO (M3, ingest/pr_meta_fetch.py:55-59).
- deterministic content-hash ids replacing the global auto-increment (M5,
  ingest/pr_meta_store_from_local.py:20-46 — a cluster-hostile pattern).
- month partitioning (the reference's year/month work-queue shards,
  S10/S11) becomes hive ``partition_cols=["month"]`` so downstream
  date-range reads prune files, and resume = skip existing partitions.
The ``processed`` flag workflow (S8/S9) is subsumed by the manifest
pattern in state/manifest.py.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.functions.hashing import content_doc_id
from semantic_search_system_ray.functions.parsing import extract_html_body
from semantic_search_system_ray.functions.text import (
    arrow_clean_text_ingest,
    normalize_date,
)


def ingest_html(raw: rd.Dataset) -> rd.Dataset:
    """(pr_url, pr_date, html) → (doc_id, pr_url, pr_title, pr_date, content, month)."""

    def parse(t: pa.Table) -> pa.Table:
        urls = t.column("pr_url").to_pylist()
        dates = [normalize_date(d) for d in t.column("pr_date").to_pylist()]
        bodies = [extract_html_body(h) for h in t.column("html").to_pylist()]
        content = [b["content"] for b in bodies]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    [content_doc_id(u + "\x00" + c) for u, c in zip(urls, content)],
                    pa.string(),
                ),
                "pr_url": pa.array(urls, pa.string()),
                "pr_title": pa.array([b["title"] for b in bodies], pa.string()),
                "pr_date": pa.array(dates, pa.string()),
                "content": pa.array(content, pa.string()),
                "month": pa.array([(d or "unknown")[:7] for d in dates], pa.string()),
            }
        )

    return raw.map_batches(parse, batch_format="pyarrow")


def ingest_text(raw: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """Plain-text variant: clean (M1 vectorized) + content ids."""

    def parse(t: pa.Table) -> pa.Table:
        cleaned = arrow_clean_text_ingest(t.column(text_col))
        ids = [content_doc_id(c or "") for c in cleaned.to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()), "content": cleaned}
        )

    return raw.map_batches(parse, batch_format="pyarrow")


def write_month_partitioned(ds: rd.Dataset, out_dir: str) -> None:
    """Hive-partitioned sink: one directory per month → downstream month
    readers prune at the file level (reference S10/S11 shards, immutable)."""
    ds.write_parquet(out_dir, partition_cols=["month"])


def read_month(out_dir: str, month: str) -> rd.Dataset:
    """Partition-pruned month read (only that directory's files open)."""
    return rd.read_parquet(f"{out_dir}/month={month}")
