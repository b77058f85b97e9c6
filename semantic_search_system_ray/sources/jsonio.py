"""JSON source/sink (SURVEY §2.1 S4/S5) — the reference's two JSON shapes:

- **record arrays** (``press_releases.json``: one top-level JSON array of
  dicts, ingest/pr_meta_store_from_local.py:13-20) — large at scale, so
  the distributed path is JSONL via ``ray.data.read_json``/``write_json``;
  a top-level-array file is driver-parsed only when small (it is an
  all-or-nothing parse by construction — no streaming format).
- **taxonomy dicts** (``topics/topic_mapping.json``: {topic: [phrases]},
  explorer_app.py load_json_from_path(expected_format="dict")) — tiny (J1
  small side), round-trips through ``state.taxonomy.Taxonomy`` with the
  reference's save normalization (phrases deduped + sorted,
  explorer_app.py:218-232).
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from semantic_search_system_ray.state.taxonomy import Taxonomy


def read_json_records(path: str) -> rd.Dataset:
    """JSON records → Dataset. Directories and ``.jsonl`` files stream
    through ``ray.data.read_json`` (scales); a single ``.json`` file whose
    first non-space byte is ``[`` is a top-level array (the reference's
    press_releases.json shape) and is parsed on the driver."""
    if os.path.isdir(path) or path.endswith(".jsonl"):
        return rd.read_json(path)
    with open(path, "rb") as f:
        head = f.read(64).lstrip()
    if head.startswith(b"["):
        with open(path) as f:
            return rd.from_items(json.load(f))
    return rd.read_json(path)


def write_json_records(ds: rd.Dataset, out_dir: str) -> None:
    """Dataset → partitioned JSONL directory (one file per block — the
    resumable, re-readable sink; never one giant array file)."""
    ds.write_json(out_dir)


def load_taxonomy_json(path: str) -> Taxonomy:
    """{topic: [phrases]} JSON → Taxonomy (reference load_json_from_path
    dict shape)."""
    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(f"{path}: expected a JSON object of topic → phrases")
    return Taxonomy(
        topics={str(t): sorted(set(map(str, ps or []))) for t, ps in data.items()}
    )


def save_taxonomy_json(tax: Taxonomy, path: str) -> None:
    """Taxonomy → JSON with the reference's save normalization: phrases
    deduped + sorted per topic (download_data, explorer_app.py:218-232)."""
    data = {t: sorted(set(ps)) for t, ps in sorted(tax.topics.items())}
    with open(path, "w") as f:
        json.dump(data, f, indent=4)
