"""Weak-scaling probe for the flagship EXTRACT kernel — direct evidence
for the single-box memory-bus knee documented in BASELINE.md
(round-4 sixth continuation).

Method: for each parallelism level c, a FRESH process runs
``ray.init(num_cpus=c)`` and pushes ``DOCS_PER_CORE * c`` documents of
the standard bench corpus through spans + ``extract_flat`` only (no
finalize, no shuffle), consumed with a count. Work per core is constant,
so ideal wall time is FLAT across levels; any rise is contention —
scheduler, allocator, or the shared memory bus. The probe reports
wall, docs/s, and ms/doc/core per level plus the flat-ness ratio
(wall at the highest level / wall at the lowest).

Usage:
    python tools/extract_scaling_probe.py [--levels 1,2,4,8,16,32]
        [--docs-per-core 12500] [--corpus DIR]

The corpus defaults to the bench corpus dir for sf0.1 (built on demand
via bench._corpus_dir if missing). Prints one JSON line, bench-style.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from semantic_search_system_ray.stages.docnlp import extract_flat
from semantic_search_system_ray.sources.synth import build_gazetteer

# the bench corpus is already spans-shaped (doc_id, spans) and was
# generated against the synthetic gazetteer (same pair bench.py uses)
corpus, n_docs = sys.argv[2], int(sys.argv[3])
docs = rd.read_parquet(f"{corpus}/documents", columns=["doc_id", "spans"])
docs = docs.limit(n_docs).materialize()  # pin inputs: time EXTRACT only
t0 = time.time()
flat = extract_flat(docs, build_gazetteer())
rows = flat.count()
wall = time.time() - t0
print(json.dumps({"wall": wall, "rows": rows, "docs": n_docs}))
ray.shutdown()
"""


def run_level(c: int, corpus: str, docs_per_core: int) -> dict:
    n_docs = docs_per_core * c
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(c), corpus, str(n_docs)],
        capture_output=True, text=True, check=True, env=env, cwd=REPO,
    ).stdout
    r = json.loads(out.strip().splitlines()[-1])
    r["num_cpus"] = c
    r["docs_per_sec"] = round(r["docs"] / r["wall"], 1)
    r["ms_per_doc_per_core"] = round(r["wall"] * c / r["docs"] * 1000, 4)
    return r


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--docs-per-core", type=int, default=12_500)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    corpus = args.corpus
    if corpus is None:
        sys.path.insert(0, REPO)
        os.environ.setdefault("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        import bench

        corpus = bench._corpus_dir()

    levels = [int(x) for x in args.levels.split(",")]
    results = [run_level(c, corpus, args.docs_per_core) for c in levels]
    flatness = results[-1]["wall"] / results[0]["wall"]
    print(json.dumps({
        "metric": "extract_weak_scaling (wall ratio hi/lo; 1.0 = no contention)",
        "value": round(flatness, 3),
        "unit": "ratio",
        "docs_per_core": args.docs_per_core,
        "levels": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
