"""One-decade-up endurance run (r3 verdict #2): the flagship KG build at
sf1.0 scale (4M docs ≈ 10× the bench corpus) under the 128 GiB sandbox.

Runs the build TWICE in fresh processes (determinism evidence: the triple
checksum must be bit-identical across runs — same corpus, independent
sessions), while the parent polls system memory for the peak working set
and the child reports Ray's object-store spill stats. Prints ONE JSON
line; BASELINE.md records the numbers.

Usage: python tools/endurance.py   (env: ENDURANCE_DOCS, RAY_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

DOCS = int(os.environ.get("ENDURANCE_DOCS", "4000000"))
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42
CORPUS = f"/tmp/kg_endurance_{DOCS}_{SEED}"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys, time, re
import ray
ray.init(address="local", num_cpus=%(cpus)d, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
import pyarrow.parquet as pq
from semantic_search_system_ray.pipelines.kg_build import build_triples
from semantic_search_system_ray.pipelines.runner import _triples_checksum
from semantic_search_system_ray.sources.synth import (
    build_gazetteer, write_corpus_parallel)

corpus = %(corpus)r
if not os.path.exists(corpus + "/_COMPLETE"):
    t0 = time.time()
    write_corpus_parallel(corpus, n_docs=%(docs)d, seed=%(seed)d,
                          num_shards=256)
    open(corpus + "/_COMPLETE", "w").write("ok")
    print(json.dumps({"gen_sec": round(time.time() - t0, 1)}),
          file=sys.stderr)

t0 = time.time()
res = build_triples(
    rd.read_parquet(corpus + "/documents"),
    pq.read_table(corpus + "/taxonomy.parquet"),
    rd.read_parquet(corpus + "/phrase_docs"),
    build_gazetteer(),
    concurrency=(2, max(2, %(cpus)d // 2)),
    batch_size=256,
)
n = res.triples.count()
checksum = _triples_checksum(res.triples)
wall = round(time.time() - t0, 1)

# object-store spill bytes: sum the session's spill files on disk
# (grpc-based memory_summary is unavailable in this sandbox)
spilled = 0
sess = os.path.realpath("/tmp/ray/session_latest")
for root, _dirs, files in os.walk(sess):
    if "spill" in os.path.basename(root).lower():
        for f in files:
            try:
                spilled += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
spilled_mib = spilled >> 20
print(json.dumps({"wall_sec": wall, "triples": n, "checksum": checksum,
                  "spilled_mib": spilled_mib,
                  "triples_per_sec": round(n / wall, 1),
                  "docs_per_sec": round(%(docs)d / wall, 1)}))
ray.shutdown()
"""


def _run_child() -> tuple[dict, int]:
    """Run one fresh-process build; returns (child json, peak used GiB·10)."""
    peak = [0]
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            with open("/proc/meminfo") as f:
                info = {l.split(":")[0]: int(l.split()[1]) for l in f}
            used_kib = info["MemTotal"] - info["MemAvailable"]
            peak[0] = max(peak[0], used_kib)
            time.sleep(0.5)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         _CHILD % {"cpus": CPUS, "corpus": CORPUS, "docs": DOCS, "seed": SEED}],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    stop.set()
    t.join()
    return json.loads(out.strip().splitlines()[-1]), peak[0]


def main() -> None:
    r1, peak1 = _run_child()
    r2, peak2 = _run_child()
    assert r1["checksum"] == r2["checksum"], (r1, r2)
    assert r1["triples"] == r2["triples"]
    print(json.dumps({
        "metric": "endurance_kg_build (sf1.0-scale spans corpus, 2 fresh runs)",
        "docs": DOCS,
        "num_cpus": CPUS,
        "wall_sec_run1": r1["wall_sec"],
        "wall_sec_run2": r2["wall_sec"],
        "triples": r1["triples"],
        "checksum_match": True,
        "triples_per_sec": r1["triples_per_sec"],
        "docs_per_sec": r1["docs_per_sec"],
        "spilled_mib_run1": r1["spilled_mib"],
        "spilled_mib_run2": r2["spilled_mib"],
        "peak_used_gib_run1": round(peak1 / 1048576, 1),
        "peak_used_gib_run2": round(peak2 / 1048576, 1),
    }))


if __name__ == "__main__":
    main()
