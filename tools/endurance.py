"""One-decade-up endurance run (r3 verdict #2): the flagship KG build at
sf1.0 scale (4M docs ≈ 10× the bench corpus) under the 128 GiB sandbox.

Runs the build TWICE in fresh processes (determinism evidence: the triple
checksum must be bit-identical across runs — same corpus, independent
sessions), while the parent polls system memory for the peak working set
and the child reports Ray's object-store spill stats. Prints ONE JSON
line; BASELINE.md records the numbers.

Spill-pressure mode (round-4): set ENDURANCE_OBJECT_STORE_GIB to cap
ray.init(object_store_memory=...) far below the working set — the run
must then stream through a small store, spilling instead of failing,
and still produce the bit-identical checksum. The child polls the
session's spill directory for PEAK bytes (end-of-run size undercounts:
restored objects delete their spill files).

Usage: python tools/endurance.py   (env: ENDURANCE_DOCS, RAY_GRAFT_CPUS,
ENDURANCE_OBJECT_STORE_GIB)
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
OBJ_GIB = float(os.environ.get("ENDURANCE_OBJECT_STORE_GIB", "0"))
SEED = 42
CORPUS = f"/tmp/kg_endurance_{DOCS}_{SEED}"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys, time, re, threading
import ray
kwargs = {}
if %(objmem)d:
    kwargs["object_store_memory"] = %(objmem)d
ray.init(address="local", num_cpus=%(cpus)d, include_dashboard=False,
         logging_level="ERROR", **kwargs)

# the session dir from the LIVE node — never guess the temp root
# (RAY_TMPDIR=/tmp/ray puts sessions under /tmp/ray/ray/..., so the old
# hardcoded /tmp/ray/session_latest walk silently measured nothing)
SESS = ray._private.worker.global_worker.node.get_session_dir_path()

def _spill_dir_bytes():
    total = 0
    for root, _dirs, files in os.walk(SESS):
        if "spill" in os.path.basename(root).lower():
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total

peak_spill = [0]
stop_spill = threading.Event()
def _poll_spill():
    while not stop_spill.is_set():
        peak_spill[0] = max(peak_spill[0], _spill_dir_bytes())
        time.sleep(0.5)
threading.Thread(target=_poll_spill, daemon=True).start()
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

# object-store spill bytes (grpc memory_summary is unavailable in this
# sandbox): end-of-run dir size plus the polled PEAK — restored objects
# delete their spill files, so the peak is the honest pressure number.
stop_spill.set()
spilled_mib = _spill_dir_bytes() >> 20
print(json.dumps({"wall_sec": wall, "triples": n, "checksum": checksum,
                  "spilled_mib": spilled_mib,
                  "peak_spill_mib": max(peak_spill[0], spilled_mib << 20) >> 20,
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
         _CHILD % {"cpus": CPUS, "corpus": CORPUS, "docs": DOCS, "seed": SEED,
                   "objmem": int(OBJ_GIB * (1 << 30))}],
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
        "object_store_gib": OBJ_GIB or None,
        "wall_sec_run1": r1["wall_sec"],
        "wall_sec_run2": r2["wall_sec"],
        "triples": r1["triples"],
        "checksum": r1["checksum"],
        "checksum_match": True,
        "triples_per_sec": r1["triples_per_sec"],
        "docs_per_sec": r1["docs_per_sec"],
        "spilled_mib_run1": r1["spilled_mib"],
        "spilled_mib_run2": r2["spilled_mib"],
        "peak_spill_mib_run1": r1.get("peak_spill_mib", 0),
        "peak_spill_mib_run2": r2.get("peak_spill_mib", 0),
        "peak_used_gib_run1": round(peak1 / 1048576, 1),
        "peak_used_gib_run2": round(peak2 / 1048576, 1),
    }))


if __name__ == "__main__":
    main()
