"""Worker-loss chaos check: SIGKILL Ray worker processes mid-extract and
prove the flagship completes with a BIT-IDENTICAL triple checksum.

This is the multi-node story the sandbox can actually exercise: on a real
cluster, losing an executor (node drain, OOM-kill, spot preemption) must
not corrupt or change the output — Ray reconstructs lost tasks from
lineage and the engine's output is block-order invariant, so the rerun
checksum equality is exact, not statistical. The reference has no
analogue (its multiprocessing pool dies with the worker; the run restarts
from its JSON checkpoint at doc granularity).

Method: two fresh child processes over the SAME prebuilt corpus —
(1) baseline run; (2) chaos run where a killer thread SIGKILLs up to
``n_kills`` worker processes whose process title matches the running
stage (``ray::MapBatches`` task workers, or ``ray::MapWorker`` actor-pool
members with ``--mode actors``) at fixed delays into the build. Parent
asserts checksum equality and prints one JSON line.
Usage: ``python tools/chaos_worker_kill.py [--docs 400000] [--mode
tasks|actors]`` — ``tasks`` kills stateless extract workers (task-lineage
retry), ``actors`` kills stateful DocNLP actor-pool members mid-enrich
(actor restart + task retry; state rebuilt by ``__init__``).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, signal, sys, threading, time

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
    write_corpus_parallel(corpus, n_docs=%(docs)d, seed=42, num_shards=128)
    open(corpus + "/_COMPLETE", "w").write("ok")

killed = []
MODE = %(mode)r
TITLE = "ray::MapWorker" if MODE == "actors" else "ray::MapBatches"


def _killer(delay, want):
    # kill workers ACTIVELY RUNNING the extract task: Ray retitles worker
    # processes "ray::<task>" while they execute, so the match can't hit
    # raylet/GCS/idle workers
    time.sleep(delay)
    for pid in os.listdir("/proc"):
        if len(killed) >= want:
            break
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode(errors="replace")
        except OSError:
            continue
        if TITLE in cmd and int(pid) != os.getpid():
            try:
                os.kill(int(pid), signal.SIGKILL)
                killed.append(int(pid))
            except OSError:
                pass


if %(n_kills)d:
    for i in range(%(n_kills)d):
        threading.Thread(
            target=_killer, args=(3.0 + 2.0 * i, i + 1), daemon=True
        ).start()

t0 = time.time()
if MODE == "actors":
    # stateful actor-pool stage: the DocNLP pool holds a compiled
    # gazetteer matcher per actor; a killed member must restart, rebuild
    # state in __init__, and its in-flight batches must retry
    from semantic_search_system_ray.stages.docnlp import enrich_documents
    import pyarrow as pa
    from semantic_search_system_ray.functions.hashing import stable_hash64

    docs = rd.read_parquet(corpus + "/documents").limit(%(docs)d // 4)
    enriched = enrich_documents(
        docs, build_gazetteer(),
        concurrency=(2, max(2, %(cpus)d // 2)), batch_size=256, embed=True,
    )

    mod = (1 << 31) - 1

    def row_sum(batch: pa.Table) -> pa.Table:
        s = 0
        ids = batch.column("doc_id").to_pylist()
        sums = batch.column("summary").to_pylist()
        ents = batch.column("entities").to_pylist()
        tops = batch.column("topics").to_pylist()
        for i, sm, e, tp in zip(ids, sums, ents, tops):
            key = "\x00".join([str(i), sm or "", str(len(e or [])),
                               str(len(tp or []))])
            s = (s + stable_hash64(key)) %% mod
        return pa.Table.from_pydict({"s": pa.array([s], pa.int64())})

    part = enriched.map_batches(row_sum, batch_format="pyarrow")
    checksum = int(part.sum("s") or 0) %% mod
    n = int(docs.count())
else:
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
print(json.dumps({"wall_sec": round(time.time() - t0, 1), "triples": n,
                  "checksum": checksum, "killed": killed}))
ray.shutdown()
"""


def _run_child(corpus: str, docs: int, cpus: int, n_kills: int,
               mode: str) -> dict:
    src = CHILD % {"corpus": corpus, "docs": docs, "cpus": cpus,
                   "n_kills": n_kills, "mode": mode}
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", src], env=env, capture_output=True,
        text=True, check=True, cwd=REPO,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--kills", type=int, default=2)
    ap.add_argument("--mode", choices=["tasks", "actors"], default="tasks")
    args = ap.parse_args()
    corpus = f"/tmp/kg_bench_corpus_sf0.1_{args.docs}_42"

    base = _run_child(corpus, args.docs, args.cpus, 0, args.mode)
    chaos = _run_child(corpus, args.docs, args.cpus, args.kills, args.mode)
    assert chaos["killed"], "chaos run killed no workers — raise the delay"
    assert base["checksum"] == chaos["checksum"], (base, chaos)
    assert base["triples"] == chaos["triples"]
    print(json.dumps({
        "metric": f"worker_kill_chaos ({args.mode}: SIGKILL mid-run)",
        "docs": args.docs,
        "baseline_sec": base["wall_sec"],
        "chaos_sec": chaos["wall_sec"],
        "workers_killed": len(chaos["killed"]),
        "triples": base["triples"],
        "checksum_match": True,
    }))


if __name__ == "__main__":
    main()
