"""Quickstart — the engine end-to-end in one script.

Generates a seeded interleaved text+media corpus, builds the knowledge
graph (flagship pipeline), runs graph analytics and a couple of
training-data curation ops over it, and prints the results. Everything
streams through ray.data Datasets; this script owns the Ray session
(library code never calls ray.init).

Run:  python examples/quickstart.py  [--docs 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from semantic_search_system_ray.pipelines.kg_build import (
        build_triples,
        edges_from_triples,
        nodes_from_triples,
    )
    from semantic_search_system_ray.sources.synth import (
        build_gazetteer,
        write_corpus_parallel,
    )
    from semantic_search_system_ray.stages.graph import bfs_hops, pagerank
    from semantic_search_system_ray.stages.dedup import minhash_lsh_clusters

    with tempfile.TemporaryDirectory() as d:
        # 1. a seeded interleaved text+media corpus (Lance-shaped schema)
        write_corpus_parallel(d, n_docs=args.docs, seed=7, num_shards=16)
        docs = rd.read_parquet(f"{d}/documents")
        print(f"corpus: {docs.count()} docs, schema {docs.schema()}")

        # 2. the flagship KG build (extraction → canon → dedup)
        res = build_triples(
            docs,
            pq.read_table(f"{d}/taxonomy.parquet"),
            rd.read_parquet(
                f"{d}/phrase_docs"
                if os.path.isdir(f"{d}/phrase_docs")
                else f"{d}/phrase_docs.parquet"
            ),
            build_gazetteer(),
            concurrency=(1, 4),
            batch_size=256,
        )
        triples = res.triples.materialize()
        print(f"kg: {triples.count()} distinct (subj, pred, obj) triples")
        print(f"    {nodes_from_triples(triples).count()} typed nodes")

        # 3. graph analytics over the KG edge set
        edges = edges_from_triples(triples).materialize()
        pr_top = pagerank(edges, iterations=3).sort(
            ["pr", "node_id"], descending=[True, False]
        ).limit(5).take_all()
        print("pagerank top-5:", [(r["node_id"], r["pr"]) for r in pr_top])

        seeds = triples.filter(expr="pred == 'HAS_TOPIC'").map_batches(
            lambda t: t.select(["obj"]).rename_columns(["node_id"]),
            batch_format="pyarrow",
        )
        reached = bfs_hops(seeds, edges, max_hops=2).count()
        print(f"bfs: {reached} nodes within 2 hops of any topic")

        # 4. a curation op: near-dup clustering over the doc texts
        flat = docs.map_batches(
            lambda t: __import__("pyarrow").Table.from_pydict(
                {"doc_id": t.column("doc_id"),
                 "text": [
                     " ".join(
                         s["text"] for s in spans if s["kind"] == "text"
                     )
                     for spans in t.column("spans").to_pylist()
                 ]}
            ),
            batch_format="pyarrow",
        )
        clusters = minhash_lsh_clusters(flat, threshold=0.6)
        n_docs = clusters.count()
        n_reps = clusters.filter(expr="doc_id == cluster").count()
        print(f"near-dup: {n_docs} docs → {n_reps} cluster representatives")

    ray.shutdown()


if __name__ == "__main__":
    main()
