"""CLI entry point — the ``ray job submit`` surface of the engine.

Usage (local or as a Ray job driver script):

    python -m semantic_search_system_ray kg-build \
        --documents /data/corpus/documents \
        --taxonomy /data/corpus/taxonomy.parquet \
        --phrase-docs /data/corpus/phrase_docs \
        --out /data/kg_out [--num-parts 64] [--num-cpus 32]

    python -m semantic_search_system_ray synth --out /tmp/corpus --docs 10000

Runs the checkpointed runner (Phase A per-partition with manifest commits,
Phase B global finalize), so re-submitting the same job resumes from the
last committed partition. This script OWNS the Ray session (guarded init);
library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="semantic_search_system_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg-build", help="checkpointed KG build (resumable)")
    kg.add_argument("--documents", required=True)
    kg.add_argument("--taxonomy", required=True)
    kg.add_argument("--phrase-docs", required=True)
    kg.add_argument("--out", required=True)
    kg.add_argument("--num-parts", type=int, default=64)
    kg.add_argument("--num-cpus", type=int, default=None)

    syn = sub.add_parser("synth", help="generate a seeded synthetic corpus")
    syn.add_argument("--out", required=True)
    syn.add_argument("--docs", type=int, default=10_000)
    syn.add_argument("--seed", type=int, default=42)
    syn.add_argument("--shards", type=int, default=32)

    rt = sub.add_parser(
        "refresh-taxonomy",
        help="incremental rebuild after a taxonomy edit (only the "
             "IN_TOPIC/RELATES_TO_DOC branches recompute; committed "
             "extraction partitions are reused untouched)",
    )
    rt.add_argument("--taxonomy", required=True,
                    help="topic->phrases JSON (reference topic_mapping.json "
                         "shape) or a (broad_topic, phrase) parquet file")
    rt.add_argument("--phrase-docs", required=True)
    rt.add_argument("--out", required=True, help="existing KG out dir (manifest)")
    rt.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser(
        "query",
        help="run any registered queries() pipeline over an sf directory "
             "(the full operator catalog; `query --list` prints the names)",
    )
    q.add_argument("name", nargs="?", help="query name (see --list)")
    q.add_argument("--sf", default="/root/testdata/sf0.01",
                   help="table directory (TPC-H-ish parquet files)")
    q.add_argument("--list", action="store_true", dest="list_names")
    q.add_argument("--out", default=None,
                   help="optional parquet output path (default: print head)")
    q.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    def _registry():
        # the full catalog lives in the driver-contract module when the
        # repo root is importable; the package registry is the fallback
        try:
            import __ray_entry__ as entry

            return entry.queries()
        except ImportError:
            from semantic_search_system_ray.pipelines.queries import QUERIES

            return dict(QUERIES)

    if args.cmd == "query" and args.list_names:
        for name in sorted(_registry()):
            print(name)
        return 0

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if getattr(args, "num_cpus", None):
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from semantic_search_system_ray.context import tune

    tune(int(ray.cluster_resources().get("CPU", 8)))

    try:
        if args.cmd == "synth":
            from semantic_search_system_ray.sources.synth import write_corpus_parallel

            write_corpus_parallel(args.out, n_docs=args.docs, seed=args.seed,
                                  num_shards=args.shards)
            print(json.dumps({"out": args.out, "docs": args.docs}))
            return 0

        import pyarrow.parquet as pq

        import ray.data as rd

        if args.cmd == "query":
            reg = _registry()
            if not args.name or args.name not in reg:
                print(json.dumps({"error": "unknown query",
                                  "hint": "use `query --list`"}))
                return 2
            out = reg[args.name](args.sf)
            if args.out:
                (out if hasattr(out, "write_parquet")
                 else rd.from_arrow(
                     out if not hasattr(out, "to_arrow") else out.to_arrow()
                 )).write_parquet(args.out)
                print(json.dumps({"query": args.name, "out": args.out}))
            else:
                df = out.to_pandas() if hasattr(out, "to_pandas") else out
                print(df.head(20).to_string() if hasattr(df, "head") else df)
            return 0

        if args.cmd == "refresh-taxonomy":
            from semantic_search_system_ray.pipelines.runner import refresh_taxonomy
            from semantic_search_system_ray.sources.jsonio import load_taxonomy_json

            if args.taxonomy.endswith(".json"):
                tax_tbl = load_taxonomy_json(args.taxonomy).to_table()
            else:
                tax_tbl = pq.read_table(args.taxonomy)
            triples = refresh_taxonomy(
                tax_tbl, rd.read_parquet(args.phrase_docs), args.out
            )
            print(json.dumps({"out": args.out, "triples": triples.count()}))
            return 0

        from semantic_search_system_ray.pipelines.runner import run_kg
        from semantic_search_system_ray.sources.synth import build_gazetteer
        from semantic_search_system_ray.state.manifest import Manifest

        res = run_kg(
            args.documents,
            pq.read_table(args.taxonomy),
            rd.read_parquet(args.phrase_docs),
            build_gazetteer(),
            args.out,
            num_parts=args.num_parts,
        )
        m = Manifest(args.out)
        rec = m.record("triples", 0)
        print(json.dumps({
            "out": args.out,
            "triples": rec.rows_out if rec else None,
            "partitions": m.totals("raw_triples"),
            # canon_entries = NON-IDENTITY merge count in every regime
            # (regime-1 dicts include identity entries; counting them
            # would make the metric jump 4 orders of magnitude across the
            # regime threshold and break round-over-round comparison)
            "canon_entries": (
                sum(1 for k, v in res.canon.items() if k != v)
                if isinstance(res.canon, dict)
                else res.canon.count()  # regime-3 map is non-identity-only
            ),
        }))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
