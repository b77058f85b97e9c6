"""Checkpointed, resumable KG-build runner.

Two-level structure matched to where the compute lives at scale:

- **Phase A (heavy, per-partition, checkpointed)** — the NLP/extraction
  stage. Partitions are groups of input FILES (the natural unit for a
  100 TB corpus: each partition reads only its own fragments — no full
  rescans). Each partition: read → DocNLP actor pool → write raw triples +
  surface forms under ``part=<k>/`` (delete → write → atomic commit-marker,
  state/manifest.py), with lineage counters (docs in, triples out,
  checksum). A rerun skips committed partitions — the immutable version of
  the reference's ``processed``-flag work queue (ingest/pr_meta_store.py:119-139).
- **Phase B (light, global)** — canonicalization over distinct surfaces,
  taxonomy triples, final dedup, graph materialize. Rows here are orders of
  magnitude fewer than Phase A's input; it reruns from Phase A's committed
  outputs and commits as a single final partition.

Idempotence: all content is a deterministic function of the input (content
hashes, seeded kernels), so a recomputed partition writes byte-identical
rows and re-runs converge (reference analogue: OpenSearch ``_id``-keyed
upserts, SURVEY §4).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.functions.hashing import stable_hash64
from semantic_search_system_ray.pipelines.kg_build import (
    KGResult,
    adjacency_from_edges,
    distinct_rows,
    edges_from_triples,
    finalize_triples,
    nodes_from_triples,
    relates_to_doc_triples,
    taxonomy_triples,
)
from semantic_search_system_ray.stages.docnlp import extract_flat
from semantic_search_system_ray.state.manifest import Manifest


def _input_files(documents_path: str) -> list[str]:
    """Canonical (realpath'd, sorted) input-file discovery — ONE source
    of truth for the full planner and the append planner, so coverage
    matching in ``plan_append`` can never miss files because the same
    directory was spelled differently (relative path, symlink) between
    the base build and the incremental run."""
    if os.path.isdir(documents_path):
        files = sorted(
            os.path.realpath(f) for f in glob.glob(
                os.path.join(documents_path, "**", "*.parquet"),
                recursive=True,
            )
        )
    else:
        files = [os.path.realpath(documents_path)]
    return files


def plan_partitions(documents_path: str, num_parts: int) -> list[list[str]]:
    """Deterministic partition plan: sorted input files round-robined into
    ``num_parts`` groups. One file → one single-partition plan."""
    files = _input_files(documents_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {documents_path}")
    num_parts = min(num_parts, len(files))
    return [files[i::num_parts] for i in range(num_parts)]


def _read_parts(dirs: list[str]) -> rd.Dataset:
    """read_parquet over a list of partition DIRECTORIES (expanded to files
    — ray.data accepts a single dir or a list of files, not a dir list)."""
    files: list[str] = []
    for d in dirs:
        files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return rd.read_parquet(files)


def _checksum(ds: rd.Dataset, columns: list[str]) -> int:
    """Order-independent content checksum over string columns."""
    mod = (1 << 31) - 1

    def batch_sum(batch: pa.Table) -> pa.Table:
        s = 0
        for vals in zip(*[batch.column(c).to_pylist() for c in columns]):
            s = (s + stable_hash64("\x00".join(vals))) % mod
        return pa.Table.from_pydict({"s": pa.array([s], pa.int64())})

    part = ds.map_batches(batch_sum, batch_format="pyarrow")
    return int(part.sum("s") or 0) % mod


def _triples_checksum(ds: rd.Dataset) -> int:
    return _checksum(ds, ["subj", "pred", "obj"])


def _flat_checksum(ds: rd.Dataset) -> int:
    return _checksum(ds, ["rowkind", "subj", "pred", "obj"])


def run_phase_a(
    documents_path: str,
    gazetteer: dict[str, str],
    out_dir: str,
    *,
    num_parts: int = 8,
    concurrency=(1, 8),
    batch_size: int = 256,
    max_parts: int | None = None,
) -> Manifest:
    """Per-partition extraction with checkpoint commit. ``max_parts`` stops
    early after N newly-committed partitions (used by the kill/resume test
    to simulate a mid-job crash)."""
    manifest = Manifest(out_dir)
    plan = plan_partitions(documents_path, num_parts)
    done = manifest.committed("raw_triples")
    # Resume-plan guard: a committed partition's recorded file list must
    # match the CURRENT plan for that index — resuming with a different
    # num_parts or a changed input directory would silently mix old-plan
    # and new-plan partitions (dropping or double-processing documents).
    for k in sorted(done):
        rec = manifest.record("raw_triples", k)
        recorded = (rec.extra or {}).get("files") if rec else None
        current = plan[k] if k < len(plan) else None
        if recorded is not None and recorded != current:
            raise RuntimeError(
                f"resume plan mismatch for partition {k}: committed files "
                f"{recorded} != current plan {current} — rerun with the "
                "original num_parts/input, or clear the manifest"
            )
    newly = 0
    for k, files in enumerate(plan):
        if k in done:
            continue
        if max_parts is not None and newly >= max_parts:
            break
        _extract_partition(manifest, k, files, gazetteer, concurrency,
                           batch_size)
        newly += 1
    return manifest


def _extract_partition(
    manifest: Manifest,
    k: int,
    files: list[str],
    gazetteer: dict[str, str],
    concurrency,
    batch_size: int,
) -> None:
    """ONE Phase-A partition: read its files → fused DocNLP+flatten →
    block-local distinct → write → atomic commit. Shared by the full
    planner (run_phase_a) and the append planner (run_incremental).

    ``concurrency``/``batch_size`` are accepted for API symmetry with
    the enriched actor-pool mode but unused here: the flat extraction
    path is task-based and self-scaling (same contract as
    ``kg_build.build_triples`` — see its docstring)."""
    docs = rd.read_parquet(files)
    # single fused streaming pass per shard: task-based DocNLP+flatten
    # (triples + surface rows) -> block-local distinct -> write.
    # NO shuffle here: doc-contiguity of rows must survive into the
    # written files (Phase B's doc-local dedup depends on it).
    from semantic_search_system_ray.pipelines.kg_build import (
        _distinct_batch_doc_sorted,
    )

    flat = extract_flat(docs, gazetteer).map_batches(
        _distinct_batch_doc_sorted, batch_format="pyarrow", batch_size=None
    )
    raw_dir = manifest.begin_partition("raw_triples", k)
    flat.write_parquet(raw_dir)

    raw_written = rd.read_parquet(raw_dir)
    rows_out = raw_written.count()
    rows_in = docs.count()
    manifest.commit_partition(
        "raw_triples",
        k,
        rows_in=rows_in,
        rows_out=rows_out,
        checksum=_flat_checksum(raw_written),
        extra={"files": files},
    )


def plan_append(
    documents_path: str,
    manifest: Manifest,
    *,
    files_per_part: int | None = None,
) -> list[tuple[int, list[str]]]:
    """Plan ONLY the input files no committed raw_triples partition
    covers, as NEW partition indices appended after the existing ones —
    the append-only analogue of the reference's ``processed:false`` work
    queue (``/root/reference/ingest/pr_meta_store.py:55-63``): committed
    work is immutable, new files become new partitions. ``files_per_part``
    defaults to the committed plan's median files-per-partition (so delta
    partitions match the original granularity)."""
    all_files = _input_files(documents_path)
    records = manifest.records("raw_triples")
    covered: set[str] = set()
    sizes: list[int] = []
    for rec in records:
        files = (rec.extra or {}).get("files") or []
        # realpath the RECORDED side too: older manifests may carry
        # unnormalized spellings of the same files
        covered.update(os.path.realpath(f) for f in files)
        if files:
            sizes.append(len(files))
    new_files = [f for f in all_files if f not in covered]
    if not new_files:
        return []
    if files_per_part is None:
        files_per_part = sorted(sizes)[len(sizes) // 2] if sizes else 1
    next_k = (max(manifest.committed("raw_triples")) + 1) if records else 0
    plan: list[tuple[int, list[str]]] = []
    for i in range(0, len(new_files), files_per_part):
        plan.append((next_k, new_files[i: i + files_per_part]))
        next_k += 1
    return plan


def run_incremental(
    documents_path: str,
    taxonomy: pa.Table,
    phrase_docs: rd.Dataset,
    gazetteer: dict[str, str],
    out_dir: str,
    *,
    files_per_part: int | None = None,
    concurrency=(1, 8),
    batch_size: int = 256,
) -> KGResult:
    """Incremental rebuild after an APPEND to the corpus: Phase A runs
    only over uncovered files (the extraction actor pool — the dominant
    cost — touches just the delta), then Phase B (canonicalization +
    dedup + materialize; corpus-global but vocabulary-light) reruns over
    all committed parts and recommits the final store via the atomic
    flag-flip. Output is BIT-IDENTICAL to a from-scratch full rebuild of
    the grown corpus by construction (all content is a deterministic
    function of the input); the bench and pytest assert the checksums."""
    manifest = Manifest(out_dir)
    for k, files in plan_append(
        documents_path, manifest, files_per_part=files_per_part
    ):
        _extract_partition(manifest, k, files, gazetteer, concurrency,
                           batch_size)
    return run_phase_b(taxonomy, phrase_docs, out_dir)


def run_phase_b(
    taxonomy: pa.Table,
    phrase_docs: rd.Dataset,
    out_dir: str,
) -> KGResult:
    """Global canon + dedup + materialize from Phase A's committed parts."""
    manifest = Manifest(out_dir)
    parts = sorted(manifest.committed("raw_triples"))
    if not parts:
        raise RuntimeError("no committed raw_triples partitions; run Phase A first")
    raw = _read_parts([manifest.partition_dir("raw_triples", k) for k in parts])

    # same finalize structure as build_triples: class-split dedup over the
    # shards' locally-distinct flat rows; taxonomy/RELATES branches are
    # disjoint in predicate space, deduped separately and unioned after
    from semantic_search_system_ray.pipelines.kg_build import distinct_doc_partitioned

    triples, canon = finalize_triples(raw.materialize())
    tax_tbl, phrase_to_topic = taxonomy_triples(taxonomy)
    rel = distinct_doc_partitioned(
        relates_to_doc_triples(phrase_docs, phrase_to_topic),
        ["subj", "pred", "obj"],
        doc_col="obj",
    )
    triples = triples.union(rd.from_arrow(tax_tbl), rel)

    final_dir = manifest.begin_partition("triples", 0)
    triples.write_parquet(final_dir)
    triples_written = rd.read_parquet(final_dir)

    nodes_dir = manifest.begin_partition("nodes", 0)
    nodes_from_triples(triples_written).write_parquet(nodes_dir)
    edges = edges_from_triples(triples_written)
    adj_dir = manifest.begin_partition("adjacency", 0)
    adjacency_from_edges(edges).write_parquet(adj_dir)

    n_out = triples_written.count()
    rows_in = manifest.totals("raw_triples")["rows_out"]
    manifest.commit_partition(
        "triples", 0, rows_in=rows_in, rows_out=n_out,
        checksum=_triples_checksum(triples_written),
    )
    manifest.commit_partition("nodes", 0, rows_in=n_out, rows_out=rd.read_parquet(nodes_dir).count())
    manifest.commit_partition("adjacency", 0, rows_in=n_out, rows_out=rd.read_parquet(adj_dir).count())
    return KGResult(triples=triples_written, enriched=None, canon=canon)


def refresh_taxonomy(
    taxonomy: pa.Table,
    phrase_docs: rd.Dataset,
    out_dir: str,
) -> rd.Dataset:
    """Incremental rebuild after a taxonomy CRUD edit (state/taxonomy.py,
    SURVEY §2.10): ONLY the taxonomy-dependent branches (IN_TOPIC +
    RELATES_TO_DOC — predicate spaces disjoint from the doc-extracted
    triples) are recomputed; the committed doc-extracted triples are
    reused untouched, so no re-extraction of the corpus happens. Commits a
    new ``triples`` version (delete → write → marker) and returns it."""
    manifest = Manifest(out_dir)
    if 0 not in manifest.committed("triples"):
        raise RuntimeError("no committed triples; run the full build first")
    prior = rd.read_parquet(manifest.partition_dir("triples", 0))
    import pyarrow.compute as pc

    kept = prior.map_batches(
        lambda t: t.filter(
            pc.invert(
                pc.is_in(
                    t.column("pred"),
                    value_set=pa.array(["IN_TOPIC", "RELATES_TO_DOC"]),
                )
            )
        ),
        batch_format="pyarrow",
    ).materialize()  # pin BEFORE the partition dir is wiped below

    from semantic_search_system_ray.pipelines.kg_build import (
        distinct_doc_partitioned,
    )

    tax_tbl, phrase_to_topic = taxonomy_triples(taxonomy)
    rel = distinct_doc_partitioned(
        relates_to_doc_triples(phrase_docs, phrase_to_topic),
        ["subj", "pred", "obj"],
        doc_col="obj",
    )
    triples = kept.union(rd.from_arrow(tax_tbl), rel)

    final_dir = manifest.begin_partition("triples", 0)
    triples.write_parquet(final_dir)
    written = rd.read_parquet(final_dir)
    manifest.commit_partition(
        "triples", 0,
        rows_in=kept.count(), rows_out=written.count(),
        checksum=_triples_checksum(written),
        extra={"refresh": "taxonomy"},
    )
    return written


def run_kg(
    documents_path: str,
    taxonomy: pa.Table,
    phrase_docs: rd.Dataset,
    gazetteer: dict[str, str],
    out_dir: str,
    *,
    num_parts: int = 8,
    concurrency=(1, 8),
    batch_size: int = 256,
) -> KGResult:
    """Full checkpointed run (resumes automatically from the manifest)."""
    run_phase_a(
        documents_path, gazetteer, out_dir,
        num_parts=num_parts, concurrency=concurrency, batch_size=batch_size,
    )
    return run_phase_b(taxonomy, phrase_docs, out_dir)
