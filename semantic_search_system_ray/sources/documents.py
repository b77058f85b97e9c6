"""Document-corpus source/sink.

The authoritative input is a Lance table of interleaved text+media documents
(BASELINE.json ``input_hint``). ``lance`` is not importable in this sandbox
(no network to install it), so the source is pluggable: ``read_lance`` when
the module is importable, else a Parquet directory with the identical Arrow
schema (``schemas.DOCUMENTS_SCHEMA``). Same logical table either way.

``text_table_to_spans`` adapts a flat text table (the driver's
``documents.parquet``: doc_id:int64, text:string, ...) into the spans shape
deterministically — sentence-split the text into text spans and interleave
media spans at hash-derived positions — so the flagship pipeline can run on
the driver's TPC-H-ish testdata too.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from semantic_search_system_ray.functions.text import sentence_split
from semantic_search_system_ray.schemas import DOCUMENTS_SCHEMA


def read_documents(path: str, **kwargs) -> "rd.Dataset":
    """Read the document corpus: Lance if available, else Parquet dir/file."""
    try:
        import lance  # noqa: F401

        return rd.read_lance(path, **kwargs)
    except ImportError:
        return rd.read_parquet(path, **kwargs)


def write_documents(ds: "rd.Dataset", path: str, **kwargs) -> None:
    ds.write_parquet(path, **kwargs)


def _spans_for_text(doc_id: str, text: str) -> list[dict]:
    """Deterministic spans from flat text: sentences + interleaved media.

    A media span is injected after sentence ``i`` when
    md5_hash64(doc_id:i) % 7 == 0 (~14%, mirroring the reference corpus'
    measured media fraction); kind and asset ref derive from the same
    hash. md5 (not blake2b) so the span layout is RECOMPUTABLE in DuckDB
    SQL (functions/hashing.md5_hash64 == ``md5_number_lower``) — this puts
    the media_features query on the driver's hash gate
    (text_oracles.sql_media_features). Offsets are cumulative and
    strictly monotone.
    """
    from semantic_search_system_ray.functions.hashing import md5_hash64

    sentences = sentence_split(text) or ([text] if text else [])
    # word-soup testdata has no sentence punctuation: chunk every 12 words
    if len(sentences) == 1 and len(text) > 200:
        words = text.split()
        sentences = [" ".join(words[i : i + 12]) for i in range(0, len(words), 12)]
    spans: list[dict] = []
    offset = 0
    for i, sent in enumerate(sentences):
        spans.append({"kind": "text", "text": sent, "media_ref": "", "offset": offset})
        offset += len(sent) + 1
        h = md5_hash64(f"{doc_id}:{i}")
        if h % 7 == 0:
            # refs draw from a shared 64-asset pool (web corpora reuse the
            # same images/clips across pages) — so cross-doc media dedup
            # (stages/media.media_near_dups) has real duplicate structure
            kind = ("image", "audio", "table")[(h // 7) % 3]
            ref = f"media://asset-{(h // 21) % 64:02d}"
            spans.append(
                {"kind": kind, "text": "", "media_ref": ref, "offset": offset}
            )
            offset += 1
    return spans


def _to_spans_batch(batch: pa.Table) -> pa.Table:
    doc_ids = [str(v) for v in batch.column("doc_id").to_pylist()]
    texts = batch.column("text").to_pylist()
    spans = [_spans_for_text(d, t or "") for d, t in zip(doc_ids, texts)]
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": spans}, schema=DOCUMENTS_SCHEMA)


def text_table_to_spans(ds: "rd.Dataset") -> "rd.Dataset":
    """Adapt a flat (doc_id, text) table to the spans-shaped corpus."""
    return ds.map_batches(_to_spans_batch, batch_format="pyarrow")
