"""Multimodal span processing — image/audio/table spans as opaque refs with
typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are NOT installed in this container, so
``_decode`` is a clearly-marked deterministic STUB (seeded feature vector
derived from the media_ref hash). Everything around it — the span
flattening, the Arrow schema, the actor signature, batch sizing, the
output layout — is the real Ray-side plumbing a GPU decode stage would
use (swap ``_decode`` for PIL/torchaudio and add ``num_gpus``).

Memory note: real binary payloads make rows wide → use small
``batch_size`` (≤64) so batch × concurrency fits the worker heap, and keep
``batch_format="pyarrow"`` (binary round-trips poorly through pandas).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

MEDIA_FEATURE_DIM = 32

MEDIA_SPANS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)


def flatten_media_spans(docs_ds: rd.Dataset) -> rd.Dataset:
    """documents (doc_id, spans) → one row per NON-text span."""

    def flatten(batch: pa.Table) -> pa.Table:
        doc_id, kind, ref, off = [], [], [], []
        for d, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for s in spans or []:
                if s["kind"] != "text":
                    doc_id.append(d)
                    kind.append(s["kind"])
                    ref.append(s["media_ref"])
                    off.append(s["offset"])
        return pa.Table.from_pydict(
            {"doc_id": doc_id, "kind": kind, "media_ref": ref, "offset": off},
            schema=MEDIA_SPANS_SCHEMA,
        )

    return docs_ds.map_batches(flatten, batch_format="pyarrow")


def _decode_hashes(media_ref: str, kind: str) -> list[int]:
    """The integer inputs of the stub feature vector: one md5_hash64 per
    dimension (pure function of (kind, ref, dim)). Split out so the
    media_features ORACLE can verify the derivation with integer-exact
    SQL (md5_number_lower) instead of float comparisons."""
    from semantic_search_system_ray.functions.hashing import md5_hash64

    return [md5_hash64(f"{kind}:{media_ref}:{j}") for j in range(MEDIA_FEATURE_DIM)]


def _decode(media_ref: str, kind: str) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from per-dim md5 hashes
    (uniform in [-1, 1), then L2-normalized).

    A real deployment replaces this with PIL/torchvision (image),
    torchaudio (audio), or a table parser — none installable here (no
    network). Raising NotImplementedError instead would kill the smoke
    path, so the stub returns a deterministic vector; the seam is the
    ``decode`` hook on MediaFeatures. md5-derived (not RandomState) so
    the derivation inputs are SQL-recomputable (see _decode_hashes)."""
    hs = np.array(_decode_hashes(media_ref, kind), dtype=np.float64)
    v = (hs / float(1 << 64)) * 2.0 - 1.0
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


class MediaFeatures:
    """Actor stage: media spans → feature vectors + simple typed metadata.
    State (a real model / codec context) loads once per actor.

    ``decode`` is the PLUGGABLE seam: a callable ``(media_ref, kind) ->
    np.ndarray[dim]`` (e.g. a PIL/torchvision or torchaudio wrapper) plus
    its output ``dim``. Defaults to the sandbox stub; a real decoder drops
    in WITHOUT touching the pipeline — pass it through
    ``fn_constructor_kwargs`` so it ships to each actor once (pytest
    injects a fake decoder end-to-end through media_near_dups)."""

    def __init__(self, decode=None, dim: int | None = None):
        self.decode = decode if decode is not None else _decode
        self.dim = dim if dim is not None else MEDIA_FEATURE_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [np.asarray(self.decode(r, k), dtype=np.float32).tolist()
                 for r, k in zip(refs, kinds)]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "kind": batch.column("kind"),
                "offset": batch.column("offset"),
                "features": pa.array(feats, pa.list_(pa.float32(), self.dim)),
            }
        )


def media_features(
    docs_ds: rd.Dataset,
    *,
    concurrency=(1, 4),
    batch_size: int = 64,
    decode=None,
    dim: int | None = None,
) -> rd.Dataset:
    """documents (doc_id, spans) → one feature row per media span.
    ``decode``/``dim`` inject a real decoder (see MediaFeatures)."""
    kwargs = {}
    if decode is not None or dim is not None:
        kwargs["fn_constructor_kwargs"] = {"decode": decode, "dim": dim}
    return flatten_media_spans(docs_ds).map_batches(
        MediaFeatures, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size, **kwargs,
    )


def media_near_dups(
    docs_ds: rd.Dataset,
    *,
    threshold: float = 0.99,
    strategy: str = "auto",
    concurrency=(1, 4),
    decode=None,
    dim: int | None = None,
) -> rd.Dataset:
    """Media near-dup pairs — joins the media FEATURE vectors back into the
    dedup suite (media is a first-class column, not a dead end): decode →
    feature vectors → embedding-cosine near-dup over
    ``stages.dedup.embedding_cosine_dups`` (exact broadcast below its
    threshold, LSH-bucketed at scale). Span identity is
    ``doc_id#offset#media_ref`` so the pair list names both the document
    and the span; cos ≥ threshold pairs ≈ re-used media across docs (the
    stub features are injective in media_ref, so ≥0.99 ⇒ same ref)."""
    from semantic_search_system_ray.stages.dedup import embedding_cosine_dups

    feats = media_features(
        docs_ds, concurrency=concurrency, decode=decode, dim=dim
    )

    def keyed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        span_id = pc.binary_join_element_wise(
            t.column("doc_id"),
            pc.cast(t.column("offset"), pa.string()),
            t.column("media_ref"),
            "#",
        )
        return pa.Table.from_pydict(
            {"span_id": span_id, "features": t.column("features")}
        )

    return embedding_cosine_dups(
        feats.map_batches(keyed, batch_format="pyarrow"),
        id_col="span_id", vec_col="features",
        threshold=threshold, strategy=strategy,
    )


def media_kind_stats(docs_ds: rd.Dataset) -> rd.Dataset:
    """Per-kind span counts — cheap sanity aggregate over media spans."""
    media = flatten_media_spans(docs_ds)
    return media.groupby("kind").count()


MEDIA_SAMPLE_STRIDE = 2
MEDIA_MAX_CHUNKS = 8

FRAME_SAMPLE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("n_chunks", pa.int64()),
        pa.field("chunk_idx", pa.int64()),
        pa.field("chunk_sig", pa.string()),
    ]
)


class MediaFrameSampler:
    """Actor stage: media spans → sampled frame/chunk rows (every
    ``stride``-th chunk of each asset) — the frame-sampling shape a
    video/audio training pipeline needs (decode only the frames you
    keep, 1:stride data reduction BEFORE any heavy model stage).

    ``duration`` is the pluggable seam (a real probe reads container
    metadata — ffprobe / torchaudio.info); the sandbox stub derives a
    deterministic 1..max_chunks count from the asset ref's md5 so the
    layout is SQL-recomputable. ``chunk_sig`` stands in for the decoded
    frame payload (a real sampler emits tensors; the md5 signature keeps
    the gate integer-exact)."""

    def __init__(self, stride: int = MEDIA_SAMPLE_STRIDE,
                 max_chunks: int = MEDIA_MAX_CHUNKS, duration=None):
        from semantic_search_system_ray.functions.hashing import md5_hash64

        self._h = md5_hash64
        self.stride = stride
        self.max_chunks = max_chunks
        self.duration = duration if duration is not None else (
            lambda ref, kind: 1 + self._h(f"{kind}:{ref}:dur") % self.max_chunks
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in FRAME_SAMPLE_SCHEMA.names}
        for d, k, r, o in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("offset").to_pylist(),
        ):
            n = int(self.duration(r, k))
            for i in range(0, n, self.stride):
                out["doc_id"].append(d)
                out["kind"].append(k)
                out["media_ref"].append(r)
                out["offset"].append(o)
                out["n_chunks"].append(n)
                out["chunk_idx"].append(i)
                out["chunk_sig"].append(
                    f"{self._h(f'{k}:{r}:chunk:{i}'):016x}"
                )
        return pa.Table.from_pydict(out, schema=FRAME_SAMPLE_SCHEMA)


def media_frame_sample(
    docs_ds: rd.Dataset,
    *,
    stride: int = MEDIA_SAMPLE_STRIDE,
    max_chunks: int = MEDIA_MAX_CHUNKS,
    concurrency=(1, 4),
    batch_size: int = 64,
    duration=None,
) -> rd.Dataset:
    """documents (doc_id, spans) → sampled chunk rows per media span
    (see MediaFrameSampler). ``duration`` injects a real metadata probe
    via fn_constructor_kwargs (ships once per actor)."""
    kwargs = {}
    if duration is not None:
        kwargs["fn_constructor_kwargs"] = {"duration": duration,
                                           "stride": stride,
                                           "max_chunks": max_chunks}
    elif stride != MEDIA_SAMPLE_STRIDE or max_chunks != MEDIA_MAX_CHUNKS:
        kwargs["fn_constructor_kwargs"] = {"stride": stride,
                                           "max_chunks": max_chunks}
    return flatten_media_spans(docs_ds).map_batches(
        MediaFrameSampler, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size, **kwargs,
    )
