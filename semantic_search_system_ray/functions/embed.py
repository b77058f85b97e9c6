"""Deterministic feature-hashing text embeddings — the sandbox surrogate for
the reference's Titan / SentenceTransformer embedders.

Reference contract being mirrored (not the weights, which need network/GPU):
- 256-dim float vector, L2-normalized (nlp/pr_aws_nlp.py:100-112 requests
  ``dimensions: 256, normalize: true``; utils/create_vector_index.py:15-20
  declares knn_vector dim 256, cosine).
- Same string → same vector across processes (needed for idempotent re-runs
  and the duckdb/rows-only correctness checks).

Scheme: hash word unigrams + bigrams into ``dim`` buckets with a signed
feature-hashing trick (xxhash-free: blake2b-seeded), then L2-normalize.
Purely CPU, vectorized over a batch of strings.
"""

from __future__ import annotations

import hashlib

import numpy as np

from semantic_search_system_ray.functions.text import tokenize
from semantic_search_system_ray.schemas import EMBED_DIM


def _feature_hash(feature: str) -> tuple[int, float]:
    h = hashlib.blake2b(feature.encode("utf-8"), digest_size=8).digest()
    v = int.from_bytes(h, "little")
    return (v >> 1) % EMBED_DIM, 1.0 if (v & 1) else -1.0


def hash_embed(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Embed one string; L2-normalized float32[dim]; zero-vector for empty."""
    vec = np.zeros(dim, dtype=np.float64)
    toks = [t.lower() for t in tokenize(text)]
    feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    for f in feats:
        idx, sign = _feature_hash(f)
        vec[idx % dim] += sign
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def hash_embed_many(texts, dim: int = EMBED_DIM) -> np.ndarray:
    """Embed a sequence of strings → (len, dim) float32, rows L2-normalized."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = hash_embed(t if isinstance(t, str) else "", dim)
    return out


def hash_embed_int8(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """int8-quantized variant — the reference's experimental Cohere int8
    embedding path (test.py:18-50, ``embedding_types: ["int8"]``).
    Quantization: round(127 · v) of the L2-normalized float vector.
    (Note: the reference's ``process_and_store_document`` there always
    returns True via ``finally:`` — a bug, deliberately not mirrored.)"""
    v = hash_embed(text, dim)
    return np.clip(np.round(v * 127.0), -127, 127).astype(np.int8)
