"""Deterministic hashing primitives: stable 64-bit hashes, content-derived
doc ids, MinHash signatures, SimHash, shingles.

Design notes (scale):
- All hashes are process-independent (blake2b / numpy arithmetic, never
  Python ``hash()``) so re-runs and multi-node runs agree — required for
  idempotent checkpoint resume (SURVEY §4 "Idempotence") and for
  hash-partitioned dedup keys.
- MinHash uses the classic universal-hash family (a*x+b mod p) over 64-bit
  base hashes, vectorized with numpy — one signature per row, computed
  batch-at-a-time inside ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE_P = (1 << 61) - 1
_MAX_H = (1 << 32) - 1


def stable_hash64(s: str) -> int:
    """Stable unsigned 64-bit hash of a string (blake2b, cross-process)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def stable_hash128_hex(s: str) -> str:
    """Stable 128-bit content hash (blake2b, hex). Use this — not the
    64-bit hash — as the dedup shuffle key: at 10^9–10^12 docs, 64-bit
    birthday collisions become probable and would silently merge distinct
    documents; 128 bits keep collision odds negligible while still tiny
    relative to the text kept out of the shuffle."""
    return hashlib.blake2b(s.encode("utf-8"), digest_size=16).hexdigest()


def content_doc_id(content: str, prefix: str = "doc") -> str:
    """Deterministic surrogate id from content hash — replaces the
    reference's global auto-increment id (ingest/pr_meta_store_from_local.py:20-46),
    which cannot work on a cluster (SURVEY §2.2 M5)."""
    h = hashlib.blake2b(content.encode("utf-8"), digest_size=12).hexdigest()
    return f"{prefix}-{h}"


def word_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """k-word shingles; falls back to the whole token list if shorter."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def char_ngrams(s: str, n: int = 3) -> set[str]:
    """Character n-gram set (used for Jaccard similarity / canon blocking)."""
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


_MH_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _mulmod_p(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61 - 1) elementwise on uint64 arrays WITHOUT 64-bit
    wraparound, via 31-bit split products + Mersenne shift reduction
    (2^61 ≡ 1 mod p). Inputs must be < p; broadcasting allowed."""
    P = np.uint64(_MERSENNE_P)
    m31 = np.uint64((1 << 31) - 1)
    m30 = np.uint64((1 << 30) - 1)
    s31, s30, s61 = np.uint64(31), np.uint64(30), np.uint64(2)
    a_hi, a_lo = a >> s31, a & m31          # a = a_hi·2^31 + a_lo, a_hi < 2^30
    x_hi, x_lo = x >> s31, x & m31
    # a·x = a_hi·x_hi·2^62 + (a_hi·x_lo + a_lo·x_hi)·2^31 + a_lo·x_lo
    top = (s61 * a_hi * x_hi) % P           # 2^62 ≡ 2 (mod p); product < 2^61
    mid = (a_hi * x_lo + a_lo * x_hi) % P   # each term < 2^61, sum < 2^62
    # mid·2^31 mod p: mid = u·2^30 + v → u·2^61 + v·2^31 ≡ u + v·2^31
    mid = ((mid >> s30) + ((mid & m30) << s31)) % P
    low = (a_lo * x_lo) % P                 # < 2^62
    return (top + mid + low) % P


def minhash_signature(shingles, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """MinHash signature (uint32[num_perm]) of a shingle set, using a
    genuinely universal hash family (a·x + b) mod p over the 61-bit
    Mersenne prime — the multiply is done with split-product Mersenne
    reduction (``_mulmod_p``), not uint64 wraparound, so the pairwise
    collision bound (and with it the Jaccard-estimate guarantee) holds.

    Empty input → all ``0xFFFFFFFF`` (matches nothing except other empties).
    """
    key = (num_perm, seed)
    if key not in _MH_CACHE:
        _MH_CACHE[key] = _minhash_params(num_perm, seed)
    a, b = _MH_CACHE[key]
    if not shingles:
        return np.full(num_perm, _MAX_H, dtype=np.uint32)
    # md5-based shingle hash (== DuckDB md5_number_lower) so the whole
    # signature is recomputable in SQL (text_oracles.sql_minhash_clusters);
    # uniformity is equivalent to the previous blake2b slice
    base = np.array([md5_hash64(s) for s in shingles], dtype=np.uint64)
    base %= np.uint64(_MERSENNE_P)
    # (num_shingles, num_perm) universal hashes; min over shingles
    hv = (_mulmod_p(base[:, None], a[None, :]) + b) % np.uint64(_MERSENNE_P)
    return (hv.min(axis=0) & np.uint64(_MAX_H)).astype(np.uint32)


def md5_hash64(s: str) -> int:
    """Unsigned 64-bit token hash matching DuckDB's ``md5_number_lower``
    (bytes 8..16 of the md5 digest, little-endian) — chosen for simhash so
    the signature is RECOMPUTABLE in plain SQL and the simhash query sits
    on the driver's hash gate. Bit quality is equivalent to any md5 slice;
    blake2b (stable_hash64) stays the default everywhere else."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token unigrams (frequency-weighted), md5-based
    per-token hash (see md5_hash64 — SQL-recomputable)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    # frequency weighting via unique+counts: one hash per DISTINCT token
    uniq, counts = np.unique(np.array(tokens, dtype=object), return_counts=True)
    for t, c in zip(uniq, counts):
        h = md5_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), c, -c)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
