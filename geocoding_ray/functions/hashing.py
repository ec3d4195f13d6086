"""Hashing / sketching kernels for dedup and fingerprinting.

MinHash, SimHash, shingling, rolling (polynomial) fingerprints — all
vectorized numpy, deterministic, seed-free (constants fixed).  These back
the training-data-pipeline operators (exact/near dedup, fingerprinting)
that the engine adds beyond the reference's geocoding surface.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE61 = np.uint64((1 << 61) - 1)
_MAXU32 = np.uint64(0xFFFF_FFFF)


def _hash64_bytes(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def stable_u64(strings) -> np.ndarray:
    """Stable 64-bit content hash per string (blake2b-8), as uint64."""
    return np.array([_hash64_bytes(s.encode("utf-8")) for s in strings], dtype=np.uint64)


def md5_hex(strings) -> list[str]:
    """md5 hexdigest per string — matches DuckDB's ``md5()`` for the
    oracle-checked exact-dedup / fingerprint queries."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


_SHINGLE_BASE = np.uint64(1099511628211)  # FNV-64 prime


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-char shingle hash set (uint64) of a normalized text.

    Vectorized polynomial rolling hash over the UTF-8 bytes (wraparound
    mod 2^64) — no per-shingle digest calls; collisions are negligible
    for MinHash purposes and the family is fixed/deterministic.
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        return stable_u64([text]) if text else np.zeros(0, dtype=np.uint64)
    base = int(_SHINGLE_BASE)
    pows = np.array([pow(base, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (win * pows[None, :]).sum(axis=1)
    return np.unique(h)


def minhash_params(num_perm: int = 64, seed: int = 12345) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for universal hashing
    h_i(x) = ((a_i * x + b_i) mod p) over the Mersenne prime 2^61-1."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint32 per permutation) of one shingle set."""
    num_perm = len(a)
    if len(shingle_hashes) == 0:
        return np.full(num_perm, 0xFFFF_FFFF, dtype=np.uint32)
    x = (shingle_hashes & _MERSENNE61).astype(np.uint64)
    # (num_perm, n) universal hashes; mod-Mersenne via multiply in python
    # ints is slow, so use float-safe 64-bit mult with overflow wrap: the
    # product wraps mod 2^64 which is still a fixed deterministic hash
    # family (not exactly mod-p universal, but uniform enough for LSH and
    # fully reproducible).
    hv = (a[:, None] * x[None, :] + b[:, None]) >> np.uint64(32)
    return hv.min(axis=1).astype(np.uint32)


def minhash_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Band hashes (uint64, one per band) of a signature for LSH bucketing."""
    num_perm = len(sig)
    rows = num_perm // num_bands
    out = np.empty(num_bands, dtype=np.uint64)
    for bnd in range(num_bands):
        chunk = sig[bnd * rows : (bnd + 1) * rows]
        out[bnd] = _hash64_bytes(chunk.tobytes())
    return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token-hash multiset."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    w = np.ones(len(token_hashes)) if weights is None else np.asarray(weights, dtype=np.float64)
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    out = 0
    for i in range(64):
        if score[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays (broadcasts)."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(*x.shape, 8), axis=-1).sum(axis=-1).astype(np.int64)


def rolling_fingerprint(text: str, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the whole text (document fingerprint)."""
    h = 0
    for ch in text.encode("utf-8"):
        h = (h * base + ch) % mod
    return h


def ngram_set(tokens: list[str], n: int = 3) -> np.ndarray:
    """Token n-gram hash set for Jaccard similarity."""
    if len(tokens) < n:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    return stable_u64(sorted(set(grams))) if grams else np.zeros(0, dtype=np.uint64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard similarity of two uint64 hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=False))
    union = len(np.union1d(a, b))
    return inter / union if union else 1.0
