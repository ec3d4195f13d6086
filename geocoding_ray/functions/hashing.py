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


def char_shingles_batch(texts: list[str], k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """k-char shingle hashes for a WHOLE batch in one pass.

    Returns ``(hashes, offsets)`` with ``hashes[offsets[i]:offsets[i+1]]``
    the shingle hashes of doc i (NOT deduped — MinHash's min is
    multiset-invariant, so dedup is wasted work here).  Same rolling-hash
    family as :func:`char_shingles`: per-doc ``np.unique(seg)`` equals
    ``char_shingles(texts[i], k)`` exactly.

    One sliding-window hash over the concatenated byte buffer; windows
    crossing document boundaries are dropped via vectorized index
    arithmetic — no per-doc Python in the hot path (short docs < k bytes
    fall back to the whole-text hash, looped, but they are rare).
    """
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(texts))
    boff = np.concatenate([[0], np.cumsum(lens)])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    return char_shingles_flat(buf, boff, k)


def char_shingles_flat(data: np.ndarray, byte_offsets: np.ndarray, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Shingle-hash core over a flat byte buffer + per-doc byte offsets
    (e.g. the zero-copy :func:`string_byte_view` of an Arrow column).
    Returns ``(hashes, offsets)`` as in :func:`char_shingles_batch`."""
    byte_offsets = np.asarray(byte_offsets, dtype=np.int64)
    n = len(byte_offsets) - 1
    starts, lens = byte_offsets[:-1], np.diff(byte_offsets)
    wcnt = np.maximum(lens - k + 1, 0)
    long_mask = lens >= k
    fcnt = np.where(long_mask, wcnt, (lens > 0).astype(np.int64))
    offsets = np.concatenate([[0], np.cumsum(fcnt)])
    out = np.empty(offsets[-1], dtype=np.uint64)
    if long_mask.any():
        base = int(_SHINGLE_BASE)
        pows = np.array([pow(base, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64)
        # k shifted 1-D multiply-adds keep temporaries O(m) — the
        # previous (m, k) uint64 sliding-window temp was ~8k x the text
        # buffer per batch (round-2 advice)
        nw = len(data) - k + 1
        h_all = np.zeros(max(nw, 0), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h_all += data[j : nw + j].astype(np.uint64) * pows[j]
        # per-doc window ranges -> flat indices into h_all and out
        wc = np.where(long_mask, wcnt, 0)
        doc_of = np.repeat(np.arange(n), wc)
        within = np.arange(wc.sum()) - np.repeat(np.cumsum(wc) - wc, wc)
        out[offsets[:-1][doc_of] + within] = h_all[starts[doc_of] + within]
    for i in np.nonzero((lens > 0) & ~long_mask)[0]:
        out[offsets[i]] = _hash64_bytes(data[starts[i] : byte_offsets[i + 1]].tobytes())
    return out, offsets


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


def minhash_signature_batch(hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signatures for a whole batch: (n_docs, num_perm) uint32.

    Per-doc result is identical to :func:`minhash_signature` on the
    doc's shingle set.  Vectorized: the universal hash is computed over
    ALL shingles at once (chunked over permutations to bound memory) and
    reduced per doc with ``np.minimum.reduceat`` — no per-doc Python.
    """
    n = len(offsets) - 1
    num_perm = len(a)
    sig = np.full((n, num_perm), 0xFFFF_FFFF, dtype=np.uint32)
    if len(hashes) == 0:
        return sig
    x = (np.asarray(hashes, dtype=np.uint64) & _MERSENNE61).astype(np.uint64)
    cnt = np.diff(offsets)
    ne = cnt > 0
    starts_ne = np.asarray(offsets[:-1][ne], dtype=np.int64)
    chunk = 16  # perms per pass: bounds the (chunk, n_shingles) temp
    with np.errstate(over="ignore"):
        for p0 in range(0, num_perm, chunk):
            p1 = min(p0 + chunk, num_perm)
            hv = (a[p0:p1, None] * x[None, :] + b[p0:p1, None]) >> np.uint64(32)
            sig[np.ix_(ne, np.arange(p0, p1))] = np.minimum.reduceat(hv, starts_ne, axis=1).T.astype(np.uint32)
    return sig


_BAND_MIX = np.uint64(0xFF51AFD7ED558CCD)  # splitmix64 finalizer constant


def minhash_bands_batch(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Band hashes for a batch of signatures: (n_docs, num_bands) uint64.

    Polynomial combine of each band's rows + a splitmix-style final mix —
    equal signature chunks map to equal hashes (the LSH contract);
    distinct chunks collide with ~2^-64 probability.  Fully vectorized
    (the previous per-doc blake2b loop was the band-hash hot spot).
    """
    n, num_perm = sig.shape
    rows = num_perm // num_bands
    chunks = sig.reshape(n, num_bands, rows).astype(np.uint64)
    with np.errstate(over="ignore"):
        pows = _SHINGLE_BASE ** np.arange(rows, dtype=np.uint64)
        h = (chunks * pows[None, None, :]).sum(axis=2)
        # avalanche so near-equal chunks don't produce near-equal keys
        h ^= h >> np.uint64(33)
        h *= _BAND_MIX
        h ^= h >> np.uint64(33)
    return h


def minhash_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Band hashes (uint64, one per band) of a single signature."""
    return minhash_bands_batch(sig[None, :], num_bands)[0]


def polyhash_flat(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Polynomial hash (base FNV-64, mod 2^64, splitmix-mixed) of each
    byte segment ``flat[offsets[i]:offsets[i+1]]`` — one vectorized pass
    for ANY number of variable-length strings.

    Trick: with B odd, B^-1 mod 2^64 exists, so the position-independent
    segment hash sum(b_i * B^(e-1-i)) factors into prefix sums of
    b_i * B^-i scaled by B^(e-1) — all computable with cumsum/cumprod
    under uint64 wraparound.  Empty segments hash to the mixed 0.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    m = len(flat)
    if m:
        B = _SHINGLE_BASE
        Binv = np.uint64(pow(int(B), -1, 1 << 64))
        with np.errstate(over="ignore"):
            pinv = np.multiply.accumulate(np.full(m, Binv, dtype=np.uint64))
            pinv = np.concatenate([[np.uint64(1)], pinv[:-1]])  # B^-i
            bpow = np.multiply.accumulate(np.full(m, B, dtype=np.uint64))
            bpow = np.concatenate([[np.uint64(1)], bpow[:-1]])  # B^i
            pref = np.concatenate([[np.uint64(0)], np.cumsum(flat.astype(np.uint64) * pinv, dtype=np.uint64)])
            s, e = offsets[:-1], offsets[1:]
            ne = e > s
            out[ne] = bpow[e[ne] - 1] * (pref[e[ne]] - pref[s[ne]])
    with np.errstate(over="ignore"):
        out ^= out >> np.uint64(33)
        out *= _BAND_MIX
        out ^= out >> np.uint64(33)
    return out


def string_byte_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, byte_offsets) view of an Arrow string array
    (offsets are absolute indices into the data buffer)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, dtype=np.uint8)
    return data, off


def polyhash_strings(arr) -> np.ndarray:
    """uint64 content hash per string of an Arrow string array, fully
    vectorized (the batch replacement for per-string blake2b in hot
    token-hashing paths; family differs from :func:`stable_u64`)."""
    data, off = string_byte_view(arr)
    return polyhash_flat(data, off)


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
