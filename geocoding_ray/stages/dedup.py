"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (engine extension for training-data pipelines).

Scale design (SURVEY.md §2.6 / ray guide):

* exact — add a content-hash column in a vectorized ``map_batches``,
  then hash-partition ``groupby(hash)`` with *native* Min/Count
  aggregates (no per-group Python); the shuffle moves only
  (hash, id) pairs, never payloads.
* MinHash LSH — signatures per batch (stateless, vectorized) ->
  explode to (band, band_hash, doc_id) rows -> ``groupby`` on the
  band key -> per-bucket candidate pairs -> exact-Jaccard verify.
  Buckets are tiny by construction; the all-to-all moves 16 small
  rows per doc.
* SimHash — 64-bit fingerprint per doc; near-dup = Hamming <= t
  within ``groupby`` buckets keyed by bit-bands (4x16-bit chunks:
  two dups within Hamming<=3 share at least one chunk only
  probabilistically — chunks give candidate recall, verify gives
  precision).
* embedding cosine — see ``stages/ann.py`` (same kernel, threshold
  instead of top-k).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import (
    char_shingles,
    char_shingles_batch,
    jaccard,
    minhash_bands_batch,
    minhash_params,
    minhash_signature_batch,
    ngram_set,
    polyhash_strings,
)
from ..functions.normalize import normalize_arrow, normalize_text, tokenize

# 128 perms in 8 bands of 16 rows -> LSH threshold ~(1/8)^(1/16) ~ 0.88,
# so pairs below ~0.7 Jaccard rarely collide (the corpus shares a small
# vocabulary, making shallow bands collide constantly).
NUM_PERM = 128
NUM_BANDS = 8
SHINGLE_K = 5
# Safety valve for degenerate buckets (all-identical boilerplate): a
# bucket of m docs emits m(m-1)/2 pairs; cap the per-bucket fan-out to
# the first MAX_BUCKET ids (deterministic: sorted doc_id order).  Real
# dups still pair through their other bands.
MAX_BUCKET = 64


def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from ..functions.hashing import md5_hex

    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_md5", pa.array(md5_hex(texts), type=pa.string()))


class MinHashStage:
    """Actor stage: text -> LSH band rows (band, band_hash, doc_id).

    MinHash (a, b) parameters are built once per actor in ``__init__``
    (stateful-setup-once rule); per batch the work is numpy over the
    shingle sets.
    """

    def __init__(self, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS, shingle_k: int = SHINGLE_K):
        self.a, self.b = minhash_params(num_perm)
        self.num_bands = num_bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        # whole-batch vectorized path: arrow-kernel normalize -> one
        # sliding-window shingle pass over the zero-copy string buffer ->
        # reduceat signatures -> band keys
        from ..functions.hashing import char_shingles_flat, string_byte_view

        data, boff = string_byte_view(normalize_arrow(batch.column("text")))
        sh, off = char_shingles_flat(data, boff, self.shingle_k)
        sig = minhash_signature_batch(sh, off, self.a, self.b)
        bands = minhash_bands_batch(sig, self.num_bands)  # (n, num_bands)
        # band_hash as the int64 BIT VIEW of the uint64 key: values above
        # 2^63 otherwise hit Ray's slow python-int Arrow fallback in the
        # groupby path (equality, the only thing LSH needs, is preserved)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n), type=pa.int32()),
                "band_hash": pa.array(bands.ravel().view(np.int64), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids.astype(np.int64), self.num_bands), type=pa.int64()),
            }
        )


def bucket_candidate_pairs(group: "pa.Table") -> pa.Table:
    """Per (band, band_hash) bucket: emit unordered candidate pairs."""
    ids = np.sort(np.unique(group.column("doc_id").to_numpy(zero_copy_only=False)))[:MAX_BUCKET]
    if len(ids) < 2:
        return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ia], type=pa.int64()), "b": pa.array(ids[ib], type=pa.int64())})


def verify_pairs_with_texts(batch: pa.Table, threshold: float = 0.8, shingle_k: int = SHINGLE_K) -> pa.Table:
    """Stateless verify over JOINED pair rows (a, b, text_a, text_b):
    exact shingle Jaccard, keep pairs >= ``threshold``.

    The texts arrive as COLUMNS via a distributed hash-join of the pair
    rows with the (candidate-filtered) docs table — no driver text dict,
    no actor-resident corpus subset: each task only ever holds the texts
    of the pairs in its own batch.  Texts are dictionary-encoded first
    so each DISTINCT text is normalized + shingled exactly once per
    batch (an m-doc dup cluster contributes m(m-1)/2 pair rows but only
    m shingle computations); the per-pair remainder is an intersect
    over LSH-bounded pair counts.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import char_shingles_flat, string_byte_view
    from ..functions.normalize import normalize_arrow

    a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(a)
    empty = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    if n == 0:
        return empty
    both = pa.concat_arrays(
        [
            batch.column("text_a").combine_chunks().cast(pa.string()),
            batch.column("text_b").combine_chunks().cast(pa.string()),
        ]
    )
    enc = pc.dictionary_encode(both)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ia, ib = idx[:n], idx[n:]
    data, off = string_byte_view(normalize_arrow(enc.dictionary))
    h, ho = char_shingles_flat(data, off, shingle_k)
    sets = [np.unique(h[ho[d] : ho[d + 1]]) for d in range(len(enc.dictionary))]
    sims = np.empty(n, dtype=np.float64)
    for i in range(n):
        sims[i] = jaccard(sets[ia[i]], sets[ib[i]])
    keep = sims >= threshold
    if not keep.any():
        return empty
    return pa.table(
        {
            "a": pa.array(a[keep], type=pa.int64()),
            "b": pa.array(b[keep], type=pa.int64()),
            "jaccard": pa.array(sims[keep], type=pa.float64()),
        }
    )


class JaccardVerify:
    """Actor stage: verify candidate pairs by exact shingle Jaccard.

    Small-scale / test kernel: ``texts_ref`` must hold ONLY the texts of
    docs appearing in candidate pairs.  The PIPELINE path is
    :func:`verify_pairs_with_texts` over a distributed pair<->docs join
    (no driver dict at all); this class remains for driver-free unit
    verification of the same rule.
    """

    _CACHE_CAP = 200_000

    def __init__(self, texts_ref, threshold: float = 0.8, shingle_k: int = SHINGLE_K):
        import ray

        self.texts: dict[int, str] = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.threshold = threshold
        self.shingle_k = shingle_k
        self._cache: dict[int, np.ndarray] = {}

    def _sh(self, i: int) -> np.ndarray:
        s = self._cache.get(i)
        if s is None:
            s = char_shingles(normalize_text(self.texts.get(i, "")), self.shingle_k)
            if len(self._cache) < self._CACHE_CAP:  # bound long-lived actor heaps
                self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        sims = np.array([jaccard(self._sh(int(x)), self._sh(int(y))) for x, y in zip(a, b)])
        keep = sims >= self.threshold
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(sims[keep], type=pa.float64()),
            }
        )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless stage: 64-bit SimHash per doc + 4x16-bit band keys.

    Fully vectorized: arrow-kernel tokenize -> one polynomial hash pass
    over the flat token buffer (:func:`polyhash_strings`) -> per-doc
    weighted bit-sums via ``np.add.reduceat``.  Token-hash family is the
    engine's polynomial one (rows-only operator; the family is
    engine-defined)."""
    from ..functions.normalize import tokenize_arrow

    n = batch.num_rows
    toks = tokenize_arrow(batch.column(text_col))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    doc_off = toks.offsets.to_numpy().astype(np.int64)
    doc_off = doc_off - doc_off[0]  # list array may be a slice view
    th = polyhash_strings(toks.values)
    fps = np.zeros(n, dtype=np.uint64)
    if len(th):
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
        contrib = bits * 2 - 1  # (n_tokens, 64)
        cnt = np.diff(doc_off)
        ne = cnt > 0
        score = np.zeros((n, 64), dtype=np.int64)
        if ne.any():
            score[ne] = np.add.reduceat(contrib, doc_off[:-1][ne], axis=0)
        pos = (score > 0).astype(np.uint64)
        with np.errstate(over="ignore"):
            fps = (pos << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    out = batch.append_column("simhash", pa.array(fps.astype(np.int64), type=pa.int64()))
    for bnd in range(4):
        chunk = ((fps >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int32)
        out = out.append_column(f"sim_band{bnd}", pa.array(chunk, type=pa.int32()))
    return out


def ngram_jaccard_pairs(texts_by_id: dict[int, str], n: int = 3, threshold: float = 0.5) -> pa.Table:
    """Driver-side exact n-gram Jaccard over a *small* candidate set
    (test helper / verify kernel; the distributed path is LSH->verify)."""
    ids = sorted(texts_by_id)
    sets = {i: ngram_set(tokenize(texts_by_id[i]), n) for i in ids}
    rows = []
    for ii, a in enumerate(ids):
        for b in ids[ii + 1 :]:
            j = jaccard(sets[a], sets[b])
            if j >= threshold:
                rows.append({"a": a, "b": b, "jaccard": j})
    if not rows:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()), "jaccard": pa.array([], type=pa.float64())}
        )
    return pa.Table.from_pylist(rows)


def connected_components(pairs, max_rounds: int = 10, num_partitions: int = 8):
    """Duplicate clusters from verified near-dup pairs via FULLY
    DISTRIBUTED min-label propagation: labels live in a Dataset that is
    hash-JOINED onto the edge list each round — nothing label-sized ever
    touches the driver (the only driver value per round is the int64
    label-sum convergence checksum, which strictly decreases until the
    fixpoint).

    ``pairs``: a ray.data.Dataset or pyarrow.Table with int64 columns
    (a, b).  Returns a Dataset of (doc_id, cluster_id) where cluster_id
    is the minimum doc_id of the component.

    Each round: ``edges.join(labels, on=src)`` then
    ``groupby(dst).min(label)`` — two shuffles of O(edges) slim rows;
    rounds needed = graph diameter (near-dup components are shallow;
    ``max_rounds`` bounds pathological chains, with a warning if the
    labels were still changing when the bound hit).
    """
    import warnings

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs.select(["a", "b"]))

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        # both directions + self loops (so every touched node keeps its
        # own label in the per-round min)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b, a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a, a, b]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64()), "cluster_id": pa.array([], type=pa.int64())})
        )

    def rename(node_col: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column(node_col),
                    "label": batch.column("label"),
                }
            )

        return f

    # round 0 folded into initialization: label(n) = min neighbor incl self
    labels = (
        edges.groupby("dst")
        .aggregate(Min("src", alias_name="label"))
        .map_batches(rename("dst"), batch_format="pyarrow")
        .materialize()
    )
    checksum = labels.aggregate(Sum("label", alias_name="s"))["s"]
    converged = False
    for _ in range(max_rounds):
        joined = edges.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("node",)
        )
        labels = (
            joined.groupby("dst")
            .aggregate(Min("label", alias_name="label"))
            .map_batches(rename("dst"), batch_format="pyarrow")
            # join partitions with no rows emit SCHEMA-LESS empty blocks
            # (ray 2.49) that break the next round's join key resolution;
            # repartition coalesces them away and keeps block count stable
            .repartition(num_partitions)
            .materialize()
        )
        new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if new_sum == checksum:  # min-label sums strictly decrease until fixpoint
            converged = True
            break
        checksum = new_sum
    if not converged:
        warnings.warn(
            f"connected_components hit max_rounds={max_rounds} before convergence; "
            "clusters may be split (raise max_rounds for deeper graphs)",
            stacklevel=2,
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"), "cluster_id": batch.column("label")})

    return labels.map_batches(project, batch_format="pyarrow")
