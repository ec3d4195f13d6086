"""Mergeable one-pass sketches: fixed-bin quantile histogram and
Misra-Gries heavy hitters.

The exact operators (grouped_quantile's histogram refinement, term_df's
full vocabulary count) re-scan or carry vocabulary-sized state; these
are the bounded-state single-pass companions a 100-TB run reaches for
when an approximate answer is enough:

* ``QuantileSketch`` — a 2^16-bin histogram over the IEEE-754
  order-preserving uint64 key's top 16 bits (the same monotone mapping
  grouped_quantile uses).  State is 64 Ki int64 counts per group, merge
  is elementwise add (associative/commutative), and the rank error of
  any quantile estimate is bounded by the count of its bin — a bound
  the sketch REPORTS alongside each estimate, and the estimate itself
  is a real data value (the bin's representative edge), not an
  interpolation.
* ``misra_gries`` / ``mg_merge`` — the classic k-counter frequency
  summary: per-batch exact counts are compressed to <= k survivors by
  subtracting the (k+1)-th largest count (the MG decrement step);
  partial summaries merge by summing counters and compressing again.
  Guarantees (standard MG bounds): reported <= true, undercount
  <= N_processed / (k+1), and every item with true count
  > N / (k+1) survives.

Both are deterministic (no sampling), so results are reproducible
across resharding — the repo's split-invariance discipline applies.
"""

from __future__ import annotations

import numpy as np

BINS_LOG2 = 16
N_BINS = 1 << BINS_LOG2


def u16_bin(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> top-16-bit histogram bin (int64).
    Same monotone mapping as pipelines/text_queries._median_u."""
    v = v + 0.0
    b = v.view(np.int64)
    bu = b.view(np.uint64)
    with np.errstate(over="ignore"):
        u = np.where(b < 0, ~bu, bu ^ np.uint64(1 << 63))
    return (u >> np.uint64(64 - BINS_LOG2)).astype(np.int64)


def bin_lower_edge(bins: np.ndarray) -> np.ndarray:
    """Inverse of :func:`u16_bin`'s truncation: the smallest float64
    whose key falls in each bin (the value the estimate reports)."""
    u = bins.astype(np.uint64) << np.uint64(64 - BINS_LOG2)
    neg = (u & np.uint64(1 << 63)) == 0
    with np.errstate(over="ignore"):
        raw = np.where(neg, ~u, u ^ np.uint64(1 << 63))
    edge = raw.astype(np.uint64).view(np.float64)
    # the most-negative bin's bit-space lower bound is a NaN payload
    # (below -inf); clamp to -inf, the smallest representable member
    return np.where(np.isnan(edge), -np.inf, edge)


def histogram_partial(values: np.ndarray, group_codes: np.ndarray, n_groups: int) -> np.ndarray:
    """(n_groups, N_BINS) int64 counts — the mergeable sketch state for
    one batch.  Stored sparse upstream (only nonzero (group, bin) rows
    cross the shuffle)."""
    ok = np.isfinite(values)
    g = group_codes[ok]
    b = u16_bin(values[ok])
    flat = np.bincount(g * N_BINS + b, minlength=n_groups * N_BINS)
    return flat.reshape(n_groups, N_BINS).astype(np.int64)


def quantile_from_histogram(counts: np.ndarray, qs: list[float]) -> list[tuple[float, int]]:
    """For each q: (estimate, rank_error_bound).  The estimate is the
    lower edge of the bin holding the ceil(q*n)-th value (the same
    discrete-rank rule as the exact operator); the bound is that bin's
    count — the true quantile is within the bin, whose occupants all
    share the estimate's top 16 bits."""
    n = int(counts.sum())
    if n == 0:
        return [(float("nan"), 0) for _ in qs]
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        rank = max(int(np.ceil(q * n)), 1)
        b = int(np.searchsorted(cum, rank))
        out.append((float(bin_lower_edge(np.array([b]))[0]), int(counts[b])))
    return out


def misra_gries(items: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress exact (item, count) pairs to <= k Misra-Gries counters.
    Vectorized: sort by count desc, subtract the (k+1)-th largest,
    keep positives.  Returns (items, residual_counts)."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    kept = counts - thresh
    pos = kept > 0
    return items[pos], kept[pos]


def mg_merge(
    items_a: np.ndarray,
    counts_a: np.ndarray,
    items_b: np.ndarray,
    counts_b: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two MG summaries: sum counters for shared items, then
    compress back to k.  Error bounds add (Agarwal et al., 'Mergeable
    Summaries', PODS 2012)."""
    items = np.concatenate([items_a, items_b])
    counts = np.concatenate([counts_a, counts_b])
    uniq, inv = np.unique(items, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(acc, inv, counts)
    return misra_gries(uniq, acc, k)
