"""Text-analysis operators for training-data pipelines (engine extension
beyond the reference's geocoding surface; see the build brief).

All rules are deterministic and expressible in ANSI SQL so the DuckDB
oracle can gate them bit-for-bit:

* ``token_count`` — tokens = regexp-split of trimmed text on ``\\s+``.
* ``quality`` — char length, punctuation count ``[.,!?;:]``, stopword
  ratio, and a composite score (pure float64 arithmetic, same
  expression order as the SQL oracle).
* ``lang_id`` — marker-token counts per language, argmax with a fixed
  priority order (en, de, fr, es, zh) for ties.
* ``fingerprint`` — md5 hex digest (DuckDB ``md5()``-compatible).

Everything is vectorized pyarrow.compute except the md5 loop (C-backed
hashlib per row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "and", "in", "to")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de", "shi", "zai"),
}
LANG_PRIORITY = ("en", "de", "fr", "es", "zh")


def _tokens(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """list<string> of whitespace tokens of trimmed text."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(col), r"\s+")


def _count_in_set(tokens: pa.Array, vocab: tuple[str, ...]) -> np.ndarray:
    """Per-row count of tokens that are members of ``vocab``."""
    flat = pc.list_flatten(tokens)
    member = pc.is_in(flat, value_set=pa.array(vocab)).cast(pa.int64())
    lens = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    member_np = member.to_numpy(zero_copy_only=False)
    sums = np.add.reduceat(
        np.concatenate([member_np, [0]]), offsets[:-1]
    )  # reduceat handles empty rows via the sentinel
    sums[lens == 0] = 0
    return sums.astype(np.int64)


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = _tokens(batch.column(text_col))
    n = pc.list_value_length(toks)
    return batch.append_column("n_tokens", n.cast(pa.int64()))


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_chars_q, n_tokens, n_punct, stop_ratio, quality.

    quality = stop_ratio * 0.5 + (1.0 - n_punct / n_tokens') * 0.5 where
    n_tokens' guards /0 — fixed expression order for oracle equality.
    """
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = _tokens(text)
    n_tok = pc.list_value_length(toks).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_chars = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_punct = pc.count_substring_regex(text, r"[.,!?;:]").cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_stop = _count_in_set(toks, STOPWORDS)
    denom = np.maximum(n_tok, 1).astype(np.float64)
    stop_ratio = n_stop.astype(np.float64) / denom
    quality = stop_ratio * 0.5 + (1.0 - n_punct.astype(np.float64) / denom) * 0.5
    out = batch
    out = out.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
    out = out.append_column("n_punct", pa.array(n_punct, type=pa.int64()))
    out = out.append_column("n_stop", pa.array(n_stop, type=pa.int64()))
    out = out.append_column("stop_ratio", pa.array(stop_ratio, type=pa.float64()))
    out = out.append_column("quality", pa.array(quality, type=pa.float64()))
    return out


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-count language ID; ``pred_lang`` = first language in
    priority order achieving the max marker count."""
    toks = _tokens(batch.column(text_col))
    scores = np.stack([_count_in_set(toks, LANG_MARKERS[lg]) for lg in LANG_PRIORITY])
    best = np.argmax(scores, axis=0)  # first max wins (priority order)
    pred = np.array(LANG_PRIORITY, dtype=object)[best]
    out = batch
    for i, lg in enumerate(LANG_PRIORITY):
        out = out.append_column(f"score_{lg}", pa.array(scores[i], type=pa.int64()))
    out = out.append_column("pred_lang", pa.array(pred.tolist(), type=pa.string()))
    return out


def fingerprint_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from ..functions.hashing import md5_hex

    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    return batch.append_column("fp_md5", pa.array(md5_hex(texts), type=pa.string()))
