"""Text normalization / tokenization for forward geocoding & text analysis.

Mirrors GeoAdmin's normalized searchable ``detail`` text — lowercase,
diacritics folded, punctuation stripped: "seftigenstrasse 264 3084 wabern
355 koeniz ch be" (/root/reference/src/geoadmin.rs:344, 381) — and the
coercion shim ``deserialize_string_or_int`` (opencage.rs:73-88).
"""

from __future__ import annotations

import re
import unicodedata

_WS = re.compile(r"\s+")
_NONWORD = re.compile(r"[^0-9a-z\s]+")

# GeoAdmin folds umlauts the German way (München -> muenchen is *not* what
# detail shows; it shows "koeniz" for Köniz — oe folding).  Map the common
# cases explicitly, then strip remaining combining marks.
_FOLD = {
    "ä": "ae", "ö": "oe", "ü": "ue", "ß": "ss",
    "Ä": "ae", "Ö": "oe", "Ü": "ue",
}


def normalize_text(s: str) -> str:
    """Lowercase, fold diacritics, strip punctuation, collapse whitespace."""
    if not s:
        return ""
    out = []
    for ch in s:
        out.append(_FOLD.get(ch, ch))
    s = "".join(out)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.lower()
    s = _NONWORD.sub(" ", s)
    return _WS.sub(" ", s).strip()


def tokenize(s: str) -> list[str]:
    """Normalized tokens of a query / caption."""
    n = normalize_text(s)
    return n.split(" ") if n else []


_CCC_PATTERN: str | None = None


def _ccc_pattern() -> str:
    """RE2 character class matching exactly the code points with
    canonical combining class > 0 (``unicodedata.combining(ch) > 0``) —
    the scalar :func:`normalize_text` strip predicate.  Built once per
    process (~0.2 s full-plane scan), cached; actors pay it once in
    their first batch."""
    global _CCC_PATTERN
    if _CCC_PATTERN is None:
        comb = unicodedata.combining
        ranges: list[tuple[int, int]] = []
        start = None
        # combining classes only occur below 0x20000 (highest assigned:
        # U+1E94A Adlam, ccc=230); scanning the two planes keeps startup
        # cheap while staying exact for every assigned code point
        for cp in range(0x20000):
            if comb(chr(cp)) > 0:
                if start is None:
                    start = cp
            elif start is not None:
                ranges.append((start, cp - 1))
                start = None
        if start is not None:
            ranges.append((start, 0x1FFFF))
        parts = [
            f"\\x{{{a:X}}}" if a == b else f"\\x{{{a:X}}}-\\x{{{b:X}}}" for a, b in ranges
        ]
        _CCC_PATTERN = "[" + "".join(parts) + "]"
    return _CCC_PATTERN


def normalize_arrow(arr):
    """Vectorized :func:`normalize_text` over an Arrow string array.

    Same steps in the same order (umlaut fold -> NFKD -> strip combining
    marks -> lower -> punctuation to space -> collapse whitespace), all
    pyarrow.compute kernels — the per-row Python path is the hot spot in
    tokenize-heavy stages (simhash, shuffle-join prep).  Parity with the
    scalar function is asserted by tests on fixture + golden strings.
    ``arr`` may be a pa.Array / pa.ChunkedArray; returns pa.Array
    (nulls and empty strings both normalize to "").
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.fill_null(arr.cast(pa.string()), "")
    for src, dst in _FOLD.items():
        s = pc.replace_substring(s, src, dst)
    s = pc.utf8_normalize(s, form="NFKD")
    # strip EXACTLY the code points the scalar path strips
    # (unicodedata.combining(ch) > 0, i.e. canonical combining class > 0)
    # — \p{Mn} is NOT the same set: Mn marks with ccc=0 (U+0901, many
    # Indic/Thai signs) must survive, matching normalize_text byte for
    # byte in every script (round-2 advice)
    s = pc.replace_substring_regex(s, _ccc_pattern(), "")
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, r"[^0-9a-z\s]+", " ")
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


def tokenize_arrow(arr):
    """Vectorized :func:`tokenize`: Arrow string array -> list<string>
    of normalized tokens (empty list for blank/null input)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = normalize_arrow(arr)
    toks = pc.split_pattern(n, " ")
    # "" splits to [""] — map those to empty lists
    empty = pc.equal(n, "")
    return pc.if_else(empty, pa.array([[]] * len(toks), type=pa.list_(pa.string())), toks)


def split_tokens_arrow(col):
    """Pre-normalized space-joined Arrow string column ->
    ``(flat, row_of, hashes, idx)``: the flat token array, and for each
    NON-EMPTY token its row index, uint64 polynomial hash, and position
    in ``flat`` (the shared vectorized front half of every tokenizing
    stage)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .hashing import polyhash_strings, string_byte_view

    s = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    toks = pc.split_pattern(pc.fill_null(s.cast(pa.string()), ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = toks.offsets.to_numpy().astype(np.int64)
    off = off - off[0]
    flat = toks.values
    row_of = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(off))
    h = polyhash_strings(flat)
    _, boff = string_byte_view(flat)
    keep = np.nonzero(np.diff(boff) > 0)[0]  # empty-string tokens out
    return flat, row_of[keep], h[keep], keep


def dedup_tokens_per_row(row_of, h):
    """Indices of the first occurrence of each (row, hash) pair, ordered
    by (row, hash) — the vectorized per-row token-set dedup."""
    import numpy as np

    order = np.lexsort((h, row_of))
    ro, ho = row_of[order], h[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (ro[1:] != ro[:-1]) | (ho[1:] != ho[:-1])
    return order[keep]


def coerce_to_string(v) -> str | None:
    """int-or-string -> string, the engine analogue of
    ``deserialize_string_or_int`` (opencage.rs:73-88)."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else repr(v)
    return str(v)
