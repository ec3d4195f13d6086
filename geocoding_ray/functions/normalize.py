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
