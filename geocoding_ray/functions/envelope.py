"""OpencageResponse envelope analogue (/root/reference/src/opencage.rs:551-564).

The reference wraps every response in an envelope carrying
``documentation / licenses / rate / status / timestamp / total_results``.
In a batch engine these are *job-level metadata*, not per-row columns:
``rate`` and ``total_results`` map naturally onto the per-partition
lineage metrics (the quota-counter analogue, opencage.rs:92,139-141),
``status`` onto the run outcome, ``timestamp`` onto ``UnixTime`` (S8).

``opencage_envelope`` assembles that document for a finished run so a
consumer of the reference's ``OpencageResponse`` fields has a place to
read each one.
"""

from __future__ import annotations

from typing import Optional

from .timeutil import UnixTime

_DOCUMENTATION = "https://opencagedata.com/api"
_LICENSES = [
    {"name": "CC-BY-SA", "url": "https://creativecommons.org/licenses/by-sa/3.0/"},
    {"name": "ODbL", "url": "https://opendatacommons.org/licenses/odbl/summary/"},
]
# static envelope strings (opencage.rs:538-542 example document)
_STAY_INFORMED = {
    "blog": "https://blog.opencagedata.com",
    "twitter": "https://twitter.com/opencagedata",
}
_THANKS = "For using an OpenCage Data API"
FREE_TIER_DAILY_LIMIT = 2500  # opencage.rs:5-9 documented free-tier quota

_DAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def created_http(created_unix: int) -> str:
    """RFC-1123 render of the ``timestamp.created_http`` field
    (opencage.rs:544: "Mon, 09 Apr 2018 12:33:01 GMT") — fixed English
    tables, never locale-dependent, so the string is byte-stable."""
    from datetime import datetime, timezone

    d = datetime.fromtimestamp(int(created_unix), tz=timezone.utc)
    return (
        f"{_DAYS[d.weekday()]}, {d.day:02d} {_MONTHS[d.month - 1]} {d.year} "
        f"{d.hour:02d}:{d.minute:02d}:{d.second:02d} GMT"
    )


def opencage_envelope(
    total_results: int,
    created_unix: int,
    metrics: Optional[dict] = None,
    rate_limit: int = FREE_TIER_DAILY_LIMIT,
) -> dict:
    """Build the OpencageResponse-envelope document for a run.

    ``metrics`` is ``pipelines.lineage.load_metrics`` output; its row
    count plays the role of calls consumed when deriving ``rate`` —
    the engine's post-hoc replacement for the reference's mutex-guarded
    ``remaining`` counter (opencage.rs:193-201).  ``rate.remaining``
    floors at 0 rather than going negative (local compute has no real
    quota; the field exists for schema parity).
    """
    consumed = int((metrics or {}).get("rows", 0))
    status = {"code": 200, "message": "OK"}
    return {
        "documentation": _DOCUMENTATION,
        "licenses": list(_LICENSES),
        "rate": {
            "limit": int(rate_limit),
            "remaining": max(0, int(rate_limit) - consumed),
            "reset": int(created_unix) - (int(created_unix) % 86400) + 86400,
        },
        "status": status,
        "stay_informed": dict(_STAY_INFORMED),
        "thanks": _THANKS,
        "timestamp": {
            "created_http": created_http(created_unix),
            "created_unix": UnixTime.from_seconds(created_unix).as_seconds(),
        },
        "total_results": int(total_results),
    }
