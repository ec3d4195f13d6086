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
FREE_TIER_DAILY_LIMIT = 2500  # opencage.rs:5-9 documented free-tier quota


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
        "timestamp": {"created_unix": UnixTime.from_seconds(created_unix).as_seconds()},
        "total_results": int(total_results),
    }
