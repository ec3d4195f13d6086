"""Actor-pool sizing for driver-facing query pipelines.

The driver invokes ``queries()`` under a Ray session of UNKNOWN size;
an actor pool >= the session's CPU count starves the upstream read
stage forever (observed round 1: a 4-CPU pytest session + a pool of 4
hung until timeout).  So pools stay tiny by default and only grow when
the session demonstrably has headroom — sized at build time on the
driver, where Ray is already initialised.
"""

from __future__ import annotations


def auto_pool(frac: int = 4, lo: int = 2, hi: int = 8) -> int:
    """cpus/frac clamped to [lo, hi] (2 in a 4-8 CPU session, 8 at 32)."""
    try:
        import ray

        total = int(ray.cluster_resources().get("CPU", lo * frac))
    except Exception:
        return lo
    return max(lo, min(hi, total // frac))
