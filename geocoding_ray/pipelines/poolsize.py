"""Actor-pool sizing for driver-facing query pipelines.

The driver invokes ``queries()`` under a Ray session of UNKNOWN size;
an actor pool >= the session's CPU count starves the upstream read
stage forever (observed round 1: a 4-CPU pytest session + a pool of 4
hung until timeout).  So pools stay tiny by default and only grow when
the session demonstrably has headroom — sized at build time on the
driver, where Ray is already initialised.
"""

from __future__ import annotations


def auto_pool(frac: int = 4, lo: int = 2, hi: int = 8, pools: int = 1) -> int:
    """Pool size = cpus/frac clamped to [lo, hi], but never more than
    HALF the session's CPUs — the upstream read stage must always have
    room to schedule (pool 4 of 4 hangs, pool 2 of 4 is the measured
    safe floor, so a 1-2 CPU session gets a pool of 1).

    ``pools``: number of CHAINED actor pools in the same pipeline.  A
    query with two pools must size each so their UNION still leaves
    task slots — two pools of 2 on a 4-CPU session pin every CPU with
    long-lived actors and the read stage deadlocks (observed: the
    first two-pool query, image_pipeline, hung the 4-CPU pytest
    session).  Each pool therefore gets cpus // (2 * pools)."""
    try:
        import ray

        total = int(ray.cluster_resources().get("CPU", lo * frac))
    except Exception:
        total = lo * frac
    return max(1, min(hi, max(total // frac, lo), total // (2 * pools)))
