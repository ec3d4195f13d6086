"""CLI entry points — the batch replacement for the reference's
per-call client API (a user of georust/geocoding points this at parquet
instead of issuing per-row HTTP calls).

    python -m geocoding_ray reverse --images DIR --admin F --gazetteer F \
        --out DIR [--resumable] [--tolerance-m M] [--concurrency N] [--validate]
    python -m geocoding_ray forward --images DIR --gazetteer F --out DIR \
        [--limit K] [--ignore-oov] [--concurrency N]
    python -m geocoding_ray forward-shuffle --images P --gazetteer P --out DIR \
        [--limit K] [--n-salts S] [--hot-threshold T]

Owns its Ray session (guarded init, shutdown on exit) per the driver
contract — library code never calls ray.init.  ``--resumable`` writes
per-shard partitioned parquet with lineage manifests (checkpointed
resume: re-running skips finished shards).
"""

from __future__ import annotations

import argparse
import os
import sys


def _session():
    """Returns (ray, created): ``created`` is True only when THIS call
    started the session — the caller must then shut it down."""
    import ray

    if ray.is_initialized():
        return ray, False
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray, True


def _shards(images: str) -> list[str]:
    if os.path.isdir(images):
        return sorted(
            os.path.join(images, f) for f in os.listdir(images) if f.endswith(".parquet")
        )
    return [images]


def cmd_reverse(a) -> int:
    from .config import ReverseConfig
    from .pipelines import lineage
    from .pipelines.reverse_pipeline import run_reverse

    cfg = ReverseConfig(tolerance_m=a.tolerance_m)

    def make_ds(shard: str):
        return run_reverse(
            shard, a.admin, a.gazetteer, cfg, concurrency=a.concurrency, validate=a.validate
        )

    shards = _shards(a.images)
    if a.resumable:
        summary = lineage.run_resumable(
            make_ds, shards, a.out, metric_cols={"match": "match_kind"}
        )
        print(f"reverse: ran {len(summary['ran'])} shards, skipped {len(summary['skipped'])}")
    else:
        for i, s in enumerate(shards):
            make_ds(s).write_parquet(os.path.join(a.out, f"part-{i:05d}"))
        print(f"reverse: wrote {len(shards)} partitions to {a.out}")
    return 0


def cmd_forward(a) -> int:
    from .config import ForwardConfig
    from .pipelines import lineage
    from .pipelines.forward_pipeline import run_forward

    cfg = ForwardConfig(ignore_oov=a.ignore_oov, limit=a.limit)

    def make_ds(shard: str):
        return run_forward(shard, a.gazetteer, cfg, concurrency=a.concurrency)

    shards = _shards(a.images)
    if a.resumable:
        summary = lineage.run_resumable(make_ds, shards, a.out)
        print(f"forward: ran {len(summary['ran'])} shards, skipped {len(summary['skipped'])}")
    else:
        for i, s in enumerate(shards):
            make_ds(s).write_parquet(os.path.join(a.out, f"part-{i:05d}"))
        print(f"forward: wrote {len(shards)} partitions to {a.out}")
    return 0


def cmd_forward_shuffle(a) -> int:
    from .config import ForwardConfig
    from .pipelines.forward_shuffle import run_forward_shuffle

    ds = run_forward_shuffle(
        a.images,
        a.gazetteer,
        ForwardConfig(ignore_oov=a.ignore_oov, limit=a.limit),
        n_salts=a.n_salts,
        hot_threshold=a.hot_threshold,
    )
    ds.write_parquet(a.out)
    print(f"forward-shuffle: wrote output to {a.out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="geocoding_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("reverse", help="batch reverse geocoding (PIP + kNN fallback)")
    r.add_argument("--images", required=True, help="parquet file or dir of image shards")
    r.add_argument("--admin", required=True, help="admin-boundaries parquet")
    r.add_argument("--gazetteer", required=True, help="gazetteer parquet (kNN side)")
    r.add_argument("--out", required=True)
    r.add_argument("--tolerance-m", type=float, default=20000.0)
    r.add_argument("--concurrency", type=int, default=4)
    r.add_argument("--validate", action="store_true", help="payload content-hash invariant column")
    r.add_argument("--resumable", action="store_true", help="per-shard lineage manifests + resume")
    r.set_defaults(fn=cmd_reverse)

    f = sub.add_parser("forward", help="batch forward geocoding (broadcast gazetteer join)")
    f.add_argument("--images", required=True)
    f.add_argument("--gazetteer", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--limit", type=int, default=None)
    f.add_argument("--ignore-oov", action="store_true")
    f.add_argument("--concurrency", type=int, default=4)
    f.add_argument("--resumable", action="store_true")
    f.set_defaults(fn=cmd_forward)

    fs = sub.add_parser("forward-shuffle", help="shuffle-join forward (both sides large)")
    fs.add_argument("--images", required=True)
    fs.add_argument("--gazetteer", required=True)
    fs.add_argument("--out", required=True)
    fs.add_argument("--limit", type=int, default=None)
    fs.add_argument("--ignore-oov", action="store_true")
    fs.add_argument("--n-salts", type=int, default=8)
    fs.add_argument("--hot-threshold", type=int, default=200)
    fs.set_defaults(fn=cmd_forward_shuffle)
    return p


def main(argv=None) -> int:
    a = build_parser().parse_args(argv)
    ray, created = _session()
    try:
        return a.fn(a)
    finally:
        # only shut down a session THIS call created — inside tests or
        # the driver the session belongs to the caller
        if created and os.environ.get("GEOCODING_RAY_KEEP_SESSION") != "1":
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
