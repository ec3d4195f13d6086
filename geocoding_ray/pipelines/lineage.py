"""Checkpointed, resumable partitioned output with per-partition lineage
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

Layout under ``out_dir``::

    part-<key>/                   one directory per input shard (parquet);
                                  <key> = digest of the shard's path
    _lineage/part-<key>.json      manifest: input digest, row count,
                                  per-partition metric counters, schema

A shard is *complete* iff its manifest exists and records the same input
digest; ``run_resumable`` skips complete shards, so a killed run picks
up where it stopped and produces byte-identical results (stages are
deterministic; SURVEY.md §4.2).  Keys are path digests, not list
positions: reordering or extending the shard list keeps finished shards
valid, and orphan manifests from an older shard list are removed at the
start of each run.

Writes are atomic: the part directory is written under ``_tmp`` and
renamed into place before the manifest is written (manifest last =
commit point).

The per-partition metric counters are the engine's analogue of the
reference's shared quota counter (``remaining`` updated per call,
opencage.rs:92,139-141,193-201): instead of a cross-actor mutex, each
partition logs its own counts and the global view is a post-hoc
aggregate (``load_metrics``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable, Optional

import pyarrow.dataset as pads


def shard_digest(path: str) -> str:
    """Cheap, stable input digest: name + size (content hash would read
    the full shard; size+name catches regeneration and truncation)."""
    st = os.stat(path)
    return hashlib.blake2b(f"{os.path.basename(path)}:{st.st_size}".encode(), digest_size=8).hexdigest()


def shard_key(path: str) -> str:
    """Stable identity of an input shard — digest of its absolute path.
    Manifests and part dirs are keyed by THIS (not list position), so
    reordering ``shard_paths`` or growing the list never invalidates
    finished shards (round-1 advice)."""
    return hashlib.blake2b(os.path.abspath(path).encode(), digest_size=8).hexdigest()


def _manifest_path(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, "_lineage", f"part-{key}.json")


def _part_dir(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, f"part-{key}")


def completed_shards(out_dir: str, shard_paths: list[str]) -> set[int]:
    """Indices (into ``shard_paths``) whose manifests record the same
    input digest."""
    done = set()
    for i, p in enumerate(shard_paths):
        key = shard_key(p)
        mp = _manifest_path(out_dir, key)
        if not os.path.exists(mp):
            continue
        try:
            with open(mp) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("input_digest") == shard_digest(p) and os.path.isdir(_part_dir(out_dir, key)):
            done.add(i)
    return done


def run_resumable(
    make_ds: Callable[[str], "object"],
    shard_paths: list[str],
    out_dir: str,
    metric_cols: Optional[dict[str, str]] = None,
) -> dict:
    """Run ``make_ds(shard_path)`` per incomplete shard, writing each
    result partition atomically with a lineage manifest.

    ``metric_cols`` maps counter name -> column whose per-value counts to
    record (e.g. {"match": "match_kind"}).  Returns a summary dict.

    Granularity note: one Dataset per shard keeps resume exact; within a
    shard Ray parallelizes normally.  At cluster scale a shard is a large
    input slice (many files), so per-shard pipelining is not a
    bottleneck; at test scale it costs some startup per shard.
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    # drop orphan manifests from a previous run with a different shard
    # list so load_metrics never mixes stale counters in (round-1 advice)
    keys = {shard_key(p) for p in shard_paths}
    ldir = os.path.join(out_dir, "_lineage")
    for fn in os.listdir(ldir):
        if fn.startswith("part-") and fn.endswith(".json") and fn[5:-5] not in keys:
            os.remove(os.path.join(ldir, fn))
    # drop stale DATA partitions by scanning the part-* dirs themselves —
    # not just manifests: a crash between the part rename and the
    # manifest write leaves a committed-looking dir with NO manifest,
    # which must also go when its shard leaves the list (round-3 review)
    for dn in os.listdir(out_dir):
        if dn.startswith("part-") and dn[5:] not in keys:
            shutil.rmtree(os.path.join(out_dir, dn), ignore_errors=True)
    tmp_root = os.path.join(out_dir, "_tmp")
    if os.path.isdir(tmp_root):
        for dn in os.listdir(tmp_root):
            if dn.startswith("part-") and dn[5:] not in keys:
                shutil.rmtree(os.path.join(tmp_root, dn), ignore_errors=True)
    done = completed_shards(out_dir, shard_paths)
    ran = []
    for i, shard in enumerate(shard_paths):
        if i in done:
            continue
        key = shard_key(shard)
        part = _part_dir(out_dir, key)
        tmp = os.path.join(tmp_root, f"part-{key}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(part, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)

        ds = make_ds(shard)
        ds.write_parquet(tmp)

        counters: dict[str, dict[str, int]] = {}
        dset = pads.dataset(tmp, format="parquet")
        n_rows = dset.count_rows()
        if metric_cols:
            import pyarrow.compute as pc

            for cname, col in metric_cols.items():
                tbl = dset.to_table(columns=[col])
                vc = pc.value_counts(tbl.column(col))
                counters[cname] = {
                    str(x["values"]): int(x["counts"]) for x in vc.to_pylist()
                }

        os.replace(tmp, part)
        with open(_manifest_path(out_dir, key), "w") as f:
            json.dump(
                {
                    "part": key,
                    "input_path": shard,
                    "input_digest": shard_digest(shard),
                    "rows": n_rows,
                    "counters": counters,
                },
                f,
                indent=1,
            )
        ran.append(i)
    shutil.rmtree(tmp_root, ignore_errors=True)
    return {"total_shards": len(shard_paths), "skipped": sorted(done), "ran": ran}


def load_metrics(out_dir: str) -> dict:
    """Aggregate all per-partition counters (the ``remaining_calls()``
    analogue — opencage.rs:134-141 — computed post-hoc, no shared
    mutable state)."""
    agg: dict[str, dict[str, int]] = {}
    rows = 0
    ldir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(ldir):
        return {"rows": 0, "counters": {}}
    for fn in sorted(os.listdir(ldir)):
        with open(os.path.join(ldir, fn)) as f:
            m = json.load(f)
        rows += m.get("rows", 0)
        for cname, counts in m.get("counters", {}).items():
            slot = agg.setdefault(cname, {})
            for k, v in counts.items():
                slot[k] = slot.get(k, 0) + v
    return {"rows": rows, "counters": agg}
