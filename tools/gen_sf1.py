"""Generate the 10x bench tier (sf1) under /tmp — round-4 VERDICT Next #7.

Two artifacts, both deterministic (fixed seeds, no external data):

1. ``/tmp/sf1/{documents,embeddings}.parquet`` — 10x-cardinality tables
   with the SAME shape and workload character as the driver's sf0.1
   tables (word-salad texts over the sf0.1 vocabulary, matching length
   distribution and ~0.3% exact-dup + ~1% near-dup mass so
   dedup/minhash do comparable work per row; 64-dim float32 embeddings
   with labels).  The driver's own tables are read-only and top out at
   sf0.1, so the 10x tier is synthesized — permitted explicitly by the
   round brief ("synthesise it deterministically at small scale for
   tests and benchmarks").

2. ``/tmp/graft_bench_fx_20000000`` — the 20M-image EXIF fixture in the
   exact layout ``bench.py``'s ``_fixture_dir(1.0)`` expects, generated
   with a process pool that replicates ``generate_fixture_dir``'s
   per-shard seeds/offsets bit-for-bit (same shard files, same golden
   rows), then stamps the ``_SUCCESS`` marker so the bench's own
   (single-process) generator skips straight to it.

Usage: python tools/gen_sf1.py [--tables-only]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF1_DIR = "/tmp/sf1"
N_DOCS = 50_000
N_VECS = 20_000
N_IMAGES = 20_000_000
SEED = 71


def make_documents() -> pa.Table:
    src = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    vocab = sorted({w for t in src.column("text").to_pylist() for w in t.split()})
    lens = np.asarray([len(t.split()) for t in src.column("text").to_pylist()])
    langs = sorted(set(src.column("lang").to_pylist()))
    sources = sorted(set(src.column("source").to_pylist()))
    rng = np.random.RandomState(SEED)
    n_words = rng.choice(lens, size=N_DOCS)  # bootstrap the length dist
    widx = rng.randint(0, len(vocab), size=int(n_words.sum()))
    offs = np.r_[0, np.cumsum(n_words)]
    texts = [
        " ".join(vocab[j] for j in widx[offs[i] : offs[i + 1]]) for i in range(N_DOCS)
    ]
    # dup structure ~ sf0.1 (16/5000 exact-dup rows; a near-dup band for
    # minhash): every 300th doc copies its predecessor exactly; every
    # 100th (not also 300th) perturbs one word of its predecessor.
    for i in range(1, N_DOCS):
        if i % 300 == 0:
            texts[i] = texts[i - 1]
        elif i % 100 == 0:
            w = texts[i - 1].split()
            w[rng.randint(0, len(w))] = vocab[rng.randint(0, len(vocab))]
            texts[i] = " ".join(w)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([langs[i % len(langs)] for i in rng.randint(0, 97, N_DOCS)], type=pa.string()),
            "source": pa.array([sources[i % len(sources)] for i in rng.randint(0, 97, N_DOCS)], type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def make_embeddings() -> pa.Table:
    rng = np.random.RandomState(SEED + 1)
    emb = rng.normal(0.0, 0.12, size=(N_VECS, 64)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), type=pa.int64()),
            "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 16, N_VECS).astype(np.int32), type=pa.int32()),
        }
    )


def make_tables() -> None:
    os.makedirs(SF1_DIR, exist_ok=True)
    pq.write_table(make_documents(), f"{SF1_DIR}/documents.parquet")
    pq.write_table(make_embeddings(), f"{SF1_DIR}/embeddings.parquet")
    print(f"tables ok: {SF1_DIR}")


def _shard_worker(args) -> str:
    """Replicates generate_fixture_dir's per-shard call exactly."""
    shard, start, count, images_dir, truth_dir, seed = args
    from geocoding_ray.sources.fixtures import build_images, build_world

    _admin, gaz_tbl, sample_boxes = build_world(seed=seed)
    images, truth = build_images(
        count,
        sample_boxes,
        gaz_tbl,
        seed=seed + 1 + shard,
        include_golden=(shard == 0),
        id_offset=start,
    )
    pq.write_table(images, os.path.join(images_dir, f"part-{shard:04d}.parquet"))
    tpath = os.path.join(truth_dir, f"truth-{shard:04d}.parquet")
    pq.write_table(truth, tpath)
    return tpath


def make_images(n_images: int = N_IMAGES, seed: int = 42, procs: int = 24) -> None:
    from geocoding_ray.sources.fixtures import build_world

    out_dir = f"/tmp/graft_bench_fx_{n_images}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        print(f"images ok (cached): {out_dir}")
        return
    images_dir = os.path.join(out_dir, "images")
    truth_dir = os.path.join(out_dir, "_truth_parts")
    os.makedirs(images_dir, exist_ok=True)
    os.makedirs(truth_dir, exist_ok=True)
    admin_tbl, gaz_tbl, _ = build_world(seed=seed)
    pq.write_table(admin_tbl, os.path.join(out_dir, "admin.parquet"))
    pq.write_table(gaz_tbl, os.path.join(out_dir, "gazetteer.parquet"))
    n_shards = max(8, n_images // 4000)  # bench's _fixture_dir sizing
    per = max(1, (n_images + n_shards - 1) // n_shards)
    jobs = []
    shard = 0
    for start in range(0, n_images, per):
        jobs.append((shard, start, min(per, n_images - start), images_dir, truth_dir, seed))
        shard += 1
    ctx = mp.get_context("fork")
    with ctx.Pool(procs) as pool:
        done = 0
        for _ in pool.imap_unordered(_shard_worker, jobs, chunksize=8):
            done += 1
            if done % 500 == 0:
                print(f"  shards {done}/{len(jobs)}")
    # concat truth parts in shard order (matches the sequential writer)
    parts = [
        pq.read_table(os.path.join(truth_dir, f))
        for f in sorted(os.listdir(truth_dir))
    ]
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "images_truth.parquet"))
    import shutil

    shutil.rmtree(truth_dir)
    with open(marker, "w") as f:
        f.write("ok")
    print(f"images ok: {out_dir} ({shard} shards)")


if __name__ == "__main__":
    make_tables()
    if "--tables-only" not in sys.argv:
        make_images()
