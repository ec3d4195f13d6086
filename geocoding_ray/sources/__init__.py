"""Sources: schemas, deterministic fixture generators, file I/O."""

def read_images_from_files(paths_or_dir, include_paths: bool = True):
    """Ingest a directory (or list) of raw image files as the engine's
    images table shape: ``ray.data.read_binary_files`` -> one row per
    file with (image_id, bytes, w, h, fmt, caption, phash).

    The role of the Lance/parquet reader for corpora that arrive as
    loose files; dims come from the TIFF header (no pixel decode), fmt
    from the magic bytes, phash left 0 (computed downstream by the
    validate stage when needed).
    """
    import os
    import struct

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .tiff import _TAG_LENGTH, _TAG_WIDTH, _read_ifd

    def to_rows(batch: "pa.Table") -> "pa.Table":
        bufs = batch.column("bytes").to_pylist()
        paths = batch.column("path").to_pylist() if "path" in batch.column_names else [None] * len(bufs)
        ids, fmts, ws, hs = [], [], [], []
        import hashlib as _hl

        for p, b in zip(paths, bufs):
            # content-hash fallback when no path: batch-local counters
            # would collide across batches
            ids.append(
                os.path.splitext(os.path.basename(p))[0]
                if p
                else "file-" + _hl.blake2b(b, digest_size=8).hexdigest()
            )
            if b[:4] == b"II*\x00":
                fmts.append("tiff")
                try:
                    (off,) = struct.unpack_from("<I", b, 4)
                    ifd = _read_ifd(b, off)
                    ws.append(int(ifd.get(_TAG_WIDTH, (0, 0, 0))[2]))
                    hs.append(int(ifd.get(_TAG_LENGTH, (0, 0, 0))[2]))
                except (struct.error, IndexError):
                    ws.append(0)
                    hs.append(0)
            else:
                fmts.append("unknown")
                ws.append(0)
                hs.append(0)
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "bytes": batch.column("bytes"),
                "w": pa.array(np.array(ws, dtype=np.int32), type=pa.int32()),
                "h": pa.array(np.array(hs, dtype=np.int32), type=pa.int32()),
                "fmt": pa.array(fmts, type=pa.string()),
                "caption": pa.array([""] * len(ids), type=pa.string()),
                "phash": pa.array(np.zeros(len(ids), dtype=np.int64), type=pa.int64()),
            }
        )

    ds = rd.read_binary_files(paths_or_dir, include_paths=include_paths)
    return ds.map_batches(to_rows, batch_format="pyarrow")
