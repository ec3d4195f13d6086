"""The flagship reverse-geocode pipeline (SURVEY.md §3.1 engine form).

    read images (image_id, bytes, caption)           [columns pruned at read]
      -> map_batches(extract_gps)                    [stateless task; drops bytes]
      -> map_batches(cell_encoder)                   [stateless task]
      -> map_batches(ReverseJoiner, actor pool)      [broadcast AdminIndex]
      [-> write_parquet partitioned]                 [resumable sink]

Everything streams: no stage materializes the dataset; the only
driver-side objects are the broadcast index handles.
"""

from __future__ import annotations

from typing import Optional

import pyarrow.parquet as pq

from ..config import ReverseConfig
from ..stages.cellstage import make_cell_encoder
from ..stages.exif import extract_gps
from ..stages.reverse import AdminIndex, ReverseJoiner


def build_admin_index_ref(admin_path: str, gazetteer_path: Optional[str] = None):
    """Build the AdminIndex on the driver and broadcast it (``ray.put``
    once; every joiner actor reads the same immutable copy from the
    object store — SURVEY.md §2.4)."""
    import ray

    admin_tbl = pq.read_table(admin_path)
    gaz_tbl = pq.read_table(gazetteer_path) if gazetteer_path else None
    return ray.put(AdminIndex(admin_tbl, gaz_tbl))


def run_reverse(
    images_path: str,
    admin_path: str,
    gazetteer_path: Optional[str] = None,
    config: ReverseConfig = ReverseConfig(),
    concurrency: int | tuple[int, int] = 4,
    batch_size: int | None = None,
    index_ref=None,
    validate: bool = False,
):
    """Build the lazy reverse-geocode Dataset (consume with write/iter).

    ``validate=True`` inserts the per-row payload invariant stage
    (decode pixels + content-hash check) before EXIF extraction.
    """
    import ray.data as rd

    if index_ref is None:
        index_ref = build_admin_index_ref(admin_path, gazetteer_path)

    cols = ["image_id", "bytes", "caption"] + (["phash"] if validate else [])
    ds = rd.read_parquet(images_path, columns=cols)
    if validate:
        from ..stages.validate import validate_payload

        ds = ds.map_batches(validate_payload, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(extract_gps, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(make_cell_encoder(level=config.cell_level), batch_format="pyarrow", batch_size=batch_size)
    # resolve the provider on the driver so custom-registered providers
    # reach the actor processes (the registry is per-process)
    from ..providers import get_provider

    ds = ds.map_batches(
        ReverseJoiner,
        fn_constructor_args=(index_ref, config, get_provider(config.provider)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return ds
