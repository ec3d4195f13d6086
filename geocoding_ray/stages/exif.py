"""EXIF GPS extraction stage (stateless ``map_batches`` task).

Engine analogue of the reverse query construction step: the reference
formats ``q = "{lat},{lon}"`` from a caller-supplied Point
(opencage.rs:340-345); here the point comes out of the image payload.

The output batch **drops the ``bytes`` column** — after extraction the
pipeline must never move pixels again (SURVEY.md §4.2: the binary column
dominates block size; shuffles and joins run on the slim columns only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.tiff import parse_gps_arrow


def extract_gps(batch: pa.Table) -> pa.Table:
    """images batch -> (image_id, caption, lon, lat, has_gps).

    Vectorized over the Arrow binary buffer (no per-row Python for the
    canonical layout).  lon/lat are null when the payload carries no GPS
    IFD (the extraction analogue of a provider returning no result —
    GeoAdmin's ``Ok(None)`` semantics, geoadmin.rs:295-304).
    """
    lon, lat, ok = parse_gps_arrow(batch.column("bytes"))
    # drop ONLY the payload; every metadata column flows through
    out = batch.select([c for c in batch.column_names if c != "bytes"])
    out = out.append_column("lon", pa.array(np.where(ok, lon, np.nan), type=pa.float64(), from_pandas=True))
    out = out.append_column("lat", pa.array(np.where(ok, lat, np.nan), type=pa.float64(), from_pandas=True))
    out = out.append_column("has_gps", pa.array(ok))
    # mask NaN -> null
    mask = pa.array(~ok)
    import pyarrow.compute as pc

    out = out.set_column(out.schema.get_field_index("lon"), "lon", pc.if_else(mask, pa.scalar(None, pa.float64()), out["lon"]))
    out = out.set_column(out.schema.get_field_index("lat"), "lat", pc.if_else(mask, pa.scalar(None, pa.float64()), out["lat"]))
    return out
