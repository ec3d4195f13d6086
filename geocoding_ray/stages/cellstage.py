"""Cell-encode stage (stateless ``map_batches`` task).

Adds the hierarchical cell id column — the engine's analogue of the
providers' cell annotations (OpenCage ``geohash`` opencage.rs:594,
GeoAdmin ``geom_quadindex`` geoadmin.rs:378).  Deterministic, so tile
assignments are identical across parallelism levels (north_rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state import cells


def make_cell_encoder(level: int = 8, lon_col: str = "lon", lat_col: str = "lat", out_col: str = "cell_id"):
    def encode_cells(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        cid = np.zeros(len(lon), dtype=np.uint64)
        if valid.any():
            cid[valid] = cells.encode(lon[valid], lat[valid], level)
        arr = pa.array(cid, type=pa.uint64(), from_pandas=True)
        if (~valid).any():
            import pyarrow.compute as pc

            arr = pc.if_else(pa.array(~valid), pa.scalar(None, pa.uint64()), arr)
        return batch.append_column(out_col, arr)

    return encode_cells
