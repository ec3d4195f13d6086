"""Raster <-> vector conversion tests (north_rule tiling component)."""

import numpy as np
import pytest

from geocoding_ray.pipelines.oracle_queries import _rect_admin_table
from geocoding_ray.state import cells
from geocoding_ray.state.raster import RasterLookup, build_raster, raster_lookup_xy, vectorize_raster
from geocoding_ray.stages.reverse import AdminIndex


@pytest.fixture(scope="module")
def rect_index():
    return AdminIndex(_rect_admin_table(), None)


@pytest.fixture(scope="module")
def raster(rect_index):
    return build_raster(rect_index, level=8)


class TestBuildRaster:
    def test_shape_and_ids(self, raster):
        assert raster.shape == (256, 256)
        assert set(np.unique(raster)) <= set(range(11))  # 0..10

    def test_agrees_with_vector_away_from_boundaries(self, rect_index, raster):
        rng = np.random.RandomState(0)
        lon = rng.uniform(-179, 179, 2000)
        lat = rng.uniform(-89, 89, 2000)
        exact = rect_index.locate(lon, lat)
        exact_ids = np.where(exact >= 0, rect_index.admin_id[np.clip(exact, 0, None)].astype(np.int64), 0)
        approx = raster_lookup_xy(raster, lon, lat)
        # at level 8 a cell spans 1.4 deg lon; points further than one
        # cell diagonal from any rect edge must agree exactly
        cell_w = 360.0 / 256
        cell_h = 180.0 / 256
        from geocoding_ray.pipelines.oracle_queries import RECT_WORLD

        edges_x = np.array([v for r in RECT_WORLD for v in (r[4], r[6])])
        edges_y = np.array([v for r in RECT_WORLD for v in (r[5], r[7])])
        dist_x = np.abs(lon[:, None] - edges_x[None, :]).min(axis=1)
        dist_y = np.abs(lat[:, None] - edges_y[None, :]).min(axis=1)
        safe = (dist_x > cell_w) & (dist_y > cell_h)
        assert safe.sum() > 500
        assert np.array_equal(approx[safe], exact_ids[safe])

    def test_center_semantics(self, rect_index, raster):
        # the raster value IS locate(cell center): verify a sample
        rng = np.random.RandomState(1)
        xs = rng.randint(0, 256, 200)
        ys = rng.randint(0, 256, 200)
        clon = (xs + 0.5) / 256.0 * 360.0 - 180.0
        clat = (ys + 0.5) / 256.0 * 180.0 - 90.0
        win = rect_index.locate(clon, clat)
        ids = np.where(win >= 0, rect_index.admin_id[np.clip(win, 0, None)].astype(np.int64), 0)
        assert np.array_equal(raster[xs, ys], ids)


class TestVectorizeRaster:
    def test_roundtrip_bbox_contains_rect(self, raster):
        from geocoding_ray.pipelines.oracle_queries import RECT_WORLD

        vec = vectorize_raster(raster)
        cell_w = 360.0 / 256
        cell_h = 180.0 / 256
        for a, _name, _lvl, _lr, minx, miny, maxx, maxy in RECT_WORLD:
            if a not in vec:
                continue
            n_cells, vminx, vminy, vmaxx, vmaxy = vec[a]
            assert n_cells > 0
            # raster bbox of an admin's WINNING cells lies within its own
            # rect grown by one cell (deeper children carve the interior,
            # so the raster bbox can be smaller but never much larger)
            assert vminx >= minx - cell_w and vmaxx <= maxx + cell_w
            assert vminy >= miny - cell_h and vmaxy <= maxy + cell_h


class TestRasterLookupStage:
    def test_stage_batch(self, raster):
        import pyarrow as pa

        st = RasterLookup(raster)
        batch = pa.table({"event_id": [1, 2], "lon": [-150.0, None], "lat": [-50.0, None]})
        out = st(batch).to_pylist()
        assert out[0]["raster_admin_id"] >= 1  # inside Aland (country or deeper)
        assert out[1]["raster_admin_id"] == 0  # null point -> none
