"""End-to-end Ray Data pipeline tests over the on-disk fixture world."""

import collections

import pyarrow.parquet as pq
import pytest

from geocoding_ray.config import ForwardConfig, ReverseConfig
from geocoding_ray.pipelines.forward_pipeline import run_forward
from geocoding_ray.pipelines.reverse_pipeline import run_reverse


@pytest.fixture(scope="module")
def truth(fixture_dir):
    t = pq.read_table(fixture_dir["truth"])
    return {r["image_id"]: r for r in t.to_pylist()}


class TestReversePipeline:
    def test_end_to_end(self, ray_session, fixture_dir, truth):
        ds = run_reverse(
            fixture_dir["images_dir"],
            fixture_dir["admin"],
            fixture_dir["gazetteer"],
            ReverseConfig(tolerance_m=20000),
            concurrency=2,
            batch_size=128,
        )
        rows = ds.take_all()
        assert len(rows) == len(truth)
        by_kind = collections.Counter((truth[r["image_id"]]["kind"], r["match_kind"]) for r in rows)
        # every generated pip image must resolve by pip, knn by knn, etc.
        for (tk, mk), _ in by_kind.items():
            if tk == "pip":
                assert mk == "pip"
            elif tk == "knn":
                assert mk == "knn"
            elif tk in ("miss", "nogps"):
                assert mk == "miss"
        d = {r["image_id"]: r for r in rows}
        assert d["img_golden_barcelona"]["formatted"] == "Carrer de Calatrava, 64, 08017 Barcelona, Spain"

    def test_determinism_across_batch_sizes(self, ray_session, fixture_dir):
        def run(bs):
            ds = run_reverse(
                fixture_dir["images_dir"],
                fixture_dir["admin"],
                fixture_dir["gazetteer"],
                ReverseConfig(tolerance_m=20000),
                concurrency=2,
                batch_size=bs,
            )
            rows = sorted(ds.take_all(), key=lambda r: r["image_id"])
            return [(r["image_id"], r["formatted"], r["admin_id"], r["match_kind"]) for r in rows]

        assert run(32) == run(512)


class TestForwardPipeline:
    def test_end_to_end(self, ray_session, fixture_dir):
        ds = run_forward(
            fixture_dir["images_dir"],
            fixture_dir["gazetteer"],
            ForwardConfig(ignore_oov=True),  # captions carry "photo near" noise
            concurrency=2,
            batch_size=128,
        )
        rows = ds.take_all()
        d = {r["query_id"]: r for r in rows}
        r = d["img_golden_schwabing"]
        assert r["points"][0] == {"lon": 11.5884858, "lat": 48.1700887}
        # most captions name a real gazetteer place -> high hit rate
        hits = sum(1 for r in rows if r["n_candidates"] > 0)
        assert hits / len(rows) > 0.9


class TestBinaryFilesSource:
    def test_loose_tiff_files_flow_through_reverse(self, ray_session, fixture_dir, tmp_path):
        import numpy as np

        from geocoding_ray.sources import read_images_from_files, tiff

        d = tmp_path / "raw"
        d.mkdir()
        # (2.1287, 41.40139) — the Barcelona golden point
        buf = tiff.encode_tiff(np.zeros((3, 3, 3), dtype=np.uint8), 414013900, 21287000)
        (d / "imgA.tiff").write_bytes(buf)
        (d / "junk.bin").write_bytes(b"not a tiff")

        ds = read_images_from_files(str(d))
        rows = {r["image_id"]: r for r in ds.take_all()}
        assert rows["imgA"]["fmt"] == "tiff" and rows["imgA"]["w"] == 3
        assert rows["junk"]["fmt"] == "unknown"

        # feed the ingested table into the real reverse chain
        from geocoding_ray.stages.cellstage import make_cell_encoder
        from geocoding_ray.stages.exif import extract_gps

        out = ds.map_batches(extract_gps, batch_format="pyarrow").map_batches(
            make_cell_encoder(8), batch_format="pyarrow"
        )
        got = {r["image_id"]: r for r in out.take_all()}
        assert got["imgA"]["has_gps"] and abs(got["imgA"]["lon"] - 2.1287) < 1e-9
        assert not got["junk"]["has_gps"]
