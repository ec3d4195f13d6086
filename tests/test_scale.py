"""Scale-hardening tests: resumable lineage output, shuffle-join forward
parity with the broadcast path, oracle-query determinism."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from geocoding_ray.config import ForwardConfig, ReverseConfig
from geocoding_ray.pipelines import lineage
from geocoding_ray.pipelines.forward_pipeline import run_forward
from geocoding_ray.pipelines.forward_shuffle import run_forward_shuffle
from geocoding_ray.pipelines.reverse_pipeline import run_reverse


def _sorted_rows(ds):
    rows = ds.take_all()
    return sorted(
        [(r["image_id"], r["formatted"], int(r["admin_id"]), r["match_kind"]) for r in rows]
    )


class TestLineageResume:
    def _make(self, fixture_dir, out_dir):
        shards = sorted(
            os.path.join(fixture_dir["images_dir"], f) for f in os.listdir(fixture_dir["images_dir"])
        )

        def make_ds(shard):
            return run_reverse(
                shard,
                fixture_dir["admin"],
                fixture_dir["gazetteer"],
                ReverseConfig(tolerance_m=20000),
                concurrency=2,
            )

        return shards, make_ds

    def test_full_run_then_resume_noop(self, ray_session, fixture_dir, tmp_path):
        out = str(tmp_path / "rev_out")
        shards, make_ds = self._make(fixture_dir, out)
        r1 = lineage.run_resumable(make_ds, shards, out, metric_cols={"match": "match_kind"})
        assert r1["ran"] == list(range(len(shards)))
        r2 = lineage.run_resumable(make_ds, shards, out, metric_cols={"match": "match_kind"})
        assert r2["ran"] == [] and r2["skipped"] == list(range(len(shards)))

        m = lineage.load_metrics(out)
        total_in = sum(pq.read_metadata(s).num_rows for s in shards)
        assert m["rows"] == total_in
        assert set(m["counters"]["match"]) <= {"pip", "knn", "miss"}

    def test_interrupted_resume_identical_output(self, ray_session, fixture_dir, tmp_path):
        out_a = str(tmp_path / "a")
        out_b = str(tmp_path / "b")
        shards, make_ds = self._make(fixture_dir, out_a)
        lineage.run_resumable(make_ds, shards, out_a)
        # simulate a crash after shard 0 of run b: run shard 0 only, then
        # kill (delete nothing), then resume over all shards
        lineage.run_resumable(make_ds, shards[:1], out_b)
        r = lineage.run_resumable(make_ds, shards, out_b)
        assert 0 in r["skipped"]

        def read_all(d):
            import pyarrow.dataset as pads

            files = []
            for p in sorted(os.listdir(d)):
                if p.startswith("part-"):
                    pd_ = os.path.join(d, p)
                    files.extend(os.path.join(pd_, f) for f in sorted(os.listdir(pd_)))
            t = pads.dataset(files, format="parquet").to_table()
            df = t.select(["image_id", "formatted", "admin_id", "match_kind"]).to_pandas()
            return df.sort_values("image_id").reset_index(drop=True)

        import pandas as pd

        pd.testing.assert_frame_equal(read_all(out_a), read_all(out_b))

    def test_stale_digest_triggers_rerun(self, ray_session, fixture_dir, tmp_path):
        out = str(tmp_path / "c")
        shards, make_ds = self._make(fixture_dir, out)
        lineage.run_resumable(make_ds, shards[:1], out)
        # tamper with the manifest digest -> shard must re-run
        mp = os.path.join(out, "_lineage", f"part-{lineage.shard_key(shards[0])}.json")
        m = json.load(open(mp))
        m["input_digest"] = "stale"
        json.dump(m, open(mp, "w"))
        r = lineage.run_resumable(make_ds, shards[:1], out)
        assert r["ran"] == [0]

    def test_reorder_keeps_resume_and_orphans_cleaned(self, ray_session, fixture_dir, tmp_path):
        out = str(tmp_path / "d")
        shards, make_ds = self._make(fixture_dir, out)
        lineage.run_resumable(make_ds, shards, out)
        # reordering the shard list must not invalidate finished shards
        r = lineage.run_resumable(make_ds, list(reversed(shards)), out)
        assert r["ran"] == []
        # a run with a smaller shard list drops the orphan manifests, so
        # load_metrics reflects only the current list
        lineage.run_resumable(make_ds, shards[:1], out)
        m = lineage.load_metrics(out)
        assert m["rows"] == pq.read_metadata(shards[0]).num_rows
        # round-3 (ADVICE): the stale part-* DATA dirs must be gone too,
        # so a consumer reading the output dir sees only current shards
        kept = {f"part-{lineage.shard_key(shards[0])}"}
        on_disk = {p for p in os.listdir(out) if p.startswith("part-")}
        assert on_disk == kept, on_disk

    def test_forward_path_resumable(self, ray_session, fixture_dir, tmp_path):
        """North-rule resume applies to the forward join too: interrupt
        after one shard, resume, output identical to a clean run."""
        out_a = str(tmp_path / "fa")
        out_b = str(tmp_path / "fb")
        shards = sorted(
            os.path.join(fixture_dir["images_dir"], f) for f in os.listdir(fixture_dir["images_dir"])
        )

        def make_ds(shard):
            return run_forward(
                shard, fixture_dir["gazetteer"], ForwardConfig(ignore_oov=True), concurrency=2
            )

        lineage.run_resumable(make_ds, shards, out_a)
        lineage.run_resumable(make_ds, shards[:1], out_b)  # "crash" after shard 0
        r = lineage.run_resumable(make_ds, shards, out_b)
        assert 0 in r["skipped"]

        def read_all(d):
            import pyarrow.dataset as pads

            files = []
            for p in sorted(os.listdir(d)):
                if p.startswith("part-"):
                    pd_ = os.path.join(d, p)
                    files.extend(os.path.join(pd_, f) for f in sorted(os.listdir(pd_)))
            t = pads.dataset(files, format="parquet").to_table()
            cols = [c for c in ("query_id", "place_id", "rk") if c in t.column_names]
            df = t.select(cols).to_pandas()
            return df.sort_values(cols, kind="stable").reset_index(drop=True)

        import pandas as pd

        pd.testing.assert_frame_equal(read_all(out_a), read_all(out_b))


class TestForwardShuffleParity:
    def test_matches_broadcast_path(self, ray_session, fixture_dir):
        cfg = ForwardConfig(ignore_oov=True, limit=3)
        # broadcast path, explode mode
        import pyarrow.parquet as pq_

        from geocoding_ray.stages.forward import ForwardJoiner, GazetteerIndex

        gidx = GazetteerIndex(pq_.read_table(fixture_dir["gazetteer"]))
        import pyarrow.dataset as pads

        imgs = pads.dataset(fixture_dir["images_dir"], format="parquet").to_table(
            columns=["image_id", "caption"]
        )
        bj = ForwardJoiner(gidx, cfg, query_col="caption", id_col="image_id", explode=True)
        b_out = bj(imgs).to_pandas()
        b_set = {
            (r.query_id, int(r.rk), int(r.place_id)) for r in b_out.itertuples()
        }

        s_ds = run_forward_shuffle(
            fixture_dir["images_dir"], fixture_dir["gazetteer"], cfg, n_salts=4, hot_threshold=50
        )
        s_out = s_ds.take_all()
        s_set = {(r["query_id"], int(r["rk"]), int(r["place_id"])) for r in s_out}
        assert s_set == b_set

    def test_salting_does_not_change_results(self, ray_session, fixture_dir):
        cfg = ForwardConfig(ignore_oov=True, limit=2)
        a = run_forward_shuffle(
            fixture_dir["images_dir"], fixture_dir["gazetteer"], cfg, n_salts=1, hot_threshold=10**9
        ).take_all()
        b = run_forward_shuffle(
            fixture_dir["images_dir"], fixture_dir["gazetteer"], cfg, n_salts=8, hot_threshold=1
        ).take_all()
        key = lambda rows: sorted((r["query_id"], int(r["rk"]), int(r["place_id"])) for r in rows)
        assert key(a) == key(b)


class TestSaltingStress:
    """Round-3 (VERDICT Next #9): a token carried by >50% of the corpus
    must neither change results vs the broadcast plan nor land on a
    single reducer."""

    def _tables(self, tmp_path):
        import numpy as np
        import pyarrow as pa

        n_places, n_queries = 40, 240
        places = [
            {
                "place_id": i,
                "name": f"Metropolis {i}",
                "detail": f"metropolis plc{i}",
                "lon": float(i % 180),
                "lat": float(i % 80),
                "origin": "address",
                "country_code": "c1",
                "rank": 1,
                "weight": 0,
                "importance": (i * 2654435761 % 1000) / 1000.0,
                "confidence": 9,
                "label": f"Metropolis {i}",
                "house_number": None,
            }
            for i in range(n_places)
        ]
        gaz = pa.Table.from_pylist(places)
        # >50% of queries carry ONLY the hot token -> their join key IS it
        caps = ["metropolis" if q % 3 != 2 else f"metropolis plc{q % 40}" for q in range(n_queries)]
        imgs = pa.table(
            {
                "image_id": pa.array([f"q{q}" for q in range(n_queries)], type=pa.string()),
                "caption": pa.array(caps, type=pa.string()),
            }
        )
        gp = str(tmp_path / "gaz.parquet")
        ip = str(tmp_path / "imgs.parquet")
        pq.write_table(gaz, gp)
        pq.write_table(imgs, ip)
        return gp, ip, gaz, imgs

    def test_hot_token_parity_with_broadcast(self, ray_session, tmp_path):
        from geocoding_ray.stages.forward import ForwardJoiner, GazetteerIndex

        gp, ip, gaz, imgs = self._tables(tmp_path)
        cfg = ForwardConfig(ignore_oov=True, limit=3)
        b_out = ForwardJoiner(GazetteerIndex(gaz), cfg, query_col="caption", id_col="image_id", explode=True)(imgs)
        b_set = sorted(
            (r["query_id"], int(r["rk"]), int(r["place_id"])) for r in b_out.to_pylist()
        )
        s_out = run_forward_shuffle(
            ip, gp, cfg, query_col="caption", id_col="image_id", n_salts=4, hot_threshold=10
        ).take_all()
        s_set = sorted((r["query_id"], int(r["rk"]), int(r["place_id"])) for r in s_out)
        assert s_set == b_set and len(s_set) > 0

    def test_hot_token_query_load_spreads_over_salts(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa

        from geocoding_ray.functions.hashing import polyhash_strings
        from geocoding_ray.pipelines.forward_shuffle import (
            explode_gazetteer,
            make_query_keyer,
            make_salter,
        )

        gp, ip, gaz, imgs = self._tables(tmp_path)
        exploded = explode_gazetteer(gaz)
        keys = exploded.column("jtoken").to_numpy(zero_copy_only=False)
        vh, vc = np.unique(keys, return_counts=True)
        hot_key = int(polyhash_strings(pa.array(["metropolis"], type=pa.string())).view(np.int64)[0])
        hot = np.sort(vh[vc >= 10])
        assert hot_key in hot  # the stress token IS hot
        n_salts = 4
        keyer = make_query_keyer((vh, vc.astype(np.int64)), hot, n_salts, ForwardConfig(ignore_oov=True), "caption", "image_id")
        keyed = keyer(imgs)
        jk = keyed.column("jtoken").to_numpy(zero_copy_only=False)
        salts = keyed.column("salt").to_numpy(zero_copy_only=False)
        hot_salts = salts[jk == hot_key]
        # >50% of all queries joined on the hot key...
        assert len(hot_salts) > imgs.num_rows // 2
        # ...but no reducer group holds more than ~half of them, and at
        # least 3 of the 4 salts are used
        counts = np.bincount(hot_salts, minlength=n_salts)
        assert (counts > 0).sum() >= 3
        assert counts.max() <= int(0.5 * len(hot_salts))
        # gazetteer side: hot rows replicate to every salt so each
        # reducer can match independently
        salted = make_salter(np.sort(np.array([hot_key], dtype=np.int64)), n_salts)(exploded)
        gs = salted.filter(
            pa.array(salted.column("jtoken").to_numpy(zero_copy_only=False) == hot_key)
        )
        assert sorted(set(gs.column("salt").to_pylist())) == list(range(n_salts))


class TestReverseShuffleParity:
    """The cell co-shuffle reverse plan must equal the broadcast plan at
    ANY partitioning level (polygons straddle cell boundaries)."""

    def test_cell_level_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from geocoding_ray.pipelines.oracle_queries import _pip_lonlat, _rect_admin_table
        from geocoding_ray.pipelines.reverse_shuffle import run_reverse_shuffle

        eid = np.arange(500, dtype=np.int64)
        lon, lat = _pip_lonlat(eid)
        admin = _rect_admin_table()

        def run(level):
            pts = rd.from_arrow(
                pa.table({"event_id": pa.array(eid), "lon": pa.array(lon), "lat": pa.array(lat)})
            )
            rows = run_reverse_shuffle(pts, admin, cell_level=level).take_all()
            return sorted((r["event_id"], r["admin_id"], r["formatted"], r["match_kind"]) for r in rows)

        base = run(2)
        assert len(base) == len(eid)
        for level in (4, 6):
            assert run(level) == base, f"cell_level={level} diverged"

    def test_antimeridian_bbox_splits(self, ray_session):
        """A Fiji-style wrap bbox (minx > maxx) splits into two lon spans
        instead of underflowing the uint64 cell arithmetic."""
        import numpy as np
        import pyarrow as pa

        from geocoding_ray.pipelines.reverse_shuffle import explode_admin_cells
        from geocoding_ray.sources.schemas import ADMIN_SCHEMA, COMPONENT_FIELDS, COMPONENT_LANG_FIELDS
        from geocoding_ray.state import cells as _cells

        row = {
            "admin_id": 1, "name": "Fiji", "level": "country", "level_rank": 1,
            "rings": [[[179.0, -20.0], [-179.0, -20.0], [-179.0, -15.0], [179.0, -15.0], [179.0, -20.0]]],
            "minx": 179.0, "miny": -20.0, "maxx": -179.0, "maxy": -15.0,
            "area": 10.0, "formatted": "Fiji",
        }
        for f in COMPONENT_FIELDS + COMPONENT_LANG_FIELDS:
            row[f] = None
        t = pa.Table.from_pylist([row], schema=ADMIN_SCHEMA)
        out = explode_admin_cells(t, 4)
        _, x, _ = _cells.decode_xy(out.column("cell").to_numpy(zero_copy_only=False).view(np.uint64))
        assert set(x.tolist()) == {0, 15}  # west edge + east edge cells

        # wrap whose two lon edges quantize into the SAME cell column
        # (minx=1, maxx=0 both land in x=8 at level 4): the bbox spans
        # ~359 deg so the cover must still be ALL 16 columns — wrap is a
        # lon-space test, not a cell-space one
        row2 = dict(row)
        row2["rings"] = [[[1.0, -20.0], [0.0, -20.0], [0.0, -15.0], [1.0, -15.0], [1.0, -20.0]]]
        row2["minx"], row2["maxx"] = 1.0, 0.0
        t2 = pa.Table.from_pylist([row2], schema=ADMIN_SCHEMA)
        out2 = explode_admin_cells(t2, 4)
        _, x2, _ = _cells.decode_xy(out2.column("cell").to_numpy(zero_copy_only=False).view(np.uint64))
        assert set(x2.tolist()) == set(range(16))
        # and with NO duplicated (cell, polygon) rows: when both edges
        # quantize into the same column, segment 2 shrinks to [0, x1-1]
        # (round-3 advice — the duplicate was benign but inflated
        # replication)
        assert out2.num_rows == len(set(out2.column("cell").to_pylist()))

    def test_empty_countrycodes_matches_broadcast(self, ray_session, tmp_path):
        """An EMPTY countrycodes set filters everything in BOTH plans
        (`is not None` semantics, round-3 review)."""
        gp, ip, gaz, imgs = TestSaltingStress()._tables(tmp_path)
        from geocoding_ray.stages.forward import ForwardJoiner, GazetteerIndex

        cfg = ForwardConfig(ignore_oov=True, limit=3, countrycode=",")
        assert cfg.countrycodes is not None and len(cfg.countrycodes) == 0
        b_out = ForwardJoiner(GazetteerIndex(gaz), cfg, query_col="caption", id_col="image_id", explode=True)(imgs)
        s_out = run_forward_shuffle(ip, gp, cfg, query_col="caption", id_col="image_id").take_all()
        assert b_out.num_rows == 0 and len(s_out) == 0


class TestCLI:
    def test_reverse_cli_resumable(self, ray_session, fixture_dir, tmp_path, monkeypatch):
        """python -m geocoding_ray reverse --resumable runs and resumes
        (in-process: the CLI's guarded init reuses the test session)."""
        from geocoding_ray.__main__ import main

        out = str(tmp_path / "cli_out")
        args = [
            "reverse",
            "--images", fixture_dir["images_dir"],
            "--admin", fixture_dir["admin"],
            "--gazetteer", fixture_dir["gazetteer"],
            "--out", out,
            "--resumable", "--validate", "--concurrency", "2",
        ]
        assert main(args) == 0
        assert main(args) == 0  # resume no-op
        import glob

        import pyarrow.dataset as pads

        files = [f for p in sorted(glob.glob(out + "/part-*")) for f in sorted(glob.glob(p + "/*"))]
        t = pads.dataset(files, format="parquet").to_table()
        assert t.num_rows > 0 and "payload_ok" in t.column_names

    def test_dataset_admin_side_matches_table_side(self, ray_session):
        """The both-sides-large shape (admin as a Dataset, explode as a
        distributed stage) returns exactly the driver-table plan's rows."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from geocoding_ray.pipelines.oracle_queries import _pip_lonlat, _rect_admin_table
        from geocoding_ray.pipelines.reverse_shuffle import run_reverse_shuffle

        eid = np.arange(300, dtype=np.int64)
        lon, lat = _pip_lonlat(eid)
        pts = pa.table({"event_id": pa.array(eid), "lon": pa.array(lon), "lat": pa.array(lat)})
        admin = _rect_admin_table()
        key = lambda rows: sorted((r["event_id"], r["admin_id"], r["match_kind"]) for r in rows)
        a = key(run_reverse_shuffle(rd.from_arrow(pts), admin, cell_level=4).take_all())
        b = key(run_reverse_shuffle(rd.from_arrow(pts), rd.from_arrow(admin), cell_level=4).take_all())
        assert a == b and len(a) == 300


class TestHLLMergeBound:
    def test_register_premerge_bounds_merge_input(self, ray_session):
        """The final HLL map_groups must merge REGISTER rows (<= 2^p
        distinct (event_type, reg) rows per group, one max-rank each),
        never raw per-batch partial rows — the property that keeps the
        sketch's merge input 4096 rows/group at any corpus size
        (round-3 VERDICT Next #6 regression guard)."""
        from geocoding_ray.pipelines.text_queries import HLL_P, hll_registers

        rows = hll_registers("/root/testdata/sf0.001").take_all()
        assert rows
        m = 1 << HLL_P
        per_group: dict[str, int] = {}
        seen = set()
        for r in rows:
            per_group[r["event_type"]] = per_group.get(r["event_type"], 0) + 1
            key = (r["event_type"], r["reg"])
            # duplicate (event_type, reg) == the Max pre-merge is gone
            assert key not in seen
            seen.add(key)
        assert all(c <= m for c in per_group.values())
