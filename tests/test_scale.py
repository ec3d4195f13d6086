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
