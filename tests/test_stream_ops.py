"""Stream-shaped operator kernels: sessionization boundary repair and
the two-pass grouped-median plan (round-3 scale rework)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geocoding_ray.pipelines.text_queries import (
    SESSION_GAP_US,
    _median_bucket,
    sessionize_merge,
    sessionize_partial,
)

US = 1_000_000


def _events(uid, minutes):
    ts = pa.array((np.asarray(minutes, dtype=np.int64) * 60 * US), type=pa.int64()).cast(
        pa.timestamp("us")
    )
    return pa.table(
        {
            "event_id": pa.array(range(len(minutes)), type=pa.int64()),
            "user_id": pa.array([uid] * len(minutes), type=pa.int64()),
            "ts": ts,
        }
    )


class TestSessionizeKernels:
    def test_partial_splits_on_gap_and_user(self):
        t = pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ts": pa.array([0, 10 * 60 * US, 60 * 60 * US, 61 * 60 * US], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )
        p = sessionize_partial(t)
        # user 1: [0,10] then gap 50min > 30min -> new; user 2: own session
        assert p.num_rows == 3
        assert p.column("pn").to_pylist() == [2, 1, 1]

    def test_batch_boundary_repair(self):
        """A single true session split across arbitrary batch boundaries
        merges back to ONE session identical to the unsplit result."""
        minutes = [0, 10, 20, 25, 40, 55, 60]  # all gaps <= 30min: one session
        full = _events(7, minutes)
        whole = sessionize_merge(sessionize_partial(full))
        for cut in range(1, len(minutes)):
            p1 = sessionize_partial(full.slice(0, cut))
            p2 = sessionize_partial(full.slice(cut))
            merged = sessionize_merge(pa.concat_tables([p1, p2]))
            assert merged.to_pylist() == whole.to_pylist(), f"cut={cut}"
        assert whole.num_rows == 1
        r = whole.to_pylist()[0]
        assert r["n_events"] == len(minutes) and r["session_id"] == 1

    def test_multi_session_numbering_after_split(self):
        # sessions: [0..10], [50..60], [200]; split mid-second-session
        minutes = [0, 10, 50, 55, 60, 200]
        full = _events(3, minutes)
        p1 = sessionize_partial(full.slice(0, 4))
        p2 = sessionize_partial(full.slice(4))
        merged = sessionize_merge(pa.concat_tables([p1, p2]))
        assert merged.column("session_id").to_pylist() == [1, 2, 3]
        assert merged.column("n_events").to_pylist() == [2, 3, 1]


class TestMedianBucket:
    def test_bucket_monotone_and_equal_preserving(self):
        rng = np.random.RandomState(0)
        # (-0.0 excluded: it compares equal to 0.0 so np.sort leaves the
        # two bit patterns in either order; the bucket map puts -0.0 one
        # below 0.0, which is a consistent total order, just not the one
        # np.sort exposes for ties)
        v = np.sort(np.concatenate([rng.randn(1000) * 1e6, [-np.inf, np.inf, 0.0, 1e-300]]))
        b = _median_bucket(v)
        assert (np.diff(b) >= 0).all()  # order-preserving
        # equal doubles share a bucket
        w = np.array([3.25, 3.25, -7.5, -7.5])
        bw = _median_bucket(w)
        assert bw[0] == bw[1] and bw[2] == bw[3]

    def test_two_pass_selection_matches_sort(self):
        """Histogram bucket + in-bucket rank reproduces the full-sort
        floor((n-1)/2) selection on adversarial data (dups, negatives)."""
        rng = np.random.RandomState(1)
        v = np.concatenate([rng.randn(501), np.full(200, 1.5), np.full(100, -2.25)])
        rng.shuffle(v)
        want = np.sort(v)[(len(v) - 1) // 2]
        bkt = _median_bucket(v)
        # simulate: histogram -> target bucket + rank -> in-bucket pick
        ub, counts = np.unique(bkt, return_counts=True)
        rank = (len(v) - 1) // 2
        acc = 0
        for b_, c in zip(ub, counts):
            if acc + c > rank:
                tb, k = b_, rank - acc
                break
            acc += c
        got = np.sort(v[bkt == tb])[k]
        assert got == want


class TestMedianRefinement:
    """The histogram plan must refine (not funnel) when a 16-bit bucket
    holds more rows than the per-task bound."""

    def _write_events(self, tmp_path, rows):
        import pyarrow.parquet as pqw

        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), type=pa.int64()),
                "event_type": pa.array([r[0] for r in rows], type=pa.string()),
                "value": pa.array([r[1] for r in rows], type=pa.float64()),
                "ts": pa.array([0] * len(rows), type=pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array([0] * len(rows), type=pa.int64()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        pqw.write_table(t, str(d / "events.parquet"))
        return str(d)

    def test_dense_prefix_forces_refinement(self, ray_session, tmp_path):
        from geocoding_ray.pipelines.text_queries import q_grouped_median

        # 1001 DISTINCT doubles sharing their top 16 (and 32/48) key bits
        vals = [1.0 + k * 1e-12 for k in range(1001)]
        rows = [("dense", v) for v in vals] + [("plain", float(x)) for x in range(11)]
        sf = self._write_events(tmp_path, rows)
        out = {
            r["event_type"]: r["median_value"]
            for r in q_grouped_median(sf, _max_bucket_rows=64).take_all()
        }
        assert out["dense"] == np.sort(np.array(vals))[(len(vals) - 1) // 2]
        assert out["plain"] == 5.0

    def test_all_equal_degenerate_bucket_emits_directly(self, ray_session, tmp_path):
        from geocoding_ray.pipelines.text_queries import q_grouped_median

        rows = [("same", 7.5)] * 1001 + [("neg", -2.25)] * 7
        sf = self._write_events(tmp_path, rows)
        out = {
            r["event_type"]: r["median_value"]
            for r in q_grouped_median(sf, _max_bucket_rows=10).take_all()
        }
        assert out["same"] == 7.5 and out["neg"] == -2.25

    def test_all_null_group_emits_null_median(self, ray_session, tmp_path):
        import pyarrow.parquet as pqw

        from geocoding_ray.pipelines.text_queries import q_grouped_median

        t = pa.table(
            {
                "event_id": pa.array(range(6), type=pa.int64()),
                "event_type": pa.array(["nulls"] * 3 + ["vals"] * 3, type=pa.string()),
                "value": pa.array([None, None, None, 1.0, 2.0, 3.0], type=pa.float64()),
                "ts": pa.array([0] * 6, type=pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array([0] * 6, type=pa.int64()),
            }
        )
        d = tmp_path / "sfnull"
        d.mkdir(exist_ok=True)
        pqw.write_table(t, str(d / "events.parquet"))
        out = {r["event_type"]: r["median_value"] for r in q_grouped_median(str(d)).take_all()}
        assert out == {"nulls": None, "vals": 2.0}


class TestAsofKernels:
    """As-of carry-forward: in-batch resolution + cross-batch repair
    must reproduce the unsplit answer at every cut position."""

    def _events(self, uid, rows):
        # rows: list of (minute, event_type)
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), type=pa.int64()),
                "user_id": pa.array([uid] * len(rows), type=pa.int64()),
                "ts": pa.array([m * 60 * US for m, _ in rows], type=pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array([t for _, t in rows], type=pa.string()),
            }
        )

    def _run_split(self, full, cuts):
        from geocoding_ray.pipelines.text_queries import (
            asof_finish_resolved,
            asof_partial,
            asof_repair_user,
        )

        pieces = []
        prev = 0
        for c in list(cuts) + [full.num_rows]:
            if c > prev:
                pieces.append(asof_partial(full.slice(prev, c - prev)))
                prev = c
        parts = pa.concat_tables(pieces)
        resolved = asof_finish_resolved(parts)
        torepair = parts.filter(
            pa.array(parts.column("kind").to_numpy(zero_copy_only=False) > 0)
        )
        out = resolved.to_pylist()
        # group repair rows by user (single user here)
        if torepair.num_rows:
            out += asof_repair_user(torepair).to_pylist()
        return sorted((r["event_id"], r["last_click_ts"]) for r in out)

    def test_every_cut_matches_unsplit(self):
        rows = [
            (0, "view"), (5, "click"), (9, "view"), (12, "view"),
            (20, "click"), (21, "view"), (30, "view"), (31, "click"), (40, "view"),
        ]
        full = self._events(1, rows)
        want = self._run_split(full, [])
        # sanity: expected carry-forward values
        import datetime

        by_eid = dict(want)
        assert by_eid[0] is None  # before any click
        assert by_eid[2] == datetime.datetime(1970, 1, 1, 0, 5)  # after click@5
        assert by_eid[8] == datetime.datetime(1970, 1, 1, 0, 31)
        for cut in range(1, len(rows)):
            assert self._run_split(full, [cut]) == want, f"cut={cut}"
        # two cuts
        assert self._run_split(full, [2, 6]) == want

    def test_user_with_no_clicks_all_null(self):
        rows = [(0, "view"), (10, "view"), (99, "purchase")]
        full = self._events(7, rows)
        got = self._run_split(full, [1])
        assert all(v is None for _, v in got) and len(got) == 3
