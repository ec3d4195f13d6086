"""OLAP/window operators: running-sum split invariance at every batch
cut, carry-offset ordering, and rollup partial mergeability."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geocoding_ray.pipelines import olap_queries as ol


def _events(uid, ts, eid, val):
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "value": pa.array(val, type=pa.float64()),
        }
    )


def _brute_running(uid, ts, eid, val):
    cents = np.floor(np.array(val) * 100.0).astype(np.int64)
    order = np.lexsort((eid, np.array(ts, dtype="datetime64[us]").astype(np.int64), uid))
    out = {}
    acc: dict[int, int] = {}
    for i in order:
        u = uid[i]
        acc[u] = acc.get(u, 0) + int(cents[i])
        out[eid[i]] = acc[u]
    return out


class TestRunningSum:
    def _mk(self, n=200, seed=3):
        rng = np.random.RandomState(seed)
        uid = rng.randint(0, 6, n).tolist()
        base = np.datetime64("2024-01-01")
        ts = (base + rng.randint(0, 40, n).astype("timedelta64[s]")).astype("datetime64[us]")
        eid = rng.permutation(n).tolist()
        val = rng.uniform(-5, 50, n).tolist()  # negatives exercise non-monotone prefixes
        return uid, ts, eid, val

    def test_local_plus_carry_equals_global_at_every_cut(self):
        """Simulate the full plan at arbitrary batch boundaries: sort,
        cut into batches, _running_local per batch, carry offsets per
        user over the per-batch totals, local + carry == window SUM."""
        uid, ts, eid, val = self._mk()
        n = len(uid)
        want = _brute_running(uid, ts, eid, val)
        order = np.lexsort((eid, ts.astype(np.int64), np.array(uid)))
        tbl = _events(
            [uid[i] for i in order],
            ts[order],
            [eid[i] for i in order],
            [val[i] for i in order],
        )
        for cuts in ([], [1], [n // 3, n // 2], [7, 8, 9, 150], list(range(0, n, 13))):
            bounds = [0] + [c for c in cuts if 0 < c < n] + [n]
            parts = [
                ol._running_local(tbl.slice(lo, hi - lo))
                for lo, hi in zip(bounds[:-1], bounds[1:])
            ]
            rows = pa.concat_tables(parts)
            # summaries: Sum(cents) per (user, batch key)
            key_cols = ["user_id", "b_uid", "b_ts", "b_eid"]
            import collections

            sums: dict[tuple, int] = collections.defaultdict(int)
            for r in rows.to_pylist():
                sums[tuple(r[k] for k in key_cols)] += r["cents"]
            summary = pa.table(
                {
                    "user_id": pa.array([k[0] for k in sums], type=pa.int64()),
                    "b_uid": pa.array([k[1] for k in sums], type=pa.int64()),
                    "b_ts": pa.array([k[2] for k in sums], type=pa.int64()),
                    "b_eid": pa.array([k[3] for k in sums], type=pa.int64()),
                    "tot": pa.array(list(sums.values()), type=pa.int64()),
                }
            )
            carry: dict[tuple, int] = {}
            for u in set(summary.column("user_id").to_pylist()):
                g = summary.filter(pa.compute.equal(summary.column("user_id"), u))
                off = ol._carry_offsets(g)
                for r in off.to_pylist():
                    carry[(r["user_id"], r["b_uid"], r["b_ts"], r["b_eid"])] = r["carry"]
            for r in rows.to_pylist():
                k = tuple(r[c] for c in key_cols)
                got = r["local_cents"] + carry[k]
                assert got == want[r["event_id"]], (cuts, r["event_id"])

    def test_carry_offsets_order(self):
        """Offsets follow batch-key lexicographic order, matching the
        global sort order of the batches."""
        g = pa.table(
            {
                "user_id": pa.array([1, 1, 1], type=pa.int64()),
                "b_uid": pa.array([0, 1, 1], type=pa.int64()),
                "b_ts": pa.array([50, 10, 20], type=pa.int64()),
                "b_eid": pa.array([0, 0, 0], type=pa.int64()),
                "tot": pa.array([5, 7, 11], type=pa.int64()),
            }
        )
        off = ol._carry_offsets(g)
        got = {
            (r["b_uid"], r["b_ts"]): r["carry"] for r in off.to_pylist()
        }
        # order: (0,50) -> (1,10) -> (1,20)
        assert got == {(0, 50): 0, (1, 10): 5, (1, 20): 12}


class TestRollupPartials:
    def test_levels_merge_to_rollup(self, ray_session):
        import duckdb

        out = {
            (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty_cents"], r["n"])
            for r in ol.q_qty_rollup("/root/testdata/sf0.001").take_all()
        }
        con = duckdb.connect()
        want = {
            (rf or ol.ROLL_ALL, ls or ol.ROLL_ALL): (int(q), int(n))
            for rf, ls, q, n in con.execute(
                "SELECT l_returnflag, l_linestatus, "
                "SUM(CAST(floor(l_quantity*100.0) AS BIGINT)), COUNT(*) "
                "FROM '/root/testdata/sf0.001/lineitem.parquet' "
                "GROUP BY ROLLUP(l_returnflag, l_linestatus)"
            ).fetchall()
        }
        assert out == want
        # subtotal consistency: leafs sum to their flag subtotal, flags to grand total
        flags = {k[0] for k in out if k[0] != ol.ROLL_ALL}
        for f in flags:
            leaf = sum(v[0] for k, v in out.items() if k[0] == f and k[1] != ol.ROLL_ALL)
            assert leaf == out[(f, ol.ROLL_ALL)][0]
        assert sum(v[0] for k, v in out.items() if k[0] != ol.ROLL_ALL and k[1] != ol.ROLL_ALL) == out[(ol.ROLL_ALL, ol.ROLL_ALL)][0]


class TestGlobalRank:
    def test_rank_semantics_with_ties(self, ray_session):
        rows = ol.q_global_rank("/root/testdata/sf0.001").take_all()
        by_len: dict[int, list[int]] = {}
        for r in rows:
            by_len.setdefault(r["n_chars"], []).append(r["rnk"])
        total = 0
        for length in sorted(by_len):
            rnks = set(by_len[length])
            assert rnks == {total + 1}, "all ties share the min rank"
            total += len(by_len[length])


class TestValueDelta:
    def test_lag_repair_at_every_cut(self, ray_session):
        """End-to-end plan equals the window LAG under forced tiny
        batches: run q_value_delta over a small parquet written at
        several row-group sizes and compare to brute force."""
        import tempfile

        import pyarrow.parquet as pq

        rng = np.random.RandomState(13)
        n = 300
        uid = rng.randint(0, 4, n)
        ts = (
            np.datetime64("2024-01-01") + rng.randint(0, 60, n).astype("timedelta64[s]")
        ).astype("datetime64[us]")
        eid = rng.permutation(n)
        val = rng.uniform(-3, 30, n)
        cents = np.floor(val * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts.astype(np.int64), uid))
        want: dict[int, object] = {}
        prev: dict[int, int] = {}
        for i in order:
            u = int(uid[i])
            want[int(eid[i])] = int(cents[i]) - prev[u] if u in prev else None
            prev[u] = int(cents[i])
        tbl = pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(uid, type=pa.int64()),
                "ts": pa.array(ts),
                "value": pa.array(val, type=pa.float64()),
            }
        )
        for rg in (7, 50, n):
            with tempfile.TemporaryDirectory() as td:
                pq.write_table(tbl, f"{td}/events.parquet", row_group_size=rg)
                got = {
                    r["event_id"]: r["delta_cents"]
                    for r in ol.q_value_delta(td).take_all()
                }
                assert got == want, rg

    def test_boundary_candidates_merge(self):
        """_lag_boundaries over ANY re-batching of the rows merges (via
        _lag_prev's collapse rule) to the true per-batch last row."""
        rows = ol._lag_local(
            pa.table(
                {
                    "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "user_id": pa.array([7, 7, 7, 7], type=pa.int64()),
                    "ts": pa.array(
                        np.array(
                            ["2024-01-01T00:00:00"] * 4, dtype="datetime64[us]"
                        )
                    ),
                    "value": pa.array([1.0, 2.0, 3.0, 4.0], type=pa.float64()),
                }
            )
        )
        # split candidate extraction across every cut
        for cut in (1, 2, 3):
            cands = pa.concat_tables(
                [
                    ol._lag_boundaries(rows.slice(0, cut)),
                    ol._lag_boundaries(rows.slice(cut)),
                ]
            )
            out = ol._lag_prev(cands)
            # single batch key -> one collapsed row, prev = NaN
            assert out.num_rows == 1
            assert np.isnan(out.column("prev_cents").to_pylist()[0])


class TestNtileClosedForm:
    def test_matches_duckdb_ntile(self):
        import duckdb

        con = duckdb.connect()
        for n in (1, 4, 5, 7, 100, 101, 103):
            rn = np.arange(1, n + 1, dtype=np.int64)
            got = ol._ntile_of(rn, n, ol.NTILE_K).tolist()
            want = [
                t
                for (t,) in con.execute(
                    f"SELECT NTILE({ol.NTILE_K}) OVER (ORDER BY i) "
                    f"FROM range(1, {n + 1}) t(i) ORDER BY i"
                ).fetchall()
            ]
            assert got == want, n


class TestFunnel:
    def test_order_sensitivity(self, ray_session):
        """The greedy chain only matches strictly ordered funnels: a
        user whose purchase precedes their click must NOT qualify."""
        import tempfile

        import pyarrow.parquet as pq

        def ev(uid, et, t, i):
            return (i, uid, et, np.datetime64(t, "us"), 1.0)

        rows = [
            # user 1: proper order -> qualifies
            ev(1, "signup", "2024-01-01T00:00", 1),
            ev(1, "click", "2024-01-02T00:00", 2),
            ev(1, "purchase", "2024-01-03T00:00", 3),
            # user 2: purchase before click -> fails
            ev(2, "signup", "2024-01-01T00:00", 4),
            ev(2, "purchase", "2024-01-02T00:00", 5),
            ev(2, "click", "2024-01-03T00:00", 6),
            # user 3: missing click -> fails
            ev(3, "signup", "2024-01-01T00:00", 7),
            ev(3, "purchase", "2024-01-02T00:00", 8),
            # user 4: early failed chain, later complete chain -> qualifies
            ev(4, "click", "2024-01-01T00:00", 9),
            ev(4, "signup", "2024-01-02T00:00", 10),
            ev(4, "click", "2024-01-03T00:00", 11),
            ev(4, "purchase", "2024-01-04T00:00", 12),
        ]
        batch = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "ts": pa.array(np.array([r[3] for r in rows], dtype="datetime64[us]")),
                "value": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )
        with tempfile.TemporaryDirectory() as td:
            pq.write_table(batch, f"{td}/events.parquet")
            got = {r["user_id"] for r in ol.q_funnel(td).take_all()}
        assert got == {1, 4}


class TestTwap:
    """LOCF-integral split invariance: at EVERY batch cut, per-batch
    segment summaries + the per-user bridge merge reproduce the
    brute-force time-weighted average."""

    def _mk(self, n=120, seed=11):
        rng = np.random.RandomState(seed)
        uid = rng.randint(0, 5, n)
        base = np.datetime64("2024-01-01")
        ts = (base + rng.randint(0, 500, n).astype("timedelta64[s]")).astype("datetime64[us]")
        # microsecond jitter so spans are not second-aligned
        ts = ts + rng.randint(0, 1_000_000, n).astype("timedelta64[us]")
        eid = rng.permutation(n)
        val = rng.uniform(0.01, 300, n)
        return uid, ts, eid, val

    @staticmethod
    def _brute(uid, ts, eid, val):
        cents = np.floor(np.array(val) * 100.0).astype(np.int64)
        tsi = ts.astype(np.int64)
        out = {}
        for u in np.unique(uid):
            m = uid == u
            order = np.lexsort((eid[m], tsi[m]))
            t, c = tsi[m][order], cents[m][order]
            if len(t) < 2 or t[-1] == t[0]:
                continue
            num = sum(int(c[i]) * (int(t[i + 1]) - int(t[i])) for i in range(len(t) - 1))
            out[int(u)] = num // (int(t[-1]) - int(t[0]))
        return out

    def test_merge_invariant_at_every_cut(self):
        uid, ts, eid, val = self._mk()
        n = len(uid)
        want = self._brute(uid, ts, eid, val)
        order = np.lexsort((eid, ts.astype(np.int64), uid))
        tbl = _events(uid[order].tolist(), ts[order], eid[order].tolist(), val[order].tolist())
        for cuts in ([], [1], [n - 1], [n // 3, n // 2], list(range(0, n, 7))):
            bounds = [0] + [c for c in cuts if 0 < c < n] + [n]
            parts = [
                ol._twap_local(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]))
                for i in range(len(bounds) - 1)
            ]
            summaries = pa.concat_tables([p for p in parts if p.num_rows])
            got = {}
            for u in np.unique(summaries.column("user_id").to_numpy()):
                g = summaries.filter(pa.compute.equal(summaries.column("user_id"), int(u)))
                res = ol._twap_merge(g)
                if res.num_rows:
                    got[int(u)] = res.column("twap_cents")[0].as_py()
            assert got == want, f"cuts={cuts}"

    def test_zero_span_and_singletons_drop(self):
        # one user with a single event, one with two events at the SAME ts
        tbl = _events(
            [1, 2, 2],
            np.array(["2024-01-01T00:00:00"] * 3, dtype="datetime64[us]"),
            [10, 11, 12],
            [5.0, 7.0, 9.0],
        )
        seg = ol._twap_local(tbl)
        out = pa.concat_tables(
            [
                ol._twap_merge(seg.filter(pa.compute.equal(seg.column("user_id"), u)))
                for u in (1, 2)
            ]
        )
        assert out.num_rows == 0


class TestSkyline:
    """2-D skyline kernel: brute-force dominance parity and the
    lossless-local-prune property (kernel over concatenated local
    skylines == kernel over the whole input)."""

    @staticmethod
    def _orders(rng, n):
        return pa.table(
            {
                "o_orderkey": pa.array(np.arange(n), type=pa.int64()),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(10, 1000, size=n), 2), type=pa.float64()
                ),
                "o_orderdate": pa.array(
                    rng.integers(0, 50, size=n).astype("datetime64[D]").astype("datetime64[us]")
                ),
            }
        )

    @staticmethod
    def _brute(tbl):
        p = tbl.column("o_totalprice").to_numpy()
        d = tbl.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = []
        for i in range(len(p)):
            dominated = (
                (p >= p[i]) & (d <= d[i]) & ((p > p[i]) | (d < d[i]))
            ).any()
            if not dominated:
                keep.append(i)
        return set(tbl.column("o_orderkey").take(pa.array(keep)).to_pylist())

    def test_kernel_matches_brute_force(self):
        rng = np.random.default_rng(11)
        tbl = self._orders(rng, 400)
        got = set(ol._skyline_kernel(tbl).column("o_orderkey").to_pylist())
        assert got == self._brute(tbl)

    def test_local_prune_lossless(self):
        rng = np.random.default_rng(13)
        tbl = self._orders(rng, 600)
        whole = set(ol._skyline_kernel(tbl).column("o_orderkey").to_pylist())
        for cut in (1, 37, 300, 599):
            parts = [tbl.slice(0, cut), tbl.slice(cut)]
            merged = pa.concat_tables([ol._skyline_kernel(t) for t in parts])
            got = set(ol._skyline_kernel(merged).column("o_orderkey").to_pylist())
            assert got == whole

    def test_price_tie_rows_all_survive(self):
        # equal (price, date) rows never dominate each other
        tbl = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_totalprice": pa.array([5.0, 5.0, 4.0], type=pa.float64()),
                "o_orderdate": pa.array(
                    np.array([0, 0, 0], dtype="datetime64[us]")
                ),
            }
        )
        got = set(ol._skyline_kernel(tbl).column("o_orderkey").to_pylist())
        assert got == {1, 2}


# ---------------------------------------------------------------------------
# interval_union: kernel closure (split invariance) + strict-overlap rule
# ---------------------------------------------------------------------------


def _ref_union(pairs):
    """Single-user reference: sorted sweep in plain Python."""
    out = []
    for s, e in sorted(pairs):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(a, b) for a, b in out]


def test_union_islands_matches_reference_and_is_split_invariant():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        uid = np.sort(rng.integers(0, 4, size=n)).astype(np.int64)
        s = rng.integers(0, 1000, size=n).astype(np.int64)
        e = s + rng.integers(1, 120, size=n).astype(np.int64)
        order = np.lexsort((e, s, uid))
        uid, s, e = uid[order], s[order], e[order]

        u1, s1, e1 = ol._union_islands(uid, s, e)
        # reference per user
        ref = {}
        for u in np.unique(uid):
            m = uid == u
            ref[int(u)] = _ref_union(list(zip(s[m].tolist(), e[m].tolist())))
        got = {}
        for u, a, b in zip(u1.tolist(), s1.tolist(), e1.tolist()):
            got.setdefault(u, []).append((a, b))
        assert got == ref

        # closure: cut the sorted stream anywhere, union each piece,
        # re-sort the island rows, union again -> same islands
        cut = int(rng.integers(1, n + 1))
        parts = []
        for lo, hi in ((0, cut), (cut, n)):
            if hi > lo:
                parts.append(ol._union_islands(uid[lo:hi], s[lo:hi], e[lo:hi]))
        cu = np.concatenate([p[0] for p in parts])
        cs = np.concatenate([p[1] for p in parts])
        ce = np.concatenate([p[2] for p in parts])
        o2 = np.lexsort((ce, cs, cu))
        u2, s2, e2 = ol._union_islands(cu[o2], cs[o2], ce[o2])
        assert (u2 == u1).all() and (s2 == s1).all() and (e2 == e1).all()


def test_union_islands_touching_merges():
    uid = np.zeros(2, dtype=np.int64)
    s = np.array([0, 10], dtype=np.int64)
    e = np.array([10, 20], dtype=np.int64)
    u, a, b = ol._union_islands(uid, s, e)
    assert len(a) == 1 and a[0] == 0 and b[0] == 20


def test_attribution_vs_brute_force(ray_session):
    """searchsorted window credit vs the O(P*C) double loop on the real
    sf0.001 events, including the half-open [t-W, t) boundary."""
    import pandas as pd
    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.olap_queries import ATTR_WINDOW_US, q_attribution

    sf = "/root/testdata/sf0.001"
    df = pq.read_table(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    df["us"] = df["ts"].astype("int64")
    ref: dict[int, tuple[int, int]] = {}
    for uid, g in df.groupby("user_id"):
        clicks = sorted(g.loc[g.event_type == "click", "us"])
        purch = list(g.loc[g.event_type == "purchase", "us"])
        if not purch:
            continue
        hits = sum(
            sum(1 for c in clicks if p - ATTR_WINDOW_US <= c < p) for p in purch
        )
        ref[int(uid)] = (len(purch), hits)

    got = q_attribution(sf).to_pandas()
    assert {
        int(r.user_id): (int(r.n_purchases), int(r.n_attributed))
        for r in got.itertuples()
    } == ref
    assert got["n_attributed"].sum() > 0  # window actually credits something


def test_attribution_boundary_exactness(ray_session, tmp_path):
    """A click exactly at purchase time never credits; one exactly W
    before does — the two off-by-one edges of the half-open window."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.olap_queries import ATTR_WINDOW_US, q_attribution

    base = 1_700_000_000_000_000
    rows = {
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 7],
        "ts": pa.array(
            [base, base + ATTR_WINDOW_US, base + ATTR_WINDOW_US, base + 1],
            type=pa.timestamp("us"),
        ),
        "event_type": ["click", "purchase", "click", "click"],
        "value": [1.0, 2.0, 3.0, 4.0],
        "props": ["{}"] * 4,
    }
    d = tmp_path / "attr"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "events.parquet"))
    got = q_attribution(str(d)).to_pandas()
    # credits: click@base (== t-W, inclusive) + click@base+1; NOT the
    # click at exactly purchase time
    assert got.to_dict("records") == [
        {"user_id": 7, "n_purchases": 1, "n_attributed": 2}
    ]


def test_ring_area_vs_scalar_shoelace(ray_session):
    """Vectorized cyclic shoelace vs a per-vertex scalar loop, and the
    degenerate n<=2 rings yield exactly zero."""
    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.geo_analytics import (
        RING_MOD,
        RING_XM,
        RING_YM,
        q_ring_area,
    )

    sf = "/root/testdata/sf0.001"
    df = pq.read_table(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    df["us"] = df["ts"].astype("int64")
    ref = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        e = g["event_id"].to_numpy()
        x = [(int(v) * RING_XM) % RING_MOD for v in e]
        y = [(int(v) * RING_YM) % RING_MOD for v in e]
        s = 0
        for i in range(len(x)):
            j = (i + 1) % len(x)
            s += x[i] * y[j] - x[j] * y[i]
        ref[int(uid)] = s
    got = q_ring_area(sf).to_pandas()
    assert dict(zip(got["user_id"], got["s2"])) == ref
    assert (got["area2_abs"] == got["s2"].abs()).all()


# ---------------------------------------------------------------------------
# max drawdown: segment-fold split invariance
# ---------------------------------------------------------------------------


def _brute_drawdown(cents):
    peak = -(1 << 62)
    dd = 0
    for c in cents:
        peak = max(peak, c)
        dd = max(dd, peak - c)
    return dd


class TestMaxDrawdown:
    def test_fold_split_invariant_at_every_cut(self):
        """dd(L+R) = max(dd_L, dd_R, max_L - min_R): running _drawdown_partial
        on every 2-way cut of a sorted single-user stream and merging must
        reproduce the scalar scan, for adversarial shapes (monotone up,
        monotone down, V, peak-first, trough-first)."""
        streams = [
            [1, 2, 3, 4, 5],
            [5, 4, 3, 2, 1],
            [3, 1, 4, 1, 5, 9, 2, 6],
            [10, -5, 7, -20, 30, 0],
            [0, 0, 0],
            [7],
        ]
        rng = np.random.RandomState(11)
        streams.append(rng.randint(-100, 100, 64).tolist())
        for cents in streams:
            n = len(cents)
            want = _brute_drawdown(cents)
            ts = np.arange(n).astype("datetime64[us]")
            vals = [c / 100.0 for c in cents]
            tbl = _events([1] * n, ts, list(range(n)), vals)
            for cut in range(0, n + 1):
                parts = [
                    ol._drawdown_partial(tbl.slice(0, cut)),
                    ol._drawdown_partial(tbl.slice(cut, n - cut)),
                ]
                merged = ol._drawdown_merge(pa.concat_tables(parts))
                assert merged.column("max_drawdown")[0].as_py() == want, (cents, cut)
                assert merged.column("n_events")[0].as_py() == n

    def test_partial_handles_value_floor(self):
        # floor(-0.01*100) = -1 exactly (not trunc toward 0)
        tbl = _events([1, 1], np.array([0, 1], dtype="datetime64[us]"), [0, 1], [0.02, -0.01])
        p = ol._drawdown_partial(tbl)
        assert p.column("mx")[0].as_py() == 2 and p.column("mn")[0].as_py() == -1


class TestDecayedSum:
    def test_matches_direct_weighting_under_cuts(self):
        rng = np.random.RandomState(5)
        n = 100
        ts = rng.permutation(n).astype("datetime64[us]")
        eid = list(range(n))
        val = rng.uniform(0, 300, n).round(2).tolist()
        tbl = _events([1] * n, ts, eid, val)
        order = np.argsort(ts.astype(np.int64))[::-1]
        cents = np.floor(np.array(val) * 100.0).astype(np.int64)[order]
        want = int(
            sum(int(cents[j]) << (ol.DECAY_TAPS - (j + 1)) for j in range(min(ol.DECAY_TAPS, n)))
        )
        for cut in [0, 1, 17, 50, 99, 100]:
            parts = pa.concat_tables(
                [
                    ol._decay_partial(tbl.slice(0, cut)),
                    ol._decay_partial(tbl.slice(cut, n - cut)),
                ]
            )
            got = ol._decay_merge(parts)
            assert got.column("decayed")[0].as_py() == want


class TestRollingSumW3:
    def test_boundary_repair_at_every_cut(self):
        """Simulate the full plan at arbitrary batch cuts of a sorted
        multi-user stream: _roll_local per batch, _roll_boundaries ->
        _roll_repair per user, heads overridden — must equal the scalar
        3-row window sum at every cut."""
        rng = np.random.RandomState(23)
        n = 120
        uid = np.sort(rng.randint(0, 5, n))
        ts = np.arange(n).astype("datetime64[us]")
        eid = list(range(n))
        val = rng.uniform(-5, 50, n).round(2).tolist()
        cents = np.floor(np.array(val) * 100.0).astype(np.int64)
        want = {}
        hist: dict[int, list] = {}
        for i in range(n):
            h = hist.setdefault(int(uid[i]), [])
            h.append(int(cents[i]))
            want[i] = sum(h[-3:])
        tbl = _events(uid.tolist(), ts, eid, val)
        for cuts in ([], [1], [2], [n // 2], [3, 4, 5, 60], list(range(0, n, 7))):
            bounds = [0] + [c for c in cuts if 0 < c < n] + [n]
            locals_ = [
                ol._roll_local(tbl.slice(lo, hi - lo)) for lo, hi in zip(bounds[:-1], bounds[1:])
            ]
            bnd = pa.concat_tables([ol._roll_boundaries(t) for t in locals_])
            fixes = {}
            for u in np.unique(bnd.column("user_id").to_numpy(zero_copy_only=False)):
                mask = [
                    i
                    for i, v in enumerate(bnd.column("user_id").to_pylist())
                    if v == u
                ]
                rep = ol._roll_repair(bnd.take(pa.array(mask, type=pa.int64())))
                for r in rep.to_pylist():
                    fixes[r["r_eid"]] = r["fixed"]
            got = {}
            for t in locals_:
                for r in t.to_pylist():
                    got[r["event_id"]] = (
                        fixes[r["event_id"]] if r["rank"] < ol.ROLL_W else r["local"]
                    )
            assert got == want, cuts


class TestNearestClick:
    def test_two_sided_probe_matches_brute(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        rng = np.random.RandomState(41)
        n = 300
        ts_us = np.sort(rng.randint(0, 4 * ol.NEAREST_W_US, n).astype(np.int64))
        uid = rng.randint(0, 4, n)
        et = np.where(rng.rand(n) < 0.5, "click", "purchase")
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n), type=pa.int64()),
                "ts": pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(uid, type=pa.int64()),
                "event_type": pa.array(et.tolist(), type=pa.string()),
                "value": pa.array(np.ones(n), type=pa.float64()),
                "props": pa.array(["{}"] * n, type=pa.string()),
            }
        )
        d = str(tmp_path)
        pq.write_table(tbl, f"{d}/events.parquet")
        got = {
            r["event_id"]: (r["click_ts"], r["delta_us"])
            for r in ol.q_nearest_click(d).take_all()
        }
        for i in range(n):
            if et[i] != "purchase":
                continue
            cands = [
                int(ts_us[j])
                for j in range(n)
                if et[j] == "click"
                and uid[j] == uid[i]
                and abs(int(ts_us[j]) - int(ts_us[i])) <= ol.NEAREST_W_US
            ]
            if not cands:
                assert got[i] == (None, None), i
            else:
                best = min(cands, key=lambda c: (abs(c - int(ts_us[i])), c))
                ct, dus = got[i]
                assert dus == best - int(ts_us[i]), i
                import pandas as pd

                assert pd.Timestamp(ct).value // 1000 == best, i
