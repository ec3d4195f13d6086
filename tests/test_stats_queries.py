"""Stats operators: split-invariance of the z-score partials, sampling
determinism/quota, and term-df brute-force parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geocoding_ray.pipelines import stats_queries as sq


class TestZScorePartials:
    def test_partials_merge_exactly(self):
        """Summing per-batch (n, s, q) partials over ANY batch split
        equals the unsplit aggregate — the mergeability the groupby
        relies on."""
        rng = np.random.RandomState(11)
        n = 997
        et = rng.choice(["a", "b", "c"], n)
        val = rng.uniform(-5, 500, n)
        full = sq._zscore_partials(
            pa.table({"event_type": pa.array(et.tolist()), "value": pa.array(val)})
        ).to_pydict()

        def merge(cuts):
            acc: dict[str, list[int]] = {}
            lo = 0
            for hi in list(cuts) + [n]:
                part = sq._zscore_partials(
                    pa.table(
                        {
                            "event_type": pa.array(et[lo:hi].tolist()),
                            "value": pa.array(val[lo:hi]),
                        }
                    )
                ).to_pydict()
                for k, nn, ss, qq in zip(part["event_type"], part["n"], part["s"], part["q"]):
                    cur = acc.setdefault(k, [0, 0, 0])
                    cur[0] += nn
                    cur[1] += ss
                    cur[2] += qq
                lo = hi
            return acc

        merged = merge([1, 3, 500, 996])
        for k, nn, ss, qq in zip(full["event_type"], full["n"], full["s"], full["q"]):
            assert merged[k] == [nn, ss, qq]

    def test_zscore_matches_brute_force(self, ray_session):
        out = sq.q_group_zscore("/root/testdata/sf0.001").take_all()
        import pyarrow.parquet as pq

        ev = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
        ev = ev[np.isfinite(ev["value"])]
        ev["v"] = np.floor(ev["value"] * 100.0).astype(np.int64)
        got = {r["event_id"]: r["z_micro"] for r in out}
        for et, grp in ev.groupby("event_type"):
            v = grp["v"].to_numpy()
            mu, sd = v.mean(), v.std()  # population
            for eid, vi in zip(grp["event_id"], v):
                if sd == 0:
                    assert got[eid] is None
                else:
                    z = (vi - mu) / sd
                    assert abs(got[eid] / 1e6 - z) < 2e-6

    def test_zero_variance_group_is_null(self, ray_session, tmp_path):
        import pyarrow.parquet as pqw
        import ray.data as rd  # noqa: F401

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "event_type": pa.array(["flat", "flat", "x", "x"]),
                "value": pa.array([7.0, 7.0, 1.0, 2.0]),
            }
        )
        d = tmp_path / "zv"
        d.mkdir()
        pqw.write_table(t, str(d / "events.parquet"))
        rows = {r["event_id"]: r["z_micro"] for r in sq.q_group_zscore(str(d)).take_all()}
        assert rows[1] is None and rows[2] is None
        assert rows[3] == -1_000_000 and rows[4] == 1_000_000


class TestStratifiedSample:
    def test_quota_and_determinism(self, ray_session):
        a = sq.q_stratified_sample("/root/testdata/sf0.001").take_all()
        b = sq.q_stratified_sample("/root/testdata/sf0.001").take_all()
        key = lambda r: (r["lang"], r["rk"])  # noqa: E731
        assert sorted((r["lang"], r["rk"], r["doc_id"]) for r in a) == sorted(
            (r["lang"], r["rk"], r["doc_id"]) for r in b
        )
        per_lang: dict[str, int] = {}
        for r in a:
            per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert all(v <= sq.STRATified_K for v in per_lang.values())
        assert len({key(r) for r in a}) == len(a)  # ranks unique per lang


class TestQualityFilter:
    def test_matches_brute_force(self, ray_session):
        import pyarrow.parquet as pq

        out = sq.q_quality_filter("/root/testdata/sf0.001").take_all()
        docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
        exp = set()
        for lang, grp in docs.groupby("lang"):
            v = np.sort(grp["n_chars"].to_numpy())
            med = v[(len(v) - 1) // 2]  # quantile_disc(0.5) rule
            exp |= set(grp.loc[grp["n_chars"] > med, "doc_id"])
        assert {r["doc_id"] for r in out} == exp


class TestTermDF:
    def test_matches_brute_force(self, ray_session):
        import pyarrow.parquet as pq

        out = sq.q_term_df("/root/testdata/sf0.001").take_all()
        docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
        df: dict[tuple[str, str], int] = {}
        for lang, text in zip(docs["lang"], docs["text"]):
            for term in set(sq._TERM_RE.split(text.lower())):
                if term:
                    df[(lang, term)] = df.get((lang, term), 0) + 1
        for r in out:
            assert df[(r["lang"], r["term"])] == r["df"]
        # ranks are df-descending within each lang
        by_lang: dict[str, list] = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append((r["rk"], r["df"], r["term"]))
        for rows in by_lang.values():
            rows.sort()
            dfs = [x[1] for x in rows]
            assert dfs == sorted(dfs, reverse=True)
            assert len(rows) == min(sq.TOP_TERMS, len(rows))


class TestUniqueDocs:
    def test_excludes_duplicated_content(self, ray_session, tmp_path):
        import pyarrow.parquet as pqw

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": pa.array(["same", "same", "only", "same", "alone"]),
                "lang": pa.array(["en"] * 5),
            }
        )
        d = tmp_path / "ud"
        d.mkdir()
        pqw.write_table(t, str(d / "documents.parquet"))
        out = {r["doc_id"] for r in sq.q_unique_docs(str(d)).take_all()}
        assert out == {3, 5}

    def test_sf01_has_real_duplicates(self, ray_session):
        # the sf0.1 documents table contains duplicated content, so the
        # anti-join's non-trivial branch is exercised at bench scale
        out = sq.q_unique_docs("/root/testdata/sf0.1").take_all()
        import pyarrow.parquet as pq

        n = pq.ParquetFile("/root/testdata/sf0.1/documents.parquet").metadata.num_rows
        assert len(out) < n
