"""Relational rollups: partial-aggregate mergeability and brute-force
parity on integerized money."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from geocoding_ray.pipelines import tpch_queries as tq


class TestPricingPartials:
    def test_partials_merge_exactly(self):
        li = pq.read_table(
            "/root/testdata/sf0.001/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )
        full = tq._pricing_partials(li).to_pydict()

        acc: dict[tuple, list[int]] = {}
        for lo in range(0, li.num_rows, 997):
            part = tq._pricing_partials(li.slice(lo, 997)).to_pydict()
            for i in range(len(part["n"])):
                k = (part["l_returnflag"][i], part["l_linestatus"][i])
                cur = acc.setdefault(k, [0, 0, 0, 0])
                cur[0] += part["n"][i]
                cur[1] += part["sum_qty"][i]
                cur[2] += part["sum_base"][i]
                cur[3] += part["sum_disc"][i]
        for i in range(len(full["n"])):
            k = (full["l_returnflag"][i], full["l_linestatus"][i])
            assert acc[k] == [
                full["n"][i],
                full["sum_qty"][i],
                full["sum_base"][i],
                full["sum_disc"][i],
            ]


class TestRevenueByNation:
    def test_matches_pandas_brute_force(self, ray_session):
        got = {
            r["n_name"]: r["revenue_micros"]
            for r in tq.q_revenue_by_nation("/root/testdata/sf0.001").take_all()
        }
        li = pq.read_table("/root/testdata/sf0.001/lineitem.parquet").to_pandas()
        su = pq.read_table("/root/testdata/sf0.001/supplier.parquet").to_pandas()
        na = pq.read_table("/root/testdata/sf0.001/nation.parquet").to_pandas()
        li["rev"] = np.floor(li["l_extendedprice"] * 100.0).astype(np.int64) * (
            100 - np.floor(li["l_discount"] * 100.0).astype(np.int64)
        )
        j = li.merge(su, left_on="l_suppkey", right_on="s_suppkey").merge(
            na, left_on="s_nationkey", right_on="n_nationkey"
        )
        exp = j.groupby("n_name")["rev"].sum()
        assert got == {k: int(v) for k, v in exp.items()}
