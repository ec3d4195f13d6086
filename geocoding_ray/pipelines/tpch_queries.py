"""Relational rollups over the TPC-H-ish tables: generic join +
exact-integer aggregation building blocks.

Two canonical shapes a general-purpose engine must do well at 100 TB:

* ``pricing_summary`` (TPC-H Q1 shape): wide-table scan -> per-batch
  vectorized partial aggregates on integerized money -> slim groupby
  merge.  The shuffle carries #groups x #blocks rows, never data rows.
* ``revenue_by_nation`` (Q5-ish shape): fact-side pre-aggregation by
  join key BEFORE any join, then a broadcast hash join against the
  small dimension chain (supplier -> nation), then the final tiny
  groupby.  The fact table is never shuffled at full width.

Money handling: doubles are integerized (cents = floor(x * 100)) at
the scan, so every sum is an exact int64 both here and in DuckDB
(hugeint) — float summation order can never flip the compare.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# pricing summary (Q1 shape)
# ---------------------------------------------------------------------------


def _pricing_partials(batch: pa.Table) -> pa.Table:
    rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
    ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False)
    qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
    px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    qty_c = np.floor(qty * 100.0).astype(np.int64)
    px_c = np.floor(px * 100.0).astype(np.int64)
    disc_c = np.floor(disc * 100.0).astype(np.int64)
    # discounted price in exact integer micro-units: cents * (100 - disc_c)
    disc_px = px_c * (100 - disc_c)
    key = np.char.add(np.char.add(rf.astype(str), "|"), ls.astype(str))
    keys, inv = np.unique(key, return_inverse=True)
    n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
    sums = {}
    for name, v in (("sum_qty", qty_c), ("sum_base", px_c), ("sum_disc", disc_px)):
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, v)
        sums[name] = acc
    flags = [k.split("|") for k in keys.tolist()]
    return pa.table(
        {
            "l_returnflag": pa.array([f[0] for f in flags], type=pa.string()),
            "l_linestatus": pa.array([f[1] for f in flags], type=pa.string()),
            "n": pa.array(n, type=pa.int64()),
            "sum_qty": pa.array(sums["sum_qty"], type=pa.int64()),
            "sum_base": pa.array(sums["sum_base"], type=pa.int64()),
            "sum_disc": pa.array(sums["sum_disc"], type=pa.int64()),
        }
    )


def q_pricing_summary(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return (
        ds.map_batches(_pricing_partials, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="n", alias_name="count_order"),
            Sum(on="sum_qty", alias_name="sum_qty_cents"),
            Sum(on="sum_base", alias_name="sum_base_cents"),
            Sum(on="sum_disc", alias_name="sum_disc_micros"),
        )
    )


SQL_PRICING_SUMMARY = """
WITH v AS (
  SELECT l_returnflag, l_linestatus,
         CAST(floor(l_quantity * 100.0) AS BIGINT) AS qty_c,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS px_c,
         CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_c
  FROM lineitem)
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS count_order,
       CAST(SUM(qty_c) AS BIGINT) AS sum_qty_cents,
       CAST(SUM(px_c) AS BIGINT) AS sum_base_cents,
       CAST(SUM(px_c * (100 - disc_c)) AS BIGINT) AS sum_disc_micros
FROM v GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# revenue by nation (Q5 shape)
# ---------------------------------------------------------------------------


def q_revenue_by_nation(sf_dir: str):
    """Fact pre-aggregation by l_suppkey inside map_batches -> slim
    groupby(suppkey) -> broadcast dimension join (supplier->nation is
    driver-small; at 100 TB the dimension chain still fits a ray.put
    broadcast — the fact table is the only big side and it is never
    shuffled at full width)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    order = np.argsort(sk, kind="stable")
    sk, snk = sk[order], snk[order]
    norder = np.argsort(nk, kind="stable")
    nk, nname = nk[norder], nname[norder]
    dim_ref = ray.put((sk, snk, nk, nname))

    def partials(batch: pa.Table) -> pa.Table:
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        keys, inv = np.unique(supp, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "l_suppkey": pa.array(keys, type=pa.int64()),
                "rev": pa.array(acc, type=pa.int64()),
            }
        )

    def to_nation(batch: pa.Table) -> pa.Table:
        sk, snk, nk, nname = ray.get(dim_ref)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        si = np.searchsorted(sk, supp)
        ni = np.searchsorted(nk, snk[si])
        return pa.table(
            {
                "n_name": pa.array(nname[ni].tolist(), type=pa.string()),
                "rev": batch.column("rev"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum(on="rev", alias_name="rev"))
        .map_batches(to_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum(on="rev", alias_name="revenue_micros"))
    )


SQL_REVENUE_BY_NATION = """
SELECT n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100.0) AS BIGINT))) AS BIGINT)
         AS revenue_micros
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# outer-join and set-op breadth (left outer, full outer, union distinct)
# ---------------------------------------------------------------------------
#
# The engine's join surface is not just inner: data-lake maintenance
# needs LEFT OUTER (enrich, keep unmatched), FULL OUTER (align two
# partial aggregates) and UNION + DISTINCT (combine shard outputs).
# Each is one Ray `Dataset.join`/`union` over slim pre-aggregated
# sides — the fact tables are reduced per key BEFORE any exchange.


def q_left_join_enrich(sf_dir: str):
    """Every order with its (possibly absent) lineitem revenue rollup:
    LEFT OUTER keeps orders that have no lineitems, with NULL revenue.
    Fact side pre-aggregates per orderkey before the join, so the
    exchange carries one slim row per orderkey on each side."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def li_partials(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        keys, inv = np.unique(ok, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "l_orderkey": pa.array(keys, type=pa.int64()),
                "revenue_micros": pa.array(acc, type=pa.int64()),
            }
        )

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partials, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum(on="revenue_micros", alias_name="revenue_micros"))
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    joined = orders.join(
        li, join_type="left_outer", num_partitions=8, on=("o_orderkey",), right_on=("l_orderkey",)
    )
    return joined.select_columns(["o_orderkey", "o_orderpriority", "revenue_micros"])


SQL_LEFT_JOIN_ENRICH = """
WITH r AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100.0) AS BIGINT))) AS BIGINT)
           AS revenue_micros
  FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderkey, o.o_orderpriority, r.revenue_micros
FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey
"""


def q_full_outer_align(sf_dir: str):
    """Align two sparse per-(user, day) aggregates — click counts vs
    purchase counts — with FULL OUTER semantics: slots present on only
    one side survive with a NULL on the other.  Both sides shrink to
    #slots rows inside map_batches before the join."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def day_partials(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            et = batch.column("event_type")
            mask = pc.equal(et, which)
            uid = batch.column("user_id").filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
            ts = batch.column("ts").filter(mask)
            day = pc.strftime(ts, format="%Y-%m-%d").to_numpy(zero_copy_only=False)
            key = np.char.add(np.char.add(day.astype(str), "|"), uid.astype(str))
            keys, inv = np.unique(key, return_inverse=True)
            n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
            parts = [k.split("|") for k in keys.tolist()]
            return pa.table(
                {
                    "user_id": pa.array([int(p[1]) for p in parts], type=pa.int64()),
                    "day": pa.array([p[0] for p in parts], type=pa.string()),
                    "n": pa.array(n, type=pa.int64()),
                }
            )

        return fn

    def side(which: str, out: str):
        def rename(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(["user_id", "day", out])

        return (
            rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"])
            .map_batches(day_partials(which), batch_format="pyarrow")
            .groupby(["user_id", "day"])
            .aggregate(Sum(on="n", alias_name=out))
            .map_batches(rename, batch_format="pyarrow")
        )

    clicks = side("click", "n_clicks")
    buys = side("purchase", "n_purchases")
    joined = clicks.join(
        buys,
        join_type="full_outer",
        num_partitions=8,
        on=("user_id", "day"),
        left_suffix="",
        right_suffix="_r",
    )

    def coalesce(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in batch.column_names}
        uid = pc.coalesce(cols["user_id"], cols["user_id_r"]) if "user_id_r" in cols else cols["user_id"]
        day = pc.coalesce(cols["day"], cols["day_r"]) if "day_r" in cols else cols["day"]
        return pa.table(
            {
                "user_id": uid,
                "day": day,
                "n_clicks": cols["n_clicks"],
                "n_purchases": cols["n_purchases"],
            }
        )

    return joined.map_batches(coalesce, batch_format="pyarrow")


SQL_FULL_OUTER_ALIGN = """
WITH c AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
p AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT user_id, day, c.n_clicks, p.n_purchases
FROM c FULL OUTER JOIN p USING (user_id, day)
"""


def q_union_distinct(sf_dir: str):
    """Set-op shape: ids active in the event stream UNION customer ids
    holding orders, deduplicated — `Dataset.union` of two slim
    per-batch-distinct streams, then one distinct groupby."""
    import ray.data as rd

    def to_id(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            v = np.unique(batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64))
            return pa.table({"id": pa.array(v, type=pa.int64())})

        return fn

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]).map_batches(
        to_id("user_id"), batch_format="pyarrow"
    )
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]).map_batches(
        to_id("o_custkey"), batch_format="pyarrow"
    )

    def proj(batch: pa.Table) -> pa.Table:
        return batch.select(["id"])

    return ev.union(od).groupby("id").count().map_batches(proj, batch_format="pyarrow")


SQL_UNION_DISTINCT = """
SELECT DISTINCT id FROM (
  SELECT user_id AS id FROM events
  UNION ALL
  SELECT o_custkey AS id FROM orders)
"""


def q_orders_no_lineitem(sf_dir: str):
    """ANTI-join via the native join operator: orders with NO lineitem
    rows (the referential-integrity audit shape).  The probe side is
    reduced to per-batch-distinct keys before the exchange."""
    import ray.data as rd

    def keys(batch: pa.Table) -> pa.Table:
        v = np.unique(batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"l_orderkey": pa.array(v, type=pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]).map_batches(
        keys, batch_format="pyarrow"
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    return orders.join(
        li, join_type="left_anti", num_partitions=8, on=("o_orderkey",), right_on=("l_orderkey",)
    )


SQL_ORDERS_NO_LINEITEM = """
SELECT o_orderkey, o_orderpriority FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


def q_profile_orders(sf_dir: str):
    """Data-profiling report over orders: per column the null count,
    plus min/max of the numeric/temporal columns and distinct count of
    the categorical one — one vectorized partial pass, merged by a
    slim constant-key reduce (the output is one report row)."""
    import pyarrow.compute as pac
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]

    def partials(batch: pa.Table) -> pa.Table:
        out: dict[str, object] = {}
        for c in cols:
            out[f"nulls_{c}"] = pa.array(
                [batch.column(c).null_count], type=pa.int64()
            )
        price = batch.column("o_totalprice")
        cents = pac.cast(
            pac.floor(pac.multiply(price, pa.scalar(100.0))), pa.int64()
        )
        out["min_price_cents"] = pa.array([pac.min(cents).as_py()], type=pa.int64())
        out["max_price_cents"] = pa.array([pac.max(cents).as_py()], type=pa.int64())
        od = batch.column("o_orderdate").cast(pa.int64())
        out["min_date_us"] = pa.array([pac.min(od).as_py()], type=pa.int64())
        out["max_date_us"] = pa.array([pac.max(od).as_py()], type=pa.int64())
        out["n_rows"] = pa.array([batch.num_rows], type=pa.int64())
        out["one"] = pa.array([0], type=pa.int64())
        return pa.table(out)

    def statuses(batch: pa.Table) -> pa.Table:
        import numpy as np

        v = np.unique(np.asarray(batch.column("o_orderstatus").to_pylist(), dtype=object))
        return pa.table({"s": pa.array(v.tolist(), type=pa.string())})

    base = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)
    agg = base.map_batches(partials, batch_format="pyarrow").groupby("one").aggregate(
        *(
            [Sum(on=f"nulls_{c}", alias_name=f"nulls_{c}") for c in cols]
            + [
                Min(on="min_price_cents", alias_name="min_price_cents"),
                Max(on="max_price_cents", alias_name="max_price_cents"),
                Min(on="min_date_us", alias_name="min_date_us"),
                Max(on="max_date_us", alias_name="max_date_us"),
                Sum(on="n_rows", alias_name="n_rows"),
            ]
        )
    )
    n_status = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus"])
        .map_batches(statuses, batch_format="pyarrow")
        .groupby("s")
        .count()
        .count()
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.drop_columns(["one"])
        return t.append_column("n_status", pa.array([int(n_status)] * t.num_rows, type=pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PROFILE_ORDERS = """
SELECT
  COUNT(*) - COUNT(o_orderkey) AS nulls_o_orderkey,
  COUNT(*) - COUNT(o_custkey) AS nulls_o_custkey,
  COUNT(*) - COUNT(o_orderstatus) AS nulls_o_orderstatus,
  COUNT(*) - COUNT(o_totalprice) AS nulls_o_totalprice,
  COUNT(*) - COUNT(o_orderdate) AS nulls_o_orderdate,
  COUNT(*) - COUNT(o_orderpriority) AS nulls_o_orderpriority,
  CAST(MIN(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS min_price_cents,
  CAST(MAX(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS max_price_cents,
  CAST(MIN(epoch_us(o_orderdate)) AS BIGINT) AS min_date_us,
  CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS max_date_us,
  COUNT(*) AS n_rows,
  COUNT(DISTINCT o_orderstatus) AS n_status
FROM orders
"""


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT distinct (set-op family completion)
# ---------------------------------------------------------------------------
#
# union_distinct covers UNION; this adds the other two ANSI set ops in
# one pass: users who clicked INTERSECT users who purchased, and the
# click-only EXCEPT remainder.  Physically neither needs a set
# engine — per-batch pre-distinct (user, bit) pairs shuffle once and a
# native Max-per-bit groupby classifies every user; the op column is
# decided by two boolean ANDs.  Scale: the exchange is
# user-cardinality slim rows; the quadratic "compare the two sets"
# reading never materializes.

def q_intersect_except(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Max

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).filter(expr="event_type in ['click', 'purchase']")

    def bits(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        clicked = (et == "click").astype(np.int64)
        key = np.unique(uid * 2 + clicked)  # per-batch pre-distinct
        return pa.table(
            {
                "user_id": pa.array(key // 2, type=pa.int64()),
                "clicked": pa.array(key % 2, type=pa.int64()),
                "purchased": pa.array(1 - key % 2, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(bits, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max(on="clicked", alias_name="c"), Max(on="purchased", alias_name="p"))
    )

    def classify(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(bool)
        p = batch.column("p").to_numpy(zero_copy_only=False).astype(bool)
        keep = c  # both ops are anchored on the click set
        op = np.where(p, "intersect", "except")
        return pa.table(
            {
                "user_id": batch.column("user_id").filter(pa.array(keep)),
                "op": pa.array(op[keep].tolist(), type=pa.string()),
            }
        )

    return agg.map_batches(classify, batch_format="pyarrow")


SQL_INTERSECT_EXCEPT = """
SELECT user_id, 'intersect' AS op FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'except' AS op FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase')
"""


# ---------------------------------------------------------------------------
# argmin join: each order's cheapest lineitem (correlated MIN join-back)
# ---------------------------------------------------------------------------
#
# The TPC-H Q2 shape (row WITH the group minimum, not just the
# minimum): for every order, the full lineitem row holding the lowest
# extended price, ties broken by line number.  Physically the classic
# two-level argmin: each batch keeps at most ONE candidate row per
# orderkey it sees (vectorized lexsort + first-of-group mask), then one
# orderkey-keyed shuffle and the same vectorized pick per group — no
# join back, no window over the full stream; the exchange after the
# first pass is <= one row per (orderkey, batch).

def q_argmin_join(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    def local_argmin(batch: pa.Table) -> pa.Table:
        key = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = (
            pc.cast(pc.floor(pc.multiply(batch.column("l_extendedprice"), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ln, cents, key))
        first = np.ones(len(order), dtype=bool)
        first[1:] = key[order][1:] != key[order][:-1]
        sel = order[first]
        return pa.table(
            {
                "l_orderkey": pa.array(key[sel], type=pa.int64()),
                "l_linenumber": pa.array(ln[sel], type=pa.int64()),
                "cents": pa.array(cents[sel], type=pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    partial = ds.map_batches(local_argmin, batch_format="pyarrow")

    def final_argmin(group: pa.Table) -> pa.Table:
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        ln = group.column("l_linenumber").to_numpy(zero_copy_only=False)
        i = np.lexsort((ln, cents))[0]
        return group.take(pa.array([i], type=pa.int64()))

    return partial.groupby("l_orderkey").map_groups(final_argmin, batch_format="pyarrow")


SQL_ARGMIN_JOIN = """
SELECT l_orderkey, l_linenumber, cents FROM (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY floor(l_extendedprice * 100.0), l_linenumber) AS rn
  FROM lineitem)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# promo revenue share (TPC-H Q14 shape): broadcast dim + monthly rollup
# ---------------------------------------------------------------------------
#
# Per calendar month of l_shipdate: the share of discounted revenue
# earned by PROMO parts.  The part table is a DIMENSION — its
# (p_partkey -> is_promo) bit broadcasts once via ray.put and each fact
# batch resolves membership with one searchsorted; revenue stays in the
# exact integer micro-units of pricing_summary (px_c * (100 - disc_c)),
# months are integer (year*12 + month) so no calendar convention can
# diverge, and the final share is ONE float division per month row.

def q_promo_share(sf_dir: str):
    import pyarrow.parquet as _pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = _pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    import pyarrow.compute as pc

    promo = pc.starts_with(part.column("p_type"), "PROMO").to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    ref = ray.put((pk[order], promo[order].astype(np.int64)))

    def partials(batch: pa.Table) -> pa.Table:
        keys, isp = ray.get(ref)
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        micros = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        us = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        month = (
            us.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        )  # months since 1970-01
        lp = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        is_promo = isp[np.searchsorted(keys, lp)]
        keys_m, inv = np.unique(month, return_inverse=True)
        tot = np.zeros(len(keys_m), dtype=np.int64)
        pr = np.zeros(len(keys_m), dtype=np.int64)
        np.add.at(tot, inv, micros)
        np.add.at(pr, inv, micros * is_promo)
        return pa.table(
            {
                "month": pa.array(keys_m, type=pa.int64()),
                "promo_micros": pa.array(pr, type=pa.int64()),
                "total_micros": pa.array(tot, type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum(on="promo_micros", alias_name="promo_micros"),
            Sum(on="total_micros", alias_name="total_micros"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        p = batch.column("promo_micros").to_numpy(zero_copy_only=False)
        t = batch.column("total_micros").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "month": batch.column("month"),
                "promo_micros": batch.column("promo_micros"),
                "total_micros": batch.column("total_micros"),
                "promo_share": pa.array(
                    p.astype(np.float64) / t.astype(np.float64), type=pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PROMO_SHARE = """
WITH v AS (
  SELECT (year(l_shipdate) - 1970) * 12 + month(l_shipdate) - 1 AS month,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0) AS BIGINT)) AS micros,
         CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem JOIN part p ON p.p_partkey = l_partkey)
SELECT CAST(month AS BIGINT) AS month,
       CAST(SUM(micros * is_promo) AS BIGINT) AS promo_micros,
       CAST(SUM(micros) AS BIGINT) AS total_micros,
       CAST(SUM(micros * is_promo) AS DOUBLE) / CAST(SUM(micros) AS DOUBLE) AS promo_share
FROM v GROUP BY month
"""


# ---------------------------------------------------------------------------
# order priority check (TPC-H Q4 shape): EXISTS over a fact-fact join
# ---------------------------------------------------------------------------
#
# Orders counted per priority when at least one of their lineitems
# shipped late (l_shipdate > o_orderdate + 60 days) — the EXISTS /
# semi-join report.  Both sides are FACTS, so the plan is one
# distributed orderkey join of two pruned column sets, an integer-
# microsecond lateness filter, a per-batch pre-distinct of surviving
# (orderkey, priority) pairs, and a slim two-level count — the
# priority-cardinality result never sees the lineitem stream again.

_Q4_LATE_US = 60 * 24 * 3_600_000_000


def q_order_priority_check(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    items = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    joined = items.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def late_pairs(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ship > od + _Q4_LATE_US
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
        pr = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)[keep]
        # per-batch pre-distinct: one surviving row per (order, priority)
        _, ix = np.unique(ok, return_index=True)
        return pa.table(
            {
                "o_orderkey": pa.array(ok[ix], type=pa.int64()),
                "o_orderpriority": pa.array(pr[ix].tolist(), type=pa.string()),
            }
        )

    distinct = (
        joined.map_batches(late_pairs, batch_format="pyarrow")
        .groupby(["o_orderkey", "o_orderpriority"])
        .aggregate(Count(alias_name="_n"))
    )
    return (
        distinct.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"))
    )


SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 60 * 24 * 3600000000)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# revenue concentration: the top-decile customers' share of total spend
# ---------------------------------------------------------------------------
#
# The inequality/concentration KPI (the "whales" report): customers
# ranked by exact order-total cents; the top ceil(n/10) customers'
# share of all revenue.  One (custkey) Sum shuffle builds the
# customer-dimension spend table, WHICH STAYS DISTRIBUTED; the decile
# cut is found by a two-level rank walk over value-domain-bounded
# folds — first a (whole-dollar band -> count, sum) fold (domain
# bounded by the max customer spend, never by customer count), then an
# exact-cent fold over the single boundary band (<= 100 distinct cent
# values by construction).  Because every customer tied at the exact
# boundary cent contributes the SAME spend, the top-decile SUM never
# needs the custkey tie-break — it is sum(above) + remaining * boundary
# — so nothing customer-sized ever reaches the driver.  Output is one
# row with the exact integer numerator/denominator and ONE float
# division.

def q_revenue_concentration(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"o_custkey": batch.column("o_custkey"), "c": pa.array(c, type=pa.int64())}
        )

    spend = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum(on="c", alias_name="c"))
        .materialize()  # consumed by the band fold + the boundary-band fold
    )

    def band_partials(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        d = c // 100
        keys, inv = np.unique(d, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        s = np.zeros(len(keys), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table(
            {
                "dollar": pa.array(keys, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "s": pa.array(s, type=pa.int64()),
            }
        )

    bands = (
        spend.map_batches(band_partials, batch_format="pyarrow")
        .groupby("dollar")
        .aggregate(Sum(on="n", alias_name="n"), Sum(on="s", alias_name="s"))
        .take_all()  # #distinct whole-dollar spend values — domain-bounded
    )
    bands.sort(key=lambda r: -r["dollar"])
    n = sum(int(r["n"]) for r in bands)
    total = sum(int(r["s"]) for r in bands)
    top_n = -(-n // 10)  # ceil(n/10), exact integer
    cum = 0
    cut_dollar = sum_above = cnt_above = 0
    for r in bands:
        if cum + int(r["n"]) >= top_n:
            cut_dollar, sum_above, cnt_above = int(r["dollar"]), 0, cum
            break
        cum += int(r["n"])
    sum_above = sum(int(r["s"]) for r in bands if int(r["dollar"]) > cut_dollar)

    # exact-cent fold over the boundary band only (<= 100 distinct cents)
    def band_filter(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        keep = (c // 100) == cut_dollar
        ck, inv = np.unique(c[keep], return_inverse=True)
        bn = np.bincount(inv, minlength=len(ck)).astype(np.int64)
        return pa.table(
            {"c": pa.array(ck, type=pa.int64()), "n": pa.array(bn, type=pa.int64())}
        )

    in_band = (
        spend.map_batches(band_filter, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()  # <= 100 rows
    )
    in_band.sort(key=lambda r: -r["c"])
    need = top_n - cnt_above
    top = sum_above
    for r in in_band:
        take = min(need, int(r["n"]))
        top += take * int(r["c"])
        need -= take
        if need == 0:
            break
    return pa.table(
        {
            "n_customers": pa.array([n], type=pa.int64()),
            "top_n": pa.array([top_n], type=pa.int64()),
            "top_cents": pa.array([top], type=pa.int64()),
            "total_cents": pa.array([total], type=pa.int64()),
            "share": pa.array([float(top) / float(total)], type=pa.float64()),
        }
    )


SQL_REVENUE_CONCENTRATION = """
WITH s AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS c
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, o_custkey ASC) AS rk,
         COUNT(*) OVER () AS n
  FROM s)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(CAST(ceil(MAX(n) / 10.0) AS BIGINT) AS BIGINT) AS top_n,
       CAST(SUM(CASE WHEN rk <= ceil(n / 10.0) THEN c ELSE 0 END) AS BIGINT) AS top_cents,
       CAST(SUM(c) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rk <= ceil(n / 10.0) THEN c ELSE 0 END) AS DOUBLE)
         / CAST(SUM(c) AS DOUBLE) AS share
FROM r
"""


# ---------------------------------------------------------------------------
# discount effect: per-discount-level revenue/quantity profile (Q6 family)
# ---------------------------------------------------------------------------
#
# The pricing-analysis rollup behind TPC-H Q6's predicate: for every
# discount level (exact cents, the bounded 0..100 domain), order-line
# count, exact quantity cents, exact discounted-revenue micros, and the
# one-division average quantity.  One scan, one grid-bounded Sum
# shuffle.

def q_discount_effect(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def partials(batch: pa.Table) -> pa.Table:
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        px = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keys, inv = np.unique(dc, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        sq = np.zeros(len(keys), dtype=np.int64)
        sr = np.zeros(len(keys), dtype=np.int64)
        np.add.at(sq, inv, qty)
        np.add.at(sr, inv, px * (100 - dc))
        return pa.table(
            {
                "disc_c": pa.array(keys, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "qty_cents": pa.array(sq, type=pa.int64()),
                "rev_micros": pa.array(sr, type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("disc_c")
        .aggregate(
            Sum(on="n", alias_name="n"),
            Sum(on="qty_cents", alias_name="qty_cents"),
            Sum(on="rev_micros", alias_name="rev_micros"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        q = batch.column("qty_cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "disc_c": batch.column("disc_c"),
                "n": batch.column("n"),
                "qty_cents": batch.column("qty_cents"),
                "rev_micros": batch.column("rev_micros"),
                "avg_qty_cents": pa.array(
                    q.astype(np.float64) / n.astype(np.float64), type=pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_DISCOUNT_EFFECT = """
WITH v AS (
  SELECT CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_c,
         CAST(floor(l_quantity * 100.0) AS BIGINT) AS qty_c,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS px_c
  FROM lineitem)
SELECT disc_c,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(qty_c) AS BIGINT) AS qty_cents,
       CAST(SUM(px_c * (100 - disc_c)) AS BIGINT) AS rev_micros,
       CAST(SUM(qty_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty_cents
FROM v GROUP BY disc_c
"""


# ---------------------------------------------------------------------------
# volume shipping (TPC-H Q7 shape): cross-nation trade flows by year
# ---------------------------------------------------------------------------
#
# Revenue shipped between every (supplier nation -> customer nation)
# pair per calendar year, same-nation flows excluded.  The supplier
# chain is a broadcast dimension (searchsorted resolve inside the fact
# scan, as in revenue_by_nation); the customer side is scale-honest: at
# 10^12 orders the customer table is itself a fact, so it is resolved
# with a distributed ``Dataset.join``, never a driver broadcast.  The
# lineitem stream pre-aggregates to one slim row per
# (orderkey, supp_nation, year) seen per batch BEFORE any exchange, so
# the two joins move aggregate rows only.  Revenue stays in the exact
# integer micro-units of pricing_summary.

def q_volume_shipping(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    so = np.argsort(sk, kind="stable")
    no = np.argsort(nk, kind="stable")
    sk, snk = sk[so], snk[so]
    nk, nname = nk[no], nname[no]
    n_nat = len(nk)
    ref = ray.put((sk, snk, nk, nname))

    def li_partials(batch: pa.Table) -> pa.Table:
        skk, snkk, nkk, nn = ray.get(ref)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        ni = np.searchsorted(nkk, snkk[np.searchsorted(skk, supp)])
        us = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        yr = us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        # packed-domain invariants (ADVICE discipline): assert before packing
        assert yr.size == 0 or (yr.min() >= 1970 and yr.max() < 2034)
        assert len(nkk) <= 64
        key = (ok * 64 + ni) * 64 + (yr - 1970)
        keys, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "l_orderkey": pa.array(keys >> 12, type=pa.int64()),
                "supp_ni": pa.array((keys >> 6) & 63, type=pa.int64()),
                "yr": pa.array((keys & 63) + 1970, type=pa.int64()),
                "rev": pa.array(acc, type=pa.int64()),
            }
        )

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(li_partials, batch_format="pyarrow")
        .groupby(["l_orderkey", "supp_ni", "yr"])
        .aggregate(Sum(on="rev", alias_name="rev"))
    )

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def cust_nation(batch: pa.Table) -> pa.Table:
        _, _, nkk, _ = ray.get(ref)
        cnk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "cust_ni": pa.array(np.searchsorted(nkk, cnk), type=pa.int64()),
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_nation, batch_format="pyarrow")

    j1 = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    j2 = j1.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def cross_only(batch: pa.Table) -> pa.Table:
        si = batch.column("supp_ni").to_numpy(zero_copy_only=False)
        ci = batch.column("cust_ni").to_numpy(zero_copy_only=False)
        keep = si != ci
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "supp_ni": t.column("supp_ni"),
                "cust_ni": t.column("cust_ni"),
                "yr": t.column("yr"),
                "rev": t.column("rev"),
            }
        )

    agg = (
        j2.map_batches(cross_only, batch_format="pyarrow")
        .groupby(["supp_ni", "cust_ni", "yr"])
        .aggregate(Sum(on="rev", alias_name="revenue_micros"))
    )

    def names(batch: pa.Table) -> pa.Table:
        _, _, _, nn = ray.get(ref)
        si = batch.column("supp_ni").to_numpy(zero_copy_only=False)
        ci = batch.column("cust_ni").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "supp_nation": pa.array(nn[si].tolist(), type=pa.string()),
                "cust_nation": pa.array(nn[ci].tolist(), type=pa.string()),
                "yr": batch.column("yr"),
                "revenue_micros": batch.column("revenue_micros"),
            }
        )

    return agg.map_batches(names, batch_format="pyarrow")


SQL_VOLUME_SHIPPING = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS yr,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100.0) AS BIGINT))) AS BIGINT)
         AS revenue_micros
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# returned-item report (TPC-H Q10 shape): top customers by returned revenue
# ---------------------------------------------------------------------------
#
# The 20 customers who returned the most discounted revenue
# (l_returnflag = 'R'), with name and nation.  lineitem pre-aggregates
# per orderkey inside the scan; ONE fact-fact join resolves orderkey ->
# custkey; a custkey Sum shuffle builds the (distributed) customer
# spend; the customer name/nation attach is a second slim join; the
# final top-20 is a distributed sort + limit with the custkey
# tie-break, so the result is deterministic even under revenue ties.

Q10_K = 20


def q_returned_revenue(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    no = np.argsort(nk, kind="stable")
    ref = ray.put((nk[no], nname[no]))

    def li_partials(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = rf == "R"
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        keys, inv = np.unique(ok, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "l_orderkey": pa.array(keys, type=pa.int64()),
                "rev": pa.array(acc, type=pa.int64()),
            }
        )

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partials, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum(on="rev", alias_name="rev"))
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    per_cust = (
        li.join(
            orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
        )
        .select_columns(["o_custkey", "rev"])
        .groupby("o_custkey")
        .aggregate(Sum(on="rev", alias_name="revenue_micros"))
    )

    def cust_slim(batch: pa.Table) -> pa.Table:
        nkk, nn = ray.get(ref)
        cnk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_name": batch.column("c_name"),
                "n_name": pa.array(nn[np.searchsorted(nkk, cnk)].tolist(), type=pa.string()),
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    ).map_batches(cust_slim, batch_format="pyarrow")
    named = per_cust.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    ).select_columns(["o_custkey", "c_name", "n_name", "revenue_micros"])
    return named.sort(["revenue_micros", "o_custkey"], descending=[True, False]).limit(Q10_K)


SQL_RETURNED_REVENUE = f"""
WITH r AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
                  * (100 - CAST(floor(l.l_discount * 100.0) AS BIGINT))) AS BIGINT)
           AS revenue_micros
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey)
SELECT r.o_custkey, c.c_name, n.n_name, r.revenue_micros
FROM r JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_micros DESC, r.o_custkey ASC
LIMIT {Q10_K}
"""


# ---------------------------------------------------------------------------
# customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------
#
# How many customers placed exactly k orders, INCLUDING k = 0 — the
# LEFT OUTER distribution report.  Orders pre-count per custkey inside
# the scan; the customer table LEFT-joins that slim count set (nulls ->
# 0); the final histogram is a count-cardinality groupby.  Both big
# tables move once, already reduced.

def q_customer_order_dist(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def o_partials(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keys, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "o_custkey": pa.array(keys, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(o_partials, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum(on="n", alias_name="n"))
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = cust.join(
        counts, join_type="left_outer", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",)
    )

    def fill(batch: pa.Table) -> pa.Table:
        n = pc.coalesce(batch.column("n"), pa.scalar(0, type=pa.int64()))
        return pa.table({"n_orders": n})

    return (
        joined.map_batches(fill, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Count(alias_name="n_customers"))
    )


SQL_CUSTOMER_ORDER_DIST = """
WITH k AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM k GROUP BY n_orders
"""


# ---------------------------------------------------------------------------
# large-volume customers (TPC-H Q18 shape): HAVING over a fact rollup
# ---------------------------------------------------------------------------
#
# Orders whose total quantity exceeds 250 units, with the order header
# attached — the HAVING-filtered join-back.  The quantity rollup
# shrinks to per-orderkey partials inside the scan, the threshold
# filter drops all but the whale orders BEFORE the join, and the
# orders attach moves only the survivors.

Q18_MIN_QTY_C = 250 * 100  # 250 units in exact quantity cents


def q_volume_customers(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def li_partials(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keys, inv = np.unique(ok, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, qty)
        return pa.table(
            {
                "l_orderkey": pa.array(keys, type=pa.int64()),
                "qty_cents": pa.array(acc, type=pa.int64()),
            }
        )

    whales = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
        .map_batches(li_partials, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum(on="qty_cents", alias_name="qty_cents"))
        .filter(expr=f"qty_cents > {Q18_MIN_QTY_C}")
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    joined = whales.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def finish(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        od = batch.column("o_orderdate").cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": batch.column("l_orderkey"),
                "o_custkey": batch.column("o_custkey"),
                "total_cents": pa.array(cents, type=pa.int64()),
                "orderdate_us": od,
                "qty_cents": batch.column("qty_cents"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_VOLUME_CUSTOMERS = f"""
WITH q AS (
  SELECT l_orderkey, CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) > {Q18_MIN_QTY_C})
SELECT o.o_orderkey, o.o_custkey,
       CAST(floor(o.o_totalprice * 100.0) AS BIGINT) AS total_cents,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
       q.qty_cents
FROM q JOIN orders o ON q.l_orderkey = o.o_orderkey
"""


# ---------------------------------------------------------------------------
# top supplier per quarter (TPC-H Q15 shape): grouped argmax WITH ties
# ---------------------------------------------------------------------------
#
# For every calendar quarter, the supplier(s) with the maximum
# discounted revenue — the view-over-aggregate + "= MAX" shape, which
# unlike a top-k keeps ALL tied winners.  One (suppkey, quarter) Sum
# shuffle shrinks the stream to supplier x quarter rows; the per-quarter
# argmax runs in map_groups over that slim mart (quarter cardinality is
# calendar-bounded); names resolve from the broadcast supplier
# dimension.

def q_top_supplier_quarter(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sname = np.asarray(sup.column("s_name").to_pylist(), dtype=object)
    so = np.argsort(sk, kind="stable")
    ref = ray.put((sk[so], sname[so]))

    def partials(batch: pa.Table) -> pa.Table:
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        us = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        months = us.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)
        quarter = months // 3  # quarters since 1970-Q1, pure integer
        # packed-domain invariant: quarters are calendar-bounded
        assert quarter.size == 0 or (quarter.min() >= 0 and quarter.max() < 2**20)
        key = supp * (2**20) + quarter
        keys, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table(
            {
                "l_suppkey": pa.array(keys >> 20, type=pa.int64()),
                "quarter": pa.array(keys & (2**20 - 1), type=pa.int64()),
                "rev": pa.array(acc, type=pa.int64()),
            }
        )

    mart = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["l_suppkey", "quarter"])
        .aggregate(Sum(on="rev", alias_name="rev"))
    )

    def argmax_ties(group: pa.Table) -> pa.Table:
        rev = group.column("rev").to_numpy(zero_copy_only=False)
        keep = rev == rev.max()
        return group.filter(pa.array(keep))

    winners = mart.groupby("quarter").map_groups(argmax_ties, batch_format="pyarrow")

    def names(batch: pa.Table) -> pa.Table:
        skk, sn = ray.get(ref)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "quarter": batch.column("quarter"),
                "s_suppkey": batch.column("l_suppkey"),
                "s_name": pa.array(sn[np.searchsorted(skk, supp)].tolist(), type=pa.string()),
                "revenue_micros": batch.column("rev"),
            }
        )

    return winners.map_batches(names, batch_format="pyarrow")


SQL_TOP_SUPPLIER_QUARTER = """
WITH m AS (
  SELECT l_suppkey,
         ((year(l_shipdate) - 1970) * 12 + month(l_shipdate) - 1) // 3 AS quarter,
         CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100.0) AS BIGINT))) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1, 2)
SELECT CAST(m.quarter AS BIGINT) AS quarter, m.l_suppkey AS s_suppkey, s.s_name,
       m.rev AS revenue_micros
FROM m JOIN supplier s ON m.l_suppkey = s.s_suppkey
WHERE m.rev = (SELECT MAX(rev) FROM m m2 WHERE m2.quarter = m.quarter)
"""


# ---------------------------------------------------------------------------
# supplier breadth (TPC-H Q16 shape): COUNT DISTINCT suppliers per part class
# ---------------------------------------------------------------------------
#
# How many distinct suppliers actually shipped parts of each
# (p_brand, p_type) class.  Two-level exact distinct with NO integer
# packing (suppkey x partkey products overflow at scale): per-batch
# lexsort first-occurrence masks pre-distinct (partkey, suppkey) pairs,
# one pair groupby makes them globally distinct, the broadcast part
# dimension rewrites partkey -> (brand, type), and a second
# pre-distinct + groupby counts suppliers per class.

def q_supplier_breadth(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    ptype = np.asarray(part.column("p_type").to_pylist(), dtype=object)
    po = np.argsort(pk, kind="stable")
    ref = ray.put((pk[po], brand[po], ptype[po]))

    def pair_distinct(batch: pa.Table) -> pa.Table:
        part_k = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((supp, part_k))
        p, s = part_k[order], supp[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (p[1:] != p[:-1]) | (s[1:] != s[:-1])
        return pa.table(
            {
                "l_partkey": pa.array(p[first], type=pa.int64()),
                "l_suppkey": pa.array(s[first], type=pa.int64()),
            }
        )

    pairs = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
        .map_batches(pair_distinct, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )

    def classify(batch: pa.Table) -> pa.Table:
        pkk, br, ty = ray.get(ref)
        part_k = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.searchsorted(pkk, part_k)
        b, t = br[i], ty[i]
        # per-batch pre-distinct of (brand, type, suppkey)
        key = np.char.add(np.char.add(b.astype(str), "|"), t.astype(str))
        order = np.lexsort((supp, key))
        k, s = key[order], supp[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (k[1:] != k[:-1]) | (s[1:] != s[:-1])
        parts = [x.split("|") for x in k[first].tolist()]
        return pa.table(
            {
                "p_brand": pa.array([x[0] for x in parts], type=pa.string()),
                "p_type": pa.array([x[1] for x in parts], type=pa.string()),
                "l_suppkey": pa.array(s[first], type=pa.int64()),
            }
        )

    return (
        pairs.map_batches(classify, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "l_suppkey"])
        .aggregate(Count(alias_name="_m"))
        .groupby(["p_brand", "p_type"])
        .aggregate(Count(alias_name="supplier_cnt"))
    )


SQL_SUPPLIER_BREADTH = """
SELECT p.p_brand, p.p_type, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# small-quantity revenue (TPC-H Q17 shape): avg-comparison subquery, exact
# ---------------------------------------------------------------------------
#
# Total revenue from brand-restricted lines whose quantity is below
# 20% of that part's average quantity.  The per-part average never
# becomes a float: the filter is the cross-multiplied exact integer
# comparison 5 * n_part * qty_c < sum_qty_c.  The brand restriction
# resolves from the broadcast part dimension (brand-bounded subset);
# the per-part stats mart stays DISTRIBUTED and meets the line stream
# again in one partkey `Dataset.join` — nothing part-cardinality ever
# reaches the driver.

Q17_BRAND = "Brand#5"


def q_small_qty_revenue(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    keys = np.sort(
        part.filter(pa.compute.equal(part.column("p_brand"), Q17_BRAND))
        .column("p_partkey")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    ref = ray.put(keys)

    def brand_lines(batch: pa.Table) -> pa.Table:
        bk = ray.get(ref)
        part_k = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(bk, part_k)
        pos_c = np.minimum(pos, len(bk) - 1) if len(bk) else pos
        keep = (bk[pos_c] == part_k) if len(bk) else np.zeros(len(part_k), dtype=bool)
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        px_c = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": pa.array(part_k[keep], type=pa.int64()),
                "qty_c": pa.array(qty_c[keep], type=pa.int64()),
                "px_c": pa.array(px_c[keep], type=pa.int64()),
            }
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(brand_lines, batch_format="pyarrow")

    def stat_partials(batch: pa.Table) -> pa.Table:
        part_k = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty_c = batch.column("qty_c").to_numpy(zero_copy_only=False)
        keys_p, inv = np.unique(part_k, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys_p)).astype(np.int64)
        s = np.zeros(len(keys_p), dtype=np.int64)
        np.add.at(s, inv, qty_c)
        return pa.table(
            {
                "p_key": pa.array(keys_p, type=pa.int64()),
                "n_part": pa.array(n, type=pa.int64()),
                "sum_qty": pa.array(s, type=pa.int64()),
            }
        )

    stats = (
        lines.map_batches(stat_partials, batch_format="pyarrow")
        .groupby("p_key")
        .aggregate(Sum(on="n_part", alias_name="n_part"), Sum(on="sum_qty", alias_name="sum_qty"))
        .repartition(4)  # scrub groupby's schemaless empties pre-join (brand-bounded slim side)
    )
    joined = lines.join(
        stats, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_key",)
    )

    def small_partials(batch: pa.Table) -> pa.Table:
        qty_c = batch.column("qty_c").to_numpy(zero_copy_only=False)
        px_c = batch.column("px_c").to_numpy(zero_copy_only=False)
        n = batch.column("n_part").to_numpy(zero_copy_only=False)
        s = batch.column("sum_qty").to_numpy(zero_copy_only=False)
        keep = 5 * n * qty_c < s  # qty < 0.2 * avg, exact cross-multiplied
        return pa.table(
            {
                "one": pa.array([0], type=pa.int64()),
                "total_cents": pa.array([int(px_c[keep].sum())], type=pa.int64()),
                "n_lines": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    agg = (
        joined.map_batches(small_partials, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum(on="total_cents", alias_name="total_cents"), Sum(on="n_lines", alias_name="n_lines"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.column("total_cents").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "total_cents": batch.column("total_cents"),
                "n_lines": batch.column("n_lines"),
                "avg_yearly_cents": pa.array(t / 7.0, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SMALL_QTY_REVENUE = f"""
WITH b AS (
  SELECT l.l_partkey, CAST(floor(l.l_quantity * 100.0) AS BIGINT) AS qty_c,
         CAST(floor(l.l_extendedprice * 100.0) AS BIGINT) AS px_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{Q17_BRAND}'),
s AS (
  SELECT l_partkey, COUNT(*) AS n_part, SUM(qty_c) AS sum_qty
  FROM b GROUP BY l_partkey)
SELECT CAST(SUM(b.px_c) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(b.px_c) AS DOUBLE) / 7.0 AS avg_yearly_cents
FROM b JOIN s ON b.l_partkey = s.l_partkey
WHERE 5 * s.n_part * b.qty_c < s.sum_qty
"""


# ---------------------------------------------------------------------------
# disjunctive-predicate revenue (TPC-H Q19 shape): OR-of-ANDs pushdown
# ---------------------------------------------------------------------------
#
# Revenue matching any of three (brand, quantity-range, size-range)
# conjunctions — the classic OR-of-ANDs predicate that defeats naive
# partition pruning.  The part dimension broadcasts (partkey -> brand
# code, size) once; each fact batch evaluates the whole disjunction
# vectorized; output is one exact row.

Q19_ARMS = (
    ("Brand#1", 100, 1100, 1, 5),     # qty cents in [100, 1100], size 1..5
    ("Brand#2", 1000, 2000, 1, 10),
    ("Brand#3", 2000, 3000, 1, 15),
)


def q_or_filter_revenue(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    size = part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    code = np.zeros(len(pk), dtype=np.int64)
    for i, arm in enumerate(Q19_ARMS):
        code[brand == arm[0]] = i + 1
    po = np.argsort(pk, kind="stable")
    ref = ray.put((pk[po], code[po], size[po]))

    def partials(batch: pa.Table) -> pa.Table:
        pkk, cd, sz = ray.get(ref)
        part_k = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.searchsorted(pkk, part_k)
        c, s = cd[i], sz[i]
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        px_c = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_c = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keep = np.zeros(len(part_k), dtype=bool)
        for j, (_, qlo, qhi, slo, shi) in enumerate(Q19_ARMS):
            keep |= (c == j + 1) & (qty_c >= qlo) & (qty_c <= qhi) & (s >= slo) & (s <= shi)
        rev = px_c[keep] * (100 - disc_c[keep])
        return pa.table(
            {
                "one": pa.array([0], type=pa.int64()),
                "revenue_micros": pa.array([int(rev.sum())], type=pa.int64()),
                "n_lines": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum(on="revenue_micros", alias_name="revenue_micros"), Sum(on="n_lines", alias_name="n_lines"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["one"])

    return agg.map_batches(finish, batch_format="pyarrow")


def _sql_or_filter_revenue() -> str:
    arms = []
    for b, qlo, qhi, slo, shi in Q19_ARMS:
        arms.append(
            f"(p.p_brand = '{b}' AND CAST(floor(l.l_quantity * 100.0) AS BIGINT) BETWEEN {qlo} AND {qhi}"
            f" AND p.p_size BETWEEN {slo} AND {shi})"
        )
    pred = "\n   OR ".join(arms)
    return f"""
SELECT CAST(SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100.0) AS BIGINT))) AS BIGINT)
         AS revenue_micros,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {pred}
"""


SQL_OR_FILTER_REVENUE = _sql_or_filter_revenue()


# ---------------------------------------------------------------------------
# market share (TPC-H Q8 shape): one nation's share of yearly revenue
# ---------------------------------------------------------------------------
#
# Per order year, the fraction of total discounted revenue supplied by
# NATION_3 — the numerator/denominator-in-one-pass shape.  Supplier ->
# nation resolves from the broadcast dimension inside the lineitem
# scan, which pre-aggregates (orderkey, rev, target_rev) partials; ONE
# fact-fact orderkey join attaches the order year; the final rollup is
# year-cardinality with exact integer num/den and one division per row.

Q8_NATION = "NATION_3"


def q_market_share(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    target_nk = nat.filter(pa.compute.equal(nat.column("n_name"), Q8_NATION)).column(
        "n_nationkey"
    ).to_numpy(zero_copy_only=False)
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk, kind="stable")
    is_target = np.isin(snk[so], target_nk.astype(np.int64)).astype(np.int64)
    ref = ray.put((sk[so], is_target))

    def li_partials(batch: pa.Table) -> pa.Table:
        skk, tgt = ray.get(ref)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(px * 100.0).astype(np.int64) * (
            100 - np.floor(disc * 100.0).astype(np.int64)
        )
        t = tgt[np.searchsorted(skk, supp)]
        keys, inv = np.unique(ok, return_inverse=True)
        tot = np.zeros(len(keys), dtype=np.int64)
        tr = np.zeros(len(keys), dtype=np.int64)
        np.add.at(tot, inv, rev)
        np.add.at(tr, inv, rev * t)
        return pa.table(
            {
                "l_orderkey": pa.array(keys, type=pa.int64()),
                "rev": pa.array(tot, type=pa.int64()),
                "target_rev": pa.array(tr, type=pa.int64()),
            }
        )

    li = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partials, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum(on="rev", alias_name="rev"), Sum(on="target_rev", alias_name="target_rev"))
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    joined = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def year_partials(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        yr = us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        keys, inv = np.unique(yr, return_inverse=True)
        tot = np.zeros(len(keys), dtype=np.int64)
        tr = np.zeros(len(keys), dtype=np.int64)
        np.add.at(tot, inv, batch.column("rev").to_numpy(zero_copy_only=False))
        np.add.at(tr, inv, batch.column("target_rev").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "yr": pa.array(keys, type=pa.int64()),
                "total_micros": pa.array(tot, type=pa.int64()),
                "target_micros": pa.array(tr, type=pa.int64()),
            }
        )

    agg = (
        joined.map_batches(year_partials, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(
            Sum(on="total_micros", alias_name="total_micros"),
            Sum(on="target_micros", alias_name="target_micros"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.column("total_micros").to_numpy(zero_copy_only=False).astype(np.float64)
        g = batch.column("target_micros").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "yr": batch.column("yr"),
                "target_micros": batch.column("target_micros"),
                "total_micros": batch.column("total_micros"),
                "share": pa.array(g / t, type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_MARKET_SHARE = f"""
WITH v AS (
  SELECT o.o_orderdate,
         CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
           * (100 - CAST(floor(l.l_discount * 100.0) AS BIGINT)) AS micros,
         CASE WHEN n.n_name = '{Q8_NATION}' THEN 1 ELSE 0 END AS tgt
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(SUM(micros * tgt) AS BIGINT) AS target_micros,
       CAST(SUM(micros) AS BIGINT) AS total_micros,
       CAST(SUM(micros * tgt) AS DOUBLE) / CAST(SUM(micros) AS DOUBLE) AS share
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# nation profit (TPC-H Q9 shape): revenue minus retail cost per nation-year
# ---------------------------------------------------------------------------
#
# Profit per (supplier nation, ship year): discounted revenue minus
# p_retailprice x quantity (the retail-cost stand-in for the absent
# partsupp table).  Both units are exact 10^-4-dollar integers
# (px_c·(100−disc_c) and retail_c·qty_c), so profit is an exact —
# possibly negative — int64.  Two broadcast dimensions (part cost,
# supplier nation), one fact scan, one (nation, year) Sum shuffle.

def q_nation_profit(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    retail_c = np.floor(
        part.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0
    ).astype(np.int64)
    po = np.argsort(pk, kind="stable")
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    so, no = np.argsort(sk, kind="stable"), np.argsort(nk, kind="stable")
    ref = ray.put((pk[po], retail_c[po], sk[so], snk[so], nk[no], nname[no]))

    def partials(batch: pa.Table) -> pa.Table:
        pkk, rc, skk, snkk, nkk, nn = ray.get(ref)
        part_k = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        px_c = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_c = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        profit = px_c * (100 - disc_c) - rc[np.searchsorted(pkk, part_k)] * qty_c
        ni = np.searchsorted(nkk, snkk[np.searchsorted(skk, supp)])
        us = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        yr = us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        assert yr.size == 0 or (yr.min() >= 1970 and yr.max() < 2034)
        assert len(nkk) <= 64
        key = ni * 64 + (yr - 1970)
        keys, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, profit)
        return pa.table(
            {
                "ni": pa.array(keys >> 6, type=pa.int64()),
                "yr": pa.array((keys & 63) + 1970, type=pa.int64()),
                "profit": pa.array(acc, type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate",
            ],
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["ni", "yr"])
        .aggregate(Sum(on="profit", alias_name="profit_micros"))
    )

    def names(batch: pa.Table) -> pa.Table:
        _, _, _, _, _, nn = ray.get(ref)
        ni = batch.column("ni").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(nn[ni].tolist(), type=pa.string()),
                "yr": batch.column("yr"),
                "profit_micros": batch.column("profit_micros"),
            }
        )

    return agg.map_batches(names, batch_format="pyarrow")


SQL_NATION_PROFIT = """
SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS yr,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100.0) AS BIGINT))
              - CAST(floor(p.p_retailprice * 100.0) AS BIGINT)
                * CAST(floor(l.l_quantity * 100.0) AS BIGINT)) AS BIGINT)
         AS profit_micros
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# blame supplier (TPC-H Q21 shape): the unique last shipper of shared orders
# ---------------------------------------------------------------------------
#
# For every multi-supplier order, the supplier whose line shipped
# STRICTLY last (ties blame nobody) gets one demerit; report demerits
# per supplier.  The adaptation of Q21's "kept orders waiting" to this
# schema's single date column.  Physically the argmin_join physics: a
# per-(orderkey, suppkey) Max mart (per-batch partials first), then a
# per-orderkey vectorized map_groups over <= lines-per-order rows, one
# slim suppkey Count shuffle, broadcast name attach.

def q_blame_supplier(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sname = np.asarray(sup.column("s_name").to_pylist(), dtype=object)
    so = np.argsort(sk, kind="stable")
    ref = ray.put((sk[so], sname[so]))

    def partials(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((us, supp, ok))
        o, s, u = ok[order], supp[order], us[order]
        last = np.ones(len(order), dtype=bool)
        last[:-1] = (o[:-1] != o[1:]) | (s[:-1] != s[1:])  # max ship per (order, supp)
        return pa.table(
            {
                "l_orderkey": pa.array(o[last], type=pa.int64()),
                "l_suppkey": pa.array(s[last], type=pa.int64()),
                "ship_us": pa.array(u[last], type=pa.int64()),
            }
        )

    mart = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
        )
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max(on="ship_us", alias_name="ship_us"))
    )

    def blame(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:  # single-supplier order: nobody to blame
            return pa.table({"l_suppkey": pa.array([], type=pa.int64())})
        us = group.column("ship_us").to_numpy(zero_copy_only=False)
        at_max = us == us.max()
        if int(at_max.sum()) != 1:  # tie at the last ship: no unique culprit
            return pa.table({"l_suppkey": pa.array([], type=pa.int64())})
        s = group.column("l_suppkey").to_numpy(zero_copy_only=False)[at_max]
        return pa.table({"l_suppkey": pa.array(s, type=pa.int64())})

    blamed = mart.groupby("l_orderkey").map_groups(blame, batch_format="pyarrow")
    counts = blamed.groupby("l_suppkey").aggregate(Count(alias_name="n_orders"))

    def names(batch: pa.Table) -> pa.Table:
        skk, sn = ray.get(ref)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s_suppkey": batch.column("l_suppkey"),
                "s_name": pa.array(sn[np.searchsorted(skk, supp)].tolist(), type=pa.string()),
                "n_orders": batch.column("n_orders"),
            }
        )

    return counts.map_batches(names, batch_format="pyarrow")


SQL_BLAME_SUPPLIER = """
WITH ps AS (
  SELECT l_orderkey, l_suppkey, MAX(epoch_us(l_shipdate)) AS m
  FROM lineitem GROUP BY 1, 2),
o AS (
  SELECT l_orderkey, MAX(m) AS mm, COUNT(*) AS ns FROM ps GROUP BY 1),
late AS (
  SELECT ps.l_orderkey, MAX(ps.l_suppkey) AS blame, COUNT(*) AS c
  FROM ps JOIN o USING (l_orderkey)
  WHERE o.ns >= 2 AND ps.m = o.mm
  GROUP BY 1)
SELECT late.blame AS s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM late JOIN supplier s ON late.blame = s.s_suppkey
WHERE late.c = 1
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# idle customers (TPC-H Q22 shape): rich balances that never ordered
# ---------------------------------------------------------------------------
#
# Per nation: customers whose account balance exceeds the global
# average POSITIVE balance and who placed no orders since 1999.  The average is
# never a float — the filter is the cross-multiplied exact comparison
# bal_c * n_pos > sum_pos_c over round()-integerized cents (round, not
# floor: balances are signed).  The global (n_pos, sum_pos) fold is two
# ints; the "lapsed" test (no orders since the cutoff — every customer
# in this corpus has SOME order) is the native left_anti join against
# the recency-filtered pre-distinct custkey stream.

Q22_CUTOFF_US = 915_148_800_000_000  # 1999-01-01 in epoch microseconds

def q_idle_customers(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    no = np.argsort(nk, kind="stable")
    ref = ray.put((nk[no], nname[no]))

    def pos_partials(batch: pa.Table) -> pa.Table:
        c = np.round(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pos = c[c > 0]
        return pa.table(
            {
                "one": pa.array([0], type=pa.int64()),
                "n_pos": pa.array([len(pos)], type=pa.int64()),
                "sum_pos": pa.array([int(pos.sum())], type=pa.int64()),
            }
        )

    cust_path = f"{sf_dir}/customer.parquet"
    fold = (
        rd.read_parquet(cust_path, columns=["c_acctbal"])
        .map_batches(pos_partials, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum(on="n_pos", alias_name="n_pos"), Sum(on="sum_pos", alias_name="sum_pos"))
        .take_all()  # exactly one row: two global ints
    )
    n_pos, sum_pos = int(fold[0]["n_pos"]), int(fold[0]["sum_pos"])

    def okeys(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.unique(ck[us >= Q22_CUTOFF_US])
        return pa.table({"o_custkey": pa.array(v, type=pa.int64())})

    ordered = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(okeys, batch_format="pyarrow")
    cust = rd.read_parquet(cust_path, columns=["c_custkey", "c_acctbal", "c_nationkey"])
    idle = cust.join(
        ordered, join_type="left_anti", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",)
    )

    def rich_partials(batch: pa.Table) -> pa.Table:
        nkk, _ = ray.get(ref)
        c = np.round(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keep = c * n_pos > sum_pos  # bal > avg positive bal, exact cross-multiplied
        cnk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        ni = np.searchsorted(nkk, cnk)
        keys, inv = np.unique(ni, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        s = np.zeros(len(keys), dtype=np.int64)
        np.add.at(s, inv, c[keep])
        return pa.table(
            {
                "ni": pa.array(keys, type=pa.int64()),
                "n_cust": pa.array(n, type=pa.int64()),
                "bal_cents": pa.array(s, type=pa.int64()),
            }
        )

    agg = (
        idle.map_batches(rich_partials, batch_format="pyarrow")
        .groupby("ni")
        .aggregate(Sum(on="n_cust", alias_name="n_cust"), Sum(on="bal_cents", alias_name="bal_cents"))
    )

    def names(batch: pa.Table) -> pa.Table:
        _, nn = ray.get(ref)
        ni = batch.column("ni").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(nn[ni].tolist(), type=pa.string()),
                "n_cust": batch.column("n_cust"),
                "bal_cents": batch.column("bal_cents"),
            }
        )

    return agg.map_batches(names, batch_format="pyarrow")


SQL_IDLE_CUSTOMERS = """
WITH t AS (
  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100.0) AS BIGINT) AS c
  FROM customer),
p AS (
  SELECT COUNT(*) AS n_pos, SUM(c) AS sum_pos FROM t WHERE c > 0)
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_cust, CAST(SUM(t.c) AS BIGINT) AS bal_cents
FROM t
JOIN nation n ON t.c_nationkey = n.n_nationkey
CROSS JOIN p
WHERE t.c * p.n_pos > p.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = t.c_custkey
                  AND epoch_us(o.o_orderdate) >= 915148800000000)
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# shipping latency histogram (TPC-H Q12 family): lag-bucket x priority grid
# ---------------------------------------------------------------------------
#
# How long after order placement lines actually ship, bucketed in
# 10-day bands per order priority — the Q12 shipmode report re-keyed to
# this schema's date pair.  One fact-fact orderkey join of two pruned
# column sets, pure-integer day math identical on both sides, one
# grid-bounded Sum shuffle.

def q_ship_latency(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    items = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
    joined = items.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    _DAY_US = 24 * 3_600_000_000

    def partials(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # dates are midnight-aligned so the day count is an exact multiple;
        # the 10-day bucket mirrors DuckDB's TRUNCATING integer `//` (which
        # is NOT numpy floor division for the negative lags in this data)
        days = (ship - od) // _DAY_US
        lag_b = np.where(days >= 0, days // 10, -((-days) // 10))
        pr = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(pr.astype(str), "|"), lag_b.astype(str))
        keys, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        parts = [k.rsplit("|", 1) for k in keys.tolist()]
        return pa.table(
            {
                "o_orderpriority": pa.array([p[0] for p in parts], type=pa.string()),
                "lag_bucket": pa.array([int(p[1]) for p in parts], type=pa.int64()),
                "n_lines": pa.array(n, type=pa.int64()),
            }
        )

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby(["o_orderpriority", "lag_bucket"])
        .aggregate(Sum(on="n_lines", alias_name="n_lines"))
    )


SQL_SHIP_LATENCY = """
SELECT o.o_orderpriority,
       (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 // 10 AS lag_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# important parts (TPC-H Q11 shape): group share vs a GLOBAL threshold
# ---------------------------------------------------------------------------
#
# Q11's `HAVING SUM(value) > (SELECT SUM(value) * fraction FROM ...)`
# re-expressed over the lineitem fact (this dataset has no partsupp
# mart): keep every part whose exact-integer revenue exceeds 5/4 of the
# AVERAGE part's revenue (Q11's absolute fraction scales with 1/SF and
# goes degenerate as the part dimension grows — round-5 sf0.1 parity
# caught exactly that; the avg-relative form keeps a stable ~11%
# selectivity at every SF).  ONE scan of two pruned money columns:
# per-batch per-part partials -> one slim Sum shuffle -> the reduced
# per-part mart is materialized (part-dimension-bounded, the
# share_of_total precedent) and consumed three times: a scalar
# tree-aggregate (global total), a count (n_parts), and the vectorized
# threshold filter.  The compare  rev * 4 * n_parts > 5 * total  is
# evaluated WITHOUT the int64-overflowing product: for positive ints
# rev*K > M  <=>  rev > M // K  (if rev >= M//K + 1 then
# rev*K >= K*(M//K) + K > M because M % K < K; if rev <= M//K then
# rev*K <= K*(M//K) <= M), so the broadcast threshold is one Python
# int computed with arbitrary precision on the driver — immune to the
# 1e22 cross-product of the 100-TB tier.

Q11_NUM, Q11_DEN = 5, 4  # keep parts with rev > (5/4) * avg part rev


def _q11_partials(batch: pa.Table) -> pa.Table:
    pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    px = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    rev = np.floor(px * 100.0).astype(np.int64) * (
        100 - np.floor(disc * 100.0).astype(np.int64)
    )
    keys, inv = np.unique(pk, return_inverse=True)
    acc = np.zeros(len(keys), dtype=np.int64)
    np.add.at(acc, inv, rev)
    return pa.table(
        {
            "l_partkey": pa.array(keys, type=pa.int64()),
            "rev_micros": pa.array(acc, type=pa.int64()),
        }
    )


def q_important_parts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    mart = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(_q11_partials, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum(on="rev_micros", alias_name="rev_micros"))
        .materialize()  # part-dimension-bounded; consumed three times
    )
    total = int(mart.aggregate(Sum(on="rev_micros", alias_name="t"))["t"])
    n_parts = mart.count()
    # rev * (Q11_DEN * n_parts) > Q11_NUM * total  <=>  rev > M // K
    thresh = (Q11_NUM * total) // (Q11_DEN * n_parts) if n_parts else 0
    return mart.filter(expr=f"rev_micros > {thresh}")


SQL_IMPORTANT_PARTS = f"""
WITH pr AS (
  SELECT l_partkey,
         SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100.0) AS BIGINT))) AS rev_micros
  FROM lineitem GROUP BY 1)
SELECT l_partkey, CAST(rev_micros AS BIGINT) AS rev_micros
FROM pr
WHERE rev_micros > ({Q11_NUM} * (SELECT SUM(rev_micros) FROM pr))
                   // ({Q11_DEN} * (SELECT COUNT(*) FROM pr))
"""


# ---------------------------------------------------------------------------
# dominant supplier per part (TPC-H Q20 shape): group-vs-parent share
# ---------------------------------------------------------------------------
#
# Q20's `availqty > 0.5 * SUM(l_quantity ...)` correlated-subquery
# shape: every (part, supplier) whose shipped quantity exceeds 1.5x the
# AVERAGE supplier's share of that part (a fixed fraction of the total
# goes degenerate as suppliers-per-part grows with scale; the
# avg-relative form keeps a stable ~6% selectivity at every SF).  One
# scan: per-batch (part, supplier) quantity partials (lexsort +
# reduceat, NO integer key packing) -> one composite-key Sum shuffle ->
# a second groupby on the part key whose map_groups computes the parent
# total + supplier count and filters `2*qty*n_sup > 3*part_qty` in
# place — cross-multiplied exact ints with a pack-time domain assert,
# and the parent aggregates never leave their own group task (no join,
# no driver state, nothing consumed twice).

def _q20_partials(batch: pa.Table) -> pa.Table:
    pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    qty = np.floor(batch.column("l_quantity").to_numpy(zero_copy_only=False)).astype(np.int64)
    if len(pk) == 0:
        e = pa.array([], type=pa.int64())
        return pa.table({"l_partkey": e, "l_suppkey": e, "qty": e})
    o = np.lexsort((sk, pk))
    pk, sk, qty = pk[o], sk[o], qty[o]
    new = np.empty(len(pk), dtype=bool)
    new[0] = True
    new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
    starts = np.flatnonzero(new)
    return pa.table(
        {
            "l_partkey": pa.array(pk[starts], type=pa.int64()),
            "l_suppkey": pa.array(sk[starts], type=pa.int64()),
            "qty": pa.array(np.add.reduceat(qty, starts), type=pa.int64()),
        }
    )


def q_dominant_supplier(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    mart = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        )
        .map_batches(_q20_partials, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Sum(on="qty", alias_name="qty"))
    )

    def dominant(group: pa.Table) -> pa.Table:
        q = group.column("qty").to_numpy(zero_copy_only=False).astype(np.int64)
        part_qty = int(q.sum())
        n_sup = len(q)
        # packed-domain invariant: the cross-multiplied compare fits int64
        assert n_sup == 0 or 2 * int(q.max()) * n_sup < 2**62
        out = group.filter(pa.array(2 * q * n_sup > 3 * part_qty))
        out = out.append_column(
            "part_qty", pa.array(np.full(out.num_rows, part_qty), type=pa.int64())
        )
        return out.append_column(
            "n_sup", pa.array(np.full(out.num_rows, n_sup), type=pa.int64())
        )

    return mart.groupby("l_partkey").map_groups(dominant, batch_format="pyarrow")


SQL_DOMINANT_SUPPLIER = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(floor(l_quantity) AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1, 2),
p AS (
  SELECT l_partkey, SUM(qty) AS part_qty, COUNT(*) AS n_sup FROM ps GROUP BY 1)
SELECT ps.l_partkey, ps.l_suppkey, CAST(ps.qty AS BIGINT) AS qty,
       CAST(p.part_qty AS BIGINT) AS part_qty, CAST(p.n_sup AS BIGINT) AS n_sup
FROM ps JOIN p USING (l_partkey)
WHERE 2 * ps.qty * p.n_sup > 3 * p.part_qty
"""
