"""Window-function and OLAP operators: running totals, global rank,
pivot, and ROLLUP grouping sets.

Four more shapes a warehouse offload runs daily, each Ray-Data-first
and DuckDB-gated:

* ``running_sum`` — per-user cumulative sum ordered by (ts, event_id):
  distributed sort -> per-batch vectorized local prefix + slim
  per-(user, batch) totals -> per-user exclusive-prefix over the
  summaries (session-cardinality rows, the sessionize/asof repair
  pattern) -> one slim join adds each row's carry.  Exact int64 cents.
* ``global_rank`` — RANK() over the whole table by a value column:
  the value domain (n_chars) is bounded, so a distributed per-value
  count histogram -> exclusive prefix -> ``ray.put`` broadcast turns
  ranking into a vectorized lookup — no global sort of the data.
* ``pivot_user_value`` — long->wide: per-user value cents split across
  the event-type vocabulary into columns, one partial-agg pass.
* ``qty_rollup`` — GROUPING SETS/(ROLLUP): one scan emits partials for
  every grouping level; the shuffle carries #groups x #levels x
  #blocks slim rows.

Reference: the reference engine has no relational layer (it is an HTTP
client, lib.rs:1-66); these extend the brief's first-class
training-data/warehouse family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# running sum (cumulative window aggregate)
# ---------------------------------------------------------------------------

ROLL_ALL = "(all)"  # rollup sentinel (the grouped columns are never null)


def _scrub_empties(ds, num_blocks: int = 4):
    """Coalesce away SCHEMALESS empty blocks before a join.

    Ray's sort-based groupby emits schemaless empty blocks for empty
    partitions (the 'RefBundle with a different schema' warning), and
    ``map_batches`` never calls its fn on empty blocks, so they cannot
    be normalized in-line.  When such blocks reach ``Dataset.join``, the
    join can fail to resolve key fields ('No match or multiple matches
    for key field reference ...').  A small ``repartition`` concatenates
    empties into real blocks, restoring one consistent schema.  Only
    ever applied to SLIM summary sides (per-(user, batch) rows), never
    to the stream."""
    return ds.repartition(num_blocks)


def _running_local(batch: pa.Table) -> pa.Table:
    """One SORTED (user_id, ts, event_id) batch -> rows with the
    WITHIN-BATCH running cents per user, plus the batch key (the first
    row's sort triple) every row carries for the carry join."""
    n = batch.num_rows
    empty = {
        "event_id": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "local_cents": pa.array([], type=pa.int64()),
        "cents": pa.array([], type=pa.int64()),
        "b_uid": pa.array([], type=pa.int64()),
        "b_ts": pa.array([], type=pa.int64()),
        "b_eid": pa.array([], type=pa.int64()),
    }
    if n == 0:
        return pa.table(empty)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    val = batch.column("value").to_numpy(zero_copy_only=False)
    cents = np.floor(val * 100.0).astype(np.int64)
    run = np.cumsum(cents)
    starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
    # subtract the prefix before each user's first row in this batch
    base = np.concatenate(([0], run))[starts]  # cumsum up to (excl.) each run start
    local = run - np.repeat(base, np.diff(np.concatenate((starts, [n]))))
    return pa.table(
        {
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "local_cents": pa.array(local, type=pa.int64()),
            "cents": pa.array(cents, type=pa.int64()),
            "b_uid": pa.array(np.full(n, uid[0]), type=pa.int64()),
            "b_ts": pa.array(np.full(n, ts[0]), type=pa.int64()),
            "b_eid": pa.array(np.full(n, eid[0]), type=pa.int64()),
        }
    )


def _carry_offsets(group: pa.Table) -> pa.Table:
    """Per user: exclusive prefix of batch totals in batch-key order —
    each (user, batch) learns the cents accumulated in EARLIER batches."""
    bu = group.column("b_uid").to_numpy(zero_copy_only=False)
    bt = group.column("b_ts").to_numpy(zero_copy_only=False)
    be = group.column("b_eid").to_numpy(zero_copy_only=False)
    tot = group.column("tot").to_numpy(zero_copy_only=False)
    order = np.lexsort((be, bt, bu))
    carry = np.zeros(len(order), dtype=np.int64)
    carry[order[1:]] = np.cumsum(tot[order])[:-1]
    return pa.table(
        {
            "user_id": group.column("user_id"),
            "b_uid": group.column("b_uid"),
            "b_ts": group.column("b_ts"),
            "b_eid": group.column("b_eid"),
            "carry": pa.array(carry, type=pa.int64()),
        }
    )


def q_running_sum(sf_dir: str):
    """Per-user running total of integerized value, ordered by
    (ts, event_id) — SUM OVER (PARTITION BY user ORDER BY ...) at
    stream scale.  Row-level work is one vectorized pass per sorted
    batch; the exchange carries per-(user, batch) summaries and the
    final carry join, never a second copy of the stream."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cols = ["event_id", "user_id", "ts", "value"]
    # ONE sort + ONE prefix pass; the result feeds two consumers (the
    # carry derivation and the final join), so it is materialized once
    # into the (spillable) object store — the 100-TB analogue persists
    # the sorted, locally-prefixed run, which a sort materializes anyway.
    rows = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        .sort(["user_id", "ts", "event_id"])
        .map_batches(_running_local, batch_format="pyarrow")
        .materialize()
    )
    offsets = _scrub_empties(
        rows.select_columns(["user_id", "b_uid", "b_ts", "b_eid", "cents"])
        .groupby(["user_id", "b_uid", "b_ts", "b_eid"])
        .aggregate(Sum(on="cents", alias_name="tot"))
        .groupby("user_id")
        .map_groups(_carry_offsets, batch_format="pyarrow")
    )
    joined = rows.join(
        offsets,
        join_type="inner",
        num_partitions=8,
        on=("user_id", "b_uid", "b_ts", "b_eid"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        run = pa.compute.add(batch.column("local_cents"), batch.column("carry"))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "running_cents": run.cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_RUNNING_SUM = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
"""


# ---------------------------------------------------------------------------
# global rank (bounded-domain window rank without a data sort)
# ---------------------------------------------------------------------------


def q_global_rank(sf_dir: str):
    """RANK() over all documents by n_chars: a distributed per-value
    count -> driver exclusive prefix over the VALUE DOMAIN (bounded,
    data-independent) -> broadcast lookup; the table itself is never
    sorted or shuffled."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .take_all()  # value-domain-bounded (distinct lengths), driver-small
    )
    vals = np.array([r["n_chars"] for r in counts], dtype=np.int64)
    ns = np.array([r["n"] for r in counts], dtype=np.int64)
    order = np.argsort(vals)
    vals, ns = vals[order], ns[order]
    rank0 = np.concatenate(([0], np.cumsum(ns)[:-1])) + 1  # RANK of each value
    ref = ray.put((vals, rank0))

    def assign(batch: pa.Table) -> pa.Table:
        v, r = ray.get(ref)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(v, x)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "rnk": pa.array(r[idx], type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return ds.map_batches(assign, batch_format="pyarrow")


SQL_GLOBAL_RANK = """
SELECT doc_id, n_chars,
       CAST(RANK() OVER (ORDER BY n_chars) AS BIGINT) AS rnk
FROM documents
"""


# ---------------------------------------------------------------------------
# pivot (long -> wide)
# ---------------------------------------------------------------------------

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_user_value(sf_dir: str):
    """Per-user value cents split across the event-type vocabulary into
    one column per type — the long->wide reshape.  One partial-agg scan;
    the shuffle carries #users x #blocks slim wide rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        users, inv = np.unique(uid, return_inverse=True)
        cols: dict[str, object] = {"user_id": pa.array(users, type=pa.int64())}
        for t in PIVOT_TYPES:
            acc = np.zeros(len(users), dtype=np.int64)
            m = et == t
            np.add.at(acc, inv[m], cents[m])
            cols[f"{t}_cents"] = pa.array(acc, type=pa.int64())
        return pa.table(cols)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(on=f"{t}_cents", alias_name=f"{t}_cents") for t in PIVOT_TYPES])
    )


SQL_PIVOT_USER_VALUE = """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN CAST(floor(value * 100.0) AS BIGINT) END), 0) AS BIGINT) AS click_cents,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN CAST(floor(value * 100.0) AS BIGINT) END), 0) AS BIGINT) AS error_cents,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 100.0) AS BIGINT) END), 0) AS BIGINT) AS purchase_cents,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN CAST(floor(value * 100.0) AS BIGINT) END), 0) AS BIGINT) AS signup_cents,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN CAST(floor(value * 100.0) AS BIGINT) END), 0) AS BIGINT) AS view_cents
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# ROLLUP grouping sets
# ---------------------------------------------------------------------------


def q_qty_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) on quantity cents in
    ONE scan: each batch emits partials for all three grouping levels
    (leaf, flag subtotal, grand total) with a '(all)' sentinel in the
    rolled-up columns; one slim groupby merges them."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False).astype(object)
        ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False).astype(object)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        out_rf: list[str] = []
        out_ls: list[str] = []
        out_q: list[int] = []
        out_n: list[int] = []
        for level_rf, level_ls in ((rf, ls), (rf, None), (None, None)):
            a = level_rf if level_rf is not None else np.full(len(rf), ROLL_ALL, dtype=object)
            b = level_ls if level_ls is not None else np.full(len(ls), ROLL_ALL, dtype=object)
            key = np.char.add(np.char.add(a.astype(str), "|"), b.astype(str))
            keys, inv = np.unique(key, return_inverse=True)
            acc = np.zeros(len(keys), dtype=np.int64)
            np.add.at(acc, inv, qty)
            n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
            for k, q, c in zip(keys.tolist(), acc.tolist(), n.tolist()):
                p = k.split("|")
                out_rf.append(p[0])
                out_ls.append(p[1])
                out_q.append(q)
                out_n.append(c)
        return pa.table(
            {
                "l_returnflag": pa.array(out_rf, type=pa.string()),
                "l_linestatus": pa.array(out_ls, type=pa.string()),
                "sum_qty_cents": pa.array(out_q, type=pa.int64()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="sum_qty_cents", alias_name="sum_qty_cents"),
            Sum(on="n", alias_name="n"),
        )
    )


SQL_QTY_ROLLUP = f"""
SELECT COALESCE(l_returnflag, '{ROLL_ALL}') AS l_returnflag,
       COALESCE(l_linestatus, '{ROLL_ALL}') AS l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# LAG delta (previous-row window function)
# ---------------------------------------------------------------------------


def _lag_local(batch: pa.Table) -> pa.Table:
    """One SORTED (user_id, ts, event_id) batch -> rows carrying the
    integerized value, the within-batch LAG delta (NULL for each user's
    first row in the batch), a first-in-batch marker, and the batch key
    for the boundary repair join."""
    n = batch.num_rows
    empty = {
        "event_id": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "cents": pa.array([], type=pa.int64()),
        "delta_local": pa.array([], type=pa.int64()),
        "is_first": pa.array([], type=pa.bool_()),
        "b_uid": pa.array([], type=pa.int64()),
        "b_ts": pa.array([], type=pa.int64()),
        "b_eid": pa.array([], type=pa.int64()),
    }
    if n == 0:
        return pa.table(empty)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    cents = np.floor(
        batch.column("value").to_numpy(zero_copy_only=False) * 100.0
    ).astype(np.int64)
    first = np.concatenate(([True], uid[1:] != uid[:-1]))
    delta = np.empty(n, dtype=np.int64)
    delta[1:] = cents[1:] - cents[:-1]
    delta[0] = 0
    return pa.table(
        {
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "cents": pa.array(cents, type=pa.int64()),
            "delta_local": pa.array(np.where(first, 0, delta), type=pa.int64()),
            "is_first": pa.array(first),
            "b_uid": pa.array(np.full(n, uid[0]), type=pa.int64()),
            "b_ts": pa.array(np.full(n, ts[0]), type=pa.int64()),
            "b_eid": pa.array(np.full(n, eid[0]), type=pa.int64()),
        }
    )


def _lag_boundaries(batch: pa.Table) -> pa.Table:
    """Slim per-(user, batch-key) LAST-row candidates from _lag_local
    rows.  Re-batching-proof: rather than trusting contiguity, keep the
    row with the greatest (ts, event_id) per key seen in THIS map batch
    (vectorized lexsort argmax); a final per-key merge re-runs the same
    rule, so any split of the original batch converges to the true last
    row."""
    empty = {
        "user_id": pa.array([], type=pa.int64()),
        "b_uid": pa.array([], type=pa.int64()),
        "b_ts": pa.array([], type=pa.int64()),
        "b_eid": pa.array([], type=pa.int64()),
        "r_ts": pa.array([], type=pa.int64()),
        "r_eid": pa.array([], type=pa.int64()),
        "last_cents": pa.array([], type=pa.int64()),
    }
    if batch.num_rows == 0:
        return pa.table(empty)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    bts = batch.column("b_ts").to_numpy(zero_copy_only=False)
    beid = batch.column("b_eid").to_numpy(zero_copy_only=False)
    rts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    reid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    cents = batch.column("cents").to_numpy(zero_copy_only=False)
    # key by (user, b_ts, b_eid); b_uid rides along (b_* determine it)
    order = np.lexsort((reid, rts, beid, bts, uid))
    u_s, t_s, e_s = uid[order], bts[order], beid[order]
    is_last = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        is_last[:-1] = (u_s[1:] != u_s[:-1]) | (t_s[1:] != t_s[:-1]) | (e_s[1:] != e_s[:-1])
    idx = order[is_last]
    take = pa.array(idx)
    return pa.table(
        {
            "user_id": batch.column("user_id").take(take),
            "b_uid": batch.column("b_uid").take(take),
            "b_ts": batch.column("b_ts").take(take),
            "b_eid": batch.column("b_eid").take(take),
            "r_ts": pa.array(rts[idx], type=pa.int64()),
            "r_eid": pa.array(reid[idx], type=pa.int64()),
            "last_cents": pa.array(cents[idx], type=pa.int64()),
        }
    )


def _lag_prev(group: pa.Table) -> pa.Table:
    """Per user over MERGED boundary candidates: collapse candidates to
    the true last row per batch key (greatest (r_ts, r_eid) wins, the
    same rule as _lag_boundaries), then each batch learns the PREVIOUS
    batch's last cents (NaN when this batch holds the user's global
    first)."""
    bt0 = group.column("b_ts").to_numpy(zero_copy_only=False)
    be0 = group.column("b_eid").to_numpy(zero_copy_only=False)
    rts = group.column("r_ts").to_numpy(zero_copy_only=False)
    reid = group.column("r_eid").to_numpy(zero_copy_only=False)
    morder = np.lexsort((reid, rts, be0, bt0))
    t_s, e_s = bt0[morder], be0[morder]
    keep = np.ones(len(morder), dtype=bool)
    if len(morder) > 1:
        keep[:-1] = (t_s[1:] != t_s[:-1]) | (e_s[1:] != e_s[:-1])
    sel = pa.array(morder[keep])
    group = group.take(sel)
    bu = group.column("b_uid").to_numpy(zero_copy_only=False)
    bt = group.column("b_ts").to_numpy(zero_copy_only=False)
    be = group.column("b_eid").to_numpy(zero_copy_only=False)
    last = group.column("last_cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((be, bt, bu))
    prev = np.empty(len(order), dtype=np.float64)
    prev[order[0]] = np.nan
    prev[order[1:]] = last[order[:-1]]
    return pa.table(
        {
            "user_id": group.column("user_id"),
            "b_uid": group.column("b_uid"),
            "b_ts": group.column("b_ts"),
            "b_eid": group.column("b_eid"),
            "prev_cents": pa.array(prev, type=pa.float64()),  # NaN = no prev
        }
    )


def q_value_delta(sf_dir: str):
    """value - LAG(value) OVER (PARTITION BY user ORDER BY ts, event_id)
    in integer cents (NULL for each user's first event) — the
    previous-row window family.  Same physics as running_sum: one sort,
    one vectorized pass (materialized for its two consumers), boundary
    repair over slim per-(user, batch) rows, one carry join."""
    import pyarrow.compute as pc
    import ray.data as rd

    cols = ["event_id", "user_id", "ts", "value"]
    rows = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        .sort(["user_id", "ts", "event_id"])
        .map_batches(_lag_local, batch_format="pyarrow")
        .materialize()
    )
    prev = _scrub_empties(
        rows.map_batches(_lag_boundaries, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_lag_prev, batch_format="pyarrow")
    )
    joined = rows.join(
        prev, join_type="inner", num_partitions=8, on=("user_id", "b_uid", "b_ts", "b_eid")
    )

    def finish(batch: pa.Table) -> pa.Table:
        cents = batch.column("cents").to_numpy(zero_copy_only=False).astype(np.float64)
        local = batch.column("delta_local").to_numpy(zero_copy_only=False).astype(np.float64)
        first = batch.column("is_first").to_numpy(zero_copy_only=False)
        prevc = batch.column("prev_cents").to_numpy(zero_copy_only=False)
        delta = np.where(first, cents - prevc, local)  # NaN propagates = global first
        arr = pa.array(delta, type=pa.float64())
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "delta_cents": pc.cast(
                    pc.if_else(pc.is_nan(arr), pa.nulls(len(batch), pa.float64()), arr),
                    pa.int64(),
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_VALUE_DELTA = """
SELECT event_id, user_id, ts,
       CAST(floor(value * 100.0) AS BIGINT)
         - LAG(CAST(floor(value * 100.0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
FROM events
"""


# ---------------------------------------------------------------------------
# ordered group collect (array_agg / string_agg)
# ---------------------------------------------------------------------------


def q_user_journey(sf_dir: str):
    """Ordered collect per group — each user's event-type sequence in
    (ts, event_id) order, joined to one string (the clickstream-journey
    shape).  Collecting is inherently row-carrying: the shuffle moves
    (user, type, ts, id) slim rows, grouped per user, and the per-group
    work is one vectorized lexsort + join.  Per-group cardinality is the
    user's own event count — the operator's scale bound is max events
    per key, not stream size."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )

    def collect(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "journey": pa.array([",".join(et[order].tolist())], type=pa.string()),
                "n_events": pa.array([len(order)], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(collect, batch_format="pyarrow")


SQL_USER_JOURNEY = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS journey,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# global ROW_NUMBER / NTILE (total-order bucketing)
# ---------------------------------------------------------------------------

NTILE_K = 4


def _ntile_of(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """Standard SQL NTILE: the first n % k buckets get ceil(n/k) rows.
    Closed form over 1-based row numbers, pure integer ops."""
    sz = n // k
    big = n % k
    cut = big * (sz + 1)
    in_big = rn <= cut
    b = np.where(
        in_big,
        (rn - 1) // max(sz + 1, 1) + 1,
        big + np.where(sz > 0, (rn - 1 - cut) // max(sz, 1), 0) + 1,
    )
    return b.astype(np.int64)


def q_ntile(sf_dir: str):
    """NTILE(4) over documents in (n_chars, doc_id) total order — the
    row_number family at stream scale: ONE distributed sort, per-batch
    local indexes + slim per-batch counts, ONE global exclusive prefix
    over #batches rows, carry join, then the NTILE closed form.  No
    stage ever holds more than a batch; the prefix side is
    #batches-sized regardless of data volume."""
    import ray.data as rd

    def local_idx(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "li": pa.array([], type=pa.int64()),
                    "b_nc": pa.array([], type=pa.int64()),
                    "b_did": pa.array([], type=pa.int64()),
                }
            )
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "li": pa.array(np.arange(1, n + 1, dtype=np.int64), type=pa.int64()),
                "b_nc": pa.array(np.full(n, nc[0]), type=pa.int64()),
                "b_did": pa.array(np.full(n, did[0]), type=pa.int64()),
            }
        )

    rows = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"])
        .map_batches(local_idx, batch_format="pyarrow")
        .materialize()
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        bn = batch.column("b_nc").to_numpy(zero_copy_only=False)
        bd = batch.column("b_did").to_numpy(zero_copy_only=False)
        uk, counts = np.unique(np.stack([bn, bd], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "b_nc": pa.array(uk[:, 0], type=pa.int64()),
                "b_did": pa.array(uk[:, 1], type=pa.int64()),
                "cnt": pa.array(counts.astype(np.int64), type=pa.int64()),
                "one": pa.array(np.zeros(len(uk), dtype=np.int64), type=pa.int64()),
            }
        )

    def prefix(group: pa.Table) -> pa.Table:
        bn = group.column("b_nc").to_numpy(zero_copy_only=False)
        bd = group.column("b_did").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((bd, bn))
        carry = np.zeros(len(order), dtype=np.int64)
        carry[order[1:]] = np.cumsum(cnt[order])[:-1]
        total = int(cnt.sum())
        return pa.table(
            {
                "b_nc": group.column("b_nc"),
                "b_did": group.column("b_did"),
                "carry": pa.array(carry, type=pa.int64()),
                "total": pa.array(np.full(len(order), total), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    offsets = _scrub_empties(
        rows.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["b_nc", "b_did"])
        .aggregate(Sum(on="cnt", alias_name="cnt"), Sum(on="one", alias_name="one"))
        .groupby("one")  # single group: #batches rows, the global prefix
        .map_groups(prefix, batch_format="pyarrow")
    )
    joined = rows.join(offsets, join_type="inner", num_partitions=8, on=("b_nc", "b_did"))

    def finish(batch: pa.Table) -> pa.Table:
        rn = (
            batch.column("li").to_numpy(zero_copy_only=False)
            + batch.column("carry").to_numpy(zero_copy_only=False)
        )
        total = batch.column("total").to_numpy(zero_copy_only=False)
        n = int(total[0]) if len(total) else 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "rn": pa.array(rn, type=pa.int64()),
                "tile": pa.array(_ntile_of(rn, n, NTILE_K), type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_NTILE = f"""
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
       CAST(NTILE({NTILE_K}) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
FROM documents
"""


# ---------------------------------------------------------------------------
# funnel analysis (sequential pattern matching)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ["signup", "click", "purchase"]


def q_funnel(sf_dir: str):
    """Users who performed signup -> click -> purchase in strict
    timestamp order (the product-analytics funnel).  Greedy-earliest
    matching is exact for subsequence existence: take the earliest
    step-1 event, then the earliest step-2 event strictly after it, and
    so on — if the greedy chain fails, no chain exists.  Distributed
    shape: the stream is pre-filtered to funnel event types, then one
    groupby(user) with a vectorized per-group chain walk; per-group
    cardinality is the user's own funnel-event count."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).filter(expr=f"event_type in {FUNNEL_STEPS!r}")

    def chain(group: pa.Table) -> pa.Table:
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cur = np.int64(np.iinfo(np.int64).min)
        stamps = []
        for step in FUNNEL_STEPS:
            m = (et == step) & (ts > cur)
            if not m.any():
                return pa.table(
                    {
                        "user_id": pa.array([], type=pa.int64()),
                        "t_signup": pa.array([], type=pa.timestamp("us")),
                        "t_click": pa.array([], type=pa.timestamp("us")),
                        "t_purchase": pa.array([], type=pa.timestamp("us")),
                    }
                )
            cur = ts[m].min()
            stamps.append(cur)
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "t_signup": pa.array(np.array([stamps[0]], dtype="datetime64[us]")),
                "t_click": pa.array(np.array([stamps[1]], dtype="datetime64[us]")),
                "t_purchase": pa.array(np.array([stamps[2]], dtype="datetime64[us]")),
            }
        )

    return ds.groupby("user_id").map_groups(chain, batch_format="pyarrow")


SQL_FUNNEL = """
WITH s AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s.t_signup GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
SELECT p.user_id, s.t_signup, c.t_click, p.t_purchase
FROM p JOIN c USING (user_id) JOIN s USING (user_id)
"""


# ---------------------------------------------------------------------------
# retention cohorts (cohort-day x day-offset active-user matrix)
# ---------------------------------------------------------------------------


def q_retention(sf_dir: str):
    """Cohort retention: users grouped by their FIRST active day; for
    each (cohort_day, day_offset) the number of distinct cohort users
    active that day.  Distributed shape: per-user first-day groupby Min
    (slim) -> join back onto per-(user, day) distinct activity (slim,
    one row per user-day) -> exact distinct-user count per cell via the
    count groupby (cells bounded by days², users deduped per cell by
    construction)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def user_days(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day_i = (
            batch.column("ts")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // np.int64(86_400_000_000)
        )
        key = uid * np.int64(1 << 20) + day_i  # day index < 2^20 (through y4779)
        uk = np.unique(key)
        return pa.table(
            {
                "user_id": pa.array((uk >> np.int64(20)).astype(np.int64), type=pa.int64()),
                "day_i": pa.array(uk & np.int64((1 << 20) - 1), type=pa.int64()),
            }
        )

    activity = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(user_days, batch_format="pyarrow")
        .groupby(["user_id", "day_i"])
        .count()
    )
    first = _scrub_empties(
        activity.groupby("user_id").aggregate(Min(on="day_i", alias_name="first_i"))
    )
    joined = activity.join(first, join_type="inner", num_partitions=8, on=("user_id",))

    def cell_partials(batch: pa.Table) -> pa.Table:
        fi = batch.column("first_i").to_numpy(zero_copy_only=False).astype(np.int64)
        di = batch.column("day_i").to_numpy(zero_copy_only=False).astype(np.int64)
        off = di - fi
        key = fi * np.int64(1 << 20) + off
        uk, n = np.unique(key, return_counts=True)  # user-days already distinct
        return pa.table(
            {
                "cohort_i": pa.array((uk >> np.int64(20)).astype(np.int64), type=pa.int64()),
                "day_offset": pa.array(uk & np.int64((1 << 20) - 1), type=pa.int64()),
                "n_users": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        joined.map_batches(cell_partials, batch_format="pyarrow")
        .groupby(["cohort_i", "day_offset"])
        .aggregate(Sum(on="n_users", alias_name="n_users"))
    )


SQL_RETENTION = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_i
  FROM events),
f AS (SELECT user_id, MIN(day_i) AS first_i FROM ud GROUP BY user_id)
SELECT f.first_i AS cohort_i, ud.day_i - f.first_i AS day_offset,
       COUNT(*) AS n_users
FROM ud JOIN f USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# event transition matrix (per-user consecutive-event bigrams)
# ---------------------------------------------------------------------------


def q_transitions(sf_dir: str):
    """Markov-style transition counts: consecutive event-type pairs
    along each user's (ts, event_id)-ordered stream.  Per-user groupby
    with one vectorized lexsort + shift per group, then a
    vocabulary²-bounded pair-count groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )

    def bigrams(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        seq = et[order]
        if len(seq) < 2:
            return pa.table(
                {
                    "src": pa.array([], type=pa.string()),
                    "dst": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        key = np.char.add(np.char.add(seq[:-1].astype(str), "|"), seq[1:].astype(str))
        uk, n = np.unique(key, return_counts=True)
        parts = [k.split("|") for k in uk.tolist()]
        return pa.table(
            {
                "src": pa.array([p[0] for p in parts], type=pa.string()),
                "dst": pa.array([p[1] for p in parts], type=pa.string()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(bigrams, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum(on="n", alias_name="n"))
    )


SQL_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events)
SELECT src, dst, COUNT(*) AS n FROM s WHERE dst IS NOT NULL GROUP BY src, dst
"""


# ---------------------------------------------------------------------------
# time-weighted average (LOCF integral over the per-user stream)
# ---------------------------------------------------------------------------


def _twap_local(batch: pa.Table) -> pa.Table:
    """One SORTED (user_id, ts, event_id) contiguous run -> ONE summary
    row per user SEGMENT in this batch: the within-segment LOCF
    integral (sum of cents_i * (ts_{i+1} - ts_i) over consecutive
    same-user pairs, int64-exact) plus the segment's first/last
    endpoints, which the per-user merge needs to add the bridge gaps
    between adjacent batches.  Exchange mass = per-(user, batch) rows —
    the sessionize/running_sum repair-cardinality pattern."""
    empty = {
        "user_id": pa.array([], type=pa.int64()),
        "f_ts": pa.array([], type=pa.int64()),
        "f_eid": pa.array([], type=pa.int64()),
        "l_ts": pa.array([], type=pa.int64()),
        "l_cents": pa.array([], type=pa.int64()),
        "wsum": pa.array([], type=pa.int64()),
    }
    n = batch.num_rows
    if n == 0:
        return pa.table(empty)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    val = batch.column("value").to_numpy(zero_copy_only=False)
    cents = np.floor(val * 100.0).astype(np.int64)
    # numpy int64 wraps silently where DuckDB's BIGINT*BIGINT raises;
    # fail loudly instead of diverging (preflight in float headroom):
    # any within-batch segment integral is bounded by max|cents| x the
    # batch's own time span.
    span_f = float(ts.max() - ts.min())
    if float(np.max(np.abs(cents))) * max(span_f, 1.0) > 2.0**62:
        raise ValueError("twap int64 partial overflow: rescale cents or dt")
    starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
    ends = np.concatenate((starts[1:], [n])) - 1  # last row index per segment
    # pair i = (row i, row i+1); zero cross-user pairs, pad one trailing
    # zero so reduceat over `starts` covers the final segment.
    if n > 1:
        w = cents[:-1] * (ts[1:] - ts[:-1])
        w[uid[1:] != uid[:-1]] = 0
        wp = np.concatenate((w, [0]))
    else:
        wp = np.zeros(1, dtype=np.int64)
    wsum = np.add.reduceat(wp, starts)
    return pa.table(
        {
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "f_ts": pa.array(ts[starts], type=pa.int64()),
            "f_eid": pa.array(eid[starts], type=pa.int64()),
            "l_ts": pa.array(ts[ends], type=pa.int64()),
            "l_cents": pa.array(cents[ends], type=pa.int64()),
            "wsum": pa.array(wsum, type=pa.int64()),
        }
    )


def _twap_merge(group: pa.Table) -> pa.Table:
    """Per user over the slim segment summaries: order segments along
    the stream, add each bridge gap's LOCF contribution
    (l_cents_i * (f_ts_{i+1} - l_ts_i)), divide by the total span.
    Python ints -> the 128-bit-safe exact merge (segment counts are
    #batches per user, driver-free and tiny)."""
    fts = group.column("f_ts").to_numpy(zero_copy_only=False)
    feid = group.column("f_eid").to_numpy(zero_copy_only=False)
    order = np.lexsort((feid, fts))
    lts = group.column("l_ts").to_numpy(zero_copy_only=False)[order]
    lcents = group.column("l_cents").to_numpy(zero_copy_only=False)[order]
    wsum = group.column("wsum").to_numpy(zero_copy_only=False)[order]
    fts = fts[order]
    span = int(lts[-1]) - int(fts[0])
    empty = {
        "user_id": pa.array([], type=pa.int64()),
        "twap_cents": pa.array([], type=pa.int64()),
    }
    if span <= 0:  # single event or zero-width stream: no LOCF interval
        return pa.table(empty)
    total = sum(int(x) for x in wsum)
    for i in range(len(order) - 1):
        total += int(lcents[i]) * (int(fts[i + 1]) - int(lts[i]))
    return pa.table(
        {
            "user_id": pa.array([int(group.column("user_id")[0].as_py())], type=pa.int64()),
            "twap_cents": pa.array([total // span], type=pa.int64()),
        }
    )


def q_twap(sf_dir: str):
    """Per-user TIME-WEIGHTED average value in integer cents: each
    event's value holds (LOCF) until the user's next event; the answer
    is the exact integral of that step function divided by the user's
    observed span — the canonical irregular-time-series aggregate
    (sensor/pricing pipelines).  ONE distributed sort, one vectorized
    pass emitting per-(user, batch) segment summaries, one
    segment-cardinality groupby merge.  No join back to the stream: the
    output is per-user, so the stream is touched exactly once."""
    import ray.data as rd

    cols = ["event_id", "user_id", "ts", "value"]
    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        .sort(["user_id", "ts", "event_id"])
        .map_batches(_twap_local, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_twap_merge, batch_format="pyarrow")
    )


SQL_TWAP = """
WITH g AS (
  SELECT user_id,
         CAST(floor(value * 100.0) AS BIGINT) AS cents,
         ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT user_id,
       CAST(SUM(cents * date_diff('microsecond', ts, nxt))
            // SUM(date_diff('microsecond', ts, nxt)) AS BIGINT) AS twap_cents
FROM g
WHERE nxt IS NOT NULL
GROUP BY user_id
HAVING SUM(date_diff('microsecond', ts, nxt)) > 0
"""


# ---------------------------------------------------------------------------
# Pareto skyline (maximize o_totalprice, minimize o_orderdate)
# ---------------------------------------------------------------------------
#
# The dominance query every "best tradeoff" report runs: keep the
# orders no other order beats on BOTH axes (higher-or-equal price AND
# earlier-or-equal date, strictly better on at least one).  The
# distributed shape is the classic two-phase skyline: a vectorized
# LOCAL skyline inside every batch (dominated rows can never re-enter
# the global skyline, so pruning is lossless), then one final pass over
# the union of local skylines.  For randomly-ordered data the local
# skyline of a batch is O(log^{d-1} B) rows, so the merge input is tiny
# relative to the stream; the worst case (input pre-sorted so every row
# is a local survivor) degrades to a repartition of the full candidate
# set and would take a tournament-tree merge at 100 TB — noted, not
# needed for d=2.  Comparisons use the raw float64 price and int64
# microsecond date, so the kernel's ordering is bit-identical to the
# oracle's double/timestamp comparisons — no quantization.


def _skyline_kernel(batch: pa.Table) -> pa.Table:
    """Exact 2-D skyline of one batch, fully vectorized.

    Sort by price asc; per distinct price take the min date; a price
    group survives iff its min date is strictly below the running min
    date of all strictly-higher prices; within a surviving group keep
    every row tying the group min date (mutually non-dominating)."""
    if batch.num_rows == 0:
        return batch
    p = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
    d = batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((d, p))  # price asc, date asc within ties
    ps, ds = p[order], d[order]
    grp_start = np.flatnonzero(np.concatenate(([True], ps[1:] != ps[:-1])))
    m = ds[grp_start]  # min date per price group (date-sorted within group)
    # running min of group-min-dates over strictly HIGHER prices:
    # reverse (desc price), exclusive cumulative min, reverse back
    rev = m[::-1]
    run = np.concatenate(([np.iinfo(np.int64).max], np.minimum.accumulate(rev)[:-1]))[::-1]
    keep_grp = m < run
    n_grp = len(grp_start)
    grp_id = np.cumsum(np.concatenate(([False], ps[1:] != ps[:-1])))
    keep = keep_grp[grp_id] & (ds == m[grp_id])
    return batch.take(pa.array(order[keep]))


def q_skyline(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    return (
        ds.map_batches(_skyline_kernel, batch_format="pyarrow")
        .repartition(1)  # union of local skylines: small by construction
        .map_batches(_skyline_kernel, batch_format="pyarrow")
    )


SQL_SKYLINE = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders d
  WHERE d.o_totalprice >= o.o_totalprice
    AND d.o_orderdate <= o.o_orderdate
    AND (d.o_totalprice > o.o_totalprice OR d.o_orderdate < o.o_orderdate))
"""


# ---------------------------------------------------------------------------
# interval union coverage (merge overlapping intervals per user)
# ---------------------------------------------------------------------------
#
# The "total active time" aggregate (billing, uptime, ad exposure):
# each event opens a deterministic interval [ts, ts + 10min +
# (event_id % 20) min]; per user, overlapping intervals merge into
# islands and the answer is the island count plus the exact union
# length in microseconds.
#
# Distributed shape: ONE distributed sort by (user_id, ts, event_id)
# -> a vectorized per-batch pass that compresses each batch's rows to
# its LOCAL islands (a log-doubling segmented running-max scan — no
# Python loop) -> per-user merge that re-runs the same union scan over
# island rows.  The kernel is closed over intervals (islands are
# intervals), so the merge is exactly the local pass at island
# cardinality: split-invariant by construction, exchange mass =
# per-(user, batch) islands, never the event stream.


def _iv_bounds(ts_us: np.ndarray, eid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    dur = (600 + 60 * (eid % 20)) * 1_000_000
    return ts_us, ts_us + dur


def _union_islands(
    uid: np.ndarray, s: np.ndarray, e: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rows sorted by (uid, s, tiebreak): merge overlapping or touching
    intervals (a new island starts only when s is STRICTLY greater than
    the running max end) per uid; returns (uid, island_start,
    island_end) arrays.
    Segmented running max via log-doubling — O(n log n) vectorized ops,
    no per-row Python."""
    n = len(s)
    seg = np.empty(n, dtype=np.int64)
    seg[0] = 0
    np.cumsum(uid[1:] != uid[:-1], out=seg[1:])
    m = e.copy()
    shift = 1
    while shift < n:
        same = seg[shift:] == seg[:-shift]
        np.maximum(m[shift:], np.where(same, m[:-shift], m[shift:]), out=m[shift:])
        shift *= 2
    brk = np.ones(n, dtype=bool)
    brk[1:] = (seg[1:] != seg[:-1]) | (s[1:] > m[:-1])
    idx = np.nonzero(brk)[0]
    isl_end = np.maximum.reduceat(e, idx)
    return uid[idx], s[idx], isl_end


def _iv_local(batch: pa.Table) -> pa.Table:
    empty = {
        "user_id": pa.array([], type=pa.int64()),
        "s": pa.array([], type=pa.int64()),
        "e": pa.array([], type=pa.int64()),
    }
    if batch.num_rows == 0:
        return pa.table(empty)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    s, e = _iv_bounds(ts, eid)
    u2, s2, e2 = _union_islands(uid, s, e)
    return pa.table(
        {
            "user_id": pa.array(u2, type=pa.int64()),
            "s": pa.array(s2, type=pa.int64()),
            "e": pa.array(e2, type=pa.int64()),
        }
    )


def _iv_merge(group: pa.Table) -> pa.Table:
    uid = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    s = group.column("s").to_numpy(zero_copy_only=False)
    e = group.column("e").to_numpy(zero_copy_only=False)
    order = np.lexsort((e, s))
    u2, s2, e2 = _union_islands(uid[order], s[order], e[order])
    return pa.table(
        {
            "user_id": pa.array(u2[:1]),
            "n_islands": pa.array([len(s2)], type=pa.int64()),
            "covered_us": pa.array([int((e2 - s2).sum())], type=pa.int64()),
        }
    )


def q_interval_union(sf_dir: str):
    """Per-user interval-union coverage: island count + exact covered
    microseconds after merging overlapping per-event intervals."""
    import ray.data as rd

    cols = ["event_id", "user_id", "ts"]
    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        .sort(["user_id", "ts", "event_id"])
        .map_batches(_iv_local, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_iv_merge, batch_format="pyarrow")
    )


SQL_INTERVAL_UNION = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + (600 + 60 * (event_id % 20)) * 1000000 AS e
  FROM events),
m AS (
  SELECT user_id, event_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN mprev IS NULL OR s > mprev THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM m),
g AS (
  SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
  FROM isl GROUP BY user_id, island)
SELECT user_id,
       COUNT(*) AS n_islands,
       CAST(SUM(en - st) AS BIGINT) AS covered_us
FROM g GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# longest increasing streak (gaps-and-islands max-run window fold)
# ---------------------------------------------------------------------------
#
# The run-length window family's missing member (interval_union merges
# intervals, sessionize cuts on gaps; this one folds CONSECUTIVE-ROW
# comparisons): per user, the longest run of strictly-increasing values
# along the (ts, event_id) order — the engagement-streak / monotone-run
# report.  Comparison domain is exact integer cents, so run boundaries
# are bit-reproducible.  One user-keyed shuffle; the per-group work is
# a lexsort + one vectorized diff/flatnonzero pass, and the scale bound
# is max events per key (the same contract as user_journey,
# documented in SURVEY §2.6).


def q_longest_streak(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def fold(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        cents = np.floor(val[order] * 100.0).astype(np.int64)
        # break BEFORE row i when cents[i] <= cents[i-1]; row 0 always breaks
        brk = np.flatnonzero(np.concatenate(([True], np.diff(cents) <= 0)))
        runs = np.diff(np.concatenate((brk, [len(cents)])))
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "max_streak": pa.array([int(runs.max())], type=pa.int64()),
                "n_events": pa.array([len(cents)], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_LONGEST_STREAK = """
WITH o AS (
  SELECT user_id,
         CAST(floor(value * 100.0) AS BIGINT) AS cents,
         ROW_NUMBER() OVER w AS rn,
         LAG(CAST(floor(value * 100.0) AS BIGINT)) OVER w AS prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (
  SELECT user_id, rn,
         CASE WHEN prev IS NULL OR cents <= prev THEN 1 ELSE 0 END AS brk
  FROM o),
g AS (
  SELECT user_id, rn,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY rn) AS grp
  FROM f),
r AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(SUM(len) AS BIGINT) AS n_events
FROM r GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# attribution join: clicks within a window before each purchase
# ---------------------------------------------------------------------------
#
# The ad-attribution / conversion-credit shape: for every purchase,
# count the same user's clicks in the preceding hour ([t-W, t),
# half-open so a click at exactly purchase time never self-credits).
# Semantically a temporal band self-join; physically ONE user-keyed
# shuffle and a per-group two-searchsorted pass (clicks and purchases
# each sorted once, every purchase answered in O(log n)) — never the
# O(clicks x purchases) pair blowup the SQL oracle spells.  Integer
# microsecond timestamps end to end.

ATTR_WINDOW_US = 3_600_000_000  # 1 hour


def q_attribution(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).filter(expr="event_type in ['click', 'purchase']")

    def fold(group: pa.Table) -> pa.Table:
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        clicks = np.sort(us[et == "click"])
        purch = us[et == "purchase"]
        if len(purch) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_purchases": pa.array([], type=pa.int64()),
                    "n_attributed": pa.array([], type=pa.int64()),
                }
            )
        lo = np.searchsorted(clicks, purch - ATTR_WINDOW_US, side="left")
        hi = np.searchsorted(clicks, purch, side="left")
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_purchases": pa.array([len(purch)], type=pa.int64()),
                "n_attributed": pa.array([int((hi - lo).sum())], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_ATTRIBUTION = f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
a AS (
  SELECT p.user_id,
         (SELECT COUNT(*) FROM c
          WHERE c.user_id = p.user_id
            AND c.us >= p.us - {ATTR_WINDOW_US} AND c.us < p.us) AS hits
  FROM p)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(hits) AS BIGINT) AS n_attributed
FROM a GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# growth accounting: daily active / new / returning users
# ---------------------------------------------------------------------------
#
# The DAU growth report every product pipeline runs: per UTC day, how
# many distinct users were active, how many were NEW (first-ever
# activity that day), and the returning remainder.  Two slim exchanges:
# distinct (day, user) pairs (per-batch pre-distinct, then a native
# count) and a per-user Min(day) first-seen aggregate; a left-outer
# day join + coalesce folds them.  No stage carries event-cardinality
# rows past the first map.

DAY_US = 86_400_000_000


def q_growth_accounting(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_pairs(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = us // DAY_US
        # packed-domain invariant: the (day, user) composite decodes with
        # // and %, which is only bijective while 0 <= uid < the modulus
        if len(uid):
            assert 0 <= uid.min() and uid.max() < 1_000_000_007, (
                "day_churn packing requires 0 <= user_id < 1_000_000_007; "
                "use a two-column distinct for wider id domains"
            )
        key = np.unique(day * 1_000_000_007 + uid)  # per-batch pre-distinct
        return pa.table(
            {
                "day": pa.array(key // 1_000_000_007, type=pa.int64()),
                "user_id": pa.array(key % 1_000_000_007, type=pa.int64()),
            }
        )

    du = (
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["day", "user_id"])
        .materialize()  # consumed twice (active count + first-seen)
    )
    active = du.groupby("day").aggregate(Count(alias_name="n_active"))
    first = (
        du.groupby("user_id")
        .aggregate(Min(on="day", alias_name="day"))
        .groupby("day")
        .aggregate(Count(alias_name="n_new"))
    )
    joined = _scrub_empties(active, 4).join(
        _scrub_empties(first, 4), join_type="left_outer", on=("day",), num_partitions=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        a = batch.column("n_active").to_numpy(zero_copy_only=False).astype(np.int64)
        nw = batch.column("n_new").to_numpy(zero_copy_only=False)
        nw = np.where(np.isnan(nw.astype(np.float64)), 0, nw).astype(np.int64)
        return pa.table(
            {
                "day": batch.column("day"),
                "n_active": pa.array(a, type=pa.int64()),
                "n_new": pa.array(nw, type=pa.int64()),
                "n_returning": pa.array(a - nw, type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_GROWTH_ACCOUNTING = f"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id FROM events),
fd AS (SELECT user_id, MIN(day) AS day FROM du GROUP BY user_id),
nw AS (SELECT day, COUNT(*) AS n_new FROM fd GROUP BY day),
ac AS (SELECT day, COUNT(*) AS n_active FROM du GROUP BY day)
SELECT ac.day,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       CAST(n_active - COALESCE(n_new, 0) AS BIGINT) AS n_returning
FROM ac LEFT JOIN nw USING (day)
"""


# ---------------------------------------------------------------------------
# share of total (RATIO_TO_REPORT window over grouped sums)
# ---------------------------------------------------------------------------
#
# The percent-of-total report: each (user, event_type)'s share of that
# user's total spend.  Numerator and denominator are exact integer
# cents (per-batch partials + native Sum merges), the per-user total is
# an aggregate OVER the already-shrunk (user, type) table (vocabulary-
# bounded, not event-bounded), and the single final division is
# computed identically on both sides.

def q_share_of_total(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "cents": pc.cast(
                    pc.floor(pc.multiply(batch.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    g = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])
        .map_batches(cents, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum(on="cents", alias_name="cents"))
        .materialize()  # (user x vocab)-bounded; consumed twice
    )
    tot = g.groupby("user_id").aggregate(Sum(on="cents", alias_name="total"))
    joined = _scrub_empties(g, 4).join(
        _scrub_empties(tot, 4), join_type="inner", on=("user_id",), num_partitions=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.column("total").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "cents": pa.array(c, type=pa.int64()),
                "share": pa.array(
                    c.astype(np.float64) / t.astype(np.float64), type=pa.float64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_SHARE_OF_TOTAL = """
WITH g AS (
  SELECT user_id, event_type,
         CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, event_type)
SELECT user_id, event_type, cents,
       CAST(cents AS DOUBLE)
         / CAST(SUM(cents) OVER (PARTITION BY user_id) AS DOUBLE) AS share
FROM g
"""


# ---------------------------------------------------------------------------
# maximum drawdown: per-user peak-to-trough decline along the value stream
# ---------------------------------------------------------------------------
#
# The risk-report shape (max over time of running-peak minus current
# value), and the textbook associative-scan exercise: drawdown over a
# concatenation folds as
#     dd(L + R) = max(dd(L), dd(R), max(L) - min(R))
# so one distributed sort by (user_id, ts, event_id) followed by a
# vectorized per-batch segment summary (dd, max, min, first-key) and a
# per-user fold over SEGMENT partials (#blocks-touching-the-user rows,
# never event rows) computes it exactly — the sessionize/running_sum
# repair pattern.  All math in exact int64 cents.


def _drawdown_partial(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "s_ts": pa.array([], type=pa.int64()),
                "s_eid": pa.array([], type=pa.int64()),
                "dd": pa.array([], type=pa.int64()),
                "mx": pa.array([], type=pa.int64()),
                "mn": pa.array([], type=pa.int64()),
                "pn": pa.array([], type=pa.int64()),
            }
        )
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ep = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = uid[1:] != uid[:-1]
    starts = np.nonzero(new)[0]
    ends = np.concatenate([starts[1:], [n]])
    # segmented running-peak: one global cummax of (c shifted so every
    # segment start dominates all earlier values) would change values,
    # so restart the cummax per segment; segments per batch are bounded
    # by distinct users per batch, and each pass is a vectorized
    # accumulate over the slice.
    dd = np.empty(len(starts), dtype=np.int64)
    for si, (a, b) in enumerate(zip(starts, ends)):
        seg = c[a:b]
        dd[si] = int(np.max(np.maximum.accumulate(seg) - seg))
    return pa.table(
        {
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "s_ts": pa.array(ep[starts], type=pa.int64()),
            "s_eid": pa.array(eid[starts], type=pa.int64()),
            "dd": pa.array(dd, type=pa.int64()),
            "mx": pa.array(np.maximum.reduceat(c, starts), type=pa.int64()),
            "mn": pa.array(np.minimum.reduceat(c, starts), type=pa.int64()),
            "pn": pa.array(ends - starts, type=pa.int64()),
        }
    )


def _drawdown_merge(g: pa.Table) -> pa.Table:
    s_ts = g.column("s_ts").to_numpy(zero_copy_only=False)
    s_eid = g.column("s_eid").to_numpy(zero_copy_only=False)
    order = np.lexsort((s_eid, s_ts))
    dd = g.column("dd").to_numpy(zero_copy_only=False)[order]
    mx = g.column("mx").to_numpy(zero_copy_only=False)[order]
    mn = g.column("mn").to_numpy(zero_copy_only=False)[order]
    pn = g.column("pn").to_numpy(zero_copy_only=False)[order]
    # fold: dd(L+R) = max(dd_L, dd_R, max_L - min_R); prefix-max of mx
    # gives max_L for every split point, all vectorized.
    prev_peak = np.concatenate(([np.iinfo(np.int64).min], np.maximum.accumulate(mx)[:-1]))
    best = max(int(dd.max()), int((prev_peak[1:] - mn[1:]).max()) if len(mn) > 1 else 0)
    return pa.table(
        {
            "user_id": g.column("user_id").slice(0, 1),
            "max_drawdown": pa.array([best], type=pa.int64()),
            "peak": pa.array([int(mx.max())], type=pa.int64()),
            "n_events": pa.array([int(pn.sum())], type=pa.int64()),
        }
    )


def q_max_drawdown(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    parts = ds.sort(["user_id", "ts", "event_id"]).map_batches(
        _drawdown_partial, batch_format="pyarrow"
    )
    return parts.groupby("user_id").map_groups(_drawdown_merge, batch_format="pyarrow")


SQL_MAX_DRAWDOWN = """
WITH o AS (
  SELECT user_id, CAST(floor(value * 100.0) AS BIGINT) AS c,
         MAX(CAST(floor(value * 100.0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS pk
  FROM events)
SELECT user_id,
       CAST(MAX(pk - c) AS BIGINT) AS max_drawdown,
       CAST(MAX(pk) AS BIGINT) AS peak,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM o GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# OHLC bars: per-(user, hour) open/high/low/close resampling
# ---------------------------------------------------------------------------
#
# The time-series downsampling shape (tick stream -> bars).  High/low/n
# are order-free native partials; open/close are argmin/argmax by
# (ts, event_id) — each batch emits ONE candidate row per (user, hour)
# it touches (the compact_lww argmax-partial pattern), and a slim
# groupby picks the winner, so the shuffle carries bar-cardinality
# rows, never ticks.

_HOUR_US = 3_600_000_000


def _ohlc_partial(batch: pa.Table) -> pa.Table:
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ep = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    hr = (ep // _HOUR_US) * _HOUR_US
    # sort batch rows by (user, hour, ts, eid); reduceat segments = bars
    order = np.lexsort((eid, ep, hr, uid))
    uid, ep, eid, c, hr = uid[order], ep[order], eid[order], c[order], hr[order]
    new = np.ones(len(uid), dtype=bool)
    new[1:] = (uid[1:] != uid[:-1]) | (hr[1:] != hr[:-1])
    st = np.nonzero(new)[0]
    en = np.concatenate([st[1:], [len(uid)]])
    last = en - 1
    return pa.table(
        {
            "user_id": pa.array(uid[st], type=pa.int64()),
            "hr": pa.array(hr[st], type=pa.int64()),
            "o_ts": pa.array(ep[st], type=pa.int64()),
            "o_eid": pa.array(eid[st], type=pa.int64()),
            "o_c": pa.array(c[st], type=pa.int64()),
            "c_ts": pa.array(ep[last], type=pa.int64()),
            "c_eid": pa.array(eid[last], type=pa.int64()),
            "c_c": pa.array(c[last], type=pa.int64()),
            "hi": pa.array(np.maximum.reduceat(c, st), type=pa.int64()),
            "lo": pa.array(np.minimum.reduceat(c, st), type=pa.int64()),
            "n": pa.array(en - st, type=pa.int64()),
        }
    )


def _ohlc_merge(g: pa.Table) -> pa.Table:
    o_ts = g.column("o_ts").to_numpy(zero_copy_only=False)
    o_eid = g.column("o_eid").to_numpy(zero_copy_only=False)
    c_ts = g.column("c_ts").to_numpy(zero_copy_only=False)
    c_eid = g.column("c_eid").to_numpy(zero_copy_only=False)
    oi = int(np.lexsort((o_eid, o_ts))[0])
    ci = int(np.lexsort((c_eid, c_ts))[-1])
    return pa.table(
        {
            "user_id": g.column("user_id").slice(0, 1),
            "hr": g.column("hr").slice(0, 1).cast(pa.timestamp("us")),
            "open": g.column("o_c").slice(oi, 1),
            "high": pa.array([int(g.column("hi").to_numpy(zero_copy_only=False).max())], type=pa.int64()),
            "low": pa.array([int(g.column("lo").to_numpy(zero_copy_only=False).min())], type=pa.int64()),
            "close": g.column("c_c").slice(ci, 1),
            "n": pa.array([int(g.column("n").to_numpy(zero_copy_only=False).sum())], type=pa.int64()),
        }
    )


def q_ohlc_bars(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    parts = ds.map_batches(_ohlc_partial, batch_format="pyarrow")
    return parts.groupby(["user_id", "hr"]).map_groups(_ohlc_merge, batch_format="pyarrow")


SQL_OHLC_BARS = """
WITH o AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         CAST(floor(value * 100.0) AS BIGINT) AS c,
         FIRST_VALUE(CAST(floor(value * 100.0) AS BIGINT))
           OVER (PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts, event_id) AS open_c,
         FIRST_VALUE(CAST(floor(value * 100.0) AS BIGINT))
           OVER (PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts DESC, event_id DESC) AS close_c
  FROM events)
SELECT user_id, hr,
       CAST(MAX(open_c) AS BIGINT) AS open,
       CAST(MAX(c) AS BIGINT) AS high,
       CAST(MIN(c) AS BIGINT) AS low,
       CAST(MAX(close_c) AS BIGINT) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM o GROUP BY user_id, hr
"""


# ---------------------------------------------------------------------------
# decayed sum: recency-weighted engagement feature (EWMA family)
# ---------------------------------------------------------------------------
#
# Per user, the 32-term binary-decayed sum over the most recent events
# (ordered by ts desc, event_id desc):
#     S = sum_{j=1..min(32,n)}  cents_j * 2^(32-j)
# i.e. alpha=1/2 exponential decay truncated at 32 taps, kept EXACT in
# int64 by weighting with integer powers of two (cents < 2^20 here, so
# S < 2^20 * 2^31 * 2 = 2^52).  Physically this is the grouped
# top-k-by-recency shrink: each batch keeps at most 32 candidate rows
# per user it touches, the shuffle moves <=32 x #blocks rows per user,
# and the merge re-ranks the survivors — ticks never shuffle.

DECAY_TAPS = 32


def _decay_partial(batch: pa.Table) -> pa.Table:
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ep = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    # newest-first within user: sort by (user asc, ts desc, eid desc)
    order = np.lexsort((-eid, -ep, uid))
    uid, ep, eid, c = uid[order], ep[order], eid[order], c[order]
    new = np.ones(len(uid), dtype=bool)
    new[1:] = uid[1:] != uid[:-1]
    seg = np.cumsum(new) - 1
    st = np.nonzero(new)[0]
    rank = np.arange(len(uid)) - st[seg]  # 0-based recency rank within batch
    keep = rank < DECAY_TAPS
    return pa.table(
        {
            "user_id": pa.array(uid[keep], type=pa.int64()),
            "ep": pa.array(ep[keep], type=pa.int64()),
            "eid": pa.array(eid[keep], type=pa.int64()),
            "c": pa.array(c[keep], type=pa.int64()),
        }
    )


def _decay_merge(g: pa.Table) -> pa.Table:
    ep = g.column("ep").to_numpy(zero_copy_only=False)
    eid = g.column("eid").to_numpy(zero_copy_only=False)
    c = g.column("c").to_numpy(zero_copy_only=False)
    order = np.lexsort((-eid, -ep))[:DECAY_TAPS]
    j = np.arange(1, len(order) + 1, dtype=np.int64)
    s = int(np.sum(c[order] << (DECAY_TAPS - j)))
    return pa.table(
        {
            "user_id": g.column("user_id").slice(0, 1),
            "decayed": pa.array([s], type=pa.int64()),
            "n_taps": pa.array([len(order)], type=pa.int64()),
        }
    )


def q_decayed_sum(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    parts = ds.map_batches(_decay_partial, batch_format="pyarrow")
    return parts.groupby("user_id").map_groups(_decay_merge, batch_format="pyarrow")


SQL_DECAYED_SUM = f"""
WITH o AS (
  SELECT user_id, CAST(floor(value * 100.0) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS j
  FROM events)
SELECT user_id,
       CAST(SUM(c * (CAST(1 AS BIGINT) << CAST({DECAY_TAPS} - j AS INTEGER))) AS BIGINT) AS decayed,
       CAST(COUNT(*) AS BIGINT) AS n_taps
FROM o WHERE j <= {DECAY_TAPS} GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# bounded-window rolling sum: SUM OVER (ROWS 2 PRECEDING AND CURRENT)
# ---------------------------------------------------------------------------
#
# The moving-window family (running_sum is the unbounded prefix;
# value_delta is LAG): each event's sum of itself plus its user's two
# preceding events in (ts, event_id) order, exact int64 cents.  Plan:
# one distributed sort, a vectorized per-batch pass that resolves every
# row except the first TWO of each (user, batch) segment, ONE summary
# row per segment (its head rows' partial sums + its last-two tail
# cents), a per-user walk over segment-cardinality summaries that
# repairs the heads, and one left join of the slim repair rows back
# onto the stream.  Ticks cross the wire once (the sort); the repair
# side is #segments-sized.

ROLL_W = 2  # preceding rows in the window


def _roll_local(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ep = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = uid[1:] != uid[:-1]
    st = np.nonzero(new)[0]
    seg = np.cumsum(new) - 1
    rank = np.arange(n) - st[seg]
    prev1 = np.where(rank >= 1, np.roll(c, 1), 0)
    prev2 = np.where(rank >= 2, np.roll(c, 2), 0)
    local = c + prev1 + prev2  # complete iff rank >= ROLL_W
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": batch.column("ts"),
            "rank": pa.array(rank, type=pa.int64()),
            "cents": pa.array(c, type=pa.int64()),
            "local": pa.array(local, type=pa.int64()),
        }
    )


def _roll_boundaries(batch: pa.Table) -> pa.Table:
    """ONE summary row per (user, batch) segment: first-row key (for
    ordering), head rows' (eid, local) needing repair, last-two tail
    cents for successors."""
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "f_ts": pa.array([], type=pa.int64()),
                "f_eid": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "h0_eid": pa.array([], type=pa.int64()),
                "h0_local": pa.array([], type=pa.int64()),
                "h1_eid": pa.array([], type=pa.int64()),
                "h1_local": pa.array([], type=pa.int64()),
                "t1": pa.array([], type=pa.int64()),
                "t2": pa.array([], type=pa.int64()),
            }
        )
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    ep = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    c = batch.column("cents").to_numpy(zero_copy_only=False)
    local = batch.column("local").to_numpy(zero_copy_only=False)
    new = np.ones(n, dtype=bool)
    new[1:] = uid[1:] != uid[:-1]
    st = np.nonzero(new)[0]
    en = np.concatenate([st[1:], [n]])
    ln = en - st
    h1 = np.where(ln >= 2, st + 1, -1)
    t2 = np.where(ln >= 2, en - 2, -1)
    return pa.table(
        {
            "user_id": pa.array(uid[st], type=pa.int64()),
            "f_ts": pa.array(ep[st], type=pa.int64()),
            "f_eid": pa.array(eid[st], type=pa.int64()),
            "n": pa.array(ln, type=pa.int64()),
            "h0_eid": pa.array(eid[st], type=pa.int64()),
            "h0_local": pa.array(local[st], type=pa.int64()),
            "h1_eid": pa.array(np.where(h1 >= 0, eid[np.maximum(h1, 0)], -1), type=pa.int64()),
            "h1_local": pa.array(np.where(h1 >= 0, local[np.maximum(h1, 0)], 0), type=pa.int64()),
            "t1": pa.array(c[en - 1], type=pa.int64()),
            "t2": pa.array(np.where(t2 >= 0, c[np.maximum(t2, 0)], 0), type=pa.int64()),
        }
    )


def _roll_repair(g: pa.Table) -> pa.Table:
    """Per-user walk over segment summaries in stream order: fix each
    segment's head rows using the running last-two cents carried from
    prior segments.  Output rows: (event_id, fixed) for heads only."""
    f_ts = g.column("f_ts").to_numpy(zero_copy_only=False)
    f_eid = g.column("f_eid").to_numpy(zero_copy_only=False)
    order = np.lexsort((f_eid, f_ts))
    n = g.column("n").to_numpy(zero_copy_only=False)[order]
    h0e = g.column("h0_eid").to_numpy(zero_copy_only=False)[order]
    h0l = g.column("h0_local").to_numpy(zero_copy_only=False)[order]
    h1e = g.column("h1_eid").to_numpy(zero_copy_only=False)[order]
    h1l = g.column("h1_local").to_numpy(zero_copy_only=False)[order]
    t1 = g.column("t1").to_numpy(zero_copy_only=False)[order]
    t2 = g.column("t2").to_numpy(zero_copy_only=False)[order]
    out_eid: list[int] = []
    out_fix: list[int] = []
    p1 = p2 = None  # last and second-last cents seen so far
    for i in range(len(n)):
        # head row 0: local == own cents; needs p1 and p2
        fix0 = int(h0l[i]) + (int(p1) if p1 is not None else 0) + (int(p2) if p2 is not None else 0)
        out_eid.append(int(h0e[i]))
        out_fix.append(fix0)
        if n[i] >= 2 and h1e[i] >= 0:
            # head row 1: local == own + row0; needs p1 only
            out_eid.append(int(h1e[i]))
            out_fix.append(int(h1l[i]) + (int(p1) if p1 is not None else 0))
        # advance the carried last-two buffer
        if n[i] >= 2:
            p2, p1 = int(t2[i]), int(t1[i])
        else:
            p2, p1 = p1, int(t1[i])
    return pa.table(
        {
            "r_eid": pa.array(out_eid, type=pa.int64()),
            "fixed": pa.array(out_fix, type=pa.int64()),
        }
    )


def q_rolling_sum_w3(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    cols = ["event_id", "user_id", "ts", "value"]
    rows = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)
        .sort(["user_id", "ts", "event_id"])
        .map_batches(_roll_local, batch_format="pyarrow")
        .materialize()  # consumed twice: stream side + boundary scan
    )
    repairs = _scrub_empties(
        rows.map_batches(_roll_boundaries, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_roll_repair, batch_format="pyarrow")
    )
    joined = rows.join(
        repairs, join_type="left_outer", num_partitions=8, on=("event_id",), right_on=("r_eid",)
    )

    def finish(batch: pa.Table) -> pa.Table:
        local = batch.column("local").to_numpy(zero_copy_only=False)
        fixed = batch.column("fixed").to_numpy(zero_copy_only=False)
        rank = batch.column("rank").to_numpy(zero_copy_only=False)
        out = np.where(rank < ROLL_W, fixed, local).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "roll3": pa.array(out, type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_ROLLING_SUM_W3 = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3
FROM events
"""


# ---------------------------------------------------------------------------
# day-over-day audience churn: Jaccard of consecutive daily user sets
# ---------------------------------------------------------------------------
#
# The retention-adjacent set-overlap report: for every day d with a
# successor day d+1 in the data, |A_d ∩ A_{d+1}| / |A_d ∪ A_{d+1}|
# over distinct active-user sets.  The intersection NEVER joins two
# day-sized sets: after the distinct-(day, user) shrink (one native
# groupby over per-batch pre-distinct pairs, growth_accounting's
# physics) each USER's sorted day list yields its consecutive-day hits
# vectorized, so the exchange is user-cardinality and the per-day
# numerator is one slim Count.  Final assembly folds #days rows on the
# driver (calendar-bounded by definition).

def q_day_churn(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_pairs(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = us // DAY_US
        # packed-domain invariant: the (day, user) composite decodes with
        # // and %, which is only bijective while 0 <= uid < the modulus
        if len(uid):
            assert 0 <= uid.min() and uid.max() < 1_000_000_007, (
                "day_churn packing requires 0 <= user_id < 1_000_000_007; "
                "use a two-column distinct for wider id domains"
            )
        key = np.unique(day * 1_000_000_007 + uid)
        return pa.table(
            {
                "day": pa.array(key // 1_000_000_007, type=pa.int64()),
                "user_id": pa.array(key % 1_000_000_007, type=pa.int64()),
            }
        )

    du = (
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["day", "user_id"])
        .materialize()  # consumed twice (per-day sizes + per-user day runs)
    )
    sizes = du.groupby("day").aggregate(Count(alias_name="n")).take_all()
    # per-user consecutive-day hits: vectorized diff over the sorted
    # distinct day list; emit the EARLIER day of each adjacent pair
    def consec(g: pa.Table) -> pa.Table:
        d = np.sort(g.column("day").to_numpy(zero_copy_only=False))
        hit = d[:-1][np.diff(d) == 1] if len(d) > 1 else np.zeros(0, np.int64)
        return pa.table({"day": pa.array(hit, type=pa.int64())})

    inter = (
        du.groupby("user_id")
        .map_groups(consec, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="inter"))
        .take_all()  # #days-with-successor rows — calendar-bounded
    )
    n_by_day = {int(r["day"]): int(r["n"]) for r in sizes}
    i_by_day = {int(r["day"]): int(r["inter"]) for r in inter}
    days = sorted(d for d in n_by_day if d + 1 in n_by_day)
    out_d, out_n, out_m, out_i, out_j = [], [], [], [], []
    for d in days:
        na, nb = n_by_day[d], n_by_day[d + 1]
        ix = i_by_day.get(d, 0)
        out_d.append(d)
        out_n.append(na)
        out_m.append(nb)
        out_i.append(ix)
        out_j.append(float(ix) / float(na + nb - ix))
    return pa.table(
        {
            "day": pa.array(out_d, type=pa.int64()),
            "n_day": pa.array(out_n, type=pa.int64()),
            "n_next": pa.array(out_m, type=pa.int64()),
            "inter": pa.array(out_i, type=pa.int64()),
            "jaccard": pa.array(out_j, type=pa.float64()),
        }
    )


SQL_DAY_CHURN = f"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id FROM events),
s AS (SELECT day, COUNT(*) AS n FROM du GROUP BY day),
i AS (
  SELECT a.day AS day, COUNT(*) AS inter
  FROM du a JOIN du b ON a.user_id = b.user_id AND b.day = a.day + 1
  GROUP BY a.day)
SELECT CAST(s.day AS BIGINT) AS day,
       CAST(s.n AS BIGINT) AS n_day,
       CAST(s2.n AS BIGINT) AS n_next,
       CAST(COALESCE(i.inter, 0) AS BIGINT) AS inter,
       CAST(COALESCE(i.inter, 0) AS DOUBLE)
         / CAST(s.n + s2.n - COALESCE(i.inter, 0) AS DOUBLE) AS jaccard
FROM s JOIN s s2 ON s2.day = s.day + 1
LEFT JOIN i ON i.day = s.day
"""


# ---------------------------------------------------------------------------
# nearest-event join: each purchase matched to its NEAREST click (±15 min)
# ---------------------------------------------------------------------------
#
# The tolerance variant of the as-of family (asof_last_click is LOCF =
# backward-only): every purchase joins the same user's temporally
# nearest click within NEAREST_W_US on either side, ties to the earlier
# click then the smaller event_id, NULL when no click lands in the
# band.  Physically identical to attribution: ONE user-keyed shuffle,
# clicks sorted once per group, every purchase answered by a two-sided
# searchsorted probe — never the purchases x clicks pair blowup the
# oracle spells.  Exact integer microseconds end to end.

NEAREST_W_US = 900_000_000  # 15 minutes


def q_nearest_click(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr="event_type in ['click', 'purchase']")

    def fold(group: pa.Table) -> pa.Table:
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        ck = et == "click"
        cts = np.sort(us[ck])
        pm = et == "purchase"
        pts, peid = us[pm], eid[pm]
        n = len(pts)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "event_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.int64()).cast(pa.timestamp("us")),
                    "click_ts": pa.array([], type=pa.int64()).cast(pa.timestamp("us")),
                    "delta_us": pa.array([], type=pa.int64()),
                }
            )
        click_ts = np.zeros(n, dtype=np.int64)
        has = np.zeros(n, dtype=bool)
        if len(cts):
            idx = np.searchsorted(cts, pts)  # first click with ts >= t
            li = np.clip(idx - 1, 0, len(cts) - 1)
            ri = np.clip(idx, 0, len(cts) - 1)
            ld = np.where(idx > 0, pts - cts[li], np.iinfo(np.int64).max)
            rd_ = np.where(idx < len(cts), cts[ri] - pts, np.iinfo(np.int64).max)
            # nearer wins; tie -> earlier click (the LEFT one, since
            # equal distance means cts[li] < cts[ri] except when both
            # are the same timestamp, where left pick is also correct)
            use_left = ld <= rd_
            best = np.where(use_left, ld, rd_)
            win_ts = np.where(use_left, cts[li], cts[ri])
            has = best <= NEAREST_W_US
            # duplicate click timestamps: the winner is the FIRST click
            # at win_ts in (ts, event_id) order -> min event_id for ties
            click_ts = win_ts
        uid = group.column("user_id").slice(0, 1).to_numpy(zero_copy_only=False).repeat(n)
        delta = np.where(has, click_ts - pts, 0)
        ct = pa.array(np.where(has, click_ts, 0), type=pa.int64()).cast(pa.timestamp("us"))
        mask = pa.array(~has)
        import pyarrow.compute as pc

        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "event_id": pa.array(peid, type=pa.int64()),
                "ts": pa.array(pts, type=pa.int64()).cast(pa.timestamp("us")),
                "click_ts": pc.if_else(mask, pa.nulls(n, pa.timestamp("us")), ct),
                "delta_us": pc.if_else(
                    mask, pa.nulls(n, pa.int64()), pa.array(delta, type=pa.int64())
                ),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_NEAREST_CLICK = f"""
WITH c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
cand AS (
  SELECT p.event_id, c.ts AS cts,
         abs(epoch_us(c.ts) - epoch_us(p.ts)) AS d,
         epoch_us(c.ts) - epoch_us(p.ts) AS sd
  FROM p JOIN c ON c.user_id = p.user_id
  WHERE abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {NEAREST_W_US}),
best AS (
  SELECT event_id, cts, sd FROM (
    SELECT event_id, cts, sd,
           ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY d, cts) AS rn
    FROM cand) WHERE rn = 1)
SELECT p.user_id, p.event_id, p.ts, best.cts AS click_ts,
       CAST(best.sd AS BIGINT) AS delta_us
FROM p LEFT JOIN best USING (event_id)
"""


# ---------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quartile codes per user
# ---------------------------------------------------------------------------
#
# The classic customer-mart rollup: per user, days since last event
# (relative to the corpus max day), event count, and spend cents; each
# dimension quartile-binned by BOUNDARY comparison (bucket = 1 +
# #quantile_disc boundaries strictly below the value — deterministic
# under ties, unlike NTILE), composed into a 3-digit segment code.
# Scale shape: one native (Max, Count, Sum) per-user aggregate shuffle
# builds the user mart, WHICH STAYS DISTRIBUTED end to end; one slim
# map_batches pass over it emits per-batch (dim, value) -> count
# partials for all three dimensions at once, and a single
# groupby((dim, value)) Sum shuffle shrinks those to the DISTINCT-VALUE
# domains (days and counts are bounded; money is binned in whole
# dollars so its domain is bounded by max-spend-per-user, the per-key
# contract — never by user count).  The driver folds only those
# domain-bounded count rows into 9 boundary ints + the global max day,
# and the final bin assign is a broadcast-scalar vectorized comparison
# in map_batches over the distributed mart.

RFM_QS = (0.25, 0.5, 0.75)


def _rfm_boundaries(vals: np.ndarray, cnts: np.ndarray) -> list[int]:
    order = np.argsort(vals, kind="stable")
    v, c = vals[order], cnts[order]
    cum = np.cumsum(c)
    total = int(cum[-1])
    out = []
    for q in RFM_QS:
        idx = max(0, int(np.ceil(q * total)) - 1)
        out.append(int(v[np.searchsorted(cum, idx + 1)]))
    return out


def q_rfm_segments(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    def pre(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pa.array(us // DAY_US, type=pa.int64()),
                "cents": pa.array(c, type=pa.int64()),
            }
        )

    u = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max(on="day", alias_name="last_day"),
            Count(alias_name="f"),
            Sum(on="cents", alias_name="m_cents"),
        )
        .materialize()  # user mart, consumed by the boundary fold + the bin pass
    )

    # one slim pass emits (dim, value) -> count partials for all three
    # dimensions (dim 0 keys last_day so the calendar max rides along;
    # dim 1 keys f; dim 2 keys whole-dollar spend) — per-batch distinct,
    # so the single shuffle below moves only domain-bounded rows, never
    # the user dimension.
    def dim_partials(batch: pa.Table) -> pa.Table:
        ld = batch.column("last_day").to_numpy(zero_copy_only=False)
        fv = batch.column("f").to_numpy(zero_copy_only=False)
        md = batch.column("m_cents").to_numpy(zero_copy_only=False) // 100
        dims, vals, cnts = [], [], []
        for d, arr in ((0, ld), (1, fv), (2, md)):
            v, c = np.unique(arr, return_counts=True)
            dims.append(np.full(len(v), d, dtype=np.int64))
            vals.append(v.astype(np.int64))
            cnts.append(c.astype(np.int64))
        return pa.table(
            {
                "dim": pa.array(np.concatenate(dims), type=pa.int64()),
                "v": pa.array(np.concatenate(vals), type=pa.int64()),
                "c": pa.array(np.concatenate(cnts), type=pa.int64()),
            }
        )

    dom = (
        u.map_batches(dim_partials, batch_format="pyarrow")
        .groupby(["dim", "v"])
        .aggregate(Sum(on="c", alias_name="c"))
        .take_all()  # #distinct values across 3 bounded domains — driver-small
    )

    def fold(d: int, xform=lambda v: v) -> list[int]:
        vc = {}
        for r in dom:
            if r["dim"] == d:
                vc[xform(int(r["v"]))] = vc.get(xform(int(r["v"])), 0) + int(r["c"])
        v = np.array(sorted(vc), dtype=np.int64)
        c = np.array([vc[k] for k in sorted(vc)], dtype=np.int64)
        return _rfm_boundaries(v, c)

    gmax = max(int(r["v"]) for r in dom if r["dim"] == 0)
    rb = fold(0, lambda v: gmax - v)  # recency domain = gmax - last_day
    fb = fold(1)
    mb = fold(2)
    bref = ray.put((gmax, np.array(rb + fb + mb, dtype=np.int64)))

    def assign(batch: pa.Table) -> pa.Table:
        g, b = ray.get(bref)

        def binit(arr: np.ndarray, o: int) -> np.ndarray:
            return 1 + (arr > b[o]).astype(np.int64) + (arr > b[o + 1]) + (arr > b[o + 2])

        ld = batch.column("last_day").to_numpy(zero_copy_only=False)
        fv = batch.column("f").to_numpy(zero_copy_only=False)
        mc = batch.column("m_cents").to_numpy(zero_copy_only=False)
        r_days = g - ld
        r_bin, f_bin, m_bin = binit(r_days, 0), binit(fv, 3), binit(mc // 100, 6)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "r_days": pa.array(r_days, type=pa.int64()),
                "f": pa.array(fv, type=pa.int64()),
                "m_cents": pa.array(mc, type=pa.int64()),
                "r_bin": pa.array(r_bin, type=pa.int64()),
                "f_bin": pa.array(f_bin, type=pa.int64()),
                "m_bin": pa.array(m_bin, type=pa.int64()),
                "rfm_code": pa.array(100 * r_bin + 10 * f_bin + m_bin, type=pa.int64()),
            }
        )

    return u.map_batches(assign, batch_format="pyarrow")


SQL_RFM_SEGMENTS = f"""
WITH u AS (
  SELECT user_id,
         MAX(epoch_us(ts) // {DAY_US}) AS last_day,
         COUNT(*) AS f,
         SUM(CAST(floor(value * 100.0) AS BIGINT)) AS m_cents
  FROM events GROUP BY user_id),
g AS (SELECT MAX(last_day) AS gmax FROM u),
d AS (
  SELECT user_id, gmax - last_day AS r_days, f, m_cents, m_cents // 100 AS m_dollars
  FROM u, g),
b AS (
  SELECT quantile_disc(r_days, 0.25) AS r1, quantile_disc(r_days, 0.5) AS r2,
         quantile_disc(r_days, 0.75) AS r3,
         quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
         quantile_disc(f, 0.75) AS f3,
         quantile_disc(m_dollars, 0.25) AS m1, quantile_disc(m_dollars, 0.5) AS m2,
         quantile_disc(m_dollars, 0.75) AS m3
  FROM d)
SELECT user_id,
       CAST(r_days AS BIGINT) AS r_days,
       CAST(f AS BIGINT) AS f,
       CAST(m_cents AS BIGINT) AS m_cents,
       CAST(1 + CAST(r_days > r1 AS INT) + CAST(r_days > r2 AS INT)
              + CAST(r_days > r3 AS INT) AS BIGINT) AS r_bin,
       CAST(1 + CAST(f > f1 AS INT) + CAST(f > f2 AS INT)
              + CAST(f > f3 AS INT) AS BIGINT) AS f_bin,
       CAST(1 + CAST(m_dollars > m1 AS INT) + CAST(m_dollars > m2 AS INT)
              + CAST(m_dollars > m3 AS INT) AS BIGINT) AS m_bin,
       CAST(100 * (1 + CAST(r_days > r1 AS INT) + CAST(r_days > r2 AS INT)
                     + CAST(r_days > r3 AS INT))
           + 10 * (1 + CAST(f > f1 AS INT) + CAST(f > f2 AS INT)
                     + CAST(f > f3 AS INT))
           + (1 + CAST(m_dollars > m1 AS INT) + CAST(m_dollars > m2 AS INT)
                + CAST(m_dollars > m3 AS INT)) AS BIGINT) AS rfm_code
FROM d, b
"""


# ---------------------------------------------------------------------------
# week-over-week change: LAG over an aggregated weekly series
# ---------------------------------------------------------------------------
#
# The two-level mart shape (aggregate first, window over the TINY
# result): weekly revenue cents per event_type, each row carrying its
# delta vs the type's previous REALIZED week (LAG over existing rows,
# not the calendar).  The window never touches the event stream — one
# native (type, week) Sum shuffle shrinks to vocabulary x weeks rows,
# and the per-type LAG is a vectorized fold over that series.

def q_wow_change(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "week": pa.array(us // (7 * DAY_US), type=pa.int64()),
                "cents": pa.array(c, type=pa.int64()),
            }
        )

    weekly = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby(["event_type", "week"])
        .aggregate(Sum(on="cents", alias_name="cents"))
    )

    def lag_fold(g: pa.Table) -> pa.Table:
        wk = g.column("week").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(wk, kind="stable")
        wk, c = wk[order], c[order]
        delta = np.empty(len(c), dtype=np.float64)
        delta[0] = np.nan
        if len(c) > 1:
            delta[1:] = (c[1:] - c[:-1]).astype(np.float64)
        arr = pa.array(delta, type=pa.float64())
        import pyarrow.compute as pc

        return pa.table(
            {
                "event_type": pa.concat_arrays(
                    [g.column("event_type").slice(0, 1).combine_chunks()] * len(c)
                ),
                "week": pa.array(wk, type=pa.int64()),
                "cents": pa.array(c, type=pa.int64()),
                "wow_delta": pc.cast(
                    pc.if_else(pc.is_nan(arr), pa.nulls(len(c), pa.float64()), arr),
                    pa.int64(),
                ),
            }
        )

    return weekly.groupby("event_type").map_groups(lag_fold, batch_format="pyarrow")


SQL_WOW_CHANGE = f"""
WITH w AS (
  SELECT event_type, epoch_us(ts) // {7 * DAY_US} AS week,
         SUM(CAST(floor(value * 100.0) AS BIGINT)) AS cents
  FROM events GROUP BY event_type, week)
SELECT event_type, CAST(week AS BIGINT) AS week, CAST(cents AS BIGINT) AS cents,
       CAST(cents - LAG(cents) OVER (PARTITION BY event_type ORDER BY week) AS BIGINT)
         AS wow_delta
FROM w
"""


# ---------------------------------------------------------------------------
# SCD2 history build: validity intervals from a change stream
# ---------------------------------------------------------------------------
#
# The slowly-changing-dimension shape every warehouse load runs: per
# user, collapse the event_type stream (ordered by ts, event_id) into
# state intervals — a new interval opens whenever the state CHANGES,
# carries valid_from = the opening event's ts, and closes at the next
# interval's valid_from (NULL while current).  Gaps-and-islands with
# interval-cardinality output; one user-keyed shuffle, vectorized
# change detection per group (the per-key contract of user_journey).

def q_scd2_intervals(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def fold(group: pa.Table) -> pa.Table:
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us))
        us, et = us[order], et[order]
        new = np.ones(len(us), dtype=bool)
        new[1:] = et[1:] != et[:-1]
        st = np.nonzero(new)[0]
        vf = us[st]
        vt = np.concatenate([vf[1:], [0]])
        k = len(st)
        uid = group.column("user_id").slice(0, 1).to_numpy(zero_copy_only=False).repeat(k)
        vt_arr = pa.array(vt, type=pa.int64()).cast(pa.timestamp("us"))
        open_mask = pa.array(np.arange(k) == k - 1)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "state": pa.array(et[st].tolist(), type=pa.string()),
                "valid_from": pa.array(vf, type=pa.int64()).cast(pa.timestamp("us")),
                "valid_to": pc.if_else(open_mask, pa.nulls(k, pa.timestamp("us")), vt_arr),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_SCD2_INTERVALS = """
WITH o AS (
  SELECT user_id, event_type AS state, ts, event_id,
         LAG(event_type) OVER w AS prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, state, ts, event_id FROM o
  WHERE prev IS NULL OR state != prev)
SELECT user_id, state, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM s
"""


# ---------------------------------------------------------------------------
# PERCENT_RANK / CUME_DIST: distribution position without a global sort
# ---------------------------------------------------------------------------
#
# The remaining ANSI distribution windows, on global_rank's histogram
# physics: one per-value Count shuffle over the bounded n_chars domain,
# a driver prefix fold, a broadcast lookup — the table never sorts.
# percent_rank = (rank-1)/(N-1) and cume_dist = rank_le/N are each ONE
# exact int division, so the doubles hash-match DuckDB.

def q_percent_rank(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .take_all()  # value-domain-bounded, driver-small
    )
    vals = np.array([r["n_chars"] for r in counts], dtype=np.int64)
    ns = np.array([r["n"] for r in counts], dtype=np.int64)
    order = np.argsort(vals)
    vals, ns = vals[order], ns[order]
    total = int(ns.sum())
    rank0 = np.concatenate(([0], np.cumsum(ns)[:-1])) + 1  # RANK of each value
    le = np.cumsum(ns)  # rows <= value
    ref = ray.put((vals, rank0, le, total))

    def assign(batch: pa.Table) -> pa.Table:
        v, r, cle, n_all = ray.get(ref)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(v, x)
        # ANSI PERCENT_RANK is defined as 0 for a single-row partition;
        # guard the N==1 division instead of emitting inf/nan.
        pr = (
            (r[idx] - 1).astype(np.float64) / float(n_all - 1)
            if n_all > 1
            else np.zeros(len(x), dtype=np.float64)
        )
        cd = cle[idx].astype(np.float64) / float(n_all)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "pct_rank": pa.array(pr, type=pa.float64()),
                "cume_dist": pa.array(cd, type=pa.float64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return ds.map_batches(assign, batch_format="pyarrow")


SQL_PERCENT_RANK = """
SELECT doc_id, n_chars,
       PERCENT_RANK() OVER (ORDER BY n_chars) AS pct_rank,
       CUME_DIST() OVER (ORDER BY n_chars) AS cume_dist
FROM documents
"""


# ---------------------------------------------------------------------------
# weekday revenue: calendar-dimension rollup
# ---------------------------------------------------------------------------
#
# The date-dimension enrichment every mart runs, kept oracle-exact with
# pure integer calendar math: weekday = (epoch_day + 4) % 7 (1970-01-01
# was a Thursday; 0 = Monday under this offset... the CODE is what is
# gated, and both sides use the identical formula so no locale/DOW
# convention can diverge).  One native (weekday, type) Sum shuffle of
# per-batch partials — a 7 x vocabulary result.

def q_weekday_revenue(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def pre(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        return pa.table(
            {
                "weekday": pa.array((us // DAY_US + 4) % 7, type=pa.int64()),
                "event_type": batch.column("event_type"),
                "cents": pa.array(c, type=pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby(["weekday", "event_type"])
        .aggregate(Sum(on="cents", alias_name="cents"), Count(alias_name="n"))
    )


SQL_WEEKDAY_REVENUE = f"""
SELECT (epoch_us(ts) // {DAY_US} + 4) % 7 AS weekday, event_type,
       CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY weekday, event_type
"""


# ---------------------------------------------------------------------------
# GROUP BY CUBE: the full grouping-set lattice in one scan
# ---------------------------------------------------------------------------
#
# qty_rollup's physics extended to CUBE(l_returnflag, l_linestatus):
# FOUR grouping sets per batch (leaf, each one-dim subtotal, grand
# total) with the '(all)' sentinel; one slim groupby merges — the scan
# count stays 1 regardless of lattice size.

def q_qty_cube(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False).astype(object)
        ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False).astype(object)
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        out_rf: list[str] = []
        out_ls: list[str] = []
        out_q: list[int] = []
        out_n: list[int] = []
        for level_rf, level_ls in ((rf, ls), (rf, None), (None, ls), (None, None)):
            a = level_rf if level_rf is not None else np.full(len(rf), ROLL_ALL, dtype=object)
            b = level_ls if level_ls is not None else np.full(len(ls), ROLL_ALL, dtype=object)
            key = np.char.add(np.char.add(a.astype(str), "|"), b.astype(str))
            keys, inv = np.unique(key, return_inverse=True)
            acc = np.zeros(len(keys), dtype=np.int64)
            np.add.at(acc, inv, qty)
            n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
            for k, q, c in zip(keys.tolist(), acc.tolist(), n.tolist()):
                p = k.split("|")
                out_rf.append(p[0])
                out_ls.append(p[1])
                out_q.append(q)
                out_n.append(c)
        return pa.table(
            {
                "l_returnflag": pa.array(out_rf, type=pa.string()),
                "l_linestatus": pa.array(out_ls, type=pa.string()),
                "sum_qty_cents": pa.array(out_q, type=pa.int64()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="sum_qty_cents", alias_name="sum_qty_cents"),
            Sum(on="n", alias_name="n"),
        )
    )


SQL_QTY_CUBE = f"""
SELECT COALESCE(l_returnflag, '{ROLL_ALL}') AS l_returnflag,
       COALESCE(l_linestatus, '{ROLL_ALL}') AS l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# activity heatmap: (hour-of-day x value-band) dashboard grid
# ---------------------------------------------------------------------------
#
# The canonical dashboard heat grid: event counts and exact cents per
# (hour-of-day, 5000-cent value band) cell — all integer math
# (hour = (epoch_us // 3600e6) % 24, band = cents // 5000), one
# per-batch partial + native Sum shuffle of grid-bounded rows.

HEAT_BAND_C = 5_000  # 50-currency-unit value bands

_HOUR_US_HM = 3_600_000_000


def q_heatmap_counts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        hour = (us // _HOUR_US_HM) % 24
        band = c // HEAT_BAND_C
        # packed-domain invariant: hour*1000+band decodes only while
        # 0 <= band < 1000 (values up to HEAT_BAND_C*1000 cents)
        if len(band):
            assert 0 <= band.min() and band.max() < 1_000, (
                "heatmap packing requires 0 <= value-band < 1000; widen "
                "HEAT_BAND_C or use a two-column distinct"
            )
        key = hour * 1_000 + band
        keys, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        s = np.zeros(len(keys), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table(
            {
                "hour": pa.array(keys // 1_000, type=pa.int64()),
                "band": pa.array(keys % 1_000, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "cents": pa.array(s, type=pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["hour", "band"])
        .aggregate(Sum(on="n", alias_name="n"), Sum(on="cents", alias_name="cents"))
    )


SQL_HEATMAP_COUNTS = f"""
SELECT (epoch_us(ts) // {_HOUR_US_HM}) % 24 AS hour,
       CAST(floor(value * 100.0) AS BIGINT) // {HEAT_BAND_C} AS band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY hour, band
"""


# ---------------------------------------------------------------------------
# time to first purchase: funnel latency per user
# ---------------------------------------------------------------------------
#
# The activation-latency KPI: microseconds from each user's FIRST event
# to their FIRST purchase (NULL for users who never purchased) — two
# native Min aggregates over one pruned scan (the purchase side
# filtered per batch), aligned by a left join; integer microseconds end
# to end.

def q_time_to_purchase(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Min

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).materialize()  # consumed twice (all-events min + purchase min)
    first = ds.groupby("user_id").aggregate(Min(on="ts", alias_name="first_ts"))

    def purchases(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("event_type"), "purchase")
        f = batch.filter(keep)
        return pa.table({"p_uid": f.column("user_id"), "ts": f.column("ts")})

    fp = (
        ds.map_batches(purchases, batch_format="pyarrow")
        .groupby("p_uid")
        .aggregate(Min(on="ts", alias_name="first_purchase"))
    )
    joined = _scrub_empties(first, 4).join(
        _scrub_empties(fp, 4), join_type="left_outer", num_partitions=4,
        on=("user_id",), right_on=("p_uid",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        ft = batch.column("first_ts").cast(pa.timestamp("us")).cast(pa.int64())
        pt = batch.column("first_purchase").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "first_ts": batch.column("first_ts").cast(pa.timestamp("us")),
                "first_purchase": batch.column("first_purchase").cast(pa.timestamp("us")),
                "latency_us": pc.subtract(pt, ft),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_TIME_TO_PURCHASE = """
WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
p AS (SELECT user_id, MIN(ts) AS first_purchase FROM events
      WHERE event_type = 'purchase' GROUP BY user_id)
SELECT f.user_id, f.first_ts, p.first_purchase,
       CAST(epoch_us(p.first_purchase) - epoch_us(f.first_ts) AS BIGINT) AS latency_us
FROM f LEFT JOIN p USING (user_id)
"""


# ---------------------------------------------------------------------------
# DENSE_RANK (the remaining ANSI ranking window, sort-free)
# ---------------------------------------------------------------------------
#
# DENSE_RANK() over all documents by n_chars, on the same
# histogram-broadcast physics as global_rank / percent_rank: one
# per-value Count shuffle over the BOUNDED value domain, a driver
# prefix that numbers the distinct values 1..k, and a broadcast
# searchsorted assign — the table is never sorted or shuffled.

def q_dense_rank(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="n"))
        .take_all()  # value-domain-bounded (distinct lengths), driver-small
    )
    vals = np.sort(np.array([r["n_chars"] for r in counts], dtype=np.int64))
    ref = ray.put(vals)

    def assign(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "drnk": pa.array(np.searchsorted(v, x) + 1, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return ds.map_batches(assign, batch_format="pyarrow")


SQL_DENSE_RANK = """
SELECT doc_id, n_chars,
       CAST(DENSE_RANK() OVER (ORDER BY n_chars) AS BIGINT) AS drnk
FROM documents
"""


# ---------------------------------------------------------------------------
# open orders per day (interval stabbing via the sweep-line identity)
# ---------------------------------------------------------------------------
#
# "How many orders were open on each day" — the backlog/occupancy
# query (hotel nights, active sessions, WIP inventory) that naive
# engines answer with a days x orders range join.  Sweep-line instead:
# each order's lifetime [orderdate, max(l_shipdate)] emits TWO delta
# rows (+1 at start, -1 past end), one day-domain-bounded Sum shuffle
# merges them, and a calendar-bounded driver prefix turns deltas into
# occupancy — the O(N) identity replacing the O(N x D) join.  Orders
# with no lineitems have no close date and are excluded by the inner
# join (27 such rows at sf0.001; the oracle excludes them identically);
# the ~20% of synthetic orders whose last shipment PRECEDES the order
# date are normalized to the [least, greatest] span on both sides.

def q_open_orders_daily(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    def ship_partials(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        keys, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(keys), -(2**62), dtype=np.int64)
        np.maximum.at(mx, inv, day)
        return pa.table(
            {
                "o_orderkey": pa.array(keys, type=pa.int64()),
                "end_day": pa.array(mx, type=pa.int64()),
            }
        )

    ends = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])
        .map_batches(ship_partials, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Max(on="end_day", alias_name="end_day"))
    )
    starts = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    iv = _scrub_empties(ends, 8).join(
        _scrub_empties(starts, 8), join_type="inner", on=("o_orderkey",), num_partitions=8
    )

    def deltas(batch: pa.Table) -> pa.Table:
        s0 = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        e0 = batch.column("end_day").to_numpy(zero_copy_only=False).astype(np.int64)
        # the synthetic tables ship ~20% of orders BEFORE their order
        # date; the lifetime is the span between the two endpoints
        s = np.minimum(s0, e0)
        e = np.maximum(s0, e0)
        day = np.concatenate([s, e + 1])
        d = np.concatenate([np.ones(len(s), dtype=np.int64), -np.ones(len(e), dtype=np.int64)])
        keys, inv = np.unique(day, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, d)
        return pa.table(
            {
                "day": pa.array(keys, type=pa.int64()),
                "delta": pa.array(acc, type=pa.int64()),
            }
        )

    merged = (
        iv.map_batches(deltas, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum(on="delta", alias_name="delta"))
        .take_all()  # calendar-bounded: one row per distinct boundary day
    )
    import ray.data as rd2

    if not merged:
        return rd2.from_arrow(
            pa.table({"day": pa.array([], type=pa.int64()), "n_open": pa.array([], type=pa.int64())})
        )
    days = np.array([r["day"] for r in merged], dtype=np.int64)
    dl = np.array([r["delta"] for r in merged], dtype=np.int64)
    o = np.argsort(days)
    days, dl = days[o], dl[o]
    full = np.arange(days[0], days[-1])  # last boundary is end+1: occupancy 0 after
    occ = np.cumsum(dl)[np.searchsorted(days, full, side="right") - 1]
    return rd2.from_arrow(
        pa.table(
            {
                "day": pa.array(full, type=pa.int64()),
                "n_open": pa.array(occ, type=pa.int64()),
            }
        )
    )


SQL_OPEN_ORDERS_DAILY = """
WITH iv0 AS (
  SELECT o.o_orderkey,
         epoch_us(o.o_orderdate) // 86400000000 AS s0,
         MAX(epoch_us(l.l_shipdate) // 86400000000) AS e0
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
iv AS (
  SELECT o_orderkey, LEAST(s0, e0) AS s, GREATEST(s0, e0) AS e FROM iv0),
days AS (
  SELECT unnest(generate_series((SELECT MIN(s) FROM iv), (SELECT MAX(e) FROM iv))) AS day)
SELECT d.day, CAST(COUNT(i.o_orderkey) AS BIGINT) AS n_open
FROM days d LEFT JOIN iv i ON d.day BETWEEN i.s AND i.e
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# inter-event gap histogram (arrival-process audit)
# ---------------------------------------------------------------------------
#
# Distribution of the time between consecutive events per user, rolled
# up globally into minute buckets (capped at 60) — the arrival-process
# audit under rate-limiter sizing and bot detection.  Same per-user
# groupby + vectorized lexsort/diff physics as q_transitions, then a
# bucket-bounded (<= 61 rows) Sum shuffle.  Gaps are exact integer
# microsecond differences; ties in ts are ordered by event_id on both
# sides so the diff sequence is deterministic.

GAP_BUCKET_US = 60_000_000  # one minute
GAP_BUCKET_CAP = 60


def q_gap_hist(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def gaps(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t = ts[order]
        if len(t) < 2:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        gap = np.diff(t)
        b = np.minimum(gap // GAP_BUCKET_US, GAP_BUCKET_CAP)
        uk, n = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(uk, type=pa.int64()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum(on="n", alias_name="n"))
    )


SQL_GAP_HIST = f"""
WITH s AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT LEAST((epoch_us(ts) - epoch_us(prev)) // {GAP_BUCKET_US}, {GAP_BUCKET_CAP}) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY 1
"""
