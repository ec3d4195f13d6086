"""Graph analytics operators: PageRank over the customer-supplier
bipartite graph derived from orders x lineitem.

The iterative-join-aggregate family (the shape label propagation /
connected components / PageRank all share): a persisted edge Dataset,
a node-keyed rank Dataset, and per-iteration edge-rank joins + a
dst-keyed groupby.  Bit-reproducibility discipline: ranks are scaled
integers (PR_SCALE), the damping step is integer cross-multiplication
(85 * sum // 100), and every per-edge contribution is an int64 floor
division — numpy and DuckDB agree exactly, so the whole iterative
algorithm is value-hash gated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# PageRank (symmetric bipartite graph, PR_ITERS unrolled rounds)
# ---------------------------------------------------------------------------
#
# Nodes: customers (2 * custkey) and suppliers (2 * suppkey + 1) that
# co-occur on an order line; edges are the DISTINCT (cust, supp) pairs,
# emitted in both directions so the graph is symmetric and has no
# dangling nodes.  rank_0 = PR_SCALE for every node with an edge;
# rank_{t+1}(v) = BASE + 85 * SUM_{(u,v) in E} (rank_t(u) // deg(u)) // 100.
#
# Distributed shape (the 100-TB story): the edge list is built by ONE
# large orders-lineitem hash join + a distinct groupby, then
# materialized — it is the algorithm's working set, re-read every
# round (at 10^12 rows the alternative, re-running the build join per
# iteration, does strictly more work; the materialized edge set is
# O(|E|), not O(input)).  Each round is edge ⋈ rank (node-keyed hash
# join) -> per-edge int contribution -> dst groupby sum: rank state
# never leaves the cluster, and the driver holds only the loop counter.


PR_ITERS = 3
PR_SCALE = 1_000_000
PR_BASE = 15 * PR_SCALE // 100


def _build_edges(sf_dir: str):
    """DISTINCT symmetric (src, dst) edges + per-src degree, as one
    Dataset (src, dst, deg)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from .olap_queries import _scrub_empties

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    pairs = orders.join(
        line.rename_columns({"l_orderkey": "o_orderkey"}),
        join_type="inner",
        on=("o_orderkey",),
        num_partitions=8,
    )

    def both_dirs(batch: pa.Table) -> pa.Table:
        c = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([2 * c, 2 * s + 1])
        dst = np.concatenate([2 * s + 1, 2 * c])
        # per-batch pre-distinct: shrink the shuffle before the global dedup
        key = np.unique(src << np.int64(21) | dst)  # keys < 2^20 in this data
        return pa.table(
            {
                "src": pa.array(key >> np.int64(21), type=pa.int64()),
                "dst": pa.array(key & np.int64((1 << 21) - 1), type=pa.int64()),
            }
        )

    edges = (
        pairs.map_batches(both_dirs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .map_batches(lambda b: b.select(["src", "dst"]), batch_format="pyarrow")
    )
    deg = edges.groupby("src").aggregate(Count(alias_name="deg"))
    return _scrub_empties(edges, 8).join(
        _scrub_empties(deg, 4), join_type="inner", on=("src",), num_partitions=8
    )


def q_pagerank(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .olap_queries import _scrub_empties

    edges = _build_edges(sf_dir).materialize()  # the algorithm's working set

    # rank_0: every src node (symmetric graph => src set == node set)
    ranks = (
        edges.groupby("src")
        .count()
        .map_batches(lambda b: b.select(["src"]), batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "r", pa.array(np.full(b.num_rows, PR_SCALE, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        .rename_columns({"src": "node"})
    )

    def contrib(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy(zero_copy_only=False)
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch.column("dst"),
                "c": pa.array(r // d, type=pa.int64()),
            }
        )

    def damp(batch: pa.Table) -> pa.Table:
        s = batch.column("c").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch.column("node"),
                "r": pa.array(PR_BASE + 85 * s // 100, type=pa.int64()),
            }
        )

    for _ in range(PR_ITERS):
        joined = edges.join(
            _scrub_empties(ranks.rename_columns({"node": "src"}), 4),
            join_type="inner",
            on=("src",),
            num_partitions=8,
        )
        ranks = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum(on="c", alias_name="c"))
            .map_batches(damp, batch_format="pyarrow")
        )
    return ranks


def _sql_pagerank() -> str:
    parts = [
        f"""WITH e AS (
  SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  UNION
  SELECT DISTINCT 2 * l.l_suppkey + 1, 2 * o.o_custkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg)"""
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(f"""r{i} AS (
  SELECT e.dst AS node,
         {PR_BASE} + 85 * CAST(SUM(p.r // deg.d) AS BIGINT) // 100 AS r
  FROM e JOIN deg USING (src) JOIN r{i - 1} p ON p.node = e.src
  GROUP BY e.dst)""")
    parts.append(f"SELECT node, r FROM r{PR_ITERS}")
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]


SQL_PAGERANK = _sql_pagerank()


# ---------------------------------------------------------------------------
# triangle counting (per-node) with degree orientation
# ---------------------------------------------------------------------------
#
# The canonical distributed graph-pattern operator.  Undirected
# distinct edges are ORIENTED from the (degree, id)-smaller endpoint to
# the larger one; every triangle then has exactly one "apex" whose two
# out-edges form its wedge, so
#
#   triangles = (oriented ⋈ oriented on apex)   -- wedges
#               ⋈ oriented on (wedge tip pair)  -- closure
#
# counts each triangle once.  Degree orientation is the skew bound: a
# hub of degree d contributes wedges only through its LOW-degree
# endpoints, capping per-apex out-degree at O(sqrt(E)) and total wedge
# mass at O(E^1.5) regardless of hub size — the difference between a
# web-scale graph finishing and its hottest vertex exploding one task.
# The id-ordered SQL oracle counts the same triangle set (orientation
# choice never changes which triangles exist), so the degree-oriented
# plan is value-hash gated end to end.
#
# Graph synthesis: node u from event_id mod 240, node v from a
# quadratic residue mod the PRIME 241 — by CRT the (u, v) pairs
# sweep the full torus instead of a lattice coset, giving one
# connected, triangle-rich component that densifies with data.

TRI_V = 240


def tri_edge_nodes(eid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The ONE edge-synthesis formula (also embedded in SQL_TRI_EDGES_RAW
    and reused verbatim by the reference tests)."""
    u = eid % TRI_V
    r = eid % (TRI_V + 1)  # 241 is prime: CRT-independent of eid % 240
    v = (r * r + 7) % (TRI_V + 1) % TRI_V
    return u, v


# the SQL spelling of tri_edge_nodes, shared by every graph oracle
SQL_TRI_EDGES_RAW = f"""raw AS (
  SELECT event_id % {TRI_V} AS u,
         ((event_id % {TRI_V + 1}) * (event_id % {TRI_V + 1}) + 7) % {TRI_V + 1} % {TRI_V} AS v
  FROM events)"""


def _tri_edges_batch(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    u, v = tri_edge_nodes(eid)
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    keep = a != b
    a, b = a[keep], b[keep]
    key = np.unique(a * TRI_V + b)  # per-batch pre-distinct
    return pa.table(
        {
            "a": pa.array(key // TRI_V, type=pa.int64()),
            "b": pa.array(key % TRI_V, type=pa.int64()),
        }
    )


def q_triangle_count(sf_dir: str):
    """Per-node triangle participation counts over the synthetic event
    graph: distinct-edge groupby -> endpoint-degree groupby -> degree
    orientation -> apex self-join (wedges) -> tip-pair closure join ->
    3-vertex fan-out + count groupby.  Every stage is a slim int64
    exchange; no stage materializes anything on the driver."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from .olap_queries import _scrub_empties

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    edges = (
        ds.map_batches(_tri_edges_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    )
    # the algorithm's working set: consumed by deg AND the orientation
    # join — materialize once so the scan+distinct shuffle runs once
    edges = _scrub_empties(edges, 8).materialize()

    def both_ends(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), type=pa.int64())})

    deg = (
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    deg = _scrub_empties(deg, 4).materialize()  # node-cardinality working set

    e1 = edges.join(
        deg.map_batches(lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        join_type="inner",
        on=("a",),
        num_partitions=8,
    )
    e2 = e1.join(
        deg.map_batches(lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        join_type="inner",
        on=("b",),
        num_partitions=8,
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        da = batch.column("da").to_numpy(zero_copy_only=False)
        db = batch.column("db").to_numpy(zero_copy_only=False)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "x": pa.array(np.where(fwd, a, b), type=pa.int64()),
                "y": pa.array(np.where(fwd, b, a), type=pa.int64()),
                "dy": pa.array(np.where(fwd, db, da), type=pa.int64()),
            }
        )

    oriented = _scrub_empties(e2.map_batches(orient, batch_format="pyarrow"), 8).materialize()

    wedges = oriented.join(
        oriented.map_batches(
            lambda t: t.rename_columns(["x", "y2", "dy2"]), batch_format="pyarrow"
        ),
        join_type="inner",
        on=("x",),
        num_partitions=8,
    )

    def tips(batch: pa.Table) -> pa.Table:
        y1 = batch.column("y").to_numpy(zero_copy_only=False)
        d1 = batch.column("dy").to_numpy(zero_copy_only=False)
        y2 = batch.column("y2").to_numpy(zero_copy_only=False)
        d2 = batch.column("dy2").to_numpy(zero_copy_only=False)
        keep = (d1 < d2) | ((d1 == d2) & (y1 < y2))  # one wedge per unordered tip pair
        return pa.table(
            {
                "x": batch.column("x").filter(pa.array(keep)),
                "y": pa.array(y1[keep], type=pa.int64()),
                "y2": pa.array(y2[keep], type=pa.int64()),
            }
        )

    closing = oriented.map_batches(
        lambda t: pa.table({"y": t.column("x"), "y2": t.column("y")}),
        batch_format="pyarrow",
    )
    tri = _scrub_empties(wedges.map_batches(tips, batch_format="pyarrow"), 8).join(
        _scrub_empties(closing, 8),
        join_type="inner",
        on=("y", "y2"),
        num_partitions=8,
    )

    def verts(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        z = batch.column("y2").to_numpy(zero_copy_only=False)
        node, cnt = np.unique(np.concatenate([x, y, z]), return_counts=True)
        return pa.table(
            {
                "node": pa.array(node, type=pa.int64()),
                "c": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        tri.map_batches(verts, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="c", alias_name="n_tri"))
    )


SQL_TRIANGLE_COUNT = f"""
WITH {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ed e1
  JOIN ed e2 ON e2.a = e1.b
  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
verts AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT node, COUNT(*) AS n_tri FROM verts GROUP BY node
"""


# ---------------------------------------------------------------------------
# single-source BFS hop counts (iterative frontier relaxation)
# ---------------------------------------------------------------------------
#
# The traversal shape missing from the pagerank (fixed rounds) / CC
# (min-label) pair: per round the current distance table joins the
# symmetric edge list, candidates (dst, d+1) merge with a Min groupby,
# and the driver sees only a (count, sum) convergence checksum.
# Rounds = source eccentricity; every exchange is node-cardinality
# slim rows.  The DuckDB oracle is the textbook bounded recursive CTE.

BFS_SOURCE = 0
BFS_MAX_ROUNDS = 64


def _tri_edges_both(sf_dir: str):
    """Symmetric directed edge list of the triangle_count graph."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    edges = (
        ds.map_batches(_tri_edges_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def q_bfs_hops(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Min

    from .olap_queries import _scrub_empties

    edges = _scrub_empties(_tri_edges_both(sf_dir), 8).materialize()
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([BFS_SOURCE], type=pa.int64()),
                "hops": pa.array([0], type=pa.int64()),
            }
        )
    )

    def relax(batch: pa.Table) -> pa.Table:
        h = batch.column("hops").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch.column("dst"),
                "hops": pa.array(h + 1, type=pa.int64()),
            }
        )

    import pyarrow.compute as pc

    frontier = labels  # round-r frontier = nodes first reached at hops r
    for rnd in range(BFS_MAX_ROUNDS):
        cand = edges.join(
            _scrub_empties(frontier.rename_columns({"node": "src"}), 4),
            join_type="inner",
            on=("src",),
            num_partitions=8,
        ).map_batches(relax, batch_format="pyarrow")
        labels = (
            labels.union(_scrub_empties(cand, 8))
            .groupby("node")
            .aggregate(Min(on="hops", alias_name="hops"))
            .repartition(8)
            .materialize()
        )
        # min-merge never changes a settled node, so the new frontier is
        # exactly the nodes at hops == rnd+1: each edge is re-scanned
        # only when its src first enters the reached set (O(E) total
        # join mass over the whole traversal, not O(ecc x E))
        frontier = labels.map_batches(
            lambda b, r=rnd + 1: b.filter(pc.equal(b.column("hops"), r)),
            batch_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:  # nothing newly reached: fixpoint
            break
    return labels


def _sql_bfs_hops() -> str:
    return f"""
WITH RECURSIVE {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst FROM raw WHERE u <> v
  UNION
  SELECT DISTINCT greatest(u, v), least(u, v) FROM raw WHERE u <> v),
r(node, hops) AS (
  SELECT CAST({BFS_SOURCE} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, r.hops + 1
  FROM r JOIN ed e ON e.src = r.node
  WHERE r.hops < {BFS_MAX_ROUNDS})
SELECT node, MIN(hops) AS hops FROM r GROUP BY node
"""


SQL_BFS_HOPS = _sql_bfs_hops()


# ---------------------------------------------------------------------------
# k-core decomposition (fixed unrolled peeling rounds)
# ---------------------------------------------------------------------------
#
# The iterative-FILTER family (vs pagerank's iterative re-weighting and
# bfs's frontier growth): each round keeps only nodes whose degree
# WITHIN the surviving subgraph is >= K, and removals cascade.  Like
# kmeans/pagerank the round count is FIXED (KCORE_ROUNDS, chosen past
# the observed fixpoint and idempotent once converged), which makes the
# whole peel SQL-expressible as chained CTEs and value-hash gated.
# Per round: two node-keyed semi-joins restrict the edge list, one
# groupby counts degrees — node/edge-cardinality exchanges only.

KCORE_K = 6
KCORE_ROUNDS = 10


def q_kcore(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    from .olap_queries import _scrub_empties

    edges = _scrub_empties(_tri_edges_both(sf_dir), 4).materialize()

    alive = (
        edges.groupby("src")
        .count()
        .map_batches(lambda b: pa.table({"node": b.column("src")}), batch_format="pyarrow")
        .repartition(2)
        .materialize()
    )
    n_alive = alive.count()
    deg = None
    for _ in range(KCORE_ROUNDS):
        e2 = edges.join(
            _scrub_empties(alive.rename_columns({"node": "dst"}), 2),
            join_type="inner",
            on=("dst",),
            num_partitions=4,
        )
        # deg over alive-neighbor counts; the semi-join below stops dead
        # nodes from resurrecting (peeling is monotone)
        deg = (
            e2.groupby("src")
            .aggregate(Count(alias_name="deg"))
            .map_batches(
                lambda b: b.filter(pc.greater_equal(b.column("deg"), KCORE_K)),
                batch_format="pyarrow",
            )
            .join(
                _scrub_empties(alive.rename_columns({"node": "src"}), 2),
                join_type="inner",
                on=("src",),
                num_partitions=2,
            )
            .repartition(2)
            .materialize()
        )
        n_new = deg.count()
        alive = deg.map_batches(
            lambda b: pa.table({"node": b.column("src")}), batch_format="pyarrow"
        ).materialize()
        if n_new == n_alive:  # fixpoint: SQL's remaining rounds are idempotent
            break
        n_alive = n_new
    return deg.map_batches(
        lambda b: pa.table({"node": b.column("src"), "deg": b.column("deg")}),
        batch_format="pyarrow",
    )


def _sql_kcore() -> str:
    lines = [
        f"""WITH {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst FROM raw WHERE u <> v
  UNION
  SELECT DISTINCT greatest(u, v), least(u, v) FROM raw WHERE u <> v),
s0 AS (SELECT DISTINCT src AS node FROM ed)"""
    ]
    for i in range(1, KCORE_ROUNDS):
        lines.append(
            f"""s{i} AS (
  SELECT e.src AS node FROM ed e
  JOIN s{i - 1} a ON e.src = a.node
  JOIN s{i - 1} b ON e.dst = b.node
  GROUP BY e.src HAVING COUNT(*) >= {KCORE_K})"""
        )
    last = KCORE_ROUNDS - 1
    final = f"""SELECT e.src AS node, COUNT(*) AS deg FROM ed e
JOIN s{last} a ON e.src = a.node
JOIN s{last} b ON e.dst = b.node
GROUP BY e.src HAVING COUNT(*) >= {KCORE_K}"""
    return ",\n".join(lines) + "\n" + final


SQL_KCORE = _sql_kcore()


# ---------------------------------------------------------------------------
# single-source shortest paths (weighted Bellman-Ford, improved-frontier)
# ---------------------------------------------------------------------------
#
# The weighted-relaxation family member (vs bfs_hops' unit weights):
# edge weight is a CRT-decorrelated deterministic function of the
# canonical endpoint pair, so the oracle can re-derive it in SQL.  The
# Ray plan relaxes only the IMPROVED frontier each round (a settled
# node whose dist did not change re-scans no edges), giving O(E x
# improvement-rounds-touching-each-node) join mass instead of
# O(rounds x E); at 100 TB the per-round exchange is edge-cardinality
# bounded and the dist table is node-cardinality bounded.  The SQL
# oracle enumerates every path of total weight <= SSSP_DIST_CAP through
# a recursive CTE with row dedup — finite because (node, dist) pairs
# are bounded — and takes the per-node MIN; the Ray side asserts the
# cap was generous (max dist + max weight < cap), so both sides see
# every shortest path.

SSSP_SOURCE = 0
SSSP_MAX_ROUNDS = 64
SSSP_DIST_CAP = 96
SSSP_WMOD = 9  # weights 1..9


def edge_weight(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic symmetric weight of the canonical edge (a < b)."""
    return 1 + (7 * a + 13 * b) % SSSP_WMOD


def _tri_edges_both_weighted(sf_dir: str):
    """Symmetric directed weighted edge list of the triangle graph."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    edges = (
        ds.map_batches(_tri_edges_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        w = edge_weight(a, b)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
                "w": pa.array(np.concatenate([w, w]), type=pa.int64()),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def q_sssp_dist(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Min

    from .olap_queries import _scrub_empties

    edges = _scrub_empties(_tri_edges_both_weighted(sf_dir), 8).materialize()
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array([SSSP_SOURCE], type=pa.int64()),
                "dist": pa.array([0], type=pa.int64()),
            }
        )
    ).materialize()

    def relax(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch.column("dst"),
                "dist": pa.array(d + w, type=pa.int64()),
            }
        )

    def improved_only(batch: pa.Table) -> pa.Table:
        # candidate best vs current label (left outer): keep strictly
        # better or first-touch rows — the next round's frontier
        new = batch.column("dist")
        old = batch.column("old")
        keep = pc.or_kleene(pc.is_null(old), pc.less(new, old))
        return batch.filter(pc.fill_null(keep, True)).select(["node", "dist"])

    frontier = labels
    for _ in range(SSSP_MAX_ROUNDS):
        cand = (
            edges.join(
                _scrub_empties(frontier.rename_columns({"node": "src"}), 4),
                join_type="inner",
                on=("src",),
                num_partitions=8,
            )
            .map_batches(relax, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min(on="dist", alias_name="dist"))
        )
        frontier = (
            _scrub_empties(cand, 8)
            .join(
                _scrub_empties(labels.rename_columns({"dist": "old"}), 8),
                join_type="left_outer",
                on=("node",),
                num_partitions=8,
            )
            .map_batches(improved_only, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )
        if frontier.count() == 0:  # no relaxation improved anything
            break
        labels = (
            labels.union(frontier)
            .groupby("node")
            .aggregate(Min(on="dist", alias_name="dist"))
            .repartition(8)
            .materialize()
        )

    def check_cap(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        if len(d) and int(d.max()) + SSSP_WMOD >= SSSP_DIST_CAP:
            raise ValueError("SSSP_DIST_CAP too tight: oracle path enumeration would clip")
        return batch

    return labels.map_batches(check_cap, batch_format="pyarrow")


def _sql_sssp() -> str:
    return f"""
WITH RECURSIVE {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst,
         1 + (7 * least(u, v) + 13 * greatest(u, v)) % {SSSP_WMOD} AS w
  FROM raw WHERE u <> v
  UNION
  SELECT DISTINCT greatest(u, v), least(u, v),
         1 + (7 * least(u, v) + 13 * greatest(u, v)) % {SSSP_WMOD}
  FROM raw WHERE u <> v),
r(node, dist) AS (
  SELECT CAST({SSSP_SOURCE} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, r.dist + e.w
  FROM r JOIN ed e ON e.src = r.node
  WHERE r.dist + e.w <= {SSSP_DIST_CAP})
SELECT node, MIN(dist) AS dist FROM r GROUP BY node
"""


SQL_SSSP = _sql_sssp()


# ---------------------------------------------------------------------------
# connected components (min-label propagation, improved-frontier)
# ---------------------------------------------------------------------------
#
# The label-propagation family member the north-star names explicitly
# (alongside PageRank): the graph is SPARSIFIED first — only edges
# observed >= CC_MIN_MULT times survive, the co-occurrence-threshold
# idiom — so components are non-trivial, then every node repeatedly
# adopts the minimum label among itself and its neighbors.  Same
# improved-frontier discipline as q_sssp_dist: only nodes whose label
# just dropped re-scan their edges, so total join mass is O(E) per
# label-wave, and waves are bounded by component diameter.  The SQL
# oracle enumerates (node, reachable-smaller-label) pairs through a
# recursive CTE (finite: <= V^2 rows) and takes the per-node MIN.

CC_MIN_MULT = 2
CC_MAX_ROUNDS = 64


def _tri_edges_multi_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (a, b, n) partial counts — unlike _tri_edges_batch's
    pre-distinct, this PRESERVES edge multiplicity (the sparsifier
    thresholds on true occurrence counts), while still combining inside
    the batch so the shuffle carries one row per distinct edge."""
    eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    u, v = tri_edge_nodes(eid)
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    keep = a != b
    a, b = a[keep], b[keep]
    key, n = np.unique(a * TRI_V + b, return_counts=True)
    return pa.table(
        {
            "a": pa.array(key // TRI_V, type=pa.int64()),
            "b": pa.array(key % TRI_V, type=pa.int64()),
            "n": pa.array(n, type=pa.int64()),
        }
    )


def _cc_edges_and_nodes(sf_dir: str):
    """(symmetric sparsified edge list, touched-node universe)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    counted = (
        ds.map_batches(_tri_edges_multi_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum(on="n", alias_name="count()"))
        .materialize()
    )

    def both_if_multi(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("count()"), CC_MIN_MULT)
        t = batch.filter(keep)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    def touched(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("count()"), CC_MIN_MULT))
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), type=pa.int64())})

    edges = counted.map_batches(both_if_multi, batch_format="pyarrow")
    nodes = counted.map_batches(touched, batch_format="pyarrow").groupby("node").count()
    nodes = nodes.map_batches(lambda b: b.select(["node"]), batch_format="pyarrow")
    return edges, nodes


def q_connected_components(sf_dir: str):
    from ray.data.aggregate import Min

    from .olap_queries import _scrub_empties

    edges_raw, nodes = _cc_edges_and_nodes(sf_dir)
    edges = _scrub_empties(edges_raw, 8).materialize()
    labels = (
        _scrub_empties(nodes, 4)
        .map_batches(
            lambda b: pa.table({"node": b.column("node"), "lab": b.column("node")}),
            batch_format="pyarrow",
        )
        .repartition(8)
        .materialize()
    )

    def improved_only(batch: pa.Table) -> pa.Table:
        new = batch.column("lab")
        old = batch.column("old")
        keep = pc.or_kleene(pc.is_null(old), pc.less(new, old))
        return batch.filter(pc.fill_null(keep, True)).select(["node", "lab"])

    frontier = labels
    for _ in range(CC_MAX_ROUNDS):
        cand = (
            edges.join(
                _scrub_empties(frontier.rename_columns({"node": "src"}), 4),
                join_type="inner",
                on=("src",),
                num_partitions=8,
            )
            .map_batches(
                lambda b: pa.table({"node": b.column("dst"), "lab": b.column("lab")}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Min(on="lab", alias_name="lab"))
        )
        frontier = (
            _scrub_empties(cand, 8)
            .join(
                _scrub_empties(labels.rename_columns({"lab": "old"}), 8),
                join_type="left_outer",
                on=("node",),
                num_partitions=8,
            )
            .map_batches(improved_only, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )
        if frontier.count() == 0:  # every node already holds its component min
            break
        labels = (
            labels.union(frontier)
            .groupby("node")
            .aggregate(Min(on="lab", alias_name="lab"))
            .repartition(8)
            .materialize()
        )
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "component": b.column("lab")}),
        batch_format="pyarrow",
    )


def _sql_connected_components() -> str:
    return f"""
WITH RECURSIVE {SQL_TRI_EDGES_RAW},
ed2 AS (
  SELECT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v
  GROUP BY 1, 2 HAVING COUNT(*) >= {CC_MIN_MULT}),
ed AS (SELECT a AS src, b AS dst FROM ed2 UNION SELECT b, a FROM ed2),
nodes AS (SELECT a AS node FROM ed2 UNION SELECT b FROM ed2),
r(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lab
  FROM r JOIN ed e ON e.src = r.node
  WHERE r.lab < e.dst)
SELECT node, MIN(lab) AS component FROM r GROUP BY node
"""


SQL_CONNECTED_COMPONENTS = _sql_connected_components()


# ---------------------------------------------------------------------------
# degree assortativity (exact integer moment sums over directed edges)
# ---------------------------------------------------------------------------
#
# The graph-statistics shape: Pearson correlation of endpoint degrees
# across the symmetric directed edge list (Newman's degree
# assortativity).  Two node-keyed joins decorate each edge with its
# endpoint degrees; per-batch vectorized partials reduce to FIVE int64
# moment sums (the corr_moments discipline — exact integers all the
# way, one final float division), so the whole statistic is one slim
# constant-size aggregate regardless of graph size.  Symmetry makes
# sy == sx and syy == sxx, so only (n, sx, sxx, sxy) ship.

def q_degree_moments(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .olap_queries import _scrub_empties

    edges = _scrub_empties(_tri_edges_both(sf_dir), 8).materialize()
    deg = (
        edges.groupby("src")
        .aggregate(Count(alias_name="deg"))
        .map_batches(
            lambda b: pa.table({"node": b.column("src"), "deg": b.column("deg")}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    decorated = edges.join(
        _scrub_empties(deg.rename_columns({"node": "src", "deg": "dx"}), 4),
        join_type="inner",
        on=("src",),
        num_partitions=8,
    ).join(
        _scrub_empties(deg.rename_columns({"node": "dst", "deg": "dy"}), 4),
        join_type="inner",
        on=("dst",),
        num_partitions=8,
    )

    def partials(batch: pa.Table) -> pa.Table:
        x = batch.column("dx").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("dy").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    agg = decorated.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum(on="n", alias_name="n"),
        Sum(on="sx", alias_name="sx"),
        Sum(on="sxx", alias_name="sxx"),
        Sum(on="sxy", alias_name="sxy"),
    )
    n, sx, sxx, sxy = (int(agg[k]) for k in ("n", "sx", "sxx", "sxy"))
    num = n * sxy - sx * sx  # exact int64 (bounded: fixed 240-node graph)
    den = n * sxx - sx * sx
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "sx": pa.array([sx], type=pa.int64()),
            "sxx": pa.array([sxx], type=pa.int64()),
            "sxy": pa.array([sxy], type=pa.int64()),
            "assortativity": pa.array([float(num) / float(den)], type=pa.float64()),
        }
    )


SQL_DEGREE_MOMENTS = f"""
WITH {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS src, greatest(u, v) AS dst FROM raw WHERE u <> v
  UNION
  SELECT DISTINCT greatest(u, v), least(u, v) FROM raw WHERE u <> v),
deg AS (SELECT src AS node, COUNT(*) AS d FROM ed GROUP BY src),
m AS (
  SELECT COUNT(*) AS n, SUM(a.d) AS sx, SUM(a.d * a.d) AS sxx, SUM(a.d * b.d) AS sxy
  FROM ed JOIN deg a ON ed.src = a.node JOIN deg b ON ed.dst = b.node)
SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
       CAST(sxx AS BIGINT) AS sxx, CAST(sxy AS BIGINT) AS sxy,
       CAST(n * sxy - sx * sx AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS assortativity
FROM m
"""


# ---------------------------------------------------------------------------
# local clustering coefficient (triangles / possible wedges per node)
# ---------------------------------------------------------------------------
#
# The neighborhood-density statistic layered on the triangle machinery:
# coeff(v) = 2*T(v) / (d(v) * (d(v)-1)) for d(v) >= 2.  Both operands
# stay exact int64 through the joins (T from the degree-oriented
# triangle plan, d from the distinct-edge degree groupby) and the ONLY
# float op is the single final division — computed identically on both
# sides, so the coefficient is bit-reproducible.  Zero-triangle nodes
# survive via a left-outer join + coalesce (an inner join would
# silently drop exactly the interesting low-density vertices).

def q_clustering_coeff(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    from .olap_queries import _scrub_empties

    edges = _scrub_empties(_tri_edges_both(sf_dir), 8).materialize()
    deg = (
        edges.groupby("src")
        .aggregate(Count(alias_name="deg"))
        .map_batches(
            lambda b: pa.table({"node": b.column("src"), "deg": b.column("deg")}),
            batch_format="pyarrow",
        )
    )
    tri = q_triangle_count(sf_dir).map_batches(
        lambda b: pa.table({"node": b.column("node"), "n_tri": b.column("n_tri")}),
        batch_format="pyarrow",
    )
    joined = _scrub_empties(deg, 4).join(
        _scrub_empties(tri, 4),
        join_type="left_outer",
        on=("node",),
        num_partitions=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.column("n_tri").to_numpy(zero_copy_only=False)
        t = np.where(np.isnan(t.astype(np.float64)), 0, t).astype(np.int64)
        keep = d >= 2
        d, t = d[keep], t[keep]
        node = batch.column("node").filter(pa.array(keep))
        coeff = (2.0 * t.astype(np.float64)) / (d * (d - 1)).astype(np.float64)
        return pa.table(
            {
                "node": node,
                "deg": pa.array(d, type=pa.int64()),
                "n_tri": pa.array(t, type=pa.int64()),
                "coeff": pa.array(coeff, type=pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_CLUSTERING_COEFF = f"""
WITH {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM ed UNION ALL SELECT b FROM ed) GROUP BY node),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ed e1
  JOIN ed e2 ON e2.a = e1.b
  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
tcnt AS (
  SELECT node, COUNT(*) AS n_tri FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY node)
SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(2 * COALESCE(t.n_tri, 0) AS DOUBLE)
         / CAST(d.deg * (d.deg - 1) AS DOUBLE) AS coeff
FROM deg d LEFT JOIN tcnt t USING (node)
WHERE d.deg >= 2
"""


# ---------------------------------------------------------------------------
# per-edge neighborhood Jaccard (link-prediction / graph-dedup primitive)
# ---------------------------------------------------------------------------
#
# For every distinct undirected edge (a, b): |N(a) ∩ N(b)| (= triangles
# through the edge), both endpoint degrees, and the neighborhood
# Jaccard  inter / (deg_a + deg_b - inter)  — the similarity score
# under link prediction and graph-side near-dup detection.  Same
# degree-oriented triangle enumeration as q_triangle_count (the
# O(E^1.5) wedge bound is the skew story), but each triangle fans out
# to its THREE canonical edges instead of its three vertices; edges on
# no triangle survive via a left join with inter = 0.  The one float
# op is the final division (denominator >= 2: each endpoint is in the
# other's neighborhood).

def q_node_jaccard(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .olap_queries import _scrub_empties

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    edges = (
        ds.map_batches(_tri_edges_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    )
    edges = _scrub_empties(edges, 8).materialize()  # working set, consumed 3x

    def both_ends(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), type=pa.int64())})

    deg = (
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    deg = _scrub_empties(deg, 4).materialize()

    e1 = edges.join(
        deg.map_batches(lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        join_type="inner",
        on=("a",),
        num_partitions=8,
    )
    e2 = e1.join(
        deg.map_batches(lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        join_type="inner",
        on=("b",),
        num_partitions=8,
    )
    withdeg = _scrub_empties(e2, 8).materialize()  # (a, b, da, db), reused at finish

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        da = batch.column("da").to_numpy(zero_copy_only=False)
        db = batch.column("db").to_numpy(zero_copy_only=False)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {
                "x": pa.array(np.where(fwd, a, b), type=pa.int64()),
                "y": pa.array(np.where(fwd, b, a), type=pa.int64()),
                "dy": pa.array(np.where(fwd, db, da), type=pa.int64()),
            }
        )

    oriented = _scrub_empties(
        withdeg.map_batches(orient, batch_format="pyarrow"), 8
    ).materialize()

    wedges = oriented.join(
        oriented.map_batches(
            lambda t: t.rename_columns(["x", "y2", "dy2"]), batch_format="pyarrow"
        ),
        join_type="inner",
        on=("x",),
        num_partitions=8,
    )

    def tips(batch: pa.Table) -> pa.Table:
        y1 = batch.column("y").to_numpy(zero_copy_only=False)
        d1 = batch.column("dy").to_numpy(zero_copy_only=False)
        y2 = batch.column("y2").to_numpy(zero_copy_only=False)
        d2 = batch.column("dy2").to_numpy(zero_copy_only=False)
        keep = (d1 < d2) | ((d1 == d2) & (y1 < y2))
        return pa.table(
            {
                "x": batch.column("x").filter(pa.array(keep)),
                "y": pa.array(y1[keep], type=pa.int64()),
                "y2": pa.array(y2[keep], type=pa.int64()),
            }
        )

    closing = oriented.map_batches(
        lambda t: pa.table({"y": t.column("x"), "y2": t.column("y")}),
        batch_format="pyarrow",
    )
    tri = _scrub_empties(wedges.map_batches(tips, batch_format="pyarrow"), 8).join(
        _scrub_empties(closing, 8),
        join_type="inner",
        on=("y", "y2"),
        num_partitions=8,
    )

    def tri_edges(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        z = batch.column("y2").to_numpy(zero_copy_only=False)
        u = np.concatenate([np.minimum(x, y), np.minimum(x, z), np.minimum(y, z)])
        v = np.concatenate([np.maximum(x, y), np.maximum(x, z), np.maximum(y, z)])
        return pa.table(
            {
                "a": pa.array(u, type=pa.int64()),
                "b": pa.array(v, type=pa.int64()),
            }
        )

    inter = (
        tri.map_batches(tri_edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n_common"))
    )

    j = _scrub_empties(withdeg, 8).join(
        _scrub_empties(inter, 8),
        join_type="left_outer",
        on=("a", "b"),
        num_partitions=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        da = batch.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch.column("n_common").to_numpy(zero_copy_only=False)
        nc = np.where(np.isnan(nc.astype(np.float64)), 0, nc).astype(np.int64)
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "n_common": pa.array(nc, type=pa.int64()),
                "deg_a": pa.array(da, type=pa.int64()),
                "deg_b": pa.array(db, type=pa.int64()),
                "jaccard": pa.array(nc / (da + db - nc), type=pa.float64()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


SQL_NODE_JACCARD = f"""
WITH {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ed e1
  JOIN ed e2 ON e2.a = e1.b
  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
tedge AS (
  SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri
  UNION ALL SELECT least(x, z), greatest(x, z) FROM tri
  UNION ALL SELECT least(y, z), greatest(y, z) FROM tri),
inter AS (
  SELECT a, b, COUNT(*) AS n_common FROM tedge GROUP BY 1, 2),
und AS (
  SELECT a AS node FROM ed UNION ALL SELECT b FROM ed),
deg AS (
  SELECT node, COUNT(*) AS deg FROM und GROUP BY 1)
SELECT ed.a, ed.b,
       CAST(COALESCE(inter.n_common, 0) AS BIGINT) AS n_common,
       dda.deg AS deg_a, ddb.deg AS deg_b,
       CAST(COALESCE(inter.n_common, 0) AS DOUBLE)
         / (dda.deg + ddb.deg - COALESCE(inter.n_common, 0)) AS jaccard
FROM ed
LEFT JOIN inter USING (a, b)
JOIN deg dda ON dda.node = ed.a
JOIN deg ddb ON ddb.node = ed.b
"""


# ---------------------------------------------------------------------------
# degree assortativity (Newman's r — do hubs attach to hubs?)
# ---------------------------------------------------------------------------
#
# Pearson correlation of endpoint degrees over all DIRECTED edge slots
# (each undirected edge counted both ways, the standard convention):
#     r = (2m * Sxy - Sx^2) / (2m * Sx2 - Sx^2)
# where by symmetry the x- and y-marginals coincide (Sx = Sy,
# Sx2 = Sy2).  All four moments are exact int64 partial sums folded
# per batch and merged by ONE global Sum (domain assert keeps
# deg^2-sums inside int64); the single float op is the final division
# of two int64-exact carries, IEEE-identical to DuckDB's
# hugeint->double cast.  Distributed shape: distinct-edge groupby ->
# degree groupby -> two slim degree joins -> moment partials.

def q_assortativity(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from .olap_queries import _scrub_empties

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    edges = (
        ds.map_batches(_tri_edges_batch, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    )
    edges = _scrub_empties(edges, 8).materialize()

    def both_ends(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]), type=pa.int64())})

    deg = (
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    deg = _scrub_empties(deg, 4).materialize()

    e1 = edges.join(
        deg.map_batches(lambda t: t.rename_columns(["a", "da"]), batch_format="pyarrow"),
        join_type="inner",
        on=("a",),
        num_partitions=8,
    )
    e2 = e1.join(
        deg.map_batches(lambda t: t.rename_columns(["b", "db"]), batch_format="pyarrow"),
        join_type="inner",
        on=("b",),
        num_partitions=8,
    )

    def moments(batch: pa.Table) -> pa.Table:
        da = batch.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        # both directed slots of each undirected edge
        assert da.size == 0 or int(max(da.max(), db.max())) < 1_000_000  # deg^2 sums fit int64
        return pa.table(
            {
                "m2": pa.array([2 * len(da)], type=pa.int64()),
                "sxy": pa.array([int(2 * (da * db).sum())], type=pa.int64()),
                "sx": pa.array([int((da + db).sum())], type=pa.int64()),
                "sx2": pa.array([int((da * da + db * db).sum())], type=pa.int64()),
            }
        )

    agg = e2.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum(on="m2", alias_name="m2"),
        Sum(on="sxy", alias_name="sxy"),
        Sum(on="sx", alias_name="sx"),
        Sum(on="sx2", alias_name="sx2"),
    )
    m2, sxy, sx, sx2 = (int(agg[k]) for k in ("m2", "sxy", "sx", "sx2"))
    num = m2 * sxy - sx * sx
    den = m2 * sx2 - sx * sx
    r = float(num) / float(den) if den else 0.0
    import ray.data as rd2

    return rd2.from_arrow(
        pa.table(
            {
                "m2": pa.array([m2], type=pa.int64()),
                "sxy": pa.array([sxy], type=pa.int64()),
                "sx": pa.array([sx], type=pa.int64()),
                "sx2": pa.array([sx2], type=pa.int64()),
                "assortativity": pa.array([r], type=pa.float64()),
            }
        )
    )


SQL_ASSORTATIVITY = f"""
WITH {SQL_TRI_EDGES_RAW},
ed AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v),
und AS (
  SELECT a AS node FROM ed UNION ALL SELECT b FROM ed),
deg AS (
  SELECT node, COUNT(*) AS deg FROM und GROUP BY 1),
slots AS (
  SELECT dda.deg AS x, ddb.deg AS y
  FROM ed JOIN deg dda ON dda.node = ed.a JOIN deg ddb ON ddb.node = ed.b
  UNION ALL
  SELECT ddb.deg, dda.deg
  FROM ed JOIN deg dda ON dda.node = ed.a JOIN deg ddb ON ddb.node = ed.b),
agg AS (
  SELECT COUNT(*) AS m2, SUM(x * y) AS sxy, SUM(x) AS sx, SUM(x * x) AS sx2
  FROM slots)
SELECT CAST(m2 AS BIGINT) AS m2, CAST(sxy AS BIGINT) AS sxy,
       CAST(sx AS BIGINT) AS sx, CAST(sx2 AS BIGINT) AS sx2,
       CAST(m2 * sxy - sx * sx AS DOUBLE)
         / CAST(m2 * sx2 - sx * sx AS DOUBLE) AS assortativity
FROM agg
"""
