"""Driver-contract queries: each pipeline paired with an ANSI-SQL oracle.

Inputs are the driver's TPC-H-ish tables (TESTDATA.md).  Geocoding
queries synthesize their points / gazetteers *deterministically from
those tables with pure-integer arithmetic*, so the DuckDB oracle can
reproduce them bit-exactly (int ops, then one float64 expression in the
same evaluation order).  The Ray side always runs the REAL engine stages
(ReverseJoiner PIP join, ForwardJoiner, TIFF encode/decode, text
kernels) — the SQL recomputes the expected answer independently.

Float-equality rules used throughout (SURVEY.md §7 hard part 2):

* coordinates derive from ``(int_expr) / const`` — one IEEE division;
* the LV03 polynomial uses explicit left-associated multiplies, no
  ``pow()`` (state/crs.py);
* similarity ranks round to 6 decimals before ordering, ties broken by
  integer ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .poolsize import auto_pool

from ..config import ForwardConfig, ReverseConfig
from ..sources.schemas import ADMIN_SCHEMA, COMPONENT_FIELDS, COMPONENT_LANG_FIELDS, GAZETTEER_SCHEMA
from ..state import crs

# ---------------------------------------------------------------------------
# Shared synthetic-world constants (mirrored literally in the SQL)
# ---------------------------------------------------------------------------

# Rectangular admin world for the oracle-gated reverse query.  The engine
# runs its real polygon machinery on these (rect rings through the STR
# tree + ray-crossing PIP); the oracle expresses containment as range
# predicates.  (admin_id, name, level, level_rank, minx, miny, maxx, maxy)
RECT_WORLD = [
    (1, "Aland", "country", 1, -180.0, -90.0, -60.0, 0.0),
    (2, "Aland State 1", "state", 2, -170.0, -80.0, -100.0, -10.0),
    (3, "Aland City 1", "city", 4, -160.0, -70.0, -120.0, -30.0),
    (4, "Bland", "country", 1, -60.0, -90.0, 60.0, 20.0),
    (5, "Bland State 1", "state", 2, -50.0, -80.0, 40.0, 10.0),
    (6, "Bland City 1", "city", 4, -40.0, -60.0, 20.0, 0.0),
    (7, "Cland", "country", 1, 60.0, 0.0, 180.0, 90.0),
    (8, "Cland State 1", "state", 2, 70.0, 10.0, 170.0, 80.0),
    (9, "Cland City 1", "city", 4, 80.0, 20.0, 160.0, 70.0),
    (10, "Cland Suburb 1", "suburb", 5, 90.0, 30.0, 150.0, 60.0),
]

# kNN place set for the oracle-gated reverse_knn query.
KNN_PLACES = [(p, -95.0 + ((p * 37) % 1000) / 100.0, -45.0 + ((p * 53) % 1000) / 100.0) for p in range(1, 21)]
# degrees^2, planar metric.  Chosen strictly between two values of the
# 1e-4 dsq grid so FMA-level float noise (DuckDB may fuse x*x+y*y) can
# never flip the tolerance predicate.
KNN_TOLERANCE_SQ = 4.00005


def _rect_components(admin_id: int) -> dict:
    """Address-component hierarchy for a RECT_WORLD row (O4 reverse_full
    projection): each level carries its ancestors' fields."""
    by_id = {a: (name, level) for a, name, level, *_ in RECT_WORLD}
    name, level = by_id[admin_id]
    comps: dict[str, str] = {}
    # ancestry in this fixed world is by name prefix ("Cland Suburb 1" ⊂ "Cland")
    for a, (nm, lv) in by_id.items():
        if name.startswith(nm.split(" ")[0]) and lv in ("country", "state", "city", "suburb"):
            rank_self = LEVEL_RANK_ORDER.index(level)
            rank_other = LEVEL_RANK_ORDER.index(lv)
            if rank_other <= rank_self:
                comps[lv] = nm
    return comps


LEVEL_RANK_ORDER = ["country", "state", "city", "suburb"]


def _rect_admin_table() -> pa.Table:
    rows = []
    for admin_id, name, level, level_rank, minx, miny, maxx, maxy in RECT_WORLD:
        comps = _rect_components(admin_id)
        row = {
            "admin_id": admin_id,
            "name": name,
            "level": level,
            "level_rank": level_rank,
            "rings": [[[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]],
            "minx": minx,
            "miny": miny,
            "maxx": maxx,
            "maxy": maxy,
            "area": (maxx - minx) * (maxy - miny),
            "formatted": name,
        }
        for f in COMPONENT_FIELDS + COMPONENT_LANG_FIELDS:
            row[f] = comps.get(f)
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=ADMIN_SCHEMA)


def _rect_world_values_sql() -> str:
    def sq(v) -> str:
        return "NULL" if v is None else f"'{v}'"

    rows = []
    for a, name, _lvl, lr, minx, miny, maxx, maxy in RECT_WORLD:
        c = _rect_components(a)
        rows.append(
            f"({a}, {lr}, {(maxx - minx) * (maxy - miny)!r}, {minx!r}, {miny!r}, {maxx!r}, {maxy!r}, "
            f"'{name}', {sq(c.get('country'))}, {sq(c.get('state'))}, {sq(c.get('city'))}, {sq(c.get('suburb'))})"
        )
    vals = ",\n    ".join(rows)
    return (
        "admin(admin_id, level_rank, area, minx, miny, maxx, maxy, formatted, "
        f"country, state, city, suburb) AS (VALUES\n    {vals})"
    )


def _knn_places_values_sql() -> str:
    vals = ",\n    ".join(f"({p}, {lon!r}, {lat!r})" for p, lon, lat in KNN_PLACES)
    return f"places(place_id, plon, plat) AS (VALUES\n    {vals})"


# point-synthesis formulas (int arithmetic; mirrored in SQL literally)
def _pip_lonlat(event_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005
    lat = ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005
    return lon, lat


def _knn_lonlat(event_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = -96.0 + ((event_id * 69621) % 1200) / 100.0
    lat = -46.0 + ((event_id * 69427) % 1200) / 100.0
    return lon, lat


def _synth_pip_points(batch: pa.Table) -> pa.Table:
    """events -> (event_id, lon, lat) via the shared _pip_lonlat formula
    (the one synthesized-point schema every reverse-family query uses)."""
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lon, lat = _pip_lonlat(eid)
    return pa.table({"event_id": batch.column("event_id"), "lon": pa.array(lon), "lat": pa.array(lat)})


# ---------------------------------------------------------------------------
# Queries (each returns a lazy ray.data.Dataset)
# ---------------------------------------------------------------------------


def q_reverse_pip(sf_dir: str):
    """O1/O3 semantics through the real broadcast PIP join, rect world."""
    import ray
    import ray.data as rd

    from ..stages.reverse import AdminIndex, ReverseJoiner

    index_ref = ray.put(AdminIndex(_rect_admin_table(), None))

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(_synth_pip_points, batch_format="pyarrow")
    ds = ds.map_batches(
        ReverseJoiner,
        fn_constructor_args=(index_ref, ReverseConfig(knn_fallback=False)),
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "admin_id": batch.column("admin_id").cast(pa.int64()),
                "formatted": batch.column("formatted"),
                "match_kind": batch.column("match_kind"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


SQL_REVERSE_PIP = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
{_rect_world_values_sql()},
hits AS (
  SELECT p.event_id, a.admin_id, a.formatted,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY a.level_rank DESC, a.area ASC, a.admin_id ASC) AS rn
  FROM pts p JOIN admin a
    ON p.lon > a.minx AND p.lon < a.maxx AND p.lat > a.miny AND p.lat < a.maxy)
SELECT p.event_id,
       COALESCE(h.admin_id, 0) AS admin_id,
       h.formatted AS formatted,
       CASE WHEN h.admin_id IS NOT NULL THEN 'pip' ELSE 'miss' END AS match_kind
FROM pts p LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (event_id)
"""


def q_reverse_shuffle_pip(sf_dir: str):
    """The cell co-shuffle reverse plan (admin side too large to
    broadcast) on the same synthesized points as ``reverse_pip`` —
    gated by the SAME SQL oracle, proving the broadcast and shuffle
    physical plans agree (the reverse-side counterpart of
    ``forward_shuffle``)."""
    import ray.data as rd

    from .reverse_shuffle import run_reverse_shuffle

    pts = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).map_batches(
        _synth_pip_points, batch_format="pyarrow"
    )
    return run_reverse_shuffle(pts, _rect_admin_table(), cell_level=4)


def q_reverse_knn(sf_dir: str):
    """O12 semantics (tolerance kNN), planar metric for oracle exactness."""
    import ray.data as rd

    pid = np.array([p for p, _, _ in KNN_PLACES], dtype=np.int64)
    plon = np.array([lon for _, lon, _ in KNN_PLACES])
    plat = np.array([lat for _, _, lat in KNN_PLACES])

    def knn(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = _knn_lonlat(eid)
        dx = lon[:, None] - plon[None, :]
        dy = lat[:, None] - plat[None, :]
        dsq = dx * dx + dy * dy
        best = np.argmin(dsq, axis=1)  # first min -> lowest place_id (sorted)
        bd = dsq[np.arange(len(eid)), best]
        hit = bd <= KNN_TOLERANCE_SQ
        place = np.where(hit, pid[best], 0)
        # dsq itself is NOT emitted: DuckDB may fuse x*x+y*y (FMA) giving
        # last-ulp differences; the selected place is grid-robust.
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "place_id": pa.array(place, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(knn, batch_format="pyarrow")


SQL_REVERSE_KNN = f"""
WITH pts AS (
  SELECT event_id,
         -96.0 + ((event_id * 69621) % 1200) / 100.0 AS lon,
         -46.0 + ((event_id * 69427) % 1200) / 100.0 AS lat
  FROM events),
{_knn_places_values_sql()},
scored AS (
  SELECT p.event_id, pl.place_id,
         (p.lon - pl.plon) * (p.lon - pl.plon) + (p.lat - pl.plat) * (p.lat - pl.plat) AS dsq,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY (p.lon - pl.plon) * (p.lon - pl.plon) + (p.lat - pl.plat) * (p.lat - pl.plat) ASC,
                                     pl.place_id ASC) AS rn
  FROM pts p CROSS JOIN places pl)
SELECT p.event_id,
       COALESCE(CASE WHEN s.dsq <= {KNN_TOLERANCE_SQ!r} THEN s.place_id END, 0) AS place_id
FROM pts p LEFT JOIN (SELECT * FROM scored WHERE rn = 1) s USING (event_id)
"""


def _nation_gazetteer(sf_dir: str) -> pa.Table:
    from ..functions.normalize import normalize_text

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    k = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    names = nat.column("n_name").to_pylist()
    glon = ((k * 7919) % 3600) / 10.0 - 180.0 + 0.05
    glat = ((k * 104729) % 1800) / 10.0 - 90.0 + 0.05
    rows = [
        {
            "place_id": int(k[i]),
            "name": names[i],
            "detail": normalize_text(names[i]),
            "alt_names": [names[i]],
            "lon": float(glon[i]),
            "lat": float(glat[i]),
            "origin": "gazetteer",
            "rank": 1,
            "weight": 0,
            "importance": float(k[i]),
            "confidence": 9,
            "cell_id": 0,
            "label": names[i],
            "house_number": None,
            "strname_deinr": None,
            "dplz4": None,
            "dplzname": None,
        }
        for i in range(len(k))
    ]
    return pa.Table.from_pylist(rows, schema=GAZETTEER_SCHEMA)


def q_forward_nation(sf_dir: str):
    """O2/O7 semantics: caption text -> gazetteer match via the real
    ForwardJoiner (caption mode: OOV noise tokens dropped)."""
    import ray
    import ray.data as rd

    from ..stages.forward import ForwardJoiner, GazetteerIndex

    index_ref = ray.put(GazetteerIndex(_nation_gazetteer(sf_dir)))
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    key2name = {
        int(k): n
        for k, n in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }

    def mk_query(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "query_id": batch.column("c_custkey").cast(pa.int64()),
                "caption": pa.array([f"photo near {key2name[int(x)]}" for x in nk], type=pa.string()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ds = ds.map_batches(mk_query, batch_format="pyarrow")
    ds = ds.map_batches(
        ForwardJoiner,
        fn_constructor_args=(index_ref, ForwardConfig(ignore_oov=True)),
        fn_constructor_kwargs={"query_col": "caption", "id_col": "query_id"},
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )
    return ds.select_columns(["query_id", "top_name", "top_lon", "top_lat"])


SQL_FORWARD_NATION = """
WITH gaz AS (
  SELECT n_nationkey, n_name AS gname,
         ((n_nationkey * 7919) % 3600) / 10.0 - 180.0 + 0.05 AS glon,
         ((n_nationkey * 104729) % 1800) / 10.0 - 90.0 + 0.05 AS glat
  FROM nation)
SELECT c.c_custkey AS query_id, g.gname AS top_name, g.glon AS top_lon, g.glat AS top_lat
FROM customer c JOIN gaz g ON g.n_nationkey = c.c_nationkey
"""

FWD_BBOX = (-50.0, -90.0, 100.0, 90.0)


def q_forward_bbox(sf_dir: str):
    """O6/O8 bbox restriction pushed into the candidate filter."""
    import ray
    import ray.data as rd

    from ..config import InputBounds
    from ..stages.forward import ForwardJoiner, GazetteerIndex

    index_ref = ray.put(GazetteerIndex(_nation_gazetteer(sf_dir)))
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    key2name = {
        int(k): n
        for k, n in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }

    def mk_query(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "query_id": batch.column("c_custkey").cast(pa.int64()),
                "caption": pa.array([f"photo near {key2name[int(x)]}" for x in nk], type=pa.string()),
            }
        )

    bb = InputBounds(*FWD_BBOX)
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ds = ds.map_batches(mk_query, batch_format="pyarrow")
    ds = ds.map_batches(
        ForwardJoiner,
        fn_constructor_args=(index_ref, ForwardConfig(ignore_oov=True, bbox=bb)),
        fn_constructor_kwargs={"query_col": "caption", "id_col": "query_id"},
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column("n_candidates"), 0)).select(
            ["query_id", "top_name", "top_lon", "top_lat"]
        )

    return ds.map_batches(project, batch_format="pyarrow")


SQL_FORWARD_BBOX = f"""
WITH gaz AS (
  SELECT n_nationkey, n_name AS gname,
         ((n_nationkey * 7919) % 3600) / 10.0 - 180.0 + 0.05 AS glon,
         ((n_nationkey * 104729) % 1800) / 10.0 - 90.0 + 0.05 AS glat
  FROM nation)
SELECT c.c_custkey AS query_id, g.gname AS top_name, g.glon AS top_lon, g.glat AS top_lat
FROM customer c JOIN gaz g ON g.n_nationkey = c.c_nationkey
WHERE g.glon >= {FWD_BBOX[0]!r} AND g.glon <= {FWD_BBOX[2]!r}
  AND g.glat >= {FWD_BBOX[1]!r} AND g.glat <= {FWD_BBOX[3]!r}
"""


def _supplier_gazetteer(sf_dir: str) -> pa.Table:
    from ..functions.normalize import normalize_text

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    key2name = {
        int(k): n
        for k, n in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nk = sup.column("s_nationkey").to_pylist()
    lon = ((sk * 48271) % 36000) / 100.0 - 180.0 + 0.005
    lat = ((sk * 16807) % 18000) / 100.0 - 90.0 + 0.005
    imp = ((sk * 2654435761) % 1000000) / 1000000.0
    rows = [
        {
            "place_id": int(sk[i]),
            "name": key2name[int(nk[i])],
            "detail": normalize_text(key2name[int(nk[i])]),
            "alt_names": [],
            "lon": float(lon[i]),
            "lat": float(lat[i]),
            "origin": "address",
            "country_code": f"c{int(nk[i]) % 5}",
            "rank": 1,
            "weight": 0,
            "importance": float(imp[i]),
            "confidence": 9,
            "cell_id": 0,
            "label": key2name[int(nk[i])],
            "house_number": None,
            "strname_deinr": None,
            "dplz4": None,
            "dplzname": None,
        }
        for i in range(len(sk))
    ]
    return pa.Table.from_pylist(rows, schema=GAZETTEER_SCHEMA)


def q_forward_topk(sf_dir: str):
    """O11 semantics: per-query grouped top-k over many candidates
    (ranked importance desc, place_id asc, limit 5), exploded rows."""
    import ray
    import ray.data as rd

    from ..stages.forward import ForwardJoiner, GazetteerIndex

    index_ref = ray.put(GazetteerIndex(_supplier_gazetteer(sf_dir)))

    def mk_query(batch: pa.Table) -> pa.Table:
        # bare name, strict address-mode matching (ignore_oov would let a
        # partially-unknown name degrade to its known tokens and
        # over-match — O2's address semantics are all-tokens-strict)
        return pa.table(
            {
                "query_id": batch.column("n_nationkey").cast(pa.int64()),
                "caption": batch.column("n_name"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ds = ds.map_batches(mk_query, batch_format="pyarrow")
    ds = ds.map_batches(
        ForwardJoiner,
        fn_constructor_args=(index_ref, ForwardConfig(ignore_oov=False, limit=5)),
        fn_constructor_kwargs={"query_col": "caption", "id_col": "query_id", "explode": True},
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )
    return ds.select_columns(["query_id", "rk", "place_id", "lon", "lat", "importance"])


SQL_FORWARD_TOPK = """
WITH gaz AS (
  SELECT s_suppkey AS place_id, s_nationkey,
         ((s_suppkey * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((s_suppkey * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat,
         ((s_suppkey * 2654435761) % 1000000) / 1000000.0 AS importance
  FROM supplier),
ranked AS (
  SELECT n.n_nationkey AS query_id, g.place_id, g.lon, g.lat, g.importance,
         row_number() OVER (PARTITION BY n.n_nationkey
                            ORDER BY g.importance DESC, g.place_id ASC) AS rk
  FROM nation n JOIN gaz g ON g.s_nationkey = n.n_nationkey)
SELECT query_id, rk, place_id, lon, lat, importance FROM ranked WHERE rk <= 5
"""

FWD_CC = "c1,C3"  # mixed case on purpose: restriction is case-folded


def q_forward_cc(sf_dir: str):
    """S4 ``countrycode`` restriction threaded end-to-end
    (opencage.rs:55-70): same grouped top-k as ``forward_topk`` but only
    candidates whose gazetteer ``country_code`` is in the
    comma-separated restriction survive — plumbed from the
    reference-shaped ``OpencageParams`` builder via
    ``ForwardConfig.from_params``."""
    import ray
    import ray.data as rd

    from ..config import OpencageParams
    from ..stages.forward import ForwardJoiner, GazetteerIndex

    index_ref = ray.put(GazetteerIndex(_supplier_gazetteer(sf_dir)))

    def mk_query(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("n_nationkey").cast(pa.int64()),
                "caption": batch.column("n_name"),
            }
        )

    cfg = ForwardConfig.from_params(OpencageParams(countrycode=FWD_CC, limit=5), ignore_oov=False)
    ds = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ds = ds.map_batches(mk_query, batch_format="pyarrow")
    ds = ds.map_batches(
        ForwardJoiner,
        fn_constructor_args=(index_ref, cfg),
        fn_constructor_kwargs={"query_col": "caption", "id_col": "query_id", "explode": True},
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )
    return ds.select_columns(["query_id", "rk", "place_id", "lon", "lat", "importance"])


SQL_FORWARD_CC = """
WITH gaz AS (
  SELECT s_suppkey AS place_id, s_nationkey,
         'c' || CAST(s_nationkey % 5 AS VARCHAR) AS country_code,
         ((s_suppkey * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((s_suppkey * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat,
         ((s_suppkey * 2654435761) % 1000000) / 1000000.0 AS importance
  FROM supplier),
ranked AS (
  SELECT n.n_nationkey AS query_id, g.place_id, g.lon, g.lat, g.importance,
         row_number() OVER (PARTITION BY n.n_nationkey
                            ORDER BY g.importance DESC, g.place_id ASC) AS rk
  FROM nation n JOIN gaz g ON g.s_nationkey = n.n_nationkey
  WHERE g.country_code IN ('c1', 'c3'))
SELECT query_id, rk, place_id, lon, lat, importance FROM ranked WHERE rk <= 5
"""


def q_lv03(sf_dir: str):
    """S1: the swisstopo WGS84->LV03 polynomial, vectorized (geoadmin.rs:311-328)."""
    import ray.data as rd

    def xform(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        lon = 6.0 + (eid % 400) / 100.0
        lat = 45.8 + (eid % 190) / 100.0
        e, n = crs.wgs84_to_lv03(lon, lat)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "lv03_e": pa.array(e, type=pa.float64()),
                "lv03_n": pa.array(n, type=pa.float64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(xform, batch_format="pyarrow")


# NB: this SQL mirrors state/crs.py wgs84_to_lv03 token-for-token — same
# literals, same association order, no pow() — for bit equality.
SQL_LV03 = """
WITH pts AS (
  SELECT event_id,
         6.0 + (event_id % 400) / 100.0 AS lon,
         45.8 + (event_id % 190) / 100.0 AS lat
  FROM events),
lp AS (
  SELECT event_id,
         (lon * 3600.0 - 26782.5) / 10000.0 AS lam,
         (lat * 3600.0 - 169028.66) / 10000.0 AS phi
  FROM pts)
SELECT event_id,
       2600072.37 + 211455.93 * lam - 10938.51 * lam * phi
         - 0.36 * lam * (phi * phi) - 44.54 * (lam * lam * lam) - 2000000.0 AS lv03_e,
       1200147.07 + 308807.95 * phi + 3745.25 * (lam * lam) + 76.63 * (phi * phi)
         - 194.56 * (lam * lam) * phi + 119.79 * (phi * phi * phi) - 1000000.0 AS lv03_n
FROM lp
"""


class _TiffRoundtrip:
    """Actor stage: synthesize a real TIFF per row (GPS from integer
    arithmetic on event_id), then parse it back — exercising the
    encode -> EXIF-extract path end-to-end inside Ray."""

    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        self._pix = np.zeros((2, 2, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lat_e7 = (eid * 2654435761) % 1800000000 - 900000000
        lon_e7 = (eid * 1103515245) % 3600000000 - 1800000000
        bufs = [self.tiff.encode_tiff(self._pix, int(a), int(o)) for a, o in zip(lat_e7, lon_e7)]
        lon, lat, ok = self.tiff.parse_gps_batch(bufs)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "lon": pa.array(lon, type=pa.float64()),
                "lat": pa.array(lat, type=pa.float64()),
                "has_gps": pa.array(ok),
            }
        )


def q_exif_roundtrip(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(_TiffRoundtrip, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)


SQL_EXIF_ROUNDTRIP = """
SELECT event_id,
       CAST((event_id * 1103515245) % 3600000000 - 1800000000 AS DOUBLE) / 10000000.0 AS lon,
       CAST((event_id * 2654435761) % 1800000000 - 900000000 AS DOUBLE) / 10000000.0 AS lat,
       TRUE AS has_gps
FROM events
"""


class _ImageStats:
    """Actor stage: synthesize a TIFF with constant pixel value
    (event_id % 256), run the real ImageDecode, emit channel means."""

    def __init__(self):
        from ..sources import tiff
        from ..stages.image_ops import ImageDecode

        self.tiff = tiff
        self.decode = ImageDecode(fake_missing=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        vals = (eid % 256).astype(np.uint8)
        bufs = [self.tiff.encode_tiff(np.full((4, 4, 3), v, dtype=np.uint8), 0, 0) for v in vals]
        dec_in = pa.table(
            {
                "event_id": batch.column("event_id"),
                "bytes": pa.array(bufs, type=pa.binary()),
                "fmt": pa.array(["tiff"] * len(bufs), type=pa.string()),
            }
        )
        out = self.decode(dec_in)
        return out.select(["event_id", "decode_ok", "mean_r", "mean_g", "mean_b"])


def q_image_stats(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(_ImageStats, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)


SQL_IMAGE_STATS = """
SELECT event_id, TRUE AS decode_ok,
       CAST(event_id % 256 AS DOUBLE) AS mean_r,
       CAST(event_id % 256 AS DOUBLE) AS mean_g,
       CAST(event_id % 256 AS DOUBLE) AS mean_b
FROM events
"""


class _TranscodeStats:
    """Actor stage: synthesize the ``image_stats`` TIFFs, TRANSCODE
    them tiff -> png through :class:`stages.image_ops.ImageTranscode`
    (lossless, so the decoded channel means stay bit-exact), then run
    the real PNG decode — the oracle is the same constant-pixel
    expectation as ``image_stats``, but the Ray side only matches by
    round-tripping every payload through both real codecs."""

    def __init__(self):
        from ..sources import tiff
        from ..stages.image_ops import ImageDecode, ImageTranscode

        self.tiff = tiff
        self.transcode = ImageTranscode(target_fmt="png")
        self.decode = ImageDecode(fake_missing=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        vals = (eid % 256).astype(np.uint8)
        bufs = [self.tiff.encode_tiff(np.full((4, 4, 3), v, dtype=np.uint8), 0, 0) for v in vals]
        t = pa.table(
            {
                "event_id": batch.column("event_id"),
                "bytes": pa.array(bufs, type=pa.binary()),
                "fmt": pa.array(["tiff"] * len(bufs), type=pa.string()),
            }
        )
        out = self.decode(self.transcode(t))
        return out.select(["event_id", "decode_ok", "mean_r", "mean_g", "mean_b"])


def q_transcode_stats(sf_dir: str):
    """Cross-codec transcode pipeline (round 4): real TIFF encode ->
    ImageTranscode -> real PNG decode, channel means gated bit-exactly
    (PNG is lossless)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(_TranscodeStats, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)


SQL_TRANSCODE_STATS = """
SELECT event_id, TRUE AS decode_ok,
       CAST(event_id % 256 AS DOUBLE) AS mean_r,
       CAST(event_id % 256 AS DOUBLE) AS mean_g,
       CAST(event_id % 256 AS DOUBLE) AS mean_b
FROM events
"""


class _JpegRoundtrip:
    """Actor stage: synthesize a structured 16x16 RGB image per event
    (integer gradients seeded by event_id), run the REAL from-scratch
    baseline JPEG encode -> decode (sources/jpeg.py), and emit the
    input contract's lossy per-row invariant: decoded pixels within
    PSNR >= 40 dB of the source.  The oracle is the invariant itself
    (every row must pass) plus the exact image geometry — the Ray side
    only matches by actually achieving the bound through the DCT
    pipeline on every row."""

    def __init__(self):
        from ..sources.jpeg import decode_jpeg, encode_jpeg

        self.enc = encode_jpeg
        self.dec = decode_jpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = np.meshgrid(np.arange(16), np.arange(16))
        psnr_ok = np.zeros(len(eid), dtype=bool)
        for i, e in enumerate(eid):
            # smooth normalized ramps (no modular wrap: a sawtooth edge
            # is adversarial for any DCT codec and the invariant is for
            # natural-image-like content; worst case measured 46 dB
            # across all 30 variants)
            a = x * (1 + e % 5) + y
            b = x + y * (2 + e % 3)
            c = x * (1 + e % 4) + y * (1 + e % 2)
            pix = np.stack(
                [(a * 255) // a.max(), (b * 255) // b.max(), (c * 255) // c.max()],
                axis=-1,
            ).astype(np.uint8)
            dec = self.dec(self.enc(pix, quality=90))
            mse = np.mean((pix.astype(np.float64) - dec.astype(np.float64)) ** 2)
            psnr = 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)
            psnr_ok[i] = psnr >= 40.0
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "w": pa.array(np.full(len(eid), 16, dtype=np.int32), type=pa.int32()),
                "h": pa.array(np.full(len(eid), 16, dtype=np.int32), type=pa.int32()),
                "psnr_ok": pa.array(psnr_ok),
            }
        )


def q_jpeg_roundtrip(sf_dir: str):
    """Lossy-codec invariant pipeline (round 4): per-event structured
    image -> real baseline JPEG encode/decode -> PSNR >= 40 dB flag."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(_JpegRoundtrip, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)


SQL_JPEG_ROUNDTRIP = """
SELECT event_id,
       CAST(16 AS INTEGER) AS w,
       CAST(16 AS INTEGER) AS h,
       TRUE AS psnr_ok
FROM events
"""


class _AudioStats:
    """Actor stage: synthesize a PCM16 WAV whose samples come from pure
    integer arithmetic (``s(n) = ((n*k + event_id*7919) % 65536) -
    32768`` with ``k = 1 + event_id % 32`` and ``N = 1024 +
    (event_id % 7) * 128`` samples at 16 kHz), then run the REAL
    RIFF/PCM decode + feature stage (``stages/audio.py``).  Every
    compared feature (peak, sum of squares, zero crossings) is integer
    arithmetic over the same closed-form generator, so DuckDB
    reproduces the whole decode-extract path bit-exactly."""

    def __init__(self):
        from ..sources.wav import encode_wav
        from ..stages.audio import AudioFeatures

        self.encode = encode_wav
        self.features = AudioFeatures()

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bufs = []
        for e in eid:
            k = 1 + (e % 32)
            nn = 1024 + (e % 7) * 128
            n = np.arange(nn, dtype=np.int64)
            s = (((n * k + e * 7919) % 65536) - 32768).astype(np.int16)
            bufs.append(self.encode(s, rate=16000))
        feat_in = pa.table(
            {"event_id": batch.column("event_id"), "bytes": pa.array(bufs, type=pa.binary())}
        )
        out = self.features(feat_in)
        return out.select(
            ["event_id", "audio_ok", "sample_rate", "n_samples", "peak_abs", "sum_sq", "zero_crossings"]
        )


def q_audio_features(sf_dir: str):
    """Multimodal AUDIO path, oracle-gated end to end (round 4 — the
    audio stub became a real RIFF/PCM codec): deterministic WAV
    payloads -> real container parse + PCM decode -> vectorized integer
    feature extraction, payload dropped at the stage boundary."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(_AudioStats, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)


SQL_AUDIO_FEATURES = """
WITH params AS (
  SELECT event_id,
         1 + (event_id % 32) AS k,
         1024 + (event_id % 7) * 128 AS nn
  FROM events),
samples AS (
  SELECT p.event_id, g.n,
         ((g.n * p.k + p.event_id * 7919) % 65536) - 32768 AS s,
         CASE WHEN g.n > 0
              THEN (((g.n - 1) * p.k + p.event_id * 7919) % 65536) - 32768 END AS sp
  FROM params p, generate_series(0, 1791) AS g(n)   -- max nn = 1024 + 6*128
  WHERE g.n < p.nn)
SELECT event_id, TRUE AS audio_ok,
       CAST(16000 AS INTEGER) AS sample_rate,
       COUNT(*) AS n_samples,
       CAST(MAX(ABS(s)) AS INTEGER) AS peak_abs,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(SUM(CASE WHEN n > 0 AND ((sp < 0) != (s < 0)) THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_crossings
FROM samples GROUP BY event_id
"""


def q_reverse_components(sf_dir: str):
    """O4 ``reverse_full`` projection: the full address-component
    hierarchy of the winning polygon (openstreetmap.rs:322-337 fields),
    flattened to columns."""
    import ray
    import ray.data as rd

    from ..stages.reverse import AdminIndex, ReverseJoiner

    index_ref = ray.put(AdminIndex(_rect_admin_table(), None))

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(_synth_pip_points, batch_format="pyarrow")
    ds = ds.map_batches(
        ReverseJoiner,
        fn_constructor_args=(index_ref, ReverseConfig(knn_fallback=False)),
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["event_id", "country", "state", "city", "suburb"])

    return ds.map_batches(project, batch_format="pyarrow")


SQL_REVERSE_COMPONENTS = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
{_rect_world_values_sql()},
hits AS (
  SELECT p.event_id, a.country, a.state, a.city, a.suburb,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY a.level_rank DESC, a.area ASC, a.admin_id ASC) AS rn
  FROM pts p JOIN admin a
    ON p.lon > a.minx AND p.lon < a.maxx AND p.lat > a.miny AND p.lat < a.maxy)
SELECT p.event_id, h.country, h.state, h.city, h.suburb
FROM pts p LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (event_id)
"""


def _morton_sql(x: str, y: str, bits: int) -> str:
    """SQL bit-interleave of two column expressions (Morton code) — a
    sum of shifted single-bit terms, matching ``state.cells._spread``."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _quadkey_sql(x: str, y: str, bits: int) -> str:
    """SQL quadkey-string render: digit i (MSB first) = 2*y_bit + x_bit,
    matching ``state.cells.render_quadkey``."""
    digits = [
        f"CAST(((({y} >> {i}) & 1) * 2 + (({x} >> {i}) & 1)) AS VARCHAR)"
        for i in range(bits - 1, -1, -1)
    ]
    return " || ".join(digits)


def q_cell_assign(sf_dir: str):
    """Deterministic tile/cell assignment (north_star: "preserve
    tile/cell assignments deterministically"): uint64 quadkey cell at two
    resolutions + parent containment + rendered quadkey string.

    Fully SQL-gated (round-3): the cell layout ``(level << 58) | morton``
    is reproduced in DuckDB with bit operators (``SQL_CELL_ASSIGN``), so
    Morton codes, the quadkey string AND the parent-containment flag all
    get a value-hash oracle; determinism across parallelism is further
    asserted by tests and the bench digest."""
    import ray.data as rd

    from ..state import cells

    def assign(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = _pip_lonlat(eid)
        c8 = cells.encode(lon, lat, 8)
        c12 = cells.encode(lon, lat, 12)
        qk = cells.render_quadkey(c8)
        parent_ok = cells.parent(c12, 4) == c8
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "cell8": pa.array(c8.astype(np.int64), type=pa.int64()),
                "cell12": pa.array(c12.astype(np.int64), type=pa.int64()),
                "quadkey8": pa.array(qk, type=pa.string()),
                "parent_consistent": pa.array(parent_ok),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(assign, batch_format="pyarrow")


SQL_CELL_ASSIGN = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT event_id,
         least(greatest(CAST(floor((lon + 180.0) / 360.0 * 256.0) AS BIGINT), 0), 255) AS x8,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * 256.0) AS BIGINT), 0), 255) AS y8,
         least(greatest(CAST(floor((lon + 180.0) / 360.0 * 4096.0) AS BIGINT), 0), 4095) AS x12,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT), 0), 4095) AS y12
  FROM pts)
SELECT event_id,
       (CAST(8 AS BIGINT) << 58) | ({_morton_sql("x8", "y8", 8)}) AS cell8,
       (CAST(12 AS BIGINT) << 58) | ({_morton_sql("x12", "y12", 12)}) AS cell12,
       {_quadkey_sql("x8", "y8", 8)} AS quadkey8,
       ((x12 >> 4) = x8 AND (y12 >> 4) = y8) AS parent_consistent
FROM xy
"""


def q_forward_shuffle_topk(sf_dir: str):
    """The shuffle-join forward path (token co-shuffle + salting) on the
    same synthesized inputs as ``forward_topk`` — gated by the SAME SQL
    oracle, proving the broadcast and shuffle physical plans agree."""
    import os
    import tempfile

    import pyarrow.parquet as pqw

    from ..config import ForwardConfig
    from .forward_shuffle import run_forward_shuffle

    # per-invocation dir: a fixed shared path would race between two
    # concurrent runs (and collide across different sf trees that share
    # a basename)
    tmp = tempfile.mkdtemp(prefix=f"graft_fwd_shuffle_{os.path.basename(sf_dir.rstrip('/'))}_")
    gaz_path = os.path.join(tmp, "gazetteer.parquet")
    q_path = os.path.join(tmp, "queries.parquet")
    pqw.write_table(_supplier_gazetteer(sf_dir), gaz_path)
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    pqw.write_table(
        pa.table(
            {
                "query_id": nat.column("n_nationkey").cast(pa.int64()),
                "caption": nat.column("n_name"),
            }
        ),
        q_path,
    )
    ds = run_forward_shuffle(
        q_path,
        gaz_path,
        ForwardConfig(ignore_oov=False, limit=5),
        query_col="caption",
        id_col="query_id",
        n_salts=4,
        hot_threshold=20,
    )

    return ds.select_columns(["query_id", "rk", "place_id", "lon", "lat", "importance"])


def q_reverse_raster(sf_dir: str):
    """Raster-path reverse geocoding (vector -> raster burn at level 10,
    then O(1) per-point lookup).  The oracle replicates the raster
    semantics exactly: containment is evaluated at the point's CELL
    CENTER, not the point itself."""
    import ray
    import ray.data as rd

    from ..state.raster import RasterLookup, build_raster
    from ..stages.reverse import AdminIndex

    raster = build_raster(AdminIndex(_rect_admin_table(), None), level=10)
    raster_ref = ray.put(raster)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(_synth_pip_points, batch_format="pyarrow")
    ds = ds.map_batches(
        RasterLookup,
        fn_constructor_args=(raster_ref,),
        batch_format="pyarrow",
        concurrency=auto_pool(),
        num_cpus=1,
    )
    return ds.select_columns(["event_id", "raster_admin_id"])


SQL_REVERSE_RASTER = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
cellc AS (
  SELECT event_id,
         (floor((lon + 180.0) / 360.0 * 1024.0) + 0.5) / 1024.0 * 360.0 - 180.0 AS clon,
         (floor((lat + 90.0) / 180.0 * 1024.0) + 0.5) / 1024.0 * 180.0 - 90.0 AS clat
  FROM pts),
{_rect_world_values_sql()},
hits AS (
  SELECT c.event_id, a.admin_id,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY a.level_rank DESC, a.area ASC, a.admin_id ASC) AS rn
  FROM cellc c JOIN admin a
    ON c.clon > a.minx AND c.clon < a.maxx AND c.clat > a.miny AND c.clat < a.maxy)
SELECT p.event_id, COALESCE(h.admin_id, 0) AS raster_admin_id
FROM pts p LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (event_id)
"""


def q_reverse_annotations_num(sf_dir: str):
    """SQL-gated slice of the O4 annotations (round-2 VERDICT Next
    #10): Mercator x (``radians(lon) * R`` — bit-exact between numpy
    and DuckDB, probe-verified), the solar tz offset (integer
    arithmetic), the level-9 cell id + quadkey string (bit-operator
    Morton, as in ``SQL_CELL_ASSIGN``), and — round-3 VERDICT Next #5 —
    the DMS renders (opencage.rs:581-599 shape): deterministic
    floor/multiply printf arithmetic, reproduced with DuckDB ``printf``
    and probe-verified char-exact on every synthetic point at sf0.01.
    ``mercator_y`` stays rows-only: ``ln(tan(...))`` differs from
    DuckDB by 1 ulp on some inputs, and the repo rule is to never
    hash-compare raw transcendental outputs."""
    import ray.data as rd

    from ..stages.annotations import annotate_points

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "mercator_x": batch.column("mercator_x"),
                "tz_offset_sec": batch.column("tz_offset_sec"),
                "cell9": batch.column("ann_cell_id").cast(pa.int64()),
                "quadkey9": batch.column("quadkey"),
                "dms_lat": batch.column("dms_lat"),
                "dms_lon": batch.column("dms_lon"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(_synth_pip_points, batch_format="pyarrow")
    ds = ds.map_batches(annotate_points, batch_format="pyarrow")
    return ds.map_batches(project, batch_format="pyarrow")


SQL_REVERSE_ANNOTATIONS_NUM = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT event_id, lon, lat,
         least(greatest(CAST(floor((lon + 180.0) / 360.0 * 512.0) AS BIGINT), 0), 511) AS x9,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * 512.0) AS BIGINT), 0), 511) AS y9
  FROM pts)
SELECT event_id,
       radians(lon) * 6378137.0 AS mercator_x,
       CAST(least(greatest(round(lon / 15.0), -12), 14) AS BIGINT) * 3600 AS tz_offset_sec,
       (CAST(9 AS BIGINT) << 58) | ({_morton_sql("x9", "y9", 9)}) AS cell9,
       {_quadkey_sql("x9", "y9", 9)} AS quadkey9,
       printf('%d° %d'' %.5f'''' %s',
              CAST(floor(abs(lat)) AS BIGINT),
              CAST(floor((abs(lat) - floor(abs(lat))) * 60.0) AS BIGINT),
              ((abs(lat) - floor(abs(lat))) * 60.0
                 - floor((abs(lat) - floor(abs(lat))) * 60.0)) * 60.0,
              CASE WHEN lat >= 0 THEN 'N' ELSE 'S' END) AS dms_lat,
       printf('%d° %d'' %.5f'''' %s',
              CAST(floor(abs(lon)) AS BIGINT),
              CAST(floor((abs(lon) - floor(abs(lon))) * 60.0) AS BIGINT),
              ((abs(lon) - floor(abs(lon))) * 60.0
                 - floor((abs(lon) - floor(abs(lon))) * 60.0)) * 60.0,
              CASE WHEN lon >= 0 THEN 'E' ELSE 'W' END) AS dms_lon
FROM xy
"""


def q_reverse_annotations_geo(sf_dir: str):
    """Round-5 gate (round-4 VERDICT Next #4) for the remaining O4
    annotation strings (opencage.rs:581-599 shape): the full 1-metre
    MGRS string, the Maidenhead locator, the three-word cell code (the
    what3words ROLE, engine wordlist), and the sunrise/sunset unix
    seconds.  Maidenhead and threeword are pure floor/Morton integer
    arithmetic — exactly SQL-expressible.  MGRS and sun involve
    transcendental compositions (Krüger series; the NOAA sunrise
    equation) that DuckDB lacks sinh/atanh for, so the oracle composes
    them from exp/ln; the compositions were probe-verified CHAR-EXACT
    on all 100k synthetic points at sf0.1 (max easting/northing
    divergence ~3e-9 m against a 1 m digit floor; sun int64 seconds
    equal everywhere once the oracle truncates like numpy's astype).
    The non-string numeric slice stays gated via
    ``q_reverse_annotations_num``."""
    import ray.data as rd

    from ..stages.annotations import annotate_points

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(_synth_pip_points, batch_format="pyarrow")
    ds = ds.map_batches(annotate_points, batch_format="pyarrow")
    return ds.select_columns(
        ["event_id", "mgrs", "maidenhead", "threeword", "sun_rise", "sun_set"]
    )


def _annotations_geo_sql() -> str:
    """DuckDB reproduction of the geodesy kernels (state/geodesy.py),
    term-for-term in the same IEEE evaluation order as the numpy code;
    constants are repr'd from the very module the engine uses."""
    from ..state import geodesy as gd

    sqn = 2.0 * np.sqrt(gd._N) / (1.0 + gd._N)
    k0aa = gd._K0 * gd._AA
    a1, a2, a3 = gd._ALPHA
    cons, vow = gd._CONS, gd._VOWELS
    band, col, row = gd._BAND_LETTERS, gd._COL_LETTERS, gd._ROW_LETTERS
    morton13 = _morton_sql("x13", "y13", 13)

    def word(w: str) -> str:
        return (
            f"substr('{cons}', CAST(({w})//350 AS INT)+1, 1) || "
            f"substr('{vow}', CAST((({w})//70)%5 AS INT)+1, 1) || "
            f"substr('{cons}', CAST((({w})//5)%14 AS INT)+1, 1) || "
            f"substr('{vow}', CAST(({w})%5 AS INT)+1, 1)"
        )

    return f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
mh0 AS (
  SELECT event_id, lon, lat,
         least(greatest(lon + 180.0, 0.0), 360.0 - 0.000000001) AS mlo,
         least(greatest(lat + 90.0, 0.0), 180.0 - 0.000000001) AS mla,
         least(greatest(CAST(floor((lon+180.0)/360.0*8192.0) AS BIGINT),0),8191) AS x13,
         least(greatest(CAST(floor((lat+90.0)/180.0*8192.0) AS BIGINT),0),8191) AS y13
  FROM pts),
tw0 AS (SELECT *, ({morton13}) AS pl FROM mh0),
z AS (
  SELECT *, (CASE
    WHEN lat >= 72.0 AND lat < 84.0 AND lon >= 0.0 AND lon < 9.0 THEN 31
    WHEN lat >= 72.0 AND lat < 84.0 AND lon >= 9.0 AND lon < 21.0 THEN 33
    WHEN lat >= 72.0 AND lat < 84.0 AND lon >= 21.0 AND lon < 33.0 THEN 35
    WHEN lat >= 72.0 AND lat < 84.0 AND lon >= 33.0 AND lon < 42.0 THEN 37
    WHEN lat >= 56.0 AND lat < 64.0 AND lon >= 3.0 AND lon < 12.0 THEN 32
    ELSE (CAST(floor((lon + 180.0)/6.0) AS BIGINT) % 60) + 1 END) AS zone
  FROM tw0),
k1 AS (
  SELECT *, radians(lat) AS phi,
         radians(lon - ((zone - 1.0)*6.0 - 180.0 + 3.0)) AS lam,
         sin(radians(lat)) AS sphi
  FROM z),
k2 AS (
  SELECT *, 0.5*ln((1.0+sphi)/(1.0-sphi))
            - {sqn!r}*(0.5*ln((1.0+{sqn!r}*sphi)/(1.0-{sqn!r}*sphi))) AS targ
  FROM k1),
k3 AS (SELECT *, (exp(targ) - exp(-targ))/2.0 AS t FROM k2),
k4 AS (
  SELECT *, atan2(t, cos(lam)) AS xi,
         0.5*ln((1.0 + sin(lam)/sqrt(1.0+t*t))/(1.0 - sin(lam)/sqrt(1.0+t*t))) AS eta
  FROM k3),
k5 AS (
  SELECT *,
    xi + {a1!r}*sin(2.0*xi)*((exp(2.0*eta)+exp(-2.0*eta))/2.0)
       + {a2!r}*sin(4.0*xi)*((exp(4.0*eta)+exp(-4.0*eta))/2.0)
       + {a3!r}*sin(6.0*xi)*((exp(6.0*eta)+exp(-6.0*eta))/2.0) AS xis,
    eta + {a1!r}*cos(2.0*xi)*((exp(2.0*eta)-exp(-2.0*eta))/2.0)
        + {a2!r}*cos(4.0*xi)*((exp(4.0*eta)-exp(-4.0*eta))/2.0)
        + {a3!r}*cos(6.0*xi)*((exp(6.0*eta)-exp(-6.0*eta))/2.0) AS etas
  FROM k4),
utm AS (
  SELECT *, 500000.0 + {k0aa!r}*etas AS e_,
    CASE WHEN {k0aa!r}*xis < 0.0 THEN {k0aa!r}*xis + 10000000.0
         ELSE {k0aa!r}*xis END AS n_
  FROM k5),
mg AS (
  SELECT *,
    CAST(least(greatest(CASE WHEN lat >= 72.0 THEN 19
               ELSE CAST(floor((lat + 80.0)/8.0) AS BIGINT) END, 0), 19) AS BIGINT) AS band_idx,
    ((zone - 1) % 3) * 8 + (CAST(floor(e_/100000.0) AS BIGINT) - 1) AS col_idx,
    (CAST(floor(n_/100000.0) AS BIGINT)
       + CASE WHEN zone % 2 = 0 THEN 5 ELSE 0 END) % 20 AS row_idx,
    CAST(floor(e_) AS BIGINT) % 100000 AS edig,
    CAST(floor(n_) AS BIGINT) % 100000 AS ndig
  FROM utm),
sun1 AS (
  SELECT event_id, lat,
    floor({float(1_710_892_800)!r}/86400.0 + 2440587.5 - 2451545.0 + 0.0008
          - (-lon)/360.0 + 0.5) + (-lon)/360.0 AS jstar
  FROM pts),
sun2 AS (SELECT *, radians(fmod(357.5291 + 0.98560028*jstar, 360.0)) AS m FROM sun1),
sun3 AS (
  SELECT *, radians(fmod(degrees(m) + (1.9148*sin(m) + 0.02*sin(2.0*m)
             + 0.0003*sin(3.0*m)) + 180.0 + 102.9372, 360.0)) AS lams
  FROM sun2),
sun4 AS (
  SELECT *, 2451545.0 + jstar + 0.0053*sin(m) - 0.0069*sin(2.0*lams) AS jt,
         sin(lams)*sin(radians(23.4397)) AS sd
  FROM sun3),
sun5 AS (
  SELECT *, (sin(radians(-0.833)) - sin(radians(lat))*sd)
            / (cos(radians(lat))*cos(asin(sd))) AS ch
  FROM sun4),
sun AS (
  SELECT event_id,
    CASE WHEN ch < -1.0 OR ch > 1.0 THEN -1
         ELSE CAST(trunc((jt - degrees(acos(least(greatest(ch,-1.0),1.0)))/360.0
                          - 2440587.5)*86400.0) AS BIGINT) END AS sun_rise,
    CASE WHEN ch < -1.0 OR ch > 1.0 THEN -1
         ELSE CAST(trunc((jt + degrees(acos(least(greatest(ch,-1.0),1.0)))/360.0
                          - 2440587.5)*86400.0) AS BIGINT) END AS sun_set
  FROM sun5)
SELECT m.event_id,
  CASE WHEN m.lat < -80.0 OR m.lat > 84.0 THEN NULL
    ELSE CAST(m.zone AS VARCHAR) || substr('{band}', CAST(m.band_idx AS INT)+1, 1)
      || substr('{col}', CAST(m.col_idx % 24 AS INT)+1, 1)
      || substr('{row}', CAST(m.row_idx AS INT)+1, 1)
      || printf('%05d', m.edig) || printf('%05d', m.ndig) END AS mgrs,
  chr(65 + CAST(floor(m.mlo/20.0) AS INT)) || chr(65 + CAST(floor(m.mla/10.0) AS INT))
    || CAST(CAST(floor(fmod(m.mlo,20.0)/2.0) AS BIGINT) AS VARCHAR)
    || CAST(CAST(floor(fmod(m.mla,10.0)) AS BIGINT) AS VARCHAR)
    || chr(97 + CAST(floor(fmod(m.mlo,2.0)*12.0) AS INT))
    || chr(97 + CAST(floor(fmod(m.mla,1.0)*24.0) AS INT)) AS maidenhead,
  {word('m.pl%1024')} || '.' || {word('(m.pl//1024)%1024')}
    || '.' || {word('(m.pl//1048576)%1024')} AS threeword,
  s.sun_rise, s.sun_set
FROM mg m JOIN sun s USING (event_id)
"""


SQL_REVERSE_ANNOTATIONS_GEO = _annotations_geo_sql()


def q_reverse_annotations(sf_dir: str):
    """O4 annotations analogue (opencage.rs:581-599): DMS strings,
    quadkey (the geohash role), cell id, Mercator x/y, MGRS, Maidenhead,
    qibla, sun rise/set.  Rows-only as a whole because of mercator_y
    (1-ulp ln/tan divergence) and qibla (rounded trig) — but every
    string family is now hash-gated elsewhere: DMS via
    ``q_reverse_annotations_num``, MGRS/Maidenhead/threeword/sun via
    ``q_reverse_annotations_geo``."""
    import ray.data as rd

    from ..stages.annotations import annotate_points

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(_synth_pip_points, batch_format="pyarrow")
    ds = ds.map_batches(annotate_points, batch_format="pyarrow")
    return ds.select_columns(
        [
            "event_id",
            "dms_lat",
            "dms_lon",
            "quadkey",
            "mercator_x",
            "mercator_y",
            "mgrs",
            "maidenhead",
            "qibla",
            "sun_rise",
            "sun_set",
            "threeword",
            "tz_offset_sec",
            "tz_offset_string",
            "tz_name",
        ]
    )


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup (the image-axis dedup operator)
# ---------------------------------------------------------------------------

PHASH_GROUP = 4  # images per shared base pattern
# verify gate for candidate pairs.  NOTE the 4x16-bit banding only
# GUARANTEES a shared bucket for Hamming <= 3 (pigeonhole); 4..8 is
# best-effort recall.  The exact-oracle gate stays sound because the
# corpus's intra-group distances are far below the guarantee —
# tests/test_phash.py::test_corpus_within_band_guarantee pins max
# intra-group Hamming <= 3, so a perturbation-amplitude change that
# would break banding recall fails the test, not the silent gate.
PHASH_MAX_HAMMING = 8


class _PhashCorpus:
    """Actor: synthesize the near-dup image corpus — every
    ``PHASH_GROUP`` consecutive event_ids share one seeded base
    pattern, each copy perturbed by a few low-amplitude pixel edits —
    round-trip each image through the REAL TIFF codec, and pHash the
    decoded pixels (stages.image_ops.ImagePHash).  The closed-form
    duplicate structure (same ``event_id // PHASH_GROUP``) is what the
    SQL oracle reproduces; the Ray side can only match it by the
    decode -> DCT -> banded-LSH -> Hamming pipeline actually working."""

    def __init__(self):
        from ..sources import tiff
        from ..stages.image_ops import ImagePHash

        self.tiff = tiff
        self.ph = ImagePHash()

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lumas = []
        for e in eid:
            base = int(e) // PHASH_GROUP
            rs = np.random.RandomState(base % (2**31))
            img = rs.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
            rs2 = np.random.RandomState((int(e) + 977) % (2**31))
            ys = rs2.randint(0, 64, 4)
            xs = rs2.randint(0, 64, 4)
            delta = rs2.choice(np.array([-4, 4], dtype=np.int64), size=(4, 3))
            img[ys, xs] = np.clip(img[ys, xs].astype(np.int64) + delta, 0, 255).astype(np.uint8)
            buf = self.tiff.encode_tiff(img, 0, 0)
            pix = self.tiff.parse_pixels(buf)
            lumas.append(self.ph._luma32(pix))
        # empty blocks happen after splits/repartition — np.stack([]) raises
        ph = self.ph.hash_images(np.stack(lumas)) if lumas else np.zeros(0, dtype=np.int64)
        out = pa.table({"event_id": pa.array(eid, type=pa.int64()), "phash": pa.array(ph, type=pa.int64())})
        for b in range(4):
            band = (ph >> (16 * b)) & np.int64(0xFFFF)
            out = out.append_column(f"ph_band{b}", pa.array(band.astype(np.int32), type=pa.int32()))
        return out


def q_phash_pairs(sf_dir: str):
    """Image near-dup pairs via banded pHash LSH + exact Hamming verify
    (the SimHash plan over DCT perceptual hashes; SURVEY.md §2.6 dedup
    family, image modality)."""
    import ray.data as rd

    from ..functions.hashing import hamming64

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    fp = ds.map_batches(_PhashCorpus, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        bands = np.stack(
            [batch.column(f"ph_band{b}").to_numpy(zero_copy_only=False) for b in range(4)]
        )
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), n), type=pa.int32()),
                "key": pa.array(bands.ravel(), type=pa.int32()),
                "event_id": pa.array(np.tile(ids, 4), type=pa.int64()),
                "phash": pa.array(np.tile(ph, 4), type=pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("event_id").to_numpy(zero_copy_only=False)
        ph = group.column("phash").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, ph = ids[order], ph[order]
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        ids, ph = ids[keep], ph[keep]
        # fan-out bound: a 16-bit band bucket holds ~(n_rows/65536 +
        # dup-group size) distinct ids; 4096 is ~100x the sf0.1 maximum
        # (tests/test_phash.py::test_bucket_sizes_far_below_cap) so the
        # truncation below never bites a gated tier — it exists only to
        # bound the O(k^2) pair matrix against adversarial skew
        ids, ph = ids[:4096], ph[:4096]
        if len(ids) < 2:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        d = hamming64(ph[ia].astype(np.uint64), ph[ib].astype(np.uint64))
        ok = d <= PHASH_MAX_HAMMING
        return pa.table(
            {
                "a": pa.array(ids[ia][ok], type=pa.int64()),
                "b": pa.array(ids[ib][ok], type=pa.int64()),
                "hamming": pa.array(d[ok], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    pairs = fp.map_batches(explode_bands, batch_format="pyarrow")
    pairs = pairs.groupby(["band", "key"]).map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair found via several matching bands appears once per band —
    # the native Min aggregate dedups without per-group Python
    return (
        pairs.groupby(["a", "b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .select_columns(["a", "b"])
    )


SQL_PHASH_PAIRS = f"""
SELECT a.event_id AS a, b.event_id AS b
FROM events a JOIN events b
  ON (a.event_id // {PHASH_GROUP}) = (b.event_id // {PHASH_GROUP})
 AND a.event_id < b.event_id
"""


PHASH_TOPK_NQ = 16  # event_id < NQ are the query images
PHASH_TOPK_K = 5


def q_phash_topk(sf_dir: str):
    """Image similarity retrieval: brute-force Hamming top-k over pHash
    fingerprints (the ann_topk plan on the image modality).  The query
    fingerprints are synthesized driver-side from a predicate-pushdown
    read of only the query ids (never the table); the database side
    streams through the corpus actor.  Gated: within top-k, neighbors
    at Hamming <= PHASH_MAX_HAMMING are exactly the query's dup-group
    mates (cross-group distances sit far above the gate — the
    separation property tested in tests/test_phash.py), so the SQL
    oracle is the closed-form mate set."""
    import ray
    import ray.data as rd

    from ..functions.hashing import hamming64

    qt = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id"],
        filters=[("event_id", "<", PHASH_TOPK_NQ)],
    )
    qfp = _PhashCorpus()(qt)
    qids = qfp.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qph = qfp.column("phash").to_numpy(zero_copy_only=False).astype(np.uint64)
    q_ref = ray.put((qids, qph))

    K = PHASH_TOPK_K

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qph = ray.get(q_ref)
        nid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ph = batch.column("phash").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = hamming64(qph[:, None], ph[None, :])  # [nq, nb]
        mask = nid[None, :] != qids[:, None]  # no self-match
        d = np.where(mask, d, np.iinfo(np.int64).max)
        k = min(K, d.shape[1])
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        qi = np.repeat(np.arange(len(qids)), k)
        ni = part.ravel()
        keep = d[qi, ni] < np.iinfo(np.int64).max
        return pa.table(
            {
                "qid": pa.array(qids[qi][keep], type=pa.int64()),
                "nid": pa.array(nid[ni][keep], type=pa.int64()),
                "hamming": pa.array(d[qi, ni][keep].astype(np.int64), type=pa.int64()),
            }
        )

    def final_topk(grp: pa.Table) -> pa.Table:
        nid = grp.column("nid").to_numpy(zero_copy_only=False)
        ham = grp.column("hamming").to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, ham))[:K]
        sel = order[ham[order] <= PHASH_MAX_HAMMING]
        out = grp.take(pa.array(sel, type=pa.int64()))
        return pa.table({"qid": out.column("qid"), "nid": out.column("nid")})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    fp = ds.map_batches(_PhashCorpus, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1)
    return (
        fp.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final_topk, batch_format="pyarrow")
    )


SQL_PHASH_TOPK = f"""
SELECT a.event_id AS qid, b.event_id AS nid
FROM events a JOIN events b
  ON (a.event_id // {PHASH_GROUP}) = (b.event_id // {PHASH_GROUP})
 AND a.event_id != b.event_id
WHERE a.event_id < {PHASH_TOPK_NQ}
"""


# ---------------------------------------------------------------------------
# video frame sampling (multimodal: real strided extraction)
# ---------------------------------------------------------------------------

VIDEO_EVERY_N = 5


class _VideoFrameMeans:
    """Actor: synthesize a GRV1 clip per event (20 + event_id % 11
    frames of 8x8 RGB, frame k filled with (event_id*7 + k*13) % 256),
    run the REAL strided FrameSample extraction, then explode the
    sampled frames to per-frame rows with their channel mean.  The mean
    of a constant-fill frame is its fill value exactly (integer sum /
    count < 2^53), which is the closed form the SQL oracle generates
    with unnest(generate_series(...))."""

    def __init__(self):
        from ..sources.rawvideo import encode_rawvideo
        from ..stages.image_ops import FrameSample

        self.encode = encode_rawvideo
        self.sampler = FrameSample(every_n=VIDEO_EVERY_N)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bufs = []
        for e in eid:
            nf = int(20 + e % 11)
            fills = ((e * 7 + np.arange(nf, dtype=np.int64) * 13) % 256).astype(np.uint8)
            frames = np.ascontiguousarray(
                np.broadcast_to(fills[:, None, None, None], (nf, 8, 8, 3))
            )
            bufs.append(self.encode(frames))
        t = pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "bytes": pa.array(bufs, type=pa.binary()),
            }
        )
        out = self.sampler(t)
        idx_lists = out.column("frame_indices").to_pylist()
        frame_lists = out.column("frames_rgb").to_pylist()
        rid, fidx, mean = [], [], []
        for i, e in enumerate(eid):
            for k, fb in zip(idx_lists[i], frame_lists[i]):
                rid.append(int(e))
                fidx.append(int(k))
                mean.append(float(np.frombuffer(fb, dtype=np.uint8).mean()))
        return pa.table(
            {
                "event_id": pa.array(rid, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int64()),
                "mean_val": pa.array(mean, type=pa.float64()),
            }
        )


def q_video_frames(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _VideoFrameMeans, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_VIDEO_FRAMES = f"""
SELECT event_id,
       CAST(g AS BIGINT) AS frame_idx,
       CAST((event_id * 7 + g * 13) % 256 AS DOUBLE) AS mean_val
FROM (
  SELECT event_id,
         unnest(generate_series(0, (20 + event_id % 11) - 1, {VIDEO_EVERY_N})) AS g
  FROM events) s
"""


# ---------------------------------------------------------------------------
# inter-frame delta video (GRV2): compressed GOP stream, real seek-decode
# ---------------------------------------------------------------------------
#
# Round-5 (round-4 VERDICT Next #5): the compressed-video gate.  Each
# event synthesizes a clip whose frames share one spatial gradient G
# (values < 32) plus a per-frame fill < 192 — temporally correlated, so
# P-frame residuals are CONSTANT planes and the whole GOP structure has
# a closed form the oracle can predict: I-frames (every 8th, 192 raw
# bytes) and 2-byte RLE P-frames.  The Ray side earns the match only by
# actually encoding the GRV2 container and seek-decoding the sampled
# frames through the real residual-accumulation path; the gate pins
# (a) decoded pixel means (losslessness), (b) the exact container byte
# size (encoder behavior), and (c) the I-frame count (GOP structure).

VDELTA_EVERY_N = 5


class _VideoDeltaStats:
    def __init__(self):
        from ..sources.deltavideo import DEFAULT_KEYINT, encode_deltavideo, extract_frames

        self.encode = encode_deltavideo
        self.extract = extract_frames
        self.keyint = DEFAULT_KEYINT
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grad = ((2 * r + c + k) % 32).astype(np.uint8)  # max 23

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.deltavideo import _parse_table, video_info

        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out_e, out_f, out_m, out_b, out_i = [], [], [], [], []
        for e in eid:
            n = int(20 + e % 11)
            fills = ((e * 7 + np.arange(n, dtype=np.int64) * 13) % 192).astype(np.uint8)
            frames = (self.grad[None] + fills[:, None, None, None]).astype(np.uint8)
            buf = self.encode(frames, keyint=self.keyint)
            _w, _h, nn, _fps, _ki = video_info(buf)
            _sizes, types, _off = _parse_table(buf, nn)
            idx = np.arange(0, n, VDELTA_EVERY_N, dtype=np.int64)
            dec = self.extract(buf, idx)
            means = dec.reshape(len(idx), -1).astype(np.int64).sum(axis=1) / 192.0
            out_e.extend([int(e)] * len(idx))
            out_f.extend(idx.tolist())
            out_m.extend(means.tolist())
            out_b.extend([len(buf)] * len(idx))
            out_i.extend([int((types == 0).sum())] * len(idx))
        return pa.table(
            {
                "event_id": pa.array(out_e, type=pa.int64()),
                "frame_idx": pa.array(out_f, type=pa.int64()),
                "mean_val": pa.array(out_m, type=pa.float64()),
                "bytes_payload": pa.array(out_b, type=pa.int64()),
                "n_iframes": pa.array(out_i, type=pa.int64()),
            }
        )


def q_video_delta(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _VideoDeltaStats, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_VIDEO_DELTA = f"""
WITH s AS (
  SELECT event_id, (20 + event_id % 11) AS n,
         unnest(generate_series(0, (20 + event_id % 11) - 1, {VDELTA_EVERY_N})) AS g
  FROM events)
SELECT event_id,
       CAST(g AS BIGINT) AS frame_idx,
       CAST((event_id * 7 + g * 13) % 192 AS DOUBLE) + 11.5 AS mean_val,
       CAST(24 + 5 * n + 192 * ((n + 7) // 8) + 2 * (n - (n + 7) // 8) AS BIGINT)
         AS bytes_payload,
       CAST((n + 7) // 8 AS BIGINT) AS n_iframes
FROM s
"""


def q_phash_clusters(sf_dir: str):
    """Image duplicate clusters: fully distributed min-label propagation
    (stages.dedup.connected_components — labels stay a Dataset, joined
    onto edges per round) over the ORACLE-GATED pHash pair set, so the
    cluster labels have a closed-form oracle too: each dup group is a
    clique, its label is its minimum (= first) event_id."""
    from ..stages.dedup import connected_components

    comp = connected_components(q_phash_pairs(sf_dir))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("doc_id"),
                "cluster_id": batch.column("cluster_id"),
            }
        )

    return comp.map_batches(rename, batch_format="pyarrow")


SQL_PHASH_CLUSTERS = f"""
SELECT event_id, (event_id // {PHASH_GROUP}) * {PHASH_GROUP} AS cluster_id
FROM events
QUALIFY COUNT(*) OVER (PARTITION BY event_id // {PHASH_GROUP}) > 1
"""


# ---------------------------------------------------------------------------
# image tile statistics (real codec roundtrip -> per-tile box sums)
# ---------------------------------------------------------------------------
#
# The thumbnail/downsample shape: every image decodes (REAL TIFF codec,
# not the formula) and reduces to a 4x4 grid of 2x2-box channel sums —
# the vectorized reshape-reduce every image pipeline runs before
# feature extraction.  The pixels are a deterministic gradient
# ((event_id + 16r + 2c + k) % 256), so the DuckDB oracle predicts
# every tile sum arithmetically while the Ray side only matches by
# actually round-tripping each payload through encode_tiff ->
# parse_pixels.  16 rows per image; the batch-level reduce is one
# numpy reshape-sum over the stacked (n, 8, 8, 3) block.


class _ImageTileStats:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        dec = np.stack(
            [self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0)) for i in range(n)]
        ) if n else np.zeros((0, 8, 8, 3), dtype=np.uint8)
        sums = (
            dec.astype(np.int64).reshape(n, 4, 2, 4, 2, 3).sum(axis=(2, 4))
        )  # (n, ty, tx, ch)
        ty, tx = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
        return pa.table(
            {
                "event_id": pa.array(np.repeat(eid, 16), type=pa.int64()),
                "ty": pa.array(np.tile(ty.ravel(), n), type=pa.int64()),
                "tx": pa.array(np.tile(tx.ravel(), n), type=pa.int64()),
                "sum_r": pa.array(sums[..., 0].reshape(-1), type=pa.int64()),
                "sum_g": pa.array(sums[..., 1].reshape(-1), type=pa.int64()),
                "sum_b": pa.array(sums[..., 2].reshape(-1), type=pa.int64()),
            }
        )


def q_image_tiles(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageTileStats, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_tiles() -> str:
    chans = {"sum_r": 0, "sum_g": 1, "sum_b": 2}
    cols = []
    for name, k in chans.items():
        terms = [
            f"(event_id + 16 * (2 * t.ty + {dr}) + 2 * (2 * t.tx + {dc}) + {k}) % 256"
            for dr in (0, 1)
            for dc in (0, 1)
        ]
        cols.append(f"CAST({' + '.join(terms)} AS BIGINT) AS {name}")
    col_block = ",\n       ".join(cols)
    return f"""
WITH t AS (
  SELECT a.ty, b.tx
  FROM (VALUES (0), (1), (2), (3)) a(ty), (VALUES (0), (1), (2), (3)) b(tx))
SELECT event_id, CAST(t.ty AS BIGINT) AS ty, CAST(t.tx AS BIGINT) AS tx,
       {col_block}
FROM events, t
"""


SQL_IMAGE_TILES = _sql_image_tiles()


# ---------------------------------------------------------------------------
# image edge energy (real codec roundtrip -> exact Sobel magnitude sums)
# ---------------------------------------------------------------------------
#
# The feature-extraction shape beyond plain box sums: every payload
# decodes through the REAL TIFF codec and runs a 3x3 Sobel over the
# interior, accumulating SUM(|Gx| + |Gy|) per channel (the L1 edge
# energy used for blur/quality triage in curation pipelines).  The
# deterministic gradient pixels wrap mod 256 at event-dependent
# positions, so the energy is image-specific and the DuckDB oracle can
# re-derive it purely arithmetically — while the Ray side only matches
# by actually decoding each image.  All integer: |Gx|, |Gy| <= 4*255,
# 36 interior pixels, 3 channels — per-image energy < 2^18.


class _ImageGrad:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        dec = np.stack(
            [self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0)) for i in range(n)]
        ).astype(np.int64) if n else np.zeros((0, 8, 8, 3), dtype=np.int64)
        # vectorized 3x3 Sobel on the 6x6 interior, all n images at once
        p = dec  # (n, 8, 8, 3)
        gx = (
            p[:, :-2, 2:] + 2 * p[:, 1:-1, 2:] + p[:, 2:, 2:]
            - p[:, :-2, :-2] - 2 * p[:, 1:-1, :-2] - p[:, 2:, :-2]
        )
        gy = (
            p[:, 2:, :-2] + 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:]
            - p[:, :-2, :-2] - 2 * p[:, :-2, 1:-1] - p[:, :-2, 2:]
        )
        energy = (np.abs(gx) + np.abs(gy)).sum(axis=(1, 2))  # (n, 3)
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "grad_r": pa.array(energy[:, 0], type=pa.int64()),
                "grad_g": pa.array(energy[:, 1], type=pa.int64()),
                "grad_b": pa.array(energy[:, 2], type=pa.int64()),
            }
        )


def q_image_grad(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageGrad, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_grad() -> str:
    def pix(dr: int, dc: int, k: str) -> str:
        return f"(event_id + 16 * (g.r + {dr}) + 2 * (g.c + {dc}) + {k})  % 256"

    cols = []
    for name, k in (("grad_r", "0"), ("grad_g", "1"), ("grad_b", "2")):
        gx = (
            f"{pix(-1, 1, k)} + 2 * ({pix(0, 1, k)}) + {pix(1, 1, k)}"
            f" - ({pix(-1, -1, k)}) - 2 * ({pix(0, -1, k)}) - ({pix(1, -1, k)})"
        )
        gy = (
            f"{pix(1, -1, k)} + 2 * ({pix(1, 0, k)}) + {pix(1, 1, k)}"
            f" - ({pix(-1, -1, k)}) - 2 * ({pix(-1, 0, k)}) - ({pix(-1, 1, k)})"
        )
        cols.append(f"CAST(SUM(ABS({gx}) + ABS({gy})) AS BIGINT) AS {name}")
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT a.r, b.c
  FROM (VALUES (1), (2), (3), (4), (5), (6)) a(r),
       (VALUES (1), (2), (3), (4), (5), (6)) b(c))
SELECT event_id, {col_block}
FROM events, g
GROUP BY event_id
"""


SQL_IMAGE_GRAD = _sql_image_grad()


# ---------------------------------------------------------------------------
# corpus pixel histogram (decode -> per-channel value distribution)
# ---------------------------------------------------------------------------
#
# The dataset-audit shape every image-training pipeline runs before a
# job: the corpus-wide per-channel pixel-value distribution (exposure /
# drift / dead-band detection).  Each image goes through the REAL TIFF
# encode->decode roundtrip (same discipline as image_tiles/image_grad —
# the oracle predicts counts arithmetically from the mod-256 pixel
# formula, so the gate fails unless decoded pixels are bit-exact), and
# each batch collapses to a CONSTANT 256-row partial (np.bincount per
# channel) merged by a native Sum groupby.  Scale shape: the shuffle
# moves 256 rows per batch regardless of corpus size — pure
# partial-aggregate physics, no row-carrying stage anywhere.


class _ImageHist:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        dec = (
            np.stack(
                [self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0)) for i in range(n)]
            ).astype(np.int64)
            if n
            else np.zeros((0, 8, 8, 3), dtype=np.int64)
        )
        cnt = np.stack(
            [np.bincount(dec[:, :, :, ch].ravel(), minlength=256) for ch in range(3)], axis=1
        ).astype(np.int64)  # (256, 3)
        return pa.table(
            {
                "val": pa.array(np.arange(256, dtype=np.int64)),
                "cnt_r": pa.array(cnt[:, 0]),
                "cnt_g": pa.array(cnt[:, 1]),
                "cnt_b": pa.array(cnt[:, 2]),
            }
        )


def q_image_hist(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    partials = ds.map_batches(
        _ImageHist, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )
    return (
        partials.groupby("val")
        .aggregate(
            Sum(on="cnt_r", alias_name="cnt_r"),
            Sum(on="cnt_g", alias_name="cnt_g"),
            Sum(on="cnt_b", alias_name="cnt_b"),
        )
        .select_columns(["val", "cnt_r", "cnt_g", "cnt_b"])
    )


# the LEFT JOIN against range(0,256) keeps the oracle total (every bin
# present, zero-filled) even if some residue never occurs at tiny sf
SQL_IMAGE_HIST = """
WITH g AS (
  SELECT r.range AS r, c.range AS c, k.range AS k
  FROM range(0, 8) r, range(0, 8) c, range(0, 3) k),
px AS (
  SELECT g.k AS ch, (event_id + 16 * g.r + 2 * g.c + g.k) % 256 AS val
  FROM events, g),
h AS (
  SELECT val,
         SUM(CASE WHEN ch = 0 THEN 1 ELSE 0 END) AS cnt_r,
         SUM(CASE WHEN ch = 1 THEN 1 ELSE 0 END) AS cnt_g,
         SUM(CASE WHEN ch = 2 THEN 1 ELSE 0 END) AS cnt_b
  FROM px GROUP BY val)
SELECT s.range AS val,
       CAST(COALESCE(h.cnt_r, 0) AS BIGINT) AS cnt_r,
       CAST(COALESCE(h.cnt_g, 0) AS BIGINT) AS cnt_g,
       CAST(COALESCE(h.cnt_b, 0) AS BIGINT) AS cnt_b
FROM range(0, 256) s LEFT JOIN h ON h.val = s.range
"""


# ---------------------------------------------------------------------------
# image augmentation: horizontal flip through a double codec roundtrip
# ---------------------------------------------------------------------------
#
# The augmentation stage every vision-training pipeline runs: decode ->
# transform (horizontal mirror) -> RE-ENCODE -> decode downstream.
# Both TIFF roundtrips are REAL, and the gate is a position-weighted
# checksum sum(pixel * (r+1) * (c+1)) per channel whose oracle predicts
# the MIRRORED formula (c -> 7-c) arithmetically — a plain unweighted
# sum would pass even if the flip never happened or the second encode
# corrupted pixel order, so the weighting is what makes the invariant
# bite.  All integer: 255 * 64 * 72 < 2^21 per image.


class _ImageFlip:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        self.w = ((r + 1) * (c + 1)).astype(np.int64)  # (8, 8, 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        out = np.zeros((n, 3), dtype=np.int64)
        for i in range(n):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0))
            flipped = dec[:, ::-1, :]  # horizontal mirror
            dec2 = self.tiff.parse_pixels(
                self.tiff.encode_tiff(np.ascontiguousarray(flipped), 0, 0)
            ).astype(np.int64)
            out[i] = (dec2 * self.w).sum(axis=(0, 1))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_r": pa.array(out[:, 0], type=pa.int64()),
                "w_g": pa.array(out[:, 1], type=pa.int64()),
                "w_b": pa.array(out[:, 2], type=pa.int64()),
            }
        )


def q_image_flip(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageFlip, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_flip() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        # flipped pixel at (r, c) is the ORIGINAL pixel at (r, 7-c)
        cols.append(
            f"CAST(SUM(((event_id + 16 * g.r + 2 * (7 - g.c) + {k}) % 256)"
            f" * (g.r + 1) * (g.c + 1)) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 8) r, range(0, 8) c)
SELECT event_id, {col_block}
FROM events, g
GROUP BY event_id
"""


SQL_IMAGE_FLIP = _sql_image_flip()


# ---------------------------------------------------------------------------
# image augmentation: 90° rotation and center crop (same double-codec gate)
# ---------------------------------------------------------------------------
#
# Two more members of the augmentation family, sharing image_flip's
# physics (decode -> transform -> RE-ENCODE -> decode, both TIFF
# roundtrips real) and its position-weighted checksum gate: the oracle
# predicts the INDEX-REMAPPED formula arithmetically — rot90-clockwise
# reads original (7-c, r) at output (r, c); the 4x4 center crop reads
# original (r+2, c+2) — so a skipped transform, a wrong rotation
# direction, or an encode that corrupts pixel order all hash-fail.


class _ImageRot90:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        self.w = ((r + 1) * (c + 1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        out = np.zeros((n, 3), dtype=np.int64)
        for i in range(n):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0))
            rot = np.rot90(dec, k=-1)  # clockwise: rot[r, c] = dec[7-c, r]
            dec2 = self.tiff.parse_pixels(
                self.tiff.encode_tiff(np.ascontiguousarray(rot), 0, 0)
            ).astype(np.int64)
            out[i] = (dec2 * self.w).sum(axis=(0, 1))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_r": pa.array(out[:, 0], type=pa.int64()),
                "w_g": pa.array(out[:, 1], type=pa.int64()),
                "w_b": pa.array(out[:, 2], type=pa.int64()),
            }
        )


def q_image_rot90(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageRot90, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_rot90() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        # rotated pixel at (r, c) is the ORIGINAL pixel at (7-c, r)
        cols.append(
            f"CAST(SUM(((event_id + 16 * (7 - g.c) + 2 * g.r + {k}) % 256)"
            f" * (g.r + 1) * (g.c + 1)) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 8) r, range(0, 8) c)
SELECT event_id, {col_block}
FROM events, g
GROUP BY event_id
"""


SQL_IMAGE_ROT90 = _sql_image_rot90()


class _ImageCrop:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        rc = np.arange(4).reshape(4, 1, 1)
        cc = np.arange(4).reshape(1, 4, 1)
        self.w = ((rc + 1) * (cc + 1)).astype(np.int64)  # (4, 4, 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        out = np.zeros((n, 3), dtype=np.int64)
        for i in range(n):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0))
            crop = dec[2:6, 2:6, :]  # 4x4 center crop
            dec2 = self.tiff.parse_pixels(
                self.tiff.encode_tiff(np.ascontiguousarray(crop), 0, 0)
            ).astype(np.int64)
            out[i] = (dec2 * self.w).sum(axis=(0, 1))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_r": pa.array(out[:, 0], type=pa.int64()),
                "w_g": pa.array(out[:, 1], type=pa.int64()),
                "w_b": pa.array(out[:, 2], type=pa.int64()),
            }
        )


def q_image_crop(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageCrop, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_crop() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        # cropped pixel at (r, c) is the ORIGINAL pixel at (r+2, c+2)
        cols.append(
            f"CAST(SUM(((event_id + 16 * (g.r + 2) + 2 * (g.c + 2) + {k}) % 256)"
            f" * (g.r + 1) * (g.c + 1)) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 4) r, range(0, 4) c)
SELECT event_id, {col_block}
FROM events, g
GROUP BY event_id
"""


SQL_IMAGE_CROP = _sql_image_crop()


# ---------------------------------------------------------------------------
# video scene-cut detection (temporal frame-delta through real decode)
# ---------------------------------------------------------------------------
#
# The temporal member of the video family: every clip decodes ALL
# frames through the REAL raw-video container (FrameSample with
# every_n=1 — the same extraction path as video_frames, exercised
# densely), and consecutive frames reduce to an exact integer L1 delta
# energy; a cut is a delta whose mean exceeds half the value range.
# The synthetic fills step by 13 mod 256, so deltas are 13 except at
# wrap points where they hit 243 — the oracle enumerates both
# arithmetically, and the Ray side only agrees by actually slicing and
# differencing real frame bytes (192 pixels/frame, energy = 192 * |Δ|).

SCENE_CUT_MIN = 128  # per-pixel mean delta threshold (value range / 2)


class _SceneCuts:
    def __init__(self):
        from ..sources.rawvideo import encode_rawvideo
        from ..stages.image_ops import FrameSample

        self.encode = encode_rawvideo
        self.sampler = FrameSample(every_n=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bufs = []
        for e in eid:
            nf = int(20 + e % 11)
            fills = ((e * 7 + np.arange(nf, dtype=np.int64) * 13) % 256).astype(np.uint8)
            frames = np.ascontiguousarray(
                np.broadcast_to(fills[:, None, None, None], (nf, 8, 8, 3))
            )
            bufs.append(self.encode(frames))
        t = pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "bytes": pa.array(bufs, type=pa.binary()),
            }
        )
        out = self.sampler(t)
        frame_lists = out.column("frames_rgb").to_pylist()
        cuts, energy = [], []
        for fl in frame_lists:
            fr = np.stack([np.frombuffer(fb, dtype=np.uint8) for fb in fl]).astype(
                np.int64
            )  # (nf, 192)
            d = np.abs(np.diff(fr, axis=0)).sum(axis=1)  # exact int energy per step
            cuts.append(int((d >= SCENE_CUT_MIN * 192).sum()))
            energy.append(int(d.sum()))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "n_cuts": pa.array(cuts, type=pa.int64()),
                "delta_energy": pa.array(energy, type=pa.int64()),
            }
        )


def q_scene_cuts(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _SceneCuts, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_SCENE_CUTS = f"""
WITH f AS (
  SELECT event_id,
         unnest(generate_series(0, (20 + event_id % 11) - 2)) AS k
  FROM events),
d AS (
  SELECT event_id,
         abs(((event_id * 7 + (k + 1) * 13) % 256)
             - ((event_id * 7 + k * 13) % 256)) AS dv
  FROM f)
SELECT event_id,
       CAST(SUM(CASE WHEN dv >= {SCENE_CUT_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(SUM(dv) * 192 AS BIGINT) AS delta_energy
FROM d GROUP BY event_id
"""


# ---------------------------------------------------------------------------
# image resize (nearest-neighbor 2x downsample through the real codec)
# ---------------------------------------------------------------------------
#
# The preprocessing resize stage of a multimodal pipeline: each 8x8x3
# synthetic image round-trips the REAL TIFF codec, downsamples 2x by
# nearest-neighbor (output (r, c) = original (2r, 2c)), re-encodes the
# 4x4 result through the codec again, and reduces to the per-channel
# (r+1)(c+1)-weighted checksum.  The oracle enumerates the sampled
# original pixels arithmetically — it can only agree if both codec
# passes and the stride sampling are bit-exact.

class _ImageResize:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        rc = np.arange(4).reshape(4, 1, 1)
        cc = np.arange(4).reshape(1, 4, 1)
        self.w = ((rc + 1) * (cc + 1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        out = np.zeros((n, 3), dtype=np.int64)
        for i in range(n):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0))
            small = dec[::2, ::2, :]  # nearest-neighbor 2x downsample
            dec2 = self.tiff.parse_pixels(
                self.tiff.encode_tiff(np.ascontiguousarray(small), 0, 0)
            ).astype(np.int64)
            out[i] = (dec2 * self.w).sum(axis=(0, 1))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_r": pa.array(out[:, 0], type=pa.int64()),
                "w_g": pa.array(out[:, 1], type=pa.int64()),
                "w_b": pa.array(out[:, 2], type=pa.int64()),
            }
        )


def q_image_resize(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageResize, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_resize() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        # resized pixel at (r, c) is the ORIGINAL pixel at (2r, 2c)
        cols.append(
            f"CAST(SUM(((event_id + 16 * (2 * g.r) + 2 * (2 * g.c) + {k}) % 256)"
            f" * (g.r + 1) * (g.c + 1)) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 4) r, range(0, 4) c)
SELECT event_id, {col_block}
FROM events, g
GROUP BY event_id
"""


SQL_IMAGE_RESIZE = _sql_image_resize()


# ---------------------------------------------------------------------------
# image luma (integer grayscale conversion through the real codec)
# ---------------------------------------------------------------------------
#
# The canonical RGB -> grayscale preprocessing stage with the
# fixed-point BT.601-style integer kernel (77 R + 150 G + 29 B) >> 8 —
# weights sum to 256 so the result stays a clean uint8 with NO float
# anywhere.  Decode is the real TIFF path; the oracle reproduces the
# same truncating integer arithmetic per pixel.

class _ImageLuma:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        rr = np.arange(8).reshape(8, 1)
        cc = np.arange(8).reshape(1, 8)
        self.w = ((rr + 1) * (cc + 1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        wsum = np.zeros(n, dtype=np.int64)
        lsum = np.zeros(n, dtype=np.int64)
        for i in range(n):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0)).astype(np.int64)
            luma = (77 * dec[:, :, 0] + 150 * dec[:, :, 1] + 29 * dec[:, :, 2]) >> 8
            wsum[i] = (luma * self.w).sum()
            lsum[i] = luma.sum()
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_luma": pa.array(wsum, type=pa.int64()),
                "sum_luma": pa.array(lsum, type=pa.int64()),
            }
        )


def q_image_luma(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageLuma, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_IMAGE_LUMA = """
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 8) r, range(0, 8) c),
px AS (
  SELECT event_id, g.r, g.c,
         (77 * ((event_id + 16 * g.r + 2 * g.c + 0) % 256)
          + 150 * ((event_id + 16 * g.r + 2 * g.c + 1) % 256)
          + 29 * ((event_id + 16 * g.r + 2 * g.c + 2) % 256)) // 256 AS luma
  FROM events, g)
SELECT event_id,
       CAST(SUM(luma * (r + 1) * (c + 1)) AS BIGINT) AS w_luma,
       CAST(SUM(luma) AS BIGINT) AS sum_luma
FROM px GROUP BY event_id
"""


# ---------------------------------------------------------------------------
# image 3x3 box convolution (the conv-kernel shape through the real codec)
# ---------------------------------------------------------------------------
#
# A 3x3 box neighborhood sum over the valid 6x6 interior — the
# structural shape of every convolution stage (sliding window over
# decoded pixels), kept in exact integers by skipping the kernel
# division.  The oracle enumerates the window algebraically with two
# offset ranges; agreement requires the real decode and the exact
# window geometry.

class _ImageConv3:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        rr = np.arange(1, 7).reshape(6, 1)
        cc = np.arange(1, 7).reshape(1, 6)
        self.w = (rr * cc).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        out = np.zeros((n, 3), dtype=np.int64)
        for i in range(n):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0)).astype(np.int64)
            # vectorized 3x3 box sum over the valid interior
            s = np.zeros((6, 6, 3), dtype=np.int64)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    s += dec[1 + dr : 7 + dr, 1 + dc : 7 + dc, :]
            out[i] = (s * self.w[:, :, None]).sum(axis=(0, 1))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_r": pa.array(out[:, 0], type=pa.int64()),
                "w_g": pa.array(out[:, 1], type=pa.int64()),
                "w_b": pa.array(out[:, 2], type=pa.int64()),
            }
        )


def q_image_conv3(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageConv3, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_conv3() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        cols.append(
            f"CAST(SUM(((event_id + 16 * (g.r + d.dr) + 2 * (g.c + d.dc) + {k}) % 256)"
            f" * g.r * g.c) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(1, 7) r, range(1, 7) c),
d AS (
  SELECT a.range AS dr, b.range AS dc FROM range(-1, 2) a, range(-1, 2) b)
SELECT event_id, {col_block}
FROM events, g, d
GROUP BY event_id
"""


SQL_IMAGE_CONV3 = _sql_image_conv3()


# ---------------------------------------------------------------------------
# windowed audio energy (frame-level feature extraction via the real codec)
# ---------------------------------------------------------------------------
#
# The frame-level sibling of audio_features: each clip's samples decode
# through the REAL RIFF/PCM path, then reduce to per-256-sample-frame
# integer energy (count, sum of squares, peak) — the framing stage
# every audio featurizer (MFCC, VAD) starts with.  The oracle
# reproduces frames arithmetically from the closed-form generator;
# agreement requires the container parse, PCM decode, and frame
# geometry all bit-exact.

_AUDIO_FRAME = 256


class _AudioWindows:
    def __init__(self):
        from ..sources.wav import decode_wav, encode_wav

        self.encode = encode_wav
        self.decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ids, frames, counts, sumsq, peaks = [], [], [], [], []
        for e in eid:
            k = 1 + (e % 32)
            nn = 1024 + (e % 7) * 128
            n = np.arange(nn, dtype=np.int64)
            s16 = (((n * k + e * 7919) % 65536) - 32768).astype(np.int16)
            _, dec = self.decode(self.encode(s16, rate=16000))
            s = np.asarray(dec).ravel().astype(np.int64)
            fr = np.arange(len(s)) // _AUDIO_FRAME
            nf = int(fr[-1]) + 1 if len(s) else 0
            cnt = np.bincount(fr, minlength=nf).astype(np.int64)
            ss = np.zeros(nf, dtype=np.int64)
            np.add.at(ss, fr, s * s)
            pk = np.zeros(nf, dtype=np.int64)
            np.maximum.at(pk, fr, np.abs(s))
            ids.append(np.full(nf, e))
            frames.append(np.arange(nf, dtype=np.int64))
            counts.append(cnt)
            sumsq.append(ss)
            peaks.append(pk)
        cat = lambda xs: np.concatenate(xs) if xs else np.array([], dtype=np.int64)
        return pa.table(
            {
                "event_id": pa.array(cat(ids), type=pa.int64()),
                "frame": pa.array(cat(frames), type=pa.int64()),
                "n_samples": pa.array(cat(counts), type=pa.int64()),
                "sum_sq": pa.array(cat(sumsq), type=pa.int64()),
                "peak_abs": pa.array(cat(peaks), type=pa.int64()),
            }
        )


def q_audio_windows(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _AudioWindows, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_AUDIO_WINDOWS = f"""
WITH params AS (
  SELECT event_id,
         1 + (event_id % 32) AS k,
         1024 + (event_id % 7) * 128 AS nn
  FROM events),
samples AS (
  SELECT p.event_id, g.n // {_AUDIO_FRAME} AS frame,
         ((g.n * p.k + p.event_id * 7919) % 65536) - 32768 AS s
  FROM params p, generate_series(0, 1791) AS g(n)
  WHERE g.n < p.nn)
SELECT event_id, CAST(frame AS BIGINT) AS frame,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
FROM samples GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# composed image-corpus pipeline (decode -> filter -> resize, one gate)
# ---------------------------------------------------------------------------
#
# The multimodal sibling of corpus_pipeline: a real image-curation
# chain — decode every image through the REAL codec, keep those whose
# integer luma mean clears 128 (the brightness quality filter), and
# push only the survivors through the nearest-neighbor 2x resize (a
# SECOND double codec roundtrip) — hash-gated END TO END as one
# composed query.  Two actor-pool stages with a Dataset filter between
# them; the oracle composes both closed forms under the same HAVING.

_IMGPIPE_MIN_LUMA = 128 * 64  # mean >= 128 over 64 pixels


class _ImgPipeLuma:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pix = ((eid[:, None, None, None] + self.grid[None]) % 256).astype(np.uint8)
        lsum = np.zeros(len(eid), dtype=np.int64)
        for i in range(len(eid)):
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix[i], 0, 0)).astype(np.int64)
            luma = (77 * dec[:, :, 0] + 150 * dec[:, :, 1] + 29 * dec[:, :, 2]) >> 8
            lsum[i] = luma.sum()
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "sum_luma": pa.array(lsum, type=pa.int64()),
            }
        )


def q_image_pipeline(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    pool = auto_pool(pools=2)  # TWO chained actor pools share this plan
    bright = ds.map_batches(
        _ImgPipeLuma, batch_format="pyarrow", concurrency=pool, num_cpus=1
    ).filter(expr=f"sum_luma >= {_IMGPIPE_MIN_LUMA}")

    class _Resize(_ImageResize):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = _ImageResize.__call__(self, batch.select(["event_id"]))
            return out.append_column("sum_luma", batch.column("sum_luma"))

    return bright.map_batches(
        _Resize, batch_format="pyarrow", concurrency=pool, num_cpus=1
    )


def _sql_image_pipeline() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        cols.append(
            f"CAST(SUM(((event_id + 16 * (2 * g.r) + 2 * (2 * g.c) + {k}) % 256)"
            f" * (g.r + 1) * (g.c + 1)) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g8 AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 8) r, range(0, 8) c),
lum AS (
  SELECT event_id,
         SUM((77 * ((event_id + 16 * g8.r + 2 * g8.c + 0) % 256)
              + 150 * ((event_id + 16 * g8.r + 2 * g8.c + 1) % 256)
              + 29 * ((event_id + 16 * g8.r + 2 * g8.c + 2) % 256)) // 256) AS sum_luma
  FROM events, g8 GROUP BY event_id
  HAVING SUM((77 * ((event_id + 16 * g8.r + 2 * g8.c + 0) % 256)
              + 150 * ((event_id + 16 * g8.r + 2 * g8.c + 1) % 256)
              + 29 * ((event_id + 16 * g8.r + 2 * g8.c + 2) % 256)) // 256)
         >= {_IMGPIPE_MIN_LUMA}),
g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 4) r, range(0, 4) c)
SELECT lum.event_id, {col_block},
       CAST(MAX(lum.sum_luma) AS BIGINT) AS sum_luma
FROM lum, g
GROUP BY lum.event_id
"""


SQL_IMAGE_PIPELINE = _sql_image_pipeline()


# ---------------------------------------------------------------------------
# audio resample (decimation) through the REAL codec, both directions
# ---------------------------------------------------------------------------
#
# The sample-rate-conversion stage under every audio-training pipeline:
# decode the RIFF/PCM payload (real container parse), decimate 2:1
# (every other sample — the exact-integer half of a polyphase
# resampler), re-encode at the halved rate, decode AGAIN, and emit
# count / sum / energy / peak of the decimated stream — so the gate
# covers two full codec roundtrips plus the rate-field rewrite.  The
# oracle is the closed form of the surviving (even-index) samples.

class _AudioResample:
    def __init__(self):
        from ..sources.wav import decode_wav, encode_wav

        self.encode = encode_wav
        self.decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_out = np.zeros(len(eid), dtype=np.int64)
        sum_s = np.zeros(len(eid), dtype=np.int64)
        sum_sq = np.zeros(len(eid), dtype=np.int64)
        peak = np.zeros(len(eid), dtype=np.int64)
        rate_ok = np.zeros(len(eid), dtype=bool)
        for i, e in enumerate(eid):
            k = 1 + (e % 32)
            nn = 1024 + (e % 7) * 128
            n = np.arange(nn, dtype=np.int64)
            s16 = (((n * k + e * 7919) % 65536) - 32768).astype(np.int16)
            _, dec = self.decode(self.encode(s16, rate=16000))
            half = np.asarray(dec).ravel()[::2]  # 2:1 decimation
            rate2, dec2 = self.decode(self.encode(half.astype(np.int16), rate=8000))
            s = np.asarray(dec2).ravel().astype(np.int64)
            rate_ok[i] = rate2 == 8000
            n_out[i] = len(s)
            sum_s[i] = s.sum()
            sum_sq[i] = (s * s).sum()
            peak[i] = np.abs(s).max() if len(s) else 0
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "rate_ok": pa.array(rate_ok, type=pa.bool_()),
                "n_out": pa.array(n_out, type=pa.int64()),
                "sum_s": pa.array(sum_s, type=pa.int64()),
                "sum_sq": pa.array(sum_sq, type=pa.int64()),
                "peak_abs": pa.array(peak, type=pa.int64()),
            }
        )


def q_audio_resample(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _AudioResample, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_AUDIO_RESAMPLE = """
WITH params AS (
  SELECT event_id,
         1 + (event_id % 32) AS k,
         1024 + (event_id % 7) * 128 AS nn
  FROM events),
samples AS (
  SELECT p.event_id,
         ((g.n * p.k + p.event_id * 7919) % 65536) - 32768 AS s
  FROM params p, generate_series(0, 1791) AS g(n)
  WHERE g.n < p.nn AND g.n % 2 = 0)
SELECT event_id, TRUE AS rate_ok,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(s) AS BIGINT) AS sum_s,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
FROM samples GROUP BY 1
"""


# ---------------------------------------------------------------------------
# image alpha blend (integer mixup augmentation) through the REAL codec
# ---------------------------------------------------------------------------
#
# The mixup/composite augmentation: decode TWO deterministic source
# images through the real TIFF codec, alpha-blend them in exact
# integer arithmetic  b = (a*p1 + (255-a)*p2) // 255  with a per-image
# alpha a = event_id % 256, roundtrip the BLENDED image through the
# codec once more, and emit the per-channel position-weighted sums.
# Three codec passes per row; the oracle is the grid closed form of
# the same integer blend.

class _ImageBlend:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        self.w = ((r.reshape(8, 1) + 1) * (c.reshape(1, 8) + 1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        out = np.zeros((n, 3), dtype=np.int64)
        for i, e in enumerate(eid):
            p1 = ((e + self.grid) % 256).astype(np.uint8)
            p2 = ((3 * e + self.grid + 97) % 256).astype(np.uint8)
            d1 = self.tiff.parse_pixels(self.tiff.encode_tiff(p1, 0, 0)).astype(np.int64)
            d2 = self.tiff.parse_pixels(self.tiff.encode_tiff(p2, 0, 0)).astype(np.int64)
            a = int(e % 256)
            blend = ((a * d1 + (255 - a) * d2) // 255).astype(np.uint8)
            d3 = self.tiff.parse_pixels(self.tiff.encode_tiff(blend, 0, 0)).astype(np.int64)
            out[i] = (d3 * self.w[:, :, None]).sum(axis=(0, 1))
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_r": pa.array(out[:, 0], type=pa.int64()),
                "w_g": pa.array(out[:, 1], type=pa.int64()),
                "w_b": pa.array(out[:, 2], type=pa.int64()),
            }
        )


def q_image_blend(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageBlend, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


def _sql_image_blend() -> str:
    cols = []
    for name, k in (("w_r", "0"), ("w_g", "1"), ("w_b", "2")):
        p1 = f"((event_id + 16 * g.r + 2 * g.c + {k}) % 256)"
        p2 = f"((3 * event_id + 16 * g.r + 2 * g.c + {k} + 97) % 256)"
        blend = f"(((event_id % 256) * {p1} + (255 - event_id % 256) * {p2}) // 255)"
        cols.append(
            f"CAST(SUM({blend} * (g.r + 1) * (g.c + 1)) AS BIGINT) AS {name}"
        )
    col_block = ",\n       ".join(cols)
    return f"""
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 8) r, range(0, 8) c)
SELECT event_id, {col_block}
FROM events, g
GROUP BY event_id
"""


SQL_IMAGE_BLEND = _sql_image_blend()


# ---------------------------------------------------------------------------
# region revenue rollup (reverse geocode composed with exact money OLAP)
# ---------------------------------------------------------------------------
#
# The engine's two halves in ONE gate: every event's synthesized point
# is reverse-geocoded against the broadcast admin index (the flagship
# PIP join, same winner rule as reverse_pip), and event value rolls up
# to exact integer cents PER REGION — "revenue by country/region" on
# geo-tagged points, the composition a geo-analytics user actually
# ships.  100-TB shape: the PIP lookup AND the money fold happen in
# the same per-batch pass (one actor-pool stage holding the immutable
# index), so the only shuffle is the admin-cardinality Sum merge —
# point rows never leave their read task.  Misses roll up under
# admin_id 0, so the gate also pins the miss mass.

class _RegionValuePartials:
    def __init__(self, index_ref):
        import ray

        from ..stages.reverse import AdminIndex  # noqa: F401 (type context)

        self.index = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        lon, lat = _pip_lonlat(eid)
        win = self.index.locate(lon, lat)
        admin = np.where(win >= 0, self.index.admin_id[np.maximum(win, 0)].astype(np.int64), 0)
        keys, inv = np.unique(admin, return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, cents)
        return pa.table(
            {
                "admin_id": pa.array(keys, type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "cents": pa.array(acc, type=pa.int64()),
            }
        )


def q_region_value(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.reverse import AdminIndex

    index_ref = ray.put(AdminIndex(_rect_admin_table(), None))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    return (
        ds.map_batches(
            _RegionValuePartials,
            fn_constructor_args=(index_ref,),
            batch_format="pyarrow",
            concurrency=auto_pool(),
            num_cpus=1,
        )
        .groupby("admin_id")
        .aggregate(Sum(on="n_events", alias_name="n_events"), Sum(on="cents", alias_name="cents"))
    )


SQL_REGION_VALUE = f"""
WITH pts AS (
  SELECT event_id,
         CAST(floor(value * 100.0) AS BIGINT) AS cents,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
{_rect_world_values_sql()},
hits AS (
  SELECT p.event_id, a.admin_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY a.level_rank DESC, a.area ASC, a.admin_id ASC) AS rn
  FROM pts p JOIN admin a
    ON p.lon > a.minx AND p.lon < a.maxx AND p.lat > a.miny AND p.lat < a.maxy)
SELECT COALESCE(h.admin_id, 0) AS admin_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(p.cents) AS BIGINT) AS cents
FROM pts p LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h USING (event_id)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# place popularity (forward geocode composed with fact-side revenue)
# ---------------------------------------------------------------------------
#
# The forward-side sibling of region_value: every customer's caption is
# forward-geocoded through the real ForwardJoiner (broadcast gazetteer
# index), customer ORDER revenue is pre-aggregated on the fact side
# BEFORE any join (the Q5 discipline — the orders table is never
# shuffled at full width), and both slim marts meet in one
# customer-keyed join; the final rollup is place-cardinality tiny.
# Customers with no orders stay in the report via the left join
# (cents 0), so the gate pins the zero-revenue mass too.

def q_place_popularity(sf_dir: str):
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.forward import ForwardJoiner, GazetteerIndex
    from .olap_queries import _scrub_empties

    index_ref = ray.put(GazetteerIndex(_nation_gazetteer(sf_dir)))
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    key2name = {
        int(k): n
        for k, n in zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    }

    def mk_query(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "query_id": batch.column("c_custkey").cast(pa.int64()),
                "caption": pa.array(
                    [f"photo near {key2name[int(x)]}" for x in nk], type=pa.string()
                ),
            }
        )

    cust = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        .map_batches(mk_query, batch_format="pyarrow")
        .map_batches(
            ForwardJoiner,
            fn_constructor_args=(index_ref, ForwardConfig(ignore_oov=True)),
            fn_constructor_kwargs={"query_col": "caption", "id_col": "query_id"},
            batch_format="pyarrow",
            concurrency=auto_pool(),
            num_cpus=1,
        )
        .select_columns(["query_id", "top_name"])
    )

    def rev_partials(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keys, inv = np.unique(ck, return_inverse=True)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, cents)
        return pa.table(
            {
                "query_id": pa.array(keys, type=pa.int64()),
                "cents": pa.array(acc, type=pa.int64()),
            }
        )

    rev = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(rev_partials, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(Sum(on="cents", alias_name="cents"))
    )

    j = _scrub_empties(cust, 8).join(
        _scrub_empties(rev, 8), join_type="left_outer", on=("query_id",), num_partitions=8
    )

    def partials(batch: pa.Table) -> pa.Table:
        name = np.asarray(batch.column("top_name").to_pylist(), dtype=object)
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(cents.astype(np.float64)), 0, cents).astype(np.int64)
        keys, inv = np.unique(name.astype(str), return_inverse=True)
        n = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        acc = np.zeros(len(keys), dtype=np.int64)
        np.add.at(acc, inv, cents)
        return pa.table(
            {
                "top_name": pa.array(keys.tolist(), type=pa.string()),
                "n_customers": pa.array(n, type=pa.int64()),
                "cents": pa.array(acc, type=pa.int64()),
            }
        )

    return (
        j.map_batches(partials, batch_format="pyarrow")
        .groupby("top_name")
        .aggregate(
            Sum(on="n_customers", alias_name="n_customers"),
            Sum(on="cents", alias_name="cents"),
        )
    )


SQL_PLACE_POPULARITY = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1)
SELECT n.n_name AS top_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(COALESCE(r.cents, 0)) AS BIGINT) AS cents
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN rev r ON r.o_custkey = c.c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# image histogram equalization (contrast normalization) via the real codec
# ---------------------------------------------------------------------------
#
# The classic preprocessing step before feature extraction: decode the
# deterministic 8x8 RGB image through the real TIFF codec, build its
# integer-luma histogram, remap every pixel's luma through the
# cumulative distribution  m = (cdf(l) * 255) // npix  (the pure-
# integer equalization rule), roundtrip the remapped single-channel
# image through the codec (replicated to RGB), and emit the position-
# weighted sum plus the min/max of the equalized lumas (the gate that
# the stretch actually happened).  The oracle rebuilds the same CDF
# with a window count — integer end to end.

class _ImageEqualize:
    def __init__(self):
        from ..sources import tiff

        self.tiff = tiff
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        self.grid = (16 * r + 2 * c + k).astype(np.int64)
        self.w = ((np.arange(8).reshape(8, 1) + 1) * (np.arange(8).reshape(1, 8) + 1)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(eid)
        wsum = np.zeros(n, dtype=np.int64)
        lmin = np.zeros(n, dtype=np.int64)
        lmax = np.zeros(n, dtype=np.int64)
        for i, e in enumerate(eid):
            pix = ((e + self.grid) % 256).astype(np.uint8)
            dec = self.tiff.parse_pixels(self.tiff.encode_tiff(pix, 0, 0)).astype(np.int64)
            luma = (77 * dec[:, :, 0] + 150 * dec[:, :, 1] + 29 * dec[:, :, 2]) >> 8
            # integer equalization: m = (cdf(l) * 255) // 64
            hist = np.bincount(luma.ravel(), minlength=256)
            cdf = np.cumsum(hist)
            m = (cdf[luma] * 255) // luma.size
            rgb = np.repeat(m.astype(np.uint8)[:, :, None], 3, axis=2)
            dec2 = self.tiff.parse_pixels(
                self.tiff.encode_tiff(np.ascontiguousarray(rgb), 0, 0)
            ).astype(np.int64)
            eq = dec2[:, :, 0]
            wsum[i] = (eq * self.w).sum()
            lmin[i] = eq.min()
            lmax[i] = eq.max()
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "w_sum": pa.array(wsum, type=pa.int64()),
                "eq_min": pa.array(lmin, type=pa.int64()),
                "eq_max": pa.array(lmax, type=pa.int64()),
            }
        )


def q_image_equalize(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(
        _ImageEqualize, batch_format="pyarrow", concurrency=auto_pool(), num_cpus=1
    )


SQL_IMAGE_EQUALIZE = """
WITH g AS (
  SELECT r.range AS r, c.range AS c FROM range(0, 8) r, range(0, 8) c),
pix AS (
  SELECT event_id, g.r, g.c,
         (77 * ((event_id + 16 * g.r + 2 * g.c + 0) % 256)
          + 150 * ((event_id + 16 * g.r + 2 * g.c + 1) % 256)
          + 29 * ((event_id + 16 * g.r + 2 * g.c + 2) % 256)) // 256 AS l
  FROM events, g),
cdf AS (
  SELECT event_id, r, c,
         COUNT(*) OVER (PARTITION BY event_id ORDER BY l
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl
  FROM pix),
eq AS (
  SELECT event_id, r, c, (cl * 255) // 64 AS m FROM cdf)
SELECT event_id,
       CAST(SUM(m * (r + 1) * (c + 1)) AS BIGINT) AS w_sum,
       CAST(MIN(m) AS BIGINT) AS eq_min,
       CAST(MAX(m) AS BIGINT) AS eq_max
FROM eq GROUP BY event_id
"""
