"""Deterministic synthetic world + image fixtures (FIXTURES.md).

Generates, with fixed seeds and no wall-clock:

* ``admin_boundaries`` — nested Natural-Earth-like polygons
  (country > state > city > suburb), including golden rows ported from the
  reference's canned test responses (opencage.rs:716-920,
  openstreetmap.rs:410-475, geoadmin.rs:448-679);
* ``gazetteer`` — place rows shaped like ``ForwardLocationProperties``
  (geoadmin.rs:375-389) incl. the golden forward answers;
* ``images`` — the input table per BASELINE.json input_hint: minimal TIFF
  bytes with an EXIF GPS IFD (exact e7 rationals), seeded RGB pixels,
  captions naming gazetteer places;
* ``images_truth`` — generator-side ground truth (never read by
  pipelines; used by tests only).

Golden polygons are exact rectangles (containment known a priori);
procedural polygons get seeded edge jitter smaller than the sampling
margin, so sampled points remain inside their intended polygon while the
PIP kernel still sees non-trivial shapes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.normalize import normalize_text
from ..state import cells
from . import tiff
from .schemas import ADMIN_SCHEMA, COMPONENT_FIELDS, COMPONENT_LANG_FIELDS, GAZETTEER_SCHEMA, IMAGES_SCHEMA

E7 = 10_000_000
LEVEL_RANK = {"country": 1, "state": 2, "county": 3, "city": 4, "suburb": 5, "postcode_zone": 6}

# ---------------------------------------------------------------------------
# Golden world (exact rectangles; coordinates around the reference's test
# points so the golden conformance rows of FIXTURES.md §4 resolve exactly).
# ---------------------------------------------------------------------------

_G = [
    # (name, level, (minx, miny, maxx, maxy), components, formatted)
    ("Spain", "country", (0.0, 39.0, 4.0, 43.0), {"country": "Spain", "country_code": "es", "country_fr": "Espagne"}, "Spain"),
    ("Catalunya", "state", (1.5, 40.5, 3.5, 42.5), {"state": "Catalunya", "country": "Spain", "country_code": "es", "country_fr": "Espagne"}, "Catalunya, Spain"),
    (
        "Barcelona",
        "city",
        (2.0, 41.3, 2.3, 41.5),
        {"city": "Barcelona", "city_fr": "Barcelone", "state": "Catalunya", "country": "Spain", "country_code": "es", "country_fr": "Espagne", "postcode": "08017"},
        "08017 Barcelona, Spain",
    ),
    (
        "Sarria-Sant Gervasi",
        "suburb",
        (2.10, 41.39, 2.15, 41.41),
        {
            "suburb": "Sarrià - Sant Gervasi",
            "neighbourhood": "les Tres Torres",
            "road": "Carrer de Calatrava",
            "house_number": "64",
            "postcode": "08017",
            "city": "Barcelona",
            "city_fr": "Barcelone",
            "county": "Barcelonès",
            "state": "Catalunya",
            "country": "Spain",
            "country_code": "es",
            "country_fr": "Espagne",
        },
        # exact OpenCage golden (opencage.rs:728)
        "Carrer de Calatrava, 64, 08017 Barcelona, Spain",
    ),
    ("Germany", "country", (6.0, 48.0, 15.0, 55.0), {"country": "Germany", "country_code": "de", "country_fr": "Allemagne"}, "Germany"),
    ("Bayern", "state", (9.0, 48.0, 13.5, 50.5), {"state": "Bayern", "country": "Germany", "country_code": "de"}, "Bayern, Germany"),
    ("Munchen", "city", (11.4, 48.05, 11.7, 48.25), {"city": "München", "state": "Bayern", "country": "Germany", "country_code": "de"}, "München, Bayern, Germany"),
    (
        "Schwabing",
        "suburb",
        (11.55, 48.15, 11.62, 48.19),
        {"suburb": "Schwabing", "city": "München", "state": "Bayern", "country": "Germany", "country_code": "de"},
        "Schwabing, München, Bayern, Germany",
    ),
    ("Berlin", "city", (13.1, 52.3, 13.8, 52.7), {"city": "Berlin", "country": "Germany", "country_code": "de"}, "Berlin, Germany"),
    (
        "Moabit",
        "suburb",
        (13.30, 52.52, 13.37, 52.54),
        {"suburb": "Moabit", "city": "Berlin", "country": "Germany", "country_code": "de"},
        # exact golden (opencage.rs:907-920)
        "Moabit, Berlin, Germany",
    ),
    ("United Kingdom", "country", (-8.0, 49.9, 1.8, 59.0), {"country": "United Kingdom", "country_code": "gb", "country_fr": "Royaume-Uni"}, "United Kingdom"),
    ("London", "city", (-0.5, 51.3, 0.3, 51.7), {"city": "London", "country": "United Kingdom", "country_code": "gb", "postcode": "W1T"}, "London, United Kingdom"),
    (
        "Fitzrovia",
        "suburb",
        (-0.145, 51.515, -0.130, 51.525),
        {"suburb": "Fitzrovia", "road": "Tottenham Court Road", "house_number": "90", "postcode": "W1T 4TJ", "city": "London", "country": "United Kingdom", "country_code": "gb"},
        "90 Tottenham Court Road, London, United Kingdom",
    ),
    ("Switzerland", "country", (5.9, 45.8, 10.5, 47.8), {"country": "Switzerland", "country_code": "ch", "country_fr": "Suisse"}, "Switzerland"),
    ("Bern", "state", (7.0, 46.5, 8.0, 47.3), {"state": "Bern", "country": "Switzerland", "country_code": "ch"}, "Bern, Switzerland"),
    (
        "Wabern",
        "suburb",
        (7.40, 46.90, 7.50, 46.95),
        {"suburb": "Wabern", "city": "Köniz", "postcode": "3084", "road": "Seftigenstrasse", "house_number": "264", "country": "Switzerland", "country_code": "ch"},
        "Seftigenstrasse 264, 3084 Wabern",  # exact golden (geoadmin.rs:676)
    ),
]

# Golden gazetteer rows: (name, detail-source, lon, lat, origin, rank, weight,
# importance, confidence, label, house_number, strname_deinr, dplz4, dplzname,
# country_code)
_G_PLACES = [
    ("Schwabing", "Schwabing München", 11.5884858, 48.1700887, "district", 5, 1000, 0.85, 9, "Schwabing, München", None, None, None, None, "de"),
    (
        "UCL Centre for Advanced Spatial Analysis",
        "UCL Centre for Advanced Spatial Analysis 90 Tottenham Court Road London",
        -0.13605, 51.52108, "address", 7, 500, 0.72, 9,
        "90 Tottenham Court Road, London", "90", None, None, None, "gb",
    ),
    ("Moabit", "Moabit Berlin Germany", 13.34256, 52.52697, "district", 5, 900, 0.80, 9, "Moabit, Berlin, Germany", None, None, None, None, "de"),
    (
        "Seftigenstrasse 264",
        "Seftigenstrasse 264 3084 Wabern 355 Köniz ch be",
        7.451352119445801, 46.92793655395508, "address", 7, 400, 0.65, 10,
        "Seftigenstrasse 264, 3084 Wabern", "264", "Seftigenstrasse 264", 3084, "Wabern", "ch",
    ),
    ("Carrer de Calatrava 64", "Carrer de Calatrava 64 08017 Barcelona Spain", 2.1287, 41.40139, "address", 7, 450, 0.70, 9, "Carrer de Calatrava, 64, 08017 Barcelona, Spain", "64", None, None, None, "es"),
]

_STREET_WORDS = ["maple", "oak", "cedar", "birch", "elm", "pine", "aspen", "willow", "laurel", "hazel"]
_CITY_WORDS = ["port", "fort", "lake", "mount", "east", "west", "north", "south", "new", "old"]
_CITY_SUFFIX = ["ton", "ville", "burg", "field", "ford", "haven", "mouth", "stead", "wick", "dale"]


def _jitter_ring(minx, miny, maxx, maxy, rng, amp, pts_per_edge=4) -> list[list[float]]:
    """Rectangle ring with jittered intermediate vertices (closed)."""
    corners = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
    ring = []
    for i in range(4):
        x0, y0 = corners[i]
        x1, y1 = corners[(i + 1) % 4]
        for t in np.linspace(0, 1, pts_per_edge, endpoint=False):
            jx = rng.uniform(-amp, amp) if t > 0 else 0.0
            jy = rng.uniform(-amp, amp) if t > 0 else 0.0
            ring.append([x0 + (x1 - x0) * t + jx, y0 + (y1 - y0) * t + jy])
    ring.append(list(ring[0]))
    return ring


def _rect_ring(minx, miny, maxx, maxy) -> list[list[float]]:
    return [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]


def build_world(seed: int = 42, n_countries: int = 6):
    """Build the admin + gazetteer pyarrow tables and sampling metadata.

    Returns (admin_table, gazetteer_table, sample_boxes) where
    ``sample_boxes`` is a list of (minx, miny, maxx, maxy, admin_id) inner
    boxes guaranteed inside their deepest polygon (for image sampling).
    """
    rng = np.random.RandomState(seed)
    rows: list[dict] = []
    sample_boxes: list[tuple[float, float, float, float, int]] = []
    admin_id = 1

    def add(name, level, box, comps, formatted, rings=None, samplable=False):
        nonlocal admin_id
        minx, miny, maxx, maxy = box
        if rings is None:
            rings = [_rect_ring(minx, miny, maxx, maxy)]
        row = {
            "admin_id": admin_id,
            "name": name,
            "level": level,
            "level_rank": LEVEL_RANK[level],
            "rings": rings,
            "minx": minx,
            "miny": miny,
            "maxx": maxx,
            "maxy": maxy,
            "area": (maxx - minx) * (maxy - miny),
            "formatted": formatted,
        }
        for f in COMPONENT_FIELDS:
            row[f] = comps.get(f)
        row["city_fr"] = comps.get("city_fr")
        row["country_fr"] = comps.get("country_fr")
        # county key used in golden comps maps to component field "city_district"? no —
        # AddressDetails has no "county"; keep it in suburb name hierarchy only.
        rows.append(row)
        if samplable:
            mx = (maxx - minx) * 0.15
            my = (maxy - miny) * 0.15
            sample_boxes.append((minx + mx, miny + my, maxx - mx, maxy - my, admin_id))
        admin_id += 1

    # golden world
    for name, level, box, comps, formatted in _G:
        add(name, level, box, comps, formatted, samplable=(level == "suburb"))

    # procedural world in lon [-170, -100], lat [-55, 55]
    gaz_rows: list[dict] = []
    place_id = 1000

    def add_place(name, detail_src, lon, lat, origin, rank, weight, importance, confidence, label, house_number=None, strname_deinr=None, dplz4=None, dplzname=None, country_code=None):
        nonlocal place_id
        gaz_rows.append(
            {
                "place_id": place_id,
                "name": name,
                "detail": normalize_text(detail_src),
                "alt_names": [name],
                "lon": float(lon),
                "lat": float(lat),
                "origin": origin,
                "country_code": country_code,
                "rank": int(rank),
                "weight": int(weight),
                "importance": float(importance),
                "confidence": int(confidence),
                "cell_id": int(cells.encode(np.array([lon]), np.array([lat]), 8)[0]),
                "label": label,
                "house_number": house_number,
                "strname_deinr": strname_deinr,
                "dplz4": dplz4,
                "dplzname": dplzname,
            }
        )
        place_id += 1

    for g in _G_PLACES:
        add_place(*g)

    for ci in range(n_countries):
        col, row_ = ci % 3, ci // 3
        cminx = -170.0 + col * 24.0
        cminy = -55.0 + row_ * 56.0
        cbox = (cminx, cminy, cminx + 20.0, cminy + 48.0)
        cname = f"{_CITY_WORDS[ci % 10].capitalize()}landia {ci}"
        ccomps = {"country": cname, "country_code": f"x{ci}"}
        add(cname, "country", cbox, ccomps, cname, rings=[_jitter_ring(*cbox, rng, 0.15)])
        for si in range(2):
            sminx = cbox[0] + 1.0 + si * 9.5
            sminy = cbox[1] + 1.0
            sbox = (sminx, sminy, sminx + 8.5, sminy + 46.0)
            sname = f"{cname} State {si}"
            scomps = dict(ccomps, state=sname)
            add(sname, "state", sbox, scomps, f"{sname}, {cname}", rings=[_jitter_ring(*sbox, rng, 0.08)])
            for yi in range(3):
                tminx = sbox[0] + 0.8
                tminy = sbox[1] + 1.0 + yi * 14.5
                tbox = (tminx, tminy, tminx + 6.5, tminy + 12.0)
                tname = f"{_CITY_WORDS[(ci + yi) % 10].capitalize()}{_CITY_SUFFIX[(si + yi) % 10]} {ci}{si}{yi}"
                tcomps = dict(scomps, city=tname, postcode=f"{10000 + ci * 1000 + si * 100 + yi * 10}")
                add(tname, "city", tbox, tcomps, f"{tname}, {sname}, {cname}", rings=[_jitter_ring(*tbox, rng, 0.05)])
                for bi in range(2):
                    bminx = tbox[0] + 0.5 + bi * 3.0
                    bminy = tbox[1] + 0.5
                    bbox_ = (bminx, bminy, bminx + 2.4, bminy + 10.8)
                    bname = f"{tname} Q{bi}"
                    bcomps = dict(tcomps, suburb=bname)
                    fm = f"{bname}, {tname}, {cname}"
                    add(bname, "suburb", bbox_, bcomps, fm, rings=[_jitter_ring(*bbox_, rng, 0.03)], samplable=True)
                    # gazetteer places inside this suburb
                    n_places = 500 if (ci == 0 and si == 0 and yi == 0 and bi == 0) else 5  # one megacity (hot cell)
                    for pi in range(n_places):
                        plon = rng.uniform(bbox_[0] + 0.2, bbox_[2] - 0.2)
                        plat = rng.uniform(bbox_[1] + 0.2, bbox_[3] - 0.2)
                        street = _STREET_WORDS[pi % 10].capitalize() + " Street"
                        pname = f"{street} {pi} {tname}"
                        add_place(
                            pname,
                            f"{pname} {sname} {cname}",
                            plon,
                            plat,
                            "address",
                            7,
                            int(rng.randint(1, 1000)),
                            float(rng.uniform(0, 1)),
                            int(rng.randint(1, 11)),
                            f"{street} {pi}, {tname}",
                            house_number=str(pi),
                            country_code=f"x{ci}",
                        )

    # isolated island places — OUTSIDE every admin polygon, for kNN fallback
    for ii in range(20):
        ilon = -95.0 + (ii % 5) * 1.0
        ilat = -40.0 + (ii // 5) * 1.0
        add_place(
            f"Isla {ii}",
            f"Isla {ii} ocean",
            ilon,
            ilat,
            "gazetteer",
            3,
            100 + ii,
            0.5,
            8,
            f"Isla {ii}",
            strname_deinr=f"Isla Way {ii}",
            dplz4=9000 + ii,
            dplzname=f"Isla {ii}",
        )

    admin_tbl = pa.Table.from_pylist(rows, schema=ADMIN_SCHEMA)
    gaz_tbl = pa.Table.from_pylist(gaz_rows, schema=GAZETTEER_SCHEMA)
    return admin_tbl, gaz_tbl, sample_boxes


# Golden image points (FIXTURES.md §4): inside the golden suburbs above.
GOLDEN_POINTS = {
    "img_golden_barcelona": (2.1287, 41.40139),
    "img_golden_wabern": (7.4513521, 46.9279366),
    "img_golden_schwabing": (11.5884858, 48.1700887),
    "img_golden_moabit": (13.3425, 52.5269),
    "img_golden_london": (-0.1360, 51.5210),
}
GOLDEN_CAPTIONS = {
    "img_golden_barcelona": "Carrer de Calatrava 64 Barcelona",
    "img_golden_wabern": "Seftigenstrasse 264, 3084 Wabern",
    "img_golden_schwabing": "Schwabing, München",
    "img_golden_moabit": "Moabit, Berlin, Germany",
    "img_golden_london": "UCL Centre for Advanced Spatial Analysis",
}


def build_images(
    n: int,
    sample_boxes,
    gaz_tbl: pa.Table,
    seed: int = 7,
    include_golden: bool = True,
    min_wh: int = 16,
    max_wh: int = 40,
    id_offset: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Build the images table + ground-truth table.

    Mix: ~72% inside a samplable suburb (PIP hit), ~10% near an island
    place (kNN fallback), ~10% mid-ocean (miss -> null), ~8% without GPS.
    All lat/lon are exact multiples of 1e-7 degrees (see tiff.py).
    """
    import hashlib

    rng = np.random.RandomState(seed)
    gnames = np.array(gaz_tbl.column("name").to_pylist(), dtype=object)
    origin = np.array(gaz_tbl.column("origin").to_pylist(), dtype=object)
    isl = origin == "gazetteer"
    isl_lon = gaz_tbl.column("lon").to_numpy(zero_copy_only=False)[isl]
    isl_lat = gaz_tbl.column("lat").to_numpy(zero_copy_only=False)[isl]
    n_boxes = len(sample_boxes)
    # dummy row when empty: np.where evaluates the pip branch eagerly
    # even though the kinds guard excludes "pip" for n_boxes == 0
    boxes = np.array([b[:4] for b in sample_boxes]) if n_boxes else np.zeros((1, 4))

    # --- vectorized draws for all n rows ---
    u = rng.uniform(size=n)
    cap_idx = rng.randint(0, len(gnames), size=n)
    box_pick = rng.randint(0, max(1, n_boxes), size=n)
    box_u1 = rng.uniform(size=n)
    box_u2 = rng.uniform(size=n)
    isl_pick = rng.randint(0, max(1, len(isl_lon)), size=n)
    jit1 = rng.uniform(-0.01, 0.01, size=n)
    jit2 = rng.uniform(-0.01, 0.01, size=n)
    ocean_lon = rng.uniform(60.0, 90.0, size=n)
    ocean_lat = rng.uniform(-50.0, 30.0, size=n)
    ws = rng.randint(min_wh, max_wh + 1, size=n)
    hs = rng.randint(min_wh, max_wh + 1, size=n)

    kinds = np.where(
        (u < 0.72) & (n_boxes > 0),
        "pip",
        np.where((u < 0.82) & (len(isl_lon) > 0), "knn", np.where(u < 0.92, "miss", "nogps")),
    )
    lon = np.where(
        kinds == "pip",
        boxes[box_pick % max(1, n_boxes), 0] + box_u1 * (boxes[box_pick % max(1, n_boxes), 2] - boxes[box_pick % max(1, n_boxes), 0]),
        np.where(kinds == "knn", (isl_lon[isl_pick % max(1, len(isl_lon))] + jit1) if len(isl_lon) else 0.0, ocean_lon),
    )
    lat = np.where(
        kinds == "pip",
        boxes[box_pick % max(1, n_boxes), 1] + box_u2 * (boxes[box_pick % max(1, n_boxes), 3] - boxes[box_pick % max(1, n_boxes), 1]),
        np.where(kinds == "knn", (isl_lat[isl_pick % max(1, len(isl_lat))] + jit2) if len(isl_lat) else 0.0, ocean_lat),
    )
    lon_e7 = np.round(lon * E7).astype(np.int64)
    lat_e7 = np.round(lat * E7).astype(np.int64)

    # one pixel pool for the whole chunk (per-image rng calls dominate
    # generation time otherwise)
    sizes = (ws.astype(np.int64) * hs.astype(np.int64) * 3)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    pool = rng.randint(0, 256, size=int(offs[-1]), dtype=np.uint8)

    ids: list[str] = []
    bufs: list[bytes] = []
    caps: list[str] = []
    phashes: list[int] = []
    t_lon: list = []
    t_lat: list = []
    t_kind: list = []

    def emit(image_id, pix, lo7, la7, caption, kind):
        if lo7 is None:
            buf = _encode_tiff_no_gps(pix)
        else:
            buf = tiff.encode_tiff(pix, int(la7), int(lo7))
        ids.append(image_id)
        bufs.append(buf)
        caps.append(caption)
        phashes.append(
            int(np.int64(np.uint64(int.from_bytes(hashlib.blake2b(pix.tobytes(), digest_size=8).digest(), "little"))))
        )
        t_lon.append((lo7 / E7) if lo7 is not None else None)
        t_lat.append((la7 / E7) if la7 is not None else None)
        t_kind.append(kind)

    g_w: list[int] = []
    g_h: list[int] = []
    if include_golden:
        grng = np.random.RandomState(seed ^ 0x5EED)
        for gid, (glon, glat) in GOLDEN_POINTS.items():
            w = int(grng.randint(min_wh, max_wh + 1))
            h = int(grng.randint(min_wh, max_wh + 1))
            pix = grng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            emit(gid, pix, round(glon * E7), round(glat * E7), GOLDEN_CAPTIONS[gid], "golden")
            g_w.append(w)
            g_h.append(h)

    for i in range(n):
        pix = pool[offs[i] : offs[i + 1]].reshape(hs[i], ws[i], 3)
        k = kinds[i]
        emit(
            f"img{i + id_offset:012d}",
            pix,
            None if k == "nogps" else int(lon_e7[i]),
            None if k == "nogps" else int(lat_e7[i]),
            f"photo near {gnames[cap_idx[i]]}",
            k,
        )

    all_w = g_w + ws.tolist()
    all_h = g_h + hs.tolist()
    images = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "bytes": pa.array(bufs, type=pa.binary()),
            "w": pa.array(all_w, type=pa.int32()),
            "h": pa.array(all_h, type=pa.int32()),
            "fmt": pa.array(["tiff"] * len(ids), type=pa.string()),
            "caption": pa.array(caps, type=pa.string()),
            "phash": pa.array(phashes, type=pa.int64()),
        }
    ).cast(IMAGES_SCHEMA)
    truth = pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "lon": pa.array(t_lon, type=pa.float64()),
            "lat": pa.array(t_lat, type=pa.float64()),
            "kind": pa.array(t_kind, type=pa.string()),
        }
    )
    return images, truth


def _encode_tiff_no_gps(pix: np.ndarray) -> bytes:
    """A GPS-less variant: encode normally then drop the GPS tag by
    rewriting the IFD entry count (entries are contiguous; the GPS pointer
    is the last entry)."""
    import struct

    buf = bytearray(tiff.encode_tiff(pix, 0, 0))
    (ifd0_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd0_off)
    # overwrite the last entry (GPS pointer) with a benign duplicate of
    # RowsPerStrip and decrement the count
    struct.pack_into("<H", buf, ifd0_off, n - 1)
    return bytes(buf)


def generate_fixture_dir(out_dir: str, n_images: int = 200, seed: int = 42, n_shards: int = 4) -> dict:
    """Write admin/gazetteer/images(+truth) parquet into ``out_dir``.

    Images are written as ``n_shards`` files (images/part-%04d.parquet) so
    Ray reads parallelize and resume tests have shard granularity.
    Idempotent: skips generation when a _SUCCESS marker exists.
    """
    marker = os.path.join(out_dir, "_SUCCESS")
    meta = {
        "admin": os.path.join(out_dir, "admin.parquet"),
        "gazetteer": os.path.join(out_dir, "gazetteer.parquet"),
        "images_dir": os.path.join(out_dir, "images"),
        "truth": os.path.join(out_dir, "images_truth.parquet"),
    }
    if os.path.exists(marker):
        return meta
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    admin_tbl, gaz_tbl, sample_boxes = build_world(seed=seed)
    pq.write_table(admin_tbl, meta["admin"])
    pq.write_table(gaz_tbl, meta["gazetteer"])
    # stream shard by shard: bounded memory, deterministic per-shard
    # seeds, golden rows in shard 0 only
    per = max(1, (n_images + n_shards - 1) // n_shards)
    truth_parts = []
    shard = 0
    for start in range(0, n_images, per):
        count = min(per, n_images - start)
        images, truth = build_images(
            count,
            sample_boxes,
            gaz_tbl,
            seed=seed + 1 + shard,
            include_golden=(shard == 0),
            id_offset=start,
        )
        pq.write_table(images, os.path.join(meta["images_dir"], f"part-{shard:04d}.parquet"))
        truth_parts.append(truth)
        shard += 1
    pq.write_table(pa.concat_tables(truth_parts), meta["truth"])
    with open(marker, "w") as f:
        f.write("ok")
    return meta
