"""GeoJSON ingest — the engine's analogue of the reference's
FeatureCollection parsing (/root/reference/src/openstreetmap.rs:234-292:
``OpenstreetmapResponse`` IS a GeoJSON FeatureCollection; geoadmin.rs
returns ``geometryFormat=geojson`` too).

Converts FeatureCollection dicts (no network, schema-on-read like the
reference's serde decode) into the engine's Arrow tables:

* Polygon / MultiPolygon features -> ``ADMIN_SCHEMA`` rows
* Point features                  -> ``GAZETTEER_SCHEMA`` rows

Coordinates are GeoJSON [lon, lat] order, matching the boundary
invariant (lib.rs:13-16).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa

from ..functions.normalize import normalize_text
from ..state import cells
from .schemas import ADMIN_SCHEMA, COMPONENT_FIELDS, COMPONENT_LANG_FIELDS, GAZETTEER_SCHEMA

LEVEL_RANK = {"country": 1, "state": 2, "county": 3, "city": 4, "suburb": 5, "postcode_zone": 6}


def _rings_of(geom: dict) -> list[list[list[float]]]:
    t = geom.get("type")
    if t == "Polygon":
        return [[list(map(float, pt)) for pt in ring] for ring in geom["coordinates"]]
    if t == "MultiPolygon":
        # flatten: all rings of all polygons (holes follow their outer
        # ring; PIP parity is preserved by even-odd crossing)
        return [
            [list(map(float, pt)) for pt in ring]
            for poly in geom["coordinates"]
            for ring in poly
        ]
    raise ValueError(f"not an areal geometry: {t}")


def admin_from_geojson(fc: dict, id_start: int = 1) -> pa.Table:
    """FeatureCollection of Polygon/MultiPolygon features -> admin table.

    Feature properties understood: ``name``, ``level`` (one of
    country/state/county/city/suburb/postcode_zone), ``formatted``, and
    any of the 14 AddressDetails component fields
    (openstreetmap.rs:322-337)."""
    if fc.get("type") != "FeatureCollection":
        raise ValueError("expected a FeatureCollection")
    rows = []
    admin_id = id_start
    for feat in fc.get("features", []):
        geom = feat.get("geometry") or {}
        if geom.get("type") not in ("Polygon", "MultiPolygon"):
            continue
        props = feat.get("properties") or {}
        rings = _rings_of(geom)
        xs = np.array([pt[0] for ring in rings for pt in ring])
        ys = np.array([pt[1] for ring in rings for pt in ring])
        level = props.get("level", "city")
        row = {
            "admin_id": admin_id,
            "name": props.get("name", f"feature-{admin_id}"),
            "level": level,
            "level_rank": LEVEL_RANK.get(level, 4),
            "rings": rings,
            "minx": float(xs.min()),
            "miny": float(ys.min()),
            "maxx": float(xs.max()),
            "maxy": float(ys.max()),
            "area": float((xs.max() - xs.min()) * (ys.max() - ys.min())),
            "formatted": props.get("formatted", props.get("name", "")),
        }
        for f in COMPONENT_FIELDS + COMPONENT_LANG_FIELDS:
            row[f] = props.get(f)
        rows.append(row)
        admin_id += 1
    return pa.Table.from_pylist(rows, schema=ADMIN_SCHEMA)


def gazetteer_from_geojson(fc: dict, id_start: int = 1, cell_level: int = 8) -> pa.Table:
    """FeatureCollection of Point features -> gazetteer table.

    Properties understood mirror ``ForwardLocationProperties``
    (geoadmin.rs:375-389): ``name``/``label``/``detail``, ``origin``,
    ``rank``, ``weight``, plus OSM ``importance`` and OpenCage
    ``confidence``; ``detail`` defaults to the normalized name."""
    if fc.get("type") != "FeatureCollection":
        raise ValueError("expected a FeatureCollection")
    rows = []
    pid = id_start
    for feat in fc.get("features", []):
        geom = feat.get("geometry") or {}
        if geom.get("type") != "Point":
            continue
        lon, lat = (float(v) for v in geom["coordinates"][:2])
        props = feat.get("properties") or {}
        name = props.get("name", f"place-{pid}")
        rows.append(
            {
                "place_id": pid,
                "name": name,
                "detail": normalize_text(props.get("detail", name)),
                "alt_names": list(props.get("alt_names", [name])),
                "lon": lon,
                "lat": lat,
                "origin": props.get("origin", "gazetteer"),
                "rank": int(props.get("rank", 1)),
                "weight": int(props.get("weight", 0)),
                "importance": float(props.get("importance", 0.0)),
                "confidence": int(props.get("confidence", 5)),
                "cell_id": int(cells.encode(np.array([lon]), np.array([lat]), cell_level)[0]),
                "label": props.get("label", name),
                "house_number": props.get("house_number"),
                "strname_deinr": props.get("strname_deinr"),
                "dplz4": props.get("dplz4"),
                "dplzname": props.get("dplzname"),
            }
        )
        pid += 1
    return pa.Table.from_pylist(rows, schema=GAZETTEER_SCHEMA)


def read_geojson_files(paths: Iterable[str]) -> tuple[pa.Table, pa.Table]:
    """Read .geojson files -> (admin_table, gazetteer_table), areal and
    point features routed by geometry type."""
    import json

    admins = []
    gazes = []
    aid = 1
    gid = 1
    for p in paths:
        with open(p) as f:
            fc = json.load(f)
        a = admin_from_geojson(fc, id_start=aid)
        g = gazetteer_from_geojson(fc, id_start=gid)
        aid += a.num_rows
        gid += g.num_rows
        if a.num_rows:
            admins.append(a)
        if g.num_rows:
            gazes.append(g)
    empty_a = pa.Table.from_pylist([], schema=ADMIN_SCHEMA)
    empty_g = pa.Table.from_pylist([], schema=GAZETTEER_SCHEMA)
    return (
        pa.concat_tables(admins) if admins else empty_a,
        pa.concat_tables(gazes) if gazes else empty_g,
    )


def features_from_points(
    batch: pa.Table,
    lon_col: str = "lon",
    lat_col: str = "lat",
    props: Iterable[str] | None = None,
) -> pa.Table:
    """Point rows -> one GeoJSON Feature JSON string per row (``feature``
    column) — the SINK half of the FeatureCollection round trip
    (openstreetmap.rs:285-292 emits exactly this shape per result).

    A distributed writer composes this with ``ds.write_json`` (one
    Feature per line); a FeatureCollection envelope is a driver-side
    ``{"type": "FeatureCollection", "features": [...]}`` wrap of a SMALL
    result — never of a full corpus.
    """
    import json

    import pyarrow.compute as pc

    n = batch.num_rows
    lon = batch.column(lon_col).to_numpy(zero_copy_only=False)
    lat = batch.column(lat_col).to_numpy(zero_copy_only=False)
    prop_cols = list(props) if props is not None else [c for c in batch.column_names if c not in (lon_col, lat_col)]

    # Vectorized assembly (round-3 VERDICT Next #7): every structural
    # piece is a pyarrow string kernel; the only per-row Python is the
    # rare-row fallback (control chars / exponent-notation floats),
    # asserted byte-identical to json.dumps in tests.
    fallback = np.zeros(n, dtype=bool)

    def _float_strs(values: np.ndarray, nulls: np.ndarray) -> pa.Array:
        # json.dumps float repr: Arrow's shortest-roundtrip cast agrees
        # except for integral values (Arrow drops the ".0") and the
        # exponent regimes (|v| < 1e-4 or >= 1e16, NaN/inf, -0.0) —
        # integral values are rendered int + ".0", the rest fall back
        v = np.where(nulls, 0.0, values)
        finite = np.isfinite(v)
        negzero = (v == 0) & np.signbit(v)
        integral = finite & (v == np.floor(v)) & (np.abs(v) < 1e16) & ~negzero
        expo = finite & ~integral & (negzero | ((v != 0) & ((np.abs(v) < 1e-4) | (np.abs(v) >= 1e16))))
        fallback[(~finite | expo) & ~nulls] |= True
        plain = pc.cast(pa.array(np.where(integral, 0.5, v)), pa.string())
        # Arrow also switches to scientific notation for many-significant-
        # digit values where Python repr stays positional (found by the
        # hypothesis sweep, e.g. 10000000000.5 -> "1.00000000005e+10");
        # any 'e' in the cast output within Python's positional regime is
        # such a row
        has_e = pc.match_substring(plain, "e").to_numpy(zero_copy_only=False)
        fallback[has_e & finite & ~integral & ~expo & ~nulls] |= True
        ints = pc.binary_join_element_wise(
            pc.cast(pa.array(np.where(integral, v, 0.0).astype(np.int64)), pa.string()), ".0", ""
        )
        out = pc.if_else(pa.array(integral), ints, plain)
        return pc.if_else(pa.array(nulls), pa.scalar("null"), out)

    def _value_strs(col) -> pa.Array:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t = col.type
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        if pa.types.is_floating(t):
            return _float_strs(col.to_numpy(zero_copy_only=False), nulls)
        if pa.types.is_integer(t):
            return pc.if_else(pa.array(nulls), pa.scalar("null"), pc.cast(col, pa.string()))
        if pa.types.is_boolean(t):
            s = pc.if_else(col, pa.scalar("true"), pa.scalar("false"))
            return pc.if_else(pa.array(nulls), pa.scalar("null"), s)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            esc = pc.replace_substring(col, "\\", "\\\\")
            esc = pc.replace_substring(esc, '"', '\\"')
            for lit, rep in (("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"), ("\b", "\\b"), ("\f", "\\f")):
                esc = pc.replace_substring(esc, lit, rep)
            quoted = pc.binary_join_element_wise('"', esc, '"', "")
            # remaining control chars need \uXXXX forms -> per-row path
            ctl = pc.match_substring_regex(col, r"[\x00-\x08\x0b\x0e-\x1f]")
            fallback[pc.fill_null(ctl, False).to_numpy(zero_copy_only=False)] |= True
            return pc.if_else(pa.array(nulls), pa.scalar("null"), quoted)
        # exotic types (lists/structs): per-row json.dumps
        fallback[:] = True
        return pa.array(["null"] * n, type=pa.string())

    valid = ~(np.isnan(lon) | np.isnan(lat))
    lon_s = _float_strs(lon, ~valid)
    lat_s = _float_strs(lat, ~valid)
    geom = pc.binary_join_element_wise('{"coordinates": [', lon_s, ", ", lat_s, '], "type": "Point"}', "")
    geom = pc.if_else(pa.array(valid), geom, pa.scalar("null"))

    pieces: list = ['{"geometry": ', geom, ', "properties": {']
    for k, c in enumerate(sorted(prop_cols)):  # sort_keys order
        if k:
            pieces.append(", ")
        pieces.append(json.dumps(c, ensure_ascii=False) + ": ")
        pieces.append(_value_strs(batch.column(c)))
    pieces.append('}, "type": "Feature"}')
    feats = pc.binary_join_element_wise(*pieces, "")

    if fallback.any():
        out = np.array(feats.to_pylist(), dtype=object)
        prop_data = {c: batch.column(c).to_pylist() for c in prop_cols}
        for i in np.nonzero(fallback)[0]:
            lo, la = float(lon[i]), float(lat[i])
            g = None if (np.isnan(lo) or np.isnan(la)) else {"type": "Point", "coordinates": [lo, la]}
            out[i] = json.dumps(
                {"type": "Feature", "geometry": g, "properties": {c: prop_data[c][i] for c in prop_cols}},
                ensure_ascii=False,
                sort_keys=True,  # byte-stable output (SURVEY.md §7 hard part 2)
            )
        feats = pa.array(out.tolist(), type=pa.string())
    return batch.append_column("feature", feats)


def write_geojson_features(ds, out_dir: str, lon_col: str = "lon", lat_col: str = "lat", props=None):
    """Distributed GeoJSON sink: one Feature JSON object per row, written
    as partitioned JSON-lines files (streaming, resumable layout)."""

    def to_features(batch: pa.Table) -> pa.Table:
        out = features_from_points(batch, lon_col=lon_col, lat_col=lat_col, props=props)
        return out.select(["feature"])

    ds.map_batches(to_features, batch_format="pyarrow").write_json(out_dir)
