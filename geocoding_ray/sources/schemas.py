"""pyarrow schemas for the engine tables (SURVEY.md §1.3, FIXTURES.md).

Address components mirror Nominatim's ``AddressDetails`` 14-field struct
(/root/reference/src/openstreetmap.rs:322-337); they are stored flattened
as nullable string columns (plus ``_fr`` language variants for the
OpenCage language parameter demo, opencage.rs:738-759) so every kernel
and the DuckDB oracle can address them without nested-type friction.
"""

from __future__ import annotations

import pyarrow as pa

# The 14 AddressDetails fields (openstreetmap.rs:322-337).
COMPONENT_FIELDS = (
    "city",
    "city_district",
    "construction",
    "continent",
    "country",
    "country_code",
    "house_number",
    "neighbourhood",
    "postcode",
    "public_building",
    "state",
    "suburb",
    "road",
    "village",
)

# Language-variant fields carried for the language demo.
COMPONENT_LANG_FIELDS = ("city_fr", "country_fr")

IMAGES_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

ADMIN_SCHEMA = pa.schema(
    [
        pa.field("admin_id", pa.uint64()),
        pa.field("name", pa.string()),
        pa.field("level", pa.string()),
        pa.field("level_rank", pa.int32()),  # deeper = larger; deepest hit wins
        pa.field("rings", pa.list_(pa.list_(pa.list_(pa.float64())))),
        pa.field("minx", pa.float64()),
        pa.field("miny", pa.float64()),
        pa.field("maxx", pa.float64()),
        pa.field("maxy", pa.float64()),
        pa.field("area", pa.float64()),
        pa.field("formatted", pa.string()),
    ]
    + [pa.field(f, pa.string()) for f in COMPONENT_FIELDS]
    + [pa.field(f, pa.string()) for f in COMPONENT_LANG_FIELDS]
)

GAZETTEER_SCHEMA = pa.schema(
    [
        pa.field("place_id", pa.uint64()),
        pa.field("name", pa.string()),
        pa.field("detail", pa.string()),  # normalized searchable text (geoadmin.rs:344)
        pa.field("alt_names", pa.list_(pa.string())),  # strname (geoadmin.rs:442)
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
        pa.field("origin", pa.string()),  # gazetteer layer (geoadmin.rs:69)
        pa.field("country_code", pa.string()),  # OpenCage countrycode restriction (opencage.rs:55-70)
        pa.field("rank", pa.uint32()),  # geoadmin.rs:380
        pa.field("weight", pa.uint32()),  # geoadmin.rs:379
        pa.field("importance", pa.float64()),  # openstreetmap.rs:316
        pa.field("confidence", pa.int8()),  # opencage.rs:575
        pa.field("cell_id", pa.uint64()),
        pa.field("label", pa.string()),  # display label (geoadmin.rs:387)
        pa.field("house_number", pa.string()),
        # GeoAdmin building-register fields for the reverse kNN format
        # "{strname_deinr}, {dplz4} {dplzname}" (geoadmin.rs:297-300, 429-446)
        pa.field("strname_deinr", pa.string()),
        pa.field("dplz4", pa.int32()),
        pa.field("dplzname", pa.string()),
    ]
)

REVERSE_RESULT_FIELDS = [
    pa.field("image_id", pa.string()),
    pa.field("lon", pa.float64()),
    pa.field("lat", pa.float64()),
    pa.field("cell_id", pa.uint64()),
    pa.field("admin_id", pa.uint64()),
    pa.field("formatted", pa.string()),  # nullable — Option<String> (lib.rs:99)
    pa.field("confidence", pa.int8()),
    pa.field("match_kind", pa.string()),  # "pip" | "knn" | "miss"
]

FORWARD_RESULT_SCHEMA = pa.schema(
    [
        pa.field("query_id", pa.string()),
        pa.field("query", pa.string()),
        # Vec<Point<T>> in rank order (lib.rs:133)
        pa.field("points", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
        pa.field("n_candidates", pa.int32()),
    ]
)
