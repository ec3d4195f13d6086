"""Provider-style formatted-address renderers (SURVEY.md S10).

Each provider projects a different display string from the join result:

* OpenCage   — ``results[0].formatted``      (opencage.rs:370-372)
* Nominatim  — ``features[0].display_name``  (openstreetmap.rs:229-230)
* GeoAdmin   — ``"{strname_deinr}, {dplz4} {dplzname}"`` (geoadmin.rs:297-300)

Formatting is byte-stable: pure string interpolation over component
fields, no float rendering, no locale.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

# Order of the Nominatim display_name hierarchy, specific -> general,
# mirroring AddressDetails (openstreetmap.rs:322-337) as observed in the
# reference's canned responses (openstreetmap.rs:254-265: "Carrer de
# Calatrava, les Tres Torres, Sarrià - Sant Gervasi, Barcelona, ...").
_OSM_ORDER = (
    "house_number",
    "road",
    "neighbourhood",
    "suburb",
    "city_district",
    "village",
    "city",
    "county",
    "state",
    "postcode",
    "country",
)

# OpenCage formatted: "Carrer de Calatrava, 64, 08017 Barcelona, Spain"
# (opencage.rs:728) — road, house_number, "postcode city", country.


def opencage_formatted(c: Mapping[str, Optional[str]], language: Optional[str] = None) -> Optional[str]:
    """OpenCage-style ``formatted`` string from an address-component map.

    ``language`` switches country/city names when the component map carries
    ``{field}:{lang}`` variants (the engine analogue of
    ``parameters.language`` changing the response, opencage.rs:738-759).
    """
    get = _lang_getter(c, language)
    parts: list[str] = []
    road = get("road")
    house = get("house_number")
    if road and house:
        parts.append(f"{road}, {house}")
    elif road:
        parts.append(road)
    postcode = get("postcode")
    city = get("city") or get("village")
    if postcode and city:
        parts.append(f"{postcode} {city}")
    elif city:
        parts.append(city)
    country = get("country")
    if country:
        parts.append(country)
    return ", ".join(parts) if parts else None


def osm_display_name(c: Mapping[str, Optional[str]]) -> Optional[str]:
    """Nominatim-style ``display_name``: comma-joined hierarchy,
    specific -> general (openstreetmap.rs:254-265)."""
    parts = [c.get(k) for k in _OSM_ORDER]
    parts = [p for p in parts if p]
    return ", ".join(parts) if parts else None


def geoadmin_reverse_label(
    strname_deinr: Optional[str], dplz4: Optional[int], dplzname: Optional[str]
) -> Optional[str]:
    """GeoAdmin reverse format ``"{strname_deinr}, {dplz4} {dplzname}"``
    (geoadmin.rs:297-300); any missing field -> None (the reference would
    only format when a result exists, geoadmin.rs:295-304)."""
    if strname_deinr is None or dplz4 is None or dplzname is None:
        return None
    return f"{strname_deinr}, {dplz4} {dplzname}"


def _lang_getter(c: Mapping[str, Optional[str]], language: Optional[str]):
    def get(k: str) -> Optional[str]:
        if language:
            v = c.get(f"{k}:{language}")
            if v:
                return v
        return c.get(k)

    return get
