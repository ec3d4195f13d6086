"""Query configuration dataclasses — the engine's analogue of the
reference's parameter builders.

* ``InputBounds``        — lib.rs:141-165 (SW/NE lon-lat corners)
* ``OpencageParams``     — opencage.rs:47-70 (language/countrycode/limit)
* ``OpenstreetmapParams``— openstreetmap.rs:36-93 (query/addressdetails/viewbox)
* ``GeoAdminParams``     — geoadmin.rs:36-102 (searchtext/origins/bbox/limit)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

# Default GeoAdmin gazetteer layers (geoadmin.rs:69).
GEOADMIN_DEFAULT_ORIGINS = ("zipcode", "gg25", "district", "kantone", "gazetteer", "address", "parcel")
GEOADMIN_DEFAULT_LIMIT = 50  # geoadmin.rs:71


@dataclass(frozen=True)
class InputBounds:
    """Bounding box: minimum = SW corner, maximum = NE corner, lon-lat
    (lib.rs:136-147)."""

    minx: float
    miny: float
    maxx: float
    maxy: float

    @classmethod
    def new(cls, minimum_lonlat: Tuple[float, float], maximum_lonlat: Tuple[float, float]) -> "InputBounds":
        """Corner-pair constructor (lib.rs:156-165)."""
        return cls(minimum_lonlat[0], minimum_lonlat[1], maximum_lonlat[0], maximum_lonlat[1])

    def render(self) -> str:
        """The canonical ``"minx,miny,maxx,maxy"`` lon-lat CSV wire format
        (``From<InputBounds> for String``, lib.rs:168-182).  Rust's
        ``{}`` float Display prints the shortest roundtrip decimal, same
        as Python ``repr`` for float — ints print without ``.0`` in Rust,
        so strip a trailing ``.0`` to byte-match."""
        return ",".join(_rust_f64(v) for v in (self.minx, self.miny, self.maxx, self.maxy))


def _rust_f64(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


# OpenCage's NOBOX sentinel (opencage.rs:94): "pass this if you don't want
# to restrict the search" — represented here as None bbox.
NOBOX: Optional[InputBounds] = None


@dataclass(frozen=True)
class OpencageParams:
    """Optional OpenCage query parameters (opencage.rs:47-70);
    ``language`` changes the formatted output (opencage.rs:738-759)."""

    language: Optional[str] = None
    countrycode: Optional[str] = None
    limit: Optional[int] = None


@dataclass(frozen=True)
class OpenstreetmapParams:
    """Nominatim forward_full options (openstreetmap.rs:36-93)."""

    query: str = ""
    addressdetails: bool = False
    viewbox: Optional[InputBounds] = None

    def with_addressdetails(self, v: bool) -> "OpenstreetmapParams":
        return replace(self, addressdetails=v)

    def with_viewbox(self, vb: InputBounds) -> "OpenstreetmapParams":
        return replace(self, viewbox=vb)


@dataclass(frozen=True)
class GeoAdminParams:
    """GeoAdmin forward_full options (geoadmin.rs:36-102)."""

    searchtext: str = ""
    origins: Tuple[str, ...] = GEOADMIN_DEFAULT_ORIGINS
    bbox: Optional[InputBounds] = None
    limit: Optional[int] = GEOADMIN_DEFAULT_LIMIT

    def with_origins(self, *origins: str) -> "GeoAdminParams":
        return replace(self, origins=tuple(origins))

    def with_bbox(self, bbox: InputBounds) -> "GeoAdminParams":
        return replace(self, bbox=bbox)

    def with_limit(self, limit: int) -> "GeoAdminParams":
        return replace(self, limit=limit)


@dataclass(frozen=True)
class ReverseConfig:
    """Engine-side reverse-geocode options.

    ``strict_nonempty`` mirrors the per-provider empty-result split:
    OpenCage/OSM index results[0] and panic on empty (opencage.rs:370-372,
    openstreetmap.rs:229-230); GeoAdmin returns None (geoadmin.rs:295-304).
    The engine never panics a task — strict mode marks the row in an
    ``error`` column instead.
    """

    provider: str = "opencage"  # opencage | openstreetmap | geoadmin
    language: Optional[str] = None
    tolerance_m: float = 5000.0  # GeoAdmin identify tolerance analogue (geoadmin.rs:287)
    knn_fallback: bool = True
    strict_nonempty: bool = False
    cell_level: int = 8

    @classmethod
    def from_params(cls, params, **overrides) -> "ReverseConfig":
        """Adapter from the reference-shaped builders to the reverse
        pipeline config (``oc.parameters.language = ...`` changes the
        reverse output language, opencage.rs:27, 752)."""
        kw: dict
        if isinstance(params, OpencageParams):
            kw = {"provider": "opencage", "language": params.language}
        elif isinstance(params, OpenstreetmapParams):
            kw = {"provider": "openstreetmap"}
        elif isinstance(params, GeoAdminParams):
            kw = {"provider": "geoadmin"}
        else:
            raise TypeError(f"unsupported params type: {type(params).__name__}")
        kw.update(overrides)
        return cls(**kw)


@dataclass(frozen=True)
class ForwardConfig:
    """Engine-side forward-geocode options (superset of O5/O7/O10 params)."""

    provider: str = "openstreetmap"
    bbox: Optional[InputBounds] = None
    origins: Optional[Tuple[str, ...]] = None
    limit: Optional[int] = None
    addressdetails: bool = False
    sr: str = "4326"  # geoadmin.rs:118-121
    # Caption mode: drop out-of-vocabulary tokens ("photo near ...")
    # before the all-tokens-must-match rule; address mode (False) treats
    # any unknown token as no-match.
    ignore_oov: bool = False
    # OpenCage countrycode restriction (opencage.rs:55-70): comma-separated
    # ISO codes; candidates whose gazetteer country_code is not listed are
    # filtered before ranking.
    countrycode: Optional[str] = None

    @property
    def countrycodes(self) -> Optional[frozenset]:
        if not self.countrycode:
            return None
        return frozenset(c.strip().lower() for c in self.countrycode.split(",") if c.strip())

    @classmethod
    def from_params(cls, params, **overrides) -> "ForwardConfig":
        """Adapter from the reference-shaped parameter builders (S4/S6/S7:
        ``OpencageParams`` opencage.rs:47-70, ``OpenstreetmapParams``
        openstreetmap.rs:36-93, ``GeoAdminParams`` geoadmin.rs:36-102)
        to the engine's pipeline config."""
        kw: dict = {}
        if isinstance(params, OpencageParams):
            kw = {"provider": "opencage", "countrycode": params.countrycode, "limit": params.limit}
        elif isinstance(params, OpenstreetmapParams):
            kw = {
                "provider": "openstreetmap",
                "addressdetails": params.addressdetails,
                "bbox": params.viewbox,
            }
        elif isinstance(params, GeoAdminParams):
            kw = {
                "provider": "geoadmin",
                "origins": tuple(params.origins) if params.origins else None,
                "bbox": params.bbox,
                "limit": params.limit,
            }
        else:
            raise TypeError(f"unsupported params type: {type(params).__name__}")
        kw.update(overrides)
        return cls(**kw)
