"""Provider protocol — the engine's user-extension surface (SURVEY.md
§2.7).

The reference's extension point is the trait pair ``Forward`` /
``Reverse`` (/root/reference/src/lib.rs:92-134): a new backend
implements one or both and reuses the shared types.  The engine's
equivalent is :class:`Provider`: a provider bundles its output
*projection* (formatted-string renderer), its *empty-result semantics*
(OpenCage/OSM index ``results[0]`` and would panic on empty,
opencage.rs:370-372, openstreetmap.rs:229-230; GeoAdmin returns None,
geoadmin.rs:295-304), and its *CRS/axis convention*
(geoadmin.rs:245-255) — while the join core (R-tree PIP, kNN, token
join) is shared, exactly as the three reference modules share lib.rs's
traits and differ only in projection.

Register a new provider with :func:`register_provider`; the reverse /
forward stages accept any registered name via their configs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Mapping, Optional

from .functions.formatters import geoadmin_reverse_label, opencage_formatted, osm_display_name


@dataclass(frozen=True)
class Provider:
    """A pluggable output convention over the shared join core."""

    name: str
    # components -> display string (reverse projection)
    render_reverse: Callable[[Mapping[str, Optional[str]], Optional[str]], Optional[str]]
    # strict empty handling: True = reference would panic on empty
    # (engine flags the row instead); False = null-safe (GeoAdmin)
    strict_nonempty: bool
    # default spatial reference of output points
    default_sr: str = "4326"


def _opencage_render(comps, language=None):
    return opencage_formatted(comps, language=language)


def _osm_render(comps, language=None):
    return osm_display_name(comps)


def _geoadmin_render(comps, language=None):
    # building-register format "{strname_deinr}, {dplz4} {dplzname}"
    return geoadmin_reverse_label(comps.get("strname_deinr"), comps.get("dplz4"), comps.get("dplzname"))


_REGISTRY: dict[str, Provider] = {}


def register_provider(p: Provider) -> None:
    if p.name in _REGISTRY:
        raise ValueError(f"provider {p.name!r} already registered")
    _REGISTRY[p.name] = p


def get_provider(name: str) -> Provider:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown provider {name!r}; registered: {sorted(_REGISTRY)}") from None


def providers() -> dict[str, Provider]:
    return dict(_REGISTRY)


register_provider(Provider("opencage", _opencage_render, strict_nonempty=True))
register_provider(Provider("openstreetmap", _osm_render, strict_nonempty=True))
register_provider(Provider("geoadmin", _geoadmin_render, strict_nonempty=False, default_sr="2056"))
