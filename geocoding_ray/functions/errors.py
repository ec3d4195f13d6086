"""Error taxonomy — the engine analogue of ``GeocodingError``
(/root/reference/src/lib.rs:54-66).

The reference's five variants map onto batch-engine realities: tasks
never panic (SURVEY.md §7 hard part 1); failures surface as nullable
``error`` columns carrying a ``"<Variant>: <detail>"`` string, and
payload/IO problems take the role the HTTP variants play in the
reference.

| reference variant (lib.rs) | engine surface |
|---|---|
| ``Forward``          | forward strict mode, empty candidate set |
| ``Reverse``          | reverse strict mode, empty result (opencage.rs:370-372 would panic) |
| ``Request``          | payload decode / source read failures (``payload_ok`` false) |
| ``HeaderConversion`` | n/a offline — schema-cast failures raise at the Arrow boundary |
| ``ParseInt``         | coercion failures in ``coerce_to_string`` inputs |
"""

from __future__ import annotations

from enum import Enum


class GeocodingError(str, Enum):
    FORWARD = "Forward"  # lib.rs:58
    REVERSE = "Reverse"  # lib.rs:59
    REQUEST = "Request"  # lib.rs:60
    HEADER_CONVERSION = "HeaderConversion"  # lib.rs:62
    PARSE_INT = "ParseInt"  # lib.rs:64

    def render(self, detail: str) -> str:
        return f"{self.value}: {detail}"


REVERSE_EMPTY = GeocodingError.REVERSE.render("empty result")
FORWARD_EMPTY = GeocodingError.FORWARD.render("empty result")
REQUEST_PAYLOAD = GeocodingError.REQUEST.render("payload decode failed")
