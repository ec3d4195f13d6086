"""Vectorized planar geometry: point-in-polygon, ring area, bboxes.

From-scratch NumPy (no shapely).  Coordinates are lon-lat (x, y) per the
reference's boundary invariant (/root/reference/src/lib.rs:13-16).
"""

from __future__ import annotations

import numpy as np


class PackedRings:
    """Columnar polygon set: all ring vertices in flat arrays with offsets.

    Mirrors Arrow ``list<list<list<f64>>>`` layout so building from a
    parquet column is zero-copy-ish.

    Attributes
    ----------
    xs, ys : float64 [n_vertices]        all vertices, ring by ring
    ring_offsets : int64 [n_rings + 1]   vertex range of ring r
    poly_ring_offsets : int64 [n_polys + 1]  ring range of polygon p
    bbox : float64 [n_polys, 4]          minx, miny, maxx, maxy
    """

    __slots__ = ("xs", "ys", "ring_offsets", "poly_ring_offsets", "bbox")

    def __init__(self, xs, ys, ring_offsets, poly_ring_offsets):
        self.xs = np.ascontiguousarray(xs, dtype=np.float64)
        self.ys = np.ascontiguousarray(ys, dtype=np.float64)
        self.ring_offsets = np.ascontiguousarray(ring_offsets, dtype=np.int64)
        self.poly_ring_offsets = np.ascontiguousarray(poly_ring_offsets, dtype=np.int64)
        self.bbox = self._compute_bbox()

    @property
    def n_polys(self) -> int:
        return len(self.poly_ring_offsets) - 1

    def _compute_bbox(self) -> np.ndarray:
        """Per-polygon bbox via reduceat over the vertex ranges — no
        Python loop, so a million-polygon build side stays fast."""
        n = self.n_polys
        bbox = np.empty((n, 4), dtype=np.float64)
        if n == 0:
            return bbox
        starts = self.ring_offsets[self.poly_ring_offsets[:-1]]
        # reduceat segments run start_i .. start_{i+1}; the final segment
        # runs to the end of the vertex arrays, which is exactly the last
        # polygon's extent since rings are stored contiguously per poly.
        bbox[:, 0] = np.minimum.reduceat(self.xs, starts)
        bbox[:, 1] = np.minimum.reduceat(self.ys, starts)
        bbox[:, 2] = np.maximum.reduceat(self.xs, starts)
        bbox[:, 3] = np.maximum.reduceat(self.ys, starts)
        return bbox

    @classmethod
    def from_pylist(cls, polys: list[list[list[tuple[float, float]]]]) -> "PackedRings":
        """Build from GeoJSON-style nested lists: polys[p][r] = [(lon,lat),...]."""
        xs: list[float] = []
        ys: list[float] = []
        ring_offsets = [0]
        poly_ring_offsets = [0]
        for poly in polys:
            for ring in poly:
                for lon, lat in ring:
                    xs.append(lon)
                    ys.append(lat)
                ring_offsets.append(len(xs))
            poly_ring_offsets.append(len(ring_offsets) - 1)
        return cls(np.array(xs), np.array(ys), np.array(ring_offsets), np.array(poly_ring_offsets))

    @classmethod
    def from_arrow(cls, rings_col) -> "PackedRings":
        """Build from an Arrow ``list<list<list<f64>>>`` column where the
        innermost list is a [lon, lat] pair (GeoJSON ring layout)."""
        import pyarrow as pa

        if isinstance(rings_col, pa.ChunkedArray):
            rings_col = rings_col.combine_chunks()
        poly_ring_offsets = rings_col.offsets.to_numpy()
        ring_list = rings_col.values  # list<list<f64>> — one entry per vertex-list? No: per ring
        ring_pair_offsets = ring_list.offsets.to_numpy()  # offsets into pairs
        pairs = ring_list.values  # list<f64> of [lon,lat]
        pair_offsets = pairs.offsets.to_numpy()
        flat = pairs.values.to_numpy()
        # Every innermost list must be a [lon, lat] pair.
        lens = np.diff(pair_offsets)
        if not np.all(lens == 2):
            raise ValueError("innermost ring lists must be [lon, lat] pairs")
        xs = flat[0::2]
        ys = flat[1::2]
        # ring_pair_offsets index pairs; vertices == pairs, so ring vertex
        # offsets are the same values.
        return cls(xs, ys, ring_pair_offsets.astype(np.int64), poly_ring_offsets.astype(np.int64))

    def area(self) -> np.ndarray:
        """Absolute shoelace area per polygon (outer ring minus holes),
        in square degrees — used only as the deterministic specificity
        tie-break (smaller = more specific).

        Vectorized: per-vertex cross terms with the ring-wrap edge fixed
        up per ring, then reduceat per ring and sign-combined per poly.
        """
        n_rings = len(self.ring_offsets) - 1
        if self.n_polys == 0:
            return np.zeros(0, dtype=np.float64)
        x = self.xs
        y = self.ys
        # cross term for edge i -> i+1 (invalid across ring boundaries)
        cross = np.empty(len(x), dtype=np.float64)
        cross[:-1] = x[:-1] * y[1:] - x[1:] * y[:-1]
        cross[-1] = 0.0
        starts = self.ring_offsets[:-1]
        ends = self.ring_offsets[1:]
        sums = np.add.reduceat(cross, starts)
        # subtract the spurious boundary edge (last vertex -> next ring's
        # first) and add the closing edge (last -> first of same ring)
        last = ends - 1
        first = starts
        spurious = np.where(last < len(x) - 1, x[last] * y[(last + 1) % len(x)] - x[(last + 1) % len(x)] * y[last], 0.0)
        closing = x[last] * y[first] - x[first] * y[last]
        ring_area = np.abs(0.5 * (sums - spurious + closing))
        # Outer/hole classification by even-odd containment DEPTH among
        # sibling rings (a ring at even depth adds, odd subtracts) — not
        # by position, since a flattened MultiPolygon stores several
        # outer rings per polygon (sources/geojson._rings_of).
        out = np.zeros(self.n_polys, dtype=np.float64)
        for p in range(self.n_polys):
            r0, r1 = int(self.poly_ring_offsets[p]), int(self.poly_ring_offsets[p + 1])
            if r1 - r0 == 1:
                out[p] = ring_area[r0]
                continue
            total = 0.0
            for r in range(r0, r1):
                v0 = int(self.ring_offsets[r])
                px = np.array([self.xs[v0]])
                py = np.array([self.ys[v0]])
                depth = 0
                for s in range(r0, r1):
                    if s == r:
                        continue
                    sv0, sv1 = int(self.ring_offsets[s]), int(self.ring_offsets[s + 1])
                    if _ring_crossings(self.xs[sv0:sv1], self.ys[sv0:sv1], px, py)[0]:
                        depth += 1
                total += ring_area[r] if depth % 2 == 0 else -ring_area[r]
            out[p] = abs(total)
        return out

    def contains(self, poly_idx: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized even-odd ray-crossing test of many points against one
        polygon (all rings; holes flip parity).  Boundary points count as
        inside-or-outside per the even-odd rule — fixtures avoid exact
        boundary points so results are deterministic."""
        r0, r1 = self.poly_ring_offsets[poly_idx], self.poly_ring_offsets[poly_idx + 1]
        inside = np.zeros(len(px), dtype=bool)
        for r in range(r0, r1):
            v0, v1 = self.ring_offsets[r], self.ring_offsets[r + 1]
            inside ^= _ring_crossings(self.xs[v0:v1], self.ys[v0:v1], px, py)
        return inside


def _ring_crossings(rx: np.ndarray, ry: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Even-odd crossing parity of points vs one closed ring.

    Fully vectorized: edges x points broadcast.  For batches this is
    O(E*P) but both are small per candidate pair (rings are simplified,
    candidate sets are cell-pruned).
    """
    x1, y1 = rx[:-1], ry[:-1]
    x2, y2 = rx[1:], ry[1:]
    if rx[0] != rx[-1] or ry[0] != ry[-1]:
        x1 = np.append(x1, rx[-1])
        y1 = np.append(y1, ry[-1])
        x2 = np.append(x2, rx[0])
        y2 = np.append(y2, ry[0])
    # Edge straddles the horizontal line through py?
    py_b = py[None, :]
    px_b = px[None, :]
    y1_b = y1[:, None]
    y2_b = y2[:, None]
    straddle = (y1_b > py_b) != (y2_b > py_b)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (py_b - y1_b) / (y2_b - y1_b)
        xint = x1[:, None] + t * (x2 - x1)[:, None]
    crossings = straddle & (px_b < xint)
    return (crossings.sum(axis=0) % 2).astype(bool)


def points_in_bbox(
    px: np.ndarray, py: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray:
    """Vectorized bbox containment (the reference's bounds/viewbox/bbox
    predicate — opencage.rs:305-308, openstreetmap.rs:162-165)."""
    return (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
