"""STR-packed R-tree over bboxes, with vectorized batch point queries.

From scratch (no shapely.STRtree).  Built once on the driver per admin
table, pickled into the object store via ``ray.put`` and loaded by each
ReverseJoiner actor in ``__init__`` — the engine analogue of the
reference's once-per-instance client construction
(/root/reference/src/opencage.rs:118-123).

Sort-Tile-Recursive packing: items are ordered by slicing on x-center
then sorting each slice by y-center; leaves take ``node_cap`` items each;
internal levels pack child bboxes the same way.  Batch point queries
descend a frontier of (node, point-subset) pairs with numpy containment
tests so one traversal serves the whole batch.
"""

from __future__ import annotations

import numpy as np

DEFAULT_NODE_CAP = 16


def _str_order(cx: np.ndarray, cy: np.ndarray, node_cap: int) -> np.ndarray:
    """Sort-Tile-Recursive ordering: slice on x, sort slices on y."""
    n = len(cx)
    n_leaves = max(1, int(np.ceil(n / node_cap)))
    n_slices = int(np.ceil(np.sqrt(n_leaves)))
    per_slice = n_slices * node_cap
    by_x = np.argsort(cx, kind="stable")
    order = np.empty(n, dtype=np.int64)
    pos = 0
    for s in range(0, n, per_slice):
        sl = by_x[s : s + per_slice]
        sl = sl[np.argsort(cy[sl], kind="stable")]
        order[pos : pos + len(sl)] = sl
        pos += len(sl)
    return order


class STRtree:
    """Array-backed R-tree.

    Nodes are stored in one flat table (leaves first is NOT guaranteed;
    ``root`` is the last node).  For node i:

    * ``node_bbox[i]``  — (minx, miny, maxx, maxy)
    * ``node_is_leaf[i]`` — leaf flag
    * leaf:    items are ``item_order[node_child0[i] : +node_nchild[i]]``
    * internal: children are ``children[node_child0[i] : +node_nchild[i]]``
    """

    def __init__(self, rects: np.ndarray, node_cap: int = DEFAULT_NODE_CAP):
        rects = np.ascontiguousarray(rects, dtype=np.float64)
        self.rects = rects
        n = len(rects)
        self.n_items = n

        node_bbox: list[np.ndarray] = []
        node_child0: list[int] = []
        node_nchild: list[int] = []
        node_is_leaf: list[bool] = []
        children: list[int] = []

        if n == 0:
            self.node_bbox = np.zeros((1, 4))
            self.node_child0 = np.zeros(1, dtype=np.int64)
            self.node_nchild = np.zeros(1, dtype=np.int64)
            self.node_is_leaf = np.ones(1, dtype=bool)
            self.children = np.zeros(0, dtype=np.int64)
            self.item_order = np.zeros(0, dtype=np.int64)
            self.root = 0
            return

        cx = (rects[:, 0] + rects[:, 2]) * 0.5
        cy = (rects[:, 1] + rects[:, 3]) * 0.5
        item_order = _str_order(cx, cy, node_cap)

        # leaves
        level: list[int] = []
        for pos in range(0, n, node_cap):
            take = min(node_cap, n - pos)
            items = item_order[pos : pos + take]
            r = rects[items]
            node_bbox.append(np.array([r[:, 0].min(), r[:, 1].min(), r[:, 2].max(), r[:, 3].max()]))
            node_child0.append(pos)
            node_nchild.append(take)
            node_is_leaf.append(True)
            level.append(len(node_bbox) - 1)

        # internal levels
        while len(level) > 1:
            lb = np.stack([node_bbox[i] for i in level])
            order = _str_order((lb[:, 0] + lb[:, 2]) * 0.5, (lb[:, 1] + lb[:, 3]) * 0.5, node_cap)
            perm = [level[i] for i in order]
            new_level: list[int] = []
            for pos in range(0, len(perm), node_cap):
                kids = perm[pos : pos + node_cap]
                kb = np.stack([node_bbox[k] for k in kids])
                node_bbox.append(np.array([kb[:, 0].min(), kb[:, 1].min(), kb[:, 2].max(), kb[:, 3].max()]))
                node_child0.append(len(children))
                node_nchild.append(len(kids))
                node_is_leaf.append(False)
                children.extend(kids)
                new_level.append(len(node_bbox) - 1)
            level = new_level

        self.node_bbox = np.stack(node_bbox)
        self.node_child0 = np.array(node_child0, dtype=np.int64)
        self.node_nchild = np.array(node_nchild, dtype=np.int64)
        self.node_is_leaf = np.array(node_is_leaf, dtype=bool)
        self.children = np.array(children, dtype=np.int64)
        self.item_order = item_order.astype(np.int64)
        self.root = level[0]

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch point query: (point_idx, item_idx) pairs for every item
        whose bbox contains the point, sorted by (point_idx, item_idx)."""
        px = np.ascontiguousarray(px, dtype=np.float64)
        py = np.ascontiguousarray(py, dtype=np.float64)
        if self.n_items == 0 or len(px) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)

        out_p: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        stack: list[tuple[int, np.ndarray]] = [(self.root, np.arange(len(px), dtype=np.int64))]
        while stack:
            node, pts = stack.pop()
            bb = self.node_bbox[node]
            x = px[pts]
            y = py[pts]
            m = (x >= bb[0]) & (x <= bb[2]) & (y >= bb[1]) & (y <= bb[3])
            pts = pts[m]
            if len(pts) == 0:
                continue
            c0 = int(self.node_child0[node])
            nc = int(self.node_nchild[node])
            if self.node_is_leaf[node]:
                items = self.item_order[c0 : c0 + nc]
                ir = self.rects[items]  # (k, 4)
                x = px[pts]
                y = py[pts]
                hit = (
                    (x[:, None] >= ir[None, :, 0])
                    & (x[:, None] <= ir[None, :, 2])
                    & (y[:, None] >= ir[None, :, 1])
                    & (y[:, None] <= ir[None, :, 3])
                )
                pi, ii = np.nonzero(hit)
                if len(pi):
                    out_p.append(pts[pi])
                    out_i.append(items[ii])
            else:
                for k in self.children[c0 : c0 + nc]:
                    stack.append((int(k), pts))

        if not out_p:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        p = np.concatenate(out_p)
        i = np.concatenate(out_i)
        order = np.lexsort((i, p))
        return p[order], i[order]

    def query_rects(self, qrects: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch rect-intersection query: (query_idx, item_idx) pairs where
        the query rect intersects the item rect (used for bbox-restricted
        forward search pushdown, opencage.rs:305-308)."""
        qrects = np.ascontiguousarray(qrects, dtype=np.float64)
        if self.n_items == 0 or len(qrects) == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        out_q: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        stack: list[tuple[int, np.ndarray]] = [(self.root, np.arange(len(qrects), dtype=np.int64))]
        while stack:
            node, qs = stack.pop()
            bb = self.node_bbox[node]
            r = qrects[qs]
            m = (r[:, 0] <= bb[2]) & (r[:, 2] >= bb[0]) & (r[:, 1] <= bb[3]) & (r[:, 3] >= bb[1])
            qs = qs[m]
            if len(qs) == 0:
                continue
            c0 = int(self.node_child0[node])
            nc = int(self.node_nchild[node])
            if self.node_is_leaf[node]:
                items = self.item_order[c0 : c0 + nc]
                ir = self.rects[items]
                r = qrects[qs]
                hit = (
                    (r[:, None, 0] <= ir[None, :, 2])
                    & (r[:, None, 2] >= ir[None, :, 0])
                    & (r[:, None, 1] <= ir[None, :, 3])
                    & (r[:, None, 3] >= ir[None, :, 1])
                )
                qi, ii = np.nonzero(hit)
                if len(qi):
                    out_q.append(qs[qi])
                    out_i.append(items[ii])
            else:
                for k in self.children[c0 : c0 + nc]:
                    stack.append((int(k), qs))
        if not out_q:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        q = np.concatenate(out_q)
        i = np.concatenate(out_i)
        order = np.lexsort((i, q))
        return q[order], i[order]
