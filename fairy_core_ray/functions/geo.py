"""Geospatial kernels: hierarchical cell encoding and point-in-polygon.

The ``h3`` / ``s2`` / ``shapely`` libraries are not available here, so this
module implements the two primitives the north rule needs from them, from
scratch and fully vectorized:

* **Cell encoding** — an H3/S2-style hierarchical spatial key. We use an
  equirectangular quadtree: at resolution ``res`` the world
  [-180,180]x[-90,90] is a 2^res x 2^res grid and
  ``cell = (res << 58) | (ix << 29) | iy`` (uint64-safe, fits int64 for
  res <= 29). Parent/child relationships are bit shifts, the key is
  arithmetic-only (so DuckDB oracles can reproduce it), and it
  hash-partitions exactly like an H3 index would. Swapping in real H3
  later only changes ``encode_cells``.

* **Point-in-polygon** — classic even-odd ray casting (points x edges,
  numpy broadcast), plus a uniform-grid candidate index (``GridIndex``)
  playing the role of shapely's STRtree: polygons are bucketed by the
  grid cells their bounding boxes cover; a probe point only tests the
  polygons in its bucket. Built once per actor (see stages/pip.py).

Boundary convention: even-odd crossing with half-open edges — a point
exactly on a horizontal lower edge is inside, on the upper edge outside
(standard ray-casting asymmetry). Synthetic footprints are continuous
doubles, so boundary hits have measure zero; golden tests pin the
convention anyway.
"""

from __future__ import annotations

import numpy as np

DEFAULT_RES = 13  # ~4.4 km x 2.2 km cells at the equator; hot-cell tests use this


def encode_cells(lon: np.ndarray, lat: np.ndarray, res: int = DEFAULT_RES) -> np.ndarray:
    """Vectorized hierarchical cell id (int64) for lon/lat degrees.

    cell = (res << 58) | (ix << 29) | iy   with ix, iy in [0, 2^res).
    SQL-equivalent: res*2^58 + floor((lon+180)/360*2^res)*2^29
                    + floor((lat+90)/180*2^res).
    """
    if not 0 <= res <= 29:
        raise ValueError("res must be in [0, 29]")
    n = np.int64(1) << np.int64(res)
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    ix = np.clip(ix, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    return (np.int64(res) << np.int64(58)) | (ix << np.int64(29)) | iy


def cell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent cell at a coarser resolution (pure bit arithmetic)."""
    cell = np.asarray(cell, np.int64)
    res = (cell >> np.int64(58)).astype(np.int64)
    shift = res - np.int64(parent_res)
    ix = ((cell >> np.int64(29)) & np.int64((1 << 29) - 1)) >> shift
    iy = (cell & np.int64((1 << 29) - 1)) >> shift
    return (np.int64(parent_res) << np.int64(58)) | (ix << np.int64(29)) | iy


def cell_kring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` at the same
    resolution — the H3 ``kRing`` analog on the quadtree grid. Includes
    the center; clipped at the grid edges (no wraparound), so the ring
    of an edge cell is smaller. Returns sorted int64 cell ids."""
    res = int(cell) >> 58
    n = 1 << res
    ix = (int(cell) >> 29) & ((1 << 29) - 1)
    iy = int(cell) & ((1 << 29) - 1)
    xs = np.arange(max(0, ix - k), min(n - 1, ix + k) + 1, dtype=np.int64)
    ys = np.arange(max(0, iy - k), min(n - 1, iy + k) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    cells = (np.int64(res) << np.int64(58)) | (gx.ravel() << np.int64(29)) | gy.ravel()
    return np.sort(cells)


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of one cell."""
    res = cell >> 58
    n = 1 << res
    ix = (cell >> 29) & ((1 << 29) - 1)
    iy = cell & ((1 << 29) - 1)
    return (
        -180.0 + ix * 360.0 / n,
        -90.0 + iy * 180.0 / n,
        -180.0 + (ix + 1) * 360.0 / n,
        -90.0 + (iy + 1) * 180.0 / n,
    )


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Even-odd ray-casting containment of n points in one polygon ring.

    px, py: (n,) point coords; xs, ys: (m,) unclosed ring vertices.
    Returns (n,) bool. Fully vectorized: O(n*m) numpy ops.
    """
    px = np.asarray(px, np.float64)[:, None]  # (n,1)
    py = np.asarray(py, np.float64)[:, None]
    x1, y1 = np.asarray(xs, np.float64)[None, :], np.asarray(ys, np.float64)[None, :]
    x2, y2 = np.roll(xs, -1)[None, :], np.roll(ys, -1)[None, :]
    # edge straddles the horizontal ray through py (half-open in y)
    straddle = (y1 <= py) != (y2 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = straddle & (px < x_at)
    return (crossings.sum(axis=1) % 2).astype(bool)


class GridIndex:
    """Uniform-grid spatial index over a polygon set (STRtree stand-in).

    Build once per worker (actor ``__init__``); probe per batch. The
    polygon set is the broadcast small side — for the north rule this is
    the tile-boundary set (~10^2..10^5 polygons), never the point side.
    """

    def __init__(self, polys: list[dict], nx: int = 64, ny: int = 64):
        self.polys = [
            (
                p["tile_id"],
                np.asarray(p["xs"], np.float64),
                np.asarray(p["ys"], np.float64),
            )
            for p in polys
        ]
        bx0 = np.array([p[1].min() for p in self.polys])
        by0 = np.array([p[2].min() for p in self.polys])
        bx1 = np.array([p[1].max() for p in self.polys])
        by1 = np.array([p[2].max() for p in self.polys])
        self.x0, self.y0 = float(bx0.min()), float(by0.min())
        self.x1, self.y1 = float(bx1.max()), float(by1.max())
        self.nx, self.ny = nx, ny
        self.dx = (self.x1 - self.x0) / nx or 1.0
        self.dy = (self.y1 - self.y0) / ny or 1.0
        self.bboxes = np.stack([bx0, by0, bx1, by1], axis=1)
        buckets: dict[tuple[int, int], list[int]] = {}
        for i in range(len(self.polys)):
            gx0 = int((bx0[i] - self.x0) / self.dx)
            gx1 = min(int((bx1[i] - self.x0) / self.dx), nx - 1)
            gy0 = int((by0[i] - self.y0) / self.dy)
            gy1 = min(int((by1[i] - self.y0) / self.dy), ny - 1)
            for gx in range(gx0, gx1 + 1):
                for gy in range(gy0, gy1 + 1):
                    buckets.setdefault((gx, gy), []).append(i)
        self.buckets = buckets

    # Below this polygon count, a per-polygon bbox mask over ALL points
    # beats bucket grouping: the bucket loop costs Python-per-bucket,
    # the mask path costs one vectorized sweep per polygon.
    SMALL_POLYSET = 512

    def query_batch(
        self, px: np.ndarray, py: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """All (point_index, polygon_index) containment pairs for a batch.

        Small polygon sets: one vectorized bbox-mask + PIP sweep per
        polygon. Large sets: group points by grid bucket and test only
        that bucket's candidate polygons.
        """
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        if len(self.polys) <= self.SMALL_POLYSET:
            out_pts: list[np.ndarray] = []
            out_polys: list[np.ndarray] = []
            for pi, (tid, xs, ys) in enumerate(self.polys):
                bb = self.bboxes[pi]
                near = (px >= bb[0]) & (px <= bb[2]) & (py >= bb[1]) & (py <= bb[3])
                sub = np.flatnonzero(near)
                if not len(sub):
                    continue
                hit = points_in_polygon(px[sub], py[sub], xs, ys)
                if hit.any():
                    out_pts.append(sub[hit])
                    out_polys.append(np.full(int(hit.sum()), pi, np.int64))
            if not out_pts:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            return np.concatenate(out_pts), np.concatenate(out_polys)
        gx = np.floor((px - self.x0) / self.dx).astype(np.int64)
        gy = np.floor((py - self.y0) / self.dy).astype(np.int64)
        inside_grid = (gx >= 0) & (gx < self.nx) & (gy >= 0) & (gy < self.ny)
        out_pts: list[np.ndarray] = []
        out_polys: list[np.ndarray] = []
        key = gx * self.ny + gy
        key[~inside_grid] = -1
        order = np.argsort(key, kind="stable")
        sorted_key = key[order]
        starts = np.flatnonzero(np.r_[True, sorted_key[1:] != sorted_key[:-1]])
        ends = np.r_[starts[1:], len(sorted_key)]
        for s, e in zip(starts, ends):
            k = sorted_key[s]
            if k < 0:
                continue
            cand = self.buckets.get((int(k) // self.ny, int(k) % self.ny))
            if not cand:
                continue
            pts = order[s:e]
            bx, by = px[pts], py[pts]
            for pi in cand:
                tid, xs, ys = self.polys[pi]
                bb = self.bboxes[pi]
                near = (bx >= bb[0]) & (bx <= bb[2]) & (by >= bb[1]) & (by <= bb[3])
                if not near.any():
                    continue
                sub = pts[near]
                hit = points_in_polygon(px[sub], py[sub], xs, ys)
                if hit.any():
                    out_pts.append(sub[hit])
                    out_polys.append(np.full(int(hit.sum()), pi, np.int64))
        if not out_pts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_pts), np.concatenate(out_polys)
