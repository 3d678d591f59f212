"""Raster <-> vector operators (north rule: "H3/S2 index,
point-in-polygon, kNN, raster<->vector").

The raster side of the engine: a fixed lon/lat grid over a bounding
box, point counts rasterized into it distributedly, and three
vector-producing consumers of the (bounded) raster — pixel
polygonization, zonal statistics against a polygon set, and hotspot
connected-component extraction.

Scale shape: the only corpus-sized pass is ``rasterize_counts`` — a
per-batch (pixel, count) partial inside ``map_batches`` (each partial
is bounded by min(batch_rows, grid_size) rows). Below
``RASTER_DRIVER_PIXELS`` grid cells the partials fold on the driver
(one Ray execution; the fold is O(grid), independent of corpus size);
above it the fold runs as a distributed ``groupby(pix)`` sum so a
10^9-cell global grid never lands on the driver. Every downstream
vector op consumes the folded raster, whose size is bounded by the
GRID, not the data — at 10^12 input rows the raster for a 8192x8192
grid is still only 67M rows.

Reference parity: the reference has no raster engine; these operators
extend its GEO preflight domain (fairy/preflight: lat/lon band checks)
to the tiling/raster vocabulary the north rule demands. All float
arithmetic is expression-order-mirrored by the DuckDB oracles in
pipelines/queries.py (identical IEEE double ops on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# Above this many grid cells the partial fold moves off the driver into
# a distributed groupby(pix) sum (the raster itself outgrows one heap).
RASTER_DRIVER_PIXELS = 4_000_000


def pixel_of(
    lon: np.ndarray,
    lat: np.ndarray,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(px, py) int64 pixel coordinates. The expression is kept in the
    exact form ``floor((lon - x0) * (width / (x1 - x0)))`` ONLY when the
    span divides cleanly; for oracle-exactness we use the literal
    two-op form ``floor((lon - x0) * scale)`` with ``scale = width /
    (x1 - x0)`` computed as one double — mirrored token-for-token by
    the SQL oracle. Out-of-bbox points are clipped into the edge
    pixels (the synthetic footprints never leave the bbox)."""
    x0, y0, x1, y1 = bbox
    sx = np.float64(width) / np.float64(x1 - x0)
    sy = np.float64(height) / np.float64(y1 - y0)
    px = np.floor((lon - x0) * sx).astype(np.int64)
    py = np.floor((lat - y0) * sy).astype(np.int64)
    np.clip(px, 0, width - 1, out=px)
    np.clip(py, 0, height - 1, out=py)
    return px, py


def rasterize_counts(
    ds: rd.Dataset,
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> pd.DataFrame:
    """Rasterize points into per-pixel counts: (px, py, n) for nonzero
    pixels, sorted by (py, px). Distributed per-batch partials (one row
    per DISTINCT pixel per batch, via np.unique — never a dense
    width*height buffer per batch); fold bounded by the grid."""

    def partial(t: pa.Table) -> pd.DataFrame:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        px, py = pixel_of(lon, lat, bbox, width, height)
        pix, n = np.unique(py * np.int64(width) + px, return_counts=True)
        return pd.DataFrame({"pix": pix, "n": n.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    if width * height > RASTER_DRIVER_PIXELS:
        folded_ds = parts.groupby("pix").aggregate(
            rd.aggregate.Sum("n", alias_name="n")
        )
        frames = list(folded_ds.iter_batches(batch_size=None, batch_format="pandas"))
        folded = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({"pix": pd.Series([], dtype=np.int64),
                               "n": pd.Series([], dtype=np.int64)})
        )
    else:
        allp = pd.concat(
            list(parts.iter_batches(batch_size=None, batch_format="pandas")),
            ignore_index=True,
        )
        folded = allp.groupby("pix", sort=False)["n"].sum().reset_index()
    pix = folded["pix"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "px": pix % np.int64(width),
            "py": pix // np.int64(width),
            "n": folded["n"].to_numpy(np.int64),
        }
    )
    return out.sort_values(["py", "px"], kind="mergesort").reset_index(drop=True)


def vectorize_pixels(
    raster: pd.DataFrame,
    *,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> pd.DataFrame:
    """Raster -> vector (polygonization): one axis-aligned rect feature
    per nonzero pixel — (px, py, lon0, lat0, lon1, lat1, n). Bounds use
    the single-division cell-size form ``x0 + px * ((x1 - x0) / width)``
    mirrored by the SQL oracle."""
    x0, y0, x1, y1 = bbox
    cw = np.float64(x1 - x0) / np.float64(width)
    ch = np.float64(y1 - y0) / np.float64(height)
    px = raster["px"].to_numpy(np.int64)
    py = raster["py"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "px": px,
            "py": py,
            "lon0": x0 + px * cw,
            "lat0": y0 + py * ch,
            "lon1": x0 + (px + 1) * cw,
            "lat1": y0 + (py + 1) * ch,
            "n": raster["n"].to_numpy(np.int64),
        }
    )


def zonal_stats(
    raster: pd.DataFrame,
    rects: list[tuple[str, float, float, float, float]],
    *,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> pd.DataFrame:
    """Raster x vector overlay: per polygon (tile rect), the count of
    raster pixels whose CENTER falls inside it and the sum of their
    values — (tile_id, n_pixels, total), sorted by tile_id. Containment
    is half-open (x0 <= c < x1), matching the engine's PIP semantics.
    The raster is grid-bounded, so the overlay is a vectorized
    numpy mask per polygon — O(grid x polygons), corpus-independent."""
    x0, y0, x1, y1 = bbox
    cw = np.float64(x1 - x0) / np.float64(width)
    ch = np.float64(y1 - y0) / np.float64(height)
    px = raster["px"].to_numpy(np.int64)
    py = raster["py"].to_numpy(np.int64)
    cx = x0 + (px + np.float64(0.5)) * cw
    cy = y0 + (py + np.float64(0.5)) * ch
    n = raster["n"].to_numpy(np.int64)
    rows = []
    for tid, rx0, ry0, rx1, ry1 in rects:
        m = (cx >= rx0) & (cx < rx1) & (cy >= ry0) & (cy < ry1)
        if m.any():
            rows.append((tid, int(m.sum()), int(n[m].sum())))
    return pd.DataFrame(rows, columns=["tile_id", "n_pixels", "total"]).sort_values(
        "tile_id", kind="mergesort"
    ).reset_index(drop=True)


def hotspot_components(
    raster: pd.DataFrame,
    *,
    width: int,
    height: int,
    rel_threshold: float = 2.0,
) -> pd.DataFrame:
    """Hotspot extraction (raster -> vector features): keep pixels whose
    count exceeds ``rel_threshold`` x the grid mean (mean over ALL
    width*height cells, zeros included — so the kept set stays sparse at
    every data density), label 4-adjacent components, and emit one
    feature per component: (comp, n_pixels, total, px0, py0, px1, py1)
    with comp = the minimum pixel id (py*width+px) of the component,
    sorted by comp.

    The threshold keeps the labeled set sparse, and the raster is
    grid-bounded, so union-find runs local — the corpus-sized work
    already happened in rasterize_counts."""
    total = int(raster["n"].sum())
    thr = rel_threshold * total / float(width * height)
    hot = raster[raster["n"].to_numpy(np.int64) > thr]
    if not len(hot):
        return pd.DataFrame(
            {
                "comp": pd.Series([], dtype=np.int64),
                "n_pixels": pd.Series([], dtype=np.int64),
                "total": pd.Series([], dtype=np.int64),
                "px0": pd.Series([], dtype=np.int64),
                "py0": pd.Series([], dtype=np.int64),
                "px1": pd.Series([], dtype=np.int64),
                "py1": pd.Series([], dtype=np.int64),
            }
        )
    px = hot["px"].to_numpy(np.int64)
    py = hot["py"].to_numpy(np.int64)
    n = hot["n"].to_numpy(np.int64)
    pix = py * np.int64(width) + px
    order = np.argsort(pix, kind="stable")
    pix_s = pix[order]
    # 4-adjacency edges among hot pixels: right neighbor (same row) and
    # down neighbor, found by sorted membership lookups
    right = pix + 1
    right_ok = (px < width - 1) & (
        pix_s[np.minimum(np.searchsorted(pix_s, right), len(pix_s) - 1)] == right
    )
    down = pix + np.int64(width)
    down_ok = (py < height - 1) & (
        pix_s[np.minimum(np.searchsorted(pix_s, down), len(pix_s) - 1)] == down
    )
    edges = pd.DataFrame(
        {
            "id_a": np.concatenate([pix[right_ok], pix[down_ok]]),
            "id_b": np.concatenate([right[right_ok], down[down_ok]]),
        }
    )
    from fairy_core_ray.stages.dedup import cluster_pairs

    labeled = cluster_pairs(edges)  # (id, rep) for pixels WITH edges
    rep_by_pix = dict(zip(labeled["id"], labeled["rep"]))
    comp = np.array([rep_by_pix.get(int(p), int(p)) for p in pix], dtype=np.int64)
    feat = pd.DataFrame(
        {"comp": comp, "n": n, "px": px, "py": py}
    ).groupby("comp", sort=True).agg(
        n_pixels=("n", "size"),
        total=("n", "sum"),
        px0=("px", "min"),
        py0=("py", "min"),
        px1=("px", "max"),
        py1=("py", "max"),
    ).reset_index()
    for c in feat.columns:
        feat[c] = feat[c].astype(np.int64)
    return feat
