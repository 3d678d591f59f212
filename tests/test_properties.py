"""Property-based tests (hypothesis): codec roundtrip, PIP vs brute
force, cell-encode hierarchy, minhash Jaccard bounds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fairy_core_ray.functions import codecs
from fairy_core_ray.functions.geo import (
    GridIndex,
    cell_parent,
    encode_cells,
    points_in_polygon,
)
from fairy_core_ray.stages import dedup as dd


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(4, 40),
    h=st.integers(4, 40),
    fmt=st.sampled_from(["png", "jpeg", "webp"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_codec_roundtrip_property(w, h, fmt, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out, got_fmt = codecs.decode(codecs.encode(pix, fmt))
    assert got_fmt == fmt and out.shape == pix.shape
    if fmt == "png":
        np.testing.assert_array_equal(out, pix)
    else:
        assert codecs.psnr(pix, out) >= 40.0
        assert np.abs(out.astype(int) - pix.astype(int)).max() <= 3


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_pts=st.integers(1, 200))
def test_grid_index_equals_bruteforce_property(seed, n_pts):
    rng = np.random.default_rng(seed)
    polys = []
    for i in range(rng.integers(1, 8)):
        cx, cy = rng.uniform(-1, 1, 2)
        r = rng.uniform(0.05, 0.6)
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        polys.append(
            {
                "tile_id": f"p{i}",
                "xs": (cx + r * np.cos(ang)).tolist(),
                "ys": (cy + r * np.sin(ang)).tolist(),
            }
        )
    px = rng.uniform(-1.2, 1.2, n_pts)
    py = rng.uniform(-1.2, 1.2, n_pts)
    gi = GridIndex(polys, nx=8, ny=8)
    got = set(zip(*[a.tolist() for a in gi.query_batch(px, py)]))
    want = set()
    for pi, p in enumerate(polys):
        hit = points_in_polygon(px, py, np.array(p["xs"]), np.array(p["ys"]))
        want |= {(int(j), pi) for j in np.flatnonzero(hit)}
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    lon=st.floats(-179.99, 179.99),
    lat=st.floats(-89.99, 89.99),
    res=st.integers(1, 20),
    parent=st.integers(0, 20),
)
def test_cell_parent_consistency_property(lon, lat, res, parent):
    parent = min(parent, res)
    child = encode_cells(np.array([lon]), np.array([lat]), res)
    up = cell_parent(child, parent)
    direct = encode_cells(np.array([lon]), np.array([lat]), parent)
    np.testing.assert_array_equal(up, direct)


@settings(max_examples=15, deadline=None)
@given(
    base=st.text(min_size=20, max_size=120),
    edit=st.text(min_size=0, max_size=10),
    seed=st.integers(0, 1000),
)
def test_minhash_estimate_within_bound(base, edit, seed):
    a = dd.char_shingles_u64(base, 5)
    b = dd.char_shingles_u64(base + edit, 5)
    true_j = dd.jaccard(set(a.tolist()), set(b.tolist()))
    sa = dd.minhash_signature(a, 128, seed)
    sb = dd.minhash_signature(b, 128, seed)
    est = float((sa == sb).mean())
    assert abs(est - true_j) <= 0.35  # loose Chernoff-style bound at P=128


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 64),
    h=st.integers(1, 64),
    n_pts=st.integers(0, 300),
)
def test_pixel_of_in_range_and_partition_property(seed, w, h, n_pts):
    """Every point lands in exactly one pixel, pixel coords stay in
    range even for out-of-bbox points (clip), and the pixel's own
    bounds (vectorize arithmetic) contain every in-bbox point."""
    from fairy_core_ray.stages.raster_stages import pixel_of

    rng = np.random.default_rng(seed)
    bbox = (-50.0, -20.0, 30.0, 44.0)
    lon = rng.uniform(bbox[0] - 10, bbox[2] + 10, n_pts)
    lat = rng.uniform(bbox[1] - 10, bbox[3] + 10, n_pts)
    px, py = pixel_of(lon, lat, bbox, w, h)
    assert ((px >= 0) & (px < w)).all() and ((py >= 0) & (py < h)).all()
    cw = (bbox[2] - bbox[0]) / w
    ch = (bbox[3] - bbox[1]) / h
    inside = (lon >= bbox[0]) & (lon < bbox[2]) & (lat >= bbox[1]) & (lat < bbox[3])
    lon0 = bbox[0] + px * cw
    lat0 = bbox[1] + py * ch
    # float-edge tolerance: floor((lon-x0)*scale) may land a boundary
    # point in the neighbor pixel, but never further than one ulp-cell
    assert (lon[inside] >= lon0[inside] - 1e-9).all()
    assert (lon[inside] <= lon0[inside] + cw + 1e-9).all()
    assert (lat[inside] >= lat0[inside] - 1e-9).all()
    assert (lat[inside] <= lat0[inside] + ch + 1e-9).all()


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), k=st.integers(0, 4), res=st.integers(1, 20))
def test_cell_kring_property(seed, k, res):
    """kring: every member is within Chebyshev distance k, the center is
    included, ids are sorted-unique, and size is the clipped window."""
    from fairy_core_ray.functions.geo import cell_kring

    rng = np.random.default_rng(seed)
    n = 1 << res
    ix, iy = int(rng.integers(0, n)), int(rng.integers(0, n))
    cell = (res << 58) | (ix << 29) | iy
    ring = cell_kring(cell, k)
    assert cell in ring
    assert (np.diff(ring) > 0).all()  # sorted, unique
    rx = (ring >> 29) & ((1 << 29) - 1)
    ry = ring & ((1 << 29) - 1)
    assert (np.maximum(np.abs(rx - ix), np.abs(ry - iy)) <= k).all()
    exp_w = min(n - 1, ix + k) - max(0, ix - k) + 1
    exp_h = min(n - 1, iy + k) - max(0, iy - k) + 1
    assert len(ring) == exp_w * exp_h
