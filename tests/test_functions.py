"""Unit tests for pure kernels (no Ray needed)."""

import numpy as np
import pytest

from fairy_core_ray.functions import codecs
from fairy_core_ray.functions.geo import (
    GridIndex,
    cell_parent,
    encode_cells,
    points_in_polygon,
)
from fairy_core_ray.functions.hashing import hamming64, hash_u64, popcount64
from fairy_core_ray.sources import synth


class TestCodecs:
    def test_png_lossless_roundtrip(self):
        rng = np.random.default_rng(0)
        pix = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        out, fmt = codecs.decode(codecs.encode(pix, "png"))
        assert fmt == "png"
        np.testing.assert_array_equal(out, pix)

    @pytest.mark.parametrize("fmt", ["jpeg", "webp"])
    def test_lossy_psnr_over_40(self, fmt):
        rng = np.random.default_rng(1)
        pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        out, _ = codecs.decode(codecs.encode(pix, fmt))
        assert out.shape == pix.shape
        assert codecs.psnr(pix, out) >= 40.0

    def test_truncated_raises(self):
        pix = np.zeros((8, 8, 3), dtype=np.uint8)
        payload = codecs.encode(pix, "png")
        with pytest.raises(codecs.DecodeError):
            codecs.decode(payload[: len(payload) // 2])
        with pytest.raises(codecs.DecodeError):
            codecs.decode(b"XXXX" + payload[4:])


class TestHashing:
    def test_deterministic_and_seeded(self):
        x = np.arange(100, dtype=np.int64)
        a, b = hash_u64(x, 1), hash_u64(x, 1)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(hash_u64(x, 1), hash_u64(x, 2))

    def test_popcount(self):
        assert popcount64(np.array([0, 1, 3, 255, 2**63], dtype=np.uint64)).tolist() == [
            0,
            1,
            2,
            8,
            1,
        ]

    def test_hamming(self):
        a = np.array([0b1010], dtype=np.int64)
        b = np.array([0b0110], dtype=np.int64)
        assert hamming64(a, b).tolist() == [2]


class TestSynth:
    def test_schema_and_determinism(self):
        t1 = synth.image_table(200, seed=7)
        t2 = synth.image_table(200, seed=7)
        assert t1.schema.equals(synth.IMAGE_SCHEMA)
        assert t1.equals(t2)
        assert not synth.image_table(50, seed=8).equals(synth.image_table(50, seed=7))

    def test_violations_present(self):
        t = synth.image_table(synth.VIOLATION_MOD + 20)
        caps = t["caption"].to_pylist()
        fmts = t["fmt"].to_pylist()
        assert caps[synth.V_BLANK_CAPTION] == ""
        assert caps[synth.V_WS_CAPTION].strip() == ""
        assert fmts[synth.V_BAD_FMT] == "bmp"
        assert t["w"][synth.V_ZERO_W].as_py() == 0
        assert t["h"][synth.V_NEG_H].as_py() == -1
        ph = t["phash"].to_numpy()
        assert ph[synth.V_DUP_PHASH] == ph[0]
        assert hamming64(ph[synth.V_NEAR_PHASH : synth.V_NEAR_PHASH + 1], ph[0:1])[0] == 2
        with pytest.raises(codecs.DecodeError):
            codecs.decode(t["bytes"][synth.V_TRUNCATED].as_py())

    def test_clean_rows_decode_and_match(self):
        t = synth.image_table(30)
        for j in range(11, 30):  # rows past the violation bands
            pix, fmt = codecs.decode(t["bytes"][j].as_py())
            assert fmt == t["fmt"][j].as_py()
            assert pix.shape == (t["h"][j].as_py(), t["w"][j].as_py(), 3)

    def test_footprints_deterministic_with_hot_cluster(self):
        idx = np.arange(5000)
        lon, lat = synth.footprints_for(idx)
        lon2, _ = synth.footprints_for(idx)
        np.testing.assert_array_equal(lon, lon2)
        hot = idx % synth.HOT_MOD == 0
        assert np.all(np.abs(lon[hot] - synth.HOT_CENTER[0]) < 0.0011)
        assert lon.min() >= synth.BBOX[0] and lon.max() <= synth.BBOX[2]


class TestGeo:
    def test_encode_cells_matches_formula(self):
        lon = np.array([-122.0, 0.0, 179.999])
        lat = np.array([37.5, 0.0, 89.999])
        res = 13
        n = 1 << res
        cells = encode_cells(lon, lat, res)
        ix = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.testing.assert_array_equal(cells, (res << 58) | (ix << 29) | iy)

    def test_cell_parent_contains_child(self):
        lon = np.array([-122.123])
        lat = np.array([37.756])
        child = encode_cells(lon, lat, 15)
        parent = cell_parent(child, 10)
        np.testing.assert_array_equal(parent, encode_cells(lon, lat, 10))

    def test_cell_kring_interior_and_edge(self):
        from fairy_core_ray.functions.geo import cell_kring

        res, n = 13, 1 << 13
        mk = lambda ix, iy: (res << 58) | (ix << 29) | iy
        # interior: full 3x3 Chebyshev ball, sorted, includes center
        ring = cell_kring(mk(100, 200), 1)
        expect = sorted(
            mk(100 + dx, 200 + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        )
        assert ring.tolist() == expect
        assert mk(100, 200) in ring
        # grid corner: clipped to 2x2, no wraparound
        corner = cell_kring(mk(0, 0), 1)
        assert corner.tolist() == sorted(mk(dx, dy) for dx in (0, 1) for dy in (0, 1))
        # far edge
        edge = cell_kring(mk(n - 1, 5), 2)
        assert all(((c >> 29) & ((1 << 29) - 1)) <= n - 1 for c in edge.tolist())
        assert len(edge) == 3 * 5

    def test_pip_square_and_concave(self):
        xs = np.array([0.0, 2.0, 2.0, 0.0])
        ys = np.array([0.0, 0.0, 2.0, 2.0])
        px = np.array([1.0, 3.0, -0.5, 1.999])
        py = np.array([1.0, 1.0, 1.0, 0.001])
        assert points_in_polygon(px, py, xs, ys).tolist() == [True, False, False, True]
        # concave L: inside the notch is outside the polygon
        lxs = np.array([0.0, 3.0, 3.0, 1.0, 1.0, 0.0])
        lys = np.array([0.0, 0.0, 1.0, 1.0, 3.0, 3.0])
        assert points_in_polygon(
            np.array([0.5, 2.0, 2.0]), np.array([2.0, 0.5, 2.0]), lxs, lys
        ).tolist() == [True, True, False]

    def test_grid_index_matches_bruteforce(self):
        polys = synth.tile_polygons()
        rng = np.random.default_rng(3)
        px = rng.uniform(synth.BBOX[0], synth.BBOX[2], 2000)
        py = rng.uniform(synth.BBOX[1], synth.BBOX[3], 2000)
        idx = GridIndex(polys)
        pts, pis = idx.query_batch(px, py)
        got = set(zip(pts.tolist(), pis.tolist()))
        want = set()
        for pi, p in enumerate(polys):
            hit = points_in_polygon(px, py, np.array(p["xs"]), np.array(p["ys"]))
            for pt in np.flatnonzero(hit):
                want.add((int(pt), pi))
        assert got == want
        assert len(want) > 1000  # most points are inside some tile
