"""Raster <-> vector operators vs brute-force numpy oracles
(stages/raster_stages.py). The DuckDB oracles in pipelines/queries.py
cover the driver-table queries; these pin the operators themselves on
independent synthetic points, including the distributed-fold branch."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fairy_core_ray.stages import raster_stages as rs

BBOX = (-10.0, -5.0, 10.0, 5.0)
W, H = 16, 8


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(7)
    n = 5_000
    lon = rng.uniform(BBOX[0], BBOX[2], n)
    lat = rng.uniform(BBOX[1], BBOX[3], n)
    # a dense multi-pixel hotspot blob in one corner + an isolated hot pixel
    lon = np.concatenate([lon, rng.uniform(-9.9, -7.0, 2_000), np.full(300, 7.3)])
    lat = np.concatenate([lat, rng.uniform(-4.9, -2.6, 2_000), np.full(300, 3.2)])
    return pd.DataFrame({"lon": lon, "lat": lat})


@pytest.fixture(scope="module")
def raster(points):
    ds = rd.from_pandas(points).repartition(6)
    return rs.rasterize_counts(ds, bbox=BBOX, width=W, height=H)


def brute_raster(points):
    px, py = rs.pixel_of(
        points["lon"].to_numpy(), points["lat"].to_numpy(), BBOX, W, H
    )
    df = pd.DataFrame({"px": px, "py": py})
    g = df.groupby(["px", "py"]).size().reset_index(name="n")
    g["n"] = g["n"].astype(np.int64)
    return g.sort_values(["py", "px"], kind="mergesort").reset_index(drop=True)


class TestRasterize:
    def test_matches_brute_force(self, points, raster):
        expect = brute_raster(points)
        pd.testing.assert_frame_equal(
            raster[["px", "py", "n"]], expect[["px", "py", "n"]]
        )

    def test_total_preserved(self, points, raster):
        assert raster["n"].sum() == len(points)

    def test_distributed_fold_branch_matches(self, points, raster, monkeypatch):
        monkeypatch.setattr(rs, "RASTER_DRIVER_PIXELS", 0)  # force groupby path
        ds = rd.from_pandas(points).repartition(6)
        big = rs.rasterize_counts(ds, bbox=BBOX, width=W, height=H)
        pd.testing.assert_frame_equal(big, raster)

    def test_out_of_bbox_clips_to_edges(self):
        pts = pd.DataFrame({"lon": [-99.0, 99.0], "lat": [-99.0, 99.0]})
        out = rs.rasterize_counts(
            rd.from_pandas(pts), bbox=BBOX, width=W, height=H
        )
        assert set(zip(out["px"], out["py"])) == {(0, 0), (W - 1, H - 1)}


class TestVectorize:
    def test_bounds_contain_centers_and_tile_the_grid(self, raster):
        vec = rs.vectorize_pixels(raster, bbox=BBOX, width=W, height=H)
        assert len(vec) == len(raster)
        cw = (BBOX[2] - BBOX[0]) / W
        ch = (BBOX[3] - BBOX[1]) / H
        assert np.allclose(vec["lon1"] - vec["lon0"], cw)
        assert np.allclose(vec["lat1"] - vec["lat0"], ch)
        # feature rect bounds land on the grid lattice
        assert np.allclose(vec["lon0"], BBOX[0] + vec["px"] * cw)
        assert (vec["n"].to_numpy() == raster["n"].to_numpy()).all()


class TestZonalStats:
    def test_matches_brute_force(self, raster):
        rects = [
            ("a", -10.0, -5.0, 0.0, 0.0),
            ("b", 0.0, 0.0, 10.0, 5.0),
            ("overlap", -5.0, -5.0, 5.0, 5.0),
            ("empty", 9.99, 4.99, 10.0, 5.0),
        ]
        out = rs.zonal_stats(raster, rects, bbox=BBOX, width=W, height=H)
        cw = (BBOX[2] - BBOX[0]) / W
        ch = (BBOX[3] - BBOX[1]) / H
        cx = BBOX[0] + (raster["px"].to_numpy() + 0.5) * cw
        cy = BBOX[1] + (raster["py"].to_numpy() + 0.5) * ch
        for tid, x0, y0, x1, y1 in rects:
            m = (cx >= x0) & (cx < x1) & (cy >= y0) & (cy < y1)
            row = out[out["tile_id"] == tid]
            if tid == "empty":
                assert row.empty and not m.any()
                continue
            assert int(row["n_pixels"].iloc[0]) == int(m.sum())
            assert int(row["total"].iloc[0]) == int(raster["n"].to_numpy()[m].sum())

    def test_overlapping_rects_double_count(self, raster):
        rects = [("all", *BBOX), ("all2", *BBOX)]
        out = rs.zonal_stats(raster, rects, bbox=BBOX, width=W, height=H)
        assert len(out) == 2
        assert out["total"].tolist() == [raster["n"].sum()] * 2


def brute_components(hot: pd.DataFrame, width: int) -> dict[int, int]:
    """BFS 4-adjacency labeling -> {pix: min-pix-of-component}."""
    pix = set((hot["py"] * width + hot["px"]).tolist())
    label: dict[int, int] = {}
    for start in sorted(pix):
        if start in label:
            continue
        stack, comp = [start], [start]
        seen = {start}
        while stack:
            p = stack.pop()
            x = p % width
            for q in (
                [p + 1] * (x < width - 1)
                + [p - 1] * (x > 0)
                + [p + width, p - width]
            ):
                if q in pix and q not in seen:
                    seen.add(q)
                    stack.append(q)
                    comp.append(q)
        rep = min(comp)
        for p in comp:
            label[p] = rep
    return label


class TestHotspots:
    def test_matches_brute_force(self, raster):
        out = rs.hotspot_components(raster, width=W, height=H)
        thr = 2.0 * raster["n"].sum() / float(W * H)
        hot = raster[raster["n"] > thr]
        assert len(hot) > 0, "fixture must produce hot pixels"
        label = brute_components(hot, W)
        expect_comps = sorted(set(label.values()))
        assert out["comp"].tolist() == expect_comps
        for comp, grp in pd.DataFrame(
            {
                "comp": [label[p] for p in (hot["py"] * W + hot["px"])],
                "n": hot["n"].to_numpy(),
                "px": hot["px"].to_numpy(),
                "py": hot["py"].to_numpy(),
            }
        ).groupby("comp"):
            row = out[out["comp"] == comp].iloc[0]
            assert row["n_pixels"] == len(grp)
            assert row["total"] == grp["n"].sum()
            assert (row["px0"], row["py0"]) == (grp["px"].min(), grp["py"].min())
            assert (row["px1"], row["py1"]) == (grp["px"].max(), grp["py"].max())

    def test_isolated_hot_pixel_is_singleton(self, raster):
        out = rs.hotspot_components(raster, width=W, height=H)
        # the fixture's 300-point stack at (7.3, 3.2) is one pixel
        px, py = rs.pixel_of(
            np.array([7.3]), np.array([3.2]), BBOX, W, H
        )
        pix = int(py[0]) * W + int(px[0])
        row = out[out["comp"] == pix]
        assert len(row) == 1 and row["n_pixels"].iloc[0] == 1

    def test_empty_raster(self):
        empty = pd.DataFrame(
            {
                "px": pd.Series([], dtype=np.int64),
                "py": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        out = rs.hotspot_components(empty, width=W, height=H)
        assert out.empty and list(out.columns) == [
            "comp", "n_pixels", "total", "px0", "py0", "px1", "py1",
        ]
