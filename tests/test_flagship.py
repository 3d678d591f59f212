"""Golden end-to-end test: flagship pipeline vs a sequential oracle.

The oracle recomputes every stage single-process with plain numpy/python
(brute-force PIP over all polygons, direct rule evaluation), playing the
role of the reference implementation (SURVEY.md §7.4 hard part 6: the
reference has no spatial ops, so parity = our own sequential oracle plus
fairy-core's rule semantics reproduced exactly).
"""

import numpy as np
import pytest

from fairy_core_ray.functions import codecs
from fairy_core_ray.functions.geo import encode_cells, points_in_polygon
from fairy_core_ray.pipelines.flagship import flagship
from fairy_core_ray.sources import synth

N = 1500
SEED = 42


@pytest.fixture(scope="module")
def images_path():
    return synth.ensure_image_dataset(N, seed=SEED)


def oracle_rows(n=N, seed=SEED):
    """Sequential oracle: dict image_id -> (valid, dup_first, cell,
    set_of_tile_ids or {None})."""
    t = synth.image_table(n, seed)
    idx = np.arange(n, dtype=np.int64)
    lon, lat = synth.footprints_for(idx, seed)
    cells = encode_cells(lon, lat)
    polys = synth.tile_polygons()

    # validity per reference rule semantics
    valid = np.ones(n, dtype=bool)
    captions = t["caption"].to_pylist()
    fmts = t["fmt"].to_pylist()
    ws = t["w"].to_numpy()
    hs = t["h"].to_numpy()
    payloads = t["bytes"].to_pylist()
    import re

    ctrl = re.compile(r"[\t\r\n\x00-\x1f\x7f]")
    for i in range(n):
        ok = captions[i] is not None and captions[i].strip() != ""
        ok = ok and not (captions[i] and ctrl.search(captions[i]))
        ok = ok and fmts[i] in ("jpeg", "png", "webp")
        ok = ok and ws[i] > 0 and hs[i] > 0 and len(payloads[i]) > 0
        if ok:
            try:
                pix, _ = codecs.decode(payloads[i])
                ok = pix.shape[0] == hs[i] and pix.shape[1] == ws[i]
            except codecs.DecodeError:
                ok = False
        valid[i] = ok

    # keep-first dedup on phash (first = min row index)
    ph = t["phash"].to_numpy()
    seen: dict[int, int] = {}
    dup_first = np.ones(n, dtype=bool)
    for i in range(n):
        k = int(ph[i])
        if k in seen:
            dup_first[i] = False
        else:
            seen[k] = i

    # brute-force PIP
    tiles_per_point: list[set] = [set() for _ in range(n)]
    for p in polys:
        hit = points_in_polygon(lon, lat, np.array(p["xs"]), np.array(p["ys"]))
        for j in np.flatnonzero(hit):
            tiles_per_point[j].add(p["tile_id"])
    ids = t["image_id"].to_pylist()
    return {
        ids[i]: (bool(valid[i]), bool(dup_first[i]), int(cells[i]), tiles_per_point[i] or {None})
        for i in range(n)
    }


def test_flagship_matches_sequential_oracle(images_path):
    res = flagship(images_path)
    df = res["assignments"].to_pandas()
    want = oracle_rows()

    got: dict[str, tuple] = {}
    for image_id, grp in df.groupby("image_id"):
        tiles = {x if isinstance(x, str) else None for x in grp["tile_id"]}
        got[image_id] = (
            bool(grp["valid"].iloc[0]),
            bool(grp["dup_first"].iloc[0]),
            int(grp["cell"].iloc[0]),
            tiles,
        )
    assert len(got) == N
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"{len(mismatches)} mismatching rows, e.g. {list(mismatches.items())[:3]}"


def test_tile_stats_match_assignments(images_path):
    res = flagship(images_path)
    df = res["assignments"].to_pandas()
    stats = res["tile_stats"].to_pandas()
    kept = df[df["valid"] & df["dup_first"] & df["tile_id"].notna()]
    want = kept.groupby(["cell", "tile_id"]).size()
    assert len(stats) == len(want)
    for row in stats.itertuples():
        assert want[(row.cell, row.tile_id)] == row.n_images
    # sorted descending by count
    assert (stats["n_images"].values[:-1] >= stats["n_images"].values[1:]).all()
    # hot cluster produced a dominant cell
    assert stats.iloc[0]["n_images"] > 5 * stats["n_images"].median()


def test_per_row_invariant_decode_psnr_and_caption(images_path):
    """BASELINE.json input_hint: decoded-pixel PSNR>=40dB (lossy) /
    exact (lossless) + exact caption equality through the pipeline."""
    import ray.data as rd

    from fairy_core_ray.pipelines.flagship import validated_images

    src = synth.image_table(200, SEED)
    out = (
        validated_images(images_path, decode=True)
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    for i in range(200):
        image_id = src["image_id"][i].as_py()
        row = out.loc[image_id]
        assert row["caption"] == src["caption"][i].as_py()  # exact caption equality
        if not row["valid"]:
            continue
        pix, fmt = codecs.decode(src["bytes"][i].as_py())
        rng = np.random.default_rng((SEED, i))
        orig = rng.integers(0, 256, size=pix.shape, dtype=np.uint8)
        if fmt in codecs.LOSSY_FMTS:
            assert codecs.psnr(orig, pix) >= 40.0
        else:
            np.testing.assert_array_equal(orig, pix)


def test_dup_key_publish_failure_propagates(images_path, monkeypatch):
    """If the dup-key scan fails, the pipeline must FAIL (with the scan's
    error as cause), not hang forever on the unpublished broadcast."""
    from fairy_core_ray.pipelines import flagship as fmod

    def boom(path):
        raise ValueError("injected dup-scan failure")

    monkeypatch.setattr(fmod, "_dup_keys", boom)
    monkeypatch.setattr(fmod, "_sidecar_exists", lambda p: False)  # force async path
    res = fmod.flagship(images_path)
    with pytest.raises(Exception, match="dup"):
        res["assignments"].count()


def test_bucketed_dup_keys_match_flat(images_path, monkeypatch):
    """With the broadcast budget forced tiny, the range-partitioned
    bucket path must mark exactly the same dup_first mask as the flat
    broadcast (flagship.py BROADCAST_KEY_BUDGET fallback)."""
    from fairy_core_ray.pipelines import flagship as fmod

    def run():
        res = fmod.flagship(images_path)
        return (
            res["assignments"]
            .to_pandas()
            .sort_values(["image_id", "tile_id"], na_position="last")
            .reset_index(drop=True)
        )

    flat = run()
    monkeypatch.setattr(fmod, "BROADCAST_KEY_BUDGET", 3)  # force many buckets
    fmod._STAGE_CACHE.clear()  # new broadcast structure -> new stage
    bucketed = run()
    fmod._STAGE_CACHE.clear()
    assert flat["dup_first"].to_numpy().tolist() == bucketed["dup_first"].to_numpy().tolist()
    assert flat.equals(bucketed)
