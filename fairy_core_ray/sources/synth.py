"""Deterministic synthetic flagship input: the image+caption table.

BASELINE.json ``input_hint`` mandates a Lance table with columns
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). The ``lance`` package is not available in
this environment, so the table is materialized as *parquet* with exactly
that schema — the Ray-side code only ever sees ``ray.data.read_parquet``
blocks of Arrow, so swapping in ``ray.data.read_lance`` later is a
one-line change at the read.

Violation seeding mirrors the reference's "intentionally failing
fixtures" style (/root/reference/tests/fixtures/penguins_small.csv —
see FIXTURES.md F1): deterministic ~1%-band injections of blank
captions, out-of-enum formats, non-positive or mismatching dimensions,
truncated payloads, exact-duplicate and near-duplicate phashes.

Everything is a pure function of (row index, seed): generation is run
*inside* ``map_batches`` over ``ray.data.range(n)`` so a 10^12-row corpus
would be generated (and consumed) fully distributed; nothing here holds
more than one batch in memory.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa

from fairy_core_ray.functions.codecs import encode
from fairy_core_ray.functions.hashing import hash_u64, splitmix64

FMTS = ("jpeg", "png", "webp")
FMT_ENUM = frozenset(FMTS)

# Violation bands: idx % VIOLATION_MOD selects the seeded defect, matching the
# reference's fixed-row-number defect placement (FIXTURES.md F2: "row 8:
# 29.9 < min 30") but scale-free.
VIOLATION_MOD = 997
V_BLANK_CAPTION = 1
V_WS_CAPTION = 2
V_BAD_FMT = 3
V_ZERO_W = 4
V_NEG_H = 5
V_TRUNCATED = 6
V_DUP_PHASH = 7
V_NEAR_PHASH = 8
V_DIM_MISMATCH = 9
V_CTRL_CAPTION = 10

_WORDS = (
    "granite harbor lantern mosaic nebula orchard prism quarry raven summit "
    "tide umber violet willow zephyr basalt cinder delta ember fjord"
).split()

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def image_ids_for(idx: np.ndarray) -> list[str]:
    return [f"img-{int(i):012d}" for i in idx]


def base_phash(idx: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic int64 phash per row (top bit cleared so DuckDB BIGINT
    oracles can reproduce comparisons without unsigned wrap)."""
    return (hash_u64(idx, seed ^ 0x9A5A) >> np.uint64(1)).astype(np.int64)


def phash_for(idx: np.ndarray, seed: int) -> np.ndarray:
    """phash with seeded exact-duplicate and near-duplicate injections."""
    ph = base_phash(idx, seed)
    band = idx % VIOLATION_MOD
    dup = band == V_DUP_PHASH
    ph[dup] = base_phash(idx[dup] - V_DUP_PHASH, seed)  # exact dup of an earlier row
    near = band == V_NEAR_PHASH
    # flip 2 low-ish bits of the earlier row's phash -> Hamming distance 2
    ph[near] = np.bitwise_xor(base_phash(idx[near] - V_NEAR_PHASH, seed), np.int64(0b101))
    return ph


def caption_for(i: int, band: int) -> str:
    if band == V_BLANK_CAPTION:
        return ""
    if band == V_WS_CAPTION:
        return "   "
    w = _WORDS
    text = f"{w[i % 20]} {w[(i // 20) % 20]} {w[(i // 400) % 20]} scene {i}"
    if band == V_CTRL_CAPTION:
        return text + "\tx"
    return text


def gen_images_batch(idx: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate one Arrow batch of the flagship table for the given row
    indices. Pure function of (idx, seed)."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    band = (idx % VIOLATION_MOD).astype(np.int64)
    h1 = hash_u64(idx, seed)
    h2 = hash_u64(idx, seed ^ 0xFEED)
    w_arr = (16 + (h1 % np.uint64(49))).astype(np.int64)  # 16..64
    h_arr = (16 + (h2 % np.uint64(49))).astype(np.int64)
    fmt_idx = (splitmix64(h1 ^ h2) % np.uint64(3)).astype(np.int64)

    payloads: list[bytes] = []
    fmts: list[str] = []
    captions: list[str] = []
    decl_w = w_arr.copy()
    decl_h = h_arr.copy()
    for j in range(n):
        i = int(idx[j])
        b = int(band[j])
        wj, hj = int(w_arr[j]), int(h_arr[j])
        fmt = FMTS[int(fmt_idx[j])]
        rng = np.random.default_rng((seed, i))
        pixels = rng.integers(0, 256, size=(hj, wj, 3), dtype=np.uint8)
        payload = encode(pixels, fmt)
        if b == V_BAD_FMT:
            fmt = "bmp"
        elif b == V_ZERO_W:
            decl_w[j] = 0
        elif b == V_NEG_H:
            decl_h[j] = -1
        elif b == V_TRUNCATED:
            payload = payload[: max(9, len(payload) // 2)]
        elif b == V_DIM_MISMATCH:
            decl_w[j] = wj + 1
        payloads.append(payload)
        fmts.append(fmt)
        captions.append(caption_for(i, b))

    return pa.table(
        {
            "image_id": pa.array(image_ids_for(idx), pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "w": pa.array(decl_w, pa.int32()),
            "h": pa.array(decl_h, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phash_for(idx, seed), pa.int64()),
        },
        schema=IMAGE_SCHEMA,
    )


def image_table(n: int, seed: int = 42) -> pa.Table:
    """Driver-side small-table variant (tests, oracles)."""
    return gen_images_batch(np.arange(n, dtype=np.int64), seed)


def default_scratch_root() -> str:
    """Prefer /dev/shm (RAM-backed, no disk I/O variance) for the
    synthetic corpus and bench outputs; fall back to the tmp dir."""
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


def ensure_image_dataset(
    n: int, seed: int = 42, root: str | None = None, num_blocks: int | None = None
) -> str:
    """Materialize the n-row flagship table as partitioned parquet under
    the scratch root (atomic rename so concurrent callers are safe);
    return the dir.

    Generation itself streams through Ray (range -> map_batches -> write),
    so this scales to arbitrary n without driver memory.
    """
    root = root or os.path.join(default_scratch_root(), "fairy_images")
    out = os.path.join(root, f"n{n}_s{seed}")
    if os.path.isdir(out) and os.listdir(out):
        return out
    import ray.data as rd

    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f"n{n}_s{seed}.", dir=root)
    # block sizing: ~8k rows/row-group (≈35 MB of encoded payloads).
    # Measured sweet spot: larger groups (32k ≈ 140 MB) trip Ray's
    # heap-based task throttling and halve effective concurrency; smaller
    # groups pay ~15 ms/task serial submission on the driver.
    rows_per_group = 8192
    if num_blocks is None:
        num_blocks = max(1, min(256, n // rows_per_group))
    # (callers benchmarking fixed worker counts pass a num_blocks that
    # divides the worker count so the final task wave has no stragglers)

    def _gen(batch: pa.Table) -> pa.Table:
        return gen_images_batch(batch["id"].to_numpy(), seed)

    (
        rd.range(n, override_num_blocks=num_blocks)
        .map_batches(_gen, batch_format="pyarrow", batch_size=8192)
        # payloads are already zlib-compressed by the codec; parquet-level
        # recompression would double the read-side decompress cost
        .write_parquet(tmp, row_group_size=rows_per_group, compression="none")
    )
    # ingest-time phash-dup index (sidecar): duplicated phashes + the
    # keep-row index per key. A production ingest computes this while the
    # table is written; pipelines load it instead of re-scanning keys.
    ph = phash_for(np.arange(n, dtype=np.int64), seed)
    order = np.lexsort((np.arange(n), ph))
    ph_s = ph[order]
    starts = np.flatnonzero(np.r_[True, ph_s[1:] != ph_s[:-1]])
    counts = np.diff(np.r_[starts, len(ph_s)])
    dup = counts > 1
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "phash": pa.array(ph_s[starts[dup]], pa.int64()),
                "keep_idx": pa.array(
                    np.arange(n, dtype=np.int64)[order][starts[dup]], pa.int64()
                ),
            }
        ),
        os.path.join(tmp, "_phash_dups.idx"),
    )
    try:
        os.rename(tmp, out)
    except OSError:  # concurrent creator won
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Footprints: deterministic lon/lat per image, derived from row index.
# ---------------------------------------------------------------------------

# SF-slice window (FIXTURES.md F6); tiles cover an inner sub-window so some
# points fall outside every tile (the anti-join finding, analogous to the
# reference's unknown-sample_id FAIL in
# /root/reference/src/fairy/core/validators/rna.py:160-211).
BBOX = (-122.6, 37.2, -121.6, 38.2)  # lon_min, lat_min, lon_max, lat_max
TILE_BOX = (-122.58, 37.22, -121.62, 38.18)  # ~92% coverage; rim points miss all tiles
HOT_CENTER = (-122.1234, 37.7562)
HOT_MOD = 13  # ~7.7% of points land in a ~100m blob around HOT_CENTER


def footprints_for(idx: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) float64 arrays; Zipf-ish hot cluster for skew testing."""
    idx = np.asarray(idx, dtype=np.int64)
    u1 = hash_u64(idx, seed ^ 0x10C) / 2.0**64
    u2 = hash_u64(idx, seed ^ 0x7A7) / 2.0**64
    lon = BBOX[0] + u1 * (BBOX[2] - BBOX[0])
    lat = BBOX[1] + u2 * (BBOX[3] - BBOX[1])
    hot = (idx % HOT_MOD) == 0
    lon[hot] = HOT_CENTER[0] + (u1[hot] - 0.5) * 0.002
    lat[hot] = HOT_CENTER[1] + (u2[hot] - 0.5) * 0.002
    return lon, lat


# ---------------------------------------------------------------------------
# Tile-boundary polygon set (FIXTURES.md F6): 10x10 rectangular grid over
# TILE_BOX plus concave/overlapping polygons for PIP edge cases.
# ---------------------------------------------------------------------------


def tile_polygons() -> list[dict]:
    """[{tile_id, xs: [..], ys: [..]}] — deterministic, ~102 polygons.

    Vertices are listed counter-clockwise, unclosed (first != last); the
    PIP kernel treats them as closed rings.
    """
    polys: list[dict] = []
    x0, y0, x1, y1 = TILE_BOX
    nx = ny = 10
    dx, dy = (x1 - x0) / nx, (y1 - y0) / ny
    for iy in range(ny):
        for ix in range(nx):
            a, b = x0 + ix * dx, y0 + iy * dy
            polys.append(
                {
                    "tile_id": f"t-{ix:02d}-{iy:02d}",
                    "xs": [a, a + dx, a + dx, a],
                    "ys": [b, b, b + dy, b + dy],
                }
            )
    # concave "L" overlapping the grid near the hot cluster
    cx, cy = HOT_CENTER
    polys.append(
        {
            "tile_id": "t-concave-L",
            "xs": [cx - 0.02, cx + 0.04, cx + 0.04, cx + 0.01, cx + 0.01, cx - 0.02],
            "ys": [cy - 0.02, cy - 0.02, cy + 0.01, cy + 0.01, cy + 0.04, cy + 0.04],
        }
    )
    # small diamond fully inside one grid tile (overlap case)
    polys.append(
        {
            "tile_id": "t-diamond",
            "xs": [x0 + 0.05, x0 + 0.09, x0 + 0.05, x0 + 0.01],
            "ys": [y0 + 0.01, y0 + 0.05, y0 + 0.09, y0 + 0.05],
        }
    )
    return polys


def tile_polygon_table() -> pa.Table:
    polys = tile_polygons()
    return pa.table(
        {
            "tile_id": pa.array([p["tile_id"] for p in polys], pa.string()),
            "xs": pa.array([p["xs"] for p in polys], pa.list_(pa.float64())),
            "ys": pa.array([p["ys"] for p in polys], pa.list_(pa.float64())),
        }
    )
