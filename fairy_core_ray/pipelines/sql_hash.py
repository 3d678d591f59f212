"""DuckDB-SQL renderings of the engine's deterministic kernels.

The flagship image table is a pure function of (row index, seed)
(sources/synth.py), and the geo stages are arithmetic-only
(functions/geo.py), so the whole flagship pipeline — synth → validate →
phash keep-first dedup → footprint → cell encode → PIP join → tile
stats — is expressible as ONE DuckDB SELECT. That turns the headline
pipeline's driver check from rows-only into a full rows+schema+value-hash
CORRECTNESS row (VERDICT r3 next-round #1).

Exactness notes:
* SplitMix64 is reproduced with HUGEINT split-multiplication
  (a*k mod 2^64 via 32-bit halves — DuckDB integer ops error on
  overflow, so every wrap is an explicit ``% 2**64``) and UBIGINT
  xor/shift. Verified bit-exact against functions/hashing.hash_u64
  (test_flagship_oracle).
* Float derivations (u = h / 2^64, lon/lat affine maps, cell floor
  arithmetic, PIP edge interpolation) use the same IEEE-double operation
  order as the numpy kernels, with every literal cast to DOUBLE so DuckDB
  never routes through DECIMAL arithmetic.
* The PIP oracle mirrors functions/geo.points_in_polygon exactly: per
  (point, polygon-edge) even-odd crossing count with the identical
  half-open straddle test and interpolated crossing abscissa.
"""

from __future__ import annotations

import numpy as np

from fairy_core_ray.functions.hashing import splitmix64

_M64 = 1 << 64
_K1 = 0xBF58476D1CE4E5B9
_K2 = 0x94D049BB133111EB


def _sm_const(seed: int) -> int:
    """splitmix64(seed) as a Python int — the per-seed xor constant of
    hash_u64 (hashing.py:30-32), precomputed so the SQL does one xor."""
    return int(splitmix64(np.full(1, seed, dtype=np.uint64))[0])


def sm_stage1(col: str) -> str:
    """z0 = (x + K0) mod 2^64; return xor(z0, z0 >> 30) as UBIGINT.
    ``col`` is a UBIGINT column/expression in [0, 2^64)."""
    z0 = f"((CAST({col} AS HUGEINT) + 11400714819323198485) % {_M64})"
    return f"xor(CAST({z0} AS UBIGINT), CAST({z0} AS UBIGINT) >> 30)"


def _mul_xor(col: str, k: int, shift: int) -> str:
    """y = (col * k) mod 2^64 (32-bit split multiply in HUGEINT), then
    xor(y, y >> shift). ``col`` is UBIGINT; result UBIGINT."""
    khi, klo = k >> 32, k & 0xFFFFFFFF
    m = (
        f"((CAST({col} AS HUGEINT) * {klo} + "
        f"((CAST({col} AS HUGEINT) * {khi}) % 4294967296) * 4294967296) % {_M64})"
    )
    return f"xor(CAST({m} AS UBIGINT), CAST({m} AS UBIGINT) >> {shift})"


def sm_stage2(col: str) -> str:
    return _mul_xor(col, _K1, 27)


def sm_stage3(col: str) -> str:
    return _mul_xor(col, _K2, 31)


def seeded_input(idx_expr: str, seed: int) -> str:
    """UBIGINT expression ``idx ^ splitmix64(seed)`` — the input to the
    three splitmix stages. ``idx_expr`` must be a non-negative BIGINT
    expression (cast-safe to UBIGINT)."""
    return f"xor(CAST({idx_expr} AS UBIGINT), CAST({_sm_const(seed)} AS UBIGINT))"


def seeded_input_wrapped(idx_expr: str, offset: int, seed: int) -> str:
    """Same, for ``(idx - offset) mod 2^64`` (numpy uint64 wrap for
    idx < offset — the dup/near phash back-references in synth.py)."""
    wrapped = f"CAST(((CAST({idx_expr} AS HUGEINT) - {offset} + {_M64}) % {_M64}) AS UBIGINT)"
    return f"xor({wrapped}, CAST({_sm_const(seed)} AS UBIGINT))"


def hash_stage_cte(inner: str, cols: list[str], keep: list[str]) -> str:
    """Three chained subquery stages applying splitmix64 to every column in
    ``cols`` (named pass-through for ``keep``) over ``inner``. Returns a
    CTE body string ``(SELECT ... FROM (SELECT ... FROM (...)))``."""
    k = ", ".join(keep)
    s1 = ", ".join(f"{sm_stage1(c)} AS {c}" for c in cols)
    s2 = ", ".join(f"{sm_stage2(c)} AS {c}" for c in cols)
    s3 = ", ".join(f"{sm_stage3(c)} AS {c}" for c in cols)
    return (
        f"SELECT {k}, {s3} FROM ("
        f"SELECT {k}, {s2} FROM ("
        f"SELECT {k}, {s1} FROM ({inner})))"
    )


# --- flagship geometry ------------------------------------------------------


def _f(v: float) -> str:
    """A double literal DuckDB will keep in DOUBLE (repr round-trips)."""
    return f"CAST({float(v)!r} AS DOUBLE)"


def tile_edges_values() -> str:
    """(tile_id, x1, y1, x2, y2) VALUES rows: every edge of every
    polygon in sources/synth.tile_polygons(), vertices rolled exactly as
    points_in_polygon does (xs vs np.roll(xs, -1))."""
    from fairy_core_ray.sources.synth import tile_polygons

    rows = []
    for p in tile_polygons():
        xs, ys = p["xs"], p["ys"]
        m = len(xs)
        for j in range(m):
            x1, y1 = xs[j], ys[j]
            x2, y2 = xs[(j + 1) % m], ys[(j + 1) % m]
            rows.append(
                f"('{p['tile_id']}', {_f(x1)}, {_f(y1)}, {_f(x2)}, {_f(y2)})"
            )
    return ", ".join(rows)


def flagship_tile_stats_sql(series_sql: str, seed: int = 42) -> str:
    """Full flagship oracle over an index series.

    ``series_sql`` must yield one column ``i`` covering exactly the row
    indices 0..n-1 of the synthetic corpus (any order). The pipeline
    re-derivation mirrors, stage for stage:
    * synth.phash_for (dup/near injections by violation band),
    * validate_images (valid ⇔ no seeded violation: the per-column rule
      predicates over the generated values reduce to band membership —
      bands 1-6, 9, 10 each violate exactly one rule; decode_ok, the one
      rule SQL cannot evaluate (zlib), fails exactly on band 6),
    * flagship keep-first dedup (min row index per phash),
    * synth.footprints_for (splitmix u1/u2 → affine map, hot-cluster
      override), functions/geo.encode_cells (res 13), and
    * the even-odd ray-cast PIP join against tile_polygons(),
    then aggregates COUNT(*) per (cell, tile_id) over
    valid AND dup_first AND matched — exactly pipelines/flagship.py's
    ``tile_stats`` (minus the sort, which the driver compare ignores).
    """
    from fairy_core_ray.sources.synth import BBOX, HOT_CENTER, HOT_MOD

    w_lon = float(BBOX[2]) - float(BBOX[0])
    w_lat = float(BBOX[3]) - float(BBOX[1])
    inner = (
        f"SELECT i, i % 997 AS band, "
        f"{seeded_input('i', seed ^ 0x10C)} AS hl, "
        f"{seeded_input('i', seed ^ 0x7A7)} AS ht, "
        f"{seeded_input('i', seed ^ 0x9A5A)} AS hp, "
        f"{seeded_input_wrapped('i', 7, seed ^ 0x9A5A)} AS hp7, "
        f"{seeded_input_wrapped('i', 8, seed ^ 0x9A5A)} AS hp8 "
        f"FROM ({series_sql})"
    )
    hashed = hash_stage_cte(inner, ["hl", "ht", "hp", "hp7", "hp8"], ["i", "band"])
    cell = (
        "(13 * 288230376151711744 "
        "+ CAST(floor((lon + CAST(180.0 AS DOUBLE)) / CAST(360.0 AS DOUBLE) "
        "* CAST(8192.0 AS DOUBLE)) AS BIGINT) * 536870912 "
        "+ CAST(floor((lat + CAST(90.0 AS DOUBLE)) / CAST(180.0 AS DOUBLE) "
        "* CAST(8192.0 AS DOUBLE)) AS BIGINT))"
    )
    return (
        f"WITH hashed AS ({hashed}), "
        "pts AS (SELECT i, band, "
        f"CAST(hl AS DOUBLE) / CAST({float(2.0**64)!r} AS DOUBLE) AS u1, "
        f"CAST(ht AS DOUBLE) / CAST({float(2.0**64)!r} AS DOUBLE) AS u2, "
        "CASE WHEN band = 7 THEN CAST(hp7 >> 1 AS BIGINT) "
        "WHEN band = 8 THEN CAST(xor(hp8 >> 1, CAST(5 AS UBIGINT)) AS BIGINT) "
        "ELSE CAST(hp >> 1 AS BIGINT) END AS phash "
        "FROM hashed), "
        "geo AS (SELECT i, band, phash, "
        f"CASE WHEN i % {HOT_MOD} = 0 "
        f"THEN {_f(HOT_CENTER[0])} + (u1 - CAST(0.5 AS DOUBLE)) * {_f(0.002)} "
        f"ELSE {_f(BBOX[0])} + u1 * {_f(w_lon)} END AS lon, "
        f"CASE WHEN i % {HOT_MOD} = 0 "
        f"THEN {_f(HOT_CENTER[1])} + (u2 - CAST(0.5 AS DOUBLE)) * {_f(0.002)} "
        f"ELSE {_f(BBOX[1])} + u2 * {_f(w_lat)} END AS lat "
        "FROM pts), "
        f"flags AS (SELECT i, lon, lat, {cell} AS cell, "
        "band NOT IN (1, 2, 3, 4, 5, 6, 9, 10) AS valid, "
        "i = min(i) OVER (PARTITION BY phash) AS dup_first "
        "FROM geo), "
        "fpts AS (SELECT i, lon, lat, cell FROM flags WHERE valid AND dup_first), "
        f"edges(tile_id, x1, y1, x2, y2) AS (VALUES {tile_edges_values()}), "
        "m AS (SELECT p.i, e.tile_id FROM fpts p CROSS JOIN edges e "
        "GROUP BY p.i, e.tile_id "
        "HAVING SUM(CASE WHEN ((e.y1 <= p.lat) <> (e.y2 <= p.lat)) "
        "AND p.lon < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1) "
        "THEN 1 ELSE 0 END) % 2 = 1) "
        "SELECT f.cell AS cell, m.tile_id AS tile_id, "
        "CAST(count(*) AS BIGINT) AS n_images "
        "FROM fpts f JOIN m ON m.i = f.i GROUP BY 1, 2"
    )


def image_dims_hist_sql(series_sql: str, seed: int = 42) -> str:
    """(fmt, w, h) histogram of the synthetic image table, re-derived
    from generator arithmetic (synth.gen_images_batch): w = 16 +
    hash_u64(i, seed) % 49, h = 16 + hash_u64(i, seed^0xFEED) % 49,
    fmt = FMTS[splitmix64(h1 ^ h2) % 3], with the violation-band
    overrides (V_BAD_FMT→'bmp', V_ZERO_W→w=0, V_NEG_H→h=-1,
    V_DIM_MISMATCH→w+1) applied exactly as the generator does — so a
    column-pruned read of the materialized parquet must reproduce it."""
    from fairy_core_ray.sources.synth import (
        FMTS,
        V_BAD_FMT,
        V_DIM_MISMATCH,
        V_NEG_H,
        V_ZERO_W,
        VIOLATION_MOD,
    )

    inner = (
        f"SELECT i, i % {VIOLATION_MOD} AS band, "
        f"{seeded_input('i', seed)} AS h1, "
        f"{seeded_input('i', seed ^ 0xFEED)} AS h2 "
        f"FROM ({series_sql})"
    )
    hashed = hash_stage_cte(inner, ["h1", "h2"], ["i", "band"])
    fmt_inner = f"SELECT band, h1, h2, xor(h1, h2) AS hf FROM ({hashed})"
    hashed2 = hash_stage_cte(fmt_inner, ["hf"], ["band", "h1", "h2"])
    fmt_case = " ".join(
        f"WHEN {k} THEN '{f}'" for k, f in enumerate(FMTS)
    )
    return (
        f"WITH g AS ({hashed2}), "
        "dims AS (SELECT band, "
        "CAST(16 + h1 % 49 AS BIGINT) AS w0, "
        "CAST(16 + h2 % 49 AS BIGINT) AS h0, "
        f"CASE CAST(hf % 3 AS BIGINT) {fmt_case} END AS fmt0 FROM g) "
        "SELECT "
        f"CASE WHEN band = {V_BAD_FMT} THEN 'bmp' ELSE fmt0 END AS fmt, "
        f"CAST(CASE band WHEN {V_ZERO_W} THEN 0 WHEN {V_DIM_MISMATCH} "
        "THEN w0 + 1 ELSE w0 END AS BIGINT) AS w, "
        f"CAST(CASE band WHEN {V_NEG_H} THEN -1 ELSE h0 END AS BIGINT) AS h, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM dims GROUP BY 1, 2, 3"
    )


ASPECT_BUCKET_CASE = (
    "CASE WHEN w * 2 <= h THEN 'tall_2x' "
    "WHEN w * 5 < h * 4 THEN 'tall' "
    "WHEN w * 4 <= h * 5 THEN 'square' "
    "WHEN w < h * 2 THEN 'wide' "
    "ELSE 'wide_2x' END"
)


def aspect_buckets_sql(series_sql: str, seed: int = 42) -> str:
    """(bucket, fmt) histogram of the synthetic image table's VALID-dim
    rows — SDXL-style aspect-ratio bucketing for training-batch
    assembly, with integer-exact class boundaries (w/h thresholds 0.5,
    0.8, 1.25, 2.0 expressed as cross-multiplied integer comparisons, so
    no float ratio ever exists to disagree on). Reuses the dims
    re-derivation of image_dims_hist_sql as a subquery."""
    return (
        f"WITH dims AS ({image_dims_hist_sql(series_sql, seed)}) "
        f"SELECT {ASPECT_BUCKET_CASE} AS bucket, fmt, "
        "CAST(sum(n) AS BIGINT) AS n_images, "
        "CAST(max(w) AS BIGINT) AS max_w, CAST(max(h) AS BIGINT) AS max_h "
        "FROM dims WHERE w > 0 AND h > 0 GROUP BY 1, 2"
    )


# Index series 0..4*count(documents)-1 — the exact corpus size
# q_flagship_tile_stats materializes for a given sf_dir (queries.py),
# derived from the documents VIEW so the oracle is sf-independent.
DOCS_X4_SERIES_SQL = (
    "SELECT d.rn * 4 - 4 + k.k AS i "
    "FROM (SELECT row_number() OVER () AS rn FROM documents) d "
    "CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)"
)
