"""Round-5 operator batch: curation/CDC shapes the earlier rounds did
not cover — importance-weighted sampling, normalization-canonical
dedup, snapshot (CDC) diff, and threshold heavy hitters.

All four are SQL-oracle-backed (integer-exact gates, single-IEEE-op
floats, md5 keys) and follow the repo's scale postures: streaming
filters, per-batch partial combines, ×256 hash-bucketed group folds,
broadcast-only small sides. The reference has no counterpart surface
(its scope is CSV validation — /root/reference/src/fairy/core/
rulepack_runner.py); these are the large-scale-pipeline additions the
brief mandates, alongside stages/sampling.py and stages/dedup.py.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from fairy_core_ray.pipelines.queries import _t
from fairy_core_ray.stages import dedup as dd
from fairy_core_ray.stages.sampling import HASH_MOD, HASH_MULT, _gate_hash

# ---------------------------------------------------------------------------
# importance_sample — DSIR-flavored deterministic importance resampling
# ---------------------------------------------------------------------------

#: documents at/above this length are always kept (weight saturates at 1)
IMPORTANCE_FULL_LEN = 500
_IMPORTANCE_SALT = 71


def q_importance_sample(sf_dir: str):
    """Importance-weighted resampling (the DSIR shape, Xie et al. 2023):
    keep each doc with probability proportional to a per-doc importance
    weight — here ``min(1, n_chars / 500)``, a stand-in for an
    importance-model score that is itself a column. The gate is the
    repo's deterministic multiplicative hash (stages/sampling.py) with
    an integer-exact rational comparison ``h * 500 < n_chars * M`` — no
    float rounding, no RNG state, so the selection is reproducible
    across reruns, block orders and cluster sizes, and a SQL oracle
    reproduces it bit-for-bit. Zero shuffle: one streaming filter."""

    def gate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = _gate_hash(ids, salt=_IMPORTANCE_SALT)
        n_chars = t["n_chars"].to_numpy()
        keep = h * IMPORTANCE_FULL_LEN < n_chars * HASH_MOD
        return t.filter(pa.array(keep))

    return _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        gate, batch_format="pyarrow"
    )


IMPORTANCE_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE (((CAST(doc_id AS HUGEINT) + {_IMPORTANCE_SALT}) * {HASH_MULT})
       % 18446744073709551616 % {HASH_MOD}) * {IMPORTANCE_FULL_LEN}
      < n_chars * {HASH_MOD}
"""


# ---------------------------------------------------------------------------
# dedup_norm_text — normalization-canonical exact dedup
# ---------------------------------------------------------------------------


def _normalize_text(s: pd.Series) -> pd.Series:
    """Canonical text form: casefold, strip non-alphanumerics to spaces,
    collapse runs of spaces, trim. Regex classes are RE2/`re`-portable
    (no lookaround/backrefs) so the DuckDB oracle applies the identical
    transform."""
    return (
        s.fillna("")
        .astype(str)
        .str.lower()
        .str.replace(r"[^a-z0-9 ]", " ", regex=True)
        .str.replace(r" +", " ", regex=True)
        .str.strip()
    )


def q_dedup_norm_text(sf_dir: str):
    """Exact dedup on the NORMALIZED text (whitespace/punct/case
    variants collapse to one key — the usual first pass before
    near-dup sketching). Key = md5 of the canonical form (128-bit: no
    birthday risk at 10^12 docs, unlike a 64-bit group key); output one
    row per group: the min-doc_id survivor + the variant count.

    Shape: per-batch vectorized normalize + md5 + local (key → min id,
    count) partials, then a ×256 hash-bucketed ``map_groups`` fold —
    the bucket count bounds task fan-out while each bucket folds its
    keys in one vectorized pandas groupby (the repo's established
    pattern, queries_ext2.py gap-fill/latest-per-key)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = dd.md5_hex(_normalize_text(df["text"]))
        g = df.assign(k=k).groupby("k", sort=False)["doc_id"]
        out = g.agg(["min", "size"]).reset_index()
        out.columns = ["k", "doc_id", "n"]
        # bucket from the key's first hex byte — same k → same bucket;
        # per-distinct-key map, same bounded cost as the md5 itself
        out["b"] = out["k"].map(lambda x: int(x[:2], 16)).astype(np.int64)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=False).agg(
            doc_id=("doc_id", "min"), n_variants=("n", "sum")
        )
        return g.reset_index(drop=True)[["doc_id", "n_variants"]].astype(
            {"doc_id": np.int64, "n_variants": np.int64}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
    )


DEDUP_NORM_TEXT_SQL = """
WITH norm AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS k
  FROM documents
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_variants
FROM norm GROUP BY k
"""


# ---------------------------------------------------------------------------
# snapshot_diff — CDC-style diff between two snapshots of a keyed table
# ---------------------------------------------------------------------------


def q_snapshot_diff(sf_dir: str):
    """Change-data-capture diff of two snapshots keyed on o_orderkey
    (the incremental-ingest primitive next to novel_docs' anti-join):
    emits ``added`` / ``removed`` / ``changed`` rows with the surviving
    price. Snapshots are derived deterministically from orders (old
    drops key%7==0, new drops key%11==0 and bumps price 10% where
    key%5==0) so the diff is value-checkable in SQL.

    Shape: tag each snapshot (src 0/1), union, then ONE shuffle — a
    ×256 key-bucketed ``map_groups`` fold that pivots the ≤2 rows per
    key vectorized (per bucket, not per key). No driver state; at
    100 TB this is the same cost as any single hash-partition."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def snapshots(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        p = t["o_totalprice"].to_numpy()
        old_mask = k % 7 != 0
        new_mask = k % 11 != 0
        new_price = np.where(k % 5 == 0, p * 1.1, p)
        keys = np.concatenate([k[old_mask], k[new_mask]])
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "src": pa.array(
                    np.concatenate(
                        [
                            np.zeros(old_mask.sum(), np.int8),
                            np.ones(new_mask.sum(), np.int8),
                        ]
                    )
                ),
                "price": pa.array(
                    np.concatenate([p[old_mask], new_price[new_mask]]), pa.float64()
                ),
                "b": pa.array((keys % 256).astype(np.int64), pa.int64()),
            }
        )

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot_table(
            index="k", columns="src", values="price", aggfunc="first", dropna=False
        )
        has_old = w.get(0)
        has_new = w.get(1)
        old_p = has_old.to_numpy() if has_old is not None else np.full(len(w), np.nan)
        new_p = has_new.to_numpy() if has_new is not None else np.full(len(w), np.nan)
        added = np.isnan(old_p) & ~np.isnan(new_p)
        removed = ~np.isnan(old_p) & np.isnan(new_p)
        changed = ~np.isnan(old_p) & ~np.isnan(new_p) & (old_p != new_p)
        keep = added | removed | changed
        ctype = np.where(added, "added", np.where(removed, "removed", "changed"))
        return pd.DataFrame(
            {
                "o_orderkey": w.index.to_numpy(np.int64)[keep],
                "change_type": ctype[keep],
                "price": np.where(removed, old_p, new_p)[keep],
            }
        )

    return (
        orders.map_batches(snapshots, batch_format="pyarrow")
        .groupby("b")
        .map_groups(diff, batch_format="pandas")
    )


SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey AS k, o_totalprice AS p FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * CAST(1.1 AS DOUBLE)
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT coalesce(o.k, n.k) AS o_orderkey,
       CASE WHEN o.k IS NULL THEN 'added'
            WHEN n.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       coalesce(n.p, o.p) AS price
FROM old o FULL JOIN new n ON o.k = n.k
WHERE o.k IS NULL OR n.k IS NULL OR o.p <> n.p
"""


# ---------------------------------------------------------------------------
# heavy_hitters — all terms above frequency 1/K (exact, two streaming passes)
# ---------------------------------------------------------------------------

HH_K = 100  # report terms with count * K > total tokens


def _batch_word_counts(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized (words, counts, total) for one batch — word_topk's
    split semantics (single space, empties dropped) so the SQL
    tokenizer matches exactly."""
    tok_lists = texts.fillna("").astype(str).str.split(" ")
    total = int(tok_lists.map(len).sum())
    if total == 0:
        return np.empty(0, object), np.empty(0, np.int64), 0
    flat = np.fromiter(
        itertools.chain.from_iterable(tok_lists), dtype=object, count=total
    )
    flat = flat[flat != ""]
    words, counts = np.unique(flat, return_counts=True)
    return words, counts.astype(np.int64), int(len(flat))


def q_heavy_hitters(sf_dir: str):
    """All words with corpus frequency above 1/K (K=100) — the
    threshold heavy-hitter query, solved EXACTLY in two streaming
    passes with no big shuffle (vs word_topk's global top-k fold):

    1. Candidates: each batch emits its LOCALLY heavy words
       (cnt·K > batch_total). Averaging lemma: a globally heavy word is
       locally heavy in ≥1 batch, so the union is a superset of the
       answer; its size is bounded by K per batch and by the vocabulary.
    2. Exact recount: candidates broadcast in the UDF closure (once per
       worker process); each batch emits exact counts for candidate
       words plus its token total; a vocabulary-bounded driver fold
       applies ``cnt·K > N``. Above a candidate budget the fold swaps
       for a distributed groupby — same routing note as word_topk."""
    docs = _t(sf_dir, "documents", ["text"])

    def local_heavy(df: pd.DataFrame) -> pd.DataFrame:
        words, counts, total = _batch_word_counts(df["text"])
        heavy = counts * HH_K > total
        return pd.DataFrame({"w": words[heavy]})

    cand_parts = docs.map_batches(local_heavy, batch_format="pandas")
    cands: set[str] = set()
    for b in cand_parts.iter_batches(batch_format="pandas"):
        cands.update(b["w"])
    cand_set = frozenset(cands)  # rides the UDF once per worker

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        words, counts, total = _batch_word_counts(df["text"])
        m = np.fromiter((w in cand_set for w in words), bool, count=len(words))
        return pd.DataFrame(
            {
                "w": np.append(words[m], ""),  # "" carries the batch total
                "n": np.append(counts[m], total).astype(np.int64),
            }
        )

    folded: dict[str, int] = {}
    for b in docs.map_batches(recount, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for w, n in zip(b["w"], b["n"]):
            folded[w] = folded.get(w, 0) + int(n)
    n_total = folded.pop("", 0)
    out = [(w, n) for w, n in folded.items() if n * HH_K > n_total]
    out.sort()
    return pd.DataFrame(
        {
            "w": pd.Series([w for w, _ in out], dtype=object),
            "n": pd.Series([n for _, n in out], dtype=np.int64),
        }
    )


HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
nz AS (SELECT w FROM toks WHERE w <> ''),
tot AS (SELECT count(*) AS c FROM nz)
SELECT w, CAST(count(*) AS BIGINT) AS n
FROM nz, tot GROUP BY w, c HAVING count(*) * {HH_K} > c
"""


# ---------------------------------------------------------------------------
# geo batch: raster map algebra, pyramid coarsening, OD mobility flows
# ---------------------------------------------------------------------------


def q_geo_focal_mean(sf_dir: str):
    """Raster focal (neighborhood) statistics — the map-algebra
    convolution primitive: for every grid cell whose 3×3 window holds
    any data, the window count sum, the in-grid window size, and their
    ratio. Consumes the distributedly-folded raster (grid-bounded, like
    geo_vectorize/zonal — O(grid), corpus-independent); the convolution
    is 9 padded numpy shift-adds on the dense grid. Above
    RASTER_DRIVER_PIXELS the same op runs as a 9-way neighbor-offset
    flat-map + groupby(pixel) sum — the raster fold already routes
    there. focal_mean is ONE double division of exact integers, so the
    SQL oracle is bit-exact."""
    from fairy_core_ray.pipelines.queries import RASTER_H, RASTER_W, _raster

    r = _raster(sf_dir)
    grid = np.zeros((RASTER_H, RASTER_W), np.int64)
    grid[r["py"].to_numpy(np.int64), r["px"].to_numpy(np.int64)] = r["n"].to_numpy(
        np.int64
    )
    pad = np.pad(grid, 1)
    ones = np.pad(np.ones_like(grid), 1)
    s = np.zeros_like(grid)
    nn = np.zeros_like(grid)
    for dy in range(3):
        for dx in range(3):
            s += pad[dy : dy + RASTER_H, dx : dx + RASTER_W]
            nn += ones[dy : dy + RASTER_H, dx : dx + RASTER_W]
    py, px = np.nonzero(s)
    return pd.DataFrame(
        {
            "px": px.astype(np.int64),
            "py": py.astype(np.int64),
            "focal_sum": s[py, px],
            "n_nbrs": nn[py, px],
            "focal_mean": s[py, px].astype(np.float64) / nn[py, px],
        }
    )


def q_geo_grid_coarsen(sf_dir: str):
    """Raster pyramid level (the web-map overview primitive): 8×8 sum
    pooling of the 96×96 count raster to 12×12 — per coarse cell the
    total count and the number of occupied fine cells. Integer-exact
    on both sides."""
    from fairy_core_ray.pipelines.queries import _raster

    r = _raster(sf_dir)
    g = (
        r.assign(cx=r["px"] // 8, cy=r["py"] // 8)
        .groupby(["cx", "cy"], sort=False)
        .agg(n=("n", "sum"), n_src=("n", "size"))
        .reset_index()
    )
    return g.astype({"cx": np.int64, "cy": np.int64, "n": np.int64, "n_src": np.int64})


# below this many input events the OD pair fold runs on the driver
# (partials are bounded by distinct observed zone pairs); above it, a
# ×256 pairkey-bucketed distributed fold
OD_DRIVER_EVENTS = 20_000_000


def q_od_matrix(sf_dir: str):
    """Origin-destination mobility flows: per user, events ordered by
    (ts, event_id); each consecutive pair moving BETWEEN grid zones
    (the 96×96 raster pixel) contributes one trip to its
    (zone_from, zone_to) cell. The trajectory-mining aggregate behind
    flow maps.

    Shape: ×256 user-hash buckets (a user's whole trajectory lands in
    one bucket — same co-location guarantee sessionize relies on);
    inside a bucket one vectorized sort + shift per pandas frame; then
    one small groupby over the zone-pair key folds the per-bucket
    partials. Two shuffles total, both bounded by user count and zone²."""
    from fairy_core_ray.pipelines.queries import (
        RASTER_BBOX,
        RASTER_H,
        RASTER_W,
        _t,
        event_lonlat,
    )
    from fairy_core_ray.stages.raster_stages import pixel_of

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_zone(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        lon, lat = event_lonlat(eid)
        px, py = pixel_of(lon, lat, RASTER_BBOX, RASTER_W, RASTER_H)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "zone": pa.array(py * RASTER_W + px, pa.int64()),
                "b": pa.array(
                    (t["user_id"].to_numpy() % 256).astype(np.int64), pa.int64()
                ),
            }
        )

    def trips(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
        zf = df["zone"].to_numpy()[:-1]
        zt = df["zone"].to_numpy()[1:]
        m = same_user & (zf != zt)
        out = pd.DataFrame({"zf": zf[m], "zt": zt[m]})
        g = out.groupby(["zf", "zt"], sort=False).size().reset_index(name="n")
        g["pairkey"] = g["zf"] * (RASTER_W * RASTER_H) + g["zt"]
        g["pb"] = g["pairkey"] % 256  # bucket the pair fold too — one
        # map_groups call per BUCKET, not per zone pair
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pairkey", sort=False).agg(
            zone_from=("zf", "first"), zone_to=("zt", "first"), n_trips=("n", "sum")
        )
        return g.reset_index(drop=True).astype(
            {"zone_from": np.int64, "zone_to": np.int64, "n_trips": np.int64}
        )

    parts = (
        ev.map_batches(add_zone, batch_format="pyarrow")
        .groupby("b")
        .map_groups(trips, batch_format="pandas")
    )
    try:
        n_events = ev.count()  # metadata-only on parquet reads
    except Exception:
        n_events = None
    if n_events is not None and n_events <= OD_DRIVER_EVENTS:
        # small path: the per-bucket pair partials are bounded by the
        # trip count — one driver fold beats a second Ray shuffle
        # (same routing as word_topk / keep_first)
        folded = pd.concat(
            list(parts.iter_batches(batch_format="pandas")), ignore_index=True
        )
        return fold(folded)
    return parts.groupby("pb").map_groups(fold, batch_format="pandas")


_PX96 = "CAST(floor((lon - (-122.6)) * (96.0 / ((-121.6) - (-122.6)))) AS BIGINT)"
_PY96 = "CAST(floor((lat - 37.2) * (96.0 / (38.2 - 37.2))) AS BIGINT)"
_EVENT_PTS = (
    "SELECT event_id, "
    "-122.6 + ((event_id * 2654435761) % 1000000) / 1000000.0 AS lon, "
    "37.2 + ((event_id * 104729 + 12345) % 1000000) / 1000000.0 AS lat "
    "FROM events"
)
_RASTER96 = (
    f"r AS (SELECT {_PX96} AS px, {_PY96} AS py, "
    "CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY px, py)"
)

GEO_FOCAL_MEAN_SQL = f"""
WITH pts AS ({_EVENT_PTS}), {_RASTER96},
off(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
cand AS (
  SELECT DISTINCT px + dx AS qx, py + dy AS qy FROM r, off
  WHERE px + dx BETWEEN 0 AND 95 AND py + dy BETWEEN 0 AND 95
),
s AS (
  SELECT c.qx, c.qy, CAST(sum(r.n) AS BIGINT) AS focal_sum
  FROM cand c JOIN r ON abs(r.px - c.qx) <= 1 AND abs(r.py - c.qy) <= 1
  GROUP BY c.qx, c.qy
)
SELECT qx AS px, qy AS py, focal_sum,
       CAST((least(qx + 1, 95) - greatest(qx - 1, 0) + 1)
          * (least(qy + 1, 95) - greatest(qy - 1, 0) + 1) AS BIGINT) AS n_nbrs,
       CAST(focal_sum AS DOUBLE)
         / ((least(qx + 1, 95) - greatest(qx - 1, 0) + 1)
          * (least(qy + 1, 95) - greatest(qy - 1, 0) + 1)) AS focal_mean
FROM s
"""

GEO_GRID_COARSEN_SQL = f"""
WITH pts AS ({_EVENT_PTS}), {_RASTER96}
SELECT px // 8 AS cx, py // 8 AS cy, CAST(sum(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_src
FROM r GROUP BY cx, cy
"""

OD_MATRIX_SQL = f"""
WITH pts AS (
  SELECT e.event_id, e.user_id, e.ts,
         -122.6 + ((e.event_id * 2654435761) % 1000000) / 1000000.0 AS lon,
         37.2 + ((e.event_id * 104729 + 12345) % 1000000) / 1000000.0 AS lat
  FROM events e
),
z AS (SELECT event_id, user_id, ts, {_PY96} * 96 + {_PX96} AS zone FROM pts),
seq AS (
  SELECT user_id, zone,
         lag(zone) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_zone
  FROM z
)
SELECT prev_zone AS zone_from, zone AS zone_to,
       CAST(count(*) AS BIGINT) AS n_trips
FROM seq WHERE prev_zone IS NOT NULL AND prev_zone <> zone
GROUP BY zone_from, zone_to
"""


#: stay-point detection parameters: spatial radius (degrees, squared)
#: and minimum dwell duration (microseconds)
STAY_EPS2 = 0.01  # eps = 0.1 deg
STAY_MIN_DUR_US = 3_600_000_000  # 1 hour


def q_staypoints(sf_dir: str):
    """Stay-point detection (Li et al. 2008, the trajectory-mining
    primitive behind POI extraction): per user, events ordered by
    (ts, event_id); from an anchor point, scan forward to the FIRST
    point farther than eps; if the dwell from anchor to the point
    before it lasts ≥ min_dur, emit a stay and restart the anchor
    after the run, else advance the anchor by one. Inherently a
    sequential anchor chain — each user's chain runs inside a ×256
    user-hash-bucket ``map_groups`` (whole trajectory co-located, like
    sessionize/od_matrix), with the first-exit scan vectorized as one
    per-user pairwise mask (trajectories are bounded per user; the
    chain loop is O(events-per-user) ints). Output is integer-exact
    (event ids, epoch-microsecond bounds, run length), so the
    recursive-CTE SQL oracle — first-exit via min-over-pairs, the
    anchor chain via recursion — matches bit-for-bit."""
    from fairy_core_ray.pipelines.queries import _t, event_lonlat

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_pos(t: pa.Table) -> pa.Table:
        lon, lat = event_lonlat(t["event_id"].to_numpy())
        return (
            t.append_column("lon", pa.array(lon, pa.float64()))
            .append_column("lat", pa.array(lat, pa.float64()))
            .append_column(
                "b", pa.array((t["user_id"].to_numpy() % 256).astype(np.int64))
            )
        )

    def stays(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out_uid: list[int] = []
        out_eid: list[int] = []
        out_t0: list[int] = []
        out_t1: list[int] = []
        out_np: list[int] = []
        for uid, g in df.groupby("user_id", sort=False):
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            tus = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
            eid = g["event_id"].to_numpy()
            n = len(g)
            dlon = lon[None, :] - lon[:, None]
            dlat = lat[None, :] - lat[:, None]
            far = dlon * dlon + dlat * dlat > STAY_EPS2
            far[np.tril_indices(n)] = False  # only j > i exits count
            has_exit = far.any(axis=1)
            first_out = np.where(has_exit, np.argmax(far, axis=1), n)
            a = 0
            while a < n:
                e = int(first_out[a]) - 1
                if tus[e] - tus[a] >= STAY_MIN_DUR_US:
                    out_uid.append(int(uid))
                    out_eid.append(int(eid[a]))
                    out_t0.append(int(tus[a]))
                    out_t1.append(int(tus[e]))
                    out_np.append(e - a + 1)
                    a = e + 1
                else:
                    a += 1
        return pd.DataFrame(
            {
                "user_id": pd.Series(out_uid, dtype=np.int64),
                "start_event_id": pd.Series(out_eid, dtype=np.int64),
                "ts_start_us": pd.Series(out_t0, dtype=np.int64),
                "ts_end_us": pd.Series(out_t1, dtype=np.int64),
                "n_points": pd.Series(out_np, dtype=np.int64),
            }
        )

    return (
        ev.map_batches(add_pos, batch_format="pyarrow")
        .groupby("b")
        .map_groups(stays, batch_format="pandas")
    )


STAYPOINTS_SQL = f"""
WITH RECURSIVE z AS (
  SELECT user_id, event_id, ts,
         -122.6 + ((event_id * 2654435761) % 1000000) / 1000000.0 AS lon,
         37.2 + ((event_id * 104729 + 12345) % 1000000) / 1000000.0 AS lat,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s
  FROM events
),
cnt AS (SELECT user_id, max(s) AS n FROM z GROUP BY user_id),
fo_raw AS (
  SELECT a.user_id, a.s AS i, min(b.s) AS fo
  FROM z a LEFT JOIN z b ON b.user_id = a.user_id AND b.s > a.s
    AND (b.lon - a.lon) * (b.lon - a.lon)
      + (b.lat - a.lat) * (b.lat - a.lat) > CAST({STAY_EPS2} AS DOUBLE)
  GROUP BY a.user_id, a.s
),
fo2 AS (
  SELECT f.user_id, f.i, coalesce(f.fo, c.n + 1) AS fo
  FROM fo_raw f JOIN cnt c USING (user_id)
),
chain(user_id, a) AS (
  SELECT user_id, CAST(1 AS BIGINT) FROM cnt
  UNION ALL
  SELECT ch.user_id,
         CASE WHEN epoch_us(te.ts) - epoch_us(ta.ts) >= {STAY_MIN_DUR_US}
              THEN f.fo ELSE ch.a + 1 END
  FROM chain ch
  JOIN cnt c ON c.user_id = ch.user_id
  JOIN fo2 f ON f.user_id = ch.user_id AND f.i = ch.a
  JOIN z ta ON ta.user_id = ch.user_id AND ta.s = ch.a
  JOIN z te ON te.user_id = ch.user_id AND te.s = f.fo - 1
  WHERE ch.a <= c.n
)
SELECT ch.user_id, za.event_id AS start_event_id,
       epoch_us(za.ts) AS ts_start_us, epoch_us(ze.ts) AS ts_end_us,
       CAST(f.fo - ch.a AS BIGINT) AS n_points
FROM chain ch
JOIN fo2 f ON f.user_id = ch.user_id AND f.i = ch.a
JOIN z za ON za.user_id = ch.user_id AND za.s = ch.a
JOIN z ze ON ze.user_id = ch.user_id AND ze.s = f.fo - 1
WHERE epoch_us(ze.ts) - epoch_us(za.ts) >= {STAY_MIN_DUR_US}
"""


# ---------------------------------------------------------------------------
# text_curation_pipeline — the composed text flagship
# ---------------------------------------------------------------------------

CURATION_QUALITY_MIN = 0.5
_CURATION_TRAIN_NUM = 9  # keep h * 10 < 9 * HASH_MOD  (90% train gate)


def q_text_curation_pipeline(sf_dir: str):
    """The composed end-to-end TEXT curation flagship (the documents
    counterpart of the image flagship): quality-score → threshold
    filter → exact dedup keep-first on md5(text) → deterministic 90%
    train gate → per-(source, lang) corpus stats. Every stage is a
    component whose oracle is already green standalone
    (quality_scores, dedup_exact_md5, hash_split), so the composition
    is value-checkable as ONE SQL statement.

    Shape: one streaming scoring/filter pass (vectorized quality
    features), the keep-first dedup aggregate (key-only — text never
    shuffles), the zero-shuffle hash gate, then per-batch (source,
    lang) partials into one tiny groupby fold. No driver state beyond
    the bounded (sources × langs) result."""
    from fairy_core_ray.pipelines.queries import _round_half_away, _t
    from fairy_core_ray.stages import text_stages as tstg

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def score_and_filter(df: pd.DataFrame) -> pd.DataFrame:
        feats = tstg.quality_features(df["text"])
        q = _round_half_away(tstg.quality_score(feats), 6)
        keep = q >= CURATION_QUALITY_MIN
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[keep],
                "k": dd.md5_hex(df["text"]).to_numpy()[keep],
                "lang": df["lang"].to_numpy()[keep],
                "source": df["source"].to_numpy()[keep],
                "n_tokens": feats["n_tokens"].to_numpy()[keep],
            }
        )
        return out

    scored = ds.map_batches(score_and_filter, batch_format="pandas")
    marked = dd.keep_first(scored, key_fn=lambda t: t["k"], order_col="doc_id")

    def gate_and_partial(t: pa.Table) -> pa.Table:
        t = t.filter(t["dup_first"])
        h = _gate_hash(t["doc_id"].to_numpy())
        t = t.filter(pa.array(h * 10 < _CURATION_TRAIN_NUM * HASH_MOD))
        df = t.select(["source", "lang", "n_tokens"]).to_pandas()
        g = (
            df.groupby(["source", "lang"], sort=False)
            .agg(n_docs=("n_tokens", "size"), total_tokens=("n_tokens", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = marked.map_batches(gate_and_partial, batch_format="pyarrow")
    folded: dict[tuple[str, str], list[int]] = {}
    for b in parts.iter_batches(batch_format="pandas"):
        for s, l, nd, nt in zip(b["source"], b["lang"], b["n_docs"], b["total_tokens"]):
            cur = folded.setdefault((s, l), [0, 0])
            cur[0] += int(nd)
            cur[1] += int(nt)
    keys = sorted(folded)
    return pd.DataFrame(
        {
            "source": [k[0] for k in keys],
            "lang": [k[1] for k in keys],
            "n_docs": pd.Series([folded[k][0] for k in keys], dtype=np.int64),
            "total_tokens": pd.Series([folded[k][1] for k in keys], dtype=np.int64),
        }
    )


TEXT_CURATION_SQL = f"""
WITH f AS (
  SELECT doc_id, text, lang, source,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 0 ELSE
           len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) END AS n_tokens,
         len(coalesce(text, '')) AS n_chars,
         len(regexp_extract_all(coalesce(text, ''), '[^\\w\\s]')) AS n_punct,
         regexp_extract_all(lower(coalesce(text, '')), '[A-Za-z0-9_'']+') AS words
  FROM documents
),
g AS (
  SELECT doc_id, text, lang, source, n_tokens,
         n_punct / greatest(1, n_chars) AS punct_ratio,
         CASE WHEN len(words) = 0 THEN 0.0 ELSE
           list_sum(list_transform(words, w -> len(w))) / len(words) END AS mwl
  FROM f
),
q AS (
  SELECT doc_id, text, lang, source, n_tokens,
         round(0.4 * least(greatest(n_tokens / 50.0, 0.0), 1.0)
             + 0.3 * (1.0 - least(greatest(punct_ratio * 5.0, 0.0), 1.0))
             + 0.3 * least(greatest((mwl - 1.0) / 5.0, 0.0), 1.0), 6) AS quality
  FROM g
),
kept AS (
  SELECT doc_id, lang, source, n_tokens
  FROM q WHERE quality >= {CURATION_QUALITY_MIN}
  QUALIFY row_number() OVER (PARTITION BY md5(coalesce(text, ''))
                             ORDER BY doc_id) = 1
),
train AS (
  SELECT * FROM kept
  WHERE ((CAST(doc_id AS HUGEINT) * {HASH_MULT})
         % 18446744073709551616 % {HASH_MOD}) * 10 < {_CURATION_TRAIN_NUM} * {HASH_MOD}
)
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM train GROUP BY source, lang
"""


EXT3_QUERIES = {
    "importance_sample": q_importance_sample,
    "dedup_norm_text": q_dedup_norm_text,
    "snapshot_diff": q_snapshot_diff,
    "heavy_hitters": q_heavy_hitters,
    "geo_focal_mean": q_geo_focal_mean,
    "geo_grid_coarsen": q_geo_grid_coarsen,
    "od_matrix": q_od_matrix,
    "staypoints": q_staypoints,
    "text_curation_pipeline": q_text_curation_pipeline,
}

EXT3_ORACLE = {
    "importance_sample": IMPORTANCE_SAMPLE_SQL,
    "dedup_norm_text": DEDUP_NORM_TEXT_SQL,
    "snapshot_diff": SNAPSHOT_DIFF_SQL,
    "heavy_hitters": HEAVY_HITTERS_SQL,
    "geo_focal_mean": GEO_FOCAL_MEAN_SQL,
    "geo_grid_coarsen": GEO_GRID_COARSEN_SQL,
    "od_matrix": OD_MATRIX_SQL,
    "staypoints": STAYPOINTS_SQL,
    "text_curation_pipeline": TEXT_CURATION_SQL,
}

from fairy_core_ray.pipelines import queries as _q  # noqa: E402

_q.QUERIES.update(EXT3_QUERIES)
_q.ORACLE.update(EXT3_ORACLE)
