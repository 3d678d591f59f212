"""Training-pipeline operator extensions, batch 2: image phash near-dup
clustering, bloom-filter semi-join, nearest-site (k=1 spatial NN) join,
exact kNN self-join over embeddings, per-user daily gap-fill resample.

Same contract as queries_ext.py: every operator is the idiomatic
distributed Ray Data form (column-pruned reads, per-batch vectorized
kernels, broadcast small sides, shuffles only where semantics co-locate
keys) and carries an exact DuckDB oracle. Float policy follows
queries.py: per-row derived floats use identical IEEE ops both sides;
ranked floats sort UNROUNDED on both sides and round only for output.

These extend the reference's validation vocabulary (its dup checks are
exact-key only — /root/reference/src/fairy/validation/
rulepack_runner.py:359-421) with the perceptual/image dedup, semi-join
and resample primitives a 100 TB multimodal curation pipeline needs
(north-rule tier: geospatial x image).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fairy_core_ray.pipelines.queries import (
    EVENT_LONLAT_SQL,
    KNN_QUERIES,
    KNN_Q_SQL_VALUES,
    _round_half_away,
    _t,
    event_lonlat,
)
from fairy_core_ray.functions.folds import fold_to_pandas
from fairy_core_ray.stages import dedup as dd
from fairy_core_ray.stages import knn as knn_mod

# ---------------------------------------------------------------------------
# image phash near-dup clustering
# ---------------------------------------------------------------------------

# synthetic phash with PLANTED duplicate groups: documents sharing
# doc_id % PHASH_BASE_MOD get the same base hash, and ~2/7 of docs flip
# one bit — so same-group pairs sit at Hamming <= 2 while cross-group
# pairs are quasi-random 61-bit values (expected hamming ~30). Mirrored
# 1:1 in SQL below.
PHASH_BASE_MOD = 23


def dup_phash(doc_id: np.ndarray) -> np.ndarray:
    eid = doc_id.astype(np.int64)
    m1 = ((eid % PHASH_BASE_MOD) * 2654435761) % 1000003
    ph = (m1 * m1 * 3 + m1 * 65537 + 11) % 2305843009213693951
    flip = np.where(eid % 7 < 2, np.int64(1) << (eid % 61), np.int64(0))
    return ph ^ flip


DUP_PHASH_SQL = (
    f"m AS (SELECT doc_id, ((doc_id % {PHASH_BASE_MOD}) * 2654435761) % 1000003 "
    "AS m1 FROM documents), "
    "ph AS (SELECT doc_id, xor((m1*m1*3 + m1*65537 + 11) % 2305843009213693951, "
    "CASE WHEN doc_id % 7 < 2 THEN (CAST(1 AS BIGINT) << CAST(doc_id % 61 AS INTEGER)) "
    "ELSE CAST(0 AS BIGINT) END) AS phash FROM m)"
)


def q_phash_dup_clusters(sf_dir: str):
    """Perceptual image dedup end-to-end: banded phash pair mining
    (pigeonhole-exact recall for Hamming <= 3, one groupby shuffle,
    in-group popcount verify) -> union-find -> (id, rep) clusters.
    The image analogue of ``neardup_clusters``; at 100 TB the phash
    column comes from the decode stage (stages/multimodal.py) instead
    of this SQL-mirrorable synthetic."""
    ds = _t(sf_dir, "documents", ["doc_id"], split=8)

    def add(t: pa.Table) -> pa.Table:
        return t.append_column(
            "phash", pa.array(dup_phash(t["doc_id"].to_numpy()), pa.int64())
        )

    with_ph = ds.map_batches(add, batch_format="pyarrow")
    pairs = dd.hamming_band_pairs(
        with_ph, hash_col="phash", id_col="doc_id", max_hamming=3
    )
    cl = dd.cluster_pairs(pairs)
    cl["id"] = cl["id"].astype(np.int64)
    cl["rep"] = cl["rep"].astype(np.int64)
    return cl.sort_values("id").reset_index(drop=True)


PHASH_DUP_CLUSTERS_SQL = (
    "WITH RECURSIVE " + DUP_PHASH_SQL + ", "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM ph a JOIN ph b "
    "ON a.doc_id < b.doc_id AND bit_count(xor(a.phash, b.phash)) <= 3), "
    "edges AS (SELECT id_a AS a, id_b AS b FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(id, r) AS (SELECT a, b FROM edges "
    "UNION SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a) "
    "SELECT id, CAST(least(id, min(r)) AS BIGINT) AS rep FROM reach "
    "GROUP BY id ORDER BY id"
)


# ---------------------------------------------------------------------------
# bloom-filter semi-join
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 20  # 128 KiB bitmap
BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) bit positions via k independent splitmix64 streams."""
    from fairy_core_ray.functions.hashing import splitmix64

    h = keys.astype(np.int64).view(np.uint64)
    pos = np.empty((len(keys), BLOOM_K), np.int64)
    for i in range(BLOOM_K):
        pos[:, i] = (
            splitmix64(h ^ np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF))
            % np.uint64(BLOOM_BITS)
        ).astype(np.int64)
    return pos


def _bloom_build(keys: np.ndarray) -> np.ndarray:
    """Packed uint64 bitmap with every key's BLOOM_K bits set."""
    bits = np.zeros(BLOOM_BITS // 64, np.uint64)
    if len(keys):
        pos = _bloom_positions(keys).ravel()
        np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return bits


def _bloom_test(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    pos = _bloom_positions(keys)
    hit = np.ones(len(keys), bool)
    for i in range(BLOOM_K):
        p = pos[:, i]
        hit &= (bits[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1) > 0
    return hit


def q_bloom_semijoin(sf_dir: str):
    """Semi-join via broadcast bloom prefilter + exact confirm: lineitem
    rows whose order is 1-URGENT, aggregated per returnflag. The bloom
    bitmap folds from per-block partials (fixed 128 KiB each, OR on the
    driver) and broadcasts ONCE; at 100 TB the bloom drops ~all
    non-members before any shuffle, and the exact confirm runs as a
    hash-partitioned semi-join over only the surviving ~(members + eps)
    rows — here the confirm is the same sorted-key broadcast the dup-key
    path uses (the urgent key set is dimension-sized)."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"], split=8)

    def urgent_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(t["o_orderpriority"], "1-URGENT")
        return pa.table({"k": pc.filter(t["o_orderkey"], m)})

    key_blocks = [
        b["k"].to_numpy()
        for b in orders.map_batches(urgent_keys, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        if len(b)
    ]
    keys = np.sort(np.concatenate(key_blocks)) if key_blocks else np.empty(0, np.int64)
    bits = _bloom_build(keys)
    bref = ray.put((bits, keys))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        bm, kk = ray.get(bref)
        lk = df["l_orderkey"].to_numpy(np.int64)
        cand = _bloom_test(bm, lk)  # bloom prefilter (no false negatives)
        sub = df[cand]
        if len(kk) and len(sub):
            lk2 = sub["l_orderkey"].to_numpy(np.int64)
            p = np.minimum(np.searchsorted(kk, lk2), len(kk) - 1)
            sub = sub[kk[p] == lk2]  # exact confirm
        elif not len(kk):
            sub = sub.iloc[:0]
        g = sub.groupby("l_returnflag", sort=False).agg(
            p_n=("l_quantity", "size"), p_qty=("l_quantity", "sum")
        )
        return g.reset_index()

    allp = fold_to_pandas(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"], split=8)
        .map_batches(agg, batch_format="pandas")
    )
    if allp is None:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=str),
                "n_items": pd.Series([], dtype=np.int64),
                "sum_qty": pd.Series([], dtype=np.float64),
            }
        )
    out = (
        allp.groupby("l_returnflag", sort=True)
        .agg(n_items=("p_n", "sum"), sum_qty=("p_qty", "sum"))
        .reset_index()
    )
    out["n_items"] = out["n_items"].astype(np.int64)
    out["sum_qty"] = _round_half_away(out["sum_qty"].to_numpy(np.float64), 2)
    return out


BLOOM_SEMIJOIN_SQL = (
    "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items, "
    "round(sum(l_quantity), 2) AS sum_qty FROM lineitem "
    "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
    "WHERE o_orderpriority = '1-URGENT') "
    "GROUP BY l_returnflag ORDER BY l_returnflag"
)


# ---------------------------------------------------------------------------
# nearest-site join (k=1 spatial NN against a broadcast site set)
# ---------------------------------------------------------------------------


def q_nearest_site_join(sf_dir: str):
    """Every event point joined to its nearest site (the KNN query set
    doubling as dimension table): per-batch vectorized distance matrix
    against the broadcast sites, argmin with smaller-site tie-break —
    the k=1 NN-join shape (assign points to facilities/anchors) that a
    shuffle join cannot express. dist2 uses identical IEEE ops both
    sides, so it compares exactly."""
    sites = np.array([(x, y) for _, x, y in KNN_QUERIES])
    site_ids = np.array([q for q, _, _ in KNN_QUERIES], np.int64)
    sref = ray.put((sites, site_ids))

    def nearest(t: pa.Table) -> pa.Table:
        S, sids = ray.get(sref)
        eid = t["event_id"].to_numpy()
        lon, lat = event_lonlat(eid)
        d2 = (lon[:, None] - S[:, 0][None, :]) ** 2 + (
            lat[:, None] - S[:, 1][None, :]
        ) ** 2
        j = np.argmin(d2, axis=1)  # first min => smallest site_id wins ties
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "site_id": pa.array(sids[j], pa.int64()),
                "dist2": pa.array(d2[np.arange(len(eid)), j], pa.float64()),
            }
        )

    out = (
        _t(sf_dir, "events", ["event_id"], split=8)
        .map_batches(nearest, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


NEAREST_SITE_SQL = (
    "WITH p AS (" + EVENT_LONLAT_SQL + "), "
    f"s(site_id, sx, sy) AS (VALUES {KNN_Q_SQL_VALUES}) "
    "SELECT event_id, site_id, (lon - sx) * (lon - sx) + (lat - sy) * (lat - sy) "
    "AS dist2 FROM p CROSS JOIN s "
    "QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY "
    "(lon - sx) * (lon - sx) + (lat - sy) * (lat - sy), site_id) = 1 "
    "ORDER BY event_id"
)


# ---------------------------------------------------------------------------
# exact kNN self-join over embeddings
# ---------------------------------------------------------------------------

SELF_KNN_K = 3


def q_knn_self_join(sf_dir: str):
    """Each embedding's top-3 cosine neighbors (exact, block-streamed —
    see knn.cosine_topk_selfjoin). Ranks on unrounded cosine; rounds to
    5 dp for the value compare (both engines' dot products agree to
    ~1e-15, far from both the ranking gaps and the rounding boundary)."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"], split=8)
    out = knn_mod.cosine_topk_selfjoin(
        emb, vec_col="embedding", id_col="vec_id", k=SELF_KNN_K
    )
    out["cosine"] = _round_half_away(out["cosine"].to_numpy(np.float64), 5)
    return out.sort_values(["vec_id", "neighbor_id"]).reset_index(drop=True)


KNN_SELF_JOIN_SQL = (
    "SELECT a.vec_id, b.vec_id AS neighbor_id, "
    "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])), 5) AS cosine "
    "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id "
    "QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY "
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) <= "
    f"{SELF_KNN_K} ORDER BY a.vec_id, neighbor_id"
)


# ---------------------------------------------------------------------------
# per-user daily gap-fill resample
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


def q_user_daily_gapfill(sf_dir: str):
    """Resample each user's event stream to a dense daily series (zero
    rows for gap days between the user's first and last event) — the
    regularization step before any per-user time-series featurization.
    One groupby shuffle of (user, day) pairs keyed by a ×256 HASH BUCKET
    of the user id (the geo_distance_join dispatch pattern): one
    map_groups call per bucket instead of one per user (a 10^8-user
    corpus would otherwise pay 10^8 tiny pandas/Ray dispatches), with
    all users of a bucket gap-filled in one vectorized numpy pass."""
    from fairy_core_ray.pipelines.queries import _key_hash_bucket

    ds = _t(sf_dir, "events", ["user_id", "ts"], split=8)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].astype("datetime64[us]").astype(np.int64) // _US_PER_DAY)
        user = df["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": user,
                "day": day,
                "bucket": _key_hash_bucket(user, 256),
            }
        )

    def gapfill_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL users in the bucket: per-user spans from
        # one lexsort, dense day ranges + event counts via repeat/bincount
        order = np.lexsort((g["day"].to_numpy(), g["user_id"].to_numpy()))
        user = g["user_id"].to_numpy()[order]
        day = g["day"].to_numpy(np.int64)[order]
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        ends = np.r_[starts[1:], len(user)]
        lo, hi = day[starts], day[ends - 1]
        lens = hi - lo + 1
        total = int(lens.sum())
        out_starts = np.r_[0, np.cumsum(lens)[:-1]]
        full_day = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_starts, lens)
            + np.repeat(lo, lens)
        )
        ev_seg = np.repeat(np.arange(len(starts)), ends - starts)
        pos = out_starts[ev_seg] + (day - lo[ev_seg])
        return pd.DataFrame(
            {
                "user_id": np.repeat(user[starts], lens),
                "day": full_day,
                "n_events": np.bincount(pos, minlength=total).astype(np.int64),
            }
        )

    out = (
        ds.map_batches(project, batch_format="pandas")
        .groupby("bucket")
        .map_groups(gapfill_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


USER_DAILY_GAPFILL_SQL = (
    "WITH d AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // "
    f"{_US_PER_DAY} AS day FROM events), "
    "span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1), "
    "days AS (SELECT user_id, unnest(generate_series(lo, hi)) AS day FROM span), "
    "cnt AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2) "
    "SELECT days.user_id, days.day, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_events "
    "FROM days LEFT JOIN cnt USING (user_id, day) ORDER BY user_id, day"
)


# ---------------------------------------------------------------------------
# latest-row snapshot compaction (CDC-style keep-latest per key)
# ---------------------------------------------------------------------------


def q_latest_event_per_user(sf_dir: str):
    """Snapshot compaction: each user's LATEST event (max ts, then max
    event_id on ties) — the keep-latest-per-key primitive of CDC /
    upsert-log compaction. Associative: each batch first reduces to its
    own per-user maxima (combiner), so the groupby shuffle moves at most
    one row per (batch, user), never the log; the final fold groups by a
    ×256 HASH BUCKET of the user (one vectorized sort+drop_duplicates per
    bucket), not per user — per-key map_groups dispatch does not scale
    to 10^8 keys."""
    from fairy_core_ray.pipelines.queries import _key_hash_bucket

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"], split=8)

    def pick_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], ascending=[True, False, False],
            kind="mergesort",
        )
        return df.drop_duplicates("user_id", keep="first")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = pick_latest(df)
        return out.assign(bucket=_key_hash_bucket(out["user_id"].to_numpy(), 256))

    out = (
        ds.map_batches(combine, batch_format="pandas")  # per-batch combiner
        .groupby("bucket")
        .map_groups(pick_latest, batch_format="pandas")
        .drop_columns(["bucket"])
        .to_pandas()
    )
    out["ts_us"] = out["ts"].astype("datetime64[us]").astype(np.int64)
    out = out.drop(columns=["ts"])
    out["user_id"] = out["user_id"].astype(np.int64)
    out["event_id"] = out["event_id"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "event_id", "ts_us", "value"]
    ]


LATEST_EVENT_SQL = (
    "SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value "
    "FROM events "
    "QUALIFY row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts DESC, event_id DESC) = 1 ORDER BY user_id"
)


# ---------------------------------------------------------------------------
# fixed-width value histogram
# ---------------------------------------------------------------------------

_HIST_WIDTH = 10.0


def q_event_value_hist(sf_dir: str):
    """Fixed-width histogram over events.value: per-batch bincount
    partials (one tiny array each), elementwise driver fold — the
    fixed-cardinality aggregate shape where a groupby shuffle would be
    pure overhead. floor(value/width) is one IEEE op, identical both
    sides."""
    ds = _t(sf_dir, "events", ["value"], split=8)

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t["value"].to_numpy()
        b = np.floor(v / _HIST_WIDTH).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": u, "n": c.astype(np.int64)})

    allp = fold_to_pandas(ds.map_batches(partial, batch_format="pyarrow"))
    if allp is None:
        return pd.DataFrame(
            {"bin": pd.Series([], dtype=np.int64), "n": pd.Series([], dtype=np.int64)}
        )
    out = allp.groupby("bin", sort=True)["n"].sum().reset_index()
    out["bin"] = out["bin"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


EVENT_VALUE_HIST_SQL = (
    f"SELECT CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) AS bin, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY 1"
)


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct count (rows-only: sketch, not SQL)
# ---------------------------------------------------------------------------

_HLL_P = 12
_HLL_M = 1 << _HLL_P


def hll_partial(keys: np.ndarray) -> np.ndarray:
    """(m,) uint8 register maxima of one batch (Flajolet et al. 2007):
    register = top p hash bits, rank = leading-zero count of the rest
    + 1. Vectorized; partials merge by elementwise max (associative +
    commutative + idempotent — the ideal distributed aggregate)."""
    from fairy_core_ray.functions.hashing import splitmix64

    regs = np.zeros(_HLL_M, np.uint8)
    if not len(keys):
        return regs
    h = splitmix64(keys.astype(np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)  # low bits guard
    # leading zeros of a u64 via float64 exponent is unsafe; use bit scan
    rank = np.zeros(len(h), np.uint8)
    cur = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        top = cur >> np.uint64(64 - shift)
        zero = top == 0
        rank[zero] += np.uint8(shift)
        cur[zero] <<= np.uint64(shift)
    rank += 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:  # small-range linear counting
        e = m * np.log(m / zeros)
    return int(round(e))


def hll_sql(table: str = "events", col: str = "user_id") -> str:
    """DuckDB re-derivation of the HLL estimate — bit-exact registers.

    The sketch is deterministic (splitmix64, no RNG) and register maxima
    are order-independent, so the whole estimate is SQL-expressible:
    splitmix64 via the HUGEINT split-multiply stages already verified
    bit-exact in sql_hash.py, register index = top p hash bits, rank =
    65 - bitlength(rest) with DuckDB ``bin()`` (rest keeps its low p bits
    forced to 1, mirroring hll_partial's low-bits guard, so it is never
    0). Float literals are all DOUBLE-cast so DuckDB never routes through
    DECIMAL. The raw-estimate branch sums 2^-rank in a different order
    than np.sum (pairwise) — that value only picks the branch, and both
    branch inputs sit far from the 2.5m boundary at test scales; the
    linear-counting output itself (m*ln(m/zeros)) is exact."""
    from fairy_core_ray.pipelines.sql_hash import sm_stage1, sm_stage2, sm_stage3

    m = _HLL_M
    inner = f"SELECT CAST({col} AS UBIGINT) AS h FROM {table}"
    s1 = f"SELECT {sm_stage1('h')} AS h FROM ({inner})"
    s2 = f"SELECT {sm_stage2('h')} AS h FROM ({s1})"
    s3 = f"SELECT {sm_stage3('h')} AS h FROM ({s2})"
    rest = (
        f"CAST((CAST(h AS HUGEINT) * {1 << _HLL_P}) % {1 << 64} "
        f"+ {(1 << _HLL_P) - 1} AS UBIGINT)"
    )
    d = "CAST({} AS DOUBLE)".format
    alpha = f"({d('0.7213')} / ({d('1')} + {d('1.079')} / {d(f'{m}.0')}))"
    return f"""
WITH hashed AS ({s3}),
regs AS (
  SELECT CAST(h >> {64 - _HLL_P} AS BIGINT) AS idx,
         MAX(65 - length(bin({rest}))) AS rank
  FROM hashed GROUP BY 1
),
folded AS (
  SELECT count(*) AS present,
         SUM(power({d('2.0')}, -CAST(rank AS DOUBLE))) AS sp
  FROM regs
),
est AS (
  SELECT ({m} - present) AS zeros,
         (({alpha} * {d(f'{m}.0')}) * {d(f'{m}.0')})
           / (CAST({m} - present AS DOUBLE) + sp) AS raw
  FROM folded
)
SELECT CAST(round(CASE WHEN raw <= {d(f'{2.5 * m}')} AND zeros > 0
                       THEN {d(f'{m}.0')} * ln({d(f'{m}.0')} / CAST(zeros AS DOUBLE))
                       ELSE raw END) AS BIGINT) AS approx_distinct
FROM est
"""


def q_approx_distinct_users(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) via HyperLogLog: per-batch
    4 KiB register partials, elementwise-max fold — constant driver and
    shuffle state regardless of corpus size (the sketch shape exact
    ``unique_counts`` cannot keep at 10^12 rows). Deterministic (splitmix
    hash, no RNG), so the driver's rows-only check is stable;
    `test_queries_ext2.py` bounds the error vs the exact count."""
    ds = _t(sf_dir, "events", ["user_id"], split=8)

    def partial(t: pa.Table) -> pd.DataFrame:
        regs = hll_partial(t["user_id"].to_numpy())
        return pd.DataFrame({"reg": [regs.tobytes()]})

    regs = np.zeros(_HLL_M, np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        for blob in b["reg"]:
            regs = np.maximum(regs, np.frombuffer(blob, np.uint8))
    return pd.DataFrame({"approx_distinct": pd.array([hll_estimate(regs)], "int64")})


# ---------------------------------------------------------------------------
# cell-set compaction (H3 compact analog over the quadtree grid)
# ---------------------------------------------------------------------------

_COMPACT_FROM = 13
_COMPACT_TO = 10
_RES_K = 288230376151711744  # 2^58
_IX_M = 536870912  # 2^29


def q_geo_compact_cells(sf_dir: str):
    """Compact the event coverage cell set (H3 ``compact`` analog):
    wherever all 4 children of a parent cell are present, replace them
    by the parent, iterating res 13 -> 10. The DISTINCT pass is the
    distributed part (per-batch unique partials — coverage sets are
    area-bounded, ~1k cells per degree² at res 13); the per-level
    sibling-count fixpoint is O(|cells|) numpy on the fold. Above a
    cell budget each level becomes one ``groupby(parent).count``.
    Output: (cell, res) of the minimal covering set."""
    ds = _t(sf_dir, "events", ["event_id"], split=8)

    def home_cells(t: pa.Table) -> pd.DataFrame:
        lon, lat = event_lonlat(t["event_id"].to_numpy())
        ix = np.floor((lon + 180.0) / 360.0 * 8192).astype(np.int64)
        iy = np.floor((lat + 90.0) / 180.0 * 8192).astype(np.int64)
        u = np.unique(ix * _IX_M + iy)
        return pd.DataFrame({"c": u})

    parts = [
        b["c"].to_numpy()
        for b in ds.map_batches(home_cells, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pandas"
        )
    ]
    cur = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    out_cells, out_res = [], []
    for r in range(_COMPACT_FROM, _COMPACT_TO, -1):
        if not len(cur):
            break
        ix, iy = cur // _IX_M, cur % _IX_M
        parent = (ix >> 1) * _IX_M + (iy >> 1)
        po = np.argsort(parent, kind="stable")
        ps = parent[po]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        sizes = np.diff(np.r_[starts, len(ps)])
        complete = sizes == 4  # all four siblings present (cells distinct)
        keep_mask = np.repeat(~complete, sizes)
        keep = cur[po][keep_mask]
        out_cells.append(np.int64(r) * _RES_K + keep)
        out_res.append(np.full(len(keep), r, np.int64))
        cur = ps[starts][complete]
    out_cells.append(np.int64(_COMPACT_TO) * _RES_K + cur)
    out_res.append(np.full(len(cur), _COMPACT_TO, np.int64))
    out = pd.DataFrame(
        {"cell": np.concatenate(out_cells), "res": np.concatenate(out_res)}
    )
    return out.sort_values("cell").reset_index(drop=True)


GEO_COMPACT_SQL = (
    "WITH pts AS (" + EVENT_LONLAT_SQL + "), "
    "c13 AS (SELECT DISTINCT "
    "CAST(floor((lon + 180.0) / 360.0 * 8192) AS BIGINT) AS ix, "
    "CAST(floor((lat + 90.0) / 180.0 * 8192) AS BIGINT) AS iy FROM pts), "
    # level 13 -> 12
    "p12 AS (SELECT ix // 2 AS ix, iy // 2 AS iy, count(*) AS n FROM c13 GROUP BY 1, 2), "
    "k13 AS (SELECT c.ix, c.iy FROM c13 c JOIN p12 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy WHERE p.n < 4), "
    "c12 AS (SELECT ix, iy FROM p12 WHERE n = 4), "
    # level 12 -> 11
    "p11 AS (SELECT ix // 2 AS ix, iy // 2 AS iy, count(*) AS n FROM c12 GROUP BY 1, 2), "
    "k12 AS (SELECT c.ix, c.iy FROM c12 c JOIN p11 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy WHERE p.n < 4), "
    "c11 AS (SELECT ix, iy FROM p11 WHERE n = 4), "
    # level 11 -> 10
    "p10 AS (SELECT ix // 2 AS ix, iy // 2 AS iy, count(*) AS n FROM c11 GROUP BY 1, 2), "
    "k11 AS (SELECT c.ix, c.iy FROM c11 c JOIN p10 p ON c.ix // 2 = p.ix AND c.iy // 2 = p.iy WHERE p.n < 4), "
    "c10 AS (SELECT ix, iy FROM p10 WHERE n = 4) "
    f"SELECT 13 * {_RES_K} + ix * {_IX_M} + iy AS cell, CAST(13 AS BIGINT) AS res FROM k13 "
    f"UNION ALL SELECT 12 * {_RES_K} + ix * {_IX_M} + iy, 12 FROM k12 "
    f"UNION ALL SELECT 11 * {_RES_K} + ix * {_IX_M} + iy, 11 FROM k11 "
    f"UNION ALL SELECT 10 * {_RES_K} + ix * {_IX_M} + iy, 10 FROM c10 "
    "ORDER BY cell"
)


# ---------------------------------------------------------------------------
# per-user trajectory length
# ---------------------------------------------------------------------------


def q_trajectory_length(sf_dir: str):
    """Per-user trajectory: order each user's events by time and sum the
    planar step distances between consecutive points. Users hash into 64
    buckets; inside each bucket ONE vectorized pass (sort by (user, ts),
    masked diff at user boundaries) — no per-user UDF calls, the same
    dispatch-collapse as the bucketed as-of join. Sum rounded 6 dp both
    sides (engines sum in different orders)."""
    from fairy_core_ray.pipelines.queries import _key_hash_bucket

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"], split=8)

    def project(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy()
        lon, lat = event_lonlat(eid)
        uid = t["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "bucket": _key_hash_bucket(uid, 64),
                "user_id": uid,
                "t_us": t["ts"].to_pandas().astype("datetime64[us]").astype(np.int64),
                "event_id": eid,
                "lon": lon,
                "lat": lat,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ts ties broken by event_id so both engines walk the same path
        g = g.sort_values(["user_id", "t_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        same = np.r_[False, uid[1:] == uid[:-1]]
        dlon = np.r_[0.0, np.diff(lon)]
        dlat = np.r_[0.0, np.diff(lat)]
        step = np.where(same, np.sqrt(dlon * dlon + dlat * dlat), 0.0)
        df = pd.DataFrame({"user_id": uid, "step": step})
        out = df.groupby("user_id", sort=False).agg(
            n_points=("step", "size"), path_len=("step", "sum")
        )
        return out.reset_index()

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_points"] = out["n_points"].astype(np.int64)
    out["path_len"] = _round_half_away(out["path_len"].to_numpy(np.float64), 6)
    return out.sort_values("user_id").reset_index(drop=True)


TRAJECTORY_LENGTH_SQL = (
    "WITH pts AS (SELECT e.user_id, e.event_id, e.ts, p.lon, p.lat "
    "FROM events e JOIN (" + EVENT_LONLAT_SQL + ") p USING (event_id)), "
    "steps AS (SELECT user_id, "
    "sqrt((lon - lag(lon) OVER w) * (lon - lag(lon) OVER w) "
    "+ (lat - lag(lat) OVER w) * (lat - lag(lat) OVER w)) AS step "
    "FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_points, "
    "round(coalesce(sum(step), 0), 6) AS path_len "
    "FROM steps GROUP BY user_id ORDER BY user_id"
)


# ---------------------------------------------------------------------------
# image dedup survivors (phash clusters -> keep one per cluster)
# ---------------------------------------------------------------------------


def q_image_dedup_survivors(sf_dir: str):
    """End-to-end perceptual image dedup: phash cluster mining (see
    q_phash_dup_clusters) -> drop every non-representative member ->
    stream the corpus through a broadcast membership filter (bucketed
    above SURVIVOR_KEY_BUDGET — queries_ext._publish_sorted_ids)."""
    from fairy_core_ray.pipelines.queries_ext import (
        _member_mask,
        _publish_sorted_ids,
    )

    cl = q_phash_dup_clusters(sf_dir)
    drop = np.sort(cl.loc[cl["id"] != cl["rep"], "id"].to_numpy(np.int64))
    published = _publish_sorted_ids(drop)

    def keep(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy().astype(np.int64)
        is_dup = _member_mask(published, did, {})
        return pa.table({"doc_id": pa.array(did[~is_dup], pa.int64())})

    out = (
        _t(sf_dir, "documents", ["doc_id"], split=8)
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


IMAGE_DEDUP_SURVIVORS_SQL = (
    PHASH_DUP_CLUSTERS_SQL.replace(
        "SELECT id, CAST(least(id, min(r)) AS BIGINT) AS rep FROM reach "
        "GROUP BY id ORDER BY id",
        "SELECT doc_id FROM documents WHERE doc_id NOT IN "
        "(SELECT id FROM (SELECT id, least(id, min(r)) AS rep FROM reach "
        "GROUP BY id) WHERE id <> rep) ORDER BY doc_id",
    )
)


# ---------------------------------------------------------------------------
# big-big hash-partitioned equi-join
# ---------------------------------------------------------------------------


def q_order_lineitem_join(sf_dir: str):
    """Revenue per order priority through a TRUE shuffle join: both
    sides are fact-sized at 100 TB, so neither can broadcast — this is
    the one join shape the repo's broadcast/asof/range/PIP joins don't
    cover. Uses Ray Data's native hash join (both sides partition by
    key hash); the aggregate then folds per-batch partials (5 groups)
    on the driver."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"], split=8)
    items = _t(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"], split=8
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = items.join(
        orders,
        join_type="inner",
        num_partitions=max(8, ncpu),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
        g = (
            pd.DataFrame({"o_orderpriority": df["o_orderpriority"], "rev": rev})
            .groupby("o_orderpriority", sort=False)
            .agg(p_n=("rev", "size"), p_rev=("rev", "sum"))
        )
        return g.reset_index()

    allp = fold_to_pandas(joined.map_batches(partial, batch_format="pandas"))
    if allp is None:
        return pd.DataFrame(
            {
                "o_orderpriority": pd.Series([], dtype=str),
                "n_items": pd.Series([], dtype=np.int64),
                "revenue": pd.Series([], dtype=np.float64),
            }
        )
    out = (
        allp.groupby("o_orderpriority", sort=True)
        .agg(n_items=("p_n", "sum"), revenue=("p_rev", "sum"))
        .reset_index()
    )
    out["n_items"] = out["n_items"].astype(np.int64)
    out["revenue"] = _round_half_away(out["revenue"].to_numpy(np.float64), 2)
    return out


ORDER_LINEITEM_JOIN_SQL = (
    "SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_items, "
    "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"
)


# ---------------------------------------------------------------------------
# batched model scoring (actor-pool inference pattern)
# ---------------------------------------------------------------------------


def _model_weights(dim: int) -> np.ndarray:
    """Deterministic stand-in for trained weights (no model files in
    this sandbox); inlined verbatim into the SQL oracle via repr."""
    i = np.arange(1, dim + 1, dtype=np.int64)
    return ((i * 2654435761) % 1000003) / 1000003.0 - 0.5


class LinearScorer:
    """Actor-pool inference stage: the 'model' loads ONCE per actor in
    __init__ (the pattern a real checkpoint/tokenizer load follows);
    __call__ scores a whole batch with one matmul."""

    def __init__(self, weights_ref):
        self.w = ray.get(weights_ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(), "score": X @ self.w})


def q_embed_scores(sf_dir: str):
    """Batched model scoring over the embedding column: broadcast
    weights, actor-pool map_batches, one matmul per batch. Scores rank
    on the raw dot product and round to 5 dp for the value compare
    (both engines agree to ~1e-15)."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"], split=8)
    first = emb.take(1)
    if not first:
        return pd.DataFrame({"vec_id": [], "score": []})
    dim = len(first[0]["embedding"])
    wref = ray.put(_model_weights(dim))
    out = emb.map_batches(
        LinearScorer,
        fn_constructor_kwargs={"weights_ref": wref},
        batch_format="pandas",
        concurrency=(1, 4),
    ).to_pandas()
    out["vec_id"] = out["vec_id"].astype(np.int64)
    out["score"] = _round_half_away(out["score"].to_numpy(np.float64), 5)
    return out.sort_values("vec_id").reset_index(drop=True)


def _embed_scores_sql() -> str:
    w = _model_weights(64)
    lit = "[" + ", ".join(repr(float(x)) for x in w) + "]"
    return (
        "SELECT vec_id, round(list_inner_product(CAST(embedding AS DOUBLE[]), "
        f"{lit}), 5) AS score FROM embeddings ORDER BY vec_id"
    )


# ---------------------------------------------------------------------------
# windowed grouped top-k (top users per hourly window)
# ---------------------------------------------------------------------------

_WIN_S = 3600
_WIN_TOPK = 3


def q_window_top_users(sf_dir: str):
    """Top-3 users per hourly window by event count — the windowed
    grouped top-k shape (trending-items). Top-k by COUNT cannot use
    per-batch partial top-k (counts aren't complete until the window's
    groupby folds), so it is exactly two stages: per-batch (win, user)
    count partials into one distributed sum-groupby, then a per-window
    top-k in ``map_groups`` (window count is bounded: hours, not rows).
    Ties break on smaller user_id in both engines."""
    ds = _t(sf_dir, "events", ["user_id", "ts"], split=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        win = (
            df["ts"].astype("datetime64[us]").astype(np.int64)
            // 1_000_000
            // _WIN_S
        ) * _WIN_S
        g = (
            pd.DataFrame({"win_start": win, "user_id": df["user_id"].to_numpy()})
            .groupby(["win_start", "user_id"], sort=False)
            .size()
            .rename("p_n")
        )
        return g.reset_index()

    def add_wbucket(df: pd.DataFrame) -> pd.DataFrame:
        # ×64 window-hash buckets on the SINGLE int window key: a
        # window's (win, user) partials all land in its bucket, so one
        # bucket fold completes the counts AND the per-window top-k —
        # one single-key shuffle total. (A native composite-key
        # groupby(["win_start","user_id"]).aggregate here measured 38 s
        # on 95k partial rows at sf0.1/32cpus — Ray's multi-key
        # sort-aggregate is the wrong tool for a bounded key space; the
        # repo's bucketed map_groups fold is ~20× faster.)
        df["wb"] = (df["win_start"] // _WIN_S) % 64
        return df

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["win_start", "user_id"], sort=False)["p_n"]
            .sum()
            .rename("n_events")
            .reset_index()
        )
        c = c.sort_values(
            ["win_start", "n_events", "user_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return c.groupby("win_start", sort=False).head(_WIN_TOPK)[
            ["win_start", "user_id", "n_events"]
        ]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_wbucket, batch_format="pandas")
        .groupby("wb")
        .map_groups(fold_topk, batch_format="pandas")
        .to_pandas()
    )
    out["win_start"] = out["win_start"].astype(np.int64)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values(["win_start", "user_id"]).reset_index(drop=True)


WINDOW_TOP_USERS_SQL = (
    "WITH c AS (SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS win_start, "
    "user_id, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2) "
    "SELECT win_start, user_id, n_events FROM c "
    "QUALIFY row_number() OVER (PARTITION BY win_start "
    f"ORDER BY n_events DESC, user_id) <= {_WIN_TOPK} "
    "ORDER BY win_start, user_id"
)


# ---------------------------------------------------------------------------
# greedy sequence packing (training-sample assembly)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per training sequence
_PACK_BUCKETS = 16  # independent packing streams (hash-partitioned)


def q_pack_sequences(sf_dir: str):
    """Greedy concat-packing of documents into fixed-token-budget
    training sequences — the sample-assembly step of an LLM data
    pipeline. Docs hash-partition into _PACK_BUCKETS independent
    streams (each packer only needs ITS stream: embarrassingly
    parallel, deterministic, resumable per bucket); within a bucket,
    docs pack in doc_id order first-fit-sequential: a doc joins the
    open sequence unless it would exceed the budget, oversized docs
    get a sequence of their own. The in-bucket packer is O(sequences)
    searchsorted steps over the token cumsum, not a per-doc Python
    loop. Oracle: a recursive CTE walking the identical recurrence."""
    from fairy_core_ray.functions.hashing import splitmix64 as _sm

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        tok = df["text"].fillna("").astype(str).str.count("[^ ]+").to_numpy(np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        b = (_sm(did.view(np.uint64)) % np.uint64(_PACK_BUCKETS)).astype(np.int64)
        return pd.DataFrame({"doc_id": did, "bucket": b, "tok": tok})

    def pack_bucket(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values("doc_id")
        tok = grp["tok"].to_numpy(np.int64)
        cs = np.cumsum(tok)
        seq = np.empty(len(tok), np.int64)
        i, s, base = 0, 0, 0
        while i < len(tok):
            j = int(np.searchsorted(cs, base + _PACK_BUDGET, side="right"))
            j = max(j, i + 1)  # oversized doc -> its own sequence
            seq[i:j] = s
            base = int(cs[j - 1])
            i, s = j, s + 1
        return pd.DataFrame(
            {
                "doc_id": grp["doc_id"].to_numpy(),
                "bucket": grp["bucket"].to_numpy(),
                "seq": seq,
                "tok": tok,
            }
        )

    return (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pandas")
    )


def pack_sequences_sql(budget: int = _PACK_BUDGET, nb: int = _PACK_BUCKETS) -> str:
    """Recursive-CTE oracle for q_pack_sequences: one walk step per
    in-bucket rank (all buckets advance together), recurrence
    seq' = seq + (fill + tok > budget), fill' = tok or fill + tok."""
    from fairy_core_ray.pipelines.sql_hash import sm_stage1, sm_stage2, sm_stage3

    inner = (
        "SELECT doc_id, "
        "len(list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '')) "
        "AS tok, CAST(doc_id AS UBIGINT) AS hb FROM documents"
    )
    s1 = f"SELECT doc_id, tok, {sm_stage1('hb')} AS hb FROM ({inner})"
    s2 = f"SELECT doc_id, tok, {sm_stage2('hb')} AS hb FROM ({s1})"
    s3 = f"SELECT doc_id, tok, {sm_stage3('hb')} AS hb FROM ({s2})"
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, CAST(hb % {nb} AS BIGINT) AS bucket, CAST(tok AS BIGINT) AS tok,
         row_number() OVER (PARTITION BY hb % {nb} ORDER BY doc_id) AS rn
  FROM ({s3})
),
walk AS (
  SELECT bucket, rn, doc_id, tok, CAST(0 AS BIGINT) AS seq, tok AS fill
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.bucket, b.rn, b.doc_id, b.tok,
         CASE WHEN w.fill + b.tok > {budget} THEN w.seq + 1 ELSE w.seq END,
         CASE WHEN w.fill + b.tok > {budget} THEN b.tok ELSE w.fill + b.tok END
  FROM walk w JOIN base b ON b.bucket = w.bucket AND b.rn = w.rn + 1
)
SELECT doc_id, bucket, seq, tok FROM walk
"""


# ---------------------------------------------------------------------------
# repetition stats (Gopher-style quality signals, integer-exact)
# ---------------------------------------------------------------------------


def q_repetition_stats(sf_dir: str):
    """Per-document repetition signals for quality filtering (the
    Gopher/C4 family): n_words, top_word_n (occurrences of the most
    frequent word) and dup_2gram_n (word-2-gram occurrences beyond the
    first). Counts stay INTEGER — the filter thresholds divide
    downstream — so the oracle compares exactly, no float rounding.
    One map_batches pass; docs never span batches, so per-doc folds are
    batch-local (zero shuffle)."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].fillna("").astype(str)
        did = df["doc_id"].to_numpy(np.int64)
        lists = s.str.findall("[^ ]+")
        lens = lists.str.len().to_numpy(np.int64)
        if lens.sum():
            flat = pd.DataFrame(
                {
                    "d": np.repeat(did, lens),
                    "w": np.concatenate([np.asarray(x, object) for x in lists]),
                }
            )
            wc = flat.groupby(["d", "w"], sort=False).size()
            top = wc.groupby(level=0).max()
            darr = flat["d"].to_numpy()
            same = darr[:-1] == darr[1:]
            grams = pd.DataFrame(
                {
                    "d": darr[:-1][same],
                    "g": (
                        flat["w"].to_numpy()[:-1][same]
                        + "\x1f"
                        + flat["w"].to_numpy()[1:][same]
                    ),
                }
            )
            gtot = grams.groupby("d", sort=False).size()
            gdis = grams.groupby("d", sort=False)["g"].nunique()
        else:
            top = pd.Series(dtype=np.int64)
            gtot = pd.Series(dtype=np.int64)
            gdis = pd.Series(dtype=np.int64)
        out = pd.DataFrame({"doc_id": did})
        out["n_words"] = pd.Series(lens, index=out.index)
        out["top_word_n"] = out["doc_id"].map(top).fillna(0).astype(np.int64)
        out["dup_2gram_n"] = (
            out["doc_id"].map(gtot).fillna(0) - out["doc_id"].map(gdis).fillna(0)
        ).astype(np.int64)
        return out

    return _t(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )


REPETITION_STATS_SQL = """
WITH lists AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS l
  FROM documents
),
w AS (
  SELECT doc_id, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS rn FROM lists
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words FROM w GROUP BY 1),
topw AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n
  FROM (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2) GROUP BY 1
),
g AS (
  SELECT a.doc_id, a.w || chr(31) || b.w AS g
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
),
g2 AS (
  SELECT doc_id,
         CAST(count(*) - count(DISTINCT g) AS BIGINT) AS dup_2gram_n
  FROM g GROUP BY 1
)
SELECT d.doc_id, COALESCE(tot.n_words, 0) AS n_words,
       COALESCE(topw.top_word_n, 0) AS top_word_n,
       COALESCE(g2.dup_2gram_n, 0) AS dup_2gram_n
FROM documents d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN topw ON d.doc_id = topw.doc_id
LEFT JOIN g2 ON d.doc_id = g2.doc_id
"""


def q_dup_ngram_density(sf_dir: str):
    """per-document duplicate word-3-gram density (stages/dedup.py:
    dup_ngram_density) — distinct-gram df fold + broadcast membership
    pass (count-join fallback above budget, path-equivalence pytest)."""
    return dd.dup_ngram_density(
        _t(sf_dir, "documents", ["doc_id", "text"], split=8), n=3
    )


DUP_NGRAM_DENSITY_SQL = """
WITH lists AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS l
  FROM documents
),
w AS (
  SELECT doc_id, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS rn FROM lists
),
g AS (
  SELECT DISTINCT a.doc_id, a.w || chr(31) || b.w || chr(31) || c.w AS g
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2
),
df AS (SELECT g, count(*) AS df FROM g GROUP BY g),
cnt AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
  FROM g JOIN df USING (g) WHERE df.df >= 2 GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(cnt.n_dup_grams, 0) AS BIGINT) AS n_dup_grams
FROM documents d LEFT JOIN cnt USING (doc_id)
"""


_LATE_US = 30 * 60 * 1_000_000  # 30-minute watermark


def q_late_events(sf_dir: str):
    """watermark / late-data diagnostic (streaming-shaped): events whose
    event time lags the user's running high-water mark (max ts over
    PRIOR arrivals) by more than 30 minutes — what an event-time window
    would have already closed on. The synth stream is ts-ordered by
    event_id, so arrival order is a deterministic splitmix64
    permutation of event_id (bijective; the SAME three-stage hash the
    SQL oracle re-derives via pipelines/sql_hash.py) — a shuffled-
    arrival replay. One hash-bucketed shuffle; in-bucket work is a
    vectorized sort + cythonized grouped cummax shifted one row; lag
    emitted as exact integer microseconds."""
    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id"], split=8)

    def attach_fb(df: pd.DataFrame) -> pd.DataFrame:
        from fairy_core_ray.functions.hashing import splitmix64

        u = df["user_id"].to_numpy(np.int64)
        df = df.copy()
        df["fb"] = (splitmix64(u.view(np.uint64)) % np.uint64(256)).astype(np.int64)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from fairy_core_ray.functions.hashing import splitmix64

        df = df.assign(
            arr=splitmix64(df["event_id"].to_numpy(np.int64).view(np.uint64))
        ).sort_values(["user_id", "arr"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        us = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        start = np.r_[True, u[1:] != u[:-1]]
        grp = np.cumsum(start) - 1
        # cythonized grouped cummax; previous row's INCLUSIVE cummax is
        # this row's prior-events high-water mark (group starts masked)
        hwm_incl = pd.Series(us).groupby(grp, sort=False).cummax().to_numpy()
        hwm = np.r_[np.int64(0), hwm_incl[:-1]]
        lag = hwm - us
        m = ~start & (lag > _LATE_US)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64)[m],
                "user_id": u[m],
                "lag_us": lag[m].astype(np.int64),
            }
        )

    out = (
        ev.map_batches(attach_fb, batch_format="pandas")
        .groupby("fb")
        .map_groups(
            lambda df: per_bucket(df.drop(columns=["fb"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def _late_events_sql() -> str:
    from fairy_core_ray.pipelines import sql_hash as sh

    arr = sh.sm_stage3(sh.sm_stage2(sh.sm_stage1("CAST(event_id AS UBIGINT)")))
    return f"""
WITH a AS (SELECT event_id, user_id, ts, {arr} AS arr FROM events),
h AS (
  SELECT event_id, user_id, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY arr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM a
)
SELECT event_id, user_id,
       CAST(epoch_us(hwm) - epoch_us(ts) AS BIGINT) AS lag_us
FROM h
WHERE hwm IS NOT NULL AND epoch_us(hwm) - epoch_us(ts) > {_LATE_US}
ORDER BY event_id
"""


LATE_EVENTS_SQL = _late_events_sql()


_SEQ_MAX = 32


def q_user_event_sequences(sf_dir: str):
    """per-user ordered event-type sequences (trajectory assembly for
    behavioral training data): first 32 events by (ts, event_id),
    '|'-joined, plus the truncated count. One hash-bucketed shuffle
    (hash(user) % 256 — bucketed dispatch, not per-user); in-bucket
    work is a vectorized sort + cumcount mask + C-level str.join per
    group. Oracle: string_agg(... ORDER BY ts, event_id) under a
    row_number window."""
    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"], split=8)

    def attach_fb(df: pd.DataFrame) -> pd.DataFrame:
        from fairy_core_ray.functions.hashing import splitmix64

        u = df["user_id"].to_numpy(np.int64)
        df = df.copy()
        df["fb"] = (splitmix64(u.view(np.uint64)) % np.uint64(256)).astype(np.int64)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        keep = df.groupby("user_id", sort=False).cumcount() < _SEQ_MAX
        df = df[keep]
        g = df.groupby("user_id", sort=False)["event_type"]
        out = g.agg("|".join).reset_index(name="seq")
        out["n_events"] = g.size().to_numpy(np.int64)
        return out[["user_id", "n_events", "seq"]]

    out = (
        ev.map_batches(attach_fb, batch_format="pandas")
        .groupby("fb")
        .map_groups(
            lambda df: per_bucket(df.drop(columns=["fb"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


USER_EVENT_SEQ_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg(event_type, '|' ORDER BY rn) AS seq
FROM r WHERE rn <= {_SEQ_MAX}
GROUP BY user_id ORDER BY user_id
"""


def q_neardup_best_survivors(sf_dir: str):
    """quality-aware near-dup dedup (stages/dedup.py:
    best_per_cluster_survivors): clusters from the exact embedding
    near-dup pair set (threshold 0.4, same as neardup_clusters), each
    cluster keeping its highest-n_chars member (ties -> smaller id);
    unclustered docs survive. Oracle: recursive min-label CTE +
    QUALIFY argmax over the identical SQL pair set."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = dd.embedding_neardup_pairs(emb, threshold=0.4)
    clusters = dd.cluster_pairs(pairs)
    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"], split=8)
    out = dd.best_per_cluster_survivors(
        docs, clusters, id_col="doc_id", quality_col="n_chars"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


NEARDUP_BEST_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
),
clus AS (SELECT id, least(id, min(r)) AS rep FROM reach GROUP BY id),
j AS (
  SELECT c.id, c.rep, d.n_chars
  FROM clus c JOIN documents d ON d.doc_id = c.id
),
best AS (
  SELECT id FROM j
  QUALIFY row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, id) = 1
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM clus) OR doc_id IN (SELECT id FROM best)
ORDER BY doc_id
"""


def q_novel_docs(sf_dir: str):
    """incremental-ingest anti-join (stages/dedup.py:
    novel_against_history): batch slice (last 60% of doc ids) vs
    history slice (first 60%) — novel = md5(text) seen nowhere in
    history. Bloom fast path emits definite-novels with zero shuffle;
    suspects confirm on full digests (broadcast below budget, bucketed
    union fold above; path-equivalence pytest)."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"], split=8)
    n = docs.count()
    # doc_id*5 < 3n  <=>  doc_id <= (3n-1)//5 ; doc_id*5 >= 2n <=> >= ceil(2n/5)
    hist = docs.filter(expr=f"doc_id <= {(3 * n - 1) // 5}")
    batch = docs.filter(expr=f"doc_id >= {(2 * n + 4) // 5}")
    out = dd.novel_against_history(batch, hist).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


NOVEL_DOCS_SQL = """
WITH n AS (SELECT count(*) AS n FROM documents),
hist AS (SELECT md5(text) AS k FROM documents, n WHERE doc_id * 5 < 3 * n),
batch AS (SELECT doc_id, md5(text) AS k FROM documents, n WHERE doc_id * 5 >= 2 * n)
SELECT doc_id FROM batch WHERE k NOT IN (SELECT k FROM hist) ORDER BY doc_id
"""


def q_word_freq_stats(sf_dir: str):
    """per-document corpus word-frequency stats (stages/text_stages.py:
    word_freq_stats) — integer-exact CCNet-style rarity signal:
    n_tokens, sum of corpus counts over token occurrences, rarest-token
    count. Vocab fold + broadcast scoring (join fallback above budget,
    path-equivalence pytest)."""
    from fairy_core_ray.stages.text_stages import word_freq_stats

    out = word_freq_stats(
        _t(sf_dir, "documents", ["doc_id", "text"], split=8)
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


WORD_FREQ_STATS_SQL = """
WITH lists AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS l
  FROM documents
),
w AS (SELECT doc_id, unnest(l) AS w FROM lists),
cnt AS (SELECT w, count(*) AS c FROM w GROUP BY w),
agg AS (
  SELECT doc_id, count(*) AS nt, sum(c) AS sf, min(c) AS mf
  FROM w JOIN cnt USING (w) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(agg.nt, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(agg.sf, 0) AS BIGINT) AS sum_freq,
       CAST(COALESCE(agg.mf, 0) AS BIGINT) AS min_freq
FROM documents d LEFT JOIN agg USING (doc_id)
"""


def q_pq_ann(sf_dir: str):
    """product-quantization approximate cosine kNN (stages/knn.py:
    pq_cosine_ann) — ADC lookup-sum scan over m one-byte subspace
    codes; the compressed-index scale path next to IVF/LSH. Rows-only:
    recall vs exact cosine_topk pinned in pytest."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = knn_mod.pq_cosine_ann(emb, Q, qdf["vec_id"].tolist(), k=5)
    if len(out):
        out = out.copy()
        out["cosine"] = out["cosine"].round(5)
        out["query_id"] = out["query_id"].astype(np.int64)
        out["neighbor_id"] = out["neighbor_id"].astype(np.int64)
    return out.reset_index(drop=True)


def q_mix_sources(sf_dir: str):
    """weighted mixture downsampling (stages/sampling.py:mix_sources) —
    Pile/Dolma-style mixture assembly with integer-exact deterministic
    hash gates; weight rule srcN -> (N % 5) + 1 mirrored in the SQL
    oracle. Two streaming passes, zero shuffle."""
    from fairy_core_ray.stages.sampling import mix_sources

    out = mix_sources(
        _t(sf_dir, "documents", ["doc_id", "source"], split=8),
        lambda s: (int(s[3:]) % 5) + 1,
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


MIX_SOURCES_SQL = """
WITH cnt AS (
  SELECT source, count(*) AS c,
         (CAST(substr(source, 4) AS BIGINT) % 5) + 1 AS w
  FROM documents GROUP BY source
),
k AS (SELECT min(c // w) AS k FROM cnt),
thr AS (
  SELECT source, c, least(w * (SELECT k FROM k), c) AS need FROM cnt
)
SELECT d.doc_id, d.source
FROM documents d JOIN thr USING (source)
WHERE (((CAST(d.doc_id AS HUGEINT) * 2654435761) % 18446744073709551616)
       % 1000003) * thr.c < thr.need * 1000003
ORDER BY d.doc_id
"""


def q_mix_epochs(sf_dir: str):
    """epoch-aware mixture assembly with bounded upsampling
    (stages/sampling.py:mix_sources_epochs) — UniMax-style: whole-corpus
    epochs + hash-gated remainder per source, repetition capped; target
    2x the corpus size, weight rule srcN -> (N % 5) + 1. Integer-exact
    plan (largest-remainder apportionment) mirrored in SQL."""
    from fairy_core_ray.stages.sampling import mix_sources_epochs

    ds = _t(sf_dir, "documents", ["doc_id", "source"], split=8)
    total = 2 * ds.count()
    out = mix_sources_epochs(
        ds, lambda s: (int(s[3:]) % 5) + 1, total, max_epochs=3
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values(["doc_id", "epoch"]).reset_index(drop=True)


MIX_EPOCHS_SQL = """
WITH cnt AS (
  SELECT source, count(*) AS c,
         (CAST(substr(source, 4) AS BIGINT) % 5) + 1 AS w
  FROM documents GROUP BY source
),
tot AS (
  SELECT sum(w) AS wsum, 2 * sum(c) AS total FROM cnt
),
sh0 AS (
  SELECT source, c, w,
         (w * total) // wsum AS sh, (w * total) % wsum AS fr,
         total
  FROM cnt, tot
),
sh AS (
  SELECT source, c,
         sh + CASE WHEN row_number() OVER (ORDER BY fr DESC, source DESC)
                   <= total - (SELECT sum(sh) FROM sh0)
              THEN 1 ELSE 0 END AS share
  FROM sh0
),
plan AS (
  SELECT source, c,
         least(share, 3 * c) // c AS ep,
         least(share, 3 * c) % c AS rn
  FROM sh
)
SELECT doc_id, source, CAST(unnest(range(CAST(reps AS BIGINT))) AS BIGINT) AS epoch
FROM (
  SELECT d.doc_id, d.source,
         p.ep + CASE WHEN (((CAST(d.doc_id AS HUGEINT) * 2654435761)
                            % 18446744073709551616) % 1000003) * p.c
                       < p.rn * 1000003
                THEN 1 ELSE 0 END AS reps
  FROM documents d JOIN plan p USING (source)
)
ORDER BY doc_id, epoch
"""


def q_hash_split(sf_dir: str):
    """deterministic train/eval split tag (stages/sampling.py:
    hash_split) — salted-hash gate, stable under resharding/rerun so
    decontamination can rely on eval membership not drifting."""
    from fairy_core_ray.stages.sampling import hash_split

    out = hash_split(
        _t(sf_dir, "documents", ["doc_id"], split=8), permille=100
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


HASH_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN ((((CAST(doc_id AS HUGEINT) + 2654435769)
                    % 18446744073709551616) * 2654435761)
                  % 18446744073709551616) % 1000003 % 1000 < 100
            THEN 'eval' ELSE 'train' END AS split
FROM documents ORDER BY doc_id
"""


def q_dup_substring_span(sf_dir: str):
    """per-document longest duplicated token span (stages/dedup.py:
    dup_substring_span) — Lee et al. 2022 substring-dedup signal at
    word-3-gram resolution; broadcast membership + vectorized RLE
    (join+bucketed-island fallback above budget, path-equivalence
    pytest)."""
    return dd.dup_substring_span(
        _t(sf_dir, "documents", ["doc_id", "text"], split=8), n=3
    )


DUP_SUBSTRING_SPAN_SQL = """
WITH lists AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS l
  FROM documents
),
w AS (
  SELECT doc_id, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS rn FROM lists
),
g AS (
  SELECT a.doc_id, a.rn, a.w || chr(31) || b.w || chr(31) || c.w AS g
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2
),
df AS (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g),
hits AS (SELECT g.doc_id, g.rn FROM g JOIN df USING (g) WHERE df.df >= 2),
isl AS (
  SELECT doc_id, rn,
         rn - row_number() OVER (PARTITION BY doc_id ORDER BY rn) AS grpk
  FROM hits
),
runs AS (SELECT doc_id, count(*) + 2 AS span FROM isl GROUP BY doc_id, grpk),
mx AS (SELECT doc_id, max(span) AS s FROM runs GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(mx.s, 0) AS BIGINT) AS max_dup_span
FROM documents d LEFT JOIN mx USING (doc_id)
"""


def q_table_profile(sf_dir: str):
    """generic per-column table profile (stages/profile.py:
    profile_table) over documents — n_rows / n_nulls / min / max / sum
    per column, typed partial fold (int mins as ints, not rendered
    strings). Exact, one streaming pass."""
    from fairy_core_ray.stages.profile import profile_table

    return profile_table(
        _t(sf_dir, "documents", ["doc_id", "n_chars", "lang", "source"], split=8),
        int_cols=["doc_id", "n_chars"],
        str_cols=["lang", "source"],
    )


TABLE_PROFILE_SQL = """
SELECT 'doc_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(min(doc_id) AS VARCHAR) AS min_v, CAST(max(doc_id) AS VARCHAR) AS max_v,
       CAST(sum(doc_id) AS BIGINT) AS sum_v FROM documents
UNION ALL
SELECT 'lang', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       min(lang), max(lang), 0 FROM documents
UNION ALL
SELECT 'n_chars', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR),
       CAST(sum(n_chars) AS BIGINT) FROM documents
UNION ALL
SELECT 'source', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       min(source), max(source), 0 FROM documents
ORDER BY "column"
"""


def q_dedup_substring_clean(sf_dir: str):
    """duplicated-substring REMOVAL (stages/dedup.py:
    remove_dup_substrings) — Lee et al. 2022's cut step: token runs
    covered by consecutive cross-doc duplicated 3-grams spanning >= 5
    tokens are cut; remaining tokens re-join. Oracle: islands CTE ->
    cut intervals -> NOT EXISTS anti-join -> ordered string_agg."""
    return dd.remove_dup_substrings(
        _t(sf_dir, "documents", ["doc_id", "text"], split=8), n=3, min_span=5
    )


DEDUP_SUBSTRING_CLEAN_SQL = """
WITH lists AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS l
  FROM documents
),
w AS (
  SELECT doc_id, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS rn FROM lists
),
g AS (
  SELECT a.doc_id, a.rn, a.w || chr(31) || b.w || chr(31) || c.w AS g
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.rn = a.rn + 2
),
df AS (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g),
hits AS (SELECT g.doc_id, g.rn FROM g JOIN df USING (g) WHERE df.df >= 2),
isl AS (
  SELECT doc_id, rn,
         rn - row_number() OVER (PARTITION BY doc_id ORDER BY rn) AS grpk
  FROM hits
),
runs AS (
  SELECT doc_id, min(rn) AS lo, min(rn) + count(*) + 1 AS hi
  FROM isl GROUP BY doc_id, grpk HAVING count(*) + 2 >= 5
),
kept AS (
  SELECT t.doc_id, t.rn, t.w FROM w t
  WHERE NOT EXISTS (
    SELECT 1 FROM runs r
    WHERE r.doc_id = t.doc_id AND t.rn BETWEEN r.lo AND r.hi
  )
),
agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY rn) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(agg.text_clean, '') AS text_clean
FROM documents d LEFT JOIN agg USING (doc_id)
"""


def q_semdedup(sf_dir: str):
    """SemDeDup semantic dedup over embeddings (spherical k-means +
    within-cluster keep-first cosine prune; stages/dedup.py). Rows-only:
    the sample-trained clustering is not SQL-expressible — parity is
    pinned in pytest against a single-process numpy replica of the
    identical arithmetic (test_dedup_knn_text)."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dd.semdedup_survivors(
        emb, n_clusters=8, threshold=0.4, train_sample=1 << 20, seed=42
    )
    return out.rename(columns={"id": "vec_id"})


# ---------------------------------------------------------------------------
# registries (merged into queries.QUERIES / queries.ORACLE)
# ---------------------------------------------------------------------------

EXT2_QUERIES = {
    "semdedup": q_semdedup,
    "dup_ngram_density": q_dup_ngram_density,
    "dup_substring_span": q_dup_substring_span,
    "mix_sources": q_mix_sources,
    "hash_split": q_hash_split,
    "mix_epochs": q_mix_epochs,
    "pq_ann": q_pq_ann,
    "word_freq_stats": q_word_freq_stats,
    "novel_docs": q_novel_docs,
    "neardup_best_survivors": q_neardup_best_survivors,
    "user_event_sequences": q_user_event_sequences,
    "dedup_substring_clean": q_dedup_substring_clean,
    "table_profile": q_table_profile,
    "late_events": q_late_events,
    "pack_sequences": q_pack_sequences,
    "repetition_stats": q_repetition_stats,
    "phash_dup_clusters": q_phash_dup_clusters,
    "bloom_semijoin": q_bloom_semijoin,
    "nearest_site_join": q_nearest_site_join,
    "knn_self_join": q_knn_self_join,
    "user_daily_gapfill": q_user_daily_gapfill,
    "latest_event_per_user": q_latest_event_per_user,
    "event_value_hist": q_event_value_hist,
    "approx_distinct_users": q_approx_distinct_users,
    "geo_compact_cells": q_geo_compact_cells,
    "trajectory_length": q_trajectory_length,
    "image_dedup_survivors": q_image_dedup_survivors,
    "order_lineitem_join": q_order_lineitem_join,
    "embed_scores": q_embed_scores,
    "window_top_users": q_window_top_users,
}

EXT2_ORACLE = {
    "dup_ngram_density": DUP_NGRAM_DENSITY_SQL,
    "dup_substring_span": DUP_SUBSTRING_SPAN_SQL,
    "mix_sources": MIX_SOURCES_SQL,
    "hash_split": HASH_SPLIT_SQL,
    "word_freq_stats": WORD_FREQ_STATS_SQL,
    "mix_epochs": MIX_EPOCHS_SQL,
    "novel_docs": NOVEL_DOCS_SQL,
    "neardup_best_survivors": NEARDUP_BEST_SQL,
    "user_event_sequences": USER_EVENT_SEQ_SQL,
    "dedup_substring_clean": DEDUP_SUBSTRING_CLEAN_SQL,
    "table_profile": TABLE_PROFILE_SQL,
    "late_events": LATE_EVENTS_SQL,
    "phash_dup_clusters": PHASH_DUP_CLUSTERS_SQL,
    "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
    "nearest_site_join": NEAREST_SITE_SQL,
    "knn_self_join": KNN_SELF_JOIN_SQL,
    "user_daily_gapfill": USER_DAILY_GAPFILL_SQL,
    "latest_event_per_user": LATEST_EVENT_SQL,
    "event_value_hist": EVENT_VALUE_HIST_SQL,
    "geo_compact_cells": GEO_COMPACT_SQL,
    "trajectory_length": TRAJECTORY_LENGTH_SQL,
    "image_dedup_survivors": IMAGE_DEDUP_SURVIVORS_SQL,
    "order_lineitem_join": ORDER_LINEITEM_JOIN_SQL,
    "embed_scores": _embed_scores_sql(),
    "window_top_users": WINDOW_TOP_USERS_SQL,
    # approx_distinct_users: the sketch IS SQL-expressible because it is
    # deterministic — see hll_sql(); error bound vs exact count pinned in
    # test_queries_ext2.py
    "approx_distinct_users": hll_sql(),
    "pack_sequences": pack_sequences_sql(),
    "repetition_stats": REPETITION_STATS_SQL,
}

from fairy_core_ray.pipelines import queries as _q  # noqa: E402

_q.QUERIES.update(EXT2_QUERIES)
_q.ORACLE.update(EXT2_ORACLE)
