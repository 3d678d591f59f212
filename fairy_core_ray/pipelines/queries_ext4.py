"""Round-5 second operator batch: map-matching and tokenizer-training
primitives.

* ``road_snap`` — snap every event point to its nearest road segment
  (map matching), the trajectory-mining primitive under OD matrices and
  staypoint enrichment. Roads are a deterministic synthetic set of
  axis-aligned segments (integer micro-unit endpoints), so
  point-to-segment distance² is exact int64 arithmetic and the DuckDB
  oracle matches bit-for-bit — no float projection hazard.
* ``bpe_top_merges`` — corpus-wide adjacent-token-pair counts, top 20:
  the first merge-selection step of BPE tokenizer training (Sennrich et
  al. 2016), run as per-batch vectorized pair partials → bucketed fold
  → distributed sort/limit.

The reference has no counterpart surface (its scope is CSV validation —
/root/reference/src/fairy/core/rulepack_runner.py); these extend the
large-scale-pipeline family (stages/text_stages.py, queries_ext3.py)
the brief mandates.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa

from fairy_core_ray.pipelines.queries import _t
from fairy_core_ray.stages import dedup as dd

# ---------------------------------------------------------------------------
# road_snap — nearest-segment map matching over a broadcast road set
# ---------------------------------------------------------------------------

#: synthetic road network size. Real road networks are ~10^8 segments
#: globally — far past this broadcast; the scale path is the repo's
#: cell-bucket route (geo_distance_join / nearest_site_join): bucket
#: segments by the grid cells their bounding boxes touch and join
#: points to their own cell's bucket. Here the set is small-side by
#: construction, so it ships once via ``ray.put`` and every batch scans
#: all segments vectorized (points × segments int64 matrix).
N_ROADS = 128
_ROAD_SPAN = 900_000  # micro-unit plane matches event px/py in [0, 1e6)


def _roads() -> dict[str, np.ndarray]:
    """Deterministic axis-aligned segments: id, orientation (0 = along
    x, 1 = along y), integer origin (x0, y0) and length L. Same LCG
    constants family as the rest of the synthetic footprints."""
    k = np.arange(N_ROADS, dtype=np.int64)
    return {
        "orient": k % 2,
        "x0": (k * 48271 + 11909) % _ROAD_SPAN,
        "y0": (k * 69621 + 33333) % _ROAD_SPAN,
        "length": 40_000 + (k * 7919) % 60_000,
    }


def q_road_snap(sf_dir: str):
    """Map matching: for each event point (the event_lonlat footprint in
    integer micro-units), the nearest road segment by point-to-segment
    distance², its along-road offset ``t_off`` and ``dist2``. Ties break
    to the smallest road_id (np.argmin first-min == SQL ORDER BY dist2,
    road_id). Axis-aligned segments keep the projection integer-exact:
    for a segment along x, dist² = (dx − clamp(dx,0,L))² + dy², all
    int64 — the oracle reproduces it exactly.

    Shape: roads broadcast once (``ray.put``), one streaming
    ``map_batches`` over events, per-batch |batch|×N_ROADS vectorized
    distance matrix, zero shuffle."""
    import ray

    roads_ref = ray.put(_roads())

    def snap(t: pa.Table) -> pa.Table:
        r = ray.get(roads_ref)
        eid = t["event_id"].to_numpy().astype(np.int64)
        px = (eid * 2654435761) % 1_000_000
        py = (eid * 104729 + 12345) % 1_000_000
        dx = px[:, None] - r["x0"][None, :]
        dy = py[:, None] - r["y0"][None, :]
        horiz = r["orient"][None, :] == 0
        along = np.where(horiz, dx, dy)
        perp = np.where(horiz, dy, dx)
        t_off = np.clip(along, 0, r["length"][None, :])
        d2 = (along - t_off) ** 2 + perp**2
        j = np.argmin(d2, axis=1)  # first min → smallest road_id
        rows = np.arange(len(eid))
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "road_id": pa.array(j.astype(np.int64), pa.int64()),
                "t_off": pa.array(t_off[rows, j].astype(np.int64), pa.int64()),
                "dist2": pa.array(d2[rows, j].astype(np.int64), pa.int64()),
            }
        )

    return _t(sf_dir, "events", ["event_id"], split=8).map_batches(
        snap, batch_format="pyarrow"
    )


ROAD_SNAP_SQL = f"""
WITH roads AS (
  SELECT CAST(k AS BIGINT) AS road_id,
         k % 2 AS orient,
         (k * 48271 + 11909) % {_ROAD_SPAN} AS x0,
         (k * 69621 + 33333) % {_ROAD_SPAN} AS y0,
         40000 + (k * 7919) % 60000 AS len
  FROM range({N_ROADS}) t(k)
),
pts AS (
  SELECT event_id,
         (event_id * 2654435761) % 1000000 AS px,
         (event_id * 104729 + 12345) % 1000000 AS py
  FROM events
),
cand AS (
  SELECT event_id, road_id,
         CASE WHEN orient = 0 THEN px - x0 ELSE py - y0 END AS along,
         CASE WHEN orient = 0 THEN py - y0 ELSE px - x0 END AS perp,
         len
  FROM pts, roads
),
d AS (
  SELECT event_id, road_id,
         greatest(0, least(along, len)) AS t_off,
         (along - greatest(0, least(along, len)))
           * (along - greatest(0, least(along, len)))
           + perp * perp AS dist2
  FROM cand
),
r AS (
  SELECT event_id, road_id, t_off, dist2,
         row_number() OVER (PARTITION BY event_id
                            ORDER BY dist2, road_id) AS rn
  FROM d
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(road_id AS BIGINT) AS road_id,
       CAST(t_off AS BIGINT) AS t_off,
       CAST(dist2 AS BIGINT) AS dist2
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# bpe_top_merges — top adjacent-token-pair counts (BPE merge selection)
# ---------------------------------------------------------------------------

#: fold fan-out bound — same posture as dedup_norm_text's ×256 buckets;
#: distinct pairs are vocab²-bounded (BPE merges act on a bounded
#: symbol vocabulary), so each bucket folds a small frame.
_PAIR_BUCKETS = 64


def q_bpe_top_merges(sf_dir: str):
    """The BPE merge-selection step: count every adjacent token pair
    across the corpus (single-space split, empties dropped — the
    word_freq_stats tokenizer) and return the top 20 by (count DESC,
    pair ASC). Per-batch vectorized pair extraction (flat token array +
    doc-boundary mask, no per-doc Python loop) → local pair-count
    partials → md5-bucketed groupby fold → distributed sort + limit;
    the corpus never concentrates on the driver."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"], split=8)

    def pairs_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "tok_a": pd.Series([], dtype=object),
                "tok_b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
            }
        )
        s = df["text"].fillna("").astype(str)
        tok_lists = s.str.split(" ")
        lens = tok_lists.map(len).to_numpy(np.int64)
        total = int(lens.sum())
        if total < 2:
            return empty
        flat = np.fromiter(
            itertools.chain.from_iterable(tok_lists), dtype=object, count=total
        )
        doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        if len(flat) < 2:
            return empty
        adj = doc_idx[:-1] == doc_idx[1:]
        if not adj.any():
            return empty
        g = (
            pd.DataFrame({"tok_a": flat[:-1][adj], "tok_b": flat[1:][adj]})
            .groupby(["tok_a", "tok_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        key = g["tok_a"] + "\x1f" + g["tok_b"]
        g["b"] = (
            dd.md5_hex(key).map(lambda x: int(x[:2], 16)).astype(np.int64)
            % _PAIR_BUCKETS
        )
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["tok_a", "tok_b"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out[["tok_a", "tok_b", "n"]]

    return (
        ds.map_batches(pairs_partial, batch_format="pandas")
        .groupby("b")
        .map_groups(fold, batch_format="pandas")
        .sort(["n", "tok_a", "tok_b"], descending=[True, False, False])
        .limit(20)
    )


BPE_TOP_MERGES_SQL = """
WITH lists AS (
  SELECT list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS l
  FROM documents
),
z AS (SELECT unnest(list_zip(l, l[2:])) AS p FROM lists WHERE len(l) >= 2),
pairs AS (SELECT p[1] AS tok_a, p[2] AS tok_b FROM z WHERE p[2] IS NOT NULL)
SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY tok_a, tok_b
ORDER BY n DESC, tok_a, tok_b LIMIT 20
"""


EXT4_QUERIES = {
    "road_snap": q_road_snap,
    "bpe_top_merges": q_bpe_top_merges,
}

EXT4_ORACLE = {
    "road_snap": ROAD_SNAP_SQL,
    "bpe_top_merges": BPE_TOP_MERGES_SQL,
}

from fairy_core_ray.pipelines import queries as _q  # noqa: E402

_q.QUERIES.update(EXT4_QUERIES)
_q.ORACLE.update(EXT4_ORACLE)
