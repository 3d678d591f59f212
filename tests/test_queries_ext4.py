"""Extension batch 4 (round 5): Ray result == DuckDB oracle on sf0.001,
plus operator-level invariants (snap distance optimality vs brute
force, pair-count conservation vs token counts)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from fairy_core_ray.pipelines.queries_ext4 import (
    EXT4_ORACLE,
    EXT4_QUERIES,
    N_ROADS,
    _roads,
)

SF = "/root/testdata/sf0.001"
TABLES = ["events", "orders", "lineitem", "documents", "embeddings"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(EXT4_ORACLE))
def test_matches_oracle(ray_session, name):
    got = EXT4_QUERIES[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _oracle(EXT4_ORACLE[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert (g.astype(str) == w.astype(str)).all(), c


def test_road_snap_is_true_nearest(ray_session):
    """Brute-force check: for a sample of events, the reported segment
    achieves the minimum point-to-segment distance² over ALL segments,
    and t_off is the clamped projection onto that segment."""
    got = EXT4_QUERIES["road_snap"](SF).to_pandas().set_index("event_id")
    r = _roads()
    for eid in list(got.index[:50]) + list(got.index[-50:]):
        px = (eid * 2654435761) % 1_000_000
        py = (eid * 104729 + 12345) % 1_000_000
        best = None
        for k in range(N_ROADS):
            dx, dy = px - r["x0"][k], py - r["y0"][k]
            along, perp = (dx, dy) if r["orient"][k] == 0 else (dy, dx)
            t = min(max(along, 0), r["length"][k])
            d2 = (along - t) ** 2 + perp**2
            if best is None or (d2, k) < best:
                best = (int(d2), int(k), int(t))
        row = got.loc[eid]
        assert (row["dist2"], row["road_id"], row["t_off"]) == best


def test_upsample_aligned_cells_are_4x_source(ray_session):
    """Every even/even target cell is exactly 4× its aligned source
    pixel, and there are exactly as many of them as source pixels."""
    from fairy_core_ray.pipelines.queries import _raster

    up = EXT4_QUERIES["geo_grid_upsample"](SF)
    src = _raster(SF)
    aligned = up[(up["px"] % 2 == 0) & (up["py"] % 2 == 0)].copy()
    aligned["sx"], aligned["sy"] = aligned["px"] // 2, aligned["py"] // 2
    m = aligned.merge(src, left_on=["sx", "sy"], right_on=["px", "py"])
    assert len(m) == len(src) == len(aligned)
    assert (m["v4"] == 4 * m["n"]).all()


def test_char_chi2_matches_counter_bruteforce(ray_session):
    """First 50 docs vs a plain collections.Counter replay."""
    from collections import Counter

    import pyarrow.parquet as pq

    got = EXT4_QUERIES["char_chi2"](SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(
        docs["doc_id"].to_pylist()[:50], docs["text"].to_pylist()[:50]
    ):
        c = Counter(text.encode("utf-8"))
        k, n = len(c), sum(c.values())
        chi2 = sum((v * k - n) ** 2 for v in c.values())
        row = got.loc[doc_id]
        assert (row["chi2_num"], row["k_distinct"], row["n_bytes"]) == (chi2, k, n)


def test_char_chi2_oracle_handles_empty_docs():
    """DuckDB string_split('', '') yields [''], not [] — the oracle
    must report (0, 0, 0) for empty/NULL text like the byte path does
    (review finding, round 5)."""
    from fairy_core_ray.pipelines.queries_ext4 import CHAR_CHI2_SQL

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'aab'), (2, ''), (3, NULL)) t(doc_id, text)"
    )
    got = con.sql(CHAR_CHI2_SQL).df().set_index("doc_id").sort_index()
    assert tuple(got.loc[1]) == (2, 2, 3)  # (2*2-3)^2 + (1*2-3)^2 = 2
    assert tuple(got.loc[2]) == (0, 0, 0)
    assert tuple(got.loc[3]) == (0, 0, 0)


def test_traj_simplify_matches_recursive_replay(ray_session):
    """Independent plain-Python recursive DP (arbitrary-precision ints,
    no numpy, no stack trick) over every user's trajectory must produce
    the identical kept set."""
    import pyarrow.parquet as pq

    from fairy_core_ray.pipelines.queries_ext4 import _TRAJ_EPS2

    got = (
        EXT4_QUERIES["traj_simplify"](SF)
        .to_pandas()
        .sort_values(["user_id", "s"])
        .reset_index(drop=True)
    )
    ev = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    rows = []
    for uid, g in ev.groupby("user_id", sort=False):
        eids = [int(e) for e in g["event_id"]]
        xs = [((e * 2654435761) % 1_000_000) // 100 for e in eids]
        ys = [((e * 104729 + 12345) % 1_000_000) // 100 for e in eids]
        keep = {0, len(eids) - 1}

        def rec(lo, hi):
            if hi - lo < 2:
                return
            dx, dy = xs[hi] - xs[lo], ys[hi] - ys[lo]
            seg2 = dx * dx + dy * dy
            best_num, best_m = -1, None
            for m in range(lo + 1, hi):
                mx, my = xs[m] - xs[lo], ys[m] - ys[lo]
                num = (
                    mx * mx + my * my
                    if seg2 == 0
                    else (mx * dy - my * dx) ** 2
                )
                if num > best_num:
                    best_num, best_m = num, m
            thr = _TRAJ_EPS2 if seg2 == 0 else _TRAJ_EPS2 * seg2
            if best_num > thr:
                keep.add(best_m)
                rec(lo, best_m)
                rec(best_m, hi)

        rec(0, len(eids) - 1)
        rows += [(int(uid), eids[i], i + 1) for i in sorted(keep)]
    want = pd.DataFrame(rows, columns=["user_id", "event_id", "s"])
    want = want.sort_values(["user_id", "s"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_bpe_pair_total_matches_token_counts(ray_session):
    """Conservation: sum of ALL pair counts (not just top-20) equals
    Σ_docs max(0, n_tokens − 1) — every adjacency counted exactly once,
    none across document boundaries."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    expected = sum(
        max(0, len([w for w in t.split(" ") if w]) - 1) for t in docs["text"]
    )
    full = _oracle(
        """
        WITH lists AS (
          SELECT list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x <> '') AS l
          FROM documents
        ),
        z AS (SELECT unnest(list_zip(l, l[2:])) AS p FROM lists WHERE len(l) >= 2)
        SELECT count(*) AS n FROM z WHERE p[2] IS NOT NULL
        """
    )
    assert int(full["n"][0]) == expected
    top = EXT4_QUERIES["bpe_top_merges"](SF).to_pandas()
    assert len(top) == 20
    assert (top["n"].to_numpy()[:-1] >= top["n"].to_numpy()[1:]).all()
