"""Extension batch 3 (round 5): Ray result == DuckDB oracle on sf0.001,
plus operator-level invariants (importance-gate monotonicity, heavy-
hitter candidate superset, normalization idempotence, diff partition)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import fairy_core_ray.pipelines.queries_ext3 as qx3
from fairy_core_ray.pipelines.queries_ext3 import EXT3_ORACLE, EXT3_QUERIES

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


@pytest.mark.parametrize("name", sorted(EXT3_ORACLE))
def test_matches_oracle(ray_session, name):
    got = EXT3_QUERIES[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _oracle(EXT3_ORACLE[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f":
            # single-IEEE-op derivations: demand bit equality
            assert (g == w.astype(np.float64)).all(), c
        else:
            assert (g.astype(str) == w.astype(str)).all(), c


def test_importance_gate_monotone_in_weight(ray_session):
    """A longer doc is kept whenever a shorter doc with the same hash
    draw is kept — keep-probability is monotone in n_chars, and docs at
    or above IMPORTANCE_FULL_LEN are always kept."""
    got = EXT3_QUERIES["importance_sample"](SF).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas()
    from fairy_core_ray.stages.sampling import HASH_MOD, _gate_hash

    h = _gate_hash(docs["doc_id"].to_numpy(), salt=qx3._IMPORTANCE_SALT)
    kept = set(got["doc_id"])
    full = docs[docs["n_chars"] >= qx3.IMPORTANCE_FULL_LEN]
    assert set(full["doc_id"]).issubset(kept)
    # exact gate replay matches the distributed selection
    expect = docs["doc_id"].to_numpy()[
        h * qx3.IMPORTANCE_FULL_LEN < docs["n_chars"].to_numpy() * HASH_MOD
    ]
    assert kept == set(expect)


def test_normalize_idempotent_and_variant_collapsing():
    s = pd.Series(["Hello,  World!", "hello world", "HELLO   WORLD??", "other"])
    n = qx3._normalize_text(s)
    assert list(n[:3]) == ["hello world"] * 3
    assert (qx3._normalize_text(n) == n).all()


def test_dedup_norm_counts_sum_to_corpus(ray_session):
    got = EXT3_QUERIES["dedup_norm_text"](SF).to_pandas()
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert got["n_variants"].sum() == n_docs
    assert got["doc_id"].is_unique


def test_heavy_hitters_candidates_superset_exact_answer(ray_session):
    """The local-heavy union provably contains every global heavy
    hitter; the final output equals the brute-force threshold set."""
    got = EXT3_QUERIES["heavy_hitters"](SF)
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()[
        "text"
    ]
    toks = [w for t in texts for w in t.split(" ") if w != ""]
    vc = pd.Series(toks).value_counts()
    want = {w: int(n) for w, n in vc.items() if n * qx3.HH_K > len(toks)}
    assert dict(zip(got["w"], got["n"])) == want


def test_grid_coarsen_conserves_total(ray_session):
    got = EXT3_QUERIES["geo_grid_coarsen"](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    import pyarrow.parquet as pq

    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert got["n"].sum() == n_events  # pooling loses nothing
    assert (got["cx"].between(0, 11)).all() and (got["cy"].between(0, 11)).all()


def test_focal_mean_window_invariants(ray_session):
    got = EXT3_QUERIES["geo_focal_mean"](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    interior = got[(got["px"].between(1, 94)) & (got["py"].between(1, 94))]
    assert (interior["n_nbrs"] == 9).all()
    corners = got[got["px"].isin([0, 95]) & got["py"].isin([0, 95])]
    assert (corners["n_nbrs"] == 4).all()
    assert (got["focal_mean"] == got["focal_sum"] / got["n_nbrs"]).all()
    # every window sum bounds the center cell's own count
    from fairy_core_ray.pipelines.queries import _raster

    r = _raster(SF).set_index(["px", "py"])["n"]
    own = pd.MultiIndex.from_arrays([got["px"], got["py"]])
    own_n = r.reindex(own).fillna(0).to_numpy()
    assert (got["focal_sum"].to_numpy() >= own_n).all()


def test_od_matrix_trip_bounds(ray_session):
    got = EXT3_QUERIES["od_matrix"](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    # each user's trips are at most their event count minus one
    assert got["n_trips"].sum() <= len(ev) - ev["user_id"].nunique()
    assert (got["zone_from"] != got["zone_to"]).all()
    assert (got["n_trips"] >= 1).all()


def test_staypoints_brute_force_replay(ray_session):
    """Single-process replay of the Li et al. anchor-scan on the raw
    table equals the distributed result (independent of the SQL
    oracle)."""
    got = EXT3_QUERIES["staypoints"](SF).to_pandas()
    import pyarrow.parquet as pq

    from fairy_core_ray.pipelines.queries import event_lonlat

    ev = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    lon, lat = event_lonlat(ev["event_id"].to_numpy())
    ev = ev.assign(lon=lon, lat=lat)
    rows = []
    for uid, g in ev.groupby("user_id", sort=False):
        L = g["lon"].to_numpy()
        B = g["lat"].to_numpy()
        T = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        E = g["event_id"].to_numpy()
        n, a = len(g), 0
        while a < n:
            j = a + 1
            while j < n and (L[j] - L[a]) ** 2 + (B[j] - B[a]) ** 2 <= qx3.STAY_EPS2:
                j += 1
            e = j - 1
            if T[e] - T[a] >= qx3.STAY_MIN_DUR_US:
                rows.append((uid, E[a], T[a], T[e], e - a + 1))
                a = e + 1
            else:
                a += 1
    want = pd.DataFrame(
        rows,
        columns=["user_id", "start_event_id", "ts_start_us", "ts_end_us", "n_points"],
    ).astype(np.int64)
    got = got.sort_values(["user_id", "ts_start_us"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "ts_start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_text_curation_composition_bounds(ray_session):
    """The composed pipeline's totals are bounded by its strictest
    stage: kept docs ≤ quality survivors, and the dedup ran BEFORE the
    gate (no (source, lang) cell exceeds its distinct-text count)."""
    got = EXT3_QUERIES["text_curation_pipeline"](SF)
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    per_cell = con.sql(
        "SELECT source, lang, count(DISTINCT md5(coalesce(text,''))) AS nd "
        "FROM documents GROUP BY source, lang"
    ).df()
    m = got.merge(per_cell, on=["source", "lang"], how="left")
    assert (m["n_docs"] <= m["nd"]).all()
    assert (got["n_docs"] >= 1).all() and (got["total_tokens"] >= got["n_docs"]).all()


def test_snapshot_diff_partition(ray_session):
    """Every emitted key is exactly one of added/removed/changed, and
    the three classes match their key-arithmetic definitions."""
    got = EXT3_QUERIES["snapshot_diff"](SF).to_pandas()
    assert got["o_orderkey"].is_unique
    k = got["o_orderkey"].to_numpy()
    ct = got["change_type"].to_numpy()
    assert ((ct == "added") == ((k % 7 == 0) & (k % 11 != 0))).all()
    assert ((ct == "removed") == ((k % 7 != 0) & (k % 11 == 0))).all()
    changed = (ct == "changed")
    assert ((k[changed] % 5 == 0) & (k[changed] % 7 != 0) & (k[changed] % 11 != 0)).all()
