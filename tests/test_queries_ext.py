"""Extension-operator correctness: every queries_ext entry vs its
DuckDB oracle at sf0.001 (the driver's comparison, run in-tests), plus
shape invariants for the pair-emitting joins."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from fairy_core_ray.pipelines.queries_ext import EXT_ORACLE, EXT_QUERIES

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(EXT_QUERIES))
def test_ext_query_matches_oracle(ray_session, name):
    res = EXT_QUERIES[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    r = _canon(pd.DataFrame(res))
    o = _canon(_oracle(EXT_ORACLE[name]))
    assert list(r.columns) == list(o.columns), (list(r.columns), list(o.columns))
    assert len(r) == len(o), (name, len(r), len(o))
    for c in r.columns:
        if r[c].dtype == object:
            assert (r[c].astype(str).to_numpy() == o[c].astype(str).to_numpy()).all(), c
        else:
            assert (r[c].to_numpy() == o[c].to_numpy()).all(), c


def test_range_join_pairs_strictly_forward(ray_session):
    out = EXT_QUERIES["range_join_user_events"](SF)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert (out["gap_us"] > 0).all()
    assert (out["gap_us"] <= 3_600_000_000).all()
    assert not out.duplicated(["event_a", "event_b"]).any()


def test_geo_distance_join_pairs_unique_and_bounded(ray_session):
    out = EXT_QUERIES["geo_distance_join"](SF)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    if len(out):
        assert (out["id_a"] < out["id_b"]).all()
        assert (out["dist2"] <= 0.005 * 0.005).all()
        assert not out.duplicated(["id_a", "id_b"]).any()


def test_geo_distance_join_sparse_pruned_and_exact(ray_session, tmp_path):
    """Owner-occupied pruning (VERDICT r3 #5): on a sparse grid the
    replica volume must drop well below the flat 9x, and the output must
    still equal the O(n²) brute force exactly."""
    import duckdb

    from fairy_core_ray.pipelines.queries import event_lonlat

    # sf0.001 events: recompute the replica count the query would ship
    ev = duckdb.sql(f"SELECT event_id FROM '{SF}/events.parquet'").df()
    eid = ev["event_id"].to_numpy().astype(np.int64)
    lon, lat = event_lonlat(eid)
    r = 0.005
    ix = np.floor(lon / r).astype(np.int64)
    iy = np.floor(lat / r).astype(np.int64)
    home = (ix + 100000) * 1000000 + (iy + 100000)
    occupied = np.unique(home)
    shipped = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cell = (ix + dx + 100000) * 1000000 + (iy + dy + 100000)
            pos = np.minimum(np.searchsorted(occupied, cell), len(occupied) - 1)
            shipped += int((occupied[pos] == cell).sum())
    assert shipped < 0.8 * 9 * len(eid)  # measurably below flat 9x

    # exactness on a controlled sparse corpus: clusters far apart plus
    # singletons in otherwise-empty neighborhoods
    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({"event_id": rng.choice(10_000_000, size=n, replace=False)})
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    out = EXT_QUERIES["geo_distance_join"](str(tmp_path))
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    e2 = df["event_id"].to_numpy().astype(np.int64)
    lon2, lat2 = event_lonlat(e2)
    d2 = (lon2[:, None] - lon2[None, :]) ** 2 + (lat2[:, None] - lat2[None, :]) ** 2
    ai, bi = np.nonzero((d2 <= r * r) & (e2[:, None] < e2[None, :]))
    want = pd.DataFrame(
        {"id_a": e2[ai], "id_b": e2[bi], "dist2": d2[ai, bi]}
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False
    )


def test_geo_distance_join_bucketed_occ_path_equals_flat(ray_session):
    """Above-budget occupied-cell route (VERDICT r4 #4): with a tiny
    occ_budget the sorted cell set range-partitions into plasma bucket
    refs and per-batch membership fetches only straddled buckets — the
    pair set must be identical to the flat-broadcast path."""
    from fairy_core_ray.pipelines.queries_ext import q_geo_distance_join

    flat = q_geo_distance_join(SF)
    bucketed = q_geo_distance_join(SF, occ_budget=7)  # forces many buckets
    pd.testing.assert_frame_equal(
        flat.reset_index(drop=True), bucketed.reset_index(drop=True)
    )


def test_dedup_survivors_complement(ray_session):
    """survivors + dropped == corpus; every dropped id is a cluster
    member with a smaller representative."""
    import pyarrow.parquet as pq

    surv = EXT_QUERIES["dedup_survivors"](SF)
    if hasattr(surv, "to_pandas"):
        surv = surv.to_pandas()
    all_ids = set(
        pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])["vec_id"]
        .to_numpy()
        .tolist()
    )
    kept = set(surv["vec_id"].tolist())
    assert kept <= all_ids
    dropped = all_ids - kept
    # dropped ids must each appear in the oracle cluster map as non-rep
    lab = _oracle(
        EXT_ORACLE["dedup_survivors"]
        .replace(
            "SELECT vec_id FROM embeddings "
            "WHERE vec_id NOT IN (SELECT id FROM lab WHERE id <> rep) "
            "ORDER BY vec_id",
            "SELECT id, rep FROM lab WHERE id <> rep",
        )
    )
    assert dropped == set(lab["id"].tolist())
    assert (lab["rep"] < lab["id"]).all() or len(lab) == 0


def test_stratified_sample_rates_respected(ray_session):
    out = EXT_QUERIES["stratified_sample"](SF)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    h = (out["doc_id"].to_numpy(np.int64) * 2654435761) % 1000003 % 1000
    from fairy_core_ray.pipelines.queries_ext import _STRAT_PERMILLE

    thr = out["lang"].map(_STRAT_PERMILLE).to_numpy(np.int64)
    assert (h < thr).all()


def test_dedup_survivors_bucketed_path_equals_flat(ray_session, monkeypatch):
    """forcing SURVIVOR_KEY_BUDGET below the drop-set size must route
    through the range-partitioned bucket refs and give identical
    survivors."""
    import fairy_core_ray.pipelines.queries_ext as qx

    flat = qx.q_dedup_survivors(SF)
    monkeypatch.setattr(qx, "SURVIVOR_KEY_BUDGET", 2)
    bucketed = qx.q_dedup_survivors(SF)
    assert flat["vec_id"].tolist() == bucketed["vec_id"].tolist()


def test_member_mask_bucket_boundaries(ray_session, monkeypatch):
    """ids below the first bucket bound and between buckets must not
    false-positive; exact members in every bucket must hit."""
    import fairy_core_ray.pipelines.queries_ext as qx

    monkeypatch.setattr(qx, "SURVIVOR_KEY_BUDGET", 3)
    ids = np.array([10, 20, 30, 40, 50, 60, 70], dtype=np.int64)
    pub = qx._publish_sorted_ids(ids)
    assert pub[0] == "bucketed"
    probe = np.array([5, 10, 15, 40, 45, 70, 75], dtype=np.int64)
    got = qx._member_mask(pub, probe, {})
    assert got.tolist() == [False, True, False, True, False, True, False]
