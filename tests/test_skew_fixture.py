"""Adversarial-skew fixture (VERDICT r3 next #9): a Zipfian-cell events
slice driven through the hot-key-sensitive operators, asserting the
outputs stay oracle-green and the tiling salting path actually engages
at the file level under skew."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import fairy_core_ray.pipelines.queries_ext2  # noqa: F401  (merges EXT2_* into the registry)
from fairy_core_ray.functions.geo import encode_cells
from fairy_core_ray.pipelines.queries import ORACLE, QUERIES, event_lonlat


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """events.parquet where ~45% of rows land in ONE res-13 cell and the
    rest follow a Zipf tail over the other cells; user ids and hours are
    Zipfian too (hot users inside hot windows)."""
    rng = np.random.default_rng(17)
    cand = np.arange(120_000, dtype=np.int64)
    lon, lat = event_lonlat(cand)
    cells = encode_cells(lon, lat, 13)
    uniq, inv = np.unique(cells, return_inverse=True)
    order = np.argsort(np.bincount(inv))[::-1]  # densest cell first
    n = 30_000
    # Zipf over cell ranks: P(rank r) ∝ 1/(r+1); rank 0 boosted to ~45%
    ranks = len(uniq)
    p = 1.0 / np.arange(1, ranks + 1)
    p[0] = p[1:].sum() * 0.8
    p /= p.sum()
    chosen_rank = rng.choice(ranks, size=n, p=p)
    ids_by_rank = [cand[inv == order[r]] for r in range(ranks)]
    event_id = np.array(
        [ids_by_rank[r][rng.integers(len(ids_by_rank[r]))] for r in chosen_rank],
        dtype=np.int64,
    )
    # Zipfian users (hot head) and a hot hour holding half the events
    user_id = np.minimum(
        rng.zipf(1.5, size=n).astype(np.int64), np.int64(500)
    )
    hour = np.where(rng.random(n) < 0.5, 0, rng.integers(0, 48, size=n))
    ts_us = hour * 3_600_000_000 + rng.integers(0, 3_600_000_000, size=n)
    df = pd.DataFrame(
        {
            "event_id": event_id,
            "user_id": user_id,
            "ts": pd.to_datetime(ts_us, unit="us"),
            "event_type": np.where(rng.random(n) < 0.5, "view", "click"),
            "value": rng.uniform(0, 100, size=n).round(3),
        }
    )
    d = tmp_path_factory.mktemp("skew")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def _oracle_on(skew_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_slice_is_actually_skewed(skew_dir):
    ev = pd.read_parquet(os.path.join(skew_dir, "events.parquet"))
    lon, lat = event_lonlat(ev["event_id"].to_numpy())
    cells = encode_cells(lon, lat, 13)
    top = np.bincount(pd.factorize(cells)[0]).max()
    assert top > 0.3 * len(ev)  # one cell holds >30% of all rows


@pytest.mark.parametrize("name", ["geo_cell_hist", "window_top_users"])
def test_skewed_slice_stays_oracle_green(ray_session, skew_dir, name):
    got = QUERIES[name](skew_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle_on(skew_dir, ORACLE[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(np.float64), atol=0, rtol=0)
        else:
            assert (a.astype(np.int64) == b.astype(np.int64)).all()


def test_tiling_salting_engages_under_skew(ray_session, tmp_path):
    """File-level: the synth corpus's hot blob (7.7% of footprints in one
    ~100 m cluster) must fan out into MULTIPLE salted shards when the
    per-shard row target is below the hot-cell count, with no rows lost
    and every shard under ~2x the target."""
    from fairy_core_ray.pipelines.tiling import write_tiled
    from fairy_core_ray.sources import synth

    n = 4000
    images_path = synth.ensure_image_dataset(n, seed=42)
    out = str(tmp_path / "tiles")
    res = write_tiled(images_path, out, n_images=n, seed=42, target_rows=150)
    shards = [f for f in os.listdir(out) if f.endswith(".parquet")]
    by_cell: dict[str, int] = {}
    total = 0
    for f in shards:
        cell = f.split("-s")[0]
        by_cell[cell] = by_cell.get(cell, 0) + 1
        nrows = len(pd.read_parquet(os.path.join(out, f)))
        total += nrows
        assert nrows <= 2 * 150 + 50  # salting keeps shards near target
    assert max(by_cell.values()) > 1  # the hot cell actually fanned out
    assert res["written"] == len(shards)
    # row conservation: every (image, tile) assignment row lands in
    # exactly one shard — recompute the expected row count directly
    from fairy_core_ray.pipelines.flagship import flagship

    expected = flagship(images_path, seed=42)["assignments"].count()
    assert total == expected
