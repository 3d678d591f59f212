"""Pins for the SQL re-derivations in pipelines/sql_hash.py and the new
brute-force oracles (VERDICT r3 next-round #1/#2): the flagship headline
pipeline and the ngram miner are value-hash-checked against DuckDB, not
just rows-counted."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from fairy_core_ray.functions.hashing import hash_u64
from fairy_core_ray.pipelines import sql_hash as sqh


def _hash_sql_values(seed: int, n: int) -> np.ndarray:
    inner = f"SELECT i, {sqh.seeded_input('i', seed)} AS h FROM (SELECT unnest(generate_series(0, {n - 1})) AS i)"
    q = sqh.hash_stage_cte(inner, ["h"], ["i"])
    rows = duckdb.connect().execute(f"SELECT h FROM ({q}) ORDER BY i").fetchall()
    return np.array([int(r[0]) for r in rows], dtype=np.uint64)


@pytest.mark.parametrize("seed", [0, 42, 42 ^ 0x10C, 42 ^ 0x7A7, 42 ^ 0x9A5A])
def test_sql_splitmix_hash_bit_exact(seed):
    got = _hash_sql_values(seed, 2048)
    want = hash_u64(np.arange(2048, dtype=np.int64), seed)
    assert np.array_equal(got, want)


def test_sql_wrapped_input_matches_numpy_uint64_wrap():
    """(i - 7) for i < 7 must wrap like numpy uint64 (the dup-phash
    back-reference in synth.phash_for)."""
    inner = (
        f"SELECT i, {sqh.seeded_input_wrapped('i', 7, 42)} AS h "
        "FROM (SELECT unnest(generate_series(0, 99)) AS i)"
    )
    q = sqh.hash_stage_cte(inner, ["h"], ["i"])
    rows = duckdb.connect().execute(f"SELECT h FROM ({q}) ORDER BY i").fetchall()
    got = np.array([int(r[0]) for r in rows], dtype=np.uint64)
    idx = np.arange(100, dtype=np.int64)
    with np.errstate(over="ignore"):
        want = hash_u64((idx.astype(np.uint64) - np.uint64(7)).astype(np.int64), 42)
    assert np.array_equal(got, want)


def _sequential_tile_stats(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side single-process re-derivation of flagship tile stats
    using the engine's own kernels (the brute-force reference)."""
    from fairy_core_ray.functions.geo import GridIndex, encode_cells
    from fairy_core_ray.sources.synth import (
        footprints_for,
        image_table,
        tile_polygons,
    )
    from fairy_core_ray.stages.validate_images import (
        DecodeValidator,
        conjunction,
        validate_batch,
    )

    t = conjunction(DecodeValidator()(validate_batch(image_table(n, seed))))
    idx = np.arange(n, dtype=np.int64)
    df = pd.DataFrame(
        {"i": idx, "phash": t["phash"].to_numpy(), "valid": t["valid"].to_numpy()}
    )
    df["dup_first"] = df["i"] == df.groupby("phash")["i"].transform("min")
    lon, lat = footprints_for(idx, seed)
    df["cell"] = encode_cells(lon, lat, 13)
    gi = GridIndex(tile_polygons())
    tids = np.array([p[0] for p in gi.polys], dtype=object)
    pi, qi = gi.query_batch(lon, lat)
    j = df.merge(pd.DataFrame({"i": pi, "tile_id": tids[qi]}), on="i")
    j = j[j["valid"] & j["dup_first"]]
    out = j.groupby(["cell", "tile_id"]).size().rename("n_images").reset_index()
    out["n_images"] = out["n_images"].astype(np.int64)
    return out.sort_values(["cell", "tile_id"]).reset_index(drop=True)


def test_flagship_oracle_sql_matches_sequential_reference():
    n = 3000
    sql = sqh.flagship_tile_stats_sql(
        f"SELECT unnest(generate_series(0, {n - 1})) AS i"
    )
    got = (
        duckdb.connect()
        .execute(sql)
        .fetchdf()
        .sort_values(["cell", "tile_id"])
        .reset_index(drop=True)
    )
    want = _sequential_tile_stats(n)
    pd.testing.assert_frame_equal(
        got.astype({"cell": "int64", "n_images": "int64"}), want
    )


def test_flagship_ray_pipeline_value_pinned_vs_sql(tmp_path):
    """The entry()/bench headline pipeline, value-level: Ray flagship
    tile_stats over a materialized corpus == the DuckDB re-derivation.
    (The driver now also checks this at sf0.01 via ORACLE; this pins it
    in pytest at a size independent of the testdata.)"""
    from fairy_core_ray.pipelines.flagship import flagship
    from fairy_core_ray.sources.synth import ensure_image_dataset

    n = 2500
    path = ensure_image_dataset(n, seed=42, root=str(tmp_path))
    got = (
        flagship(path)["tile_stats"]
        .to_pandas()
        .sort_values(["cell", "tile_id"])
        .reset_index(drop=True)
    )
    sql = sqh.flagship_tile_stats_sql(
        f"SELECT unnest(generate_series(0, {n - 1})) AS i"
    )
    want = (
        duckdb.connect()
        .execute(sql)
        .fetchdf()
        .sort_values(["cell", "tile_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["cell", "tile_id", "n_images"]].astype(
            {"cell": "int64", "n_images": "int64"}
        ),
        want.astype({"cell": "int64", "n_images": "int64"}),
    )


def test_aspect_buckets_matches_oracle(ray_session):
    """Aspect-ratio bucketing (integer-exact class boundaries) vs the
    generator-arithmetic SQL re-derivation, and basic invariants: every
    valid-dim image lands in exactly one bucket."""
    from fairy_core_ray.pipelines.queries import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    got = (
        QUERIES["aspect_buckets"](sf)
        .sort_values(["bucket", "fmt"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = (
        con.execute(ORACLE["aspect_buckets"])
        .fetchdf()
        .sort_values(["bucket", "fmt"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in ("n_images", "max_w", "max_h")}),
        want.astype({c: "int64" for c in ("n_images", "max_w", "max_h")}),
    )
    # partition invariant: bucket counts sum to the valid-dim row count
    dims = duckdb.connect().execute(
        sqh.image_dims_hist_sql(
            f"SELECT unnest(generate_series(0, {4 * con.execute('SELECT count(*) FROM documents').fetchone()[0] - 1})) AS i"
        )
    ).fetchdf()
    assert got["n_images"].sum() == dims[(dims.w > 0) & (dims.h > 0)]["n"].sum()


def test_ngram_oracle_sql_matches_miner_on_seeded_dups():
    """The ngram_pairs brute-force SQL == the distributed PPJoin miner
    on a corpus with seeded near-duplicates (exact recall contract)."""
    import ray.data as rd

    from fairy_core_ray.stages import dedup as dd

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(60)]
    # seeded near-dups: copy with one token changed (J well above 0.5)
    for i in range(0, 20, 4):
        toks = texts[i].split()
        toks[3] = "CHANGED"
        texts[i + 1] = " ".join(toks)
    # short docs (single-gram rule) + an empty doc (never a candidate)
    texts += ["alpha beta", "alpha beta", "solo", "", "  "]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})

    got = dd.ngram_jaccard_pairs(
        rd.from_pandas(df), threshold=0.5
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", df)
    from fairy_core_ray.pipelines.queries import ORACLE

    want = (
        con.execute(ORACLE["ngram_pairs"]).fetchdf().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"id_a": "int64", "id_b": "int64"}),
        want.astype({"id_a": "int64", "id_b": "int64"}),
    )
