"""Extension batch 2: Ray result == DuckDB oracle on sf0.001, plus
operator-level invariants (bloom no-false-negative, banded phash recall,
self-kNN vs brute force)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import fairy_core_ray.pipelines.queries_ext2 as qx2
from fairy_core_ray.pipelines.queries_ext2 import EXT2_ORACLE, EXT2_QUERIES

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


@pytest.mark.parametrize("name", sorted(EXT2_ORACLE))
def test_matches_oracle(ray_session, name):
    got = EXT2_QUERIES[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _oracle(EXT2_ORACLE[name])
    got, want = _norm(got), _norm(want)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f":
            assert np.allclose(g, w.astype(np.float64), atol=0, rtol=0), c
        else:
            assert (g == w.astype(g.dtype)).all(), c


def test_bloom_no_false_negatives():
    keys = np.array([3, 17, 4242, 999_983], dtype=np.int64)
    bits = qx2._bloom_build(keys)
    assert qx2._bloom_test(bits, keys).all()
    # false-positive rate on disjoint probes stays tiny at this fill
    probe = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fp = qx2._bloom_test(bits, probe).mean()
    assert fp < 1e-3


def test_bloom_empty_keys():
    bits = qx2._bloom_build(np.empty(0, np.int64))
    assert not qx2._bloom_test(bits, np.array([1, 2, 3], np.int64)).any()


def test_hamming_band_pairs_exact_recall(ray_session):
    """banded mining must find EVERY pair at hamming <= 3 (pigeonhole)."""
    import ray.data as rd

    from fairy_core_ray.functions.hashing import hamming64
    from fairy_core_ray.stages.dedup import hamming_band_pairs

    rng = np.random.default_rng(7)
    base = rng.integers(0, 1 << 61, size=40, dtype=np.int64)
    # plant neighbors at hamming 1..3 of the first 10 bases
    rows = [("b", i, h) for i, h in enumerate(base)]
    nid = len(base)
    for i in range(10):
        h = int(base[i])
        for nbits in (1, 2, 3):
            flipped = h
            for b in range(nbits):
                flipped ^= 1 << ((i * 7 + b * 13) % 61)
            rows.append(("p", nid, np.int64(flipped)))
            nid += 1
    ids = np.array([r[1] for r in rows], np.int64)
    hs = np.array([r[2] for r in rows], np.int64)
    ds = rd.from_pandas(pd.DataFrame({"id": ids, "h": hs})).repartition(4)
    got = hamming_band_pairs(ds, hash_col="h", id_col="id", max_hamming=3)
    got_set = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    # brute force
    H = hamming64(hs.view(np.uint64)[:, None], hs.view(np.uint64)[None, :])
    iu, ju = np.triu_indices(len(ids), 1)
    want = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(iu[H[iu, ju] <= 3], ju[H[iu, ju] <= 3])
    }
    assert got_set == want


def test_self_knn_matches_bruteforce(ray_session):
    import ray.data as rd

    from fairy_core_ray.stages.knn import cosine_topk_selfjoin

    rng = np.random.default_rng(11)
    X = rng.standard_normal((60, 8))
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64), "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(5)
    got = cosine_topk_selfjoin(ds, k=4)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2.0)
    for i in range(60):
        order = np.lexsort((np.arange(60), -S[i]))[:4]
        sub = got[got["vec_id"] == i]
        assert sorted(sub["neighbor_id"].tolist()) == sorted(order.tolist()), i
        assert np.allclose(np.sort(sub["cosine"].to_numpy())[::-1], S[i][order], atol=1e-12)


def test_self_knn_auto_routes_to_lsh_above_block_budget(ray_session):
    """cosine_topk_selfjoin must not schedule O(B²) exact block pairs
    above the block budget (VERDICT r3 #4): forcing the budget to 0
    routes through lsh_cosine_topk_selfjoin, and on clustered vectors
    (every true neighbor nearly parallel → collides in every LSH table)
    the routed result equals the exact one, tie-breaks included."""
    import ray.data as rd

    from fairy_core_ray.stages.knn import cosine_topk_selfjoin

    rng = np.random.default_rng(13)
    base = rng.standard_normal((20, 16))
    X = np.repeat(base, 4, axis=0) + 0.01 * rng.standard_normal((80, 16))
    df = pd.DataFrame(
        {"vec_id": np.arange(80, dtype=np.int64), "embedding": list(X)}
    )
    ds = rd.from_pandas(df).repartition(4)
    exact = cosine_topk_selfjoin(ds, k=3)
    routed = cosine_topk_selfjoin(ds, k=3, max_exact_blocks=0)
    pd.testing.assert_frame_equal(
        routed.round({"cosine": 9}), exact.round({"cosine": 9})
    )


def test_gapfill_dense_and_zeroed(ray_session):
    out = qx2.q_user_daily_gapfill(SF)
    for uid, g in out.groupby("user_id"):
        d = g["day"].to_numpy()
        assert (np.diff(d) == 1).all()  # dense range
    assert (out["n_events"] >= 0).all()


def test_hll_error_bound_and_determinism(ray_session):
    import duckdb

    got1 = qx2.q_approx_distinct_users(SF)["approx_distinct"].iloc[0]
    got2 = qx2.q_approx_distinct_users(SF)["approx_distinct"].iloc[0]
    assert got1 == got2  # no RNG, partial-merge order-invariant
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert abs(int(got1) - exact) / exact < 0.05


def test_hll_partial_merge_associative():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 62, size=30_000, dtype=np.int64)
    whole = qx2.hll_partial(keys)
    split = np.maximum(
        qx2.hll_partial(keys[:11_000]),
        np.maximum(qx2.hll_partial(keys[11_000:17_000]), qx2.hll_partial(keys[17_000:])),
    )
    assert (whole == split).all()
    # ~30k distinct-ish keys: estimate within 3 sigma of 1.04/sqrt(m)
    n_exact = len(np.unique(keys))
    err = abs(qx2.hll_estimate(whole) - n_exact) / n_exact
    assert err < 3 * 1.04 / np.sqrt(qx2._HLL_M)


def test_hll_sql_matches_python_raw_branch():
    """The SQL re-derivation must agree with the numpy sketch on BOTH
    estimator branches. 30k distinct keys forces the raw (bias-corrected
    harmonic) branch, where the only cross-engine difference is float
    sum order — allow 1 ulp of the rounded integer."""
    import duckdb

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 62, size=40_000, dtype=np.int64)
    py_est = qx2.hll_estimate(qx2.hll_partial(keys))
    con = duckdb.connect()
    con.register("keyed", pd.DataFrame({"user_id": keys}))
    sql_est = con.sql(qx2.hll_sql(table="keyed")).fetchone()[0]
    assert abs(int(sql_est) - int(py_est)) <= 1
    # register-level bit-exactness: idx/rank maxima from SQL == numpy
    regs_sql = con.sql(
        qx2.hll_sql(table="keyed").split("folded AS")[0].rstrip().rstrip(",")
        + " SELECT idx, rank FROM regs ORDER BY idx"
    ).df()
    regs_py = qx2.hll_partial(keys)
    nz = np.nonzero(regs_py)[0]
    assert (regs_sql["idx"].to_numpy() == nz).all()
    assert (regs_sql["rank"].to_numpy() == regs_py[nz]).all()
    con.close()


def test_hll_sql_linear_branch_small():
    """150-ish distinct keys (the sf0.01 regime) takes the
    linear-counting branch — output must match the python fold exactly."""
    import duckdb

    keys = np.arange(137, dtype=np.int64) * 1_000_003
    py_est = qx2.hll_estimate(qx2.hll_partial(keys))
    con = duckdb.connect()
    con.register("keyed", pd.DataFrame({"user_id": keys}))
    sql_est = con.sql(qx2.hll_sql(table="keyed")).fetchone()[0]
    con.close()
    assert int(sql_est) == int(py_est)


def test_pack_sequences_matches_greedy_reference(ray_session, tmp_path):
    """The searchsorted packer must equal the per-doc greedy recurrence
    (seq' = seq + (fill+tok > B)) on adversarial token streams: oversized
    docs (own sequence, next doc starts fresh), exact budget fits,
    zero-token docs (always join), runs of tiny docs."""
    rng = np.random.default_rng(5)
    toks = np.concatenate(
        [
            rng.integers(0, 40, 200),          # tiny docs
            [qx2._PACK_BUDGET],                # exact fit
            [qx2._PACK_BUDGET + 1, 900],       # oversized
            np.zeros(10, np.int64),            # empties
            rng.integers(100, 300, 100),       # mixed
        ]
    ).astype(np.int64)
    # drive through the real query by synthesizing texts with exactly
    # that many words; the reference loop groups by the same bucket fn
    texts = [" ".join(["w"] * int(t)) for t in toks]
    df = pd.DataFrame({"doc_id": np.arange(len(toks), dtype=np.int64), "text": texts})
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    got = (
        qx2.q_pack_sequences(str(sf))
        .to_pandas()
        .sort_values(["bucket", "doc_id"])
        .reset_index(drop=True)
    )
    # reference: per-doc greedy per bucket
    from fairy_core_ray.functions.hashing import splitmix64

    b = (
        splitmix64(df["doc_id"].to_numpy(np.int64).view(np.uint64))
        % np.uint64(qx2._PACK_BUCKETS)
    ).astype(np.int64)
    ref_rows = []
    for bucket in sorted(set(b.tolist())):
        ids = df["doc_id"].to_numpy()[b == bucket]
        ts = toks[b == bucket]
        seq, fill = 0, 0
        first = True
        for did, t in sorted(zip(ids.tolist(), ts.tolist())):
            if first:
                fill, first = t, False
            elif fill + t > qx2._PACK_BUDGET:
                seq, fill = seq + 1, t
            else:
                fill += t
            ref_rows.append((did, bucket, seq, t))
    ref = pd.DataFrame(ref_rows, columns=["doc_id", "bucket", "seq", "tok"])
    ref = ref.sort_values(["bucket", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))
    # invariant: no sequence of >1 doc exceeds the budget
    sums = got.groupby(["bucket", "seq"]).agg(n=("tok", "size"), s=("tok", "sum"))
    assert (sums[sums["n"] > 1]["s"] <= qx2._PACK_BUDGET).all()


def test_repetition_stats_edge_docs(ray_session, tmp_path):
    """Integer repetition counters on adversarial docs: empty, single
    word, all-same word (top_word_n == n_words, dup_2gram_n == n-2+1-1),
    alternating pair (every 2-gram after the first two is a repeat),
    multi-space runs."""
    texts = [
        "",
        "solo",
        "a a a a a a",            # n=6, top=6, 2grams: 5 total 1 distinct
        "x y x y x y x y",        # n=8, top=4, 2grams: 7 total 2 distinct
        "p  q   p",               # multi-space: n=3, top=2
        None,
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    got = (
        qx2.q_repetition_stats(str(sf))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "n_words": np.array([0, 1, 6, 8, 3, 0], np.int64),
            "top_word_n": np.array([0, 1, 6, 4, 2, 0], np.int64),
            "dup_2gram_n": np.array([0, 0, 4, 5, 0, 0], np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)
    # and the SQL oracle agrees on the same frame
    import duckdb

    con = duckdb.connect()
    con.register("documents", df)
    sql = (
        con.sql(qx2.REPETITION_STATS_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con.close()
    pd.testing.assert_frame_equal(sql, want)


def test_compact_expansion_identity_and_minimality(ray_session):
    """compacted set must (a) expand back to exactly the input leaf
    cells and (b) contain no complete 4-sibling group above the floor
    resolution (else it wasn't minimal)."""
    out = qx2.q_geo_compact_cells(SF)
    K, M = qx2._RES_K, qx2._IX_M
    # expand every output cell to res-13 leaves
    leaves = set()
    for cell, res in zip(out["cell"], out["res"]):
        ix, iy = (cell % K) // M, cell % M
        span = 1 << (13 - res)
        for dx in range(span):
            for dy in range(span):
                leaves.add((ix * span + dx, iy * span + dy))
    # ground truth leaves from the raw points
    import duckdb

    pts = duckdb.sql(
        f"SELECT event_id FROM '{SF}/events.parquet'"
    ).df()["event_id"].to_numpy()
    from fairy_core_ray.pipelines.queries import event_lonlat

    lon, lat = event_lonlat(pts)
    ix = np.floor((lon + 180.0) / 360.0 * 8192).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * 8192).astype(np.int64)
    assert leaves == set(zip(ix.tolist(), iy.tolist()))
    # minimality above the floor
    df = out[out["res"] > qx2._COMPACT_TO]
    ixs, iys = (df["cell"] % K) // M, df["cell"] % M
    sib = pd.DataFrame(
        {"res": df["res"], "px": ixs // 2, "py": iys // 2}
    ).groupby(["res", "px", "py"]).size()
    assert (sib < 4).all()


def test_bucketed_folds_many_users_per_bucket(ray_session, tmp_path):
    """The ×256 hash-bucket folds (gapfill / latest-per-key) must stay
    exact when buckets hold MANY users (the scale posture that replaced
    per-user map_groups dispatch — VERDICT r3 #3): 1500 users → ~6 users
    per bucket, mixed spans, duplicate days, out-of-order rows."""
    rng = np.random.default_rng(5)
    n_users, n_rows = 1500, 20_000
    user = rng.integers(0, n_users, size=n_rows).astype(np.int64)
    day_us = 86_400_000_000
    ts_us = (
        rng.integers(0, 40, size=n_rows).astype(np.int64) * day_us
        + rng.integers(0, day_us, size=n_rows)
    )
    df = pd.DataFrame(
        {
            "user_id": user,
            "event_id": np.arange(n_rows, dtype=np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "value": rng.uniform(0, 100, size=n_rows).round(2),
        }
    )
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)

    out = qx2.q_user_daily_gapfill(sf)
    # naive per-user reference
    days = pd.DataFrame({"user_id": user, "day": ts_us // day_us})
    frames = []
    for uid, g in days.groupby("user_id"):
        lo, hi = g["day"].min(), g["day"].max()
        full = np.arange(lo, hi + 1, dtype=np.int64)
        cnt = np.bincount(g["day"].to_numpy() - lo, minlength=len(full))
        frames.append(
            pd.DataFrame({"user_id": uid, "day": full, "n_events": cnt.astype(np.int64)})
        )
    want = pd.concat(frames, ignore_index=True).sort_values(
        ["user_id", "day"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)

    latest = qx2.q_latest_event_per_user(sf)
    want_l = (
        df.assign(ts_us=ts_us)
        .sort_values(["user_id", "ts_us", "event_id"], ascending=[True, False, False])
        .drop_duplicates("user_id", keep="first")
        .sort_values("user_id")
        .reset_index(drop=True)[["user_id", "event_id", "ts_us", "value"]]
    )
    pd.testing.assert_frame_equal(latest, want_l)


def test_gapfill_conserves_event_counts(ray_session):
    import duckdb

    out = qx2.q_user_daily_gapfill(SF)
    want = duckdb.sql(
        f"SELECT user_id, count(*) n FROM '{SF}/events.parquet' GROUP BY 1"
    ).df().set_index("user_id")["n"]
    got = out.groupby("user_id")["n_events"].sum()
    assert got.sort_index().equals(want.sort_index().astype(got.dtype))


def test_trajectory_matches_bruteforce(ray_session):
    import duckdb

    out = qx2.q_trajectory_length(SF).set_index("user_id")
    ev = duckdb.sql(
        f"SELECT user_id, event_id, ts FROM '{SF}/events.parquet'"
    ).df()
    from fairy_core_ray.pipelines.queries import event_lonlat

    lon, lat = event_lonlat(ev["event_id"].to_numpy())
    ev = ev.assign(lon=lon, lat=lat).sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        d = np.sqrt(
            np.diff(g["lon"].to_numpy()) ** 2 + np.diff(g["lat"].to_numpy()) ** 2
        ).sum()
        assert abs(out.loc[uid, "path_len"] - d) < 1e-5
        assert out.loc[uid, "n_points"] == len(g)


def test_embed_scores_oracle_dim_contract():
    """_embed_scores_sql() inlines dim-64 weight literals; the driver
    tables must actually be dim 64 or the Ray query (which infers dim)
    and the oracle would silently diverge."""
    import pyarrow.parquet as pq

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        assert len(t["embedding"][0]) == 64


class TestUserEventSequences:
    def test_truncation_and_order(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import pyarrow as pa
        import fairy_core_ray.pipelines.queries_ext2 as q2

        n = 40
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(np.arange(n)[::-1], unit="m"),
                "user_id": np.where(np.arange(n) % 2 == 0, 1, 2).astype(np.int64),
                "event_type": [f"t{i % 3}" for i in range(n)],
                "value": np.zeros(n),
                "props": [""] * n,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df), sf / "events.parquet")
        out = q2.q_user_event_sequences(str(sf))
        assert len(out) == 2
        # ts descends with event_id, so sequence order reverses event_id
        u1 = df[df.user_id == 1].sort_values(["ts", "event_id"])
        want = "|".join(u1["event_type"].head(32))
        assert out.loc[out.user_id == 1, "seq"].iloc[0] == want
        assert (out["n_events"] <= 32).all()


class TestTableProfile:
    def test_typed_fold_and_nulls(self, ray_session):
        import ray.data as rd

        from fairy_core_ray.stages.profile import profile_table

        df = pd.DataFrame(
            {
                # int values straddling the "100" < "99" string trap
                "a": pd.array([99, 100, 5, None], dtype="Int64"),
                "s": ["zebra", None, "apple", "mango"],
            }
        )
        out = profile_table(
            rd.from_pandas(df).repartition(3), int_cols=["a"], str_cols=["s"]
        ).set_index("column")
        assert out.loc["a", "min_v"] == "5" and out.loc["a", "max_v"] == "100"
        assert out.loc["a", "n_nulls"] == 1 and out.loc["a", "sum_v"] == 204
        assert out.loc["s", "min_v"] == "apple" and out.loc["s", "max_v"] == "zebra"
        assert out.loc["s", "n_rows"] == 4 and out.loc["s", "n_nulls"] == 1
