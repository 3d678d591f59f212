"""Operator tests: dedup family, similarity search, text analysis —
brute-force sequential oracles on seeded synthetic corpora."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fairy_core_ray.stages import dedup as dd
from fairy_core_ray.stages import knn as knn_mod
from fairy_core_ray.stages import text_stages as ts


@pytest.fixture(scope="module")
def corpus():
    """60 docs; 0/1 near-dup (one word changed), 10/11 exact dup,
    20/21 near-dup (suffix added), rest random word salad."""
    rng = np.random.default_rng(5)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    texts = [
        " ".join(rng.choice(vocab, size=30).tolist()) for _ in range(60)
    ]
    texts[1] = texts[0].replace(texts[0].split()[5], "OMEGA", 1)
    texts[11] = texts[10]
    texts[21] = texts[20] + " extra tail words"
    return pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})


def brute_jaccard_pairs(df, k, threshold):
    sets = {
        int(r.doc_id): set(dd.char_shingles_u64(r.text, k).tolist())
        for r in df.itertuples()
    }
    out = []
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = dd.jaccard(sets[ids[i]], sets[ids[j]])
            if jac >= threshold:
                out.append((ids[i], ids[j], jac))
    return out


class TestMinHash:
    def test_signature_estimates_jaccard(self):
        a = dd.char_shingles_u64("the quick brown fox jumps over the lazy dog", 5)
        b = dd.char_shingles_u64("the quick brown fox jumped over the lazy dog", 5)
        true_j = dd.jaccard(set(a.tolist()), set(b.tolist()))
        sa = dd.minhash_signature(a, 256)
        sb = dd.minhash_signature(b, 256)
        est = (sa == sb).mean()
        assert abs(est - true_j) < 0.15

    def test_lsh_finds_seeded_dups(self, corpus):
        ds = rd.from_pandas(corpus)
        pairs = dd.minhash_lsh_pairs(ds, threshold=0.5)
        found = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        assert (0, 1) in found
        assert (10, 11) in found
        assert (20, 21) in found
        # every reported jaccard is the exact brute-force value
        want = {(a, b): j for a, b, j in brute_jaccard_pairs(corpus, 5, 0.5)}
        for r in pairs.itertuples():
            assert (int(r.id_a), int(r.id_b)) in want
            assert abs(r.jaccard - want[(int(r.id_a), int(r.id_b))]) < 1e-12

    def test_exact_dup_jaccard_1(self, corpus):
        ds = rd.from_pandas(corpus)
        pairs = dd.minhash_lsh_pairs(ds, threshold=0.5)
        row = pairs[(pairs["id_a"] == 10) & (pairs["id_b"] == 11)]
        assert len(row) == 1 and row["jaccard"].iloc[0] == 1.0


class TestSimHash:
    def test_identical_and_near(self, corpus):
        sh = dd.simhash64(corpus["text"])
        assert sh[10] == sh[11]  # identical text -> identical simhash
        from fairy_core_ray.functions.hashing import hamming64

        near = hamming64(sh[20:21].astype(np.int64), sh[21:22].astype(np.int64))[0]
        assert near <= 10  # suffix addition moves few bits

    def test_pairs_include_exact_dup(self, corpus):
        ds = rd.from_pandas(corpus)
        pairs = dd.simhash_pairs(ds, max_hamming=3)
        found = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        assert (10, 11) in found
        assert (pairs["hamming"] <= 3).all()

    def test_matches_bruteforce(self, corpus):
        from fairy_core_ray.functions.hashing import hamming64

        ds = rd.from_pandas(corpus)
        pairs = dd.simhash_pairs(ds, max_hamming=3)
        sh = dd.simhash64(corpus["text"]).astype(np.int64)
        want = set()
        for i in range(len(sh)):
            for j in range(i + 1, len(sh)):
                if hamming64(sh[i : i + 1], sh[j : j + 1])[0] <= 3:
                    want.add((i, j))
        got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        # banding guarantees recall for hamming<=3 (4 bands of 16 bits)
        assert got == want


class TestNgramJaccard:
    def test_finds_near_dups(self, corpus):
        ds = rd.from_pandas(corpus)
        pairs = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        found = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        assert (10, 11) in found
        assert (20, 21) in found


class TestKeepFirst:
    def test_no_duplicates_regression(self):
        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
        ds = rd.from_pandas(df)
        out = dd.keep_first(
            ds,
            key_fn=lambda t: t["text"].combine_chunks() if hasattr(t["text"], "combine_chunks") else t["text"],
            order_col="doc_id",
        ).to_pandas()
        assert out["dup_first"].all()

    def test_keep_first_marks_min(self):
        df = pd.DataFrame({"doc_id": [5, 3, 9, 7], "text": ["x", "x", "y", "x"]})
        ds = rd.from_pandas(df)
        out = (
            dd.keep_first(
                ds,
                key_fn=lambda t: t["text"].combine_chunks() if hasattr(t["text"], "combine_chunks") else t["text"],
                order_col="doc_id",
            )
            .to_pandas()
            .set_index("doc_id")["dup_first"]
        )
        assert out[3] and not out[5] and not out[7] and out[9]


class TestCosineKnn:
    @pytest.fixture(scope="class")
    def vecs(self):
        rng = np.random.default_rng(11)
        X = rng.standard_normal((300, 32))
        return pd.DataFrame(
            {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(X)}
        )

    def test_exact_matches_numpy(self, vecs):
        ds = rd.from_pandas(vecs)
        Q = np.stack(vecs["embedding"].iloc[:3].to_numpy())
        out = knn_mod.cosine_topk(ds, Q, [0, 1, 2], k=4)
        X = np.stack(vecs["embedding"].to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn[:3] @ Xn.T
        for qi in range(3):
            s = S[qi].copy()
            s[qi] = -2
            want = np.argsort(-s, kind="stable")[:4]
            got = out[out["query_id"] == qi]["neighbor_id"].to_numpy()
            assert set(got) == set(want)

    def test_lsh_recall(self, vecs):
        ds = rd.from_pandas(vecs)
        Q = np.stack(vecs["embedding"].iloc[:5].to_numpy())
        exact = knn_mod.cosine_topk(ds, Q, list(range(5)), k=5)
        approx = knn_mod.lsh_cosine_ann(ds, Q, list(range(5)), k=5, n_tables=16, n_planes=6)
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        assert len(e & a) / len(e) >= 0.6  # recall floor for 16x6 config

    def test_hamming_topk(self):
        ph = np.array([0b0, 0b1, 0b11, 0b111, 0b1111], dtype=np.int64)
        df = pd.DataFrame({"pid": np.arange(5, dtype=np.int64), "phash": ph})
        ds = rd.from_pandas(df)
        out = knn_mod.hamming_topk(ds, [0], phash_col="phash", id_col="pid", k=3)
        assert out["neighbor_id"].tolist() == [0, 1, 2]
        assert out["hamming"].tolist() == [0, 1, 2]


class TestText:
    def test_token_count_edges(self):
        s = pd.Series(["a b  c", "", "   ", None, "one"])
        assert ts.token_count(s).tolist() == [3, 0, 0, 0, 1]

    def test_langid_english(self):
        lid = ts.LangId()
        langs, scores = lid.predict(
            pd.Series(["the quick brown fox and the lazy dog went to the market of things"])
        )
        assert langs[0] == "en" and scores[0] > 0

    def test_langid_matches_scalar_reference(self):
        """The vectorized scorer must reproduce the per-doc loop it
        replaced (same counts, same first-wins tie-break, 'und' zeros)."""
        texts = pd.Series(
            [
                "the quick brown fox and the lazy dog",
                "la casa de la familia que vive en el mar",
                "der hund und die katze sind schnell im schnee",
                "",
                "xxxx qqqq zzzz",  # no profile trigrams -> und
                None,
                "le chat est sur le toit de la maison que",
            ]
        )
        lid = ts.LangId()
        got_langs, got_scores = lid.predict(texts)
        profiles = {
            lang: {g: float(len(grams) - i) for i, g in enumerate(grams)}
            for lang, grams in ts._LANG_PROFILES.items()
        }
        for j, t in enumerate(texts.fillna("").astype(str).str.lower()):
            best_lang, best = "und", 0.0
            for lang, prof in profiles.items():
                sc = sum(w * t.count(g) for g, w in prof.items())
                if sc > best:
                    best_lang, best = lang, sc
            assert got_langs[j] == best_lang
            assert got_scores[j] == best

    def test_langid_empty_batch(self):
        langs, scores = ts.LangId().predict(pd.Series([], dtype=object))
        assert langs == [] and len(scores) == 0


class TestWordTopkPaths:
    def test_distributed_fold_matches_driver_fold(self, monkeypatch):
        from fairy_core_ray.pipelines import queries as qq

        sf = "/root/testdata/sf0.001"
        driver = qq.q_word_topk(sf)
        monkeypatch.setattr(qq, "WORD_TOPK_DRIVER_DOCS", 0)  # force distributed
        dist = qq.q_word_topk(sf)
        assert driver.equals(dist)

    def test_fingerprint_deterministic_and_sensitive(self):
        s = pd.Series(["hello world this is a document", "a completely different sentence"])
        f1 = ts.rolling_fingerprint(s)
        f2 = ts.rolling_fingerprint(s)
        assert f1 == f2
        assert f1[0] != f1[1]
        # identical docs share the fingerprint
        same = ts.rolling_fingerprint(pd.Series([s[0], s[0]]))
        assert same[0] == same[1]

    def test_fingerprint_sql_matches_python_edge_cases(self):
        """fingerprint_sql must be bit-exact vs rolling_fingerprint on the
        nasty byte paths: empty text, NULL, sub-window docs (weights
        truncated), exactly window-sized, multibyte UTF-8 (hex decode must
        track bytes, not characters), repeated windows (distinct fold)."""
        import duckdb

        from fairy_core_ray.pipelines.queries import fingerprint_sql

        texts = [
            "", None, "ab", "exactly8", "short7!",
            "café naïve 中文 \U0001f600 bytes",
            "aaaaaaaaaaaaaaaaaaaaaaaa",  # one distinct window hash
            "hello world this is a longer document with many windows",
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        fps = ts.rolling_fingerprint(df["text"])
        want = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp_min": [int(f[0]) if f else -1 for f in fps],
                "fp_n": [len(f) for f in fps],
            }
        )
        con = duckdb.connect()
        con.register("documents", df)
        got = (
            con.sql(fingerprint_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({"fp_min": "int64", "fp_n": "int64"})
        )
        con.close()
        pd.testing.assert_frame_equal(got, want.astype({"fp_n": "int64"}))

    def test_quality_score_range(self):
        feats = ts.quality_features(pd.Series(["good plain text with words here"] * 3))
        q = ts.quality_score(feats)
        assert ((q >= 0) & (q <= 1)).all()

    def test_quality_features_match_per_row_reference(self):
        """The vectorized stop/word-length passes (one Series.str.count
        each) must equal the per-row findall reference on adversarial
        inputs: nested stopwords inside words, apostrophes, unicode,
        punctuation runs, blanks, None."""
        texts = pd.Series(
            [
                "the ant and the anthem are an odd pair",  # an/and/the inside words
                "it's a don't-stop 'quoted' O'Brien",  # apostrophes in WORD_RE
                "THE A AN AND — case folding",  # uppercase stopwords
                "no.stop;words!here???",  # punctuation-split words
                "",
                "   ",
                None,
                "byword by as at by",  # stopword as prefix of a word
                "word_1 word's therefore bythe",  # _ and suffix collisions
            ]
        )
        got = ts.quality_features(texts)
        s = texts.fillna("").astype(str)
        words = s.str.lower().str.findall(ts.WORD_RE)
        want_stop = words.map(
            lambda ws: sum(w in ts.STOPWORDS for w in ws) / max(1, len(ws))
        ).to_numpy(np.float64)
        want_mwl = words.map(
            lambda ws: (sum(len(w) for w in ws) / len(ws)) if ws else 0.0
        ).to_numpy(np.float64)
        assert np.array_equal(got["stop_ratio"].to_numpy(), want_stop)
        assert np.array_equal(got["mean_word_len"].to_numpy(), want_mwl)


class TestSimHashGuards:
    def test_blank_docs_skipped(self):
        """Empty/whitespace docs must not flood the 0-bucket or report
        hamming-0 pairs among themselves."""
        df = pd.DataFrame(
            {
                "doc_id": np.arange(8, dtype=np.int64),
                "text": ["", "   ", None, "", "alpha beta gamma", "alpha beta gamma", "x", "\t"],
            }
        )
        pairs = dd.simhash_pairs(rd.from_pandas(df), max_hamming=3)
        got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        assert (4, 5) in got
        blanks = {0, 1, 2, 3, 7}
        assert not any(a in blanks or b in blanks for a, b in got)

    def test_max_bucket_guard_caps_hot_bucket(self):
        """A boilerplate corpus (all-identical docs) collides in every
        band; max_bucket must cap the output at LINEAR star pairs (not
        O(n^2), and not zero — dropping exact duplicates would lose
        precisely the most-duplicated item)."""
        n = 40
        df = pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64), "text": ["same doc text"] * n}
        )
        pairs = dd.simhash_pairs(rd.from_pandas(df), max_bucket=10)
        # identical-hash hot bucket -> star to the min id, hamming 0
        assert len(pairs) == n - 1
        assert (pairs["id_a"] == 0).all() and (pairs["hamming"] == 0).all()
        assert sorted(pairs["id_b"]) == list(range(1, n))
        pairs2 = dd.simhash_pairs(rd.from_pandas(df), max_bucket=64)
        assert len(pairs2) == n * (n - 1) // 2

    def test_max_bucket_guard_drops_mixed_hot_bucket(self):
        """An oversized bucket whose hashes are NOT identical still
        drops (the documented hot-key guard)."""
        from fairy_core_ray.stages.dedup import _simhash_bucket_rows

        ids = np.arange(20, dtype=np.int64)
        sh = np.arange(20, dtype=np.int64)  # all distinct
        assert _simhash_bucket_rows(ids, sh, 3, 10) is None


class TestEmbeddingNearDup:
    @pytest.fixture(scope="class")
    def vecs(self):
        rng = np.random.default_rng(7)
        X = rng.standard_normal((400, 24))
        # plant 5 near-dup pairs: small perturbations
        for i in range(5):
            X[200 + i] = X[i] + 0.05 * rng.standard_normal(24)
        return pd.DataFrame(
            {"vec_id": np.arange(400, dtype=np.int64), "embedding": list(X)}
        )

    def brute(self, vecs, threshold):
        X = np.stack(vecs["embedding"].to_numpy())
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T
        out = set()
        for i in range(len(X)):
            for j in range(i + 1, len(X)):
                if S[i, j] >= threshold:
                    out.add((i, j))
        return out

    def test_exact_block_pair_matches_bruteforce(self, vecs):
        ds = rd.from_pandas(vecs)
        pairs = dd.embedding_neardup_pairs(ds, threshold=0.9)
        got = set(zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)))
        assert got == self.brute(vecs, 0.9)
        assert len(got) >= 5  # the planted pairs are found

    def test_lsh_recall_vs_exact(self, vecs):
        ds = rd.from_pandas(vecs)
        exact = self.brute(vecs, 0.9)
        approx = dd.embedding_neardup_pairs_lsh(
            ds, threshold=0.9, n_tables=16, n_planes=8
        )
        got = set(zip(approx["id_a"].astype(int), approx["id_b"].astype(int)))
        # every reported pair is a TRUE pair (verification is exact) ...
        assert all(p in exact for p in got)
        # ... and recall is high for near-dup-grade cosine at 16 tables
        assert len(got & exact) / max(1, len(exact)) >= 0.8


class TestClusterPairs:
    def test_components_min_rep(self):
        pairs = pd.DataFrame({"id_a": [1, 2, 5, 9], "id_b": [2, 3, 6, 1]})
        out = dd.cluster_pairs(pairs)
        reps = dict(zip(out["id"], out["rep"]))
        assert reps == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}

    def test_union_order_invariance(self):
        rng = np.random.default_rng(3)
        base = pd.DataFrame({"id_a": [10, 11, 12, 20, 21], "id_b": [11, 12, 13, 21, 22]})
        want = dd.cluster_pairs(base)
        for _ in range(5):
            perm = base.sample(frac=1.0, random_state=int(rng.integers(1e9)))
            got = dd.cluster_pairs(perm.reset_index(drop=True))
            assert got.equals(want)


class TestIvfAnn:
    def test_recall_vs_exact(self):
        rng = np.random.default_rng(17)
        X = rng.standard_normal((600, 24))
        vecs = pd.DataFrame(
            {"vec_id": np.arange(600, dtype=np.int64), "embedding": list(X)}
        )
        ds = rd.from_pandas(vecs)
        Q = np.stack(vecs["embedding"].iloc[:5].to_numpy())
        exact = knn_mod.cosine_topk(ds, Q, list(range(5)), k=5)
        approx = knn_mod.ivf_cosine_ann(
            ds, Q, list(range(5)), k=5, n_lists=8, nprobe=4
        )
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        assert len(e & a) / len(e) >= 0.6  # recall floor at nprobe/n_lists=0.5

    def test_self_query_top1_is_self_when_included(self):
        rng = np.random.default_rng(23)
        X = rng.standard_normal((100, 16))
        vecs = pd.DataFrame(
            {"vec_id": np.arange(100, dtype=np.int64), "embedding": list(X)}
        )
        ds = rd.from_pandas(vecs)
        Q = np.stack(vecs["embedding"].iloc[:3].to_numpy())
        out = knn_mod.ivf_cosine_ann(
            ds, Q, [0, 1, 2], k=1, n_lists=4, nprobe=4, exclude_self=False
        )
        got = dict(zip(out["query_id"], out["neighbor_id"]))
        assert got == {0: 0, 1: 1, 2: 2}  # nprobe=n_lists -> exhaustive


class TestMultimodalStages:
    def test_frame_sampling_indices(self):
        from fairy_core_ray.stages.multimodal import sample_frame_indices

        idx = sample_frame_indices(np.array([0, 2, 4, 100]), k=4)
        assert idx[0].tolist() == []
        assert idx[1].tolist() == [0, 1]          # n <= k: all frames
        assert idx[2].tolist() == [0, 1, 2, 3]
        assert idx[3].tolist() == [0, 25, 50, 75]  # uniform floor spacing

    def test_frame_sample_stage_explodes_and_is_deterministic(self):
        import pyarrow as pa

        from fairy_core_ray.stages.multimodal import FrameSampleStage

        batch = pa.table(
            {
                "video_id": pa.array(["v0", "v1", "v2"], pa.string()),
                "bytes": pa.array([b"payload-a", b"payload-b", None], pa.binary()),
                "n_frames": pa.array([10, 3, 8], pa.int64()),
            }
        )
        st = FrameSampleStage(frames_per_video=4)
        out1, out2 = st(batch), st(batch)
        assert out1.equals(out2)  # deterministic (process-stable hash)
        df = out1.to_pandas()
        assert df[df["video_id"] == "v0"]["frame_idx"].tolist() == [0, 2, 5, 7]
        assert df[df["video_id"] == "v1"]["frame_idx"].tolist() == [0, 1, 2]
        assert "v2" not in set(df["video_id"])  # null payload dropped
        assert ((df[["frame_mean_r", "frame_mean_g", "frame_mean_b"]] >= 0).all().all())

    def test_audio_window_stage_real_pcm(self):
        import pyarrow as pa

        from fairy_core_ray.stages.multimodal import AudioWindowStage

        t = np.arange(4096, dtype=np.float64)
        sine = (np.sin(2 * np.pi * t / 64.0) * 10000).astype("<i2")  # loud tone
        silence = np.zeros(2048, dtype="<i2")
        batch = pa.table(
            {
                "audio_id": pa.array(["loud", "quiet", "tiny"], pa.string()),
                "bytes": pa.array(
                    [sine.tobytes(), silence.tobytes(), b"\x01"], pa.binary()
                ),
            }
        )
        out = AudioWindowStage(window=1024)(batch).to_pandas()
        loud = out[out["audio_id"] == "loud"]
        quiet = out[out["audio_id"] == "quiet"]
        assert len(loud) == 4 and len(quiet) == 2
        assert (loud["rms"] > 1000).all() and (quiet["rms"] == 0).all()
        # 1024-sample windows of a 64-sample-period sine: 2 crossings/period
        assert np.allclose(loud["zcr"], 32 / 1023, atol=1e-3)
        assert "tiny" not in set(out["audio_id"])  # sub-window payload dropped


class TestNgramBigPathParity:
    def test_big_path_equals_small_path(self, corpus, monkeypatch):
        """The distributed (partial-fold + broadcast-count prefix) path
        must produce exactly the small driver path's pairs."""
        ds = rd.from_pandas(corpus)
        small = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        monkeypatch.setattr(dd, "SMALL_SKETCH_DOCS", 0)  # force big path
        big = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        assert small.equals(big)

    def test_minhash_simhash_big_path_parity(self, corpus, monkeypatch):
        ds = rd.from_pandas(corpus)
        mh_small = dd.minhash_lsh_pairs(ds, threshold=0.5)
        sh_small = dd.simhash_pairs(ds, max_hamming=3)
        monkeypatch.setattr(dd, "SMALL_SKETCH_DOCS", 0)  # force big path
        assert dd.minhash_lsh_pairs(ds, threshold=0.5).equals(mh_small)
        assert dd.simhash_pairs(ds, max_hamming=3).equals(sh_small)

    def test_ngram_countjoin_path_parity(self, corpus, monkeypatch):
        """Forcing the count-join branch (no gram-count broadcast at
        all: counts attach in groupby(g), prefix filter in groupby(id))
        must reproduce the small path's verified pairs exactly."""
        ds = rd.from_pandas(corpus)
        small = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        monkeypatch.setattr(dd, "SMALL_SKETCH_DOCS", 0)  # skip small path
        monkeypatch.setattr(dd, "NGRAM_BROADCAST_DOCS", 0)  # force count-join
        cj = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        assert small.equals(cj)

    def test_fold_bucket_pair_emit_matches_per_key(self):
        """_emit_fold_bucket_pairs (one vectorized call over a hash
        bucket of many keys) must emit exactly the per-key
        _emit_bucket_id_pairs union: hot-key guard on RAW rows,
        duplicate (key, id) rows collapsed, id_a < id_b."""
        rng = np.random.default_rng(11)
        n = 4000
        grp = pd.DataFrame(
            {
                "g": rng.integers(0, 300, n).astype(np.int64),
                "id": rng.integers(0, 60, n).astype(np.int64),
            }
        )
        # one guaranteed-hot key and one singleton key
        hot = pd.DataFrame({"g": np.full(40, 999, np.int64), "id": np.arange(40)})
        single = pd.DataFrame({"g": [1000], "id": [7]})
        grp = pd.concat([grp, hot, single], ignore_index=True)
        max_bucket = 25
        got = dd._emit_fold_bucket_pairs(grp, max_bucket)
        want = set()
        for _, sub in grp.groupby("g"):
            p = dd._emit_bucket_id_pairs(
                sub.rename(columns={"g": "k"}), max_bucket
            )
            want.update(zip(p["id_a"].tolist(), p["id_b"].tolist()))
        assert set(zip(got["id_a"].tolist(), got["id_b"].tolist())) == want
        assert (got["id_a"] < got["id_b"]).all()

    def test_distributed_count_fold_parity(self, corpus, monkeypatch):
        """Forcing the distributed bucket-count fold (the branch that at
        corpus scale keeps the O(docs x bands) count table off the
        driver) must not change the minhash/simhash pair sets."""
        ds = rd.from_pandas(corpus)
        mh_small = dd.minhash_lsh_pairs(ds, threshold=0.5)
        sh_small = dd.simhash_pairs(ds, max_hamming=3)
        monkeypatch.setattr(dd, "SMALL_SKETCH_DOCS", 0)  # force big path
        monkeypatch.setattr(dd, "SKETCH_FOLD_DRIVER_DOCS", 0)  # force dist fold
        assert dd.minhash_lsh_pairs(ds, threshold=0.5).equals(mh_small)
        assert dd.simhash_pairs(ds, max_hamming=3).equals(sh_small)

    def test_big_path_multiblock_parity(self, corpus, monkeypatch):
        """Big path with the corpus split across many blocks — pair
        enumeration must survive buckets spanning block boundaries."""
        ds = rd.from_pandas(corpus).repartition(8)
        small = dd.minhash_lsh_pairs(rd.from_pandas(corpus), threshold=0.5)
        monkeypatch.setattr(dd, "SMALL_SKETCH_DOCS", 0)
        big = dd.minhash_lsh_pairs(ds, threshold=0.5)
        assert big.equals(small)


class TestVerificationTextBudget:
    def test_chunked_text_refs_match_broadcast(self, corpus, monkeypatch):
        """Forcing the over-budget path (candidate texts shipped as
        per-block dict-chunk refs, never a driver dict) must yield the
        identical verified pair set."""
        ds = rd.from_pandas(corpus)
        base = dd.minhash_lsh_pairs(ds, threshold=0.5)
        monkeypatch.setattr(dd, "TEXT_BROADCAST_BUDGET", 0)
        chunked = dd.minhash_lsh_pairs(ds, threshold=0.5)
        assert base.equals(chunked)
        monkeypatch.setattr(dd, "TEXT_BROADCAST_BUDGET", 1 << 40)
        ng_base = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        monkeypatch.setattr(dd, "TEXT_BROADCAST_BUDGET", 0)
        assert ng_base.equals(
            dd.ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_posting=60)
        )


class TestExactNeardupAutoRoute:
    def test_routes_to_lsh_above_block_budget(self):
        rng = np.random.default_rng(7)
        X = rng.standard_normal((200, 16))
        X[1] = X[0] + 0.01 * rng.standard_normal(16)  # planted near-dup
        vecs = pd.DataFrame(
            {"vec_id": np.arange(200, dtype=np.int64), "embedding": list(X)}
        )
        ds = rd.from_pandas(vecs)
        routed = dd.embedding_neardup_pairs(ds, threshold=0.9, max_exact_blocks=0)
        lsh = dd.embedding_neardup_pairs_lsh(ds, threshold=0.9)
        assert routed.equals(lsh)
        # below the budget the exact path is used (superset-of-LSH recall)
        exact = dd.embedding_neardup_pairs(ds, threshold=0.9, max_exact_blocks=64)
        got_exact = set(zip(exact["id_a"].astype(int), exact["id_b"].astype(int)))
        got_lsh = set(zip(lsh["id_a"].astype(int), lsh["id_b"].astype(int)))
        assert got_lsh <= got_exact and (0, 1) in got_exact


class TestKeepFirstCollisionGuard:
    def test_hash_collision_does_not_mark_unique_row(self):
        """A u64 hash collision between a unique key and a dup key must
        not flip the unique row to dup_first=False (exact key equality
        confirms membership after the hash match)."""
        real = dd._key_hash_u64
        collide_with = real(np.array(["x"], dtype=object))[0]

        def fake(values):
            h = real(values).copy()
            arr = np.asarray(values)
            h[arr == "c-unique"] = collide_with  # forced collision
            return h

        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["x", "x", "c-unique"]})
        ds = rd.from_pandas(df)
        out = (
            dd.keep_first(
                ds,
                key_fn=lambda t: t["text"].combine_chunks()
                if hasattr(t["text"], "combine_chunks")
                else t["text"],
                order_col="doc_id",
                _hash_fn=fake,
            )
            .to_pandas()
            .set_index("doc_id")["dup_first"]
        )
        assert out[1] and not out[2] and out[3]


class TestIvfRandomTraining:
    def test_recall_on_cluster_sorted_input(self):
        """Rows sorted by cluster — the case a first-N training sample
        fails (it would only ever see the first clusters)."""
        rng = np.random.default_rng(31)
        centers = rng.standard_normal((6, 24)) * 4.0
        X = np.concatenate(
            [centers[i] + 0.1 * rng.standard_normal((100, 24)) for i in range(6)]
        )
        vecs = pd.DataFrame(
            {"vec_id": np.arange(600, dtype=np.int64), "embedding": list(X)}
        )
        ds = rd.from_pandas(vecs).repartition(6)
        qidx = [0, 150, 300, 450, 599]
        Q = X[qidx]
        exact = knn_mod.cosine_topk(ds, Q, qidx, k=5)
        approx = knn_mod.ivf_cosine_ann(
            ds, Q, qidx, k=5, n_lists=8, nprobe=4, train_sample=128
        )
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        assert len(e & a) / len(e) >= 0.6

    def test_empty_dataset_returns_empty_frame(self):
        empty = pd.DataFrame(
            {"vec_id": pd.Series([], dtype=np.int64), "embedding": []}
        )
        ds = rd.from_pandas(empty)
        out = knn_mod.ivf_cosine_ann(ds, np.ones((1, 4)), [0], k=3)
        assert len(out) == 0
        assert list(out.columns) == ["query_id", "neighbor_id", "cosine"]


class TestClusterPairsDistributed:
    """Label-propagation connected components == driver union-find."""

    def _edges(self):
        rng = np.random.default_rng(5)
        edges = [(i, i + 1) for i in range(100, 108)]  # chain (diameter 8)
        edges += [(200, x) for x in range(201, 210)]  # star
        edges += [(a, b) for a in range(300, 305) for b in range(a + 1, 305)]
        edges += [(400, 401), (402, 403)]  # isolated pairs
        rnd = rng.integers(500, 560, size=(40, 2))
        edges += [(int(a), int(b)) for a, b in rnd if a != b]
        return pd.DataFrame(
            {"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}
        )

    def test_matches_union_find(self, ray_session):
        pairs = self._edges()
        want = dd.cluster_pairs(pairs)
        got = dd.cluster_pairs_distributed(pairs)
        assert want.reset_index(drop=True).equals(got.reset_index(drop=True))

    def test_auto_route_above_budget(self, ray_session, monkeypatch):
        pairs = self._edges()
        want = dd.cluster_pairs(pairs)
        monkeypatch.setattr(dd, "CLUSTER_DRIVER_PAIR_BUDGET", 2)
        got = dd.cluster_pairs(pairs)  # routes through label propagation
        assert want.reset_index(drop=True).equals(got.reset_index(drop=True))

    def test_dataset_input_and_empty(self, ray_session):
        import ray.data as rd

        pairs = self._edges()
        got = dd.cluster_pairs_distributed(rd.from_pandas(pairs).repartition(4))
        want = dd.cluster_pairs(pairs)
        assert want.reset_index(drop=True).equals(got.reset_index(drop=True))
        empty = dd.cluster_pairs_distributed(
            pd.DataFrame({"id_a": [], "id_b": []})
        )
        assert len(empty) == 0


class TestSemDedup:
    """SemDeDup (k-means + within-cluster keep-first cosine prune) vs a
    single-process numpy replica of the identical arithmetic."""

    def _table(self, n=400, dim=16, seed=3):
        rng = np.random.default_rng(seed)
        X = rng.standard_normal((n, dim))
        # seeded near-dups: tiny perturbations of earlier rows
        for i in range(0, n // 4, 3):
            X[i + 1] = X[i] + rng.standard_normal(dim) * 0.01
        return pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}
        )

    def _replica(self, df, n_clusters, threshold, iters=8, seed=42):
        rng = np.random.default_rng(seed)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        k = min(n_clusters, len(X))
        C = X[rng.choice(len(X), size=k, replace=False)].copy()
        for _ in range(iters):
            assign = np.argmax(X @ C.T, axis=1)
            for j in range(k):
                m = assign == j
                if m.any():
                    c = X[m].mean(axis=0)
                    C[j] = c / max(np.linalg.norm(c), 1e-12)
        assign = np.argmax(X @ C.T, axis=1)
        ids = df["vec_id"].to_numpy(np.int64)
        rows = []
        for j in range(k):
            m = assign == j
            gi = ids[m]
            order = np.argsort(gi)
            gi, G = gi[order], X[m][order]
            drop = (np.triu(G @ G.T >= threshold, k=1)).any(axis=0)
            rows.append(pd.DataFrame({"id": gi[~drop], "cluster": j}))
        out = pd.concat(rows, ignore_index=True)
        out["cluster"] = out["cluster"].astype(np.int64)
        return out.sort_values("id").reset_index(drop=True)

    def test_matches_replica(self, ray_session):
        import ray.data as rd

        df = self._table()
        got = dd.semdedup_survivors(
            rd.from_pandas(df).repartition(4),
            n_clusters=6,
            threshold=0.95,
            train_sample=1 << 20,  # full-table training: deterministic
        )
        want = self._replica(df, n_clusters=6, threshold=0.95)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) < len(df)  # the seeded near-dups were pruned

    def test_empty_and_guard(self, ray_session):
        import ray.data as rd

        empty = dd.semdedup_survivors(
            rd.from_pandas(
                pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "embedding": pd.Series([], dtype=object)})
            )
        )
        assert len(empty) == 0
        df = self._table(n=60)
        with pytest.raises(Exception, match="max_cluster"):
            dd.semdedup_survivors(
                rd.from_pandas(df),
                n_clusters=1,
                threshold=0.99,
                train_sample=1 << 20,
                max_cluster=10,
            )

    def test_derived_n_clusters_avoids_guard(self, ray_session):
        """Paper-scaling default k = max(16, n // cluster_target)
        (VERDICT r4 #5): at a forced-small max_cluster a fixed k=16
        trips the guard, the derived k (n/target = 100 clusters over
        2000 vectors) keeps every cluster under it."""
        import ray.data as rd

        df = self._table(n=2000)
        ds = rd.from_pandas(df).repartition(4)
        with pytest.raises(Exception, match="max_cluster"):
            dd.semdedup_survivors(
                ds, n_clusters=16, threshold=0.99,
                train_sample=1 << 20, max_cluster=100,
            )
        got = dd.semdedup_survivors(
            ds, cluster_target=20, threshold=0.99,
            train_sample=1 << 20, max_cluster=100,
        )
        assert len(got) > 0
        assert got["cluster"].value_counts().max() <= 100


class TestDupNgramDensity:
    def _docs(self):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "a quick brown fox jumps over a fence",   # shares 'quick brown fox', 'brown fox jumps', 'fox jumps over'
            "completely unrelated text with no shared grams at all",
            "the quick brown fox jumps again",
            "tiny doc",                                # < 3 tokens -> 0 grams
            "",
        ]
        return pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

    def _brute(self, df):
        grams = {}
        for did, t in zip(df["doc_id"], df["text"]):
            toks = [w for w in t.split(" ") if w]
            gs = {"\x1f".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            for g in gs:
                grams.setdefault(g, set()).add(did)
        out = []
        for did, t in zip(df["doc_id"], df["text"]):
            toks = [w for w in t.split(" ") if w]
            gs = {"\x1f".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            out.append((did, sum(1 for g in gs if len(grams[g]) >= 2)))
        return pd.DataFrame(out, columns=["doc_id", "n_dup_grams"]).astype(
            {"n_dup_grams": np.int64}
        )

    def test_broadcast_path_matches_brute(self, ray_session):
        df = self._docs()
        got = (
            dd.dup_ngram_density(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, self._brute(df))
        assert got["n_dup_grams"].sum() > 0

    def test_distributed_join_path_matches(self, ray_session, monkeypatch):
        df = self._docs()
        monkeypatch.setattr(dd, "DUP_GRAM_DRIVER_DOCS", 0)
        got = (
            dd.dup_ngram_density(
                rd.from_pandas(df).repartition(3), broadcast_budget=0
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, self._brute(df))


class TestDupSubstringSpan:
    def _docs(self):
        texts = [
            "the quick brown fox jumps over the lazy dog today",
            "a dog saw the quick brown fox jumps over the fence",  # shared 5-run
            "completely unrelated text with no shared grams at all",
            "the quick brown cat sat still",                       # shares only 'the quick brown'
            "tiny doc",
            "",
        ]
        return pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

    def _brute(self, df, n=3):
        grams = {}
        toks_by = {}
        for did, t in zip(df["doc_id"], df["text"]):
            toks = [w for w in t.split(" ") if w]
            toks_by[did] = toks
            for g in {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}:
                grams.setdefault(g, set()).add(did)
        out = []
        for did, toks in toks_by.items():
            best = run = 0
            for i in range(len(toks) - n + 1):
                if len(grams[tuple(toks[i : i + n])]) >= 2:
                    run += 1
                    best = max(best, run + n - 1)
                else:
                    run = 0
            out.append((did, best))
        return pd.DataFrame(out, columns=["doc_id", "max_dup_span"]).astype(
            {"max_dup_span": np.int64}
        )

    def test_broadcast_path_matches_brute(self, ray_session):
        df = self._docs()
        got = (
            dd.dup_substring_span(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = self._brute(df)
        pd.testing.assert_frame_equal(got, exp)
        # doc 0/1 share a 5-token run: span must exceed the 3-gram floor
        assert exp.loc[exp["doc_id"] == 1, "max_dup_span"].iloc[0] >= 5

    def test_distributed_join_path_matches(self, ray_session, monkeypatch):
        df = self._docs()
        monkeypatch.setattr(dd, "DUP_GRAM_DRIVER_DOCS", 0)
        got = (
            dd.dup_substring_span(
                rd.from_pandas(df).repartition(3), broadcast_budget=0
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, self._brute(df))


class TestPqAnn:
    def _vecs(self, n=600, d=24, seed=17):
        rng = np.random.default_rng(seed)
        X = rng.standard_normal((n, d))
        return pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}
        )

    def test_recall_vs_exact(self, ray_session):
        vecs = self._vecs()
        ds = rd.from_pandas(vecs)
        Q = np.stack(vecs["embedding"].iloc[:5].to_numpy())
        exact = knn_mod.cosine_topk(ds, Q, list(range(5)), k=5)
        approx = knn_mod.pq_cosine_ann(
            ds, Q, list(range(5)), k=5, m=8, ksub=32
        )
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        assert len(e & a) / len(e) >= 0.5  # ADC recall floor at m=8/ksub=32

    def test_self_query_top1_is_self_when_included(self, ray_session):
        vecs = self._vecs(n=100, d=16, seed=23)
        ds = rd.from_pandas(vecs)
        Q = np.stack(vecs["embedding"].iloc[:3].to_numpy())
        out = knn_mod.pq_cosine_ann(
            ds, Q, [0, 1, 2], k=1, m=4, ksub=32, exclude_self=False
        )
        top1 = out.groupby("query_id").head(1)
        # quantized self-similarity still dominates random vectors
        assert (top1["neighbor_id"].to_numpy() == top1["query_id"].to_numpy()).all()

    def test_codes_shape_and_compression(self):
        rng = np.random.default_rng(5)
        X = rng.standard_normal((256, 32))
        books = knn_mod.train_pq_codebooks(X, m=4, ksub=16, iters=5, seed=1)
        assert books.shape == (4, 16, 8)
        codes = knn_mod.pq_encode_batch(X, books)
        assert codes.shape == (256, 4) and codes.dtype == np.uint8
        # reconstruction is closer than a random codebook assignment
        recon = np.concatenate(
            [books[j][codes[:, j]] for j in range(4)], axis=1
        )
        err = np.linalg.norm(X - recon, axis=1).mean()
        rand = np.linalg.norm(
            X - np.concatenate(
                [books[j][rng.integers(0, 16, 256)] for j in range(4)], axis=1
            ),
            axis=1,
        ).mean()
        assert err < rand

    def test_determinism_across_partitionings(self, ray_session):
        vecs = self._vecs(n=300, d=16, seed=9)
        Q = np.stack(vecs["embedding"].iloc[:3].to_numpy())
        a = knn_mod.pq_cosine_ann(
            rd.from_pandas(vecs).repartition(2), Q, [0, 1, 2], k=4, m=4
        )
        b = knn_mod.pq_cosine_ann(
            rd.from_pandas(vecs).repartition(7), Q, [0, 1, 2], k=4, m=4
        )
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


class TestWordFreqStats:
    def _docs(self):
        texts = [
            "the cat sat on the mat",
            "the dog sat",
            "unique words only here",
            "",
            "the the the",
        ]
        return pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

    def _brute(self, df):
        from collections import Counter

        cnt = Counter(
            w for t in df["text"] for w in t.split(" ") if w
        )
        rows = []
        for did, t in zip(df["doc_id"], df["text"]):
            toks = [w for w in t.split(" ") if w]
            rows.append(
                (
                    did,
                    len(toks),
                    sum(cnt[w] for w in toks),
                    min((cnt[w] for w in toks), default=0),
                )
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "n_tokens", "sum_freq", "min_freq"]
        ).astype({c: np.int64 for c in ["n_tokens", "sum_freq", "min_freq"]})

    def test_broadcast_path_matches_brute(self, ray_session):
        from fairy_core_ray.stages import text_stages as ts

        df = self._docs()
        got = (
            ts.word_freq_stats(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, self._brute(df))

    def test_distributed_join_path_matches(self, ray_session, monkeypatch):
        from fairy_core_ray.stages import text_stages as ts

        df = self._docs()
        monkeypatch.setattr(ts, "WFS_DRIVER_DOCS", 0)
        got = (
            ts.word_freq_stats(
                rd.from_pandas(df).repartition(3), broadcast_budget=0
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, self._brute(df))


class TestNovelAgainstHistory:
    def _frames(self):
        # history: texts 0..9; batch: 5 dup texts + 5 novel + 1 empty
        hist = pd.DataFrame(
            {
                "doc_id": np.arange(10, dtype=np.int64),
                "text": [f"history doc {i}" for i in range(10)],
            }
        )
        batch = pd.DataFrame(
            {
                "doc_id": np.arange(100, 111, dtype=np.int64),
                "text": [f"history doc {i}" for i in range(5)]
                + [f"fresh doc {i}" for i in range(5)]
                + [""],
            }
        )
        return hist, batch

    def test_small_path_matches_brute(self, ray_session):
        hist, batch = self._frames()
        got = (
            dd.novel_against_history(
                rd.from_pandas(batch).repartition(3),
                rd.from_pandas(hist).repartition(2),
            )
            .to_pandas()["doc_id"]
            .sort_values()
            .to_numpy()
        )
        assert got.tolist() == list(range(105, 111))

    def test_big_path_matches(self, ray_session):
        hist, batch = self._frames()
        got = (
            dd.novel_against_history(
                rd.from_pandas(batch).repartition(3),
                rd.from_pandas(hist).repartition(2),
                broadcast_budget=0,
            )
            .to_pandas()["doc_id"]
            .sort_values()
            .to_numpy()
        )
        assert got.tolist() == list(range(105, 111))

    def test_empty_history_everything_novel(self, ray_session):
        _, batch = self._frames()
        got = dd.novel_against_history(
            rd.from_pandas(batch),
            rd.from_pandas(
                pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype=np.int64),
                        "text": pd.Series([], dtype=str),
                    }
                )
            ),
        ).to_pandas()
        assert len(got) == len(batch)


class TestBestPerClusterSurvivors:
    def test_keeps_best_quality_per_cluster(self, ray_session):
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(8, dtype=np.int64),
                "n_chars": np.array([10, 50, 30, 5, 99, 7, 7, 7], np.int64),
            }
        )
        # clusters: {0,1,2} rep 0 -> best is 1 (50); {5,6,7} rep 5 ->
        # tie on quality 7 -> smallest id 5; 3,4 unclustered
        clusters = pd.DataFrame(
            {"id": [0, 1, 2, 5, 6, 7], "rep": [0, 0, 0, 5, 5, 5]}
        )
        got = (
            dd.best_per_cluster_survivors(
                rd.from_pandas(docs).repartition(3),
                clusters,
                id_col="doc_id",
                quality_col="n_chars",
            )
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        assert got == [1, 3, 4, 5]

    def test_float_quality_not_truncated(self, ray_session):
        # qualities [1.2, 1.9, 1.5]: float argmax is id 1; an int64
        # cast would truncate all to 1 -> tie -> wrongly keep id 0
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "score": np.array([1.2, 1.9, 1.5], np.float64),
            }
        )
        clusters = pd.DataFrame({"id": [0, 1, 2], "rep": [0, 0, 0]})
        got = (
            dd.best_per_cluster_survivors(
                rd.from_pandas(docs).repartition(2),
                clusters,
                id_col="doc_id",
                quality_col="score",
            )
            .to_pandas()["doc_id"]
            .tolist()
        )
        assert got == [1]

    def test_non_numeric_quality_raises(self, ray_session):
        docs = pd.DataFrame(
            {"doc_id": np.arange(2, dtype=np.int64), "score": ["a", "b"]}
        )
        clusters = pd.DataFrame({"id": [0, 1], "rep": [0, 0]})
        with pytest.raises(Exception, match="must be numeric"):
            dd.best_per_cluster_survivors(
                rd.from_pandas(docs),
                clusters,
                id_col="doc_id",
                quality_col="score",
            ).materialize()

    def test_empty_clusters_all_survive(self, ray_session):
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "n_chars": np.ones(4, np.int64),
            }
        )
        got = dd.best_per_cluster_survivors(
            rd.from_pandas(docs),
            pd.DataFrame({"id": [], "rep": []}),
            id_col="doc_id",
            quality_col="n_chars",
        ).to_pandas()
        assert sorted(got["doc_id"].tolist()) == [0, 1, 2, 3]


class TestRemoveDupSubstrings:
    def _docs(self):
        texts = [
            "aa bb cc dd ee xx yy zz",          # shares 5-run aa..ee with doc1
            "pp aa bb cc dd ee qq rr",          # same 5-run mid-doc
            "unrelated words entirely here now",
            "aa bb cc",                          # 3-run only (< min_span 5): kept
            "",
        ]
        return pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

    def test_cuts_long_runs_keeps_short(self, ray_session):
        df = self._docs()
        got = (
            dd.remove_dup_substrings(
                rd.from_pandas(df).repartition(3), n=3, min_span=5
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = {
            0: "xx yy zz",
            1: "pp qq rr",
            2: "unrelated words entirely here now",
            3: "aa bb cc",   # run of 1 dup gram spans 3 < 5 -> kept
            4: "",
        }
        assert dict(zip(got["doc_id"], got["text_clean"])) == want

    def test_no_dups_identity(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(2, dtype=np.int64),
                "text": ["one two three four", "five six seven eight"],
            }
        )
        got = dd.remove_dup_substrings(rd.from_pandas(df)).to_pandas()
        assert sorted(got["text_clean"]) == sorted(df["text"])

    def test_over_budget_fails_loudly(self, ray_session):
        # the removal step has no join fallback: a dup-gram set above
        # the broadcast budget must raise, not OOM the object store
        with pytest.raises(ValueError, match="broadcast budget"):
            dd.remove_dup_substrings(
                rd.from_pandas(self._docs()), broadcast_budget=0
            )
