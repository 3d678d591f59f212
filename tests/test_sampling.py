"""Mixture sampling / split-tag stage tests (stages/sampling.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from fairy_core_ray.stages.sampling import (
    HASH_MOD,
    HASH_MULT,
    hash_split,
    mix_sources,
    mixture_keep_thresholds,
)


class TestMixtureThresholds:
    def test_bottleneck_taken_whole(self):
        thr = mixture_keep_thresholds(
            {"a": 100, "b": 1000}, {"a": 1, "b": 1}
        )
        # a is the bottleneck: K=100, need_a=100 (all), need_b=100
        assert thr == {"a": (100, 100), "b": (100, 1000)}

    def test_weighted_shares(self):
        thr = mixture_keep_thresholds(
            {"a": 300, "b": 1000}, {"a": 1, "b": 3}
        )
        # K = min(300//1, 1000//3) = 300 -> need a=300, b=900
        assert thr == {"a": (300, 300), "b": (900, 1000)}

    def test_unweighted_source_dropped(self):
        thr = mixture_keep_thresholds({"a": 10, "x": 50}, {"a": 2})
        assert thr["x"] == (0, 50)

    def test_empty_weights(self):
        assert mixture_keep_thresholds({"a": 10}, {}) == {"a": (0, 10)}


class TestMixSources:
    def _ds(self):
        rng = np.random.default_rng(7)
        n = 3000
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2]),
            }
        )

    def test_mixture_matches_weights(self, ray_session):
        df = self._ds()
        out = mix_sources(
            rd.from_pandas(df).repartition(4), {"a": 1, "b": 1, "c": 1}
        ).to_pandas()
        counts = out["source"].value_counts()
        # equal weights: every source within hash-gate tolerance of the
        # bottleneck count (c ~ 600)
        lo, hi = 0.85 * counts.min(), 1.15 * counts.min()
        assert all(lo <= c <= hi for c in counts), counts.to_dict()
        # never upsample, never invent rows
        assert out["doc_id"].is_unique
        assert set(out["doc_id"]).issubset(set(df["doc_id"]))

    def test_deterministic_across_partitionings(self, ray_session):
        df = self._ds()
        a = mix_sources(rd.from_pandas(df).repartition(2), {"a": 2, "b": 1, "c": 1})
        b = mix_sources(rd.from_pandas(df).repartition(7), {"a": 2, "b": 1, "c": 1})
        pa_ = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pb_ = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(pa_, pb_)

    def test_callable_weights(self, ray_session):
        df = self._ds()
        out = mix_sources(
            rd.from_pandas(df).repartition(3), lambda s: 1
        ).to_pandas()
        assert len(out) > 0


class TestHashSplit:
    def test_tag_fraction_and_determinism(self, ray_session):
        df = pd.DataFrame({"doc_id": np.arange(20000, dtype=np.int64)})
        out = hash_split(
            rd.from_pandas(df).repartition(5), permille=100
        ).to_pandas()
        frac = (out["split"] == "eval").mean()
        assert 0.08 < frac < 0.12
        # stable under resharding
        out2 = hash_split(rd.from_pandas(df), permille=100).to_pandas()
        m1 = out.sort_values("doc_id")["split"].to_numpy()
        m2 = out2.sort_values("doc_id")["split"].to_numpy()
        assert (m1 == m2).all()


class TestGateHashWrap:
    def test_uint64_wrap_matches_duckdb_hugeint(self):
        # ids above ~3.46e9 overflow id*HASH_MULT in int64; the gate
        # computes in uint64 and the SQL oracles mirror the wrap with
        # % 2^64 in HUGEINT — bit-exact at the claimed 10^12-row scale
        import duckdb

        from fairy_core_ray.stages.sampling import _gate_hash

        ids = np.array(
            [0, 1, 12345, 3_460_000_000, 4_000_000_000, 10**12, 2**62, 2**63 - 1],
            dtype=np.int64,
        )
        vals = ",".join(str(i) for i in ids)
        sql_mix = duckdb.sql(
            "SELECT ((CAST(i AS HUGEINT) * 2654435761) % 18446744073709551616)"
            f" % 1000003 AS h FROM (SELECT unnest([{vals}]) AS i)"
        ).fetchnumpy()["h"].astype(np.int64)
        assert (_gate_hash(ids) == sql_mix).all()
        salt = 0x9E3779B9
        sql_split = duckdb.sql(
            f"SELECT ((((CAST(i AS HUGEINT) + {salt}) % 18446744073709551616)"
            " * 2654435761) % 18446744073709551616) % 1000003 % 1000 AS h"
            f" FROM (SELECT unnest([{vals}]) AS i)"
        ).fetchnumpy()["h"].astype(np.int64)
        assert (_gate_hash(ids, salt) % 1000 == sql_split).all()


class TestMixEpochs:
    def test_plan_apportionment_exact(self):
        from fairy_core_ray.stages.sampling import mixture_epoch_plan

        plan = mixture_epoch_plan(
            {"a": 100, "b": 100}, {"a": 3, "b": 1}, total=400
        )
        # a: share 300 -> 3 epochs, 0 rem; b: share 100 -> 1 epoch
        assert plan == {"a": (3, 0, 100), "b": (1, 0, 100)}

    def test_plan_remainder_and_cap(self):
        from fairy_core_ray.stages.sampling import mixture_epoch_plan

        plan = mixture_epoch_plan(
            {"a": 10, "b": 1000}, {"a": 1, "b": 1}, total=500, max_epochs=4
        )
        # a share 250 capped at 4*10=40 -> 4 epochs, 0 rem
        assert plan["a"] == (4, 0, 10)
        # b share 250 -> 0 epochs, 250 hash-gated
        assert plan["b"] == (0, 250, 1000)

    def test_fanout_counts_and_epochs(self, ray_session):
        from fairy_core_ray.stages.sampling import mix_sources_epochs

        df = pd.DataFrame(
            {
                "doc_id": np.arange(200, dtype=np.int64),
                "source": np.where(np.arange(200) < 40, "a", "b"),
            }
        )
        out = mix_sources_epochs(
            rd.from_pandas(df).repartition(4),
            {"a": 1, "b": 1},
            total=300,
            max_epochs=3,
        ).to_pandas()
        # a (40 rows, share 150 capped at 120): exactly 3 epochs each
        a = out[out["source"] == "a"]
        assert len(a) == 120
        assert a.groupby("doc_id")["epoch"].max().eq(2).all()
        # b (160 rows, share 150): 0 full epochs + ~150 gated singles
        b = out[out["source"] == "b"]
        assert (b["epoch"] == 0).all()
        assert 120 <= len(b) <= 180  # hash-gate tolerance around 150
        # copies are distinguishable and deterministic
        out2 = mix_sources_epochs(
            rd.from_pandas(df).repartition(9),
            {"a": 1, "b": 1},
            total=300,
            max_epochs=3,
        ).to_pandas()
        k = ["doc_id", "epoch"]
        pd.testing.assert_frame_equal(
            out.sort_values(k).reset_index(drop=True),
            out2.sort_values(k).reset_index(drop=True),
        )
