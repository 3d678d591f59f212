"""Generic resumable partitioned sink (sources/sinks.py)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from fairy_core_ray.sources.sinks import (
    _load_manifest,
    write_partitioned_resumable,
)


def _df(n=300, nparts=10):
    rng = np.random.default_rng(11)
    return pd.DataFrame(
        {
            "k": rng.integers(0, nparts, n).astype(np.int64),
            "row_id": np.arange(n, dtype=np.int64),
            "v": rng.standard_normal(n),
        }
    )


class TestResumableSink:
    def test_write_all_then_noop_resume(self, ray_session, tmp_path):
        df = _df()
        out = str(tmp_path / "o")
        r1 = write_partitioned_resumable(
            rd.from_pandas(df).repartition(4),
            out,
            partition_col="k",
            order_col="row_id",
        )
        assert r1["written"] == df["k"].nunique() and r1["skipped"] == 0
        got = pd.concat(
            [pq.read_table(p).to_pandas() for p in glob.glob(f"{out}/part-*.parquet")],
            ignore_index=True,
        )
        pd.testing.assert_frame_equal(
            got.sort_values("row_id").reset_index(drop=True),
            df.sort_values("row_id").reset_index(drop=True),
            check_like=True,
        )
        # resume on a complete output writes nothing
        r2 = write_partitioned_resumable(
            rd.from_pandas(df), out, partition_col="k", order_col="row_id"
        )
        assert r2["written"] == 0 and r2["skipped"] == df["k"].nunique()

    def test_crash_then_resume_converges(self, ray_session, tmp_path):
        df = _df()
        out = str(tmp_path / "o")
        with pytest.raises(RuntimeError, match="injected failure"):
            write_partitioned_resumable(
                rd.from_pandas(df).repartition(4),
                out,
                partition_col="k",
                order_col="row_id",
                commit_every=1,
                fail_after=3,
            )
        done_before = set(_load_manifest(out))
        assert len(done_before) == 3
        # record committed bytes: resume must not rewrite them
        hashes_before = {
            k: v["sha256"] for k, v in _load_manifest(out).items()
        }
        r = write_partitioned_resumable(
            rd.from_pandas(df).repartition(4),
            out,
            partition_col="k",
            order_col="row_id",
        )
        assert r["skipped"] == 3
        assert r["written"] == df["k"].nunique() - 3
        after = _load_manifest(out)
        assert set(after) == set(str(k) for k in sorted(df["k"].unique()))
        for k, h in hashes_before.items():
            assert after[k]["sha256"] == h  # untouched on resume
        got = pd.concat(
            [pq.read_table(p).to_pandas() for p in glob.glob(f"{out}/part-*.parquet")],
            ignore_index=True,
        )
        # every input row exactly once
        assert sorted(got["row_id"]) == sorted(df["row_id"])

    def test_deterministic_bytes(self, ray_session, tmp_path):
        df = _df(120, 4)
        o1, o2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_partitioned_resumable(
            rd.from_pandas(df).repartition(3), o1,
            partition_col="k", order_col="row_id",
        )
        write_partitioned_resumable(
            rd.from_pandas(df).repartition(7), o2,
            partition_col="k", order_col="row_id",
        )
        m1, m2 = _load_manifest(o1), _load_manifest(o2)
        assert {k: v["sha256"] for k, v in m1.items()} == {
            k: v["sha256"] for k, v in m2.items()
        }

    def test_hostile_partition_keys_sanitized(self, ray_session, tmp_path):
        # keys with '/', '..', '%' must neither escape out_root nor
        # collide; the manifest keeps the ORIGINAL key
        df = pd.DataFrame(
            {
                "k": ["a/b", "a%2Fb", "../evil", "ok-1"],
                "row_id": np.arange(4, dtype=np.int64),
            }
        )
        out = str(tmp_path / "o")
        r = write_partitioned_resumable(
            rd.from_pandas(df), out, partition_col="k", order_col="row_id"
        )
        assert r["written"] == 4
        files = sorted(
            os.path.basename(p) for p in glob.glob(f"{out}/part-*.parquet")
        )
        assert len(files) == 4 and len(set(files)) == 4
        # nothing written outside out_root
        assert not (tmp_path / "evil").exists()
        assert all("/" not in f and "%2F" != f for f in files)
        man = _load_manifest(out)
        assert set(man) == set(df["k"])
        for v in man.values():
            assert os.path.dirname(v["path"]) == out
        # resume skips everything by original key
        r2 = write_partitioned_resumable(
            rd.from_pandas(df), out, partition_col="k", order_col="row_id"
        )
        assert r2["written"] == 0 and r2["skipped"] == 4
