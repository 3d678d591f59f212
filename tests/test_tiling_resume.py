"""Resumable tiled output: crash mid-shuffle, restart, byte-identical."""

import json
import os
import shutil

import pytest

from fairy_core_ray.pipelines.tiling import MANIFEST_NAME, shard_plan, write_tiled
from fairy_core_ray.sources import synth

N = 4000
SEED = 42


@pytest.fixture(scope="module")
def images_path():
    return synth.ensure_image_dataset(N, seed=SEED)


def shard_files(root):
    return sorted(f for f in os.listdir(root) if f.endswith(".parquet"))


def file_hashes(root):
    from fairy_core_ray.functions.hashing import sha256_file

    return {
        f: sha256_file(os.path.join(root, f)) for f in shard_files(root)
    }


def test_shard_plan_salts_hot_cells():
    plan = shard_plan(200_000, SEED, coarse_res=11, target_rows=10_000)
    assert max(plan.values()) > 1  # hot cluster fans out
    assert min(plan.values()) >= 1


def test_clean_run_then_noop_resume(tmp_path, images_path):
    out = str(tmp_path / "tiles")
    r1 = write_tiled(images_path, out, n_images=N, seed=SEED,
                     coarse_res=11, target_rows=1500, decode=False)
    assert r1["written"] > 0 and r1["skipped"] == 0
    hashes = file_hashes(out)
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    assert len(manifest["shards"]) == r1["written"]
    for rec in manifest["shards"]:
        assert hashes[os.path.basename(rec["path"])] == rec["sha256"]
        assert os.path.isfile(rec["path"].replace(".parquet", ".lineage.json"))
    # resume over a complete output: nothing recomputed
    r2 = write_tiled(images_path, out, n_images=N, seed=SEED,
                     coarse_res=11, target_rows=1500, decode=False)
    assert r2["written"] == 0 and r2["skipped"] == r1["written"]
    assert file_hashes(out) == hashes


def test_crash_and_resume_byte_identical(tmp_path, images_path):
    ref_out = str(tmp_path / "ref")
    write_tiled(images_path, ref_out, n_images=N, seed=SEED,
                coarse_res=11, target_rows=1500, decode=False)
    want = file_hashes(ref_out)

    out = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        write_tiled(images_path, out, n_images=N, seed=SEED,
                    coarse_res=11, target_rows=1500, decode=False,
                    fail_after_shards=2)
    committed = json.load(open(os.path.join(out, MANIFEST_NAME)))["shards"]
    assert len(committed) == 2
    mtimes_before = {
        os.path.basename(r["path"]): os.path.getmtime(r["path"]) for r in committed
    }

    r2 = write_tiled(images_path, out, n_images=N, seed=SEED,
                     coarse_res=11, target_rows=1500, decode=False)
    assert r2["skipped"] == 2
    assert r2["written"] == len(want) - 2
    # committed shards were not recomputed (mtime untouched)
    for name, mt in mtimes_before.items():
        assert os.path.getmtime(os.path.join(out, name)) == mt
    # final output byte-identical to the uninterrupted run
    assert file_hashes(out) == want
