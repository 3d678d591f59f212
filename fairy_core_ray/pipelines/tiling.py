"""Resumable tiled output: salted per-cell shards + completed-cell manifest.

Implements the north rule's checkpoint/resume contract (BASELINE.json):

* the per-image assignment stream is shuffled by an explicit shard key
  ``(coarse_cell, salt)`` — coarse_cell is the cell's ancestor at a
  configurable resolution; ``salt = img_idx % k_cell`` splits hot cells,
  with ``k_cell`` sized from a pre-count so every shard lands near the
  target row count (explicit skew handling; SURVEY.md §4.2);
* each shard is written atomically (tmp file + rename), sorted by
  image_id (byte-identical output regardless of block order), together
  with a per-shard lineage JSON (inputs, counts, output sha256 — the
  "one JSON per Arrow partition" north-star artifact);
* a completed-shard manifest records finished shards; a restarted run
  anti-joins pending shards against it and recomputes ONLY missing
  shards, producing byte-identical final output.

The reference has no equivalent (single process, no checkpointing —
SURVEY.md §4.1); the manifest/lineage shapes extend its manifest v1
(state/manifest.py).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from fairy_core_ray.functions.geo import DEFAULT_RES, cell_parent, encode_cells
from fairy_core_ray.functions.hashing import sha256_file
from fairy_core_ray.pipelines.flagship import flagship
from fairy_core_ray.sources.synth import footprints_for
from fairy_core_ray.state.manifest import now_utc_iso_z

MANIFEST_NAME = "_completed_shards.json"

_SALT_BITS = 16  # shard key = (compact_coarse_cell << 16) | salt


def _compact_cell(cell: np.ndarray, res: int) -> np.ndarray:
    """Compact (ix, iy) packing of a res-``res`` cell: fits in 2*res bits
    (cell ids themselves carry ``res`` in bits 58+, so they can't be
    shifted left without overflow)."""
    cell = np.asarray(cell, np.int64)
    ix = (cell >> np.int64(29)) & np.int64((1 << 29) - 1)
    iy = cell & np.int64((1 << 29) - 1)
    return (ix << np.int64(res)) | iy


def _shard_key(coarse_cell: np.ndarray, salt: np.ndarray, res: int) -> np.ndarray:
    """Vectorized int64 shard key — shuffling ints beats per-row f-strings."""
    return (_compact_cell(coarse_cell, res) << np.int64(_SALT_BITS)) | np.asarray(
        salt, np.int64
    )


def _shard_name(key: int, res: int) -> str:
    """Human-readable shard id (filename / manifest key): 'c<cell>-s<salt>'."""
    salt = key & ((1 << _SALT_BITS) - 1)
    compact = key >> _SALT_BITS
    ix, iy = compact >> res, compact & ((1 << res) - 1)
    cell = (res << 58) | (ix << 29) | iy
    return f"c{cell}-s{salt}"


def _shard_key_from_name(name: str, res: int) -> int:
    cell_s, salt_s = name[1:].split("-s")
    return int(_shard_key(np.array([int(cell_s)]), np.array([int(salt_s)]), res)[0])


def shard_plan(
    n_images: int, seed: int, coarse_res: int, target_rows: int
) -> dict[int, int]:
    """{coarse_cell: k_salt} — salt fan-out per coarse cell from a
    pre-count of footprints (pure function of row index, so the count
    costs no input I/O; at >50M rows run the same formula as a
    distributed groupby count instead)."""
    idx = np.arange(n_images, dtype=np.int64)
    lon, lat = footprints_for(idx, seed)
    coarse = cell_parent(encode_cells(lon, lat, DEFAULT_RES), coarse_res)
    cells, counts = np.unique(coarse, return_counts=True)
    return {
        int(c): max(1, int(np.ceil(cnt / target_rows)))
        for c, cnt in zip(cells, counts)
    }


def _load_manifest(out_root: str) -> dict[str, dict]:
    path = os.path.join(out_root, MANIFEST_NAME)
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return {rec["shard"]: rec for rec in json.load(f)["shards"]}


def _save_manifest(out_root: str, records: dict[str, dict]) -> None:
    path = os.path.join(out_root, MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"schema_version": "completed-shards/v1",
             "shards": sorted(records.values(), key=lambda r: r["shard"])},
            f,
            indent=2,
            sort_keys=True,
        )
    os.replace(tmp, path)


def write_tiled(
    images_path: str,
    out_root: str,
    *,
    n_images: int | None = None,
    seed: int = 42,
    coarse_res: int = 9,
    target_rows: int = 250_000,
    decode: bool = True,
    fail_after_shards: int | None = None,
) -> dict[str, Any]:
    """Run the flagship pipeline and write resumable tiled output.

    Returns {written, skipped, manifest_path}. ``fail_after_shards``
    injects a mid-shuffle crash after N shards commit (restart testing).
    """
    os.makedirs(out_root, exist_ok=True)
    if n_images is None:
        import pyarrow.dataset as pads

        n_images = pads.dataset(images_path, format="parquet").count_rows()
    plan = shard_plan(n_images, seed, coarse_res, target_rows)
    # plan as sorted parallel arrays: vectorized searchsorted lookup
    plan_cells = np.array(sorted(plan), dtype=np.int64)
    plan_k = np.array([plan[int(c)] for c in plan_cells], dtype=np.int64)
    plan_ref = ray.put((plan_cells, plan_k))
    done = _load_manifest(out_root)
    done_keys = np.sort(
        np.array([_shard_key_from_name(s, coarse_res) for s in done], np.int64)
    )
    done_ref = ray.put(done_keys)

    assignments = flagship(images_path, decode=decode, seed=seed)["assignments"]

    def add_shard_key(t: pa.Table) -> pa.Table:
        pc, pk = ray.get(plan_ref)
        finished = ray.get(done_ref)
        from fairy_core_ray.stages.geo_stages import image_index_from_ids

        coarse = cell_parent(t["cell"].to_numpy(), coarse_res)
        idx = image_index_from_ids(t)  # vectorized Arrow parse of image_id
        if len(pc):
            pos = np.minimum(np.searchsorted(pc, coarse), len(pc) - 1)
            ks = np.where(pc[pos] == coarse, pk[pos], 1)
        else:
            ks = np.ones(len(coarse), np.int64)
        shard = _shard_key(coarse, idx % ks, coarse_res)
        t = t.append_column("shard", pa.array(shard, pa.int64()))
        # resume: drop rows of already-committed shards before the shuffle
        return t.filter(pa.array(~np.isin(shard, finished), pa.bool_()))

    keyed = assignments.map_batches(add_shard_key, batch_format="pyarrow")

    inputs_meta = [{"path": str(images_path), "rows": int(n_images)}]
    inputs_ref = ray.put(inputs_meta)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = _shard_name(int(g["shard"].iloc[0]), coarse_res)
        g = g.drop(columns=["shard"]).sort_values("image_id").reset_index(drop=True)
        fname = os.path.join(out_root, f"{shard}.parquet")
        tmp = fname + ".tmp"
        tbl = pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)
        pq.write_table(tbl, tmp)
        os.replace(tmp, fname)
        digest = sha256_file(fname)
        lineage = {
            "schema_version": "lineage/v1",
            "partition_id": shard,
            "created_at_utc": now_utc_iso_z(),
            "inputs": ray.get(inputs_ref),
            "output": {"path": fname, "sha256": digest},
            "counts": {
                "rows": int(len(g)),
                "valid": int(g["valid"].sum()),
                "dup_first": int(g["dup_first"].sum()),
                "unmatched": int(g["tile_id"].isna().sum()),
            },
        }
        ltmp = os.path.join(out_root, f"{shard}.lineage.json.tmp")
        with open(ltmp, "w") as f:
            json.dump(lineage, f, indent=2, sort_keys=True)
        os.replace(ltmp, os.path.join(out_root, f"{shard}.lineage.json"))
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [fname],
                "sha256": [digest],
                "rows": [len(g)],
            }
        )

    shard_rows = keyed.groupby("shard").map_groups(write_shard, batch_format="pandas")
    written: dict[str, dict] = {}
    n_committed = 0
    for rec in shard_rows.iter_rows():
        written[rec["shard"]] = {
            "shard": rec["shard"],
            "path": rec["path"],
            "sha256": rec["sha256"],
            "rows": int(rec["rows"]),
        }
        n_committed += 1
        if fail_after_shards is not None and n_committed >= fail_after_shards:
            # commit what finished, then simulate the crash mid-shuffle
            merged = dict(done)
            merged.update(written)
            _save_manifest(out_root, merged)
            raise RuntimeError(f"injected failure after {n_committed} shards")
    merged = dict(done)
    merged.update(written)
    _save_manifest(out_root, merged)
    return {
        "written": len(written),
        "skipped": len(done),
        "manifest_path": os.path.join(out_root, MANIFEST_NAME),
    }
