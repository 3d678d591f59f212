"""Generic resumable partitioned Parquet sink.

The specialized flagship version (pipelines/tiling.py — salted
per-cell shards + lineage sidecars) is the full-featured path; this is
the reusable core for ANY dataset and partition key: one directory of
one-file-per-partition output, atomic tmp+rename commits, a completed-
partition manifest, and a restart that skips finished partitions
BEFORE the shuffle (the filter broadcasts the done-key set, so a
resumed run moves only unfinished rows).

Design criterion (task brief): a failed 100 TB run must not redo
finished work — partition commit is atomic per file, the manifest is
rewritten after every commit batch, and re-running with the same
out_root converges.
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

from fairy_core_ray.functions.hashing import sha256_file
from fairy_core_ray.state.manifest import now_utc_iso_z

MANIFEST_NAME = "_completed_partitions.json"

_SAFE_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789._-"
)


def _safe_key(key: str) -> str:
    """Percent-encode a partition key for use in a filename: characters
    outside [A-Za-z0-9._-] (e.g. '/', '\\\\', ':') become %XX of their
    UTF-8 bytes, and a literal '%' is itself encoded — the mapping is
    injective, so two distinct keys can never collide or escape
    out_root. The manifest stores the ORIGINAL key."""
    if all(c in _SAFE_CHARS for c in key):
        return key
    return "".join(
        c if c in _SAFE_CHARS else "".join(f"%{b:02X}" for b in c.encode())
        for c in key
    )


def _load_manifest(out_root: str) -> dict[str, dict]:
    p = os.path.join(out_root, MANIFEST_NAME)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)["partitions"]


def _save_manifest(out_root: str, parts: dict[str, dict]) -> None:
    p = os.path.join(out_root, MANIFEST_NAME)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "schema_version": "completed-partitions/v1",
                "updated_at_utc": now_utc_iso_z(),
                "partitions": parts,
            },
            f,
            indent=2,
            sort_keys=True,
        )
    os.replace(tmp, p)


def write_partitioned_resumable(
    ds: rd.Dataset,
    out_root: str,
    *,
    partition_col: str,
    order_col: str | None = None,
    commit_every: int = 16,
    fail_after: int | None = None,
) -> dict[str, Any]:
    """Write ``ds`` as one Parquet file per ``partition_col`` value
    with skip-on-resume. Returns {written, skipped, manifest_path}.

    ``order_col`` sorts rows inside each partition file (deterministic
    output bytes → stable sha256 across retries); ``commit_every``
    bounds manifest-rewrite frequency; ``fail_after`` injects a crash
    after N partitions commit (restart testing)."""
    os.makedirs(out_root, exist_ok=True)
    done = _load_manifest(out_root)
    done_ref = ray.put(frozenset(done))

    def drop_done(df: pd.DataFrame) -> pd.DataFrame:
        finished = ray.get(done_ref)
        if not finished:
            return df
        keys = df[partition_col].astype(str)
        return df[~keys.isin(finished)]

    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        key = str(g[partition_col].iloc[0])
        if order_col is not None:
            g = g.sort_values(order_col, kind="mergesort")
        g = g.reset_index(drop=True)
        fname = os.path.join(out_root, f"part-{_safe_key(key)}.parquet")
        tmp = fname + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None),
            tmp,
        )
        os.replace(tmp, fname)
        return pd.DataFrame(
            {
                "partition": [key],
                "path": [fname],
                "sha256": [sha256_file(fname)],
                "rows": [np.int64(len(g))],
            }
        )

    out_rows = (
        ds.map_batches(drop_done, batch_format="pandas")
        .groupby(partition_col)
        .map_groups(write_partition, batch_format="pandas")
    )
    written: dict[str, dict] = {}
    merged = dict(done)
    n_committed = 0
    for rec in out_rows.iter_rows():
        written[rec["partition"]] = {
            "path": rec["path"],
            "sha256": rec["sha256"],
            "rows": int(rec["rows"]),
        }
        merged[rec["partition"]] = written[rec["partition"]]
        n_committed += 1
        if n_committed % commit_every == 0:
            _save_manifest(out_root, merged)
        if fail_after is not None and n_committed >= fail_after:
            _save_manifest(out_root, merged)
            raise RuntimeError(f"injected failure after {n_committed} partitions")
    _save_manifest(out_root, merged)
    return {
        "written": len(written),
        "skipped": len(done),
        "manifest_path": os.path.join(out_root, MANIFEST_NAME),
    }
