"""Flagship pipeline: validate → decode → dedup → cell-encode → PIP-join → tile-assign.

The end-to-end recast of fairy-core's preflight (SURVEY.md §7.1) over the
image+caption table: every reference rule is a vectorized ``map_batches``
stage, the cross-table checks become joins, and the spatial stages mandated
by BASELINE.json's north rule follow. Streaming throughout — the only
materialized results are the small aggregates (tile stats, rule counters).

Scale notes (100 TB / 10^12 rows):
* ``bytes`` is projected away immediately after the decode stage, before
  any shuffle (SURVEY.md §7.4 hard part 4).
* Exact dedup is the one full shuffle over row data, keyed by ``phash``;
  "first" is the minimum ``image_id`` in the group, so the result is
  deterministic under any block order (SURVEY.md §7.3).
* Tile stats pre-aggregate per batch (combiner) before the global
  ``groupby`` — the shuffle moves one row per (cell, tile) per batch, not
  per image, which also neutralizes hot-cell skew for the stats path.
  The per-image assignment output is written partitioned by coarse cell
  with explicit salting in pipelines/tiling.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fairy_core_ray.sources.synth import tile_polygons
from fairy_core_ray.stages.geo_stages import PipJoiner, add_cells, add_footprints
from fairy_core_ray.stages.validate_images import (
    DecodeValidator,
    conjunction,
    validate_batch,
)

ASSIGNMENT_COLUMNS = ["image_id", "phash", "cell", "tile_id", "valid"]


def mark_first_per_phash(ds: rd.Dataset, images_path: str) -> rd.Dataset:
    """Keep-first exact-dedup (reference check_dup semantics,
    /root/reference/src/fairy/validation/rulepack_runner.py:359-389,
    keep='first'): within a phash group only the min-image-index row keeps
    ``dup_first = True``; 2nd+ occurrences are flagged duplicates.

    Scale design: instead of shuffling row data through
    ``groupby(phash).map_groups`` (one Python call per group — ruinous for
    mostly-singleton groups), aggregate only the two key columns from a
    *column-pruned re-read of the source* (so the expensive decode stage
    never runs twice) — Ray's hash aggregate combines per block, so the
    shuffle moves one partial row per key per block — keep only keys with
    count > 1 (the duplicated keys, a tiny fraction), and broadcast
    {phash: min_idx} to a vectorized marking pass. At 10^12 rows the
    broadcast side becomes a hash-bucketed semi-join or a Bloom filter
    over duplicated keys (see ray_guide 'Semi / anti join'); the
    aggregate stays as-is.
    """
    from fairy_core_ray.stages.geo_stages import image_index_from_ids

    def add_idx(t: pa.Table) -> pa.Table:
        return t.append_column("img_idx", pa.array(image_index_from_ids(t), pa.int64()))

    ds = ds.map_batches(add_idx, batch_format="pyarrow")
    dup_keys = (
        rd.read_parquet(images_path, columns=["image_id", "phash"])
        .map_batches(add_idx, batch_format="pyarrow")
        .select_columns(["phash", "img_idx"])
        .groupby("phash")
        .aggregate(
            rd.aggregate.Min("img_idx", alias_name="keep_idx"),
            rd.aggregate.Count(alias_name="n"),
        )
    )
    dup_pdf = dup_keys.filter(expr="n > 1").to_pandas()  # only duplicated keys
    order = np.argsort(dup_pdf["phash"].to_numpy()) if len(dup_pdf) else np.array([], int)
    dup_ph = dup_pdf["phash"].to_numpy()[order]
    dup_keep = dup_pdf["keep_idx"].to_numpy()[order]
    keep_ref = ray.put((dup_ph, dup_keep))

    class MarkFirst:
        def __init__(self, ref):
            self.dup_ph, self.dup_keep = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            first = np.ones(len(t), dtype=bool)
            if len(self.dup_ph):
                ph = t["phash"].to_numpy()
                idx = t["img_idx"].to_numpy()
                pos = np.searchsorted(self.dup_ph, ph)
                pos_c = np.minimum(pos, len(self.dup_ph) - 1)
                member = self.dup_ph[pos_c] == ph
                first = ~(member & (idx != self.dup_keep[pos_c]))
            return t.append_column("dup_first", pa.array(first, pa.bool_()))

    return ds.map_batches(
        MarkFirst,
        fn_constructor_kwargs={"ref": keep_ref},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


def validated_images(
    images_path: str,
    *,
    decode: bool = True,
    header_only: bool = False,
    decode_concurrency: int | tuple[int, int] = (1, 8),
    seed: int = 42,
) -> rd.Dataset:
    """read → stateless rules → decode actor pool → drop bytes → valid flag."""
    ds = rd.read_parquet(images_path)
    ds = ds.map_batches(validate_batch, batch_format="pyarrow")
    if decode:
        ds = ds.map_batches(
            DecodeValidator,
            fn_constructor_kwargs={"header_only": header_only},
            batch_format="pyarrow",
            batch_size=1024,  # pixels materialize here; keep batches modest
            concurrency=decode_concurrency,
        )
    ds = ds.map_batches(conjunction, batch_format="pyarrow")
    # project the wide binary column away before any shuffle; drop by name
    # (calling ds.schema() here would trigger a partial pipeline execution)
    return ds.drop_columns(["bytes"])


def flagship(
    images_path: str,
    *,
    decode: bool = True,
    header_only: bool = False,
    dedup: bool = True,
    seed: int = 42,
) -> dict[str, rd.Dataset]:
    """Build the full lazy pipeline; returns the two result Datasets.

    ``assignments``: one row per (image, containing tile) — tile_id null
    for footprints outside every tile (anti-join finding).
    ``tile_stats``: per (cell, tile_id) image counts, sorted desc.
    """
    ds = validated_images(
        images_path, decode=decode, header_only=header_only, seed=seed
    )
    if dedup:
        ds = mark_first_per_phash(ds, images_path)
    else:
        ds = ds.map_batches(
            lambda t: t.append_column("dup_first", pa.array(np.ones(len(t), bool))),
            batch_format="pyarrow",
        )
    ds = ds.map_batches(lambda t: add_footprints(t, seed), batch_format="pyarrow")
    ds = ds.map_batches(add_cells, batch_format="pyarrow")

    polys_ref = ray.put(tile_polygons())
    assignments = ds.map_batches(
        PipJoiner,
        fn_constructor_kwargs={"polys_ref": polys_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).select_columns(ASSIGNMENT_COLUMNS + ["dup_first"])

    partial_schema = pa.schema(
        [("cell", pa.int64()), ("tile_id", pa.string()), ("partial_n", pa.int64())]
    )

    def partial_tile_counts(batch: pa.Table) -> pa.Table:
        """Per-batch combiner: one partial row per (cell, tile)."""
        df = batch.select(["cell", "tile_id", "valid", "dup_first"]).to_pandas()
        df = df[df["valid"] & df["dup_first"] & df["tile_id"].notna()]
        out = (
            df.groupby(["cell", "tile_id"], sort=False)
            .size()
            .rename("partial_n")
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(partial_schema)

    tile_stats = (
        assignments.map_batches(partial_tile_counts, batch_format="pyarrow")
        .groupby(["cell", "tile_id"])
        .aggregate(rd.aggregate.Sum("partial_n", alias_name="n_images"))
        .sort("n_images", descending=True)
    )
    return {"assignments": assignments, "tile_stats": tile_stats}
