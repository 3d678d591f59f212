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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fairy_core_ray.sources.synth import tile_polygons
from fairy_core_ray.stages.geo_stages import (
    PipJoiner,
    add_cells,
    add_footprints,
    image_index_from_ids,
)
from fairy_core_ray.stages.validate_images import ValidateDecodeStage

ASSIGNMENT_COLUMNS = ["image_id", "phash", "cell", "tile_id", "valid"]


# Above this row count the dup-key scan switches from a driver-side numpy
# pass (two int64 columns) to the distributed groupby aggregate — the
# same strategy switch a real cluster deployment would make on the
# broadcast side of a semi-join. The scan is overlapped with the
# pipeline ramp via _BroadcastOnce, so the driver path costs no serial
# wall time at bench scale.
DRIVER_DEDUP_MAX_ROWS = 50_000_000


def _dup_keys(images_path: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted duplicated phashes, keep-img_idx per key). Keys with a
    single occurrence are dropped — the broadcast side stays tiny.

    Fast path: an ingest-time sidecar index (``_phash_dups.idx``,
    written by the corpus writer) loads in milliseconds; otherwise scan
    the key columns (driver numpy below the threshold, distributed
    aggregate above)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq2

    sidecar = os.path.join(images_path, "_phash_dups.idx")
    if os.path.isfile(sidecar):
        t = pq2.read_table(sidecar)
        return t["phash"].to_numpy(), t["keep_idx"].to_numpy()

    pds = pads.dataset(images_path, format="parquet")
    if pds.count_rows() <= DRIVER_DEDUP_MAX_ROWS:
        t = pds.to_table(columns=["image_id", "phash"])
        from fairy_core_ray.stages.geo_stages import image_index_from_ids

        idx = image_index_from_ids(t)
        ph = t["phash"].to_numpy()
        order = np.lexsort((idx, ph))
        ph_s, idx_s = ph[order], idx[order]
        # group boundaries over the sorted keys
        starts = np.flatnonzero(np.r_[True, ph_s[1:] != ph_s[:-1]])
        counts = np.diff(np.r_[starts, len(ph_s)])
        dup = counts > 1
        return ph_s[starts[dup]], idx_s[starts[dup]]  # idx_s sorted within group

    from fairy_core_ray.stages.geo_stages import image_index_from_ids

    def add_idx(t: pa.Table) -> pa.Table:
        return t.append_column("img_idx", pa.array(image_index_from_ids(t), pa.int64()))

    dup_pdf = (
        rd.read_parquet(images_path, columns=["image_id", "phash"])
        .map_batches(add_idx, batch_format="pyarrow")
        .select_columns(["phash", "img_idx"])
        .groupby("phash")
        .aggregate(
            rd.aggregate.Min("img_idx", alias_name="keep_idx"),
            rd.aggregate.Count(alias_name="n"),
        )
        .filter(expr="n > 1")
        .to_pandas()
    )
    if "phash" not in dup_pdf.columns or not len(dup_pdf):
        return np.array([], np.int64), np.array([], np.int64)
    order = np.argsort(dup_pdf["phash"].to_numpy())
    return dup_pdf["phash"].to_numpy()[order], dup_pdf["keep_idx"].to_numpy()[order]


def _sidecar_exists(images_path: str) -> bool:
    return os.path.isfile(os.path.join(images_path, "_phash_dups.idx"))


def _total_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _decode_pool() -> int:
    """Fixed-size decode pool: 5/8 of the CPUs. Fixed (min==max) because
    autoscaling ramp costs more than idle actors on short runs; the
    remainder is left for the read/write tasks and the geo pool so no
    stage starves (summed pool sizes stay well under the CPU count)."""
    return max(2, _total_cpus() * 5 // 8)


def _geo_pool() -> int:
    """Geo/PIP pool: ~1/4 of CPUs; with the vectorized PIP fast path the
    stage is ~2 µs/row, so even a 1-actor pool (tiny sessions) keeps up.
    Floor of 1 keeps decode+geo strictly under the CPU count — a summed
    fixed-pool demand equal to the CPUs deadlocks the read stage."""
    return max(1, _total_cpus() // 4)


# Max dup keys shipped as ONE broadcast object. Above this, the sorted
# key array is range-partitioned into bucket objects: workers hold only
# the tiny bucket-boundary array plus zero-copy plasma views of the
# buckets a batch actually touches, so per-worker heap stays bounded
# and the object store can spill cold buckets under adversarial dup
# rates (the 10^12-row concern from SURVEY.md §7.3).
BROADCAST_KEY_BUDGET = int(os.environ.get("FAIRY_BROADCAST_KEY_BUDGET", 20_000_000))


def _publish_dup_keys(keys: tuple[np.ndarray, np.ndarray]):
    """(sorted phashes, keep idx) -> broadcastable structure."""
    ph, keep = keys
    if len(ph) <= BROADCAST_KEY_BUDGET:
        return ("flat", ray.put((ph, keep)))
    n_buckets = -(-len(ph) // BROADCAST_KEY_BUDGET)
    bounds, refs = [], []
    for i in range(n_buckets):
        s = i * len(ph) // n_buckets
        e = (i + 1) * len(ph) // n_buckets
        bounds.append(ph[s])
        refs.append(ray.put((ph[s:e], keep[s:e])))
    return ("bucketed", np.asarray(bounds, dtype=np.int64), refs)


class _DupMarker:
    """Keep-first marking against the published dup-key structure."""

    def __init__(self, published):
        self.kind = published[0]
        if self.kind == "flat":
            self.ph, self.keep = ray.get(published[1])
        else:
            _, self.bounds, self.refs = published
            self._cache: dict[int, tuple] = {}  # zero-copy plasma views

    def _bucket(self, i: int):
        got = self._cache.get(i)
        if got is None:
            got = self._cache[i] = ray.get(self.refs[i])
        return got

    def first_mask(self, ph: np.ndarray, idx: np.ndarray) -> np.ndarray:
        first = np.ones(len(ph), dtype=bool)
        if self.kind == "flat":
            if len(self.ph):
                pos = np.minimum(np.searchsorted(self.ph, ph), len(self.ph) - 1)
                member = self.ph[pos] == ph
                first = ~(member & (idx != self.keep[pos]))
            return first
        bidx = np.clip(np.searchsorted(self.bounds, ph, side="right") - 1, 0, None)
        for b in np.unique(bidx):
            sel = bidx == b
            bph, bkeep = self._bucket(int(b))
            if not len(bph):
                continue
            sub = ph[sel]
            pos = np.minimum(np.searchsorted(bph, sub), len(bph) - 1)
            member = bph[pos] == sub
            first[sel] = ~(member & (idx[sel] != bkeep[pos]))
        return first


@ray.remote(num_cpus=0)
class _BroadcastOnce:
    """One-shot broadcast cell: lets a driver thread publish a value
    (e.g. the dup-key arrays) while the pipeline's upstream stages are
    already streaming; consumers await ``get`` until it's published.

    Async actor on purpose: any number of pending ``get`` calls await
    the event without occupying concurrency slots — a threaded actor
    with N blocking getters deadlocks the ``put`` once N reaches the
    actor's max_concurrency (seen live with 8 fused read tasks)."""

    def __init__(self):
        import asyncio

        self._evt = asyncio.Event()
        self._val = None

    async def put(self, v):
        self._val = v
        self._evt.set()

    async def get(self):
        await self._evt.wait()
        return self._val


class GeoAssignStage:
    """Fused actor stage: keep-first dup marking (broadcast dup-key
    arrays), footprint derivation, cell encoding, and the PIP join with
    a per-actor spatial index — one operator over payload-free blocks.

    The dup-key and polygon small sides are ``ray.put`` once on the
    driver and fetched once per actor in ``__init__`` (never re-shipped
    per batch)."""

    def __init__(self, keep_ref, polys_ref, seed: int = 42):
        if isinstance(keep_ref, ray.actor.ActorHandle):
            published = ray.get(keep_ref.get.remote())
        else:
            published = ray.get(keep_ref)
        if isinstance(published, BaseException):
            # the dup-key publisher failed; surface its error here instead
            # of silently proceeding without dedup
            raise RuntimeError("dup-key scan failed") from published
        self.marker = _DupMarker(published)
        self.pip = PipJoiner(polys_ref)
        self.seed = seed

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = image_index_from_ids(t)
        first = self.marker.first_mask(t["phash"].to_numpy(), idx)
        t = t.append_column("dup_first", pa.array(first, pa.bool_()))
        t = add_footprints(t, self.seed)
        t = add_cells(t)
        t = self.pip(t)
        keep = ASSIGNMENT_COLUMNS + ["dup_first"] + [
            c
            for c in ("mean_r", "mean_g", "mean_b", "content_hash")
            if c in t.column_names
        ]
        return t.select(keep)


# Per-worker-process stage cache: task-based stages get the same
# init-once amortization as actor pools (Ray reuses worker processes),
# while staying FUSIBLE with the read stage — the fused
# ReadParquet->decode task never puts payload bytes into the object
# store, which is otherwise a non-scaling serial floor (~1-2 GB/s
# through plasma regardless of CPU count).
_STAGE_CACHE: dict = {}


def _cached_stage(key, factory):
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE[key] = factory()
    return st


def validated_images(
    images_path: str,
    *,
    decode: bool = True,
    header_only: bool = False,
    decode_concurrency: int | tuple[int, int] | None = None,
    use_actor_pool: bool = False,
    seed: int = 42,
) -> rd.Dataset:
    """read → fused [rules + decode + valid + drop bytes] stage.

    Default: a task-based stage that FUSES with the parquet read — the
    wide binary column never crosses an operator boundary. The actor-pool
    variant (``use_actor_pool=True``) exists for codecs with expensive
    per-actor setup that must pin resources; with fusion-compatible
    per-process caching the task form is strictly better here.

    The read passes an explicit schema (one footer inspection) so
    read_parquet skips its all-files schema-unification/sampling pass —
    measured ~1-7 s of serial driver time on a multi-hundred-file corpus."""
    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(images_path, format="parquet").schema
        ds = rd.read_parquet(images_path, schema=schema)
    except Exception:
        ds = rd.read_parquet(images_path)
    if use_actor_pool:
        return ds.map_batches(
            ValidateDecodeStage,
            fn_constructor_kwargs={"decode": decode, "header_only": header_only},
            batch_format="pyarrow",
            batch_size=2048,  # pixels materialize here; keep batches modest
            concurrency=decode_concurrency or _decode_pool(),
            zero_copy_batch=True,
        )

    def run(batch: pa.Table) -> pa.Table:
        stage = _cached_stage(
            ("vd", decode, header_only),
            lambda: ValidateDecodeStage(decode=decode, header_only=header_only),
        )
        return stage(batch)

    return ds.map_batches(
        run, batch_format="pyarrow", zero_copy_batch=True
    )


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
    if not dedup or _sidecar_exists(images_path):
        # fast path: the ingest-time dup index (or no dedup) loads in
        # milliseconds — plain ray.put, no broadcast actor spawn (an
        # actor process costs ~0.5 s of fixed ramp per job)
        keys = (
            _dup_keys(images_path)
            if dedup
            else (np.array([], np.int64), np.array([], np.int64))
        )
        bc = ray.put(_publish_dup_keys(keys))
        return _assemble(ds, bc, seed)
    # slow path: the dup-key scan runs in a driver thread, published
    # through a broadcast actor — it overlaps with the read/decode ramp
    # instead of serially preceding the pipeline
    bc = _BroadcastOnce.remote()

    def _publish():
        # ALWAYS publish — an unpublished cell would block every
        # GeoAssignStage.__init__ forever; on failure publish the
        # exception itself and GeoAssignStage re-raises it
        try:
            keys = (
                _dup_keys(images_path)
                if dedup
                else (np.array([], np.int64), np.array([], np.int64))
            )
        except BaseException as e:  # noqa: BLE001
            bc.put.remote(e)
            return
        bc.put.remote(_publish_dup_keys(keys))

    import threading

    threading.Thread(target=_publish, daemon=True).start()
    return _assemble(ds, bc, seed)


def _assemble(ds: rd.Dataset, bc, seed: int) -> dict[str, rd.Dataset]:
    """Attach the geo stage + tile-stats aggregate to a validated stream.
    ``bc`` is either a plain object ref or a _BroadcastOnce handle."""
    polys_ref = ray.put(tile_polygons())
    bc_key = bc._actor_id.hex() if isinstance(bc, ray.actor.ActorHandle) else bc.hex()

    def geo_run(batch: pa.Table) -> pa.Table:
        # per-process cached (broadcast sides fetched once per worker);
        # task form fuses with the decode stage upstream
        stage = _cached_stage(
            ("geo", bc_key, polys_ref.hex(), seed),
            lambda: GeoAssignStage(bc, polys_ref, seed=seed),
        )
        return stage(batch)

    assignments = ds.map_batches(
        geo_run, batch_format="pyarrow", zero_copy_batch=True
    )

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


# Below this row count the stats fold runs as a direct multi-threaded
# Arrow scan on the driver — no second Ray job, no executor ramp (the
# ramp was a fixed ~5 s that capped measured scaling efficiency). Above
# it, a per-batch-combined distributed aggregate (one row per
# (cell, tile) per block crosses the shuffle).
DRIVER_STATS_MAX_ROWS = 50_000_000


def tile_stats_from_assignments(assignments_path: str) -> rd.Dataset:
    """Tile stats recomputed from a written assignments parquet — lets a
    consumer that already wrote assignments avoid re-executing the whole
    pipeline for the stats aggregate."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    cols = ["cell", "tile_id", "valid", "dup_first"]
    pds = pads.dataset(assignments_path, format="parquet")
    if pds.count_rows() <= DRIVER_STATS_MAX_ROWS:
        t = pds.to_table(
            columns=["cell", "tile_id"],
            filter=(
                pc.field("valid") & pc.field("dup_first") & ~pc.field("tile_id").is_null()
            ),
        )
        g = t.group_by(["cell", "tile_id"]).aggregate([([], "count_all")])
        merged = (
            g.rename_columns(["cell", "tile_id", "n_images"])
            .to_pandas()
            .sort_values("n_images", ascending=False, kind="mergesort")
            .reset_index(drop=True)
        )
        return rd.from_pandas(merged)

    partial_schema = pa.schema(
        [("cell", pa.int64()), ("tile_id", pa.string()), ("partial_n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["valid"] & df["dup_first"] & df["tile_id"].notna()]
        out = (
            df.groupby(["cell", "tile_id"], sort=False)
            .size()
            .rename("partial_n")
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(partial_schema)

    return (
        rd.read_parquet(assignments_path, columns=cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["cell", "tile_id"])
        .aggregate(rd.aggregate.Sum("partial_n", alias_name="n_images"))
        .sort("n_images", descending=True)
    )
