"""Geospatial pipeline stages: footprint derivation, cell encoding, PIP join.

These are the stages BASELINE.json's north rule adds beyond the reference's
vocabulary: batched H3/S2-style cell encoding of image-derived footprints and
a point-in-polygon join against the tile-boundary polygon set, run as an
actor pool holding a per-worker spatial index (the STRtree role;
functions/geo.py GridIndex). The unmatched side of the PIP join is the
spatial analogue of the reference's id_crosscheck anti-join finding
(/root/reference/src/fairy/core/validators/rna.py:160-211): a footprint in
no tile is a FAIL-grade finding, emitted with ``tile_id = null``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from fairy_core_ray.functions.geo import DEFAULT_RES, GridIndex, encode_cells
from fairy_core_ray.sources.synth import footprints_for


def image_index_from_ids(batch: pa.Table) -> np.ndarray:
    """Recover the int row index from image_id ('img-%012d') vectorized."""
    return pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 99), pa.int64()).to_numpy()


def add_footprints(batch: pa.Table, seed: int = 42) -> pa.Table:
    """Append lon/lat derived deterministically from image_id."""
    idx = image_index_from_ids(batch)
    lon, lat = footprints_for(idx, seed)
    return batch.append_column("lon", pa.array(lon, pa.float64())).append_column(
        "lat", pa.array(lat, pa.float64())
    )


def add_cells(batch: pa.Table, res: int = DEFAULT_RES) -> pa.Table:
    """Append the hierarchical cell id (stateless, vectorized)."""
    cells = encode_cells(batch["lon"].to_numpy(), batch["lat"].to_numpy(), res)
    return batch.append_column("cell", pa.array(cells, pa.int64()))


def _pip_join_batch(batch: pa.Table, index: GridIndex, tile_ids: np.ndarray) -> pa.Table:
    """Shared PIP-join body: one output row per (point, containing
    polygon) pair; points in no polygon emit one row with
    ``tile_id = null`` (anti-join finding)."""
    px = batch["lon"].to_numpy()
    py = batch["lat"].to_numpy()
    pt_idx, poly_idx = index.query_batch(px, py)
    n = len(batch)
    matched_mask = np.zeros(n, dtype=bool)
    matched_mask[pt_idx] = True
    unmatched = np.flatnonzero(~matched_mask)
    take_idx = np.concatenate([pt_idx, unmatched])
    tile_vals = np.concatenate(
        [tile_ids[poly_idx], np.full(len(unmatched), None, dtype=object)]
    )
    out = batch.take(pa.array(take_idx, pa.int64()))
    return out.append_column("tile_id", pa.array(tile_vals, pa.string()))


def _build_pip_state(polys_ref, nx: int, ny: int) -> tuple[GridIndex, np.ndarray]:
    polys = ray.get(polys_ref) if not isinstance(polys_ref, list) else polys_ref
    index = GridIndex(polys, nx=nx, ny=ny)
    return index, np.array([p[0] for p in index.polys], dtype=object)


class PipJoiner:
    """Actor-pool PIP join stage.

    The polygon set is broadcast once via ``ray.put`` on the driver; each
    actor builds its GridIndex once in ``__init__`` (the STRtree pattern —
    SURVEY.md §2.10).
    """

    def __init__(self, polys_ref, nx: int = 64, ny: int = 64):
        self.index, self.tile_ids = _build_pip_state(polys_ref, nx, ny)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _pip_join_batch(batch, self.index, self.tile_ids)


# per-worker-process index cache for the task-pool form (keyed by the
# broadcast ref so successive queries with different polygon sets never
# collide; one build per worker process, like the flagship decode cache)
_PIP_STATE_CACHE: dict = {}


def make_pip_join_fn(polys_ref, nx: int = 64, ny: int = 64):
    """Task-pool PIP join: identical output to ``PipJoiner`` but as a
    plain ``map_batches`` function with a per-process index cache —
    reuses Ray's already-warm task workers instead of paying an
    actor-pool spawn (~2 s fixed per query at 32 CPUs) and scales to
    every free CPU instead of a fixed pool size. Use the actor form
    when the stage holds per-actor mutable state beyond the index."""
    if hasattr(polys_ref, "hex"):
        ref_key = polys_ref.hex()  # ObjectRef ids are globally unique
    else:
        # plain list: key by CONTENT, not id() — a freed list's address
        # can be reused, which would silently serve a stale index
        import hashlib

        ref_key = hashlib.sha256(repr(polys_ref).encode()).hexdigest()
    key = (ref_key, nx, ny)

    def pip_join(batch: pa.Table) -> pa.Table:
        st = _PIP_STATE_CACHE.get(key)
        if st is None:
            if len(_PIP_STATE_CACHE) >= 16:  # bound per-worker memory
                _PIP_STATE_CACHE.pop(next(iter(_PIP_STATE_CACHE)))
            st = _PIP_STATE_CACHE[key] = _build_pip_state(polys_ref, nx, ny)
        return _pip_join_batch(batch, st[0], st[1])

    return pip_join
