"""Property-based hardening for the ext4 geometric kernels.

These check the mathematical guarantees, not just replay parity:
Douglas–Peucker's defining property (every dropped point lies within
eps of the chord that dropped it — checked via the recursion's own
integer comparison), Morton-code bijectivity, and snap optimality on
random inputs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fairy_core_ray.pipelines.queries_ext4 import (
    _TRAJ_EPS2,
    _Z_BITS,
    _dp_keep,
    _morton,
    _roads,
    _snap_nearest,
)


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(2, 60),
)
def test_dp_dropped_points_within_eps_of_kept_chords(seed, n):
    """DP guarantee: walking consecutive KEPT points as chords, every
    dropped point between them deviates by at most eps (the recursion
    only stops splitting when the interval max deviation ≤ eps)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 10_000, size=n).astype(np.int64)
    py = rng.integers(0, 10_000, size=n).astype(np.int64)
    keep = _dp_keep(px, py)
    assert keep[0] and keep[-1]
    (kept_idx,) = np.nonzero(keep)
    for a, b in zip(kept_idx[:-1], kept_idx[1:]):
        if b - a < 2:
            continue
        dx, dy = px[b] - px[a], py[b] - py[a]
        seg2 = dx * dx + dy * dy
        mx = px[a + 1 : b] - px[a]
        my = py[a + 1 : b] - py[a]
        if seg2 == 0:
            assert ((mx * mx + my * my) <= _TRAJ_EPS2).all()
        else:
            cr = mx * dy - my * dx
            assert ((cr * cr) <= _TRAJ_EPS2 * seg2).all()


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 200))
def test_morton_roundtrip_bijective(seed, n):
    rng = np.random.default_rng(seed)
    gx = rng.integers(0, 1 << _Z_BITS, size=n).astype(np.int64)
    gy = rng.integers(0, 1 << _Z_BITS, size=n).astype(np.int64)
    z = _morton(gx, gy)
    dx = np.zeros_like(gx)
    dy = np.zeros_like(gy)
    for b in range(_Z_BITS):
        dx |= ((z >> (2 * b)) & 1) << b
        dy |= ((z >> (2 * b + 1)) & 1) << b
    assert (dx == gx).all() and (dy == gy).all()


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 64))
def test_snap_nearest_is_optimal_on_random_ids(seed, n):
    """_snap_nearest returns the true (dist2, road_id)-lexicographic
    minimum over all segments for arbitrary event ids."""
    rng = np.random.default_rng(seed)
    eid = rng.integers(0, 10**7, size=n).astype(np.int64)
    r = _roads()
    j, t_off, d2 = _snap_nearest(eid, r)
    px = (eid * 2654435761) % 1_000_000
    py = (eid * 104729 + 12345) % 1_000_000
    for i in range(n):
        best = None
        for k in range(len(r["x0"])):
            dx, dy = px[i] - r["x0"][k], py[i] - r["y0"][k]
            along, perp = (dx, dy) if r["orient"][k] == 0 else (dy, dx)
            t = min(max(int(along), 0), int(r["length"][k]))
            dd = (int(along) - t) ** 2 + int(perp) ** 2
            if best is None or (dd, k) < best:
                best = (dd, k, t)
        assert (int(d2[i]), int(j[i]), int(t_off[i])) == best
