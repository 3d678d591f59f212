"""Multimodal payload stages: decode → resize / thumbnail features.

The image libs are absent, so decode uses the stub codec
(functions/codecs.py) — but the resize kernel is REAL (vectorized
nearest-neighbor in numpy) and the Ray-side plumbing (actor-style stage,
small batches for pixel memory, binary in → features out) is exactly
what a production multimodal pipeline runs. Audio/video analogues
(frame sampling, waveform windows) would slot in as sibling stages with
the same shape; their codecs are stubbed behind DecodeError.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fairy_core_ray.functions.codecs import DecodeError, decode


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 array — vectorized
    index gather, no loops."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return pixels[ys[:, None], xs[None, :]]


class ThumbnailStage:
    """Actor-pool stage: decode payloads, resize to a fixed thumbnail,
    emit per-image thumbnail features (mean/std per channel).

    Run with small ``batch_size`` — this is the only stage after decode
    that rematerializes pixels."""

    def __init__(self, thumb_h: int = 8, thumb_w: int = 8):
        self.th, self.tw = thumb_h, thumb_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ok = np.zeros(n, dtype=bool)
        means = np.zeros((n, 3), dtype=np.float64)
        stds = np.zeros((n, 3), dtype=np.float64)
        for i, payload in enumerate(batch["bytes"].to_pylist()):
            if payload is None:
                continue
            try:
                pix, _ = decode(payload)
            except DecodeError:
                continue
            thumb = resize_nearest(pix, self.th, self.tw).astype(np.float64)
            ok[i] = True
            means[i] = thumb.reshape(-1, 3).mean(axis=0)
            stds[i] = thumb.reshape(-1, 3).std(axis=0)
        out = batch.select(["image_id"])
        out = out.append_column("thumb_ok", pa.array(ok, pa.bool_()))
        for j, name in enumerate(("thumb_mean_r", "thumb_mean_g", "thumb_mean_b")):
            out = out.append_column(name, pa.array(np.round(means[:, j], 4), pa.float64()))
        for j, name in enumerate(("thumb_std_r", "thumb_std_g", "thumb_std_b")):
            out = out.append_column(name, pa.array(np.round(stds[:, j], 4), pa.float64()))
        return out
