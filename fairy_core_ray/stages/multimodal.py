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


def sample_frame_indices(n_frames: np.ndarray, k: int) -> list[np.ndarray]:
    """Uniform frame sampling: k indices over [0, n) per row (all frames
    when n <= k). Deterministic — floor-spaced like ffmpeg's fps filter."""
    out = []
    for n in np.asarray(n_frames, dtype=np.int64):
        n = max(int(n), 0)
        if n == 0:
            out.append(np.empty(0, np.int64))
        elif n <= k:
            out.append(np.arange(n, dtype=np.int64))
        else:
            out.append((np.arange(k, dtype=np.int64) * n) // k)
    return out


class FrameSampleStage:
    """Actor-pool stage: video payload → one row per SAMPLED frame with
    per-frame features (the flat-map shape of a frame-extraction stage).

    No video codec exists in this sandbox, so frame decode is a
    clearly-marked deterministic fake (splitmix64 of payload-hash +
    frame index → synthetic mean RGB); the Ray-side plumbing — explode
    rows per frame inside map_batches, per-actor params in __init__,
    small batches because frames rematerialize — is the real contract a
    production stage keeps when ffmpeg/PyAV is swapped in."""

    def __init__(self, frames_per_video: int = 4):
        self.k = frames_per_video

    def _fake_frame_features(self, payload: bytes, idx: np.ndarray) -> np.ndarray:
        import hashlib

        from fairy_core_ray.functions.hashing import splitmix64

        # deterministic across processes (python hash() is salted)
        base = np.uint64(
            int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        )
        h = splitmix64(idx.astype(np.uint64) ^ base)
        # three channels from one hash — stand-in for a decoded frame's means
        return np.stack(
            [
                (h & np.uint64(0xFF)).astype(np.float64),
                ((h >> np.uint64(8)) & np.uint64(0xFF)).astype(np.float64),
                ((h >> np.uint64(16)) & np.uint64(0xFF)).astype(np.float64),
            ],
            axis=1,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["video_id"].to_pylist()
        n_frames = batch["n_frames"].to_numpy()
        payloads = batch["bytes"].to_pylist()
        sampled = sample_frame_indices(n_frames, self.k)
        out_vid: list = []
        idx_parts: list[np.ndarray] = []
        feat_parts: list[np.ndarray] = []
        for vid, payload, idx in zip(vids, payloads, sampled):
            if payload is None or not len(idx):
                continue
            out_vid.extend([vid] * len(idx))
            idx_parts.append(idx)
            feat_parts.append(self._fake_frame_features(payload, idx))
        if not idx_parts:
            return pa.table(
                {
                    "video_id": pa.array([], pa.string()),
                    "frame_idx": pa.array([], pa.int64()),
                    "frame_mean_r": pa.array([], pa.float64()),
                    "frame_mean_g": pa.array([], pa.float64()),
                    "frame_mean_b": pa.array([], pa.float64()),
                }
            )
        feats = np.concatenate(feat_parts)
        return pa.table(
            {
                "video_id": pa.array(out_vid, pa.string()),
                "frame_idx": pa.array(np.concatenate(idx_parts), pa.int64()),
                "frame_mean_r": pa.array(feats[:, 0], pa.float64()),
                "frame_mean_g": pa.array(feats[:, 1], pa.float64()),
                "frame_mean_b": pa.array(feats[:, 2], pa.float64()),
            }
        )


class AudioWindowStage:
    """Actor-pool stage: PCM16 audio payload → per-window RMS +
    zero-crossing-rate features (REAL decode — PCM needs no codec:
    np.frombuffer(int16), then vectorized window reductions).

    One output row per (audio_id, window); window length in samples is
    fixed per actor. The same shape carries a real resampler or a
    spectrogram kernel."""

    def __init__(self, window: int = 1024):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        out_id: list = []
        win_idx: list[np.ndarray] = []
        rms: list[np.ndarray] = []
        zcr: list[np.ndarray] = []
        for aid, payload in zip(ids, payloads):
            if payload is None or len(payload) < 2:
                continue
            pcm = np.frombuffer(payload[: len(payload) - (len(payload) % 2)], dtype="<i2")
            n_win = len(pcm) // self.window
            if n_win == 0:
                continue
            w = pcm[: n_win * self.window].reshape(n_win, self.window).astype(np.float64)
            out_id.extend([aid] * n_win)
            win_idx.append(np.arange(n_win, dtype=np.int64))
            rms.append(np.sqrt((w * w).mean(axis=1)))
            signs = np.signbit(w)
            zcr.append((signs[:, 1:] != signs[:, :-1]).mean(axis=1))
        if not win_idx:
            return pa.table(
                {
                    "audio_id": pa.array([], pa.string()),
                    "window_idx": pa.array([], pa.int64()),
                    "rms": pa.array([], pa.float64()),
                    "zcr": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "audio_id": pa.array(out_id, pa.string()),
                "window_idx": pa.array(np.concatenate(win_idx), pa.int64()),
                "rms": pa.array(np.concatenate(rms), pa.float64()),
                "zcr": pa.array(np.concatenate(zcr), pa.float64()),
            }
        )
