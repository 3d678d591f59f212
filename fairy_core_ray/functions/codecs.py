"""Deterministic stub image codecs.

STUB NOTICE: real image libraries (Pillow / libjpeg / libwebp) are not
available in this environment, so these codecs are deterministic stand-ins
that preserve the *shape* of the real problem: an opaque ``bytes`` payload
per row, a decode step that can fail on corrupt payloads, a lossless format
("png") and lossy formats ("jpeg", "webp") whose decoded pixels differ from
the originals by a bounded quantization error (so the per-row invariant
"decoded-pixel PSNR >= 40 dB for lossy formats" from BASELINE.json
``input_hint`` is a real, checkable property). Swapping in Pillow later only
changes this module; the Ray-side plumbing (schema, batch size, actor
signature, output layout) is real and tested.

Wire format (little-endian):
    magic[4] = b"FPNG" | b"FJPG" | b"FWBP"
    w: uint16, h: uint16
    payload:
      FPNG: zlib-compressed raw RGB bytes (w*h*3)        -- lossless
      FJPG: zlib-compressed (pixel >> 2) bytes           -- lossy, step-4 quantization
      FWBP: zlib-compressed (pixel >> 2) bytes           -- lossy, step-4 quantization

Reference parity note: fairy-core has no image handling; this implements the
north-rule per-row invariant (BASELINE.json) rather than any reference file.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC_BY_FMT = {"png": b"FPNG", "jpeg": b"FJPG", "webp": b"FWBP"}
FMT_BY_MAGIC = {v: k for k, v in MAGIC_BY_FMT.items()}
LOSSY_FMTS = frozenset({"jpeg", "webp"})
HEADER_LEN = 8

# lossy dequantization to bin centers as a LUT (reconstruction error in
# [-2, 1]); the ONE definition both decode() and the batched validator
# stage use — swapping in a real codec changes only this module
DEQUANT_LUT = np.minimum(np.arange(256, dtype=np.uint16) * 4 + 2, 255).astype(
    np.uint8
)


def parse_header(buf) -> tuple[str | None, int, int]:
    """(fmt, w, h) of a stub payload header; (None, 0, 0) when the
    buffer is shorter than HEADER_LEN or the magic is unknown. Accepts
    bytes or memoryview — the shared header contract for decode() and
    the batch validator."""
    if len(buf) < HEADER_LEN:
        return None, 0, 0
    fmt = FMT_BY_MAGIC.get(bytes(buf[:4]))
    if fmt is None:
        return None, 0, 0
    return (
        fmt,
        int.from_bytes(buf[4:6], "little"),
        int.from_bytes(buf[6:8], "little"),
    )


class DecodeError(ValueError):
    """Raised when a payload is truncated or structurally invalid."""


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array into the stub wire format."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    magic = MAGIC_BY_FMT[fmt]
    if fmt in LOSSY_FMTS:
        body = (pixels >> 2).astype(np.uint8).tobytes()
    else:
        body = pixels.tobytes()
    header = magic + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    return header + zlib.compress(body, level=1)


def decode(payload: bytes) -> tuple[np.ndarray, str]:
    """Decode a stub payload into ((h, w, 3) uint8 pixels, fmt).

    Raises DecodeError on truncation, bad magic, or size mismatch — the
    analogue of a corrupt jpeg.
    """
    fmt, w, h = parse_header(payload)
    if fmt is None:
        if len(payload) < HEADER_LEN:
            raise DecodeError("payload shorter than header")
        raise DecodeError(f"bad magic {payload[:4]!r}")
    try:
        body = zlib.decompress(payload[HEADER_LEN:])
    except zlib.error as exc:  # truncated / corrupted stream
        raise DecodeError(f"zlib: {exc}") from exc
    if len(body) != w * h * 3:
        raise DecodeError(f"size mismatch: {len(body)} != {w}*{h}*3")
    arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
    if fmt in LOSSY_FMTS:
        arr = DEQUANT_LUT[arr]
    return arr, fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
