"""Flagship image-table validation stages.

Recasts fairy-core's rule vocabulary (SURVEY.md §2.2; reference
/root/reference/src/fairy/validation/rulepack_runner.py) as vectorized
``map_batches`` stages over the image+caption table:

* ``required`` / ``non_empty_trimmed`` (rulepack_runner.py:601-725) →
  ``caption`` null-or-blank check,
* ``enum`` (rulepack_runner.py:435-471; NaN counts as a violation) →
  ``fmt`` membership in {jpeg, png, webp},
* ``range`` (rulepack_runner.py:474-519) → byte/dimension sanity
  ``w > 0``, ``h > 0``, ``len(bytes) > 0``,
* ``regex`` forbidden-pattern mode (rulepack_runner.py:728-823) →
  control characters in ``caption``.

Each rule becomes one boolean column ``ok_<rule>`` appended zero-copy to
the Arrow batch; downstream stages aggregate the bools into report
counters and filter on the conjunction. No Python row loop; pure
pyarrow.compute kernels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from fairy_core_ray.functions.codecs import FMT_BY_MAGIC, LOSSY_FMTS, DecodeError, decode

FMT_ALLOWED = ("jpeg", "png", "webp")
CTRL_CHAR_REGEX = r"[\t\r\n\x00-\x1f\x7f]"

# rule id -> ok-column, mirroring the reference's rule-id-keyed results
STATELESS_RULES = (
    "caption_nonempty",
    "caption_no_ctrl",
    "fmt_enum",
    "dims_positive",
    "bytes_nonempty",
)
DECODE_RULES = ("decode_ok", "dims_match")
ALL_RULES = STATELESS_RULES + DECODE_RULES


def _not_blank(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
    return pc.and_(pc.is_valid(col), pc.not_equal(trimmed, ""))


def validate_batch(batch: pa.Table) -> pa.Table:
    """Stateless rule stage: appends one bool column per rule."""
    caption = batch["caption"]
    ok_caption = _not_blank(caption)
    ok_ctrl = pc.invert(
        pc.fill_null(pc.match_substring_regex(caption, CTRL_CHAR_REGEX), False)
    )
    ok_fmt = pc.fill_null(pc.is_in(batch["fmt"], value_set=pa.array(FMT_ALLOWED)), False)
    ok_dims = pc.and_(
        pc.fill_null(pc.greater(batch["w"], 0), False),
        pc.fill_null(pc.greater(batch["h"], 0), False),
    )
    ok_bytes = pc.fill_null(pc.greater(pc.binary_length(batch["bytes"]), 0), False)
    for name, col in zip(
        STATELESS_RULES, (ok_caption, ok_ctrl, ok_fmt, ok_dims, ok_bytes)
    ):
        batch = batch.append_column(f"ok_{name}", col)
    return batch


class DecodeValidator:
    """Actor-pool stage: decode payloads, verify structural integrity and
    declared-dimension consistency.

    The only stage that materializes pixels — run it with a small
    ``batch_size`` and before ``bytes`` is projected away. Decode is
    inherently per-payload (opaque binary), so the loop over rows here is
    the batched-inference pattern, not a row-loop smell; the codec itself
    is the stub in functions/codecs.py.
    """

    def __init__(self, header_only: bool = False, features: bool = True):
        # Real codecs would be loaded here once per actor (Pillow import,
        # decoder contexts). header_only skips full pixel decode and
        # checks magic + declared dims only — the cheap screening mode.
        # features=True also emits per-image channel means and a
        # pixel-derived content hash (the multimodal feature-extraction
        # stage every training pipeline runs on decode output).
        self.header_only = header_only
        self.features = features
        self.fmt_by_magic = FMT_BY_MAGIC
        self.lossy = LOSSY_FMTS

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payloads = batch["bytes"].to_pylist()
        w = batch["w"].to_pylist()
        h = batch["h"].to_pylist()
        n = len(payloads)
        decode_ok = [False] * n
        dims_match = [False] * n
        mean_rgb = np.zeros((n, 3), dtype=np.float32)
        content_hash = np.zeros(n, dtype=np.int64)
        for i, payload in enumerate(payloads):
            if payload is None:
                continue
            if self.header_only:
                if len(payload) >= 8 and payload[:4] in self.fmt_by_magic:
                    decode_ok[i] = True
                    pw = int.from_bytes(payload[4:6], "little")
                    ph = int.from_bytes(payload[6:8], "little")
                    dims_match[i] = pw == w[i] and ph == h[i]
                continue
            try:
                pixels, _fmt = decode(payload)
            except DecodeError:
                continue
            decode_ok[i] = True
            dims_match[i] = pixels.shape[0] == h[i] and pixels.shape[1] == w[i]
            if self.features:
                mean_rgb[i] = pixels.reshape(-1, 3).mean(axis=0)
                # 64-bit content hash over the pixel buffer (xxhash-style
                # chunked fold, vectorized) — feeds near-dup verification
                flat = np.frombuffer(
                    pixels.tobytes()[: (pixels.size // 8) * 8], dtype=np.uint64
                )
                if len(flat):
                    with np.errstate(over="ignore"):
                        acc = (flat * np.uint64(0x9E3779B97F4A7C15)).sum()
                    content_hash[i] = np.int64(acc >> np.uint64(1))
        batch = batch.append_column("ok_decode_ok", pa.array(decode_ok, pa.bool_()))
        batch = batch.append_column("ok_dims_match", pa.array(dims_match, pa.bool_()))
        if self.features and not self.header_only:
            batch = batch.append_column(
                "mean_r", pa.array(mean_rgb[:, 0], pa.float32())
            ).append_column(
                "mean_g", pa.array(mean_rgb[:, 1], pa.float32())
            ).append_column(
                "mean_b", pa.array(mean_rgb[:, 2], pa.float32())
            ).append_column("content_hash", pa.array(content_hash, pa.int64()))
        return batch


class ValidateDecodeStage:
    """Fused actor stage: stateless rules + decode + valid conjunction +
    ``bytes`` projection in ONE operator, so the wide binary column
    crosses exactly one operator boundary (read → this stage) and never
    enters the object store again (SURVEY.md §7.4 hard part 4)."""

    def __init__(self, decode: bool = True, header_only: bool = False,
                 drop_bytes: bool = True):
        self.decoder = DecodeValidator(header_only) if decode else None
        self.drop_bytes = drop_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = validate_batch(batch)
        if self.decoder is not None:
            batch = self.decoder(batch)
        batch = conjunction(batch)
        if self.drop_bytes:
            batch = batch.drop(["bytes"])
        return batch


def conjunction(batch: pa.Table, rules=ALL_RULES) -> pa.Table:
    """Append ``valid`` = AND of all present ok_<rule> columns."""
    acc = None
    for r in rules:
        col = f"ok_{r}"
        if col in batch.column_names:
            acc = batch[col] if acc is None else pc.and_(acc, batch[col])
    return batch.append_column(
        "valid", acc if acc is not None else pa.array([True] * len(batch))
    )
