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

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fairy_core_ray.functions.codecs import (
    DEQUANT_LUT,
    FMT_BY_MAGIC,
    HEADER_LEN,
    LOSSY_FMTS,
    DecodeError,
    decode,
    parse_header,
)

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

    @staticmethod
    def _payload_views(batch: pa.Table):
        """(offsets, data memoryview) of the ``bytes`` column — per-image
        payload access without materializing Python bytes objects
        (to_pylist copies the whole multi-MB binary column per batch)."""
        va = batch["bytes"].combine_chunks()
        if isinstance(va, pa.ChunkedArray):  # older pyarrow returns CA
            va = va.combine_chunks() if va.num_chunks != 1 else va.chunk(0)
        off_dtype = np.int64 if pa.types.is_large_binary(va.type) else np.int32
        raw = np.frombuffer(va.buffers()[1], dtype=off_dtype)
        offs = raw[va.offset : va.offset + len(va) + 1]
        # honor the validity bitmap: a null slot may legally retain a
        # non-empty data extent (take/IPC/concat paths), which equal-
        # offset detection alone would parse as real bytes
        nulls = (
            va.is_null().to_numpy(zero_copy_only=False)
            if va.null_count
            else np.zeros(len(va), dtype=bool)
        )
        return offs, memoryview(va.buffers()[2]), nulls

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        w = batch["w"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        n = len(batch)
        decode_ok = np.zeros(n, dtype=bool)
        dims_match = np.zeros(n, dtype=bool)
        mean_rgb = np.zeros((n, 3), dtype=np.float32)
        content_hash = np.zeros(n, dtype=np.int64)
        if n == 0:
            batch = batch.append_column("ok_decode_ok", pa.array([], pa.bool_()))
            batch = batch.append_column("ok_dims_match", pa.array([], pa.bool_()))
            if self.features and not self.header_only:
                for name, arr in (
                    ("mean_r", mean_rgb[:, 0]), ("mean_g", mean_rgb[:, 1]),
                    ("mean_b", mean_rgb[:, 2]),
                ):
                    batch = batch.append_column(name, pa.array(arr, pa.float32()))
                batch = batch.append_column(
                    "content_hash", pa.array(content_hash, pa.int64())
                )
            return batch
        offs, mv, nulls = self._payload_views(batch)
        # Per-image work is ONLY the unavoidable parts (header parse +
        # zlib — opaque per-payload streams). Bodies group by
        # (byte size, lossy) and every numpy reduction runs once per
        # SIZE CLASS as a zero-intermediate reshape-sum — no per-image
        # numpy dispatch (the old path: 60+ us per 3 KB image, over half
        # the stage's CPU) and no corpus-sized cumsum temporaries (an
        # earlier draft's 100-300 MB/batch of int64 prefix sums thrashed
        # memory bandwidth under 32-way parallelism).
        by_class: dict = {}
        for i in range(n):
            if nulls[i]:
                continue
            s, e = int(offs[i]), int(offs[i + 1])
            fmt, pw, ph = parse_header(mv[s:e])  # shared wire contract
            if fmt is None:
                continue
            if self.header_only:
                decode_ok[i] = True
                dims_match[i] = pw == w[i] and ph == h[i]
                continue
            try:
                body = zlib.decompress(mv[s + HEADER_LEN : e])
            except zlib.error:
                continue
            if len(body) != pw * ph * 3:
                continue
            decode_ok[i] = True
            dims_match[i] = ph == h[i] and pw == w[i]
            if self.features:
                views, owners = by_class.setdefault(
                    (len(body), fmt in self.lossy), ([], [])
                )
                views.append(np.frombuffer(body, dtype=np.uint8))
                owners.append(i)
        if self.features and not self.header_only:
            gold = np.uint64(0x9E3779B97F4A7C15)
            for (sz, lossy), (views, owners) in by_class.items():
                cls = np.concatenate(views)  # (n_cls * sz,) uint8
                if lossy:
                    # dequantize to bin centers in one LUT pass
                    # (identical values to codecs.decode)
                    cls = DEQUANT_LUT[cls]
                own = np.asarray(owners, dtype=np.int64)
                m = len(own)
                # channel means: zero-intermediate reshape-sum (exact —
                # int64 sums of integer pixels, same float64 division)
                sums = cls.reshape(m, sz // 3, 3).sum(axis=1, dtype=np.int64)
                mean_rgb[own] = (sums.astype(np.float64) / (sz // 3)).astype(
                    np.float32
                )
                # content hash: modular-u64 fold per row (sum order is
                # irrelevant mod 2^64, so values match the per-image path)
                w64 = (sz // 8) * 8
                if w64:
                    flat = cls[: m * sz].reshape(m, sz)[:, :w64]
                    u64 = np.ascontiguousarray(flat).view(np.uint64)
                    with np.errstate(over="ignore"):
                        accs = (u64 * gold).sum(axis=1, dtype=np.uint64)
                    content_hash[own] = (accs >> np.uint64(1)).astype(np.int64)
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
