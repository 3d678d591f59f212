"""DecodeValidator edge cases for the Arrow-buffer batch path: chunked
and sliced columns, null/short/corrupt payloads, size-class reductions
equal to the per-image codecs.decode reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fairy_core_ray.functions.codecs import DecodeError, decode, encode
from fairy_core_ray.stages.validate_images import DecodeValidator


def _fixture_table():
    rng = np.random.default_rng(0)
    imgs = [
        encode(rng.integers(0, 256, (4, 5, 3), dtype=np.uint8), "png"),
        None,
        encode(rng.integers(0, 256, (2, 2, 3), dtype=np.uint8), "jpeg"),
        b"short",
        encode(rng.integers(0, 256, (3, 3, 3), dtype=np.uint8), "webp"),
    ]
    t = pa.table(
        {
            "bytes": pa.array(imgs, pa.binary()),
            "w": pa.array([5, 1, 2, 9, 3]),
            "h": pa.array([4, 1, 2, 9, 3]),
        }
    )
    return imgs, t


def _reference_rows(imgs):
    out = []
    for p in imgs:
        if p is None:
            out.append(None)
            continue
        try:
            px, _ = decode(p)
        except DecodeError:
            out.append(None)
            continue
        flat = np.frombuffer(px.tobytes()[: (px.size // 8) * 8], np.uint64)
        with np.errstate(over="ignore"):
            acc = (flat * np.uint64(0x9E3779B97F4A7C15)).sum() if len(flat) else 0
        out.append(
            (
                np.float32(px.reshape(-1, 3)[:, 0].mean()),
                np.int64(np.uint64(acc) >> np.uint64(1)) if len(flat) else 0,
            )
        )
    return out


def _check(table, imgs, offset=0):
    got = DecodeValidator()(table)
    ref = _reference_rows(imgs)[offset : offset + len(table)]
    assert got["ok_decode_ok"].to_pylist() == [r is not None for r in ref]
    for i, r in enumerate(ref):
        if r is None:
            assert got["mean_r"][i].as_py() == 0.0
            assert got["content_hash"][i].as_py() == 0
        else:
            assert got["mean_r"][i].as_py() == r[0]
            assert got["content_hash"][i].as_py() == r[1]


def test_plain_table():
    imgs, t = _fixture_table()
    _check(t, imgs)


def test_chunked_column():
    imgs, t = _fixture_table()
    t2 = pa.concat_tables([t.slice(0, 2), t.slice(2)])
    _check(t2, imgs)


def test_sliced_table():
    imgs, t = _fixture_table()
    _check(t.slice(1, 3), imgs, offset=1)


def test_empty_batch():
    _, t = _fixture_table()
    got = DecodeValidator()(t.slice(0, 0))
    assert len(got) == 0
    for col in ("ok_decode_ok", "ok_dims_match", "mean_r", "content_hash"):
        assert col in got.column_names


def test_header_only_mode():
    imgs, t = _fixture_table()
    got = DecodeValidator(header_only=True)(t)
    assert got["ok_decode_ok"].to_pylist() == [True, False, True, False, True]
    assert "mean_r" not in got.column_names
