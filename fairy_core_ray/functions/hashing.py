"""Deterministic vectorized hashing primitives.

All randomness in this engine is derived from these (seeded, stateless,
numpy-vectorized) so every stage is reproducible across runs, block orders
and cluster sizes — the engine-wide determinism discipline inherited from
the reference (fairy-core sorts/caps everything for byte-stable reports;
see /root/reference/src/fairy/core/services/provenance.py:28-70).
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain algorithm, Steele et al. 2014)."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash_u64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash of an integer array."""
    return splitmix64(x.astype(_U64) ^ splitmix64(np.full(1, seed, dtype=_U64)))


def hash_str_u64(values, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash of an iterable of strings (blake2b, per value).

    Python-loop over values — use only where the column is genuinely
    string-keyed (ids); numeric keys should use hash_u64.
    """
    seed_bytes = seed.to_bytes(8, "little", signed=False)
    out = np.empty(len(values), dtype=_U64)
    for i, v in enumerate(values):
        h = hashlib.blake2b((v or "").encode("utf-8"), digest_size=8, key=seed_bytes)
        out[i] = int.from_bytes(h.digest(), "little")
    return out


def polyhash_str_u64(values, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash of an array of (ASCII-safe) strings, fully
    vectorized AND SQL-derivable: base-31 byte polynomial
    ``sum_j byte_j * 31^j`` over wrapping uint64, splitmix64-finalized
    with the hash_u64 seed fold. Unlike pandas' SipHash this is
    reproducible in DuckDB (pipelines/sketch_sql.py renders it), which
    is what upgrades the simhash sketch from rows-only to a value-level
    oracle. Encoded bytes are laid out as one zero-padded (n, maxlen)
    matrix — padding bytes contribute 0 to the polynomial, so no mask."""
    vals = np.asarray(values, dtype=object)
    if not len(vals):
        return np.empty(0, _U64)
    enc = np.char.encode(vals.astype("U"), "utf-8")
    itemsize = max(enc.dtype.itemsize, 1)
    mat = (
        np.frombuffer(enc.tobytes(), dtype=np.uint8)
        .reshape(len(vals), itemsize)
        .astype(_U64)
    )
    with np.errstate(over="ignore"):
        w = np.multiply.accumulate(
            np.concatenate(
                ([np.uint64(1)], np.full(itemsize - 1, 31, dtype=_U64))
            )
        )
        h = (mat * w[None, :]).sum(axis=1, dtype=_U64)
    return splitmix64(h ^ splitmix64(np.full(1, seed, dtype=_U64)))


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64/int64 array (SWAR, vectorized)."""
    v = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        v = v - ((v >> _U64(1)) & _U64(0x5555555555555555))
        v = (v & _U64(0x3333333333333333)) + ((v >> _U64(2)) & _U64(0x3333333333333333))
        v = (v + (v >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
        v = (v * _U64(0x0101010101010101)) >> _U64(56)
    return v.astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamming distance between two int64/uint64 arrays (broadcasting)."""
    return popcount64(np.bitwise_xor(a.astype(_U64), b.astype(_U64)))


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    """Streaming sha256 of a file — matches the reference's input-hashing
    contract (/root/reference/src/fairy/core/services/provenance.py:39-50)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()
