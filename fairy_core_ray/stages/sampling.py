"""Mixture-weighted corpus sampling — training-data mixture assembly.

The reference has no sampling surface (its scope is validation:
/root/reference/src/fairy/core/rulepack_runner.py); these are the
large-scale-pipeline additions the brief mandates. Design notes:

* All gates are DETERMINISTIC multiplicative-hash thresholds on the row
  id — no RNG state, so a sample is reproducible across reruns, shards,
  cluster sizes and resumed partitions (same invariant as
  queries_ext.q_stratified_sample).
* Rates are derived from per-source counts with integer-exact rational
  comparisons (h * count < need * M) — no float rounding, so a SQL
  oracle reproduces the selection bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

HASH_MULT = 2654435761
HASH_MOD = 1000003  # prime: h in [0, HASH_MOD)


def _gate_hash(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """(id + salt) * HASH_MULT % HASH_MOD computed in uint64 — the
    multiply wraps mod 2^64 instead of silently wrapping SIGNED int64
    (whose numpy modulo diverges from DuckDB BIGINT semantics for ids
    above ~3.46e9, i.e. exactly the 10^12-row regime this module
    targets). SQL oracles mirror the wrap with
    ``% 18446744073709551616`` in HUGEINT (see queries_ext2
    MIX_SOURCES_SQL / HASH_SPLIT_SQL / MIX_EPOCHS_SQL)."""
    u = ids.astype(np.int64, copy=False).view(np.uint64)
    h = ((u + np.uint64(salt)) * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
    return h.astype(np.int64)  # < HASH_MOD: exact in int64


def mixture_keep_thresholds(
    counts: dict[str, int], weights: dict[str, int]
) -> dict[str, tuple[int, int]]:
    """Per-source exact keep fraction need_s / count_s for the LARGEST
    mixture matching integer ``weights`` with no upsampling: the
    bottleneck source is taken whole (rate 1) and every other source
    downsamples to its weighted share. K = min_s floor(count_s / w_s),
    need_s = w_s * K. Returns {source: (need, count)}; sources absent
    from ``weights`` get need 0 (dropped)."""
    k = min(
        (c // weights[s] for s, c in counts.items() if weights.get(s)),
        default=0,
    )
    return {
        s: (min(weights.get(s, 0) * k, c), c) for s, c in counts.items()
    }


def mix_sources(
    ds: rd.Dataset,
    weights,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> rd.Dataset:
    """Weighted mixture downsampling (Pile/Dolma-style mixture
    assembly): keep a deterministic per-source subset so surviving
    counts follow ``weights`` as closely as exact hash-thresholding
    allows, never duplicating a row. Two streaming passes, no shuffle:

    1. per-source counts — per-batch value_counts partials, driver fold
       (sources are few; the fold is O(sources), not O(rows));
    2. per-batch Arrow filter with the integer-exact gate
       ``h(id) * count_s < need_s * HASH_MOD``.

    At 100 TB both passes stream with backpressure; the rate table is a
    tiny closure constant (not re-shipped per batch — it rides the
    serialized UDF once per worker process)."""

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[source_col].value_counts()
        return pd.DataFrame(
            {source_col: out.index, "n": out.to_numpy(np.int64)}
        )

    parts = ds.select_columns([source_col]).map_batches(
        cnt_partial, batch_format="pandas"
    )
    folded: dict[str, int] = {}
    for b in parts.iter_batches(batch_format="pandas"):
        for s, v in zip(b[source_col], b["n"]):
            folded[s] = folded.get(s, 0) + int(v)
    if callable(weights):  # weight rule applied to the observed sources
        weights = {s: int(weights(s)) for s in folded}
    thr = mixture_keep_thresholds(folded, weights)

    def gate(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.int64)
        h = _gate_hash(ids)
        src = t[source_col].to_pandas()
        need = src.map({s: v[0] for s, v in thr.items()}).fillna(0)
        cnt = src.map({s: v[1] for s, v in thr.items()}).fillna(1)
        keep = h * cnt.to_numpy(np.int64) < need.to_numpy(np.int64) * HASH_MOD
        return t.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow")


def hash_split(
    ds: rd.Dataset,
    *,
    permille: int = 10,
    id_col: str = "doc_id",
    salt: int = 0x9E3779B9,
) -> rd.Dataset:
    """Deterministic train/eval split tag: adds ``split`` =
    'eval' for the ~permille/1000 of rows whose salted id hash gates
    low, else 'train'. Pure per-batch map — the assignment is stable
    under resharding/rerun, the invariant eval-split assembly needs so
    later decontamination can rely on membership not drifting."""

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.int64)
        h = _gate_hash(ids, salt) % 1000
        return t.append_column(
            "split",
            pa.array(np.where(h < permille, "eval", "train")),
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def mixture_epoch_plan(
    counts: dict[str, int],
    weights: dict[str, int],
    total: int,
    *,
    max_epochs: int = 4,
) -> dict[str, tuple[int, int, int]]:
    """Epoch-aware mixture plan (UniMax-flavored): split ``total``
    output rows across sources by integer ``weights`` (largest-
    remainder apportionment — deterministic, sums exactly to total
    when feasible), then satisfy each source's share with whole-corpus
    epochs plus a hash-gated remainder, capping repetition at
    ``max_epochs`` passes. Returns {source: (epochs, rem_need, count)}:
    every row of the source appears ``epochs`` times, plus once more
    for rows whose hash gates below rem_need/count."""
    wsum = sum(weights.get(s, 0) for s in counts)
    if wsum == 0:
        return {s: (0, 0, c) for s, c in counts.items()}
    shares = {
        s: (weights.get(s, 0) * total) // wsum for s in sorted(counts)
    }
    # largest-remainder: hand leftover rows to the largest fractional
    # parts, ties by source name (deterministic)
    rem = total - sum(shares.values())
    fracs = sorted(
        ((weights.get(s, 0) * total) % wsum, s)
        for s in sorted(counts)
    )
    for _, s in reversed(fracs):
        if rem <= 0:
            break
        shares[s] += 1
        rem -= 1
    plan = {}
    for s, c in counts.items():
        want = min(shares.get(s, 0), max_epochs * c)
        plan[s] = (want // c if c else 0, want % c if c else 0, c)
    return plan


def mix_sources_epochs(
    ds: rd.Dataset,
    weights,
    total: int,
    *,
    max_epochs: int = 4,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> rd.Dataset:
    """Mixture assembly WITH bounded upsampling: emit each source's
    rows ``epochs`` times (an ``epoch`` column 0..e-1 distinguishes
    copies) plus a deterministic hash-gated remainder pass, per
    ``mixture_epoch_plan``. This is the UniMax-style shape for
    under-represented sources — repetition capped at ``max_epochs`` so
    a tiny source can't dominate by duplication. Same two streaming
    passes as ``mix_sources`` (count fold + per-batch gate), zero
    shuffle; the copy fan-out is np.repeat inside the batch."""

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[source_col].value_counts()
        return pd.DataFrame(
            {source_col: out.index, "n": out.to_numpy(np.int64)}
        )

    parts = ds.select_columns([source_col]).map_batches(
        cnt_partial, batch_format="pandas"
    )
    folded: dict[str, int] = {}
    for b in parts.iter_batches(batch_format="pandas"):
        for s, v in zip(b[source_col], b["n"]):
            folded[s] = folded.get(s, 0) + int(v)
    if callable(weights):
        weights = {s: int(weights(s)) for s in folded}
    plan = mixture_epoch_plan(folded, weights, total, max_epochs=max_epochs)

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        src = df[source_col].astype(str)
        ep = src.map({s: v[0] for s, v in plan.items()}).fillna(0).to_numpy(np.int64)
        need = src.map({s: v[1] for s, v in plan.items()}).fillna(0).to_numpy(np.int64)
        cnt = src.map({s: v[2] for s, v in plan.items()}).fillna(1).to_numpy(np.int64)
        h = _gate_hash(ids)
        reps = ep + (h * cnt < need * HASH_MOD)
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        epoch = np.arange(len(idx), dtype=np.int64) - starts
        return pd.DataFrame(
            {
                id_col: ids[idx],
                source_col: src.to_numpy()[idx],
                "epoch": epoch,
            }
        )

    return ds.map_batches(fanout, batch_format="pandas")
