"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Extends the reference's exact-dup vocabulary (check_dup / check_unique,
/root/reference/src/fairy/validation/rulepack_runner.py:359-421,
keep='first') with the near-dedup family a 100 TB training-data pipeline
needs. Shared scale pattern:

  1. per-batch vectorized sketching (map_batches — shingles, minhash
     signatures, simhash bits, hyperplane signs);
  2. explode to (bucket_key, doc_id) rows and ``groupby(bucket_key)`` —
     the only shuffle, and it moves sketches, not documents;
  3. candidate pairs within small buckets; oversized buckets are
     skipped with a logged count (hot-key guard);
  4. verification joins candidate doc_ids back to content via a
     broadcast id-set filter (the candidate set is tiny vs the corpus).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fairy_core_ray.functions.hashing import hamming64, hash_u64, splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# Exact dedup (generic keep-first)
# ---------------------------------------------------------------------------



def _fold_counts(ds_partials, keys: list[str]) -> pd.DataFrame:
    """Per-batch partial counts + driver fold. The partial stream is one
    row per distinct key per batch — for sketch/posting tables this is
    orders of magnitude smaller than a Ray sort-based groupby's shuffle,
    which measured ~40 s on an 80k-row string-keyed table."""
    frames = [
        b for b in ds_partials.iter_batches(batch_size=None, batch_format="pandas")
    ]
    if not frames:
        return pd.DataFrame({k: [] for k in keys} | {"n": []})
    allp = pd.concat(frames, ignore_index=True)
    if allp.empty:
        return pd.DataFrame({k: [] for k in keys} | {"n": []})
    return allp.groupby(keys, sort=False)["n"].sum().reset_index()


def md5_hex(texts: pd.Series) -> pd.Series:
    return texts.fillna("").astype(str).map(
        lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
    )


def keep_first(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], pa.Array],
    order_col: str,
) -> rd.Dataset:
    """Generic keep-first exact dedup: append ``dup_first`` (True for the
    min-``order_col`` row of each key group). Aggregates (key, order)
    only; broadcasts the duplicated-key map (SURVEY.md §7.3; at 10^12
    rows swap the broadcast for a hash-bucketed semi-join)."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"key": key_fn(t), "ord": t[order_col]})

    agg = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            rd.aggregate.Min("ord", alias_name="keep_ord"),
            rd.aggregate.Count(alias_name="n"),
        )
    )
    dup = agg.filter(expr="n > 1").to_pandas()
    dup_keys = (
        dict(zip(dup["key"].tolist(), dup["keep_ord"].tolist()))
        if "key" in dup.columns
        else {}
    )
    ref = ray.put(dup_keys)

    def mark(t: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        first = np.ones(len(t), dtype=bool)
        if keep:
            keys = key_fn(t).to_pylist()
            orders = t[order_col].to_pylist()
            for j, (k, o) in enumerate(zip(keys, orders)):
                ko = keep.get(k)
                if ko is not None and o != ko:
                    first[j] = False
        return t.append_column("dup_first", pa.array(first, pa.bool_()))

    return ds.map_batches(mark, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------


def char_shingles_u64(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of one document."""
    b = text.encode("utf-8")
    if len(b) < k:
        return hash_u64(np.array([len(b)], dtype=np.int64), seed=7) if b else np.empty(0, np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    weights = np.uint64(31) ** np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (win * weights).sum(axis=1)
    return np.unique(splitmix64(h))


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    a = hash_u64(np.arange(num_perm, dtype=np.int64), seed) | np.uint64(1)
    b = hash_u64(np.arange(num_perm, dtype=np.int64), seed ^ 0xB0B)
    return a, b


def minhash_signature(shingles: np.ndarray, num_perm: int, seed: int = 42) -> np.ndarray:
    """num_perm-wide MinHash signature via multiply-shift universal
    hashing h_i(x) = (a_i * x + b_i) over wrapping uint64 (Dietzfelbinger
    et al. 1997) — no modulo, ~100x cheaper than a Mersenne mod in numpy
    and approximately min-wise independent, which is the standard
    engineering tradeoff for MinHash at scale."""
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    a, b = _perm_params(num_perm, seed)
    with np.errstate(over="ignore"):
        vals = a[:, None] * shingles[None, :] + b[:, None]  # (P, S), wraps
    return vals.min(axis=1)


def minhash_signatures_batch(
    shingle_sets: list[np.ndarray], num_perm: int, seed: int = 42
) -> np.ndarray:
    """(n_docs, num_perm) signatures in ONE vectorized pass: concatenate
    all shingles, hash the (P, S_total) matrix once, segment-min per doc
    via minimum.reduceat. Identical output to per-doc minhash_signature."""
    sizes = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    out = np.full((len(shingle_sets), num_perm), np.iinfo(np.uint64).max, np.uint64)
    nonempty = np.flatnonzero(sizes > 0)
    if not len(nonempty):
        return out
    concat = np.concatenate([shingle_sets[i] for i in nonempty])
    a, b = _perm_params(num_perm, seed)
    with np.errstate(over="ignore"):
        vals = a[:, None] * concat[None, :] + b[:, None]  # (P, S_total), wraps
    starts = np.r_[0, np.cumsum(sizes[nonempty])[:-1]]
    mins = np.minimum.reduceat(vals, starts, axis=1)  # (P, n_nonempty)
    out[nonempty] = mins.T
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Near-duplicate pairs via MinHash+LSH, exact-Jaccard verified.

    Returns DataFrame (id_a, id_b, jaccard) with id_a < id_b, sorted.
    Candidate pairs come from band-hash buckets (bands × rows-per-band);
    verification re-shingles only candidate documents (fetched via a
    broadcast id-set filter)."""
    rows_per_band = num_perm // bands

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].tolist()
        sets = [
            char_shingles_u64(t, shingle_k)
            for t in df[text_col].fillna("").astype(str)
        ]
        sigs = minhash_signatures_batch(sets, num_perm, seed)  # (n, P)
        out_band, out_hash, out_id = [], [], []
        for j, doc_id in enumerate(ids):
            sig = sigs[j]
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_band.append(b)
                out_hash.append(h)
                out_id.append(doc_id)
        return pd.DataFrame({"band": out_band, "bh": out_hash, "id": out_id})

    sketch_src = ds.select_columns([id_col, text_col])
    sketch_ds = sketch_src.map_batches(sketch, batch_format="pandas")
    # Sketch rows are tiny (bands x 16 bytes per doc). Up to ~10M docs,
    # materialize them once and reuse for both the collision count and
    # the collided-row selection; beyond that, fall back to the two-pass
    # recompute (the shuffle still only ever moves (band, bh) pairs).
    materialized = None
    try:
        if ds.count() <= 10_000_000:
            materialized = sketch_ds.materialize()
            sketch_ds = materialized
    except Exception:
        pass
    partials = sketch_ds.map_batches(
        lambda df: df.groupby(["band", "bh"], sort=False).size().rename("n").reset_index(),
        batch_format="pandas",
    )
    folded = _fold_counts(partials, ["band", "bh"])
    counts = folded[(folded["n"] > 1) & (folded["n"] <= max_bucket)]  # hot-bucket guard
    if counts.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    collided = set(zip(counts["band"].tolist(), counts["bh"].tolist()))
    cref = ray.put(collided)

    def keep_collided(out: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cref)
        mask = [(b, h) in keys for b, h in zip(out["band"], out["bh"])]
        return out[mask]

    if materialized is not None:
        second = materialized.map_batches(keep_collided, batch_format="pandas")
    else:
        second = sketch_src.map_batches(
            lambda df: keep_collided(sketch(df)), batch_format="pandas"
        )
    sk = second.to_pandas()
    pairs: set[tuple] = set()
    for (_b, _bh), g in sk.groupby(["band", "bh"]):
        ids = sorted(set(g["id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    if not pairs:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    cand_ids = {i for p in pairs for i in p}
    ref = ray.put(cand_ids)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(ref)
        return df[df[id_col].isin(wanted)][[id_col, text_col]]

    texts = (
        ds.select_columns([id_col, text_col])
        .map_batches(fetch, batch_format="pandas")
        .to_pandas()
        .set_index(id_col)[text_col]
        .to_dict()
    )
    sh_cache = {i: set(char_shingles_u64(str(texts.get(i, "")), shingle_k).tolist()) for i in cand_ids}
    out = [
        (a, b, jaccard(sh_cache[a], sh_cache[b]))
        for a, b in sorted(pairs)
    ]
    df = pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])
    return df[df["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (Charikar 2002)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for j, t in enumerate(texts.fillna("").astype(str)):
        toks = t.split()
        if not toks:
            continue
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8,
                                            key=seed.to_bytes(8, "little")).digest(), "little")
             for w in uniq],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
        sh = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sh |= np.uint64(1) << np.uint64(b)
        out[j] = sh
    return out


def simhash_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
) -> pd.DataFrame:
    """Near-dup pairs with simhash Hamming distance <= max_hamming.

    Candidates: 4 × 16-bit band buckets (any pair within Hamming<=3 of a
    64-bit hash shares at least one of 4 bands by pigeonhole). Verified
    exactly with popcount."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(df[text_col], seed)
        rows = {"band": [], "bh": [], "id": [], "sh": []}
        for doc_id, h in zip(df[id_col], sh):
            for b in range(4):
                rows["band"].append(b)
                rows["bh"].append(int((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                rows["id"].append(doc_id)
                rows["sh"].append(int(h))
        return pd.DataFrame(rows)

    sketch_src = ds.select_columns([id_col, text_col])
    partials = sketch_src.map_batches(
        lambda df: sketch(df).groupby(["band", "bh"], sort=False).size().rename("n").reset_index(),
        batch_format="pandas",
    )
    folded = _fold_counts(partials, ["band", "bh"])
    counts = folded[folded["n"] > 1]
    if counts.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    collided = set(zip(counts["band"].tolist(), counts["bh"].tolist()))
    cref = ray.put(collided)

    def sketch_filtered(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cref)
        out = sketch(df)
        mask = [(b, h) in keys for b, h in zip(out["band"], out["bh"])]
        return out[mask]

    sk = sketch_src.map_batches(sketch_filtered, batch_format="pandas").to_pandas()
    pairs: set[tuple] = set()
    hams: dict[tuple, int] = {}
    for (_b, _bh), g in sk.groupby(["band", "bh"]):
        recs = sorted(set(zip(g["id"], g["sh"])))
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                (ia, ha), (ib, hb) = recs[i], recs[j]
                if ia == ib:
                    continue
                key = (ia, ib) if ia < ib else (ib, ia)
                if key in hams:
                    continue
                d = int(hamming64(np.array([ha], np.uint64), np.array([hb], np.uint64))[0])
                hams[key] = d
                if d <= max_hamming:
                    pairs.add(key)
    out = sorted(pairs)
    return pd.DataFrame(
        {
            "id_a": [a for a, _ in out],
            "id_b": [b for _, b in out],
            "hamming": [hams[p] for p in out],
        }
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index candidates)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int = 50,
    seed: int = 42,
) -> pd.DataFrame:
    """Word n-gram Jaccard near-dup: candidates share at least one
    n-gram whose posting list is <= max_posting (rare-gram inverted
    index); verified with exact Jaccard over full n-gram sets."""

    def grams(text: str) -> set[int]:
        toks = text.split()
        if len(toks) < n:
            return {hash_bytes_int(" ".join(toks), seed)} if toks else set()
        return {
            hash_bytes_int(" ".join(toks[i : i + n]), seed)
            for i in range(len(toks) - n + 1)
        }

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        g_col, id_out = [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("").astype(str)):
            for g in grams(text):
                g_col.append(g)
                id_out.append(doc_id)
        return pd.DataFrame({"g": np.array(g_col, dtype=np.uint64), "id": id_out})

    posting_src = ds.select_columns([id_col, text_col])
    partials = posting_src.map_batches(
        lambda df: explode(df).groupby("g", sort=False).size().rename("n").reset_index(),
        batch_format="pandas",
    )
    folded = _fold_counts(partials, ["g"])
    counts = folded[(folded["n"] > 1) & (folded["n"] <= max_posting)]  # rare-gram guard
    if counts.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    collided = set(int(g) for g in counts["g"].tolist())
    cref = ray.put(collided)

    def explode_filtered(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cref)
        out = explode(df)
        return out[[int(g) in keys for g in out["g"]]]

    posted = posting_src.map_batches(explode_filtered, batch_format="pandas").to_pandas()
    pairs: set[tuple] = set()
    for _g, grp in posted.groupby("g"):
        ids = sorted(set(grp["id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    if not pairs:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    cand_ids = {i for p in pairs for i in p}
    ref = ray.put(cand_ids)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(ref)
        return df[df[id_col].isin(wanted)][[id_col, text_col]]

    texts = (
        ds.select_columns([id_col, text_col])
        .map_batches(fetch, batch_format="pandas")
        .to_pandas()
        .set_index(id_col)[text_col]
        .to_dict()
    )
    gsets = {i: grams(str(texts.get(i, ""))) for i in cand_ids}
    rows = [
        (a, b, jaccard(gsets[a], gsets[b]))
        for a, b in sorted(pairs)
    ]
    df = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
    return df[df["jaccard"] >= threshold].reset_index(drop=True)


def hash_bytes_int(s: str, seed: int = 42) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8,
                        key=seed.to_bytes(8, "little")).digest(),
        "little",
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> pd.DataFrame:
    """All pairs with cosine >= threshold.

    Blockwise: normalized matrix blocks are collected as (ids, X) partials
    (vectors only — tiny vs raw docs), then pairwise block products run on
    the driver with numpy. At 10^12 scale the block-pair products become a
    Ray task per block pair (same math); cosine blocking/IVF cuts the
    quadratic term — see stages/knn.py for the bucketed variant."""
    parts: list[tuple[np.ndarray, np.ndarray]] = []
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        parts.append((batch[id_col].to_numpy(), X))
    rows = []
    for i in range(len(parts)):
        ids_a, Xa = parts[i]
        for j in range(i, len(parts)):
            ids_b, Xb = parts[j]
            S = Xa @ Xb.T
            if i == j:
                np.fill_diagonal(S, -2.0)
            ai, bj = np.nonzero(S >= threshold)
            for a, b in zip(ai, bj):
                id_a, id_b = ids_a[a], ids_b[b]
                if id_a == id_b:
                    continue
                if id_a > id_b:
                    id_a, id_b = id_b, id_a
                rows.append((id_a, id_b, S[a, b]))
    if not rows:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    df = pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"]).drop_duplicates(
        ["id_a", "id_b"]
    )
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
