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


def _key_hash_u64(values) -> np.ndarray:
    """Deterministic vectorized u64 hash of a key array (pandas SipHash
    with its fixed default key — stable across processes). Both the
    aggregate side and the marking side hash through this, so any dtype
    the key column round-trips to hashes consistently."""
    arr = np.asarray(values)
    return pd.util.hash_array(arr, categorize=arr.dtype == object)


def keep_first(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], pa.Array],
    order_col: str,
) -> rd.Dataset:
    """Generic keep-first exact dedup: append ``dup_first`` (True for the
    min-``order_col`` row of each key group). Aggregates (key, order)
    only; broadcasts sorted u64 key-hash + keep-order arrays and marks
    with ``searchsorted`` — no per-row Python (SURVEY.md §7.3; at 10^12
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
    if "key" in dup.columns and len(dup):
        kh = _key_hash_u64(dup["key"].to_numpy())
        order = np.argsort(kh)
        dup_kh, dup_ord = kh[order], dup["keep_ord"].to_numpy()[order]
    else:
        dup_kh, dup_ord = np.empty(0, np.uint64), np.empty(0, np.int64)
    ref = ray.put((dup_kh, dup_ord))

    def mark(t: pa.Table) -> pa.Table:
        dk, do = ray.get(ref)
        first = np.ones(len(t), dtype=bool)
        if len(dk):
            kh = _key_hash_u64(key_fn(t).to_pandas().to_numpy())
            pos = np.minimum(np.searchsorted(dk, kh), len(dk) - 1)
            member = dk[pos] == kh
            orders = np.asarray(t[order_col].to_pandas())
            first = ~(member & (orders != do[pos]))
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


def _combine_band_key(band: np.ndarray, bh: np.ndarray) -> np.ndarray:
    """Fold (band, bh) into one int64 membership key for vectorized
    ``np.isin`` filtering. Hash collisions only ADD candidate rows — all
    candidate pairs are verified exactly downstream — so wrapping u64
    arithmetic is safe here."""
    with np.errstate(over="ignore"):
        mixed = bh.astype(np.int64).view(np.uint64) ^ (
            band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        )
    return splitmix64(mixed).view(np.int64)


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
        ids = df[id_col].to_numpy()
        sets = [
            char_shingles_u64(t, shingle_k)
            for t in df[text_col].fillna("").astype(str)
        ]
        sigs = minhash_signatures_batch(sets, num_perm, seed)  # (n, P)
        # band hashing vectorized across (docs, bands): reshape to
        # (n, bands, rows_per_band) and fold each band's rows with the
        # splitmix64 finalizer — no per-doc Python, no per-band blake2b
        resh = sigs.reshape(len(sets), bands, rows_per_band)
        acc = np.zeros((len(sets), bands), np.uint64)
        for r in range(rows_per_band):
            acc = splitmix64(acc ^ resh[:, :, r])
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(bands, dtype=np.int64), len(sets)),
                "bh": acc.view(np.int64).ravel(),  # int64: survives Ray round-trips
                "id": np.repeat(ids, bands),
            }
        )

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
    collided = np.sort(
        _combine_band_key(counts["band"].to_numpy(np.int64), counts["bh"].to_numpy(np.int64))
    )
    cref = ray.put(collided)

    def keep_collided(out: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cref)
        comb = _combine_band_key(out["band"].to_numpy(np.int64), out["bh"].to_numpy(np.int64))
        # numpy bool mask (NOT a list: df[[]] would select zero COLUMNS)
        return out[np.isin(comb, keys)]

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
    """64-bit SimHash over whitespace tokens (Charikar 2002).

    Vectorized across the whole batch: tokens are factorized once
    (pd.factorize, C-level), each DISTINCT token is hashed once with
    pandas' vectorized SipHash (seed-keyed, process-stable), and the
    per-(doc, bit) votes are a single ``np.add.at`` scatter — no per-doc
    Python loop, no per-token hashlib calls."""
    import itertools

    s = texts.fillna("").astype(str)
    n = len(s)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    tok_lists = s.str.split()
    lens = tok_lists.map(len).to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.fromiter(
        itertools.chain.from_iterable(tok_lists), dtype=object, count=total
    )
    doc_ids = np.repeat(np.arange(n), lens)
    codes, uniques = pd.factorize(flat, sort=False)
    hs = pd.util.hash_array(
        np.asarray(uniques, dtype=object),
        hash_key=f"{seed & 0xFFFFFFFFFFFFFFFF:016x}"[:16],
        categorize=False,
    )
    bit_idx = np.arange(64, dtype=np.uint64)
    signs = (
        ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1
    )  # (n_distinct_tokens, 64) in {-1, +1}
    votes = np.zeros((n, 64), dtype=np.int64)
    np.add.at(votes, doc_ids, signs[codes])
    nz = lens > 0
    out[nz] = ((votes[nz] > 0).astype(np.uint64) << bit_idx[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def simhash_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 256,
    seed: int = 42,
) -> pd.DataFrame:
    """Near-dup pairs with simhash Hamming distance <= max_hamming.

    Candidates: 4 × 16-bit band buckets (any pair within Hamming<=3 of a
    64-bit hash shares at least one of 4 bands by pigeonhole). Verified
    exactly with popcount. Token-less documents are skipped (they all
    simhash to 0 and would flood band 0), and buckets larger than
    ``max_bucket`` are dropped — the same hot-key guard as the minhash
    path (boilerplate corpora otherwise make the pair set O(n²))."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").astype(str)
        nonblank = s.str.strip().ne("").to_numpy()
        sh = simhash64(s[nonblank], seed) if nonblank.any() else np.empty(0, np.uint64)
        ids = df[id_col].to_numpy()[nonblank]
        m = len(ids)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        bh = ((sh[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64).ravel()
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(4, dtype=np.int64), m),
                "bh": bh,
                "id": np.repeat(ids, 4),
                "sh": sh.view(np.int64).repeat(4),  # int64, stable block schema
            }
        )

    sketch_src = ds.select_columns([id_col, text_col])
    partials = sketch_src.map_batches(
        lambda df: sketch(df).groupby(["band", "bh"], sort=False).size().rename("n").reset_index(),
        batch_format="pandas",
    )
    folded = _fold_counts(partials, ["band", "bh"])
    counts = folded[(folded["n"] > 1) & (folded["n"] <= max_bucket)]  # hot-bucket guard
    if counts.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    collided = np.sort(
        _combine_band_key(counts["band"].to_numpy(np.int64), counts["bh"].to_numpy(np.int64))
    )
    cref = ray.put(collided)

    def sketch_filtered(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cref)
        out = sketch(df)
        comb = _combine_band_key(out["band"].to_numpy(np.int64), out["bh"].to_numpy(np.int64))
        return out[np.isin(comb, keys)]

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
                d = int(hamming64(np.array([ha], np.int64), np.array([hb], np.int64))[0])
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
    collided = np.sort(counts["g"].to_numpy(np.uint64))
    cref = ray.put(collided)

    def explode_filtered(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cref)
        out = explode(df)
        # numpy bool mask (a list mask on an empty batch would select
        # zero COLUMNS and break block schema unification)
        return out[np.isin(out["g"].to_numpy(np.uint64), keys)]

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


def _unpack_vec_block(block) -> tuple[np.ndarray, np.ndarray]:
    """(ids, X) from a normalized-vector block (arrow or pandas)."""
    if isinstance(block, pa.Table):
        block = block.to_pandas()
    if len(block) == 0:
        return np.empty(0, np.int64), np.empty((0, 1), np.float64)
    return block["id"].to_numpy(), np.stack(block["vec"].to_numpy())


@ray.remote
def _cosine_block_pair(block_a, block_b, threshold: float, same: bool):
    """One block-pair product: emits (id_a, id_b, cosine) rows over the
    threshold. Runs as a Ray task over object-store block refs — the
    driver never holds the vectors."""
    ids_a, Xa = _unpack_vec_block(block_a)
    ids_b, Xb = (ids_a, Xa) if same else _unpack_vec_block(block_b)
    if not len(ids_a) or not len(ids_b):
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    S = Xa @ Xb.T
    if same:
        # keep strict upper triangle only
        S[np.tril_indices_from(S)] = -2.0
    ai, bj = np.nonzero(S >= threshold)
    id_a, id_b = ids_a[ai], ids_b[bj]
    keep = id_a != id_b
    id_a, id_b, cos = id_a[keep], id_b[keep], S[ai, bj][keep]
    swap = id_a > id_b
    id_a[swap], id_b[swap] = id_b[swap], id_a[swap]
    return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cos})


def _vec_block_refs(ds: rd.Dataset, id_col: str, vec_col: str) -> list:
    """Normalize vectors per batch and return the materialized blocks'
    object refs (blocks live in the object store, not on the driver)."""

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({"id": df[id_col].to_numpy(), "vec": list(X)})

    norm = (
        ds.select_columns([id_col, vec_col])
        .map_batches(normalize, batch_format="pandas")
        .materialize()
    )
    try:
        return [
            bref
            for bundle in norm.iter_internal_ref_bundles()
            for bref, _meta in bundle.blocks
        ]
    except AttributeError:  # older Ray
        return list(norm.get_internal_block_refs())


def embedding_neardup_pairs(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> pd.DataFrame:
    """All pairs with cosine >= threshold — EXACT, distributed.

    Normalized vector blocks stay in the object store; one Ray task per
    block pair does the matmul + threshold and returns only matching
    pairs, so the driver materializes nothing but block REFS and the
    (tiny) result. Cost is O(B²) block pairs — exact by construction;
    for web-scale high-threshold mining use
    ``embedding_neardup_pairs_lsh`` (bucketed, approximate) instead."""
    blocks = _vec_block_refs(ds, id_col, vec_col)
    tasks = [
        _cosine_block_pair.remote(blocks[i], blocks[j], threshold, i == j)
        for i in range(len(blocks))
        for j in range(i, len(blocks))
    ]
    parts = [p for p in ray.get(tasks) if len(p)]
    if not parts:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    df = pd.concat(parts, ignore_index=True).drop_duplicates(["id_a", "id_b"])
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_neardup_pairs_lsh(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_tables: int = 12,
    n_planes: int = 10,
    seed: int = 42,
    max_bucket: int = 4096,
) -> pd.DataFrame:
    """Approximate near-dup pair mining via random-hyperplane LSH
    (Charikar 2002): per-batch signature computation, ONE shuffle of
    (table, sig, id, vec) rows, within-bucket exact-cosine verification
    in distributed ``map_groups`` — no all-pairs term, no driver-side
    vector materialization. Recall grows with n_tables; collision prob
    per table is (1 - θ/π)^n_planes for angle θ."""
    first = ds.take(1)
    if not first:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        P = ray.get(planes_ref)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        # (n, tables, planes) sign bits -> (n, tables) packed signatures
        proj = np.einsum("nd,tpd->ntp", X, P) > 0
        sigs = (proj.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
        n, t = len(df), P.shape[0]
        return pd.DataFrame(
            {
                "table": np.tile(np.arange(t, dtype=np.int64), n),
                "sig": sigs.astype(np.int64).ravel(),
                "id": np.repeat(df[id_col].to_numpy(), t),
                "vec": [v for v in X for _ in range(t)],
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:  # hot-bucket guard
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = g["id"].to_numpy()
        X = np.stack(g["vec"].to_numpy())
        S = X @ X.T
        S[np.tril_indices_from(S)] = -2.0
        ai, bj = np.nonzero(S >= threshold)
        id_a, id_b = ids[ai], ids[bj]
        keep = id_a != id_b
        id_a, id_b, cos = id_a[keep], id_b[keep], S[ai, bj][keep]
        swap = id_a > id_b
        id_a[swap], id_b[swap] = id_b[swap], id_a[swap]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cos})

    pairs = (
        ds.select_columns([id_col, vec_col])
        .map_batches(sig, batch_format="pandas")
        .groupby(["table", "sig"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if not len(pairs):
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    pairs = pairs.drop_duplicates(["id_a", "id_b"])
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
