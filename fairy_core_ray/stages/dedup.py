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
  3. candidate pairs enumerate INSIDE the groupby shuffle
     (``map_groups`` per bucket, hot-bucket guard applied per group);
     the n-gram path prefix-filters each doc's posting list first
     (PPJoin principle — exact recall, far fewer candidates). The
     driver folds only the deduped pair set, never bucket contents;
  4. verification is EXACT and distributed: candidate texts live in the
     object store (one broadcast dict under TEXT_BROADCAST_BUDGET,
     per-block dict-chunk refs above it), contiguous pair chunks fan
     out as Ray tasks (the candidate set is tiny vs the corpus).
     SimHash verification needs only the sketches, so it runs entirely
     inside the bucket ``map_groups``.

Below SMALL_SKETCH_DOCS everything after the ONE distributed sketch
pass folds locally on the driver (each extra Ray execution costs
~0.5-1.5 s fixed); above it bucket counts fold distributedly and a
filtered second pass feeds the groupby above.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from fairy_core_ray.functions.hashing import (
    hamming64,
    hash_u64,
    polyhash_str_u64,
    splitmix64,
)

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# Exact dedup (generic keep-first)
# ---------------------------------------------------------------------------



# Above this many documents the sketch-bucket count fold moves off the
# driver: the per-batch partials aggregate in a distributed groupby and
# only COLLIDED bucket keys (1 < n <= max_bucket) return — O(duplicated
# buckets), never the O(docs x bands) full count table. Below it the
# driver fold wins (a Ray sort-groupby costs seconds of fixed overhead
# on tables this small — see _fold_counts).
SKETCH_FOLD_DRIVER_DOCS = 5_000_000

# Above this many documents the ngram path stops broadcasting the global
# gram-count table (O(vocab) driver + object-store state — a 10^9-doc
# web corpus has a multi-billion-gram vocabulary) and switches to the
# count-join path: counts attach inside a groupby(g), prefix filtering
# runs inside a groupby(id), pairs emit per gram. More shuffle volume,
# zero corpus-proportional single-node state.
NGRAM_BROADCAST_DOCS = 20_000_000


def _collided_counts(
    partials,
    keys: list[str],
    max_bucket: int,
    n_docs: int | None,
    keep_oversized: bool = False,
) -> pd.DataFrame:
    """Bucket-count rows restricted to 1 < n <= max_bucket, folded on
    the driver below SKETCH_FOLD_DRIVER_DOCS and via a distributed
    groupby above it (used by the minhash/simhash big paths, whose ONLY
    use of the counts is the collided-key broadcast; the ngram path
    keeps the full fold — its prefix filter needs every gram's count)."""
    if n_docs is not None and n_docs > SKETCH_FOLD_DRIVER_DOCS:
        agg = partials.groupby(keys).aggregate(rd.aggregate.Sum("n", alias_name="n"))
        dup = agg.filter(expr="n > 1").to_pandas()
        return dup if keep_oversized else dup[dup["n"] <= max_bucket]
    folded = _fold_counts(partials, keys)
    if folded.empty:
        return folded
    keep = folded["n"] > 1
    if not keep_oversized:
        keep &= folded["n"] <= max_bucket
    return folded[keep]


def _fold_counts(ds_partials, keys: list[str]) -> pd.DataFrame:
    """Per-batch partial counts + driver fold. The partial stream is one
    row per distinct key per batch — for sketch/posting tables this is
    orders of magnitude smaller than a Ray sort-based groupby's shuffle,
    which measured ~40 s on an 80k-row string-keyed table."""
    from fairy_core_ray.functions.folds import fold_to_pandas

    allp = fold_to_pandas(ds_partials)
    if allp is None or allp.empty:
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
    *,
    _hash_fn: Callable[[np.ndarray], np.ndarray] | None = None,
) -> rd.Dataset:
    """Generic keep-first exact dedup: append ``dup_first`` (True for the
    min-``order_col`` row of each key group). Aggregates (key, order)
    only; broadcasts sorted u64 key-hash + keep-order + key-value arrays
    (duplicated keys only) and marks with ``searchsorted`` + exact key
    confirmation — no per-row Python (SURVEY.md §7.3; at 10^12 rows swap
    the broadcast for a hash-bucketed semi-join).

    ``_hash_fn`` injects the key-hash kernel (test hook for forcing
    collisions); it is captured by the mark closure so it ships to
    workers."""
    hash_fn = _hash_fn or _key_hash_u64

    try:
        n_rows = ds.count()
    except Exception:
        n_rows = None
    if n_rows is not None and n_rows <= 2_000_000:
        # small path: per-batch (key -> min ord, count) partials + one
        # driver fold — Ray's sort-based groupby costs seconds on small
        # string-keyed tables (see _fold_counts note)
        def partial(t: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame(
                {"key": key_fn(t).to_pandas(), "ord": t[order_col].to_pandas()}
            )
            g = df.groupby("key", sort=False)["ord"].agg(["min", "size"]).reset_index()
            g.columns = ["key", "keep_ord", "n"]
            return g

        from fairy_core_ray.functions.folds import fold_to_pandas

        allp = fold_to_pandas(ds.map_batches(partial, batch_format="pyarrow"))
        if allp is None:
            allp = pd.DataFrame({"key": [], "keep_ord": [], "n": []})
        agg_pdf = allp.groupby("key", sort=False).agg(
            keep_ord=("keep_ord", "min"), n=("n", "sum")
        ).reset_index()
        dup = agg_pdf[agg_pdf["n"] > 1]
    else:
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
        kh = hash_fn(dup["key"].to_numpy())
        order = np.argsort(kh, kind="stable")
        dup_kh, dup_ord = kh[order], dup["keep_ord"].to_numpy()[order]
        dup_keys = dup["key"].to_numpy()[order]
    else:
        dup_kh, dup_ord = np.empty(0, np.uint64), np.empty(0, np.int64)
        dup_keys = np.empty(0, object)
    ref = ray.put((dup_kh, dup_ord, dup_keys))

    def mark(t: pa.Table) -> pa.Table:
        dk, do, dkeys = ray.get(ref)
        first = np.ones(len(t), dtype=bool)
        if len(dk):
            keys_b = key_fn(t).to_pandas().to_numpy()
            kh = hash_fn(keys_b)
            pos = np.minimum(np.searchsorted(dk, kh), len(dk) - 1)
            member = dk[pos] == kh
            # hash membership confirmed by EXACT key equality (the
            # matched subset is tiny): a u64 collision between a unique
            # key and a dup key must not mark the unique row. Where the
            # key differs but the next slot carries the same hash (two
            # distinct dup keys colliding — ~birthday(10^12)/2^64 rare),
            # probe pos+1; deeper runs are ignored and only FAIL-OPEN
            # (a true dup row stays dup_first=True).
            mi = np.flatnonzero(member)
            if len(mi):
                eq = np.zeros(len(t), dtype=bool)
                eq[mi] = dkeys[pos[mi]] == keys_b[mi]
                miss = mi[~eq[mi]]
                if len(miss):
                    p2 = pos[miss] + 1
                    ok2 = p2 < len(dk)
                    sel, p2 = miss[ok2], p2[ok2]
                    hit = (dk[p2] == kh[sel]) & (dkeys[p2] == keys_b[sel])
                    eq[sel[hit]] = True
                    pos[sel[hit]] = p2[hit]
                member = eq
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


# Below this many documents the whole (band, bh, id) sketch table —
# bands x docs tiny rows — is pulled once to the driver and the bucket
# count / collision filter / pair enumeration run as local numpy.
# Above it, bucket counts fold distributedly and a second filtered pass
# selects collided rows (the shuffle still only moves sketch rows).
# Rationale: every extra Ray execution costs ~0.5-1.5 s of fixed
# overhead at 32 CPUs — 3 executions of sub-second work is slower than
# one execution plus a 100k-row local fold.
SMALL_SKETCH_DOCS = 500_000


def _filter_buckets(
    sk: pd.DataFrame, max_bucket: int, keep_oversized: bool = False
) -> tuple[pd.DataFrame, np.ndarray]:
    """Keep sketch rows in buckets of size in (1, max_bucket]; returns
    (filtered rows, their combined bucket key), both bucket-sorted.
    ``keep_oversized`` passes buckets ABOVE the cap through as well —
    for callers whose per-bucket verifier applies its own guard with
    identical-hash star handling (the simhash/phash paths)."""
    comb = _combine_band_key(sk["band"].to_numpy(np.int64), sk["bh"].to_numpy(np.int64))
    order = np.argsort(comb, kind="stable")
    comb = comb[order]
    starts = np.flatnonzero(np.r_[True, comb[1:] != comb[:-1]])
    sizes = np.diff(np.r_[starts, len(comb)])
    per_row_size = np.repeat(sizes, sizes)
    keep = per_row_size > 1
    if not keep_oversized:
        keep &= per_row_size <= max_bucket
    return sk.iloc[order[keep]], comb[keep]


def _bucket_bounds(comb_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    starts = np.flatnonzero(np.r_[True, comb_sorted[1:] != comb_sorted[:-1]])
    return starts, np.r_[starts[1:], len(comb_sorted)]


def _candidate_pairs(ids_all: np.ndarray, comb_sorted: np.ndarray) -> set[tuple]:
    """Distinct unordered id pairs per bucket (bucket-sorted input) —
    SMALL-path helper only; the big paths enumerate pairs distributedly
    via groupby(...).map_groups(_emit_bucket_id_pairs).

    One C-level self-merge over ALL buckets (the _emit_fold_bucket_pairs
    kernel) instead of a per-bucket triu_indices Python loop — the loop
    was 1.3 s of the 6 s sf0.1 ngram_pairs wall at 19k buckets."""
    if not len(ids_all):
        return set()
    df = pd.DataFrame({"k": comb_sorted, "id": ids_all}).drop_duplicates()
    j = df.merge(df, on="k")
    out = j.loc[j["id_x"] < j["id_y"], ["id_x", "id_y"]].drop_duplicates()
    return set(zip(out["id_x"].tolist(), out["id_y"].tolist()))


# Pair emission / count folds shuffle by hash(key) % PAIR_FOLD_BUCKETS
# instead of by raw key: one vectorized map_groups call per BUCKET (~256
# total) instead of one per key. For gram-keyed postings the key space is
# the corpus vocabulary (unbounded at 10^12 rows) — per-key dispatch is
# the tiny-group overhead the distance join already measured and fixed.
PAIR_FOLD_BUCKETS = 256


def _with_fold_bucket(df: pd.DataFrame, key: str = "g") -> pd.DataFrame:
    """Attach ``fb`` = hash(key) % PAIR_FOLD_BUCKETS. splitmix64 for
    integer keys; pandas hash_array (fixed default key — deterministic
    across processes) for string/object keys."""
    vals = df[key]
    if vals.dtype.kind in "iu":
        h = splitmix64(vals.to_numpy(np.int64).view(np.uint64))
    else:
        h = pd.util.hash_array(vals.to_numpy(), categorize=False)
    df = df.copy()
    df["fb"] = (h % np.uint64(PAIR_FOLD_BUCKETS)).astype(np.int64)
    return df


def _emit_fold_bucket_pairs(
    grp: pd.DataFrame, max_bucket: int, key: str = "g"
) -> pd.DataFrame:
    """Vectorized pair emission for ONE hash-fold bucket holding many
    keys: per-key raw-size guard (identical to _emit_bucket_id_pairs'
    ``len(g) > max_bucket``), then distinct unordered id pairs per key
    via a C-level self-merge — no per-key Python dispatch. Guarded keys
    have <= max_bucket rows, so the merge blow-up is bounded by
    max_bucket x bucket rows."""
    k = grp[key].to_numpy(np.int64)
    codes, _ = pd.factorize(k, sort=False)
    raw = np.bincount(codes)[codes]
    df = pd.DataFrame({"k": k, "id": grp["id"].to_numpy()})
    df = df[raw <= max_bucket].drop_duplicates()
    j = df.merge(df, on="k")
    out = j.loc[j["id_x"] < j["id_y"], ["id_x", "id_y"]].drop_duplicates()
    return out.rename(columns={"id_x": "id_a", "id_y": "id_b"})


def _emit_bucket_id_pairs(g: pd.DataFrame, max_bucket: int) -> pd.DataFrame:
    """Distinct unordered id pairs of ONE bucket group — the map_groups
    body that replaces driver-side pair enumeration in the big paths.
    Pairs materialize inside the groupby shuffle's reduce side, so the
    driver never holds collided sketch/posting rows (the round-2
    O(duplicated-rows) driver term). ids come back sorted from
    np.unique, so id_a < id_b by construction."""
    ids = np.unique(g["id"].to_numpy())
    if len(ids) < 2 or len(g) > max_bucket:  # hot-bucket guard
        return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
    iu, ju = np.triu_indices(len(ids), 1)
    return pd.DataFrame({"id_a": ids[iu], "id_b": ids[ju]})


def _collect_pair_set(pairs_ds: rd.Dataset) -> set[tuple]:
    """Fold distributed pair emissions into the set that drives
    verification. Per-batch drop_duplicates shrinks the stream first;
    the driver ends up holding only the DISTINCT candidate-pair set —
    the same object the verification fan-out needs to exist anyway."""
    pairs: set[tuple] = set()
    deduped = pairs_ds.map_batches(
        lambda df: df.drop_duplicates(["id_a", "id_b"]), batch_format="pandas"
    )
    for b in deduped.iter_batches(batch_size=None, batch_format="pandas"):
        pairs.update(zip(b["id_a"].tolist(), b["id_b"].tolist()))
    return pairs


# Above this many bytes of candidate text the verification texts are
# never assembled into one driver dict: each materialized (id, text)
# block becomes an object-store dict chunk (built BY a Ray task), and
# each verify task receives only the chunk refs covering its pairs.
TEXT_BROADCAST_BUDGET = 64 << 20


@ray.remote
def _block_to_text_dict(block, id_col: str, text_col: str) -> dict:
    df = block.to_pandas() if isinstance(block, pa.Table) else block
    return dict(zip(df[id_col].tolist(), df[text_col].astype(str).tolist()))


@ray.remote
def _block_ids(block, id_col: str) -> np.ndarray:
    df = block.to_pandas() if isinstance(block, pa.Table) else block
    return df[id_col].to_numpy()


def _fetch_candidate_texts(ds: rd.Dataset, ids: set, id_col: str, text_col: str):
    """Materialize the candidate (id, text) rows via a broadcast-filter
    scan; returns the MaterializedDataset (texts stay in the object
    store, not on the driver)."""
    ref = ray.put(ids)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(ref)
        return df[df[id_col].isin(wanted)][[id_col, text_col]]

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(fetch, batch_format="pandas")
        .materialize()
    )


def _dataset_block_refs(mat_ds) -> list:
    try:
        return [
            bref
            for bundle in mat_ds.iter_internal_ref_bundles()
            for bref, _meta in bundle.blocks
        ]
    except AttributeError:  # older Ray
        return list(mat_ds.get_internal_block_refs())


@ray.remote
def _jaccard_chunk(texts, pairs_chunk: np.ndarray, gram_batch_fn, gram_arg: int, seed: int):
    """Exact jaccard for one chunk of candidate pairs ((n, 2) int64
    array — a zero-copy numpy buffer, NOT a Python tuple list: at 200k
    candidates the per-element msgpack serialization of tuple lists was
    ~2 s of driver wall). Gram arrays (sorted-unique u64) are computed
    ONCE per distinct doc in the chunk with the batch kernel, then pairs
    intersect with numpy. ``texts`` is either a dict (small broadcast)
    or a list of object refs to dict chunks (big path — only the chunks
    this task's pairs touch)."""
    if isinstance(texts, list):
        merged: dict = {}
        for d in ray.get(texts):
            merged.update(d)
        texts = merged
    ids = np.unique(pairs_chunk).tolist()
    arrs = gram_batch_fn(
        pd.Series([str(texts.get(i, "")) for i in ids]), gram_arg, seed
    )
    cache = dict(zip(ids, arrs))
    out = []
    for a, b in pairs_chunk.tolist():
        A, B = cache[a], cache[b]
        if not len(A) and not len(B):
            out.append((a, b, 1.0))
            continue
        inter = np.intersect1d(A, B, assume_unique=True).size
        union = len(A) + len(B) - inter
        out.append((a, b, inter / union if union else 0.0))
    return out


def _verified_jaccard_pairs(
    ds: rd.Dataset,
    pairs: set[tuple],
    *,
    id_col: str,
    text_col: str,
    gram_fn,
    gram_arg: int,
    seed: int,
    threshold: float,
) -> pd.DataFrame:
    """Distributed exact-jaccard verification: candidate texts fetched
    into the object store, pairs split into contiguous chunks (sorted,
    so chunks share left ids and the per-task gram cache hits), one Ray
    task each. Below TEXT_BROADCAST_BUDGET the texts broadcast as one
    dict; above it each (id, text) block becomes a dict-chunk ref built
    by a Ray task, the driver keeps only id arrays + refs, and each
    verify task receives the chunk refs its pairs actually touch."""
    # (n, 2) int64 array, lexsorted by (id_a, id_b): chunks then share
    # left ids (per-task gram-cache hits) and slices serialize as one
    # numpy buffer instead of 2n boxed ints
    parr = np.array(list(pairs), dtype=np.int64).reshape(-1, 2)
    parr = parr[np.lexsort((parr[:, 1], parr[:, 0]))]
    cand_ids = set(np.unique(parr).tolist())
    fetched = _fetch_candidate_texts(ds, cand_ids, id_col, text_col)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nchunk = max(1, min(ncpu * 2, (len(parr) + 255) // 256))
    bounds = np.linspace(0, len(parr), nchunk + 1).astype(int)
    spans = [(s, e) for s, e in zip(bounds[:-1], bounds[1:]) if e > s]
    try:
        total_bytes = fetched.size_bytes() or 0
    except Exception:
        total_bytes = 0
    if total_bytes <= TEXT_BROADCAST_BUDGET:
        texts = fetched.to_pandas().set_index(id_col)[text_col].to_dict()
        tref = ray.put(texts)
        tasks = [
            _jaccard_chunk.remote(tref, parr[s:e], gram_fn, gram_arg, seed)
            for s, e in spans
        ]
    else:
        brefs = _dataset_block_refs(fetched)
        dict_refs = [_block_to_text_dict.remote(b, id_col, text_col) for b in brefs]
        id_arrays = ray.get([_block_ids.remote(b, id_col) for b in brefs])
        id2blk = {
            i: bi for bi, arr in enumerate(id_arrays) for i in arr.tolist()
        }  # ids only — O(candidate ids) driver memory, never the texts
        tasks = []
        for s, e in spans:
            chunk = parr[s:e]
            need = sorted(
                {id2blk[i] for i in np.unique(chunk).tolist() if i in id2blk}
            )
            tasks.append(
                _jaccard_chunk.remote(
                    [dict_refs[b] for b in need], chunk, gram_fn, gram_arg, seed
                )
            )
    rows = [r for chunk in ray.get(tasks) for r in chunk]
    df = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
    return df[df["jaccard"] >= threshold].reset_index(drop=True)


def _char_gram_batch(texts: pd.Series, k: int, seed: int) -> list[np.ndarray]:
    return [char_shingles_u64(t, k) for t in texts.fillna("").astype(str)]


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
    shingle_sets: list[np.ndarray],
    num_perm: int,
    seed: int = 42,
    max_concat: int = 1 << 14,
) -> np.ndarray:
    """(n_docs, num_perm) signatures, vectorized across documents:
    concatenate shingles, hash a (P, S_chunk) matrix, segment-min per doc
    via minimum.reduceat. Identical output to per-doc minhash_signature.

    Chunked by ``max_concat`` shingles so the hash matrix stays
    cache-sized (P × 16k × 8 B ≈ 8 MB at P=64) — an unchunked pass
    over a large batch allocates multi-GB temporaries and thrashes
    (measured 64 s for 5k docs of ~3k shingles; chunked: <2 s)."""
    sizes = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    out = np.full((len(shingle_sets), num_perm), np.iinfo(np.uint64).max, np.uint64)
    nonempty = np.flatnonzero(sizes > 0)
    if not len(nonempty):
        return out
    a, b = _perm_params(num_perm, seed)
    ne_sizes = sizes[nonempty]
    # chunk boundaries over the nonempty docs (each chunk <= max_concat
    # shingles, always at least one doc)
    csum = np.cumsum(ne_sizes)
    lo = 0
    while lo < len(nonempty):
        base = csum[lo - 1] if lo else 0
        hi = int(np.searchsorted(csum, base + max_concat, side="right"))
        hi = max(hi, lo + 1)
        idxs = nonempty[lo:hi]
        concat = np.concatenate([shingle_sets[i] for i in idxs])
        with np.errstate(over="ignore"):
            vals = a[:, None] * concat[None, :]  # (P, S_chunk), wraps
            vals += b[:, None]
        starts = np.r_[0, np.cumsum(ne_sizes[lo:hi])[:-1]]
        out[idxs] = np.minimum.reduceat(vals, starts, axis=1).T
        lo = hi
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
    try:
        n_docs = ds.count()  # metadata-only on parquet reads
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= SMALL_SKETCH_DOCS:
        # one distributed sketch pass; bucket count + collision filter +
        # pair enumeration run locally on the tiny (bands x docs)-row table
        sk, comb = _filter_buckets(sketch_ds.to_pandas(), max_bucket)
        pairs = _candidate_pairs(sk["id"].to_numpy(), comb)
    else:
        partials = sketch_ds.map_batches(
            lambda df: df.groupby(["band", "bh"], sort=False).size().rename("n").reset_index(),
            batch_format="pandas",
        )
        counts = _collided_counts(partials, ["band", "bh"], max_bucket, n_docs)
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

        # distributed pair enumeration: the filtered sketch rows shuffle
        # ONCE by (band, bh) and pairs emit inside map_groups — the
        # driver sees only the deduped pair set, never the sketch rows
        pairs_ds = (
            sketch_src.map_batches(
                lambda df: keep_collided(sketch(df)), batch_format="pandas"
            )
            .groupby(["band", "bh"])
            .map_groups(
                lambda g: _emit_bucket_id_pairs(g, max_bucket), batch_format="pandas"
            )
        )
        pairs = _collect_pair_set(pairs_ds)
    if not pairs:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    return _verified_jaccard_pairs(
        ds,
        pairs,
        id_col=id_col,
        text_col=text_col,
        gram_fn=_char_gram_batch,
        gram_arg=shingle_k,
        seed=seed,
        threshold=threshold,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(texts: pd.Series, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (Charikar 2002).

    Vectorized across the whole batch: tokens are factorized once
    (pd.factorize, C-level), each DISTINCT token is hashed once with
    the vectorized seeded byte-polynomial hash (polyhash_str_u64 —
    splitmix64-finalized and therefore DuckDB-derivable, the property
    the simhash_pairs value-level oracle rests on), and the per-(doc,
    bit) votes are one reduceat pass — no per-doc Python loop, no
    per-token hashlib calls."""
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
    hs = polyhash_str_u64(np.asarray(uniques, dtype=object), seed)
    bit_idx = np.arange(64, dtype=np.uint64)
    signs = (
        ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1
    )  # (n_distinct_tokens, 64) in {-1, +1}
    # doc_ids is sorted (tokens are emitted doc-major), so per-doc vote
    # sums are contiguous segments: one add.reduceat pass beats the
    # unbuffered np.add.at scatter ~5x
    nz = np.flatnonzero(lens > 0)
    seg_starts = np.r_[0, np.cumsum(lens[nz])[:-1]]
    votes = np.add.reduceat(signs[codes], seg_starts, axis=0)  # (n_nonzero, 64)
    out[nz] = ((votes > 0).astype(np.uint64) << bit_idx[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def _simhash_bucket_rows(
    ids: np.ndarray, sh: np.ndarray, max_hamming: int, max_bucket: int
):
    """Verified (id_a, id_b, hamming) arrays within ONE bucket — one
    popcount matrix, no per-pair allocation. ids sorted by np.unique so
    id_a < id_b by construction; None when the bucket is trivial or
    over the hot-bucket guard."""
    bid, first_idx = np.unique(ids, return_index=True)
    m = len(bid)
    if m < 2:
        return None
    bsh = sh[first_idx]
    if len(ids) > max_bucket:
        # hot-bucket guard — EXCEPT the all-identical-hash case: exact
        # duplicates (boilerplate docs, byte-identical images) land in
        # ONE bucket in every band, so dropping it would lose precisely
        # the most-duplicated item. Identical hashes connect as a STAR
        # to the min id (hamming 0): linear output, and downstream
        # connected components see the same clusters as the full
        # O(n^2) clique would produce. Mixed oversized buckets still
        # drop (the documented guard).
        if (bsh == bsh[0]).all():
            return (
                np.full(m - 1, bid[0]),
                bid[1:],
                np.zeros(m - 1, np.int64),
            )
        return None
    D = hamming64(bsh[:, None], bsh[None, :])
    iu, ju = np.triu_indices(m, 1)
    d = D[iu, ju]
    ok = d <= max_hamming
    return bid[iu[ok]], bid[ju[ok]], d[ok].astype(np.int64)


def _emit_simhash_pairs(g: pd.DataFrame, max_hamming: int, max_bucket: int) -> pd.DataFrame:
    """map_groups body for the big path: verification happens INSIDE the
    (band, bh) groupby shuffle — the driver folds only verified pairs."""
    res = _simhash_bucket_rows(
        g["id"].to_numpy(), g["sh"].to_numpy(np.int64), max_hamming, max_bucket
    )
    if res is None:
        empty = g["id"].to_numpy()[:0]
        return pd.DataFrame(
            {"id_a": empty, "id_b": empty, "hamming": np.empty(0, np.int64)}
        )
    a, b, d = res
    return pd.DataFrame({"id_a": a, "id_b": b, "hamming": d})


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
    sketch_ds = sketch_src.map_batches(sketch, batch_format="pandas")
    try:
        n_docs = ds.count()  # metadata-only on parquet reads
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= SMALL_SKETCH_DOCS:
        # small path: per-bucket vectorized verification on the driver —
        # one popcount matrix per bucket over the tiny sketch table.
        # Oversized buckets flow through: _simhash_bucket_rows applies
        # the guard, with identical-hash star handling (exact dups).
        sk, comb = _filter_buckets(
            sketch_ds.to_pandas(), max_bucket, keep_oversized=True
        )
        ids_all, sh_all = sk["id"].to_numpy(), sk["sh"].to_numpy(np.int64)
        starts, ends = _bucket_bounds(comb)
        hams: dict[tuple, int] = {}
        for s, e in zip(starts, ends):
            res = _simhash_bucket_rows(ids_all[s:e], sh_all[s:e], max_hamming, max_bucket)
            if res is None:
                continue
            for a, b, h in zip(res[0].tolist(), res[1].tolist(), res[2].tolist()):
                hams[(a, b)] = int(h)
        out = sorted(hams)
        return pd.DataFrame(
            {
                "id_a": [a for a, _ in out],
                "id_b": [b for _, b in out],
                "hamming": [hams[p] for p in out],
            }
        )
    partials = sketch_ds.map_batches(
        lambda df: df.groupby(["band", "bh"], sort=False).size().rename("n").reset_index(),
        batch_format="pandas",
    )
    # keep_oversized: hot buckets shuffle through (O(rows), not pairs)
    # so the map_groups verifier can star-connect identical-hash groups
    counts = _collided_counts(
        partials, ["band", "bh"], max_bucket, n_docs, keep_oversized=True
    )
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

    # big path: filtered sketch rows shuffle ONCE by (band, bh) and
    # verification runs INSIDE map_groups (simhash verify needs only the
    # sketches, so unlike minhash nothing else is fetched) — the driver
    # folds verified pairs only
    verified = (
        sketch_src.map_batches(sketch_filtered, batch_format="pandas")
        .groupby(["band", "bh"])
        .map_groups(
            lambda g: _emit_simhash_pairs(g, max_hamming, max_bucket),
            batch_format="pandas",
        )
    )
    from fairy_core_ray.functions.folds import fold_to_pandas

    allp = fold_to_pandas(verified)
    if allp is None or not len(allp):
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    allp = allp.drop_duplicates(["id_a", "id_b"])
    allp["hamming"] = allp["hamming"].astype(np.int64)
    return allp.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def hamming_band_pairs(
    ds: rd.Dataset,
    *,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int = 4096,
) -> pd.DataFrame:
    """Near-dup pairs over a PRECOMPUTED 64-bit hash column (e.g. image
    phash): banded candidate mining + exact popcount verification, both
    inside one ``groupby(band, bh)`` shuffle.

    Pigeonhole-exact for ``max_hamming <= 3``: any pair within Hamming 3
    of a 64-bit word shares at least one of the 4 disjoint 16-bit bands,
    so banded candidates have 100% recall UP TO the hot-key guard:
    mixed buckets over ``max_bucket`` are dropped, while
    identical-hash buckets over the guard (exact duplicates — the
    most common image-dedup case) emit linear STAR pairs to the min id
    so cluster connectivity survives without O(n²) output. Unlike
    ``simhash_pairs``
    this takes the sketch as input, so it is the dedup primitive for
    modalities whose fingerprint is computed upstream (image phash,
    audio chromaprint). The shuffle moves 4 small rows per input row;
    verification runs inside map_groups; the driver folds verified pairs
    only."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        h = df[hash_col].to_numpy(np.int64).view(np.uint64)
        ids = df[id_col].to_numpy()
        m = len(ids)
        shifts = (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :]
        bh = ((h[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64).ravel()
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(4, dtype=np.int64), m),
                "bh": bh,
                "id": np.repeat(ids, 4),
                "sh": h.view(np.int64).repeat(4),
            }
        )

    verified = (
        ds.select_columns([id_col, hash_col])
        .map_batches(sketch, batch_format="pandas")
        .groupby(["band", "bh"])
        .map_groups(
            lambda g: _emit_simhash_pairs(g, max_hamming, max_bucket),
            batch_format="pandas",
        )
    )
    from fairy_core_ray.functions.folds import fold_to_pandas

    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "hamming": pd.Series([], dtype=np.int64),
        }
    )
    allp = fold_to_pandas(verified)
    if allp is None or not len(allp):
        return empty
    allp = allp.drop_duplicates(["id_a", "id_b"])
    allp["hamming"] = allp["hamming"].astype(np.int64)
    return allp.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index candidates)
# ---------------------------------------------------------------------------


def _prefix_filter(
    g: np.ndarray, ids: np.ndarray, gcnt: np.ndarray, threshold: float
) -> tuple[np.ndarray, np.ndarray]:
    """PPJoin prefix filtering (Chaudhuri et al. 2006 / Xiao et al.
    2008): keep only each doc's (|G| - ceil(t*|G|) + 1) globally-rarest
    grams — any pair with Jaccard >= t must still collide within both
    prefixes (EXACT recall), while the inverted index and the candidate
    count shrink (measured 1.1M -> ~100k pairs at sf0.1). Input rows
    must be doc-major (explode emits per-doc runs); returns (grams, ids)
    gram-sorted."""
    if not len(g):
        return g[:0], ids[:0]
    dcodes, _ = pd.factorize(ids, sort=False)
    order = np.lexsort((g, gcnt, dcodes))  # per doc: rare grams first
    doc_sizes = np.bincount(dcodes)
    starts = np.r_[0, np.cumsum(doc_sizes)[:-1]]
    rank = np.arange(len(g)) - np.repeat(starts, doc_sizes)
    psize = doc_sizes - np.ceil(threshold * doc_sizes).astype(np.int64) + 1
    in_prefix = rank < np.repeat(psize, doc_sizes)
    gp, idp = g[order][in_prefix], ids[order][in_prefix]
    o2 = np.argsort(gp, kind="stable")
    return gp[o2], idp[o2]


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
    index); verified with exact Jaccard over full n-gram sets.

    Gram hashing is batch-vectorized: tokens factorized once per batch,
    each distinct token hashed once (vectorized SipHash), n-gram hashes
    folded from consecutive token hashes — no per-gram hashlib calls."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        garrs = word_ngram_arrays(df[text_col], n, seed)
        lens = np.array([len(g) for g in garrs], np.int64)
        g = np.concatenate(garrs) if lens.sum() else np.empty(0, np.uint64)
        return pd.DataFrame({"g": g, "id": np.repeat(df[id_col].to_numpy(), lens)})

    posting_src = ds.select_columns([id_col, text_col])
    posting_ds = posting_src.map_batches(explode, batch_format="pandas")
    try:
        n_docs = ds.count()
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= SMALL_SKETCH_DOCS // 5:
        posted = posting_ds.to_pandas()
        g_all = posted["g"].to_numpy(np.uint64)
        ids_all = posted["id"].to_numpy()
        u, inv, cnt = np.unique(g_all, return_inverse=True, return_counts=True)
        gp, idp = _prefix_filter(g_all, ids_all, cnt[inv], threshold)
        # hot-gram guard over the PREFIX index (bucket-sorted)
        bstarts = np.flatnonzero(np.r_[True, gp[1:] != gp[:-1]])
        bsizes = np.diff(np.r_[bstarts, len(gp)])
        per_row = np.repeat(bsizes, bsizes)
        keep = (per_row > 1) & (per_row <= max_posting)
        pairs = _candidate_pairs(idp[keep], gp[keep].view(np.int64))
    elif n_docs is not None and n_docs > NGRAM_BROADCAST_DOCS:
        # count-join path: the vocabulary never materializes anywhere —
        # per-gram counts attach inside a gram-bucket shuffle, docs
        # prefix-filter inside an id-bucket shuffle (same _prefix_filter
        # kernel, identical tie-breaks), and pairs emit per gram bucket.
        # Three shuffles of the posting table, zero corpus-proportional
        # driver or broadcast state; every shuffle keys on hash(key) %
        # PAIR_FOLD_BUCKETS so map_groups dispatches ~256 vectorized
        # calls, not one per gram/doc (the vocabulary is unbounded at
        # this path's scale). Used only above the broadcast budget.
        posting_i64 = posting_src.map_batches(
            lambda df: _with_fold_bucket(
                (lambda out: out.assign(
                    g=out["g"].to_numpy(np.uint64).view(np.int64)
                ))(explode(df))
            ),
            batch_format="pandas",
        )

        def count_bucket(grp: pd.DataFrame) -> pd.DataFrame:
            # all rows of a gram share its fold bucket, so the in-bucket
            # bincount IS the global per-gram posting count
            codes, _ = pd.factorize(grp["g"].to_numpy(np.int64), sort=False)
            return pd.DataFrame(
                {
                    "g": grp["g"].to_numpy(np.int64),
                    "id": grp["id"].to_numpy(),
                    "n": np.bincount(codes)[codes].astype(np.int64),
                }
            )

        with_counts = posting_i64.groupby("fb").map_groups(
            count_bucket, batch_format="pandas"
        ).map_batches(
            lambda df: _with_fold_bucket(df, key="id"), batch_format="pandas"
        )

        def doc_prefix_bucket(grp: pd.DataFrame) -> pd.DataFrame:
            # _prefix_filter is already multi-doc (factorizes ids), so
            # one call covers every doc in the bucket
            gp_d, idp_d = _prefix_filter(
                grp["g"].to_numpy(np.int64).view(np.uint64),  # u64 tie-break order
                grp["id"].to_numpy(),
                grp["n"].to_numpy(np.int64),
                threshold,
            )
            return _with_fold_bucket(
                pd.DataFrame({"g": gp_d.view(np.int64), "id": idp_d})
            )

        pairs_ds = (
            with_counts.groupby("fb")
            .map_groups(doc_prefix_bucket, batch_format="pandas")
            .groupby("fb")
            .map_groups(
                lambda grp: _emit_fold_bucket_pairs(grp, max_posting),
                batch_format="pandas",
            )
        )
        pairs = _collect_pair_set(pairs_ds)
    else:
        partials = posting_ds.map_batches(
            lambda df: df.groupby("g", sort=False).size().rename("n").reset_index(),
            batch_format="pandas",
        )
        folded = _fold_counts(partials, ["g"])
        if folded.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        # broadcast the GLOBAL gram-count table (sorted arrays) so each
        # batch prefix-filters its own postings; above NGRAM_BROADCAST_DOCS
        # the count-join branch above replaces the broadcast entirely
        garr = folded["g"].to_numpy(np.uint64)
        o = np.argsort(garr)
        garr, carr = garr[o], folded["n"].to_numpy(np.int64)[o]
        cref = ray.put((garr, carr))

        def explode_filtered(df: pd.DataFrame) -> pd.DataFrame:
            gs, cs = ray.get(cref)
            out = explode(df)
            g = out["g"].to_numpy(np.uint64)
            pos = np.minimum(np.searchsorted(gs, g), max(len(gs) - 1, 0))
            gcnt = cs[pos] if len(gs) else np.zeros(len(g), np.int64)
            gp_b, idp_b = _prefix_filter(g, out["id"].to_numpy(), gcnt, threshold)
            # int64 gram key: u64 keys can mis-compare through the Ray
            # groupby shuffle; numpy-indexed result keeps columns on
            # empty batches
            return _with_fold_bucket(
                pd.DataFrame({"g": gp_b.view(np.int64), "id": idp_b})
            )

        # distributed pair enumeration: the prefix-filtered posting rows
        # shuffle ONCE by gram fold-bucket and pairs (with the hot-gram
        # guard) emit per bucket — ~256 vectorized map_groups calls, not
        # one per distinct prefix gram. The driver folds only the
        # deduped pair set.
        pairs_ds = (
            posting_src.map_batches(explode_filtered, batch_format="pandas")
            .groupby("fb")
            .map_groups(
                lambda grp: _emit_fold_bucket_pairs(grp, max_posting),
                batch_format="pandas",
            )
        )
        pairs = _collect_pair_set(pairs_ds)
    if not pairs:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    return _verified_jaccard_pairs(
        ds,
        pairs,
        id_col=id_col,
        text_col=text_col,
        gram_fn=_word_gram_batch,
        gram_arg=n,
        seed=seed,
        threshold=threshold,
    )


def word_ngram_arrays(texts: pd.Series, n: int, seed: int = 42) -> list[np.ndarray]:
    """Sorted-unique u64 word-n-gram hashes per document, vectorized
    across the batch: one factorize + one vectorized token hash, then a
    fold over n shifted hash arrays per document. Documents shorter than
    n tokens hash their full token sequence as a single gram."""
    import itertools

    s = texts.fillna("").astype(str)
    tok_lists = s.str.split()
    lens = tok_lists.map(len).to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return [np.empty(0, np.uint64) for _ in range(len(s))]
    flat = np.fromiter(itertools.chain.from_iterable(tok_lists), dtype=object, count=total)
    codes, uniques = pd.factorize(flat, sort=False)
    hs = pd.util.hash_array(
        np.asarray(uniques, dtype=object),
        hash_key=f"{seed & 0xFFFFFFFFFFFFFFFF:016x}"[:16],
        categorize=False,
    )
    tokh = hs[codes]
    offs = np.r_[0, np.cumsum(lens)]
    out: list[np.ndarray] = []
    prime = np.uint64(0x100000001B3)
    for i in range(len(s)):
        th = tokh[offs[i] : offs[i + 1]]
        if len(th) == 0:
            out.append(np.empty(0, np.uint64))
            continue
        w = min(n, len(th))
        m = len(th) - w + 1
        acc = th[:m].copy()
        with np.errstate(over="ignore"):
            for k in range(1, w):
                acc = splitmix64(acc * prime ^ th[k : m + k])
        out.append(np.unique(acc))
    return out


def _word_gram_batch(texts: pd.Series, n: int, seed: int) -> list[np.ndarray]:
    return word_ngram_arrays(texts, n, seed)


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
    return _dataset_block_refs(norm)


# embedding_neardup_pairs auto-routes to the LSH variant above this many
# input blocks: O(B²) block-pair tasks is the exact tool for oracle /
# audit scales, not the default at corpus scale (10^5 blocks at 100 TB
# would mean 5x10^9 tasks).
EXACT_NEARDUP_MAX_BLOCKS = 64


def embedding_neardup_pairs(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    max_exact_blocks: int | None = None,
) -> pd.DataFrame:
    """All pairs with cosine >= threshold — EXACT, distributed.

    Normalized vector blocks stay in the object store; one Ray task per
    block pair does the matmul + threshold and returns only matching
    pairs, so the driver materializes nothing but block REFS and the
    (tiny) result. Cost is O(B²) block pairs — exact by construction.
    Above ``max_exact_blocks`` blocks (default EXACT_NEARDUP_MAX_BLOCKS)
    the call auto-routes to ``embedding_neardup_pairs_lsh`` (bucketed,
    approximate — the scale path); pass an explicit ``max_exact_blocks``
    to force either path."""
    limit = EXACT_NEARDUP_MAX_BLOCKS if max_exact_blocks is None else max_exact_blocks
    blocks = _vec_block_refs(ds, id_col, vec_col)
    if len(blocks) > limit:
        return embedding_neardup_pairs_lsh(
            ds, vec_col=vec_col, id_col=id_col, threshold=threshold
        )
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


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components over verified pairs)
# ---------------------------------------------------------------------------


# Above this many pairs cluster_pairs auto-routes to the distributed
# label-propagation path: a driver union-find over O(pairs) Python
# objects stops being tenable when the verified pair set itself is
# corpus-sized (adversarial dup rates).
CLUSTER_DRIVER_PAIR_BUDGET = 5_000_000


def _int_ids_ok(arr: np.ndarray) -> bool:
    return arr.dtype.kind in "iu" and (not len(arr) or int(arr.min()) >= 0)


def cluster_pairs_distributed(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 64,
) -> pd.DataFrame:
    """Connected components via DISTRIBUTED hash-to-min label
    propagation with POINTER JUMPING: every node starts labeled with
    itself; each round every node's label (a) flows across its edges
    and (b) shortcuts to its label's label (lbl <- lbl[lbl], the
    doubling trick), so convergence takes O(log diameter) rounds — a
    10^6-hop chain converges in ~20, not 10^6. Every step is a
    vectorized hash join / groupby-min (no per-node UDF calls). Labels
    are monotonically non-increasing, so the global label sum strictly
    decreases until the fixpoint — the O(1) convergence test. If
    ``max_iters`` rounds pass without convergence the call RAISES
    rather than returning silently fractured components.

    Ids must be NON-NEGATIVE INTEGERS (validated; the driver union-find
    path in ``cluster_pairs`` handles arbitrary hashables). Accepts a
    pandas pair frame or a Dataset of (id_a, id_b) rows."""

    def _validated(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
        if not len(a) and not len(b):  # empty input: dtype is moot
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype=np.int64),
                    "nbr": pd.Series([], dtype=np.int64),
                }
            )
        if not (_int_ids_ok(a) and _int_ids_ok(b)):
            raise ValueError(
                "cluster_pairs_distributed requires non-negative integer ids "
                f"(got dtypes {a.dtype}/{b.dtype}); use cluster_pairs for "
                "arbitrary hashable ids"
            )
        return pd.DataFrame(
            {
                "node": np.r_[a, b].astype(np.int64),
                "nbr": np.r_[b, a].astype(np.int64),
            }
        )

    if isinstance(pairs, pd.DataFrame):
        edges = rd.from_pandas(
            _validated(pairs[id_a].to_numpy(), pairs[id_b].to_numpy())
        )
    else:
        edges = pairs.map_batches(
            lambda df: _validated(df[id_a].to_numpy(), df[id_b].to_numpy()),
            batch_format="pandas",
        )
    edges = edges.materialize()
    if not edges.count():
        return pd.DataFrame({"id": [], "rep": []})
    nparts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    # round 0 fuses init+step: label(v) = min(v, neighbors(v))
    labels = (
        edges.groupby("node")
        .aggregate(rd.aggregate.Min("nbr", alias_name="lbl"))
        .map_batches(
            lambda df: df.assign(
                lbl=np.minimum(df["node"].to_numpy(), df["lbl"].to_numpy())
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    prev_sum = None
    for _ in range(max_iters):
        cur_sum = labels.sum("lbl")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        # (a) edge propagation: ship each node's label to its neighbors
        msgs = (
            edges.join(labels, join_type="inner", num_partitions=nparts, on=("node",))
            .map_batches(
                lambda df: pd.DataFrame(
                    {"node": df["nbr"].to_numpy(), "lbl": df["lbl"].to_numpy()}
                ),
                batch_format="pandas",
            )
        )
        # (b) pointer jump: lbl <- lbl[lbl] (label-of-label)
        lhs = labels.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"].to_numpy(), "pkey": df["lbl"].to_numpy()}
            ),
            batch_format="pandas",
        )
        rhs = labels.map_batches(
            lambda df: pd.DataFrame(
                {"pkey": df["node"].to_numpy(), "plbl": df["lbl"].to_numpy()}
            ),
            batch_format="pandas",
        )
        short = lhs.join(
            rhs, join_type="inner", num_partitions=nparts, on=("pkey",)
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"].to_numpy(), "lbl": df["plbl"].to_numpy()}
            ),
            batch_format="pandas",
        )
        labels = (
            labels.union(msgs)
            .union(short)
            .groupby("node")
            .aggregate(rd.aggregate.Min("lbl", alias_name="lbl"))
            .materialize()
        )
    else:
        raise RuntimeError(
            f"label propagation did not converge within {max_iters} rounds "
            "(pointer jumping covers diameters up to ~2^rounds — this "
            "indicates a bug or pathological input, not a tuning issue)"
        )
    out = labels.to_pandas()
    out = pd.DataFrame(
        {"id": out["node"].to_numpy(), "rep": out["lbl"].to_numpy()}
    )
    return out.sort_values("id").reset_index(drop=True)


def cluster_pairs(pairs: pd.DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> pd.DataFrame:
    """Connected components over a verified near-dup pair set →
    (id, rep) with rep = the minimum id of the component — the canonical
    keep-one-per-cluster step after pair mining.

    Union-find runs on the driver below CLUSTER_DRIVER_PAIR_BUDGET: the
    VERIFIED pair set is normally the tiny output of the miners (bounded
    by bucket guards), not corpus-sized — the distributed work already
    happened upstream. Above the budget (adversarial dup rates) the call
    auto-routes to ``cluster_pairs_distributed`` when the ids qualify
    (non-negative integers — the distributed path's domain); other id
    types stay on the driver path, which handles arbitrary hashables.
    Path compression + union by rank; deterministic output sorted by
    id."""
    if (
        len(pairs) > CLUSTER_DRIVER_PAIR_BUDGET
        and _int_ids_ok(np.asarray(pairs[id_a].to_numpy()))
        and _int_ids_ok(np.asarray(pairs[id_b].to_numpy()))
    ):
        return cluster_pairs_distributed(pairs, id_a, id_b)
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs[id_a], pairs[id_b]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # deterministic: smaller root wins regardless of union order
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    ids = sorted(parent)
    return pd.DataFrame({"id": ids, "rep": [find(i) for i in ids]})


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means clustering + within-cluster prune
# ---------------------------------------------------------------------------


def semdedup_survivors(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int | None = None,
    cluster_target: int = 10_000,
    threshold: float = 0.9,
    train_sample: int = 4096,
    kmeans_iters: int = 8,
    seed: int = 42,
    max_cluster: int = 100_000,
) -> pd.DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): spherical
    k-means over the embedding column, then within each cluster drop
    every row whose cosine to ANY lower-id cluster-mate reaches
    ``threshold`` (keep-first by id — deterministic, order-free).
    Returns surviving (id, cluster), sorted by id.

    ``n_clusters`` defaults to ``max(16, n_total // cluster_target)``
    (cluster_target=10k: the paper's ~n/10k scaling — VERDICT r4 #5) so
    the default keeps mean cluster size ~cluster_target no matter the
    corpus and a 100x caller doesn't slam into ``max_cluster`` with a
    fixed k=16. Pass an explicit ``n_clusters`` to override.

    Distributed shape: centroids train on a bounded driver sample
    (``random_sample``, the IVF pattern — the paper itself clusters on a
    sample) and broadcast ONCE via ``ray.put``; assignment is one
    streaming ``map_batches`` pass; the O(m^2) pairwise prune runs
    inside ``groupby(cluster).map_groups`` so each cluster's matmul is
    one in-worker numpy call. Partitioning assumption: cluster sizes
    stay within a worker's heap — ``max_cluster`` is the loud guard,
    not a silent truncation.
    """
    empty = pd.DataFrame(
        {"id": pd.Series([], dtype=np.int64), "cluster": pd.Series([], dtype=np.int64)}
    )
    try:
        n_total = ds.count()
    except Exception:
        n_total = None
    if n_total == 0:
        return empty
    if n_clusters is None:
        # n/10k (paper scaling), floored at 16; unknown count -> floor.
        # The training sample grows with the derived k so the clamp
        # n_clusters <= len(sample) below can't silently undo it.
        n_clusters = max(16, (n_total or 0) // cluster_target)
        train_sample = max(train_sample, 4 * n_clusters)

    # --- train spherical k-means centroids on a bounded sample ---
    rng = np.random.default_rng(seed)
    vec_ds = ds.select_columns([id_col, vec_col])
    if n_total is not None and n_total > train_sample:
        frac = min(1.0, (2.0 * train_sample) / n_total)
        sample = vec_ds.random_sample(frac, seed=seed).limit(train_sample).to_pandas()
        if sample.empty:
            sample = vec_ds.limit(train_sample).to_pandas()
    else:
        sample = vec_ds.limit(train_sample).to_pandas()
    if sample.empty:
        return empty
    # canonical order: to_pandas() returns blocks in arrival order, which
    # varies run to run — positional k-means init must not inherit that
    sample = sample.sort_values(id_col)
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_clusters = min(n_clusters, len(X))
    C = X[rng.choice(len(X), size=n_clusters, replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_clusters):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    cref = ray.put(C)

    def assign_batch(df: pd.DataFrame) -> pd.DataFrame:
        Cb = ray.get(cref)
        Xb = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        Xb /= np.maximum(np.linalg.norm(Xb, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {
                "id": df[id_col].to_numpy(np.int64),
                "cluster": np.argmax(Xb @ Cb.T, axis=1).astype(np.int64),
                "vec": list(Xb),
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_cluster:
            raise ValueError(
                f"semdedup cluster {int(g['cluster'].iloc[0])} has {len(g)} rows "
                f"(> max_cluster={max_cluster}); raise n_clusters for this corpus"
            )
        g = g.sort_values("id")
        ids = g["id"].to_numpy(np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"id": ids, "cluster": g["cluster"].to_numpy(np.int64)}
            )
        G = np.stack(g["vec"].to_numpy())
        S = G @ G.T
        # drop j when any i<j has cosine >= threshold (keep-first by id)
        drop = (np.triu(S >= threshold, k=1)).any(axis=0)
        return pd.DataFrame(
            {"id": ids[~drop], "cluster": g["cluster"].to_numpy(np.int64)[~drop]}
        )

    out = (
        ds.select_columns([id_col, vec_col])
        .map_batches(assign_batch, batch_format="pandas")
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return empty
    out["id"] = out["id"].astype(np.int64)
    out["cluster"] = out["cluster"].astype(np.int64)
    return out.sort_values("id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Cross-doc duplicate n-gram density (contamination-density signal)
# ---------------------------------------------------------------------------

DUP_GRAM_BROADCAST_BUDGET = 5_000_000
DUP_GRAM_DRIVER_DOCS = 2_000_000
_GRAM_SEP = "\x1f"


def _doc_grams(
    df: pd.DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    distinct: bool = True,
) -> pd.DataFrame:
    """(doc_id, g[, rn]) literal word-n-gram rows for one batch. Grams
    are separator-joined token runs over the flattened token array
    (positions spanning two docs masked out) — elementwise object
    concat, no per-gram Python loop. With ``distinct`` (default) one
    row per distinct (doc, gram): distinct-per-batch IS
    distinct-per-doc because a document's text lives in exactly one
    row. With ``distinct=False`` every position is kept, in document
    order, with its 0-based token offset ``rn``."""
    import itertools

    s = df[text_col].fillna("").astype(str)
    tok_lists = [[w for w in t.split(" ") if w] for t in s]
    lens = np.fromiter((len(t) for t in tok_lists), np.int64, count=len(tok_lists))
    total = int(lens.sum())
    cols = {id_col: pd.Series([], dtype=np.int64), "g": pd.Series([], dtype=object)}
    if not distinct:
        cols["rn"] = pd.Series([], dtype=np.int64)
    empty = pd.DataFrame(cols)
    if total < n:
        return empty
    flat = np.fromiter(
        itertools.chain.from_iterable(tok_lists), dtype=object, count=total
    )
    doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    m = total - n + 1
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    if not valid.any():
        return empty
    g = flat[:m][valid]
    for k in range(1, n):
        g = g + _GRAM_SEP + flat[k : m + k][valid]
    dsel = doc_idx[:m][valid]
    out = {id_col: df[id_col].to_numpy(np.int64)[dsel], "g": g}
    if not distinct:
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out["rn"] = np.flatnonzero(valid) - starts[dsel]
    out = pd.DataFrame(out)
    return out.drop_duplicates() if distinct else out


def _distinct_doc_grams(
    df: pd.DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> pd.DataFrame:
    return _doc_grams(df, n, id_col, text_col, distinct=True)


def _dup_gram_fold(
    ds: rd.Dataset, n: int, id_col: str, text_col: str
) -> tuple[rd.Dataset, int, rd.Dataset | None, np.ndarray | None]:
    """Pass 1 shared by the duplicate-gram operators: stream distinct
    (doc, gram) rows into per-batch count partials and keep the grams
    seen in >= 2 distinct documents. Below ``DUP_GRAM_DRIVER_DOCS`` the
    partial stream folds on the driver (_fold_counts — a native
    string-keyed groupby costs shuffle overhead the small case never
    earns back) and the dup grams come back as a local array; above it
    a native ``groupby(gram)`` aggregate folds gram-hash-partitioned
    with no driver state and the dup grams stay a Dataset.

    Returns ``(grams, n_dup, dup_ds_or_None, dup_local_or_None)`` —
    exactly one of the last two is non-None."""
    try:
        n_docs = ds.count()  # metadata-only on parquet reads
    except Exception:
        n_docs = None

    grams = ds.map_batches(
        lambda df: _distinct_doc_grams(df, n, id_col, text_col),
        batch_format="pandas",
    )

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("g", sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = grams.map_batches(df_partial, batch_format="pandas")
    if n_docs is not None and n_docs > DUP_GRAM_DRIVER_DOCS:
        dup = (
            parts.groupby("g")
            .aggregate(rd.aggregate.Sum("n", alias_name="n"))
            .map_batches(
                lambda df: df.loc[df["n"] >= 2, ["g"]], batch_format="pandas"
            )
            .materialize()  # counted AND consumed downstream: execute once
        )
        return grams, dup.count(), dup, None
    folded = _fold_counts(parts, ["g"])
    dup_local = folded.loc[folded["n"] >= 2, "g"].to_numpy()
    return grams, len(dup_local), None, dup_local


def dup_ngram_density(
    ds: rd.Dataset,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Per-document duplicate-n-gram density: for every doc, how many of
    its DISTINCT word-n-grams appear in at least one other document —
    the contamination/duplication-density signal behind substring-dedup
    triage (Lee et al. 2022's "deduplicating training data" setting,
    computed at n-gram granularity). Returns (doc_id, n_dup_grams) for
    EVERY input doc, zeros included.

    Distributed shape: pass 1 streams distinct (doc, gram) rows into
    per-batch count partials; below ``DUP_GRAM_DRIVER_DOCS`` the partial
    stream folds on the driver (_fold_counts — a native string-keyed
    groupby costs ~40 s of shuffle overhead the small case never earns
    back), above it a native ``groupby(gram)`` aggregate folds
    gram-hash-partitioned with no driver state. Grams with df >= 2 then
    either broadcast once via ``ray.put`` (below ``broadcast_budget``)
    into a second streaming count pass, or — above budget — hash-join
    back to the (doc, gram) stream with ``Dataset.join`` and fold per
    doc, mirroring the ngram_pairs count-join fallback."""
    if broadcast_budget is None:
        broadcast_budget = DUP_GRAM_BROADCAST_BUDGET
    grams, n_dup, dup, dup_local = _dup_gram_fold(ds, n, id_col, text_col)

    # dup is None ⇔ the driver already holds the fold — broadcast is then
    # strictly cheaper than re-shipping it through a join
    if dup is None or n_dup <= broadcast_budget:
        if dup is not None:
            dup_local = (
                dup.to_pandas()["g"].to_numpy() if n_dup else np.empty(0, object)
            )
        dset_ref = ray.put(frozenset(dup_local.tolist()))

        def count_per_doc(df: pd.DataFrame) -> pd.DataFrame:
            dset = ray.get(dset_ref)
            ids = df[id_col].to_numpy(np.int64)
            gg = _distinct_doc_grams(df, n, id_col, text_col)
            hit = gg[gg["g"].isin(dset)]
            cnt = hit.groupby(id_col, sort=False).size()
            vals = (
                pd.Series(ids).map(cnt).fillna(0).to_numpy(np.int64)
                if len(cnt)
                else np.zeros(len(ids), np.int64)
            )
            return pd.DataFrame({id_col: ids, "n_dup_grams": vals})

        return ds.map_batches(count_per_doc, batch_format="pandas")

    # above-budget path: hash-join dup grams back to the (doc, gram) stream
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = grams.join(
        dup,
        join_type="inner",
        num_partitions=max(8, ncpu),
        on=("g",),
    )

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        if id_col not in df.columns:  # schemaless empty join block
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64), "c": pd.Series([], dtype=np.int64)}
            )
        out = df.groupby(id_col, sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return out

    # zero-count seed rows (one per doc) unioned with the per-doc partials,
    # folded by ONE groupby-sum — a left_outer join back to ds would be a
    # second shuffle AND trips on the schemaless empty blocks the upstream
    # aggregate emits (empty blocks bypass map_batches, so they can't be
    # re-schema'd; Arrow's hash join then can't resolve the key field)
    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "c": np.zeros(len(df), np.int64),
            }
        )

    seeded = joined.map_batches(doc_partial, batch_format="pandas").union(
        ds.map_batches(zeros, batch_format="pandas")
    )
    counts = seeded.groupby(id_col).sum("c")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "n_dup_grams": df["sum(c)"].to_numpy(np.int64),
            }
        )

    return counts.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Longest duplicated substring span (substring-dedup signal)
# ---------------------------------------------------------------------------


def dup_substring_span(
    ds: rd.Dataset,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Per-document longest duplicated token span, the substring-dedup
    triage signal of Lee et al. 2022 computed at word-n-gram
    resolution: the length in TOKENS of the longest run of consecutive
    n-grams that each occur in >= 2 distinct documents
    (``run_grams + n - 1``), 0 when the doc has no duplicated gram.
    Returns (doc_id, max_dup_span) for EVERY input doc.

    Distributed shape: pass 1 is the shared ``_dup_gram_fold`` (driver
    fold below DUP_GRAM_DRIVER_DOCS, native groupby(gram) above); pass
    2 either broadcasts the dup-gram set once via ``ray.put`` and scans
    positional grams per batch (runs computed by vectorized
    run-length encoding — no per-doc Python), or — above
    ``broadcast_budget`` — hash-joins dup grams back to the positional
    gram stream, buckets the (doc, rn) hits by hash(doc) %
    PAIR_FOLD_BUCKETS, computes in-bucket islands with numpy, and folds
    per-doc maxima through one groupby-max seeded with zero rows."""
    if broadcast_budget is None:
        broadcast_budget = DUP_GRAM_BROADCAST_BUDGET
    _, n_dup, dup, dup_local = _dup_gram_fold(ds, n, id_col, text_col)

    if dup is None or n_dup <= broadcast_budget:
        if dup is not None:
            dup_local = (
                dup.to_pandas()["g"].to_numpy() if n_dup else np.empty(0, object)
            )
        dset_ref = ray.put(frozenset(dup_local.tolist()))

        def span_per_doc(df: pd.DataFrame) -> pd.DataFrame:
            dset = ray.get(dset_ref)
            ids = df[id_col].to_numpy(np.int64)
            gg = _doc_grams(df, n, id_col, text_col, distinct=False)
            out = np.zeros(len(ids), np.int64)
            if len(gg):
                h = gg["g"].isin(dset).to_numpy()
                gid = gg[id_col].to_numpy(np.int64)
                # rn is consecutive within a doc by construction: runs
                # break exactly where the doc or the hit flag changes
                change = np.empty(len(h), bool)
                change[0] = True
                change[1:] = (gid[1:] != gid[:-1]) | (h[1:] != h[:-1])
                starts = np.flatnonzero(change)
                run_len = np.diff(np.append(starts, len(h)))
                keep = h[starts]
                if keep.any():
                    spans = pd.Series(
                        run_len[keep] + (n - 1), index=gid[starts][keep]
                    )
                    mx = spans.groupby(level=0).max()
                    out = (
                        pd.Series(ids).map(mx).fillna(0).to_numpy(np.int64)
                    )
            return pd.DataFrame({id_col: ids, "max_dup_span": out})

        return ds.map_batches(span_per_doc, batch_format="pandas")

    # above-budget path: join dup grams to positional grams, fold islands
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    pos = ds.map_batches(
        lambda df: _doc_grams(df, n, id_col, text_col, distinct=False),
        batch_format="pandas",
    )
    hits = pos.join(
        dup, join_type="inner", num_partitions=max(8, ncpu), on=("g",)
    )

    def attach_fb(df: pd.DataFrame) -> pd.DataFrame:
        if id_col not in df.columns:  # schemaless empty join block
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "rn": pd.Series([], dtype=np.int64),
                    "fb": pd.Series([], dtype=np.int64),
                }
            )
        ids = df[id_col].to_numpy(np.int64)
        fb = (splitmix64(ids.view(np.uint64)) % np.uint64(PAIR_FOLD_BUCKETS)).astype(
            np.int64
        )
        return pd.DataFrame(
            {id_col: ids, "rn": df["rn"].to_numpy(np.int64), "fb": fb}
        )

    def bucket_spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "rn"])
        ids = df[id_col].to_numpy(np.int64)
        rn = df["rn"].to_numpy(np.int64)
        brk = np.empty(len(ids), bool)
        brk[0] = True
        brk[1:] = (ids[1:] != ids[:-1]) | (rn[1:] != rn[:-1] + 1)
        starts = np.flatnonzero(brk)
        run_len = np.diff(np.append(starts, len(ids)))
        spans = pd.Series(run_len + (n - 1), index=ids[starts])
        mx = spans.groupby(level=0).max()
        return pd.DataFrame(
            {
                id_col: mx.index.to_numpy(np.int64),
                "s": mx.to_numpy(np.int64),
            }
        )

    partials = (
        hits.map_batches(attach_fb, batch_format="pandas")
        .groupby("fb")
        .map_groups(
            lambda df: bucket_spans(df.drop(columns=["fb"])),
            batch_format="pandas",
        )
    )

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "s": np.zeros(len(df), np.int64),
            }
        )

    seeded = partials.union(ds.map_batches(zeros, batch_format="pandas"))
    mx = seeded.groupby(id_col).max("s")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "max_dup_span": df["max(s)"].to_numpy(np.int64),
            }
        )

    return mx.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Incremental ingest: novel-document anti-join against a historical corpus
# ---------------------------------------------------------------------------

NOVEL_HISTORY_BROADCAST_BUDGET = 20_000_000


def _md5_keys(df: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    k = md5_hex(df[text_col].fillna("").astype(str))
    out = {"k": k.to_numpy()}
    if id_col:
        out[id_col] = df[id_col].to_numpy(np.int64)
    return pd.DataFrame(out)


def _md5_prefix64(khex: np.ndarray) -> np.ndarray:
    """int64 view of the first 16 hex chars — the bloom prefilter key
    (collisions only cost bloom false positives; the exact confirm is
    on the full digest)."""
    return (
        np.array([int(h[:16], 16) for h in khex], dtype=np.uint64)
        .view(np.int64)
    )


def novel_against_history(
    batch_ds: rd.Dataset,
    history_ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Incremental-ingest exact dedup: (id) rows of ``batch_ds`` whose
    md5(text) occurs NOWHERE in ``history_ds`` — the anti-join shape a
    daily crawl runs against the accumulated corpus. At 100 TB the
    histories dwarf the increment, so the design never shuffles the
    batch side wholesale:

    1. history folds into a fixed 128 KiB bloom bitmap (per-block
       partial bitmaps OR-merged on the driver — O(blocks), not
       O(keys), through the driver);
    2. batch rows failing the bloom are DEFINITELY novel (no false
       negatives) and emit straight from the streaming pass — at
       ingest, ~all rows take this zero-shuffle path;
    3. bloom survivors ("suspects", members + eps false positives)
       confirm exactly on the full digest: against a broadcast sorted
       key array below ``broadcast_budget`` history keys, else through
       ONE hash-bucketed shuffle of (suspect ∪ history-key) rows with a
       vectorized in-bucket membership fold (groupby-transform min —
       no join operator, no per-key dispatch).

    Bloom prefilter keys are the digest's 64-bit prefix; the confirm
    compares full digests, so output matches SQL ``NOT IN`` exactly."""
    if broadcast_budget is None:
        broadcast_budget = NOVEL_HISTORY_BROADCAST_BUDGET
    try:
        n_hist = history_ds.count()
    except Exception:
        n_hist = None

    hkeys = history_ds.map_batches(
        lambda df: _md5_keys(df, "", text_col), batch_format="pandas"
    )

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        from fairy_core_ray.pipelines.queries_ext2 import _bloom_build

        bits = _bloom_build(_md5_prefix64(df["k"].to_numpy()))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    small = n_hist is not None and n_hist <= broadcast_budget
    if small:
        # one driver pass collects the exact sorted digests AND the bloom
        frames = [
            b
            for b in hkeys.iter_batches(batch_size=None, batch_format="pandas")
            if len(b)
        ]
        keys = (
            np.sort(np.concatenate([f["k"].to_numpy() for f in frames]))
            if frames
            else np.empty(0, object)
        )
        from fairy_core_ray.pipelines.queries_ext2 import _bloom_build

        bits = _bloom_build(_md5_prefix64(keys))
        bref = ray.put((bits, keys))

        def novel_small(df: pd.DataFrame) -> pd.DataFrame:
            bm, kk = ray.get(bref)
            kb = _md5_keys(df, id_col, text_col)
            from fairy_core_ray.pipelines.queries_ext2 import _bloom_test

            cand = _bloom_test(bm, _md5_prefix64(kb["k"].to_numpy()))
            novel = ~cand
            if cand.any() and len(kk):
                sus = kb.loc[cand, "k"].to_numpy()
                p = np.minimum(np.searchsorted(kk, sus), len(kk) - 1)
                novel[np.flatnonzero(cand)[kk[p] != sus]] = True
            elif cand.any():
                novel[:] = True
            return pd.DataFrame(
                {id_col: kb[id_col].to_numpy(np.int64)[novel]}
            )

        return batch_ds.map_batches(novel_small, batch_format="pandas")

    # big-history path: partial blooms OR-fold on the driver
    from fairy_core_ray.pipelines.queries_ext2 import BLOOM_BITS, _bloom_build

    bits = np.zeros(BLOOM_BITS // 64, np.uint64)
    for b in hkeys.map_batches(bloom_partial, batch_format="pandas").iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        for raw in b["bits"]:
            bits |= np.frombuffer(raw, np.uint64)
    bref = ray.put(bits)

    def split_batch(df: pd.DataFrame) -> pd.DataFrame:
        """Emit definite-novel ids (s=2) and suspects (s=1) in one pass."""
        from fairy_core_ray.pipelines.queries_ext2 import _bloom_test

        kb = _md5_keys(df, id_col, text_col)
        cand = _bloom_test(bref_get(), _md5_prefix64(kb["k"].to_numpy()))
        out = kb.copy()
        out["s"] = np.where(cand, np.int64(1), np.int64(2))
        return out

    def bref_get():
        return ray.get(bref)

    tagged = batch_ds.map_batches(split_batch, batch_format="pandas")
    definite = tagged.map_batches(
        lambda df: df.loc[df["s"] == 2, [id_col]], batch_format="pandas"
    )
    suspects = tagged.map_batches(
        lambda df: df.loc[df["s"] == 1, [id_col, "k", "s"]],
        batch_format="pandas",
    )
    hist_rows = hkeys.map_batches(
        lambda df: pd.DataFrame(
            {
                id_col: np.full(len(df), -1, np.int64),
                "k": df["k"].to_numpy(),
                "s": np.zeros(len(df), np.int64),
            }
        ),
        batch_format="pandas",
    )

    def attach_fb(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_prefix64(df["k"].to_numpy()).view(np.uint64)
        df = df.copy()
        df["fb"] = (splitmix64(h) % np.uint64(PAIR_FOLD_BUCKETS)).astype(np.int64)
        return df

    def bucket_novel(df: pd.DataFrame) -> pd.DataFrame:
        has_hist = df.groupby("k")["s"].transform("min")  # 0 iff history row
        m = (df["s"] == 1) & (has_hist == 1)
        return pd.DataFrame({id_col: df.loc[m, id_col].to_numpy(np.int64)})

    confirmed = (
        suspects.union(hist_rows)
        .map_batches(attach_fb, batch_format="pandas")
        .groupby("fb")
        .map_groups(
            lambda df: bucket_novel(df.drop(columns=["fb"])),
            batch_format="pandas",
        )
    )
    return definite.union(confirmed)


# ---------------------------------------------------------------------------
# Quality-aware near-dup survivor selection (keep BEST per cluster)
# ---------------------------------------------------------------------------


def best_per_cluster_survivors(
    ds: rd.Dataset,
    clusters: pd.DataFrame,
    *,
    id_col: str,
    quality_col: str,
) -> rd.Dataset:
    """Survivor set when near-dup clusters keep their HIGHEST-quality
    member (ties → smaller id) instead of keep-first — the curation
    policy production dedup actually wants (keep the longest / best-
    scored page, drop the mirrors). ``clusters`` is the (id, rep)
    table from cluster_pairs; ``ds`` must carry ``id_col`` and
    ``quality_col`` for at least the clustered ids.

    Shape: the member→rep map broadcasts once (cluster members are the
    near-dup minority — bounded in any curated corpus; the >5M-pairs
    regime composes cluster_pairs_distributed the same way and folds
    the per-rep argmax in hash buckets); one streaming pass collects
    member qualities as per-batch partials; the driver folds the
    bounded (rep → best) argmax; the loser set broadcasts into a
    second zero-shuffle streaming filter over the full corpus."""
    if not len(clusters):
        return ds.select_columns([id_col])
    member_rep = dict(
        zip(clusters["id"].astype(np.int64), clusters["rep"].astype(np.int64))
    )
    mref = ray.put(member_rep)

    def member_quality(df: pd.DataFrame) -> pd.DataFrame:
        mr = ray.get(mref)
        ids = df[id_col].to_numpy(np.int64)
        m = np.fromiter((i in mr for i in ids), bool, count=len(ids))
        sub_ids = ids[m]
        q = df[quality_col].to_numpy()  # native dtype: float scores must
        if not np.issubdtype(q.dtype, np.number):  # not truncate to int
            raise TypeError(
                f"quality_col {quality_col!r} must be numeric, got {q.dtype}"
            )
        return pd.DataFrame(
            {
                "rep": np.fromiter(
                    (mr[i] for i in sub_ids), np.int64, count=len(sub_ids)
                ),
                "id": sub_ids,
                "q": q[m],
            }
        )

    frames = [
        b
        for b in ds.map_batches(member_quality, batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"
        )
        if len(b)
    ]
    mq = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame({"rep": [], "id": [], "q": []})
    )
    # per-rep argmax: quality desc, id asc
    mq = mq.sort_values(["rep", "q", "id"], ascending=[True, False, True])
    best = set(mq.groupby("rep", sort=False).head(1)["id"].astype(np.int64))
    losers = frozenset(i for i in member_rep if i not in best)
    lref = ray.put(losers)

    def keep(t: pa.Table) -> pa.Table:
        drop = ray.get(lref)
        ids = t[id_col].to_numpy().astype(np.int64)
        m = ~np.fromiter((i in drop for i in ids), bool, count=len(ids))
        return t.select([id_col]).filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Duplicated-substring REMOVAL (Lee et al. 2022's cut step)
# ---------------------------------------------------------------------------


def remove_dup_substrings(
    ds: rd.Dataset,
    *,
    n: int = 3,
    min_span: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """The removal step of substring dedup (Lee et al. 2022): cut from
    every document the token runs covered by consecutive duplicated
    n-grams (each gram in >= 2 distinct docs) spanning >= ``min_span``
    tokens, and re-join the remaining tokens with single spaces.
    Returns (doc_id, text_clean) for every doc — whitespace-normalized
    (split on ' ', empties dropped), '' when everything was cut.

    Shape: pass 1 is the shared ``_dup_gram_fold``; pass 2 broadcasts
    the dup-gram set and, per batch, marks cut intervals with a
    vectorized +1/-1 prefix-sum over the flattened token array (run
    detection identical to dup_substring_span); reconstruction is one
    C-level ' '.join per doc. The >broadcast-budget regime (dup-gram
    set larger than ``broadcast_budget``) is NOT implemented — it
    would route through the span operator's join/bucket machinery to
    find affected docs first — so rather than silently OOM the driver
    / object store on a huge broadcast, the guard below fails loudly
    (same posture as SemDeDup's ``max_cluster`` guard)."""
    if broadcast_budget is None:
        broadcast_budget = DUP_GRAM_BROADCAST_BUDGET
    _, n_dup, dup, dup_local = _dup_gram_fold(ds, n, id_col, text_col)
    if n_dup > broadcast_budget:
        raise ValueError(
            f"remove_dup_substrings: dup-gram set ({n_dup}) exceeds the "
            f"broadcast budget ({broadcast_budget}); the join-path "
            "fallback is not implemented for the removal step — raise "
            "broadcast_budget only if the driver/object store can hold "
            "the set, or pre-filter docs with dup_substring_span"
        )
    if dup is not None:
        dup_local = (
            dup.to_pandas()["g"].to_numpy() if n_dup else np.empty(0, object)
        )
    dset_ref = ray.put(frozenset(dup_local.tolist()))

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        import itertools

        dset = ray.get(dset_ref)
        ids = df[id_col].to_numpy(np.int64)
        s = df[text_col].fillna("").astype(str)
        tok_lists = [[w for w in t.split(" ") if w] for t in s]
        lens = np.fromiter(
            (len(t) for t in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        flat = np.fromiter(
            itertools.chain.from_iterable(tok_lists), dtype=object, count=total
        )
        drop = np.zeros(total + 1, np.int64)  # +1/-1 interval marks
        gg = _doc_grams(df, n, id_col, text_col, distinct=False)
        if len(gg):
            h = gg["g"].isin(dset).to_numpy()
            gid = gg[id_col].to_numpy(np.int64)
            rn = gg["rn"].to_numpy(np.int64)
            change = np.empty(len(h), bool)
            change[0] = True
            change[1:] = (gid[1:] != gid[:-1]) | (h[1:] != h[:-1])
            starts = np.flatnonzero(change)
            run_len = np.diff(np.append(starts, len(h)))
            keep = h[starts] & (run_len + (n - 1) >= min_span)
            if keep.any():
                doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                # batch-local doc row of each run start (ids may be unsorted)
                dsel = gid[starts][keep]
                id_to_row = {int(i): r for r, i in enumerate(ids)}
                rows = np.fromiter(
                    (id_to_row[int(i)] for i in dsel), np.int64, count=len(dsel)
                )
                lo = doc_starts[rows] + rn[starts][keep]
                hi = lo + run_len[keep] + (n - 1)
                np.add.at(drop, lo, 1)
                np.add.at(drop, hi, -1)
        kept = ~(np.cumsum(drop[:-1]) > 0)
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        k_flat, k_doc = flat[kept], doc_idx[kept]
        # doc_idx ascends, so per-doc slices come from one searchsorted
        bounds = np.searchsorted(k_doc, np.arange(len(ids) + 1))
        out = [
            " ".join(k_flat[bounds[r] : bounds[r + 1]])
            for r in range(len(ids))
        ]
        return pd.DataFrame({id_col: ids, "text_clean": out})

    return ds.map_batches(cut, batch_format="pandas")
