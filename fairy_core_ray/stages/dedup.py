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
     skipped (hot-key guard), and the n-gram path prefix-filters each
     doc's posting list (PPJoin principle — exact recall, far fewer
     candidates);
  4. verification is EXACT and distributed: candidate texts broadcast
     once, contiguous pair chunks fan out as Ray tasks (the candidate
     set is tiny vs the corpus).

Below SMALL_SKETCH_DOCS the bucket-count/filter steps fold locally on
the driver after ONE distributed sketch pass (each extra Ray execution
costs ~0.5-1.5 s fixed); above it they run as distributed partial-count
folds plus a filtered second pass.
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

        allp = pd.concat(
            list(
                ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_size=None, batch_format="pandas"
                )
            ),
            ignore_index=True,
        )
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


# Below this many documents the whole (band, bh, id) sketch table —
# bands x docs tiny rows — is pulled once to the driver and the bucket
# count / collision filter / pair enumeration run as local numpy.
# Above it, bucket counts fold distributedly and a second filtered pass
# selects collided rows (the shuffle still only moves sketch rows).
# Rationale: every extra Ray execution costs ~0.5-1.5 s of fixed
# overhead at 32 CPUs — 3 executions of sub-second work is slower than
# one execution plus a 100k-row local fold.
SMALL_SKETCH_DOCS = 500_000


def _filter_buckets(sk: pd.DataFrame, max_bucket: int) -> tuple[pd.DataFrame, np.ndarray]:
    """Keep sketch rows in buckets of size in (1, max_bucket]; returns
    (filtered rows, their combined bucket key), both bucket-sorted."""
    comb = _combine_band_key(sk["band"].to_numpy(np.int64), sk["bh"].to_numpy(np.int64))
    order = np.argsort(comb, kind="stable")
    comb = comb[order]
    starts = np.flatnonzero(np.r_[True, comb[1:] != comb[:-1]])
    sizes = np.diff(np.r_[starts, len(comb)])
    per_row_size = np.repeat(sizes, sizes)
    keep = (per_row_size > 1) & (per_row_size <= max_bucket)
    return sk.iloc[order[keep]], comb[keep]


def _bucket_bounds(comb_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    starts = np.flatnonzero(np.r_[True, comb_sorted[1:] != comb_sorted[:-1]])
    return starts, np.r_[starts[1:], len(comb_sorted)]


def _candidate_pairs(ids_all: np.ndarray, comb_sorted: np.ndarray) -> set[tuple]:
    """Distinct unordered id pairs per bucket (bucket-sorted input)."""
    starts, ends = _bucket_bounds(comb_sorted)
    pairs: set[tuple] = set()
    for s, e in zip(starts, ends):
        ids = np.unique(ids_all[s:e])
        if len(ids) < 2:
            continue
        iu, ju = np.triu_indices(len(ids), 1)
        pairs.update(zip(ids[iu].tolist(), ids[ju].tolist()))
    return pairs


def _fetch_texts(ds: rd.Dataset, ids: set, id_col: str, text_col: str) -> dict:
    """{id: text} for a (small) candidate id set via a broadcast-filter
    scan — the only content fetched during verification."""
    ref = ray.put(ids)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(ref)
        return df[df[id_col].isin(wanted)][[id_col, text_col]]

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(fetch, batch_format="pandas")
        .to_pandas()
        .set_index(id_col)[text_col]
        .to_dict()
    )


@ray.remote
def _jaccard_chunk(texts: dict, pairs_chunk: list, gram_batch_fn, gram_arg: int, seed: int):
    """Exact jaccard for one chunk of candidate pairs. Gram arrays
    (sorted-unique u64) are computed ONCE per distinct doc in the chunk
    with the batch kernel, then pairs intersect with numpy."""
    ids = sorted({i for p in pairs_chunk for i in p})
    arrs = gram_batch_fn(
        pd.Series([str(texts.get(i, "")) for i in ids]), gram_arg, seed
    )
    cache = dict(zip(ids, arrs))
    out = []
    for a, b in pairs_chunk:
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
    """Distributed exact-jaccard verification: candidate texts broadcast
    once, pairs split into contiguous chunks (sorted, so chunks share
    left ids and the per-task gram cache hits), one Ray task each."""
    texts = _fetch_texts(ds, {i for p in pairs for i in p}, id_col, text_col)
    tref = ray.put(texts)
    ordered = sorted(pairs)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nchunk = max(1, min(ncpu * 2, (len(ordered) + 255) // 256))
    bounds = np.linspace(0, len(ordered), nchunk + 1).astype(int)
    tasks = [
        _jaccard_chunk.remote(tref, ordered[s:e], gram_fn, gram_arg, seed)
        for s, e in zip(bounds[:-1], bounds[1:])
        if e > s
    ]
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
        # one distributed sketch pass; bucket count + collision filter
        # run locally on the tiny (bands x docs)-row table
        sk, comb = _filter_buckets(sketch_ds.to_pandas(), max_bucket)
    else:
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

        sk = sketch_src.map_batches(
            lambda df: keep_collided(sketch(df)), batch_format="pandas"
        ).to_pandas()
        sk, comb = _filter_buckets(sk, max_bucket)
    pairs = _candidate_pairs(sk["id"].to_numpy(), comb)
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
        sk, comb = _filter_buckets(sketch_ds.to_pandas(), max_bucket)
    else:
        partials = sketch_ds.map_batches(
            lambda df: df.groupby(["band", "bh"], sort=False).size().rename("n").reset_index(),
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
        sk, comb = _filter_buckets(sk, max_bucket)
    # per-bucket vectorized verification: one popcount matrix per bucket
    # instead of a Python loop with an array allocation per pair
    ids_all, sh_all = sk["id"].to_numpy(), sk["sh"].to_numpy(np.int64)
    starts, ends = _bucket_bounds(comb)
    hams: dict[tuple, int] = {}
    for s, e in zip(starts, ends):
        bid, first_idx = np.unique(ids_all[s:e], return_index=True)
        m = len(bid)
        if m < 2:
            continue
        bsh = sh_all[s:e][first_idx]
        D = hamming64(bsh[:, None], bsh[None, :])
        iu, ju = np.triu_indices(m, 1)
        d = D[iu, ju]
        ok = d <= max_hamming
        for a, b, h in zip(bid[iu[ok]].tolist(), bid[ju[ok]].tolist(), d[ok].tolist()):
            hams[(a, b) if a < b else (b, a)] = int(h)
    out = sorted(hams)
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
    else:
        partials = posting_ds.map_batches(
            lambda df: df.groupby("g", sort=False).size().rename("n").reset_index(),
            batch_format="pandas",
        )
        folded = _fold_counts(partials, ["g"])
        if folded.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        # broadcast the GLOBAL gram-count table (sorted arrays) so each
        # batch prefix-filters its own postings; at corpus scales where
        # this table itself outgrows a broadcast, the rank computation
        # moves into the posting build as a count-join — same principle
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
            # numpy-indexed result keeps columns on empty batches
            return pd.DataFrame({"g": gp_b, "id": idp_b})

        posted = posting_src.map_batches(explode_filtered, batch_format="pandas").to_pandas()
        gp = posted["g"].to_numpy(np.uint64)
        idp = posted["id"].to_numpy()
        o2 = np.argsort(gp, kind="stable")
        gp, idp = gp[o2], idp[o2]
    # hot-gram guard over the PREFIX index (bucket-sorted)
    bstarts = np.flatnonzero(np.r_[True, gp[1:] != gp[:-1]])
    bsizes = np.diff(np.r_[bstarts, len(gp)])
    per_row = np.repeat(bsizes, bsizes)
    keep = (per_row > 1) & (per_row <= max_posting)
    ids_sorted = idp[keep]
    comb = gp[keep].view(np.int64)
    pairs = _candidate_pairs(ids_sorted, comb)
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


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components over verified pairs)
# ---------------------------------------------------------------------------


def cluster_pairs(pairs: pd.DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> pd.DataFrame:
    """Connected components over a verified near-dup pair set →
    (id, rep) with rep = the minimum id of the component — the canonical
    keep-one-per-cluster step after pair mining.

    Union-find runs on the driver: the VERIFIED pair set is the tiny
    output of the miners (bounded by bucket guards), not corpus-sized —
    the distributed work already happened upstream. Path compression +
    union by rank; deterministic output sorted by id."""
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
