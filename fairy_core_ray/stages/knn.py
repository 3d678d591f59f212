"""Similarity search: brute-force cosine top-k, LSH-bucketed ANN, and
Hamming top-k over phash (the north rule's kNN over phash+cell keys).

Scale pattern: queries are the broadcast small side (``ray.put`` once,
read in every task); each batch computes a vectorized partial top-k
(numpy matmul / SWAR popcount); partials are tiny (k rows per query per
batch) and merge associatively — a driver fold here, a second-level
``groupby(query).map_groups`` merge on a real cluster when the partial
count itself is large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from fairy_core_ray.functions.hashing import hamming64, hash_u64


def _merge_topk(parts: list[pd.DataFrame], k: int, by: str, ascending: bool) -> pd.DataFrame:
    if not parts:
        return pd.DataFrame()
    allp = pd.concat(parts, ignore_index=True)
    allp = allp.sort_values(["query_id", by, "neighbor_id"],
                            ascending=[True, ascending, True], kind="mergesort")
    return allp.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def cosine_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact top-k by cosine similarity: (query_id, neighbor_id, cosine).

    Deterministic tie-break: higher cosine first, then smaller
    neighbor_id.
    """
    Q = np.asarray(queries, dtype=np.float64)
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qref = ray.put((Q, list(query_ids)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        Qm, qids = ray.get(qref)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = Qm @ X.T  # (nq, nb)
        ids = df[id_col].to_numpy()
        rows = []
        kk = min(k + (1 if exclude_self else 0), S.shape[1])
        for qi in range(S.shape[0]):
            top = np.argpartition(-S[qi], kk - 1)[:kk]
            for t in top:
                rows.append((qids[qi], ids[t], S[qi, t]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    parts = [
        b
        for b in ds.select_columns([id_col, vec_col])
        .map_batches(partial, batch_format="pandas")
        .iter_batches(batch_size=None, batch_format="pandas")
    ]
    merged = _merge_topk(parts, k + (1 if exclude_self else 0), "cosine", ascending=False)
    if exclude_self:
        merged = merged[merged["query_id"] != merged["neighbor_id"]]
        merged = merged.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return merged


def lsh_cosine_ann(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane LSH (Charikar 2002) — the
    scale path. Each table hashes vectors to a signature bucket; only
    vectors sharing a bucket with a query (in any table) are scored.

    Returns the same schema as cosine_topk plus recall-limited results
    (may return < k neighbors for isolated queries).
    """
    dim = np.asarray(queries).shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    Q = np.asarray(queries, dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    pow2 = 1 << np.arange(n_planes)
    q_sigs = ((np.einsum("tpd,qd->tqp", planes, Qn) > 0) * pow2).sum(axis=2)  # (T, nq)
    bucket_sets = [set(q_sigs[t].tolist()) for t in range(n_tables)]
    ref = ray.put((planes, Qn, list(query_ids), bucket_sets))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pl, Qm, qids, buckets = ray.get(ref)
        X = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sigs = ((np.einsum("tpd,nd->tnp", pl, Xn) > 0) * pow2).sum(axis=2)  # (T, n)
        cand = np.zeros(len(Xn), dtype=bool)
        for t in range(sigs.shape[0]):
            cand |= np.isin(sigs[t], list(buckets[t]))
        if not cand.any():
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        Xc = Xn[cand]
        ids = df[id_col].to_numpy()[cand]
        S = Qm @ Xc.T
        rows = []
        kk = min(k + 1, S.shape[1])
        for qi in range(S.shape[0]):
            top = np.argpartition(-S[qi], kk - 1)[:kk] if S.shape[1] > kk else range(S.shape[1])
            for t2 in top:
                rows.append((qids[qi], ids[t2], S[qi, t2]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    parts = [
        b
        for b in ds.select_columns([id_col, vec_col])
        .map_batches(partial, batch_format="pandas")
        .iter_batches(batch_size=None, batch_format="pandas")
    ]
    merged = _merge_topk(parts, k + (1 if exclude_self else 0), "cosine", ascending=False)
    if merged.empty:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
    if exclude_self:
        merged = merged[merged["query_id"] != merged["neighbor_id"]]
        merged = merged.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return merged


def hamming_topk(
    ds: rd.Dataset,
    query_hashes: list[int],
    *,
    phash_col: str = "phash",
    id_col: str,
    k: int = 5,
) -> pd.DataFrame:
    """Top-k nearest by Hamming distance on 64-bit hashes:
    (query_id, neighbor_id, hamming). Tie-break: smaller distance, then
    smaller neighbor_id. query_id is the query hash itself."""
    qarr = np.array(query_hashes, dtype=np.int64)
    qref = ray.put(qarr)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qs = ray.get(qref)
        ph = df[phash_col].to_numpy(np.int64)
        ids = df[id_col].to_numpy()
        rows = []
        for qi, q in enumerate(qs):
            d = hamming64(np.full(len(ph), q, np.int64), ph)
            kk = min(k, len(d))
            top = np.argpartition(d, kk - 1)[:kk]
            for t in top:
                rows.append((int(q), ids[t], int(d[t])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "hamming"])

    parts = [
        b
        for b in ds.select_columns([id_col, phash_col])
        .map_batches(partial, batch_format="pandas")
        .iter_batches(batch_size=None, batch_format="pandas")
    ]
    return _merge_topk(parts, k, "hamming", ascending=True)


def cell_hamming_knn(
    ds: rd.Dataset,
    *,
    cell_col: str = "cell",
    phash_col: str = "phash",
    id_col: str = "image_id",
    k: int = 3,
) -> rd.Dataset:
    """Per-cell kNN over phash (north rule: kNN over phash+cell composite
    keys): within each spatial cell, each image's k nearest neighbors by
    Hamming distance. groupby(cell) shuffle + vectorized per-group
    all-pairs popcount (cells are small by construction; hot cells are
    bounded by the tile-assignment salting upstream)."""

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        ph = g[phash_col].to_numpy(np.int64)
        ids = g[id_col].to_numpy()
        n = len(g)
        if n == 1:
            return pd.DataFrame(
                {"cell": g[cell_col].iloc[:0], id_col: [], "neighbor_id": [], "hamming": []}
            )
        x = ph.astype(np.uint64)
        D = np.bitwise_xor(x[:, None], x[None, :])
        # SWAR popcount on the matrix
        from fairy_core_ray.functions.hashing import popcount64

        H = popcount64(D.ravel()).reshape(n, n)
        np.fill_diagonal(H, 1 << 30)
        kk = min(k, n - 1)
        rows = []
        order = np.argsort(H, axis=1, kind="stable")
        for i in range(n):
            for j in order[i, :kk]:
                rows.append((g[cell_col].iloc[0], ids[i], ids[j], int(H[i, j])))
        return pd.DataFrame(rows, columns=["cell", id_col, "neighbor_id", "hamming"])

    return ds.select_columns([cell_col, id_col, phash_col]).groupby(cell_col).map_groups(
        per_cell, batch_format="pandas"
    )
