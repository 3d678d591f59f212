"""Text-analysis stages for large-scale training-data pipelines.

No reference equivalent (fairy-core is tabular-only) — these are the
text operators the task brief mandates as first-class components:
language-ID (n-gram heuristic), quality scoring, token counting, and
document fingerprinting. All are stateless vectorized ``map_batches``
stages (regexes compiled once per actor via callable classes where
profitable); nothing materializes the corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_SPLIT_RE = re.compile(r"\s+")
WORD_RE = re.compile(r"[A-Za-z0-9_']+")
PUNCT_RE = re.compile(r"[^\w\s]")
WORD_CHAR_RE = re.compile(r"[A-Za-z0-9_']")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)
# whole-word stopword occurrences in ONE C-level pass: the lookarounds
# pin each alternative to a full WORD_RE run, so the count equals
# sum(w in STOPWORDS for w in findall(WORD_RE)) regardless of
# alternation order (only the exact full word satisfies both bounds)
STOPWORD_RE = re.compile(
    r"(?<![A-Za-z0-9_'])(?:" + "|".join(sorted(STOPWORDS)) + r")(?![A-Za-z0-9_'])"
)

# tiny trigram profiles per language for the heuristic language-ID.
# Deterministic, hand-rolled; a real system would load fasttext here —
# the actor-pool plumbing is identical.
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", " th", "he ", " of", "of ", " to"),
    "es": ("de ", " de", "la ", " la", "os ", "ión", " el", "el ", "que", " qu"),
    "de": ("der", "die", "und", " un", "sch", "ein", "ich", "en ", "ch ", " di"),
    "fr": ("le ", " le", "es ", "de ", " de", "ent", " la", "la ", "ion", "que"),
    "zh": ("de5", "shi", "zho", "ong", "ang", "ian", "eng", "ing", "uan", "hao"),
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count, matching SQL
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` (0 for blank)."""
    stripped = texts.fillna("").astype(str).str.strip()
    counts = stripped.str.split(TOKEN_SPLIT_RE).map(len).to_numpy(np.int64)
    counts[stripped.eq("").to_numpy()] = 0
    return counts


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Quality-scoring features: length, token count, punctuation ratio,
    stopword ratio, mean word length."""
    s = texts.fillna("").astype(str)
    n_chars = s.str.len().to_numpy(np.int64)
    n_tokens = token_count(s)
    n_punct = s.str.count(PUNCT_RE).to_numpy(np.int64)
    # stop/word-length ratios without per-row Python: WORD_RE matches
    # are maximal word-char runs, so the total matched length is the
    # word-char count and the stopword hits come from one anchored
    # alternation scan (all three are C-level Series.str.count passes)
    s_low = s.str.lower()
    n_words = s_low.str.count(WORD_RE).to_numpy(np.int64)
    n_word_chars = s_low.str.count(WORD_CHAR_RE).to_numpy(np.int64)
    n_stop = s_low.str.count(STOPWORD_RE).to_numpy(np.int64)
    stop_ratio = n_stop / np.maximum(1, n_words)
    mean_word_len = np.where(
        n_words > 0, n_word_chars / np.maximum(1, n_words), 0.0
    )
    punct_ratio = n_punct / np.maximum(1, n_chars)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "mean_word_len": mean_word_len,
        }
    )


def quality_score(feats: pd.DataFrame) -> np.ndarray:
    """Composite [0,1] quality score (deterministic heuristic)."""
    length_ok = np.clip(feats["n_tokens"].to_numpy() / 50.0, 0.0, 1.0)
    punct_ok = 1.0 - np.clip(feats["punct_ratio"].to_numpy() * 5.0, 0.0, 1.0)
    word_ok = np.clip((feats["mean_word_len"].to_numpy() - 1.0) / 5.0, 0.0, 1.0)
    return (0.4 * length_ok + 0.3 * punct_ok + 0.3 * word_ok).astype(np.float64)


class LangId:
    """Heuristic trigram language-ID (actor-pool stage: patterns compiled
    once per actor). Returns the best-scoring language and its score;
    'und' when no profile trigram occurs.

    Scoring is vectorized ACROSS the batch: one compiled-regex
    ``Series.str.count`` pass per (lang, gram) — 50 C-level scans of the
    batch instead of 50 Python scans per document. Non-overlapping count
    semantics match ``str.count``; ties keep the first language in
    profile order (same as the scalar loop it replaced)."""

    def __init__(self):
        self.langs = list(_LANG_PROFILES)
        self.patterns = [
            (li, float(len(grams) - i), re.compile(re.escape(g)))
            for li, (_lang, grams) in enumerate(_LANG_PROFILES.items())
            for i, g in enumerate(grams)
        ]

    def predict(self, texts: pd.Series) -> tuple[list[str], np.ndarray]:
        n = len(texts)
        if n == 0:
            return [], np.zeros(0, dtype=np.float64)
        s = texts.fillna("").astype(str).str.lower()
        mat = np.zeros((n, len(self.langs)), dtype=np.float64)
        for li, w, pat in self.patterns:
            mat[:, li] += w * s.str.count(pat).to_numpy(np.float64)
        best_idx = mat.argmax(axis=1)  # first max wins, like the old strict >
        best = mat[np.arange(n), best_idx]
        langs = [
            self.langs[i] if v > 0 else "und" for i, v in zip(best_idx, best)
        ]
        return langs, np.where(best > 0, best, 0.0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs, scores = self.predict(batch["text"])
        batch = batch.copy()
        batch["lang_pred"] = langs
        batch["lang_score"] = scores
        return batch


def rolling_fingerprint(texts: pd.Series, window: int = 8, keep: int = 4) -> list[list[int]]:
    """Winnowing-style document fingerprint: every ``window``-byte window
    is hashed with a weighted-sum + SplitMix64 finalizer (the same kernel
    family as stages/dedup.char_shingles_u64), keep the ``keep`` smallest
    distinct hashes (sorted). Fully numpy — sliding_window_view over the
    document bytes, no per-byte Python. Deterministic; values masked to
    63 bits so they stay int64-safe."""
    from numpy.lib.stride_tricks import sliding_window_view

    from fairy_core_ray.functions.hashing import splitmix64

    MASK63 = np.uint64((1 << 63) - 1)
    weights = np.uint64(2654435761) ** np.arange(window, dtype=np.uint64)
    out: list[list[int]] = []
    for t in texts.fillna("").astype(str):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) == 0:
            out.append([])
            continue
        with np.errstate(over="ignore"):
            if len(b) < window:
                h = splitmix64(
                    np.array([(b.astype(np.uint64) * weights[: len(b)]).sum()])
                )
            else:
                win = sliding_window_view(b, window).astype(np.uint64)
                h = splitmix64((win * weights).sum(axis=1))
        hs = np.unique(h & MASK63)  # sorted distinct
        out.append([int(x) for x in hs[:keep]])
    return out


def hash_bytes(b: bytes) -> int:
    """Single-value companion of rolling_fingerprint's short-doc path."""
    from fairy_core_ray.functions.hashing import splitmix64

    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    weights = np.uint64(2654435761) ** np.arange(len(arr), dtype=np.uint64)
    with np.errstate(over="ignore"):
        return int(splitmix64(np.array([(arr * weights).sum()]))[0] & np.uint64((1 << 63) - 1))


# ---------------------------------------------------------------------------
# Corpus word-frequency stats per document (CCNet-style rarity signal)
# ---------------------------------------------------------------------------

WFS_DRIVER_DOCS = 2_000_000
WFS_BROADCAST_BUDGET = 5_000_000


def word_freq_stats(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_budget: int | None = None,
):
    """Per-document corpus-frequency statistics — the integer-exact core
    of a CCNet/KenLM-style rarity/quality signal: for every doc,
    ``n_tokens`` (single-space split, empties dropped), ``sum_freq``
    (sum over its token occurrences of that token's corpus-wide count)
    and ``min_freq`` (its rarest token's count). sum_freq/n_tokens is
    the mean token frequency (common-word-heavy docs score high, docs
    of rare tokens low); all three are integers so a SQL oracle matches
    bit-for-bit — no float log-sum ordering hazard.

    Distributed shape mirrors word_topk + dup_ngram_density: pass 1
    folds per-batch factorize/bincount partials into corpus counts
    (driver fold below WFS_DRIVER_DOCS, native groupby(word) above);
    pass 2 broadcasts the vocabulary once via ``ray.put`` and scores
    each batch with np.add.at / np.minimum.at (no per-doc Python), or —
    above ``broadcast_budget`` vocab entries — hash-joins counts back
    to the exploded (doc, word) stream and folds one seeded
    groupby-sum/min."""
    import itertools

    import pyarrow as pa
    import ray
    import ray.data as rd

    if broadcast_budget is None:
        broadcast_budget = WFS_BROADCAST_BUDGET
    try:
        n_docs = ds.count()
    except Exception:
        n_docs = None

    def words_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"w": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)}
        )
        s = df[text_col].fillna("").astype(str)
        tok_lists = s.str.split(" ")
        total = int(tok_lists.map(len).sum())
        if total == 0:
            return empty
        flat = np.fromiter(
            itertools.chain.from_iterable(tok_lists), dtype=object, count=total
        )
        flat = flat[flat != ""]
        if not len(flat):
            return empty
        codes, uniq = pd.factorize(flat, sort=False)
        return pd.DataFrame({"w": uniq, "n": np.bincount(codes).astype(np.int64)})

    parts = ds.map_batches(words_partial, batch_format="pandas")
    if n_docs is not None and n_docs > WFS_DRIVER_DOCS:
        cnt_ds = (
            parts.groupby("w")
            .aggregate(rd.aggregate.Sum("n", alias_name="n"))
            .materialize()
        )
        n_vocab = cnt_ds.count()
        cnt_local = None
    else:
        frames = list(parts.iter_batches(batch_size=None, batch_format="pandas"))
        allp = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {"w": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)}
            )
        )
        cnt_local = allp.groupby("w", sort=False)["n"].sum()
        n_vocab, cnt_ds = len(cnt_local), None

    def doc_tokens(df: pd.DataFrame):
        """(ids, lens, flat, doc_idx) — flat tokens with per-doc index."""
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
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        return ids, lens, flat, doc_idx

    if cnt_ds is None or n_vocab <= broadcast_budget:
        if cnt_ds is not None:
            cf = cnt_ds.to_pandas()
            cnt_local = cf.set_index("w")["n"] if len(cf) else pd.Series(dtype=np.int64)
        ref = ray.put(cnt_local)

        def score(df: pd.DataFrame) -> pd.DataFrame:
            cnts = ray.get(ref)
            ids, lens, flat, doc_idx = doc_tokens(df)
            sums = np.zeros(len(ids), np.int64)
            mins = np.zeros(len(ids), np.int64)
            if len(flat):
                c = pd.Series(flat).map(cnts).to_numpy(np.int64)
                np.add.at(sums, doc_idx, c)
                mins = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
                np.minimum.at(mins, doc_idx, c)
                mins[lens == 0] = 0
            return pd.DataFrame(
                {
                    id_col: ids,
                    "n_tokens": lens,
                    "sum_freq": sums,
                    "min_freq": mins,
                }
            )

        return ds.map_batches(score, batch_format="pandas")

    # above-budget path: explode (doc, w) rows, join counts, seeded fold
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, lens, flat, doc_idx = doc_tokens(df)
        return pd.DataFrame({id_col: ids[doc_idx], "w": flat})

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = ds.map_batches(explode, batch_format="pandas").join(
        cnt_ds, join_type="inner", num_partitions=max(8, ncpu), on=("w",)
    )

    big = np.iinfo(np.int64).max

    def partial3(df: pd.DataFrame) -> pd.DataFrame:
        if id_col not in df.columns:  # schemaless empty join block
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "nt": pd.Series([], dtype=np.int64),
                    "sf": pd.Series([], dtype=np.int64),
                    "mf": pd.Series([], dtype=np.int64),
                }
            )
        g = df.groupby(id_col, sort=False)["n"]
        out = g.agg(["count", "sum", "min"]).reset_index()
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(np.int64),
                "nt": out["count"].to_numpy(np.int64),
                "sf": out["sum"].to_numpy(np.int64),
                "mf": out["min"].to_numpy(np.int64),
            }
        )

    def seeds(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "nt": np.zeros(len(ids), np.int64),
                "sf": np.zeros(len(ids), np.int64),
                "mf": np.full(len(ids), big, np.int64),
            }
        )

    folded = (
        joined.map_batches(partial3, batch_format="pandas")
        .union(ds.map_batches(seeds, batch_format="pandas"))
        .groupby(id_col)
        .aggregate(
            rd.aggregate.Sum("nt", alias_name="n_tokens"),
            rd.aggregate.Sum("sf", alias_name="sum_freq"),
            rd.aggregate.Min("mf", alias_name="min_freq"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mf = df["min_freq"].to_numpy(np.int64)
        nt = df["n_tokens"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(np.int64),
                "n_tokens": nt,
                "sum_freq": df["sum_freq"].to_numpy(np.int64),
                "min_freq": np.where(nt == 0, 0, mf),
            }
        )

    return folded.map_batches(finish, batch_format="pandas")
