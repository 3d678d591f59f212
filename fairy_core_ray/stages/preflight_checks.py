"""Distributed GEO-preflight domain checks.

Re-expresses the reference's check vocabulary in
/root/reference/src/fairy/core/validators/rna.py (SURVEY.md §2.4) over
Ray Datasets with byte-identical findings:

* row-wise checks (at_least_one_nonempty_per_row, dates_are_iso8601,
  id_crosscheck's probe side) are vectorized ``map_batches`` passes
  emitting violation rows;
* grouped checks (paired_end_complete, processed_data_present) are
  per-batch partial flags + a ``groupby(sample_id)`` aggregate —
  the reference's per-group pandas loops become two-level hash
  aggregates (no per-group Python at scale);
* id_crosscheck's build side is a distributed distinct (broadcast
  anti-join shape, rna.py:160-211).

Findings are WarningItem-shaped dicts {column, kind, message, severity,
row, hint}; rows are the reference's 0-based frame indices (the 1-based
conversion quirk lives in state/report.py).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pandas as pd
import ray.data as rd

from fairy_core_ray.sources.tables import ROW_COL


def _w(column, kind, message, severity, row, hint) -> dict[str, Any]:
    return {
        "column": column,
        "kind": kind,
        "message": message,
        "severity": severity,
        "row": row,
        "hint": hint,
    }


def check_required_columns(columns: list[str], required: list[str]) -> list[dict]:
    """require_columns (rna.py:45-69) — schema-only, no data pass."""
    return [
        _w(
            col,
            "missing_column",
            f"Required column '{col}' is missing.",
            "error",
            None,
            "Add this column before submission.",
        )
        for col in required
        if col not in columns
    ]


def check_bio_context(ds: rd.Dataset, columns: list[str], group: list[str]) -> list[dict]:
    """at_least_one_nonempty_per_row (rna.py:122-157): row-wise OR over a
    column group; FAIL rows where every group column is blank."""
    present = [c for c in group if c in columns]
    has_sid = "sample_id" in columns

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if present:
            any_ok = np.zeros(len(df), dtype=bool)
            for c in present:
                any_ok |= df[c].astype(str).str.strip().ne("").to_numpy()
        else:
            any_ok = np.zeros(len(df), dtype=bool)
        bad = ~any_ok
        rows = df[ROW_COL].to_numpy(np.int64)[bad]
        sids = (
            df["sample_id"].astype(str).to_numpy()[bad]
            if has_sid
            else np.array([f"row_{r}" for r in rows], dtype=object)
        )
        return pd.DataFrame({"row": rows, "sid": sids})

    hits = ds.map_batches(scan, batch_format="pandas").to_pandas()
    if hits.empty or "row" not in hits.columns:
        return []
    out = []
    for r in hits.sort_values("row").itertuples():
        sid = r.sid  # "" stays "" — the fallback applies only when the
        # sample_id column is absent (reference rna.py:145 row.get default)
        out.append(
            _w(
                None,
                "bio_context_missing",
                f"Sample '{sid}' does not provide tissue/cell_line/cell_type.",
                "error",
                int(r.row),
                "Fill at least one of: tissue, cell_line, or cell_type.",
            )
        )
    return out


def check_id_crossmatch(
    samples_ds: rd.Dataset,
    files_ds: rd.Dataset,
    samples_columns: list[str],
    files_columns: list[str],
    samples_key: str = "sample_id",
) -> list[dict]:
    """id_crosscheck (rna.py:160-211): every files row's sample_id must be
    non-empty and present in samples. Build side = distributed distinct
    of trimmed non-empty ids; probe side = vectorized membership."""
    if samples_key not in samples_columns or samples_key not in files_columns:
        return []
    known = {
        str(v).strip()
        for v in samples_ds.unique(samples_key)
        if v is not None and str(v).strip() != ""
    }

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        sid = df[samples_key].astype(str).str.strip()
        empty = sid.eq("")
        unknown = ~empty & ~sid.isin(known)
        rows = df[ROW_COL].to_numpy(np.int64)
        frames = []
        if empty.any():
            frames.append(
                pd.DataFrame({"row": rows[empty.to_numpy()], "sid": "", "kind": "empty"})
            )
        if unknown.any():
            frames.append(
                pd.DataFrame(
                    {
                        "row": rows[unknown.to_numpy()],
                        "sid": sid[unknown].to_numpy(),
                        "kind": "unknown",
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"row": pd.Series([], dtype=np.int64), "sid": [], "kind": []})
        return pd.concat(frames, ignore_index=True)

    hits = files_ds.map_batches(scan, batch_format="pandas").to_pandas()
    if hits.empty or "row" not in hits.columns:
        return []
    out = []
    for r in hits.sort_values("row").itertuples():
        if r.kind == "empty":
            out.append(
                _w(
                    samples_key,
                    "file_missing_sample_id",
                    "Row in files.tsv has no sample_id.",
                    "error",
                    int(r.row),
                    "Each file row must name the sample_id it belongs to.",
                )
            )
        else:
            out.append(
                _w(
                    samples_key,
                    "file_unknown_sample_id",
                    f"File references sample_id '{r.sid}' not found in samples.tsv.",
                    "error",
                    int(r.row),
                    "Fix sample_id or add that sample to samples.tsv.",
                )
            )
    return out


def check_not_null(ds: rd.Dataset, columns: list[str], col: str) -> list[dict]:
    """check_not_null (rna.py:72-91, legacy CSV path): nullish cells in
    one column → FAIL per row."""
    if col not in columns:
        return []

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col]
        bad = s.isna() | s.astype(str).str.strip().eq("")
        return pd.DataFrame({"row": df[ROW_COL].to_numpy(np.int64)[bad.to_numpy()]})

    hits = ds.map_batches(scan, batch_format="pandas").to_pandas()
    if hits.empty or "row" not in hits.columns:
        return []
    return [
        _w(
            col,
            "missing_value",
            f"Missing value in required field '{col}'.",
            "error",
            int(r),
            "Fill this cell.",
        )
        for r in sorted(hits["row"].tolist())
    ]


def check_read_length(ds: rd.Dataset, columns: list[str], col: str) -> list[dict]:
    """check_read_length (rna.py:94-114): numeric < 1 (NaN coerced to -1)
    → WARN per row."""
    if col not in columns:
        return []

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        rl = pd.to_numeric(df[col], errors="coerce").fillna(-1)
        bad = rl < 1
        return pd.DataFrame({"row": df[ROW_COL].to_numpy(np.int64)[bad.to_numpy()]})

    hits = ds.map_batches(scan, batch_format="pandas").to_pandas()
    if hits.empty or "row" not in hits.columns:
        return []
    return [
        _w(
            col,
            "invalid_read_length",
            "read_length must be >= 1",
            "warning",
            int(r),
            "Use an integer read length like 50, 75, 100...",
        )
        for r in sorted(hits["row"].tolist())
    ]


def _grouped_flags(
    ds: rd.Dataset,
    key: str,
    flag_fns: dict[str, Any],
    pre_filter=None,
) -> pd.DataFrame:
    """Generic two-level grouped-predicate engine: per-batch partials
    (one row per key per batch with OR-flags + min row), then a
    groupby(key) aggregate. Returns one row per key with max flags and
    min first_row, sorted by key."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if pre_filter is not None:
            df = df[pre_filter(df)]
        if not len(df):
            cols = {key: [], "first_row": pd.Series([], dtype=np.int64)}
            cols.update({name: pd.Series([], dtype=np.int64) for name in flag_fns})
            return pd.DataFrame(cols)
        flags = {name: fn(df).astype(np.int64) for name, fn in flag_fns.items()}
        g = df.assign(**flags).groupby(key, sort=False)
        agg = {name: (name, "max") for name in flag_fns}
        agg["first_row"] = (ROW_COL, "min")
        return g.agg(**agg).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [rd.aggregate.Max(name, alias_name=name) for name in flag_fns]
    aggs.append(rd.aggregate.Min("first_row", alias_name="first_row"))
    out = partials.groupby(key).aggregate(*aggs).to_pandas()
    if out.empty or key not in out.columns:
        return pd.DataFrame(
            {key: [], "first_row": pd.Series([], dtype=np.int64),
             **{name: pd.Series([], dtype=np.int64) for name in flag_fns}}
        )
    return out.sort_values(key).reset_index(drop=True)


def check_paired_end_complete(
    files_ds: rd.Dataset,
    files_columns: list[str],
    *,
    samples_key: str = "sample_id",
    layout_col: str = "layout",
    paired_value: str = "PAIRED",
    file_col: str = "filename",
    r1_pattern: str = r"_R1",
    r2_pattern: str = r"_R2",
) -> list[dict]:
    """paired_end_complete (rna.py:214-272): PAIRED samples need both an
    R1-matching and an R2-matching filename; finding anchors at the
    group's first row."""
    if samples_key not in files_columns:
        return []
    has_file_col = file_col in files_columns
    rx1, rx2 = re.compile(r1_pattern), re.compile(r2_pattern)

    def pre(df: pd.DataFrame) -> pd.Series:
        layout = (
            df[layout_col].astype(str)
            if layout_col in df.columns
            else pd.Series("", index=df.index)
        )
        return layout.str.upper() == paired_value.upper()

    if not has_file_col:
        return []  # reference skips groups lacking the column entirely

    flags = {
        "has_r1": lambda df: df[file_col].astype(str).map(lambda s: bool(rx1.search(s))),
        "has_r2": lambda df: df[file_col].astype(str).map(lambda s: bool(rx2.search(s))),
    }
    grouped = _grouped_flags(files_ds, samples_key, flags, pre_filter=pre)
    out = []
    for r in grouped.itertuples():
        if not (r.has_r1 and r.has_r2):
            sid = getattr(r, samples_key)
            out.append(
                _w(
                    file_col,
                    "paired_end_incomplete",
                    f"Paired-end sample '{sid}' is missing R1 or R2 FASTQ.",
                    "error",
                    int(r.first_row),
                    "Provide both *_R1* and *_R2* files for each paired-end sample.",
                )
            )
    return out


def check_dates_iso8601(
    ds: rd.Dataset, columns: list[str], date_cols: list[str]
) -> list[dict]:
    """dates_are_iso8601 (rna.py:275-308): non-empty values must match
    YYYY-MM-DD; WARN. Finding order: column-major, then row."""
    iso = re.compile(r"^\d{4}-\d{2}-\d{2}$")
    present = [c for c in date_cols if c in columns]
    if not present:
        return []

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for ci, col in enumerate(present):
            val = df[col].astype(str).str.strip()
            bad = val.ne("") & ~val.str.match(iso)
            if bad.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "ci": ci,
                            "row": df[ROW_COL].to_numpy(np.int64)[bad.to_numpy()],
                            "val": val[bad].to_numpy(),
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"ci": pd.Series([], dtype=np.int64), "row": pd.Series([], dtype=np.int64), "val": []}
            )
        return pd.concat(frames, ignore_index=True)

    hits = ds.map_batches(scan, batch_format="pandas").to_pandas()
    if hits.empty or "row" not in hits.columns:
        return []
    out = []
    for r in hits.sort_values(["ci", "row"]).itertuples():
        col = present[int(r.ci)]
        out.append(
            _w(
                col,
                "invalid_iso8601_date",
                f"Value '{r.val}' in {col} is not ISO8601 (YYYY-MM-DD).",
                "warning",
                int(r.row),
                "Use format YYYY-MM-DD, e.g. 2025-10-02.",
            )
        )
    return out


def check_processed_data_present(
    files_ds: rd.Dataset,
    files_columns: list[str],
    *,
    samples_key: str = "sample_id",
    raw_file_glob: str = ".fastq",
    processed_globs=(".counts", ".quant", ".gene_counts"),
) -> list[dict]:
    """processed_data_present (rna.py:311-358): per sample, raw files
    without any processed/quant file → WARN at the group's first row."""
    if samples_key not in files_columns:
        return []
    has_fn = "filename" in files_columns

    def fn_series(df: pd.DataFrame) -> pd.Series:
        return (
            df["filename"].astype(str) if has_fn else pd.Series("", index=df.index)
        )

    flags = {
        "has_raw": lambda df: fn_series(df).str.contains(raw_file_glob, regex=False),
        "has_proc": lambda df: fn_series(df).map(
            lambda s: any(p in s for p in processed_globs)
        ),
    }
    grouped = _grouped_flags(files_ds, samples_key, flags)
    out = []
    for r in grouped.itertuples():
        if r.has_raw and not r.has_proc:
            sid = getattr(r, samples_key)
            out.append(
                _w(
                    "filename",
                    "no_processed_files",
                    f"Sample '{sid}' has raw data but no processed/quant files.",
                    "warning",
                    int(r.first_row),
                    "Include at least one processed output (e.g. counts matrix).",
                )
            )
    return out
