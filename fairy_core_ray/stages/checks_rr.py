"""RuleResult-family checks — the reference's SECOND rule profile.

/root/reference/src/fairy/validation/checks.py:113-369 implements the
same rule vocabulary as rulepack_runner.py with deliberately different
semantics (SURVEY.md §2.3 / §7.4 hard part 2 — never unify):

* ``rr_row_unique``: keep=False (ALL members of duplicate groups count),
  sample policy = last-two row indices per duplicate group, sorted,
  first 10;
* ``rr_column_enum``: NaN PASSES (opposite of the validate-path enum);
* ``rr_column_numeric_range``: non-numeric-but-present tracked as a
  separate ``non_numeric_count`` in meta;
* samples are {row (1-based), value, detail} capped at 10 after a
  stable sort by row.

Distributed forms mirror stages/checks.py: vectorized per-batch masks →
small violation partials → associative merge (per-batch top-k partials
keep the evidence bounded at any scale). Results are RuleResult-shaped
dicts {id, level, count, samples, meta}.
"""

from __future__ import annotations

import re
from typing import Any, Sequence
from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from fairy_core_ray.sources.tables import ROW_COL

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*$")


def _sample(row: int, value, detail=None) -> dict:
    return {"row": int(row) + 1, "value": value, "detail": detail}


def _result(rule_id, level, count, samples, meta) -> dict:
    return {"id": rule_id, "level": level, "count": int(count), "samples": samples, "meta": meta}


def _collect_sorted(ds: rd.Dataset, mask_fn, column: str) -> pd.DataFrame:
    """(row, value) of rows matching mask_fn, sorted by row.

    Scale note: evidence is capped at 10 downstream; a per-batch head-10
    pre-truncation keeps the collected frame bounded (merge of sorted
    prefixes is associative)."""

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        bad = mask_fn(df)
        sub = df.loc[bad, [ROW_COL, column]].rename(
            columns={ROW_COL: "row", column: "value"}
        )
        return sub.sort_values("row").head(1000)

    out = ds.map_batches(scan, batch_format="pandas").to_pandas()
    if out.empty or "row" not in out.columns:
        return pd.DataFrame({"row": pd.Series([], dtype=np.int64), "value": []})
    return out.sort_values("row", kind="mergesort").reset_index(drop=True)


def _count(ds: rd.Dataset, mask_fn) -> int:
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(mask_fn(df).sum())]})

    out = ds.map_batches(scan, batch_format="pandas").to_pandas()
    return int(out["n"].sum()) if "n" in out.columns else 0


def rr_schema_required(columns: list[str], required: Sequence[str], level="fail"):
    """checks.py:133-146 — column presence only; samples are column
    names with row=0 (reported as 1)."""
    missing = [c for c in required if c not in columns]
    if not missing:
        return None
    samples = [
        {"row": 0, "value": c, "detail": "missing column"} for c in sorted(missing)[:10]
    ]
    return _result(
        "schema.required", level, len(missing), samples,
        {"required": list(required), "missing": missing},
    )


def rr_row_unique(
    ds: rd.Dataset, columns: list[str], *, column: str, level="fail",
    case_insensitive: bool = False,
):
    """checks.py:150-189 — keep=False; samples = last two rows of each
    duplicate group, sorted, first 10.

    Two-phase distributed: value-count aggregate finds duplicated
    values; a second pass keeps at most the two largest rows per
    duplicated value per batch (associative top-2 merge)."""
    if column not in columns:
        return rr_schema_required(columns, [column], level)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        s = df[column]
        if case_insensitive:
            s = s.astype("string").str.lower()
        return pd.DataFrame({"key": s.astype(object), "row": df[ROW_COL].to_numpy(np.int64),
                             "orig": df[column].astype(object)})

    counts = (
        ds.map_batches(
            lambda df: keyed(df).groupby("key", dropna=False, sort=False)
            .size().rename("n").reset_index(),
            batch_format="pandas",
        )
        .groupby("key")
        .aggregate(rd.aggregate.Sum("n", alias_name="n"))
        .to_pandas()
    )
    if counts.empty or "n" not in counts.columns:
        return None
    dups = counts[counts["n"] > 1]
    if dups.empty:
        return None
    total = int(dups["n"].sum())
    dup_vals = set(dups["key"].tolist())
    vref = ray.put(dup_vals)

    def tail2(df: pd.DataFrame) -> pd.DataFrame:
        vals = ray.get(vref)
        k = keyed(df)
        k = k[k["key"].isin(vals)]
        return k.sort_values("row").groupby("key", sort=False).tail(2)

    partial = ds.map_batches(tail2, batch_format="pandas").to_pandas()
    sample_rows = (
        partial.sort_values("row").groupby("key", sort=False).tail(2)
    )
    idxs = sorted(sample_rows["row"].tolist())[:10]
    by_row = dict(zip(partial["row"], partial["orig"]))
    samples = [_sample(i, by_row[i]) for i in idxs]
    return _result(
        "row.unique", level, total, samples,
        {"column": column, "case_insensitive": case_insensitive},
    )


def rr_table_foreign_key(
    from_ds: rd.Dataset, from_columns: list[str],
    to_ds: rd.Dataset, to_columns: list[str],
    *, from_column: str, to_column: str, level="fail",
):
    """checks.py:193-230 — anti-membership of non-null probe values."""
    errs = []
    if from_column not in from_columns:
        errs.append(("from", from_column))
    if to_column not in to_columns:
        errs.append(("to", to_column))
    if errs:
        sams = [
            {"row": 0, "value": f"{side}.{col}", "detail": "missing column"}
            for side, col in errs
        ]
        return _result(
            "table.foreign_key", level, len(errs), sams,
            {"from_column": from_column, "to_column": to_column, "error": "missing columns"},
        )
    ref = {v for v in to_ds.unique(to_column) if v is not None and not pd.isna(v)}
    rref = ray.put(ref)

    def mask(df: pd.DataFrame) -> pd.Series:
        allowed = ray.get(rref)
        s = df[from_column]
        return ~s.isna() & ~s.isin(allowed)

    off = _collect_sorted(from_ds, mask, from_column)
    if off.empty:
        return None
    total = _count(from_ds, mask)
    samples = [_sample(r, v) for r, v in zip(off["row"].head(10), off["value"].head(10))]
    return _result(
        "table.foreign_key", level, total, samples,
        {"from_column": from_column, "to_column": to_column},
    )


def rr_column_numeric_range(
    ds: rd.Dataset, columns: list[str], *, column: str,
    min_value=None, max_value=None, level="fail",
):
    """checks.py:234-266 — out-of-bounds OR non-numeric-present;
    non_numeric_count tracked separately in meta."""
    if column not in columns:
        return rr_schema_required(columns, [column], level)

    def masks(df: pd.DataFrame):
        coerced = pd.to_numeric(df[column], errors="coerce")
        oob = pd.Series(False, index=df.index)
        if min_value is not None:
            oob |= coerced < min_value
        if max_value is not None:
            oob |= coerced > max_value
        nonnum = coerced.isna() & df[column].notna()
        return oob, nonnum

    bad_fn = lambda df: (lambda o, n: o | n)(*masks(df))
    off = _collect_sorted(ds, bad_fn, column)
    if off.empty:
        return None
    total = _count(ds, bad_fn)
    nonnum_total = _count(ds, lambda df: masks(df)[1])
    samples = [_sample(r, v) for r, v in zip(off["row"].head(10), off["value"].head(10))]
    return _result(
        "column.numeric_range", level, total, samples,
        {"column": column, "min": min_value, "max": max_value,
         "non_numeric_count": nonnum_total},
    )


def _url_ok(v: Any, schemes: set[str]) -> bool:
    if pd.isna(v):
        return True
    try:
        s = str(v).strip()
    except Exception:
        return False
    if s.lower().startswith("www."):
        s = "https://" + s
    parts = urlsplit(s)
    scheme = (parts.scheme or "").lower()
    if not scheme or not _SCHEME_RE.match(scheme):
        return False
    if schemes and scheme not in {x.lower() for x in schemes}:
        return False
    return bool(parts.netloc or parts.path)


def rr_column_url(
    ds: rd.Dataset, columns: list[str], *, column: str,
    schemes: Sequence[str] = ("http", "https"), level="fail",
):
    """checks.py:296-316."""
    if column not in columns:
        return rr_schema_required(columns, [column], level)
    allow = set(schemes or [])
    mask = lambda df: ~df[column].apply(lambda v: _url_ok(v, allow))
    off = _collect_sorted(ds, mask, column)
    if off.empty:
        return None
    total = _count(ds, mask)
    samples = [_sample(r, v) for r, v in zip(off["row"].head(10), off["value"].head(10))]
    return _result(
        "column.url", level, total, samples,
        {"column": column, "schemes": sorted(allow)},
    )


def rr_column_non_empty_trimmed(
    ds: rd.Dataset, columns: list[str], *, column: str, level="warn"
):
    """checks.py:320-340 — detail 'NA' vs 'len(stripped)=N'."""
    if column not in columns:
        return rr_schema_required(columns, [column], level)

    def mask(df: pd.DataFrame) -> pd.Series:
        s = df[column].astype("string")
        return s.isna() | (s.str.strip().str.len() == 0)

    off = _collect_sorted(ds, mask, column)
    if off.empty:
        return None
    total = _count(ds, mask)
    samples = []
    for r, v in zip(off["row"].head(10), off["value"].head(10)):
        detail = "NA" if pd.isna(v) else f"len(stripped)={len(str(v).strip())}"
        samples.append(_sample(r, v, detail))
    return _result(
        "column.non_empty_trimmed", level, total, samples, {"column": column}
    )


def rr_column_enum(
    ds: rd.Dataset, columns: list[str], *, column: str, allowed: Sequence[Any],
    level="warn", case_insensitive: bool = False,
):
    """checks.py:344-369 — NaN passes (opposite of the validate-path
    enum, which flags NaN; SURVEY.md §7.4 hard part 2)."""
    if column not in columns:
        return rr_schema_required(columns, [column], level)
    if case_insensitive:
        allowed_set = {str(a).lower() for a in allowed}
        mask = lambda df: df[column].notna() & ~df[column].astype(str).str.lower().isin(allowed_set)
    else:
        allowed_set = set(allowed)
        mask = lambda df: df[column].notna() & ~df[column].isin(allowed_set)
    off = _collect_sorted(ds, mask, column)
    if off.empty:
        return None
    total = _count(ds, mask)
    samples = [_sample(r, v) for r, v in zip(off["row"].head(10), off["value"].head(10))]
    return _result(
        "column.enum", level, total, samples,
        {"column": column, "allowed_count": len(allowed_set)},
    )
