"""UI-facing validators + RuleResult→(mask, issues) adapters (SURVEY §2.3 R8–R11).

Reference semantics: ``validation/checks.py:26-110`` (the three mask+Issue
validators the table highlighter consumes) and ``validation/types.py:69-118``
plus ``checks.py:375-389`` (the adapter that re-expresses any RuleResult as a
highlight mask + Issue list).

These run on the PREVIEW frame a UI holds on the driver (at most a few
thousand rows) — they are deliberately pandas-local, not Ray stages. The
distributed counterparts with the same rule vocabulary are
``stages/checks.py`` C1 (required/nullish), C7 (duplicate keys) and the
engine's column audit; at 100 TB you run those, then adapt their bounded
RuleResult evidence (≤10 samples) into UI issues with ``rule_result_to_*``
below — the adapters never touch more rows than the evidence cap.

RuleResults here are the dict shape produced by ``stages/checks_rr.py``
(``{id, level, count, samples:[{row,value,detail}], meta}``); dataclass-style
objects with the same attributes are accepted too.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

import pandas as pd

_NORM_RE = re.compile(r"[^a-z0-9]+")

_LEVEL_TO_SEVERITY = {"fail": "error", "warn": "warning", "info": "info"}


@dataclass
class Issue:
    """types.py:15-23 — one UI finding (row is 0-based, unlike report samples)."""

    kind: str
    message: str
    severity: str = "warning"
    row: int | None = None
    col: str | None = None
    hint: str | None = None


# (mask, issues) callable — the UI validator signature (types.py:27)
Validator = Callable[[pd.DataFrame], tuple[pd.DataFrame, list[Issue]]]


def blank_mask(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(False, index=df.index, columns=df.columns)


def combine_masks(masks: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """types.py:34-41 — union of per-rule highlight masks.

    The reference calls ``m.reindex_like(out, fill_value=False)``, which
    raises TypeError on current pandas (``reindex_like`` takes no
    ``fill_value``); this keeps the intended align-then-union semantics.
    """
    merged: pd.DataFrame | None = None
    for m in masks.values():
        if merged is None:
            merged = m
        else:
            merged = (
                merged | m.reindex(index=merged.index, columns=merged.columns, fill_value=False)
            )
    return merged if merged is not None else pd.DataFrame(False, index=[], columns=[])


# ---- R8: required columns / nullish cells (checks.py:26-59) ------------


def ui_missing_required(required_cols: list[str]) -> Validator:
    def _validate(df: pd.DataFrame) -> tuple[pd.DataFrame, list[Issue]]:
        mask = blank_mask(df)
        issues: list[Issue] = []
        for col in required_cols:
            if col not in df.columns:
                issues.append(
                    Issue(
                        kind="missing_column",
                        message=f"Required column '{col}' is missing.",
                        severity="error",
                        col=col,
                        hint="Add this column before export.",
                    )
                )
                continue
            nullish = (df[col].isna() | df[col].astype(str).str.strip().eq("")).to_numpy()
            if nullish.any():
                mask.loc[df.index[nullish], col] = True
                issues.extend(
                    Issue(
                        kind="missing_value",
                        message=f"Missing value in required field '{col}'.",
                        severity="error",
                        row=int(r),
                        col=col,
                        hint="Fill this cell.",
                    )
                    for r in df.index[nullish]
                )
        return mask, issues

    _validate.__name__ = "missing required"
    return _validate


# ---- R9: case-insensitive duplicates, keep=False (checks.py:62-84) -----


def ui_duplicate_in_column(col: str) -> Validator:
    def _validate(df: pd.DataFrame) -> tuple[pd.DataFrame, list[Issue]]:
        mask = blank_mask(df)
        issues: list[Issue] = []
        if col in df.columns:
            dup = df[col].astype(str).str.lower().duplicated(keep=False)
            if dup.any():
                mask.loc[dup, col] = True
                issues.extend(
                    Issue(
                        kind="duplicate_value",
                        message=f"Duplicate {col} value '{v}'.",
                        severity="warning",
                        row=int(r),
                        col=col,
                        hint="Ensure IDs are unique.",
                    )
                    for r, v in df.loc[dup, col].items()
                )
        return mask, issues

    _validate.__name__ = f"duplicate_in_column[{col}]"
    return _validate


# ---- R10: header-name collisions, no data pass (checks.py:87-110) ------


def ui_column_name_mismatch() -> Validator:
    def _validate(df: pd.DataFrame) -> tuple[pd.DataFrame, list[Issue]]:
        collided: dict[str, list[str]] = {}
        for c in df.columns:
            key = _NORM_RE.sub("_", str(c).strip().lower()).strip("_")
            collided.setdefault(key, []).append(c)
        issues = [
            Issue(
                kind="column_name_mismatch",
                message=f"Columns {cols} look like the same field (normalized '{key}').",
                severity="warning",
                hint=f"Keep one canonical name (e.g., '{key}'); merge or drop others.",
            )
            for key, cols in collided.items()
            if len(cols) > 1
        ]
        return blank_mask(df), issues

    _validate.__name__ = "column_name_mismatch"
    return _validate


# ---- R11: RuleResult → (mask, issues) adapters (types.py:69-118) -------


def _rr_get(rr: Any, field: str, default=None):
    if isinstance(rr, dict):
        return rr.get(field, default)
    return getattr(rr, field, default)


def _sample_get(s: Any, field: str, default=None):
    if isinstance(s, dict):
        return s.get(field, default)
    return getattr(s, field, default)


def rule_result_to_issues(rr: Any, *, kind: str | None = None) -> list[Issue]:
    """types.py:69-99 — evidence-capped issue list (0-based rows for the UI)."""
    severity = _LEVEL_TO_SEVERITY[_rr_get(rr, "level")]
    meta = _rr_get(rr, "meta") or {}
    col = meta.get("column") or meta.get("from_column")
    rid = _rr_get(rr, "id")
    samples = _rr_get(rr, "samples") or []
    issues: list[Issue] = []
    for s in samples:
        row1 = _sample_get(s, "row")
        issues.append(
            Issue(
                kind=kind or rid,
                message=f"{rid}: offending value {_sample_get(s, 'value')!r}",
                severity=severity,
                row=(row1 - 1 if row1 and row1 > 0 else None),
                col=col,
                hint=_sample_get(s, "detail"),
            )
        )
    count = int(_rr_get(rr, "count") or 0)
    if count > len(samples):
        issues.append(
            Issue(
                kind=(kind or rid) + ".summary",
                message=f"{rid}: {count} total violations; showing {len(samples)} samples",
                severity=severity,
                row=None,
                col=col,
            )
        )
    return issues


def rule_result_to_mask(df: pd.DataFrame, rr: Any) -> pd.DataFrame:
    """types.py:102-118 — highlight sampled rows (whole row if no column)."""
    mask = blank_mask(df)
    meta = _rr_get(rr, "meta") or {}
    col = meta.get("column") or meta.get("from_column")
    rows0 = [
        _sample_get(s, "row") - 1
        for s in (_rr_get(rr, "samples") or [])
        if _sample_get(s, "row") and _sample_get(s, "row") > 0
    ]
    if not rows0:
        return mask
    if col and col in df.columns:
        mask.loc[df.index[rows0], col] = True
    else:
        mask.loc[df.index[rows0], :] = True
    return mask


def wrap_rr_as_validator(rr_fn, *, kind: str | None = None, **fixed_kwargs) -> Validator:
    """checks.py:375-389 — lift a RuleResult producer into the UI signature."""

    def _validate(df: pd.DataFrame):
        rr = rr_fn(df, **fixed_kwargs)
        if rr is None:
            return blank_mask(df), []
        return rule_result_to_mask(df, rr), rule_result_to_issues(rr, kind=kind)

    _validate.__name__ = getattr(rr_fn, "__name__", "rr_rule_wrapper")
    return _validate
