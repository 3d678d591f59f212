"""Distributed implementations of the reference's rule vocabulary.

Re-expresses every check in
/root/reference/src/fairy/validation/rulepack_runner.py (§2.2 of
SURVEY.md) for Ray Data execution with byte-identical evidence dicts:

* per-row checks (required, non_empty_trimmed, enum, range, url, regex)
  compile to vectorized pandas closures run in ONE shared ``map_batches``
  pass per input, emitting a small *violations side-stream*
  (rule_id, __row__, column, value, rem_url) — the input is scanned once
  no matter how many rules apply, unlike the reference's per-rule
  full-column loops;
* dup/unique (rulepack_runner.py:359-421, keep='first') run as a
  key-projected groupby aggregate (min row + count per key) plus a
  broadcast marking pass — no row-data shuffle;
* foreign_key (rulepack_runner.py:525-568) runs as distinct-unique on
  both sides plus a driver set difference (broadcast anti-join shape).

Config errors (missing column/keys/regex…) are resolved at compile time
from the schema, producing the reference's exact error evidence
(rulepack_runner.py:575-598 column_not_found with hint/suggestion).

Row numbers: the violations stream carries the stable global ``__row__``
attached at the source (sources/tables.py); evidence formats 1-based at
the edge (rulepack_runner.py:308-309).
"""

from __future__ import annotations

import re
from typing import Any, Callable
from urllib.parse import urlsplit

import numpy as np
import pandas as pd

from fairy_core_ray.sources.tables import ROW_COL

MAX_REMEDIATION_LINKS = 20  # markdown cap (rulepack_runner.py:28)
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*$")

VIOLATION_COLUMNS = ["rule_id", "row", "column", "value", "rem_url", "kind"]


def _status(sev: str) -> str:
    return "FAIL" if (sev or "fail") == "fail" else "WARN"


def column_not_found_error(column: str, available: list[str]) -> tuple[str, dict]:
    """Reference-exact helpful error (rulepack_runner.py:575-598)."""
    avail = sorted(available)
    hint = ""
    suggestion = ""
    if len(column) >= 2 and column.startswith("-") and (column[1].isalnum() or column[1] == "_"):
        suggested = column.lstrip("-").strip()
        hint = f"YAML list items require a space: use '- {suggested}', not '{column}'."
        if suggested in available:
            suggestion = suggested
    return "FAIL", {
        "error": "column_not_found",
        "column": column,
        "available_columns": avail,
        "available_column_count": len(avail),
        "hint": hint,
        "suggestion": suggestion,
    }


def _emit(rule_id: str, rows: np.ndarray, df: pd.DataFrame, column: str,
          values, rem_col: str | None, kind: str = "v") -> pd.DataFrame:
    n = len(rows)
    rem = [""] * n
    if rem_col and rem_col in df.columns and n:
        rem = df[rem_col].iloc[rows].astype(str).tolist()
    return pd.DataFrame(
        {
            "rule_id": [rule_id] * n,
            "row": df[ROW_COL].iloc[rows].to_numpy(dtype=np.int64) if n else np.array([], np.int64),
            "column": [column] * n,
            "value": [str(v) for v in values] if values is not None else [""] * n,
            "rem_url": rem,
            "kind": [kind] * n,
        }
    )


def _counter(rule_id: str, kind: str, count: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "rule_id": [rule_id],
            "row": np.array([-1], np.int64),
            "column": [""],
            "value": [str(count)],
            "rem_url": [""],
            "kind": [kind],
        }
    )


# --------------------------------------------------------------------------
# Per-row closures: fn(df) -> violations DataFrame
# --------------------------------------------------------------------------


def compile_required(rule: dict, columns: list[str]):
    """required (rulepack_runner.py:601-636): missing columns +
    nullish cells (NaN or trim=='') per listed column."""
    cols = rule.get("columns", []) or rule.get("cols", [])
    if not cols:
        return ("error", "FAIL", {"error": "config_missing_columns"})
    missing = sorted(c for c in cols if c not in columns)
    present = [c for c in cols if c in columns]
    rule_id = rule.get("id", "")
    rem_col = rule.get("remediation_link_column")

    def fn(df: pd.DataFrame) -> list[pd.DataFrame]:
        out = []
        for c in present:
            s = df[c]
            mask = s.isna() | s.astype(str).str.strip().eq("")
            rows = np.flatnonzero(mask.to_numpy())
            if len(rows):
                out.append(_emit(rule_id, rows, df, c, None, rem_col))
        return out

    return ("batch", fn, {"missing_columns": missing, "present": present})


def compile_non_empty_trimmed(rule: dict, columns: list[str]):
    """non_empty_trimmed (rulepack_runner.py:699-725)."""
    col = rule.get("column")
    if not col:
        return ("error", "FAIL", {"error": "config_missing_column"})
    if col not in columns:
        return ("error", *column_not_found_error(col, columns))
    rule_id, rem_col = rule.get("id", ""), rule.get("remediation_link_column")

    def fn(df: pd.DataFrame) -> list[pd.DataFrame]:
        s = df[col].astype("string")
        mask = s.isna() | (s.str.strip().str.len() == 0)
        rows = np.flatnonzero(mask.to_numpy())
        return [_emit(rule_id, rows, df, col, None, rem_col)] if len(rows) else []

    return ("batch", fn, {})


def _normalize_series(s: pd.Series, norm: dict) -> pd.Series:
    out = s.astype(object).where(~s.isna(), other=np.nan)
    out = out.map(lambda v: v if pd.isna(v) else str(v))
    if norm.get("trim", False):
        out = out.map(lambda v: v if pd.isna(v) else v.strip())
    if norm.get("casefold", False):
        out = out.map(lambda v: v if pd.isna(v) else v.casefold())
    return out


def compile_enum(rule: dict, columns: list[str]):
    """enum (rulepack_runner.py:435-471): NaN counts as a violation;
    normalize {trim, casefold} applies to BOTH allow list and values."""
    col = rule.get("column")
    allow = rule.get("allow", [])
    normalize = rule.get("normalize", {}) or {}
    if not col:
        return ("error", "FAIL", {"error": "config_missing_column"})
    if col not in columns:
        return ("error", *column_not_found_error(col, columns))
    if not isinstance(allow, list) or not allow:
        return ("error", "FAIL", {"error": "config_missing_allow"})
    norm_allow = set()
    for a in allow:
        v = a
        if normalize and not pd.isna(v):
            v = str(v)
            if normalize.get("trim", False):
                v = v.strip()
            if normalize.get("casefold", False):
                v = v.casefold()
        norm_allow.add(v)
    rule_id, rem_col = rule.get("id", ""), rule.get("remediation_link_column")

    def fn(df: pd.DataFrame) -> list[pd.DataFrame]:
        vv = _normalize_series(df[col], normalize or {})
        mask = vv.isna() | ~vv.isin(norm_allow)
        rows = np.flatnonzero(mask.to_numpy())
        return [_emit(rule_id, rows, df, col, None, rem_col)] if len(rows) else []

    return ("batch", fn, {"normalized": bool(normalize)})


def compile_range(rule: dict, columns: list[str]):
    """range (rulepack_runner.py:474-519): to_numeric coerce; NaN (incl.
    non-numeric and empty) is a violation; inclusive bounds by default."""
    col = rule.get("column")
    if not col:
        return ("error", "FAIL", {"error": "config_missing_column"})
    if col not in columns:
        return ("error", *column_not_found_error(col, columns))
    mn, mx = rule.get("min", None), rule.get("max", None)
    inclusive = bool(rule.get("inclusive", True))
    rule_id, rem_col = rule.get("id", ""), rule.get("remediation_link_column")

    def fn(df: pd.DataFrame) -> list[pd.DataFrame]:
        s = pd.to_numeric(df[col], errors="coerce")
        mask = s.isna()
        if mn is not None:
            mask = mask | ((s < mn) if inclusive else (s <= mn))
        if mx is not None:
            mask = mask | ((s > mx) if inclusive else (s >= mx))
        rows = np.flatnonzero(mask.to_numpy())
        return [_emit(rule_id, rows, df, col, None, rem_col)] if len(rows) else []

    return ("batch", fn, {})


def url_syntax_ok(val: Any, schemes: set[str]) -> bool:
    """Reference-exact URL predicate (rulepack_runner.py:639-660)."""
    if pd.isna(val):
        return True
    try:
        s = str(val).strip()
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


def compile_url(rule: dict, columns: list[str]):
    """url (rulepack_runner.py:663-696)."""
    col = rule.get("column")
    if not col:
        return ("error", "FAIL", {"error": "config_missing_column"})
    if col not in columns:
        return ("error", *column_not_found_error(col, columns))
    schemes = rule.get("schemes") or rule.get("scheme")
    allow = set(schemes or ["http", "https"])
    rule_id, rem_col = rule.get("id", ""), rule.get("remediation_link_column")

    def fn(df: pd.DataFrame) -> list[pd.DataFrame]:
        bad = ~df[col].apply(lambda v: url_syntax_ok(v, allow))
        rows = np.flatnonzero(bad.to_numpy())
        return [_emit(rule_id, rows, df, col, None, rem_col)] if len(rows) else []

    return ("batch", fn, {"schemes": sorted(allow)})


def compile_regex(rule: dict, columns: list[str]):
    """regex (rulepack_runner.py:728-823): not_matches = fullmatch
    enforcement; matches = forbidden-pattern search; ignore_empty skips
    NA/blank and counts them."""
    col = rule.get("column")
    regex = rule.get("regex")
    mode = (rule.get("mode") or "not_matches").strip()
    ignore_empty = bool(rule.get("ignore_empty", True))
    if not col:
        return ("error", "FAIL", {"error": "config_missing_column"})
    if col not in columns:
        return ("error", *column_not_found_error(col, columns))
    if not regex:
        return ("error", "FAIL", {"error": "config_missing_regex"})
    if mode not in ("not_matches", "matches"):
        return ("error", "FAIL", {"error": "config_invalid_mode", "mode": mode})
    try:
        rx = re.compile(regex)
    except (re.error, TypeError) as e:
        return ("error", "FAIL", {"error": "invalid_regex", "message": str(e), "regex": regex})
    rule_id, rem_col = rule.get("id", ""), rule.get("remediation_link_column")

    def fn(df: pd.DataFrame) -> list[pd.DataFrame]:
        s = df[col]
        na = s.isna()
        text = s.astype(object).where(~na, "").map(str)
        blank = text.str.strip().eq("") | na
        if ignore_empty:
            eligible = ~blank
            n_ignored = int(blank.sum())
        else:
            eligible = pd.Series(True, index=s.index)
            n_ignored = 0
        if mode == "not_matches":
            hit = ~text.map(lambda t: rx.fullmatch(t) is not None)
        else:
            hit = text.map(lambda t: rx.search(t) is not None)
        mask = eligible & hit
        rows = np.flatnonzero(mask.to_numpy())
        out = []
        if len(rows):
            out.append(_emit(rule_id, rows, df, col, text.iloc[rows].tolist(), rem_col))
        if n_ignored:
            out.append(_counter(rule_id, "ignored_empty", n_ignored))
        return out

    return (
        "batch",
        fn,
        {"column": col, "regex": regex, "mode": mode, "ignore_empty": ignore_empty},
    )


PER_ROW_COMPILERS: dict[str, Callable] = {
    "required": compile_required,
    "non_empty_trimmed": compile_non_empty_trimmed,
    "enum": compile_enum,
    "range": compile_range,
    "url": compile_url,
    "regex": compile_regex,
}
