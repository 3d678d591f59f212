"""Rulepack execution engine: Ray-Data streaming runner with the
reference's report contract.

Counterpart of /root/reference/src/fairy/validation/rulepack_runner.py
:104-302 (``run_rulepack``): same inputs-map → report dict shape
(engine / attestation / metadata / summary / resources, statuses
PASS|WARN|FAIL, 1-based evidence rows), different execution model —

* inputs are Ray Datasets with stable global row ids (sources/tables.py),
  scanned ONCE per input for all per-row rules (violations side-stream),
  instead of one full-column pandas pass per rule;
* dup/unique run as key-projected groupby aggregates + broadcast marking
  (no row-data shuffle; SURVEY.md §7.3);
* foreign_key runs as distinct-unique on both sides + driver set
  difference (broadcast anti-join shape, rulepack_runner.py:525-568).

Never calls ray.init (driver/test fixture owns the session).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from fairy_core_ray import __version__
from fairy_core_ray.functions.hashing import sha256_file
from fairy_core_ray.rulepack import CHECK_TYPES, applicable_rules, extract_meta
from fairy_core_ray.sources.tables import ROW_COL, read_indexed_table
from fairy_core_ray.stages.checks import (
    PER_ROW_COMPILERS,
    VIOLATION_COLUMNS,
    _status,
    column_not_found_error,
)

_SEP = "\x1f"  # composite-key separator (unit separator; not expected in data)


class TableHandle:
    """One loaded input: lazy Dataset + schema + provenance."""

    def __init__(self, name: str, path: str):
        self.name = name
        self.path = str(path)
        self.ds = read_indexed_table(path)
        self.columns = [c for c in self.ds.schema().names if c != ROW_COL]

    def count(self) -> int:
        return self.ds.count()


def _rows_1based(rows: np.ndarray | list) -> list[int]:
    return [int(r) + 1 for r in sorted(int(r) for r in rows)]


def _remediation(viol: pd.DataFrame, rem_col, rem_label) -> dict | None:
    """Assemble the remediation block from the violations stream
    (rulepack_runner.py:326-356): failing rows sorted, blank urls
    skipped."""
    if not rem_col or viol.empty:
        return None
    per_row = (
        viol[viol["kind"] == "v"][["row", "rem_url"]]
        .drop_duplicates("row")
        .sort_values("row")
    )
    links = [
        {"row": int(r) + 1, "url": u.strip()}
        for r, u in zip(per_row["row"], per_row["rem_url"])
        if u and u.strip()
    ]
    if not links:
        return None
    out: dict[str, Any] = {"column": rem_col, "links": links}
    if rem_label:
        out["label"] = rem_label
    return out


def _dup_check(
    handle: TableHandle, keys: list[str], missing_key_error: str
) -> tuple[bool, Any]:
    """Shared keep-first duplicate engine for dup/no_duplicate_rows/unique.

    Returns (ok, rows-ndarray | (status, evidence))."""
    if not keys:
        return False, ("FAIL", {"error": missing_key_error})
    for k in keys:
        if k not in handle.columns:
            return False, column_not_found_error(k, handle.columns)

    def to_key(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [ROW_COL]).to_pandas()
        key = df[keys[0]].astype(str)
        for k in keys[1:]:
            key = key + _SEP + df[k].astype(str)
        return pa.table({"key": pa.array(key.tolist(), pa.string()),
                         ROW_COL: pa.array(df[ROW_COL].to_numpy(np.int64))})

    try:
        n_rows = handle.ds.count()
    except Exception:
        n_rows = None
    if n_rows is not None and n_rows <= 2_000_000:
        # per-batch (key -> min row, count) partials + one driver fold:
        # Ray's sort-based groupby costs seconds on small string-keyed
        # tables (stages/dedup._fold_counts rationale)
        def partial(batch: pa.Table) -> pd.DataFrame:
            df = to_key(batch).to_pandas()
            g = df.groupby("key", sort=False)[ROW_COL].agg(["min", "size"]).reset_index()
            g.columns = ["key", "keep_row", "n"]
            return g

        allp = pd.concat(
            list(
                handle.ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_size=None, batch_format="pandas"
                )
            ),
            ignore_index=True,
        )
        agg_pdf = allp.groupby("key", sort=False).agg(
            keep_row=("keep_row", "min"), n=("n", "sum")
        ).reset_index()
        dup_pdf = agg_pdf[agg_pdf["n"] > 1]
    else:
        agg = (
            handle.ds.map_batches(to_key, batch_format="pyarrow")
            .groupby("key")
            .aggregate(
                rd.aggregate.Min(ROW_COL, alias_name="keep_row"),
                rd.aggregate.Count(alias_name="n"),
            )
        )
        dup_pdf = agg.filter(expr="n > 1").to_pandas()
    if dup_pdf.empty:
        return True, np.array([], np.int64)
    dup_keys = set(dup_pdf["key"].tolist())
    keep_rows = set(int(r) for r in dup_pdf["keep_row"].tolist())

    def find_dups(batch: pa.Table) -> pa.Table:
        t = to_key(batch).to_pandas()
        mask = t["key"].isin(dup_keys) & ~t[ROW_COL].isin(keep_rows)
        return pa.table({"row": pa.array(t[ROW_COL][mask].to_numpy(np.int64))})

    rows = (
        handle.ds.map_batches(find_dups, batch_format="pyarrow")
        .to_pandas()["row"]
        .to_numpy()
    )
    return True, rows


def _foreign_key_check(
    handles: dict[str, TableHandle], rule: dict
) -> tuple[str, dict]:
    """foreign_key (rulepack_runner.py:525-568): distinct(left) -
    distinct(right), sorted, capped at 50 values in evidence."""
    frm = rule.get("from", {}) or {}
    to = rule.get("to", {}) or {}
    from_table, from_field = frm.get("table", ""), frm.get("field", "")
    to_table, to_field = to.get("table", ""), to.get("field", "")
    if not from_table or not to_table or not from_field or not to_field:
        return "FAIL", {"error": "config_missing_fk_fields"}
    if from_table not in handles or to_table not in handles:
        return "FAIL", {
            "error": "unknown_table",
            "message": f"Have tables {sorted(handles.keys())}; need: {from_table}, {to_table}",
        }
    lh, rh = handles[from_table], handles[to_table]
    if from_field not in lh.columns:
        return "FAIL", {"error": "column_not_found", "column": f"{from_table}.{from_field}"}
    if to_field not in rh.columns:
        return "FAIL", {"error": "column_not_found", "column": f"{to_table}.{to_field}"}
    left = set(lh.ds.unique(from_field))
    right = set(rh.ds.unique(to_field))
    missing = sorted(v for v in (left - right) if v is not None and not pd.isna(v))
    if missing:
        return _status(rule.get("severity", "fail")), {
            "missing_values": missing[:50],
            "missing_count_estimate": len(missing),
            "from": {"table": from_table, "field": from_field},
            "to": {"table": to_table, "field": to_field},
        }
    return "PASS", {"count": 0}


def _build_evidence(rtype: str, rule: dict, meta: dict, viol: pd.DataFrame) -> tuple[str, dict]:
    """Violations stream (+ compile meta) → reference-exact evidence."""
    sev = rule.get("severity", "fail")
    rem_col = rule.get("remediation_link_column")
    rem_label = rule.get("remediation_link_label")
    vrows = viol[viol["kind"] == "v"] if not viol.empty else viol

    if rtype == "required":
        ev: dict[str, Any] = {}
        if meta.get("missing_columns"):
            ev["missing_columns"] = meta["missing_columns"]
        if not vrows.empty:
            by_col = {
                c: _rows_1based(g["row"].to_numpy())
                for c, g in vrows.groupby("column")
            }
            ev["nullish"] = {
                "columns": sorted(by_col.keys()),
                "rows_by_column": {k: v for k, v in sorted(by_col.items())},
            }
            ev["count"] = int(sum(len(v) for v in by_col.values()))
            rem = _remediation(viol, rem_col, rem_label)
            if rem:
                ev["remediation"] = rem
        if ev:
            return _status(sev), ev
        return "PASS", {"count": 0}

    if rtype == "non_empty_trimmed":
        if not vrows.empty:
            rows = _rows_1based(vrows["row"].to_numpy())
            ev = {"empty_or_whitespace_rows": rows, "count": len(rows)}
            rem = _remediation(viol, rem_col, rem_label)
            if rem:
                ev["remediation"] = rem
            return _status(sev), ev
        return "PASS", {"count": 0}

    if rtype == "enum":
        if not vrows.empty:
            rows = _rows_1based(vrows["row"].to_numpy())
            ev = {"out_of_set": {"count": len(rows), "rows": rows}}
            rem = _remediation(viol, rem_col, rem_label)
            if rem:
                ev["remediation"] = rem
            return _status(sev), ev
        return "PASS", {"normalized": bool(meta.get("normalized"))}

    if rtype == "range":
        if not vrows.empty:
            rows = _rows_1based(vrows["row"].to_numpy())
            ev = {"out_of_bounds": {"count": len(rows), "rows": rows}}
            rem = _remediation(viol, rem_col, rem_label)
            if rem:
                ev["remediation"] = rem
            return _status(sev), ev
        return "PASS", {"count": 0}

    if rtype == "url":
        if not vrows.empty:
            rows = _rows_1based(vrows["row"].to_numpy())
            ev = {"invalid_url_rows": rows, "count": len(rows), "schemes": meta["schemes"]}
            rem = _remediation(viol, rem_col, rem_label)
            if rem:
                ev["remediation"] = rem
            return _status(sev), ev
        return "PASS", {"count": 0}

    if rtype == "regex":
        base = {
            "column": meta["column"],
            "regex": meta["regex"],
            "mode": meta["mode"],
            "ignore_empty": meta["ignore_empty"],
        }
        n_ignored = 0
        if not viol.empty:
            counters = viol[viol["kind"] == "ignored_empty"]
            n_ignored = int(counters["value"].astype(int).sum()) if not counters.empty else 0
        if not vrows.empty:
            ordered = vrows.sort_values("row")
            rows = _rows_1based(ordered["row"].to_numpy())
            ev = dict(base)
            ev["count"] = len(rows)
            ev["rows"] = rows
            if n_ignored:
                ev["ignored_empty_count"] = n_ignored
            samples = [
                {"row": int(r) + 1, "value": v}
                for r, v in zip(ordered["row"].head(10), ordered["value"].head(10))
            ]
            if samples:
                ev["samples"] = samples
            rem = _remediation(viol, rem_col, rem_label)
            if rem:
                ev["remediation"] = rem
            return _status(sev), ev
        ev = dict(base)
        ev["count"] = 0
        return "PASS", ev

    raise AssertionError(f"unhandled rule type {rtype}")


def run_rulepack(
    inputs_map: dict[str, str],
    rulepack: dict,
    rp_path: str,
    now_iso: str,
    *,
    params: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Validate one or more inputs with a rulepack → report dict
    (reference shape, rulepack_runner.py:104-302)."""
    rp_id, rp_ver = extract_meta(rulepack)
    handles = {name: TableHandle(name, path) for name, path in inputs_map.items()}

    att_inputs = []
    for name, p in inputs_map.items():
        try:
            att_inputs.append(
                {
                    "name": name,
                    "path": str(p),
                    "sha256": sha256_file(str(p)) if os.path.isfile(p) else "",
                    "bytes": int(Path(p).stat().st_size) if os.path.isfile(p) else 0,
                    "rows": int(handles[name].count()),
                }
            )
        except Exception:
            att_inputs.append({"name": name, "path": str(p), "sha256": "", "bytes": 0, "rows": 0})

    rulepack_obj = {"id": rp_id, "version": rp_ver, "path": str(rp_path)}
    report: dict[str, Any] = {
        "engine": {"fairy_core_version": __version__},
        "attestation": {
            "core_version": __version__,
            "rulepack": rulepack_obj,
            "inputs": att_inputs,
            "timestamp": now_iso,
            "fairy_core_version": __version__,
            "rulepack_name": rp_id or "UNKNOWN_RULEPACK",
            "rulepack_version": rp_ver or "0.0.0",
            "rulepack_source_path": str(rp_path),
        },
        "metadata": {"inputs": {k: str(v) for k, v in inputs_map.items()}},
        "summary": {"pass": 0, "warn": 0, "fail": 0},
        "resources": [],
    }

    for name, path in inputs_map.items():
        handle = handles[name]
        rules = applicable_rules(rulepack, Path(path).name)
        # Keyed by rule POSITION, not id: rulepacks with duplicate ids (or
        # several old-schema rules with no id) are legal input and each
        # entry must be evaluated independently, as the reference runner
        # does (rulepack_runner.py evaluates the rules list in order).
        results: dict[int, tuple[str, dict]] = {}
        batch_rules: list[tuple[int, dict, Any, dict, str]] = []  # (pos, rule, fn, meta, tag)

        for pos, r in enumerate(rules):
            rtype = r.get("type", "")
            rid = r.get("id", "")
            if rtype not in CHECK_TYPES:
                results[pos] = (
                    "FAIL",
                    {
                        "error": "unknown_rule_type",
                        "type": rtype,
                        "message": (
                            f"Unknown rule type '{rtype}'. "
                            "This rulepack may require a newer version of fairy-core. "
                            "Please upgrade fairy-core and re-run."
                        ),
                        "supported_types": sorted(CHECK_TYPES),
                    },
                )
                continue
            try:
                if rtype in ("dup", "no_duplicate_rows", "unique"):
                    keys = r.get("keys", []) if rtype != "unique" else r.get("columns", [])
                    err_code = (
                        "config_missing_keys" if rtype != "unique" else "config_missing_columns"
                    )
                    ok, res = _dup_check(handle, keys, err_code)
                    if not ok:
                        results[pos] = res
                    elif len(res):
                        rows = _rows_1based(res)
                        ev = {"duplicates": [{"rows": rows}], "count": len(rows)}
                        rem = _dup_remediation(handle, rows, r)
                        if rem:
                            ev["remediation"] = rem
                        results[pos] = (_status(r.get("severity", "fail")), ev)
                    else:
                        results[pos] = ("PASS", {"count": 0})
                elif rtype == "foreign_key":
                    results[pos] = _foreign_key_check(handles, r)
                else:
                    # compile with a position-unique violation tag so
                    # same-id rules don't see each other's violations
                    tag = f"__rule{pos}__"
                    compiled = PER_ROW_COMPILERS[rtype](dict(r, id=tag), handle.columns)
                    if compiled[0] == "error":
                        results[pos] = (compiled[1], compiled[2])
                    else:
                        batch_rules.append((pos, r, compiled[1], compiled[2], tag))
            except Exception as e:  # runtime guard (rulepack_runner.py:277-278)
                results[pos] = ("FAIL", {"error": "runtime_error", "message": str(e)})

        # single shared violations pass for all per-row rules on this input
        viol = _run_violations_pass(handle, [fn for _, _, fn, _, _ in batch_rules])
        for pos, r, _fn, meta, tag in batch_rules:
            rtype = r.get("type", "")
            v = viol[viol["rule_id"] == tag] if not viol.empty else viol
            try:
                results[pos] = _build_evidence(rtype, r, meta, v)
            except Exception as e:
                results[pos] = ("FAIL", {"error": "runtime_error", "message": str(e)})

        resource_rules = []
        for pos, r in enumerate(rules):
            rid = r.get("id", "")
            status, evidence = results.get(pos, ("PASS", {}))
            resource_rules.append(
                {
                    "id": rid,
                    "type": r.get("type", ""),
                    "severity": r.get("severity", "fail"),
                    "status": status,
                    "evidence": evidence,
                }
            )
            key = "fail" if status == "FAIL" else ("warn" if status == "WARN" else "pass")
            report["summary"][key] += 1
        report["resources"].append(
            {"name": name, "path": str(path), "rules": resource_rules}
        )
    return report


def _dup_remediation(handle: TableHandle, rows_1based: list[int], rule: dict) -> dict | None:
    """Remediation links for dup/unique: fetch the remediation column at
    the flagged rows (small set) via a filtered pass."""
    rem_col = rule.get("remediation_link_column")
    rem_label = rule.get("remediation_link_label")
    if not rem_col or rem_col not in handle.columns or not rows_1based:
        return None
    wanted = {r - 1 for r in rows_1based}

    def pick(batch: pa.Table) -> pa.Table:
        df = batch.select([ROW_COL, rem_col]).to_pandas()
        # drop nulls BEFORE astype(str): stringifying first would turn
        # None/NaN into the literal 'None'/'nan' and emit bogus link urls
        # (the reference skips NaN rows, rulepack_runner.py:326-356)
        df = df[df[ROW_COL].isin(wanted) & df[rem_col].notna()]
        return pa.table(
            {
                "row": pa.array(df[ROW_COL].to_numpy(np.int64)),
                "url": pa.array(df[rem_col].astype(str).tolist(), pa.string()),
            }
        )

    got = handle.ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    got = got.sort_values("row")
    links = [
        {"row": int(r) + 1, "url": u.strip()}
        for r, u in zip(got["row"], got["url"])
        if u and u.strip() and not pd.isna(u)
    ]
    if not links:
        return None
    out: dict[str, Any] = {"column": rem_col, "links": links}
    if rem_label:
        out["label"] = rem_label
    return out


def _run_violations_pass(handle: TableHandle, fns: list) -> pd.DataFrame:
    """One streaming scan of the input applying every per-row closure."""
    empty = pd.DataFrame({c: [] for c in VIOLATION_COLUMNS})
    if not fns:
        return empty

    def run_all(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for fn in fns:
            frames.extend(fn(df))
        if not frames:
            return empty.astype({"row": np.int64})
        return pd.concat(frames, ignore_index=True)

    out = handle.ds.map_batches(run_all, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    return out
