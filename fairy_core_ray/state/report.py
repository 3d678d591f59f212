"""Findings → results transformation and deterministic ordering.

Output-compatible with the reference's transform layer
(/root/reference/src/fairy/core/services/transform.py:18-163): results
grouped by rule code, level = worst severity, samples normalized to
1-based rows, sorted by (row, column, str(value)) and capped at 10,
results sorted by (meta.input, meta.column, rule, level).

Distribution note: the per-rule sample cap is an associative merge —
per-partition partial top-10 lists concatenate, re-sort and truncate to
the same global answer (SURVEY.md §2.6), which is how the engine keeps
evidence bounded on arbitrarily large inputs.
"""

from __future__ import annotations

from typing import Any


def _sample_sort_key(s: dict[str, Any]):
    return (
        s.get("row") if s.get("row") is not None else 0,
        s.get("column") if s.get("column") is not None else "",
        str(s.get("value")) if s.get("value") is not None else "",
    )


def _result_sort_key(r: dict[str, Any]):
    meta = r.get("meta") or {}
    return (meta.get("input", ""), meta.get("column", ""), r.get("rule", ""), r.get("level", ""))


def sample_from_details(details: dict[str, Any]) -> dict[str, Any]:
    """Evidence sample from a finding's details (reference
    transform.py:108-137, including its 0-based→1-based quirk: rows >= 1
    pass through unchanged, row 0 becomes 1, negatives are omitted)."""
    sample: dict[str, Any] = {}
    row = details.get("row")
    if row is not None and isinstance(row, int):
        if row >= 1:
            sample["row"] = row
        elif row >= 0:
            sample["row"] = row + 1
    if details.get("column"):
        sample["column"] = details["column"]
    if "value" in details:
        sample["value"] = details["value"]
    if details.get("message"):
        sample["message"] = details["message"]
    if details.get("hint"):
        sample["hint"] = details["hint"]
    return sample


def transform_findings_to_results(
    all_findings: list[dict[str, Any]], all_rules: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    by_code: dict[str, list[dict[str, Any]]] = {}
    for f in all_findings:
        by_code.setdefault(f["code"], []).append(f)

    results: list[dict[str, Any]] = []
    for rule in all_rules:
        code = rule["code"]
        findings = by_code.get(code, [])
        if not findings:
            level, count = "pass", 0
        else:
            sevs = {f["severity"] for f in findings}
            level = "fail" if "FAIL" in sevs else ("warn" if "WARN" in sevs else "pass")
            count = len(findings)
        samples = [
            s
            for s in (sample_from_details(f.get("details", {})) for f in findings)
            if s
        ]
        samples = sorted(samples, key=_sample_sort_key)[:10]
        results.append({"rule": code, "level": level, "count": count, "samples": samples})
    return sorted(results, key=_result_sort_key)


def summarize_results(results: list[dict[str, Any]]) -> tuple[dict, dict]:
    """(by_level, by_rule) with fail > warn > pass precedence and sorted
    rule keys (reference validator.py:192-210)."""
    by_level: dict[str, int] = {"pass": 0, "warn": 0, "fail": 0}
    by_rule: dict[str, str] = {}
    for r in results:
        level, rule_id = r["level"], r["rule"]
        by_level[level] = by_level.get(level, 0) + 1
        prev = by_rule.get(rule_id)
        if prev is None:
            by_rule[rule_id] = level
        elif level == "fail" or (level == "warn" and prev == "pass"):
            by_rule[rule_id] = level
    return by_level, dict(sorted(by_rule.items()))
