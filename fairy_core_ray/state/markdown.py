"""Deterministic Markdown report writer.

Output-identical to the reference's validate-path writer
(/root/reference/src/fairy/validation/rulepack_runner.py:829-936):
resources sorted by path, rules by id, remediation links capped at 20,
available-columns display capped at 30.
"""

from __future__ import annotations

import re
from typing import Any

MAX_REMEDIATION_LINKS = 20
_SCHEME_PREFIX = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def href(url: str) -> str:
    """Clickable URL without mutating stored data
    (rulepack_runner.py:316-323)."""
    u = (url or "").strip()
    if not u or _SCHEME_PREFIX.match(u):
        return u
    return f"https://{u}"


def preflight_markdown(
    report: dict[str, Any],
    resolved_codes: list[str],
    prior_codes: set[str] | None,
) -> str:
    """Curator-facing preflight one-pager, string-identical to the
    reference's emit_preflight_markdown
    (/root/reference/src/fairy/cli/output_md.py:32-226)."""
    metadata = report.get("metadata", {})
    summary = report.get("summary", {})
    results = report.get("results", [])
    legacy_att = report.get("_legacy", {}).get("attestation")
    inputs = metadata.get("inputs", {})
    rulepack_meta = metadata.get("rulepack", {})
    rulepack_id = rulepack_meta.get("id") or rulepack_meta.get("name") or "UNKNOWN_RULEPACK"
    rulepack_version = rulepack_meta.get("version") or "0.0.0"
    fairy_version = legacy_att.get("fairy_version", "unknown") if legacy_att else "unknown"
    by_level = summary.get("by_level", {})
    fail_count = by_level.get("fail", 0)
    warn_count = by_level.get("warn", 0)
    submission_ready = fail_count == 0

    def input_block(label: str, meta: dict) -> list[str]:
        if not meta:
            return [f"### {label}", "", "_no input metadata_", ""]
        return [
            f"### {label}",
            "",
            f"- path: '{meta.get('path', '?')}'",
            f"- sha256: '{meta.get('sha256', '?')}'",
            f"- rows: '{meta.get('n_rows', '?')}'",
            f"- cols: '{meta.get('n_cols', '?')}'",
            "",
        ]

    fail_codes = sorted({r["rule"] for r in results if r["level"] == "fail"})
    warn_codes = sorted({r["rule"] for r in results if r["level"] == "warn"})

    table = ["| Level | Rule | Count | Samples |", "|-------|------|-------|--------|"]
    for r in results:
        samples = r.get("samples", [])
        if samples:
            summaries = []
            for s in samples[:3]:
                parts = []
                if s.get("row"):
                    parts.append(f"row {s['row']}")
                if s.get("column"):
                    parts.append(f"col {s['column']}")
                if parts:
                    summaries.append(", ".join(parts))
            text = "; ".join(summaries)
            if len(samples) > 3:
                text += f" (+{len(samples) - 3} more)"
        else:
            text = "(none)"
        table.append(
            f"| {r.get('level', '?')} | {r.get('rule', '?')} | {r.get('count', 0)} | {text} |"
        )

    if prior_codes is None:
        resolved_block = ["_No baseline from prior run (first run or cache missing)._"]
    elif not resolved_codes:
        resolved_block = ["_No previously-reported issues resolved._"]
    else:
        resolved_block = [f" -✅ {code}" for code in resolved_codes]

    lines: list[str] = [
        "# FAIRy Preflight Report",
        "",
        f"- **Schema version:** {report.get('schema_version', '?')}",
        f"- **Rulepack:** {rulepack_id}@{rulepack_version}",
        f"- **FAIRy version:** {fairy_version}",
        f"- **Generated at (UTC):** {report.get('generated_at', '?')}",
        f"- **Dataset ID:** {report.get('dataset_id', '?')}",
        f"- **submission_ready:** `{submission_ready}`",
        "",
        "## Summary",
        "",
        f"- FAIL findings: {fail_count} {fail_codes}",
        f"- WARN findings: {warn_count} {warn_codes}",
        "",
        "If `submission_ready` is `True`, FAIRy believes this dataset is ready to submit.",
        "",
        "---",
        "",
        "## Input provenance",
        "",
        "These hashes and dimensions identify the exact files that FAIRy validated.",
        "You can hand this block to a curator or PI as evidence of what was checked.",
        "",
    ]
    lines += input_block("samples.tsv", inputs.get("samples", {}))
    lines += input_block("files.tsv", inputs.get("files", {}))
    lines += [
        "---",
        "",
        "## Results (all current issues)",
        "",
        "Level `fail` means “must fix before submission.”",
        "Level `warn` means “soft violation / likely curator feedback.”",
        "Level `pass` means the rule passed with no violations.",
        "",
    ]
    if results:
        lines += table
        lines += [""]
        for r in results:
            if r.get("count", 0) > 0 and r.get("samples"):
                samples = r.get("samples", [])
                n = len(samples)
                lines += [
                    f"### {r.get('rule', '?')} ({r.get('level', '?')}, "
                    f"{n} sample{'s' if n != 1 else ''})",
                    "",
                ]
                for s in samples:
                    parts = []
                    if s.get("row"):
                        parts.append(f"row {s['row']}")
                    if s.get("column"):
                        parts.append(f"column '{s['column']}'")
                    if s.get("value") is not None:
                        parts.append(f"value: {s['value']}")
                    if s.get("message"):
                        parts.append(f"message: {s['message']}")
                    if s.get("hint"):
                        parts.append(f"hint: {s['hint']}")
                    if parts:
                        lines.append(f"- {', '.join(parts)}")
                lines += [""]
    else:
        lines += ["_No results (all rules passed)._", ""]
    lines += ["---", "", "## Resolved since last run", ""]
    if resolved_block:
        lines += resolved_block
    lines += [""]
    return "\n".join(lines)


def write_markdown(report: dict[str, Any]) -> str:
    eng = report.get("engine", {}) or {}
    att = report.get("attestation", {})
    rp = att.get("rulepack", {})
    version = (
        eng.get("fairy_core_version")
        or att.get("fairy_core_version")
        or att.get("core_version")
        or ""
    )
    lines: list[str] = [
        "# FAIRy Validate Report",
        "",
        f"**Timestamp:** {att.get('timestamp', '')}",
        f"**FAIRy core:** {version}",
        f"**Rulepack:** {att.get('rulepack_name') or rp.get('id', '')}"
        f"@{att.get('rulepack_version') or rp.get('version', '')}",
        f"**Rulepack source:** {att.get('rulepack_source_path') or rp.get('path', '')}",
        "",
        "## Summary",
        f"- PASS: {report.get('summary', {}).get('pass', 0)}",
        f"- WARN: {report.get('summary', {}).get('warn', 0)}",
        f"- FAIL: {report.get('summary', {}).get('fail', 0)}",
        "",
        "## Inputs",
    ]
    for i in att.get("inputs", []):
        lines.append(
            f"- `{i.get('path', '')}` — sha256={i.get('sha256', '')}, "
            f"rows={i.get('rows', '')}, bytes={i.get('bytes', '')}"
        )
    lines.append("")
    for res in sorted(report.get("resources", []), key=lambda r: r.get("path", "")):
        lines.append(f"## Findings for `{res.get('path', '')}`")
        for rr in sorted(res.get("rules", []), key=lambda r: r.get("id", "")):
            lines.append(f"### [{rr.get('status')}] {rr.get('id')} — {rr.get('type')}")
            ev = rr.get("evidence", {})
            rem = ev.get("remediation")
            if rem and rem.get("links"):
                label = rem.get("label") or "Open record"
                shown = rem["links"][:MAX_REMEDIATION_LINKS]
                lines.append("Remediation:")
                for link in shown:
                    lines.append(f"- Row {link['row']}: [{label}]({href(link['url'])})")
                if len(rem["links"]) > MAX_REMEDIATION_LINKS:
                    lines.append(
                        f"_Showing first {MAX_REMEDIATION_LINKS} remediation links "
                        f"(of {len(rem['links'])})._"
                    )
                lines.append("")
            if "duplicates" in ev:
                for d in ev["duplicates"]:
                    lines.append(f"Duplicates at rows {d.get('rows', [])}")
            if "out_of_set" in ev:
                o = ev["out_of_set"]
                lines.append(
                    f"Out of set rows {o.get('rows', [])} (count={o.get('count', 0)})"
                )
            if "out_of_bounds" in ev:
                o = ev["out_of_bounds"]
                lines.append(
                    f"Out of bounds rows {o.get('rows', [])} (count={o.get('count', 0)})"
                )
            if ev.get("normalized") is True:
                lines.append("Normalized comparison applied.")
            if "error" in ev:
                msg = f"Error: {ev['error']}"
                if ev.get("column"):
                    msg += f" — Column '{ev['column']}' not found."
                if ev.get("available_columns"):
                    cols = ev["available_columns"]
                    total = ev.get("available_column_count", len(cols))
                    if len(cols) <= 30:
                        msg += f"\nAvailable columns ({total}): {', '.join(cols)}"
                    else:
                        msg += (
                            f"\nAvailable columns (first 30 of {total}): "
                            f"{', '.join(cols[:30])}... (+{total - 30} more)"
                        )
                lines.append(msg)
                if ev.get("suggestion"):
                    lines.append(f"Did you mean: {ev['suggestion']}")
                if ev.get("hint"):
                    lines.append(f"Tip: {ev['hint']}")
            if ev.get("regex") and ev.get("rows"):
                lines.append(
                    f"Regex {ev.get('mode')} rows {ev.get('rows', [])} "
                    f"(count={ev.get('count', 0)})"
                )
                for s in (ev.get("samples") or [])[:5]:
                    lines.append(f"- Row {s.get('row')}: {s.get('value')}")
        lines.append("")
    return "\n".join(lines)
