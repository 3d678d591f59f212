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
