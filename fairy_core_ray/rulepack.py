"""Rulepack model + loader (both schema generations).

Same declarative YAML/JSON dialect as the reference
(/root/reference/src/fairy/rulepack/schema.py:8-29 and
/root/reference/src/fairy/validation/rulepack_runner.py:34-70):

* "old" generation — ``meta{name,version,description}`` +
  ``rules[{id,type,severity,config{pattern,...}}]``; a rule applies to an
  input when ``config.pattern`` fnmatches the filename (exact name match
  also accepted when the pattern has no ``*``).
* "new" generation — top-level ``id``/``version`` +
  ``resources[{pattern, rules[...]}]`` with flat rule dicts.

The loader is deliberately tolerant (like the reference's): unknown rule
types are not a load error — they surface as structured FAIL findings at
run time (rulepack_runner.py:196-206), keeping forward compatibility.
"""

from __future__ import annotations

import json
from fnmatch import fnmatch
from pathlib import Path
from typing import Any

import yaml

CHECK_TYPES = {
    "dup",
    "unique",
    "enum",
    "range",
    "no_duplicate_rows",
    "foreign_key",
    "required",
    "url",
    "non_empty_trimmed",
    "regex",
}


def load_rulepack_text(text: str) -> dict:
    """Parse YAML or JSON rulepack text into a plain dict."""
    stripped = text.lstrip()
    if stripped.startswith("{"):
        return json.loads(text)
    return yaml.safe_load(text) or {}


def load_rulepack(path: str | Path) -> dict:
    return load_rulepack_text(Path(path).read_text())


def extract_meta(rulepack: dict) -> tuple[str, str]:
    """(id, version) from either schema generation
    (rulepack_runner.py:34-42)."""
    if isinstance(rulepack, dict) and ("id" in rulepack or "version" in rulepack):
        return rulepack.get("id", "") or "", rulepack.get("version", "") or ""
    meta = rulepack.get("meta", {}) if isinstance(rulepack, dict) else {}
    return (meta.get("name") or meta.get("id") or ""), (meta.get("version") or "")


def normalize_old_rule(rule: dict) -> dict:
    """Flatten an old-schema rule to uniform access
    (rulepack_runner.py:45-57)."""
    cfg = rule.get("config", {}) or {}
    out = {
        "id": rule.get("id", "") or "",
        "type": (rule.get("type", "") or "").strip(),
        "severity": (rule.get("severity", "fail") or "fail").lower(),
        "_pattern": cfg.get("pattern", "") or "",
    }
    for k, v in cfg.items():
        if k != "pattern":
            out[k] = v
    return out


def applicable_rules(rulepack: dict, filename: str) -> list[dict]:
    """Rules applying to one input file, normalized, sorted by id
    (rulepack_runner.py:60-70, 173-187)."""
    acc: list[dict] = []
    new_resources = (rulepack.get("resources") or []) if isinstance(rulepack, dict) else []
    old_rules = (rulepack.get("rules") or []) if isinstance(rulepack, dict) else []
    if new_resources:
        for res in new_resources:
            pat = res.get("pattern")
            if pat and fnmatch(filename, pat):
                for r in res.get("rules", []) or []:
                    rr = dict(r)
                    rr.setdefault("severity", "fail")
                    rr["severity"] = (rr.get("severity") or "fail").lower()
                    rr["type"] = (rr.get("type", "") or "").strip()
                    acc.append(rr)
    elif old_rules:
        for r in old_rules:
            rr = normalize_old_rule(r)
            pat = rr.get("_pattern", "")
            if not pat:
                continue
            if ("*" in pat and fnmatch(filename, pat)) or (filename == pat):
                acc.append(rr)
    return sorted(acc, key=lambda x: x.get("id", ""))


def rule_meta(rulepack: dict) -> dict[str, Any]:
    rp_id, rp_ver = extract_meta(rulepack)
    return {"id": rp_id, "version": rp_ver}
