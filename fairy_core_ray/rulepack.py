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


class RulepackError(ValueError):
    """Structured load/validation failure (reference
    rulepack/loader.py:40-44 raises the analogous RulepackError from
    pydantic ValidationError so a typo'd pack FAILS at load instead of
    silently matching zero rules)."""


def _rulepack_models():
    """Pydantic models for both schema generations (built lazily so the
    module imports without pydantic; extra keys are allowed everywhere —
    unknown rule TYPES stay a runtime FAIL finding, not a load error,
    matching the reference's forward-compatibility stance)."""
    from pydantic import BaseModel, ConfigDict, Field

    class _Base(BaseModel):
        model_config = ConfigDict(extra="allow")

    class Meta(_Base):
        # reference schema.py requires name+version for the old generation
        name: str
        version: str
        description: str | None = None

    class OldRule(_Base):
        id: str
        type: str
        config: dict = Field(default_factory=dict)

    class OldRulepack(_Base):
        meta: Meta
        rules: list[OldRule] = Field(min_length=1)
        params: dict = Field(default_factory=dict)

    class NewRule(_Base):
        type: str
        id: str | None = None
        severity: str | None = None

    class Resource(_Base):
        pattern: str
        rules: list[NewRule] = []

    class NewRulepack(_Base):
        id: str | None = None
        version: str | None = None
        resources: list[Resource]

    return OldRulepack, NewRulepack


def validate_rulepack(data: Any) -> dict:
    """Shape-validate a parsed rulepack; returns it unchanged (execution
    keeps the raw dict — extra keys like per-type config fields must
    survive, which pydantic round-tripping would not guarantee)."""
    if not isinstance(data, dict):
        raise RulepackError("Expected a mapping at the rulepack top level.")
    try:
        from pydantic import ValidationError
    except ImportError:  # pydantic absent: skip the structural check
        return data
    old_model, new_model = _rulepack_models()
    model = new_model if "resources" in data else old_model
    try:
        model.model_validate(data)
    except ValidationError as e:
        bullets = "; ".join(
            f"{'.'.join(str(p) for p in err['loc'])}: {err['msg']}" for err in e.errors()[:10]
        )
        raise RulepackError(f"Rulepack schema validation failed: {bullets}") from e
    return data


def load_rulepack_text(text: str) -> dict:
    """Parse YAML or JSON rulepack text into a validated plain dict."""
    stripped = text.lstrip()
    try:
        if stripped.startswith("{"):
            data = json.loads(text)
        else:
            data = yaml.safe_load(text) or {}
    except Exception as e:
        raise RulepackError(f"Rulepack parse error: {e}") from e
    return validate_rulepack(data)


def load_rulepack(path: str | Path) -> dict:
    try:
        text = Path(path).read_text()
    except OSError as e:
        raise RulepackError(f"Could not read rulepack '{path}': {e}") from e
    return load_rulepack_text(text)


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
