"""Standalone report v0 model + writer (SURVEY §2.1; VERDICT r2 missing #4).

Reference contract: ``core/models/report_v0.py`` (dataclass family) and
``core/services/report_writer.py:71-132`` (``write_report`` — deterministic
sort of warnings/rulepacks/fields, POSIX-relative input paths, jsonschema
validation, pretty sorted-keys JSON with trailing newline at
``<out_dir>/report.json``). The v0 shape otherwise survives only as the
``_legacy`` block inside preflight report v1 (``preflight.py:229``); this
module restores the standalone artifact for callers following the old docs.

Driver-side artifact code — a report is a few KB regardless of corpus size
(evidence is capped upstream), so there is no Ray here by design.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

import jsonschema

REPORT_V0_VERSION = "0.1.0"
_SCHEMA_FILE = Path(__file__).resolve().parent.parent / "schemas" / "report_v0.schema.json"
_schema_cache: dict | None = None


def _schema() -> dict:
    global _schema_cache
    if _schema_cache is None:
        _schema_cache = json.loads(_SCHEMA_FILE.read_text(encoding="utf-8"))
    return _schema_cache


def _run_at() -> str:
    fixed = os.environ.get("FAIRY_FIXED_TIMESTAMP")
    if fixed:
        return fixed
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _rel_posix(child: Path, root: Path) -> str:
    """report_writer.py:41-47 — POSIX path relative to root, absolute if outside."""
    try:
        return child.resolve(strict=False).relative_to(root.resolve(strict=False)).as_posix()
    except ValueError:
        return child.resolve(strict=False).as_posix()


def _warning_key(w: dict) -> tuple:
    # column/index/check, index normalized to str so None/int/str all compare
    idx = w.get("index")
    return (w.get("column") or "", "" if idx is None else str(idx), w.get("check") or "")


def build_report_v0(
    *,
    filename: str,
    sha256: str,
    meta: dict,
    rulepacks: list[dict] | None = None,
    provenance: dict | None = None,
    input_path: str | Path | None = None,
) -> dict[str, Any]:
    """Assemble + schema-validate the v0 report dict (not yet written)."""
    if input_path is not None:
        data_file = Path(input_path).resolve()
        project_dir = data_file.parent
    else:
        project_dir = Path.cwd().resolve()
        data_file = (project_dir / filename).resolve()

    files: list[dict] = []
    if data_file.exists():
        files.append(
            {"path": _rel_posix(data_file, project_dir), "bytes": data_file.stat().st_size}
        )

    warnings = sorted(
        (
            {
                "column": w["column"],
                "check": w["check"],
                "failure": w["failure"],
                "index": w["index"],
            }
            for w in meta.get("warnings", [])
        ),
        key=_warning_key,
    )
    packs = sorted(
        ({"name": rp["name"], "version": rp["version"]} for rp in (rulepacks or [])),
        key=lambda rp: (rp["name"], rp["version"]),
    )
    prov = {"license": None, "source_url": None, "notes": None}
    prov.update(provenance or {})

    report = {
        "version": REPORT_V0_VERSION,
        "run_at": _run_at(),
        "dataset_id": {"filename": filename, "sha256": sha256},
        "summary": {
            "n_rows": int(meta.get("n_rows", 0)),
            "n_cols": int(meta.get("n_cols", 0)),
            "fields_validated": sorted(meta.get("fields_validated", [])),
        },
        "warnings": warnings,
        "rulepacks": packs,
        "provenance": prov,
        "inputs": {"project_dir": str(project_dir), "files": files},
        "checks": [],
        "scores": {"preflight": 0.0},
    }
    jsonschema.validate(instance=report, schema=_schema())
    return report


def write_report_v0(out_dir: str | Path, **kwargs) -> Path:
    """Write ``<out_dir>/report.json`` exactly as report_writer.py:124-131 does."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    report = build_report_v0(**kwargs)
    path = out / "report.json"
    path.write_text(
        json.dumps(report, ensure_ascii=False, indent=2, sort_keys=True) + "\n",
        encoding="utf-8",
    )
    return path
