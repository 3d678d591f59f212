"""Machine validation of emitted artifacts (report / manifest) against
shipped JSON schemas, plus the drift guard.

Counterpart of the reference's write-time validation
(/root/reference/src/fairy/core/services/report_writer.py:120-122
validates every report against schemas/preflight_report_v1.schema.json)
and its schema drift-guard tests
(/root/reference/tests/schema/test_schema_drift_guard.py:22-50). The
schemas here are authored from THIS engine's emitted shapes; parity
tests pin the shapes to the reference separately.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path
from typing import Any

SCHEMA_DIR = Path(__file__).resolve().parent.parent / "schemas"

REPORT_SCHEMA_VERSION = "1.0.0"
MANIFEST_SCHEMA_VERSION = "1.0.0"


class ContractError(ValueError):
    """An emitted artifact does not satisfy its shipped JSON schema."""


@lru_cache(maxsize=None)
def load_schema(name: str) -> dict[str, Any]:
    return json.loads((SCHEMA_DIR / f"{name}.schema.json").read_text())


def _validate(instance: dict[str, Any], schema_name: str) -> None:
    import jsonschema

    schema = load_schema(schema_name)
    errors = sorted(
        jsonschema.Draft202012Validator(schema).iter_errors(instance),
        key=lambda e: list(e.absolute_path),
    )
    if errors:
        bullets = "; ".join(
            f"{'/'.join(str(p) for p in e.absolute_path) or '<root>'}: {e.message}"
            for e in errors[:10]
        )
        raise ContractError(f"{schema_name} contract violation: {bullets}")


def validate_report(report: dict[str, Any]) -> dict[str, Any]:
    """Validate a preflight report v1 before it is written; returns the
    report unchanged so writers can chain it."""
    _validate(report, "preflight_report_v1")
    return report


def validate_manifest(manifest: dict[str, Any]) -> dict[str, Any]:
    _validate(manifest, "manifest_v1")
    return manifest
