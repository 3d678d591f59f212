"""Manifest v1 + role inference + per-partition lineage records.

Manifest shape and role rules match the reference
(/root/reference/src/fairy/core/services/manifest.py:15-85); the lineage
extension (one record per Arrow partition: inputs, counts, output hash)
implements the north-star "one JSON per Arrow partition" requirement.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

VALID_ROLES = {"data", "metadata", "report", "log", "other"}


def now_utc_iso_z() -> str:
    return (
        datetime.now(timezone.utc).replace(microsecond=0).isoformat().replace("+00:00", "Z")
    )


def infer_role(relpath: str) -> str:
    """Role from filename conventions (reference manifest.py:15-41)."""
    name = relpath.replace("\\", "/").rsplit("/", 1)[-1].lower()
    if name == "manifest.json" or name in {"samples.tsv", "files.tsv"}:
        return "metadata"
    if name.endswith(".log"):
        return "log"
    if name.endswith(("_report.json", "_report.md", "report.json", "report.md")):
        return "report"
    if name.endswith(
        (".csv", ".tsv", ".txt", ".fasta", ".fa", ".fastq", ".fq", ".bam", ".cram")
    ):
        return "data"
    if name.endswith((".parquet", ".lance")):
        return "data"
    return "other"


def build_manifest_v1(
    *,
    dataset_id: str,
    fairy_version: str,
    source_report: str,
    rulepack_id: str,
    rulepack_version: str,
    files: list[dict[str, Any]],
    created_at_utc: str | None = None,
) -> dict[str, Any]:
    filled = []
    for f in files:
        entry = dict(f)
        role = entry.get("role") or infer_role(str(entry.get("path", "")))
        if role not in VALID_ROLES:
            raise ValueError(f"Unknown role: {role} (path={entry.get('path')})")
        entry["role"] = role
        filled.append(entry)
    return {
        "schema_version": "1.0.0",
        "dataset_id": dataset_id,
        "created_at_utc": created_at_utc or now_utc_iso_z(),
        "fairy_version": fairy_version,
        "hash_algorithm": "sha256",
        "rulepack": {"id": rulepack_id, "version": rulepack_version},
        "source_report": source_report,
        "files": files and filled,
    }


def partition_lineage_record(
    *,
    partition_id: str,
    input_fragments: list[dict[str, Any]],
    output_path: str,
    output_sha256: str,
    counts: dict[str, int],
    dataset_id: str,
    created_at_utc: str | None = None,
) -> dict[str, Any]:
    """One lineage JSON per Arrow partition: what went in, what came out,
    rule counters — the shareable per-partition metrics artifact."""
    return {
        "schema_version": "lineage/v1",
        "partition_id": partition_id,
        "dataset_id": dataset_id,
        "created_at_utc": created_at_utc or now_utc_iso_z(),
        "inputs": input_fragments,
        "output": {"path": output_path, "sha256": output_sha256},
        "counts": counts,
    }
