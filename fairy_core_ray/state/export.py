"""Export bundle: self-contained, attestation-stamped submission zip.

Counterpart of the reference's export adapter
(/root/reference/src/fairy/core/services/export_adapter.py:80-240):

* runs preflight and HARD-GATES on ``submission_ready`` — exporting with
  fail findings present raises (export_adapter.py:213-217);
* copies the inputs next to the report so the bundle is self-contained;
* builds a manifest v1 with ``submission_ready``, a provenance block,
  and — only when ready — an ``attestation_id`` minted as
  ``fairy:attest:sha256(dataset_id)`` (export_adapter.py:31-33,142-146);
* zips the export dir to ``<dir>_bundle.zip`` (zip written OUTSIDE the
  dir so re-runs never zip the zip).

Validation runs on Ray (preflight.run_preflight); the packaging itself
is driver-side file I/O on the (small) artifact set.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path
from typing import Any

from fairy_core_ray.state.contracts import validate_manifest, validate_report
from fairy_core_ray.state.manifest import build_manifest_v1
from fairy_core_ray.state.provenance import sha256_file


class NotSubmissionReady(RuntimeError):
    """Export requested while fail findings are present."""


def mint_attestation_id_from_dataset_id(dataset_id: str) -> str:
    """fairy:attest:<sha256-of-dataset-id> (export_adapter.py:31-33)."""
    return f"fairy:attest:{hashlib.sha256(dataset_id.encode('utf-8')).hexdigest()}"


def _write_json(path: Path, obj: dict) -> None:
    path.write_text(json.dumps(obj, ensure_ascii=False, indent=2, sort_keys=True))


def export_submission(
    *,
    export_dir: str | Path,
    rulepack: str | Path,
    samples: str | Path,
    files: str | Path,
    fairy_version: str | None = None,
) -> dict[str, Any]:
    """Run preflight, gate on submission_ready, package the bundle.

    Returns {export_dir, zip_path, manifest_path, report_path,
    attestation_id}."""
    from fairy_core_ray.preflight import run_preflight
    from fairy_core_ray.state.markdown import preflight_markdown

    export_dir = Path(export_dir).resolve()
    export_dir.mkdir(parents=True, exist_ok=True)

    report = run_preflight(str(rulepack), str(samples), str(files), fairy_version)
    by_level = (report.get("summary") or {}).get("by_level") or {}
    if (by_level.get("fail", 0) or 0) > 0:
        raise NotSubmissionReady(
            "Export requested while submission_ready == False (fail findings present)"
        )

    report_path = export_dir / "report.json"
    _write_json(report_path, validate_report(report))
    report_md_path = export_dir / "report.md"
    report_md_path.write_text(preflight_markdown(report, set(), None))

    dst_samples = export_dir / "samples.tsv"
    dst_files = export_dir / "files.tsv"
    shutil.copy2(samples, dst_samples)
    shutil.copy2(files, dst_files)

    entries = []
    for p in (dst_samples, dst_files, report_path, report_md_path):
        entries.append(
            {
                "path": p.name,
                "sha256": sha256_file(p, newline_stable=True),
                "bytes": p.stat().st_size,
            }
        )

    rp_meta = (report.get("metadata") or {}).get("rulepack") or {}
    engine_version = (report.get("engine") or {}).get("fairy_core_version") or ""
    manifest = build_manifest_v1(
        dataset_id=report["dataset_id"],
        created_at_utc=report["generated_at"],
        fairy_version=engine_version,
        rulepack_id=rp_meta.get("id") or "UNKNOWN_RULEPACK",
        rulepack_version=rp_meta.get("version") or "0.0.0",
        source_report=report_path.name,
        files=entries,
    )
    if rp_meta.get("sha256"):
        manifest["rulepack"]["sha256"] = rp_meta["sha256"]
    manifest["submission_ready"] = True
    manifest["attestation_id"] = mint_attestation_id_from_dataset_id(
        manifest["dataset_id"]
    )
    manifest["provenance"] = {
        "fairy_core_version": engine_version,
        "inputs": [
            {
                "name": "samples",
                "path": dst_samples.name,
                "sha256": sha256_file(dst_samples, newline_stable=True),
                "bytes": dst_samples.stat().st_size,
            },
            {
                "name": "files",
                "path": dst_files.name,
                "sha256": sha256_file(dst_files, newline_stable=True),
                "bytes": dst_files.stat().st_size,
            },
        ],
    }
    manifest_path = export_dir / "manifest.json"
    _write_json(manifest_path, validate_manifest(manifest))

    zip_base = export_dir.parent / f"{export_dir.name}_bundle"
    zip_path = shutil.make_archive(str(zip_base), "zip", root_dir=export_dir)
    return {
        "export_dir": str(export_dir),
        "zip_path": str(zip_path),
        "manifest_path": str(manifest_path),
        "report_path": str(report_path),
        "attestation_id": manifest["attestation_id"],
    }
