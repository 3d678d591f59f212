"""GEO-preflight runner: rulepack → report v1 over Ray Datasets.

Counterpart of /root/reference/src/fairy/core/services/validator.py
:79-346 with the same report v1 contract (schema_version 1.0.0,
dataset_id_method, metadata/summary/results, attestation, _legacy) but
streaming execution: the samples/files tables are Ray Datasets scanned
by vectorized check stages (stages/preflight_checks.py).

``FAIRY_FIXED_TIMESTAMP`` overrides generated_at for golden tests, as in
the reference (validator.py:291-300).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Any

from fairy_core_ray import __version__ as ENGINE_VERSION
from fairy_core_ray.rulepack import load_rulepack
from fairy_core_ray.sources.tables import read_table_stringly
from fairy_core_ray.stages import preflight_checks as pc
from fairy_core_ray.state.provenance import (
    CANON_VERSION_V1,
    compute_dataset_id,
    compute_params_sha256,
    sha256_file,
    summarize_tabular,
)
from fairy_core_ray.state.report import summarize_results, transform_findings_to_results


def now_utc_iso() -> str:
    return datetime.now(timezone.utc).replace(microsecond=0).isoformat()


def _map_severity(internal: str) -> str:
    return "FAIL" if internal.lower() == "error" else "WARN"


def _where_from_issue(issue: dict, fallback: str) -> str:
    bits = []
    if issue.get("row") is not None and issue["row"] >= 0:
        bits.append(f"row {issue['row']}")
    if issue.get("column"):
        bits.append(f"column '{issue['column']}'")
    return ", ".join(bits) if bits else fallback


# Profile registry (reference decisions/0007, preflight_profiles.py:15-51,
# 107-144): a profile pins input aliases + runner. "geo" and "generic" both
# route to the rulepack runner here; new profiles register a callable.
PROFILES: dict[str, dict] = {
    "geo": {"inputs": ("samples", "files"), "runner": "run_preflight"},
    "generic": {"inputs": ("input_01", "input_02"), "runner": "run_preflight"},
}


def run_profile(profile_id: str, rulepack_path: str, samples_path: str,
                files_path: str, params: dict | None = None) -> dict:
    if profile_id not in PROFILES:
        raise KeyError(
            f"Unknown profile '{profile_id}'; known: {sorted(PROFILES)}"
        )
    return run_preflight(rulepack_path, samples_path, files_path, params=params)


def run_preflight(
    rulepack_path: str,
    samples_path: str,
    files_path: str,
    fairy_version: str | None = None,
    params: dict | None = None,
) -> dict[str, Any]:
    """Run the GEO preflight rulepack → report v1 dict."""
    import ray.data as rd

    fairy_version = fairy_version or ENGINE_VERSION
    pack = load_rulepack(rulepack_path)
    # the reference's pydantic Meta model ({name, version, description},
    # no extras) silently drops any other meta keys (schema.py:8-11), so
    # e.g. a meta.id never survives loading — mirror that filtering
    raw_meta = pack.get("meta") or {}
    meta = {k: raw_meta.get(k) for k in ("name", "version", "description")}
    rp_name = meta.get("name") or "UNKNOWN_RULEPACK"
    rp_id = rp_name
    rp_version = meta.get("version") or pack.get("rulepack_version") or "0.0.0"
    rp_sha256 = sha256_file(rulepack_path)

    samples_tbl = read_table_stringly(samples_path)
    files_tbl = read_table_stringly(files_path)
    samples_cols = [c for c in samples_tbl.column_names if c != "__row__"]
    files_cols = [c for c in files_tbl.column_names if c != "__row__"]
    samples_ds = rd.from_arrow(samples_tbl)
    files_ds = rd.from_arrow(files_tbl)

    all_findings: list[dict] = []
    all_rules: list[dict] = []
    for rule in pack["rules"]:
        all_rules.append(rule)
        spec = rule["check"]
        ctype = spec["type"]
        if ctype == "require_columns":
            items = pc.check_required_columns(samples_cols, spec.get("required_columns", []))
        elif ctype == "at_least_one_nonempty_per_row":
            groups = spec.get("column_groups", [])
            items = pc.check_bio_context(
                samples_ds, samples_cols, groups[0] if groups else []
            )
        elif ctype == "id_crosscheck":
            items = pc.check_id_crossmatch(
                samples_ds,
                files_ds,
                samples_cols,
                files_cols,
                samples_key=spec.get("left_key", "sample_id"),
            )
        elif ctype == "paired_end_complete":
            items = pc.check_paired_end_complete(
                files_ds,
                files_cols,
                samples_key=spec.get("samples_key", "sample_id"),
                layout_col=spec.get("layout_column", "layout"),
                paired_value=spec.get("layout_value_for_paired", "PAIRED"),
                file_col=spec.get("file_column", "filename"),
                r1_pattern=spec.get("r1_pattern", r"_R1"),
                r2_pattern=spec.get("r2_pattern", r"_R2"),
            )
        elif ctype == "dates_are_iso8601":
            items = pc.check_dates_iso8601(samples_ds, samples_cols, spec.get("columns", []))
        elif ctype == "processed_data_present":
            items = pc.check_processed_data_present(
                files_ds,
                files_cols,
                samples_key=spec.get("samples_key", "sample_id"),
                raw_file_glob=spec.get("raw_file_glob", ".fastq"),
                processed_globs=spec.get(
                    "processed_glob_candidates", [".counts", ".quant", ".gene_counts"]
                ),
            )
        else:
            items = []
        for w in items:
            all_findings.append(
                {
                    "code": rule["code"],
                    "severity": _map_severity(w["severity"]),
                    "where": _where_from_issue(w, rule["where"]),
                    "why": rule["why"],
                    "how_to_fix": rule["how_to_fix"],
                    "details": {
                        "kind": w["kind"],
                        "message": w["message"],
                        "hint": w["hint"],
                        "row": w["row"],
                        "column": w["column"],
                    },
                }
            )

    results = transform_findings_to_results(all_findings, all_rules)
    by_level, by_rule = summarize_results(results)

    inputs_metadata = {
        name: summarize_tabular(path)
        for name, path in sorted({"samples": samples_path, "files": files_path}.items())
    }
    fail_count = sum(1 for f in all_findings if f["severity"] == "FAIL")
    warn_count = sum(1 for f in all_findings if f["severity"] == "WARN")
    params_sha256 = compute_params_sha256(params)
    attestation = {
        "rulepack_id": rp_id,
        "rulepack_version": rp_version,
        "rulepack_name": rp_name,
        "fairy_version": fairy_version,
        "run_at_utc": now_utc_iso(),
        "submission_ready": (fail_count == 0),
        "fail_count": fail_count,
        "warn_count": warn_count,
        "fairy_core_version": fairy_version,
        "rulepack_source_path": str(rulepack_path),
    }
    rulepack_metadata = {
        "path": str(rulepack_path),
        "sha256": rp_sha256,
        "id": rp_id,
        "version": rp_version,
        "params_sha256": params_sha256,
    }
    dataset_id = compute_dataset_id(
        inputs_sha256={k: v["sha256"] for k, v in inputs_metadata.items()},
        rulepack={"id": rp_id, "version": rp_version, "sha256": rp_sha256},
        params_sha256=params_sha256,
        canon_version=CANON_VERSION_V1,
    )

    timestamp = os.environ.get("FAIRY_FIXED_TIMESTAMP") or now_utc_iso()
    if timestamp.endswith("+00:00"):
        timestamp = timestamp.replace("+00:00", "Z")
    elif not timestamp.endswith("Z") and "T" in timestamp:
        timestamp = timestamp + "Z"

    return {
        "schema_version": "1.0.0",
        "generated_at": timestamp,
        "dataset_id": dataset_id,
        "dataset_id_method": {
            "algorithm": "sha256",
            "canon_version": CANON_VERSION_V1,
            "includes": ["inputs.sha256", "rulepack.sha256", "params.sha256"],
        },
        "metadata": {
            "inputs": inputs_metadata,
            "rulepack": rulepack_metadata,
            "params": {"sha256": params_sha256},
        },
        "summary": {
            "by_level": by_level,
            "by_rule": by_rule,
            "submission_ready": by_level.get("fail", 0) == 0,
        },
        "results": results,
        "engine": {"fairy_core_version": fairy_version},
        "attestation": {
            "rulepack_name": rp_name,
            "rulepack_version": rp_version,
            "rulepack_source_path": str(rulepack_path),
        },
        "_legacy": {"attestation": attestation, "findings": all_findings},
    }
