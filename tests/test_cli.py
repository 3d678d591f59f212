"""CLI end-to-end drive: every subcommand through main(argv) — artifact
contract + exit codes (covers SURVEY §2.1 S4/S8 write paths that were
previously only reachable interactively)."""

import json
import os
from pathlib import Path

import pytest

from fairy_core_ray.cli import main

REF_FIX = "/root/reference/tests/fixtures"


def test_validate_exit_codes_and_artifacts(tmp_path):
    csv = tmp_path / "t.csv"
    csv.write_text("name,qty\nalice,5\n,7\n")
    rp = tmp_path / "rp.yml"
    rp.write_text(
        "meta:\n  name: p\n  version: '1'\n"
        "rules:\n"
        "  - id: r1\n    type: non_empty_trimmed\n    severity: fail\n"
        "    config: {pattern: 't.csv', column: name}\n"
    )
    out = tmp_path / "out"
    rc = main(["validate", "--rulepack", str(rp), "--inputs", str(csv), "--out-dir", str(out)])
    assert rc == 1  # fail findings -> nonzero
    report = json.loads((out / "validate_report.json").read_text())
    assert report["summary"]["fail"] == 1
    assert (out / "validate_report.md").read_text().strip()


def test_preflight_writes_contracted_artifacts(tmp_path):
    out = tmp_path / "pf"
    rc = main(
        [
            "preflight",
            "--rulepack", f"{REF_FIX}/rulepacks/geo_bulk_seq_min_v0_2_0.json",
            "--samples", f"{REF_FIX}/preflight/samples.tsv",
            "--files", f"{REF_FIX}/preflight/files.tsv",
            "--out-dir", str(out),
        ]
    )
    report = json.loads((out / "preflight_report.json").read_text())
    from fairy_core_ray.state.contracts import validate_manifest, validate_report

    validate_report(report)  # schema-valid on disk
    manifest = json.loads((out / "manifest.json").read_text())
    validate_manifest(manifest)
    assert (out / "artifacts" / "inputs_manifest.json").exists()
    assert rc == (0 if report["summary"]["submission_ready"] else 1)


def test_export_cli_bundle_and_block(tmp_path):
    samples = tmp_path / "samples.tsv"
    samples.write_text("sample_id\tname\ns1\ta\n")
    files = tmp_path / "files.tsv"
    files.write_text("file_name\tsample_id\nf.fq\ts1\n")
    rp_ok = tmp_path / "ok.json"
    rp_ok.write_text(json.dumps({
        "meta": {"name": "ok", "version": "1"},
        "rules": [{"id": "R1", "type": "check", "code": "R1", "severity": "FAIL",
                   "where": "samples.tsv", "why": "w", "how_to_fix": "h",
                   "check": {"type": "require_columns", "required_columns": ["sample_id"]}}],
    }))
    out = tmp_path / "exp"
    rc = main(["export", "--rulepack", str(rp_ok), "--samples", str(samples),
               "--files", str(files), "--out-dir", str(out)])
    assert rc == 0
    assert (out.parent / "exp_bundle.zip").exists() or Path(str(out) + "_bundle.zip").exists()

    rp_bad = tmp_path / "bad.json"
    rp_bad.write_text(json.dumps({
        "meta": {"name": "bad", "version": "1"},
        "rules": [{"id": "R1", "type": "check", "code": "R1", "severity": "FAIL",
                   "where": "samples.tsv", "why": "w", "how_to_fix": "h",
                   "check": {"type": "require_columns", "required_columns": ["nope"]}}],
    }))
    out2 = tmp_path / "exp2"
    rc = main(["export", "--rulepack", str(rp_bad), "--samples", str(samples),
               "--files", str(files), "--out-dir", str(out2)])
    assert rc == 1
    assert not Path(str(out2) + "_bundle.zip").exists()


def test_tile_writes_resumable_output(tmp_path):
    from fairy_core_ray.sources.synth import ensure_image_dataset

    images = ensure_image_dataset(2000, seed=42)
    out = tmp_path / "tiles"
    rc = main(["tile", "--images", images, "--out", str(out),
               "--target-rows", "500", "--no-decode"])
    assert rc == 0
    manifest = json.loads((out / "_completed_shards.json").read_text())
    assert manifest["schema_version"] == "completed-shards/v1"
    shards = manifest["shards"]
    assert shards and all((out / f"{s['shard']}.parquet").exists() for s in shards)
    assert all((out / f"{s['shard']}.lineage.json").exists() for s in shards)


def test_run_legacy_single_file_entry(tmp_path, capsys):
    """Legacy `run` entry (reference cli/run.py:213-371 artifact
    contract): report JSON at --out, .md one-pager beside it,
    .fairy_last_run.json diff cache, console summary with baseline /
    resolved-codes diff across two runs, exit code on submission_ready."""
    samples = tmp_path / "samples.tsv"
    samples.write_text("sample_id\tname\ns1\ta\n")
    files = tmp_path / "files.tsv"
    files.write_text("file_name\tsample_id\nf.fq\ts1\n")

    def rp(path, required):
        path.write_text(json.dumps({
            "meta": {"name": "p", "version": "1"},
            "rules": [{"id": "R1", "type": "check", "code": "R1",
                       "severity": "FAIL", "where": "samples.tsv",
                       "why": "w", "how_to_fix": "h",
                       "check": {"type": "require_columns",
                                 "required_columns": [required]}}],
        }))
        return path

    rp_bad = rp(tmp_path / "bad.json", "nope")
    rp_ok = rp(tmp_path / "ok.json", "sample_id")
    out = tmp_path / "o" / "report.json"

    rc = main(["run", "--rulepack", str(rp_bad), "--samples", str(samples),
               "--files", str(files), "--out", str(out),
               "--fairy-version", "9.9.9"])
    assert rc == 1  # FAIL finding -> not submission_ready
    report = json.loads(out.read_text())
    assert report["engine"]["fairy_core_version"] == "9.9.9"
    assert (tmp_path / "o" / "report.md").read_text().strip()
    cache = json.loads((tmp_path / "o" / ".fairy_last_run.json").read_text())
    assert cache["codes"] == ["R1"]
    cap = capsys.readouterr().out
    assert "=== FAIRy Preflight ===" in cap
    assert "(no baseline from prior run)" in cap
    assert "submission_ready: False" in cap

    rc2 = main(["run", "--rulepack", str(rp_ok), "--samples", str(samples),
                "--files", str(files), "--out", str(out)])
    assert rc2 == 0
    cap2 = capsys.readouterr().out
    assert "submission_ready: True" in cap2
    assert "✔ R1" in cap2  # resolved since last run
    cache2 = json.loads((tmp_path / "o" / ".fairy_last_run.json").read_text())
    assert cache2["codes"] == []
