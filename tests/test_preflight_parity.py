"""Preflight report-v1 parity: our Ray runner vs the reference
validator on the reference's own samples/files fixtures, across all six
domain check types."""

import copy
import json
import os
import sys

import pytest

REF_SRC = "/root/reference/src"
REF_FIX = "/root/reference/tests/fixtures"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference repo not available"
)

SIX_RULE_PACK = {
    "meta": {"id": "GEO-SEQ-BULK", "name": "geo_bulk_seq", "version": "0.2.0",
             "description": "parity pack"},
    "rules": [
        {
            "id": "GEO.REQ.MISSING_FIELD",
            "type": "check",
            "code": "GEO.REQ.MISSING_FIELD",
            "severity": "FAIL",
            "where": "samples.tsv",
            "why": "GEO requires these fields for each sample.",
            "how_to_fix": "Add the missing column(s).",
            "check": {
                "type": "require_columns",
                "required_columns": [
                    "sample_title", "organism", "library_strategy",
                    "molecule", "instrument_model",
                ],
            },
        },
        {
            "id": "GEO.BIO.CONTEXT_MISSING",
            "type": "check",
            "code": "GEO.BIO.CONTEXT_MISSING",
            "severity": "FAIL",
            "where": "samples.tsv",
            "why": "Biological context required.",
            "how_to_fix": "Fill tissue/cell_line/cell_type.",
            "check": {
                "type": "at_least_one_nonempty_per_row",
                "column_groups": [["tissue", "cell_line", "cell_type"]],
            },
        },
        {
            "id": "CORE.ID.UNMATCHED_SAMPLE",
            "type": "check",
            "code": "CORE.ID.UNMATCHED_SAMPLE",
            "severity": "FAIL",
            "where": "files.tsv",
            "why": "Every file must reference a known sample.",
            "how_to_fix": "Fix sample_id.",
            "check": {"type": "id_crosscheck", "left_key": "sample_id"},
        },
        {
            "id": "GEO.FILE.PAIRING_MISMATCH",
            "type": "check",
            "code": "GEO.FILE.PAIRING_MISMATCH",
            "severity": "FAIL",
            "where": "files.tsv",
            "why": "Paired samples need R1+R2.",
            "how_to_fix": "Provide both mates.",
            "check": {"type": "paired_end_complete"},
        },
        {
            "id": "CORE.DATE.INVALID_ISO8601",
            "type": "check",
            "code": "CORE.DATE.INVALID_ISO8601",
            "severity": "WARN",
            "where": "samples.tsv",
            "why": "Dates must be ISO8601.",
            "how_to_fix": "Use YYYY-MM-DD.",
            "check": {"type": "dates_are_iso8601", "columns": ["collection_date"]},
        },
        {
            "id": "GEO.REQ.MISSING_PROCESSED_DATA",
            "type": "check",
            "code": "GEO.REQ.MISSING_PROCESSED_DATA",
            "severity": "WARN",
            "where": "files.tsv",
            "why": "Raw data needs processed output.",
            "how_to_fix": "Add counts.",
            "check": {"type": "processed_data_present"},
        },
    ],
}

VOLATILE = {"run_at_utc", "generated_at"}
VERSIONS = {"fairy_version", "fairy_core_version"}


def normalize(obj):
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k in VOLATILE:
                out[k] = "T"
            elif k in VERSIONS:
                out[k] = "V"
            else:
                out[k] = normalize(v)
        return out
    if isinstance(obj, list):
        return [normalize(v) for v in obj]
    return obj


def run_both(tmp_path, samples, files, params=None):
    rp_path = tmp_path / "pack.json"
    rp_path.write_text(json.dumps(SIX_RULE_PACK))
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from pathlib import Path

    from fairy.core.services.validator import run_rulepack as ref_run

    from fairy_core_ray.preflight import run_preflight

    os.environ["FAIRY_FIXED_TIMESTAMP"] = "2025-11-11T12:00:00Z"
    try:
        ref = ref_run(Path(rp_path), Path(samples), Path(files), "X", params or {})
        ours = run_preflight(str(rp_path), samples, files, "X", params or {})
    finally:
        del os.environ["FAIRY_FIXED_TIMESTAMP"]
    return normalize(copy.deepcopy(ours)), normalize(copy.deepcopy(ref))


def test_preflight_fixture_parity(tmp_path):
    ours, ref = run_both(
        tmp_path, f"{REF_FIX}/preflight/samples.tsv", f"{REF_FIX}/preflight/files.tsv"
    )
    assert ours == ref
    # golden expectations from the reference's checked-in golden report
    assert ours["summary"]["by_rule"]["CORE.ID.UNMATCHED_SAMPLE"] == "fail"
    assert ours["summary"]["by_rule"]["CORE.DATE.INVALID_ISO8601"] == "warn"
    assert ours["summary"]["submission_ready"] is False


def test_geo_bulk_seq_min_fixture_parity(tmp_path):
    ours, ref = run_both(
        tmp_path,
        f"{REF_FIX}/geo_bulk_seq_min/samples.tsv",
        f"{REF_FIX}/geo_bulk_seq_min/files.tsv",
    )
    assert ours == ref


def test_scratchrun_demo_parity(tmp_path):
    ours, ref = run_both(
        tmp_path,
        "/root/reference/demos/scratchrun/samples.tsv",
        "/root/reference/demos/scratchrun/files.tsv",
        params={"strict": True, "max": 3},
    )
    assert ours == ref
