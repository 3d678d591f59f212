"""Markdown writer parity vs the reference (pure function, no Ray)."""

import os
import sys

import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference repo not available"
)


def both(report):
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from fairy.validation.rulepack_runner import write_markdown as ref_md

    from fairy_core_ray.state.markdown import write_markdown as our_md

    return our_md(report), ref_md(report)


def test_markdown_parity_rich_report():
    report = {
        "engine": {"fairy_core_version": "9.9.9"},
        "attestation": {
            "timestamp": "2025-11-11T12:00:00Z",
            "rulepack_name": "demo",
            "rulepack_version": "1.2.3",
            "rulepack_source_path": "/rp.yml",
            "rulepack": {},
            "inputs": [
                {"path": "/a.csv", "sha256": "ff", "rows": 10, "bytes": 123},
            ],
        },
        "summary": {"pass": 2, "warn": 1, "fail": 3},
        "resources": [
            {
                "name": "b",
                "path": "/b.csv",
                "rules": [
                    {
                        "id": "z_dup",
                        "type": "dup",
                        "status": "FAIL",
                        "evidence": {
                            "duplicates": [{"rows": [2, 7]}],
                            "count": 2,
                            "remediation": {
                                "column": "fix",
                                "label": "Open",
                                "links": [
                                    {"row": i, "url": f"www.fix.example/{i}"}
                                    for i in range(1, 25)
                                ],
                            },
                        },
                    },
                    {
                        "id": "a_enum",
                        "type": "enum",
                        "status": "WARN",
                        "evidence": {"out_of_set": {"count": 1, "rows": [4]}},
                    },
                    {
                        "id": "m_missing",
                        "type": "range",
                        "status": "FAIL",
                        "evidence": {
                            "error": "column_not_found",
                            "column": "-qty",
                            "available_columns": [f"c{i:02d}" for i in range(40)],
                            "available_column_count": 40,
                            "hint": "YAML list items require a space: use '- qty', not '-qty'.",
                            "suggestion": "qty",
                        },
                    },
                    {
                        "id": "r_regex",
                        "type": "regex",
                        "status": "FAIL",
                        "evidence": {
                            "column": "id",
                            "regex": "^[A-Z]+$",
                            "mode": "not_matches",
                            "ignore_empty": True,
                            "count": 2,
                            "rows": [3, 9],
                            "samples": [
                                {"row": 3, "value": "ab"},
                                {"row": 9, "value": "x1"},
                            ],
                        },
                    },
                ],
            },
            {
                "name": "a",
                "path": "/a.csv",
                "rules": [
                    {
                        "id": "norm",
                        "type": "enum",
                        "status": "PASS",
                        "evidence": {"normalized": True},
                    }
                ],
            },
        ],
    }
    ours, ref = both(report)
    assert ours == ref


def test_markdown_parity_empty_report():
    report = {
        "engine": {},
        "attestation": {"inputs": []},
        "summary": {},
        "resources": [],
    }
    ours, ref = both(report)
    assert ours == ref


def test_preflight_markdown_parity(tmp_path):
    """Our preflight one-pager vs the reference's emit_preflight_markdown
    on the same report dict, all three resolved-block branches."""
    import json
    import pathlib

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from fairy.cli.output_md import emit_preflight_markdown

    from fairy_core_ray.state.markdown import preflight_markdown

    report = {
        "schema_version": "1.0.0",
        "generated_at": "2025-11-11T12:00:00Z",
        "dataset_id": "sha256:abc",
        "metadata": {
            "inputs": {
                "samples": {"path": "/s.tsv", "sha256": "11", "n_rows": 3, "n_cols": 9},
                "files": {},
            },
            "rulepack": {"id": "rp", "version": "0.2.0"},
        },
        "summary": {"by_level": {"pass": 4, "warn": 1, "fail": 1}},
        "results": [
            {
                "rule": "CORE.ID.UNMATCHED_SAMPLE",
                "level": "fail",
                "count": 2,
                "samples": [
                    {"row": 3, "column": "sample_id", "message": "bad", "hint": "fix"},
                    {"row": 5, "column": "sample_id", "value": "S999"},
                    {"row": 6},
                    {"row": 7},
                ],
            },
            {"rule": "GEO.REQ.MISSING_FIELD", "level": "pass", "count": 0, "samples": []},
            {"rule": "CORE.DATE.INVALID_ISO8601", "level": "warn", "count": 1,
             "samples": [{"row": 2, "column": "collection_date", "value": "10/3/25"}]},
        ],
        "_legacy": {"attestation": {"fairy_version": "9.9"}},
    }
    for resolved, prior in [
        (["OLD.CODE"], {"OLD.CODE", "X"}),
        ([], {"X"}),
        ([], None),
    ]:
        md = tmp_path / "x.md"
        emit_preflight_markdown(pathlib.Path(md), report, resolved, prior)
        want = md.read_text()
        got = preflight_markdown(report, resolved, prior)
        assert got == want
