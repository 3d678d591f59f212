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
