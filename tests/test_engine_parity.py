"""Byte-level parity: our Ray rule engine vs the reference runner.

The reference implementation at /root/reference is imported (read-only,
test-time only — never at runtime, never copied) and run on its own
fixtures as the oracle; our distributed engine must produce the same
report dict modulo engine-version fields. This is the strongest form of
SURVEY.md §5's golden-test layer.
"""

import copy
import os
import sys

import pytest

REF_SRC = "/root/reference/src"
REF_FIX = "/root/reference/tests/fixtures"
NOW = "2025-11-11T12:00:00Z"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference repo not available"
)


def ref_run(inputs_map, rulepack, rp_path):
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from pathlib import Path

    from fairy.validation.rulepack_runner import run_rulepack as _run

    return _run({k: Path(v) for k, v in inputs_map.items()}, rulepack, Path(rp_path), NOW)


def our_run(inputs_map, rulepack, rp_path):
    from fairy_core_ray.engine import run_rulepack

    return run_rulepack(inputs_map, rulepack, rp_path, NOW)


def normalize(report):
    """Blank engine-version fields (the only legitimately differing keys,
    mirroring the reference's own golden-test VOLATILE_KEYS policy,
    /root/reference/tests/helpers.py:6-14)."""
    r = copy.deepcopy(report)
    r["engine"]["fairy_core_version"] = "X"
    for k in ("core_version", "fairy_core_version"):
        r["attestation"][k] = "X"
    return r


def assert_parity(inputs_map, rp_path):
    from fairy_core_ray.rulepack import load_rulepack

    rulepack = load_rulepack(rp_path)
    ours = normalize(our_run(inputs_map, rulepack, rp_path))
    ref = normalize(ref_run(inputs_map, rulepack, rp_path))
    assert ours == ref


def test_penguins_parity():
    assert_parity(
        {"default": f"{REF_FIX}/penguins_small.csv"},
        "/root/reference/rulepacks/examples/penguins/rulepack.yml",
    )


def test_art_collections_pass_parity():
    assert_parity(
        {
            "artists": f"{REF_FIX}/art-collections/artists.csv",
            "artworks": f"{REF_FIX}/art-collections/artworks_pass.csv",
        },
        f"{REF_FIX}/art-collections/rulepack.yaml",
    )


def test_art_collections_fk_fail_parity():
    assert_parity(
        {
            "artists": f"{REF_FIX}/art-collections/artists.csv",
            "artworks": f"{REF_FIX}/art-collections/artworks_fail_missing_artist.csv",
        },
        f"{REF_FIX}/art-collections/rulepack.yaml",
    )


def test_regex_demo_parity():
    rp = {
        "meta": {"name": "regex-demo", "version": "0.0.1"},
        "rules": [
            {
                "id": "sample_id_format",
                "type": "regex",
                "severity": "fail",
                "config": {
                    "pattern": "regex_demo.csv",
                    "column": "sample_id",
                    "regex": "^[A-Z]{3}-[0-9]{5}-[0-9]{3}$",
                    "mode": "not_matches",
                },
            },
            {
                "id": "no_ctrl_chars",
                "type": "regex",
                "severity": "warn",
                "config": {
                    "pattern": "regex_demo.csv",
                    "column": "product_name",
                    "regex": "[\\t\\r\\n\\x00-\\x1F\\x7F]",
                    "mode": "matches",
                    "ignore_empty": False,
                },
            },
        ],
    }
    inputs = {"default": f"{REF_FIX}/regex_demo.csv"}
    ours = normalize(our_run(inputs, rp, "inline.yml"))
    ref = normalize(ref_run(inputs, rp, "inline.yml"))
    assert ours == ref


def test_unknown_rule_type_and_missing_column_parity():
    rp = {
        "meta": {"name": "edge", "version": "0.0.1"},
        "rules": [
            {
                "id": "z_unknown",
                "type": "telepathy",
                "severity": "fail",
                "config": {"pattern": "penguins*.csv"},
            },
            {
                "id": "a_missing_col",
                "type": "non_empty_trimmed",
                "severity": "fail",
                "config": {"pattern": "penguins*.csv", "column": "-species"},
            },
            {
                "id": "m_range_missing",
                "type": "range",
                "severity": "warn",
                "config": {"pattern": "penguins*.csv", "column": "nope", "min": 0},
            },
        ],
    }
    inputs = {"default": f"{REF_FIX}/penguins_small.csv"}
    ours = normalize(our_run(inputs, rp, "inline.yml"))
    ref = normalize(ref_run(inputs, rp, "inline.yml"))
    assert ours == ref


def test_url_and_remediation_parity(tmp_path):
    csv = tmp_path / "links.csv"
    csv.write_text(
        "id,homepage,fix_url\n"
        "1,https://example.org,https://fix.example/1\n"
        "2,www.example.com,https://fix.example/2\n"
        "3,not a url,https://fix.example/3\n"
        "4,ftp://example.org/file,\n"
        "5,,https://fix.example/5\n"
    )
    rp = {
        "meta": {"name": "urls", "version": "0.0.1"},
        "rules": [
            {
                "id": "homepage_url",
                "type": "url",
                "severity": "warn",
                "config": {
                    "pattern": "links.csv",
                    "column": "homepage",
                    "remediation_link_column": "fix_url",
                    "remediation_link_label": "Fix record",
                },
            },
            {
                "id": "homepage_nonempty",
                "type": "non_empty_trimmed",
                "severity": "fail",
                "config": {
                    "pattern": "links.csv",
                    "column": "homepage",
                    "remediation_link_column": "fix_url",
                },
            },
        ],
    }
    inputs = {"default": str(csv)}
    ours = normalize(our_run(inputs, rp, "inline.yml"))
    ref = normalize(ref_run(inputs, rp, "inline.yml"))
    assert ours == ref


def test_duplicate_rule_ids_parity(tmp_path):
    """Rulepacks with duplicate rule ids are legal input: each entry must
    be evaluated independently (results keyed by position, not id)."""
    csv = tmp_path / "dupids.csv"
    csv.write_text(
        "name,qty\n"
        "alice,5\n"
        " ,20\n"
        "bob,-3\n"
        ",7\n"
    )
    rp = {
        "meta": {"name": "dup-ids", "version": "0.0.1"},
        "rules": [
            {
                "id": "same_id",
                "type": "non_empty_trimmed",
                "severity": "fail",
                "config": {"pattern": "dupids.csv", "column": "name"},
            },
            {
                "id": "same_id",
                "type": "range",
                "severity": "warn",
                "config": {"pattern": "dupids.csv", "column": "qty", "min": 0, "max": 10},
            },
            {
                "id": "same_id",
                "type": "range",
                "severity": "fail",
                "config": {"pattern": "dupids.csv", "column": "qty", "min": -100, "max": 6},
            },
        ],
    }
    inputs = {"default": str(csv)}
    ours = normalize(our_run(inputs, rp, "inline.yml"))
    ref = normalize(ref_run(inputs, rp, "inline.yml"))
    assert ours == ref
    # and the three same-id results are genuinely distinct
    rules = ours["resources"][0]["rules"]
    assert len(rules) == 3
    assert len({repr(r["evidence"]) for r in rules}) == 3
