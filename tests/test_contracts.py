"""Artifact-contract tests: report/manifest JSON-schema validation and
the schema drift guard (counterpart of the reference's
tests/schema/test_schema_drift_guard.py:22-50), plus structured
rulepack load errors (reference rulepack/loader.py:40-44)."""

import copy
import json

import pytest

from fairy_core_ray.rulepack import RulepackError, load_rulepack_text
from fairy_core_ray.state.contracts import (
    ContractError,
    load_schema,
    validate_manifest,
    validate_report,
)

REF_FIX = "/root/reference/tests/fixtures"


@pytest.fixture(scope="module")
def good_report():
    from fairy_core_ray.preflight import run_preflight

    return run_preflight(
        f"{REF_FIX}/rulepacks/geo_bulk_seq_min_v0_2_0.json",
        f"{REF_FIX}/preflight/samples.tsv",
        f"{REF_FIX}/preflight/files.tsv",
    )


class TestDriftGuard:
    def test_schema_version_const_locked(self):
        schema = load_schema("preflight_report_v1")
        assert schema["properties"]["schema_version"] == {"const": "1.0.0"}
        m = load_schema("manifest_v1")
        assert m["properties"]["schema_version"] == {"const": "1.0.0"}

    def test_required_top_level_keys_locked(self):
        schema = load_schema("preflight_report_v1")
        assert set(schema["required"]) == {
            "schema_version",
            "generated_at",
            "dataset_id",
            "metadata",
            "summary",
            "results",
        }


class TestReportValidation:
    def test_good_report_validates(self, good_report):
        assert validate_report(good_report) is good_report

    def test_wrong_schema_version_rejected(self, good_report):
        bad = copy.deepcopy(good_report)
        bad["schema_version"] = "2.0.0"
        with pytest.raises(ContractError, match="schema_version"):
            validate_report(bad)

    def test_missing_summary_rejected(self, good_report):
        bad = copy.deepcopy(good_report)
        del bad["summary"]
        with pytest.raises(ContractError, match="summary"):
            validate_report(bad)

    def test_bad_level_rejected(self, good_report):
        bad = copy.deepcopy(good_report)
        if bad["results"]:
            bad["results"][0]["level"] = "LOUD"
            with pytest.raises(ContractError):
                validate_report(bad)

    def test_report_is_json_serializable(self, good_report):
        json.dumps(good_report, sort_keys=True)


class TestManifestValidation:
    def test_good_manifest(self):
        from fairy_core_ray.state.manifest import build_manifest_v1

        m = build_manifest_v1(
            dataset_id="sha256:" + "0" * 64,
            fairy_version="0.1.0",
            source_report="preflight_report.json",
            rulepack_id="rp",
            rulepack_version="1.0.0",
            files=[{"path": "preflight_report.json", "sha256": "a" * 64}],
        )
        assert validate_manifest(m) is m

    def test_bad_role_rejected(self):
        from fairy_core_ray.state.manifest import build_manifest_v1

        m = build_manifest_v1(
            dataset_id="x",
            fairy_version="0.1.0",
            source_report="r.json",
            rulepack_id="rp",
            rulepack_version="1",
            files=[{"path": "a.csv", "sha256": "a" * 64}],
        )
        m["files"][0]["role"] = "mystery"
        with pytest.raises(ContractError, match="role"):
            validate_manifest(m)


class TestRulepackValidation:
    def test_malformed_rules_not_a_list(self):
        with pytest.raises(RulepackError, match="rules"):
            load_rulepack_text(
                "meta:\n  name: x\n  version: '1'\nrules: not-a-list\n"
            )

    def test_old_gen_missing_meta_rejected(self):
        with pytest.raises(RulepackError, match="meta"):
            load_rulepack_text(
                "rules:\n  - id: a\n    type: required\n    config: {pattern: 'x.csv'}\n"
            )

    def test_rule_missing_type_rejected(self):
        with pytest.raises(RulepackError, match="type"):
            load_rulepack_text(
                "meta:\n  name: x\n  version: '1'\n"
                "rules:\n  - id: a\n    config: {pattern: 'x.csv'}\n"
            )

    def test_unknown_rule_type_is_NOT_a_load_error(self):
        # forward compatibility: unknown types surface as runtime FAIL
        rp = load_rulepack_text(
            "meta:\n  name: x\n  version: '1'\n"
            "rules:\n  - id: a\n    type: telepathy\n    config: {pattern: 'x.csv'}\n"
        )
        assert rp["rules"][0]["type"] == "telepathy"

    def test_new_generation_pack_loads(self):
        rp = load_rulepack_text(
            "id: pack\nversion: '2'\n"
            "resources:\n  - pattern: '*.csv'\n    rules:\n      - type: required\n        columns: [a]\n"
        )
        assert rp["resources"][0]["pattern"] == "*.csv"

    def test_yaml_parse_error_is_structured(self):
        with pytest.raises(RulepackError, match="parse error"):
            load_rulepack_text("meta: [unclosed\n  - {")

    def test_reference_example_packs_still_load(self):
        from fairy_core_ray.rulepack import load_rulepack

        for p in (
            "/root/reference/rulepacks/examples/penguins/rulepack.yml",
            f"{REF_FIX}/art-collections/rulepack.yaml",
            f"{REF_FIX}/rulepacks/minimal.yaml",
            f"{REF_FIX}/rulepacks/geo_bulk_seq_min_v0_2_0.json",
        ):
            assert isinstance(load_rulepack(p), dict)


class TestExportBundle:
    """Artifact contract for the export bundle (reference
    export_adapter.py:181-240): ready gate, zip members, attestation id."""

    PASSING_RP = (
        '{"meta": {"name": "ok-pack", "version": "1.0.0"},\n'
        ' "rules": [{"id": "R1", "type": "check", "code": "R1", "severity": "FAIL",\n'
        '   "where": "samples.tsv", "why": "w", "how_to_fix": "h",\n'
        '   "check": {"type": "require_columns", "required_columns": ["sample_id"]}}]}'
    )
    FAILING_RP = (
        '{"meta": {"name": "bad-pack", "version": "1.0.0"},\n'
        ' "rules": [{"id": "R1", "type": "check", "code": "R1", "severity": "FAIL",\n'
        '   "where": "samples.tsv", "why": "w", "how_to_fix": "h",\n'
        '   "check": {"type": "require_columns", "required_columns": ["no_such_column"]}}]}'
    )

    @pytest.fixture()
    def inputs(self, tmp_path):
        samples = tmp_path / "samples.tsv"
        samples.write_text("sample_id\tname\ns1\talpha\ns2\tbeta\n")
        files = tmp_path / "files.tsv"
        files.write_text("file_name\tsample_id\nf1.fq\ts1\nf2.fq\ts2\n")
        return samples, files

    def test_ready_bundle_round_trip(self, tmp_path, inputs):
        import zipfile

        from fairy_core_ray.state.export import export_submission

        samples, files = inputs
        rp = tmp_path / "rp.json"
        rp.write_text(self.PASSING_RP)
        res = export_submission(
            export_dir=tmp_path / "exports" / "e1",
            rulepack=rp,
            samples=samples,
            files=files,
        )
        assert res["attestation_id"].startswith("fairy:attest:")
        with zipfile.ZipFile(res["zip_path"]) as z:
            names = set(z.namelist())
        assert {"report.json", "report.md", "manifest.json", "samples.tsv", "files.tsv"} <= names
        manifest = json.loads((tmp_path / "exports" / "e1" / "manifest.json").read_text())
        assert manifest["submission_ready"] is True
        assert manifest["attestation_id"] == res["attestation_id"]
        # attestation minted from dataset_id exactly as the reference does
        import hashlib

        report = json.loads((tmp_path / "exports" / "e1" / "report.json").read_text())
        assert (
            manifest["attestation_id"]
            == "fairy:attest:" + hashlib.sha256(report["dataset_id"].encode()).hexdigest()
        )

    def test_fail_findings_block_export(self, tmp_path, inputs):
        from fairy_core_ray.state.export import NotSubmissionReady, export_submission

        samples, files = inputs
        rp = tmp_path / "rp.json"
        rp.write_text(self.FAILING_RP)
        out = tmp_path / "exports" / "e2"
        with pytest.raises(NotSubmissionReady):
            export_submission(
                export_dir=out, rulepack=rp, samples=samples, files=files
            )
        assert not (out.parent / "e2_bundle.zip").exists()
