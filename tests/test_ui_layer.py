"""UI-layer parity vs the reference (SURVEY §2 S11 + R8–R11 + report v0).

Masks, issue lists, project-storage trees and the standalone v0 report are
compared against the reference implementation (read-only import) on shared
inputs, the same way the other parity suites do.
"""

import dataclasses
import json
import os
import shutil
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from fairy_core_ray.stages import ui_adapters as ua
from fairy_core_ray.state.projects import ProjectStore
from fairy_core_ray.state.report_v0 import build_report_v0, write_report_v0

REF_SRC = "/root/reference/src"
REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference repo not available"
)


def _ref(modname):
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import importlib

    return importlib.import_module(modname)


def issues_to_dicts(issues):
    return [dataclasses.asdict(i) for i in issues]


FRAME = pd.DataFrame(
    {
        "Sample ID": ["a1", "A1", "b2", "", None, "c3"],
        "sample_id": ["x", "y", "z", "w", "v", "u"],
        "url": ["http://ok", "ftp://no", None, "www.site.org", "nope", "https://y"],
        "qty": ["1", "7", "oops", None, "-3", "2"],
    }
)


class TestUiValidators:
    def test_missing_required_parity(self):
        ref = _ref("fairy.validation.checks")
        for cols in (["Sample ID", "qty"], ["absent"], ["url", "absent", "qty"]):
            m_ref, i_ref = ref.missing_required(cols)(FRAME)
            m_our, i_our = ua.ui_missing_required(cols)(FRAME)
            pd.testing.assert_frame_equal(m_ref, m_our)
            assert issues_to_dicts(i_ref) == issues_to_dicts(i_our)

    def test_duplicate_in_column_parity(self):
        ref = _ref("fairy.validation.checks")
        for col in ("Sample ID", "sample_id", "absent"):
            m_ref, i_ref = ref.duplicate_in_column(col)(FRAME)
            m_our, i_our = ua.ui_duplicate_in_column(col)(FRAME)
            pd.testing.assert_frame_equal(m_ref, m_our)
            assert issues_to_dicts(i_ref) == issues_to_dicts(i_our)

    def test_column_name_mismatch_parity(self):
        ref = _ref("fairy.validation.checks")
        m_ref, i_ref = ref.column_name_mismatch()(FRAME)
        m_our, i_our = ua.ui_column_name_mismatch()(FRAME)
        pd.testing.assert_frame_equal(m_ref, m_our)
        assert issues_to_dicts(i_ref) == issues_to_dicts(i_our)

    def test_combine_masks_union(self):
        # reference combine_masks raises TypeError on current pandas
        # (reindex_like has no fill_value) — assert intended semantics instead
        m1, _ = ua.ui_missing_required(["qty"])(FRAME)
        m2, _ = ua.ui_duplicate_in_column("Sample ID")(FRAME)
        merged = ua.combine_masks({"req": m1, "dup": m2})
        assert merged.equals(m1 | m2)
        # a mask from a narrower frame unions as False for missing cells
        narrow = ua.blank_mask(FRAME[["qty"]])
        narrow.loc[0, "qty"] = True
        merged2 = ua.combine_masks({"a": ua.blank_mask(FRAME), "b": narrow})
        assert bool(merged2.loc[0, "qty"]) and merged2.to_numpy().sum() == 1
        assert ua.combine_masks({}).empty


class TestRuleResultAdapters:
    """R11: run the reference rr_* rules, adapt the SAME RuleResult both ways."""

    def _rule_results(self):
        ref = _ref("fairy.validation.checks")
        rrs = [
            ref.rr_row_unique(FRAME, column="Sample ID", case_insensitive=True),
            ref.rr_column_url(FRAME, column="url"),
            ref.rr_column_numeric_range(FRAME, column="qty", min_value=0, max_value=5),
            ref.rr_schema_required(FRAME, required=["absent", "qty"]),
        ]
        return [rr for rr in rrs if rr is not None]

    def test_issue_adapter_parity(self):
        ref_types = _ref("fairy.validation.types")
        for rr in self._rule_results():
            ours = ua.rule_result_to_issues(dataclasses.asdict(rr))
            theirs = ref_types.rule_result_to_issues(rr)
            assert issues_to_dicts(theirs) == issues_to_dicts(ours)
            # dataclass passthrough works too
            assert issues_to_dicts(ua.rule_result_to_issues(rr)) == issues_to_dicts(ours)

    def test_mask_adapter_parity(self):
        ref_types = _ref("fairy.validation.types")
        for rr in self._rule_results():
            pd.testing.assert_frame_equal(
                ref_types.rule_result_to_mask(FRAME, rr),
                ua.rule_result_to_mask(FRAME, dataclasses.asdict(rr)),
            )

    def test_summary_issue_on_overflow(self):
        rr = {
            "id": "row.unique",
            "level": "warn",
            "count": 99,
            "samples": [{"row": 3, "value": "v", "detail": None}],
            "meta": {"column": "sample_id"},
        }
        issues = ua.rule_result_to_issues(rr)
        assert issues[-1].kind == "row.unique.summary"
        assert "99 total" in issues[-1].message
        mask = ua.rule_result_to_mask(FRAME, rr)
        assert bool(mask.loc[2, "sample_id"]) and mask.to_numpy().sum() == 1

    def test_wrap_rr_as_validator_parity(self):
        ref = _ref("fairy.validation.checks")

        def our_rule(df, **kw):
            rr = ref.rr_column_url(df, **kw)
            return dataclasses.asdict(rr) if rr is not None else None

        v_ref = ref.wrap_rr_as_validator(ref.rr_column_url, column="url")
        v_our = ua.wrap_rr_as_validator(our_rule, column="url")
        m_ref, i_ref = v_ref(FRAME)
        m_our, i_our = v_our(FRAME)
        pd.testing.assert_frame_equal(m_ref, m_our)
        assert issues_to_dicts(i_ref) == issues_to_dicts(i_our)
        # clean frame → blank mask, no issues
        clean = pd.DataFrame({"url": ["http://a", "https://b"]})
        m, i = v_our(clean)
        assert not m.to_numpy().any() and i == []


class TestProjectStore:
    def test_tree_and_manifest_match_reference(self, tmp_path, monkeypatch):
        ref_storage = _ref("fairy.core.storage")
        ref_projects = _ref("fairy.utils.projects")

        ref_cwd = tmp_path / "ref"
        ref_cwd.mkdir()
        monkeypatch.chdir(ref_cwd)
        st = ref_storage.Storage()
        st.save_projects([{"id": "p1", "name": "demo"}])
        # reference ROOT is the relative .fairy_data — same cwd
        monkeypatch.setattr(ref_projects, "ROOT", Path(".fairy_data"))
        ref_projects.exports_dir("p1")
        man = ref_projects.load_manifest("p1")
        man["files"].append({"path": "files/a.csv", "bytes": 3})
        ref_projects.save_manifest("p1", man)

        ours_dir = tmp_path / "ours" / ".fairy_data"
        ps = ProjectStore(ours_dir)
        ps.save_projects([{"id": "p1", "name": "demo"}])
        ps.exports_dir("p1")
        man2 = ps.load_manifest("p1")
        man2["files"].append({"path": "files/a.csv", "bytes": 3})
        ps.save_manifest("p1", man2)

        ref_root = ref_cwd / ".fairy_data"
        rel = lambda root: sorted(
            p.relative_to(root).as_posix() for p in root.rglob("*")
        )
        assert rel(ref_root) == rel(ours_dir)

        load = lambda p: json.loads(p.read_text())
        assert load(ref_root / "projects.json") == load(ours_dir / "projects.json")
        ref_man = load(ref_root / "projects" / "p1" / "manifest.json")
        our_man = load(ours_dir / "projects" / "p1" / "manifest.json")
        assert {k: v for k, v in ref_man.items() if k != "created_at"} == {
            k: v for k, v in our_man.items() if k != "created_at"
        }
        assert ps.load_manifests(["p1"])["p1"]["files"] == man2["files"]

    def test_touch_and_missing_registry(self, tmp_path):
        ps = ProjectStore(tmp_path / ".fairy_data")
        assert ps.load_projects() == []
        p = {"id": "x"}
        ps.touch_project(p)
        assert p["updated_at"].endswith("Z")


class TestReportV0:
    META = {
        "n_rows": 6,
        "n_cols": 4,
        "fields_validated": ["url", "qty"],
        "warnings": [
            {"column": "url", "check": "column.url", "failure": "bad scheme", "index": 1},
            {"column": "qty", "check": "range", "failure": "oob", "index": 4},
            {"column": "qty", "check": "range", "failure": "non-numeric", "index": 2},
        ],
    }

    def test_write_matches_reference_writer(self, tmp_path, monkeypatch):
        ref_writer = _ref("fairy.core.services.report_writer")
        work = tmp_path / "work"
        (work / "schemas").mkdir(parents=True)
        shutil.copy(
            Path(REF_ROOT) / "schemas" / "report_v0.schema.json",
            work / "schemas" / "report_v0.schema.json",
        )
        data = work / "data.csv"
        data.write_text("a,b\n1,2\n")
        sha = "0" * 63 + "a"
        kwargs = dict(
            filename="data.csv",
            sha256=sha,
            meta=self.META,
            rulepacks=[{"name": "z", "version": "2"}, {"name": "a", "version": "1"}],
            provenance={"license": "CC0", "source_url": None, "notes": None},
            input_path=data,
        )
        monkeypatch.chdir(work)
        ref_path = ref_writer.write_report(work / "ref_out", **kwargs)
        our_path = write_report_v0(work / "our_out", **kwargs)

        ref_doc = json.loads(ref_path.read_text())
        our_doc = json.loads(our_path.read_text())
        ref_doc.pop("run_at"), our_doc.pop("run_at")
        assert ref_doc == our_doc
        # byte-level formatting parity (pretty, sorted keys, trailing newline)
        strip = lambda p: [
            ln for ln in p.read_text().splitlines() if '"run_at"' not in ln
        ]
        assert strip(ref_path) == strip(our_path)
        assert our_path.read_text().endswith("\n")

    def test_schema_rejects_bad_sha(self):
        import jsonschema

        with pytest.raises(jsonschema.ValidationError):
            build_report_v0(filename="f.csv", sha256="nothex", meta={})

    def test_fixed_timestamp(self, monkeypatch, tmp_path):
        monkeypatch.setenv("FAIRY_FIXED_TIMESTAMP", "2026-01-01T00:00:00Z")
        doc = build_report_v0(
            filename="f.csv", sha256="a" * 64, meta=self.META, input_path=tmp_path / "f.csv"
        )
        assert doc["run_at"] == "2026-01-01T00:00:00Z"
        assert [w["index"] for w in doc["warnings"]] == [2, 4, 1]
        assert doc["inputs"]["files"] == []  # missing input file → no entries
