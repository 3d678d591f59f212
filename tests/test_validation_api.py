"""Legacy validator-registry + process_csv shim parity vs the reference
(validation_api.py register/get_validator/validate_csv and
process_csv.py's (meta, df) return shape) — VERDICT r3 next #8."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

REF_SRC = "/root/reference/src"
FIXTURES = "/root/reference/tests/fixtures"


def _ref_process_csv():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from fairy.validation.process_csv import process_csv as ref

    return ref


@pytest.mark.parametrize(
    "fixture", ["penguins_small.csv", "regex_demo.csv"]
)
def test_process_csv_parity(ray_session, fixture):
    path = os.path.join(FIXTURES, fixture)
    if not os.path.isfile(path):
        pytest.skip(f"{fixture} not in reference checkout")
    from fairy_core_ray.validation_api import process_csv

    meta, df = process_csv(path)
    ref_meta, ref_df = _ref_process_csv()(path)
    pd.testing.assert_frame_equal(df, ref_df)
    assert meta["filename"] == ref_meta["filename"]
    assert meta["sha256"] == ref_meta["sha256"]
    assert meta["n_rows"] == ref_meta["n_rows"]
    assert meta["n_cols"] == ref_meta["n_cols"]
    assert meta["fields_validated"] == ref_meta["fields_validated"]
    assert meta["warnings"] == ref_meta["warnings"]


def test_register_dispatch_and_generic_fallback(ray_session, tmp_path):
    from fairy_core_ray import validation_api as va

    p = tmp_path / "t.csv"
    pd.DataFrame({"a": [1, 2], "b": ["x", ""]}).to_csv(p, index=False)

    # unknown kind falls back to generic (validation_api.py:60-63)
    m = va.validate_csv(str(p), kind="no-such-kind")
    assert (m.n_rows, m.n_cols) == (2, 2)
    assert m.fields_validated == ["a", "b"] and m.warnings == []

    # registration is by-kind, last-wins
    class Custom:
        name = "custom"
        version = "9.9.9"

        def validate(self, path):
            return va.Meta(0, 0, ["sentinel"], [])

    va.register("custom", Custom())
    try:
        assert va.get_validator("custom").version == "9.9.9"
        assert va.validate_csv(str(p), kind="custom").fields_validated == ["sentinel"]
    finally:
        va._VALIDATORS.pop("custom", None)


def test_rna_validator_flags_rows(ray_session, tmp_path):
    """Blank sample_id → error rows; bad read_length → warning rows
    (the distributed kernels behind the legacy surface)."""
    from fairy_core_ray import validation_api as va

    p = tmp_path / "rna.csv"
    pd.DataFrame(
        {
            "sample_id": ["s1", "", "s3"],
            "read_length": [50, 0, "oops"],
        }
    ).to_csv(p, index=False)
    m = va.validate_csv(str(p), kind="rna")
    kinds = [(w["kind"], w["row"], w["severity"]) for w in m.warnings]
    assert ("missing_value", 1, "error") in kinds
    assert ("invalid_read_length", 1, "warning") in kinds
    assert ("invalid_read_length", 2, "warning") in kinds
    assert m.fields_validated == ["read_length", "sample_id"]
