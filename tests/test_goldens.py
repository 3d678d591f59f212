"""Golden-snapshot drift guard: current engine output must be
byte-identical to tests/golden/ (regenerate intentionally with
scripts/update_goldens.py). Self-contained counterpart of the
reference-parity suites — pins behavior even without /root/reference."""

import os
import sys
from pathlib import Path

import pytest

GOLDEN = Path(__file__).resolve().parent / "golden"

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

pytestmark = pytest.mark.skipif(
    not GOLDEN.is_dir(), reason="goldens not generated yet"
)


def test_goldens_current():
    from update_goldens import build_artifacts

    old_ts = os.environ.get("FAIRY_FIXED_TIMESTAMP")
    try:
        artifacts = build_artifacts()
    finally:
        if old_ts is None:
            os.environ.pop("FAIRY_FIXED_TIMESTAMP", None)
        else:
            os.environ["FAIRY_FIXED_TIMESTAMP"] = old_ts
    for name, content in artifacts.items():
        golden = (GOLDEN / name).read_text()
        assert content == golden, f"golden drift in {name}"
