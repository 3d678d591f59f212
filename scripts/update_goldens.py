"""Regenerate golden snapshot artifacts for this engine.

Counterpart of the reference's goldens workflow
(/root/reference/scripts/update_goldens.py): writes deterministic
validate + preflight reports (FAIRY_FIXED_TIMESTAMP pinned) into
tests/golden/, which tests/test_goldens.py then asserts byte-identical.
Unlike the parity suites (which need /root/reference importable), the
goldens pin behavior self-contained — regression coverage survives the
reference going away.

Usage: python scripts/update_goldens.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
GOLDEN = REPO / "tests" / "golden"

REF_FIX = Path("/root/reference/tests/fixtures")
TS = "2025-11-11T12:00:00Z"


def build_artifacts() -> dict[str, str]:
    """{relative-name: content} for every golden artifact (shared by the
    regenerator and the drift test)."""
    os.environ["FAIRY_FIXED_TIMESTAMP"] = TS
    from fairy_core_ray.engine import run_rulepack
    from fairy_core_ray.preflight import run_preflight
    from fairy_core_ray.rulepack import load_rulepack
    from fairy_core_ray.state.markdown import preflight_markdown, write_markdown

    out: dict[str, str] = {}

    rp = "/root/reference/rulepacks/examples/penguins/rulepack.yml"
    report = run_rulepack(
        {"default": str(REF_FIX / "penguins_small.csv")}, load_rulepack(rp), rp, TS
    )
    out["validate.report.json"] = json.dumps(
        report, ensure_ascii=False, indent=2, sort_keys=True
    )
    out["validate.report.md"] = write_markdown(report)

    pre = run_preflight(
        str(REF_FIX / "rulepacks" / "geo_bulk_seq_min_v0_2_0.json"),
        str(REF_FIX / "preflight" / "samples.tsv"),
        str(REF_FIX / "preflight" / "files.tsv"),
        "GOLDEN",
    )
    # run_at_utc is wall-clock in both this engine and the reference
    # (the parity suites compare within one run); pin it for goldens
    if "_legacy" in pre and "attestation" in pre["_legacy"]:
        pre["_legacy"]["attestation"]["run_at_utc"] = TS
    out["preflight.report.json"] = json.dumps(
        pre, ensure_ascii=False, indent=2, sort_keys=True
    )
    out["preflight.report.md"] = preflight_markdown(pre, set(), None)
    return out


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    GOLDEN.mkdir(parents=True, exist_ok=True)
    for name, content in build_artifacts().items():
        (GOLDEN / name).write_text(content)
        print(f"wrote tests/golden/{name}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
