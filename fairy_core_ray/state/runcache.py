"""Cross-run finding-code cache + attestation id minting.

Reference parity:
* last-run codes cache (.fairy_last_run.json) powering the
  "resolved since last run" console diff —
  /root/reference/src/fairy/cli/cmd_preflight.py:106-118 (S10 in
  SURVEY.md §2.1);
* attestation id ``fairy:attest:<sha256-of-report-file>`` —
  /root/reference/src/fairy/core/services/export_adapter.py:31-33.
"""

from __future__ import annotations

import json
import os

from fairy_core_ray.state.provenance import sha256_file

CACHE_NAME = ".fairy_last_run.json"


def load_last_codes(dirpath: str) -> set[str]:
    path = os.path.join(dirpath, CACHE_NAME)
    if not os.path.isfile(path):
        return set()
    try:
        with open(path) as f:
            return set(json.load(f).get("codes", []))
    except Exception:
        return set()


def save_last_codes(dirpath: str, codes: set[str]) -> None:
    path = os.path.join(dirpath, CACHE_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"codes": sorted(codes)}, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def resolved_since_last_run(dirpath: str, current_codes: set[str]) -> list[str]:
    """Codes that failed last run but not this run (sorted)."""
    return sorted(load_last_codes(dirpath) - current_codes)


def mint_attestation_id(report_path: str) -> str:
    """Content-addressed attestation id over the report file bytes."""
    return f"fairy:attest:{sha256_file(report_path)}"
