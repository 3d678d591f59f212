"""Provenance: canonical JSON, content hashes, dataset identity.

Output-compatible with the reference's provenance contract
(/root/reference/src/fairy/core/services/provenance.py:28-159): the
``sha256:<hex>`` dataset id is a hash of the canonical-JSON payload over
input sha256s + rulepack identity + params hash + canon version, and
deliberately excludes row/column counts (reference decisions/0006).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Mapping

CANON_VERSION_V1 = "fairy-canon@1"


def canonical_json(obj: Any) -> str:
    """Stable JSON for hashing: sorted keys, compact separators."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def compute_params_sha256(params: dict | None) -> str:
    """Hash of the params dict; the canonical empty object when absent."""
    return hashlib.sha256(canonical_json(params or {}).encode("utf-8")).hexdigest()


def sha256_file(path, *, newline_stable: bool = False) -> str:
    """sha256 of a file; newline_stable normalizes CRLF/CR to LF first
    (text inputs hash identically across platforms)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        if not newline_stable:
            while True:
                chunk = f.read(65536)
                if not chunk:
                    break
                h.update(chunk)
            return h.hexdigest()
        carry_cr = False
        while True:
            chunk = f.read(65536)
            if not chunk:
                break
            if carry_cr:
                chunk = b"\r" + chunk
                carry_cr = False
            if chunk.endswith(b"\r"):
                chunk = chunk[:-1]
                carry_cr = True
            h.update(chunk.replace(b"\r\n", b"\n").replace(b"\r", b"\n"))
        if carry_cr:
            h.update(b"\n")
        return h.hexdigest()


def summarize_tabular(path) -> dict[str, Any]:
    """{path, sha256 (newline-stable), n_rows, n_cols, header} for a
    TSV-like metadata file (naive TSV split — matches the reference's
    fallback parser, provenance.py:106-120; frictionless is absent in
    both environments here, so the fallback IS the behavior)."""
    lines = open(path, "r", encoding="utf-8").read().splitlines()
    header = lines[0].split("\t") if lines else []
    return {
        "path": str(path),
        "sha256": sha256_file(path, newline_stable=True),
        "n_rows": max(len(lines) - 1, 0) if lines else 0,
        "n_cols": len(header),
        "header": header,
    }


def compute_dataset_id(
    *,
    inputs_sha256: Mapping[str, str],
    rulepack: Mapping[str, str],
    params_sha256: str,
    canon_version: str = CANON_VERSION_V1,
) -> str:
    """Content-addressed dataset identity (reference provenance.py:131-159
    byte-for-byte: same payload keys, same canonical serialization)."""
    payload = {
        "canon_version": canon_version,
        "algorithm": "sha256",
        "includes": ["inputs.sha256", "rulepack.sha256", "params.sha256"],
        "inputs": {k: {"sha256": v} for k, v in sorted(inputs_sha256.items())},
        "rulepack": {
            "id": rulepack["id"],
            "version": rulepack["version"],
            "sha256": rulepack["sha256"],
        },
        "params": {"sha256": params_sha256},
    }
    digest = hashlib.sha256(canonical_json(payload).encode("utf-8")).hexdigest()
    return f"sha256:{digest}"
