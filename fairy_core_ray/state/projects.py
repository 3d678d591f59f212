"""Local-first project storage (SURVEY §2.1 S11).

Reference contract: ``core/storage.py:15-35`` (``.fairy_data/projects.json``
CRUD + ``updated_at`` touch) and ``utils/projects.py:11-41`` (per-project
directory tree ``projects/<id>/{files,exports}`` with a ``manifest.json``).
This is driver-side UI state — tiny JSON files, never sharded — so there is
deliberately no Ray here; at cluster scale the same contract would live on
shared storage (NFS / object store) with the identical on-disk layout.

Differences from the reference implementation (shape-compatible):

* all JSON writes are atomic (tmp file in the same directory + ``os.replace``)
  so a crashed driver never leaves a torn ``projects.json``;
* one class owns both surfaces instead of a module-level ``ROOT`` global,
  so tests (and multi-tenant drivers) can point at any directory.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

APP_DIRNAME = ".fairy_data"
PROJECTS_BASENAME = "projects.json"


def now_iso() -> str:
    """UTC ISO-8601 with a trailing ``Z`` (storage.py:30-31 format)."""
    fixed = os.environ.get("FAIRY_FIXED_TIMESTAMP")
    if fixed:
        return fixed
    return datetime.now(timezone.utc).isoformat().replace("+00:00", "Z")


def _write_json_atomic(path: Path, payload: Any) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(payload, indent=2), encoding="utf-8")
    os.replace(tmp, path)


class ProjectStore:
    """``.fairy_data`` project registry + per-project directory tree."""

    def __init__(self, data_dir: str | Path | None = None):
        self.data_dir = Path(data_dir) if data_dir is not None else Path(APP_DIRNAME)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.projects_json = self.data_dir / PROJECTS_BASENAME

    # -- registry (storage.py:21-27) ------------------------------------
    def load_projects(self) -> list[dict[str, Any]]:
        if not self.projects_json.exists():
            return []
        return json.loads(self.projects_json.read_text(encoding="utf-8"))

    def save_projects(self, projects: list[dict[str, Any]]) -> None:
        _write_json_atomic(self.projects_json, projects)

    def touch_project(self, project: dict[str, Any]) -> None:
        """storage.py:34-35 — stamp ``updated_at`` in place."""
        project["updated_at"] = now_iso()

    # -- per-project tree (utils/projects.py:11-25) ---------------------
    def project_dir(self, project_id: str) -> Path:
        p = self.data_dir / "projects" / project_id
        (p / "files").mkdir(parents=True, exist_ok=True)
        return p

    def exports_dir(self, project_id: str) -> Path:
        d = self.project_dir(project_id) / "exports"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def manifest_path(self, project_id: str) -> Path:
        return self.project_dir(project_id) / "manifest.json"

    # -- per-project manifest (utils/projects.py:28-41) -----------------
    def load_manifest(self, project_id: str) -> dict:
        mp = self.manifest_path(project_id)
        if mp.exists():
            return json.loads(mp.read_text(encoding="utf-8"))
        return {"project_id": project_id, "created_at": time.time(), "files": []}

    def save_manifest(self, project_id: str, manifest: dict) -> None:
        _write_json_atomic(self.manifest_path(project_id), manifest)

    def load_manifests(self, project_ids: list[str]) -> dict[str, dict]:
        return {pid: self.load_manifest(pid) for pid in project_ids}
