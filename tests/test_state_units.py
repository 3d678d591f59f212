"""Unit tests: provenance, manifest, run cache — including dataset-id
recipe parity vs the reference (byte-for-byte canonical payload)."""

import json
import os
import sys

import pytest

from fairy_core_ray.state import manifest as mf
from fairy_core_ray.state import provenance as prov
from fairy_core_ray.state import runcache

REF_SRC = "/root/reference/src"


class TestProvenance:
    def test_canonical_json_stable(self):
        a = prov.canonical_json({"b": 1, "a": [2, {"z": 3, "y": 4}]})
        assert a == '{"a":[2,{"y":4,"z":3}],"b":1}'

    def test_params_sha_empty_is_empty_object(self):
        assert prov.compute_params_sha256(None) == prov.compute_params_sha256({})

    def test_newline_stable_hash(self, tmp_path):
        a = tmp_path / "a.tsv"
        b = tmp_path / "b.tsv"
        a.write_bytes(b"x\ty\r\n1\t2\r\n")
        b.write_bytes(b"x\ty\n1\t2\n")
        assert prov.sha256_file(a, newline_stable=True) == prov.sha256_file(
            b, newline_stable=True
        )
        assert prov.sha256_file(a) != prov.sha256_file(b)

    @pytest.mark.skipif(not os.path.isdir(REF_SRC), reason="no reference")
    def test_dataset_id_matches_reference_recipe(self):
        if REF_SRC not in sys.path:
            sys.path.insert(0, REF_SRC)
        from fairy.core.services.provenance import compute_dataset_id as ref_id

        kwargs = dict(
            inputs_sha256={"b": "22", "a": "11"},
            rulepack={"id": "rp", "version": "1.0", "sha256": "ff"},
            params_sha256="pp",
        )
        assert prov.compute_dataset_id(**kwargs) == ref_id(**kwargs)

    def test_summarize_tabular(self, tmp_path):
        f = tmp_path / "t.tsv"
        f.write_text("a\tb\n1\t2\n3\t4\n")
        s = prov.summarize_tabular(f)
        assert s["n_rows"] == 2 and s["n_cols"] == 2 and s["header"] == ["a", "b"]


class TestManifest:
    @pytest.mark.parametrize(
        "path,role",
        [
            ("manifest.json", "metadata"),
            ("sub/samples.tsv", "metadata"),
            ("run.log", "log"),
            ("preflight_report.json", "report"),
            ("x_report.md", "report"),
            ("data.csv", "data"),
            ("reads.fastq", "data"),
            ("shard.parquet", "data"),
            ("whatever.bin", "other"),
        ],
    )
    def test_role_inference(self, path, role):
        assert mf.infer_role(path) == role

    def test_manifest_shape(self):
        m = mf.build_manifest_v1(
            dataset_id="sha256:x",
            fairy_version="1",
            source_report="r.json",
            rulepack_id="rp",
            rulepack_version="0.1",
            files=[{"path": "a.csv", "sha256": "aa"}],
            created_at_utc="2025-01-01T00:00:00Z",
        )
        assert m["schema_version"] == "1.0.0"
        assert m["files"][0]["role"] == "data"
        assert m["hash_algorithm"] == "sha256"

    def test_bad_role_raises(self):
        with pytest.raises(ValueError):
            mf.build_manifest_v1(
                dataset_id="d", fairy_version="1", source_report="r",
                rulepack_id="rp", rulepack_version="0",
                files=[{"path": "a", "role": "bogus"}],
            )


class TestRunCache:
    def test_roundtrip_and_resolved(self, tmp_path):
        d = str(tmp_path)
        assert runcache.load_last_codes(d) == set()
        runcache.save_last_codes(d, {"B", "A"})
        assert runcache.load_last_codes(d) == {"A", "B"}
        assert runcache.resolved_since_last_run(d, {"B"}) == ["A"]

    def test_attestation_id(self, tmp_path):
        f = tmp_path / "r.json"
        f.write_text(json.dumps({"x": 1}))
        aid = runcache.mint_attestation_id(str(f))
        assert aid.startswith("fairy:attest:") and len(aid) == len("fairy:attest:") + 64
