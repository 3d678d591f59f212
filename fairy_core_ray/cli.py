"""CLI entry points, mirroring the reference's command surface
(/root/reference/src/fairy/cli): validate (rulepack over inputs),
preflight (GEO profile), tile (flagship resumable tiled output).

Usage:
  python -m fairy_core_ray.cli validate --rulepack RP --inputs name=path ... [--out-dir D]
  python -m fairy_core_ray.cli preflight --rulepack RP --samples S --files F [--out-dir D]
  python -m fairy_core_ray.cli run --rulepack RP --samples S --files F --out R.json
  python -m fairy_core_ray.cli tile --images DIR --out DIR [--target-rows N]

``run`` is the legacy single-file entry (reference cli/run.py:213-371):
report JSON + .md one-pager + .fairy_last_run.json diff cache next to
--out, console summary with provenance and resolved-codes diff.

Exit code 0 iff no FAIL findings (validate/preflight), mirroring the
reference's submission_ready gating (cli/validate.py:128,
cmd_preflight.py:358).

Owns its Ray session (scripts own ray.init; the driver contract in
__ray_entry__ never does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_validate(args) -> int:
    _init_ray()
    from fairy_core_ray.engine import run_rulepack
    from fairy_core_ray.rulepack import load_rulepack
    from fairy_core_ray.state.markdown import write_markdown

    inputs = {}
    for spec in args.inputs:
        name, _, path = spec.partition("=")
        if not path:
            name, path = os.path.splitext(os.path.basename(spec))[0], spec
        inputs[name] = path
    now = (
        os.environ.get("FAIRY_FIXED_TIMESTAMP")
        or datetime.now(timezone.utc).replace(microsecond=0).isoformat().replace("+00:00", "Z")
    )
    report = run_rulepack(inputs, load_rulepack(args.rulepack), args.rulepack, now)
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        with open(os.path.join(args.out_dir, "validate_report.json"), "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        with open(os.path.join(args.out_dir, "validate_report.md"), "w") as f:
            f.write(write_markdown(report))
    s = report["summary"]
    print(f"PASS={s['pass']} WARN={s['warn']} FAIL={s['fail']}")
    return 1 if s["fail"] > 0 else 0


def cmd_preflight(args) -> int:
    _init_ray()
    from fairy_core_ray.preflight import run_preflight
    from fairy_core_ray.state.manifest import build_manifest_v1, now_utc_iso_z
    from fairy_core_ray.state.provenance import sha256_file

    from fairy_core_ray.state.markdown import preflight_markdown
    from fairy_core_ray.state.runcache import (
        load_last_codes,
        resolved_since_last_run,
        save_last_codes,
    )

    from fairy_core_ray.state.contracts import validate_manifest, validate_report

    report = run_preflight(args.rulepack, args.samples, args.files)
    ready = report["summary"]["submission_ready"]
    if args.out_dir:
        os.makedirs(os.path.join(args.out_dir, "artifacts"), exist_ok=True)
        rp_json = os.path.join(args.out_dir, "preflight_report.json")
        # machine-validate against the shipped schema before writing
        # (reference report_writer.py:120-122 contract)
        validate_report(report)
        with open(rp_json, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        current = {
            r["rule"] for r in report["results"] if r["level"] in ("fail", "warn")
        }
        prior = load_last_codes(args.out_dir) or None
        resolved = resolved_since_last_run(args.out_dir, current)
        with open(os.path.join(args.out_dir, "preflight_report.md"), "w") as f:
            f.write(preflight_markdown(report, resolved, prior))
        save_last_codes(args.out_dir, current)
        manifest = build_manifest_v1(
            dataset_id=report["dataset_id"],
            fairy_version=report["engine"]["fairy_core_version"],
            source_report="preflight_report.json",
            rulepack_id=report["metadata"]["rulepack"]["id"],
            rulepack_version=report["metadata"]["rulepack"]["version"],
            files=[
                {
                    "path": "preflight_report.json",
                    "sha256": sha256_file(rp_json),
                }
            ],
            created_at_utc=now_utc_iso_z(),
        )
        validate_manifest(manifest)
        with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        inputs_manifest = {
            "schema_version": "inputs-manifest/v0",
            "inputs": [
                {"name": name, "path": meta["path"], "sha256": meta["sha256"]}
                for name, meta in sorted(report["metadata"]["inputs"].items())
            ],
        }
        with open(
            os.path.join(args.out_dir, "artifacts", "inputs_manifest.json"), "w"
        ) as f:
            json.dump(inputs_manifest, f, indent=2, sort_keys=True)
    lv = report["summary"]["by_level"]
    print(f"pass={lv['pass']} warn={lv['warn']} fail={lv['fail']} ready={ready}")
    return 0 if ready else 1


def cmd_run(args) -> int:
    """Legacy single-file preflight entry, mirroring the reference's
    older ``fairy preflight --out report.json`` flow
    (/root/reference/src/fairy/cli/run.py:213-371): report JSON at
    ``--out``, markdown one-pager at ``out`` with ``.md`` suffix,
    last-run diff cache at ``out``'s directory (.fairy_last_run.json),
    a human console summary with input provenance + example finding +
    resolved-diff block, and exit code 0 iff submission_ready. Semantic
    delta vs the reference line: the cache keeps fail/warn codes only —
    v1 results include a ``pass`` row per clean rule, so caching every
    code (run.py:256) would make a FIXED rule never show as resolved."""
    _init_ray()
    from fairy_core_ray.preflight import run_preflight
    from fairy_core_ray.state.contracts import validate_report
    from fairy_core_ray.state.markdown import preflight_markdown
    from fairy_core_ray.state.runcache import (
        CACHE_NAME,
        load_last_codes,
        save_last_codes,
    )

    report = run_preflight(args.rulepack, args.samples, args.files)
    if args.fairy_version:
        report["engine"]["fairy_core_version"] = args.fairy_version
        legacy = report.get("_legacy", {}).get("attestation")
        if legacy:
            legacy["fairy_version"] = args.fairy_version
    validate_report(report)
    out = os.path.abspath(args.out)
    out_dir = os.path.dirname(out) or "."
    os.makedirs(out_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, ensure_ascii=False, indent=2, sort_keys=True)

    results = report["results"]
    curr_codes = {r["rule"] for r in results if r["level"] in ("fail", "warn")}
    had_baseline = os.path.isfile(os.path.join(out_dir, CACHE_NAME))
    prior_codes = load_last_codes(out_dir) if had_baseline else None
    resolved = sorted(prior_codes - curr_codes) if prior_codes is not None else []
    save_last_codes(out_dir, curr_codes)
    md_path = os.path.splitext(out)[0] + ".md"
    with open(md_path, "w") as f:
        f.write(preflight_markdown(report, resolved, prior_codes))

    meta, summary = report["metadata"], report["summary"]
    rp_meta = meta.get("rulepack", {})
    fail_codes = sorted({r["rule"] for r in results if r["level"] == "fail"})
    warn_codes = sorted({r["rule"] for r in results if r["level"] == "warn"})
    by_level = summary.get("by_level", {})
    ready = by_level.get("fail", 0) == 0
    print("")
    print("=== FAIRy Preflight ===")
    rp_id = rp_meta.get("id") or rp_meta.get("name") or "UNKNOWN_RULEPACK"
    print(f"Rulepack:         {rp_id}@{rp_meta.get('version') or '0.0.0'}")
    print(f"Rulepack path:    {os.path.abspath(args.rulepack)}")
    print(f"fairy_core_version: {report['engine']['fairy_core_version']}")
    print(f"FAIL findings:    {by_level.get('fail', 0)} {fail_codes}")
    print(f"WARN findings:    {by_level.get('warn', 0)} {warn_codes}")
    print(f"submission_ready: {ready}")
    print(f"Report JSON:      {out}")
    print("")
    print("Input provenance:")
    for label in ("samples", "files"):
        info = meta.get("inputs", {}).get(label, {})
        if not info:
            print(f"{label}.tsv: (no input metadata)")
            continue
        print(f"{label}.tsv sha256: {info.get('sha256', '?')}")
        print(f"  path: {info.get('path', '?')}")
        print(f"  rows:{info.get('n_rows', '?')} cols:{info.get('n_cols', '?')}")
    print("")
    fails = [r for r in results if r["level"] == "fail"]
    if fails:
        r0 = fails[0]
        print("Example result:")
        print(f"  [{r0['level']}] {r0['rule']} (count: {r0['count']})")
        if r0.get("samples"):
            s0 = r0["samples"][0]
            loc = []
            if s0.get("row"):
                loc.append(f"row {s0['row']}")
            if s0.get("column"):
                loc.append(f"column '{s0['column']}'")
            if loc:
                print(f"    location: {', '.join(loc)}")
            if s0.get("message"):
                print(f"    message: {s0['message']}")
        print("")
    print("Resolved since last run:")
    if prior_codes is None:
        print("  (no baseline from prior run)")
    elif not resolved:
        print("  (no previously-reported issues resolved)")
    else:
        for code in resolved:
            print(f"  ✔ {code}")
    print("")
    return 0 if ready else 1


def cmd_export(args) -> int:
    _init_ray()
    from fairy_core_ray.state.export import NotSubmissionReady, export_submission

    try:
        res = export_submission(
            export_dir=args.out_dir,
            rulepack=args.rulepack,
            samples=args.samples,
            files=args.files,
        )
    except NotSubmissionReady as e:
        print(f"EXPORT BLOCKED: {e}")
        return 1
    print(json.dumps(res, sort_keys=True))
    return 0


def cmd_tile(args) -> int:
    _init_ray()
    from fairy_core_ray.pipelines.tiling import write_tiled

    res = write_tiled(
        args.images,
        args.out,
        seed=args.seed,
        coarse_res=args.coarse_res,
        target_rows=args.target_rows,
        decode=not args.no_decode,
    )
    print(json.dumps(res))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fairy-core-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate")
    v.add_argument("--rulepack", required=True)
    v.add_argument("--inputs", nargs="+", required=True, help="name=path pairs")
    v.add_argument("--out-dir")

    f = sub.add_parser("preflight")
    f.add_argument("--rulepack", required=True)
    f.add_argument("--samples", required=True)
    f.add_argument("--files", required=True)
    f.add_argument("--out-dir")

    r = sub.add_parser(
        "run", help="legacy single-file preflight (reference cli/run.py)"
    )
    r.add_argument("--rulepack", required=True)
    r.add_argument("--samples", required=True)
    r.add_argument("--files", required=True)
    r.add_argument("--out", required=True, help="report JSON file path")
    r.add_argument("--fairy-version", default=None)

    e = sub.add_parser("export")
    e.add_argument("--rulepack", required=True)
    e.add_argument("--samples", required=True)
    e.add_argument("--files", required=True)
    e.add_argument("--out-dir", required=True)

    t = sub.add_parser("tile")
    t.add_argument("--images", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--coarse-res", type=int, default=9)
    t.add_argument("--target-rows", type=int, default=250_000)
    t.add_argument("--no-decode", action="store_true")

    args = p.parse_args(argv)
    import ray

    owned_session = not ray.is_initialized()  # embedded callers own theirs
    rc = {
        "validate": cmd_validate,
        "preflight": cmd_preflight,
        "run": cmd_run,
        "export": cmd_export,
        "tile": cmd_tile,
    }[args.cmd](args)
    if owned_session:
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
