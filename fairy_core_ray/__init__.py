"""fairy-core-ray: a Ray-Data-native validation + spatial-join/tiling engine.

A from-scratch re-expression of yuummmer/fairy-core's rules-based dataset
preflight (see /root/reference, SURVEY.md) as streaming Ray Data stages over
Arrow blocks, extended with the geospatial stages (cell encoding,
point-in-polygon join, kNN, tile assignment) and large-scale training-data
operators (dedup, similarity search, text analysis) this engine targets.

Built only on public APIs: ray.data, pyarrow, numpy, pandas, duckdb (oracles).
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray Data's per-join/aggregate ``Failed to hash the schemas
    (for deduplication): unhashable type: 'dict'`` WARNING — pyarrow
    Schemas carrying metadata are unhashable, so Ray's early-exit
    optimization in ``unify_schemas`` logs this for every
    metadata-bearing schema (harmless: it falls through to the full
    unify path). The spam buries real warnings in bench/driver tails."""

    def filter(self, record: _logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


_SCHEMA_NOISE_FILTER = _SchemaHashNoiseFilter()


def install_worker_log_filters() -> None:
    """Install the schema-hash noise filter (idempotent).

    Runs at package import for the driver process. Worker processes that
    never import this package (Ray-internal read/reduce tasks) emit the
    same spam, so sessions we own (bench.py, tests, check_correctness)
    also pass this function as ``ray.init(runtime_env=
    {"worker_process_setup_hook": install_worker_log_filters})`` — Ray
    calls it once in every worker at startup."""
    logger = _logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    )
    if _SCHEMA_NOISE_FILTER not in logger.filters:
        logger.addFilter(_SCHEMA_NOISE_FILTER)


install_worker_log_filters()


def worker_runtime_env() -> dict:
    """runtime_env for ``ray.init`` sessions we own (bench, tests,
    check_correctness): run the log-filter hook in every worker, with
    PYTHONPATH set so the hook can import this package at worker start
    (the driver-cwd sys.path injection happens later, at task time)."""
    import os as _os

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    pp = _os.environ.get("PYTHONPATH", "")
    return {
        "worker_process_setup_hook": install_worker_log_filters,
        "env_vars": {"PYTHONPATH": root + (_os.pathsep + pp if pp else "")},
    }
