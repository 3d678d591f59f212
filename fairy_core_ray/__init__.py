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


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())
