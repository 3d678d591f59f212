"""fairy-core-ray: a Ray-Data-native validation + spatial-join/tiling engine.

A from-scratch re-expression of yuummmer/fairy-core's rules-based dataset
preflight (see /root/reference, SURVEY.md) as streaming Ray Data stages over
Arrow blocks, extended with the geospatial stages (cell encoding,
point-in-polygon join, kNN, tile assignment) and large-scale training-data
operators (dedup, similarity search, text analysis) this engine targets.

Built only on public APIs: ray.data, pyarrow, numpy, pandas, duckdb (oracles).
"""

__version__ = "0.1.0"
