"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (validate → decode → dedup → cell-encode → PIP-join →
    tile-assign) at sf0.001 scale; driver checks rows >= 0 + stable schema.

    The flagship input is the image+caption table mandated by BASELINE.json
    ``input_hint`` — synthesized deterministically (seed 42) at a size
    proportional to the sf0.001 testdata slice, materialized as parquet
    under /tmp (lance is unavailable here; same Arrow schema).
    """
    import pyarrow.parquet as pq

    from fairy_core_ray.pipelines.flagship import flagship
    from fairy_core_ray.sources.synth import ensure_image_dataset

    n_docs = pq.ParquetFile("/root/testdata/sf0.001/documents.parquet").metadata.num_rows
    path = ensure_image_dataset(4 * n_docs, seed=42)
    return flagship(path)["tile_stats"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 +
    north-rule geospatial/dedup/kNN/text operators)."""
    from fairy_core_ray.pipelines import queries_ext  # noqa: F401  (merges EXT_* into the registry)
    from fairy_core_ray.pipelines import queries_ext2  # noqa: F401  (merges EXT2_* into the registry)
    from fairy_core_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    operators (LSH/minhash/simhash/langid/flagship image pipeline) are
    deliberately omitted."""
    from fairy_core_ray.pipelines import queries_ext  # noqa: F401  (merges EXT_* into the registry)
    from fairy_core_ray.pipelines import queries_ext2  # noqa: F401  (merges EXT2_* into the registry)
    from fairy_core_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
