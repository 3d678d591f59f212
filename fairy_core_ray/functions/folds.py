"""Driver-side folds of bounded partial streams.

Per-batch combiners shrink a corpus-scale dataset to a small partial
stream (one row per distinct key per batch); the driver then folds the
partials. This module makes that fold a SINGLE Arrow concat (blocks
stream zero-copy from the object store) followed by ONE pandas
conversion — instead of converting every block to pandas and
pd.concat-ing N frames (N allocations + N dtype inferences). The fold
input must be BOUNDED (a partial/aggregate stream), never raw corpus
rows — callers document why theirs is.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def fold_to_table(ds: rd.Dataset) -> pa.Table | None:
    """Concatenate a bounded Dataset into one Arrow table (None when
    the stream is empty). Promotes schemas so blocks whose nullable
    columns arrived as null-typed still concat."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    batches = [b for b in batches if b.num_rows]
    if not batches:
        return None
    try:
        return pa.concat_tables(batches, promote_options="default")
    except TypeError:  # older pyarrow spelling
        return pa.concat_tables(batches, promote=True)


def fold_to_pandas(ds: rd.Dataset) -> pd.DataFrame | None:
    """One-conversion pandas fold of a bounded Dataset (None if empty)."""
    t = fold_to_table(ds)
    return None if t is None else t.to_pandas()
