"""Table sources with stable global row numbers.

The reference's evidence contract is 1-based global row numbers
(/root/reference/src/fairy/validation/rulepack_runner.py:308-309,571-572),
but distributed Arrow blocks have no global index (SURVEY.md §7.4 hard
part 1). Strategy:

* **Parquet** — enumerate (file, row_group) fragments with pyarrow
  metadata, compute each fragment's global row offset up front (cheap,
  footer-only), then read fragments as Ray tasks that attach ``__row__``
  from the known offset. Fully distributed, no order assumption.
* **CSV/TSV** — one read task per file with the file's row offset known
  only for single files (offset 0). The reference reads whole CSVs into
  RAM anyway (rulepack_runner.py:94-101); for large data, convert to
  parquet. Reads are stringly-typed (``dtype=str, keep_default_na=False``
  parity: all columns string, empty cells ""), matching the reference's
  type system (SURVEY.md §1.2).

``__row__`` is 0-based internally; evidence formatting converts to
1-based at the edge, like the reference.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import ray.data as rd

ROW_COL = "__row__"


def _attach_rows(table: pa.Table, offset: int) -> pa.Table:
    import numpy as np

    rows = np.arange(offset, offset + len(table), dtype=np.int64)
    # drop file-level pandas metadata: dict-valued schema metadata makes
    # pa.Schema unhashable, tripping a WARNING in every downstream Ray
    # Data schema unification (zero-copy strip)
    table = table.replace_schema_metadata(None)
    return table.append_column(ROW_COL, pa.array(rows, pa.int64()))


def read_indexed_parquet(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Parquet → Dataset with a stable global __row__ column.

    Row-group granularity: one read task per row group, offset from
    footer metadata only. Row order within the dataset follows
    (sorted file order, row-group order) — the same total order every
    run, independent of scheduling.
    """
    p = Path(path)
    files = sorted(str(f) for f in ([p] if p.is_file() else p.glob("**/*.parquet")))
    specs = []
    offset = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            specs.append({"file": f, "row_group": rg, "offset": offset})
            offset += n

    def _read(batch: pa.Table) -> list[pa.Table]:
        out = []
        for spec in batch.to_pylist():
            t = pq.ParquetFile(spec["file"]).read_row_group(
                spec["row_group"], columns=columns
            )
            out.append(_attach_rows(t, spec["offset"]))
        return out

    def _read_gen(batch):
        for spec_tbl in _read(batch):
            yield spec_tbl

    return rd.from_items(specs).map_batches(
        _read_gen, batch_size=1, batch_format="pyarrow"
    )


def infer_sep(path: str) -> str:
    """Delimiter from suffix (reference rulepack_runner.py:87-91)."""
    return "\t" if Path(path).suffix.lower() in {".tsv", ".tab"} else ","


def read_table_stringly(path: str, delimiter: str | None = None) -> pa.Table:
    """CSV/TSV → Arrow table, all-string, "" for empty cells, with __row__.

    Parity with the reference's ``pd.read_csv(dtype=str,
    keep_default_na=False)`` (rulepack_runner.py:94-101).
    """
    sep = delimiter if delimiter is not None else infer_sep(path)
    # First pass: header only, to declare every column as string.
    head = pacsv.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=sep),
        read_options=pacsv.ReadOptions(block_size=1 << 16),
    )
    col_types = {name: pa.string() for name in head.column_names}
    table = pacsv.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=sep),
        convert_options=pacsv.ConvertOptions(
            column_types=col_types, strings_can_be_null=False, quoted_strings_can_be_null=False
        ),
    )
    # keep_default_na=False parity: no nulls, empty string stays ""
    cols = []
    for name in table.column_names:
        col = table[name]
        if col.null_count:
            import pyarrow.compute as pc

            col = pc.fill_null(col, "")
        cols.append(col)
    table = pa.table(dict(zip(table.column_names, cols)))
    return _attach_rows(table, 0)


def read_indexed_table(path: str, delimiter: str | None = None) -> rd.Dataset:
    """Any supported input file → indexed Dataset (parquet fragments or
    stringly CSV)."""
    if str(path).endswith(".parquet") or os.path.isdir(path):
        return read_indexed_parquet(str(path))
    table = read_table_stringly(str(path), delimiter)
    return rd.from_arrow(table)
