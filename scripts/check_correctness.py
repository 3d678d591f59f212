"""Self-check mirroring the driver's correctness gate: run every
queries() entry and compare with oracle_sql() via DuckDB (row count,
column names, order-insensitive value hash).

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> tuple[tuple, str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return tuple(sorted(df.columns)), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        from fairy_core_ray import worker_runtime_env

        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", runtime_env=worker_runtime_env())
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__

    qs = __ray_entry__.queries()
    oracles = __ray_entry__.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(ours)} rows cols={list(ours.columns)} ({dt:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        oc, oh = canon(ours)
        wc, wh = canon(want)
        if oc != wc:
            print(f"FAIL {name}: columns {oc} != {wc}")
            n_fail += 1
        elif len(ours) != len(want):
            print(f"FAIL {name}: rows {len(ours)} != {len(want)}")
            n_fail += 1
        elif oh != wh:
            print(f"FAIL {name}: value hash mismatch ({len(ours)} rows)")
            merged = ours.merge(want, how="outer", indicator=True)
            print(merged[merged["_merge"] != "both"].head(6).to_string())
            n_fail += 1
        else:
            print(f"PASS {name}: {len(ours)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
