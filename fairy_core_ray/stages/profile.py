"""Distributed table profiling — per-column stats in one streaming pass.

The generic data-profiling surface next to the reference's fixed
preflight checks (reference preflight summarizes fixed domain columns;
/root/reference/src/fairy/preflight — this profiles ANY table). One
map_batches pass emits per-batch per-column partials; the driver folds
a (columns x blocks)-bounded frame. Integer/string exact only (no
float mins — a float min is exact too, but its string rendering is
not oracle-stable; callers profile float columns via the histogram /
quantile operators instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_IMIN = np.iinfo(np.int64).min
_IMAX = np.iinfo(np.int64).max


def profile_table(
    ds: rd.Dataset,
    *,
    int_cols: list[str],
    str_cols: list[str],
) -> pd.DataFrame:
    """(column, n_rows, n_nulls, min_v, max_v, sum_v) per profiled
    column — min/max rendered as strings (BIGINT casts for int
    columns, binary-collation string min/max for varchar), sum_v the
    BIGINT column sum (0 for varchar). Exact, deterministic, SQL-
    mirrorable. Partials fold TYPED (int mins as int64, string mins as
    strings) — folding on the rendered strings would order "100"
    before "99"."""
    cols = [(c, "i") for c in int_cols] + [(c, "s") for c in str_cols]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c, kind in cols:
            v = df[c]
            nulls = int(v.isna().sum())
            vv = v.dropna()
            mn_i, mx_i, sm, mn_s, mx_s = _IMAX, _IMIN, 0, None, None
            if kind == "i":
                a = vv.to_numpy(np.int64)
                if len(a):
                    mn_i, mx_i, sm = int(a.min()), int(a.max()), int(a.sum())
            else:
                a = vv.astype(str).to_numpy()
                if len(a):
                    mn_s, mx_s = a.min(), a.max()
            rows.append((c, kind, len(v), nulls, mn_i, mx_i, sm, mn_s, mx_s))
        return pd.DataFrame(
            rows,
            columns=[
                "column", "kind", "n_rows", "n_nulls",
                "mn_i", "mx_i", "sm", "mn_s", "mx_s",
            ],
        )

    frames = [
        b
        for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"
        )
        if len(b)
    ]
    if not frames:
        return pd.DataFrame(
            columns=["column", "n_rows", "n_nulls", "min_v", "max_v", "sum_v"]
        )
    allp = pd.concat(frames, ignore_index=True)
    out_rows = []
    for (c, kind), g in allp.groupby(["column", "kind"], sort=True):
        n = int(g["n_rows"].sum())
        nulls = int(g["n_nulls"].sum())
        if kind == "i":
            mn_i, mx_i = int(g["mn_i"].min()), int(g["mx_i"].max())
            mn = str(mn_i) if mn_i != _IMAX else None
            mx = str(mx_i) if mx_i != _IMIN else None
            sm = int(g["sm"].sum())
        else:
            s_mn, s_mx = g["mn_s"].dropna(), g["mx_s"].dropna()
            mn = s_mn.min() if len(s_mn) else None
            mx = s_mx.max() if len(s_mx) else None
            sm = 0
        out_rows.append((c, n, nulls, mn, mx, sm))
    out = pd.DataFrame(
        out_rows,
        columns=["column", "n_rows", "n_nulls", "min_v", "max_v", "sum_v"],
    )
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_nulls"] = out["n_nulls"].astype(np.int64)
    out["sum_v"] = out["sum_v"].astype(np.int64)
    return out.sort_values("column").reset_index(drop=True)
