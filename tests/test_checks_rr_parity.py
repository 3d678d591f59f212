"""RuleResult-family parity vs the reference's checks.py on shared
frames, including the documented semantic deltas (keep=False dup,
NaN-passes enum, last-two sampling)."""

import dataclasses
import os
import sys

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fairy_core_ray.sources.tables import ROW_COL
from fairy_core_ray.stages import checks_rr

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference repo not available"
)


def ref_checks():
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from fairy.validation import checks

    return checks


def to_dict(rr):
    if rr is None:
        return None
    d = dataclasses.asdict(rr)
    return d


def make_ds(df: pd.DataFrame):
    df = df.copy()
    df[ROW_COL] = np.arange(len(df), dtype=np.int64)
    return rd.from_pandas(df), [c for c in df.columns if c != ROW_COL]


def test_row_unique_keep_false_and_last_two_sampling():
    c = ref_checks()
    df = pd.DataFrame({"id": ["1", "1", "2", "3", "3", "3"]})
    want = to_dict(c.rr_row_unique(df, column="id"))
    ds, cols = make_ds(df)
    got = checks_rr.rr_row_unique(ds, cols, column="id")
    assert got == want
    assert got["count"] == 5  # keep=False counts every member
    assert [s["row"] for s in got["samples"]] == [1, 2, 5, 6]


def test_row_unique_case_insensitive():
    c = ref_checks()
    df = pd.DataFrame({"name": ["Ada", "ada", "Bob", "Cy", "CY", "dan"]})
    want = to_dict(c.rr_row_unique(df, column="name", case_insensitive=True))
    ds, cols = make_ds(df)
    got = checks_rr.rr_row_unique(ds, cols, column="name", case_insensitive=True)
    assert got == want


def test_row_unique_no_dups_and_missing_column():
    c = ref_checks()
    df = pd.DataFrame({"id": ["a", "b", "c"]})
    ds, cols = make_ds(df)
    assert checks_rr.rr_row_unique(ds, cols, column="id") is None
    want = to_dict(c.rr_row_unique(df, column="nope"))
    got = checks_rr.rr_row_unique(ds, cols, column="nope")
    assert got == want


def test_foreign_key_none_handling():
    c = ref_checks()
    left = pd.DataFrame({"fk": ["a", None, "x", "b", "y"]})
    right = pd.DataFrame({"pk": ["a", "b", None]})
    want = to_dict(
        c.rr_table_foreign_key(left, right, from_column="fk", to_column="pk")
    )
    lds, lcols = make_ds(left)
    rds, rcols = make_ds(right)
    got = checks_rr.rr_table_foreign_key(
        lds, lcols, rds, rcols, from_column="fk", to_column="pk"
    )
    assert got == want
    assert got["count"] == 2  # None on probe side passes


def test_foreign_key_missing_columns():
    c = ref_checks()
    left = pd.DataFrame({"fk": ["a"]})
    right = pd.DataFrame({"pk": ["a"]})
    want = to_dict(
        c.rr_table_foreign_key(left, right, from_column="zz", to_column="qq")
    )
    lds, lcols = make_ds(left)
    rds, rcols = make_ds(right)
    got = checks_rr.rr_table_foreign_key(
        lds, lcols, rds, rcols, from_column="zz", to_column="qq"
    )
    assert got == want


def test_numeric_range_non_numeric_counted():
    c = ref_checks()
    df = pd.DataFrame({"v": ["1", "oops", "50", "200", None, "-3"]})
    want = to_dict(
        c.rr_column_numeric_range(df, column="v", min_value=0, max_value=100)
    )
    ds, cols = make_ds(df)
    got = checks_rr.rr_column_numeric_range(
        ds, cols, column="v", min_value=0, max_value=100
    )
    assert got == want
    assert got["meta"]["non_numeric_count"] == 1  # None is NOT non-numeric-present


def test_url_and_non_empty():
    c = ref_checks()
    df = pd.DataFrame(
        {"u": ["https://x.org", "www.y.com", "nope", "ftp://z/q", "", None, "   "]}
    )
    ds, cols = make_ds(df)
    want = to_dict(c.rr_column_url(df, column="u"))
    got = checks_rr.rr_column_url(ds, cols, column="u")
    assert got == want
    want2 = to_dict(c.rr_column_non_empty_trimmed(df, column="u"))
    got2 = checks_rr.rr_column_non_empty_trimmed(ds, cols, column="u")
    assert got2 == want2


def test_enum_nan_passes():
    c = ref_checks()
    df = pd.DataFrame({"s": ["A", "b", None, "C", "a"]})
    ds, cols = make_ds(df)
    want = to_dict(c.rr_column_enum(df, column="s", allowed=["A", "C"]))
    got = checks_rr.rr_column_enum(ds, cols, column="s", allowed=["A", "C"])
    assert got == want
    wci = to_dict(
        c.rr_column_enum(df, column="s", allowed=["A", "C"], case_insensitive=True)
    )
    gci = checks_rr.rr_column_enum(
        ds, cols, column="s", allowed=["A", "C"], case_insensitive=True
    )
    assert gci == wci
