"""Mimics the driver's verify: every queries() entry runs at sf0.01; entries
with an oracle_sql() must match DuckDB row-for-row (sorted columns, rounded
values) — same comparison shape as CORRECTNESS_r{N}.json."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ALL_KEYS = sorted(entrymod.queries().keys())


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE_KEYS) <= set(ALL_KEYS)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = ddb.execute(entrymod.oracle_sql()[name]).df()
    got, want = normalize(sdf), normalize(odf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_every_query_has_an_oracle():
    """Since round 3 every queries() entry has an oracle_sql() twin, so the
    old rows-only fallback parametrization is empty — pytest reported it as
    the suite's one unexplained SKIP (VERDICT r3 item 8). Pin the stronger
    property outright: the rows-only check stays dead as long as this
    holds, and if a future non-SQL-expressible query drops it, this test
    fails loudly and the rows-only runner below must come back."""
    rows_only = [k for k in ALL_KEYS if k not in ORACLE_KEYS]
    assert rows_only == [], (
        f"queries without oracles appeared: {rows_only}; re-add the "
        "rows-only smoke parametrization for them"
    )


def test_entry_flagship(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert {"url", "ranking"} <= set(out.columns)
