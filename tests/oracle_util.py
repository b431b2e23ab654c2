"""Replicates the driver's Spark-vs-DuckDB comparison in pytest:
row count + schema-insensitive, order-insensitive value comparison
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, duck_con, sql: str, check_dtypes: bool = True):
    got = _normalize(spark_df.toPandas())
    exp = _normalize(duck_con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), f"columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=check_dtypes, check_exact=True)
