"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, schema
width and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from quick_stream_spark.sources.readers import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    a = _normalize(spark_df.toPandas())
    b = _normalize(oracle_df)
    problems: list[str] = []
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = [
                (pd.isna(x) and pd.isna(y))
                or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=0, abs_tol=0))
                for x, y in zip(av, bv)
            ]
        else:
            eq = [(pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(av, bv)]
        bad = [i for i, ok in enumerate(eq) if not ok]
        if bad:
            i = bad[0]
            problems.append(
                f"column {c}: {len(bad)}/{len(a)} values differ; "
                f"first at row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
            )
    return problems
