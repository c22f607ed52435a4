"""Self-check harness shipped WITH the engine: run a catalog query on
Spark and its DuckDB oracle SQL side by side and compare exactly --
the same canonicalization the repo's tests and the external driver's
hash gate use, exposed so an operator can certify any query on their
own data layout (`check` CLI subcommand).

tests/oracle_harness.py delegates here; keep one copy of the rules.
"""

from __future__ import annotations

import math

import pandas as pd

_NULL = "<NULL>"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-columns, sorted-rows, all-string frame with uniform nulls."""
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None:
            return _NULL
        if isinstance(v, float):
            if math.isnan(v):
                return _NULL
            return repr(v)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    for c in df.columns:
        if str(df[c].dtype) in ("float32", "float64"):
            df[c] = df[c].map(lambda x: _NULL if pd.isna(x) else repr(float(x)))
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].map(lambda x: "true" if x else "false")
        elif str(df[c].dtype).startswith("int"):
            df[c] = df[c].map(str)
        else:
            df[c] = df[c].map(cell)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: schema mismatch: spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}")
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count mismatch: spark={len(spark_df)} duck={len(duck_df)}")
    a = canonicalize(spark_df)
    b = canonicalize(duck_df)
    if not a.equals(b):
        merged = a.merge(b, how="outer", indicator=True)
        diff = merged[merged["_merge"] != "both"]
        raise AssertionError(
            f"{name}: value mismatch, {len(diff)} differing rows, sample:\n"
            f"{diff.head(10).to_string()}")


def duck_connection(sf_dir: str):
    """DuckDB connection with the testdata tables registered as views,
    exactly as the external driver registers them."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def run_and_compare(spark, duck, fn, sql: str, sf_dir: str, name: str = "") -> int:
    """Execute query + oracle, compare; returns row count."""
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(sql).df()
    compare(spark_pdf, duck_pdf, name)
    return len(spark_pdf)
