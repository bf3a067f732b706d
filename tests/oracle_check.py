"""Local mimic of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares: row count, column-name set, and values
(columns sorted by name, rows sorted by all columns) — the strictest
plausible version of the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    sp = _canon(spark_df.toPandas())
    du = _canon(duck_df)
    problems: list[str] = []
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} duck={sorted(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"rowcount: spark={len(sp)} duck={len(du)}")
        return problems
    for col in sp.columns:
        a, b = sp[col], du[col]
        # The driver's value-hash is dtype-sensitive: DuckDB's
        # sum(BIGINT) -> HUGEINT materializes as float64 in pandas while
        # Spark emits int64, hashing differently over equal values.
        # Flag kind-level dtype divergence (int vs float) as a failure.
        if {a.dtype.kind, b.dtype.kind} == {"i", "f"}:
            problems.append(
                f"col {col}: dtype mismatch spark={a.dtype} duck={b.dtype}"
                " (driver hash would differ)"
            )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa, bb = a.astype(float), b.astype(float)
            both_nan = aa.isna() & bb.isna()
            eq = (aa == bb) | both_nan
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                diffs = [
                    f"row{i}: {aa.iloc[i]!r} vs {bb.iloc[i]!r} "
                    f"(Δ={_delta(aa.iloc[i], bb.iloc[i])})"
                    for i in bad
                ]
                problems.append(f"col {col}: {int((~eq).sum())} diffs; " + "; ".join(diffs))
        else:
            aa = a.astype(object).where(pd.notna(a), None)
            bb = b.astype(object).where(pd.notna(b), None)
            eq = aa.combine(bb, lambda x, y: x == y or (x is None and y is None))
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                diffs = [f"row{i}: {aa.iloc[i]!r} vs {bb.iloc[i]!r}" for i in bad]
                problems.append(f"col {col}: {int((~eq).sum())} diffs; " + "; ".join(diffs))
    return problems


def _delta(x, y):
    try:
        if x is None or y is None or math.isnan(x) or math.isnan(y):
            return "nan"
        return abs(x - y)
    except TypeError:
        return "?"
