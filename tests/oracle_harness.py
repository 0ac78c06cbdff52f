"""Local replica of the driver's DuckDB-oracle comparison so mismatches
surface in `pytest` before the round gate: row-count + column names +
order-insensitive value comparison (exact for non-floats, tiny tolerance
for floats)."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _norm_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def oracle_frame(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    """Fetch preserving NULL as None (fetchdf would coerce NULL→NaN in
    float columns, which the driver's comparison does not do)."""
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return pd.DataFrame(rows, columns=cols, dtype=object)


def compare(spark_df, oracle_df: pd.DataFrame) -> None:
    spark_pd = pd.DataFrame(
        [tuple(r) for r in spark_df.collect()],
        columns=spark_df.columns,
        dtype=object,
    )
    assert sorted(spark_pd.columns) == sorted(oracle_df.columns), (
        f"column mismatch: spark={sorted(spark_pd.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_pd) == len(oracle_df), (
        f"row count mismatch: spark={len(spark_pd)} oracle={len(oracle_df)}"
    )
    s_rows = _norm_frame(spark_pd)
    o_rows = _norm_frame(oracle_df)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
