"""Differential oracle checking (mirrors the driver's t2 gate and the
reference's cryo_test comparison strategy — SURVEY §5).

Spark result vs DuckDB oracle on the same parquet: row count, column
names, and an order-insensitive value comparison (columns sorted by
name, rows sorted by canonicalized values)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd


def canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return repr(round(v, 10))
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, Decimal):
        return str(int(v)) if v == v.to_integral_value() else str(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if v is pd.NaT:
        return "∅"
    return str(v)


def canon_rows(cols: list[str], data: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon_cell(row[i]) for i in order) for row in data]
    rows.sort()
    return rows


def compare(spark_df, oracle_sql: str, name: str = "?") -> dict:
    """Returns {'name', 'match', 'rows_spark', 'rows_oracle', 'detail'}."""
    sp_cols = spark_df.columns
    sp_data = [tuple(r) for r in spark_df.collect()]
    con = duckdb.connect()
    rel = con.sql(oracle_sql)
    du_cols = list(rel.columns)
    du_data = rel.fetchall()
    out = {
        "name": name,
        "rows_spark": len(sp_data),
        "rows_oracle": len(du_data),
        "match": False,
        "detail": "",
    }
    if sorted(sp_cols) != sorted(du_cols):
        out["detail"] = f"columns differ: spark={sorted(sp_cols)} oracle={sorted(du_cols)}"
        return out
    if len(sp_data) != len(du_data):
        out["detail"] = "row counts differ"
        return out
    rows_sp = canon_rows(sp_cols, sp_data)
    rows_du = canon_rows(du_cols, du_data)
    if rows_sp == rows_du:
        out["match"] = True
        return out
    # find first mismatch for debugging
    for i, (a, b) in enumerate(zip(rows_sp, rows_du)):
        if a != b:
            out["detail"] = f"first row mismatch at sorted idx {i}:\n  spark={a}\n  duck ={b}"
            break
    else:
        out["detail"] = "row multiset mismatch (length equal)"
    return out
