"""Local replica of the driver's correctness gate: run every
__spark_entry__ query against its oracle at sf0.01 with DuckDB views
pre-registered, comparing pandas frames the way the driver does.

The driver collects the Spark result via toPandas() (no Arrow — so
BinaryType becomes bytearray and DecimalType becomes object[Decimal]),
the oracle via duckdb .df(), canonicalizes both (columns sorted by
name, rows sorted by all columns) and hashes values. This replica
reproduces that path so representation bugs (unhashable bytearray,
Decimal-vs-float64) surface locally instead of in CORRECTNESS_r{N}.

Usage: python tests/run_oracle_check.py [sf_dir] [query_prefix...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from cryo_spark import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows
    sorted by every column. Raises (like the driver) on unhashable
    cell values such as bytearray."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count {len(a)} != {len(b)}"
    for col in a.columns:
        xs, ys = a[col].to_numpy(), b[col].to_numpy()
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if ka != kb:
            # int-width / nullable-float promotion differences are
            # tolerated only when values still compare equal
            pass
        for i, (x, y) in enumerate(zip(xs, ys)):
            x_nan = x is None or (isinstance(x, float) and np.isnan(x))
            y_nan = y is None or (isinstance(y, float) and np.isnan(y))
            if x_nan or y_nan:
                if x_nan != y_nan:
                    return False, f"{col}[{i}]: {x!r} != {y!r}"
                continue
            if isinstance(x, float) or isinstance(y, float):
                if float(x) != float(y):
                    return False, f"{col}[{i}]: {x!r} != {y!r} (dtypes {ka}/{kb})"
            elif x != y:
                return False, f"{col}[{i}]: {x!r} != {y!r} (dtypes {ka}/{kb})"
        # a value-equal frame with mismatched object/numeric dtypes
        # would still hash differently in the driver
        if {ka, kb} != {ka} and "O" in {ka, kb}:
            return False, f"{col}: dtype kind mismatch {ka} vs {kb} (values equal)"
    return True, ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]
    spark = get_spark()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print(f"{len(qs)} queries registered, {len(oracles)} with oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_rows_only = 0
    t_start = time.time()
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sp = fn(spark, sf_dir).toPandas()
            sp_c = canon(sp)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark/canon error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            # the driver still canonicalizes rows-only entries; getting
            # here without an exception is the whole check
            print(f"rows  {name}: {len(sp)} rows, {time.time()-t0:.1f}s (no oracle)")
            n_rows_only += 1
            continue
        try:
            du_c = canon(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle/canon error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok, why = frames_equal(sp_c, du_c)
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {len(sp)} rows, {time.time()-t0:.1f}s")
        else:
            n_fail += 1
            print(f"FAIL  {name}: {why}  ({len(sp)} vs {len(du_c)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail, total {time.time()-t_start:.0f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
