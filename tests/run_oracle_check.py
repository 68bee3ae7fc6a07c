"""Fast driver-contract check: run every `queries()` entry against its
`oracle_sql()` DuckDB equivalent at sf0.01 and print per-query
rows/schema/hash verdicts (mirrors the driver's CORRECTNESS harness).

Usage: python tests/run_oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from cryo_spark import get_spark

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    # dtype KINDS are hashed alongside the stringized values: the
    # astype(str) csv alone would mask e.g. int-vs-float or
    # bytes-vs-str drift that the driver's value hash catches.
    kinds = ",".join(df[c].dtype.kind for c in df.columns)
    body = df.astype(str).to_csv(index=False)
    return hashlib.md5((kinds + "\n" + body).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    spark = get_spark(app_name="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    # The driver collects WITHOUT Arrow, where BinaryType lands as
    # bytearray and DecimalType as object — replicate that here so a
    # dtype-sensitive mismatch surfaces in this check, not only in
    # the round gate.
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")

    selected = names or sorted(queries)
    n_pass = n_fail = n_noracle = 0
    for name in selected:
        try:
            s = canon(queries[name](spark, sf_dir).toPandas())
            if name not in oracles:
                print(f"{name:35s} rows_only spark_rows={len(s)}")
                n_noracle += 1
                continue
            o = canon(con.sql(oracles[name]).df())
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            hmatch = rows and schema and value_hash(s) == value_hash(o)
            ok = rows and schema and hmatch
            n_pass += ok
            n_fail += not ok
            print(f"{name:35s} rows={rows} schema={schema} hash={hmatch}"
                  f" ({len(s)}/{len(o)})" + ("" if ok else "  <-- FAIL"))
            if not ok and schema:
                m = s.merge(o, how="outer", indicator=True)
                bad = m[m._merge != "both"]
                if len(bad):
                    print(bad.head(6).to_string())
            elif not schema:
                print(f"  spark={list(s.columns)}\n  oracle={list(o.columns)}")
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"{name:35s} ERROR {type(exc).__name__}: {exc}"[:300]
                  + "  <-- FAIL")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only "
          f"of {len(selected)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
