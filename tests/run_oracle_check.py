"""Local replica of the driver's t2 gate: run every __spark_entry__
query against its oracle at sf0.01 with DuckDB views pre-registered.

Usage: python tests/run_oracle_check.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from cryo_spark import get_spark
from cryo_spark.testing import canon_rows

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    t_start = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sp_cols = df.columns
            sp_data = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sp_data)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            du_cols = list(rel.columns)
            du_data = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok = sorted(sp_cols) == sorted(du_cols) and canon_rows(sp_cols, sp_data) == canon_rows(du_cols, du_data)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            if sorted(sp_cols) != sorted(du_cols):
                print(f"      cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            else:
                a, b = canon_rows(sp_cols, sp_data), canon_rows(du_cols, du_data)
                for x, y in zip(a, b):
                    if x != y:
                        print(f"      first diff:\n        spark={x}\n        duck ={y}")
                        break
        print(f"{status}  {name}: {len(sp_data)} rows, {time.time()-t0:.1f}s")
    print(f"\n{n_pass} pass, {n_fail} fail, total {time.time()-t_start:.0f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
