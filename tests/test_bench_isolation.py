"""bench.py per-query error isolation: round 3 shipped zero perf data
because one AnalysisException aborted the whole run. A failing query
must surface as an err record while every other query still times."""

from __future__ import annotations

from pyspark.sql import functions as F

import bench


def test_bench_one_failing_query_reports_err(spark):
    def broken(s, sf_dir):
        return s.range(3).select(F.col("id").cast("timestamp_ntz").cast("long"))

    t, n, err, (fp, _) = bench.bench_one(spark, broken, "/root/testdata/sf0.001", reps=1)
    assert t is None and n is None and fp is None
    assert "AnalysisException" in err or "CAST" in err


def test_bench_one_good_query_times(spark):
    def ok(s, sf_dir):
        return s.read.parquet(f"{sf_dir}/region.parquet")

    t, n, err, (fp, fp_text) = bench.bench_one(spark, ok, "/root/testdata/sf0.001", reps=1)
    assert err is None and t is not None and n == 5
    assert fp and "FileScan" in fp_text  # plan fingerprint rides along
