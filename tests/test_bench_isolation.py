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


def test_compact_line_realistic_suite_fits_with_full_detail():
    """The real suite shape (31 queries + freeze entry) must fit the
    driver's tail buffer WITHOUT degradation — BENCH_r06.json shipped
    parsed:null because the line outgrew the ~2000-byte capture."""
    import json

    out = {
        "metric": "cryo_spark headline suite wall-clock",
        "value": 24.517,
        "unit": "sec",
        "queries": {name: 1.234 for name in bench.HEADLINE}
        | {"freeze_3_datasets": 4.567},
        "sf": 0.1,
    }
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    assert parsed["queries"] == out["queries"]  # nothing degraded
    assert "plans" not in parsed and "rows" not in parsed


def test_compact_line_oversize_degrades_not_truncates():
    """A pathological map (many long names) must degrade to a valid
    JSON line with exact totals, never an unparseable overflow."""
    import json

    qs = {f"query_with_a_very_long_descriptive_name_{i:04d}": 0.5
          for i in range(200)}
    out = {"metric": "m", "value": 100.0, "unit": "sec",
           "queries": qs, "sf": 0.1,
           "errors": {"bad_query": "x" * 300}}
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    assert parsed["value"] == 100.0
    kept = parsed["queries"]
    assert "_other" in kept
    assert abs(sum(kept.values()) - sum(qs.values())) < 0.01


def test_compact_line_huge_errors_map_still_fits():
    """Final guard rung: an errors map that survives per-value
    truncation because of sheer KEY count must be dropped (or the
    record collapsed to the minimal form) rather than overflow."""
    import json

    out = {"metric": "m", "value": 100.0, "unit": "sec",
           "queries": {f"q{i}": 0.5 for i in range(5)}, "sf": 0.1,
           "errors": {f"err_query_named_{i:05d}": "boom" for i in range(200)}}
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    assert parsed["value"] == 100.0 and parsed["unit"] == "sec"


def test_bench_one_good_query_times(spark):
    def ok(s, sf_dir):
        return s.read.parquet(f"{sf_dir}/region.parquet")

    t, n, err, (fp, fp_text) = bench.bench_one(spark, ok, "/root/testdata/sf0.001", reps=1)
    assert err is None and t is not None and n == 5
    assert fp and "FileScan" in fp_text  # plan fingerprint rides along


def test_compact_line_calibrated_map_trims_cheapest_first():
    """Round 16: the contract line carries queries_calibrated. When
    the tail budget is tight the CHEAPEST queries' ratios fall off
    first (with a _dropped count); the expensive queries — where a
    regression question lands — keep theirs. A small record carries
    the full map untouched."""
    import json

    qs = {f"llm_operator_with_long_name_{i:02d}": round(0.2 + i * 0.3, 3)
          for i in range(40)}
    qc = {k: 1.1 for k in qs}
    out = {"metric": "m", "value": 100.0, "unit": "sec",
           "queries": qs, "queries_calibrated": qc, "sf": 0.1}
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    kept = parsed["queries_calibrated"]
    dropped = kept.pop("_dropped")
    assert dropped == len(qs) - len(kept) > 0
    # survivors are exactly the most expensive queries
    expensive = sorted(qs, key=qs.get, reverse=True)[: len(kept)]
    assert set(kept) == set(expensive)

    small = {"metric": "m", "value": 1.0, "unit": "sec",
             "queries": {"a": 1.0}, "queries_calibrated": {"a": 1.2},
             "sf": 0.1}
    parsed = json.loads(bench.compact_line(small))
    assert parsed["queries_calibrated"] == {"a": 1.2}


def test_bench_one_reports_min_of_reps(spark):
    """Round 17 (judge task #3): the contract line's per-query figure
    is the MIN over repeated back-to-back executions, never the first
    draw — a one-off contention spike on rep 1 must not become the
    recorded number. Pinned by making the FIRST timed rep slow."""
    import time as _time

    calls = {"n": 0}

    def spiky(s, sf_dir):
        calls["n"] += 1
        # call 1 = warm-up (tiny dir), calls 2-4 = the 3 timed reps,
        # call 5 = the untimed sanity count. Spike exactly rep 1.
        if calls["n"] == 2:
            _time.sleep(0.8)
        return s.read.parquet(f"{sf_dir}/region.parquet")

    t, n, err, _ = bench.bench_one(
        spark, spiky, "/root/testdata/sf0.001", reps=3
    )
    assert err is None and n == 5
    assert calls["n"] == 5  # warm + 3 timed reps + sanity count
    assert t < 0.8, (
        f"reported {t}s — the spiked first rep leaked through; the "
        "figure must be the min of the 3 reps"
    )


def test_bench_contract_line_states_min_timing():
    """The timing discipline is ON the contract line (the judge reads
    the driver snapshot without the source): a 'timing' field naming
    min-of-N survives compact_line at the realistic suite size."""
    import json

    out = {
        "metric": "cryo_spark headline suite wall-clock",
        "value": 24.517,
        "unit": "sec",
        "timing": "min-of-3 headline / min-of-2 write+ingest",
        "queries": {name: 1.234 for name in bench.HEADLINE}
        | {"freeze_3_datasets": 4.567},
        "sf": 0.1,
    }
    line = bench.compact_line(out)
    assert len(line) <= bench.MAX_LINE_BYTES
    assert json.loads(line)["timing"].startswith("min-of-3")
