"""Range (interval-containment) join vs the DuckDB IEJoin answer."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from cryo_spark.operators.interval import interval_join, interval_join_sql


def _frames(seed=7, n_left=300, n_right=60):
    import random

    rng = random.Random(seed)
    left = pd.DataFrame({
        "event_id": range(n_left),
        "ts": [rng.randint(0, 1000) for _ in range(n_left)],
    })
    starts = [rng.randint(-20, 990) for _ in range(n_right)]
    right = pd.DataFrame({
        "win_id": range(n_right),
        "start": starts,
        # a few empty / backwards intervals must match nothing
        "end": [s + rng.randint(-5, 60) for s in starts],
        "label": [f"w{i}" for i in range(n_right)],
    })
    return left, right


def _duck(left, right, how):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.sql(
        interval_join_sql("l", "r", "ts", how=how)
    ).df()


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("width", [None, 1, 7, 1000])
def test_interval_join_matches_duckdb(spark, how, width):
    """Bucketed result == the engine-native range join for ANY bucket
    width (buckets only gate candidate generation)."""
    lpdf, rpdf = _frames()
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = interval_join(
        left, right, "ts", how=how, bucket_width=width
    ).toPandas()
    want = _duck(lpdf, rpdf, how)
    key = lambda df: sorted(  # noqa: E731
        map(repr, df[sorted(got.columns)].itertuples(index=False, name=None))
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert key(got) == key(want)
    assert len(got[got.win_id.notna()]) > 50, "vacuous fixture"


def test_interval_join_suffix_and_empty_intervals(spark):
    left = spark.createDataFrame([(1, 5, "L")], "id long, ts long, label string")
    right = spark.createDataFrame(
        [(9, 0, 10, "R"), (8, 7, 7, "E"), (7, 9, 2, "B")],
        "id long, start long, end long, label string",
    )
    out = interval_join(left, right, "ts").collect()
    assert len(out) == 1  # empty + backwards intervals match nothing
    assert out[0].label == "L" and out[0].label_right == "R"
    assert out[0].id == 1 and out[0].id_right == 9


def test_interval_join_half_open_boundaries(spark):
    left = spark.createDataFrame([(0,), (10,), (20,)], "ts long")
    right = spark.createDataFrame([(0, 10), (10, 20)], "start long, end long")
    got = sorted(
        (r.ts, r.start) for r in interval_join(left, right, "ts").collect()
    )
    # start inclusive, end exclusive; 20 matches nothing
    assert got == [(0, 0), (10, 10)]


def test_interval_join_fractional_end_near_bucket_boundary(spark):
    """An interval ending a hair above a bucket boundary must still
    replicate into that bucket: an epsilon-subtracted hi would drop
    the true match for left ts=1.0 vs [0.0, 1.0+4e-13)."""
    left = spark.createDataFrame([(1.0,)], "ts double")
    right = spark.createDataFrame(
        [(0.0, 1.0 + 4e-13)], "start double, end double"
    )
    out = interval_join(left, right, "ts", bucket_width=1.0).collect()
    assert len(out) == 1
    # ...and an end EXACTLY on the boundary stays excluded (half-open)
    right2 = spark.createDataFrame([(0.0, 1.0)], "start double, end double")
    assert interval_join(left, right2, "ts", bucket_width=1.0).count() == 0


def test_interval_join_outlier_span_fails_loudly(spark):
    """One outlier-long interval at a small bucket width must raise a
    clear sizing error, not build a billions-element sequence."""
    left = spark.createDataFrame([(5.0,)], "ts double")
    right = spark.createDataFrame(
        [(0.0, 3.0e9)], "start double, end double"
    )
    with pytest.raises(Exception, match="raise bucket_width"):
        interval_join(
            left, right, "ts", bucket_width=1.0,
            max_buckets_per_interval=10_000,
        ).collect()


def test_interval_join_plan_has_no_nested_loop(spark):
    """The scale contract: an equality shuffle join on the bucket id,
    never a cartesian/broadcast-nested-loop of the naive range
    predicate."""
    lpdf, rpdf = _frames()
    df = interval_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), "ts"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
