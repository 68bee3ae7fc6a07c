"""Timestamp→block resolution + as-of join tests (reference
cli/parse/timestamps.rs:324-515 test style, offline against the
fixture blocks table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import api, timestamps as cts
from cryo_spark.fixtures import BASE_TS
from cryo_spark.operators.asof import asof_join
from cryo_spark.sources import raw


@pytest.fixture(scope="module")
def blocks(spark):
    return raw(spark, "blocks")


def test_parse_timestamp_units():
    assert cts.parse_timestamp_number("90", "none") == 90
    assert cts.parse_timestamp_number("2m", "none") == 120
    assert cts.parse_timestamp_number("3h", "none") == 10800
    assert cts.parse_timestamp_number("1d", "none") == 86400
    assert cts.parse_timestamp_number("1.5d", "none") == 129600
    assert cts.parse_timestamp_number("2w", "none") == 1209600


def test_parse_timestamp_range_relative():
    assert cts.parse_timestamp_range("100", "200") == (100, 199)
    assert cts.parse_timestamp_range("100", "+50") == (100, 149)  # end-exclusive, blocks.rs:308-312
    assert cts.parse_timestamp_range("-50", "200", latest_ts=None) == (150, 200)
    assert cts.parse_timestamp_range("", "latest", latest_ts=999) == (0, 999)


def test_timestamp_to_block_bounds(spark, blocks):
    # fixture blocks: ts = BASE_TS + 12*n + jitter(0..2)
    assert cts.timestamp_to_block(blocks, BASE_TS - 1) == 0  # before chain start
    assert cts.timestamp_to_block(blocks, BASE_TS + 10**9) == 999  # after tip
    # exact semantics: greatest block with timestamp <= ts
    mid_row = blocks.filter(F.col("block_number") == 500).first()
    assert cts.timestamp_to_block(blocks, mid_row.timestamp) == 500
    assert cts.timestamp_to_block(blocks, mid_row.timestamp - 13) < 500


def test_collect_with_timestamp_range(spark, blocks):
    t0 = blocks.filter(F.col("block_number") == 100).first().timestamp
    t1 = blocks.filter(F.col("block_number") == 200).first().timestamp
    df = api.collect(spark, "blocks", timestamps=f"{t0}:{t1}")
    got = [r.block_number for r in df.select("block_number").collect()]
    assert got[0] == 100
    # end-exclusive on the timestamp, resolved to <=(t1-1)'s block
    assert got[-1] in (199, 200)
    assert len(got) == got[-1] - 99


def test_asof_join_backward_and_forward(spark):
    left = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 17.0), (4, 3.0)], "id long, t double"
    )
    right = spark.createDataFrame(
        [(4.0, "a"), (10.0, "b"), (15.0, "c")], "t double, tag string"
    )
    back = {
        r.id: r.tag
        for r in asof_join(left, right, left_on="t").select("id", "tag").collect()
    }
    assert back == {1: "a", 2: "b", 3: "c", 4: None}
    fwd = {
        r.id: r.tag
        for r in asof_join(left, right, left_on="t", direction="forward")
        .select("id", "tag").collect()
    }
    assert fwd == {1: "b", 2: "b", 3: None, 4: "a"}


def test_asof_join_with_partition_keys(spark):
    left = spark.createDataFrame(
        [("x", 10.0), ("y", 10.0)], "k string, t double"
    )
    right = spark.createDataFrame(
        [("x", 5.0, 1), ("y", 9.0, 2), ("y", 11.0, 3)], "k string, t double, v int"
    )
    got = {
        (r.k): r.v
        for r in asof_join(left, right, left_on="t", by=["k"]).select("k", "v").collect()
    }
    assert got == {"x": 1, "y": 2}


def test_timestamps_to_blocks_batch(spark, blocks):
    ts_df = spark.createDataFrame(
        [(BASE_TS + 12 * 100 + 5,), (BASE_TS + 12 * 700 + 5,)], "ts long"
    )
    out = {
        int(r.ts): r.block_number
        for r in cts.timestamps_to_blocks(blocks, ts_df).collect()
    }
    # jitter is 0..2s, so ts+5 lands on that block
    assert out[BASE_TS + 12 * 100 + 5] == 100
    assert out[BASE_TS + 12 * 700 + 5] == 700
