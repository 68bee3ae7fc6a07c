"""Ground-truth tests for scalar helpers: Spark expression and DuckDB
oracle snippet are each checked against plain-Python reference
results (int.from_bytes etc.), not merely against each other —
differential-only checking can hide both-sides-wrong bugs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cryo_spark.functions import (
    be_uint,
    count_zero_bytes,
    keccak256_py,
    trace_sort_key,
)
from cryo_spark.oracle import be_uint_sql, count_zero_bytes_sql, trace_sort_key_sql

CASES = [
    b"",
    b"\x00",
    b"\x01",
    b"\xff",
    (2**62 - 12345).to_bytes(32, "big"),
    (2**64 + 5).to_bytes(32, "big"),
    (10**25).to_bytes(16, "big"),
    (2**100).to_bytes(32, "big"),
    b"\x00\x01\x00\xff\x00",
]


def py_be_uint(b: bytes, max_bytes: int = 16) -> int:
    return int.from_bytes(b[-max_bytes:], "big") if b else 0


def test_be_uint_spark(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(CASES)], "i int, v binary")
    got = {r["i"]: int(r["u"]) for r in df.select("i", be_uint("v").alias("u")).collect()}
    for i, v in enumerate(CASES):
        assert got[i] == py_be_uint(v), f"case {i}: {v.hex()}"


def test_be_uint_duckdb():
    con = duckdb.connect()
    for v in CASES:
        lit = "'\\x" + "\\x".join(f"{b:02x}" for b in v) + "'::BLOB" if v else "''::BLOB"
        (got,) = con.sql(f"SELECT {be_uint_sql(lit)}").fetchone()
        assert int(got) == py_be_uint(v), v.hex()


def test_count_zero_bytes(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(CASES)], "i int, v binary")
    got = {r["i"]: r["n"] for r in df.select("i", count_zero_bytes("v").alias("n")).collect()}
    con = duckdb.connect()
    for i, v in enumerate(CASES):
        expect = v.count(0)
        assert got[i] == expect, f"spark case {i}"
        lit = "'\\x" + "\\x".join(f"{b:02x}" for b in v) + "'::BLOB" if v else "''::BLOB"
        (duck,) = con.sql(f"SELECT {count_zero_bytes_sql(lit)}").fetchone()
        assert duck == expect, f"duck case {i}"


def test_trace_sort_key_orders_depth_first(spark):
    paths = ["", "0", "0_0", "0_10", "0_2", "1", "10", "2", "2_0_1"]
    expect = ["", "0", "0_0", "0_2", "0_10", "1", "2", "2_0_1", "10"]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    got = [r["p"] for r in df.orderBy(trace_sort_key("p")).collect()]
    assert got == expect
    con = duckdb.connect()
    vals = ", ".join(f"('{p}')" for p in paths)
    rows = con.sql(
        f"SELECT p FROM (VALUES {vals}) t(p) ORDER BY {trace_sort_key_sql('p')}"
    ).fetchall()
    assert [r[0] for r in rows] == expect


KECCAK_VECTORS = {
    b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
    b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
    b"Transfer(address,address,uint256)": "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef",
    b"Approval(address,address,uint256)": "8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925",
    # multi-block absorb regression pin (computed by this impl; the
    # public vectors above validate permutation + padding)
    bytes(200): "e1bb54e1bc3af48d01e5dbfc81015c98152a574f6428c6948aa4837c9c0baad9",
}


@pytest.mark.parametrize("data,expect", KECCAK_VECTORS.items())
def test_keccak256(data, expect):
    assert keccak256_py(data).hex() == expect
