"""Event-signature ABI decoding tests (reference F8,
log_decoder.rs:13-190)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark import api
from cryo_spark.functions import keccak256
from cryo_spark.functions.abi import decode_logs, parse_event_signature

TRANSFER = "Transfer(address indexed from, address indexed to, uint256 value)"


def test_parse_signature_canonical_and_topic0():
    sig = parse_event_signature(TRANSFER)
    assert sig.canonical == "Transfer(address,address,uint256)"
    assert sig.topic0.hex() == (
        "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    assert [p.name for p in sig.indexed] == ["from", "to"]
    assert [p.name for p in sig.body] == ["value"]


def test_parse_signature_rejects_unsupported():
    # same rejection set as to_df/src/lib.rs:137-141
    for bad in [
        "E(uint256[] xs)", "E(bytes32 b)", "E(tuple t)", "E((uint256,uint256) p)"
    ]:
        with pytest.raises(ValueError):
            parse_event_signature(bad)


def _mklog(spark, topic0, topics, data):
    row = {
        "block_number": 1, "transaction_index": 0, "log_index": 0,
        "address": b"\xaa" * 20, "topic0": topic0,
        "topic1": topics[0] if len(topics) > 0 else None,
        "topic2": topics[1] if len(topics) > 1 else None,
        "topic3": topics[2] if len(topics) > 2 else None,
        "data": data, "chain_id": 1,
    }
    return spark.createDataFrame(
        [row],
        "block_number int, transaction_index int, log_index int, address binary,"
        "topic0 binary, topic1 binary, topic2 binary, topic3 binary, data binary,"
        "chain_id long",
    )


def test_decode_static_types(spark):
    sig = "Evt(address indexed who, uint64 small, int64 neg, bool flag)"
    topic0 = keccak256(b"Evt(address,uint64,int64,bool)")
    who = b"\x00" * 12 + b"\x11" * 20
    small = (1234).to_bytes(32, "big")
    neg = (2**256 - 5).to_bytes(32, "big")  # -5 two's complement
    flag = (1).to_bytes(32, "big")
    df = _mklog(spark, topic0, [who], small + neg + flag)
    out = decode_logs(df, sig).first()
    assert out["event__who"] == b"\x11" * 20
    assert out["event__small"] == 1234
    assert out["event__neg"] == -5
    assert out["event__flag"] is True
    # raw columns dropped
    assert "topic1" not in decode_logs(df, sig).columns
    assert "data" not in decode_logs(df, sig).columns


def test_decode_uint256_family(spark):
    topic0 = keccak256(b"Transfer(address,address,uint256)")
    t1 = b"\x00" * 12 + b"\x22" * 20
    t2 = b"\x00" * 12 + b"\x33" * 20
    value = (10**20 + 7).to_bytes(32, "big")
    df = _mklog(spark, topic0, [t1, t2], value)
    out = decode_logs(df, TRANSFER).first()
    assert out["event__from"] == b"\x22" * 20
    assert out["event__to"] == b"\x33" * 20
    assert out["event__value_binary"] == value
    assert out["event__value_string"] == str(10**20 + 7)
    assert out["event__value_f64"] == pytest.approx(1e20)


def test_decode_dynamic_string(spark):
    sig = "Named(string name)"
    topic0 = keccak256(b"Named(string)")
    payload = b"hello cryo"
    data = (
        (32).to_bytes(32, "big")
        + len(payload).to_bytes(32, "big")
        + payload + b"\x00" * (32 - len(payload))
    )
    df = _mklog(spark, topic0, [], data)
    out = decode_logs(df, sig).first()
    assert out["event__name"] == "hello cryo"


def test_collect_with_event_signature(spark):
    df = api.collect(
        spark, "logs", blocks="0:1000", event_signature=TRANSFER, sort=False
    )
    assert "event__from" in df.columns and "topic1" not in df.columns
    n = df.count()
    assert n > 0
    # every decoded row really is a Transfer log
    raw = api.collect(spark, "logs", blocks="0:1000", sort=False)
    sig_hex = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    expected = raw.filter(F.hex(F.col("topic0")) == sig_hex.upper()).count()
    assert n == expected


def test_decode_uint64_wrapping(spark):
    # wrapping_to::<u64> (log_decoder.rs DynSolValue::Uint): uint64
    # values >= 2^63 reinterpret as negative longs instead of killing
    # the job with an ANSI CAST_OVERFLOW
    sig = "Big(uint64 n)"
    topic0 = keccak256(b"Big(uint64)")
    big = (1 << 64) - 2
    df = _mklog(spark, topic0, [], big.to_bytes(32, "big"))
    out = decode_logs(df, sig).first()
    assert out["event__n"] == -2  # two's-complement view of 2^64-2


def test_decode_uint256_beyond_128_bits_exact(spark):
    # hash-derived token ids / max-uint approvals: exact string, no
    # truncation (the old decimal(38,0) carrier silently nulled or
    # truncated these)
    topic0 = keccak256(b"Transfer(address,address,uint256)")
    t1 = b"\x00" * 12 + b"\x22" * 20
    t2 = b"\x00" * 12 + b"\x33" * 20
    value = (1 << 256) - 1
    df = _mklog(spark, topic0, [t1, t2], value.to_bytes(32, "big"))
    out = decode_logs(df, TRANSFER).first()
    assert out["event__value_binary"] == value.to_bytes(32, "big")
    assert out["event__value_string"] == str(value)
    assert out["event__value_f64"] == pytest.approx(float(value))
