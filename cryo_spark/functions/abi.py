"""Event-signature ABI decoding (reference F8).

Mirrors /root/reference/crates/freeze/src/types/decoders/
log_decoder.rs:13-190 + codegen crates/to_df/src/lib.rs:63-172:
`--event-signature "Transfer(address indexed from, address indexed
to, uint256 value)"` adds typed `event__<name>` columns to the logs
table and drops the raw topic1-3/data columns
(to_df/src/lib.rs:165-166).

Spark-first: every static ABI type is a fixed 32-byte slot, so the
decode is binary substring + big-endian limb arithmetic — pure JVM
column expressions, no UDF. Dynamic string/bytes follow the
offset/length head-tail layout with column-valued substring
positions. Array/tuple/fixed-bytes params are rejected exactly like
the reference (to_df/src/lib.rs:137-141).

uint/int <= 64 bits decode to long (reference Int32/Int64 —
log_decoder.rs:122-128); wider uints materialize as the u256
representation family (default binary/string/f64 — same defaults as
u256 columns, cli/parse/schemas.rs:87-109).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cryo_spark.functions import be_uint, keccak256

_PARAM_RE = re.compile(
    r"^\s*(?P<type>[a-z0-9\[\]]+)\s*(?P<indexed>indexed\s+)?(?P<name>\w+)\s*$"
)


@dataclass(frozen=True)
class EventParam:
    name: str
    type: str
    indexed: bool


@dataclass(frozen=True)
class EventSignature:
    name: str
    params: tuple[EventParam, ...]

    @property
    def canonical(self) -> str:
        return f"{self.name}({','.join(p.type for p in self.params)})"

    @property
    def topic0(self) -> bytes:
        return keccak256(self.canonical.encode())

    @property
    def indexed(self) -> list[EventParam]:
        return [p for p in self.params if p.indexed]

    @property
    def body(self) -> list[EventParam]:
        return [p for p in self.params if not p.indexed]


def _normalize_type(t: str) -> str:
    if t == "uint":
        return "uint256"
    if t == "int":
        return "int256"
    return t


def parse_event_signature(sig: str) -> EventSignature:
    """`Name(type [indexed] name, ...)` -> EventSignature.
    Unsupported param types raise, matching to_df/src/lib.rs:137-141."""
    m = re.match(r"^\s*(\w+)\s*\((.*)\)\s*$", sig.strip())
    if not m:
        raise ValueError(f"malformed event signature: {sig!r}")
    name, body = m.group(1), m.group(2)
    params: list[EventParam] = []
    if body.strip():
        for piece in body.split(","):
            pm = _PARAM_RE.match(piece)
            if not pm:
                raise ValueError(f"malformed event parameter: {piece!r}")
            t = _normalize_type(pm.group("type"))
            if "[" in t or t.startswith("fixed") or t in ("tuple", "function"):
                raise ValueError(f"unsupported event parameter type: {t}")
            if re.match(r"^bytes\d+$", t):
                raise ValueError(f"unsupported event parameter type: {t}")
            if not re.match(r"^(address|bool|string|bytes|u?int\d+)$", t):
                raise ValueError(f"unknown event parameter type: {t}")
            params.append(
                EventParam(pm.group("name"), t, pm.group("indexed") is not None)
            )
    return EventSignature(name, tuple(params))


def _decode_static(word: Column, t: str, colname: str) -> list[Column]:
    """One 32-byte word -> typed column(s)."""
    if t == "address":
        return [F.substring(word, 13, 20).alias(colname)]
    if t == "bool":
        return [(be_uint(F.substring(word, 32, 1), 1) != 0).alias(colname)]
    m = re.match(r"^(u?)int(\d+)$", t)
    if not m:
        raise ValueError(f"not a static type: {t}")
    unsigned, bits = m.group(1) == "u", int(m.group(2))
    if unsigned and bits <= 64:
        # wrapping u64 (log_decoder.rs DynSolValue::Uint
        # wrapping_to::<u64>): uint64 values >= 2^63 reinterpret as
        # negative longs instead of overflowing the ANSI cast
        from cryo_spark.functions import wrap_u64

        return [wrap_u64(word).alias(colname)]
    if not unsigned and bits <= 64:
        v = be_uint(word, max_bytes=bits // 8)
        signed = F.when(
            v >= F.lit(str(1 << (bits - 1))).cast("decimal(38,0)"),
            v - F.lit(str(1 << bits)).cast("decimal(38,0)"),
        ).otherwise(v)
        return [signed.cast("long").alias(colname)]
    # wide uint/int -> u256 representation family (reference default
    # set binary/string/f64); the 32-byte word carries the exact
    # value, the string derives exactly via the Arrow UDF, f64 casts
    # from the string so rounding is the engine-standard
    # correctly-rounded string->double
    from cryo_spark.functions import u256_string_udf

    s = u256_string_udf(word)
    return [
        word.alias(f"{colname}_binary"),
        s.alias(f"{colname}_string"),
        s.cast("double").alias(f"{colname}_f64"),
    ]


def decode_event_columns(sig: EventSignature) -> list[Column]:
    """Columns decoding `topic1..3` + `data` per the signature.
    Indexed params read their topic (dynamic indexed params are
    keccak hashes per ABI — surfaced as the raw 32-byte topic);
    body params read head slots of `data`, dynamic ones follow their
    offset."""
    out: list[Column] = []
    topics = ["topic1", "topic2", "topic3"]
    for i, p in enumerate(sig.indexed):
        if i >= 3:
            raise ValueError("more than 3 indexed parameters")
        word = F.col(topics[i])
        colname = f"event__{p.name}"
        if p.type in ("string", "bytes"):
            out.append(word.alias(f"{colname}_hash"))  # ABI: topic = keccak(value)
        else:
            out.extend(_decode_static(word, p.type, colname))
    for slot, p in enumerate(sig.body):
        colname = f"event__{p.name}"
        head = F.substring(F.col("data"), slot * 32 + 1, 32)
        if p.type in ("string", "bytes"):
            off = be_uint(head, 8).cast("int")
            length = be_uint(
                F.substring(F.col("data"), off + 1, 32), 8
            ).cast("int")
            payload = F.substring(F.col("data"), off + 33, length)
            if p.type == "string":
                out.append(payload.cast("string").alias(colname))
            else:
                out.append(payload.alias(colname))
        else:
            out.extend(_decode_static(head, p.type, colname))
    return out


def decode_logs(logs: DataFrame, signature: str) -> DataFrame:
    """Filter to the event's topic0 and append decoded `event__*`
    columns, dropping raw topic1-3/data (to_df/src/lib.rs:165-166)."""
    sig = parse_event_signature(signature)
    filtered = logs.filter(F.col("topic0") == F.lit(sig.topic0))
    keep = [c for c in logs.columns if c not in ("topic1", "topic2", "topic3", "data")]
    return filtered.select(*keep, *decode_event_columns(sig))
