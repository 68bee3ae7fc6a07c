"""Timestamp → block-number resolution.

Mirrors /root/reference/crates/cli/src/parse/timestamps.rs:
- numeric refs with metric-unit suffixes (m/h/d/w/M/y scale to
  seconds — `:255-273`; note `s` is NOT a unit there, and K/M/B
  block-style suffixes don't apply to timestamps),
- ranges `a:b` end-exclusive, `-n:b` trailing window, `a:+n` leading
  window (`:178-227`),
- each timestamp resolves to the closest block with
  `block.timestamp <= ts` (binary search against the chain,
  `:274-310`).

Offline the binary search becomes a lookup against the landed blocks
table: a single min/max aggregate per boundary (two boundaries per
range — the work-list is tiny), or an as-of join
(:mod:`cryo_spark.operators.asof`) when resolving many timestamps
at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.asof import asof_join
from cryo_spark.plan import BlockChunk

_UNITS = {
    "m": 60, "h": 3600, "d": 86400, "w": 86400 * 7,
    "M": 86400 * 30, "y": 86400 * 365,
}


def parse_timestamp_number(ref: str, position: str, latest_ts: int | None = None) -> int:
    if ref == "latest" or (ref == "" and position == "last"):
        if latest_ts is None:
            raise ValueError("`latest` requires a known chain tip timestamp")
        return latest_ts
    if ref == "":
        if position == "first":
            return 0
        raise ValueError("empty timestamp reference")
    if ref[-1] in _UNITS:
        return int(float(ref[:-1]) * _UNITS[ref[-1]])
    return int(float(ref))


def parse_timestamp_range(
    first: str, second: str, latest_ts: int | None = None
) -> tuple[int, int]:
    if first.startswith("-"):
        end = parse_timestamp_number(second, "last", latest_ts)
        start = end - parse_timestamp_number(first[1:], "none", latest_ts)
        return start, end
    if second.startswith("+"):
        # end-exclusive like the block parser's `+` branch
        # (blocks.rs:308-312): `t:+n` covers n seconds starting at t
        start = parse_timestamp_number(first, "first", latest_ts)
        return start, start + parse_timestamp_number(second[1:], "none", latest_ts) - 1
    start = parse_timestamp_number(first, "first", latest_ts)
    end = parse_timestamp_number(second, "last", latest_ts)
    if second != "latest" and second != "":
        end -= 1
    return start, end


def timestamp_to_block(blocks: DataFrame, ts: int) -> int:
    """Closest block with timestamp <= ts (timestamps.rs:274-310);
    block 0 when the chain starts later. One aggregate over the
    timestamp column — parquet stats prune row groups."""
    row = blocks.filter(F.col("timestamp") <= ts).agg(
        F.max("block_number").alias("b")
    ).first()
    return int(row.b) if row.b is not None else 0


def timestamps_to_blocks(blocks: DataFrame, ts_df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Batch resolution of many timestamps via as-of join (one
    shuffle-sort of |blocks| + |timestamps| rows)."""
    right = blocks.select("block_number", "timestamp")
    return asof_join(ts_df, right, left_on=ts_col, right_on="timestamp")


def parse_timestamp_chunk_resolved(
    token: str, resolve, latest_ts: int
) -> BlockChunk:
    """One timestamp token -> a block chunk, via an injected
    ``resolve(ts) -> block_number`` — the landed-lake aggregate
    offline, the live-chain bisection online."""
    parts = token.replace("_", "").split(":")
    if len(parts) == 1:
        b = resolve(parse_timestamp_number(parts[0], "none", latest_ts))
        return BlockChunk(numbers=(b,))
    if len(parts) == 2:
        t0, t1 = parse_timestamp_range(parts[0], parts[1], latest_ts)
        return BlockChunk(start=resolve(t0), end=resolve(t1))
    raise ValueError("timestamps must be ts or start:end")


def parse_timestamp_chunk(
    token: str, blocks: DataFrame, latest_ts: int | None = None
) -> BlockChunk:
    """One timestamp token -> a block chunk (landed blocks table)."""
    if latest_ts is None:
        latest_ts = int(blocks.agg(F.max("timestamp")).first()[0])
    return parse_timestamp_chunk_resolved(
        token, lambda ts: timestamp_to_block(blocks, ts), latest_ts
    )


def parse_timestamp_inputs(
    inputs: str | int, blocks: DataFrame, latest_ts: int | None = None
) -> list[BlockChunk]:
    tokens = str(inputs).split(" ")
    return [parse_timestamp_chunk(t, blocks, latest_ts) for t in tokens]


def parse_timestamp_inputs_online(inputs: str | int, source) -> list[BlockChunk]:
    """Timestamp chunks resolved against the LIVE chain through an
    OnlineSource's driver-side probes: one eth_blockNumber for the
    tip, one header read for the tip timestamp, then an O(log n)
    bisection per boundary (timestamps.rs:274-310;
    blocks.rs:131-146). Never touches the landed lake."""
    tip = source.latest_block_number()
    latest_ts = source.block_timestamp(tip)
    return [
        parse_timestamp_chunk_resolved(
            t, lambda ts: source.timestamp_to_block(ts, tip), latest_ts
        )
        for t in str(inputs).split(" ")
    ]
