"""Skew-handling utilities.

AQE's skew-join splitting covers joins; these helpers cover the two
remaining hot-key shapes a chain/training-data workload hits:

- salted aggregation: a groupBy whose key distribution is power-law
  (one hot contract producing 30% of all logs) makes one reducer the
  straggler even with map-side combine when the aggregate state is
  large (collect_set/percentile). Two-phase salting bounds any
  reducer's share at 1/n_salts of the hot key.
- bucketed co-located writes: persist a table bucketed by its join
  key so repeated joins/aggregations on that key shuffle ZERO rows
  (SortMergeJoin without Exchange). The lakehouse analog of the
  reference's "same join keys in every table" design note
  (/root/reference/README.md:101).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) where fn is one
    of sum/count/min/max (the re-aggregatable algebra; avg = sum+count
    composed by the caller). Phase 1 aggregates on (keys + random
    salt) — hot keys split across ``n_salts`` reducers; phase 2
    combines the partials, whose cardinality is at most
    n_salts x distinct(keys).
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in merge:
            raise ValueError(f"{fn} is not re-aggregatable; use sum/count/min/max")
    salted = df.withColumn(
        "__salt__", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt__").agg(
        *[first[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    n_buckets: int = 32,
    sort_keys: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table:
    subsequent equi-joins/aggregations on the bucket keys read
    co-located data and skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan moves no rows between executors for
    the join: no ShuffleExchange (a BroadcastExchange ships only the
    small build side and is not a shuffle of the fact table)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
