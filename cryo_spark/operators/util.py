"""Shared operator helpers."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# logical nodes whose OUTPUT partitioning is shuffle-driven (or, for
# LogicalRDD, already fixed by an upstream materialization): anchored
# to the start of a treeString line (after the tree-art prefix) so a
# column named e.g. `join` can never match.
_WIDE_ANCESTOR = re.compile(
    r"(?m)^[\s:+*\-]*(Join|Aggregate|Window|Sort|Repartition"
    r"|RepartitionByExpression|Rebalance|Deduplicate|LogicalRDD"
    r"|FlatMapGroupsInPandas|Intersect|Except)\b"
)


def bt(name: str) -> str:
    """Backtick-quote an identifier for a Spark SQL expression text
    (r18, ADVICE r17: the SQL-string builders interpolated identifiers
    into backticks without escaping embedded backticks — same contract
    as contract._bt, shared here for operator code)."""
    return "`" + name.replace("`", "``") + "`"


def local_rows(spark, rows, schema, rows_per_slice: int = 8192) -> DataFrame:
    """Driver-local rows -> DataFrame with SIZE-APPROPRIATE partitioning.

    ``spark.createDataFrame(list, schema)`` parallelizes into
    ``defaultParallelism`` slices regardless of size, so every job that
    touches a small driver-built table (a broadcast build, a join, the
    funnel report window) runs a full-width wave of near-empty tasks
    paying only fixed per-task cost — measured at sf0.1/local[32]:
    a 4096-row ratio table cost 0.25 s warm (32 tasks, ~0 bytes) vs
    0.10 s at one slice, and one such stage showed 4.9 s summed run
    time against 0.13 s of CPU under concurrency (round-18 profile).
    One slice per ``rows_per_slice`` rows keeps a genuinely large
    driver list parallel (the CC fast-path edge list can be 100k rows)
    while metadata-sized tables get one task.

    Identical semantics to ``createDataFrame(list, schema)``: PySpark
    applies the same row verifier/converter on the RDD path, and both
    spellings plan as a LogicalRDD leaf (plan text unchanged)."""
    rows = rows if isinstance(rows, (list, tuple)) else list(rows)
    n = max(1, -(-len(rows) // rows_per_slice))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), schema
    )


def spread(df: DataFrame) -> DataFrame:
    """Ensure per-row CPU work is spread across all cores.

    A small parquet input lands in fewer splits than cores (locally:
    one file / one row group -> one task evaluating every expression
    single-threaded). At real scale inputs have >= parallelism splits
    and this is a no-op.

    Cost discipline (round 13): the old exact probe
    (``df.rdd.getNumPartitions()``) was anything but plan-only — under
    AQE, converting a frame with joins/aggregates to an RDD EXECUTES
    the upstream shuffle stages at plan-construction time (measured
    1.5 s + a hidden job on a 2-join frame) and then reports the
    AQE-coalesced count (1 locally), so spread() both ran hidden eager
    work and inserted a pointless extra full-corpus exchange above
    every join. Instead, probe the ANALYZED LOGICAL plan (no physical
    planning, no execution — measured ~3-60 ms): any wide ancestor
    (join/agg/window/sort/repartition) means the output partitioning
    is already `spark.sql.shuffle.partitions`-driven, and a LogicalRDD
    leaf (a localCheckpoint cut or createDataFrame) carries the
    partitioning of what it materialized — both already parallel, so
    spread is a no-op. Only a NARROW chain over file scans — the case
    spread exists for — pays the exact `.rdd` probe, which is cheap
    there (no shuffle stages to execute, ~50 ms of planning).

    The probe is a heuristic in one direction only: a broadcast join
    over a single-split scan skips the repartition it used to get.
    That is parallelism (local-test perf), never correctness — every
    operator here is partition-agnostic — and at scale the big side
    of a broadcast join has >= parallelism splits anyway."""
    target = df.sparkSession.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().analyzed().treeString()
    if _WIDE_ANCESTOR.search(plan):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
