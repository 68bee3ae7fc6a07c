"""Training-shard export: the last step of a data pipeline — write
the prepared corpus as token-budgeted parquet shards per split, the
layout a distributed trainer streams (shard = the unit of shuffle
granularity and of resumable progress).

Scale shape: shard assignment is ONE window per split (cumulative
token count in deterministic hash order → shard_id =
floor(cumsum/budget)); the write is a single partitioned job
(`partitionBy(split, shard)`), so 100k shards are 100k directories
out of one stage, never 100k jobs. Hash order makes shards
content-stable: re-running the pipeline on the same corpus yields
byte-identical shard membership regardless of cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    shard_tokens: int,
    token_col: str = "n_tokens",
    split_col: str = "split",
    id_col: str = "doc_id",
    seed: str = "shard0",
) -> DataFrame:
    """Append ``shard`` (0-based per split): documents fill a shard
    until its token budget is reached, in deterministic md5-hash
    order. A single document larger than the budget gets its own
    shard (never split here — sequence packing is ``seqprep``'s
    job). Exclusive-prefix cumsum: a doc lands in the shard its
    PRECEDING tokens fill, so every shard except a split's last
    holds >= budget-minus-one-doc tokens."""
    order = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(split_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "shard", F.floor(prefix / F.lit(shard_tokens)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_tokens: int,
    token_col: str = "n_tokens",
    split_col: str = "split",
    id_col: str = "doc_id",
    seed: str = "shard0",
) -> dict:
    """Write ``path/split=<s>/shard=<n>/*.parquet`` in one job and
    return {split: n_shards}. Directory partitioning means a trainer
    (or a resumed export) prunes to its split/shard at the DIRECTORY
    level."""
    out = assign_shards(df, shard_tokens, token_col, split_col, id_col, seed)
    out.write.partitionBy(split_col, "shard").mode("overwrite").parquet(path)
    rows = (
        out.groupBy(split_col)
        .agg(F.count_distinct("shard").alias("n"))
        .collect()
    )
    return {r[split_col]: r["n"] for r in rows}


def read_training_shards(
    spark: SparkSession, path: str, split: str | None = None
) -> DataFrame:
    """Partition-pruned read: with ``split`` set, only that split's
    directories are listed (PartitionFilters, no footer reads
    elsewhere)."""
    df = spark.read.parquet(path)
    return df.filter(F.col("split") == split) if split else df
