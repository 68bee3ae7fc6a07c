"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure per-row CPU work is spread across all cores.

    A small parquet input lands in fewer splits than cores (locally:
    one file / one row group -> one task evaluating every expression
    single-threaded). At real scale inputs have >= parallelism splits
    and this is a no-op; the check costs nothing (plan-only)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
