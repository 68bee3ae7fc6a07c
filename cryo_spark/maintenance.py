"""Dataset maintenance utilities.

The streaming landing zone (``corpus --stream``, any
``writeStream.format('parquet')`` sink) appends a few files per
trigger; after weeks of micro-batches a 100 TB landing zone is
millions of KB-sized files, and every downstream scan pays the
per-file open cost (at cloud-store latency that dominates the read).
Compaction is the standard fix: periodically rewrite the accumulated
files into scan-sized ones.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _file_sizes(spark: SparkSession, df: DataFrame) -> list[int]:
    """Byte sizes of the parquet files behind ``df`` — via the SHARED
    pyarrow filesystem resolution (cryo_spark.fsutil) the ingestion
    paths use, so local, file:// and object-store URIs all work."""
    from cryo_spark.fsutil import resolve_fs

    sizes = []
    for p in df.inputFiles():
        fs, local = resolve_fs(p)
        sizes.append(fs.get_file_info(local).size)
    return sizes


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_mb: int = 256,
    order_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet dataset at ``src`` into ``dest`` as
    ``ceil(total_bytes / target_mb)`` scan-sized files. Returns
    ``{"files_in", "files_out", "rows", "bytes_in"}`` (rows verified
    equal before returning — a short write raises).

    ``order_by`` optionally range-clusters the rewrite (e.g.
    ``["source", "doc_id"]``) so downstream filters on those columns
    prune row groups — compaction is the natural moment to buy that
    layout since every byte is moving anyway. Without it the rewrite
    is a plain repartition (round-robin, no full sort).

    ``dest`` must differ from ``src``: the copy lands complete before
    anything points at it (swap by path flip or view repoint — object
    stores have no atomic directory rename, so in-place compaction is
    unsafe everywhere it matters). The streaming checkpoint keeps
    tracking the ORIGINAL landing dir; the pattern is
    landing (stream appends) -> compacted snapshots (batch reads).
    """
    if src.rstrip("/") == dest.rstrip("/"):
        raise ValueError(
            "dest must differ from src — in-place compaction cannot be "
            "atomic on object stores; write a new snapshot and repoint"
        )
    df = spark.read.parquet(src)
    sizes = _file_sizes(spark, df)
    total = sum(sizes)
    n_out = max(1, math.ceil(total / (target_mb << 20)))
    n_rows = df.count()
    if order_by:
        out = df.repartitionByRange(n_out, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dest)
    got = spark.read.parquet(dest)
    n_got = got.count()
    if n_got != n_rows:
        raise RuntimeError(
            f"compaction row mismatch: {n_rows} in, {n_got} out — "
            f"{dest} is not a faithful snapshot, do not repoint"
        )
    return {
        "files_in": len(sizes),
        "files_out": len(got.inputFiles()),
        "rows": n_rows,
        "bytes_in": total,
    }
