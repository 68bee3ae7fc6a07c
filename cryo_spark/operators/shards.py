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
    id_col: str | list[str] = "doc_id",
    seed: str = "shard0",
) -> DataFrame:
    """Append ``shard`` (0-based per split): documents fill a shard
    until its token budget is reached, in deterministic md5-hash
    order. A single document larger than the budget gets its own
    shard (never split here — sequence packing is ``seqprep``'s
    job). Exclusive-prefix cumsum: a doc lands in the shard its
    PRECEDING tokens fill, so every shard except a split's last
    holds >= budget-minus-one-doc tokens.

    TWO-PHASE prefix sum — the naive `Window.partitionBy(split)`
    cumsum funnels an entire split through ONE task's sort (the
    scale killer for a prefix computation). Instead: the first 3 hex
    chars of the ordering hash bucket each split into 4096 ranges;
    per-bucket token totals (a partial aggregate) come back to a
    broadcast offset map (#splits x 4096 rows), and the in-bucket
    window sorts only its bucket. Because the bucket is a PREFIX of
    the ordering hash, (bucket, hash, id) order equals (hash, id)
    order — bit-identical shard membership to the single-window
    formulation (pinned by test), with per-task work 1/4096th of a
    split."""
    # id_col may be a LIST when one column is not a key (an
    # epoch-upsampled corpus identifies rows by (doc_id, epoch)) —
    # ties on the full ordering key would otherwise make which copy
    # lands in which shard depend on shuffle order, breaking the
    # determinism contract below
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    order = F.md5(
        F.concat_ws(":", F.lit(seed), *[F.col(i).cast("string") for i in ids])
    )
    bucket = F.substring(order, 1, 3)
    keyed = df.withColumn("_ord", order).withColumn("_bkt", bucket)
    # phase 1: per-(split, bucket) token totals -> exclusive bucket
    # offsets via a window over the TINY totals frame (#splits x 4096
    # rows — driver/exchange cost is nil, and it stays declarative)
    totals = keyed.groupBy(split_col, "_bkt").agg(
        F.sum(token_col).alias("_btot")
    )
    woff = (
        Window.partitionBy(split_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        split_col, "_bkt",
        F.coalesce(F.sum("_btot").over(woff), F.lit(0)).alias("_boff"),
    )
    # phase 2: in-bucket exclusive cumsum + broadcast bucket offset
    win = (
        Window.partitionBy(split_col, "_bkt")
        .orderBy("_ord", *[F.col(i) for i in ids])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(win), F.lit(0)) + F.col("_boff")
    return (
        keyed.join(F.broadcast(offsets), [split_col, "_bkt"])
        .withColumn(
            "shard", F.floor(prefix / F.lit(shard_tokens)).cast("int")
        )
        .drop("_ord", "_bkt", "_boff")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_tokens: int,
    token_col: str = "n_tokens",
    split_col: str = "split",
    id_col: str | list[str] = "doc_id",
    seed: str = "shard0",
    fmt: str = "parquet",
    zorder: list[str] | None = None,
    zorder_bits: int = 12,
) -> dict:
    """Write ``path/split=<s>/shard=<n>/*.parquet`` in one job and
    return {split: n_shards}. Directory partitioning means a trainer
    (or a resumed export) prunes to its split/shard at the DIRECTORY
    level. ``fmt='jsonl'`` writes line-delimited JSON instead (same
    layout, same single partitioned job) for loaders that stream
    text rather than read columnar.

    ``zorder=[col, ...]`` (round 15) clusters rows inside each
    split/shard directory along the z-order curve of those columns
    (:func:`cryo_spark.operators.skew.zorder_value`) so parquet
    min/max stats prune per-column point/range reads of the shards
    (e.g. a doc_id lookup or an n_tokens band scan) — one extra range
    exchange + in-partition sort, with the sharded frame persisted
    around the min/max range probe so the upstream plan runs once;
    the plain path is unchanged."""
    out = assign_shards(df, shard_tokens, token_col, split_col, id_col, seed)
    cached = None
    if zorder:
        from cryo_spark.operators import skew

        out, cached = skew.zorder_cluster(
            out, zorder, zorder_bits, [split_col, "shard"]
        )
    try:
        writer = out.write.partitionBy(split_col, "shard").mode("overwrite")
        if fmt == "parquet":
            writer.parquet(path)
        elif fmt == "jsonl":
            # trainers that stream text want line-delimited JSON; Spark's
            # json sink IS jsonl (one object per line, .json extension)
            writer.json(path)
        else:
            raise ValueError(f"unsupported shard format: {fmt!r}")
    finally:
        if cached is not None:
            cached.unpersist()
    # shard counts come from the JUST-WRITTEN directory layout via a
    # Hadoop FS listing — counting on `out` would re-execute the
    # entire upstream plan a second time, and a read-back DataFrame
    # would crash schema inference on an empty export (and, for
    # jsonl, re-scan every byte just to infer). Listing is genuinely
    # metadata-sized and returns {} for an all-filtered corpus.
    spark = df.sparkSession
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    counts: dict = {}
    if fs.exists(root):
        for s in fs.listStatus(root):
            name = s.getPath().getName()
            if s.isDirectory() and name.startswith(f"{split_col}="):
                split = name.split("=", 1)[1]
                counts[split] = sum(
                    1
                    for sh in fs.listStatus(s.getPath())
                    if sh.isDirectory()
                    and sh.getPath().getName().startswith("shard=")
                )
    return counts


def read_training_shards(
    spark: SparkSession, path: str, split: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Partition-pruned read: with ``split`` set, only that split's
    directories are listed (PartitionFilters, no footer reads
    elsewhere)."""
    df = (
        spark.read.parquet(path)
        if fmt == "parquet"
        else spark.read.json(path)
    )
    return df.filter(F.col("split") == split) if split else df
