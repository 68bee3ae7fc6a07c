"""Lake layout tests: partitioned writes + directory-level pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cryo_spark import io as cio
from cryo_spark.sources import raw


def test_lake_roundtrip_and_partition_pruning(spark, tmp_path):
    root = str(tmp_path / "lake")
    blocks = raw(spark, "blocks")
    cio.write_lake(blocks, root, "blocks", bucket_size=250)
    # layout: chain_id=1/block_bucket={0,250,500,750}
    buckets = sorted(
        d for d in os.listdir(os.path.join(root, "blocks", "chain_id=1"))
        if d.startswith("block_bucket=")
    )
    assert buckets == [
        "block_bucket=0", "block_bucket=250", "block_bucket=500",
        "block_bucket=750",
    ]

    df = cio.read_lake(spark, root, "blocks")
    assert df.count() == blocks.count()

    # bucket-aware predicate prunes at the directory level
    pred = cio.lake_block_predicate(100, 300, bucket_size=250)
    q = df.filter(pred)
    assert q.count() == 201
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert m and "block_bucket" in m[0], "bucket predicate must reach PartitionFilters"

    # appending another chain keeps partitions separate
    cio.write_lake(
        blocks.withColumn("chain_id", F.lit(10)), root, "blocks", bucket_size=250
    )
    df2 = cio.read_lake(spark, root, "blocks")
    assert df2.filter(F.col("chain_id") == 10).count() == blocks.count()
    assert df2.count() == 2 * blocks.count()
