"""blocks dataset.

Reference: /root/reference/crates/freeze/src/datasets/blocks.rs
(header flatten, 21 flat columns). Here: a pure projection of the
landed raw header table in declared schema order — Catalyst prunes
the parquet scan to exactly the selected columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.oracle import fixture_rel
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw

COLS = get_spec("blocks").column_names()


def transform(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    df = raw(spark, "blocks", fixtures_dir)
    return df.select(
        *[F.col(c).cast("long").alias(c) if c in ("gas_used", "gas_limit", "difficulty", "size") else F.col(c) for c in COLS]
    )


def oracle(fixtures_dir: str) -> str:
    cols = ", ".join(COLS)
    return f"SELECT {cols} FROM {fixture_rel(fixtures_dir, 'fixture_blocks')}"


TRANSFORMS = {"blocks": transform}
ORACLES = {"blocks": oracle}
