"""transactions dataset.

Reference: /root/reference/crates/freeze/src/datasets/transactions.rs.
Semantics re-expressed Spark-first:

- effective gas price (transactions.rs:287-302): legacy/eip2930 keep
  the explicit price; dynamic-fee txs derive
  ``base_fee + min(max_priority_fee, max_fee - base_fee)`` — the base
  fee comes from a **broadcast** join of the (small) blocks table onto
  transactions (reference J2), no shuffle of the fact table.
- input byte stats (transactions.rs:246-255): JVM-side hex-pair
  counting, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.functions import count_zero_bytes
from cryo_spark.oracle import count_zero_bytes_sql, fixture_rel
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw

COLS = get_spec("transactions").column_names()


def transform(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    txs = raw(spark, "transactions", fixtures_dir)
    base_fees = raw(spark, "blocks", fixtures_dir).select(
        "block_number", F.col("base_fee_per_gas").alias("_base_fee")
    )
    df = txs.join(F.broadcast(base_fees), "block_number", "left")
    gas_price = F.when(
        F.col("transaction_type") < 2, F.col("gas_price")
    ).otherwise(
        F.col("_base_fee")
        + F.least(
            F.col("max_priority_fee_per_gas"),
            F.col("max_fee_per_gas") - F.col("_base_fee"),
        )
    )
    n_zero = count_zero_bytes("input")
    exprs = {
        "transaction_index": F.col("transaction_index").cast("long"),
        "gas_price": gas_price.cast("long"),
        "n_input_bytes": F.length("input").cast("int"),
        "n_input_zero_bytes": n_zero,
        "n_input_nonzero_bytes": (F.length("input") - n_zero).cast("int"),
    }
    return df.select(*[exprs.get(c, F.col(c)).alias(c) for c in COLS])


def oracle(fixtures_dir: str) -> str:
    zero = count_zero_bytes_sql("t.input")
    exprs = {
        "transaction_index": "t.transaction_index::BIGINT",
        "gas_price": (
            "CASE WHEN t.transaction_type < 2 THEN t.gas_price "
            "ELSE b.base_fee_per_gas + least(t.max_priority_fee_per_gas, "
            "t.max_fee_per_gas - b.base_fee_per_gas) END"
        ),
        "n_input_bytes": "octet_length(t.input)::INTEGER",
        "n_input_zero_bytes": zero,
        "n_input_nonzero_bytes": f"(octet_length(t.input) - {zero})::INTEGER",
    }
    select = ", ".join(f"{exprs.get(c, 't.' + c)} AS {c}" for c in COLS)
    return (
        f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_transactions')} t "
        f"LEFT JOIN {fixture_rel(fixtures_dir, 'fixture_blocks')} b USING (block_number)"
    )


TRANSFORMS = {"transactions": transform}
ORACLES = {"transactions": oracle}
