"""logs + event-derived datasets (erc20/erc721 transfers, approvals).

Reference: /root/reference/crates/freeze/src/datasets/logs.rs,
erc20_transfers.rs, erc20_approvals.rs, erc721_transfers.rs.

Spark-first notes:
- topic/address predicates are plain filters on the raw log table; on
  parquet they push into the scan (reference pushes them into the
  eth_getLogs filter — P4/P5, rpc_params.rs:99-131).
- ERC-20 discriminator (erc20_transfers.rs:74-77): exactly 3 topics
  and 32-byte data. ERC-721 (erc721_transfers.rs): 4 topics, empty
  data. NOTE the reference's tx-mode erc20 filter checks the
  *Approval* hash (erc20_transfers.rs:101-105) — a known reference
  bug we deliberately do not replicate.
- topic → address is binary substring (F4); u256 values keep their
  exact 32-byte word (representation columns derive at output via
  schema_select.u256_view_cols).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.functions import be_uint, topic_to_address
from cryo_spark.oracle import be_uint_sql, blob_slice_sql, fixture_rel
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw

TRANSFER_SIG_HEX = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
APPROVAL_SIG_HEX = "8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925"

LOG_COLS = get_spec("logs").column_names()


def _sig(hex_sig: str) -> Column:
    return F.unhex(F.lit(hex_sig.upper()))


def transform_logs(
    spark: SparkSession,
    fixtures_dir: str | None = None,
    address: bytes | None = None,
    topic0: bytes | None = None,
) -> DataFrame:
    df = raw(spark, "logs", fixtures_dir)
    if address is not None:
        df = df.filter(F.col("address") == F.lit(address))
    if topic0 is not None:
        df = df.filter(F.col("topic0") == F.lit(topic0))
    exprs = {"n_data_bytes": F.length("data").cast("int")}
    return df.select(*[exprs.get(c, F.col(c)).alias(c) for c in LOG_COLS])


def oracle_logs(fixtures_dir: str) -> str:
    exprs = {"n_data_bytes": "octet_length(data)::INTEGER"}
    select = ", ".join(f"{exprs.get(c, c)} AS {c}" for c in LOG_COLS)
    return f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_logs')}"


def _erc20_shaped(df: DataFrame, sig_hex: str) -> DataFrame:
    """Exactly 3 topics + 32-byte data (erc20_transfers.rs:74-77)."""
    return df.filter(
        (F.col("topic0") == _sig(sig_hex))
        & F.col("topic1").isNotNull()
        & F.col("topic2").isNotNull()
        & F.col("topic3").isNull()
        & (F.length("data") == 32)
    )


def _erc20_select(df: DataFrame, contract_col: str) -> DataFrame:
    cols = get_spec("erc20_transfers").column_names()
    exprs = {
        contract_col: F.col("address").alias(contract_col),
        "from_address": topic_to_address("topic1").alias("from_address"),
        "to_address": topic_to_address("topic2").alias("to_address"),
        # the full 32-byte word IS the value (u256 carrier): exact for
        # max-uint approvals and any amount >= 2^128 (reference stores
        # exact U256 — erc20_transfers.rs:22,126)
        "value": F.col("data").alias("value"),
    }
    names = [c if c != "erc20" else contract_col for c in cols]
    return df.select(*[exprs.get(c, F.col(c)) for c in names])


def transform_erc20_transfers(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return _erc20_select(_erc20_shaped(raw(spark, "logs", fixtures_dir), TRANSFER_SIG_HEX), "erc20")


def transform_erc20_approvals(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return _erc20_select(_erc20_shaped(raw(spark, "logs", fixtures_dir), APPROVAL_SIG_HEX), "erc20")


def transform_erc721_transfers(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    df = raw(spark, "logs", fixtures_dir).filter(
        (F.col("topic0") == _sig(TRANSFER_SIG_HEX))
        & F.col("topic1").isNotNull()
        & F.col("topic2").isNotNull()
        & F.col("topic3").isNotNull()
        & (F.length("data") == 0)
    )
    cols = get_spec("erc721_transfers").column_names()
    exprs = {
        "erc721": F.col("address").alias("erc721"),
        "from_address": topic_to_address("topic1").alias("from_address"),
        "to_address": topic_to_address("topic2").alias("to_address"),
        # hash-derived token ids routinely exceed 2^128: keep the
        # exact 32-byte word (erc721_transfers.rs:22)
        "token_id": F.col("topic3").alias("token_id"),
    }
    return df.select(*[exprs.get(c, F.col(c)) for c in cols])


def _erc20_oracle(fixtures_dir: str, sig_hex: str) -> str:
    cols = get_spec("erc20_transfers").column_names()
    exprs = {
        "erc20": "address AS erc20",
        "from_address": f"{blob_slice_sql('topic1', 13, 20)} AS from_address",
        "to_address": f"{blob_slice_sql('topic2', 13, 20)} AS to_address",
        "value": "data AS value",
    }
    select = ", ".join(exprs.get(c, c) for c in cols)
    return (
        f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_logs')} "
        f"WHERE hex(topic0) = upper('{sig_hex}') AND topic1 IS NOT NULL "
        f"AND topic2 IS NOT NULL AND topic3 IS NULL AND octet_length(data) = 32"
    )


def oracle_erc20_transfers(fixtures_dir: str) -> str:
    return _erc20_oracle(fixtures_dir, TRANSFER_SIG_HEX)


def oracle_erc20_approvals(fixtures_dir: str) -> str:
    return _erc20_oracle(fixtures_dir, APPROVAL_SIG_HEX)


def oracle_erc721_transfers(fixtures_dir: str) -> str:
    cols = get_spec("erc721_transfers").column_names()
    exprs = {
        "erc721": "address AS erc721",
        "from_address": f"{blob_slice_sql('topic1', 13, 20)} AS from_address",
        "to_address": f"{blob_slice_sql('topic2', 13, 20)} AS to_address",
        "token_id": "topic3 AS token_id",
    }
    select = ", ".join(exprs.get(c, c) for c in cols)
    return (
        f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_logs')} "
        f"WHERE hex(topic0) = upper('{TRANSFER_SIG_HEX}') AND topic1 IS NOT NULL "
        f"AND topic2 IS NOT NULL AND topic3 IS NOT NULL AND octet_length(data) = 0"
    )


TRANSFER_EVENT_SIG = (
    "Transfer(address indexed from, address indexed to, uint256 value)"
)


def transform_logs_decoded(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """logs + --event-signature ABI decoding (reference F8,
    log_decoder.rs:13-190): typed event__* columns appended, raw
    topic1-3/data dropped. Pure JVM decode — static ABI types are
    32-byte slots."""
    from cryo_spark.functions.abi import decode_logs

    return decode_logs(transform_logs(spark, fixtures_dir), TRANSFER_EVENT_SIG)


def oracle_logs_decoded(fixtures_dir: str) -> str:
    keep = [c for c in LOG_COLS if c not in ("topic1", "topic2", "topic3", "data")]
    exprs = {"n_data_bytes": "octet_length(data)::INTEGER AS n_data_bytes"}
    select = ", ".join(exprs.get(c, c) for c in keep)
    return f"""
SELECT {select},
  {blob_slice_sql('topic1', 13, 20)} AS event__from,
  {blob_slice_sql('topic2', 13, 20)} AS event__to,
  {blob_slice_sql('data', 1, 32)} AS event__value_binary,
  CAST({be_uint_sql('data')} AS VARCHAR) AS event__value_string,
  CAST(CAST({be_uint_sql('data')} AS VARCHAR) AS DOUBLE) AS event__value_f64
FROM {fixture_rel(fixtures_dir, 'fixture_logs')}
WHERE hex(topic0) = upper('{TRANSFER_SIG_HEX}')
"""


TRANSFORMS = {
    "logs": transform_logs,
    "logs_decoded": transform_logs_decoded,
    "erc20_transfers": transform_erc20_transfers,
    "erc20_approvals": transform_erc20_approvals,
    "erc721_transfers": transform_erc721_transfers,
}
ORACLES = {
    "logs": oracle_logs,
    "logs_decoded": oracle_logs_decoded,
    "erc20_transfers": oracle_erc20_transfers,
    "erc20_approvals": oracle_erc20_approvals,
    "erc721_transfers": oracle_erc721_transfers,
}
