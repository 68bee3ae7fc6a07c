"""point-lookup dataset family: balances, nonces, codes, slots,
eth_calls, erc20_metadata, erc20_supplies, erc20_balances.

Reference: /root/reference/crates/freeze/src/datasets/{balances.rs,
nonces.rs,codes.rs,slots.rs,eth_calls.rs,erc20_metadata.rs,
erc20_supplies.rs,erc20_balances.rs}. Online these are per-(block,
address[,slot|calldata]) RPC point lookups over the partition cross
product (C4); offline they are projections of the landed answer
tables. ABI decoding of call outputs (strings / uints) is JVM-side
binary slicing — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.functions import be_uint, keccak256_udf
from cryo_spark.oracle import (
    be_uint_sql,
    blob_slice_dyn_sql,
    blob_slice_sql,
    fixture_rel,
)
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw

SELECTORS = {
    "name": "06fdde03",
    "symbol": "95d89b41",
    "decimals": "313ce567",
    "total_supply": "18160ddd",
    "balance_of": "70a08231",
}


def transform_balances(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return raw(spark, "accounts", fixtures_dir).select(
        "block_number", "address", F.col("balance"), "chain_id"
    )


def oracle_balances(fixtures_dir: str) -> str:
    return (
        "SELECT block_number, address, balance, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_accounts')}"
    )


def transform_nonces(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return raw(spark, "accounts", fixtures_dir).select(
        "block_number", "address", F.col("nonce"), "chain_id"
    )


def oracle_nonces(fixtures_dir: str) -> str:
    return (
        "SELECT block_number, address, nonce, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_accounts')}"
    )


def transform_codes(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return raw(spark, "accounts", fixtures_dir).select(
        "block_number", "address", "code",
        F.length("code").cast("int").alias("n_code_bytes"), "chain_id",
    )


def oracle_codes(fixtures_dir: str) -> str:
    return (
        "SELECT block_number, address, code, "
        "octet_length(code)::INTEGER AS n_code_bytes, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_accounts')}"
    )


def transform_slots(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return raw(spark, "storage", fixtures_dir).select(
        "block_number", "address", "slot", "value", "chain_id"
    )


def oracle_slots(fixtures_dir: str) -> str:
    return (
        "SELECT block_number, address, slot, value, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_storage')}"
    )


def transform_eth_calls(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """eth_calls.rs:79-81 hashes call_data and output_data with
    keccak256 (pandas UDF — the only Python in this family)."""
    df = raw(spark, "calls", fixtures_dir)
    return df.select(
        "block_number",
        F.col("contract").alias("contract_address"),
        "call_data",
        keccak256_udf(F.col("call_data")).alias("call_data_hash"),
        F.col("output").alias("output_data"),
        keccak256_udf(F.col("output")).alias("output_data_hash"),
        "chain_id",
    )


def oracle_eth_calls(fixtures_dir: str) -> str:
    """Keccak columns excluded (unit-tested instead; DuckDB has no
    keccak)."""
    return (
        "SELECT block_number, contract AS contract_address, call_data, "
        "output AS output_data, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_calls')}"
    )


def _calls_for(spark: SparkSession, fixtures_dir: str | None, selector_hex: str) -> DataFrame:
    df = raw(spark, "calls", fixtures_dir)
    return df.filter(F.hex(F.substring("call_data", 1, 4)) == selector_hex.upper())


def _abi_string(col: str):
    """ABI-encoded dynamic string → utf8: 32-byte offset, 32-byte
    length, payload."""
    length = be_uint(F.substring(F.col(col), 33, 32)).cast("int")
    return F.expr(
        f"decode(substring({col}, 65, cast(conv(hex(substring({col}, 33, 32)), 16, 10) as int)), 'UTF-8')"
    )


def _abi_string_sql(expr: str) -> str:
    length = f"CAST({be_uint_sql(blob_slice_sql(expr, 33, 32))} AS INTEGER)"
    return f"decode({blob_slice_dyn_sql(expr, '65', length)})"


def transform_erc20_metadata(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """name()/symbol()/decimals() answers pivoted to one row per
    (block, erc20) (erc20_metadata.rs:29-93). The three selector
    streams join on (block, contract); each side is tiny after the
    selector filter, so AQE broadcasts."""
    names = _calls_for(spark, fixtures_dir, SELECTORS["name"]).select(
        "block_number", F.col("contract").alias("erc20"),
        _abi_string("output").alias("name"), "chain_id",
    )
    symbols = _calls_for(spark, fixtures_dir, SELECTORS["symbol"]).select(
        "block_number", F.col("contract").alias("erc20"),
        _abi_string("output").alias("symbol"),
    )
    decimals = _calls_for(spark, fixtures_dir, SELECTORS["decimals"]).select(
        "block_number", F.col("contract").alias("erc20"),
        be_uint("output").cast("int").alias("decimals"),
    )
    return (
        names.join(symbols, ["block_number", "erc20"], "left")
        .join(decimals, ["block_number", "erc20"], "left")
        .select("block_number", "erc20", "name", "symbol", "decimals", "chain_id")
    )


def oracle_erc20_metadata(fixtures_dir: str) -> str:
    fx = fixture_rel(fixtures_dir, "fixture_calls")

    def side(sel: str, out_expr: str, alias: str) -> str:
        return (
            f"SELECT block_number, contract AS erc20, {out_expr} AS {alias}, chain_id "
            f"FROM {fx} WHERE hex({blob_slice_sql('call_data', 1, 4)}) = upper('{SELECTORS[sel]}')"
        )

    return (
        "SELECT n.block_number, n.erc20, n.name, s.symbol, d.decimals, n.chain_id FROM "
        f"({side('name', _abi_string_sql('output'), 'name')}) n "
        f"LEFT JOIN ({side('symbol', _abi_string_sql('output'), 'symbol')}) s "
        "ON n.block_number = s.block_number AND n.erc20 = s.erc20 "
        f"LEFT JOIN ({side('decimals', 'CAST(' + be_uint_sql('output') + ' AS INTEGER)', 'decimals')}) d "
        "ON n.block_number = d.block_number AND n.erc20 = d.erc20"
    )


def transform_erc20_supplies(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return _calls_for(spark, fixtures_dir, SELECTORS["total_supply"]).select(
        "block_number", F.col("contract").alias("erc20"),
        # the 32-byte return word is the exact u256 carrier
        F.col("output").alias("total_supply"), "chain_id",
    )


def oracle_erc20_supplies(fixtures_dir: str) -> str:
    return (
        "SELECT block_number, contract AS erc20, "
        "output AS total_supply, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_calls')} "
        f"WHERE hex({blob_slice_sql('call_data', 1, 4)}) = upper('{SELECTORS['total_supply']}')"
    )


def transform_erc20_balances(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return _calls_for(spark, fixtures_dir, SELECTORS["balance_of"]).select(
        "block_number", F.col("contract").alias("erc20"),
        F.substring("call_data", 17, 20).alias("address"),
        F.col("output").alias("balance"), "chain_id",
    )


def oracle_erc20_balances(fixtures_dir: str) -> str:
    return (
        "SELECT block_number, contract AS erc20, "
        f"{blob_slice_sql('call_data', 17, 20)} AS address, "
        "output AS balance, chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_calls')} "
        f"WHERE hex({blob_slice_sql('call_data', 1, 4)}) = upper('{SELECTORS['balance_of']}')"
    )


def transform_erc721_metadata(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """name()/symbol() answers pivoted per (block, erc721)
    (erc721_metadata.rs:9-16; same call surface as erc20_metadata
    minus decimals)."""
    names = _calls_for(spark, fixtures_dir, SELECTORS["name"]).select(
        "block_number", F.col("contract").alias("erc721"),
        _abi_string("output").alias("name"), "chain_id",
    )
    symbols = _calls_for(spark, fixtures_dir, SELECTORS["symbol"]).select(
        "block_number", F.col("contract").alias("erc721"),
        _abi_string("output").alias("symbol"),
    )
    return (
        names.join(symbols, ["block_number", "erc721"], "left")
        .select("block_number", "erc721", "name", "symbol", "chain_id")
    )


def oracle_erc721_metadata(fixtures_dir: str) -> str:
    fx = fixture_rel(fixtures_dir, "fixture_calls")

    def side(sel: str, alias: str) -> str:
        return (
            f"SELECT block_number, contract AS erc721, "
            f"{_abi_string_sql('output')} AS {alias}, chain_id "
            f"FROM {fx} WHERE hex({blob_slice_sql('call_data', 1, 4)}) = upper('{SELECTORS[sel]}')"
        )

    return (
        "SELECT n.block_number, n.erc721, n.name, s.symbol, n.chain_id FROM "
        f"({side('name', 'name')}) n "
        f"LEFT JOIN ({side('symbol', 'symbol')}) s "
        "ON n.block_number = s.block_number AND n.erc721 = s.erc721"
    )


TRANSFORMS = {
    "balances": transform_balances,
    "nonces": transform_nonces,
    "codes": transform_codes,
    "slots": transform_slots,
    "eth_calls": transform_eth_calls,
    "erc20_metadata": transform_erc20_metadata,
    "erc20_supplies": transform_erc20_supplies,
    "erc20_balances": transform_erc20_balances,
    "erc721_metadata": transform_erc721_metadata,
}
ORACLES = {
    "balances": oracle_balances,
    "nonces": oracle_nonces,
    "codes": oracle_codes,
    "slots": oracle_slots,
    "eth_calls": oracle_eth_calls,
    "erc20_metadata": oracle_erc20_metadata,
    "erc20_supplies": oracle_erc20_supplies,
    "erc20_balances": oracle_erc20_balances,
    "erc721_metadata": oracle_erc721_metadata,
}
