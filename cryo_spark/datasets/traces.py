"""trace-family datasets: traces, contracts, native_transfers,
four_byte_counts, address_appearances.

Reference: /root/reference/crates/freeze/src/datasets/{traces.rs,
contracts.rs,native_transfers.rs,four_byte_counts.rs,
address_appearances.rs}.

Spark-first notes:
- the reference scans each block's trace list imperatively; the
  running state it carries (deployer of the enclosing tx —
  contracts.rs:75-85; trace ordinal — native_transfers.rs:70-76)
  becomes window functions over (block, tx, depth-first trace order).
- trace order is depth-first by trace_address; functions.trace_sort_key
  zero-pads path components so plain string order == numeric order.
- contracts.rs:100-103 stores init_code_hash=keccak(result.code) and
  code_hash=keccak(create.init) — hashes swapped, a reference bug we
  fix (init_code_hash = keccak(init_code), code_hash = keccak(code)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cryo_spark.functions import keccak256_udf, trace_sort_key
from cryo_spark.oracle import be_uint_sql, fixture_rel, trace_sort_key_sql
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw

TRACE_COLS = get_spec("traces").column_names()
ZERO20 = bytes(20)


def transform_traces(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    df = raw(spark, "traces", fixtures_dir)
    exprs = {
        "action_gas": F.col("action_gas").cast("int"),
        "result_gas_used": F.col("result_gas_used").cast("int"),
        "subtraces": F.col("subtraces").cast("int"),
    }
    return df.select(*[exprs.get(c, F.col(c)).alias(c) for c in TRACE_COLS])


def oracle_traces(fixtures_dir: str) -> str:
    exprs = {
        "action_gas": "action_gas::INTEGER",
        "result_gas_used": "result_gas_used::INTEGER",
        "subtraces": "subtraces::INTEGER",
    }
    select = ", ".join(f"{exprs.get(c, c)} AS {c}" for c in TRACE_COLS)
    return f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_traces')}"


# ----------------------------- contracts ---------------------------------

def transform_contracts(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    traces = raw(spark, "traces", fixtures_dir)
    creates = traces.filter(
        (F.col("action_type") == "create") & F.col("result_address").isNotNull()
    )
    # deployer = action_from of the enclosing tx's root trace
    # (contracts.rs:75-85 carries it while scanning; here a broadcast-
    # sized join keyed on (block_number, transaction_index))
    roots = traces.filter(
        (F.col("trace_address") == "") & F.col("transaction_index").isNotNull()
    ).select(
        "block_number", "transaction_index", F.col("action_from").alias("deployer")
    )
    w = Window.partitionBy("block_number").orderBy(
        F.col("transaction_index"), trace_sort_key()
    )
    df = creates.join(roots, ["block_number", "transaction_index"], "left").withColumn(
        "create_index", (F.row_number().over(w) - 1).cast("int")
    )
    cols = get_spec("contracts").column_names()
    exprs = {
        "contract_address": F.col("result_address").alias("contract_address"),
        "factory": F.col("action_from").alias("factory"),
        "init_code": F.col("action_init").alias("init_code"),
        "code": F.col("result_code").alias("code"),
        "init_code_hash": keccak256_udf(F.col("action_init")).alias("init_code_hash"),
        "code_hash": keccak256_udf(F.col("result_code")).alias("code_hash"),
        "n_init_code_bytes": F.length("action_init").cast("int").alias("n_init_code_bytes"),
        "n_code_bytes": F.length("result_code").cast("int").alias("n_code_bytes"),
    }
    return df.select(*[exprs.get(c, F.col(c)) for c in cols])


def oracle_contracts(fixtures_dir: str) -> str:
    """Oracle covers the SQL-expressible columns (keccak hashes are
    checked in unit tests instead — DuckDB has no keccak)."""
    cols = [c for c in get_spec("contracts").column_names()
            if c not in ("init_code_hash", "code_hash")]
    exprs = {
        "contract_address": "t.result_address AS contract_address",
        "factory": "t.action_from AS factory",
        "init_code": "t.action_init AS init_code",
        "code": "t.result_code AS code",
        "n_init_code_bytes": "octet_length(t.action_init)::INTEGER AS n_init_code_bytes",
        "n_code_bytes": "octet_length(t.result_code)::INTEGER AS n_code_bytes",
        "create_index": (
            "(row_number() OVER (PARTITION BY t.block_number ORDER BY "
            f"t.transaction_index, {trace_sort_key_sql('t.trace_address')}) - 1)::INTEGER "
            "AS create_index"
        ),
        "deployer": "r.action_from AS deployer",
    }
    select = ", ".join(exprs.get(c, "t." + c) for c in cols)
    fx = fixture_rel(fixtures_dir, "fixture_traces")
    return (
        f"SELECT {select} FROM {fx} t LEFT JOIN {fx} r ON "
        "r.block_number = t.block_number AND r.transaction_index = t.transaction_index "
        "AND r.trace_address = '' "
        "WHERE t.action_type = 'create' AND t.result_address IS NOT NULL"
    )


# -------------------------- native_transfers -----------------------------

def transform_native_transfers(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """One row per trace (native_transfers.rs:70-103): every action
    moves (possibly zero) value. transfer_index = trace ordinal within
    the block (tx traces in execution order, then reward traces).

    Deviation from reference: a failed create stores a 20-byte zero
    address as to_address (the reference stores 32 zero bytes —
    native_transfers.rs:92 — which breaks the address width contract).
    """
    df = raw(spark, "traces", fixtures_dir)
    w = Window.partitionBy("block_number").orderBy(
        F.col("transaction_index").asc_nulls_last(), trace_sort_key()
    )
    from_addr = F.when(F.col("action_type") == "reward", F.lit(ZERO20)).otherwise(
        F.col("action_from")
    )
    to_addr = (
        F.when(F.col("action_type") == "create",
               F.coalesce(F.col("result_address"), F.lit(ZERO20)))
        .otherwise(F.col("action_to"))
    )
    cols = get_spec("native_transfers").column_names()
    exprs = {
        "transfer_index": (F.row_number().over(w) - 1).cast("int").alias("transfer_index"),
        "from_address": from_addr.alias("from_address"),
        "to_address": to_addr.alias("to_address"),
        "value": F.col("action_value").alias("value"),
    }
    return df.select(*[exprs.get(c, F.col(c)) for c in cols])


def oracle_native_transfers(fixtures_dir: str) -> str:
    cols = get_spec("native_transfers").column_names()
    zero20 = "'\\x" + "\\x".join(["00"] * 20) + "'::BLOB"
    exprs = {
        "transfer_index": (
            "(row_number() OVER (PARTITION BY block_number ORDER BY "
            f"transaction_index NULLS LAST, {trace_sort_key_sql('trace_address')}) - 1)::INTEGER "
            "AS transfer_index"
        ),
        "from_address": (
            f"CASE WHEN action_type = 'reward' THEN {zero20} ELSE action_from END "
            "AS from_address"
        ),
        "to_address": (
            f"CASE WHEN action_type = 'create' THEN coalesce(result_address, {zero20}) "
            "ELSE action_to END AS to_address"
        ),
        "value": "action_value AS value",
    }
    select = ", ".join(exprs.get(c, c) for c in cols)
    return f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_traces')}"


# -------------------------- four_byte_counts -----------------------------

def transform_four_byte_counts(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """Per-(block, tx) selector counts (four_byte_counts.rs:29-103;
    the node's 4byteTracer key is selector + calldata size). Derived
    here from call traces: a partial-aggregating groupBy — map-side
    combine keeps the shuffle tiny at scale."""
    df = raw(spark, "traces", fixtures_dir)
    calls = df.filter(
        (F.col("action_type") == "call") & (F.length("action_input") >= 4)
    )
    return (
        calls.groupBy(
            "block_number",
            "transaction_hash",
            F.substring("action_input", 1, 4).alias("signature"),
            (F.length("action_input") - 4).cast("long").alias("size"),
        )
        .agg(F.count("*").alias("count"))
        .withColumn("chain_id", F.lit(1).cast("long"))
        .select(*get_spec("four_byte_counts").column_names())
    )


def oracle_four_byte_counts(fixtures_dir: str) -> str:
    from cryo_spark.oracle import blob_slice_sql

    return (
        "SELECT block_number, transaction_hash, "
        f"{blob_slice_sql('action_input', 1, 4)} AS signature, "
        "(octet_length(action_input) - 4)::BIGINT AS size, "
        "count(*) AS count, 1::BIGINT AS chain_id "
        f"FROM {fixture_rel(fixtures_dir, 'fixture_traces')} "
        "WHERE action_type = 'call' AND octet_length(action_input) >= 4 "
        "GROUP BY 1, 2, 3, 4"
    )


# ------------------------- address_appearances ---------------------------

def transform_address_appearances(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """Union of every address occurrence with a relationship label
    (address_appearances.rs; labels mirror the reference's:
    tx_from/tx_to/call_from/call_to/factory/create/suicide/
    suicide_refund/author/erc20_transfer_*/erc721_transfer_*).
    Spark shape: per-source projections + unionByName — no shuffle
    until the final sort."""
    traces = raw(spark, "traces", fixtures_dir)
    logs = raw(spark, "logs", fixtures_dir)
    blocks = raw(spark, "blocks", fixtures_dir)

    def part(df: DataFrame, addr, rel: str) -> DataFrame:
        return df.select(
            F.col("block_number"),
            F.col("transaction_index").cast("int").alias("transaction_index"),
            F.col("transaction_hash"),
            addr.alias("address"),
            F.lit(rel).alias("relationship"),
            F.col("chain_id"),
        ).filter(F.col("address").isNotNull())

    root = traces.filter(F.col("trace_address") == "")
    sub = traces.filter(F.col("trace_address") != "")
    calls_sub = sub.filter(F.col("action_type") == "call")
    creates = traces.filter(F.col("action_type") == "create")
    suicides = traces.filter(F.col("action_type") == "suicide")
    erc20ish = logs.filter(
        F.col("topic0").isin(
            [bytes.fromhex(h) for h in (
                "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef",
            )]
        )
        & F.col("topic1").isNotNull() & F.col("topic2").isNotNull()
    )
    blocks_part = blocks.select(
        F.col("block_number"),
        F.lit(None).cast("int").alias("transaction_index"),
        F.lit(None).cast("binary").alias("transaction_hash"),
        F.col("author").alias("address"),
        F.lit("author").alias("relationship"),
        F.col("chain_id"),
    )
    parts = [
        part(root.filter(F.col("action_type") != "reward"), F.col("action_from"), "tx_from"),
        part(root.filter(F.col("action_type") == "call"), F.col("action_to"), "tx_to"),
        part(calls_sub, F.col("action_from"), "call_from"),
        part(calls_sub, F.col("action_to"), "call_to"),
        part(creates, F.col("action_from"), "factory"),
        part(creates, F.col("result_address"), "create"),
        part(suicides, F.col("action_from"), "suicide"),
        part(suicides, F.col("action_to"), "suicide_refund"),
        part(erc20ish, F.substring("topic1", 13, 20), "erc20_transfer_from"),
        part(erc20ish, F.substring("topic2", 13, 20), "erc20_transfer_to"),
        blocks_part,
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def oracle_address_appearances(fixtures_dir: str) -> str:
    from cryo_spark.oracle import blob_slice_sql

    tr = fixture_rel(fixtures_dir, "fixture_traces")
    lg = fixture_rel(fixtures_dir, "fixture_logs")
    bl = fixture_rel(fixtures_dir, "fixture_blocks")
    sig = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"

    def sel(addr: str, rel: str, src: str, where: str) -> str:
        return (
            f"SELECT block_number, transaction_index::INTEGER AS transaction_index, "
            f"transaction_hash, {addr} AS address, '{rel}' AS relationship, chain_id "
            f"FROM {src} WHERE ({where}) AND {addr} IS NOT NULL"
        )

    erc20_where = (
        f"hex(topic0) = upper('{sig}') AND topic1 IS NOT NULL AND topic2 IS NOT NULL"
    )
    parts = [
        sel("action_from", "tx_from", tr, "trace_address = '' AND action_type != 'reward'"),
        sel("action_to", "tx_to", tr, "trace_address = '' AND action_type = 'call'"),
        sel("action_from", "call_from", tr, "trace_address != '' AND action_type = 'call'"),
        sel("action_to", "call_to", tr, "trace_address != '' AND action_type = 'call'"),
        sel("action_from", "factory", tr, "action_type = 'create'"),
        sel("result_address", "create", tr, "action_type = 'create'"),
        sel("action_from", "suicide", tr, "action_type = 'suicide'"),
        sel("action_to", "suicide_refund", tr, "action_type = 'suicide'"),
        sel(blob_slice_sql("topic1", 13, 20), "erc20_transfer_from", lg, erc20_where),
        sel(blob_slice_sql("topic2", 13, 20), "erc20_transfer_to", lg, erc20_where),
        (
            "SELECT block_number, NULL::INTEGER AS transaction_index, "
            "NULL::BLOB AS transaction_hash, author AS address, "
            f"'author' AS relationship, chain_id FROM {bl} WHERE author IS NOT NULL"
        ),
    ]
    return " UNION ALL ".join(parts)


TRANSFORMS = {
    "traces": transform_traces,
    "contracts": transform_contracts,
    "native_transfers": transform_native_transfers,
    "four_byte_counts": transform_four_byte_counts,
    "address_appearances": transform_address_appearances,
}
ORACLES = {
    "traces": oracle_traces,
    "contracts": oracle_contracts,
    "native_transfers": oracle_native_transfers,
    "four_byte_counts": oracle_four_byte_counts,
    "address_appearances": oracle_address_appearances,
}
