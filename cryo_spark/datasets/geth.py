"""geth-tracer dataset family + simulated-call datasets.

Reference: /root/reference/crates/freeze/src/datasets/{geth_calls.rs,
geth_balance_diffs.rs,geth_code_diffs.rs,geth_nonce_diffs.rs,
geth_storage_diffs.rs,geth_opcodes.rs,javascript_traces.rs,
vm_traces.rs,trace_calls.rs} and
multi_datasets/geth_state_diffs.rs (shared pre/post explode).

Offline raw forms:
- geth_calls derives from the landed parity trace tree (the geth
  callTracer observes the same call frames as trace_block; only the
  rendering differs) — a scan-sharing win: one raw table serves
  traces, native_transfers, contracts AND geth_calls.
- geth_*_diffs read the same landed diff rows as the parity family
  (multi_datasets/geth_state_diffs.rs yields per-account from/to maps
  identical in content to trace_replay StateDiff).
- geth_opcodes + vm_traces project one raw per-opcode step table
  (two tracers over the same execution steps).
- javascript_traces / trace_calls land their own response tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.functions import be_uint, be_uint_expr
from cryo_spark.operators.util import bt as _bt
from cryo_spark.oracle import be_uint_sql, fixture_rel
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw


def _ordered(df: DataFrame, name: str) -> DataFrame:
    return df.select(*get_spec(name).column_names())


# --------------------------------------------------------------------------
# geth_calls — call frames from the callTracer (geth_calls.rs:8-24)
# --------------------------------------------------------------------------

def transform_geth_calls(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    """callTracer frames re-expressed over the parity trace tree:
    CREATE frames report the deployed address as `to`, reward traces
    don't exist in geth output."""
    typ = (
        F.when(F.col("action_type") == "create", F.lit("CREATE"))
        .when(F.col("action_type") == "suicide", F.lit("SELFDESTRUCT"))
        .otherwise(F.upper(F.coalesce(F.col("action_call_type"), F.lit("call"))))
    )
    t = raw(spark, "traces", fixtures_dir).filter(F.col("action_type") != "reward")
    df = t.select(
        typ.alias("typ"),
        F.col("action_from").alias("from_address"),
        F.when(F.col("action_type") == "create", F.col("result_address"))
        .otherwise(F.col("action_to"))
        .alias("to_address"),
        F.col("action_value").alias("value"),
        F.col("action_gas").cast("long").alias("gas"),
        F.col("result_gas_used").cast("long").alias("gas_used"),
        F.coalesce(F.col("action_input"), F.col("action_init"), F.lit(b"")).alias("input"),
        F.coalesce(F.col("result_output"), F.col("result_code")).alias("output"),
        "error", "block_number", "transaction_hash", "transaction_index",
        "trace_address", "chain_id",
    )
    return _ordered(df, "geth_calls")


def oracle_geth_calls(fixtures_dir: str) -> str:
    return f"""
SELECT
  CASE WHEN action_type = 'create' THEN 'CREATE'
       WHEN action_type = 'suicide' THEN 'SELFDESTRUCT'
       ELSE upper(coalesce(action_call_type, 'call')) END AS typ,
  action_from AS from_address,
  CASE WHEN action_type = 'create' THEN result_address ELSE action_to END AS to_address,
  action_value AS value,
  CAST(action_gas AS BIGINT) AS gas,
  CAST(result_gas_used AS BIGINT) AS gas_used,
  coalesce(action_input, action_init, ''::BLOB) AS input,
  coalesce(result_output, result_code) AS output,
  error, block_number, transaction_hash, transaction_index, trace_address, chain_id
FROM {fixture_rel(fixtures_dir, 'fixture_traces')}
WHERE action_type != 'reward'
"""


# --------------------------------------------------------------------------
# geth_*_diffs — prestate+diff tracer explode (geth_state_diffs.rs:104+)
# --------------------------------------------------------------------------

# balance keeps the 32-byte u256 word (exact carrier); only u64
# values (nonces) decode to integers here
_VALUE_KINDS = {"balance": "u256", "nonce": "u64", "code": "bin", "storage": "bin"}


def _convert(colname: str, how: str):
    c = F.col(colname)
    if how == "u64":
        return be_uint(c).cast("long")
    return c


def _convert_expr(colname: str, how: str) -> str:
    if how == "u64":
        return f"CAST({be_uint_expr(_bt(colname))} AS BIGINT)"
    return _bt(colname)


def _convert_sql(expr: str, how: str) -> str:
    if how == "u64":
        return f"CAST({be_uint_sql(expr)} AS BIGINT)"
    return expr


def make_geth_diff_transform(kind: str):
    how = _VALUE_KINDS[kind]

    def transform(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
        df = raw(spark, "state_diffs", fixtures_dir).filter(F.col("kind") == kind)
        # selectExpr strings: see datasets/state.py (same ~70-round-
        # trip-per-part fold, round 17)
        exprs = {
            "transaction_index":
                "CAST(`transaction_index` AS BIGINT) AS transaction_index",
            "from_value": f"{_convert_expr('from_value', how)} AS from_value",
            "to_value": f"{_convert_expr('to_value', how)} AS to_value",
        }
        cols = get_spec(f"geth_{kind}_diffs").column_names()
        return df.selectExpr(*[exprs.get(c, _bt(c)) for c in cols])

    return transform


def make_geth_diff_oracle(kind: str):
    how = _VALUE_KINDS[kind]

    def oracle(fixtures_dir: str) -> str:
        exprs = {
            "transaction_index": "CAST(transaction_index AS BIGINT) AS transaction_index",
            "from_value": f"{_convert_sql('from_value', how)} AS from_value",
            "to_value": f"{_convert_sql('to_value', how)} AS to_value",
        }
        cols = get_spec(f"geth_{kind}_diffs").column_names()
        select = ", ".join(exprs.get(c, c) for c in cols)
        return (
            f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_state_diffs')} "
            f"WHERE kind = '{kind}'"
        )

    return oracle


# --------------------------------------------------------------------------
# geth_opcodes / vm_traces — per-step projections (geth_opcodes.rs:10-28,
# vm_traces.rs:8-23)
# --------------------------------------------------------------------------

def transform_geth_opcodes(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return _ordered(raw(spark, "opcodes", fixtures_dir), "geth_opcodes")


def oracle_geth_opcodes(fixtures_dir: str) -> str:
    cols = ", ".join(get_spec("geth_opcodes").column_names())
    return f"SELECT {cols} FROM {fixture_rel(fixtures_dir, 'fixture_opcodes')}"


def transform_vm_traces(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    df = raw(spark, "opcodes", fixtures_dir).withColumn("cost", F.col("gas_cost"))
    return _ordered(df, "vm_traces")


def oracle_vm_traces(fixtures_dir: str) -> str:
    cols = ", ".join(
        "gas_cost AS cost" if c == "cost" else c
        for c in get_spec("vm_traces").column_names()
    )
    return f"SELECT {cols} FROM {fixture_rel(fixtures_dir, 'fixture_opcodes')}"


# --------------------------------------------------------------------------
# javascript_traces — opaque JSON passthrough (javascript_traces.rs:8-14)
# --------------------------------------------------------------------------

def transform_javascript_traces(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    return _ordered(raw(spark, "js_traces", fixtures_dir), "javascript_traces")


def oracle_javascript_traces(fixtures_dir: str) -> str:
    cols = ", ".join(get_spec("javascript_traces").column_names())
    return f"SELECT {cols} FROM {fixture_rel(fixtures_dir, 'fixture_js_traces')}"


# --------------------------------------------------------------------------
# trace_calls — simulated call traces (trace_calls.rs:9-32); action_value
# is rendered as a decimal string in the reference struct
# --------------------------------------------------------------------------

def transform_trace_calls(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
    from cryo_spark.functions import u256_string_udf

    df = raw(spark, "trace_calls", fixtures_dir).withColumn(
        "action_value", u256_string_udf(F.col("action_value"))
    )
    return _ordered(df, "trace_calls")


def oracle_trace_calls(fixtures_dir: str) -> str:
    cols = ", ".join(
        f"CAST({be_uint_sql('action_value')} AS VARCHAR) AS action_value"
        if c == "action_value" else c
        for c in get_spec("trace_calls").column_names()
    )
    return f"SELECT {cols} FROM {fixture_rel(fixtures_dir, 'fixture_trace_calls')}"


TRANSFORMS = {
    "geth_calls": transform_geth_calls,
    "geth_opcodes": transform_geth_opcodes,
    "vm_traces": transform_vm_traces,
    "javascript_traces": transform_javascript_traces,
    "trace_calls": transform_trace_calls,
}
ORACLES = {
    "geth_calls": oracle_geth_calls,
    "geth_opcodes": oracle_geth_opcodes,
    "vm_traces": oracle_vm_traces,
    "javascript_traces": oracle_javascript_traces,
    "trace_calls": oracle_trace_calls,
}
for _kind in _VALUE_KINDS:
    TRANSFORMS[f"geth_{_kind}_diffs"] = make_geth_diff_transform(_kind)
    ORACLES[f"geth_{_kind}_diffs"] = make_geth_diff_oracle(_kind)
