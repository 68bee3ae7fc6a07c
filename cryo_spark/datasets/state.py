"""state-diff / state-read dataset family.

Reference: /root/reference/crates/freeze/src/datasets/
{balance,code,nonce,storage}_diffs.rs and *_reads.rs (explode of
trace_replayBlockTransactions / prestate-tracer maps). The landed raw
form is already exploded per (block, tx, address[, slot]); each
dataset is a kind-filter + per-kind value typing:
balance → u256 (decimal carrier), nonce → u64, code/storage → binary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.functions import be_uint, be_uint_expr
from cryo_spark.operators.util import bt as _bt
from cryo_spark.oracle import be_uint_sql, fixture_rel
from cryo_spark.schemas import get_spec
from cryo_spark.sources import raw

# balance values KEEP the canonical 32-byte word (u256 carrier —
# exact for any on-chain magnitude; representation columns derive at
# output via schema_select.u256_view_cols). Only u64-typed values
# (nonces) decode to integers here.
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


def make_diff_transform(kind: str):
    how = _VALUE_KINDS[kind]

    def transform(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
        df = raw(spark, "state_diffs", fixtures_dir).filter(F.col("kind") == kind)
        cols = get_spec(f"{kind}_diffs").column_names()
        # whole projection as selectExpr strings (1 py4j round trip):
        # the per-column F.col/be_uint chain paid ~70 round trips per
        # part x 4 parts per merged-entry construction (round 17)
        exprs = {
            "from_value": f"{_convert_expr('from_value', how)} AS from_value",
            "to_value": f"{_convert_expr('to_value', how)} AS to_value",
        }
        return df.selectExpr(*[exprs.get(c, _bt(c)) for c in cols])

    return transform


def make_diff_oracle(kind: str):
    how = _VALUE_KINDS[kind]

    def oracle(fixtures_dir: str) -> str:
        cols = get_spec(f"{kind}_diffs").column_names()
        exprs = {
            "from_value": f"{_convert_sql('from_value', how)} AS from_value",
            "to_value": f"{_convert_sql('to_value', how)} AS to_value",
        }
        select = ", ".join(exprs.get(c, c) for c in cols)
        return (
            f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_state_diffs')} "
            f"WHERE kind = '{kind}'"
        )

    return oracle


def make_read_transform(kind: str):
    how = _VALUE_KINDS[kind]

    def transform(spark: SparkSession, fixtures_dir: str | None = None) -> DataFrame:
        df = raw(spark, "state_reads", fixtures_dir).filter(F.col("kind") == kind)
        cols = get_spec(f"{kind}_reads").column_names()
        exprs = {"value": _convert("value", how).alias("value")}
        return df.select(*[exprs.get(c, F.col(c)) for c in cols])

    return transform


def make_read_oracle(kind: str):
    how = _VALUE_KINDS[kind]

    def oracle(fixtures_dir: str) -> str:
        cols = get_spec(f"{kind}_reads").column_names()
        exprs = {"value": f"{_convert_sql('value', how)} AS value"}
        select = ", ".join(exprs.get(c, c) for c in cols)
        return (
            f"SELECT {select} FROM {fixture_rel(fixtures_dir, 'fixture_state_reads')} "
            f"WHERE kind = '{kind}'"
        )

    return oracle


TRANSFORMS = {}
ORACLES = {}
for _kind in _VALUE_KINDS:
    TRANSFORMS[f"{_kind}_diffs"] = make_diff_transform(_kind)
    ORACLES[f"{_kind}_diffs"] = make_diff_oracle(_kind)
    TRANSFORMS[f"{_kind}_reads"] = make_read_transform(_kind)
    ORACLES[f"{_kind}_reads"] = make_read_oracle(_kind)
