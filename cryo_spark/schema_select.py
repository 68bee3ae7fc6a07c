"""Column-selection algebra.

Mirrors ``compute_used_columns`` —
/root/reference/crates/freeze/src/types/schemas.rs:209-237:

- explicit ``columns`` wins (the ``all`` wildcard selects every column),
- otherwise effective = defaults ∪ include − exclude (include=all →
  full set), order-preserving against the declared column order,
- unknown names raise (the reference errors the same way).

Also generates the physical projection for hex encoding and u256
representation expansion (schemas.rs:63-106, creation.rs:27-90).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cryo_spark.schemas import U256, U256_DEFAULT_REPS, U256_SUFFIXES, DatasetSpec


def _pad32(c: Column) -> Column:
    """Left-pad a binary word to the canonical 32 bytes
    (u256s.rs:27-33 to_vec_u8). Pure JVM: lpad over hex (u256 words
    are never wider than 32 bytes, so lpad cannot truncate)."""
    return F.unhex(F.lpad(F.hex(c), 64, "0"))


def compute_used_columns(
    spec: DatasetSpec,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    columns: list[str] | None = None,
) -> list[str]:
    all_cols = spec.column_names()
    known = set(all_cols)

    def check(names: list[str]) -> None:
        unknown = [n for n in names if n != "all" and n not in known]
        if unknown:
            raise ValueError(
                f"unknown columns for {spec.name}: {unknown}; available: {all_cols}"
            )

    if columns is not None:
        check(columns)
        if "all" in columns:
            return list(all_cols)
        return list(columns)  # explicit order preserved
    used = list(spec.default_columns())
    if include:
        check(include)
        if "all" in include:
            used = list(all_cols)
        else:
            used += [c for c in include if c not in used]
            # keep declared order for merged sets
            used = [c for c in all_cols if c in set(used)]
    if exclude:
        check(exclude)
        used = [c for c in used if c not in set(exclude)]
    return used


def hex_col(c: str) -> Column:
    """Binary → 0x-prefixed lowercase hex (reference Hex rendering,
    crates/cli/src/parse/schemas.rs:37-40)."""
    col = F.col(c)
    return F.when(
        col.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("0x"), F.lower(F.hex(col)))).alias(c)


def u256_view_cols(name: str, reps: list[str]) -> list[Column]:
    """Expand a canonical u256 column (32-byte big-endian binary
    carrier) into the requested representation columns (suffix scheme
    schemas.rs:63-106).

    The binary word is the exact carrier end-to-end; every view
    derives from it without precision loss except where the target
    type itself is lossy: _f64/_f32 are floating approximations
    (derived by casting the exact decimal string, so rounding matches
    any engine's correctly-rounded string->double), _u64/_u32 are the
    reference's wrapping truncations, and _d128 is the decimal(38,0)
    view (NULL above 38 digits — the same cap DuckDB/Polars Decimal128
    carries)."""
    from cryo_spark.functions import be_uint, u256_string_udf, wrap_u32, wrap_u64

    out: list[Column] = []
    base = F.col(name)
    exact_str = u256_string_udf(base)
    for rep in reps:
        if rep not in U256_SUFFIXES:
            raise ValueError(f"unknown u256 representation {rep}")
        target = f"{name}{rep}"
        if rep == "_binary":
            out.append(_pad32(base).alias(target))
        elif rep == "_string":
            out.append(exact_str.alias(target))
        elif rep == "_f32":
            out.append(exact_str.cast("float").alias(target))
        elif rep == "_f64":
            out.append(exact_str.cast("double").alias(target))
        elif rep == "_u32":
            out.append(wrap_u32(base).alias(target))
        elif rep == "_u64":
            out.append(wrap_u64(base).alias(target))
        elif rep == "_d128":
            out.append(be_uint(base).alias(target))
    return out


def apply_encoding(
    df: DataFrame,
    spec: DatasetSpec,
    used: list[str],
    hex_encode: bool = False,
    u256_reps: list[str] | None = None,
    extra: list[str] | None = None,
) -> DataFrame:
    """Project ``used`` columns, expanding u256 columns into their
    representation set and optionally hex-encoding binary columns.
    ``extra`` columns (e.g. decoded ``event__*``) pass through after
    the schema columns."""
    reps = u256_reps if u256_reps is not None else list(U256_DEFAULT_REPS)
    by_name = {c.name: c for c in spec.columns}
    cols: list[Column] = []
    for name in used:
        c = by_name[name]
        if c.ctype == U256:
            cols.extend(u256_view_cols(name, reps))
        else:
            cols.append(F.col(name))
    for name in extra or []:
        cols.append(F.col(name))
    out = df.select(*cols)
    if hex_encode:
        binary_cols = [
            f.name for f in out.schema.fields if f.dataType.simpleString() == "binary"
        ]
        out = out.select(
            *[hex_col(f.name) if f.name in binary_cols else F.col(f.name)
              for f in out.schema.fields]
        )
    return out
