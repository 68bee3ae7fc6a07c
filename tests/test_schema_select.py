"""Column-selection algebra tests, mirroring the reference's own
schema tests (/root/reference/crates/freeze/src/types/
schemas.rs:239-380: default/include/exclude/explicit/all cases)."""

from __future__ import annotations

import pytest

from cryo_spark.schema_select import compute_used_columns, u256_view_cols
from cryo_spark.schemas import DATASETS, get_spec, resolve_name

BLOCKS = get_spec("blocks")


def test_default_columns():
    used = compute_used_columns(BLOCKS)
    assert used == list(BLOCKS.defaults)


def test_explicit_columns_preserve_given_order():
    used = compute_used_columns(BLOCKS, columns=["gas_used", "block_number"])
    assert used == ["gas_used", "block_number"]


def test_explicit_all_returns_every_column_in_declared_order():
    used = compute_used_columns(BLOCKS, columns=["all"])
    assert used == BLOCKS.column_names()


def test_include_merges_in_declared_order():
    used = compute_used_columns(BLOCKS, include=["size"])
    assert "size" in used
    # merged set keeps the declared column order (schemas.rs:222-228)
    declared = BLOCKS.column_names()
    assert used == [c for c in declared if c in set(used)]


def test_include_all_wildcard():
    used = compute_used_columns(BLOCKS, include=["all"])
    assert used == BLOCKS.column_names()


def test_exclude_removes():
    used = compute_used_columns(BLOCKS, exclude=["gas_used", "extra_data"])
    assert "gas_used" not in used and "extra_data" not in used


def test_include_and_exclude_compose():
    used = compute_used_columns(BLOCKS, include=["size"], exclude=["gas_used"])
    assert "size" in used and "gas_used" not in used


def test_unknown_column_raises():
    with pytest.raises(ValueError, match="unknown columns"):
        compute_used_columns(BLOCKS, columns=["not_a_column"])
    with pytest.raises(ValueError, match="unknown columns"):
        compute_used_columns(BLOCKS, include=["nope"])
    with pytest.raises(ValueError, match="unknown columns"):
        compute_used_columns(BLOCKS, exclude=["nope"])


def test_alias_resolution():
    # scalar.rs:46-73 alias map
    assert resolve_name("txs") == "transactions"
    assert resolve_name("events") == "logs"
    assert resolve_name("storages") == "slots"
    assert resolve_name("4byte_counts") == "four_byte_counts"
    assert resolve_name("js_traces") == "javascript_traces"
    assert resolve_name("opcode_traces") == "vm_traces"
    with pytest.raises(KeyError):
        resolve_name("not_a_dataset")


def test_every_dataset_has_chain_id_and_sort_columns_exist():
    # chain_id auto-injection invariant (to_df/src/lib.rs:237-241) and
    # sort columns must be real columns
    for name, spec in DATASETS.items():
        cols = set(spec.column_names())
        assert "chain_id" in cols, name
        for s in spec.sort:
            assert s in cols, f"{name}: sort column {s} missing"
        for d in spec.defaults:
            assert d in cols, f"{name}: default column {d} missing"


def test_u256_rep_unknown_suffix_raises(spark):
    with pytest.raises(ValueError, match="unknown u256 representation"):
        u256_view_cols("value", ["_nope"])


def test_u256_wrapping_semantics(spark):
    # wrapping_to::<u64>/<u32> (u256s.rs:49-54): low bits, two's
    # complement into Spark's signed carriers. Values beyond 2^128
    # (hash-derived token ids, max-uint approvals) must stay EXACT in
    # the string view — the binary word is the carrier.
    cases = [
        (1 << 70) + 12345,
        (1 << 200) + 7,          # far beyond the old decimal(38,0) cap
        (1 << 256) - 1,          # max uint256 (infinite-approval sentinel)
        0,
    ]
    df = spark.createDataFrame(
        [(v.to_bytes(32, "big"),) for v in cases], "value binary"
    )
    rows = df.select(
        *u256_view_cols("value", ["_string", "_u64", "_u32", "_f64", "_binary"])
    ).collect()
    by_string = {int(r["value_string"]): r for r in rows}
    for big in cases:
        row = by_string[big]
        assert row["value_string"] == str(big)
        assert row["value_u64"] == ((big % (1 << 64)) + (1 << 63)) % (1 << 64) - (1 << 63)
        assert row["value_u32"] == ((big % (1 << 32)) + (1 << 31)) % (1 << 32) - (1 << 31)
        assert row["value_f64"] == pytest.approx(float(big))
        assert row["value_binary"] == big.to_bytes(32, "big")
