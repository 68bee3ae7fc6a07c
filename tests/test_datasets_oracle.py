"""Differential check: every dataset transform vs its DuckDB oracle
on the chain fixtures (the same mechanism as the driver's t2 gate)."""

from __future__ import annotations

import pytest

from cryo_spark.datasets import ORACLES, TRANSFORMS
from cryo_spark.testing import compare

# keccak columns are non-SQL-expressible; dropped before comparison
DROP_FOR_ORACLE = {
    "contracts": ["init_code_hash", "code_hash"],
    "eth_calls": ["call_data_hash", "output_data_hash"],
}


@pytest.mark.parametrize("name", sorted(TRANSFORMS))
def test_dataset_matches_oracle(spark, fixtures_dir, name):
    df = TRANSFORMS[name](spark, fixtures_dir)
    for c in DROP_FOR_ORACLE.get(name, []):
        df = df.drop(c)
    result = compare(df, ORACLES[name](fixtures_dir), name)
    assert result["match"], f"{name}: {result['detail']} ({result['rows_spark']} vs {result['rows_oracle']} rows)"
