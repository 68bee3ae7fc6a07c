"""Dataset transform registry.

Each dataset from the reference catalog (SURVEY §2.11) maps to a pair
``(transform, oracle)``: a Spark DataFrame function over the landed
raw tables, and the equivalent DuckDB SQL used as the correctness
oracle. ``TRANSFORMS[name](spark, fixtures_dir)`` returns the dataset
in declared schema order; ``ORACLES[name](fixtures_dir)`` returns the
SQL string.
"""

from __future__ import annotations

from cryo_spark.datasets import accounts, blocks, geth, logs, state, traces, transactions

TRANSFORMS = {}
ORACLES = {}
for _m in (blocks, transactions, logs, traces, state, accounts, geth):
    TRANSFORMS.update(_m.TRANSFORMS)
    ORACLES.update(_m.ORACLES)

__all__ = ["TRANSFORMS", "ORACLES"]
