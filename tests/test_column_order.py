"""Column-order parity: every chain dataset transform emits columns
exactly in declared registry order — the reference's differential
harness compares order and dtypes
(cryo_test/polars_utils.py:119-129)."""

from __future__ import annotations

import pytest

from cryo_spark.datasets import TRANSFORMS
from cryo_spark.schemas import DATASETS


@pytest.mark.parametrize("name", sorted(set(TRANSFORMS) & set(DATASETS)))
def test_transform_columns_match_declared_order(spark, name):
    df = TRANSFORMS[name](spark, None)
    assert df.columns == DATASETS[name].column_names()


def test_every_registered_spec_has_a_transform():
    missing = sorted(set(DATASETS) - set(TRANSFORMS))
    assert missing == [], f"specs without transforms: {missing}"
