from __future__ import annotations

import pytest

from cryo_spark import get_spark
from cryo_spark.fixtures import default_fixtures_dir, generate


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # hermetic metastore/warehouse: saveAsTable tests must never
    # collide with a stale ./spark-warehouse left by a prior session
    wh = tmp_path_factory.mktemp("spark-warehouse")
    return get_spark(
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )


@pytest.fixture(scope="session")
def fixtures_dir() -> str:
    return generate(default_fixtures_dir())


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
