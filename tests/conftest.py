from __future__ import annotations

import pytest

from iceberg_ingestion_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
