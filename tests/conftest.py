from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clinical_api_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def warehouse(spark, tmp_path):
    from clinical_api_etl_spark.sources.sinks import ParquetWarehouse

    return ParquetWarehouse(spark, str(tmp_path / "wh"))
