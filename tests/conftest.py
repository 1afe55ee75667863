from __future__ import annotations

import pytest

from medacy_spark.session import get_spark

SF = "/root/testdata/sf0.001"
REF = "/root/reference/medacy/tests/sample_data"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="medacy_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def doc_ids(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").cache()
