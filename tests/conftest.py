from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funcify_feature_eng_spark import get_spark  # noqa: E402
from funcify_feature_eng_spark.datagen import ensure_dataset  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "test")
TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def data_dir():
    return ensure_dataset(DATA_DIR, n_convs=500, seed=42, hot=2000)


@pytest.fixture(scope="session")
def transcripts(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))


@pytest.fixture(scope="session")
def feature_store(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "feature_store.parquet"))


@pytest.fixture(scope="session")
def transcripts_pd(data_dir):
    import pandas as pd

    return pd.read_parquet(os.path.join(data_dir, "transcripts.parquet"))


@pytest.fixture(scope="session")
def feature_store_pd(data_dir):
    import pandas as pd

    return pd.read_parquet(os.path.join(data_dir, "feature_store.parquet"))


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA_SF
