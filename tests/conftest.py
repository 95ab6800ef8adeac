import os
import shutil
import tempfile

import pytest

from index_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Tests run on fixture-scale data (sf0.001, tens-to-thousands of rows):
    # at local[32] the 32-way task scheduling is pure overhead on 8-partition
    # shuffles — measured 135 s → 102 s on test_mutations.py and 140 s →
    # 103 s on test_round3_property.py by pinning 12 cores (r12; full-suite
    # effect ~25%, the driver-verify-window fix). This pins the TEST
    # session only; bench.py keeps honoring $SPARK_GRAFT_CPUS so the
    # driver's core-scaling measurement is untouched.
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[12]")
    s = get_spark(app_name="index_spark_tests", master=master, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def tmp_base():
    d = tempfile.mkdtemp(prefix="index_spark_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def tmp_base_factory():
    # hypothesis reuses function-scoped fixtures across examples; store
    # tests need a FRESH dir per example, so hand out a factory instead
    dirs = []

    def make():
        d = tempfile.mkdtemp(prefix="index_spark_")
        dirs.append(d)
        return d

    yield make
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
