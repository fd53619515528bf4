from __future__ import annotations

import os

import pytest

from whisky_wine_etl_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_CPUS exists for parallelism-perturbation sweeps
    # (e.g. the r10 salting-stability receipt reruns the suite under
    # local[2]..local[32]); the default stays the pinned 8 threads.
    n = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark(app_name="tests", cpus=n, shuffle_partitions=n)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL
