from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from bob_vector_db_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # local[8] + no Python-worker reuse: the 9-file suite runs dozens of
    # pandas UDFs through one long-lived session; reused workers eventually
    # hit a py4j socket error on this container (flaked once per ~10 runs).
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        cpus=8,
        extra_conf={"spark.python.worker.reuse": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
