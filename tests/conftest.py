from __future__ import annotations

import os

import pytest

from parquet_to_csv_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# SPARK_GRAFT_COMMIT_BACKEND=conditional-put runs the ENTIRE suite with
# the object-store commit double installed (round 9, verdict item 1):
# every snapshot-store gate must hold without os.link / atomic-mkdir
# atomicity anywhere. Unset -> the default POSIX backend.
if os.environ.get("SPARK_GRAFT_COMMIT_BACKEND") == "conditional-put":
    import parquet_to_csv_spark.sources.layout as _layout

    _layout.set_commit_backend(_layout.ConditionalPutCommitBackend())


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
