from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fhir_to_lakehouse_spark.session import get_spark  # noqa: E402

# Single source of truth for the test dataset — every test module must
# take the `sf_dir` fixture (or read this constant) instead of
# hardcoding the path, so redirecting the env var redirects the whole
# suite consistently.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
