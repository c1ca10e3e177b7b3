from __future__ import annotations

import os

import pytest

DATA_DIR = os.environ.get("V2OCR_DATA_DIR", "/root/repo/data")


@pytest.fixture(scope="session")
def spark():
    from v2_ocr_spark.session import get_spark

    # small core count for tests: startup speed over throughput
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return os.path.join(DATA_DIR, "sf0.001")


@pytest.fixture(scope="session")
def sf_mid() -> str:
    return os.path.join(DATA_DIR, "sf0.01")
