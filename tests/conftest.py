from __future__ import annotations

import pytest

from streamroom_bigdata_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8, extra_conf={
        "spark.ui.showConsoleProgress": "false",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
