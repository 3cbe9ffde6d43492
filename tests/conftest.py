from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docker_aktin_dwh_spark.session import build_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # 16 local cores: the sweep modules submit jobs from 8 threads, so
    # give the scheduler headroom beyond one job's task demand
    s = build_session(app_name="tests", cpus=16, shuffle_partitions=8)
    yield s
    s.stop()
