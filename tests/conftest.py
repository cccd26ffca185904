from __future__ import annotations

import pytest

from diffdataflowmlpipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _restore_shuffle_partitions(request):
    """size_state_partitions (streaming/windows.py) deliberately mutates
    the session's spark.sql.shuffle.partitions to bind a stateful
    query's state layout; restore it after every test so the sizing a
    streaming test triggers cannot leak into unrelated tests."""
    if "spark" not in request.fixturenames:
        yield
        return
    s = request.getfixturevalue("spark")
    saved = s.conf.get("spark.sql.shuffle.partitions")
    yield
    s.conf.set("spark.sql.shuffle.partitions", saved)
