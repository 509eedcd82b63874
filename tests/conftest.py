from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyofs_spark.session import get_session

    s = get_session(master="local[8]", app_name="pyofs-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _reset_view_cache():
    """register_views is memoized per (session, sf_dir) since round 6.
    Several tests override the `documents` temp view (or drop it) on the
    shared session; clearing the memo between tests guarantees the next
    query-registry call re-registers the real parquet views instead of
    trusting a cache the test just invalidated behind its back."""
    from pyofs_spark.sources.tables import _VIEWS_FOR

    _VIEWS_FOR.clear()
    yield


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
