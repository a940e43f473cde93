import sys

import pytest

sys.path.insert(0, "/root/repo")

from deja_view_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="deja-view-spark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
