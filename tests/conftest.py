import sys

import pytest

sys.path.insert(0, "/root/repo")

from collection_templates_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", shuffle_partitions=4)
