import json
import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def example_docs():
    return json.loads((FIXTURES / "example_docs.json").read_text())


@pytest.fixture(scope="session")
def spark():
    from odinson_spark.session import get_spark

    s = get_spark(app_name="odinson-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
