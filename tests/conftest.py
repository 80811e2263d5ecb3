import json
import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def example_docs():
    return json.loads((FIXTURES / "example_docs.json").read_text())
