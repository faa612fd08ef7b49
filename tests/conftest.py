import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running stability tests")


@pytest.fixture(scope="session")
def spark():
    from sparkocr.session import get_spark

    s = get_spark(cores=4, app_name="sparkocr-tests", shuffle_partitions=8)
    yield s
