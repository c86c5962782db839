import pytest
import ray


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running stress tests (kill/resume)"
    )


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()
