import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full_gate: full queries()-vs-oracle_sql() gate at sf0.001 "
        "(~4 min; deselect with -m 'not full_gate' when iterating)",
    )
