import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
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


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cbr"))


@pytest.fixture(scope="session")
def small_fixture(fixture_root):
    """(corpus_dir, queries_path) for the 300-doc conformance corpus."""
    from colbert_ray.fixtures import ensure_fixture

    return ensure_fixture(fixture_root, 300, 40)
