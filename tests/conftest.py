import logging
import os
import warnings

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    warnings.filterwarnings("ignore")
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_TEST_CPUS", "4")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_lake(tmp_path):
    return str(tmp_path / "lake")


@pytest.fixture()
def tmp_events(tmp_path):
    return str(tmp_path / "events")
