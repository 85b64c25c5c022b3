import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixtures_small():
    from registry_address_matcher_ray.sources import synth

    return synth.synth_registries(400, seed=3)


@pytest.fixture(scope="session")
def fixtures_medium():
    from registry_address_matcher_ray.sources import synth

    return synth.synth_registries(1200, seed=42)
