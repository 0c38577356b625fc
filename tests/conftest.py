from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver mandate)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """Small deterministic pages corpus shared across tests."""
    from hunt_ray.fixtures.pages import write_pages

    out = tmp_path_factory.mktemp("pages_small")
    write_pages(str(out), seed=42, n_rows=300, rows_per_file=100)
    return str(out)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
