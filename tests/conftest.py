"""Shared fixtures: one Ray session per pytest session (required by the
driver contract), plus the deterministic fixture world."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


@pytest.fixture(scope="session")
def world():
    """(admin_tbl, gaz_tbl, sample_boxes) — built once, deterministic."""
    from geocoding_ray.sources.fixtures import build_world

    return build_world()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """On-disk parquet fixture world (small: 200 images)."""
    from geocoding_ray.sources.fixtures import generate_fixture_dir

    out = str(tmp_path_factory.mktemp("fixtures"))
    return generate_fixture_dir(out, n_images=200)
