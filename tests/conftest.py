"""Test configuration.

The suite runs on the CPU backend with 8 virtual devices so sharding tests
exercise a real multi-device mesh without TPU hardware (the same simulation
strategy SURVEY.md §4.8 prescribes; the reference's analogue is its
impl x threading test matrix). Set SSIM_TPU_TEST_TPU=1 to run on real TPU.

Must run before any jax import, hence the env mutation at module import.
"""

import os

if not os.environ.get("SSIM_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may pin a TPU plugin
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The environment's TPU plugin (axon) pins JAX_PLATFORMS via a site
    # hook; the config override is the one that sticks.
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # Hardware runs use the persistent compile cache: repeat suite runs
    # skip the per-shape Mosaic compiles (minutes -> seconds), and
    # previously-compiled shapes keep working even when this machine's
    # remote-compile service is flaky (cached executables load from
    # disk; only FRESH compiles need the service — observed during a
    # multi-hour service outage where execution stayed healthy).
    from ssim_tpu.config import enable_compile_cache

    enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def images_dir():
    from ssim_tpu.testing import frozen

    if not frozen.have_images():
        pytest.skip("reference test images not available")
    return frozen.images_dir()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x55)


def random_pair(rng, h, w, correlated=True):
    """A correlated uint8 image pair (uncorrelated pairs give SSIM ~ 0,
    which under-exercises the formula)."""
    a = rng.integers(0, 256, (h, w), dtype=np.uint8)
    if not correlated:
        b = rng.integers(0, 256, (h, w), dtype=np.uint8)
    else:
        noise = rng.normal(0, 12, (h, w))
        b = np.clip(a.astype(np.int32) + noise.astype(np.int32), 0, 255).astype(np.uint8)
    return a, b


import contextlib


@contextlib.contextmanager
def force_chunked(max_tile_w: int = 4096):
    """Pin the fast path's width gate back to `max_tile_w` through the
    config system, so engine/API-level tests can still exercise the
    chunked 2-D lane-grid path at CI-sized widths (the round-4 default
    gate moved to 16384 — plain 4-9K-wide images now ride the widened
    zero-copy fast path)."""
    from ssim_tpu import config

    old = config.get_config()
    import dataclasses

    config.set_config(dataclasses.replace(old, max_tile_w=max_tile_w))
    try:
        yield
    finally:
        config.set_config(old)
