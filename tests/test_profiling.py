"""Profiling hooks smoke tests (utils/profiling.py)."""

import os

import numpy as np

from ssim_tpu import compute_ssim
from ssim_tpu.utils import profiling

from conftest import random_pair


def test_trace_writes_profile(tmp_path, rng):
    a, b = random_pair(rng, 48, 64)
    with profiling.trace(str(tmp_path)):
        with profiling.annotate("ssim-under-trace"):
            compute_ssim(a, b, impl="xla")
    # jax.profiler writes a plugins/profile/<ts>/ tree.
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "trace produced no profile files"


def test_timer(rng):
    a, b = random_pair(rng, 32, 32)
    with profiling.Timer() as t:
        compute_ssim(a, b, impl="xla")
    assert t.elapsed is not None and t.elapsed > 0
