"""Device-mesh helpers."""

from typing import Optional, Sequence

import jax
import numpy as np


def make_mesh(shape: Sequence[int], axis_names: Sequence[str]) -> jax.sharding.Mesh:
    """An explicit mesh over the first prod(shape) local devices."""
    n = int(np.prod(shape))
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return jax.sharding.Mesh(np.array(devices).reshape(tuple(shape)), tuple(axis_names))


def default_mesh(axis_name: str = "data", n: Optional[int] = None) -> jax.sharding.Mesh:
    """A 1-D mesh over all (or the first n) devices."""
    devices = jax.devices() if n is None else jax.devices()[:n]
    return jax.sharding.Mesh(np.array(devices), (axis_name,))
