"""Shared dtype routing for the fused kernel vs the XLA path.

One policy, used by engine.compute, the jittable APIs (api._run_metric),
and the sharded layers (parallel.batch) — kept in one place so the gates
cannot drift (a review found three hand-maintained copies diverging):

- uint8 pairs: the fused kernel's native path (the reference's only
  supported depth, README.md:107-111).
- float32/float64 pairs and uint16 pairs: cast to f32 (exact for u16 and
  any value below 2^24) and ride the fused kernel's sanitized float path
  — any width (the pad kernel is dtype-generic). This avoids the XLA
  path's ~160 s/shape compile on TPU.
- everything else (mixed dtypes, exotic ints): the XLA path.

Works on NumPy arrays (engine) and traced jnp arrays (jit) alike; all
branching is on static dtypes.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _is_float_routable(dt) -> bool:
    dt = np.dtype(dt)
    return dt.kind == "f" or dt == np.uint16


def ssim_parts_auto(
    a,
    b,
    *,
    with_map: bool = False,
    data_range: float = 255.0,
    interpret: bool = False,
    precise: bool = False,
    **tile_kwargs,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused kernel when the dtype allows it, XLA otherwise."""
    from .ssim_pallas import ssim_parts_pallas
    from .ssim_xla import ssim_parts_xla

    if a.dtype == jnp.uint8 and b.dtype == jnp.uint8:
        return ssim_parts_pallas(
            a, b, with_map=with_map, data_range=data_range,
            interpret=interpret, precise=precise, **tile_kwargs,
        )
    if a.dtype == b.dtype and _is_float_routable(a.dtype):
        return ssim_parts_pallas(
            a.astype(jnp.float32), b.astype(jnp.float32),
            with_map=with_map, data_range=data_range,
            interpret=interpret, precise=precise, allow_float=True,
            **tile_kwargs,
        )
    return ssim_parts_xla(a, b, with_map=with_map, data_range=data_range)


def pallas_routable(a, b) -> bool:
    """Whether ssim_parts_auto would pick the fused kernel."""
    return (a.dtype == jnp.uint8 and b.dtype == jnp.uint8) or (
        a.dtype == b.dtype and _is_float_routable(a.dtype)
    )
