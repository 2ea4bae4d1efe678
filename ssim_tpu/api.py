"""Public API.

Mirrors the reference's public surface (include/rmgr/ssim.h:428-732):

- `compute_ssim` — the eager entry point, parity with
  `rmgr::ssim::compute_ssim` (include/rmgr/ssim.h:686, src/ssim.cpp:933):
  takes images (arrays or ImageView/Params), returns the global SSIM as a
  Python float (f64-finalized), optionally with the per-pixel map.
- `ssim` / `ssim_and_map` — jittable on-device versions for use inside
  larger JAX programs (new TPU-native surface; the global score is f32 on
  device, which is documented as weaker than `compute_ssim`'s f64 finalize).
- `ssim_loss` — differentiable 1 - mean(SSIM) perceptual loss (new
  TPU-native surface; the reference has no autodiff story).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from .dispatch import Implementation, select_impl
from .params import ImageView, Params


def _unwrap(img) -> np.ndarray:
    if isinstance(img, ImageView):
        return img.data
    return np.asarray(img)


def compute_ssim(
    a,
    b=None,
    *,
    with_map: bool = False,
    impl=None,
    data_range: float = 255.0,
    precision=None,
):
    """Global SSIM of two single-channel images (or batches of them).

    Accepts either (a, b) as arrays/ImageViews, or a single `Params`.
    Returns `float` (or (B,) float64 array), or `(score, map)` when
    `with_map`. Parity: rmgr::ssim::compute_ssim (src/ssim.cpp:933-1106).
    """
    params = None
    if isinstance(a, Params):
        params = a
        if b is not None:
            raise TypeError("pass either Params or two images, not both")
        a, b = params.img_a.data, params.img_b.data
        with_map = params.with_map or params.map_buffer is not None
        impl = params.implementation
        data_range = params.data_range
    score, ssim_map = engine.compute(
        _unwrap(a), _unwrap(b), with_map=with_map, impl=impl,
        data_range=data_range, precision=precision,
    )
    if params is not None and params.map_buffer is not None:
        # Reference ssimStep/ssimStride map layout (include/rmgr/ssim.h:514-516).
        from .params import write_strided_map

        stride = params.map_stride
        if stride is None:
            stride = ssim_map.shape[-1] * params.map_step
        write_strided_map(
            params.map_buffer, ssim_map, params.map_step, stride,
            params.map_offset,
        )
    score = float(score) if np.ndim(score) == 0 else score
    # A map_buffer alone (reference: ssimMap != NULL) doesn't change the
    # return shape — the map went into the caller's buffer.
    if params.with_map if params is not None else with_map:
        return score, ssim_map
    return score


def compute_ssim_map(a, b, *, impl="auto", data_range: float = 255.0):
    """Convenience: return (global_ssim, per-pixel map)."""
    return compute_ssim(a, b, with_map=True, impl=impl, data_range=data_range)


def _jit_parts(impl):
    from .dispatch import backend_platform

    impl = select_impl(impl)
    if impl == Implementation.PALLAS:
        from .ops.ssim_pallas import ssim_parts_pallas
        from .ops.ssim_xla import ssim_parts_xla

        interpret = backend_platform() != "tpu"

        def parts(a, b, with_map, data_range):
            # The fused kernel natively takes uint8 (the reference's only
            # depth, README.md:107-111); float32 pairs ride its sanitized
            # float path; everything else falls back to XLA (same gates
            # as engine.compute) instead of wrapping modulo 256.
            if a.dtype == jnp.uint8 and b.dtype == jnp.uint8:
                return ssim_parts_pallas(
                    a, b, with_map=with_map, data_range=data_range,
                    interpret=interpret,
                )
            if a.dtype == jnp.float32 and b.dtype == jnp.float32:
                return ssim_parts_pallas(
                    a, b, with_map=with_map, data_range=data_range,
                    interpret=interpret, allow_float=True,
                )
            return ssim_parts_xla(a, b, with_map=with_map, data_range=data_range)

        return parts
    from .ops.ssim_xla import ssim_parts_xla

    def parts(a, b, with_map, data_range):
        return ssim_parts_xla(a, b, with_map=with_map, data_range=data_range)

    return parts


@functools.partial(jax.jit, static_argnames=("data_range", "impl"))
def ssim(a, b, *, data_range: float = 255.0, impl: str = "auto") -> jnp.ndarray:
    """Jittable global SSIM, f32 on device. a, b: (..., H, W).

    Returns scalar for 2-D inputs, (B,) for batched. Differentiable when
    impl='xla'.
    """
    partials, _ = _jit_parts(impl)(a, b, False, data_range)
    n = a.shape[-1] * a.shape[-2]
    return jnp.sum(partials, axis=-1) / n


@functools.partial(jax.jit, static_argnames=("data_range", "impl"))
def ssim_and_map(
    a, b, *, data_range: float = 255.0, impl: str = "auto"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable (global_ssim, per-pixel map)."""
    partials, ssim_map = _jit_parts(impl)(a, b, True, data_range)
    n = a.shape[-1] * a.shape[-2]
    return jnp.sum(partials, axis=-1) / n, ssim_map


@functools.partial(jax.jit, static_argnames=("data_range", "impl"))
def ssim_loss(a, b, *, data_range: float = 1.0, impl: str = "auto") -> jnp.ndarray:
    """Differentiable perceptual loss: 1 - mean SSIM over the batch.

    Defaults to data_range=1.0 (float images in [0, 1]), the common
    training convention; pass 255.0 for u8-range inputs.

    impl: "auto" selects the fused Pallas kernel for the forward pass on
    TPU (eligible float32 inputs) with a custom VJP routed through the
    XLA formulation — fast forward, and the first grad call pays the XLA
    compile; the same pattern as ms_ssim. "xla" forces the XLA path
    throughout (the previous behavior).
    """
    from .dispatch import Implementation, backend_platform
    from .ops.ssim_xla import ssim_parts_xla

    n = a.shape[-1] * a.shape[-2]

    def xla_loss(xa, xb):
        row_sums, _ = ssim_parts_xla(xa, xb, with_map=False, data_range=data_range)
        return 1.0 - jnp.mean(jnp.sum(row_sums, axis=-1) / n)

    resolved = select_impl(impl)
    use_pallas = (
        resolved == Implementation.PALLAS
        and a.dtype == jnp.float32
        and b.dtype == jnp.float32
    )
    if not use_pallas:
        return xla_loss(a, b)

    from .ops.ssim_pallas import ssim_parts_pallas

    interpret = backend_platform() != "tpu"

    @jax.custom_vjp
    def f(xa, xb):
        partials, _ = ssim_parts_pallas(
            xa, xb, with_map=False, data_range=data_range,
            interpret=interpret, allow_float=True,
        )
        return 1.0 - jnp.mean(jnp.sum(partials, axis=-1) / n)

    def f_fwd(xa, xb):
        return f(xa, xb), (xa, xb)

    def f_bwd(res, g):
        xa, xb = res
        _, vjp = jax.vjp(xla_loss, xa, xb)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f(a, b)
