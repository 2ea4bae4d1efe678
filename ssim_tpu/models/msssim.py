"""Multi-scale SSIM (MS-SSIM) — TPU-native extension.

No reference analogue (rmgr::ssim is single-scale only); implemented to
the standard recipe of Wang, Simoncelli & Bovik, "Multi-scale structural
similarity for image quality assessment" (Asilomar 2003):

- 5 scales, exponents (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
- contrast-structure term cs = (2 sigma_ab + c2) / (sa2 + sb2 + c2)
  averaged at every scale; the luminance term only at the coarsest,
- dyadic downsampling by 2x2 mean pooling between scales.

Window/constants/border semantics are inherited from the core metric
(11x11 sigma=1.5, clamp-to-edge, c1/c2 from data_range) so single-scale
results stay consistent with the reference contract.
"""

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ssim_xla import _pad_edge, blur_separable
from ..windows import RADIUS, SIGMA, gaussian_taps

#: The canonical 5-scale exponents (Wang et al. 2003, table 1).
MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _l_cs_maps(a, b, c1, c2, taps):
    """Luminance-term and contrast-structure-term maps of one scale.
    a, b: float (..., H, W)."""
    ap = _pad_edge(a, RADIUS)
    bp = _pad_edge(b, RADIUS)
    s = ap + bp
    d = ap - bp
    sig = jnp.stack([ap, bp, s * s, d * d], axis=0)
    mu_a, mu_b, ss, dd = (x for x in blur_separable(sig, taps, RADIUS))
    mu_a2 = mu_a * mu_a
    mu_b2 = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_ab_x4 = (ss - dd) - 4.0 * mu_ab
    sigma_sum_x2 = (ss + dd) - 2.0 * (mu_a2 + mu_b2)
    l_map = (2.0 * mu_ab + c1) / (mu_a2 + mu_b2 + c1)
    cs_map = (0.5 * sigma_ab_x4 + c2) / (0.5 * sigma_sum_x2 + c2)
    return l_map, cs_map


def _downsample2(x):
    """2x2 mean pooling, truncating odd trailing rows/cols (the standard
    MS-SSIM dyadic pyramid step).

    Implemented as an add reduce_window: measured 0.04 ms at 1080p on
    v5e vs 1.5 ms for the reshape-mean formulation (whose minor-dim-2
    reshape forces relayouts) and 21 ms for stride-2 slicing — the
    downsamples, not the kernels, dominated MS-SSIM before this.
    """
    dims = (1,) * (x.ndim - 2) + (2, 2)
    s = jax.lax.reduce_window(x, np.float32(0), jax.lax.add, dims, dims, "VALID")
    return s * np.float32(0.25)


def _check_levels(a, levels):
    min_side = min(a.shape[-1], a.shape[-2])
    if min_side < (2 * RADIUS + 1) * 2 ** (levels - 1):
        raise ValueError(
            f"image side {min_side} too small for {levels} scales; "
            f"needs >= {(2 * RADIUS + 1) * 2 ** (levels - 1)} (pass fewer weights)"
        )


def _cs_ssim_sums_diff(data_range, interpret, relaxed=False,
                       sigma=SIGMA, k1=0.01, k2=0.03):
    """Per-scale differentiable [sum_cs, sum_ssim]: components-kernel
    forward, fused analytic-backward kernel (ops/ssim_grad.py) as the
    VJP — no XLA-formulation compile anywhere in the MS-SSIM training
    path. Cotangent layout follows the components kernel: g[..., 0] is
    the sum_cs cotangent (w_cs), g[..., 1] the sum_ssim one (w_s).
    relaxed applies end-to-end (forward AND the backward kernel's loose
    MXU tier — same contract as api.ssim; no-op below MXU_MIN_W)."""
    from ..ops.ssim_pallas import ssim_components_pallas

    @jax.custom_vjp
    def f(xa, xb):
        parts = ssim_components_pallas(
            xa, xb, data_range=data_range, interpret=interpret,
            relaxed=relaxed, sigma=sigma, k1=k1, k2=k2,
        )
        return jnp.sum(parts, axis=-2)  # (..., 2): [sum_cs, sum_ssim]

    def f_fwd(xa, xb):
        return f(xa, xb), (xa, xb)

    def f_bwd(res, g):
        from ..ops.ssim_grad import ssim_grad_pallas

        xa, xb = res
        return ssim_grad_pallas(
            xa, xb, g[..., 1], g[..., 0],
            data_range=data_range, interpret=interpret, relaxed=relaxed,
            sigma=sigma, k1=k1, k2=k2,
        )

    f.defvjp(f_fwd, f_bwd)
    return f


def _ms_pallas_forward(a, b, data_range, weights, interpret, diff=False,
                       relaxed=False, sigma=SIGMA, k1=0.01, k2=0.03):
    """Components-kernel pyramid. With diff=True every scale runs through
    the custom-VJP sums (fused backward kernel), making the whole pyramid
    natively differentiable — the _downsample2 reduce_window between
    scales has a standard XLA gradient."""
    from ..ops.ssim_pallas import (
        pooled_components_ok,
        ssim_components_pallas,
        ssim_components_pooled_pallas,
    )

    levels = len(weights)
    x_a, x_b = a, b
    result = None
    for lvl, w in enumerate(weights):
        n = x_a.shape[-2] * x_a.shape[-1]
        pooled = None
        if diff:
            sums = _cs_ssim_sums_diff(
                data_range, interpret, relaxed, sigma, k1, k2
            )(x_a, x_b) / n
        elif lvl < levels - 1 and pooled_components_ok(x_a.shape, x_a.dtype):
            # One launch returns the sums AND the pooled next-scale
            # inputs (the fused pool_out mode) — drops the inter-scale
            # reduce_window pass, the biggest fixed cost of the pyramid
            # after the kernels themselves (docs/RESULTS.md "MS-SSIM
            # structural limit"). u8 scale 0 pools bit-exactly; the f32
            # scales 1..3 pool via HIGHEST dots (round 5 — the
            # inference pyramid runs with NO reduce_window at all).
            parts, pa, pb = ssim_components_pooled_pallas(
                x_a, x_b, data_range=data_range, interpret=interpret,
                relaxed=relaxed, sigma=sigma, k1=k1, k2=k2,
            )
            sums = jnp.sum(parts, axis=-2) / n
            pooled = (pa, pb)
        else:
            parts = ssim_components_pallas(
                x_a, x_b, data_range=data_range, interpret=interpret,
                relaxed=relaxed, sigma=sigma, k1=k1, k2=k2,
            )
            sums = jnp.sum(parts, axis=-2) / n  # (..., 2): [mean_cs, mean_ssim]
        if lvl == levels - 1:
            # Coarsest scale uses the full SSIM mean (Wang 2003 eq. 7).
            term = jnp.maximum(sums[..., 1], 1e-6) ** w
        else:
            term = jnp.maximum(sums[..., 0], 1e-6) ** w
            if pooled is not None:
                x_a, x_b = pooled
            else:
                x_a = _downsample2(x_a.astype(jnp.float32))
                x_b = _downsample2(x_b.astype(jnp.float32))
        result = term if result is None else result * term
    return result


def _ms_xla_forward(a, b, data_range, weights, sigma=SIGMA, k1=0.01, k2=0.03):
    """Pure-XLA pyramid (differentiable; slow to compile on TPU)."""
    levels = len(weights)
    taps = gaussian_taps(np.float32, RADIUS, sigma)
    c1 = jnp.float32((k1 * data_range) ** 2)
    c2 = jnp.float32((k2 * data_range) ** 2)

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    result = None
    for lvl, w in enumerate(weights):
        l_map, cs_map = _l_cs_maps(af, bf, c1, c2, taps)
        # Negative means are clamped (standard practice: a^w is undefined
        # for a < 0; the eps keeps gradients finite).
        if lvl == levels - 1:
            # Coarsest scale uses the full SSIM mean, i.e. mean(l * cs)
            # (Wang 2003 eq. 7) — not the product of the two means.
            term = jnp.maximum(jnp.mean(l_map * cs_map, axis=(-2, -1)), 1e-6) ** w
        else:
            term = jnp.maximum(jnp.mean(cs_map, axis=(-2, -1)), 1e-6) ** w
            af = _downsample2(af)
            bf = _downsample2(bf)
        result = term if result is None else result * term
    return result


def _pallas_eligible(a, b):
    """Every pyramid scale must be a shape/dtype the components kernel
    accepts; anything else silently keeps the XLA path (same silent-
    fallback convention as api._run_metric). Width is unrestricted: u8
    and f32 both have a chunked path (the pad kernel is dtype-generic)."""
    if a.ndim not in (2, 3) or a.dtype != b.dtype:
        return False
    return a.dtype in (jnp.uint8, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "data_range", "weights", "impl", "accuracy", "sigma", "k1", "k2",
    ),
)
def ms_ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    data_range: float = 255.0,
    weights: Tuple[float, ...] = MS_SSIM_WEIGHTS,
    impl: str = "auto",
    accuracy: str = "standard",
    sigma: float = SIGMA,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Jittable MS-SSIM. a, b: (..., H, W); needs min(H, W) >= 11 * 2^(L-1).

    Returns scalar for 2-D inputs, (B,) for batched. Differentiable on
    every path: for f32 inputs each pyramid scale carries the fused
    analytic backward kernel (ops/ssim_grad.py) as its VJP, so forward
    AND gradient are TPU-native kernels; non-f32 dtypes fall back to
    an XLA-formulation VJP (slow first grad compile, same numerics).

    impl: "auto" (the fused components-mode Pallas kernel on TPU — ~1.7x
    the XLA formulation's per-scale throughput — and XLA elsewhere),
    "pallas", or "xla".

    accuracy="relaxed" opts the wide pyramid scales (w >= MXU_MIN_W —
    in the canonical 5-scale pyramid usually scales 0-1) into the fused
    kernel's loose bf16-split blur tier, forward AND backward (see
    api.ssim); Pallas impl only (the XLA path computes at standard
    accuracy).

    sigma/k1/k2 (extension, torchmetrics-style): custom window spread and
    stabilization constants, threaded through every scale on both paths
    (radius stays 5 — the canonical MS-SSIM window size).
    """
    from ..api import _relaxed
    from ..dispatch import Implementation, backend_platform, select_impl
    from ..engine import validate_pair, validate_window

    levels = len(weights)
    relaxed = _relaxed(accuracy)
    validate_pair(a, b)  # static at trace time (same EINVAL surface as engine.compute)
    validate_window(RADIUS, sigma, k1, k2, data_range)
    _check_levels(a, levels)

    resolved = select_impl(impl)
    use_pallas = resolved == Implementation.PALLAS and _pallas_eligible(a, b)
    if not use_pallas:
        return _ms_xla_forward(a, b, data_range, weights, sigma, k1, k2)

    interpret = backend_platform() != "tpu"
    if a.dtype != jnp.float32:
        # u8 inputs are not differentiable (integer tangents); skip the
        # VJP wrapper so the forward stays a pure kernel call.
        return _ms_pallas_forward(a, b, data_range, weights, interpret,
                                  relaxed=relaxed, sigma=sigma, k1=k1, k2=k2)

    from ..ops.ssim_grad import grad_pallas_supported

    # Scale 0 is the widest scale, so if it fits the fused backward every
    # coarser scale does too: the whole pyramid (forward AND gradient) is
    # TPU-native kernels. grad_pallas_supported holds for EVERY valid
    # pyramid — _check_levels guarantees min side >= 11 > RADIUS, and the
    # column-chunked backward accepts any width — so this is an invariant
    # check, not a branch (a never-executed XLA-VJP fallback used to live
    # here; a review flagged it as dead code).
    assert grad_pallas_supported(a.shape[-2], a.shape[-1])
    return _ms_pallas_forward(a, b, data_range, weights, interpret,
                              diff=True, relaxed=relaxed, sigma=sigma,
                              k1=k1, k2=k2)


def compute_ms_ssim(a, b, *, data_range: float = 255.0,
                    weights: Sequence[float] = MS_SSIM_WEIGHTS,
                    impl: str = "auto", accuracy: str = "standard",
                    sigma: float = SIGMA, k1: float = 0.01,
                    k2: float = 0.03) -> float:
    """Eager convenience wrapper (host arrays in, float out)."""
    res = ms_ssim(jnp.asarray(np.asarray(a)), jnp.asarray(np.asarray(b)),
                  data_range=data_range, weights=tuple(weights), impl=impl,
                  accuracy=accuracy, sigma=sigma, k1=k1, k2=k2)
    out = np.asarray(res)
    return float(out) if out.ndim == 0 else out
