"""MS-SSIM tests: against an independent NumPy implementation written from
the Wang 2003 recipe, plus invariants. (Extension — no reference parity.)"""

import numpy as np
import pytest

from ssim_tpu import reference
from ssim_tpu.models import MS_SSIM_WEIGHTS, compute_ms_ssim
from ssim_tpu.windows import gaussian_taps

from conftest import random_pair


def _numpy_msssim(a, b, data_range=255.0, weights=MS_SSIM_WEIGHTS):
    """Independent f64 implementation (shares only windows.gaussian_taps)."""
    t = gaussian_taps(np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def blur(x):
        xp = np.pad(x, 5, mode="edge")
        rows = np.zeros((x.shape[0] + 10, x.shape[1]))
        for i in range(11):
            rows += t[i] * xp[:, i : i + x.shape[1]]
        out = np.zeros(x.shape)
        for i in range(11):
            out += t[i] * rows[i : i + x.shape[0], :]
        return out

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    result = 1.0
    for lvl, w in enumerate(weights):
        mu_a, mu_b = blur(a), blur(b)
        sa2 = blur(a * a) - mu_a**2
        sb2 = blur(b * b) - mu_b**2
        sab = blur(a * b) - mu_a * mu_b
        cs = np.mean((2 * sab + c2) / (sa2 + sb2 + c2))
        if lvl == len(weights) - 1:
            full_ssim = np.mean(
                ((2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1))
                * ((2 * sab + c2) / (sa2 + sb2 + c2))
            )
            result *= max(full_ssim, 1e-6) ** w
        else:
            result *= max(cs, 1e-6) ** w
            h2, w2 = a.shape[0] // 2, a.shape[1] // 2
            a = a[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))
            b = b[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))
    return result


def test_identical_is_one(rng):
    a, _ = random_pair(rng, 192, 224)
    assert compute_ms_ssim(a, a) == pytest.approx(1.0, abs=1e-5)


def test_against_numpy_impl(rng):
    a, b = random_pair(rng, 200, 240)
    got = compute_ms_ssim(a, b)
    want = _numpy_msssim(a, b)
    assert got == pytest.approx(want, abs=5e-4)


def test_mean_vs_luminance_last_level_differs(rng):
    """The l*cs coupling at the coarsest scale: mean(l*cs) != mean(l)*mean(cs);
    implementation must use the former (Wang 2003 eq. 7)."""
    a, b = random_pair(rng, 200, 200, correlated=False)
    got = compute_ms_ssim(a, b)
    want = _numpy_msssim(a, b)
    assert got == pytest.approx(want, abs=5e-4)


def test_degradation_ordering(rng):
    """More noise -> lower MS-SSIM."""
    a, _ = random_pair(rng, 192, 192)
    scores = []
    for sigma in (2, 10, 40):
        noisy = np.clip(
            a.astype(np.int32) + rng.normal(0, sigma, a.shape).astype(np.int32), 0, 255
        ).astype(np.uint8)
        scores.append(compute_ms_ssim(a, noisy))
    assert scores[0] > scores[1] > scores[2]


def test_too_small_raises():
    with pytest.raises(ValueError):
        compute_ms_ssim(np.zeros((64, 64), np.uint8), np.zeros((64, 64), np.uint8))


def test_fewer_levels_small_image(rng):
    a, b = random_pair(rng, 64, 64)
    got = compute_ms_ssim(a, b, weights=MS_SSIM_WEIGHTS[:3])
    want = _numpy_msssim(a, b, weights=MS_SSIM_WEIGHTS[:3])
    assert got == pytest.approx(want, abs=5e-4)


def test_batched(rng):
    a1, b1 = random_pair(rng, 192, 192)
    a2, b2 = random_pair(rng, 192, 192)
    scores = compute_ms_ssim(np.stack([a1, a2]), np.stack([b1, b2]))
    assert scores.shape == (2,)
    assert scores[0] == pytest.approx(compute_ms_ssim(a1, b1), abs=1e-6)


def test_pallas_impl_matches_xla(rng):
    """The components-mode fused kernel (the path that makes MS-SSIM
    usable on TPU) must agree with the XLA formulation."""
    a, b = random_pair(rng, 192, 256)
    got = compute_ms_ssim(a, b, impl="pallas")
    want = compute_ms_ssim(a, b, impl="xla")
    assert got == pytest.approx(want, abs=2e-5)


def test_pallas_impl_matches_numpy(rng):
    a, b = random_pair(rng, 180, 200)
    got = compute_ms_ssim(a, b, impl="pallas")
    want = _numpy_msssim(a, b)
    assert got == pytest.approx(want, abs=5e-5)


def test_pallas_impl_batched(rng):
    pairs = [random_pair(rng, 176, 192) for _ in range(2)]
    a = np.stack([p[0] for p in pairs])
    b = np.stack([p[1] for p in pairs])
    got = compute_ms_ssim(a, b, impl="pallas")
    for i in range(2):
        want = compute_ms_ssim(a[i], b[i], impl="pallas")
        assert got[i] == pytest.approx(want, abs=1e-7)


def test_pallas_impl_float_input(rng):
    """f32 inputs in [0,1] (training convention) through the components
    kernel's float entry."""
    a, b = random_pair(rng, 192, 208)
    af = a.astype(np.float32) / 255.0
    bf = b.astype(np.float32) / 255.0
    got = compute_ms_ssim(af, bf, data_range=1.0, impl="pallas")
    want = compute_ms_ssim(af, bf, data_range=1.0, impl="xla")
    assert got == pytest.approx(want, abs=2e-5)


def test_pallas_impl_grad_matches_xla(rng):
    """The auto/pallas path must stay differentiable (custom VJP routed
    through the XLA formulation)."""
    import jax

    a, b = random_pair(rng, 176, 192)
    af = a.astype(np.float32) / 255.0
    bf = b.astype(np.float32) / 255.0
    from ssim_tpu.models.msssim import ms_ssim

    g_pallas = jax.grad(
        lambda x: 1.0 - ms_ssim(x, bf, data_range=1.0, impl="pallas")
    )(af)
    g_xla = jax.grad(
        lambda x: 1.0 - ms_ssim(x, bf, data_range=1.0, impl="xla")
    )(af)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla), atol=1e-7)


def test_pallas_wide_inputs_use_chunked_path(rng):
    """Wide float/u8 pyramids must agree with XLA (these widths ride the
    round-4 widened fast path; the chunked grid is covered by the forced
    tests in test_pallas.py)."""
    from ssim_tpu.models.msssim import ms_ssim

    # float32 wider than one tile: scale 0 takes the wide f32 route.
    a = rng.uniform(0, 255, (180, 4500)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 10, a.shape).astype(np.float32), 0, 255)
    got = float(ms_ssim(a, b, impl="pallas"))
    want = float(ms_ssim(a, b, impl="xla"))
    assert got == pytest.approx(want, abs=2e-5)

    # u8 wider than ~2x one tile: the level-1 float scale is also chunked.
    a8w = rng.integers(0, 256, (180, 8600), dtype=np.uint8)
    b8w = np.clip(a8w.astype(np.int32) + rng.integers(-10, 10, a8w.shape), 0, 255).astype(np.uint8)
    got = float(ms_ssim(a8w, b8w, impl="pallas"))
    want = float(ms_ssim(a8w, b8w, impl="xla"))
    assert got == pytest.approx(want, abs=2e-5)


def test_pallas_mixed_dtypes_fall_back(rng):
    """Mixed-dtype pairs silently keep the XLA path."""
    from ssim_tpu.models.msssim import ms_ssim

    a8 = rng.integers(0, 256, (176, 192), dtype=np.uint8)
    bf = a8.astype(np.float32)
    got = float(ms_ssim(a8, bf, impl="pallas"))
    want = float(ms_ssim(a8, bf, impl="xla"))
    assert got == pytest.approx(want, abs=1e-7)


def test_msssim_relaxed_tier(rng):
    """accuracy="relaxed" loosens the wide pyramid scales (w >= MXU_MIN_W)
    but stays inside the loose envelope; bad values raise; gradients
    still flow (the backward uses its matching loose tier)."""
    import jax
    import jax.numpy as jnp

    from ssim_tpu.errors import InvalidArgumentError
    from ssim_tpu.models.msssim import ms_ssim

    a = rng.integers(0, 256, (192, 704), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-12, 12, a.shape),
                0, 255).astype(np.uint8)
    want = float(ms_ssim(a, b, impl="pallas"))
    got = float(ms_ssim(a, b, impl="pallas", accuracy="relaxed"))
    assert got == pytest.approx(want, abs=1e-4)

    with pytest.raises(InvalidArgumentError):
        ms_ssim(a, b, accuracy="fast")

    af = jnp.asarray(a, jnp.float32) / 255.0
    bf = jnp.asarray(b, jnp.float32) / 255.0
    g = jax.grad(
        lambda x: ms_ssim(x, bf, data_range=1.0, impl="pallas",
                          accuracy="relaxed")
    )(af)
    assert bool(jnp.isfinite(g).all())


@pytest.mark.parametrize("h,w,batch", [(64, 128, None), (63, 127, None),
                                       (70, 96, 3), (41, 200, None)])
def test_pooled_components_bit_identical_to_downsample2(rng, h, w, batch):
    """ssim_components_pooled_pallas's fused 2x2 pool must be
    BIT-identical to the separate _downsample2 reduce_window, and its
    [cs, ssim] parts bit-identical to ssim_components_pallas — across
    even/odd H/W, ragged tiles (h % tile_h != 0), and batches. A drift
    here would only surface as a small MS-SSIM error otherwise
    (advisor round-3 finding)."""
    import jax.numpy as jnp

    from ssim_tpu.dispatch import backend_platform
    from ssim_tpu.models.msssim import _downsample2
    from ssim_tpu.ops.ssim_pallas import (
        ssim_components_pallas,
        ssim_components_pooled_pallas,
    )

    # Compiled on TPU, interpret on CPU — NOT interpret-on-TPU, whose
    # lax-lowered dots take different instruction paths than both the
    # real Mosaic kernel and the CPU interpreter and break bit-equality.
    interpret = backend_platform() != "tpu"
    shape = (h, w) if batch is None else (batch, h, w)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    b = rng.integers(0, 256, shape).astype(np.uint8)
    parts, pa, pb = ssim_components_pooled_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=interpret
    )
    parts0 = ssim_components_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=interpret
    )
    assert np.array_equal(np.asarray(parts), np.asarray(parts0))
    want_a = _downsample2(jnp.asarray(a, jnp.float32))
    want_b = _downsample2(jnp.asarray(b, jnp.float32))
    assert np.array_equal(np.asarray(pa), np.asarray(want_a))
    assert np.array_equal(np.asarray(pb), np.asarray(want_b))
