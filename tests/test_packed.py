"""Lane-packed batch path for small images (ssim_parts_pallas_packed).

Small batched images are packed side by side along the lane dimension,
each slot carrying its own RADIUS-wide edge-replica gutters (the same
isolation the reference's per-tile margin fills provide,
src/ssim.cpp:540-555); the kernel emits per-lane column sums and slots
are segment-reduced outside. Measured on v5e: 32^2 x16384 1.28 -> 5.16
Gpix/s, 64^2 x4096 3.10 -> 5.47, 512^2 x128 8.22 -> 9.23 (docs/RESULTS.md).
"""

import numpy as np
import pytest

from conftest import random_pair
from ssim_tpu import api, engine, reference
from ssim_tpu.ops.ssim_pallas import (
    PACK_MAX_W,
    pack_count,
    ssim_parts_pallas_packed,
)


@pytest.mark.parametrize(
    "batch,shape",
    [
        (7, (64, 64)),     # remainder batch (P=7 fits, but exercise odd B)
        (3, (33, 47)),     # ragged h, odd w
        (1, (16, 16)),     # single image
        (9, (11, 11)),     # window-sized images
        (4, (50, 1)),      # width-1 degenerate
        (130, (40, 30)),   # B > P: multiple packed rows + dummy padding
        (2, (70, 512)),    # widest packable
    ],
)
def test_packed_matches_oracle(rng, batch, shape):
    h, w = shape
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    noise = rng.normal(0, 12, a.shape)
    b = np.clip(a.astype(np.int32) + noise.astype(np.int32), 0, 255).astype(np.uint8)
    parts = ssim_parts_pallas_packed(a, b, interpret=True)
    assert parts.shape == (batch, 2)
    got = engine.finalize_mean(np.asarray(parts), h * w)
    tol = max(2e-6, 3e-3 / (h * w) ** 0.5)
    for i in range(batch):
        want, _ = reference.compute_ssim(a[i], b[i])
        assert abs(float(got[i]) - want) < tol, (i, float(got[i]), want)


def test_packed_matches_unpacked_engine(rng):
    """The auto-routed engine result (packed for this shape) must match
    per-image compute_ssim calls (standard path) to f32 noise."""
    a = rng.integers(0, 256, (6, 48, 64), dtype=np.uint8)
    b = np.clip(
        a.astype(np.int32) + rng.normal(0, 10, a.shape).astype(np.int32), 0, 255
    ).astype(np.uint8)
    batched = api.compute_ssim(a, b, impl="pallas")
    singles = [api.compute_ssim(a[i], b[i], impl="pallas") for i in range(6)]
    np.testing.assert_allclose(batched, singles, rtol=0, atol=2e-6)


def test_packed_identical_pairs_are_one(rng):
    """Identical images give per-pixel ssim == num/num == 1.0, so the
    (ssim - 1) column sums vanish. On the CPU backend this is exact; on
    the TPU backend the compiler may contract the num/den expression
    trees differently, leaving ulp-level per-pixel residue (~1e-8 of the
    mean — measured 8e-9, far inside every tier). Correctness does not
    depend on exactness: dummy slots are dropped, never subtracted."""
    import jax

    a = rng.integers(0, 256, (5, 32, 32), dtype=np.uint8)
    parts = np.asarray(ssim_parts_pallas_packed(a, a.copy(), interpret=True))
    got = engine.finalize_mean(parts, 32 * 32)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(parts[:, 0], np.zeros(5, np.float32))
        np.testing.assert_array_equal(got, np.ones(5))
    else:
        assert np.abs(parts[:, 0]).max() < 1e-4
        np.testing.assert_allclose(got, np.ones(5), rtol=0, atol=1e-7)


def test_packed_rejections_and_gates(rng):
    a, b = random_pair(rng, 32, 32)
    with pytest.raises(ValueError):
        ssim_parts_pallas_packed(a, b)  # 2-D: needs a batch
    af = a.astype(np.float32)
    with pytest.raises(ValueError):
        ssim_parts_pallas_packed(af[None], af[None])  # uint8 only
    assert pack_count(PACK_MAX_W, 1000) >= 2
    # with_map requests must NOT take the packed path (it has no map):
    batch_a = np.stack([a] * 3)
    batch_b = np.stack([b] * 3)
    scores, maps = api.compute_ssim(batch_a, batch_b, with_map=True, impl="pallas")
    assert maps.shape == batch_a.shape


def test_packed_float_matches_oracle(rng):
    for batch, h, w in [(5, 224, 224), (3, 40, 56)]:
        a = rng.random((batch, h, w)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
        parts = ssim_parts_pallas_packed(
            a, b, data_range=1.0, interpret=True, allow_float=True
        )
        got = engine.finalize_mean(np.asarray(parts), h * w)
        tol = max(2e-6, 3e-3 / (h * w) ** 0.5)
        for i in range(batch):
            want, _ = reference.compute_ssim(a[i], b[i], data_range=1.0)
            assert abs(float(got[i]) - want) < tol, (i, float(got[i]), want)


def test_packed_float_nan_isolated_per_image(rng):
    """A NaN pixel in one packed image must poison ONLY that image's
    score (per-column poison + blur locality across slot gutters); its
    packed neighbors stay finite and correct."""
    batch, h, w = 4, 48, 64
    a = rng.random((batch, h, w)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    a[2, 10, 20] = np.nan
    parts = ssim_parts_pallas_packed(
        a, b, data_range=1.0, interpret=True, allow_float=True
    )
    got = engine.finalize_mean(np.asarray(parts), h * w)
    assert np.isnan(got[2])
    for i in (0, 1, 3):
        assert np.isfinite(got[i])
        want, _ = reference.compute_ssim(a[i], b[i], data_range=1.0)
        assert abs(float(got[i]) - want) < 2e-6


def test_packed_float_routed_by_engine(rng):
    """Batched small float images auto-route packed and match per-image
    standard-path results."""
    a = rng.random((6, 128, 96)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.03, a.shape).astype(np.float32), 0, 1)
    batched = api.compute_ssim(a, b, impl="pallas", data_range=1.0)
    singles = [
        api.compute_ssim(a[i], b[i], impl="pallas", data_range=1.0)
        for i in range(6)
    ]
    np.testing.assert_allclose(batched, singles, rtol=0, atol=2e-6)


def test_batched_einstein_frozen_constants(images_dir):
    """The einstein suite (256x256 — a 128-multiple width, so the fast
    path uses the roll lane mode) computed as one batch must match the
    reference's frozen quad-precision scalars to the f32 tier; the same
    suite run through the EXPLICITLY packed path must agree too (both
    clamp-to-edge implementations against real image borders)."""
    import os

    from ssim_tpu.testing import frozen
    from ssim_tpu.utils import load_image

    ref = load_image(os.path.join(images_dir, "einstein.png"))
    names = list(frozen.EINSTEIN_SUITE)
    imgs = np.stack([load_image(os.path.join(images_dir, n)) for n in names])
    refs = np.stack([ref] * len(names))
    scores = api.compute_ssim(imgs, refs, impl="pallas")
    for i, n in enumerate(names):
        want = frozen.EINSTEIN_SUITE[n]
        assert abs(scores[i] - want) < frozen.GLOBAL_TOLERANCE_F32, (n, scores[i], want)
    parts = ssim_parts_pallas_packed(imgs, refs, interpret=True)
    packed_scores = engine.finalize_mean(np.asarray(parts), 256 * 256)
    for i, n in enumerate(names):
        want = frozen.EINSTEIN_SUITE[n]
        assert abs(packed_scores[i] - want) < frozen.GLOBAL_TOLERANCE_F32, (
            n, packed_scores[i], want,
        )


def test_packed_data_range_guard(rng):
    """The packed path enforces the same data_range floor as the
    standard path (c1*c2 denormal-flushes below it), both directly and
    through the auto route (a review found the batched route silently
    returning garbage where the single-image call raised)."""
    a = rng.integers(0, 256, (4, 32, 32), dtype=np.uint8)
    with pytest.raises(ValueError):
        ssim_parts_pallas_packed(a, a.copy(), data_range=1e-8, interpret=True)
    from ssim_tpu.errors import InvalidArgumentError

    with pytest.raises((ValueError, InvalidArgumentError)):
        api.compute_ssim(a, a.copy(), impl="pallas", data_range=1e-8)


def test_packed_rejects_oversize_pixel_count():
    """h*w >= 2^24 would make the f32 per-image count inexact; the packed
    path enforces its own invariant rather than relying on the auto
    route's gate."""
    import jax

    from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas_packed

    a = jax.ShapeDtypeStruct((2, 4096, 4096), np.uint8)
    with pytest.raises(ValueError, match="2\\^24"):
        jax.eval_shape(
            lambda x: ssim_parts_pallas_packed(x, x, interpret=True), a
        )


def test_packed_relaxed_loose_tier(rng):
    """relaxed=True applies the loose mxu3x tier to the PACKED row width
    (wide even for small images): results stay inside the loose envelope
    per image, and the padding-slot identity (SSIM(x,x)==1 bitwise, any
    blur tier) keeps remainder slots from leaking into real scores."""
    pairs = [random_pair(rng, 40, 60) for _ in range(5)]  # odd batch: pad slot
    a = np.stack([p[0] for p in pairs])
    b = np.stack([p[1] for p in pairs])
    parts = np.asarray(ssim_parts_pallas_packed(a, b, interpret=True,
                                                relaxed=True))
    got = engine.finalize_mean(parts, 40 * 60)
    for i in range(5):
        want, _ = reference.compute_ssim(a[i], b[i])
        assert abs(float(got[i]) - want) < 1e-4, (i, float(got[i]), want)
