"""Gutterless lane-packed batch path (ssim_parts_pallas_bpacked, round 5).

Small batched images are packed side by side WITHOUT gutters: per-image
clamp-to-edge borders (the reference rule, src/ssim.cpp:540-555) are
folded into per-128-lane-chunk block-diagonal tap matrices
(packed_chunk_matrices), so no window ever crosses an image boundary
even though boundary taps sit in the same vreg chunk. All four
horizontal blurs run on the MXU; the mu blurs of u8 inputs use the
integer-exact 3-term bf16 matrix split (horizontal-first on the
bf16-exact raw band). Test batches stay tiny — the per-chunk matmul
unrolling makes interpret-mode compiles expensive at wide packed rows.
"""

import numpy as np
import pytest

from conftest import random_pair
from ssim_tpu import engine, reference
from ssim_tpu.ops.ssim_pallas import (
    bpack_count,
    packed_chunk_matrices,
    ssim_parts_pallas_bpacked,
)
from ssim_tpu.windows import gaussian_taps


@pytest.mark.parametrize(
    "batch,shape",
    [
        (4, (64, 64)),     # pow-2 width: image boundaries ON chunk edges
        (3, (33, 47)),     # ragged h, odd w: boundaries INSIDE chunks
        (2, (30, 200)),    # w > 128: one image spans multiple chunks
        (5, (11, 11)),     # window-sized images
        (3, (50, 1)),      # width-1 degenerate
    ],
)
def test_bpacked_matches_oracle(rng, batch, shape):
    h, w = shape
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    noise = rng.normal(0, 12, a.shape)
    b = np.clip(a.astype(np.int32) + noise.astype(np.int32), 0, 255).astype(np.uint8)
    parts = ssim_parts_pallas_bpacked(a, b, interpret=True)
    assert parts.shape == (batch, 2)
    got = engine.finalize_mean(np.asarray(parts), h * w)
    tol = max(2e-6, 3e-3 / (h * w) ** 0.5)
    for i in range(batch):
        want, _ = reference.compute_ssim(a[i], b[i])
        assert abs(float(got[i]) - want) < tol, (i, float(got[i]), want)


def test_bpacked_remainder_batch(rng):
    """B not divisible by the pack count: zero-padded slots must drop
    without perturbing real scores. w=2048 forces p=2 so batch=5 pads."""
    h, w, batch = 16, 2048, 5
    assert bpack_count(w, batch) == 2
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = np.clip(
        a.astype(np.int32) + rng.normal(0, 10, a.shape).astype(np.int32), 0, 255
    ).astype(np.uint8)
    parts = ssim_parts_pallas_bpacked(a, b, interpret=True)
    got = engine.finalize_mean(np.asarray(parts), h * w)
    for i in range(batch):
        want, _ = reference.compute_ssim(a[i], b[i])
        assert abs(float(got[i]) - want) < 2e-6


def test_bpacked_identical_pairs_are_one(rng):
    import jax

    a = rng.integers(0, 256, (5, 32, 32), dtype=np.uint8)
    parts = np.asarray(ssim_parts_pallas_bpacked(a, a.copy(), interpret=True))
    got = engine.finalize_mean(parts, 32 * 32)
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(parts[:, 0], np.zeros(5, np.float32))
        np.testing.assert_array_equal(got, np.ones(5))
    else:
        assert np.abs(parts[:, 0]).max() < 1e-4
        np.testing.assert_allclose(got, np.ones(5), rtol=0, atol=1e-7)


def test_bpacked_custom_window(rng):
    """radius/sigma/k1/k2 ride the chunk matrices (clamp folded for any
    taps)."""
    for radius, sigma, k1, k2 in [(3, 0.9, 0.02, 0.05), (8, 2.5, 0.01, 0.03)]:
        h, w, batch = 40, 96, 3
        a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
        b = np.clip(
            a.astype(np.int32) + rng.normal(0, 10, a.shape).astype(np.int32),
            0, 255,
        ).astype(np.uint8)
        parts = ssim_parts_pallas_bpacked(
            a, b, interpret=True, radius=radius, sigma=sigma, k1=k1, k2=k2
        )
        got = engine.finalize_mean(np.asarray(parts), h * w)
        for i in range(batch):
            want, _ = reference.compute_ssim(
                a[i], b[i], radius=radius, sigma=sigma, k1=k1, k2=k2
            )
            assert abs(float(got[i]) - want) < 2e-6


def test_bpacked_float_and_nan_isolation(rng):
    batch, h, w = 4, 48, 64
    a = rng.random((batch, h, w)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    a[2, 10, 20] = np.nan
    parts = ssim_parts_pallas_bpacked(
        a, b, data_range=1.0, interpret=True, allow_float=True
    )
    got = engine.finalize_mean(np.asarray(parts), h * w)
    assert np.isnan(got[2])
    for i in (0, 1, 3):
        assert np.isfinite(got[i])
        want, _ = reference.compute_ssim(a[i], b[i], data_range=1.0)
        assert abs(float(got[i]) - want) < 2e-6


def test_bpacked_precise_tier(rng):
    """precise=True: df32 formula + compensated column/segment sums.
    Must land ~1e-9 global vs the f64 oracle (interpret mode; the
    hardware MXU-HIGHEST envelope is validated in tools/hw_bpack.py)."""
    for h, w, batch in [(64, 64, 3), (37, 100, 3)]:
        a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
        b = np.clip(
            a.astype(np.int32) + rng.normal(0, 10, a.shape).astype(np.int32),
            0, 255,
        ).astype(np.uint8)
        parts = ssim_parts_pallas_bpacked(a, b, interpret=True, precise=True)
        assert parts.shape == (batch, 3)
        got = engine.finalize_mean(np.asarray(parts), h * w)
        for i in range(batch):
            want, _ = reference.compute_ssim(a[i], b[i])
            assert abs(float(got[i]) - want) < 5e-8, (i, float(got[i]), want)


def test_bpacked_relaxed_loose_tier(rng):
    """relaxed=True (bf16-split heavy blurs) stays inside the loose
    tier's 1e-4 envelope (same tier as test_packed_relaxed_loose_tier).
    INDEPENDENT random images are the adversarial content: compiled on
    v5e the error reaches ~3.5e-5 (uncorrelated noise maximizes the
    squared-signal magnitudes whose 2-term bf16 split the tier drops),
    vs ~2.6e-8 on correlated pairs (tools/hw_bpack.py)."""
    h, w, batch = 64, 64, 3
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    parts = ssim_parts_pallas_bpacked(a, b, interpret=True, relaxed=True)
    got = engine.finalize_mean(np.asarray(parts), h * w)
    for i in range(batch):
        want, _ = reference.compute_ssim(a[i], b[i])
        assert abs(float(got[i]) - want) < 1e-4


def test_bpacked_rejections(rng):
    a, b = random_pair(rng, 32, 32)
    with pytest.raises(ValueError):
        ssim_parts_pallas_bpacked(a, b)  # 2-D: needs a batch
    af = a.astype(np.float32)
    with pytest.raises(ValueError):
        ssim_parts_pallas_bpacked(af[None], af[None])  # uint8 only
    with pytest.raises(ValueError):
        ssim_parts_pallas_bpacked(
            a[None], b[None], interpret=True, precise=True, relaxed=True
        )


def test_chunk_matrices_partition_of_unity():
    """Every output lane's taps sum to 1 (clamp folding conserves mass),
    and no weight crosses an image boundary."""
    for w, p, radius in [(64, 4, 5), (47, 3, 5), (200, 2, 8), (1, 6, 5)]:
        taps = gaussian_taps(np.float32, radius, 1.5)
        m = packed_chunk_matrices(w, p, taps)
        total = p * w
        nchunk = m.shape[0]
        # reconstruct the dense (in_lane, out_lane) matrix
        dense = np.zeros((total + 2 * radius + nchunk * 128 - total, total))
        for c in range(nchunk):
            for j in range(128):
                u = 128 * c + j
                if u >= total:
                    continue
                dense[128 * c : 128 * c + m.shape[1], u] += m[c, :, j]
        col_sums = dense.sum(axis=0)
        np.testing.assert_allclose(col_sums, 1.0, rtol=0, atol=1e-6)
        for u in range(total):
            img = u // w
            rows = np.nonzero(dense[:, u])[0]
            # band row k corresponds to global input lane k - radius
            lanes = rows - radius
            assert lanes.min() >= img * w and lanes.max() < (img + 1) * w, (
                w, p, u, lanes.min(), lanes.max()
            )
