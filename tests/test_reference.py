"""Oracle validation against the reference's frozen quad-precision scalars
(tests/rmgr-ssim-tests.cpp:352-465) — the oracle must be right before it can
judge the optimized paths (same self-validation the reference applies to its
naive impl at tests/rmgr-ssim-tests.cpp:286-287)."""

import os

import numpy as np
import pytest

from ssim_tpu import reference
from ssim_tpu.testing import frozen
from ssim_tpu.utils import load_image


def test_einstein_suite_exact(images_dir):
    """PNG inputs decode losslessly -> oracle must match frozen constants
    to the reference's own REF_TOLERANCE."""
    ref = load_image(os.path.join(images_dir, "einstein.png"))
    assert ref.shape == (256, 256)
    for name, want in frozen.EINSTEIN_SUITE.items():
        img = load_image(os.path.join(images_dir, name))
        got, _ = reference.compute_ssim(img, ref)
        assert abs(got - want) < frozen.ORACLE_TOLERANCE, (name, got, want)


@pytest.mark.parametrize("quality_idx", [0, 5, 10])
def test_bbb360_decoder_tolerance(images_dir, quality_idx):
    """JPEG-decoded inputs: PIL's IDCT differs from stb's by ±1/sample, so
    only DECODER_TOLERANCE agreement is expected (see frozen.py)."""
    png = load_image(os.path.join(images_dir, "big_buck_bunny_360_07806.png"))
    q = quality_idx * 10
    jpg = load_image(
        os.path.join(images_dir, f"big_buck_bunny_360_07806_{q:02d}.jpg")
    )
    for c in range(3):
        got, _ = reference.compute_ssim(jpg[:, :, c], png[:, :, c])
        want = frozen.BBB360[quality_idx][c]
        assert abs(got - want) < frozen.DECODER_TOLERANCE, (q, c, got, want)


def test_identical_images_give_one(rng):
    a = rng.integers(0, 256, (64, 48), dtype=np.uint8)
    got, m = reference.compute_ssim(a, a, with_map=True)
    assert got == pytest.approx(1.0, abs=1e-12)
    assert np.allclose(m, 1.0, atol=1e-12)


def test_map_matches_global(rng):
    a = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    b = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    g, m = reference.compute_ssim(a, b, with_map=True)
    assert m.shape == (40, 56)
    assert g == pytest.approx(float(m.mean(dtype=np.float64)), abs=1e-15)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        reference.compute_ssim(np.zeros((4, 4)), np.zeros((4, 5)))


@pytest.mark.parametrize("quality_idx", [0, 10])
def test_bbb1080_decoder_tolerance(images_dir, quality_idx):
    """Full-production-size (1920x1080) frozen-constant check
    (tests/rmgr-ssim-tests.cpp:410-423), decoder-tolerance limited."""
    png = load_image(os.path.join(images_dir, "big_buck_bunny_1080_07806.png"))
    q = quality_idx * 10
    jpg = load_image(
        os.path.join(images_dir, f"big_buck_bunny_1080_07806_{q:02d}.jpg")
    )
    assert png.shape == (1080, 1920, 3)
    for c in range(3):
        got, _ = reference.compute_ssim(jpg[:, :, c], png[:, :, c])
        want = frozen.BBB1080[quality_idx][c]
        assert abs(got - want) < frozen.DECODER_TOLERANCE, (q, c, got, want)
