"""Window-constant tests: pin the Gaussian window against the reference's
frozen 21-coefficient table (src/ssim_sse.cpp:204-212)."""

import numpy as np

from ssim_tpu import windows


def test_taps_normalized_and_symmetric():
    t = windows.gaussian_taps(np.float64)
    assert t.shape == (11,)
    assert abs(t.sum() - 1.0) < 1e-15
    np.testing.assert_array_equal(t, t[::-1])


def test_outer_product_matches_frozen_21():
    """The separable factorization must reproduce the reference's frozen
    normalized table; residual is the table's own f32 rounding (< 3e-9)."""
    k = windows.gaussian_kernel_2d(np.float64)
    idx = 0
    for y in range(6):
        for x in range(y + 1):
            want = windows.FROZEN_COEFFS_21[idx]
            got = k[5 - y, 5 - x]
            assert abs(got - want) < 3e-9, (x, y, got, want)
            idx += 1


def test_frozen_kernel_reconstruction():
    k_frozen = windows.frozen_kernel_2d()
    k = windows.gaussian_kernel_2d(np.float64)
    assert abs(k_frozen.sum() - 1.0) < 1e-7
    assert np.abs(k - k_frozen).max() < 3e-9


def test_constants():
    # (0.01*255)^2 and (0.03*255)^2 computed exactly as the reference does
    # (src/ssim.cpp:956-960): k*L rounded once, then squared.
    assert windows.C1 == (0.01 * 255.0) ** 2
    assert windows.C2 == (0.03 * 255.0) ** 2
    assert abs(windows.C1 - 6.5025) < 1e-12
    assert abs(windows.C2 - 58.5225) < 1e-12
    assert windows.RADIUS == 5
    assert windows.SIGMA == 1.5
