"""Pallas pad-and-align kernel vs jnp.pad ground truth."""

import numpy as np
import pytest

from ssim_tpu.dispatch import backend_platform
from ssim_tpu.ops.pad import COL_OFF, ROW_OFF, pad_align, pad_align_pallas, pad_align_xla


def _truth(x, hp, wp):
    return np.pad(
        x,
        ((0, 0), (ROW_OFF, hp - x.shape[1] - ROW_OFF),
         (COL_OFF, wp - x.shape[2] - COL_OFF)),
        mode="edge",
    )


@pytest.mark.parametrize(
    "shape,hp,wp",
    [
        ((2, 64, 128), 96, 384),
        ((1, 1080, 1920), 1120, 2176),
        ((3, 40, 256), 96, 512),
        ((1, 88, 128), 96, 384),  # h + ROW_OFF multiple of tile_h edge case
        ((1, 32, 128), 96, 384),  # minimal height, extra junk blocks
    ],
)
def test_pad_pallas_matches_jnp(rng, shape, hp, wp):
    x = rng.integers(0, 256, shape, dtype=np.uint8)
    got = np.asarray(
        pad_align_pallas(x, hp=hp, wp=wp, interpret=backend_platform() != "tpu")
    )
    np.testing.assert_array_equal(got, _truth(x, hp, wp))


def test_pad_dispatch_fallback(rng):
    """Unaligned geometry routes to the XLA pad with identical layout."""
    x = rng.integers(0, 256, (1, 37, 200), dtype=np.uint8)
    got = np.asarray(pad_align(x, 96, 512))
    np.testing.assert_array_equal(got, _truth(x, 96, 512))
    got_xla = np.asarray(pad_align_xla(x, 96, 512))
    np.testing.assert_array_equal(got_xla, _truth(x, 96, 512))


@pytest.mark.parametrize("seed", range(8))
def test_pad_fuzz(rng, seed):
    """Randomized aligned geometries vs jnp.pad."""
    r = np.random.default_rng(500 + seed)
    h = int(r.integers(4, 40)) * 8
    w = int(r.integers(1, 18)) * 128
    if h < 32:
        h = 32
    hp = ((h + ROW_OFF + 31) // 32 + int(r.integers(0, 3))) * 32
    wp = ((w + COL_OFF + 5 + 127) // 128 + int(r.integers(0, 3))) * 128
    x = r.integers(0, 256, (2, h, w), dtype=np.uint8)
    got = np.asarray(
        pad_align_pallas(x, hp=hp, wp=wp, interpret=backend_platform() != "tpu")
    )
    np.testing.assert_array_equal(got, _truth(x, hp, wp))
