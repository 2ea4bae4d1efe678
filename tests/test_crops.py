"""Cropped-geometry parity tests: the reference's bbb255 (255x63) and
bbb257 (257x65) cases (tests/rmgr-ssim-tests.cpp:430-465) crop the decoded
bbb360 frames via maxWidth/maxHeight to hit partial tiles and
non-vector-multiple widths. We reproduce the same crops: frozen-constant
agreement within the JPEG-decoder tolerance, exact differential agreement
vs the oracle on identical pixels."""

import os

import numpy as np
import pytest

from ssim_tpu import compute_ssim, reference
from ssim_tpu.testing import frozen
from ssim_tpu.utils import load_image

CASES = [
    ("bbb255", 255, 63, frozen.BBB255),
    ("bbb257", 257, 65, frozen.BBB257),
]


@pytest.mark.parametrize("name,mw,mh,table", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("quality_idx", [0, 10])
def test_cropped_frozen_and_differential(images_dir, name, mw, mh, table, quality_idx):
    png = load_image(os.path.join(images_dir, "big_buck_bunny_360_07806.png"))
    q = quality_idx * 10
    jpg = load_image(os.path.join(images_dir, f"big_buck_bunny_360_07806_{q:02d}.jpg"))
    for c in range(3):
        a = jpg[:mh, :mw, c]
        b = png[:mh, :mw, c]
        want_frozen = table[quality_idx][c]
        oracle, oracle_map = reference.compute_ssim(a, b, with_map=True)
        # Oracle vs frozen: limited by the JPEG decoder difference only.
        assert abs(oracle - want_frozen) < frozen.DECODER_TOLERANCE, (name, q, c)
        # Optimized paths vs oracle: strict.
        for impl in ("xla", "pallas"):
            got, got_map = compute_ssim(a, b, with_map=True, impl=impl)
            assert abs(got - oracle) < frozen.GLOBAL_TOLERANCE_F32, (impl, name, q, c)
            assert np.abs(got_map - oracle_map).max() < frozen.PIXEL_TOLERANCE_F32
