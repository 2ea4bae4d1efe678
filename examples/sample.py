"""Minimal usage sample — parity with sample/rmgr-ssim-sample.cpp:41-108.

Computes per-channel SSIM of two images and prints each channel's score,
demonstrating the interleaved-channel API.
"""

# Runnable straight from a source checkout (no install needed).
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from ssim_tpu import ImageView, compute_ssim
from ssim_tpu.utils import load_image


def main(argv):
    if len(argv) != 3:
        print(f"Usage: {argv[0]} <image1> <image2>", file=sys.stderr)
        return 1
    img1 = load_image(argv[1])
    img2 = load_image(argv[2])
    if img1.shape != img2.shape:
        print("Images must have identical dimensions", file=sys.stderr)
        return 1
    channels = 1 if img1.ndim == 2 else img1.shape[2]
    for c in range(channels):
        score = compute_ssim(
            ImageView.from_interleaved(img1, c),
            ImageView.from_interleaved(img2, c),
        )
        print(f"Channel {c}: SSIM = {score:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
