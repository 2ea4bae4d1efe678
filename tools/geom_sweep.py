"""Geometry sweep of the standard fused path on real TPU.

The bench headline is the best *standard-accuracy* single-chip config;
the round-3 MXU experiment saw 18.1 Gpix/s at 2560-wide (3x variant),
which suggests the standard path's optimum geometry may not be among
the current bench configs (4K b4 = 13.9). Sweep widths/batches around
the VMEM/lane-budget sweet spots and print a table.
"""

import sys

from ssim_tpu.config import enable_compile_cache
from ssim_tpu.testing.devicebench import device_throughput

enable_compile_cache()

CONFIGS = [
    # (name, batch, h, w, iters)
    ("2560w_b1", 1, 1440, 2560, 128),
    ("2560w_b4", 4, 1440, 2560, 128),
    ("2560w_b8", 8, 1440, 2560, 96),
    ("3072w_b4", 4, 1728, 3072, 96),
    ("4k_b8", 8, 2160, 3840, 96),
    ("4k_b2", 2, 2160, 3840, 128),
    ("1080_b8", 8, 1080, 1920, 128),
    ("1080_b16", 16, 1080, 1920, 96),
    ("5120w_b2", 2, 2880, 5120, 64),
]

only = sys.argv[1:] or None
for name, b, h, w, it in CONFIGS:
    if only and name not in only:
        continue
    try:
        v = device_throughput(impl="pallas", with_map=False, batch=b, h=h,
                              w=w, iters=it)
        print(f"{name:12s} {v:9.1f} Mpix/s", flush=True)
    except Exception as e:
        print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
