"""Measure SSIM_TPU_MU_MXU=1 (mu blurs on the MXU heavy path) vs default.

Run twice: once with the env unset, once with SSIM_TPU_MU_MXU=1 (the
flag is read at import time). Prints the two standard wide configs.
"""

import os

from ssim_tpu.config import enable_compile_cache
from ssim_tpu.testing.devicebench import device_throughput

enable_compile_cache()
tag = "mu_mxu" if os.environ.get("SSIM_TPU_MU_MXU") == "1" else "default"
for name, kw in [
    ("1080_b4", dict(batch=4, h=1080, w=1920, iters=128)),
    ("4k_b4", dict(batch=4, h=2160, w=3840, iters=96)),
]:
    v = device_throughput(impl="pallas", with_map=False, **kw)
    print(f"{tag:8s} {name:8s} {v:9.1f} Mpix/s", flush=True)
