"""Experiment: mu horizontal passes on the MXU too (SSIM_TPU_MU_MXU=1).

The round-3 MXU lane mode deliberately keeps mu_a/mu_b horizontal blurs
on the VPU so the two units overlap (docs/RESULTS.md "The MXU lane
mode"). This measures the alternative — all four hpasses as chunked
banded matmuls — plus its accuracy vs the f64 oracle.

Run twice from the repo root:
    SSIM_TPU_MU_MXU=0 python tools/mu_mxu_exp.py
    SSIM_TPU_MU_MXU=1 python tools/mu_mxu_exp.py
(env read at import; separate processes give clean head-to-heads)
"""
import os
import sys

sys.path.insert(0, os.getcwd())

import numpy as np

from ssim_tpu.testing.devicebench import device_throughput
from ssim_tpu import reference
from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas, finalize_parts

mode = os.environ.get("SSIM_TPU_MU_MXU", "0")
print(f"SSIM_TPU_MU_MXU={mode}")

# Accuracy spot-check vs the f64 oracle (only meaningful for mode=1).
import jax

rng = np.random.default_rng(11)
a = rng.integers(0, 256, (1, 256, 384), dtype=np.uint8)
b = np.clip(
    a.astype(np.int16) + rng.normal(0, 8, a.shape).astype(np.int16), 0, 255
).astype(np.uint8)
interpret = jax.devices()[0].platform != "tpu"
parts, m = ssim_parts_pallas(a, b, with_map=True, interpret=interpret)
g = finalize_parts(parts, a.shape[-2] * a.shape[-1])
og, omap = reference.compute_ssim(a[0], b[0], with_map=True)
print(
    f"accuracy 256x384: global {abs(float(g[0]) - og):.2e} "
    f"pixel {np.max(np.abs(np.asarray(m[0], np.float64) - omap)):.2e}"
)

for label, kw in [
    ("1080p b4 nomap", dict(h=1080, w=1920, batch=4)),
    ("1080p b4 map", dict(h=1080, w=1920, batch=4, with_map=True)),
    ("4K b2 nomap", dict(h=2160, w=3840, batch=2)),
    ("8K b1 nomap", dict(h=4320, w=7680, batch=1, iters=64)),
]:
    v = device_throughput(impl="pallas", **kw)
    print(f"{label}: {v:.0f} Mpix/s", flush=True)
