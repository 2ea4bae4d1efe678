"""Compiled-on-TPU validation of the WIDE float32 fast path (ADVICE r4 #3).

Round 4 widened the fast path to 16384 lanes and admitted float32 images
to the full width, but the 32/64/100 MiB scoped-VMEM tiers were swept on
u8 only — float working sets are ~4x u8's (six f32 input blocks instead
of u8), so f32 widths near 12-16K risked an unvalidated scoped-VMEM
compile failure. This script compiles the f32 fast path at the tier
boundaries on the real chip, checks accuracy vs the f64 oracle, and
measures throughput:

  timeout 1800 python tools/hw_f32wide.py

Paste the summary into docs/RESULTS.md ("f32 wide fast path on
hardware", round 5).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssim_tpu.config import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)
assert jax.default_backend() != "cpu", "this script wants the real chip"

from ssim_tpu import reference
from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

rng = np.random.default_rng(19)
fails = 0

# Widths straddling the float vmem tiers (load = 32*(w+2r) vs
# _FLOAT_FAST_PATH_BUDGET=98304): 4096 -> 64 MiB tier boundary region,
# 8192/12288 -> 64 MiB, 16384 -> 100 MiB. h=128 keeps the oracle cheap
# while the kernel geometry (tile_h=32 grid) matches production.
for w, with_map in [(4096, True), (8192, False), (12288, False),
                    (16384, False), (16384, True)]:
    h = 128
    a = rng.random((h, w)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    name = f"f32 {h}x{w} {'map' if with_map else 'nomap'}"
    try:
        t0 = time.time()
        s, m = ssim_parts_pallas(aj, bj, with_map=with_map, allow_float=True,
                                 data_range=1.0)
        s = jax.block_until_ready(s)
        dt_compile = time.time() - t0
    except Exception as e:  # noqa: BLE001 — report compile failures as FAIL
        fails += 1
        print(f"{name:28s} COMPILE FAIL: {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        continue
    want, wmap = reference.compute_ssim(a, b, with_map=True, data_range=1.0)
    got = float(np.asarray(s).sum()) / (h * w)
    err = abs(got - want)
    merr = (float(jnp.abs(m - wmap).max())
            if with_map and m is not None else 0.0)
    # Throughput (median of 5 reps of a 32-iter loop).
    iters = 32

    @jax.jit
    def loop(xa, xb):
        def body(i, acc):
            rows, _ = ssim_parts_pallas(xa, xb, with_map=False,
                                        allow_float=True, data_range=1.0)
            return acc + jnp.sum(rows) + 0.0 * i
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(aj, bj))
    vals = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(aj, bj))
        vals.append(time.perf_counter() - t0)
    gpix = h * w * iters / float(np.median(vals)) / 1e9
    ok = err < 2e-6 and merr < 4e-6
    fails += not ok
    print(f"{name:28s} score_err={err:.2e} map_err={merr:.2e} "
          f"{gpix:6.2f} Gpix/s (compile {dt_compile:.0f}s) "
          f"{'PASS' if ok else 'FAIL'}", flush=True)

print(f"\nf32 wide fast path: "
      f"{'ALL PASS' if not fails else f'{fails} FAILURES'}", flush=True)
sys.exit(1 if fails else 0)
