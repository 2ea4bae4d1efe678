"""Round-5 probe (VERDICT r4 #3, small-image batch floor): would
row-axis stacking lift 64^2/128^2 batches? (B, h, w) -> (B/k, k*h, w) is
a FREE reshape view (contiguous rows), so if the kernel runs the tall
strips near full speed, a block-diagonal band-matrix variant (per-image
clamp folds, no gutter rows needed) plus per-row sums gives exact
per-image scores at this throughput. This probe measures the COST side
only: the reshaped strips ride the existing kernel (whole-strip clamp —
wrong scores at image seams, identical arithmetic shape). Honest
carried-perturbation methodology (devicebench-style).
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

from ssim_tpu.ops.routing import ssim_parts_auto
from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

rng = np.random.default_rng(7)


def measured(parts_fn, a0, b0, n, iters=32):
    @jax.jit
    def run(a, b, it):
        def body(i, state):
            a_c, acc = state
            a_c = jax.lax.dynamic_update_index_in_dim(
                a_c, (a_c[0, 0, 0] + 1).astype(a_c.dtype)[None, None], 0, 0
            )
            acc = acc + parts_fn(a_c, b)
            return (a_c, acc)

        _, acc = jax.lax.fori_loop(0, it, body, (a, jnp.float32(0.0)))
        return acc

    short, long_ = max(1, iters // 8), iters
    for it in (short, long_):
        v = float(run(a0, b0, it))
        assert np.isfinite(v)

    def timed(it):
        t0 = time.perf_counter()
        float(run(a0, b0, it))
        return time.perf_counter() - t0

    samples = []
    for _ in range(5):
        ts = min(timed(short) for _ in range(3))
        tl = min(timed(long_) for _ in range(3))
        if tl - ts > 0.01 * tl:
            samples.append(n * (long_ - short) / (tl - ts) / 1e6)
    return float(np.median(samples)) if samples else float("nan")


def run_shape(h, w, batch):
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    xa, xb = jax.device_put(a), jax.device_put(b)
    n = batch * h * w

    def auto_body(a_c, b_c):
        parts, _ = ssim_parts_auto(a_c, b_c)
        return jnp.sum(parts)

    v = measured(auto_body, xa, xb, n)
    print(f"{h}x{w} b{batch:5d} auto            {v:9.1f} Mpix/s", flush=True)

    for k in (2, 4, 8):
        if batch % k:
            continue

        def vs_body(a_c, b_c, k=k):
            av = a_c.reshape(batch // k, k * h, w)
            bv = b_c.reshape(batch // k, k * h, w)
            rows, _ = ssim_parts_pallas(av, bv, rowsum=True,
                                        max_tile_h=min(256, k * h))
            return jnp.sum(rows)

        try:
            v = measured(vs_body, xa, xb, n)
            print(f"{h}x{w} b{batch:5d} vstack k={k} "
                  f"(tile {min(256, k*h):3d}) {v:9.1f} Mpix/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{h}x{w} b{batch:5d} vstack k={k}: {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)


run_shape(64, 64, 4096)
run_shape(128, 128, 1024)
run_shape(256, 256, 256)
