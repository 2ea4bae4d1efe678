"""Round-5 probe (VERDICT r4 #5): MS-SSIM per-component device times at
HEAD, to re-derive the post-pooled-fusion ceiling. Measures each pyramid
piece alone under the carried-perturbation methodology, then the whole
module, at u8 1080p b4 (the bench config).
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

from ssim_tpu.models.msssim import _downsample2, ms_ssim
from ssim_tpu.ops.ssim_pallas import (
    ssim_components_pallas,
    ssim_components_pooled_pallas,
)

rng = np.random.default_rng(7)
H, W, B = 1080, 1920, 4
N = H * W * B


def measured_ms(body, a0, b0, iters=48):
    @jax.jit
    def run(a, b, it):
        def loop(i, state):
            a_c, acc = state
            a_c = jax.lax.dynamic_update_index_in_dim(
                a_c, (a_c[0, 0, 0] + 1).astype(a_c.dtype)[None, None], 0, 0
            )
            acc = acc + body(a_c, b)
            return (a_c, acc)

        _, acc = jax.lax.fori_loop(0, it, loop, (a, jnp.float32(0.0)))
        return acc

    short, long_ = max(1, iters // 8), iters
    for it in (short, long_):
        assert np.isfinite(float(run(a0, b0, it)))

    def t(it):
        t0 = time.perf_counter()
        float(run(a0, b0, it))
        return time.perf_counter() - t0

    samples = []
    for _ in range(5):
        ts = min(t(short) for _ in range(3))
        tl = min(t(long_) for _ in range(3))
        if tl - ts > 0.01 * tl:
            samples.append((tl - ts) / (long_ - short) * 1e3)
    return float(np.median(samples)) if samples else float("nan")


a8 = jax.device_put(rng.integers(0, 256, (B, H, W)).astype(np.uint8))
b8 = jax.device_put(rng.integers(0, 256, (B, H, W)).astype(np.uint8))

rows = []


def piece(name, body, a0, b0, iters=48):
    ms = measured_ms(body, a0, b0, iters)
    rows.append((name, ms))
    print(f"{name:42s} {ms:7.4f} ms/call", flush=True)


# whole module
piece("ms_ssim u8 1080p b4 (module)",
      lambda x, y: jnp.sum(ms_ssim(x, y)), a8, b8)

# scale 0: pooled components kernel (u8)
piece("scale0 pooled-components kernel",
      lambda x, y: jnp.sum(ssim_components_pooled_pallas(x, y)[0])
      + jnp.sum(ssim_components_pooled_pallas(x, y)[1][0, 0]) * 0.0,
      a8, b8)

# f32 scales alone
shapes = [(540, 960), (270, 480), (135, 240), (67, 120)]
for hs, ws in shapes:
    af = jax.device_put(rng.random((B, hs, ws)).astype(np.float32) * 255)
    bf = jax.device_put(rng.random((B, hs, ws)).astype(np.float32) * 255)
    piece(f"scale kernel {hs}x{ws} f32",
          lambda x, y: jnp.sum(ssim_components_pallas(
              x, y, allow_float=True)),
          af, bf, iters=64)

# downsample pairs between f32 scales
for hs, ws in shapes[:-1]:
    af = jax.device_put(rng.random((B, hs, ws)).astype(np.float32) * 255)
    bf = jax.device_put(rng.random((B, hs, ws)).astype(np.float32) * 255)
    piece(f"reduce_window pool pair {hs}x{ws}",
          lambda x, y: jnp.sum(_downsample2(x)) + jnp.sum(_downsample2(y)),
          af, bf, iters=64)

total_pieces = sum(ms for name, ms in rows[1:])
module = rows[0][1]
print(f"\nsum of pieces = {total_pieces:.4f} ms vs module {module:.4f} ms "
      f"(residual = dispatch/pow/product tail)", flush=True)
print(f"module throughput = {N / module / 1e3:.1f} Mpix/s", flush=True)
