"""Round-5 probe (VERDICT r4 #3): where does the packed small-batch
path spend its time? Splits the 64^2/128^2 cases into (a) the HBM
pack() relayout alone, (b) the fused kernel on PRE-packed rows, (c) the
full packed path, (d) the standard unpacked kernel, under the honest
carried-perturbation methodology. If (a) is a material share of (c),
the lever is killing the relayout (in-kernel packing or a gather
BlockSpec), not the kernel itself.
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

from ssim_tpu.ops.ssim_pallas import (
    RADIUS,
    _nopad_overlap_call,
    _pick_tile_h,
    gaussian_taps,
    pack_count,
    ssim_parts_pallas,
    ssim_parts_pallas_packed,
)

rng = np.random.default_rng(7)


def measured(body, a0, b0, n, iters=48):
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
        v = float(run(a0, b0, it))
        assert np.isfinite(v), v

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
    r = RADIUS
    pitch = w + 2 * r
    p = pack_count(w, batch)
    bp = -(-batch // p)
    pad_n = bp * p - batch

    def pack(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="edge")
        if pad_n:
            x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0)))
        return (
            x.reshape(bp, p, h, pitch)
            .transpose(0, 2, 1, 3)
            .reshape(bp, h, p * pitch)
        )

    taps = gaussian_taps(np.float32, r, 1.5)
    c1, c2 = 6.5025, 58.5225
    tile_h = _pick_tile_h(h, p * pitch)

    def pack_only(a_c, b_c):
        return (jnp.sum(pack(a_c).astype(jnp.float32)) +
                jnp.sum(pack(b_c).astype(jnp.float32)))

    pa, pb = jax.device_put(np.array(pack(xa))), jax.device_put(np.array(pack(xb)))

    def kernel_prepacked(a_c, b_c):
        colsums, _ = _nopad_overlap_call(
            a_c, b_c, h, p * pitch, taps, c1, c2,
            False, False, tile_h, colsum=True, clip_bound=131072.0,
        )
        return jnp.sum(colsums)

    def full(a_c, b_c):
        return jnp.sum(ssim_parts_pallas_packed(a_c, b_c)[:, 0])

    def unpacked(a_c, b_c):
        parts, _ = ssim_parts_pallas(a_c, b_c)
        return jnp.sum(parts)

    print(f"== {h}x{w} b{batch} (p={p}, packed row {p*pitch} lanes, "
          f"tile_h={tile_h}, grid cells {bp * (-(-h // tile_h))})", flush=True)
    for name, body, aa, bb in (
        ("pack relayout only     ", pack_only, xa, xb),
        ("kernel on pre-packed   ", kernel_prepacked, pa, pb),
        ("full packed path       ", full, xa, xb),
        ("standard unpacked      ", unpacked, xa, xb),
    ):
        v = measured(body, aa, bb, n)
        print(f"  {name} {v:9.1f} Mpix/s", flush=True)


run_shape(64, 64, 4096)
run_shape(128, 128, 1024)
