"""Round-5 probe: gutterless packed path (ssim_parts_pallas_bpacked) vs
the round-4 gutter+relayout packed path vs the standard unpacked kernel,
on hardware, carried-perturbation methodology. Also sweeps the
BPACK_LANES row budget via max_tile_h-independent repacking and the
width frontier (does gutterless move the 224^2 packing crossover?).
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
    pack_preferred,
    ssim_parts_pallas,
    ssim_parts_pallas_bpacked,
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
            samples.append(n * (long_ - short) / (tl - ts) / 1e6)
    return float(np.median(samples)) if samples else float("nan")


def run_shape(h, w, batch, dtype=np.uint8, relaxed=False):
    a = rng.integers(0, 256, (batch, h, w)).astype(dtype)
    b = rng.integers(0, 256, (batch, h, w)).astype(dtype)
    xa, xb = jax.device_put(a), jax.device_put(b)
    n = batch * h * w
    fl = dtype == np.float32
    kw = dict(allow_float=True) if fl else {}
    tag = "f32" if fl else "u8"
    rtag = " relaxed" if relaxed else ""

    def bp_body(a_c, b_c):
        return jnp.sum(
            ssim_parts_pallas_bpacked(a_c, b_c, relaxed=relaxed, **kw)[:, 0]
        )

    def p4_body(a_c, b_c):
        return jnp.sum(
            ssim_parts_pallas_packed(a_c, b_c, relaxed=relaxed, **kw)[:, 0]
        )

    def std_body(a_c, b_c):
        parts, _ = ssim_parts_pallas(a_c, b_c, relaxed=relaxed, **kw)
        return jnp.sum(parts)

    rows = [("bpack(r5)", bp_body)]
    if pack_preferred(w, batch, itemsize=4 if fl else 1) or w <= 192:
        rows.append(("packed(r4)", p4_body))
    rows.append(("standard", std_body))
    for name, body in rows:
        try:
            v = measured(body, xa, xb, n)
            print(f"{h}x{w} b{batch} {tag}{rtag} {name:11s} {v:9.1f} Mpix/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{h}x{w} b{batch} {tag}{rtag} {name:11s} "
                  f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    shapes = [
        (64, 64, 4096),
        (128, 128, 1024),
        (96, 96, 1024),
        (224, 224, 256),
        (256, 256, 256),
        (32, 32, 8192),
    ]
    for h, w, batch in shapes:
        run_shape(h, w, batch)
    run_shape(64, 64, 4096, relaxed=True)
    run_shape(64, 64, 2048, np.float32)
    run_shape(128, 128, 512, np.float32)
