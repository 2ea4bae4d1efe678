"""Round-5 probe: cost of MATERIALIZED packing relayouts for small-image
batches. The packed path's gap (full 6.4 vs pre-packed-kernel 11.9
Gpix/s at 64^2 b4096) is the HBM relayout; this measures formulations
as actually materialized (accumulated into a carried packed-shape
buffer so XLA cannot elide the transpose), per call for BOTH inputs.

- r4: edge-pad lanes to pitch=w+2r (74-byte granule) + transpose
- g0: transpose at raw w (pow-2 granule), no pad — the gutterless
  candidate layout
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

rng = np.random.default_rng(3)
R = 5


def timeit(fn, *args, iters=64):
    run = jax.jit(fn, static_argnums=())
    out = run(*args, iters)
    jax.block_until_ready(out)
    short = max(1, iters // 8)
    outs = run(*args, short)
    jax.block_until_ready(outs)

    def t(it):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args, it))
        return time.perf_counter() - t0

    samples = []
    for _ in range(5):
        ts = min(t(short) for _ in range(3))
        tl = min(t(iters) for _ in range(3))
        if tl - ts > 0.01 * tl:
            samples.append((tl - ts) / (iters - short))
    return float(np.median(samples)) * 1e3 if samples else float("nan")


def run_shape(h, w, batch, p):
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    xa = jax.device_put(a)
    bp = -(-batch // p)
    pad_n = bp * p - batch
    pitch = w + 2 * R

    def pack_r4(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (R, R)), mode="edge")
        if pad_n:
            x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0)))
        return (
            x.reshape(bp, p, h, pitch)
            .transpose(0, 2, 1, 3)
            .reshape(bp, h, p * pitch)
        )

    def pack_g0(x):
        if pad_n:
            x = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0)))
        return (
            x.reshape(bp, p, h, w)
            .transpose(0, 2, 1, 3)
            .reshape(bp, h, p * w)
        )

    for name, fn in (("r4 pad+transpose", pack_r4), ("g0 raw transpose", pack_g0)):
        shape = jax.eval_shape(fn, xa).shape

        def body(x, it, fn=fn, shape=shape):
            def loop(i, state):
                x_c, acc = state
                x_c = jax.lax.dynamic_update_index_in_dim(
                    x_c, (x_c[0, 0, 0] + 1).astype(x_c.dtype)[None, None], 0, 0
                )
                # accumulate in u8 (wraparound fine): forces the packed
                # array to be produced into acc each iteration
                acc = acc + fn(x_c)
                return (x_c, acc)

            init = jnp.zeros(shape, jnp.uint8)
            _, acc = jax.lax.fori_loop(0, it, loop, (x, init))
            return acc

        ms = timeit(body, xa)
        print(f"{h}x{w} b{batch} p={p:3d} {name}: {ms:7.3f} ms/input "
              f"({2*ms:.3f} per pair)", flush=True)


run_shape(64, 64, 4096, 56)
run_shape(64, 64, 4096, 64)
run_shape(128, 128, 1024, 30)
run_shape(128, 128, 1024, 32)
