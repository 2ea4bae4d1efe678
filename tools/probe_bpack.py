"""Round-5 probe (VERDICT r4 #3): 3-D batch-block kernel for small-image
batches — no HBM relayout, no gutters, no segment reduce. Each grid cell
consumes p whole images as a (p, tile_h, w) block straight from the raw
(B, H, W) batch; the vertical blur is one dot_general contracting the
band axis (output lands (tile_h, p, w)); the horizontal blur contracts
the last axis with a clamp-folded (w, w) tap matrix (exact per-image
border semantics, reference rule src/ssim.cpp:540-555, no windows cross
images by construction); per-image (ssim - 1) sums come out directly.
Correctness is checked against ssim_parts_pallas per image; throughput
under the carried-perturbation methodology vs the round-4 packed path.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssim_tpu.config import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssim_tpu.ops.ssim_pallas import (
    RADIUS,
    _FAST_PATH_BUDGET,
    _halo_rows,
    _ssim_from_blurs,
    clamped_band_matrices,
    gaussian_taps,
    ssim_parts_pallas,
    ssim_parts_pallas_packed,
)

rng = np.random.default_rng(11)


def hpass_clamped_matrix(w, taps):
    r = len(taps) // 2
    m = np.zeros((w, w), np.float32)
    for u in range(w):
        for d in range(-r, r + 1):
            m[min(max(u + d, 0), w - 1), u] += taps[d + r]
    return m


@functools.partial(
    jax.jit, static_argnames=("p", "tile_h", "interpret")
)
def bpack_parts(a, b, p, tile_h, interpret=False):
    """Per-image (ssim-1)+h*w sums for a (B, h, w) u8 batch, B % p == 0."""
    batch, h, w = a.shape
    taps = gaussian_taps(np.float32, RADIUS, 1.5)
    c1, c2 = 6.5025, 58.5225
    r = RADIUS
    hb = _halo_rows(r)
    nh = -(-h // tile_h)
    band = tile_h + 2 * hb
    bp = batch // p
    vmats = jnp.asarray(clamped_band_matrices(tile_h, band, taps, h, nh, hb))
    hmat = jnp.asarray(hpass_clamped_matrix(w, taps))

    def kernel(vm_ref, hm_ref, ap_ref, ac_ref, an_ref, bp_ref, bc_ref, bn_ref,
               sum_ref):
        vm = vm_ref[0]
        hm = hm_ref[...]

        def band_of(prev_ref, cur_ref, nxt_ref):
            raw = jnp.concatenate(
                [prev_ref[:, tile_h - hb:], cur_ref[...], nxt_ref[:, :hb]],
                axis=1,
            )
            return raw.astype(jnp.int32).astype(jnp.float32)

        af = band_of(ap_ref, ac_ref, an_ref)
        bf = band_of(bp_ref, bc_ref, bn_ref)
        s = af + bf
        d = af - bf

        def vpass(x):  # (p, band, w) -> (tile_h, p, w)
            return jax.lax.dot_general(
                vm, x, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def hpass(y):  # (tile_h, p, w) -> (tile_h, p, w)
            return jax.lax.dot_general(
                y, hm, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        blurs = (
            hpass(vpass(af)),
            hpass(vpass(bf)),
            hpass(vpass(s * s)),
            hpass(vpass(d * d)),
        )
        ssim = _ssim_from_blurs(*blurs, c1, c2)
        sum_ref[0, 0, 0] = jnp.sum(ssim - 1.0, axis=(0, 2))

    def spec(di):
        if di < 0:
            index = lambda bi, i: (bi, max(0, 0) if False else 0, 0)
        if di < 0:
            index = lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0)
        elif di > 0:
            index = lambda bi, i: (bi, jnp.minimum(i + 1, nh - 1), 0)
        else:
            index = lambda bi, i: (bi, i, 0)
        return pl.BlockSpec((p, tile_h, w), index, memory_space=pltpu.VMEM)

    specs = [spec(-1), spec(0), spec(1)]
    vm_spec = pl.BlockSpec((1, tile_h, band), lambda bi, i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    hm_spec = pl.BlockSpec((w, w), lambda bi, i: (0, 0),
                           memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        kernel,
        grid=(bp, nh),
        in_specs=[vm_spec, hm_spec] + specs + specs,
        out_shape=jax.ShapeDtypeStruct((bp, nh, 1, p), jnp.float32),
        out_specs=pl.BlockSpec((1, 1, 1, p), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(vmats, hmat, a, a, a, b, b, b)
    return sums.reshape(bp, nh, p).sum(axis=1).reshape(-1) + np.float32(h * w)


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


def check(h, w, batch=8, p=4, tile_h=32):
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = (a + rng.integers(-30, 30, a.shape)).clip(0, 255).astype(np.uint8)
    got = np.array(bpack_parts(jnp.asarray(a), jnp.asarray(b), p, tile_h))
    parts, _ = ssim_parts_pallas(jnp.asarray(a), jnp.asarray(b))
    want = np.array(parts.sum(axis=1))
    err = np.abs(got - want).max() / (h * w)
    tag = "PASS" if err < 2e-6 else "FAIL"
    print(f"check {h}x{w} b{batch} p{p} t{tile_h}: maxerr/px {err:.2e} {tag}",
          flush=True)
    return err < 2e-6


def run_shape(h, w, batch):
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    xa, xb = jax.device_put(a), jax.device_put(b)
    n = batch * h * w
    for tile_h in (32, 64) if h >= 64 else (32,):
        budget_p = _FAST_PATH_BUDGET // (tile_h * w)
        for p in sorted({8, 16, 32, 64, budget_p}):
            if p > budget_p or batch % p or p * w > 8192:
                continue
            body = lambda a_c, b_c, p=p, t=tile_h: jnp.sum(
                bpack_parts(a_c, b_c, p, t)
            )
            try:
                v = measured(body, xa, xb, n)
                print(f"{h}x{w} b{batch} bpack p={p:3d} t={tile_h} "
                      f"{v:9.1f} Mpix/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{h}x{w} b{batch} bpack p={p:3d} t={tile_h} "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)

    def packed(a_c, b_c):
        return jnp.sum(ssim_parts_pallas_packed(a_c, b_c)[:, 0])

    v = measured(packed, xa, xb, n)
    print(f"{h}x{w} b{batch} packed(round-4)  {v:9.1f} Mpix/s", flush=True)


ok = check(64, 64) and check(64, 64, tile_h=64) and check(100, 96, p=8) \
    and check(128, 128, batch=8, p=8)
if not ok:
    sys.exit(1)
run_shape(64, 64, 4096)
run_shape(128, 128, 1024)
run_shape(96, 96, 1024)
