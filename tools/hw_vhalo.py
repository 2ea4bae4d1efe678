"""Compiled-on-TPU validation of the vhalo kernel mode (VERDICT r4 #1).

The vhalo mode (spatial sharding's zero-copy halo operands,
ssim_parts_pallas(vhalo=...)) landed in the round-4 snapshot with
CPU-interpret validation only. This repo's history says interpret-green
is not enough (the 0*inf=NaN float-garbage bug was invisible to
interpret mode — docs/RESULTS.md "Full test suite on real TPU"), so this
script compiles every vhalo configuration on the real chip and checks it
against the f64 oracle:

  timeout 1200 python tools/hw_vhalo.py

Ground truth: the oracle map of the halo-CONCATENATED window (h + 2r
rows), restricted to rows [r, r+h) — those rows read only true content,
so they equal the global image's map on the local window exactly.

Covers: u8 fast path (plain / ragged-splice / radius-16 / batched
non-128-multiple), f32 fast path, the chunked wide fallback, the
edge-replica == clamped identity, rowsum AND with_map outputs.
Prints PASS/FAIL per case; paste the summary into docs/RESULTS.md.
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

rng = np.random.default_rng(11)
fails = 0


def window(h, w, r, batch=None, dtype=np.uint8):
    """Global pair cut into (local window, vhalo operands, concat window)."""
    lead = () if batch is None else (batch,)
    if dtype == np.uint8:
        A = rng.integers(0, 256, lead + (3 * h + 2 * r, w)).astype(dtype)
        B = rng.integers(0, 256, lead + (3 * h + 2 * r, w)).astype(dtype)
    else:
        A = rng.random(lead + (3 * h + 2 * r, w)).astype(dtype)
        B = rng.random(lead + (3 * h + 2 * r, w)).astype(dtype)
    a_loc, b_loc = A[..., h : 2 * h, :], B[..., h : 2 * h, :]
    vh = (
        A[..., h - r : h, :], A[..., 2 * h : 2 * h + r, :],
        B[..., h - r : h, :], B[..., 2 * h : 2 * h + r, :],
    )
    ae = np.concatenate([vh[0], a_loc, vh[1]], axis=-2)
    be = np.concatenate([vh[2], b_loc, vh[3]], axis=-2)
    return a_loc, b_loc, vh, ae, be


def check(name, h, w, r, batch=None, dtype=np.uint8, max_tile_w=None,
          tile_h=None):
    global fails
    a_loc, b_loc, vh, ae, be = window(h, w, r, batch, dtype)
    kw = dict(radius=r)
    if dtype != np.uint8:
        kw.update(allow_float=True, data_range=1.0)
    if max_tile_w is not None:
        kw["max_tile_w"] = max_tile_w
    if tile_h is not None:
        kw["max_tile_h"] = tile_h
    dr = kw.get("data_range", 255.0)
    # f64 oracle on the concat window; rows [r, r+h) read only true rows.
    _, omap = reference.compute_ssim(ae, be, with_map=True, radius=r,
                                     data_range=dr)
    want_map = omap[..., r : r + h, :]
    want_rows = want_map.sum(axis=-1)
    vhj = tuple(jnp.asarray(x) for x in vh)
    aj, bj = jnp.asarray(a_loc), jnp.asarray(b_loc)

    t0 = time.time()
    rows_v, _ = ssim_parts_pallas(aj, bj, rowsum=True, vhalo=vhj, **kw)
    rows_v = np.asarray(jax.block_until_ready(rows_v))
    _, map_v = ssim_parts_pallas(aj, bj, with_map=True, vhalo=vhj, **kw)
    map_v = np.asarray(jax.block_until_ready(map_v))
    dt = time.time() - t0

    row_err = np.abs(rows_v - want_rows).max() / w  # per-pixel scale
    map_err = np.abs(map_v - want_map).max()
    # Tolerances: the repo's documented f32 per-pixel accuracy is
    # ~1.3e-6 (fast path) to ~2.7e-6 (chunked, 300x5000 —
    # docs/RESULTS.md "Accuracy"); the reference f32 build's tier is
    # 6.22e-4. 4e-6 asserts the documented behavior with headroom for
    # the MXU-HIGHEST rounding's mild width scaling.
    ok = row_err < 1e-6 and map_err < 4e-6
    fails += not ok
    print(f"{name:38s} rows={row_err:.2e} map={map_err:.2e} "
          f"({dt:.1f}s) {'PASS' if ok else 'FAIL'}", flush=True)


# u8 fast path, the interpret suite's geometries, compiled.
check("u8 plain 64x256 r5", 64, 256, 5)
check("u8 ragged splice 66x200 r5 t32", 66, 200, 5, tile_h=32)
check("u8 truncated bottom 68x256 r5 t32", 68, 256, 5, tile_h=32)
check("u8 radius==hb 33x128 r16", 33, 128, 16)
check("u8 batched non-128 40x131 r3 b2", 40, 131, 3, batch=2)
# Production-scale shard: a 4K image's 1/4-height row band.
check("u8 shard 540x3840 r5", 540, 3840, 5)
# f32 fast path (sanitized float bands + poison term).
check("f32 plain 30x200 r5", 30, 200, 5, dtype=np.float32)
check("f32 shard 270x1920 r5", 270, 1920, 5, dtype=np.float32)
# Chunked wide fallback (internal halo concat on the chunked grid).
check("u8 wide fallback 24x600 r5 mtw512", 24, 600, 5, max_tile_w=512)
check("u8 wide 256x24576 r5 (real chunked)", 256, 24576, 5)

# Edge-replica halos == plain clamped computation (true-border case).
h, w, r = 40, 256, 5
a = rng.integers(0, 256, (h, w)).astype(np.uint8)
b = rng.integers(0, 256, (h, w)).astype(np.uint8)
vh = tuple(
    jnp.asarray(np.broadcast_to(x, (r, w)).copy())
    for x in (a[:1], a[-1:], b[:1], b[-1:])
)
_, m1 = ssim_parts_pallas(jnp.asarray(a), jnp.asarray(b), with_map=True)
_, m2 = ssim_parts_pallas(jnp.asarray(a), jnp.asarray(b), with_map=True,
                          vhalo=vh)
err = float(jnp.abs(m2 - m1).max())
ok = err < 2e-6
fails += not ok
print(f"{'u8 edge-replica == clamped 40x256':38s} map={err:.2e} "
      f"{'PASS' if ok else 'FAIL'}", flush=True)

print(f"\nvhalo compiled-on-TPU: "
      f"{'ALL PASS' if not fails else f'{fails} FAILURES'}", flush=True)
sys.exit(1 if fails else 0)
