"""Compiled-on-TPU validation of the vhalo BACKWARD mode (VERDICT r4 #2).

The sharded fused backward now consumes raw ppermute halo operands and
does the loss-row mask, edge-replica substitution, and vertical
clamp-fold in-kernel (ops/ssim_grad.py vhalo/vmask). The interpret
suite (tests/test_grad_vhalo.py) validates it against the retired
concat formulation; this script compiles the same geometries on the
real chip — this repo's history says interpret-green is not enough
(the 0*inf=NaN float-garbage bug and the round-5 chunked-rowsum
BlockSpec bug were both invisible to interpret mode):

  timeout 1800 python tools/hw_vhalo_grad.py

Also covers the relaxed tier, which CANNOT be validated in interpret
mode at all (TPU-interpret evaluates its bf16 DEFAULT dots ~1e-2 loose
vs ~2e-5 compiled — tests/test_grad.py::test_grad_relaxed_tier).
Paste the summary into docs/RESULTS.md ("vhalo backward", round 5).
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

from ssim_tpu.ops.ssim_grad import ssim_grad_pallas

rng = np.random.default_rng(23)
fails = 0


def concat_ref(a_loc, b_loc, vh, h, is_top, is_bot, w_s, w_cs, **kw):
    m = 2 * kw["radius"]
    at, ab_, bt, bb = vh
    ae = jnp.concatenate([jnp.asarray(at), jnp.asarray(a_loc),
                          jnp.asarray(ab_)], axis=-2)
    be = jnp.concatenate([jnp.asarray(bt), jnp.asarray(b_loc),
                          jnp.asarray(bb)], axis=-2)
    gid = np.arange(-m, h + m)
    mask = np.ones(h + 2 * m, np.float32)
    if is_top:
        mask[gid < 0] = 0.0
    if is_bot:
        mask[gid >= h] = 0.0
    gmap = jnp.broadcast_to((mask * w_s)[:, None], ae.shape)
    da, db = ssim_grad_pallas(ae, be, 0.0, w_cs, gmap, **kw)

    def fold(g):
        o = g[..., m : m + h, :]
        if is_top:
            o = o.at[..., 0, :].add(jnp.sum(g[..., :m, :], axis=-2))
        if is_bot:
            o = o.at[..., h - 1, :].add(jnp.sum(g[..., m + h :, :], axis=-2))
        return o

    return fold(da), fold(db)


def check(name, h, w, r=5, is_top=False, is_bot=False, w_s=1.3, w_cs=0.0,
          relaxed=False, tol=2e-5):
    global fails
    m = 2 * r
    a_loc = rng.random((h, w)).astype(np.float32) * 255
    b_loc = rng.random((h, w)).astype(np.float32) * 255
    garbage = lambda: rng.random((m, w)).astype(np.float32) * 255
    rep = lambda x, row: np.repeat(np.take(x, [row], axis=-2), m, axis=-2)
    at = rep(a_loc, 0) if is_top else garbage()
    bt = rep(b_loc, 0) if is_top else garbage()
    ab_ = rep(a_loc, -1) if is_bot else garbage()
    bb = rep(b_loc, -1) if is_bot else garbage()
    vh_raw = (
        garbage() if is_top else at,
        garbage() if is_bot else ab_,
        garbage() if is_top else bt,
        garbage() if is_bot else bb,
    )
    kw = dict(radius=r, relaxed=relaxed)
    t0 = time.time()
    want_da, want_db = concat_ref(a_loc, b_loc, (at, ab_, bt, bb), h,
                                  is_top, is_bot, w_s, w_cs, **kw)
    got_da, got_db = ssim_grad_pallas(
        jnp.asarray(a_loc), jnp.asarray(b_loc), w_s, w_cs,
        vhalo=tuple(jnp.asarray(x) for x in vh_raw),
        vmask=(float(is_top), float(is_bot)), **kw,
    )
    got_da = jax.block_until_ready(got_da)
    dt = time.time() - t0
    scale = max(float(np.abs(np.asarray(want_da)).max()), 1e-30)
    err = max(
        float(np.abs(np.asarray(got_da) - np.asarray(want_da)).max()),
        float(np.abs(np.asarray(got_db) - np.asarray(want_db)).max()),
    ) / scale
    ok = err < tol
    fails += not ok
    print(f"{name:40s} relerr={err:.2e} ({dt:.0f}s) "
          f"{'PASS' if ok else 'FAIL'}", flush=True)


check("interior 64x256", 64, 256)
check("top edge 64x256", 64, 256, is_top=True)
check("bottom edge 64x256", 64, 256, is_bot=True)
check("both edges 64x256", 64, 256, is_top=True, is_bot=True)
check("bottom ragged 70x131", 70, 131, is_bot=True)
check("radius 8 bottom 40x300", 40, 300, r=8, is_bot=True)
check("w_cs interior 64x256", 64, 256, w_cs=0.7)
# Production-scale shard: a 4K image's 1/4-height row band (MXU mode).
check("shard 540x3840 top", 540, 3840, is_top=True)
check("shard 540x3840 interior", 540, 3840)
# Relaxed tier — compiled-only validation (see module docstring).
check("relaxed shard 540x3840 bottom", 540, 3840, is_bot=True,
      relaxed=True, tol=1e-3)

print(f"\nvhalo backward on hardware: "
      f"{'ALL PASS' if not fails else f'{fails} FAILURES'}", flush=True)
sys.exit(1 if fails else 0)
