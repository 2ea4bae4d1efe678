"""Spatial-path overhead probe — HONEST methodology only.

History (round 5): a series of fori-loop probes with loop-invariant
inputs produced wildly contradictory readings for the sharded path (8.3
vs 19.8-22.1 Gpix/s for near-identical formulations). The split was a
benchmark artifact: with fully invariant operands XLA hoists the
kernel chain out of the loop (readings above the kernel's true speed),
while gather/axis_index-fed chains block that hoisting (readings at
honest per-call cost). Under the devicebench methodology — input
perturbed INSIDE the loop, throughput from the delta of a long and a
short loop — every variant collapses to the same number and the
production sharded path measures AT KERNEL PARITY (v5e, 4K u8,
1-device mesh, 2026-08-20):

    bare kernel rowsum                   13,931 Mpix/s
    sm: perms only (no vmask)            13,776
    sm: perms + axis_index flags         13,938
    sm: perms + sharded-const flags      13,587
    production ssim_spatial_sharded      13,954
    backward const w_s                    5,336
    backward traced w_s                   5,376
    backward unit-kernel + scale          5,384

i.e. the round-4 "~30% shard_map plumbing tax" and the round-5
operand-producer hunts (gather-built replicas, axis_index flags) were
measuring hoisting asymmetries, not real costs. The vhalo/vmask design
is kept for its structural merits — two stacked ppermutes per call,
no host-side replica construction, no halo-concatenated HBM copies —
and this file stays as the honest re-measurement harness.
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
from jax.sharding import Mesh, PartitionSpec as P

from ssim_tpu.ops.ssim_grad import ssim_grad_pallas
from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas
from ssim_tpu.parallel.spatial import ssim_spatial_sharded

h, w, r = 2160, 3840, 5
rng = np.random.default_rng(7)
A = rng.integers(0, 256, (h, w), dtype=np.uint8)
B = rng.integers(0, 256, (h, w), dtype=np.uint8)
mesh = Mesh(np.array(jax.devices()[:1]), ("space",))
n_shards = 1
axis = "space"

FLAGS = jnp.asarray(
    [[float(i == 0), float(i == n_shards - 1)] for i in range(n_shards)],
    jnp.float32,
)


def perms(a_s, b_s):
    down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    tops = jax.lax.ppermute(jnp.stack([a_s[-r:, :], b_s[-r:, :]]), axis, down)
    bots = jax.lax.ppermute(jnp.stack([a_s[:r, :], b_s[:r, :]]), axis, up)
    return (tops[0], bots[0], tops[1], bots[1])


def measured(parts_fn, a0, b0, iters=64):
    """devicebench-style: perturb a inside the loop, delta long-short."""

    @jax.jit
    def run(a, b, it):
        def body(i, state):
            a_c, acc = state
            a_c = jax.lax.dynamic_update_index_in_dim(
                a_c, (a_c[0, 0] + 1).astype(a_c.dtype)[None], 0, 0
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
            samples.append(h * w * (long_ - short) / (tl - ts) / 1e6)
    return float(np.median(samples)) if samples else float("nan")


def sm(body, extra=()):
    specs = (P(axis, None),) * (2 + len(extra))
    f = jax.shard_map(body, mesh=mesh, in_specs=specs, out_specs=P(),
                      check_vma=False)
    if extra:
        return lambda a_c, b_c: f(a_c, b_c, *extra)
    return lambda a_c, b_c: f(a_c, b_c)


def body_plain(a_c, b_c):
    rows, _ = ssim_parts_pallas(a_c, b_c, rowsum=True)
    return jnp.sum(rows)


def body_novmask(a_c, b_c):
    rows, _ = ssim_parts_pallas(a_c, b_c, rowsum=True, vhalo=perms(a_c, b_c))
    return jnp.sum(rows)


def body_axisidx(a_c, b_c):
    idx = jax.lax.axis_index(axis)
    vm = ((idx == 0).astype(jnp.float32),
          (idx == n_shards - 1).astype(jnp.float32))
    rows, _ = ssim_parts_pallas(a_c, b_c, rowsum=True, vhalo=perms(a_c, b_c),
                                vmask=vm)
    return jnp.sum(rows)


def body_flagslice(a_c, b_c, fl_s):
    rows, _ = ssim_parts_pallas(a_c, b_c, rowsum=True, vhalo=perms(a_c, b_c),
                                vmask=(fl_s[0, 0], fl_s[0, 1]))
    return jnp.sum(rows)


def prod(a_c, b_c):
    rows, _ = ssim_spatial_sharded(a_c, b_c, mesh)
    return jnp.sum(rows)


a0, b0 = jax.device_put(A), jax.device_put(B)
for name, fn in [
    ("bare kernel rowsum", body_plain),
    ("sm: perms only (no vmask)", sm(body_novmask)),
    ("sm: perms + axis_index flags", sm(body_axisidx)),
    ("sm: perms + sharded-const flags", sm(body_flagslice, (FLAGS,))),
    ("production ssim_spatial_sharded", prod),
]:
    print(f"{name:34s} {measured(fn, a0, b0):9.1f} Mpix/s", flush=True)

# Backward: const vs traced w_s, honest loop.
FA = A.astype(np.float32)
FB = np.clip(A.astype(np.int16) + rng.normal(0, 8, A.shape), 0,
             255).astype(np.float32)
fa, fb = jax.device_put(FA), jax.device_put(FB)


def g_const(a_c, b_c):
    da, db = ssim_grad_pallas(a_c, b_c, 1.0, 0.0)
    return da[0, 0] + db[0, 0]


def g_traced(a_c, b_c):
    da, db = ssim_grad_pallas(a_c, b_c, a_c[0, 0] * 1e-8 + 1.0, 0.0)
    return da[0, 0] + db[0, 0]


for name, fn in [
    ("backward const w_s", g_const),
    ("backward traced w_s", g_traced),
]:
    print(f"{name:34s} {measured(fn, fa, fb, iters=32):9.1f} Mpix/s",
          flush=True)
