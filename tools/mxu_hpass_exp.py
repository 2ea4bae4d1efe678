"""Experiment (VERDICT r2 item 9): horizontal blur on the MXU.

Clone of the forward fast path with the VPU roll/concat hpass replaced by
per-128-lane-chunk banded right-matmuls: out[:, 128c:128c+128] =
band[:, 128c : 128c+138] @ H, H[i, j] = taps[i - j] (138, 128), slices
vreg-aligned (start 128c), concat-mode band (w + 2r lanes, co = r).

Run from the repo root as `python - < tools/mxu_hpass_exp.py` (stdin keeps the
cwd on sys.path; the package is not pip-installed).
"""
import functools, time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ssim_tpu.windows import RADIUS, SIGMA, gaussian_taps
from ssim_tpu.ops.ssim_pallas import (
    clamped_band_matrices, _ssim_from_blurs, _make_hpass, ssim_parts_pallas,
)

r = RADIUS

def make_mxu_call(h, w, taps, c1, c2, precision):
    tile_h = 32
    nh = -(-h // tile_h)
    band = tile_h + 16
    vmats = jnp.asarray(clamped_band_matrices(tile_h, band, taps, h, nh))
    nchunk = w // 128
    assert w % 128 == 0
    hmat = np.zeros((138, 128), np.float32)
    for j in range(128):
        for d in range(11):
            hmat[j + d, j] = taps[d]
    hmat = jnp.asarray(hmat)

    def kernel(vm_ref, hm_ref, ap, ac, an, bp, bc, bn, sum_ref):
        i = pl.program_id(1)
        vm = vm_ref[0]
        hm = hm_ref[...]

        def band_of(prev_ref, cur_ref, nxt_ref):
            raw = jnp.concatenate(
                [prev_ref[0, tile_h - 8:], cur_ref[0], nxt_ref[0, :8]], axis=0)
            raw = raw.astype(jnp.int32).astype(jnp.float32)
            left = jnp.broadcast_to(raw[:, :1], (band, r))
            right = jnp.broadcast_to(raw[:, w - 1: w], (band, r))
            return jnp.concatenate([left, raw, right], axis=1)

        af = band_of(ap, ac, an)
        bf = band_of(bp, bc, bn)
        s = af + bf
        d = af - bf

        def vpass(x):
            return jax.lax.dot_general(vm, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        def hpass_mxu(x):  # x: (tile_h, w + 2r)
            outs = []
            for c in range(nchunk):
                sl = jax.lax.slice_in_dim(x, 128 * c, 128 * c + 138, axis=1)
                outs.append(jax.lax.dot_general(
                    sl, hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision))
            return jnp.concatenate(outs, axis=1)

        blurs = (hpass_mxu(vpass(af)), hpass_mxu(vpass(bf)),
                 hpass_mxu(vpass(s * s)), hpass_mxu(vpass(d * d)))
        ssim = _ssim_from_blurs(*blurs, c1, c2)
        n_valid = jnp.minimum(h - i * tile_h, tile_h).astype(jnp.float32) * w
        sum_ref[0, 0, 0, 0] = jnp.sum(ssim - 1.0) + n_valid

    def spec(di):
        if di < 0:
            index = lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0)
        elif di > 0:
            index = lambda bi, i: (bi, jnp.minimum(i + 1, nh - 1), 0)
        else:
            index = lambda bi, i: (bi, i, 0)
        return pl.BlockSpec((1, tile_h, w), index, memory_space=pltpu.VMEM)

    specs = [spec(-1), spec(0), spec(1)]
    vm_spec = pl.BlockSpec((1, tile_h, band), lambda bi, i: (i, 0, 0), memory_space=pltpu.VMEM)
    hm_spec = pl.BlockSpec((138, 128), lambda bi, i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def call(a, b):
        batch = a.shape[0]
        (sums,) = pl.pallas_call(
            kernel, grid=(batch, nh),
            in_specs=[vm_spec, hm_spec] + specs + specs,
            out_shape=(jax.ShapeDtypeStruct((batch, nh, 1, 1), jnp.float32),),
            out_specs=(pl.BlockSpec((1, 1, 1, 1), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.SMEM),),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        )(vmats, hmat, a, a, a, b, b, b)
        return sums
    return call

def bench(fn, a, b, iters=64, reps=3):
    @functools.partial(jax.jit, static_argnames=("it",))
    def run(a, b, it):
        def body(i, state):
            a_c, acc = state
            a_c = jax.lax.dynamic_update_index_in_dim(
                a_c, (a_c[0, 0, 0] + 1).astype(a_c.dtype)[None, None], 0, 0)
            out = fn(a_c, b)
            return (a_c, acc + jnp.sum(out))
        _, acc = jax.lax.fori_loop(0, it, body, (a, jnp.float32(0)))
        return acc
    short, long_ = max(1, iters // 8), iters
    for it in (short, long_):
        assert np.isfinite(float(run(a, b, it)))
    def timed(it):
        t0 = time.perf_counter(); float(run(a, b, it)); return time.perf_counter() - t0
    best = []
    for _ in range(reps):
        ts = min(timed(short) for _ in range(3)); tl = min(timed(long_) for _ in range(3))
        dt = tl - ts
        if dt > 0.01 * tl: best.append(a.shape[0]*a.shape[1]*a.shape[2]*(long_-short)/dt/1e6)
    return float(np.median(best))

rng = np.random.default_rng(3)
h, w, batch = 1080, 1920, 4
a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
b = np.clip(a.astype(np.int16) + rng.normal(0, 8, a.shape).astype(np.int16), 0, 255).astype(np.uint8)
ad, bd = jax.device_put(a), jax.device_put(b)

taps = gaussian_taps(np.float32, RADIUS, SIGMA)
c1, c2 = (0.01*255)**2, (0.03*255)**2

# correctness check vs the production kernel
call_hi = make_mxu_call(h, w, taps, c1, c2, jax.lax.Precision.HIGHEST)
sums = np.asarray(call_hi(ad, bd)).reshape(batch, -1).sum(-1)
parts, _ = ssim_parts_pallas(ad, bd)
want = np.asarray(parts).reshape(batch, -1).sum(-1)
print("mxu HIGHEST vs production sums: max rel err",
      np.max(np.abs(sums - want) / np.abs(want)))

print(f"production kernel:  {bench(lambda x, y: ssim_parts_pallas(x, y)[0], ad, bd):.0f} Mpix/s", flush=True)
print(f"mxu-hpass HIGHEST:  {bench(call_hi, ad, bd):.0f} Mpix/s", flush=True)
call_def = make_mxu_call(h, w, taps, c1, c2, jax.lax.Precision.DEFAULT)
sums_d = np.asarray(call_def(ad, bd)).reshape(batch, -1).sum(-1)
print("mxu DEFAULT rel err", np.max(np.abs(sums_d - want)/np.abs(want)))
print(f"mxu-hpass DEFAULT:  {bench(call_def, ad, bd):.0f} Mpix/s", flush=True)

call_high = make_mxu_call(h, w, taps, c1, c2, jax.lax.Precision.HIGH)
sums_h = np.asarray(call_high(ad, bd)).reshape(batch, -1).sum(-1)
print("mxu HIGH rel err", np.max(np.abs(sums_h - want)/np.abs(want)))
print(f"mxu-hpass HIGH:     {bench(call_high, ad, bd):.0f} Mpix/s", flush=True)

# global-mean error scale: want/sums are sums of (ssim-1)+count... here raw
# (ssim-1)+n_valid per tile summed -> global mean err:
n = h * w
gm_want = want / n
for nm, s in [("DEFAULT", sums_d), ("HIGH", sums_h)]:
    print(f"  {nm}: global-mean abs err {np.max(np.abs(s - want))/n:.3e}")
