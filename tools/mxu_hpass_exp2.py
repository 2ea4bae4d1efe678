"""Experiment round 2: hybrid hpass — half the signals on the MXU
(HIGHEST, bit-exact), half on the VPU, so the units overlap; plus a
manual 3-pass bf16 split (bf16_3x emulation) for all four.
Run from the repo root as `python - < tools/mxu_hpass_exp2.py` (stdin keeps the
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

def make_call(h, w, taps, c1, c2, mode):
    tile_h = 32
    nh = -(-h // tile_h)
    band = tile_h + 16
    vmats = jnp.asarray(clamped_band_matrices(tile_h, band, taps, h, nh))
    nchunk = w // 128
    hmat_np = np.zeros((138, 128), np.float32)
    for j in range(128):
        for d in range(11):
            hmat_np[j + d, j] = taps[d]
    hmat = jnp.asarray(hmat_np)
    t = [float(v) for v in taps]
    hpass_vpu = _make_hpass(t, r, w, co=r)

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

        def hpass_mxu(x, precision):
            outs = []
            for c in range(nchunk):
                sl = jax.lax.slice_in_dim(x, 128 * c, 128 * c + 138, axis=1)
                outs.append(jax.lax.dot_general(
                    sl, hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision))
            return jnp.concatenate(outs, axis=1)

        def hpass_3x(x):
            x1 = x.astype(jnp.bfloat16)
            x2 = (x - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            h1 = hm.astype(jnp.bfloat16)
            h2 = (hm - h1.astype(jnp.float32)).astype(jnp.bfloat16)
            outs = []
            for c in range(nchunk):
                s1 = jax.lax.slice_in_dim(x1, 128 * c, 128 * c + 138, axis=1)
                s2 = jax.lax.slice_in_dim(x2, 128 * c, 128 * c + 138, axis=1)
                dd = lambda u, v: jax.lax.dot_general(
                    u, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                outs.append(dd(s1, h1) + (dd(s1, h2) + dd(s2, h1)))
            return jnp.concatenate(outs, axis=1)

        va, vb, vs, vd = vpass(af), vpass(bf), vpass(s * s), vpass(d * d)
        if mode == "hybrid":
            blurs = (hpass_vpu(va), hpass_vpu(vb),
                     hpass_mxu(vs, jax.lax.Precision.HIGHEST),
                     hpass_mxu(vd, jax.lax.Precision.HIGHEST))
        elif mode == "3x":
            blurs = (hpass_3x(va), hpass_3x(vb), hpass_3x(vs), hpass_3x(vd))
        elif mode == "hybrid3x":
            blurs = (hpass_vpu(va), hpass_vpu(vb), hpass_3x(vs), hpass_3x(vd))
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
parts, _ = ssim_parts_pallas(ad, bd)
want = np.asarray(parts).reshape(batch, -1).sum(-1)
n = h * w

print(f"production: {bench(lambda x, y: ssim_parts_pallas(x, y)[0], ad, bd):.0f} Mpix/s", flush=True)
for mode in ("hybrid", "3x", "hybrid3x"):
    call = make_call(h, w, taps, c1, c2, mode)
    sums = np.asarray(call(ad, bd)).reshape(batch, -1).sum(-1)
    err = np.max(np.abs(sums - want)) / n
    print(f"{mode}: global-mean abs err {err:.3e}, {bench(call, ad, bd):.0f} Mpix/s", flush=True)
