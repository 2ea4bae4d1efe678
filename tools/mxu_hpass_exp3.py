"""Experiment round 3: accuracy deep-check of the 3-pass MXU hpass and
width sweep. Compares per-pixel maps and oracle error, not just sums.
Run from the repo root as `python - < tools/mxu_hpass_exp3.py` (stdin keeps the
cwd on sys.path; the package is not pip-installed).
"""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ssim_tpu.windows import RADIUS, SIGMA, gaussian_taps
from ssim_tpu.ops.ssim_pallas import clamped_band_matrices, _ssim_from_blurs, _make_hpass
from ssim_tpu import reference

r = RADIUS

def make_call(h, w, taps, c1, c2, mode, with_map=True):
    tile_h = 32
    nh = -(-h // tile_h)
    band = tile_h + 16
    vmats = jnp.asarray(clamped_band_matrices(tile_h, band, taps, h, nh))
    nchunk = -(-w // 128)
    wpad = nchunk * 128          # padded output lanes
    bw = wpad + 2 * r            # band lane count (w + halos + roundup)
    hmat_np = np.zeros((138, 128), np.float32)
    for j in range(128):
        for d in range(11):
            hmat_np[j + d, j] = taps[d]
    hmat = jnp.asarray(hmat_np)
    t = [float(v) for v in taps]
    hpass_vpu = _make_hpass(t, r, w, co=r)

    def kernel(vm_ref, hm_ref, ap, ac, an, bp, bc, bn, map_ref, sum_ref):
        i = pl.program_id(1)
        vm = vm_ref[0]
        hm = hm_ref[...]

        def band_of(prev_ref, cur_ref, nxt_ref):
            raw = jnp.concatenate(
                [prev_ref[0, tile_h - 8:], cur_ref[0], nxt_ref[0, :8]], axis=0)
            raw = raw.astype(jnp.int32).astype(jnp.float32)
            left = jnp.broadcast_to(raw[:, :1], (band, r))
            right = jnp.broadcast_to(raw[:, w - 1: w], (band, bw - w - r))
            return jnp.concatenate([left, raw, right], axis=1)

        af = band_of(ap, ac, an)
        bf = band_of(bp, bc, bn)
        s = af + bf
        d = af - bf

        def vpass(x):
            return jax.lax.dot_general(vm, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

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
            return jnp.concatenate(outs, axis=1)[:, :w]

        def hpass_hi(x):
            outs = []
            for c in range(nchunk):
                sl = jax.lax.slice_in_dim(x, 128 * c, 128 * c + 138, axis=1)
                outs.append(jax.lax.dot_general(sl, hm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            return jnp.concatenate(outs, axis=1)[:, :w]

        va, vb, vs, vd = vpass(af), vpass(bf), vpass(s * s), vpass(d * d)
        if mode == "hybrid3x":
            blurs = (hpass_vpu(va), hpass_vpu(vb), hpass_3x(vs), hpass_3x(vd))
        elif mode == "hybridHI":
            blurs = (hpass_vpu(va), hpass_vpu(vb), hpass_hi(vs), hpass_hi(vd))
        ssim = _ssim_from_blurs(*blurs, c1, c2)
        map_ref[0] = ssim
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
        maps, sums = pl.pallas_call(
            kernel, grid=(batch, nh),
            in_specs=[vm_spec, hm_spec] + specs + specs,
            out_shape=(jax.ShapeDtypeStruct((batch, nh * tile_h, w), jnp.float32),
                       jax.ShapeDtypeStruct((batch, nh, 1, 1), jnp.float32)),
            out_specs=(pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1, 1, 1), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.SMEM)),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        )(vmats, hmat, a, a, a, b, b, b)
        return maps[:, :h], sums
    return call

rng = np.random.default_rng(3)
taps = gaussian_taps(np.float32, RADIUS, SIGMA)
c1, c2 = (0.01*255)**2, (0.03*255)**2

from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas
for (h, w) in [(128, 128), (224, 224), (97, 131), (1080, 1920), (33, 16)]:
    a = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    b = np.clip(a.astype(np.int16) + rng.normal(0, 8, a.shape).astype(np.int16), 0, 255).astype(np.uint8)
    ad, bd = jax.device_put(a), jax.device_put(b)
    parts, pmap = ssim_parts_pallas(ad, bd, with_map=True)
    pmap = np.asarray(pmap)
    # f64 oracle
    og, omap = reference.compute_ssim(a[0], b[0], with_map=True)
    for mode in ("hybrid3x", "hybridHI"):
        call = make_call(h, w, taps, c1, c2, mode)
        m, sums = call(ad, bd)
        m = np.asarray(m)
        dpix = np.max(np.abs(m - pmap))
        doracle = np.max(np.abs(m[0].astype(np.float64) - omap))
        g = np.asarray(sums).reshape(2, -1).sum(-1)[0] / (h*w)
        print(f"{h}x{w} {mode}: max|map-prod|={dpix:.2e} max|map-oracle|={doracle:.2e} |g-oracle|={abs(g-og):.2e}")
