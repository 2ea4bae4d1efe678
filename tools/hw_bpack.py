"""Round-5 hardware validation: integer-mu blurs + gutterless packed path
compiled on TPU vs the f64 oracle.

Covers (all COMPILED, not interpret):
- standard fused path with the integer-mu vertical pass (vm_intmu):
  score + map, incl. the crop geometries 255x63 / 257x65,
- ssim_parts_pallas_bpacked: u8 / f32 / relaxed / precise / custom
  window / w>128 spanning chunks / batch remainder padding.

Exit 0 = every case inside its tier. Records for docs/RESULTS.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssim_tpu.config import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from ssim_tpu import engine, reference
from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas, ssim_parts_pallas_bpacked

rng = np.random.default_rng(42)
failures = []


def check(name, got, want, tol):
    err = float(np.abs(np.asarray(got, np.float64) - want).max())
    ok = err < tol
    if not ok:
        failures.append(name)
    print(f"{name:48s} err={err:.2e} tol={tol:g} {'PASS' if ok else 'FAIL'}",
          flush=True)


def pair(h, w, batch=None, dtype=np.uint8):
    shape = (h, w) if batch is None else (batch, h, w)
    a = rng.integers(0, 256, shape).astype(dtype)
    b = np.clip(
        a.astype(np.float64) + rng.normal(0, 12, shape), 0, 255
    ).astype(dtype)
    return a, b


# --- standard path, integer-mu vpass ---
for h, w in [(255, 63), (257, 65), (1080, 1920)]:
    a, b = pair(h, w, batch=1)
    parts, m = ssim_parts_pallas(jnp.asarray(a), jnp.asarray(b), with_map=True)
    got = engine.finalize_mean(np.asarray(parts), h * w)
    want, wmap = reference.compute_ssim(a[0], b[0], with_map=True)
    check(f"std intmu {h}x{w} score", got[0], want, 2e-6)
    check(f"std intmu {h}x{w} map", np.asarray(m)[0], wmap, 1e-3)

# adversarial content: impulse noise (the relaxed tier's worst case must
# NOT leak into the standard tier through the integer-mu split)
a = rng.integers(0, 2, (1, 512, 640)).astype(np.uint8) * 255
b = a.copy()
mask = rng.random((1, 512, 640)) < 0.05
b[mask] = 255 - b[mask]
parts, _ = ssim_parts_pallas(jnp.asarray(a), jnp.asarray(b))
got = engine.finalize_mean(np.asarray(parts), 512 * 640)
want, _ = reference.compute_ssim(a[0], b[0])
check("std intmu impulse-noise 512x640 score", got[0], want, 2e-6)

# --- bpacked ---
for h, w, batch, dtype in [
    (64, 64, 130, np.uint8),
    (128, 128, 70, np.uint8),
    (96, 96, 90, np.uint8),      # the bpack_count 128-alignment fix
    (30, 200, 45, np.uint8),     # images spanning chunk boundaries
    (32, 32, 300, np.uint8),
]:
    a, b = pair(h, w, batch, dtype)
    parts = ssim_parts_pallas_bpacked(jnp.asarray(a), jnp.asarray(b))
    got = engine.finalize_mean(np.asarray(parts), h * w)
    oracle, _ = reference.compute_ssim(a, b)
    check(f"bpacked u8 {h}x{w} b{batch}", got, oracle, 2e-6)

# float32
a, b = pair(64, 64, 60, np.uint8)
af, bf = a.astype(np.float32), b.astype(np.float32)
parts = ssim_parts_pallas_bpacked(jnp.asarray(af), jnp.asarray(bf),
                                  allow_float=True)
got = engine.finalize_mean(np.asarray(parts), 64 * 64)
oracle, _ = reference.compute_ssim(af, bf)
check("bpacked f32 64x64 b60", got, oracle, 2e-6)

# precise tier (df32 + MXU HIGHEST blurs — the compiled envelope)
for h, w, batch in [(64, 64, 60), (128, 128, 40)]:
    a, b = pair(h, w, batch)
    parts = ssim_parts_pallas_bpacked(jnp.asarray(a), jnp.asarray(b),
                                      precise=True)
    got = engine.finalize_mean(np.asarray(parts), h * w)
    oracle, _ = reference.compute_ssim(a, b)
    check(f"bpacked precise {h}x{w} b{batch}", got, oracle, 5e-7)

# relaxed tier (documented loose envelope)
a, b = pair(64, 64, 60)
parts = ssim_parts_pallas_bpacked(jnp.asarray(a), jnp.asarray(b),
                                  relaxed=True)
got = engine.finalize_mean(np.asarray(parts), 64 * 64)
oracle, _ = reference.compute_ssim(a, b)
check("bpacked relaxed 64x64 b60", got, oracle, 2e-5)

# custom window
a, b = pair(40, 96, 30)
parts = ssim_parts_pallas_bpacked(jnp.asarray(a), jnp.asarray(b),
                                  radius=8, sigma=2.5, k1=0.02, k2=0.05)
got = engine.finalize_mean(np.asarray(parts), 40 * 96)
oracle, _ = reference.compute_ssim(a, b, radius=8, sigma=2.5, k1=0.02, k2=0.05)
check("bpacked custom r8 s2.5 40x96 b30", got, oracle, 2e-6)

print("ALL PASS" if not failures else f"FAILURES: {failures}", flush=True)
sys.exit(1 if failures else 0)
