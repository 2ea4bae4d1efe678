"""One-shot runner for all hardware checks pending on the tunnel outage.

The axon TPU relay has been down for long stretches this round; this
script packs every pending on-hardware item into one invocation so a
brief healthy-tunnel window can clear the whole list:

  timeout 3000 python tools/hw_pending.py

1. w=8000 column-chunked wide backward: correctness spot-check vs the
   XLA VJP on a narrow strip + a throughput number (TODO.md item).
2. Custom-window spot-check compiled (sigma/k1/k2 through the fused
   forward, analytic backward, df32 mode, components/MS-SSIM) vs the
   f64 oracle / XLA autodiff.
3. bench.py (fresh, includes the grad_1080_b4_relaxed config that has
   never compiled on hardware).

Each section prints PASS/FAIL + numbers; paste results into
docs/RESULTS.md / TODO.md.
"""
import os
import subprocess
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

from ssim_tpu import engine, reference
from ssim_tpu.ops.ssim_grad import ssim_grad_pallas
from ssim_tpu.ops.ssim_xla import ssim_parts_xla

rng = np.random.default_rng(7)
fails = 0

# ---- 1. w=8000 chunked wide backward ------------------------------------
h, w = 64, 8000
a = rng.random((h, w)).astype(np.float32)
b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
af, bf = jnp.asarray(a), jnp.asarray(b)
t0 = time.time()
da, db = ssim_grad_pallas(af, bf, 1.0, 0.0, data_range=1.0)
da.block_until_ready()
print(f"w=8000 grad compile+run: {time.time() - t0:.1f}s", flush=True)
ga, gb = jax.grad(
    lambda x, y: jnp.sum(ssim_parts_xla(x, y, data_range=1.0)[0]),
    argnums=(0, 1),
)(af, bf)
err = max(
    float(jnp.abs(da - ga).max()), float(jnp.abs(db - gb).max())
)
ok = err < 3e-5
fails += not ok
print(f"w=8000 chunked backward vs XLA VJP: err={err:.2e} {'PASS' if ok else 'FAIL'}", flush=True)

# throughput: batched 1080-row strip at w=8000 via devicebench
from ssim_tpu.testing.devicebench import device_throughput

thr = device_throughput(impl="grad", batch=1, h=1080, w=8000, iters=24)
print(f"grad 1080x8000 (chunked): {thr:.1f} Mpix/s", flush=True)

# ---- 2. custom-window compiled spot-checks -------------------------------
kw = dict(sigma=2.0, k1=0.02, k2=0.05)
a8 = rng.integers(0, 256, (192, 256), dtype=np.uint8)
b8 = np.clip(a8.astype(np.int32) + rng.normal(0, 12, a8.shape).astype(np.int32), 0, 255).astype(np.uint8)

got, _ = engine.compute(a8, b8, impl="pallas", **kw)
want, _ = reference.compute_ssim(a8, b8, **kw)
ok = abs(got - want) < 2e-6
fails += not ok
print(f"fused fwd custom window: err={abs(got - want):.2e} {'PASS' if ok else 'FAIL'}", flush=True)

got, _ = engine.compute(a8, b8, impl="pallas", precision="f64", **kw)
ok = abs(got - want) < 1e-8
fails += not ok
print(f"df32 custom window: err={abs(got - want):.2e} {'PASS' if ok else 'FAIL'}", flush=True)

af = jnp.asarray(a8, jnp.float32)
bf = jnp.asarray(b8, jnp.float32)
gp_a, gp_b = ssim_grad_pallas(af, bf, 1.0, 0.0, data_range=255.0, **kw)
gx_a, gx_b = jax.grad(
    lambda x, y: jnp.sum(ssim_parts_xla(x, y, data_range=255.0, **kw)[0]),
    argnums=(0, 1),
)(af, bf)
err = max(float(jnp.abs(gp_a - gx_a).max()), float(jnp.abs(gp_b - gx_b).max()))
ok = err < 3e-5
fails += not ok
print(f"fused bwd custom window: err={err:.2e} {'PASS' if ok else 'FAIL'}", flush=True)

from ssim_tpu.models.msssim import ms_ssim

gp = float(ms_ssim(jnp.asarray(a8), jnp.asarray(b8), impl="pallas", **kw))
gx = float(ms_ssim(jnp.asarray(a8), jnp.asarray(b8), impl="xla", **kw))
ok = abs(gp - gx) < 3e-5
fails += not ok
print(f"ms-ssim custom window pallas vs xla: err={abs(gp - gx):.2e} {'PASS' if ok else 'FAIL'}", flush=True)

print(f"\nspot-checks: {'ALL PASS' if not fails else f'{fails} FAILURES'}", flush=True)

# ---- 3. fresh bench -------------------------------------------------------
print("\nrunning bench.py ...", flush=True)
r = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")],
)
sys.exit(1 if (fails or r.returncode) else 0)
