"""Compiled-on-TPU soak: random geometries x all engine modes vs the oracle.

Run on hardware after kernel changes: python tools/soak_tpu.py
(the pytest suite covers these paths in interpret + compiled mode; this
is the fast standalone spot-check with fresh random geometry each run).
"""
import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from ssim_tpu import engine, reference

r = np.random.default_rng(99)
fails = 0
t0 = time.time()
for k in range(16):
    h = int(r.integers(1, 500))
    w = int(r.integers(1, 9000))
    mode = k % 4
    if mode == 0:
        a = r.integers(0, 256, (h, w), dtype=np.uint8)
        b = np.clip(a.astype(np.int32) + r.normal(0, 14, a.shape).astype(np.int32), 0, 255).astype(np.uint8)
        got, _ = engine.compute(a, b, impl="pallas")
        want, _ = reference.compute_ssim(a, b)
        tol = max(2e-6, 3e-3 / (h * w) ** 0.5)
    elif mode == 1:
        a = r.random((h, w)).astype(np.float32)
        b = np.clip(a + r.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
        got, _ = engine.compute(a, b, impl="pallas", data_range=1.0)
        want, _ = reference.compute_ssim(a, b, data_range=1.0)
        tol = max(2e-6, 3e-3 / (h * w) ** 0.5)
    elif mode == 2:
        a = r.integers(0, 256, (h, w), dtype=np.uint8)
        b = np.clip(a.astype(np.int32) + r.normal(0, 14, a.shape).astype(np.int32), 0, 255).astype(np.uint8)
        got, _ = engine.compute(a, b, impl="pallas", precision="f64")
        want, _ = reference.compute_ssim(a, b)
        tol = max(5e-9, 1e-4 / (h * w))
    else:
        a = r.integers(0, 65536, (h, w)).astype(np.uint16)
        b = np.clip(a.astype(np.int32) + r.normal(0, 2500, a.shape).astype(np.int32), 0, 65535).astype(np.uint16)
        got, _ = engine.compute(a, b, impl="pallas", data_range=65535.0)
        want, _ = reference.compute_ssim(a, b, data_range=65535.0)
        tol = max(2e-5, 3e-3 / (h * w) ** 0.5)
    err = abs(float(got) - want)
    status = "OK " if err < tol else "FAIL"
    if err >= tol:
        fails += 1
    print(f"{status} mode={mode} {h:4d}x{w:5d} err={err:.2e} tol={tol:.1e}", flush=True)
print(f"{'PASS' if fails == 0 else 'FAIL'}: 16 compiled geometries in {time.time()-t0:.0f}s, {fails} failures")
