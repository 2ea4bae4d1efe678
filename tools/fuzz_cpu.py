"""Extended fuzz harness (tools/fuzz_cpu.py [seed] [N] [maxh] [maxw]): random geometry x mode x map vs the f64 oracle.

Mode 6 gradchecks the fused backward kernel against the XLA autodiff
VJP. Widths default up to 1100 so the MXU lane mode (w >= 512) gets
real coverage.

CPU interpret mode (fast compile, exact same kernel logic as Mosaic
minus VMEM-garbage behavior, which tools/soak_tpu.py covers on
hardware). Not committed as a test: runtime is minutes, the committed
suite keeps a fixed subset.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from ssim_tpu import engine, reference

r = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 1234)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 150
MAXH = int(sys.argv[3]) if len(sys.argv) > 3 else 320
MAXW = int(sys.argv[4]) if len(sys.argv) > 4 else 1100
fails = []
t0 = time.time()
for k in range(N):
    h = int(r.integers(1, MAXH))
    w = int(r.integers(1, MAXW))
    with_map = bool(r.integers(0, 2))
    batch = int(r.integers(1, 3))
    mode = int(r.integers(0, 9))
    a = r.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + r.normal(0, 14, a.shape).astype(np.int32), 0, 255).astype(np.uint8)
    kw = dict(with_map=with_map)
    dr = 255.0
    if mode == 0:
        pass  # u8 pallas f32
    elif mode == 1:
        a = a.astype(np.float32); b = b.astype(np.float32)
    elif mode == 2:
        kw["precision"] = "f64"
    elif mode == 3:
        a = (a.astype(np.uint16) * 257); b = (b.astype(np.uint16) * 257); dr = 65535.0
    elif mode == 4:
        ds = int(r.integers(2, 4))
        if h // ds < 1 or w // ds < 1:
            continue
        kw["downsample"] = ds
    elif mode == 5:
        kw["impl"] = "xla"
    elif mode == 7:
        # relaxed tier (no-op below MXU_MIN_W=512; CPU interpret mode
        # evaluates the bf16-split dots more loosely than Mosaic, so
        # the loose-envelope tolerance below is the honest bound).
        kw["accuracy"] = "relaxed"
    elif mode == 8:
        # custom-window extension: random sigma/k1/k2 on the fused
        # kernel, random radius (sometimes) on the XLA route.
        kw["sigma"] = float(r.uniform(0.8, 3.0))
        kw["k1"] = float(r.uniform(0.005, 0.05))
        kw["k2"] = float(r.uniform(0.01, 0.1))
        if r.integers(0, 2):
            kw["radius"] = int(r.integers(1, 8))
    else:
        # mode 6: fused backward kernel vs the XLA autodiff VJP.
        import jax as _jax
        import jax.numpy as _jnp

        from ssim_tpu.ops.ssim_grad import grad_pallas_supported, ssim_grad_pallas
        from ssim_tpu.ops.ssim_xla import ssim_parts_xla

        if not grad_pallas_supported(h, w):
            continue
        af = (a.astype(np.float32) / 255.0)[0]
        bf = (b.astype(np.float32) / 255.0)[0]
        try:
            ga_x, gb_x = _jax.grad(
                lambda x, y: _jnp.sum(ssim_parts_xla(x, y, data_range=1.0)[0]),
                argnums=(0, 1),
            )(af, bf)
            ga_p, gb_p = ssim_grad_pallas(af, bf, 1.0, 0.0, data_range=1.0,
                                          interpret=True)
        except Exception as e:
            fails.append((k, mode, h, w, f"{type(e).__name__}: {str(e)[:100]}"))
            print("EXC", fails[-1], flush=True)
            continue
        gerr = max(
            float(np.abs(np.asarray(ga_p) - np.asarray(ga_x)).max()),
            float(np.abs(np.asarray(gb_p) - np.asarray(gb_x)).max()),
        )
        scale = float(np.abs(np.asarray(ga_x)).max()) + 1e-30
        if gerr > max(3e-5, 3e-5 * scale):
            fails.append((k, mode, h, w, f"graderr={gerr:.2e} scale={scale:.2e}"))
            print("FAIL", fails[-1], flush=True)
        if k % 20 == 0:
            print(f".. {k}/{N} t={time.time()-t0:.0f}s", flush=True)
        continue
    try:
        got, gmap = engine.compute(a, b, impl=kw.pop("impl", "pallas"), data_range=dr, **kw)
    except Exception as e:
        fails.append((k, mode, h, w, f"{type(e).__name__}: {str(e)[:100]}"))
        print("EXC", fails[-1], flush=True)
        continue
    # oracle on the same effective inputs
    ea, eb = a, b
    if "downsample" in kw:
        ea = engine.box_decimate(a, kw["downsample"]); eb = engine.box_decimate(b, kw["downsample"])
    winkw = {n: kw[n] for n in ("radius", "sigma", "k1", "k2") if n in kw}
    tol_g = 5e-9 if kw.get("precision") == "f64" else 2e-6
    tol_m = 1e-6 if kw.get("precision") == "f64" else 2e-3
    if kw.get("accuracy") == "relaxed":
        tol_g, tol_m = 2e-5, 5e-3  # loose tier + CPU-interpret slack
    for i in range(batch):
        want, wmap = reference.compute_ssim(ea[i], eb[i], with_map=with_map, data_range=dr, **winkw)
        npx = ea.shape[-2] * ea.shape[-1]
        tg = max(tol_g, 3e-3 / npx ** 0.5) if kw.get("precision") != "f64" else max(tol_g, 1e-4 / npx)
        err = abs(float(np.atleast_1d(got)[i]) - want)
        merr = 0.0 if not with_map else float(np.abs(np.asarray(gmap)[i] - wmap).max())
        if err > tg or (with_map and merr > tol_m):
            fails.append((k, mode, h, w, f"err={err:.2e}/{tg:.0e} map={merr:.2e}"))
            print("FAIL", fails[-1], flush=True)
    if k % 20 == 0:
        print(f".. {k}/{N} t={time.time()-t0:.0f}s", flush=True)
print(f"{'PASS' if not fails else 'FAIL'}: {N} cases, {len(fails)} failures, {time.time()-t0:.0f}s")
