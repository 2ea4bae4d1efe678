"""Experiment round 4: speed sweep of hybrid3x across geometries vs
production (adaptive tile_h disabled - fixed 32 - so this is conservative
for small images).
Run from the repo root as `python - < tools/mxu_hpass_exp4.py` (stdin keeps the
cwd on sys.path; the package is not pip-installed).
"""
import functools, time, numpy as np, jax, jax.numpy as jnp
exec(open("tools/mxu_hpass_exp3.py").read().split("rng = np.random")[0])  # reuse make_call

from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

def bench(fn, a, b, iters=64, reps=3):
    @functools.partial(jax.jit, static_argnames=("it",))
    def run(a, b, it):
        def body(i, state):
            a_c, acc = state
            a_c = jax.lax.dynamic_update_index_in_dim(
                a_c, (a_c[0, 0, 0] + 1).astype(a_c.dtype)[None, None], 0, 0)
            out = fn(a_c, b)
            return (a_c, acc + jnp.sum(jax.tree.leaves(out)[-1]))
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
taps = gaussian_taps(np.float32, RADIUS, SIGMA)
c1, c2 = (0.01*255)**2, (0.03*255)**2

for (h, w, batch) in [(128,128,256), (224,224,64), (256,256,64), (512,512,16),
                      (1080,1920,4), (360,640,16), (2160,2560,1)]:
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    b = np.clip(a.astype(np.int16) + rng.normal(0, 8, a.shape).astype(np.int16), 0, 255).astype(np.uint8)
    ad, bd = jax.device_put(a), jax.device_put(b)
    p = bench(lambda x, y: ssim_parts_pallas(x, y)[0], ad, bd)
    call = make_call(h, w, taps, c1, c2, "hybrid3x")
    m = bench(lambda x, y: call(x, y)[1], ad, bd)
    print(f"{h}x{w} b{batch}: production {p:.0f} | hybrid3x {m:.0f} Mpix/s ({m/p:.2f}x)", flush=True)
