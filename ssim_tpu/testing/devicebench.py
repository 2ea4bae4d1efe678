"""Steady-state device throughput measurement.

The methodology behind bench.py and the report harness's device column,
shaped by this machine's RPC-attached TPU (each synchronous host call
costs ~30 ms and `block_until_ready` is unreliable through the tunnel):

- the iteration loop runs *on device* inside one jit (lax.fori_loop), so
  host round-trip latency is paid once per measurement;
- the input is carried through the loop and perturbed by a one-pixel
  in-place update per step, making every iteration distinct work (no
  hoisting/CSE) without a full-array copy;
- throughput comes from the delta between a long and a short loop
  (cancelling fixed overhead), min-of-3 per length, MEDIAN of reps —
  median, not best: the tunnel's noise is heavy-tailed (occasional
  ~100 ms stalls), and a max-of-reps estimator once cherry-picked a
  stalled short loop into a 2.3x-over-ceiling reading.

The reference's harness is a simple wall-clock loop around the call
(tests/rmgr-ssim-tests.cpp:107-152); this is its TPU-honest equivalent.
"""

import functools
import time
from typing import Optional

import numpy as np


def make_runner(impl: str, with_map: bool, precise: bool = False,
                relaxed: bool = False, call_kwargs: Optional[dict] = None):
    """A jitted (a, b, iters) -> scalar on-device benchmark loop.

    impl: a dispatch implementation name, or the two pseudo-impls
    "grad" (the fused backward kernel, f32 inputs) and "msssim"
    (the 5-scale pyramid). relaxed: the loose bf16-split accuracy tier
    (pallas/auto impls only). call_kwargs: extra static kwargs passed
    through to the underlying call — the sweep tool (tools/sweep.py)
    uses this to parametrize tile_h / max_tile_w / rowsum etc. without
    a bespoke experiment script per lever."""
    import jax
    import jax.numpy as jnp

    from ..dispatch import backend_platform

    interpret = backend_platform() != "tpu"
    kw = dict(call_kwargs or {})

    if impl == "grad":
        from ..ops.ssim_grad import ssim_grad_pallas

        def parts(a, b):
            da, db = ssim_grad_pallas(
                a, b, 1.0, 0.0, data_range=255.0, interpret=interpret,
                relaxed=relaxed, **kw,
            )
            return da[..., 0, 0] + db[..., 0, 0], None
    elif impl == "msssim":
        from ..models.msssim import ms_ssim

        acc = "relaxed" if relaxed else "standard"

        def parts(a, b):
            return ms_ssim(a, b, data_range=255.0, accuracy=acc), None
    elif impl == "auto":
        # Full routing policy (incl. the lane-packed small-image path).
        from ..ops.routing import ssim_parts_auto

        def parts(a, b):
            return ssim_parts_auto(
                a, b, with_map=with_map, interpret=interpret, precise=precise,
                relaxed=relaxed, **kw,
            )
    elif impl == "spatial":
        # The sharded score path (mean_ssim_spatial) over however many
        # devices are attached (1 on the bench chip: halo ppermutes
        # degenerate to self-sends, the vhalo/vmask kernel still runs).
        # MUST use this harness's carried perturbation: plain
        # loop-invariant fori_loop benchmarks of this path gave
        # contradictory 8-22 Gpix/s readings from hoisting asymmetries
        # (tools/probe_spatial.py documents the artifact; honest answer:
        # kernel parity).
        from jax.sharding import Mesh

        from ..parallel import mean_ssim_spatial

        mesh = Mesh(np.array(jax.devices()), ("space",))

        def parts(a, b):
            return mean_ssim_spatial(a, b, mesh, **kw), None
    elif impl == "pallas":
        from ..ops.ssim_pallas import ssim_parts_pallas

        def parts(a, b):
            return ssim_parts_pallas(
                a, b, with_map=with_map, interpret=interpret, precise=precise,
                relaxed=relaxed, **kw,
            )
    else:
        from ..ops.ssim_xla import ssim_parts_xla

        def parts(a, b):
            return ssim_parts_xla(a, b, with_map=with_map)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(a, b, iters: int):
        def body(i, state):
            a_c, acc = state
            a_c = jax.lax.dynamic_update_index_in_dim(
                a_c, (a_c[0, 0, 0] + 1).astype(a_c.dtype)[None, None], 0, 0
            )
            partials, m = parts(a_c, b)
            acc = acc + jnp.sum(partials)
            if m is not None:
                acc = acc + m[0, 0, 0]
            return (a_c, acc)

        _, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0.0)))
        return acc

    return run


def device_throughput(
    impl: str = "pallas",
    with_map: bool = False,
    batch: int = 8,
    h: int = 1080,
    w: int = 1920,
    iters: int = 256,
    reps: int = 3,
    precise: bool = False,
    relaxed: bool = False,
    seed: int = 7,
    call_kwargs: Optional[dict] = None,
    float_input: bool = False,
) -> float:
    """Median-of-reps steady-state throughput in Mpix/s."""
    import jax

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (batch, h, w), dtype=np.uint8)
    noise = rng.normal(0, 8, a.shape).astype(np.int16)
    b = np.clip(a.astype(np.int16) + noise, 0, 255).astype(np.uint8)

    # grad is float-only (u8 has no gradient); float_input measures the
    # sanitized f32 kernel path (pair with call_kwargs allow_float).
    if impl == "grad" or float_input:
        a = a.astype(np.float32)
        b = b.astype(np.float32)
    a_dev = jax.device_put(a)
    b_dev = jax.device_put(b)
    run = make_runner(impl, with_map, precise=precise, relaxed=relaxed,
                      call_kwargs=call_kwargs)

    short, long_ = max(1, iters // 8), iters
    for it in (short, long_):  # warmup/compile both loop lengths
        v = float(run(a_dev, b_dev, it))  # scalar readback forces completion
        assert np.isfinite(v)

    def timed(it):
        t0 = time.perf_counter()
        v = float(run(a_dev, b_dev, it))
        t1 = time.perf_counter()
        assert np.isfinite(v)
        return t1 - t0

    samples = []
    for _ in range(reps):
        ts = min(timed(short) for _ in range(3))
        tl = min(timed(long_) for _ in range(3))
        dt = tl - ts
        if dt <= 0.01 * tl:
            continue  # noise swamped this delta; try another rep
        samples.append(batch * h * w * (long_ - short) / dt / 1e6)
    if not samples:
        raise RuntimeError("unstable measurement: every delta was noise-dominated")
    return float(np.median(samples))
