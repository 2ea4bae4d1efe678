"""Accuracy + performance report harness.

Rebuild of the reference test binary's built-in reporting
(tests/rmgr-ssim-tests.cpp:163-222): after running the image suite
through every available implementation, print README-style tables of
avg/max global and per-pixel error (vs the f64 oracle) and Mpix/s
throughput per implementation x {map, nomap}.

Run: python -m ssim_tpu.testing.report [--quick]
"""

import argparse
import os
import sys
import time
from collections import defaultdict

import numpy as np


def _suite_pairs(images_dir: str, quick: bool):
    """(name, a, b) single-channel test pairs from the reference image
    suite (tests/rmgr-ssim-tests.cpp:341-403)."""
    from ssim_tpu.utils import load_image

    ref = load_image(os.path.join(images_dir, "einstein.png"))
    for name in ["meanshift.png", "contrast.png", "impulse.png", "blur.png", "jpg.png"]:
        yield name, load_image(os.path.join(images_dir, name)), ref
    if quick:
        return
    png = load_image(os.path.join(images_dir, "big_buck_bunny_360_07806.png"))
    for q in (0, 50, 100):
        jpg = load_image(
            os.path.join(images_dir, f"big_buck_bunny_360_07806_{q:02d}.jpg")
        )
        for c in range(3):
            yield f"bbb360_q{q}_c{c}", jpg[:, :, c], png[:, :, c]


def run_report(quick: bool = False, out=sys.stdout):
    import jax

    from ssim_tpu.config import enable_compile_cache

    enable_compile_cache()  # skip recompiles across report runs

    from ssim_tpu import reference
    from ssim_tpu.dispatch import available_impls, Implementation
    from ssim_tpu import engine
    from ssim_tpu.testing import frozen

    images_dir = frozen.images_dir()
    if not frozen.have_images():
        out.write("test images unavailable; set SSIM_TPU_IMAGES_DIR\n")
        return 1

    impls = [i for i in available_impls() if i != Implementation.REFERENCE]
    gerr = defaultdict(list)
    perr = defaultdict(list)
    ticks = defaultdict(float)
    pixels = defaultdict(int)

    pairs = list(_suite_pairs(images_dir, quick))
    oracle = {}
    for name, a, b in pairs:
        oracle[name] = reference.compute_ssim(a, b, with_map=True)

    for impl in impls:
        for with_map in (False, True):
            key = (impl, with_map)
            for name, a, b in pairs:
                want, want_map = oracle[name]
                t0 = time.perf_counter()
                got, got_map = engine.compute(a, b, with_map=with_map, impl=impl.value)
                t1 = time.perf_counter()
                ticks[key] += t1 - t0
                pixels[key] += a.size
                gerr[impl].append(abs(float(got) - want))
                if with_map:
                    perr[impl].append(np.abs(got_map - want_map).max())

    out.write(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})\n\n")
    out.write("Accuracy vs float64 oracle\n")
    out.write(f"{'impl':>10} | {'avg global':>12} | {'max global':>12} | "
              f"{'avg pixel':>12} | {'max pixel':>12}\n")
    for impl in impls:
        g = np.array(gerr[impl])
        p = np.array(perr[impl]) if perr[impl] else np.array([np.nan])
        out.write(
            f"{impl.value:>10} | {g.mean():12.3e} | {g.max():12.3e} | "
            f"{p.mean():12.3e} | {p.max():12.3e}\n"
        )
    out.write("\nThroughput (Mpix/s)\n")
    out.write(f"{'impl':>10} | {'eager nomap':>11} | {'eager map':>11} | "
              f"{'device nomap':>12} | {'device map':>12}\n")
    on_tpu = jax.devices()[0].platform == "tpu"
    for impl in impls:
        no_map = pixels[(impl, False)] / ticks[(impl, False)] / 1e6
        w_map = pixels[(impl, True)] / ticks[(impl, True)] / 1e6
        # Steady-state device numbers via the on-device-loop methodology
        # (devicebench.py); the eager columns include per-call host
        # transfers and RTT (the reference's harness semantics,
        # tests/rmgr-ssim-tests.cpp:107-152, on its local CPU). The XLA
        # path is skipped on TPU (its ~160 s/shape compile isn't worth a
        # report run) and Pallas is skipped off-TPU (interpret mode
        # measures nothing real).
        dev = [float("nan")] * 2
        measurable = (impl == Implementation.PALLAS and on_tpu) or (
            impl == Implementation.XLA and not on_tpu
        )
        if measurable and not quick:
            from .devicebench import device_throughput

            for j, wm in enumerate((False, True)):
                try:
                    dev[j] = device_throughput(
                        impl.value, with_map=wm, batch=2, h=1080, w=1920,
                        iters=64, reps=2,
                    )
                except Exception:
                    pass
        out.write(
            f"{impl.value:>10} | {no_map:11.1f} | {w_map:11.1f} | "
            f"{dev[0]:12.1f} | {dev[1]:12.1f}\n"
        )
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true", help="einstein suite only")
    args = ap.parse_args()
    return run_report(quick=args.quick)


if __name__ == "__main__":
    sys.exit(main())
