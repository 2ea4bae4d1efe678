"""Benchmark: global-SSIM throughput, real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — the
best standard single-chip config (the reference's README headline is
likewise its best config). Per-config numbers go to stderr diagnostics.
Baseline: the reference's best full-machine number, 232.4 Mpix/s
(FMA + OpenMP, no map — reference README.md:48, mirrored in BASELINE.md).

Methodology: ssim_tpu/testing/devicebench.py — on-device lax.fori_loop
with a carried, in-place-perturbed input; long/short-loop deltas,
min-of-3 timings per length, MEDIAN of reps. See that module's docstring
for why each piece exists on an RPC-attached TPU.
"""

import json
import sys

from ssim_tpu.testing.devicebench import device_throughput


def main():
    from ssim_tpu.config import enable_compile_cache

    enable_compile_cache()  # best-effort; skips recompiles on repeat runs
    results = {}
    for name, kwargs in [
        ("pallas_4k_nomap", dict(impl="pallas", with_map=False, batch=4, h=2160, w=3840, iters=128)),
        ("pallas_4k_map", dict(impl="pallas", with_map=True, batch=4, h=2160, w=3840, iters=128)),
        ("pallas_1080_nomap", dict(impl="pallas", with_map=False)),
        ("pallas_1080_map", dict(impl="pallas", with_map=True)),
        ("pallas_8k_nomap", dict(impl="pallas", with_map=False, batch=1, h=4320, w=7680, iters=64)),
        # 16K UHD (15360x8640) rides the round-4 widened fast path in ONE
        # full-width tile per row block (TILE_W=16384); 132 Mpix/call.
        ("pallas_16k_nomap", dict(impl="pallas", with_map=False, batch=1, h=8640, w=15360, iters=16)),
        ("pallas_4k_f64mode", dict(impl="pallas", with_map=False, batch=4, h=2160, w=3840, iters=64, precise=True)),
        # f32 inputs through the same compensated df32 tier (round-4:
        # the precision="f64" cliff fix routes float images to the
        # kernel instead of the host oracle).
        ("pallas_4k_f64_float", dict(impl="pallas", with_map=False, batch=4, h=2160, w=3840, iters=64, precise=True, float_input=True, call_kwargs={"allow_float": True})),
        # Opt-in loose-accuracy tier (accuracy="relaxed"): bf16-split
        # MXU blurs on wide images. Diagnostic only - NOT headline-
        # eligible (its error tier is outside the reference's f32 one).
        ("pallas_4k_relaxed", dict(impl="pallas", with_map=False, batch=4, h=2160, w=3840, iters=128, relaxed=True)),
        # Small-image batches (thumbnail/codec-QA shapes), impl="auto" so
        # the full routing runs: 64^2 tracks the lane-PACKED path (small
        # non-128-multiple), 128^2 tracks the roll lane mode (multiple).
        ("auto_64sq_b4096", dict(impl="auto", with_map=False, batch=4096, h=64, w=64, iters=32)),
        ("auto_128sq_b1024", dict(impl="auto", with_map=False, batch=1024, h=128, w=128, iters=64)),
        # With-map and f64 variants of the small-image configs, so
        # regressions in the newer paths stay driver-visible (the packed
        # path has no map/f64 mode — these track the standard-path
        # fallbacks those calls take).
        ("auto_128sq_b1024_map", dict(impl="auto", with_map=True, batch=1024, h=128, w=128, iters=48)),
        ("auto_64sq_b4096_f64", dict(impl="auto", with_map=False, batch=4096, h=64, w=64, iters=16, precise=True)),
        # Fused analytic backward kernel (ops/ssim_grad.py) and the
        # 5-scale MS-SSIM pyramid.
        ("grad_1080_b4", dict(impl="grad", batch=4, h=1080, w=1920, iters=48)),
        ("grad_1080_b4_relaxed", dict(impl="grad", batch=4, h=1080, w=1920, iters=48, relaxed=True)),
        ("msssim_1080_b4", dict(impl="msssim", batch=4, h=1080, w=1920, iters=48)),
        ("xla_1080_nomap", dict(impl="xla", with_map=False, iters=24)),
    ]:
        try:
            results[name] = device_throughput(**kwargs)
        except Exception as e:  # pragma: no cover
            print(f"bench {name} failed: {type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
            results[name] = 0.0
    print(
        f"diagnostics: {json.dumps({k: round(v, 1) for k, v in results.items()})} Mpix/s",
        file=sys.stderr,
    )
    best = max(results["pallas_4k_nomap"], results["pallas_1080_nomap"],
               results["pallas_8k_nomap"], results["pallas_16k_nomap"],
               results["xla_1080_nomap"])
    baseline = 232.4  # reference FMA+OpenMP no-map Mpix/s (README.md:48)
    print(
        json.dumps(
            {
                "metric": "ssim_throughput",
                "value": round(best, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(best / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
