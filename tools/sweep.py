"""Unified TPU throughput sweep tool (replaces the round-3 one-shot
experiment scripts mxu_hpass_exp*.py / mu_mxu_*.py / geom_sweep.py,
whose conclusions live in docs/RESULTS.md "Measured levers").

Each subcommand sweeps one lever through the steady-state on-device
loop (ssim_tpu.testing.devicebench — median-of-reps, long-short delta):

  python tools/sweep.py geom                 # forward geometry configs
  python tools/sweep.py grad-tileh           # backward tile_h sweep
  python tools/sweep.py wide                 # fast vs chunked at 8K
  python tools/sweep.py rowsum               # rowsum vs map row-reduce
  python tools/sweep.py custom --impl pallas --batch 4 --h 2160 --w 3840 \
      --kw max_tile_h=64                     # ad-hoc single config

--kw key=value pairs are forwarded as static kwargs to the underlying
call (ints/floats/bools parsed; see devicebench.make_runner).
"""

import argparse
import os
import sys

# Repo root on sys.path WITHOUT PYTHONPATH: setting PYTHONPATH breaks the
# axon TPU plugin's site-hook registration on this machine (measured:
# "Unable to initialize backend 'axon'"), so the insert happens here.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssim_tpu.config import enable_compile_cache
from ssim_tpu.testing.devicebench import device_throughput

enable_compile_cache()


def _parse_kw(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        if v in ("True", "true"):
            out[k] = True
        elif v in ("False", "false"):
            out[k] = False
        else:
            try:
                out[k] = int(v)
            except ValueError:
                try:
                    out[k] = float(v)
                except ValueError:
                    out[k] = v
    return out


def _run(name, **kwargs):
    try:
        v = device_throughput(**kwargs)
        print(f"{name:28s} {v:9.1f} Mpix/s", flush=True)
        return v
    except Exception as e:  # keep sweeping past one bad config
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def cmd_geom(args):
    """Forward fused-path geometry (the round-3 bench-config search)."""
    for name, b, h, w, it in [
        ("2560w_b1", 1, 1440, 2560, 128),
        ("2560w_b4", 4, 1440, 2560, 128),
        ("2560w_b8", 8, 1440, 2560, 96),
        ("3072w_b4", 4, 1728, 3072, 96),
        ("4k_b8", 8, 2160, 3840, 96),
        ("4k_b2", 2, 2160, 3840, 128),
        ("1080_b8", 8, 1080, 1920, 128),
        ("1080_b16", 16, 1080, 1920, 96),
        ("5120w_b2", 2, 2880, 5120, 64),
    ]:
        if args.only and name not in args.only:
            continue
        _run(name, impl="pallas", batch=b, h=h, w=w, iters=it,
             relaxed=args.relaxed)


def cmd_grad_tileh(args):
    """Backward kernel tile_h sweep (VERDICT r3 #3). tile_h must be a
    multiple of 8 >= the 2r halo (16 at radius 5)."""
    for th in args.tile_h:
        _run(f"grad_1080_b4_t{th}", impl="grad", batch=4, h=1080, w=1920,
             iters=args.iters, relaxed=args.relaxed,
             call_kwargs={"tile_h": th})


def cmd_wide(args):
    """8K-class widths: the chunked path vs the fast path forced wide
    via max_tile_w (needs the raised VMEM window for u8 too)."""
    b, h, w = 2, 4320, 7680
    _run("8k_chunked", impl="pallas", batch=b, h=h, w=w, iters=args.iters)
    _run("8k_fastpath", impl="pallas", batch=b, h=h, w=w, iters=args.iters,
         call_kwargs={"max_tile_w": 8192})
    _run("8k_chunked_th64", impl="pallas", batch=b, h=h, w=w,
         iters=args.iters, call_kwargs={"max_tile_h": 64})


def cmd_rowsum(args):
    """Score-only HBM-write saving: rowsum mode vs the standard partials
    (and vs with_map, which the spatial layer used to row-reduce)."""
    for name, kw, wm in [
        ("1080_b8_partials", {}, False),
        ("1080_b8_rowsum", {"rowsum": True}, False),
        ("1080_b8_map", {}, True),
    ]:
        _run(name, impl="pallas", batch=8, h=1080, w=1920, iters=128,
             with_map=wm, call_kwargs=kw)


def cmd_spatial(args):
    """Single-chip overhead of the spatial sharded path: mean_ssim_spatial
    over a 1-device mesh (halo exchange degenerates to self-permutes, the
    vhalo/vmask rowsum kernel runs per shard) vs the plain fused kernel
    at the same shape. Uses the devicebench carried-perturbation harness
    ONLY: plain loop-invariant fori_loops gave contradictory 8-22 Gpix/s
    readings for this path from hoisting asymmetries (the round-4/5
    overhead hunts chased that artifact — tools/probe_spatial.py)."""
    b, h, w = 1, 2160, 3840
    _run("plain_kernel_4k", impl="pallas", batch=b, h=h, w=w,
         iters=args.iters, call_kwargs={"rowsum": True})
    _run("spatial_1shard_4k", impl="spatial", batch=b, h=h, w=w,
         iters=args.iters)


def cmd_custom(args):
    _run("custom", impl=args.impl, batch=args.batch, h=args.h, w=args.w,
         iters=args.iters, with_map=args.map, precise=args.precise,
         relaxed=args.relaxed, call_kwargs=_parse_kw(args.kw))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("geom")
    g.add_argument("only", nargs="*", default=None)
    g.add_argument("--relaxed", action="store_true")
    g.set_defaults(fn=cmd_geom)

    gt = sub.add_parser("grad-tileh")
    gt.add_argument("--tile-h", dest="tile_h", type=int, nargs="+",
                    default=[48, 64, 80])
    gt.add_argument("--iters", type=int, default=96)
    gt.add_argument("--relaxed", action="store_true")
    gt.set_defaults(fn=cmd_grad_tileh)

    wd = sub.add_parser("wide")
    wd.add_argument("--iters", type=int, default=48)
    wd.set_defaults(fn=cmd_wide)

    rs = sub.add_parser("rowsum")
    rs.set_defaults(fn=cmd_rowsum)

    sp = sub.add_parser("spatial")
    sp.add_argument("--iters", type=int, default=64)
    sp.add_argument("--reps", type=int, default=5)
    sp.set_defaults(fn=cmd_spatial)

    c = sub.add_parser("custom")
    c.add_argument("--impl", default="pallas")
    c.add_argument("--batch", type=int, default=4)
    c.add_argument("--h", type=int, default=2160)
    c.add_argument("--w", type=int, default=3840)
    c.add_argument("--iters", type=int, default=96)
    c.add_argument("--map", action="store_true")
    c.add_argument("--precise", action="store_true")
    c.add_argument("--relaxed", action="store_true")
    c.add_argument("--kw", nargs="*", default=None)
    c.set_defaults(fn=cmd_custom)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
