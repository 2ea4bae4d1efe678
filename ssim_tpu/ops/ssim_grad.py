"""Fused Pallas TPU backward kernel for SSIM (analytic VJP).

The reference has no autodiff story (nothing to cite); the differentiable
`ssim_loss` / `ms_ssim` surface is this repo's TPU-native extension, and
until round 3 its gradients routed through the XLA formulation's VJP
(which on the round-1/2 stack cost ~160 s/shape to compile on TPU and
ran well below the fused forward). This kernel makes the training path
TPU-native: fwd+bwd compile in seconds and stay in fused kernels.

Math. With G the (symmetric, clamp-to-edge) 11x11 Gaussian operator and
s = a+b, d = a-b, the forward computes per pixel, from the four blurred
signals u = G*a, v = G*b, ss = G*s^2, dd = G*d^2:

    A1 = 2uv + c1          A2 = 0.5(ss - dd) - 2uv + c2    (= 2 sigma_ab + c2)
    B1 = u^2 + v^2 + c1    B2 = 0.5(ss + dd) - (u^2+v^2) + c2
    l  = A1/B1             cs = A2/B2                        S = l*cs

For a loss L = w_s * sum_p S(p) + w_cs * sum_p cs(p) (w_s/w_cs per-image
scalars — e.g. gbar/n for the mean-SSIM grad, or the MS-SSIM per-scale
cotangents), the chain rule through the blurs gives

    dL/da = G^T[W_u] + 2 s . G^T[W_ss] + 2 d . G^T[W_dd]
    dL/db = G^T[W_v] + 2 s . G^T[W_ss] - 2 d . G^T[W_dd]

where W_theta = w_s * dS/dtheta + w_cs * dcs/dtheta are pointwise maps of
the blurred signals (verified against autodiff in tests/test_grad.py):

    dS/dss  =  0.5 l (1 - cs) / B2        dcs/dss  =  0.5 (1 - cs) / B2
    dS/ddd  = -0.5 l (1 + cs) / B2        dcs/ddd  = -0.5 (1 + cs) / B2
    dS/du   = 2v (A2 - A1)/(B1 B2) - 2u S (1/B1 - 1/B2)
    dS/dv   = 2u (A2 - A1)/(B1 B2) - 2v S (1/B1 - 1/B2)
    dcs/du  = (2u cs - 2v)/B2             dcs/dv = (2v cs - 2u)/B2

G^T is the TRANSPOSE of the clamped blur, not the clamped blur itself:
the clamp-to-edge forward folds out-of-image taps onto edge pixels, so
its adjoint scatters those folded weights back — edge rows/columns
accumulate extra cumulative-tap mass. Vertically this is just the
transposed clamped band matrix (built in NumPy at trace time, applied on
the MXU); horizontally it is the zero-extended symmetric blur plus a
single folded correction at lane 0 and lane w-1 (_make_hpassT_roll).

TPU-first design, same skeleton as the forward fast path
(ops/ssim_pallas.py): one fused kernel over a (batch, row-tile) grid,
zero-copy prev/cur/next row blocks with 2r-row halos rounded to the
8-row sublane tile (the backward is a TWO-level blur: output rows need
weight maps within r, which need blurred signals within r, which need
input within 2r rows — the halo geometry is built from the radius at
trace time, so any radius <= MAX_FUSED_RADIUS rides this kernel,
matching the forward), the forward blurs recomputed in VMEM (recompute
beats saving four blurred maps to HBM), both vertical passes as MXU band
matmuls, both horizontal passes VPU roll-mode.

Speed of light (round-4 analysis; docs/RESULTS.md "Backward kernel
ceiling"): the naive "~8 blur-equivalents => ~1/2 forward" bound is
wrong because the kernel is MXU-PASS-bound, and the backward's MXU work
is 2.4x the forward's, not 2x — stage-1 blurs run at mid-row inflation
((tile_h+2*mb)/tile_h = 1.25 at tile_h 64) and all eight vertical band
matmuls are 6-pass HIGHEST. Counting bf16 MXU passes per output pixel
(r=5, tile_h=64): forward 3,576, backward 8,526 => predicted
14.0 * 3576/8526 = 5.87 Gpix/s; measured 5.78 (98.5%). The measured
levers agree: tile_h in {48,64,80,96} -> 64 best; pushing either heavy
hpass stage back to the VPU (SSIM_TPU_GRAD_SPLIT=vpu1|vpu2) loses 14%;
mu-on-MXU lost 28% in the forward. This kernel is at its structural
ceiling for the standard tier.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..windows import RADIUS, SIGMA, gaussian_taps
from .ssim_pallas import (
    MAX_FUSED_RADIUS,
    MXU_MIN_W,
    _halo_rows,
    _make_hpass,
    _make_hpass_mxu,
    _make_hpass_roll,
    hpass_tap_matrix,
)

import os as _os

#: Unit-balance measurement knob (tools/sweep.py): push the heavy
#: stage-1 (ss/dd) or stage-2 (tss/tdd) horizontal passes back to the
#: VPU. Default "" keeps both on the MXU (measured best; see
#: docs/RESULTS.md "Backward kernel ceiling"). Read at IMPORT time like
#: the forward's _LANE_MODE — a trace-time read would silently ignore
#: changes once the jit cache holds a trace for the same statics.
_split = _os.environ.get("SSIM_TPU_GRAD_SPLIT", "")

#: Max image width of ONE fused-backward kernel call (VMEM-bound: ~12
#: live f32 (rows x w) arrays, under the raised 100 MiB scoped window —
#: see the CompilerParams note). Measured on v5e: 7680 (8K) compiles and
#: runs; the next standard width up would exceed the window. Wider
#: images are column-chunked (overlapping windows, see ssim_grad_pallas)
#: so any width is supported.
GRAD_MAX_W = 7680

def grad_pallas_supported(h: int, w: int, radius: int = RADIUS) -> bool:
    """Whether ssim_grad_pallas handles an h x w image at this window
    radius (else: XLA VJP). Any width > radius works since the
    column-chunked wide path; the halo geometry is built from the taps
    at trace time, so every radius <= MAX_FUSED_RADIUS rides the fused
    backward (matching the forward's bound)."""
    return w > radius and h >= 1 and 1 <= radius <= MAX_FUSED_RADIUS


def _grad_geometry(tile_h: int, r: int):
    """The backward's vertical halo geometry for window radius r: the
    input-band margin hb2 (rows taken from each neighbor block — the
    two-level blur needs 2r, rounded up to the 8-row sublane tile) and
    the mid-band margin mb (rows of blurred signals/weight maps beyond
    the tile each side — needs >= r, rounded likewise)."""
    return _halo_rows(2 * r), _halo_rows(r)


def _fwd_mid_band_matrices(tile_h: int, taps: np.ndarray, h: int,
                           nh: int) -> np.ndarray:
    """Stage-1 vertical blur matrices: input band (tile_h + 2*hb2 rows,
    image rows i*tile_h - hb2 + k via the clamped prev/cur/next concat) ->
    blurred signals at the MID rows (tile_h + 2*mb rows, image rows
    i*tile_h - mb + m). Clamp-to-edge folded in; out-of-image mid rows and
    the wrong-content halo columns at i=0 / i=nh-1 get zero weight
    (same construction as ssim_pallas.clamped_band_matrices)."""
    r = len(taps) // 2
    hb2, mb = _grad_geometry(tile_h, r)
    mid, band = tile_h + 2 * mb, tile_h + 2 * hb2
    v = np.zeros((nh, mid, band), np.float32)
    for i in range(nh):
        base = i * tile_h - hb2
        for m in range(mid):
            g = i * tile_h - mb + m
            if not 0 <= g < h:
                continue
            for d in range(len(taps)):
                src = min(max(g - r + d, 0), h - 1)
                k = src - base
                if 0 <= k < band:
                    v[i, m, k] += taps[d]
    return v


def _fwd_mid_band_matrices_vhalo(tile_h: int, taps: np.ndarray, h: int,
                                 nh: int) -> np.ndarray:
    """Stage-1 matrices for the halo-operand (vhalo) backward: the local
    (H, W) block is a row window of a larger global image and the
    2*radius neighbor rows arrive as separate kernel operands (the
    spatial-sharding case, parallel/spatial.py — same design as the
    forward's halo_band_matrices). Taps are NOT folded at the local
    edges: mid rows cover the VIRTUAL range [-r, h+r) (the loss rows
    whose adjoint reaches owned rows) with true tap weights over virtual
    input rows [-2r, h+2r) — band positions where the kernel splices the
    halo operands. Mid rows outside [-r, h+r) keep zero rows (the
    runtime loss mask also excludes them; see _grad_call's vmask)."""
    r = len(taps) // 2
    hb2, mb = _grad_geometry(tile_h, r)
    mid, band = tile_h + 2 * mb, tile_h + 2 * hb2
    v = np.zeros((nh, mid, band), np.float32)
    for i in range(nh):
        base = i * tile_h - hb2
        for m in range(mid):
            g = i * tile_h - mb + m
            if not -r <= g < h + r:
                continue
            for d in range(len(taps)):
                src = g - r + d  # virtual row, in [-2r, h+2r)
                k = src - base
                if 0 <= k < band:
                    v[i, m, k] += taps[d]
    return v


def _transpose_band_matrices_vhalo(tile_h: int, taps: np.ndarray, h: int,
                                   nh: int) -> np.ndarray:
    """Stage-2 matrices for the vhalo backward: the TRUE (unclamped)
    adjoint of the global vertical blur, restricted to (owned output
    rows) x (mid rows in [-r, h+r)). Entry [i, y, m] = taps[gy - g + r]
    for |gy - g| <= r — no fold columns: the global image's clamp fold
    (edge shards only) is applied in-kernel at the owned edge rows,
    gated on the vmask scalars (see _grad_call)."""
    r = len(taps) // 2
    _, mb = _grad_geometry(tile_h, r)
    mid = tile_h + 2 * mb
    v = np.zeros((nh, tile_h, mid), np.float32)
    for i in range(nh):
        for m in range(mid):
            g = i * tile_h - mb + m
            if not -r <= g < h + r:
                continue
            for y in range(tile_h):
                gy = i * tile_h + y
                if gy >= h or abs(gy - g) > r:
                    continue
                v[i, y, m] += taps[g - gy + r]
    return v


def _transpose_band_matrices(tile_h: int, taps: np.ndarray, h: int,
                             nh: int) -> np.ndarray:
    """Stage-2 vertical matrices: the TRANSPOSE of the whole-image clamped
    vertical blur, restricted to (output tile rows) x (mid rows). Entry
    [i, y, m] is the adjoint weight of weight-map row g = i*tile_h - mb + m
    for output row gy = i*tile_h + y: sum of taps[d] over d with
    clamp(g - r + d) == gy. Every forward output row within radius r of
    gy lies in tile i's mid band (mid margin mb >= r), so the
    restriction is exact; out-of-image mid rows (whose weight-map values
    are garbage) get zero columns."""
    r = len(taps) // 2
    _, mb = _grad_geometry(tile_h, r)
    mid = tile_h + 2 * mb
    v = np.zeros((nh, tile_h, mid), np.float32)
    for i in range(nh):
        for m in range(mid):
            g = i * tile_h - mb + m
            if not 0 <= g < h:
                continue
            for d in range(len(taps)):
                dst = min(max(g - r + d, 0), h - 1)
                y = dst - i * tile_h
                if 0 <= y < tile_h:
                    v[i, y, m] += taps[d]
    return v


def _edge_fold_correction(t, r, out_w):
    """The clamp-to-edge adjoint's folded tap mass at the two image-edge
    lanes: out(0) += sum_{x=0}^{r-1} cl(x) wm(x) with cl(x) = sum_{k>x}
    t(k), mirrored on the right. ONE copy of the correction math, shared
    by the VPU roll transpose (_make_hpassT_roll) and the MXU transpose
    (hpT_heavy in _grad_call); `plain` may be lane-padded wider than
    out_w (extra lanes get no correction and are discarded by the
    caller)."""
    cl = [float(sum(t[r + x + 1 :])) for x in range(r)]

    def add(plain, wm):
        lane = jax.lax.broadcasted_iota(
            jnp.int32, plain.shape, plain.ndim - 1
        )
        corr_l = sum(cl[x] * wm[..., x : x + 1] for x in range(r))
        corr_r = sum(
            cl[x] * wm[..., out_w - 1 - x : out_w - x] for x in range(r)
        )
        return (
            plain
            + jnp.where(lane == 0, corr_l, 0.0)
            + jnp.where(lane == out_w - 1, corr_r, 0.0)
        )

    return add


def _make_hpassT_roll(t, r, out_w):
    """Transpose of the clamped symmetric 11-tap horizontal blur over an
    unwidened (..., out_w) array. For interior lanes the adjoint equals
    the ZERO-extended symmetric blur (rolled lanes that wrapped are
    zeroed, not clamped); lanes 0 and out_w-1 additionally receive the
    folded clamp mass (_edge_fold_correction)."""
    fold = _edge_fold_correction(t, r, out_w)

    def hpassT(wm):
        lane = jax.lax.broadcasted_iota(jnp.int32, wm.shape, wm.ndim - 1)
        acc = t[r] * wm
        for d in range(r, 0, -1):  # smallest taps first (parity order)
            lo = jnp.where(lane < d, 0.0, jnp.roll(wm, d, axis=-1))
            hi = jnp.where(lane >= out_w - d, 0.0, jnp.roll(wm, -d, axis=-1))
            acc = acc + t[r - d] * (lo + hi)
        return fold(acc, wm)

    return hpassT


def _grad_call(a, b, ws, h, w, taps, c1, c2, interpret, clip_bound, gmap=None,
               tile_h=32, relaxed=False, vhalo=None):
    """One fused-backward pallas_call. vhalo (sharded mode): the four
    (B, 2r, W) neighbor-row operands (a_top, a_bot, b_top, b_bot) of a
    row-sharded block — spliced into the input bands in VMEM exactly like
    the forward's vhalo mode, so the spatial layer never materializes a
    halo-concatenated copy in HBM. ws then carries per-image
    [w_s, w_cs, is_top, is_bot]: the two flags gate (a) the runtime loss
    mask that excludes nonexistent virtual loss rows at the TRUE image
    edges and (b) the in-kernel vertical clamp-fold correction at the
    owned edge rows (the adjoint of the reference border rule,
    src/ssim.cpp:560-582, which the non-vhalo matrices carry statically).
    """
    r = len(taps) // 2
    hb2, mb = _grad_geometry(tile_h, r)
    batch = a.shape[0]
    nh = -(-h // tile_h)
    band = tile_h + 2 * hb2
    mid = tile_h + 2 * mb
    if vhalo is not None:
        v1 = jnp.asarray(_fwd_mid_band_matrices_vhalo(tile_h, taps, h, nh))
        v2t = jnp.asarray(_transpose_band_matrices_vhalo(tile_h, taps, h, nh))
    else:
        v1 = jnp.asarray(_fwd_mid_band_matrices(tile_h, taps, h, nh))
        v2t = jnp.asarray(_transpose_band_matrices(tile_h, taps, h, nh))
    # vhalo splice geometry (static; mirrors the forward's): the top halo
    # covers virtual rows [-2r, 0) — band positions [hb2-2r, hb2) of
    # block 0 — and the bottom halo virtual rows [h, h+2r), landing at
    # pos_last of the last block (and pos_last + tile_h of the previous
    # one when the ragged last block leaves those positions in range).
    last_rows = h - (nh - 1) * tile_h
    pos_last = hb2 + last_rows
    # Vertical clamp-fold coefficients (the 1-D analogue of
    # _edge_fold_correction): cl_v[g] is the tap mass a global-edge loss
    # row g in [0, r) folds onto the edge input row.
    cl_v = [float(sum(taps[r + g + 1:])) for g in range(r)]
    t = [float(x) for x in taps]
    # Unit split (same as the forward's "mxu" lane mode; HIGHEST dots
    # are f32-equivalent, not bit-equal): for wide images the u/v
    # (stage 1) and
    # Wu/Wv (stage 2) horizontal passes stay on the VPU while the
    # heavier ss/dd and Wss/Wdd passes run as chunked banded matmuls on
    # the MXU over a concat-style widened band. Stage 2's adjoint blur
    # uses the SAME tap matrix (the plain part of the transpose is the
    # symmetric blur with zero extension — zeros instead of edge
    # replicas in the widened lanes) plus the 2-lane fold corrections.
    use_mxu = w >= MXU_MIN_W
    bw = (-(-w // 128) * 128 + 2 * r) if use_mxu else w
    if use_mxu:
        hp = _make_hpass(t, r, w, co=r)
        hp_mxu = _make_hpass_mxu(w, r, exact=not relaxed)
        fold = _edge_fold_correction(t, r, w)
    else:
        hp = _make_hpass_roll(t, r, w)
        hp_mxu = None
    hpT = _make_hpassT_roll(t, r, w)
    hmat = jnp.asarray(hpass_tap_matrix(taps))
    with_g = gmap is not None

    def kernel(wref, v1_ref, v2t_ref, hm_ref, *refs):
        at_ref = ab_ref = bt_ref = bb_ref = None
        if vhalo is not None:
            (ap, ac, an, bp, bc, bn, at_ref, ab_ref, bt_ref, bb_ref,
             da_ref, db_ref) = refs
        elif with_g:
            (ap, ac, an, bp, bc, bn, gp, gc, gn, da_ref, db_ref) = refs
        else:
            (ap, ac, an, bp, bc, bn, da_ref, db_ref) = refs
        i = pl.program_id(1)
        w_s = wref[0, 0, 0]
        w_cs = wref[0, 0, 1]
        if vhalo is not None:
            is_top = wref[0, 0, 2]
            is_bot = wref[0, 0, 3]
        m1 = v1_ref[0]
        m2t = v2t_ref[0]
        if use_mxu:
            hm = hm_ref[...]
            hp_heavy = lambda x: hp_mxu(x, hm)

            def hpT_heavy(wm):
                # Adjoint blur, MXU plain part: zero-extend to the
                # slice grid (adjoint of clamping folds, NOT replicas),
                # then the symmetric tap matrix; the folded clamp mass
                # at the two image-edge lanes (_edge_fold_correction)
                # rides on the VPU.
                z = jnp.zeros(wm.shape[:-1] + (r,), wm.dtype)
                zr = jnp.zeros(wm.shape[:-1] + (bw - w - r,), wm.dtype)
                plain = hp_mxu(jnp.concatenate([z, wm, zr], axis=-1), hm)
                return fold(plain, wm)
        else:
            hp_heavy = hp
            hpT_heavy = hpT

        def band_of(prev_ref, cur_ref, nxt_ref, top_ref=None, bot_ref=None):
            raw = jnp.concatenate(
                [prev_ref[0, tile_h - hb2 :], cur_ref[0], nxt_ref[0, :hb2]],
                axis=0,
            )
            # Ragged-block garbage can be NaN/inf/huge (see the forward's
            # float-garbage note); zero band weights can't neutralize it
            # once squared, so sanitize. Real NaN inputs are poisoned
            # back into the outputs below.
            raw = jnp.clip(
                jnp.nan_to_num(raw.astype(jnp.float32)), -clip_bound, clip_bound
            )
            if top_ref is not None:
                # Halo-operand splice (static offsets, selected on the
                # block index — same construction as the forward's
                # band_of): replaced positions otherwise hold clamped
                # prev/next or ragged garbage, which carry zero weight in
                # the vhalo matrices and true tap weight after splicing.
                top = jnp.clip(
                    jnp.nan_to_num(top_ref[0].astype(jnp.float32)),
                    -clip_bound, clip_bound,
                )
                bot = jnp.clip(
                    jnp.nan_to_num(bot_ref[0].astype(jnp.float32)),
                    -clip_bound, clip_bound,
                )

                # At the true image edges the operands may be RAW
                # collective outputs (ring-wrapped garbage); substitute
                # clamp replicas of the local edge rows in VMEM, gated
                # on the vmask flags — same design as the forward
                # kernel's vmask mode (two ppermutes and nothing else
                # host-side; tools/probe_spatial.py for the honest
                # measurement story). Pre-built replica operands pass
                # through unchanged (idempotent).
                def rep(src):
                    return jnp.broadcast_to(
                        raw[src : src + 1], (2 * r,) + raw.shape[1:]
                    )

                top = jnp.where(is_top > 0, rep(hb2), top)
                bot1 = jnp.where(
                    is_bot > 0, rep(hb2 + last_rows - 1), bot
                )
                bot2 = jnp.where(
                    is_bot > 0,
                    rep(min(hb2 + tile_h + last_rows - 1, band - 1)),
                    bot,
                )

                def splice(x, part, pos):
                    pieces = []
                    if pos > 0:
                        pieces.append(x[:pos])
                    pieces.append(part)
                    if pos + part.shape[0] < x.shape[0]:
                        pieces.append(x[pos + part.shape[0] :])
                    if len(pieces) == 1:
                        return pieces[0]
                    return jnp.concatenate(pieces, axis=0)

                raw = jnp.where(i == 0, splice(raw, top, hb2 - 2 * r), raw)
                raw = jnp.where(i == nh - 1, splice(raw, bot1, pos_last), raw)
                if nh >= 2 and pos_last + tile_h < band:
                    pos2 = pos_last + tile_h
                    part = (
                        bot2[: band - pos2] if band - pos2 < 2 * r else bot2
                    )
                    raw = jnp.where(i == nh - 2, splice(raw, part, pos2), raw)
            if not use_mxu:
                return raw
            # Concat-style lane halo for the aligned-slice MXU passes
            # (clamp-to-edge replicas; the VPU hpass uses co=r on the
            # same band).
            left = jnp.broadcast_to(raw[:, :1], (band, r))
            right = jnp.broadcast_to(raw[:, w - 1 : w], (band, bw - w - r))
            return jnp.concatenate([left, raw, right], axis=1)

        if vhalo is not None:
            af = band_of(ap, ac, an, at_ref, ab_ref)
            bf = band_of(bp, bc, bn, bt_ref, bb_ref)
        else:
            af = band_of(ap, ac, an)
            bf = band_of(bp, bc, bn)
        s_band = af + bf
        d_band = af - bf
        if vhalo is not None:
            # Runtime loss mask over the mid rows: virtual loss rows span
            # [-r, h+r) (neighbor rows within reach of owned rows), but at
            # the TRUE image top/bottom those rows do not exist — the
            # is_top/is_bot flags exclude them. Masking coeff_s AND w_cs
            # zeroes all four weight maps at invalid rows.
            gv = (
                jax.lax.broadcasted_iota(jnp.int32, (mid, 1), 0)
                + i * tile_h - mb
            )
            valid = ((gv >= -r) & (gv < h + r)).astype(jnp.float32)
            valid = valid * jnp.where(gv < 0, 1.0 - is_top, 1.0)
            valid = valid * jnp.where(gv >= h, 1.0 - is_bot, 1.0)
            coeff_s = w_s * valid
            w_cs = w_cs * valid
        elif with_g:
            # Per-pixel S cotangent at the mid rows. No blur touches g
            # itself, so no lane halo; out-of-image rows (ragged-block
            # garbage AND the wrong-content clamp rows at i=0 / i=nh-1)
            # are masked to 0 by row index — they would otherwise leak
            # NaN through the 0-weight V2T columns (0 * NaN = NaN). A
            # real NaN in the USER's cotangent still propagates through
            # the valid rows' weight maps, as the XLA VJP would.
            g_band = jnp.concatenate(
                [gp[0, tile_h - hb2 :], gc[0], gn[0, :hb2]], axis=0
            ).astype(jnp.float32)
            gid = (
                jax.lax.broadcasted_iota(jnp.int32, g_band.shape, 0)
                + i * tile_h - hb2
            )
            g_band = jnp.where((gid >= 0) & (gid < h), g_band, 0.0)
            coeff_s = w_s + g_band[hb2 - mb : hb2 - mb + mid]
        else:
            coeff_s = w_s

        def _dot(m, x, precision):
            return jax.lax.dot_general(
                m, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )

        if relaxed and use_mxu:
            # Loose tier ("mxu3x" analogue for the vertical passes): a
            # manual 3-pass bf16 split of both operands with DEFAULT
            # dots — bf16 products are exact in f32, so the error is
            # the dropped lo*lo residual, ~2^-17 relative per blur
            # (same bound as the forward's relaxed hpasses). Gated on
            # use_mxu so relaxed stays a strict no-op below MXU_MIN_W,
            # matching the forward tier's contract.
            def vpass(m, x):
                m1b = m.astype(jnp.bfloat16)
                m2b = (m - m1b.astype(jnp.float32)).astype(jnp.bfloat16)
                x1b = x.astype(jnp.bfloat16)
                x2b = (x - x1b.astype(jnp.float32)).astype(jnp.bfloat16)
                d = functools.partial(
                    _dot, precision=jax.lax.Precision.DEFAULT
                )
                return d(m1b, x1b) + (d(m1b, x2b) + d(m2b, x1b))
        else:
            def vpass(m, x):
                return _dot(m, x, jax.lax.Precision.HIGHEST)

        # Stage 1: forward blurs at the mid rows (recomputed in VMEM).
        # In the relaxed tier the kernel is no longer MXU-bound (round-4
        # ceiling note: the bound shifts to VPU pointwise algebra + roll
        # transposes), so the mu-class horizontal passes move to the MXU
        # loose tier too — rebalancing, measured on v5e round 5. The
        # standard tier keeps them on the VPU (it IS MXU-bound at 98.5%
        # of predicted SoL; adding MXU passes there measured -14%).
        hp1 = hp if (_split == "vpu1" and use_mxu) else hp_heavy
        hp_mu = hp_heavy if (relaxed and use_mxu) else hp
        u = hp_mu(vpass(m1, af))
        v = hp_mu(vpass(m1, bf))
        ss = hp1(vpass(m1, s_band * s_band))
        dd = hp1(vpass(m1, d_band * d_band))

        # Pointwise partials (see module docstring; autodiff-verified).
        uv = u * v
        usq = u * u + v * v
        a1 = 2.0 * uv + c1
        a2 = 0.5 * (ss - dd) - 2.0 * uv + c2
        b1 = usq + c1
        b2 = 0.5 * (ss + dd) - usq + c2
        rb1 = 1.0 / b1
        rb2 = 1.0 / b2
        lum = a1 * rb1
        cs = a2 * rb2
        s_val = lum * cs
        half_rb2 = 0.5 * rb2
        d_ss_c = half_rb2 * (1.0 - cs)
        d_dd_c = -half_rb2 * (1.0 + cs)
        w_ss = (coeff_s * lum + w_cs) * d_ss_c
        w_dd = (coeff_s * lum + w_cs) * d_dd_c
        q = a2 - a1
        rb12 = rb1 * rb2
        drb = rb1 - rb2
        w_u = coeff_s * (2.0 * v * q * rb12 - 2.0 * u * s_val * drb) + w_cs * (
            (2.0 * u * cs - 2.0 * v) * rb2
        )
        w_v = coeff_s * (2.0 * u * q * rb12 - 2.0 * v * s_val * drb) + w_cs * (
            (2.0 * v * cs - 2.0 * u) * rb2
        )

        # Stage 2: adjoint blur (transposed band matmul + transposed
        # roll hpass) back to the tile's own rows. Same relaxed-tier
        # rebalancing as stage 1: tu/tv's VPU roll transposes move to
        # the MXU adjoint (hpT_heavy exists for tss/tdd already).
        hpT2 = hpT if (_split == "vpu2" and use_mxu) else hpT_heavy
        hpT_mu = hpT_heavy if (relaxed and use_mxu) else hpT
        if vhalo is not None:
            # Vertical clamp-fold at the true image edges: loss rows
            # g in [0, r) read clamp-replicated rows below row 0 (the
            # edge shards' halo operands ARE those replicas, so stage 1
            # is already the clamped blur); their adjoint folds cl_v[g]
            # extra tap mass onto the edge input row. The non-vhalo
            # matrices carry this fold in their construction; here it is
            # applied at runtime, gated on is_top/is_bot and the block
            # index, BETWEEN the vertical and horizontal adjoints (the
            # separable transpose is Gh^T . Gv^T — the fold mass rides
            # through the lane pass like every other vertical output).
            # Derivation: folding the replica halo rows' gradients onto
            # the edge row — the spatial layer's old host-side `fold` —
            # commutes with the pointwise s/d combination because
            # replica rows share the edge row's s/d values.
            rid1 = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w_u.shape[-1]), 0)
            gate_t = jnp.where(i == 0, is_top, 0.0)
            gate_b = jnp.where(i == nh - 1, is_bot, 0.0)
            y_bot = last_rows - 1

            def vadj(m2t_, w_map):
                vt = vpass(m2t_, w_map)
                corr_t = sum(
                    cl_v[g] * w_map[mb + g : mb + g + 1] for g in range(r)
                )
                corr_b = sum(
                    cl_v[x]
                    * w_map[mb + last_rows - 1 - x : mb + last_rows - x]
                    for x in range(r)
                )
                return (
                    vt
                    + jnp.where(rid1 == 0, gate_t * corr_t, 0.0)
                    + jnp.where(rid1 == y_bot, gate_b * corr_b, 0.0)
                )

            tu = hpT_mu(vadj(m2t, w_u))
            tv = hpT_mu(vadj(m2t, w_v))
            tss = hpT2(vadj(m2t, w_ss))
            tdd = hpT2(vadj(m2t, w_dd))
        else:
            tu = hpT_mu(vpass(m2t, w_u))
            tv = hpT_mu(vpass(m2t, w_v))
            tss = hpT2(vpass(m2t, w_ss))
            tdd = hpT2(vpass(m2t, w_dd))

        s_out = s_band[hb2 : hb2 + tile_h]
        d_out = d_band[hb2 : hb2 + tile_h]
        if use_mxu:
            s_out = s_out[:, r : r + w]
            d_out = d_out[:, r : r + w]
        da = tu + 2.0 * s_out * tss + 2.0 * d_out * tdd
        db = tv + 2.0 * s_out * tss - 2.0 * d_out * tdd

        # NaN/inf input pixels must surface in the gradients (the band
        # sanitize above would otherwise hide them). Same poisoning trick
        # as the forward: 0 * sum of the tile's own valid pixels.
        src = ac[0].astype(jnp.float32) + bc[0].astype(jnp.float32)
        if h % tile_h != 0:
            rid = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0)
            src = jnp.where(rid < h - i * tile_h, src, 0.0)
        pois = jnp.sum(src) * 0.0
        if vhalo is not None:
            # NaN/inf in the neighbor halo rows must surface in the
            # blocks that spliced them (same granularity as the concat
            # formulation's per-tile poison).
            hsum_t = jnp.sum(at_ref[0].astype(jnp.float32)) + jnp.sum(
                bt_ref[0].astype(jnp.float32)
            )
            hsum_b = jnp.sum(ab_ref[0].astype(jnp.float32)) + jnp.sum(
                bb_ref[0].astype(jnp.float32)
            )
            pois = pois + (
                jnp.where(i == 0, hsum_t, 0.0)
                + jnp.where(i >= nh - 2, hsum_b, 0.0)
            ) * 0.0
        da_ref[0] = da + pois
        db_ref[0] = db + pois

    def spec(di):
        if di < 0:
            index = lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0)
        elif di > 0:
            index = lambda bi, i: (bi, jnp.minimum(i + 1, nh - 1), 0)
        else:
            index = lambda bi, i: (bi, i, 0)
        return pl.BlockSpec((1, tile_h, w), index, memory_space=pltpu.VMEM)

    specs = [spec(-1), spec(0), spec(1)]
    w_spec = pl.BlockSpec((1, 1, ws.shape[-1]), lambda bi, i: (bi, 0, 0),
                          memory_space=pltpu.SMEM)
    v1_spec = pl.BlockSpec((1, mid, band), lambda bi, i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    v2t_spec = pl.BlockSpec((1, tile_h, mid), lambda bi, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    hm_spec = pl.BlockSpec((128 + 2 * r, 128), lambda bi, i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_h, w), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((batch, nh * tile_h, w), jnp.float32)

    in_specs = [w_spec, v1_spec, v2t_spec, hm_spec] + specs + specs
    operands = [ws.reshape(batch, 1, ws.shape[-1]), v1, v2t, hmat,
                a, a, a, b, b, b]
    if with_g:
        in_specs = in_specs + specs
        operands = operands + [gmap, gmap, gmap]
    if vhalo is not None:
        r2 = vhalo[0].shape[-2]
        in_specs = in_specs + [
            pl.BlockSpec((1, r2, w), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 4
        operands = operands + list(vhalo)
    da, db = pl.pallas_call(
        kernel,
        grid=(batch, nh),
        in_specs=in_specs,
        out_shape=(out_shape, out_shape),
        out_specs=(out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # The backward's working set (two 64-row input bands, four
            # mid-row blurred signals, four weight maps, two outputs,
            # plus Mosaic's roll/select temporaries) exceeds the default
            # 16 MiB scoped-VMEM window beyond w~1920. v5e has 128 MiB
            # of physical VMEM; raising the scoped limit trades double-
            # buffering headroom for width coverage (measured on v5e:
            # throughput at w=1920 is unchanged vs the 16 MiB window,
            # and 8K-wide images compile; 16M capped the kernel at
            # w=1920, 64M at w=4096).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return da[:, :h, :], db[:, :h, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "data_range", "interpret", "tile_h", "relaxed", "radius", "sigma",
        "k1", "k2",
    ),
)
def ssim_grad_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    w_s: jnp.ndarray,
    w_cs: jnp.ndarray,
    g_map=None,
    *,
    data_range: float = 255.0,
    interpret: bool = False,
    tile_h: Optional[int] = None,
    relaxed: bool = False,
    radius: int = RADIUS,
    sigma: float = SIGMA,
    k1: float = 0.01,
    k2: float = 0.03,
    vhalo=None,
    vmask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel SSIM gradients: (dL/da, dL/db) for
    L = sum_p (w_s + g_map(p)) * SSIM(p) + w_cs * sum_p cs(p), per image.

    a, b: float32 (H, W) or (B, H, W); w_s, w_cs: scalars or (B,)
    per-image cotangent weights (fold any 1/n normalization in);
    g_map: optional per-pixel SSIM-map cotangent of the same shape as
    a (the `ssim_and_map` backward). Widths must satisfy
    grad_pallas_supported; callers fall back to the XLA VJP otherwise.
    tile_h: grid row-block height; None picks the measured-best default
    (64 at every standard width — see the inline sweep note).
    relaxed: the loose bf16-split tier for the MXU passes (wide images
    only, like the forward's accuracy="relaxed"): 3-pass DEFAULT dots
    instead of 6-pass HIGHEST for the four heavy horizontal passes AND
    all eight vertical band matmuls; per-blur error ~2^-17 relative.
    radius/sigma/k1/k2: the custom-window extension (trace-time taps,
    band matrices, and halo geometry; radius <= MAX_FUSED_RADIUS).
    vhalo/vmask (the sharded-training mode, parallel/spatial.py): a, b
    are one row-shard of a taller image, vhalo = (a_top, a_bot, b_top,
    b_bot) supplies the 2*radius neighbor rows each side as separate
    kernel operands (spliced in VMEM — no halo-concatenated HBM copy,
    matching the forward's vhalo mode), and vmask = (is_top, is_bot)
    flags (traced 0/1 scalars) mark the true image edges: there the
    operands must be clamp replicas of the edge row, nonexistent
    virtual loss rows are masked out in-kernel, and the vertical
    clamp-fold adjoint lands on the owned edge rows. Returns gradients
    for the OWNED rows only. L is then w_s * sum over the owned rows'
    loss terms PLUS the neighbor-row terms within radius (each shard
    computes its neighbors' contributions to its own rows; summed over
    shards this is exactly the global loss). Scalar cotangents only
    (g_map=None).
    """
    if a.dtype != jnp.float32 or b.dtype != jnp.float32:
        raise ValueError(
            f"ssim_grad_pallas takes float32 pairs (u8 has no gradient), "
            f"got {a.dtype}/{b.dtype}"
        )
    squeeze = a.ndim == 2
    if squeeze:
        a = a[None]
        b = b[None]
        if g_map is not None:
            g_map = g_map[None]
        if vhalo is not None:
            vhalo = tuple(x[None] for x in vhalo)
    if g_map is not None and g_map.shape != a.shape:
        raise ValueError(
            f"g_map shape {g_map.shape} must match images {a.shape}"
        )
    batch, h, w = a.shape
    if vhalo is not None:
        if g_map is not None:
            raise ValueError(
                "vhalo mode takes scalar cotangents only (g_map=None): "
                "per-pixel cotangents for virtual loss rows would need "
                "their own halo exchange"
            )
        if vmask is None:
            raise ValueError("vhalo requires vmask=(is_top, is_bot)")
        vhalo = tuple(jnp.asarray(x, jnp.float32) for x in vhalo)
        want = (batch, 2 * radius, w)
        if len(vhalo) != 4 or any(x.shape != want for x in vhalo):
            raise ValueError(
                f"vhalo must be 4 float arrays (a_top, a_bot, b_top, "
                f"b_bot) of shape {want}, got "
                f"{[tuple(x.shape) for x in vhalo]}"
            )
        if h < 2 * radius:
            raise ValueError(
                f"vhalo shards must be >= 2*radius = {2 * radius} rows "
                f"tall, got {h}"
            )
    if not grad_pallas_supported(h, w, radius):
        raise ValueError(
            f"ssim_grad_pallas needs w > radius, h >= 1, and radius in "
            f"1..{MAX_FUSED_RADIUS}; got {h}x{w} at radius {radius}"
        )
    cols = [
        jnp.broadcast_to(jnp.asarray(w_s, jnp.float32), (batch,)),
        jnp.broadcast_to(jnp.asarray(w_cs, jnp.float32), (batch,)),
    ]
    if vhalo is not None:
        cols += [
            jnp.broadcast_to(jnp.asarray(x, jnp.float32), (batch,))
            for x in vmask
        ]
    ws = jnp.stack(cols, axis=-1)
    # radius/sigma/k1/k2 generalize the window and stabilization constants
    # (matching the forward extension): tap VALUES flow into the
    # trace-time band matrices and the c1/c2 scalars, and the halo
    # geometry (_grad_geometry) is built from the radius at trace time —
    # any radius <= MAX_FUSED_RADIUS rides this kernel.
    taps = gaussian_taps(np.float32, radius, sigma)
    c1 = float((k1 * data_range) ** 2)
    c2 = float((k2 * data_range) ** 2)
    if c1 * c2 < 9e-32:
        # Same degeneracy floor as the forward kernels (c1*c2 must stay
        # a normal f32; TPUs flush subnormals).
        raise ValueError(
            f"k1/k2 too small for data_range {data_range}: c1*c2 = "
            f"{c1 * c2:g} degenerates in f32 (needs >= 9e-32)"
        )
    clip_bound = max(131072.0, 4.0 * float(data_range))
    if g_map is not None:
        g_map = g_map.astype(jnp.float32)
    if tile_h is None:
        # Measured on v5e (2026-08-17 devicebench sweeps): tile_h=64
        # wins at every standard width — 1080p 5,737 vs 5,160 (t=32),
        # 4K 5,834 vs 5,325, 8K 5,230 vs 4,647 — the halo recompute
        # overhead is (tile_h+32)/tile_h = 1.5 at 32 vs 1.25 at 64,
        # and even 8K's larger live bands fit the raised VMEM window.
        # (An outage-era sweep briefly recorded 8K preferring 32; a
        # healthy-tunnel re-measure overturned it.) 96/128 measured
        # worse everywhere (5,408/3,521 at 1080p).
        tile_h = 64
    hb2 = _grad_geometry(tile_h, radius)[0]
    if tile_h < hb2 or tile_h % 8 != 0:
        # The 2r-row halos come from single neighbor blocks (tile_h >=
        # hb2) and sublane alignment wants multiples of 8.
        raise ValueError(
            f"tile_h must be a multiple of 8 >= {hb2} (the 2r halo) at "
            f"radius {radius}, got {tile_h}"
        )
    if w <= GRAD_MAX_W:
        da, db = _grad_call(a, b, ws, h, w, taps, c1, c2, interpret,
                            clip_bound, gmap=g_map, tile_h=tile_h,
                            relaxed=relaxed, vhalo=vhalo)
    else:
        # Column-chunked wide path: overlapping windows of chunk_w owned
        # columns + 2*radius halo columns each side (window <=
        # GRAD_MAX_W, the validated per-call maximum). Owned-column
        # gradients are exact by the same two-level halo argument as the
        # spatial row sharding (parallel/spatial.py): every weight-map
        # column within radius of the owned range reads only true
        # content (>= radius from the window edge, so the kernel's own
        # horizontal clamp never fires there), and clamp-polluted
        # weight-map columns sit >= radius deeper — their adjoint spread
        # stays inside the discarded halo columns. Windows at the true
        # image edges keep the kernel's clamp semantics natively. Loss
        # terms in the overlap are computed by both windows, but each
        # input column's gradient is kept from exactly one window.
        r2 = 2 * radius
        chunk_w = GRAD_MAX_W - 2 * r2
        das, dbs = [], []
        start = 0
        while start < w:
            end = min(w, start + chunk_w)
            lo = max(0, start - r2)
            hi = min(w, end + r2)
            gm = None if g_map is None else g_map[..., lo:hi]
            vh = (
                None
                if vhalo is None
                else tuple(x[..., lo:hi] for x in vhalo)
            )
            da_c, db_c = _grad_call(
                a[..., lo:hi], b[..., lo:hi], ws, h, hi - lo, taps, c1, c2,
                interpret, clip_bound, gmap=gm, tile_h=tile_h,
                relaxed=relaxed, vhalo=vh,
            )
            das.append(da_c[..., start - lo : end - lo])
            dbs.append(db_c[..., start - lo : end - lo])
            start = end
        da = jnp.concatenate(das, axis=-1)
        db = jnp.concatenate(dbs, axis=-1)
    if squeeze:
        da, db = da[0], db[0]
    return da, db
