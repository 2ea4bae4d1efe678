"""The backward kernel's vhalo mode (ops/ssim_grad.py): halo-operand
gradients for row-sharded training (parallel/spatial.py), validated
against the retired halo-concatenated formulation — extended window +
per-pixel cotangent mask + host-side replica fold — which is itself
autodiff-validated (tests/test_grad.py, tests/test_distributed.py).

The reference has no distributed or autodiff story; the sharding design
this serves mirrors its tile-margin isolation (src/ssim.cpp:230-239).

Edge shards pass RAW (garbage) halo operands on purpose: the kernel must
substitute the clamp replicas itself, gated on the vmask flags (the
design rationale and its measurement story live in
tools/probe_spatial.py / _exchange_halo_rows_pair).

Runs interpret on CPU and COMPILED under SSIM_TPU_TEST_TPU=1 (the
backend-aware pattern of test_grad.py — interpret-green is not enough
for this kernel family). The relaxed tier is hardware-validated in
tools/hw_vhalo_grad.py only — TPU-interpret evaluates its bf16 DEFAULT
dots ~1e-2 loose (see test_grad.py::test_grad_relaxed_tier).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ssim_tpu.dispatch import backend_platform  # noqa: E402
from ssim_tpu.ops.ssim_grad import ssim_grad_pallas  # noqa: E402

INTERPRET = backend_platform() != "tpu"


@pytest.fixture()
def rng():
    return np.random.default_rng(3)


def _concat_ref(a_loc, b_loc, vh, h, w, r, is_top, is_bot, w_s, w_cs, **kw):
    """The pre-round-5 concat formulation (ground truth)."""
    m = 2 * r
    at, ab_, bt, bb = vh
    ae = jnp.concatenate([at, a_loc, ab_], axis=-2)
    be = jnp.concatenate([bt, b_loc, bb], axis=-2)
    gid = np.arange(-m, h + m)
    mask = np.ones(h + 2 * m, np.float32)
    if is_top:
        mask[gid < 0] = 0.0
    if is_bot:
        mask[gid >= h] = 0.0
    gmap = jnp.broadcast_to((mask * w_s)[:, None], ae.shape)
    da, db = ssim_grad_pallas(ae, be, 0.0, w_cs, gmap, interpret=INTERPRET, **kw)

    def fold(g):
        o = g[..., m : m + h, :]
        if is_top:
            o = o.at[..., 0, :].add(jnp.sum(g[..., :m, :], axis=-2))
        if is_bot:
            o = o.at[..., h - 1, :].add(jnp.sum(g[..., m + h :, :], axis=-2))
        return o

    return fold(da), fold(db)


def _check(rng, h, w, r=5, is_top=False, is_bot=False, batch=None,
           w_s=1.3, w_cs=0.0, tol=2e-5, **kw):
    lead = () if batch is None else (batch,)
    m = 2 * r
    a_loc = rng.random(lead + (h, w)).astype(np.float32) * 255
    b_loc = rng.random(lead + (h, w)).astype(np.float32) * 255
    garbage = lambda: rng.random(lead + (m, w)).astype(np.float32) * 255

    def replicas(x, row):
        return np.repeat(np.take(x, [row], axis=-2), m, axis=-2)

    # Ground-truth halos: true clamp replicas at the flagged edges.
    at = replicas(a_loc, 0) if is_top else garbage()
    bt = replicas(b_loc, 0) if is_top else garbage()
    ab_ = replicas(a_loc, -1) if is_bot else garbage()
    bb = replicas(b_loc, -1) if is_bot else garbage()
    # Kernel operands: RAW garbage at flagged edges (the kernel must
    # substitute), true neighbor rows (same arrays) elsewhere.
    vh_raw = (
        garbage() if is_top else at,
        garbage() if is_bot else ab_,
        garbage() if is_top else bt,
        garbage() if is_bot else bb,
    )
    kw2 = dict(radius=r, **kw)
    want_da, want_db = _concat_ref(
        jnp.asarray(a_loc), jnp.asarray(b_loc), (at, ab_, bt, bb),
        h, w, r, is_top, is_bot, w_s, w_cs, **kw2,
    )
    got_da, got_db = ssim_grad_pallas(
        jnp.asarray(a_loc), jnp.asarray(b_loc), w_s, w_cs, interpret=INTERPRET,
        vhalo=tuple(jnp.asarray(x) for x in vh_raw),
        vmask=(float(is_top), float(is_bot)), **kw2,
    )
    scale = max(float(np.abs(np.asarray(want_da)).max()), 1e-30)
    for got, want in ((got_da, want_da), (got_db, want_db)):
        err = float(np.abs(np.asarray(got) - np.asarray(want)).max())
        assert err <= tol * scale, (err, scale)


def test_vhalo_grad_interior(rng):
    """Interior shard: true neighbor rows on both sides, no folds."""
    _check(rng, 64, 256)


def test_vhalo_grad_interior_ragged(rng):
    """Ragged tile grid (h % tile_h != 0) under the vhalo matrices."""
    _check(rng, 66, 200)


@pytest.mark.parametrize("is_top,is_bot", [(True, False), (False, True),
                                           (True, True)])
def test_vhalo_grad_edges(rng, is_top, is_bot):
    """True-image-edge shards: in-kernel replica substitution, loss-row
    mask, and the vertical clamp-fold adjoint at the owned edge rows."""
    _check(rng, 64, 256, is_top=is_top, is_bot=is_bot)


def test_vhalo_grad_edge_ragged(rng):
    """Bottom fold with a ragged last tile (y_bot != tile_h - 1)."""
    _check(rng, 70, 131, is_bot=True)


def test_vhalo_grad_batched(rng):
    """Leading batch dim (the 2-D data x space mesh case)."""
    _check(rng, 40, 200, batch=2)


@pytest.mark.parametrize("r,h,w,edge", [(3, 32, 200, {}),
                                        (8, 40, 300, {"is_bot": True})])
def test_vhalo_grad_custom_radius(rng, r, h, w, edge):
    """Radius-generic halo geometry (2r operands, cl_v fold weights)."""
    _check(rng, h, w, r=r, **edge)


def test_vhalo_grad_w_cs(rng):
    """The cs-channel cotangent rides the runtime loss mask too."""
    _check(rng, 64, 256, w_cs=0.7)


def test_vhalo_grad_mxu_edge(rng):
    """w >= MXU_MIN_W: the fold corrections ride the MXU hpT transpose
    (the Gh^T . Gv^T ordering this mode's fold must respect)."""
    _check(rng, 64, 640, is_bot=True)


def test_vhalo_grad_chunked(rng, monkeypatch):
    """Column-chunked wide path: halos chunk with the images."""
    import ssim_tpu.ops.ssim_grad as sg

    monkeypatch.setattr(sg, "GRAD_MAX_W", 384)
    _check(rng, 48, 900, is_top=True)


def test_vhalo_grad_validation(rng):
    """vhalo contract errors: missing vmask, bad shapes, g_map."""
    a = jnp.asarray(rng.random((32, 128)).astype(np.float32))
    vh = tuple(jnp.zeros((10, 128), jnp.float32) for _ in range(4))
    with pytest.raises(ValueError, match="vmask"):
        ssim_grad_pallas(a, a, 1.0, 0.0, interpret=INTERPRET, vhalo=vh)
    with pytest.raises(ValueError, match="shape"):
        bad = tuple(jnp.zeros((4, 128), jnp.float32) for _ in range(4))
        ssim_grad_pallas(a, a, 1.0, 0.0, interpret=INTERPRET, vhalo=bad,
                         vmask=(0.0, 0.0))
    with pytest.raises(ValueError, match="g_map"):
        ssim_grad_pallas(a, a, 1.0, 0.0, jnp.zeros_like(a), interpret=INTERPRET,
                         vhalo=vh, vmask=(0.0, 0.0))
