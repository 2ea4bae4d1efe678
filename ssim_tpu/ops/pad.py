"""Pallas edge-pad-and-align kernel. RETAINED FOR REFERENCE ONLY: the
round-4 zero-copy chunked rewrite removed the last production caller
(the SSIM kernels now consume raw images via clamped index maps, and
wide images chunk with internal VMEM halo concats). The kernel stays
because it is the repo's worked example of aligned DMA padding for
layouts the SSIM fast paths don't cover, with its own test coverage
(tests/test_pad.py).

The fused SSIM kernel used to consume images padded with clamp-to-edge
replication (reference border rule, src/ssim.cpp:515-583) and aligned to
tile geometry. XLA's u8 `jnp.pad(mode="edge")` measured ~24 GB/s on v5e
(relayout-heavy lowering) and cost ~25% of SSIM end-to-end time; this
kernel does the transform with the DMA engine at HBM speed.

Alignment is the whole trick: Mosaic requires DMA slices of tiled HBM
memrefs to be (8, 128)-aligned, so the image is placed at padded offset
(ROW_OFF=8, COL_OFF=128) — NOT at (radius, radius) — and the consuming
kernel folds the odd radius-5 offset into its band matrix / slice bases.
Every DMA here then has 8-aligned row starts/sizes and 128-aligned column
starts/sizes; the small halo replications are VPU broadcast stores in
VMEM.

Fast-path requirements: H % 8 == 0, W % 128 == 0, H >= tile_h. Callers
fall back to jnp.pad (same layout) otherwise.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..windows import RADIUS

#: Padded-layout offsets of image pixel (0, 0).
ROW_OFF = 8
COL_OFF = 128


def pad_supported(h: int, w: int, tile_h: int = 32) -> bool:
    return h % 8 == 0 and w % 128 == 0 and h >= tile_h


def pad_align_xla(x: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """jnp.pad fallback producing the same (ROW_OFF, COL_OFF) layout."""
    b, h, w = x.shape
    return jnp.pad(
        x, ((0, 0), (ROW_OFF, hp - h - ROW_OFF), (COL_OFF, wp - w - COL_OFF)),
        mode="edge",
    )


@functools.partial(jax.jit, static_argnames=("hp", "wp", "tile_h", "interpret"))
def pad_align_pallas(
    x: jnp.ndarray,
    *,
    hp: int,
    wp: int,
    tile_h: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Edge-pad (B, H, W) -> (B, hp, wp) of the same dtype (u8 is the
    parity dtype; f32 serves the float-extension chunked path — both tile
    as (8,128)-aligned memrefs), image top-left at (ROW_OFF, COL_OFF);
    all out-of-image cells are edge replicas."""
    batch, h, w = x.shape
    assert pad_supported(h, w, tile_h), (h, w)
    assert hp % tile_h == 0 and hp >= h + ROW_OFF, (hp, h)
    assert wp % 128 == 0 and wp >= w + COL_OFF + RADIUS, (wp, w)
    n_blocks = hp // tile_h
    # Last block index containing real image rows (image row h-1 sits at
    # padded row h - 1 + ROW_OFF).
    last_data = (h - 1 + ROW_OFF) // tile_h

    def kernel(x_ref, out_ref, scratch, sem):
        bi = pl.program_id(0)
        i = pl.program_id(1)

        def copy(src_start, dst_start, rows):
            # All row starts are 8-aligned by construction (tile_h and
            # ROW_OFF are multiples of 8); the hint lets Mosaic prove it.
            dma = pltpu.make_async_copy(
                x_ref.at[bi, pl.ds(pl.multiple_of(src_start, 8), rows), :],
                scratch.at[pl.ds(dst_start, rows), pl.ds(COL_OFF, w)],
                sem,
            )
            dma.start()
            dma.wait()

        @pl.when(i == 0)
        def _():
            # dest rows [ROW_OFF, tile_h) = image rows [0, tile_h - ROW_OFF).
            copy(0, ROW_OFF, tile_h - ROW_OFF)
            # top halo: replicate image row 0 upward.
            scratch[:ROW_OFF, pl.ds(COL_OFF, w)] = jnp.broadcast_to(
                scratch[ROW_OFF : ROW_OFF + 1, pl.ds(COL_OFF, w)], (ROW_OFF, w)
            )

        @pl.when((i > 0) & (i < last_data))
        def _():
            copy(i * tile_h - ROW_OFF, 0, tile_h)

        if last_data > 0:
            @pl.when(i == last_data)
            def _():
                avail = h - (last_data * tile_h - ROW_OFF)  # static, mult of 8
                if avail >= tile_h:
                    copy(last_data * tile_h - ROW_OFF, 0, tile_h)
                else:
                    copy(last_data * tile_h - ROW_OFF, 0, avail)
                    scratch[pl.ds(avail, tile_h - avail), pl.ds(COL_OFF, w)] = (
                        jnp.broadcast_to(
                            scratch[avail - 1 : avail, pl.ds(COL_OFF, w)],
                            (tile_h - avail, w),
                        )
                    )

        @pl.when(i > last_data)
        def _():
            # Pure replication block: fetch the image's last 8 rows
            # (aligned DMA) and broadcast the final one over the block.
            copy(h - 8, 0, 8)
            scratch[:, pl.ds(COL_OFF, w)] = jnp.broadcast_to(
                scratch[7:8, pl.ds(COL_OFF, w)], (tile_h, w)
            )

        # Left/right halos + deterministic junk fill (VPU stores, not DMA —
        # no alignment constraint).
        scratch[:, :COL_OFF] = jnp.broadcast_to(
            scratch[:, COL_OFF : COL_OFF + 1], (tile_h, COL_OFF)
        )
        scratch[:, pl.ds(COL_OFF + w, wp - w - COL_OFF)] = jnp.broadcast_to(
            scratch[:, COL_OFF + w - 1 : COL_OFF + w], (tile_h, wp - w - COL_OFF)
        )
        out_ref[0] = scratch[...]

    return pl.pallas_call(
        kernel,
        grid=(batch, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((batch, hp, wp), x.dtype),
        out_specs=pl.BlockSpec(
            (1, tile_h, wp), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h, wp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x)


def pad_align(x: jnp.ndarray, hp: int, wp: int, tile_h: int = 32,
              interpret: bool = False) -> jnp.ndarray:
    """Dispatch: DMA fast path when geometry permits, else XLA pad."""
    _, h, w = x.shape
    if pad_supported(h, w, tile_h) and hp % tile_h == 0:
        return pad_align_pallas(x, hp=hp, wp=wp, tile_h=tile_h, interpret=interpret)
    return pad_align_xla(x, hp, wp)
