"""Spatial sharding: one huge image split by rows across the mesh.

TPU-native extension of the reference's overlapping-tile decomposition
(each 256x64 tile carries a 5-px read halo so tiles are independent,
src/ssim.cpp:230-239): here each *chip* owns a row band, and the 5-row
blur halos move over ICI with `jax.lax.ppermute` instead of being re-read
from shared memory. True image borders (shard 0's top, shard n-1's
bottom) use clamp-to-edge replication exactly like the reference
(src/ssim.cpp:560-582); interior shard boundaries use real neighbor rows,
so the sharded result equals the single-device result bit-for-bit in
structure (validated to tolerance in tests/test_distributed.py).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ssim_xla import ssim_from_padded
from ..windows import RADIUS


def _exchange_halos(x: jnp.ndarray, axis: str, n_shards: int, radius: int) -> jnp.ndarray:
    """Concatenate neighbor halo rows onto a row-sharded block.

    x: (Hs, W) local rows. Returns (Hs + 2*radius, W): top halo from the
    previous shard's bottom rows, bottom halo from the next shard's top
    rows; image-edge shards replicate their own edge row (clamp-to-edge).
    """
    idx = jax.lax.axis_index(axis)
    # Bottom rows travel to the next shard (become its top halo) and vice
    # versa. ppermute with a full ring; edge results are overridden below.
    down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    top_halo = jax.lax.ppermute(x[-radius:], axis, down)
    bot_halo = jax.lax.ppermute(x[:radius], axis, up)
    # Clamp-to-edge at the true image borders (reference src/ssim.cpp:560-582).
    edge_top = jnp.broadcast_to(x[0:1], (radius, x.shape[1]))
    edge_bot = jnp.broadcast_to(x[-1:], (radius, x.shape[1]))
    top_halo = jnp.where(idx == 0, edge_top, top_halo)
    bot_halo = jnp.where(idx == n_shards - 1, edge_bot, bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def ssim_spatial_sharded(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "space",
    with_map: bool = False,
    data_range: float = 255.0,
    radius: int = RADIUS,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """SSIM of one (H, W) pair with rows sharded over `axis`.

    H must be divisible by the axis size. Returns (row_sums (H,) f32,
    map (H, W) f32 or None), row-sharded over the mesh.
    """
    n_shards = mesh.shape[axis]
    if a.shape[0] % n_shards != 0:
        raise ValueError(
            f"image height {a.shape[0]} must be divisible by the '{axis}' "
            f"mesh axis size {n_shards} (pad the image or choose a mesh "
            f"that divides it)"
        )
    if a.shape[0] // n_shards < radius:
        raise ValueError(
            f"shard height {a.shape[0] // n_shards} is smaller than the "
            f"blur radius {radius}; use fewer shards"
        )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis), P(axis, None)) if with_map else (P(axis), P()),
    )
    def shard_fn(a_s, b_s):
        af = a_s.astype(jnp.float32)
        bf = b_s.astype(jnp.float32)
        # Vertical halos over ICI; horizontal borders are local edge pads.
        ap = _exchange_halos(af, axis, n_shards, radius)
        bp = _exchange_halos(bf, axis, n_shards, radius)
        ap = jnp.pad(ap, ((0, 0), (radius, radius)), mode="edge")
        bp = jnp.pad(bp, ((0, 0), (radius, radius)), mode="edge")
        row_sums, ssim_map = ssim_from_padded(
            ap, bp, with_map=with_map, radius=radius, data_range=data_range
        )
        if not with_map:
            return row_sums, jnp.zeros((), jnp.float32)
        return row_sums, ssim_map

    row_sums, ssim_map = shard_fn(a, b)
    return row_sums, (ssim_map if with_map else None)
