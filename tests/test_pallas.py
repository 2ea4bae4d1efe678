"""Differential tests: fused Pallas kernel vs the f64 oracle.

On the CPU test backend the kernel runs in Pallas interpreter mode
(numerics identical to TPU modulo instruction scheduling); the TPU
compile path is exercised by bench.py and __graft_entry__.py on hardware.
"""

import os

import numpy as np
import pytest

from ssim_tpu import compute_ssim, reference
from ssim_tpu.testing import frozen
from ssim_tpu.utils import load_image

from conftest import random_pair


def _check(a, b):
    want, want_map = reference.compute_ssim(a, b, with_map=True)
    got, got_map = compute_ssim(a, b, with_map=True, impl="pallas")
    npix = a.shape[-1] * a.shape[-2]
    tol = max(frozen.GLOBAL_TOLERANCE_F32, 2e-3 / npix**0.5)
    assert abs(got - want) < tol, (got, want, tol)
    assert got_map.shape == want_map.shape
    assert np.abs(got_map - want_map).max() < frozen.PIXEL_TOLERANCE_F32


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (9, 13), (63, 255), (65, 257), (112, 128), (113, 129), (200, 300)],
)
def test_odd_shapes_vs_oracle(rng, shape):
    a, b = random_pair(rng, *shape)
    _check(a, b)


def test_einstein_vs_oracle(images_dir):
    ref = load_image(os.path.join(images_dir, "einstein.png"))
    img = load_image(os.path.join(images_dir, "blur.png"))
    _check(img, ref)


def test_einstein_frozen_global(images_dir):
    ref = load_image(os.path.join(images_dir, "einstein.png"))
    for name, want in frozen.EINSTEIN_SUITE.items():
        img = load_image(os.path.join(images_dir, name))
        got = compute_ssim(img, ref, impl="pallas")
        assert abs(got - want) < frozen.GLOBAL_TOLERANCE_F32, (name, got, want)


def test_batched_matches_single(rng):
    # Small batches route through the lane-packed path, whose column-sum
    # reduction order differs from the single-image tile sums — agreement
    # is f32-roundoff (~1e-8), not bitwise (it was 1e-9 when both shapes
    # ran the identical code path).
    pairs = [random_pair(rng, 60, 90) for _ in range(2)]
    a = np.stack([p[0] for p in pairs])
    b = np.stack([p[1] for p in pairs])
    scores = compute_ssim(a, b, impl="pallas")
    for i in range(2):
        single = compute_ssim(a[i], b[i], impl="pallas")
        assert scores[i] == pytest.approx(single, abs=1e-7)


def test_pallas_matches_xla(rng):
    """The two optimized paths must agree to f32-roundoff levels."""
    a, b = random_pair(rng, 150, 220)
    gx, mx = compute_ssim(a, b, with_map=True, impl="xla")
    gp, mp = compute_ssim(a, b, with_map=True, impl="pallas")
    assert gp == pytest.approx(gx, abs=5e-7)
    assert np.abs(mp - mx).max() < 5e-4


def test_wide_image_fast_path(rng):
    """4-9K-wide images ride the widened zero-copy fast path by default
    (round-4: the gate moved from 4096 to 16384 lanes — measured 14.6 vs
    the chunked path's 12.4 Gpix/s at 8K on v5e)."""
    a, b = random_pair(rng, 40, 4500)
    _check(a, b)


def test_wide_image_chunked_path(rng):
    """Images wider than TILE_W take the chunked-overlap 2-D grid path;
    forced via the config gate now that the default gate sits at 16384
    (CI-sized widths would otherwise ride the fast path)."""
    from conftest import force_chunked

    a, b = random_pair(rng, 40, 4500)
    with force_chunked():
        _check(a, b)


def test_wide_image_chunk_multiple(rng):
    """Chunked path with w an exact multiple of the chunk width."""
    from conftest import force_chunked

    a, b = random_pair(rng, 40, 6144)
    with force_chunked():
        _check(a, b)


def test_map_on_nonmultiple_width(rng):
    """Overlap path with w not a multiple of 128 (map zero-fill branch)."""
    a, b = random_pair(rng, 70, 300)
    _check(a, b)


def test_4k_geometry(rng):
    """4K width stays on the overlap fast path (VMEM-validated on TPU);
    differential check at a reduced height for CI speed."""
    a, b = random_pair(rng, 64, 3840)
    _check(a, b)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_geometry(seed):
    """Randomized geometry fuzz: fused kernel vs oracle on random sizes
    (both fast and banded paths, odd dims, tiny and tall shapes)."""
    r = np.random.default_rng(1000 + seed)
    h = int(r.integers(1, 400))
    w = int(r.integers(1, 2300))
    a = r.integers(0, 256, (h, w), dtype=np.uint8)
    noise = r.normal(0, 15, a.shape).astype(np.int32)
    b = np.clip(a.astype(np.int32) + noise, 0, 255).astype(np.uint8)
    _check(a, b)


def test_float_input_fast_path_matches_oracle(rng):
    """allow_float=True: float32 images ride the fused kernel (so TPU
    users get the fused kernel's throughput). Extension beyond the
    reference's u8 contract."""
    from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

    a = rng.random((67, 150)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    p, m = ssim_parts_pallas(a, b, with_map=True, data_range=1.0,
                             interpret=True, allow_float=True)
    want, want_map = reference.compute_ssim(a, b, with_map=True, data_range=1.0)
    got = float(np.asarray(p, np.float64).sum() / a.size)
    assert abs(got - want) < 1e-6
    assert np.abs(np.asarray(m) - want_map).max() < 5e-6


def test_float_negative_values_preserved(rng):
    """The float band clip must only kill garbage — legitimate negative
    pixel values (allowed by the float extension) survive."""
    from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

    a = (rng.random((40, 64)).astype(np.float32) - 0.3) * 2.0
    b = a + rng.normal(0, 0.05, a.shape).astype(np.float32)
    p, _ = ssim_parts_pallas(a, b, data_range=2.0, interpret=True,
                             allow_float=True)
    want, _ = reference.compute_ssim(a, b, data_range=2.0)
    got = float(np.asarray(p, np.float64).sum() / a.size)
    assert abs(got - want) < 1e-6


def test_engine_routes_float_and_u16_to_pallas(rng):
    """engine.compute with impl='pallas' sends float32 and uint16 images
    through the fused kernel's float path (values exact as f32), not the
    slow XLA fallback."""
    from ssim_tpu import engine

    af = rng.random((48, 64)).astype(np.float32)
    bf = np.clip(af + rng.normal(0, 0.05, af.shape).astype(np.float32), 0, 1)
    got, _ = engine.compute(af, bf, impl="pallas", data_range=1.0)
    want, _ = reference.compute_ssim(af, bf, data_range=1.0)
    assert abs(float(got) - want) < 1e-6

    a16 = rng.integers(0, 65536, (48, 64), dtype=np.uint16)
    b16 = np.clip(a16.astype(np.int32) + rng.normal(0, 2000, a16.shape).astype(np.int32),
                  0, 65535).astype(np.uint16)
    got, _ = engine.compute(a16, b16, impl="pallas", data_range=65535.0)
    want, _ = reference.compute_ssim(a16, b16, data_range=65535.0)
    assert abs(float(got) - want) < 2e-5


def test_float_wide_chunked_path(rng):
    """float32 images wider than one tile use the chunked path over an
    f32 padded layout (dtype-generic pad kernel)."""
    from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

    a = rng.random((96, 4500)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    p, m = ssim_parts_pallas(a, b, with_map=True, data_range=1.0,
                             interpret=True, allow_float=True,
                             max_tile_w=4096)
    want, want_map = reference.compute_ssim(a, b, with_map=True, data_range=1.0)
    got = float(np.asarray(p, np.float64).sum() / a.size)
    assert abs(got - want) < 1e-6
    assert np.abs(np.asarray(m) - want_map).max() < 5e-6


def test_engine_wide_float_chunked(rng):
    """Wide float32 via engine, BOTH wide routes (interpret on CPU,
    COMPILED on the TPU suite — validates the f32 wide fast path's and
    the chunked path's VMEM budgets on hardware)."""
    from conftest import force_chunked
    from ssim_tpu import engine

    a = rng.random((96, 9000)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    got, _ = engine.compute(a, b, impl="pallas", data_range=1.0)
    want, _ = reference.compute_ssim(a, b, data_range=1.0)
    assert abs(float(got) - want) < 1e-6
    with force_chunked():
        got_c, _ = engine.compute(a, b, impl="pallas", data_range=1.0)
    assert abs(float(got_c) - want) < 1e-6


@pytest.mark.parametrize("seed", range(9))
def test_fuzz_float_and_precise_paths(seed):
    """Randomized geometry/dtype/data_range fuzz over the float and
    precise kernel modes vs the f64 oracle; seeds >= 6 force wide
    geometries, run BOTH ways — the (now default) wide fast path and the
    forced chunked path — so each keeps coverage in every mode."""
    from conftest import force_chunked

    r = np.random.default_rng(7000 + seed)
    h = int(r.integers(1, 220))
    w = int(r.integers(1, 2200)) if seed < 6 else int(r.integers(4300, 7000))
    mode = seed % 3
    tile_kws = [{}] if seed < 6 else [{}, {"max_tile_w": 4096}]
    if mode == 0:  # float32, arbitrary data_range (exercises the clip bound)
        dr = float(r.choice([1.0, 255.0, 1e4, 1e6]))
        a = (r.random((h, w)) * dr).astype(np.float32)
        b = np.clip(a + (r.normal(0, 0.04 * dr, a.shape)).astype(np.float32), 0, dr)
        from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

        want, want_map = reference.compute_ssim(a, b, with_map=True, data_range=dr)
        for kw in tile_kws:
            p, m = ssim_parts_pallas(a, b, with_map=True, data_range=dr,
                                     interpret=True, allow_float=True, **kw)
            got = float(np.asarray(p, np.float64).sum() / a.size)
            assert abs(got - want) < 5e-6
            assert np.abs(np.asarray(m) - want_map).max() < 5e-5
    elif mode == 1:  # uint16 through the engine routing
        from ssim_tpu import engine

        a = r.integers(0, 65536, (h, w)).astype(np.uint16)
        b = np.clip(a.astype(np.int32) + r.normal(0, 2500, a.shape).astype(np.int32),
                    0, 65535).astype(np.uint16)
        want, _ = reference.compute_ssim(a, b, data_range=65535.0)
        for kw in tile_kws:
            import contextlib

            ctx = force_chunked() if kw else contextlib.nullcontext()
            with ctx:
                got, _ = engine.compute(a, b, impl="pallas", data_range=65535.0)
            assert abs(float(got) - want) < 2e-5
    else:  # precise mode, u8
        from ssim_tpu.ops.ssim_pallas import ssim_parts_pallas

        a = r.integers(0, 256, (h, w), dtype=np.uint8)
        b = np.clip(a.astype(np.int32) + r.normal(0, 14, a.shape).astype(np.int32),
                    0, 255).astype(np.uint8)
        want, _ = reference.compute_ssim(a, b)
        for kw in tile_kws:
            p, _ = ssim_parts_pallas(a, b, interpret=True, precise=True, **kw)
            got = float(np.asarray(p, np.float64).sum() / a.size)
            assert abs(got - want) < 5e-9


def test_pick_tile_h_rules():
    """The adaptive fast-path tile height (measured on v5e; see
    docs/RESULTS.md): padded-row minimization first, then the ~32k
    tile-area preference, under the 131k-element VMEM budget."""
    from ssim_tpu.ops.ssim_pallas import _pick_tile_h

    assert _pick_tile_h(2160, 3840) == 32   # 4K: budget caps at 32
    assert _pick_tile_h(1080, 1920) == 64   # 1080p: MXU mode prefers 64
    assert _pick_tile_h(1080, 1920, float_input=True) == 32  # f32 budget
    assert _pick_tile_h(512, 512) == 64   # MXU mode: 64, never 128
    assert _pick_tile_h(360, 640) == 64     # small batched images go taller
    assert _pick_tile_h(256, 256) == 128
    assert _pick_tile_h(128, 128) == 128    # one tile per image
    assert _pick_tile_h(64, 64) == 64
    assert _pick_tile_h(135, 240) == 160    # tile taller than the image
    assert _pick_tile_h(2160, 3840, precise=True) == 32  # halved budget
    for h, w in [(1, 1), (17, 90), (4000, 4000)]:
        t = _pick_tile_h(h, w)
        assert t % 32 == 0 and 32 <= t <= 256


def test_adaptive_tile_taller_than_image(rng):
    """h < picked tile_h (nh == 1, ragged everything) must still match
    the oracle, map included."""
    from ssim_tpu import engine, reference
    from ssim_tpu.ops.ssim_pallas import _pick_tile_h, ssim_parts_pallas

    h, w = 135, 240
    assert _pick_tile_h(h, w) > h
    a, b = random_pair(rng, h, w)
    parts, m = ssim_parts_pallas(a[None], b[None], with_map=True, interpret=True)
    got = float(engine.finalize_mean(np.asarray(parts), h * w)[0])
    want, wmap = reference.compute_ssim(a, b, with_map=True)
    assert abs(got - want) < 2e-6
    assert np.abs(np.asarray(m)[0] - wmap).max() < 1e-3


def test_engine_4k_width_float_fast_path(rng):
    """f32 images up to 4096 px wide take the FAST path under a raised
    scoped-VMEM window since round 3 (previously they detoured through
    the chunked path; measured 14.0 vs 7.7 Gpix/s at 4K). COMPILED on
    the TPU suite — validates the raised window on hardware."""
    from ssim_tpu import engine

    a = rng.random((64, 3840)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    got, m = engine.compute(a, b, with_map=True, impl="pallas", data_range=1.0)
    want, want_map = reference.compute_ssim(a, b, with_map=True, data_range=1.0)
    assert abs(float(got) - want) < 1e-6
    assert np.abs(np.asarray(m) - want_map).max() < 5e-6


@pytest.mark.parametrize("mode", ["roll", "concat", "mxu"])
def test_lane_mode_overrides_agree_with_oracle(rng, mode):
    """Every exact lane mode (the SSIM_TPU_LANE_MODE override values)
    must produce oracle-grade results at any width — modes are a perf
    choice, never a semantics choice."""
    import ssim_tpu.ops.ssim_pallas as sp

    old = sp._LANE_MODE
    sp._LANE_MODE = mode
    try:
        # Unique geometry per mode so the jit cache can't serve a trace
        # made under a different override.
        h, w = 41 + len(mode), 580 + 7 * len(mode)
        a, b = random_pair(rng, h, w)
        p, m = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True)
    finally:
        sp._LANE_MODE = old
    want, want_map = reference.compute_ssim(a, b, with_map=True)
    got = float(np.asarray(p, np.float64).sum() / (h * w))
    assert abs(got - want) < 2e-6
    assert np.abs(np.asarray(m) - want_map).max() < 1e-3


def test_lane_mode_mxu3x_loose_tier(rng):
    """The opt-in mxu3x mode trades accuracy for speed: its error is
    bounded by the 2-term bf16 split (~2^-17 relative on the squared
    signals). Check it stays inside a 1e-4 global / 5e-3 pixel envelope
    (typical is far better; the strict f32 tier is NOT guaranteed)."""
    import ssim_tpu.ops.ssim_pallas as sp

    old = sp._LANE_MODE
    sp._LANE_MODE = "mxu3x"
    try:
        a, b = random_pair(rng, 53, 601)  # unique geometry (fresh trace)
        p, m = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True)
    finally:
        sp._LANE_MODE = old
    want, want_map = reference.compute_ssim(a, b, with_map=True)
    got = float(np.asarray(p, np.float64).sum() / a.size)
    assert abs(got - want) < 1e-4
    assert np.abs(np.asarray(m)[5:-5, 5:-5] - want_map[5:-5, 5:-5]).max() < 5e-3


def test_relaxed_kwarg_loose_tier(rng):
    """accuracy="relaxed" (the mxu3x tier as a first-class knob, no env
    var): wide images stay inside the documented loose envelope and the
    result is NOT required to hit the strict f32 tier."""
    import ssim_tpu.ops.ssim_pallas as sp

    a, b = random_pair(rng, 47, 613)
    p, m = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True,
                                relaxed=True)
    want, want_map = reference.compute_ssim(a, b, with_map=True)
    got = float(np.asarray(p, np.float64).sum() / a.size)
    assert abs(got - want) < 1e-4
    assert np.abs(np.asarray(m)[5:-5, 5:-5] - want_map[5:-5, 5:-5]).max() < 5e-3


def test_relaxed_noop_below_mxu_min_w(rng):
    """Below MXU_MIN_W the relaxed tier never applies (roll/concat are
    already optimal there): results are bit-identical to standard."""
    import ssim_tpu.ops.ssim_pallas as sp

    a, b = random_pair(rng, 33, 320)
    p0, m0 = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True)
    p1, m1 = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True,
                                  relaxed=True)
    assert np.array_equal(np.asarray(p0), np.asarray(p1))
    assert np.array_equal(np.asarray(m0), np.asarray(m1))


def test_relaxed_precise_conflict(rng):
    import ssim_tpu.ops.ssim_pallas as sp

    a, b = random_pair(rng, 32, 640)
    with pytest.raises(ValueError, match="relaxed"):
        sp.ssim_parts_pallas(a, b, interpret=True, precise=True, relaxed=True)


@pytest.mark.parametrize("h,w,batch", [(40, 72, None), (95, 300, 2),
                                       (33, 129, None), (70, 4500, None)])
def test_rowsum_mode_matches_map_rows(rng, h, w, batch):
    """rowsum=True (round-4, for score-only spatial sharding): per-row
    SSIM sums with NO map in HBM, matching f64 row sums of the map on
    both the fast and chunked paths, odd geometries and batches included.
    The kernel emits per-row (ssim - 1) partials and the host adds back
    w — finer than f32-summing the map's w near-1.0 terms."""
    import ssim_tpu.ops.ssim_pallas as sp

    shape = (h, w) if batch is None else (batch, h, w)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    b = rng.integers(0, 256, shape).astype(np.uint8)
    _, smap = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True)
    want = np.asarray(smap, np.float64).sum(axis=-1)
    # Wide shapes run both routes (the default wide fast path AND the
    # forced chunked grid, whose rowsum sums per-lane-chunk partials).
    for kw in ([{}] if w <= 4096 else [{}, {"max_tile_w": 4096}]):
        rows, m = sp.ssim_parts_pallas(a, b, rowsum=True, interpret=True,
                                       **kw)
        assert m is None
        got = np.asarray(rows)
        assert got.shape == want.shape
        # f32 row sums: tolerance scales with the summed magnitude ~w.
        np.testing.assert_allclose(got, want, atol=3e-5 * w)


def test_rowsum_mode_float_path(rng):
    """rowsum on the sanitized float path, plus its NaN-input poison."""
    import jax.numpy as jnp

    import ssim_tpu.ops.ssim_pallas as sp

    a = rng.random((50, 200), np.float32)
    b = rng.random((50, 200), np.float32)
    rows, _ = sp.ssim_parts_pallas(
        jnp.asarray(a), jnp.asarray(b), rowsum=True, allow_float=True,
        data_range=1.0, interpret=True,
    )
    _, smap = sp.ssim_parts_pallas(
        jnp.asarray(a), jnp.asarray(b), with_map=True, allow_float=True,
        data_range=1.0, interpret=True,
    )
    want = np.asarray(smap, np.float64).sum(axis=-1)
    np.testing.assert_allclose(np.asarray(rows), want, atol=3e-5 * 200)

    a[7, 3] = np.nan  # invalid input must poison the score, not vanish
    rows_n, _ = sp.ssim_parts_pallas(
        jnp.asarray(a), jnp.asarray(b), rowsum=True, allow_float=True,
        data_range=1.0, interpret=True,
    )
    assert np.isnan(np.asarray(rows_n).sum())


def test_rowsum_conflicts(rng):
    import ssim_tpu.ops.ssim_pallas as sp

    a, b = random_pair(rng, 32, 64)
    with pytest.raises(ValueError, match="rowsum"):
        sp.ssim_parts_pallas(a, b, rowsum=True, with_map=True,
                             interpret=True)
    with pytest.raises(ValueError, match="rowsum"):
        sp.ssim_parts_pallas(a, b, rowsum=True, precise=True,
                             interpret=True)


def _vhalo_window(rng, h, w, r, batch=None, dtype=np.uint8):
    """A random global image pair cut into (local window, vhalo operands,
    halo-concatenated window) for the middle 3rd of the rows."""
    lead = () if batch is None else (batch,)
    A = rng.integers(0, 256, lead + (3 * h + 2 * r, w)).astype(dtype)
    B = rng.integers(0, 256, lead + (3 * h + 2 * r, w)).astype(dtype)
    a_loc, b_loc = A[..., h : 2 * h, :], B[..., h : 2 * h, :]
    vh = (
        A[..., h - r : h, :], A[..., 2 * h : 2 * h + r, :],
        B[..., h - r : h, :], B[..., 2 * h : 2 * h + r, :],
    )
    ae = np.concatenate([vh[0], a_loc, vh[1]], axis=-2)
    be = np.concatenate([vh[2], b_loc, vh[3]], axis=-2)
    return a_loc, b_loc, vh, ae, be


@pytest.mark.parametrize("h,w,r,tile_h,batch", [
    (64, 256, 5, None, None),   # plain geometry
    (66, 200, 5, 32, None),     # ragged last block thinner than radius:
                                # the second-to-last block splices too
    (68, 256, 5, 32, None),     # ...with a TRUNCATED bottom part
                                # (last_rows > hb - r)
    (33, 128, 16, None, None),  # radius == hb (empty top edge slice)
    (40, 131, 3, None, 2),      # non-128-multiple lanes, batched
])
def test_vhalo_matches_concat_window(rng, h, w, r, tile_h, batch):
    """vhalo halo operands (round 4, for spatial sharding): a row-window
    computed with spliced neighbor rows must match the halo-concatenated
    formulation (the spatial layer's old code path) on its local rows.
    Not bitwise — the concat window's tile grid is offset by radius rows,
    so f32 dot orders differ — but well inside the f32 accuracy tier.
    This file runs interpret-mode; the compiled-on-TPU validation of the
    same geometries against the f64 oracle is tools/hw_vhalo.py
    (docs/RESULTS.md "vhalo on hardware", round 5 — which caught a
    chunked-rowsum BlockSpec that only interpret mode accepted)."""
    import ssim_tpu.ops.ssim_pallas as sp

    a_loc, b_loc, vh, ae, be = _vhalo_window(rng, h, w, r, batch)
    kw = dict(radius=r, interpret=True)
    if tile_h is not None:
        kw["max_tile_h"] = tile_h
    rows_c, _ = sp.ssim_parts_pallas(ae, be, rowsum=True, **kw)
    want_rows = np.asarray(rows_c)[..., r : r + h]
    rows_v, m = sp.ssim_parts_pallas(a_loc, b_loc, rowsum=True, vhalo=vh, **kw)
    assert m is None
    assert rows_v.shape == want_rows.shape
    np.testing.assert_allclose(np.asarray(rows_v), want_rows, atol=3e-5 * w)
    _, map_c = sp.ssim_parts_pallas(ae, be, with_map=True, **kw)
    _, map_v = sp.ssim_parts_pallas(a_loc, b_loc, with_map=True, vhalo=vh, **kw)
    assert map_v.shape == a_loc.shape
    np.testing.assert_allclose(
        np.asarray(map_v), np.asarray(map_c)[..., r : r + h, :], atol=8e-6
    )


def test_vhalo_wide_fallback(rng):
    """Images past the fast path fall back to an internal halo concat on
    the chunked grid with the same local-rows output contract."""
    import ssim_tpu.ops.ssim_pallas as sp

    h, w, r = 24, 600, 5
    a_loc, b_loc, vh, ae, be = _vhalo_window(rng, h, w, r)
    kw = dict(radius=r, interpret=True, max_tile_w=512)  # force chunked
    rows_c, _ = sp.ssim_parts_pallas(ae, be, rowsum=True, **kw)
    want = np.asarray(rows_c)[r : r + h]
    rows_v, _ = sp.ssim_parts_pallas(a_loc, b_loc, rowsum=True, vhalo=vh, **kw)
    np.testing.assert_allclose(np.asarray(rows_v), want, atol=3e-5 * w)
    _, map_c = sp.ssim_parts_pallas(ae, be, with_map=True, **kw)
    _, map_v = sp.ssim_parts_pallas(a_loc, b_loc, with_map=True, vhalo=vh, **kw)
    assert map_v.shape == (h, w)
    np.testing.assert_allclose(
        np.asarray(map_v), np.asarray(map_c)[r : r + h, :], atol=8e-6
    )


def test_vhalo_edge_replica_matches_clamped(rng):
    """Edge shards pass replicated edge rows as halos; that must equal
    the plain clamped-border computation (the reference border rule,
    src/ssim.cpp:560-582) — the spatial layer's true-image-border case."""
    import ssim_tpu.ops.ssim_pallas as sp

    h, w, r = 40, 256, 5
    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)
    vh = (
        np.broadcast_to(a[:1], (r, w)).copy(),
        np.broadcast_to(a[-1:], (r, w)).copy(),
        np.broadcast_to(b[:1], (r, w)).copy(),
        np.broadcast_to(b[-1:], (r, w)).copy(),
    )
    _, m1 = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True)
    _, m2 = sp.ssim_parts_pallas(a, b, with_map=True, vhalo=vh,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=8e-6)


def test_vhalo_vmask_in_kernel_replicas(rng):
    """vmask mode (round 5): the halo operands are RAW collective
    outputs and the KERNEL substitutes the edge replicas, gated on the
    (is_top, is_bot) flags — so the spatial layer's exchange is two
    stacked ppermutes with no host-side replica construction (measured
    2.4x end-to-end, tools/probe_spatial3.py). Garbage halos + both
    flags set must reproduce the plain clamped computation exactly;
    an interior window with true halos + zero flags must match the
    concat window."""
    import ssim_tpu.ops.ssim_pallas as sp

    h, w, r = 40, 256, 5
    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)
    g = lambda: rng.integers(0, 256, (r, w)).astype(np.uint8)
    _, m1 = sp.ssim_parts_pallas(a, b, with_map=True, interpret=True)
    _, m2 = sp.ssim_parts_pallas(
        a, b, with_map=True, vhalo=(g(), g(), g(), g()), vmask=(1.0, 1.0),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=8e-6)

    a_loc, b_loc, vh, ae, be = _vhalo_window(rng, 66, 200, r, None)
    kw = dict(interpret=True, max_tile_h=32)  # ragged + 2-block splice
    rows_c, _ = sp.ssim_parts_pallas(ae, be, rowsum=True, **kw)
    rows_v, _ = sp.ssim_parts_pallas(a_loc, b_loc, rowsum=True, vhalo=vh,
                                     vmask=(0.0, 0.0), **kw)
    np.testing.assert_allclose(
        np.asarray(rows_v), np.asarray(rows_c)[r : r + 66], atol=3e-5 * 200
    )

    # Mixed: top is a true edge (garbage operand + flag), bottom is a
    # true neighbor (real rows + no flag).
    h2 = 70
    A = np.asarray(ae)
    B = np.asarray(be)
    a2, b2 = A[:h2], B[:h2]
    bot_a, bot_b = A[h2 : h2 + r], B[h2 : h2 + r]
    g2 = lambda: rng.integers(0, 256, (r, a2.shape[1])).astype(np.uint8)
    rows_w, _ = sp.ssim_parts_pallas(
        np.concatenate([a2, bot_a]), np.concatenate([b2, bot_b]),
        rowsum=True, interpret=True,
    )
    rows_m, _ = sp.ssim_parts_pallas(
        a2, b2, rowsum=True, vhalo=(g2(), bot_a, g2(), bot_b),
        vmask=(1.0, 0.0), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(rows_m), np.asarray(rows_w)[:h2], atol=3e-5 * 200
    )

    with pytest.raises(ValueError, match="vmask requires vhalo"):
        sp.ssim_parts_pallas(a, b, rowsum=True, vmask=(1.0, 1.0),
                             interpret=True)


def test_vhalo_vmask_wide_fallback(rng):
    """vmask on the chunked wide fallback: host-side replica
    substitution ahead of the internal concat."""
    import ssim_tpu.ops.ssim_pallas as sp

    h, w, r = 24, 600, 5
    a = rng.integers(0, 256, (h, w)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w)).astype(np.uint8)
    g = lambda: rng.integers(0, 256, (r, w)).astype(np.uint8)
    kw = dict(interpret=True, max_tile_w=512)  # force chunked
    rows_c, _ = sp.ssim_parts_pallas(a, b, rowsum=True, **kw)
    rows_v, _ = sp.ssim_parts_pallas(
        a, b, rowsum=True, vhalo=(g(), g(), g(), g()), vmask=(1.0, 1.0),
        **kw,
    )
    np.testing.assert_allclose(
        np.asarray(rows_v), np.asarray(rows_c), atol=3e-5 * w
    )


def test_vhalo_float_path(rng):
    import jax.numpy as jnp

    import ssim_tpu.ops.ssim_pallas as sp

    h, w, r = 30, 200, 5
    A = rng.random((3 * h + 2 * r, w)).astype(np.float32)
    B = rng.random((3 * h + 2 * r, w)).astype(np.float32)
    a_loc, b_loc = A[h : 2 * h], B[h : 2 * h]
    vh = (A[h - r : h], A[2 * h : 2 * h + r], B[h - r : h], B[2 * h : 2 * h + r])
    ae = np.concatenate([vh[0], a_loc, vh[1]], axis=-2)
    be = np.concatenate([vh[2], b_loc, vh[3]], axis=-2)
    kw = dict(allow_float=True, data_range=1.0, interpret=True)
    rows_c, _ = sp.ssim_parts_pallas(jnp.asarray(ae), jnp.asarray(be),
                                     rowsum=True, **kw)
    want = np.asarray(rows_c)[r : r + h]
    rows_v, _ = sp.ssim_parts_pallas(
        jnp.asarray(a_loc), jnp.asarray(b_loc), rowsum=True,
        vhalo=tuple(jnp.asarray(x) for x in vh), **kw,
    )
    np.testing.assert_allclose(np.asarray(rows_v), want, atol=3e-5 * w)


def test_vhalo_validation(rng):
    import ssim_tpu.ops.ssim_pallas as sp

    a, b = random_pair(rng, 32, 64)
    good = (a[:5], a[-5:], b[:5], b[-5:])
    with pytest.raises(ValueError, match="vhalo"):
        sp.ssim_parts_pallas(a, b, vhalo=good, interpret=True)  # partials
    with pytest.raises(ValueError, match="vhalo"):
        sp.ssim_parts_pallas(a, b, rowsum=True, vhalo=good[:3],
                             interpret=True)
    with pytest.raises(ValueError, match="vhalo"):
        bad = (a[:4], a[-5:], b[:5], b[-5:])  # wrong halo depth
        sp.ssim_parts_pallas(a, b, rowsum=True, vhalo=bad, interpret=True)
    with pytest.raises(ValueError, match="vhalo"):
        bad = tuple(x.astype(np.float32) for x in good)  # dtype mismatch
        sp.ssim_parts_pallas(a, b, rowsum=True, vhalo=bad, interpret=True)
