"""Differential validation against the ACTUAL reference binary.

Builds the reference library itself (out-of-source, library targets only —
no network-fetched deps) plus a thin C shim over its public API, then
compares ssim_tpu's outputs against the real rmgr::ssim implementation on
real images and random geometries — the strongest parity evidence
available (frozen constants validate semantics; this validates against
the living code, SIMD dispatch and all).

Skips cleanly when the toolchain or reference checkout is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from ssim_tpu import compute_ssim
from ssim_tpu.testing import frozen
from ssim_tpu.utils import load_image

from conftest import random_pair

REFERENCE_DIR = "/root/reference"
BUILD_DIR = "/tmp/ssim_tpu_refbuild"


def _build_and_load_ref(build_dir, extra_cmake_args=()):
    """Build the reference library (out-of-source) + the C shim, return a
    (a, b) -> (score, map) runner. Shared by the float- and double-build
    fixtures so the recipe cannot drift between them."""
    if not os.path.isfile(os.path.join(REFERENCE_DIR, "CMakeLists.txt")):
        pytest.skip("reference checkout unavailable")
    shim = os.path.join(build_dir, "libref_shim.so")
    shim_src_path = os.path.join(os.path.dirname(__file__), "reference_shim.c")
    if os.path.isfile(shim) and os.path.getmtime(shim) < os.path.getmtime(shim_src_path):
        os.remove(shim)  # stale shim from an earlier revision of the source
    if not os.path.isfile(shim):
        try:
            os.makedirs(build_dir, exist_ok=True)
            subprocess.run(
                ["cmake", REFERENCE_DIR, "-DRMGR_SSIM_BUILD_CLI=OFF",
                 "-DRMGR_SSIM_BUILD_TESTS=OFF", "-DRMGR_SSIM_BUILD_SAMPLE=OFF",
                 "-DCMAKE_BUILD_TYPE=Release",
                 "-DCMAKE_POSITION_INDEPENDENT_CODE=ON",
                 *extra_cmake_args],
                cwd=build_dir, check=True, capture_output=True, timeout=300,
            )
            subprocess.run(["make", "-j4", "rmgr-ssim"], cwd=build_dir,
                           check=True, capture_output=True, timeout=300)
            # The shim only uses the public API, whose types do not depend
            # on RMGR_SSIM_USE_DOUBLE (always float*), so one compilation
            # recipe serves both builds.
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-o", shim,
                 shim_src_path, "-I", os.path.join(REFERENCE_DIR, "include"),
                 os.path.join(build_dir, "librmgr-ssim.a")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            pytest.skip(f"cannot build reference library: {e}")
    lib = ctypes.CDLL(shim)
    lib.reference_compute_ssim.restype = ctypes.c_int
    lib.reference_compute_ssim.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]

    def run(a, b):
        a = np.ascontiguousarray(a, np.uint8)
        b = np.ascontiguousarray(b, np.uint8)
        h, w = a.shape
        out = ctypes.c_float()
        ssim_map = np.zeros((h, w), np.float32)
        rc = lib.reference_compute_ssim(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, ctypes.byref(out),
            ssim_map.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert rc == 0, f"reference returned errno {rc}"
        return float(out.value), ssim_map

    lib.reference_compute_ssim_strided.restype = ctypes.c_int
    lib.reference_compute_ssim_strided.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_ssize_t, ctypes.c_ssize_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_ssize_t, ctypes.c_ssize_t,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_ssize_t, ctypes.c_ssize_t,
    ]

    def run_strided(a_buf, a_off, a_step, a_stride,
                    b_buf, b_off, b_step, b_stride, w, h,
                    map_buf=None, map_step=1, map_stride=None):
        """The reference's fully general addressing contract
        (include/rmgr/ssim.h:481-488,:514-516): image offsets/steps/
        strides in BYTES over flat u8 buffers, map step/stride in FLOATS
        over a flat f32 buffer (written in place, like ssimMap)."""
        a_buf = np.ascontiguousarray(a_buf, np.uint8).reshape(-1)
        b_buf = np.ascontiguousarray(b_buf, np.uint8).reshape(-1)
        out = ctypes.c_float()
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        a_ptr = ctypes.cast(a_buf.ctypes.data + a_off, u8p)
        b_ptr = ctypes.cast(b_buf.ctypes.data + b_off, u8p)
        if map_buf is not None:
            assert map_buf.dtype == np.float32 and map_buf.flags.c_contiguous
            map_ptr = map_buf.ctypes.data_as(f32p)
            if map_stride is None:
                map_stride = w * map_step
        else:
            map_ptr, map_step, map_stride = ctypes.cast(None, f32p), 0, 0
        rc = lib.reference_compute_ssim_strided(
            a_ptr, a_step, a_stride, b_ptr, b_step, b_stride,
            w, h, ctypes.byref(out), map_ptr, map_step, map_stride,
        )
        assert rc == 0, f"reference returned errno {rc}"
        return float(out.value)

    run.strided = run_strided
    return run


@pytest.fixture(scope="module")
def ref_lib():
    return _build_and_load_ref(BUILD_DIR)


def test_einstein_vs_reference_binary(ref_lib, images_dir):
    """Our engine vs the real reference on the einstein suite: both are
    f32 implementations of the same math, so they agree to f32-error
    levels (each is within ~1.5e-6 of the quad-precision truth)."""
    ref_img = load_image(os.path.join(images_dir, "einstein.png"))
    for name in frozen.EINSTEIN_SUITE:
        img = load_image(os.path.join(images_dir, name))
        want, want_map = ref_lib(img, ref_img)
        got, got_map = compute_ssim(img, ref_img, with_map=True)
        assert abs(got - want) < 3e-6, (name, got, want)
        assert np.abs(got_map - want_map).max() < 2e-3, name


@pytest.mark.parametrize("shape", [(63, 255), (65, 257), (128, 200), (255, 63)])
def test_random_geometries_vs_reference_binary(rng, ref_lib, shape):
    a, b = random_pair(rng, *shape)
    want, want_map = ref_lib(a, b)
    got, got_map = compute_ssim(a, b, with_map=True)
    npix = shape[0] * shape[1]
    tol = max(3e-6, 3e-3 / npix**0.5)
    assert abs(got - want) < tol, (got, want)
    assert np.abs(got_map - want_map).max() < 2e-3


DOUBLE_BUILD_DIR = "/tmp/ssim_tpu_refbuild_double"


@pytest.fixture(scope="module")
def ref_lib_double():
    """The reference built with RMGR_SSIM_USE_DOUBLE=ON — the build our
    precision='f64' mode claims parity with (src/ssim_internal.h:26-37)."""
    return _build_and_load_ref(DOUBLE_BUILD_DIR, ("-DRMGR_SSIM_USE_DOUBLE=ON",))


def test_precision_mode_vs_double_reference_binary(rng, ref_lib_double):
    """Our precision='f64' mode vs the ACTUAL reference double build:
    both sit within the double tier of the quad-precision truth (ours
    ~1000x inside it), so they must agree to the double build's own
    error level. The reference API returns the global as f32, so f32
    rounding (~6e-8) floors the comparison."""
    for shape in [(63, 255), (128, 200), (255, 63)]:
        a, b = random_pair(rng, *shape)
        want, want_map = ref_lib_double(a, b)
        got, got_map = compute_ssim(a, b, with_map=True, precision="f64", impl="pallas")
        assert abs(got - want) < 1e-6, (shape, got, want)
        assert np.abs(got_map - want_map).max() < 2e-5, shape


def test_interleaved_rgb_vs_reference_binary(rng, ref_lib):
    """Per-channel SSIM over an interleaved RGB buffer: the reference via
    topLeft=base+ch/step=3 addressing, ours via ImageView.from_interleaved
    — validates component #2's layout contract against the living code,
    not just against our own reshape."""
    h, w = 70, 90
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    noise = rng.normal(0, 10, rgb.shape)
    rgb2 = np.clip(rgb.astype(np.int32) + noise.astype(np.int32), 0, 255).astype(np.uint8)
    for ch in range(3):
        want = ref_lib.strided(
            rgb, ch, 3, 3 * w, rgb2, ch, 3, 3 * w, w, h,
        )
        from ssim_tpu.params import ImageView

        got = compute_ssim(
            ImageView.from_interleaved(rgb, channel=ch),
            ImageView.from_interleaved(rgb2, channel=ch),
        )
        assert abs(got - want) < 3e-6, (ch, got, want)


def test_bottom_up_negative_stride_vs_reference_binary(rng, ref_lib):
    """Bottom-up storage (negative stride, include/rmgr/ssim.h:516):
    reference addressed from the last row upward must equal ours through
    ImageView.from_strided with the same negative stride."""
    h, w = 64, 80
    a, b = random_pair(rng, h, w)
    want = ref_lib.strided(
        a, (h - 1) * w, 1, -w, b, (h - 1) * w, 1, -w, w, h,
    )
    from ssim_tpu.params import ImageView

    va = ImageView.from_strided(a.reshape(-1), w, h, 1, -w, offset=(h - 1) * w)
    vb = ImageView.from_strided(b.reshape(-1), w, h, 1, -w, offset=(h - 1) * w)
    got = compute_ssim(va, vb)
    assert abs(got - want) < 3e-6, (got, want)
    # Sanity: the bottom-up view really is the flipped image.
    np.testing.assert_array_equal(va.data, np.flipud(a))


def test_strided_map_output_vs_reference_binary(rng, ref_lib):
    """ssimStep=3 interleaved map layout (the reference CLI's usage,
    src/ssim-cli.cpp:119-121): both implementations write the same flat
    buffer positions; untouched lanes must keep their sentinel."""
    h, w = 48, 60
    a, b = random_pair(rng, h, w)
    step, stride = 3, 3 * w

    ref_buf = np.full(h * w * 3, -7.0, np.float32)
    want = ref_lib.strided(
        a, 0, 1, w, b, 0, 1, w, w, h,
        map_buf=ref_buf, map_step=step, map_stride=stride,
    )

    from ssim_tpu.params import ImageView, Params

    got_buf = np.full(h * w * 3, -7.0, np.float32)
    p = Params(
        img_a=ImageView.from_gray(a), img_b=ImageView.from_gray(b),
        map_buffer=got_buf, map_step=step, map_stride=stride,
    )
    got = compute_ssim(p)
    assert abs(got - want) < 3e-6, (got, want)
    lattice = np.zeros(h * w * 3, bool)
    lattice[(np.arange(w)[None, :] * step + np.arange(h)[:, None] * stride).ravel()] = True
    assert np.abs(got_buf[lattice] - ref_buf[lattice]).max() < 2e-3
    np.testing.assert_array_equal(got_buf[~lattice], ref_buf[~lattice])
