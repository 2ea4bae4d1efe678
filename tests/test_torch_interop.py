"""PyTorch tensor interop.

The reference takes raw byte pointers (rmgr_ssim_ImgParams.topLeft,
include/rmgr/ssim.h:489-499), so any host framework can feed it. Our
analogue: every array-like that exposes __array__ / __array_interface__
works across the API surface. torch is the ecosystem's dominant producer
of such arrays, so interop gets its own tests (CPU tensors; this is a
host-ingest contract, not a device bridge).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import random_pair
from ssim_tpu import api
from ssim_tpu.errors import InvalidArgumentError
from ssim_tpu.params import ImageView


def test_torch_u8_matches_numpy(rng):
    a, b = random_pair(rng, 40, 56)
    want = api.compute_ssim(a, b)
    got = api.compute_ssim(torch.from_numpy(a), torch.from_numpy(b))
    assert got == want  # same bytes, same path -> bitwise-identical


def test_torch_imageview_from_interleaved(rng):
    rgb = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    view_np = ImageView.from_interleaved(rgb, channel=1)
    view_t = ImageView.from_interleaved(torch.from_numpy(rgb), channel=1)
    np.testing.assert_array_equal(view_t.data, view_np.data)


def test_torch_noncontiguous_tensor(rng):
    # A transposed (non-contiguous) tensor must be ingested by value,
    # matching NumPy semantics for the same view.
    a, b = random_pair(rng, 48, 48)
    at = torch.from_numpy(a).t()
    bt = torch.from_numpy(b).t()
    want = api.compute_ssim(a.T, b.T)
    got = api.compute_ssim(at, bt)
    assert got == want


def test_torch_float_and_map(rng):
    a, b = random_pair(rng, 33, 47)
    af = torch.from_numpy(a.astype(np.float32))
    bf = torch.from_numpy(b.astype(np.float32))
    want, want_map = api.compute_ssim(
        a.astype(np.float32), b.astype(np.float32), with_map=True
    )
    got, got_map = api.compute_ssim(af, bf, with_map=True)
    assert got == want
    np.testing.assert_array_equal(got_map, want_map)


def test_torch_cuda_like_rejection():
    # Tensors that refuse __array__ (e.g. requires_grad) must raise our
    # error type, not leak a framework one: torch only converts detached
    # CPU tensors silently.
    t = torch.zeros((8, 8), requires_grad=True)
    with pytest.raises((InvalidArgumentError, RuntimeError)):
        ImageView.from_gray(t)


def test_torch_u8_tensor_through_host_backend(rng):
    from ssim_tpu.ops import host as host_mod

    if not host_mod.is_available():
        pytest.skip("host backend not built")
    a, b = random_pair(rng, 32, 40)
    want = api.compute_ssim(a, b, impl="host")
    got = api.compute_ssim(torch.from_numpy(a), torch.from_numpy(b), impl="host")
    assert got == want
