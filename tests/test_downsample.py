"""Downsampled-SSIM extension (Wang box-mean prefilter).

The rmgr reference never downsamples (no analogue); this is the labeled
extension implementing the original ssim_index.m / pytorch-msssim
automatic prefilter: f = max(1, round(min(H, W)/256)), k x k avg-pool
(stride k, remainder dropped), then ordinary SSIM on the pooled floats.
"""

import numpy as np
import pytest

from conftest import random_pair
from ssim_tpu import api, engine, reference
from ssim_tpu.errors import InvalidArgumentError


def test_factor_rule():
    assert engine.downsample_factor(256, 256) == 1
    assert engine.downsample_factor(300, 900) == 1  # round(300/256) = 1
    assert engine.downsample_factor(512, 700) == 2
    # MATLAB round() is half-away-from-zero: 640/256 = 2.5 -> 3, not
    # Python banker's 2 (likewise 1152/256 = 4.5 -> 5).
    assert engine.downsample_factor(640, 640) == 3
    assert engine.downsample_factor(1152, 4000) == 5
    assert engine.downsample_factor(2160, 3840) == 8
    assert engine.downsample_factor(11, 11) == 1


def test_box_decimate_matches_manual(rng):
    x = rng.integers(0, 256, (13, 22), dtype=np.uint8)
    got = engine.box_decimate(x, 3)
    assert got.shape == (4, 7) and got.dtype == np.float32
    want = x[:12, :21].astype(np.float64).reshape(4, 3, 7, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=0, atol=0)


def test_downsample_1_is_identity(rng):
    a, b = random_pair(rng, 40, 56)
    assert api.compute_ssim(a, b, downsample=1) == api.compute_ssim(a, b)


def test_downsample_matches_oracle_on_pooled(rng):
    """compute_ssim(downsample=k) == SSIM of the pooled float images —
    the extension is exactly 'pool, then the ordinary (parity) metric'."""
    a, b = random_pair(rng, 97, 131)
    k = 2
    pa, pb = engine.box_decimate(a, k), engine.box_decimate(b, k)
    want, want_map = reference.compute_ssim(pa, pb, with_map=True)
    got, got_map = api.compute_ssim(a, b, downsample=k, with_map=True)
    assert got_map.shape == pa.shape
    assert abs(got - want) < 2e-6
    assert np.abs(got_map - want_map).max() < 1e-3


def test_downsample_auto_large_image(rng):
    a, b = random_pair(rng, 520, 640)  # auto factor = round(520/256) = 2
    got = api.compute_ssim(a, b, downsample="auto")
    want = api.compute_ssim(a, b, downsample=2)
    assert got == want


def test_downsample_batched(rng):
    a0, b0 = random_pair(rng, 64, 80)
    a1, b1 = random_pair(rng, 64, 80)
    batch = api.compute_ssim(np.stack([a0, a1]), np.stack([b0, b1]), downsample=2)
    s0 = api.compute_ssim(a0, b0, downsample=2)
    s1 = api.compute_ssim(a1, b1, downsample=2)
    # Small pooled batches route through the lane-packed path, whose
    # reduction order differs from the single-image call -> f32 roundoff.
    np.testing.assert_allclose(batch, [s0, s1], rtol=0, atol=1e-7)


def test_downsample_channels_and_cli(rng, tmp_path, capsys):
    rgb = rng.integers(0, 256, (48, 60, 3), dtype=np.uint8)
    rgb2 = np.clip(
        rgb.astype(np.int32) + rng.normal(0, 10, rgb.shape).astype(np.int32), 0, 255
    ).astype(np.uint8)
    from ssim_tpu.multichannel import compute_ssim_channels

    res = compute_ssim_channels(rgb, rgb2, downsample=2)
    for c in range(3):
        want = api.compute_ssim(rgb[:, :, c], rgb2[:, :, c], downsample=2)
        # channels batch as (C, H, W) -> lane-packed path -> f32 roundoff
        # vs the single-image call.
        assert res.per_channel[c] == pytest.approx(want, abs=1e-7)

    from PIL import Image

    p1, p2 = tmp_path / "a.png", tmp_path / "b.png"
    Image.fromarray(rgb).save(p1)
    Image.fromarray(rgb2).save(p2)
    from ssim_tpu import cli

    assert cli.main(["--downsample=2", "-0", str(p1), str(p2)]) == 0
    out = capsys.readouterr().out.strip()
    assert out == f"{res.per_channel[0]: 7.4f}".strip()
    assert cli.main(["--downsample=bogus", str(p1), str(p2)]) == 1


def test_downsample_rejections(rng):
    a, b = random_pair(rng, 30, 30)
    with pytest.raises(InvalidArgumentError):
        api.compute_ssim(a, b, downsample=0)
    with pytest.raises(InvalidArgumentError):
        api.compute_ssim(a, b, downsample=2.5)
    with pytest.raises(InvalidArgumentError):
        api.compute_ssim(a, b, downsample=64)  # collapses the image
    from ssim_tpu.params import ImageView, Params

    buf = np.zeros(30 * 30, np.float32)
    p = Params(
        img_a=ImageView.from_gray(a), img_b=ImageView.from_gray(b),
        map_buffer=buf,
    )
    with pytest.raises(InvalidArgumentError):
        api.compute_ssim(p, downsample=2)


def test_downsample_arg_hardening(rng):
    a, b = random_pair(rng, 30, 30)
    assert api.compute_ssim(a, b, downsample=np.int64(2)) == api.compute_ssim(
        a, b, downsample=2
    )
    with pytest.raises(InvalidArgumentError):
        api.compute_ssim(a, b, downsample=True)


def test_downsample_noop_allows_map_buffer(rng):
    """downsample=1 and 'auto' on a small image pool nothing, so the
    full-image map_buffer contract must keep working."""
    from ssim_tpu.params import ImageView, Params

    a, b = random_pair(rng, 30, 40)
    for ds in (1, "auto"):
        buf = np.full(30 * 40, -1.0, np.float32)
        p = Params(
            img_a=ImageView.from_gray(a), img_b=ImageView.from_gray(b),
            map_buffer=buf,
        )
        want = api.compute_ssim(a, b)
        assert api.compute_ssim(p, downsample=ds) == want
        assert (buf != -1.0).all()


def test_downsample_host_targeted_error(rng):
    a, b = random_pair(rng, 64, 64)
    with pytest.raises(InvalidArgumentError, match="host"):
        api.compute_ssim(a, b, impl="host", downsample=2)
    # but the no-op factor still reaches the host backend fine
    import ssim_tpu.ops.host as host_mod

    if host_mod.is_available():
        assert api.compute_ssim(a, b, impl="host", downsample=1) == api.compute_ssim(
            a, b, impl="host"
        )


def test_cli_ms_downsample_conflict(rng, tmp_path, capsys):
    from PIL import Image

    from ssim_tpu import cli

    a, b = random_pair(rng, 48, 48)
    p1, p2 = tmp_path / "a.png", tmp_path / "b.png"
    Image.fromarray(a).save(p1)
    Image.fromarray(b).save(p2)
    assert cli.main(["--ms", "--downsample=2", str(p1), str(p2)]) == 1
    assert "--downsample" in capsys.readouterr().err


def test_device_pooling_matches_host_for_u8(rng):
    """The device reduce_window pooling (ops/pool.py) must reproduce the
    host f64 pooling to 1 ulp for uint8 inputs: the f32 window sum is
    exact below 2^24; the division is 1-ulp (XLA divide-by-constant is
    reciprocal-multiply — see the module docstring). Power-of-two
    factors are bit-exact."""
    from ssim_tpu.ops.pool import box_decimate_device

    for k in (2, 3, 5, 8):
        x = rng.integers(0, 256, (3, 97, 131), dtype=np.uint8)
        host = engine.box_decimate(x, k)
        dev = np.asarray(box_decimate_device(x, k))
        if k in (2, 8):
            np.testing.assert_array_equal(host, dev)
        else:
            ulp = np.spacing(np.abs(host).astype(np.float32))
            assert (np.abs(host - dev) <= ulp).all()


def test_device_pooling_collapse_rejected():
    from ssim_tpu.ops.pool import box_decimate_device

    with pytest.raises(InvalidArgumentError):
        box_decimate_device(np.zeros((4, 4), np.uint8), 5)
