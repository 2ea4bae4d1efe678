"""Batch loader tests (utils/dataset.py)."""

import os

import numpy as np
import pytest
from PIL import Image

from ssim_tpu import compute_ssim
from ssim_tpu.utils import luminance_bt601
from ssim_tpu.utils.dataset import (
    batched_pairs,
    evaluate_directory,
    load_pairs,
    stream_batched_pairs,
)


@pytest.fixture()
def pair_dirs(tmp_path, rng):
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    shapes = [(40, 56), (40, 56), (40, 56), (64, 48)]
    truths = {}
    for i, shape in enumerate(shapes):
        img_a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        noise = rng.normal(0, 10, img_a.shape).astype(np.int32)
        img_b = np.clip(img_a.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        name = f"img{i}.png"
        Image.fromarray(img_a).save(da / name)
        Image.fromarray(img_b).save(db / name)
        truths[name] = compute_ssim(
            luminance_bt601(img_a), luminance_bt601(img_b), impl="xla"
        )
    return str(da), str(db), truths


def test_load_pairs_policies(pair_dirs):
    da, db, _ = pair_dirs
    pairs = [(os.path.join(da, "img0.png"), os.path.join(db, "img0.png"))]
    (name, a, b), = load_pairs(pairs, channel_policy="luminance")
    assert a.ndim == 2 and a.dtype == np.uint8
    (name, a1, _), = load_pairs(pairs, channel_policy="channel:1")
    assert a1.ndim == 2
    with pytest.raises(ValueError):
        load_pairs(pairs, channel_policy="bogus")


def test_batched_groups_by_shape(pair_dirs):
    da, db, truths = pair_dirs
    pairs = [(os.path.join(da, n), os.path.join(db, n)) for n in sorted(truths)]
    batches = list(batched_pairs(pairs, batch_size=2))
    # 3 images at (40,56) -> batches of 2+1; 1 image at (64,48) -> 1.
    sizes = sorted(a.shape[0] for _, a, _ in batches)
    assert sizes == [1, 1, 2]
    for _, a, b in batches:
        assert a.shape == b.shape and a.ndim == 3


def test_stream_matches_eager(pair_dirs):
    """stream_batched_pairs yields the same batches as batched_pairs
    (full batches in arrival order, partial groups flushed at the end),
    from a generator input and with bounded prefetch."""
    da, db, truths = pair_dirs
    pairs = [(os.path.join(da, n), os.path.join(db, n)) for n in sorted(truths)]
    eager = {
        tuple(names): (a.copy(), b.copy())
        for names, a, b in batched_pairs(pairs, batch_size=2)
    }
    streamed = list(
        stream_batched_pairs(iter(pairs), batch_size=2, prefetch=1)
    )
    assert {tuple(n) for n, _, _ in streamed} == set(eager)
    for names, a, b in streamed:
        ea, eb = eager[tuple(names)]
        np.testing.assert_array_equal(a, ea)
        np.testing.assert_array_equal(b, eb)

    # a decode failure surfaces as an exception, not a hang
    bad = pairs + [(os.path.join(da, "missing.png"),
                    os.path.join(db, "missing.png"))]
    with pytest.raises(Exception):
        list(stream_batched_pairs(bad, batch_size=2))


def test_evaluate_directory(pair_dirs):
    da, db, truths = pair_dirs
    results = evaluate_directory(da, db, batch_size=2, impl="xla")
    assert [n for n, _ in results] == sorted(truths)
    for name, score in results:
        assert score == pytest.approx(truths[name], abs=1e-6), name
