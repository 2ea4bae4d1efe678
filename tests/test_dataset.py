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


def test_stream_bounded_on_heterogeneous_shapes(tmp_path, rng):
    """Every pair a unique resolution: partial groups must flush early
    (bounded memory), and every pair must still come out exactly once."""
    from ssim_tpu.utils import dataset

    da, db = tmp_path / "ha", tmp_path / "hb"
    da.mkdir(), db.mkdir()
    n = 12
    pairs = []
    for i in range(n):
        shape = (24 + 2 * i, 30 + 2 * i)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        name = f"u{i}.png"
        Image.fromarray(img).save(da / name)
        Image.fromarray(img).save(db / name)
        pairs.append((str(da / name), str(db / name)))

    out, max_pending = [], 0
    batch_size = 2
    gen = stream_batched_pairs(pairs, batch_size=batch_size)
    for names, a, b in gen:
        out.extend(names)
        assert a.shape[0] == len(names) <= batch_size
    assert sorted(out) == sorted(f"u{i}.png" for i in range(n))
    # The early-flush bound: with unique shapes and batch 2, at most
    # _MAX_BUFFERED_FACTOR * batch_size + 1 frames are ever buffered —
    # asserted indirectly by n > bound still succeeding above; pin the
    # constant so a regression to unbounded buffering shows up here.
    assert n > dataset._MAX_BUFFERED_FACTOR * batch_size


def test_channel_policy_out_of_range(pair_dirs, tmp_path, rng):
    """channel:N beyond the image's channels errors like the single-pair
    CLI does — including on grayscale images (no silent gray-plane
    fallback)."""
    gray = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    p = tmp_path / "gray.png"
    Image.fromarray(gray).save(p)
    with pytest.raises(ValueError, match="channel 2"):
        load_pairs([(str(p), str(p))], channel_policy="channel:2")
    # channel:0 on grayscale is fine (the one channel that exists).
    (_, a, _), = load_pairs([(str(p), str(p))], channel_policy="channel:0")
    assert a.ndim == 2


def test_cli_dir_luminance_precedence(pair_dirs, capsys):
    """-y wins over -# in --dir mode, matching single-pair mode."""
    from ssim_tpu import cli

    da, db, truths = pair_dirs
    assert cli.main(["-y", "-2", "--dir", "--impl=xla", da, db]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    scores = dict(line.split(":") for line in out)
    for name, want in truths.items():
        assert float(scores[name]) == pytest.approx(want, abs=5e-5)


def test_cli_batch_outside_dir_rejected(pair_dirs, capsys):
    from ssim_tpu import cli

    da, db, _ = pair_dirs
    a = os.path.join(da, "img0.png")
    b = os.path.join(db, "img0.png")
    assert cli.main(["--batch=4", a, b]) == 1
    assert "--batch" in capsys.readouterr().err
