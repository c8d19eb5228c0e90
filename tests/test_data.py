"""Data pipeline tests with synthetic image folders."""

import os

import numpy as np
import pytest
from PIL import Image

from iclr_17_compression_tpu.data import (
    ImageFolderDataset,
    KodakDataset,
    StereoPairDataset,
    batch_iterator,
)
from iclr_17_compression_tpu.data.datasets import floor_to_multiple


@pytest.fixture
def image_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        arr = (rng.random((70 + i, 90, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


@pytest.fixture
def stereo_dirs(tmp_path, rng):
    l, r = tmp_path / "left", tmp_path / "right"
    l.mkdir(), r.mkdir()
    for i in range(3):
        for d in (l, r):
            arr = (rng.random((100, 140, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"f_{i}.png")
    return str(l), str(r)


def test_floor_to_multiple():
    img = np.zeros((70, 90, 3))
    out = floor_to_multiple(img, 32)
    assert out.shape == (64, 64, 3)


def test_image_folder(image_dir):
    ds = ImageFolderDataset(image_dir, image_size=64)
    assert len(ds) == 4
    x = ds[0]
    assert x.shape == (64, 64, 3)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0


def test_kodak(image_dir):
    ds = KodakDataset(image_dir, multiple=16)
    x = ds[0]
    assert x.shape[0] % 16 == 0 and x.shape[1] % 16 == 0


def test_stereo_pairs(stereo_dirs):
    l, r = stereo_dirs
    ds = StereoPairDataset(l, r, crop=(64, 96), multiple=32, train=True)
    a, b = ds[0]
    assert a.shape == b.shape == (64, 96, 3)
    ds_eval = StereoPairDataset(l, r, crop=None, multiple=32, train=False)
    a, b = ds_eval[1]
    assert a.shape[0] % 32 == 0 and a.shape[1] % 32 == 0


def test_batch_iterator(image_dir):
    ds = ImageFolderDataset(image_dir, image_size=32)
    batches = list(batch_iterator(ds, batch_size=2, shuffle=True, seed=0))
    assert len(batches) == 2
    assert batches[0].shape == (2, 32, 32, 3)


def test_batch_iterator_pairs(stereo_dirs):
    l, r = stereo_dirs
    ds = StereoPairDataset(l, r, crop=(64, 64), multiple=32)
    batches = list(batch_iterator(ds, batch_size=2, shuffle=False))
    assert len(batches) == 1
    a, b = batches[0]
    assert a.shape == (2, 64, 64, 3) and b.shape == (2, 64, 64, 3)
