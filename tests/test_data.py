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


# ---------------------------------------------------------------------------
# The four remaining reference dataset shapes (datasets.py:147-410)
# ---------------------------------------------------------------------------


@pytest.fixture
def holopix_dirs(tmp_path, rng):
    l, r = tmp_path / "left", tmp_path / "right"
    l.mkdir(), r.mkdir()
    for i in range(3):
        for d in (l, r):
            arr = (rng.random((100, 140, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"pair_{i}.jpg")
    return str(l)


def test_holopix(holopix_dirs):
    from iclr_17_compression_tpu.data import StereoHoloPixDataset

    ds = StereoHoloPixDataset(holopix_dirs, random_crop=True, crop=(64, 64))
    assert len(ds) == 3
    a, b = ds[0]
    assert a.shape == (64, 64, 3) and b.shape == (64, 64, 3)
    ds2 = StereoHoloPixDataset(holopix_dirs, random_crop=False)
    a, b = ds2[1]
    assert a.shape == (96, 128, 3)  # floor-to-x32 of 100x140
    assert a.shape == b.shape


def test_fif_enhance_triplets(tmp_path, rng):
    from iclr_17_compression_tpu.data import FIFEnhanceDataset

    for sub in ("reconstructed", "original", "SI_warped"):
        d = tmp_path / sub
        d.mkdir()
        for i in range(2):
            arr = (rng.random((80, 120, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im_{i}.png")
    ds = FIFEnhanceDataset(str(tmp_path / "reconstructed"), random_crop=True, crop=(64, 96))
    si, rec, orig = ds[0]
    assert si.shape == rec.shape == orig.shape == (64, 96, 3)
    # triplet members come from the three sibling folders, not copies
    assert not np.array_equal(si, rec)


@pytest.fixture
def kitti_root(tmp_path, rng):
    for cam in ("image_2", "image_3"):
        d = tmp_path / cam
        d.mkdir()
        for i in range(3):
            arr = (rng.random((90, 160, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"000{i}_10.png")
    return str(tmp_path)


def test_passr_triplets(kitti_root):
    from iclr_17_compression_tpu.data import StereoPassrDataset

    ds = StereoPassrDataset([kitti_root], train=True, crop=(64, 64))
    blurry, right, left = ds[0]
    assert blurry.shape == right.shape == left.shape == (64, 64, 3)
    # the LR eye went through a /2 resize round trip: smoother than the HR eye
    def tv(x):
        return np.abs(np.diff(x, axis=0)).mean() + np.abs(np.diff(x, axis=1)).mean()

    assert tv(blurry) < tv(left)


def test_stereo_plus(stereo_dirs, image_dir):
    from iclr_17_compression_tpu.data import StereoPlusDataset

    l, r = stereo_dirs
    ds = StereoPlusDataset(l, r, image_dir, random_crop=True, crop=(64, 64), contrast_size=48)
    a, b, c = ds[0]
    assert a.shape == (64, 64, 3) and b.shape == (64, 64, 3)
    assert c.shape == (48, 48, 3)
    # batch_iterator stacks 3-tuples too
    batch = next(iter(batch_iterator(ds, 2, shuffle=False)))
    assert batch[0].shape == (2, 64, 64, 3) and batch[2].shape == (2, 48, 48, 3)


def test_batch_iterator_prefetch_matches_sync():
    """Threaded prefetch must yield byte-identical batches in the same order."""
    from iclr_17_compression_tpu.data.datasets import batch_iterator

    class _DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return np.full((4, 4, 3), i, np.float32)

    ds = _DS()
    sync = list(batch_iterator(ds, 4, seed=7))
    threaded = list(batch_iterator(ds, 4, seed=7, num_workers=3, prefetch=2))
    assert len(sync) == len(threaded) == 5
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a, b)


def test_batch_iterator_prefetch_pairs():
    from iclr_17_compression_tpu.data.datasets import batch_iterator

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return (np.full((2, 2, 3), i, np.float32),
                    np.full((2, 2, 3), -i, np.float32))

    for a, b in batch_iterator(_DS(), 2, shuffle=False, num_workers=2):
        np.testing.assert_array_equal(a, -b)
