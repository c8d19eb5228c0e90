"""Data pipelines — NHWC float32 in [0,1], pure numpy/PIL (no torch).

Covers the reference's 8 Dataset classes (reference datasets.py:14-420) with
four composable loaders:

- ImageFolderDataset : random-resized-crop + flips (reference Datasets,
  datasets.py:14-37) for single-image codecs.
- KodakDataset       : whole-image eval set (reference TestKodakDataset,
  datasets.py:62-78).
- StereoPairDataset  : generic paired folders w/ joint crop + joint flips
  (reference StereoDataset/StereoDataset_HoloPix50k, datasets.py:80-196):
  floor-to-multiple-of-M, random crop, joint vertical flip (LR flip kept off
  as in reference utils/image_utils.py:11).
- StereoKittiDataset : KITTI 2012+2015 multiview-style pair lists, train/test
  split by filename pattern, joint crop + identical color jitter on both eyes
  (reference StereoDataset_new, datasets.py:202-278).

``batch_iterator`` replaces DataLoader: shuffling, batching, optional
host-side prefetch to device.
"""

import os
import random
import threading
from collections import OrderedDict
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def _list_images(d: str) -> List[str]:
    out = []
    for root, _, files in os.walk(d):
        for f in sorted(files):
            if f.lower().endswith(_EXTS):
                out.append(os.path.join(root, f))
    return sorted(out)


def _load(path: str) -> np.ndarray:
    cached = _DECODE_CACHE.get(path)
    if cached is not None:
        return cached
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if _decode_cache_limit_bytes() > 0:
        _DECODE_CACHE.put(path, arr)
    return arr


def _decode_cache_limit_bytes() -> int:
    """Decoded-image cache budget (bytes); ICLR17C_DECODE_CACHE_MB overrides.

    PNG/JPEG decode dominates the input pipeline when the working set is
    small (measured: the Ballé trainer at batch 32 ran 83 img/s
    decode-bound vs >400 with decode cached); datasets larger than the
    budget simply stream as before (LRU eviction). Items are immutable —
    callers never write into the returned array (augmentations copy)."""
    return int(float(os.environ.get("ICLR17C_DECODE_CACHE_MB", "2048")) * 2**20)


class _LRUBytes:
    def __init__(self):
        self._d: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            arr = self._d.get(key)
            if arr is not None:
                self._d.move_to_end(key)
            return arr

    def put(self, key, arr):
        with self._lock:
            if key in self._d:
                return
            limit = _decode_cache_limit_bytes()
            if arr.nbytes > limit:
                return
            # np.ascontiguousarray is a no-copy pass-through for contiguous
            # slices, so the cached buffer can escape to callers; freezing it
            # turns any future in-place edit into a loud error instead of
            # silent cache corruption.
            arr.flags.writeable = False
            self._d[key] = arr
            self._bytes += arr.nbytes
            while self._bytes > limit and self._d:
                _, old = self._d.popitem(last=False)
                self._bytes -= old.nbytes


_DECODE_CACHE = _LRUBytes()


def _rand_crop(img: np.ndarray, ch: int, cw: int, rng: random.Random) -> np.ndarray:
    h, w = img.shape[:2]
    if h < ch or w < cw:  # upscale-pad via resize fallback
        img = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize(
                (max(cw, w), max(ch, h)), Image.BILINEAR
            ),
            dtype=np.float32,
        ) / 255.0
        h, w = img.shape[:2]
    top = rng.randint(0, h - ch)
    left = rng.randint(0, w - cw)
    return img[top: top + ch, left: left + cw]


def floor_to_multiple(img: np.ndarray, m: int) -> np.ndarray:
    """Center-crop H and W down to multiples of m (reference
    train_2StepsNet.py:160-168, datasets.py:182-184)."""
    h, w = img.shape[:2]
    nh, nw = (h // m) * m, (w // m) * m
    top, left = (h - nh) // 2, (w - nw) // 2
    return img[top: top + nh, left: left + nw]


def _fit_for_crop(ch: int, cw: int, *imgs: np.ndarray):
    """Jointly upscale ``imgs`` so a (ch, cw) crop fits in all of them.

    Batched training requires uniform item shapes (np.stack in
    _assemble_batch); shrinking the crop per item — the pre-round-4 behavior
    — crashed any batch mixing undersized and full-size images. When a
    resize is needed, EVERY view is mapped to one common target size: for
    equal-size views (all in-tree stereo datasets) that is identical
    scaling, which preserves row correspondence with disparity scaled; for
    views of unequal sizes it aligns them onto a shared grid (same-extent
    assumption — joint cropping is only meaningful under it anyway).
    Returns (h, w, *scaled_imgs)."""
    h = min(im.shape[0] for im in imgs)
    w = min(im.shape[1] for im in imgs)
    if h >= ch and w >= cw:
        return (h, w) + tuple(imgs)
    s = max(ch / h, cw / w)
    nh = max(ch, int(round(h * s)))
    nw = max(cw, int(round(w * s)))
    return (nh, nw) + tuple(_resize(im, nh, nw) for im in imgs)


class _EpochSeeded:
    """Stateless per-item augmentation RNG: a pure function of
    (seed, epoch, index). A shared ``random.Random`` would make augmentations
    depend on call history — nondeterministic under threaded prefetch
    (concurrent ``__getitem__``) and impossible to reproduce after a
    checkpoint resume. ``batch_iterator(..., epoch=e)`` calls ``set_epoch``."""

    seed: int = 1234
    _epoch: int = 0

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def _item_rng(self, i: int) -> random.Random:
        # int-tuple hash is deterministic across processes (PYTHONHASHSEED
        # only randomizes str/bytes hashing)
        return random.Random(hash((self.seed, self._epoch, i)))


class ImageFolderDataset(_EpochSeeded):
    """RandomResizedCrop + H/V flips for codec training (reference
    ``Datasets``, datasets.py:21-28: RandomResizedCrop(image_size) then
    random horizontal+vertical flips)."""

    def __init__(self, root: str, image_size: int = 256, seed: int = 1234,
                 random_resized: bool = True):
        self.paths = _list_images(root)
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.image_size = image_size
        self.seed = seed
        self.random_resized = random_resized

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        rng = self._item_rng(i)
        img = _load(self.paths[i % len(self.paths)])
        s = self.image_size
        if self.random_resized:
            img = _random_resized_crop(img, s, rng)
        else:
            img = _rand_crop(img, s, s, rng)
        if rng.random() < 0.5:
            img = img[:, ::-1]
        if rng.random() < 0.5:
            img = img[::-1, :]
        return np.ascontiguousarray(img)


class KodakDataset:
    """Whole images, optionally floor-cropped to a stride multiple."""

    def __init__(self, root: str, multiple: int = 16):
        self.paths = _list_images(root)
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.multiple = multiple

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        return np.ascontiguousarray(floor_to_multiple(_load(self.paths[i]), self.multiple))


def _color_jitter(img: np.ndarray, rng: random.Random,
                  brightness=0.1, contrast=0.1, saturation=0.1) -> np.ndarray:
    """Identical-factor jitter helper; call once with a fixed rng state per
    pair so both eyes get the same transform (reference datasets.py:259-263
    stacks both eyes before jitter for the same effect)."""
    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    s = 1.0 + rng.uniform(-saturation, saturation)
    img = img * b
    mean = img.mean(axis=(0, 1), keepdims=True)
    img = (img - mean) * c + mean
    gray = img.mean(axis=2, keepdims=True)
    img = (img - gray) * s + gray
    return np.clip(img, 0.0, 1.0)


class StereoPairDataset(_EpochSeeded):
    """Paired left/right folders matched by sorted order or filename map.

    ``resize_to``: optional (h, w) both eyes are resized to after the joint
    crop — the reference StereoDataset's crop-370×740-then-resize-to-128×256
    training path (reference datasets.py:95-117)."""

    def __init__(
        self,
        left_dir: str,
        right_dir: str,
        crop: Optional[Tuple[int, int]] = (320, 320),
        multiple: int = 32,
        train: bool = True,
        joint_vflip: bool = True,
        resize_to: Optional[Tuple[int, int]] = None,
        seed: int = 1234,
    ):
        self.left = _list_images(left_dir)
        self.right = _list_images(right_dir)
        if len(self.left) != len(self.right) or not self.left:
            raise ValueError(
                f"pair mismatch: {len(self.left)} left vs {len(self.right)} right"
            )
        self.crop = crop
        self.multiple = multiple
        self.train = train
        self.joint_vflip = joint_vflip
        self.resize_to = resize_to
        self.seed = seed

    def __len__(self):
        return len(self.left)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = self._item_rng(i)
        a, b = _load(self.left[i]), _load(self.right[i])
        if self.train and self.crop is not None:
            ch, cw = self.crop
            h, w, a, b = _fit_for_crop(ch, cw, a, b)
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            a = a[top: top + ch, left: left + cw]
            b = b[top: top + ch, left: left + cw]
            if self.joint_vflip and rng.random() < 0.5:
                a, b = a[::-1], b[::-1]
        if self.resize_to is not None:
            rh, rw = self.resize_to
            a, b = _resize(a, rh, rw), _resize(b, rh, rw)
        a = floor_to_multiple(a, self.multiple)
        b = floor_to_multiple(b, self.multiple)
        return np.ascontiguousarray(a), np.ascontiguousarray(b)


class StereoKittiDataset(StereoPairDataset):
    """KITTI-style multiview pairs with the reference's split convention:
    train = all frames, test = ``*_10`` frames only (reference
    datasets.py:221-225), crop 315×1215→floor-×32, identical color jitter."""

    def __init__(
        self,
        roots: Sequence[str],
        train: bool = True,
        crop: Optional[Tuple[int, int]] = (315, 1215),
        multiple: int = 32,
        jitter: bool = True,
        seed: int = 1234,
    ):
        self.pairs: List[Tuple[str, str]] = []
        for root in roots:
            l_dir, r_dir = os.path.join(root, "image_2"), os.path.join(root, "image_3")
            if not (os.path.isdir(l_dir) and os.path.isdir(r_dir)):
                continue
            rights = {os.path.basename(p): p for p in _list_images(r_dir)}
            for lp in _list_images(l_dir):
                base = os.path.basename(lp)
                keep = base.endswith("_10.png") if not train else True
                if keep and base in rights:
                    self.pairs.append((lp, rights[base]))
        if not self.pairs:
            raise FileNotFoundError(f"no KITTI pairs under {roots}")
        self.crop = crop
        self.multiple = multiple
        self.train = train
        self.jitter = jitter and train
        self.joint_vflip = train
        self.seed = seed

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = self._item_rng(i)
        lp, rp = self.pairs[i]
        a, b = _load(lp), _load(rp)
        if self.train and self.crop is not None:
            ch, cw = self.crop
            h, w, a, b = _fit_for_crop(ch, cw, a, b)
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            a = a[top: top + ch, left: left + cw]
            b = b[top: top + ch, left: left + cw]
            if rng.random() < 0.5:
                a, b = a[::-1], b[::-1]
            if self.jitter:
                # identical jitter factors for both eyes (reference
                # datasets.py:259-263 stacks the eyes before jitter)
                st = rng.getstate()
                jr = random.Random()
                jr.setstate(st)
                a = _color_jitter(a, jr)
                jr.setstate(st)
                b = _color_jitter(b, jr)
        a = floor_to_multiple(a, self.multiple)
        b = floor_to_multiple(b, self.multiple)
        return np.ascontiguousarray(a), np.ascontiguousarray(b)


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize, float32 [0,1]."""
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((w, h), Image.BILINEAR), np.float32) / 255.0


def _random_resized_crop(
    img: np.ndarray, size: int, rng: random.Random,
    scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
) -> np.ndarray:
    """torchvision RandomResizedCrop semantics (area-scale + aspect jitter,
    fallback to center crop)."""
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            return _resize(img[top: top + ch, left: left + cw], size, size)
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    return _resize(img[top: top + s, left: left + s], size, size)


class StereoHoloPixDataset(_EpochSeeded):
    """HoloPix50k left/right pairs matched by 'left'→'right' path
    substitution, jpg only, floor-to-×32, optional joint 320×320 random crop
    (reference StereoDataset_HoloPix50k, datasets.py:147-196)."""

    def __init__(
        self,
        left_dir: str,
        random_crop: bool = False,
        crop: Tuple[int, int] = (320, 320),
        multiple: int = 32,
        seed: int = 1234,
    ):
        self.left = [p for p in _list_images(left_dir) if p.lower().endswith((".jpg", ".jpeg"))]
        if not self.left:
            raise FileNotFoundError(f"no jpg images under {left_dir}")
        self.random_crop = random_crop
        self.crop = crop
        self.multiple = multiple
        self.seed = seed

    def __len__(self):
        return len(self.left)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = self._item_rng(i)
        lp = self.left[i]
        rp = lp.replace("left", "right")
        if not os.path.exists(rp):
            raise FileNotFoundError(
                f"missing right image {rp} (left/right names must match)"
            )
        a, b = _load(lp), _load(rp)
        a, b = floor_to_multiple(a, self.multiple), floor_to_multiple(b, self.multiple)
        if self.random_crop:
            ch, cw = self.crop
            h, w, a, b = _fit_for_crop(ch, cw, a, b)
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            a = a[top: top + ch, left: left + cw]
            b = b[top: top + ch, left: left + cw]
        return np.ascontiguousarray(a), np.ascontiguousarray(b)


class FIFEnhanceDataset(_EpochSeeded):
    """(SI_warped, reconstructed, original) triplets found by path
    substitution from the reconstructed-images folder, optional joint
    320×1216 crop (reference StereoDataset_FIF_enhance, datasets.py:284-316).
    Feeds the enhancement-net trainer."""

    def __init__(
        self,
        reconstructed_dir: str,
        random_crop: bool = False,
        crop: Tuple[int, int] = (320, 1216),
        seed: int = 1234,
    ):
        self.rec = _list_images(reconstructed_dir)
        if not self.rec:
            raise FileNotFoundError(f"no images under {reconstructed_dir}")
        self.random_crop = random_crop
        self.crop = crop
        self.seed = seed

    def __len__(self):
        return len(self.rec)

    def __getitem__(self, i: int):
        rng = self._item_rng(i)
        rp = self.rec[i]
        im_rec = _load(rp)
        im_orig = _load(rp.replace("reconstructed", "original"))
        im_si = _load(rp.replace("reconstructed", "SI_warped"))
        if self.random_crop:
            ch, cw = self.crop
            h, w, im_rec, im_orig, im_si = _fit_for_crop(ch, cw, im_rec, im_orig, im_si)
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            sl = np.s_[top: top + ch, left: left + cw]
            im_rec, im_orig, im_si = im_rec[sl], im_orig[sl], im_si[sl]
        return (
            np.ascontiguousarray(im_si),
            np.ascontiguousarray(im_rec),
            np.ascontiguousarray(im_orig),
        )


class StereoPassrDataset(_EpochSeeded):
    """(LR_left, HR_right, HR_left) for parallax-attention SR training: the
    left eye is blurred by a ÷2 resize round trip after a joint crop
    (reference StereoDataset_passrNet, datasets.py:319-362)."""

    def __init__(
        self,
        roots: Sequence[str],
        train: bool = True,
        crop: Tuple[int, int] = (320, 320),
        seed: int = 1234,
    ):
        base = StereoKittiDataset(roots, train=train, crop=None, jitter=False, seed=seed)
        self.pairs = base.pairs
        self.train = train
        self.crop = crop
        self.seed = seed

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int):
        rng = self._item_rng(i)
        lp, rp = self.pairs[i]
        left, right = _load(lp), _load(rp)
        ch, cw = self.crop
        h, w, left, right = _fit_for_crop(ch, cw, left, right)
        if self.train:
            top = rng.randint(0, h - ch)
            lft = rng.randint(0, w - cw)
        else:
            top, lft = (h - ch) // 2, (w - cw) // 2
        left = left[top: top + ch, lft: lft + cw]
        right = right[top: top + ch, lft: lft + cw]
        blurry = _resize(_resize(left, ch // 2, cw // 2), ch, cw)
        return (
            np.ascontiguousarray(blurry),
            np.ascontiguousarray(right),
            np.ascontiguousarray(left),
        )


class StereoPlusDataset(_EpochSeeded):
    """Stereo pair (basename-matched folders) + a random-resized-crop third
    image as the contrastive negative (reference StereoPlusDataset,
    datasets.py:365-410)."""

    def __init__(
        self,
        left_dir: str,
        right_dir: str,
        contrast_dir: str,
        random_crop: bool = False,
        crop: Tuple[int, int] = (368, 368),
        contrast_size: int = 368,
        seed: int = 1234,
    ):
        self.left = _list_images(left_dir)
        self.right_dir = right_dir
        self.contrast = _list_images(contrast_dir)
        if not self.left or not self.contrast:
            raise FileNotFoundError("empty stereo or contrast folder")
        self.random_crop = random_crop
        self.crop = crop
        self.contrast_size = contrast_size
        self.seed = seed

    def __len__(self):
        return len(self.left)

    def __getitem__(self, i: int):
        rng = self._item_rng(i)
        lp = self.left[i]
        rp = os.path.join(self.right_dir, os.path.basename(lp))
        a, b = _load(lp), _load(rp)
        c = _random_resized_crop(
            _load(self.contrast[i % len(self.contrast)]), self.contrast_size, rng
        )
        if self.random_crop:
            ch, cw = self.crop
            h, w, a, b = _fit_for_crop(ch, cw, a, b)
            top = rng.randint(0, h - ch)
            left = rng.randint(0, w - cw)
            a = a[top: top + ch, left: left + cw]
            b = b[top: top + ch, left: left + cw]
        return np.ascontiguousarray(a), np.ascontiguousarray(b), c


def _assemble_batch(items):
    if isinstance(items[0], tuple):
        return tuple(np.stack([it[j] for it in items]) for j in range(len(items[0])))
    return np.stack(items)


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_workers: int = 0,
    prefetch: int = 4,
    epoch: Optional[int] = None,
    skip: int = 0,
) -> Iterator:
    """DataLoader replacement. Yields stacked numpy batches; for paired
    datasets, yields a tuple of stacked arrays.

    ``num_workers > 0`` loads items on a thread pool and keeps ``prefetch``
    batches in flight, overlapping PIL decode / augmentation (libjpeg/zlib
    release the GIL) with the accelerator step — the role DataLoader worker
    processes play in the reference (train.py:238-243, num_workers=1).
    Batch order and contents are identical to the synchronous path.

    ``epoch`` is folded into the shuffle seed and forwarded to the dataset's
    ``set_epoch`` (stateless per-item augmentation RNG). ``skip`` drops the
    first N batches WITHOUT loading them — exact mid-epoch checkpoint resume.
    """
    if epoch is not None:
        seed = seed + epoch
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(epoch)
    idx = list(range(len(dataset)))
    rng = random.Random(seed)
    if shuffle:
        rng.shuffle(idx)
    chunks = []
    for start in range(0, len(idx), batch_size):
        chunk = idx[start: start + batch_size]
        if drop_last and len(chunk) < batch_size:
            break
        chunks.append(chunk)
    chunks = chunks[skip:]

    if num_workers <= 0:
        for chunk in chunks:
            yield _assemble_batch([dataset[i] for i in chunk])
        return

    import collections
    import concurrent.futures as futures

    ex = futures.ThreadPoolExecutor(max_workers=num_workers)
    try:
        pending = collections.deque()
        it = iter(chunks)
        for chunk in chunks[: max(prefetch, 1)]:
            next(it)
            pending.append([ex.submit(dataset.__getitem__, i) for i in chunk])
        while pending:
            futs = pending.popleft()
            nxt = next(it, None)
            if nxt is not None:
                pending.append([ex.submit(dataset.__getitem__, i) for i in nxt])
            yield _assemble_batch([f.result() for f in futs])
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
