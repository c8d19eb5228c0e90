"""Build the offline training/eval datasets used for the round-3 R-D runs.

The sandbox has zero egress and ships exactly three real photos inside the
baked-in Python stack (sklearn's china/flower sample images, matplotlib's
grace_hopper). This script materializes:

  <root>/rd_data/train   left halves of the photos + 8 synthetic 1/f-spectrum
                         textures with piecewise-constant patches, replicated
                         12x so batch_iterator forms full batches
  <root>/rd_data/eval    right halves (the "Kodak stand-in" eval set; the
                         JPEG anchor runs on these same images)
  <root>/stereo_data     synthetic stereo pairs for the toy DSC run: right
                         eye = row-wise smooth-disparity shift of the left
                         + photometric jitter

Usage: python tools/make_offline_data.py [/tmp]
"""

import os
import shutil
import sys

import numpy as np
from PIL import Image


def photos():
    out = {}
    from sklearn.datasets import load_sample_images

    ds = load_sample_images()
    for fn, im in zip(ds.filenames, ds.images):
        out[os.path.basename(fn).split(".")[0]] = np.asarray(im, np.uint8)
    import matplotlib

    gh = Image.open(
        os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                     "sample_data", "grace_hopper.jpg")
    )
    out["hopper"] = np.asarray(gh.convert("RGB"))
    return out


def _align16(x):
    h, w = x.shape[:2]
    return x[: h - h % 16, : w - w % 16]


def make_rd(root):
    train = os.path.join(root, "rd_data", "train")
    ev = os.path.join(root, "rd_data", "eval")
    os.makedirs(train, exist_ok=True)
    os.makedirs(ev, exist_ok=True)
    for name, a in photos().items():
        half = a.shape[1] // 2
        Image.fromarray(_align16(a[:, :half])).save(f"{train}/{name}_left.png")
        Image.fromarray(_align16(a[:, half:])).save(f"{ev}/{name}_right.png")

    rng = np.random.default_rng(7)
    for i in range(8):
        n = 512
        fy = np.fft.fftfreq(n)[:, None]
        fx = np.fft.rfftfreq(n)[None, :]
        rad = np.sqrt(fy ** 2 + fx ** 2)
        rad[0, 0] = 1.0
        alpha = rng.uniform(0.8, 1.6)
        img = np.zeros((n, n, 3))
        base = None
        for c in range(3):
            spec = (
                rng.standard_normal((n, n // 2 + 1))
                + 1j * rng.standard_normal((n, n // 2 + 1))
            ) / rad ** alpha
            ch = np.fft.irfft2(spec, s=(n, n))
            if base is None:
                base = ch
            mix = rng.uniform(0.5, 0.95)
            ch = mix * base + (1 - mix) * ch
            ch = (ch - ch.min()) / (np.ptp(ch) + 1e-9)
            img[..., c] = ch
        for _ in range(rng.integers(3, 9)):
            x0, y0 = rng.integers(0, n, 2)
            wdt, hgt = rng.integers(30, 200, 2)
            img[y0:y0 + hgt, x0:x0 + wdt] = (
                0.7 * img[y0:y0 + hgt, x0:x0 + wdt] + 0.3 * rng.uniform(0, 1, 3)
            )
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            f"{train}/tex{i}.png"
        )

    files = sorted(os.listdir(train))
    for rep in range(1, 12):
        for f in files:
            shutil.copy(os.path.join(train, f), os.path.join(train, f"r{rep}_{f}"))
    print("rd_data:", len(os.listdir(train)), "train /", len(os.listdir(ev)), "eval")


def make_stereo(root):
    rng = np.random.default_rng(3)
    train = os.path.join(root, "rd_data", "train")
    out_l = os.path.join(root, "stereo_data", "left")
    out_r = os.path.join(root, "stereo_data", "right")
    os.makedirs(out_l, exist_ok=True)
    os.makedirs(out_r, exist_ok=True)
    files = [f for f in sorted(os.listdir(train)) if not f.startswith("r")]
    k = 0
    for f in files:
        a = np.asarray(Image.open(os.path.join(train, f)), np.float32) / 255.0
        h, w = a.shape[:2]
        for _ in range(10):
            base = rng.integers(6, 20)
            yy = np.linspace(0, 2 * np.pi * rng.uniform(0.5, 2.0), h)
            disp = (base + 4 * np.sin(yy + rng.uniform(0, 6)))[:, None]
            cols = np.clip(np.arange(w)[None, :] + disp, 0, w - 1).astype(int)
            b = a[np.arange(h)[:, None], cols]
            b = np.clip(b * rng.uniform(0.92, 1.08) + rng.uniform(-0.03, 0.03), 0, 1)
            Image.fromarray((a * 255).astype(np.uint8)).save(f"{out_l}/{k:04d}.png")
            Image.fromarray((b * 255).astype(np.uint8)).save(f"{out_r}/{k:04d}.png")
            k += 1
    print("stereo_data:", k, "pairs")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    make_rd(root)
    make_stereo(root)
