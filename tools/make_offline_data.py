"""Build the offline training/eval datasets used for the round-3 R-D runs.

The sandbox has zero egress and ships exactly three real photos inside the
baked-in Python stack (sklearn's china/flower sample images, matplotlib's
grace_hopper). This script materializes:

  <root>/rd_data/train   left halves of the photos + 8 synthetic 1/f-spectrum
                         textures with piecewise-constant patches, replicated
                         12x so batch_iterator forms full batches
  <root>/rd_data/eval    right halves (the "Kodak stand-in" eval set; the
                         JPEG anchor runs on these same images)
  <root>/stereo_data     synthetic stereo pairs for the DSC runs: right
                         eye = row-wise smooth-disparity shift of the left
                         + photometric jitter
  <root>/rd_data/eval24  24-image eval set matching the Kodak protocol
                         *shape* (reference train.py:157-198 iterates 24
                         images and reports per-image rows): diverse crops
                         of the held-out photo halves + unseen synthetic
                         textures, ×16-aligned, ≥320 px per side
  <root>/stereo_eval     24 held-out stereo pairs (built only from eval-side
                         content) for the DSC R-D protocol
                         (reference NewTests/test_new_model_reconAndSimilarity.py:98-159)

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


def _texture(rng, n=512):
    """One 1/f-spectrum RGB texture with piecewise-constant patches (same
    construction as make_rd's training textures, fresh rng → unseen content)."""
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
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _eval_images(rng):
    """24 diverse eval images from held-out content only: multi-scale crops
    of the photo *right* halves (training saw left halves) + fresh-seed
    textures + texture/photo composites. Returns a list of uint8 arrays."""
    halves = [_align16(a[:, a.shape[1] // 2:]) for a in photos().values()]
    out = []
    # 12 photo-derived: full halves at native res + crops/zooms
    for a in halves:
        out.append(a)
    for a in halves:
        h, w = a.shape[:2]
        for _ in range(3):
            ch = int(rng.integers(min(320, h - 16), h + 1) // 16 * 16)
            cw = int(rng.integers(min(320, w - 16), w + 1) // 16 * 16)
            y0 = int(rng.integers(0, h - ch + 1))
            x0 = int(rng.integers(0, w - cw + 1))
            crop = a[y0:y0 + ch, x0:x0 + cw]
            if rng.random() < 0.5:
                z = Image.fromarray(crop).resize(
                    ((cw * 3 // 2) // 16 * 16, (ch * 3 // 2) // 16 * 16),
                    Image.BICUBIC,
                )
                crop = np.asarray(z)
            out.append(crop)
    # 8 unseen textures
    for _ in range(8):
        out.append(_texture(rng))
    # 4 composites: photo crop pasted over a texture
    for i in range(4):
        tex = _texture(rng).copy()
        a = halves[i % len(halves)]
        ch, cw = min(256, a.shape[0]), min(256, a.shape[1])
        patch = a[:ch, :cw]
        y0 = int(rng.integers(0, tex.shape[0] - ch + 1))
        x0 = int(rng.integers(0, tex.shape[1] - cw + 1))
        tex[y0:y0 + ch, x0:x0 + cw] = patch
        out.append(tex)
    return out[:24]


def make_eval24(root):
    ev = os.path.join(root, "rd_data", "eval24")
    os.makedirs(ev, exist_ok=True)
    rng = np.random.default_rng(24)
    for i, a in enumerate(_eval_images(rng)):
        Image.fromarray(a).save(f"{ev}/eval{i + 1:02d}.png")
    print("eval24:", len(os.listdir(ev)), "images")


def _paste_novel(a, rng, k_lo=2, k_hi=6):
    """Paste left-eye-ONLY content (noise/flat/gradient patches) into ``a``
    AFTER the right eye was derived from it — the synthetic analog of the
    disocclusions and view-dependent content real stereo (KITTI/HoloPix)
    always has. Without this the right eye is a pure warp of the left, the
    side-information path can reconstruct everything, and DSC training
    collapses the transmitted code to zero (measured: a 5.3k-step flagship
    on pure-warp pairs had SI-assisted PSNR == SI-only PSNR — the code
    carried nothing). Returns a new array; ``a`` is not modified."""
    h, w = a.shape[:2]
    out = a.copy()
    for _ in range(rng.integers(k_lo, k_hi)):
        ph = int(rng.integers(h // 12, h // 4))
        pw = int(rng.integers(w // 12, w // 4))
        y0 = int(rng.integers(0, h - ph))
        x0 = int(rng.integers(0, w - pw))
        kind = rng.integers(0, 3)
        if kind == 0:  # flat color block
            patch = np.ones((ph, pw, 3)) * rng.uniform(0, 1, 3)
        elif kind == 1:  # smooth gradient patch
            yy, xx = np.mgrid[0:ph, 0:pw]
            g = (yy / max(ph - 1, 1) * rng.uniform(-1, 1)
                 + xx / max(pw - 1, 1) * rng.uniform(-1, 1))
            g = (g - g.min()) / (np.ptp(g) + 1e-9)
            c0, c1 = rng.uniform(0, 1, 3), rng.uniform(0, 1, 3)
            patch = c0 + (c1 - c0) * g[..., None]
        else:  # textured noise patch (high-frequency novel detail)
            patch = rng.uniform(0, 1, (ph, pw, 3))
            patch = 0.5 * patch + 0.5 * rng.uniform(0, 1, 3)
        out[y0:y0 + ph, x0:x0 + pw] = np.clip(patch, 0, 1)
    return out


def _shift_pair(a, rng):
    """Right eye = row-wise smooth-disparity shift + photometric jitter
    (same warp family as the training pairs, fresh rng)."""
    h, w = a.shape[:2]
    base = rng.integers(6, 20)
    yy = np.linspace(0, 2 * np.pi * rng.uniform(0.5, 2.0), h)
    disp = (base + 4 * np.sin(yy + rng.uniform(0, 6)))[:, None]
    cols = np.clip(np.arange(w)[None, :] + disp, 0, w - 1).astype(int)
    b = a[np.arange(h)[:, None], cols]
    return np.clip(b * rng.uniform(0.92, 1.08) + rng.uniform(-0.03, 0.03), 0, 1)


def make_stereo_eval(root, size=(320, 384)):
    """24 held-out stereo pairs for the DSC eval protocol; content drawn only
    from the eval24 set (never seen by training).

    All pairs share ONE fixed shape — the reference eval protocol also
    fixes its crop (CenterCrop 320×1224, reference
    NewTests/test_new_model_reconAndSimilarity.py:69), and a single shape
    means a single XLA compile for the whole eval on any backend."""
    rng = np.random.default_rng(99)
    th, tw = size
    out_l = os.path.join(root, "stereo_eval", "left")
    out_r = os.path.join(root, "stereo_eval", "right")
    os.makedirs(out_l, exist_ok=True)
    os.makedirs(out_r, exist_ok=True)
    for k, a8 in enumerate(_eval_images(np.random.default_rng(24))):
        a = a8.astype(np.float32) / 255.0
        h, w = a.shape[:2]
        if h < th or w < tw:  # joint upscale so the fixed crop fits
            s = max(th / h, tw / w)
            nh, nw = max(th, int(round(h * s))), max(tw, int(round(w * s)))
            a = np.asarray(
                Image.fromarray(a8).resize((nw, nh), Image.BILINEAR), np.float32
            ) / 255.0
            h, w = nh, nw
        y0, x0 = (h - th) // 2, (w - tw) // 2
        a = a[y0:y0 + th, x0:x0 + tw]
        b = _shift_pair(a, rng)
        a = _paste_novel(a, rng)
        Image.fromarray((a * 255).astype(np.uint8)).save(f"{out_l}/{k:04d}.png")
        Image.fromarray((b * 255).astype(np.uint8)).save(f"{out_r}/{k:04d}.png")
    print("stereo_eval:", len(os.listdir(out_l)), "pairs", size)


def _blob_scene(rng, n=512):
    """Second-domain texture family: soft Gaussian 'bokeh' blobs + hard
    gratings over a smooth ramp — spectrally unlike the 1/f textures the
    training pairs were built from (flat spectrum gratings, isolated
    low-frequency bumps)."""
    yy, xx = np.mgrid[0:n, 0:n] / n
    img = np.zeros((n, n, 3))
    g0 = rng.uniform(0, 1, 3)
    g1 = rng.uniform(0, 1, 3)
    img += g0 + (g1 - g0) * (rng.uniform(-1, 1) * yy + rng.uniform(-1, 1) * xx)[..., None] * 0.5
    for _ in range(rng.integers(8, 20)):
        cy, cx = rng.uniform(0, 1, 2)
        s = rng.uniform(0.01, 0.12)
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
        img += blob[..., None] * rng.uniform(-0.6, 0.6, 3)
    # one grating patch: high-frequency structure with a flat spectrum line
    th = rng.uniform(0, np.pi)
    freq = rng.uniform(20, 70)
    grating = 0.5 + 0.5 * np.sign(np.sin(2 * np.pi * freq * (yy * np.sin(th) + xx * np.cos(th))))
    y0, x0 = rng.integers(0, n // 2, 2)
    hgt, wdt = rng.integers(n // 5, n // 2, 2)
    img[y0:y0 + hgt, x0:x0 + wdt] = (
        0.55 * img[y0:y0 + hgt, x0:x0 + wdt] + 0.45 * grating[y0:y0 + hgt, x0:x0 + wdt, None]
    )
    lo, hi = img.min(), img.max()
    return ((img - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)


def _shift_pair_planes(a, rng):
    """Second-domain disparity family: piecewise-constant depth PLANES
    (block disparities 24-48 px with hard discontinuities), a small
    uncorrected VERTICAL parallax, and stronger photometric mismatch with a
    per-eye gamma — the statistics of casually captured phone stereo
    (HoloPix-like) rather than the smooth sinusoidal warp of the training
    distribution."""
    h, w = a.shape[:2]
    n_planes = rng.integers(2, 5)
    edges = np.sort(rng.integers(h // 6, h - h // 6, n_planes - 1)) if n_planes > 1 else np.array([], int)
    disp_vals = rng.integers(24, 48, n_planes)
    disp = np.empty(h, int)
    start = 0
    for e, d in zip(list(edges) + [h], disp_vals):
        disp[start:e] = d
        start = e
    vshift = int(rng.integers(-2, 3))
    rows = np.clip(np.arange(h) + vshift, 0, h - 1)
    cols = np.clip(np.arange(w)[None, :] + disp[:, None], 0, w - 1)
    b = a[rows[:, None], cols]
    gamma = rng.uniform(0.85, 1.2)
    b = np.clip(b, 0, 1) ** gamma
    return np.clip(b * rng.uniform(0.85, 1.15) + rng.uniform(-0.06, 0.06), 0, 1)


def make_stereo_eval2(root, size=(320, 384)):
    """24 SECOND-DOMAIN stereo pairs (the R_D_HoloPix.png analog, reference
    NewTests/test_new_model_reconAndSimilarity.py:134): both the content
    family (_blob_scene) and the stereo geometry/photometry
    (_shift_pair_planes) differ from the training distribution, so an eval
    here measures whether the trained SI gain survives off-distribution."""
    rng = np.random.default_rng(77)
    th, tw = size
    out_l = os.path.join(root, "stereo_eval2", "left")
    out_r = os.path.join(root, "stereo_eval2", "right")
    os.makedirs(out_l, exist_ok=True)
    os.makedirs(out_r, exist_ok=True)
    for k in range(24):
        a = _blob_scene(rng).astype(np.float32) / 255.0
        h, w = a.shape[:2]
        y0, x0 = rng.integers(0, h - th), rng.integers(0, w - tw)
        a = a[y0:y0 + th, x0:x0 + tw]
        b = _shift_pair_planes(a, rng)
        a = _paste_novel(a, rng)
        Image.fromarray((a * 255).astype(np.uint8)).save(f"{out_l}/{k:04d}.png")
        Image.fromarray((b * 255).astype(np.uint8)).save(f"{out_r}/{k:04d}.png")
    print("stereo_eval2:", len(os.listdir(out_l)), "pairs", size)


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
            a_novel = _paste_novel(a, rng)
            Image.fromarray((a_novel * 255).astype(np.uint8)).save(f"{out_l}/{k:04d}.png")
            Image.fromarray((b * 255).astype(np.uint8)).save(f"{out_r}/{k:04d}.png")
            k += 1
    print("stereo_data:", k, "pairs")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    make_rd(root)
    make_stereo(root)
    make_eval24(root)
    make_stereo_eval(root)
    make_stereo_eval2(root)
