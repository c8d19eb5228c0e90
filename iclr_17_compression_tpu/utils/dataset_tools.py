"""Offline data-prep and audit tools (host-side).

- ``check_image_sizes``      — dataset size audit (reference
  utils/checkImageSizes.py:1-38).
- ``create_diff_folder``     — build a diff-image dataset from a trained
  single-image codec: diff = clip(127 + (orig − recon·255)) (reference
  utils/create_diff_folder.py:31-44).
- ``save_both_direction_recons`` — dump DSC reconstructions of both
  conditioning directions, X|Y and Y|X (reference
  fast_image_filters/save_zx_zy_down.py).
- ``warp_side_information``  — feature-match + homography warp of the SI
  image onto the reconstruction to build the FIF-enhance triplet set
  (reference utils/warp_final_image.py:12-62). Uses ORB (SURF is
  patent-encumbered and absent from stock OpenCV); same Lowe-ratio +
  RANSAC-homography pipeline.
"""

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np


def check_image_sizes(folder: str) -> Dict:
    """Min H/W and the set of distinct sizes in a folder of images."""
    from PIL import Image

    sizes: List[Tuple[int, int]] = []
    min_h = min_w = None
    for f in sorted(os.listdir(folder)):
        p = os.path.join(folder, f)
        try:
            with Image.open(p) as im:
                w, h = im.size
        except Exception:
            continue
        if (h, w) not in sizes:
            sizes.append((h, w))
        min_h = h if min_h is None else min(min_h, h)
        min_w = w if min_w is None else min(min_w, w)
    return {"min_h": min_h, "min_w": min_w, "sizes": sizes}


def create_diff_folder(
    model, params, src_dir: str, out_dir: str, multiple: int = 16
) -> List[str]:
    """For each image: run the codec, save the centered residual image
    ``clip(127 + orig·255 − recon·255)`` as uint8 png."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..data.datasets import _list_images, _load, floor_to_multiple

    @jax.jit
    def fwd(im):
        return model.apply(params, im, train=False)["recon"]

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for p in _list_images(src_dir):
        img = floor_to_multiple(_load(p), multiple)
        recon = np.asarray(fwd(jnp.asarray(img)[None])[0])
        diff = np.clip(127.0 + (img - recon) * 255.0, 0, 255).astype(np.uint8)
        out = os.path.join(out_dir, os.path.basename(p))
        Image.fromarray(diff).save(out)
        written.append(out)
    return written


def save_both_direction_recons(
    model, params, pairs: Iterable[Tuple[np.ndarray, np.ndarray]], out_dir: str
) -> List[str]:
    """Dump recon(X|Y) and recon(Y|X) for each stereo pair."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    @jax.jit
    def fwd(im1, im2):
        return model.apply(params, im1, im2, train=False)["recon"]

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, (a, b) in enumerate(pairs):
        for tag, (x, y) in (("x_from_y", (a, b)), ("y_from_x", (b, a))):
            r = np.asarray(fwd(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
            out = os.path.join(out_dir, f"{i:04d}_{tag}.png")
            Image.fromarray((np.clip(r, 0, 1) * 255).astype(np.uint8)).save(out)
            written.append(out)
    return written


def warp_side_information(
    recon_path: str,
    si_path: str,
    out_path: Optional[str] = None,
    min_matches: int = 10,
    ratio: float = 0.7,
) -> Optional[str]:
    """Warp the SI image onto the reconstruction's frame via feature-match
    homography; returns the output path, or None when too few matches."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("warp_side_information requires OpenCV") from e
    from PIL import Image

    orig = cv2.imread(recon_path, 0)
    skew = cv2.imread(si_path, 0)
    orb = cv2.ORB_create(4000)
    kp1, des1 = orb.detectAndCompute(orig, None)
    kp2, des2 = orb.detectAndCompute(skew, None)
    if des1 is None or des2 is None:
        return None
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    matches = matcher.knnMatch(des1, des2, k=2)
    good = [m for m, n in (p for p in matches if len(p) == 2) if m.distance < ratio * n.distance]
    if len(good) < min_matches:
        return None
    src = np.float32([kp1[m.queryIdx].pt for m in good]).reshape(-1, 1, 2)
    dst = np.float32([kp2[m.trainIdx].pt for m in good]).reshape(-1, 1, 2)
    m_h, _ = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
    if m_h is None:
        return None
    im_si = cv2.imread(si_path)
    warped = cv2.warpPerspective(
        im_si, np.linalg.inv(m_h), (orig.shape[1], orig.shape[0])
    )
    warped = cv2.cvtColor(warped, cv2.COLOR_BGR2RGB)
    out_path = out_path or si_path.replace("SI", "SI_warped")
    Image.fromarray(warped).save(out_path)
    return out_path
