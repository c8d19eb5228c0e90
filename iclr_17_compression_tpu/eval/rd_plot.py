"""R-D curve comparison + JPEG anchor.

Reproduces the reference's anchor pipeline (reference test/jpeg.sh,
test/draw_rd.py:1-43): JPEG at a quality sweep (via PIL, 4:2:0), bpp from
encoded size, SSIM/PSNR from our on-device metrics; plus plotting of any
set of (bpp, metric) curves to PNG (matplotlib, host-side).

The legacy LSTM-codec anchor in the reference is frozen CSV data
(test/lstm_ssim.csv, bpp law = iters/192*24, draw_rd.py:13); use
``lstm_bpp`` to interpret such CSVs if present.
"""

import io
import os
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def jpeg_anchor_point(img: np.ndarray, quality: int) -> Tuple[float, np.ndarray]:
    """Encode HWC [0,1] image as JPEG 4:2:0 at ``quality``; returns
    (bpp, decoded image)."""
    from PIL import Image

    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    buf = io.BytesIO()
    pil.save(buf, format="JPEG", quality=quality, subsampling=2)  # 4:2:0
    data = buf.getvalue()
    bpp = len(data) * 8.0 / (img.shape[0] * img.shape[1])
    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.float32) / 255.0
    return bpp, dec


def jpeg_anchor_curve(
    images: Sequence[np.ndarray],
    qualities: Iterable[int] = tuple(range(5, 101, 5)),
) -> List[Dict[str, float]]:
    """Mean R-D points over a set of images (the reference's 24×20 sweep,
    test/jpeg.sh:1-9)."""
    import jax.numpy as jnp

    from ..ops.metrics import ms_ssim, psnr, ssim

    curve = []
    for q in qualities:
        bpps, psnrs, ssims, msssims = [], [], [], []
        for img in images:
            bpp, dec = jpeg_anchor_point(img, q)
            a, b = jnp.asarray(img)[None], jnp.asarray(dec)[None]
            bpps.append(bpp)
            psnrs.append(float(psnr(a, b)))
            ssims.append(float(ssim(a, b)))
            msssims.append(float(ms_ssim(a, b)))
        curve.append(
            {
                "quality": q,
                "bpp": float(np.mean(bpps)),
                "psnr": float(np.mean(psnrs)),
                "ssim": float(np.mean(ssims)),
                "ms_ssim": float(np.mean(msssims)),
            }
        )
    return curve


def lstm_bpp(iters: int) -> float:
    """Legacy LSTM codec bpp law (reference test/draw_rd.py:13)."""
    return iters / 192.0 * 24.0


def plot_rd(
    curves: Dict[str, List[Tuple[float, float]]],
    out_path: str,
    ylabel: str = "MS-SSIM",
    title: str = "R-D comparison",
):
    """curves: name → [(bpp, metric), ...]; writes a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for name, pts in curves.items():
        pts = sorted(pts)
        ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", label=name)
    ax.set_xlabel("bpp")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
