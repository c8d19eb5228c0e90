"""First trained R-D operating points vs the JPEG anchor (round-3 task #3).

Trains nothing itself — consumes the checkpoints produced by the training
CLI (tools/README_RD.md documents the exact runs) and produces:

  results/rd_points.json   (bpp, PSNR, MS-SSIM) per λ, measured with the
                           REAL rANS coder (eval_kodak use_rans=True), plus
                           the JPEG anchor sweep on the SAME eval images
  results/rd_plot_psnr.png / rd_plot_msssim.png

Eval set: offline sandbox stand-in for Kodak — the right halves of the only
three real photos shipped with the baked-in python stack (sklearn's
china/flower, matplotlib's grace_hopper); training saw only the left
halves + synthetic 1/f textures. Same-scene halves correlate with training
slightly, but the JPEG anchor runs on the identical images, so the
codec-vs-JPEG comparison is apples-to-apples.

Usage: python tools/rd_experiment.py <ckpt_dir1> [<ckpt_dir2> ...]
  each ckpt_dir: a training CLI save dir (checkpoints/<name>) whose config
  is read from its train.log name convention lam<lambda>.
"""

import json
import os
import sys

os.environ.setdefault("ICLR17C_PRECISION", "default")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

def _default_eval_dir():
    """Prefer the 24-image protocol set (round-4: matches the reference
    testKodak shape — 24 per-image rows, reference train.py:157-198); fall
    back to the 3-image round-3 set."""
    for d in ("/tmp/rd_data/eval24", "/tmp/rd_data/eval"):
        if os.path.isdir(d):
            return d
    return "/tmp/rd_data/eval24"


EVAL_DIR = os.environ.get("ICLR17C_RD_EVAL_DIR") or _default_eval_dir()
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results")


def latest_ckpt(d: str) -> str:
    cands = [f for f in os.listdir(d) if f.startswith("iter_") and f.endswith(".ckpt")]
    if not cands:
        raise FileNotFoundError(f"no iter_*.ckpt under {d}")
    return os.path.join(d, max(cands, key=lambda f: int(f.split("_")[1].split(".")[0])))


def main(ckpt_dirs):
    from iclr_17_compression_tpu.data.datasets import KodakDataset
    from iclr_17_compression_tpu.eval.kodak import eval_kodak
    from iclr_17_compression_tpu.eval.rd_plot import jpeg_anchor_curve, plot_rd
    from iclr_17_compression_tpu.models import Balle17Compressor
    from iclr_17_compression_tpu.train.checkpoint import load_params
    from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    images = list(KodakDataset(EVAL_DIR, multiple=16))
    print(f"eval set: {len(images)} images", [im.shape for im in images])

    model = Balle17Compressor(out_channel_n=128)
    rng = jax.random.PRNGKey(0)
    template = model.init(
        {"params": rng, "quant": rng}, jnp.zeros((1, 64, 64, 3)), train=False
    )

    ours = []
    for d in ckpt_dirs:
        name = os.path.basename(os.path.normpath(d))
        ck = latest_ckpt(d)
        # training-CLI iter_*.ckpt files hold the bare params subtree
        params = {"params": load_params(template["params"], ck)}
        est = eval_kodak(model, params, images, use_rans=False)
        res = eval_kodak(model, params, images, use_rans=True)
        # label rows with the SAME file list the dataset iterates (recursive
        # walk + image-extension filter) — a raw listdir would misalign every
        # row after any stray non-image file
        from iclr_17_compression_tpu.data.datasets import _list_images

        files = [os.path.basename(p) for p in _list_images(EVAL_DIR)]
        pt = {
            "name": name,
            "dir": d,
            "ckpt": os.path.basename(ck),
            "bpp_estimated": est["bpp"],
            "bpp_rans": res["bpp"],
            "psnr": res["psnr"],
            "ms_ssim": res["ms_ssim"],
            "ms_ssim_db": res["ms_ssim_db"],
            # per-image rows, reference testKodak protocol shape
            # (train.py:157-198 prints every image before the mean)
            "per_image": [
                dict(row, image=f) for f, row in zip(files, res["per_image"])
            ],
        }
        ours.append(pt)
        print(json.dumps({k: v for k, v in pt.items() if k != "per_image"}), flush=True)

    jpeg = jpeg_anchor_curve(images, qualities=range(5, 101, 5))

    os.makedirs(OUT_DIR, exist_ok=True)
    payload = {
        "eval_images": sorted(os.listdir(EVAL_DIR)),
        "trained_points": ours,
        "jpeg_anchor": jpeg,
        "notes": (
            "Balle-17 (N=128) trained from scratch by the framework CLI on "
            "the offline photo halves + synthetic textures; rates are real "
            "rANS streams (eval_kodak use_rans=True). JPEG anchor on the "
            "identical eval images (PIL 4:2:0)."
        ),
    }
    with open(os.path.join(OUT_DIR, "rd_points.json"), "w") as f:
        json.dump(payload, f, indent=2)

    # MS-SSIM-distortion-trained runs get their own series — they trade PSNR
    # for MS-SSIM by construction, so folding them into the MSE-trained
    # curve would kink it. The loss type is read from the run dir's
    # config.json snapshot (written by the training CLI); the dir-name
    # convention msssim<lambda> is only the fallback for pre-snapshot runs
    # (round-4 advisor finding).
    def _is_msssim_run(p):
        cfg_path = os.path.join(p["dir"], "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                return json.load(f).get("loss") == "msssim"
        return p["name"].startswith("msssim")

    mse_pts = [p for p in ours if not _is_msssim_run(p)]
    ms_pts = [p for p in ours if _is_msssim_run(p)]

    def _series(metric):
        out = {"JPEG (4:2:0)": [(p["bpp"], p[metric]) for p in jpeg]}
        if mse_pts:
            out["ours Ballé-17 MSE-opt (rANS)"] = [
                (p["bpp_rans"], p[metric]) for p in mse_pts
            ]
        if ms_pts:
            out["ours Ballé-17 MS-SSIM-opt (rANS)"] = [
                (p["bpp_rans"], p[metric]) for p in ms_pts
            ]
        return out

    plot_rd(
        _series("psnr"),
        os.path.join(OUT_DIR, "rd_plot_psnr.png"),
        ylabel="PSNR (dB)",
        title="Ballé-17 (TPU framework) vs JPEG — offline eval set",
    )
    plot_rd(
        _series("ms_ssim"),
        os.path.join(OUT_DIR, "rd_plot_msssim.png"),
        ylabel="MS-SSIM",
        title="Ballé-17 (TPU framework) vs JPEG — offline eval set",
    )
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main(sys.argv[1:])
