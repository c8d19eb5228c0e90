"""Two-stage DSC operating point → the multi-rate R-D ladder artifact.

The reference's rate ladder reaches 0.0625 bpp by stacking a residual
rate-regression stage on the frozen 0.031-bpp base (reference
train_reg0.065model.py:125-138; eval NewTests/test_regModel_0_0625.py:98-135)
— this tool evaluates that composite point (eval/reg_stage.py) on the same
24 held-out pairs as tools/rd_experiment_dsc.py, merges it into
``results/rd_points_dsc.json`` and regenerates the R_D_comparison.png analog
plots from EVERYTHING in that file, so the committed curve shows the whole
ladder: SI-assisted single-stage points + the two-stage point + code-only +
SI-only + JPEG.

Usage:
  python tools/rd_experiment_dsc_ladder.py <base_ckpt> <reg_ckpt>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_LEFT = os.environ.get("ICLR17C_DSC_EVAL_LEFT", "/tmp/stereo_eval/left")
EVAL_RIGHT = os.environ.get("ICLR17C_DSC_EVAL_RIGHT", "/tmp/stereo_eval/right")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results"
)
STEM = os.environ.get("ICLR17C_DSC_OUT_STEM", "dsc")


def main(base_ckpt: str, reg_ckpt: str):
    from iclr_17_compression_tpu.data.datasets import StereoPairDataset
    from iclr_17_compression_tpu.eval.reg_stage import eval_reg_stage
    from iclr_17_compression_tpu.eval.rd_plot import plot_rd
    from iclr_17_compression_tpu.models import DSC_PRESETS, DSCStereoModel
    from iclr_17_compression_tpu.utils.cache import enable_compilation_cache
    from tools.rd_experiment_dsc import load_dsc_params

    enable_compilation_cache()
    ds = StereoPairDataset(EVAL_LEFT, EVAL_RIGHT, train=False, multiple=32)
    pairs = [ds[k] for k in range(len(ds))]
    print(f"eval: {len(pairs)} held-out stereo pairs")

    base = DSCStereoModel(DSC_PRESETS["temp_0031bpp"])
    reg = DSCStereoModel(DSC_PRESETS["reg_0_0625"])
    base_params = {"params": load_dsc_params(base, base_ckpt)}
    reg_params = {"params": load_dsc_params(reg, reg_ckpt)}

    res = eval_reg_stage(
        base, base_params, reg, reg_params, pairs,
        msssim_win=base.config.msssim_win,
    )
    pt = {
        "preset": "temp_0031bpp+reg_0_0625",
        "kind": "two_stage",
        "ckpt": f"{base_ckpt} + {reg_ckpt}",
        "bpp_rans": res["bpp_rans"],
        "bpp_gzip": res["bpp_gzip"],
        "bpp_base": res["bpp_base"],
        "bpp_reg": res["bpp_reg"],
        "si_assisted": {
            "psnr": res["psnr"],
            "ms_ssim": res["ms_ssim"],
            "ms_ssim_db": res["ms_ssim_db"],
        },
        "per_image": res["per_image"],
    }
    print(json.dumps({k: v for k, v in pt.items() if k != "per_image"}, indent=1))

    path = os.path.join(OUT_DIR, f"rd_points_{STEM}.json")
    with open(path) as f:
        payload = json.load(f)
    payload["points"] = [
        p for p in payload["points"] if p.get("kind") != "two_stage"
    ] + [pt]
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)

    # regenerate the full-ladder plots from the merged file
    points = payload["points"]
    jpeg = payload["jpeg_anchor"]

    def series(metric_key: str, ms: bool):
        def val(p):
            return p["si_assisted"]["ms_ssim" if ms else "psnr"]

        out = {
            "JPEG (4:2:0)": [
                (p["bpp"], p["ms_ssim" if ms else "psnr"]) for p in jpeg
            ],
            "DSC SI-assisted (rANS)": sorted(
                (p["bpp_rans"], val(p)) for p in points
            ),
        }
        co = sorted(
            (p["bpp_rans"], p["code_only"]["ms_ssim" if ms else "psnr"])
            for p in points if "code_only" in p
        )
        if co:
            out["DSC code-only (same rate)"] = co
        si = [
            (0.0, p["si_only_0bpp"]["ms_ssim" if ms else "psnr"])
            for p in points if "si_only_0bpp" in p
        ]
        if si:
            out["SI-only (0 bpp)"] = si
        return out

    plot_rd(
        series("psnr", ms=False),
        os.path.join(OUT_DIR, f"rd_plot_{STEM}_psnr.png"),
        ylabel="PSNR (dB)",
        title="DSC stereo codec rate ladder (TPU framework) vs JPEG",
    )
    plot_rd(
        series("ms_ssim", ms=True),
        os.path.join(OUT_DIR, f"rd_plot_{STEM}_msssim.png"),
        ylabel="MS-SSIM",
        title="DSC stereo codec rate ladder (TPU framework) vs JPEG",
    )
    print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
