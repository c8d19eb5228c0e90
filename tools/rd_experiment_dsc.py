"""DSC stereo R-D operating point — the reference's headline artifact.

Evaluates a trained DSC checkpoint (train CLI ``dsc:<preset>`` runs) on the
24 held-out synthetic stereo pairs and produces the three-way comparison the
reference publishes as R_D_comparison.png (reference
NewTests/test_new_model_reconAndSimilarity.py:98-159 protocol; curves at
/root/reference/R_D_comparison.png):

  SI-assisted   : the DSC claim — decode the tiny code WITH the other
                  camera's image (reference models/temp.py:232-318)
  code-only     : same code, SI zeroed (the cat ablation,
                  reference NewTests/testAblationNetwork.py:112-114) —
                  what the code alone buys at the SAME rate
  SI-only       : model(im2, im2) at 0 bits for X (reference
                  NewTests/testAblationNetwork.py:112-114 SI-only dump) —
                  what the decoder camera alone buys
  JPEG anchor   : PIL 4:2:0 sweep on the identical target images

Rates are REAL rANS container payload bytes (coding.codec_cli
serialize_dsc_code), with the reference's gzip proxy alongside.

Outputs: results/rd_points_dsc.json, results/rd_plot_dsc_psnr.png,
results/rd_plot_dsc_msssim.png.

Usage: python tools/rd_experiment_dsc.py <ckpt> [preset] [<ckpt2> [preset2] ...]
  ckpt: a train-CLI TrainState checkpoint (best_train.ckpt / latest.ckpt)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EVAL_LEFT = os.environ.get("ICLR17C_DSC_EVAL_LEFT", "/tmp/stereo_eval/left")
EVAL_RIGHT = os.environ.get("ICLR17C_DSC_EVAL_RIGHT", "/tmp/stereo_eval/right")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results")
# Output basename: rd_points_<STEM>.json / rd_plot_<STEM>_{psnr,msssim}.png.
# Override (e.g. STEM=dsc_domain2) for the second-domain generalization eval
# so it lands beside, not over, the primary eval (R_D_HoloPix.png analog).
STEM = os.environ.get("ICLR17C_DSC_OUT_STEM", "dsc")


def load_dsc_params(model, ckpt: str):
    """Extract the params subtree from a rich TrainState checkpoint."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 64, 64, 3))
    template = model.init({"params": rng, "quant": rng}, z, z, train=False)["params"]
    with open(ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    sub = raw.get("params", raw)  # TrainState dict or bare params
    return serialization.from_state_dict(template, sub)


def main(argv):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from iclr_17_compression_tpu.data.datasets import StereoPairDataset
    from iclr_17_compression_tpu.eval.rd_plot import jpeg_anchor_curve, plot_rd
    from iclr_17_compression_tpu.eval.stereo import eval_stereo_dsc
    from iclr_17_compression_tpu.models import DSC_PRESETS, DSCStereoModel
    from iclr_17_compression_tpu.ops.metrics import ms_ssim, ms_ssim_db
    from iclr_17_compression_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    runs = []
    i = 0
    while i < len(argv):
        ckpt = argv[i]
        i += 1
        preset = "temp_0031bpp"
        # an arg is a preset iff it names one — paths (with or without a
        # .ckpt suffix) are never swallowed as presets
        if i < len(argv) and argv[i] in DSC_PRESETS and not os.path.exists(argv[i]):
            preset = argv[i]
            i += 1
        runs.append((ckpt, preset))

    ds = StereoPairDataset(EVAL_LEFT, EVAL_RIGHT, train=False, multiple=32)
    pairs = [ds[k] for k in range(len(ds))]
    print(f"eval: {len(pairs)} held-out stereo pairs")

    points = []
    for ckpt, preset in runs:
        cfg = DSC_PRESETS[preset]
        model = DSCStereoModel(cfg)
        params = {"params": load_dsc_params(model, ckpt)}

        res = eval_stereo_dsc(model, params, pairs, msssim_win=cfg.msssim_win)

        # code-only: identical code (same bitstream → same rate), SI zeroed
        co_model = DSCStereoModel(dataclasses.replace(cfg, si_mode="zero_si"))

        @jax.jit
        def co_forward(im1, im2):
            out = co_model.apply(params, im1, im2, train=False)
            return out["recon"], jnp.mean((out["recon"] - im1) ** 2)

        # SI-only: encode the SI image itself through the X path — the
        # reconstruction the receiver gets from its own camera, zero bits
        @jax.jit
        def si_forward(im1, im2):
            out = model.apply(params, im2, im2, train=False)
            return out["recon"], jnp.mean((out["recon"] - im1) ** 2)

        co_psnr = co_ms = co_msdb = 0.0
        si_psnr = si_ms = si_msdb = 0.0
        for a, b in pairs:
            im1, im2 = jnp.asarray(a)[None], jnp.asarray(b)[None]
            recon, mse = co_forward(im1, im2)
            co_psnr += 10.0 * np.log10(1.0 / max(float(mse), 1e-12))
            ms = float(ms_ssim(recon, im1, win_size=cfg.msssim_win))
            co_ms += ms
            co_msdb += float(ms_ssim_db(jnp.float32(ms)))
            srecon, smse = si_forward(im1, im2)
            si_psnr += 10.0 * np.log10(1.0 / max(float(smse), 1e-12))
            sms = float(ms_ssim(srecon, im1, win_size=cfg.msssim_win))
            si_ms += sms
            si_msdb += float(ms_ssim_db(jnp.float32(sms)))
        n = len(pairs)

        pt = {
            "preset": preset,
            "ckpt": ckpt,
            "bpp_rans": res["bpp_rans"],
            "bpp_gzip": res["bpp_gzip"],
            "si_assisted": {
                "psnr": res["psnr"],
                "ms_ssim": res["ms_ssim"],
                "ms_ssim_db": res["ms_ssim_db"],
            },
            "code_only": {
                "psnr": co_psnr / n,
                "ms_ssim": co_ms / n,
                "ms_ssim_db": co_msdb / n,
            },
            "si_only_0bpp": {
                "psnr": si_psnr / n,
                "ms_ssim": si_ms / n,
                "ms_ssim_db": si_msdb / n,
            },
            "per_image": res["per_image"],
        }
        points.append(pt)
        print(json.dumps({k: v for k, v in pt.items() if k != "per_image"}, indent=1))

    jpeg = jpeg_anchor_curve([a for a, _ in pairs], qualities=range(5, 101, 5))

    os.makedirs(OUT_DIR, exist_ok=True)
    payload = {
        "eval_pairs": len(pairs),
        "points": points,
        "jpeg_anchor": jpeg,
        "notes": (
            "Flagship DSC stereo codec trained from scratch by this "
            "framework's CLI on synthetic disparity-shifted stereo pairs "
            "(tools/make_offline_data.py); eval on 24 held-out pairs built "
            "only from eval-side content. Rates are real rANS container "
            "payload bytes; code-only zeroes the SI latent at the identical "
            "rate (the DSC claim is the SI-assisted vs code-only gap)."
        ),
    }
    with open(os.path.join(OUT_DIR, f"rd_points_{STEM}.json"), "w") as f:
        json.dump(payload, f, indent=2)

    si_pts = [(p["bpp_rans"], p["si_assisted"]["psnr"]) for p in points]
    co_pts = [(p["bpp_rans"], p["code_only"]["psnr"]) for p in points]
    plot_rd(
        {
            "JPEG (4:2:0)": [(p["bpp"], p["psnr"]) for p in jpeg],
            "DSC SI-assisted (rANS)": si_pts,
            "DSC code-only (same rate)": co_pts,
            "SI-only (0 bpp)": [(0.0, p["si_only_0bpp"]["psnr"]) for p in points],
        },
        os.path.join(OUT_DIR, f"rd_plot_{STEM}_psnr.png"),
        ylabel="PSNR (dB)",
        title="DSC stereo codec (TPU framework) — SI gain vs JPEG",
    )
    plot_rd(
        {
            "JPEG (4:2:0)": [(p["bpp"], p["ms_ssim"]) for p in jpeg],
            "DSC SI-assisted (rANS)": [(p["bpp_rans"], p["si_assisted"]["ms_ssim"]) for p in points],
            "DSC code-only (same rate)": [(p["bpp_rans"], p["code_only"]["ms_ssim"]) for p in points],
            "SI-only (0 bpp)": [(0.0, p["si_only_0bpp"]["ms_ssim"]) for p in points],
        },
        os.path.join(OUT_DIR, f"rd_plot_{STEM}_msssim.png"),
        ylabel="MS-SSIM",
        title="DSC stereo codec (TPU framework) — SI gain vs JPEG",
    )
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main(sys.argv[1:])
