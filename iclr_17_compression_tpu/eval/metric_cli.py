"""Metric CLI — PSNR / MS-SSIM between two image folders.

Parity with the reference CLI (reference metric.py:16-22,221-229):

  python -m iclr_17_compression_tpu.eval.metric_cli -m ssim -o ORIG -c CMP
  python -m iclr_17_compression_tpu.eval.metric_cli -m psnr -o ORIG -c CMP

Unlike the reference (CPU fftconvolve per image), metrics run batched
on-device via ops.metrics.
"""

import argparse
import os
import sys

import numpy as np


def _load_pairs(orig_dir: str, cmp_dir: str):
    from ..data.datasets import _list_images, _load

    o = _list_images(orig_dir) if os.path.isdir(orig_dir) else [orig_dir]
    c = _list_images(cmp_dir) if os.path.isdir(cmp_dir) else [cmp_dir]
    if len(o) != len(c):
        raise SystemExit(f"count mismatch: {len(o)} vs {len(c)}")
    for po, pc in zip(o, c):
        yield po, pc, _load(po), _load(pc)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--metric", default="ssim", choices=["ssim", "psnr", "both"])
    ap.add_argument("-o", "--original", required=True)
    ap.add_argument("-c", "--compared", required=True)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..ops.metrics import ms_ssim, psnr

    rows = []
    for po, pc, a, b in _load_pairs(args.original, args.compared):
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        a, b = a[:h, :w][None], b[:h, :w][None]
        vals = {}
        if args.metric in ("ssim", "both"):
            vals["ms_ssim"] = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
        if args.metric in ("psnr", "both"):
            vals["psnr"] = float(psnr(jnp.asarray(a), jnp.asarray(b)))
        rows.append(vals)
        print(os.path.basename(po), " ".join(f"{k}={v:.6f}" for k, v in vals.items()))

    for k in rows[0]:
        print(f"mean_{k}={np.mean([r[k] for r in rows]):.6f}")


if __name__ == "__main__":
    main()
