"""Ballé-2017 baseline codec (the reference's canonical ``ImageCompressor``).

Architecture parity (reference model.py:38-80, models/analysis_17.py:8-39,
models/synthesis_17.py:8-31):

  analysis : conv 9×9 s4 p4 (3→N) → GDN → conv 5×5 s2 p2 → GDN →
             conv 5×5 s2 p2 (no bias)                        [÷16 spatial]
  synthesis: deconv 5×5 s2 p2 op1 → IGDN → deconv 5×5 s2 p2 op1 → IGDN →
             deconv 9×9 s4 p4 op3 (N→3)                      [×16 spatial]
  quant    : train x+U(-0.5,0.5), eval round(x)
  rate     : factorized BitEstimator, bits = Σ clip(-log2 ΔC, 0, 50)

Differences by design (not omissions):
- pure-functional forward: ``train`` flag and noise rng are explicit args
  instead of module state; returns a dict, fixing the reference's
  trainer/model return drift (model.py:80 vs train.py:97).
- NHWC layout, bf16-friendly; rate/distortion computed on-device.
- the binarized variant (reference model_new.py / analysis_17_new.py) is the
  same class with ``binarize=True``.
"""

import math
from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn.layers import GDN, BitEstimator, TorchConv, TorchConvTranspose, xavier_normal_gain
from ..ops.entropy import LOG2
from ..ops.quant import add_uniform_noise, binarize_ste, round_ste

_B001 = lambda key, shape: jnp.full(shape, 0.01)


class Analysis17(fnn.Module):
    """3-stage analysis transform (÷16). ``binarize=True`` reproduces
    Analysis_net_17_new (reference models/analysis_17_new.py:8-39):
    sigmoid → STE binarizer, returning (code, pre_binarize)."""

    out_channel_n: int = 128
    binarize: bool = False
    input_block: int = 1   # 4 → expect space_to_depth(x, 4) input (see
                           # ops.conv blocking notes; params unchanged)

    @fnn.compact
    def __call__(self, x):
        n = self.out_channel_n
        g1 = math.sqrt(2 * (3 + n) / 6)
        x = TorchConv(
            n, 9, stride=4, padding=4, input_block=self.input_block,
            weight_init=xavier_normal_gain(g1), bias_init=_B001, name="conv1",
        )(x)
        x = GDN(name="gdn1")(x)
        x = TorchConv(
            n, 5, stride=2, padding=2,
            weight_init=xavier_normal_gain(math.sqrt(2)), bias_init=_B001, name="conv2",
        )(x)
        x = GDN(name="gdn2")(x)
        x = TorchConv(
            n, 5, stride=2, padding=2, use_bias=False,
            weight_init=xavier_normal_gain(math.sqrt(2)), name="conv3",
        )(x)
        if self.binarize:
            pre = jax.nn.sigmoid(x)
            return binarize_ste(pre), pre
        return x


class Synthesis17(fnn.Module):
    """3-stage synthesis transform (×16), mirror of Analysis17."""

    out_channel_n: int = 128
    output_block: int = 1  # 4 → emit space_to_depth-blocked recon (see
                           # ops.conv blocking notes; params unchanged)

    @fnn.compact
    def __call__(self, x):
        n = self.out_channel_n
        sq2 = math.sqrt(2)
        x = TorchConvTranspose(
            n, 5, stride=2, padding=2, output_padding=1,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv1",
        )(x)
        x = GDN(inverse=True, name="igdn1")(x)
        x = TorchConvTranspose(
            n, 5, stride=2, padding=2, output_padding=1,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv2",
        )(x)
        x = GDN(inverse=True, name="igdn2")(x)
        x = TorchConvTranspose(
            3, 9, stride=4, padding=4, output_padding=3,
            output_block=self.output_block,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv3",
        )(x)
        return x


class Balle17Compressor(fnn.Module):
    """End-to-end Ballé-17 codec.

    ``__call__(image, train, rng)`` → dict with:
      recon        : clipped reconstruction in [0, 1]
      latent       : quantized (or noised) latent
      bpp          : estimated bits-per-pixel (factorized prior)
      mse          : mean squared error (unclipped recon, as in reference
                     model.py:61)
    quant: 'noise-round' (reference), 'ste' (round w/ STE in training),
           'binarize' (reference model_new.py — no rate model, code is 1 bpp
           of latent elements).
    """

    out_channel_n: int = 128
    quant: str = "noise-round"
    io_block: int = 1      # 4 → blocked image I/O: __call__ takes
                           # space_to_depth(image, 4) and returns a blocked
                           # recon (depth_to_space at the data layer). Params
                           # identical to the unblocked graph; mse/bpp are
                           # permutation-invariant so the loss is unchanged.

    @fnn.compact
    def __call__(self, image, train: bool = False, rng: Optional[jax.Array] = None):
        n, h, w, _ = image.shape
        if self.quant == "binarize":
            code, pre = Analysis17(
                self.out_channel_n, binarize=True,
                input_block=self.io_block, name="encoder",
            )(image)
            latent = code
        else:
            feature = Analysis17(
                self.out_channel_n, input_block=self.io_block, name="encoder"
            )(image)
            if train and self.quant == "noise-round":
                if rng is None:
                    rng = self.make_rng("quant")
                latent = add_uniform_noise(feature, rng, 0.5)
            elif train and self.quant == "ste":
                latent = round_ste(feature)
            else:
                latent = jnp.round(feature)

        recon = Synthesis17(
            self.out_channel_n, output_block=self.io_block, name="decoder"
        )(latent)
        clipped = jnp.clip(recon, 0.0, 1.0)
        mse = jnp.mean((recon - image) ** 2)

        n_pix = n * h * w * self.io_block * self.io_block
        out = {"recon": clipped, "latent": latent, "mse": mse}
        if self.quant == "binarize":
            out["pre_binarize"] = pre
            out["bpp"] = jnp.float32(latent.size / n_pix)
        else:
            cdf = BitEstimator(self.out_channel_n, name="bit_estimator")
            # rate term in fp32 always: under bf16 storage the CDF difference
            # of two near-equal sigmoids cancels catastrophically (small
            # probabilities flush to 0 → clipped to 50 bits), while the
            # elementwise upcast costs nothing next to the convs
            lat32 = latent.astype(jnp.float32)
            prob = cdf(lat32 + 0.5) - cdf(lat32 - 0.5)
            total_bits = jnp.sum(
                jnp.clip(-jnp.log(prob + 1e-10) / LOG2, 0.0, 50.0)
            )
            out["bpp"] = total_bits / n_pix
        return out
