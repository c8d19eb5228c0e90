"""Secondary experimental models from the reference tree.

- ``ImageCompressorFC``: Ballé-17 with an FC bottleneck on the flattened
  latent (reference model_fc.py:38-86 — Linear(16384,16384) at N=64 on
  64×64 latents of 256² inputs; here sized from the runtime latent shape).
  Note the reference applies NO noise in training (model_fc.py:53-55).
- ``LatentCompressor``: the "compress z in two steps" experiment
  (reference model_small.py:45-87): conv stack downsamples z1 to 32ch,
  fusion stack reconstructs z1 from cat(z1, z2); returns (recon_z, z1, mse).
- ``AnalysisSmall`` / ``SynthesisSmall``: latent-of-latent codec with FC
  bottleneck 4096→2048→1024 (reference models/analysis_small.py:13-45,
  models/synthesis_small.py:8-54).

The reference's ``ImageCompressor_new`` (binarized, model_new.py) and
``ImageCompressor_twoSteps`` (model_twoSteps.py, a rename of ImageCompressor)
are covered by ``Balle17Compressor(quant='binarize')`` / the base class.
"""

import math
from typing import Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn.layers import GDN, BitEstimator, TorchConv, TorchConvTranspose, xavier_normal_gain
from ..ops.entropy import LOG2
from ..ops.precision import get_precision as _PREC_GET

_PREC = lambda: _PREC_GET(None)
from .balle17 import Analysis17, Synthesis17

_B001 = lambda key, shape: jnp.full(shape, 0.01)


class ImageCompressorFC(fnn.Module):
    out_channel_n: int = 64

    @fnn.compact
    def __call__(self, image, train: bool = False, rng: Optional[jax.Array] = None):
        n_img, h, w, _ = image.shape
        feature = Analysis17(self.out_channel_n, name="encoder")(image)
        latent = feature if train else jnp.round(feature)

        flat = latent.reshape(n_img, -1)
        dim = flat.shape[-1]
        fc = fnn.Dense(dim, name="fc", precision=_PREC())(flat)
        recon = Synthesis17(self.out_channel_n, name="decoder")(
            fc.reshape(latent.shape)
        )
        clipped = jnp.clip(recon, 0.0, 1.0)
        mse = jnp.mean((recon - image) ** 2)

        cdf = BitEstimator(self.out_channel_n, name="bit_estimator")
        prob = cdf(latent + 0.5) - cdf(latent - 0.5)
        bits = jnp.sum(jnp.clip(-jnp.log(prob + 1e-10) / LOG2, 0.0, 50.0))
        return {
            "recon": clipped,
            "latent": latent,
            "mse": mse,
            "bpp": bits / (n_img * h * w),
        }


class LatentCompressor(fnn.Module):
    """Stage-2 latent fusion net over frozen Ballé-17 latents
    (z1: to-compress, z2: side info; both (N,h,w,128))."""

    @fnn.compact
    def __call__(self, z1, z2):
        def conv_relu(x, feat, k, p, name):
            x = TorchConv(feat, k, stride=1, padding=p, name=name)(x)
            return jax.nn.relu(x)

        # conv_down_zx: 128→64→64→32→32 (reference model_small.py:54-58)
        d = conv_relu(z1, 64, 3, 1, "down1")
        d = conv_relu(d, 64, 1, 0, "down2")
        d = conv_relu(d, 32, 3, 1, "down3")
        z1_down = conv_relu(d, 32, 1, 0, "down4")

        # fc_combine_zx_zy: conv 7/7/3/3/3 over cat(z1, z2)
        # (reference model_small.py:61-65; no activations in that Sequential)
        cat = jnp.concatenate([z1, z2], axis=-1)
        x = TorchConv(256, 7, padding=3, name="comb1")(cat)
        x = TorchConv(256, 7, padding=3, name="comb2")(x)
        x = TorchConv(128, 3, padding=1, name="comb3")(x)
        x = TorchConv(128, 3, padding=1, name="comb4")(x)
        recon_z = TorchConv(128, 3, padding=1, name="comb5")(x)

        mse = jnp.mean((recon_z - z1) ** 2)
        return {"recon_z": recon_z, "z1_down": z1_down, "mse": mse}


class AnalysisSmall(fnn.Module):
    """1024-ch latent encoder + FC head → 1024-dim code."""

    out_channel_n: int = 512
    out_channel_m: int = 16

    @fnn.compact
    def __call__(self, x):
        n, m = self.out_channel_n, self.out_channel_m
        x = TorchConv(
            n, 3, padding=1,
            weight_init=xavier_normal_gain(math.sqrt(2 * (3 + n) / 6)),
            bias_init=_B001, name="conv1",
        )(x)
        x = GDN(name="gdn1")(x)
        x = TorchConv(
            n, 1, padding=0,
            weight_init=xavier_normal_gain(math.sqrt(2)), bias_init=_B001, name="conv2",
        )(x)
        x = GDN(name="gdn2")(x)
        x = TorchConv(
            n, 3, padding=1,
            weight_init=xavier_normal_gain(math.sqrt(2)), bias_init=_B001, name="conv3",
        )(x)
        x = GDN(name="gdn3")(x)
        x = TorchConv(
            m, 1, padding=0,
            weight_init=xavier_normal_gain(math.sqrt(2 * (m + n) / (n + n))),
            bias_init=_B001, name="conv4",
        )(x)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(fnn.Dense(2048, name="fc1", precision=_PREC())(x))
        return fnn.Dense(1024, name="fc2", precision=_PREC())(x)


class SynthesisSmall(fnn.Module):
    """Mirror decoder: FC 1024→2048→4096 → deconv stack → 1024-ch latent."""

    out_channel_n: int = 512
    out_channel_m: int = 16

    @fnn.compact
    def __call__(self, code):
        n, m = self.out_channel_n, self.out_channel_m
        x = jax.nn.relu(fnn.Dense(2048, name="fc1", precision=_PREC())(code))
        x = jax.nn.relu(fnn.Dense(4096, name="fc2", precision=_PREC())(x))
        x = x.reshape(x.shape[0], 16, 16, 16)
        sq2 = math.sqrt(2)
        x = TorchConvTranspose(
            n, 1, stride=1, padding=0,
            weight_init=xavier_normal_gain(math.sqrt(2 * (m + n) / (m + m))),
            bias_init=_B001, name="deconv1",
        )(x)
        x = GDN(inverse=True, name="igdn1")(x)
        x = TorchConvTranspose(
            n, 3, stride=1, padding=1,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv2",
        )(x)
        x = GDN(inverse=True, name="igdn2")(x)
        x = TorchConvTranspose(
            n, 1, stride=1, padding=0,
            weight_init=xavier_normal_gain(sq2), bias_init=_B001, name="deconv3",
        )(x)
        x = GDN(inverse=True, name="igdn3")(x)
        x = TorchConvTranspose(
            1024, 3, stride=1, padding=1,
            weight_init=xavier_normal_gain(math.sqrt(2 * (n + 3) / (n + n))),
            bias_init=_B001, name="deconv4",
        )(x)
        return x
