"""Learned distributed-source-coding (DSC) stereo codec family.

One configurable model covering the reference's 15 near-duplicate
``Cheng2020Attention*`` files (reference models/temp.py, temp_1bpp.py,
temp_016bpp.py, high_bit_rate_model.py, classic_DSC_model.py,
model_temp_DSC.py, temp_allRes.py, temp_reg_0_0625.py,
temp_smaller_spatial_dim.py, original_att.py, …). Each variant differs only
in (a) the channel/stride layout of five conv stacks and (b) a handful of
forward-pass switches; here both are data (``DSCConfig``) instead of copied
files. ``DSC_PRESETS`` reproduces each reference variant exactly — layer for
layer, noise width for noise width.

Pipeline (reference models/temp.py:232-318):

  z1 = g_a(x)            # image X (to be compressed),  ÷16 latent
  z2 = g_a(y)            # side-info image Y (decoder-only), shared weights
                         # (or separate g_a_y per classic_DSC/model_temp_DSC)
  code = clamp(Q_coarse(g_a22(z1)), ±128)     # THE transmitted representation
  ẑ1   = g_s22(code)
  fused = g_z1hat_z2(cat(ẑ1, z2))             # decoder-side fusion with SI
  x̂    = g_s(fused)
  plus an optional auxiliary autoencoder branch (x̂₁ = g_s(Q(z1)), ŷ₂ = g_s(Q(z2)))
  regularizing g_a/g_s, and an optional residual refinement net on cat(x̂, y).

Rate is architectural: the code tensor is (H/32 × W/32 × C_code) values on a
17-level grid (step 16, clamp ±128) → e.g. C_code=8 ⇒ 0.031 bpp nominal; the
real bitstream comes from coding/ (rANS over the code bytes; the reference
gzip'd them, NewTests/test_new_model_reconAndSimilarity.py:152-155).
"""

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn.blocks import (
    AttentionBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
)
from ..nn.layers import TorchConv
from ..ops.metrics import ms_ssim
from ..ops.quant import add_uniform_noise

# ---------------------------------------------------------------------------
# Stack specs: tiny layer DSL. Each entry is (kind, features[, arg]).
#   rb      ResidualBlock(out)
#   rbs     ResidualBlockWithStride(out, stride=arg or 2)
#   rbu     ResidualBlockUpsample(out, r=arg or 2)
#   att     AttentionBlock(ch)
#   att7    AttentionBlock_7 (7×7 GELU residual units,
#           reference models/layers_GELU.py:231-282)
#   conv3   3x3 conv (stride=arg or 1)
#   conv7   7x7 conv (stride=arg or 1)
#   subpel  SubpelConv(out, r=arg)
# ---------------------------------------------------------------------------

Spec = Tuple


class _Stack(fnn.Module):
    specs: Tuple[Spec, ...]
    act: str = "leaky_relu"

    @fnn.compact
    def __call__(self, x):
        for i, spec in enumerate(self.specs):
            kind, feat = spec[0], spec[1]
            arg = spec[2] if len(spec) > 2 else None
            name = f"l{i}_{kind}"
            if kind == "rb":
                x = ResidualBlock(feat, act=self.act, name=name)(x)
            elif kind == "rbs":
                x = ResidualBlockWithStride(feat, stride=arg or 2, act=self.act, name=name)(x)
            elif kind == "rbu":
                x = ResidualBlockUpsample(feat, upsample=arg or 2, act=self.act, name=name)(x)
            elif kind == "att":
                x = AttentionBlock(feat, name=name)(x)
            elif kind == "att7":
                x = AttentionBlock(
                    feat, unit_act="gelu", unit_kernel=7, name=name
                )(x)
            elif kind == "conv3":
                x = TorchConv(feat, 3, stride=arg or 1, padding=1, name=name)(x)
            elif kind == "conv7":
                x = TorchConv(feat, 7, stride=arg or 1, padding=3, name=name)(x)
            elif kind == "subpel":
                x = SubpelConv(feat, arg or 2, name=name)(x)
            else:
                raise ValueError(f"unknown spec kind {kind!r}")
        return x


def _ga_specs(n: int, extra_stride: bool = False) -> Tuple[Spec, ...]:
    """Cheng-2020 analysis stack (reference models/temp.py:135-147;
    extra_stride=True is the ÷32 variant, temp_smaller_spatial_dim.py:53-64)."""
    if extra_stride:
        return (
            ("rb", 3), ("rbs", n, 2), ("rb", n), ("rbs", n, 2), ("att", n),
            ("rbs", n, 2), ("rb", n), ("rbs", n, 2), ("rb", n),
            ("conv3", n, 2), ("att", n),
        )
    return (
        ("rb", 3), ("rbs", n, 2), ("rb", n), ("rbs", n, 2), ("att", n),
        ("rb", n), ("rbs", n, 2), ("rb", n), ("conv3", n, 2), ("att", n),
    )


def _gs_specs(n: int, extra_up: bool = False) -> Tuple[Spec, ...]:
    """Cheng-2020 synthesis stack (reference models/temp.py:149-162)."""
    if extra_up:
        return (
            ("att", n), ("rb", n), ("rbu", n, 2), ("rb", n), ("rbu", n, 2),
            ("att", n), ("rbu", n, 2), ("rb", n), ("rbu", n, 2), ("rb", n),
            ("subpel", 3, 2),
        )
    return (
        ("att", n), ("rb", n), ("rbu", n, 2), ("rb", n), ("rbu", n, 2),
        ("att", n), ("rb", n), ("rbu", n, 2), ("rb", n), ("subpel", 3, 2),
    )


def _gz_specs(n: int, cat_factor: int = 2) -> Tuple[Spec, ...]:
    """Fusion net g_z1hat_z2 (reference models/temp.py:195-202; 3N input for
    the addZyDown variant, temp_allRes.py:184-190)."""
    c = cat_factor * n
    return (("att", c), ("rb", c), ("rb", n), ("att", n), ("rb", n))


_GREC_SPECS = (("att", 6), ("rb", 3), ("rb", 3), ("att", 3), ("rb", 3))


@dataclass(frozen=True)
class DSCConfig:
    """Full specification of one DSC variant."""

    name: str
    n: int = 128                       # base channels
    code_channels: int = 8             # channels of the transmitted code
    ga: Tuple[Spec, ...] = ()
    gs: Tuple[Spec, ...] = ()
    ga22: Tuple[Spec, ...] = ()
    gs22: Tuple[Spec, ...] = ()
    gz: Tuple[Spec, ...] = ()
    shared_encoder: bool = True        # False → separate g_a_y for the SI image
    base_branch: bool = True           # aux autoencoder branch on z1/z2
    fine_noise: float = 8.0            # train noise half-width for z1/z2
    coarse_noise: float = 8.0          # train noise half-width for the code
    coarse_step: float = 16.0          # eval quant step for the code
    code_clip: Optional[float] = 128.0 # clamp after quantization (None = off)
    fusion: str = "cat2"               # 'cat2' | 'cat3' (addZyDown)
    gz2: Tuple[Spec, ...] = ()         # second fusion branch, summed with gz
                                       # (freq-separation, test_freqSepNet.py:157)
    fusion_pre: str = "none"           # 'none' | 'fif' — FIF on z_cat before gz
                                       # (temp_and_FIF.py:163-166)
    fusion_post: str = "none"          # 'none' | 'bot_att' (temp_att_0_03bpp.py:171-175)
                                       # | 'patch_att' (temp_bottleneck_Att.py:129-133)
                                       # | 'pam' (temp_and_PAM.py:252-254)
    si_mode: str = "use"               # 'use' | 'zero_si' | 'zero_code'
    loss: str = "msssim"               # 'l1' | 'msssim' | 'mse'
    msssim_win: int = 7
    z_target_coarse: bool = True       # L1 z-loss target round(z1/16)*16 vs z1
    recon_residual: bool = False       # refine x̂ with g_rec1_im2_new(cat(x̂, y))
    latent_div: int = 16               # spatial ÷ of z1/z2
    code_div: int = 32                 # spatial ÷ of the code


def _fuse_and_synthesize(cfg, g_s, z1_hat, z2, z2_hat, im2, train):
    """SI fusion + synthesis — the decoder-side tail shared by the full model
    and DSCDecoder. Must be called inside a compact scope, exactly once per
    apply; submodule names match the reference's attribute names so imported
    checkpoints address them directly.

    Returns (fused, recon_raw); clipping is the caller's business (the
    residual-stage trainer needs the unclipped recon, temp_reg_0_0625.py:109).
    """
    # --- fusion with side information (reference models/temp.py:262-292) ---
    if cfg.fusion == "cat3":
        z_cat = jnp.concatenate([z1_hat, z2_hat, z2], axis=-1)
    else:
        si = jnp.zeros_like(z2) if cfg.si_mode == "zero_si" else z2
        zc = jnp.zeros_like(z1_hat) if cfg.si_mode == "zero_code" else z1_hat
        z_cat = jnp.concatenate([zc, si], axis=-1)

    if cfg.fusion_pre == "fif":
        from .enhance import FIF

        z_cat = FIF(features=2 * cfg.n, name="fif")(z_cat, train=train)

    fused = _Stack(cfg.gz, name="g_z1hat_z2")(z_cat)
    if cfg.gz2:
        fused = fused + _Stack(cfg.gz2, name="g_z1hat_z2_freq2")(z_cat)

    if cfg.fusion_post == "bot_att":
        from .attention import bottleneck_attention

        att = bottleneck_attention(fused, z2)
        fused = _Stack(
            ((("att", 2 * cfg.n), ("rb", cfg.n))), name="final_conv"
        )(jnp.concatenate([fused, att], axis=-1))
    elif cfg.fusion_post == "patch_att":
        from .attention import PatchMatchAttention

        att = PatchMatchAttention(dim=cfg.n, name="bot_mhsa")(fused, z2)
        # patch grid (9×9 tiles) may undershoot the latent size; pad back
        # (the reference would shape-error here, temp_bottleneck_Att.py:133)
        ph = fused.shape[1] - att.shape[1]
        pw = fused.shape[2] - att.shape[2]
        att = jnp.pad(att, ((0, 0), (0, ph), (0, pw), (0, 0)))
        fused = _Stack(
            ((("att", 2 * cfg.n), ("rb", 2 * cfg.n), ("rb", cfg.n))),
            name="final_conv",
        )(jnp.concatenate([fused, att], axis=-1))
    elif cfg.fusion_post == "pam":
        from .passr import PAM

        fused = PAM(cfg.n, name="pam")(fused, z2, train=False)

    recon = g_s(fused)
    if cfg.recon_residual:
        g_rec = _Stack(_GREC_SPECS, name="g_rec1_im2_new")
        recon = recon + g_rec(jnp.concatenate([recon, im2], axis=-1))
    return fused, recon


class DSCStereoModel(fnn.Module):
    """Two-branch DSC codec; behavior fully determined by ``config``.

    ``__call__(im1, im2, train, rng, mask_channels)`` → dict:
      recon      : final SI-assisted reconstruction of im1, clipped [0,1]
      code       : quantized+clamped transmitted representation
      z1, z2     : encoder latents
      z1_hat     : g_s22(code)
      fused      : g_z1hat_z2 output (z1_hat_hat)
      im1_hat/im2_hat : aux-branch recons (if base_branch)
      loss, loss_full, loss_z : per reference loss triplet
    ``mask_channels``: optional bool mask (code_channels,) zeroing code
    channels pre-quantization (reference temp_016bpp.py:91,113-116).
    """

    config: DSCConfig

    @fnn.compact
    def __call__(
        self,
        im1,
        im2,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        mask_channels: Optional[jax.Array] = None,
    ):
        cfg = self.config
        if train and rng is None:
            rng = self.make_rng("quant")
        rngs = jax.random.split(rng, 3) if train else [None] * 3

        g_a = _Stack(cfg.ga, name="g_a")
        g_a_y = g_a if cfg.shared_encoder else _Stack(cfg.ga, name="g_a_y")
        g_s = _Stack(cfg.gs, name="g_s")
        g_a22 = _Stack(cfg.ga22, name="g_a22")
        g_s22 = _Stack(cfg.gs22, name="g_s22")

        z1 = g_a(im1)
        z2 = g_a_y(im2)

        out = {"z1": z1, "z2": z2}

        # --- coarse path: the transmitted code --------------------------------
        code_pre = g_a22(z1)
        if mask_channels is not None:
            code_pre = code_pre * (1.0 - mask_channels.astype(code_pre.dtype))
        if train:
            code = add_uniform_noise(code_pre, rngs[0], cfg.coarse_noise)
        else:
            code = jnp.round(code_pre / cfg.coarse_step) * cfg.coarse_step
        if cfg.code_clip is not None:
            code = jnp.clip(code, -cfg.code_clip, cfg.code_clip)
        out["code"] = code

        z1_hat = g_s22(code)
        out["z1_hat"] = z1_hat

        z2_hat = g_s22(g_a22(z2)) if cfg.fusion == "cat3" else None
        fused, recon = _fuse_and_synthesize(
            cfg, g_s, z1_hat, z2, z2_hat, im2, train=train
        )
        out["fused"] = fused
        clipped = jnp.clip(recon, 0.0, 1.0)
        out["recon_raw"] = recon  # unclipped — the residual-stage trainer adds
        # this onto a frozen base recon (reference temp_reg_0_0625.py:109-112)
        out["recon"] = clipped

        # --- auxiliary base branch -------------------------------------------
        if cfg.base_branch:
            if train:
                cz1 = add_uniform_noise(z1, rngs[1], cfg.fine_noise)
                cz2 = add_uniform_noise(z2, rngs[2], cfg.fine_noise)
            else:
                cz1, cz2 = jnp.round(z1), jnp.round(z2)
            im1_hat = g_s(cz1)
            im2_hat = g_s(cz2)
            out["im1_hat"] = jnp.clip(im1_hat, 0.0, 1.0)
            out["im2_hat"] = jnp.clip(im2_hat, 0.0, 1.0)

        # --- losses (reference models/temp.py:294-313) ------------------------
        if cfg.loss == "l1":
            z_target = (
                jnp.round(z1 / cfg.coarse_step) * cfg.coarse_step
                if cfg.z_target_coarse
                else z1
            )
            loss_z = jnp.mean(jnp.abs(fused - z_target))
            loss_full = jnp.mean(jnp.abs(clipped - im1))
            if cfg.base_branch:
                loss_base = 0.5 * jnp.mean(jnp.abs(out["im1_hat"] - im1)) + 0.5 * jnp.mean(
                    jnp.abs(out["im2_hat"] - im2)
                )
            else:
                loss_base = jnp.float32(0.0)
        elif cfg.loss == "msssim":
            ms_full = ms_ssim(clipped, im1, win_size=cfg.msssim_win)
            loss_full = 1.0 - ms_full
            if cfg.base_branch:
                ms2 = ms_ssim(out["im2_hat"], im2, win_size=cfg.msssim_win)
                loss_base = 1.0 - 0.5 * (ms_full + ms2)
            else:
                loss_base = loss_full
            # reference parity: the MS-SSIM branch hardcodes mse_on_z = 1
            # (models/temp.py:308; it never contributes to the DSC loss)
            loss_z = jnp.float32(1.0)
        else:  # mse
            loss_z = jnp.mean((fused - z1) ** 2)
            loss_full = jnp.mean((clipped - im1) ** 2)
            if cfg.base_branch:
                loss_base = 0.5 * jnp.mean((out["im1_hat"] - im1) ** 2) + 0.5 * jnp.mean(
                    (out["im2_hat"] - im2) ** 2
                )
            else:
                loss_base = jnp.float32(0.0)

        out["loss"] = loss_base
        out["loss_full"] = loss_full
        out["loss_z"] = loss_z
        return out


class DSCDecoder(fnn.Module):
    """Decode-only subgraph: (code, side_info_image) → reconstruction.

    Parameter names match DSCStereoModel exactly, so the FULL model's trained
    params tree applies directly (extra subtrees — g_a22, the base branch —
    are simply unused). This is what a real DSC receiver runs: it never sees
    im1, only the transmitted code plus its own camera's image.

    ``clip=False`` returns the raw synthesis output — required when the
    decoded image is a residual added onto a frozen base reconstruction
    (the reg_0_0625 stage, reference NewTests/test_regModel_0_0625.py:105-115).
    """

    config: DSCConfig
    clip: bool = True

    @fnn.compact
    def __call__(self, code, im2):
        cfg = self.config
        g_a = _Stack(cfg.ga, name="g_a" if cfg.shared_encoder else "g_a_y")
        z2 = g_a(im2)
        g_s22 = _Stack(cfg.gs22, name="g_s22")
        z1_hat = g_s22(code)
        z2_hat = (
            g_s22(_Stack(cfg.ga22, name="g_a22")(z2))
            if cfg.fusion == "cat3"
            else None
        )
        g_s = _Stack(cfg.gs, name="g_s")
        _, recon = _fuse_and_synthesize(
            cfg, g_s, z1_hat, z2, z2_hat, im2, train=False
        )
        return jnp.clip(recon, 0.0, 1.0) if self.clip else recon


# ---------------------------------------------------------------------------
# Presets — one per reference variant file.
# ---------------------------------------------------------------------------

def _preset(name: str, **kw) -> DSCConfig:
    n = kw.pop("n", 128)
    cc = kw.pop("code_channels", 8)
    defaults = dict(
        ga=_ga_specs(n),
        gs=_gs_specs(n),
        gz=_gz_specs(n),
    )
    defaults.update(kw)
    return DSCConfig(name=name, n=n, code_channels=cc, **defaults)


# g_a22/g_s22 shapes per variant (cited file:lines in each preset)
_GA22_TEMP = (
    ("conv3", 64, 1), ("rb", 64), ("rbs", 64, 2), ("att", 64),
    ("conv3", 32, 1), ("rb", 32), ("conv3", 8, 1), ("att", 8),
)
_GS22_TEMP = (
    ("att", 8), ("conv3", 32, 1), ("rb", 32), ("conv3", 64, 1),
    ("rb", 64), ("rbu", 128, 2), ("rb", 128),
)


def _ga22_wide(c: int) -> Tuple[Spec, ...]:
    # temp_1bpp.py:81-89 (c=32) / temp_016bpp.py:63-71 (c=41)
    return (
        ("conv3", 64, 1), ("rb", 64), ("rbs", 64, 2), ("att", 64),
        ("rb", c), ("rb", c), ("att", c),
    )


def _gs22_wide(c: int, n: int) -> Tuple[Spec, ...]:
    # temp_1bpp.py:91-98 / temp_016bpp.py:73-80
    return (("att", c), ("rb", c), ("rb", 64), ("rb", 64), ("rbu", n, 2), ("rb", n))


DSC_PRESETS = {
    # models/temp.py — flagship 0.031 bpp model
    "temp_0031bpp": _preset(
        "temp_0031bpp",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="msssim",
    ),
    # models/temp_1bpp.py — 0.125 bpp variant (32-ch code)
    "temp_1bpp": _preset(
        "temp_1bpp", code_channels=32,
        ga22=_ga22_wide(32), gs22=_gs22_wide(32, 128),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_016bpp.py — 41-ch code + channel-mask ablation hook.
    # NOTE: the reference file at HEAD has the SI-ablation cat active
    # (temp_016bpp.py:129 uses zeros for z2); we default to 'use' and expose
    # si_mode for the ablation.
    "temp_016bpp": _preset(
        "temp_016bpp", code_channels=41,
        ga22=_ga22_wide(41), gs22=_gs22_wide(41, 128),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_016bpp.py @ reference HEAD — the SI-ablation state of the
    # file (temp_016bpp.py:129 concatenates zeros for z2). Checkpoints saved
    # from reference HEAD import into THIS preset with no caller-side
    # si_mode override; 'temp_016bpp' above is the pre-ablation behavior.
    "temp_016bpp_si_ablation": _preset(
        "temp_016bpp_si_ablation", code_channels=41,
        ga22=_ga22_wide(41), gs22=_gs22_wide(41, 128),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        si_mode="zero_si",
        loss="l1",
    ),
    # models/high_bit_rate_model.py — 32-ch code, fine quant (step 1)
    "high_bit_rate": _preset(
        "high_bit_rate", code_channels=32,
        ga22=(
            ("att", 128), ("rbs", 128, 2), ("rb", 64), ("att", 64),
            ("rb", 32), ("att", 32),
        ),
        gs22=(
            ("att", 32), ("rb", 64), ("att", 64), ("rb", 128),
            ("rbu", 128, 2), ("att", 128),
        ),
        fine_noise=0.5, coarse_noise=0.5, coarse_step=1.0,
        loss="l1", z_target_coarse=False,
    ),
    # models/classic_DSC_model.py — separate X/Y encoders, all-residual 22-nets
    "classic_dsc": _preset(
        "classic_dsc",
        ga22=(
            ("rb", 64), ("rb", 64), ("rbs", 64, 2), ("att", 64),
            ("rb", 32), ("rb", 32), ("rb", 8), ("att", 8),
        ),
        gs22=(
            ("att", 8), ("rb", 32), ("rb", 32), ("rb", 64), ("rb", 64),
            ("rbu", 128, 2), ("rb", 128),
        ),
        shared_encoder=False, base_branch=False,
        fine_noise=0.5, coarse_noise=0.5, coarse_step=1.0, code_clip=None,
        loss="l1", z_target_coarse=False,
    ),
    # models/model_temp_DSC.py — separate SI encoder, no base branch
    "temp_dsc": _preset(
        "temp_dsc",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        shared_encoder=False, base_branch=False,
        fine_noise=0.5, coarse_noise=0.5, coarse_step=1.0,
        loss="l1", z_target_coarse=False,
    ),
    # models/temp_allRes.py — decoder-side symmetric degradation (cat3)
    "add_zy_down": _preset(
        "add_zy_down",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP, gz=_gz_specs(128, 3),
        fusion="cat3",
        fine_noise=0.5, coarse_noise=0.5, coarse_step=1.0,
        loss="l1", z_target_coarse=False,
    ),
    # models/temp_reg_0_0625.py — residual rate-regression stage
    "reg_0_0625": _preset(
        "reg_0_0625",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        base_branch=False,
        coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_highBitRate.py (Cheng2020Attention_highBitRate2) — 16-ch code
    "high_bit_rate2": _preset(
        "high_bit_rate2", code_channels=16,
        ga22=(
            ("conv3", 64, 1), ("rb", 64), ("rbs", 64, 2), ("att", 64),
            ("conv3", 32, 1), ("rb", 32), ("conv3", 16, 1), ("att", 16),
        ),
        gs22=(
            ("att", 16), ("conv3", 32, 1), ("rb", 32), ("conv3", 64, 1),
            ("rb", 64), ("rbu", 128, 2), ("rb", 128),
        ),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_att_0_03bpp.py — + bottleneck cross-attention after fusion
    "att_0031bpp": _preset(
        "att_0031bpp",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        fusion_post="bot_att",
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_bottleneck_Att.py — 1bpp net + patch-match attention fusion
    "bottleneck_att_1bpp": _preset(
        "bottleneck_att_1bpp", code_channels=32,
        ga22=_ga22_wide(32), gs22=_gs22_wide(32, 128),
        fusion_post="patch_att",
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_and_FIF.py — FIF dilated-conv net on z_cat before fusion
    "fif_0031bpp": _preset(
        "fif_0031bpp",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        fusion_pre="fif",
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_and_PAM.py — parallax attention after fusion
    "pam_0031bpp": _preset(
        "pam_0031bpp",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        fusion_post="pam",
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/modelTemp_largerGz.py — expanded fusion with AttentionBlock_7
    "larger_gz": _preset(
        "larger_gz",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        gz=(
            ("att7", 256), ("att", 256), ("rb", 256), ("rb", 128),
            ("att7", 128), ("att", 128), ("rb", 128),
        ),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/test_freqSepNet.py — two parallel fusion nets summed
    "freq_sep": _preset(
        "freq_sep",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        gz2=(
            ("att7", 256), ("conv7", 256, 1), ("rb", 128),
            ("att7", 128), ("rb", 128),
        ),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/original_att.py — the pre-DSC single-branch file kept alongside
    # temp.py; architecturally the temp preset (same stacks, L1 default)
    "original_att": _preset(
        "original_att",
        ga22=_GA22_TEMP, gs22=_GS22_TEMP,
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
    # models/temp_smaller_spatial_dim.py — N=360, ÷32 latent
    "smaller_z": _preset(
        "smaller_z", n=360,
        ga=_ga_specs(360, extra_stride=True), gs=_gs_specs(360, extra_up=True),
        gz=_gz_specs(360),
        ga22=(
            ("conv3", 64, 1), ("rb", 64), ("att", 64), ("rb", 32),
            ("rb", 32), ("rb", 8), ("att", 8),
        ),
        gs22=(
            ("att", 8), ("rb", 32), ("rb", 32), ("rb", 64), ("rb", 64),
            ("att", 64), ("rb", 360), ("rb", 360),
        ),
        fine_noise=0.5, coarse_noise=0.5, coarse_step=1.0,
        loss="l1", z_target_coarse=False,
        latent_div=32, code_div=32,
    ),
    # development preset (not a reference variant): the temp_0031bpp topology
    # at 1/8 width so the full train_dsc CLI path runs on a CPU test mesh in
    # seconds.
    "tiny": _preset(
        "tiny", n=16, code_channels=2,
        ga22=(("conv3", 8, 1), ("rbs", 8, 2), ("conv3", 2, 1)),
        gs22=(("conv3", 8, 1), ("rbu", 16, 2), ("rb", 16)),
        fine_noise=8.0, coarse_noise=8.0, coarse_step=16.0,
        loss="mse",
    ),
    # development counterpart of reg_0_0625 (residual stage: no base branch)
    "tiny_reg": _preset(
        "tiny_reg", n=16, code_channels=2,
        ga22=(("conv3", 8, 1), ("rbs", 8, 2), ("conv3", 2, 1)),
        gs22=(("conv3", 8, 1), ("rbu", 16, 2), ("rb", 16)),
        base_branch=False,
        coarse_noise=8.0, coarse_step=16.0,
        loss="l1",
    ),
}
