"""Train state + jittable train steps for every model family.

Replaces the reference's 10 trainer scripts' inner loops with three pure
``(state, batch, rng) -> (state, metrics)`` functions, each compiled once by
``jax.jit`` with sharding-annotated inputs (data-parallel over the mesh
'data' axis — the TPU-native replacement for DataParallel at reference
train.py:227-228; gradient all-reduce becomes an XLA ICI collective).

Optimizer parity: Adam(lr schedule) + per-element gradient clamp ±5
(reference train.py:106-111) via ``optax.clip``.
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

from ..models.balle17 import Balle17Compressor
from ..models.dsc import DSCStereoModel
from ..models.hyperprior import ScaleHyperprior


class TrainState(flax_train_state.TrainState):
    pass


def _make_optimizer(
    lr: Callable[[int], float] | float, grad_clip: float = 5.0
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip(grad_clip),  # elementwise clamp, torch .clamp_(-c, c) parity
        optax.adam(lr),
    )


def create_train_state(
    model,
    rng: jax.Array,
    example_args: tuple,
    lr: Callable[[int], float] | float = 1e-4,
    grad_clip: float = 5.0,
) -> TrainState:
    params = model.init({"params": rng, "quant": rng}, *example_args, train=True)[
        "params"
    ]
    tx = _make_optimizer(lr, grad_clip)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx
    )


# ---------------------------------------------------------------------------
# Ballé-17: rd_loss = λ·mse + bpp  (reference train.py:100-102).
# distortion='msssim' swaps the distortion term for 1−MS-SSIM (the
# reference's MS-SSIM-trained operating points; loss form as in
# train_reg0.065model.py:125-138 which optimizes 1−ms_ssim).
# ---------------------------------------------------------------------------

def make_balle17_train_step(train_lambda: float = 8192.0, distortion: str = "mse"):
    if distortion not in ("mse", "msssim"):
        # a DSC loss string ('l1') or typo ('ms_ssim') must not silently
        # train the whole run as MSE
        raise ValueError(
            f"balle17 distortion must be 'mse' or 'msssim', got {distortion!r}"
        )

    def train_step(state: TrainState, batch: jax.Array, rng: jax.Array):
        def loss_fn(params):
            out = state.apply_fn(
                {"params": params}, batch, train=True, rngs={"quant": rng}
            )
            if distortion == "msssim":
                from ..ops.metrics import ms_ssim

                # window 11 needs ≥ 176 px for 5 scales; small crops use the
                # reference's small-image window 7 (SURVEY §6 eval constants)
                win = 11 if min(batch.shape[1:3]) >= 176 else 7
                d = 1.0 - ms_ssim(out["recon"], batch, win_size=win)
            else:
                d = out["mse"]
            rd_loss = train_lambda * d + out["bpp"]
            return rd_loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "rd_loss": loss,
            "mse": out["mse"],
            "bpp": out["bpp"],
            "psnr": 10.0 * jnp.log10(1.0 / jnp.maximum(out["mse"], 1e-10)),
        }
        return state, metrics

    return train_step


# ---------------------------------------------------------------------------
# DSC family: loss = loss_full + loss_base (+ w_z·loss_z)
#   train_2StepsNet.py:190  → mse_1 + mse_2 (= loss_base + loss_full here)
#   train_new.py:177        → + 0.5·mse_z
# ---------------------------------------------------------------------------

def make_dsc_train_step(w_full: float = 1.0, w_base: float = 1.0, w_z: float = 0.0):
    def train_step(state: TrainState, im1: jax.Array, im2: jax.Array, rng: jax.Array):
        def loss_fn(params):
            out = state.apply_fn(
                {"params": params}, im1, im2, train=True, rngs={"quant": rng}
            )
            loss = w_full * out["loss_full"] + w_base * out["loss"]
            if w_z:
                loss = loss + w_z * out["loss_z"]
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": loss,
            "loss_full": out["loss_full"],
            "loss_base": out["loss"],
            "loss_z": out["loss_z"],
        }
        return state, metrics

    return train_step


# ---------------------------------------------------------------------------
# Scale hyperprior: rd_loss = λ·mse + bpp_y + bpp_z
# ---------------------------------------------------------------------------

def make_hyperprior_train_step(train_lambda: float = 8192.0):
    def train_step(state: TrainState, batch: jax.Array, rng: jax.Array):
        def loss_fn(params):
            out = state.apply_fn(
                {"params": params}, batch, train=True, rngs={"quant": rng}
            )
            rd_loss = train_lambda * out["mse"] + out["bpp"]
            return rd_loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "rd_loss": loss,
            "mse": out["mse"],
            "bpp": out["bpp"],
            "bpp_y": out["bpp_y"],
            "bpp_z": out["bpp_z"],
        }
        return state, metrics

    return train_step


def build_model(name: str, **kw):
    """Model factory: 'balle17' | 'hyperprior' | 'joint' | 'dsc:<preset>'."""
    if name == "balle17":
        return Balle17Compressor(
            out_channel_n=kw.get("out_channel_n", 128),
            quant=kw.get("quant", "noise-round"),
        )
    if name == "hyperprior":
        return ScaleHyperprior(
            out_channel_n=kw.get("out_channel_n", 192),
            out_channel_m=kw.get("out_channel_m", 320),
            quant=kw.get("quant", "round"),
        )
    if name == "joint":
        from ..models.cheng2020 import JointAutoregressive

        return JointAutoregressive(n=kw.get("n", 192))
    if name.startswith("dsc:"):
        from ..models.dsc import DSC_PRESETS
        import dataclasses

        cfg = DSC_PRESETS[name.split(":", 1)[1]]
        if kw.get("loss"):
            cfg = dataclasses.replace(cfg, loss=kw["loss"])
        return DSCStereoModel(cfg)
    raise ValueError(f"unknown model {name!r}")
