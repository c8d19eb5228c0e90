"""Stage-2 / auxiliary trainers — the reference's seven special-purpose
training scripts as config-dispatched functions.

Each reproduces one reference driver's loop shape (SURVEY.md §2.7): epoch
loop, per-epoch mean loss, ReduceLROnPlateau, best-loss + periodic
checkpoints (train_2StepsNet.py:201-256 conventions). Frozen sub-models are
closed over as constants inside the jitted step — XLA constant-folds them;
no stop_gradient bookkeeping is needed because grads are only taken w.r.t.
the trainable state's params.

  two_steps    — frozen Ballé-17 + LatentCompressor on latent pairs
                 (reference train_twoSteps.py:100-135)
  reg_stage    — frozen 0.031-bpp DSC + residual rate-regression stage,
                 MS-SSIM on the summed recon (train_reg0.065model.py:100-145)
  decoder_only — frozen encoder, fresh decoder, shared quant noise
                 (train_decoder_new.py:80-115)
  att_exp      — PatchMatchAttention on raw images, L1(im1, att(im1, im2))
                 (train_Att_EXP.py:100-140)
  att_block    — frozen DSC latents + PatchMatchAttention(q=z1, k=z2,
                 v=image2) reconstructing im1 (train_only_att_block.py:118-147)
  passr        — PASSRnet with SR+smooth+cycle+photometric losses
                 (train_PASSRnet.py:110-140)
  fif_enhance  — FinalEnhanceNet residual over cat(recon, warped SI)
                 (fast_image_filters/train_FIF_enhance.py:85-115)
"""

import logging
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import (
    FIFEnhanceDataset,
    StereoKittiDataset,
    StereoPairDataset,
    StereoPassrDataset,
    batch_iterator,
)
from ..ops.metrics import ms_ssim
from .checkpoint import save_train_state
from .config import TrainConfig
from .schedules import ReduceLROnPlateau
from .state import TrainState

logger = logging.getLogger("iclr17c")


def _injectable_optimizer(base_lr: float, grad_clip: float) -> optax.GradientTransformation:
    """clip + Adam with the LR exposed as an opt-state hyperparameter, so a
    host-side plateau scheduler can change it BETWEEN jitted steps (a plain
    schedule closure would be baked in as a trace-time constant).

    The LR is committed to jnp.float32 at init so the FIRST set_lr call
    doesn't change the opt-state tree signature (a Python-float hyperparam
    leaf becomes an array on replacement → full train-step retrace; cost a
    7-minute remote recompile mid-run in round 4)."""
    return optax.chain(
        optax.clip(grad_clip),
        optax.inject_hyperparams(optax.adam)(
            learning_rate=jnp.asarray(base_lr, jnp.float32)
        ),
    )


def set_lr(state: TrainState, lr: float) -> TrainState:
    """New state with the injected learning rate replaced."""
    clip_state, inj = state.opt_state
    hp = dict(inj.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=(clip_state, inj._replace(hyperparams=hp)))


def _run_epochs(
    cfg: TrainConfig,
    name: str,
    dataset,
    state: TrainState,
    step_fn: Callable,
    rng: jax.Array,
    save_every: int = 10,
):
    """Reference epoch-loop shape: mean epoch loss → plateau LR → best-loss
    and periodic full-state checkpoints."""
    save_dir = os.path.join(cfg.save_root, name)
    os.makedirs(save_dir, exist_ok=True)
    plateau = ReduceLROnPlateau(base_lr=cfg.lr_base, patience=cfg.plateau_patience)

    best_loss = float("inf")
    lr = cfg.lr_base
    global_step = 0
    for epoch in range(cfg.tot_epoch):
        epoch_loss, n_batches = 0.0, 0
        for batch in batch_iterator(dataset, cfg.batch_size, seed=cfg.seed, epoch=epoch):
            step_rng = jax.random.fold_in(rng, global_step)
            state, metrics = step_fn(state, batch, step_rng)
            global_step += 1
            epoch_loss += float(metrics["loss"])
            n_batches += 1
            if global_step % cfg.print_freq == 0:
                logger.info(
                    "epoch %d step %d | %s",
                    epoch, global_step,
                    " ".join(f"{k}={float(v):.5f}" for k, v in metrics.items()),
                )
            if global_step >= cfg.tot_step:
                break
        epoch_loss /= max(n_batches, 1)
        new_lr = plateau.step(epoch_loss)
        if new_lr != lr:
            lr = new_lr
            state = set_lr(state, lr)
        if epoch_loss < best_loss:
            best_loss = epoch_loss
            save_train_state(state, save_dir, "best_train", epoch, epoch_loss)
        # periodic checkpoints are written regardless of improvement — the
        # reference keeps both (train_2StepsNet.py:201-220)
        if epoch % save_every == 0:
            save_train_state(state, save_dir, f"epoch_{epoch}", epoch, epoch_loss)
        logger.info("epoch %d done: loss=%.5f lr=%.2e", epoch, epoch_loss, lr)
        if global_step >= cfg.tot_step:
            break
    return state


def _state_with_lr(model, rng, example_args, cfg, **init_kw) -> TrainState:
    variables = model.init({"params": rng, "quant": rng}, *example_args, **init_kw)
    params = variables["params"] if "params" in variables else variables
    tx = _injectable_optimizer(cfg.lr_base, cfg.grad_clip)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _load_frozen(model, rng, example_args, pretrain: str, **init_kw):
    """Init a frozen model; load a checkpoint over it when given.

    Accepts either a bare-params checkpoint (save_params) or a full
    TrainState checkpoint (save_train_state — e.g. the flagship's
    best_train.ckpt that the reg stage freezes), extracting the params
    subtree from the latter."""
    from flax import serialization

    variables = model.init({"params": rng, "quant": rng}, *example_args, **init_kw)
    params = variables["params"] if "params" in variables else variables
    if pretrain:
        with open(pretrain, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        sub = raw.get("params", raw) if isinstance(raw, dict) else raw
        params = serialization.from_state_dict(params, sub)
        logger.info("loaded frozen pretrain %s", pretrain)
    return params


def _kitti(cfg: TrainConfig, multiple: int = 32):
    """Stereo source for the aux trainers. Historically KITTI-layout only
    (the reference hardcodes KITTI in each trainer script); now honors
    ``cfg.dataset == "pairs"`` like the main DSC loop so the same left/right
    corpus that trained the flagship can drive the aux stages (e.g. the
    residual reg stage trains on top of the frozen flagship checkpoint and
    must see the same data distribution)."""
    if cfg.dataset == "pairs":
        left, right = cfg.train_dir.split(",")
        crop = (cfg.image_size // multiple) * multiple
        return StereoPairDataset(
            left, right, crop=(crop, crop), multiple=multiple, seed=cfg.seed
        )
    return StereoKittiDataset(
        cfg.train_dir.split(","), train=True, seed=cfg.seed, multiple=multiple
    )


# ---------------------------------------------------------------------------


def train_two_steps(cfg: TrainConfig, name: str, pretrain: str = ""):
    """Frozen Ballé-17 produces latents; LatentCompressor learns to compress
    z1 given z2 (reference train_twoSteps.py:118-132: loss = its latent MSE).
    ``pretrain`` points at the frozen Ballé-17 checkpoint."""
    from ..models import Balle17Compressor, LatentCompressor

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 16) * 16
    base = Balle17Compressor(out_channel_n=cfg.out_channel_n)
    ex = jnp.zeros((1, hw, hw, 3))
    base_params = _load_frozen(base, rng, (ex,), pretrain, train=False)

    comp = LatentCompressor()
    zex = jnp.zeros((1, hw // 16, hw // 16, cfg.out_channel_n))
    state = _state_with_lr(comp, rng, (zex, zex), cfg)

    @jax.jit
    def step_fn(state, batch, rng):
        im1, im2 = jnp.asarray(batch[0]), jnp.asarray(batch[1])
        z1 = base.apply({"params": base_params}, im1, train=False)["latent"]
        z2 = base.apply({"params": base_params}, im2, train=False)["latent"]

        def loss_fn(params):
            out = state.apply_fn({"params": params}, z1, z2)
            return out["mse"], out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return _run_epochs(cfg, name, _kitti(cfg, multiple=16), state, step_fn, rng)


def train_reg_stage(cfg: TrainConfig, name: str, pretrain: str = ""):
    """Frozen 0.031-bpp DSC base + trainable residual stage; loss is
    1 − MS-SSIM of (base recon + residual) (train_reg0.065model.py:125-138).
    ``pretrain``: the frozen base checkpoint."""
    from ..models import DSC_PRESETS, DSCStereoModel

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 32) * 32
    ex = (jnp.zeros((1, hw, hw, 3)), jnp.zeros((1, hw, hw, 3)))

    base = DSCStereoModel(DSC_PRESETS["temp_0031bpp"])
    base_params = _load_frozen(base, rng, ex, pretrain, train=False)

    reg = DSCStereoModel(DSC_PRESETS["reg_0_0625"])
    state = _state_with_lr(reg, rng, ex, cfg, train=False)

    @jax.jit
    def step_fn(state, batch, rng):
        im1, im2 = jnp.asarray(batch[0]), jnp.asarray(batch[1])
        base_recon = base.apply({"params": base_params}, im1, im2, train=False)["recon"]

        def loss_fn(params):
            out = state.apply_fn(
                {"params": params}, im1, im2, train=True, rngs={"quant": rng}
            )
            final = base_recon + out["recon_raw"]
            loss = 1.0 - ms_ssim(jnp.clip(final, 0.0, 1.0), im1)
            return loss, out

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return _run_epochs(cfg, name, _kitti(cfg), state, step_fn, rng)


def train_decoder_only(cfg: TrainConfig, name: str, pretrain: str = ""):
    """Frozen Analysis17 encoder (from a Ballé-17 checkpoint), fresh
    Synthesis17 decoder; both eyes share one quantization-noise draw
    (train_decoder_new.py:98-110)."""
    from ..models import Analysis17, Balle17Compressor, Synthesis17

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 16) * 16
    ex = jnp.zeros((1, hw, hw, 3))
    base = Balle17Compressor(out_channel_n=cfg.out_channel_n)
    base_params = _load_frozen(base, rng, (ex,), pretrain, train=False)
    enc_params = base_params["encoder"]

    enc = Analysis17(cfg.out_channel_n)
    dec = Synthesis17(cfg.out_channel_n)
    zex = jnp.zeros((1, hw // 16, hw // 16, cfg.out_channel_n))
    state = _state_with_lr(dec, rng, (zex,), cfg)

    @jax.jit
    def step_fn(state, batch, rng):
        im1, im2 = jnp.asarray(batch[0]), jnp.asarray(batch[1])
        z1 = enc.apply({"params": enc_params}, im1)
        z2 = enc.apply({"params": enc_params}, im2)
        noise = jax.random.uniform(rng, z1.shape, z1.dtype, -0.5, 0.5)

        def loss_fn(params):
            r1 = jnp.clip(state.apply_fn({"params": params}, z1 + noise), 0.0, 1.0)
            r2 = jnp.clip(state.apply_fn({"params": params}, z2 + noise), 0.0, 1.0)
            return jnp.mean((r1 - im1) ** 2) + jnp.mean((r2 - im2) ** 2), None

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return _run_epochs(cfg, name, _kitti(cfg, multiple=16), state, step_fn, rng)


def train_att_exp(cfg: TrainConfig, name: str, pretrain: str = ""):
    """PatchMatchAttention directly on raw stereo images: learn im1 from im2
    (train_Att_EXP.py:125-130; L1 loss)."""
    from ..models import PatchMatchAttention

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 32) * 32
    ex = jnp.zeros((1, hw, hw, 3))
    model = PatchMatchAttention(dim=3, dim_head=128)
    state = _state_with_lr(model, rng, (ex, ex), cfg)

    @jax.jit
    def step_fn(state, batch, rng):
        im1, im2 = jnp.asarray(batch[0]), jnp.asarray(batch[1])

        def loss_fn(params):
            out = state.apply_fn({"params": params}, im1, im2)
            tgt = im1[:, : out.shape[1], : out.shape[2]]  # patch grid may undershoot
            return jnp.mean(jnp.abs(tgt - out)), None

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return _run_epochs(cfg, name, _kitti(cfg), state, step_fn, rng)


def train_att_block(cfg: TrainConfig, name: str, pretrain: str = ""):
    """Frozen DSC 1-bpp encoder supplies (z1, z2); PatchMatchAttention with
    q=z1, k=z2, v=the raw SI image reconstructs im1 at image resolution
    (train_only_att_block.py:136-143). ``pretrain``: frozen DSC checkpoint."""
    from ..models import DSC_PRESETS, DSCStereoModel, PatchMatchAttention

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 32) * 32
    ex = (jnp.zeros((1, hw, hw, 3)), jnp.zeros((1, hw, hw, 3)))
    base = DSCStereoModel(DSC_PRESETS["temp_1bpp"])
    base_params = _load_frozen(base, rng, ex, pretrain, train=False)

    att = PatchMatchAttention(dim=128, dim_head=1024)
    zex = jnp.zeros((1, hw // 16, hw // 16, 128))
    state = _state_with_lr(att, rng, (zex, zex, ex[0]), cfg)

    @jax.jit
    def step_fn(state, batch, rng):
        im1, im2 = jnp.asarray(batch[0]), jnp.asarray(batch[1])
        out = base.apply({"params": base_params}, im1, im2, train=False)
        z1, z2 = out["z1"], out["z2"]

        def loss_fn(params):
            rec = state.apply_fn({"params": params}, z1, z2, im2)
            tgt = im1[:, : rec.shape[1], : rec.shape[2]]
            return jnp.mean(jnp.abs(tgt - rec)), None

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return _run_epochs(cfg, name, _kitti(cfg), state, step_fn, rng)


def train_passr(cfg: TrainConfig, name: str, pretrain: str = ""):
    """PASSRnet stereo SR: SR MSE + attention smoothness + cycle +
    photometric losses (train_PASSRnet.py:110-140)."""
    from ..models import PASSRnet, passr_losses

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 32) * 32
    model = PASSRnet(upscale_factor=1)
    ex = (jnp.zeros((1, hw, hw, 3)), jnp.zeros((1, hw, hw, 3)))
    state = _state_with_lr(model, rng, ex, cfg, train=True)

    dataset = StereoPassrDataset(
        cfg.train_dir.split(","), train=True, crop=(hw, hw), seed=cfg.seed
    )

    @jax.jit
    def step_fn(state, batch, rng):
        blurry, right, left = (jnp.asarray(b) for b in batch)

        def loss_fn(params):
            sr, ms, cycles, vs = state.apply_fn(
                {"params": params}, blurry, right, train=True
            )
            losses = passr_losses(sr, left, ms, cycles, vs, blurry, right)
            return losses["loss"], losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), losses

    return _run_epochs(cfg, name, dataset, state, step_fn, rng)


def train_fif_enhance(cfg: TrainConfig, name: str, pretrain: str = ""):
    """FinalEnhanceNet: residual over cat(reconstruction, warped SI), L1 to
    the original (fast_image_filters/train_FIF_enhance.py:99-112).
    ``cfg.train_dir``: the reconstructed-images folder of the triplet set."""
    from ..models import FinalEnhanceNet

    rng = jax.random.PRNGKey(cfg.seed)
    hw = (cfg.image_size // 32) * 32
    model = FinalEnhanceNet()
    ex = jnp.zeros((1, hw, hw, 6))
    state = _state_with_lr(model, rng, (ex,), cfg)

    dataset = FIFEnhanceDataset(cfg.train_dir, random_crop=True, crop=(hw, hw), seed=cfg.seed)

    @jax.jit
    def step_fn(state, batch, rng):
        im_si, im_rec, im_orig = (jnp.asarray(b) for b in batch)

        def loss_fn(params):
            res = state.apply_fn(
                {"params": params}, jnp.concatenate([im_rec, im_si], axis=-1)
            )
            return jnp.mean(jnp.abs(im_rec + res - im_orig)), None

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return _run_epochs(cfg, name, dataset, state, step_fn, rng)


TRAINERS = {
    "two_steps": train_two_steps,
    "reg_stage": train_reg_stage,
    "decoder_only": train_decoder_only,
    "att_exp": train_att_exp,
    "att_block": train_att_block,
    "passr": train_passr,
    "fif_enhance": train_fif_enhance,
}
