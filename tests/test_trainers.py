"""The seven auxiliary trainers (train/trainers.py) — two-step smoke runs on
tiny synthetic data, matching the reference's special-purpose scripts
(SURVEY.md §2.7)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from iclr_17_compression_tpu.train.config import TrainConfig
from iclr_17_compression_tpu.train import trainers


def _mk_images(d, n, h, w, rng):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"f_{i}_10.png"))


@pytest.fixture
def kitti_root(tmp_path, rng):
    for cam in ("image_2", "image_3"):
        _mk_images(str(tmp_path / "kitti" / cam), 2, 96, 96, rng)
    return str(tmp_path / "kitti")


def _cfg(kitti_root, **kw):
    base = dict(
        tot_epoch=1,
        tot_step=2,
        batch_size=1,
        print_freq=1,
        lr_base=1e-4,
        image_size=64,
        train_dir=kitti_root,
        seed=7,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(autouse=True)
def _workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # trainers write ./checkpoints/<name>


def _assert_ckpt(name):
    d = os.path.join("checkpoints", name)
    assert any(f.startswith("best_train") for f in os.listdir(d))


def test_two_steps(kitti_root):
    state = trainers.train_two_steps(_cfg(kitti_root), "ts")
    assert int(state.step) == 2
    _assert_ckpt("ts")


@pytest.mark.slow
def test_reg_stage(kitti_root):
    state = trainers.train_reg_stage(_cfg(kitti_root), "reg")
    assert int(state.step) == 2
    _assert_ckpt("reg")


@pytest.mark.slow
def test_decoder_only(kitti_root):
    state = trainers.train_decoder_only(_cfg(kitti_root), "dec")
    assert int(state.step) == 2
    _assert_ckpt("dec")


@pytest.mark.slow
def test_att_exp(kitti_root):
    state = trainers.train_att_exp(_cfg(kitti_root), "attexp")
    assert int(state.step) == 2
    _assert_ckpt("attexp")


@pytest.mark.slow
def test_att_block(tmp_path, rng):
    # latent patch grid needs >= 9x9 latent pixels -> >= 144px images
    root = str(tmp_path / "kitti_big")
    for cam in ("image_2", "image_3"):
        _mk_images(os.path.join(root, cam), 2, 170, 170, rng)
    state = trainers.train_att_block(_cfg(root, image_size=160), "attblk")
    assert int(state.step) == 2
    _assert_ckpt("attblk")


def test_passr(kitti_root):
    state = trainers.train_passr(_cfg(kitti_root), "passr")
    assert int(state.step) == 2
    _assert_ckpt("passr")


def test_fif_enhance(tmp_path, rng):
    for sub in ("reconstructed", "original", "SI_warped"):
        _mk_images(str(tmp_path / "trip" / sub), 2, 96, 96, rng)
    cfg = _cfg(str(tmp_path / "trip" / "reconstructed"))
    state = trainers.train_fif_enhance(cfg, "fif")
    assert int(state.step) == 2
    _assert_ckpt("fif")


def test_set_lr_takes_effect_in_compiled_step(kitti_root):
    """The plateau LR must reach the already-jitted step (the torch-parity
    ReduceLROnPlateau contract, reference train_2StepsNet.py:113)."""
    import jax
    import optax

    from iclr_17_compression_tpu.train.state import TrainState

    tx = trainers._injectable_optimizer(1e-1, 5.0)
    params = {"w": jnp.ones((4,))}
    state = TrainState.create(apply_fn=None, params=params, tx=tx)

    @jax.jit
    def step(state):
        grads = {"w": jnp.ones((4,))}
        return state.apply_gradients(grads=grads)

    s1 = step(state)
    delta1 = float(jnp.abs(s1.params["w"] - params["w"]).mean())
    s2 = step(trainers.set_lr(state, 1e-3))
    delta2 = float(jnp.abs(s2.params["w"] - params["w"]).mean())
    assert delta2 < delta1 * 0.5  # smaller LR -> smaller first step
