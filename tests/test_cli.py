"""End-to-end training-CLI tests on the 8-device CPU mesh.

Covers the round-2 integration contract: multi-chip training is the CLI's
normal path (mesh data×tile via ``training_mesh``/``shard_train_step``), and
``--resume`` restores a full TrainState bit-exactly mid-epoch.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest
from PIL import Image

from iclr_17_compression_tpu.train.cli import train_dsc, train_single_image
from iclr_17_compression_tpu.train.config import TrainConfig


def _write_images(d, n, h=40, w=40, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"im_{i:02d}.png"))


def _write_kitti(root, n, h=72, w=72, seed=0):
    rng = np.random.default_rng(seed)
    for sub in ("image_2", "image_3"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        for sub in ("image_2", "image_3"):
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(root, sub, f"f_{i:02d}_10.png"))


def _base_cfg(tmp_path, **kw):
    defaults = dict(
        tot_epoch=100,
        tot_step=3,
        batch_size=4,
        image_size=32,
        out_channel_n=8,
        lr_base=1e-3,
        print_freq=1000,
        save_model_freq=1000,
        cal_step=1,
        train_dir=str(tmp_path / "imgs"),
        save_root=str(tmp_path / "ckpt"),
        tensorboard=False,
        num_workers=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _leaves(params):
    return jax.tree_util.tree_leaves(params)


def _read_metrics(save_root, name, keys):
    import json

    rows = []
    with open(os.path.join(save_root, name, "events.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if all(k in row for k in keys):
                rows.append([row[k] for k in keys])
    return np.asarray(rows)


@pytest.mark.slow
class TestShardedTraining:
    """NOTE on assertions: parameters cannot be compared across meshes —
    Adam's first steps are sign-like (update ≈ ±lr regardless of gradient
    magnitude), so collective-reduction-order noise on near-zero gradients
    flips update signs. Per-step *metrics* (the forward pass) are the
    well-conditioned parity check."""

    def test_sharded_matches_single_device(self, tmp_path):
        """3 steps on a data=4 × tile=2 mesh produce the same per-step
        metrics as a 1×1 mesh (same data order, same step RNG)."""
        _write_images(tmp_path / "imgs", 8)

        # lr tiny: step-2/3 metrics see post-update params, and Adam sign
        # flips on reduction noise would otherwise move them by ±lr.
        # image_size 64 keeps the deepest-latent shard ≥ 2 px (the
        # validate_tile_extent bound — GSPMD mis-computes below it).
        cfg_multi = _base_cfg(tmp_path, mesh_data=4, mesh_tile=2, print_freq=1,
                              lr_base=1e-6, image_size=64)
        state_multi = train_single_image(cfg_multi, "multi")

        cfg_single = _base_cfg(tmp_path, mesh_data=1, mesh_tile=1, print_freq=1,
                               lr_base=1e-6, image_size=64)
        train_single_image(cfg_single, "single")

        assert int(state_multi.step) == 3
        keys = ("rd_loss", "mse", "bpp")
        m = _read_metrics(cfg_multi.save_root, "multi", keys)
        s = _read_metrics(cfg_single.save_root, "single", keys)
        assert m.shape == s.shape == (3, 3)
        np.testing.assert_allclose(m, s, rtol=1e-3, atol=1e-5)

    def test_train_dsc_sharded_runs(self, tmp_path):
        """train_dsc on a data=4 × tile=2 mesh: finite, and per-step metrics
        match the 1×1 mesh."""
        _write_kitti(tmp_path / "kitti", 4, h=136, w=136)
        cfg = TrainConfig(
            tot_epoch=3,
            batch_size=4,
            image_size=128,  # code tensor ÷32 → 4 px W, 2 px per tile shard
            model="dsc:tiny",
            lr_base=1e-6,
            train_dir=str(tmp_path / "kitti"),
            save_root=str(tmp_path / "ckpt"),
            tensorboard=False,
            print_freq=1,
            num_workers=0,
        )
        state_m = train_dsc(dataclasses.replace(cfg, mesh_data=4, mesh_tile=2), "dm")
        state_s = train_dsc(dataclasses.replace(cfg, mesh_data=1, mesh_tile=1), "ds")
        assert int(state_m.step) == int(state_s.step) == 3
        for a in _leaves(state_m.params):
            assert np.all(np.isfinite(np.asarray(a)))
        keys = ("loss", "loss_full", "loss_base")
        m = _read_metrics(cfg.save_root, "dm", keys)
        s = _read_metrics(cfg.save_root, "ds", keys)
        assert m.shape == s.shape and m.shape[0] == 3
        np.testing.assert_allclose(m, s, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
class TestResume:
    def test_kill_and_resume_bit_exact(self, tmp_path):
        """2 steps + resume for 2 more ≡ 4 straight steps (params identical).

        Exercises the mid-epoch path: 8 images / batch 2 = 4 batches per
        epoch, so the step-2 checkpoint sits inside epoch 0 and resume must
        skip exactly 2 batches."""
        _write_images(tmp_path / "imgs", 8)
        base = _base_cfg(tmp_path, batch_size=2, mesh_data=1, mesh_tile=1,
                         save_model_freq=1000)

        # straight 4-step run
        state_full = train_single_image(
            dataclasses.replace(base, tot_step=4), "full"
        )

        # killed at step 2 (final checkpoint carries epoch + batch offset)
        train_single_image(dataclasses.replace(base, tot_step=2), "part")
        state_res = train_single_image(
            dataclasses.replace(base, tot_step=4), "part",
            resume=os.path.join(base.save_root, "part"),
        )

        assert int(state_res.step) == int(state_full.step) == 4
        for a, b in zip(_leaves(state_res.params), _leaves(state_full.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dsc_resume_restores_plateau_and_epoch(self, tmp_path):
        _write_kitti(tmp_path / "kitti", 4)
        cfg = TrainConfig(
            tot_epoch=1,
            batch_size=4,
            image_size=64,
            model="dsc:tiny",
            mesh_data=1,
            mesh_tile=1,
            train_dir=str(tmp_path / "kitti"),
            test_dir=str(tmp_path / "kitti"),  # exercises the best-val pass
            save_root=str(tmp_path / "ckpt"),
            tensorboard=False,
            print_freq=1000,
            num_workers=0,
        )
        train_dsc(cfg, "d1")
        assert os.path.exists(os.path.join(cfg.save_root, "d1", "best_val.ckpt"))
        # epoch 0 done → resume starts at epoch 1 and runs one more epoch
        state = train_dsc(
            dataclasses.replace(cfg, tot_epoch=2), "d1",
            resume=os.path.join(cfg.save_root, "d1"),
        )
        assert int(state.step) == 2  # 1 batch per epoch × 2 epochs

    def test_partial_param_load(self, tmp_path, key):
        """Native partial-key load: intersecting keys copied, rest fresh
        (reference model.py:26-27 semantics)."""
        import jax.numpy as jnp

        from iclr_17_compression_tpu.models import Balle17Compressor
        from iclr_17_compression_tpu.train.checkpoint import (
            load_params_partial,
            save_params,
        )

        x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
        m = Balle17Compressor(out_channel_n=8)
        p1 = m.init({"params": key, "quant": key}, x, train=False)["params"]
        path = save_params(p1, str(tmp_path), 0)

        # template with an extra top-level key: intersecting keys restored,
        # the extra key left at its template value
        p2 = m.init(
            {"params": jax.random.fold_in(key, 7), "quant": key}, x, train=False
        )["params"]
        extra = {"new_head": {"w": jnp.ones((3, 3))}}
        template = dict(p2, **extra)
        merged = load_params_partial(template, path)
        np.testing.assert_array_equal(
            np.asarray(merged["encoder"]["conv1"]["weight"]),
            np.asarray(p1["encoder"]["conv1"]["weight"]),
        )
        np.testing.assert_array_equal(np.asarray(merged["new_head"]["w"]), np.ones((3, 3)))
