"""Train-step, schedule, meter, loss and config tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.models import Balle17Compressor
from iclr_17_compression_tpu.train import (
    AverageMeter,
    ReduceLROnPlateau,
    TrainConfig,
    WeightedMeter,
    create_train_state,
    make_balle17_train_step,
    step_decay_schedule,
)
from iclr_17_compression_tpu.train import losses as L


class TestTrainStep:
    def test_loss_decreases_on_tiny_overfit(self, key):
        model = Balle17Compressor(out_channel_n=8)
        x = jax.random.uniform(key, (2, 32, 32, 3), jnp.float32)
        state = create_train_state(model, key, (x,), lr=1e-3)
        step = jax.jit(make_balle17_train_step(train_lambda=4096.0))
        rng = key
        losses = []
        for i in range(12):
            rng = jax.random.fold_in(rng, i)
            state, metrics = step(state, x, rng)
            losses.append(float(metrics["rd_loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 12

    def test_msssim_distortion_step(self, key):
        """distortion='msssim' (the MS-SSIM-trained operating points;
        reference train_reg0.065model.py:125-138 loss form) trains."""
        model = Balle17Compressor(out_channel_n=8)
        x = jax.random.uniform(key, (2, 64, 64, 3), jnp.float32)
        state = create_train_state(model, key, (x,), lr=1e-3)
        step = jax.jit(make_balle17_train_step(64.0, distortion="msssim"))
        losses = []
        rng = key
        for i in range(8):
            rng = jax.random.fold_in(rng, i)
            state, metrics = step(state, x, rng)
            losses.append(float(metrics["rd_loss"]))
        assert all(l == l for l in losses)  # finite
        assert losses[-1] < losses[0]

    def test_grad_clip_present(self, key):
        model = Balle17Compressor(out_channel_n=8)
        x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
        state = create_train_state(model, key, (x,), lr=1e-4, grad_clip=5.0)
        # the optax chain's first transform is a clip
        assert state.tx is not None


class TestCheckpointIO:
    def test_atomic_save_roundtrip(self, key, tmp_path):
        """Saves go through tmp+rename (no torn reads for concurrent eval
        snapshots) and the pipelined host fetch preserves values exactly."""
        import numpy as np

        from iclr_17_compression_tpu.train.checkpoint import (
            load_train_state,
            save_train_state,
        )

        model = Balle17Compressor(out_channel_n=8)
        x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
        state = create_train_state(model, key, (x,), lr=1e-4)
        path = save_train_state(state, str(tmp_path), "latest", epoch=3, loss=0.5)
        assert path.endswith("latest.ckpt")
        assert not list(tmp_path.glob("*.tmp"))  # rename completed
        restored, meta = load_train_state(state, path)
        assert meta["epoch"] == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSchedules:
    def test_step_decay(self):
        sched = step_decay_schedule(1e-4, decay=0.1, decay_interval=100, warmup_step=10)
        assert float(sched(5)) == pytest.approx(5e-5)
        assert float(sched(50)) == pytest.approx(1e-4)
        assert float(sched(150)) == pytest.approx(1e-5)

    def test_plateau(self):
        s = ReduceLROnPlateau(factor=0.5, patience=1, base_lr=1.0)
        assert s.step(10.0) == 1.0   # first = best
        assert s.step(10.0) == 1.0   # bad 1
        assert s.step(10.0) == 0.5   # bad 2 > patience -> decay
        assert s.step(1.0) == 0.5    # new best


class TestMeters:
    def test_average_meter_window(self):
        m = AverageMeter(size=3)
        for v in [1, 2, 3, 4]:
            m.update(v)
        assert m.avg == pytest.approx((2 + 3 + 4) / 3)
        assert m.val == 4

    def test_weighted_meter(self):
        m = WeightedMeter()
        m.update(1.0, n=1)
        m.update(3.0, n=3)
        assert m.avg == pytest.approx(2.5)


class TestConfig:
    def test_reference_json_schema(self, tmp_path):
        cfg_json = {
            "tot_epoch": 100,
            "tot_step": 2500000,
            "train_lambda": 512,
            "batch_size": 4,
            "lr": {"base": 1e-4, "decay": 0.1, "decay_interval": 2200000},
        }
        p = tmp_path / "config.json"
        p.write_text(json.dumps(cfg_json))
        cfg = TrainConfig.from_json(str(p))
        assert cfg.train_lambda == 512
        assert cfg.lr_base == 1e-4
        assert cfg.lr_decay_interval == 2200000
        assert cfg.tot_epoch == 100


class TestLosses:
    def test_all_finite(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        recon = jax.random.uniform(k1, (2, 16, 16, 3))
        target = jax.random.uniform(k2, (2, 16, 16, 3))
        e1 = jax.random.normal(k3, (2, 4, 4, 8))
        e2 = jax.random.normal(k4, (2, 4, 4, 8))
        vals = [
            L.charbonnier_loss(recon, target),
            L.contrastive_loss_pairs_only(e1, e2),
            L.contrastive_loss(e1, e2),
            L.mse_and_pair_hamming_loss(recon, target, e1, e2),
            L.l1_and_pair_hamming_loss(recon, target, e1, e2),
            L.mse_and_contrastive_loss(recon, target, e1, e2),
            L.l1_and_contrastive_loss(recon, target, e1, e2),
            L.mse_and_blank_contrastive_loss(recon, target, e1, e2),
            L.edge_loss(recon, target),
            L.edge_and_charbonnier_loss(recon, target),
        ]
        for v in vals:
            assert np.isfinite(float(v))

    def test_charbonnier_zero(self):
        x = jnp.ones((1, 8, 8, 3))
        assert float(L.charbonnier_loss(x, x)) == pytest.approx(1e-3, rel=1e-3)

    def test_contrastive_identical_pairs_zero_pos(self, key):
        e = jax.random.normal(key, (3, 4, 4, 2))
        assert float(L.contrastive_loss_pairs_only(e, e)) == 0.0


class TestAnalysisUtils:
    def test_conditional_entropy(self, rng):
        from iclr_17_compression_tpu.utils import (
            conditional_entropy,
            uncertainty_coefficient,
        )

        z = rng.standard_normal(10000)
        h1, h2, h12 = conditional_entropy(z, z, bins=32)
        assert h12 == pytest.approx(h1, rel=0.05)  # identical -> H12 = H1
        u_same = uncertainty_coefficient(z, z, bins=32)
        u_indep = uncertainty_coefficient(z, rng.standard_normal(10000), bins=32)
        assert u_same > 0.9
        assert u_indep < 0.2
