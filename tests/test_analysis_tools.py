"""Analysis/eval tooling: similarity, distribution, checkpoint mixing,
model averaging, SVD low-rank code, dataset tools (SURVEY.md §2.8)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from iclr_17_compression_tpu.models import (
    Balle17Compressor,
    DSC_PRESETS,
    DSCStereoModel,
)


@pytest.fixture(scope="module")
def balle():
    model = Balle17Compressor(out_channel_n=32)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init({"params": key, "quant": key}, x, train=False)
    return model, params


@pytest.fixture(scope="module")
def dsc():
    model = DSCStereoModel(DSC_PRESETS["temp_0031bpp"])
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init({"params": key, "quant": key}, x, x, train=False)
    return model, params


def _pairs(rng, n=2, hw=64):
    return [
        (rng.random((hw, hw, 3), dtype=np.float32) if hasattr(rng, "random") else None,)
        for _ in range(n)
    ]


def test_encoder_similarity_and_distances(dsc, rng, tmp_path):
    from iclr_17_compression_tpu.eval import encoder_distances, encoder_similarity

    model, params = dsc
    pairs = [
        (rng.random((64, 64, 3)).astype(np.float32),
         rng.random((64, 64, 3)).astype(np.float32))
        for _ in range(2)
    ]
    dump = str(tmp_path / "ch")
    res = encoder_similarity(model, params, pairs, dump_channels_dir=dump)
    assert 0.0 <= res["normalized_hamming"] <= 1.0
    assert 0.0 <= res["uncertainty_coefficient"] <= 1.0
    assert res["code_max"] >= res["code_min"]
    assert len(os.listdir(dump)) == 128  # one png per z channel

    d = encoder_distances(model, params, pairs)
    assert d["latent_l1"] > 0 and d["latent_l2"] >= d["latent_l1"] * 0  # finite
    # identical pair → zero distance, hamming 0, U = 1
    same = rng.random((64, 64, 3)).astype(np.float32)
    res2 = encoder_similarity(model, params, [(same, same)])
    assert res2["normalized_hamming"] == 0.0
    assert res2["uncertainty_coefficient"] == pytest.approx(1.0, abs=1e-6)


def test_code_distribution(balle, rng):
    from iclr_17_compression_tpu.eval import code_distribution

    model, params = balle
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(3)]
    res = code_distribution(model, params, imgs)
    assert res["per_channel_variance"].shape == (32,)
    assert res["histogram"].sum() == 3 * 4 * 4 * 32
    assert res["gzip_factor"] > 0


def test_mix_encoder_decoder_and_average(balle, rng, key):
    from iclr_17_compression_tpu.eval import (
        average_two_models,
        eval_single_image,
        mix_encoder_decoder,
    )

    model, params_a = balle
    params_b = model.init(
        {"params": jax.random.PRNGKey(9), "quant": key}, jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    mixed = mix_encoder_decoder(params_a, params_b)
    # encoder from A, decoder from B
    pa = params_a["params"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(mixed["params"]["encoder"])[0]),
        np.asarray(jax.tree_util.tree_leaves(pa["encoder"])[0]),
    )
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(2)]
    r = eval_single_image(model, mixed, imgs)
    assert np.isfinite(r["psnr"]) and 0 <= r["ms_ssim"] <= 1
    r2 = average_two_models(model, params_a, params_b, imgs)
    assert np.isfinite(r2["psnr"])


def test_svd_low_rank(rng):
    from iclr_17_compression_tpu.utils import low_rank_code, rank_rate_bits

    code = (np.round(rng.random((4, 8, 8)) * 8 - 4) * 16).astype(np.float32)
    full_rank = min(4 * 8, 8)
    lr = low_rank_code(code, full_rank)
    # full rank + requant grid → exact recovery (values already on the grid)
    np.testing.assert_array_equal(lr, code)
    lr1 = low_rank_code(code, 1)
    assert lr1.shape == code.shape
    assert np.all(lr1 % 16 == 0)  # on the transmission grid
    assert rank_rate_bits((4, 8, 8), 1) < rank_rate_bits((4, 8, 8), 4)


def test_dataset_tools(balle, dsc, rng, tmp_path):
    from iclr_17_compression_tpu.utils import (
        check_image_sizes,
        create_diff_folder,
        save_both_direction_recons,
    )

    src = tmp_path / "src"
    src.mkdir()
    for i, hw in enumerate(((64, 80), (64, 80), (48, 64))):
        arr = (rng.random((hw[0], hw[1], 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(src / f"im{i}.png")

    audit = check_image_sizes(str(src))
    assert audit["min_h"] == 48 and audit["min_w"] == 64
    assert len(audit["sizes"]) == 2

    model, params = balle
    out = tmp_path / "diff"
    written = create_diff_folder(model, params, str(src), str(out))
    assert len(written) == 3
    d = np.asarray(Image.open(written[0]))
    assert d.dtype == np.uint8 and d.shape[2] == 3

    dmodel, dparams = dsc
    pairs = [
        (rng.random((64, 64, 3)).astype(np.float32),
         rng.random((64, 64, 3)).astype(np.float32))
    ]
    dumped = save_both_direction_recons(dmodel, dparams, pairs, str(tmp_path / "bd"))
    assert len(dumped) == 2


def test_warp_side_information(tmp_path, rng):
    from iclr_17_compression_tpu.utils import warp_side_information

    pytest.importorskip("cv2")
    # textured image + small translation: ORB must recover the shift
    base = (rng.random((128, 160, 3)) * 255).astype(np.uint8)
    shifted = np.roll(base, (4, 6), axis=(0, 1))
    rp, sp = str(tmp_path / "recon.png"), str(tmp_path / "SI.png")
    Image.fromarray(base).save(rp)
    Image.fromarray(shifted).save(sp)
    out = warp_side_information(rp, sp, str(tmp_path / "warped.png"))
    if out is None:
        pytest.skip("not enough ORB matches on random texture")
    w = np.asarray(Image.open(out)).astype(np.float32)
    # interior must closely match the original after unwarping
    err = np.abs(w[16:-16, 16:-16] - base[16:-16, 16:-16]).mean()
    assert err < 30.0
