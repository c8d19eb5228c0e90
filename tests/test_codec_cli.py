"""File-level codec CLI: container round trips for every model kind.

The reference never shipped a working encoder/decoder pair (its
test/enc_dec.sh calls files that don't exist); these tests pin down the real
one: encode → file bytes → decode reconstructs exactly what the model's
eval path produces.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iclr_17_compression_tpu.coding.codec_cli import (
    build_model,
    decode_image,
    encode_image,
    load_image,
    main,
    pad_to_multiple,
    save_image,
)
from iclr_17_compression_tpu.train.checkpoint import save_params


def _init(kind, model, key):
    from iclr_17_compression_tpu.coding.codec_cli import KIND_DSC

    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    if kind == KIND_DSC:
        return model.init({"params": key, "quant": key}, dummy, dummy, train=False)
    return model.init({"params": key, "quant": key}, dummy, train=False)


def test_balle17_file_roundtrip_exact(key, rng):
    n = 8
    kind, model, mult = build_model("balle17", n)
    params = _init(kind, model, key)
    img = rng.uniform(0.0, 1.0, (40, 56, 3)).astype(np.float32)  # non-multiple

    data = encode_image(img, "balle17", params, n=n)
    recon = decode_image(data, params)
    assert recon.shape == img.shape

    # the decode must equal the model's own eval-path recon (crop of it)
    x = pad_to_multiple(img, mult)[None]
    out = model.apply(params, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        recon, np.asarray(out["recon"])[0, :40, :56], rtol=1e-5, atol=1e-5
    )


def test_dsc_file_roundtrip_exact(key, rng):
    preset = "temp_0031bpp"
    kind, model, mult = build_model(preset, 128)
    params = _init(kind, model, key)
    img = rng.uniform(0.0, 1.0, (40, 72, 3)).astype(np.float32)
    si = rng.uniform(0.0, 1.0, (40, 72, 3)).astype(np.float32)

    data = encode_image(img, preset, params)
    with pytest.raises(ValueError):
        decode_image(data, params)  # DSC needs side information
    recon = decode_image(data, params, si_image=si)
    assert recon.shape == img.shape

    x1 = pad_to_multiple(img, mult)[None]
    x2 = pad_to_multiple(si, mult)[None]
    out = model.apply(params, jnp.asarray(x1), jnp.asarray(x2), train=False)
    np.testing.assert_allclose(
        recon, np.asarray(out["recon"])[0, :40, :72], rtol=1e-5, atol=1e-5
    )


def test_joint_file_roundtrip_exact(key, rng):
    n = 8
    kind, model, mult = build_model("joint", n)
    params = _init(kind, model, key)
    img = rng.uniform(0.0, 1.0, (64, 64, 3)).astype(np.float32)

    data = encode_image(img, "joint", params, n=n)
    recon = decode_image(data, params)
    # the AR codec reconstructs round(y - mu) + mu, not the eval path's
    # round(y): the ground truth is its own compress->decompress output,
    # which the container must reproduce byte-exactly
    from iclr_17_compression_tpu.models.cheng2020 import compress, decompress

    comp = compress(model, params, jnp.asarray(img[None]))
    ref = decompress(model, params, comp)
    np.testing.assert_array_equal(recon, np.asarray(ref)[0])


def test_cli_encode_decode_commands(key, rng, tmp_path, capsys):
    n = 8
    kind, model, _ = build_model("balle17", n)
    params = _init(kind, model, key)
    ckpt = save_params(params, str(tmp_path), 1)

    img = rng.uniform(0.0, 1.0, (32, 48, 3)).astype(np.float32)
    save_image(img, str(tmp_path / "in.png"))

    rc = main([
        "encode", str(tmp_path / "in.png"), str(tmp_path / "out.icz"),
        "--model", "balle17", "--ckpt", ckpt, "--n", str(n),
    ])
    assert rc == 0
    enc_report = json.loads(capsys.readouterr().out.strip())
    assert enc_report["bytes"] == (tmp_path / "out.icz").stat().st_size
    assert enc_report["bpp"] > 0

    rc = main([
        "decode", str(tmp_path / "out.icz"), str(tmp_path / "rec.png"),
        "--ckpt", ckpt, "--n", str(n),
    ])
    assert rc == 0
    rec = load_image(str(tmp_path / "rec.png"))
    assert rec.shape == (32, 48, 3)

    rc = main([
        "roundtrip", str(tmp_path / "in.png"),
        "--model", "balle17", "--ckpt", ckpt, "--n", str(n),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"bytes", "bpp", "psnr"} <= set(report)


def test_retired_kind_bytes_fail_loudly():
    """Streams written by retired container layouts (raster-scan joint order
    kind=3; uint32-table DSC kinds 2/4) must be REJECTED, not silently
    mis-decoded into garbage (round-3 advisor finding)."""
    import pytest

    from iclr_17_compression_tpu.coding.codec_cli import MAGIC, _read_header, _Reader

    for kind in (2, 3, 4):
        data = MAGIC + bytes([kind, 4]) + b"name" + b"\x00" * 12
        with pytest.raises(ValueError, match="retired"):
            _read_header(_Reader(data))
