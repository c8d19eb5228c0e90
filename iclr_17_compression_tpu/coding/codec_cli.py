"""File-level image codec CLI: PNG in → ``.icz`` bitstream file → PNG out.

The reference only gestures at this workflow — ``test/enc_dec.sh`` invokes
``encoder.py``/``decoder.py`` files that do not exist in its tree (SURVEY.md
§4, dead script) and all of its rate numbers are gzip proxies. Here encode/
decode are real: transforms run jitted on the TPU, bitstreams come from the
C++ rANS coder, and the decoder reconstructs from the file alone (plus the
checkpoint, and — for the DSC models — the receiver's own side-information
image, which is the whole point of distributed source coding).

Usage:
  python -m iclr_17_compression_tpu.coding.codec_cli \
      encode in.png out.icz --model balle17 --ckpt iter_500000.ckpt
  python -m iclr_17_compression_tpu.coding.codec_cli \
      decode out.icz rec.png --ckpt iter_500000.ckpt
  python -m iclr_17_compression_tpu.coding.codec_cli \
      encode left.png out.icz --model temp_0031bpp --ckpt best.ckpt
  python -m iclr_17_compression_tpu.coding.codec_cli \
      decode out.icz rec.png --ckpt best.ckpt --si right.png
  python -m iclr_17_compression_tpu.coding.codec_cli \
      roundtrip in.png --model joint --ckpt anchor.ckpt

Models: ``balle17`` (factorized prior), ``joint`` (Cheng-2020 anchor,
hyperprior + autoregressive context), or any DSC preset name from
``models.DSC_PRESETS`` (e.g. ``temp_0031bpp``).

Checkpoints: flax msgpack (train.checkpoint.save_params) or reference
PyTorch ``.pth``/``.pth.tar`` state dicts (auto-imported via
train.torch_import).
"""

import argparse
import json
import struct
import sys
from typing import Optional, Tuple

import numpy as np

MAGIC = b"ICZ1"
KIND_BALLE17 = 1
# Retired kind bytes (old layouts would silently mis-decode, so their ids
# fail loudly in _read_header instead of being reused):
#   2, 4 — DSC/composite with uint32 freq tables (now uint16)
#   3    — raster-scan joint-AR symbol order (now wavefront)
KIND_JOINT = 6  # joint-AR, wavefront symbol order
KIND_DSC = 7  # DSC coarse code, uint16 freq tables
KIND_DSC_COMPOSITE = 8  # base DSC code + rate-regression residual code
KIND_HYPERPRIOR = 5  # scale hyperprior: factorized z + Laplace(0, sigma) y
_RETIRED_KINDS = {2, 3, 4}


# ---------------------------------------------------------------------------
# Image IO + padding
# ---------------------------------------------------------------------------

def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def save_image(img: np.ndarray, path: str) -> None:
    from PIL import Image

    u8 = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path)


def pad_to_multiple(img: np.ndarray, m: int) -> np.ndarray:
    h, w = img.shape[:2]
    ph = (-h) % m
    pw = (-w) % m
    if ph == 0 and pw == 0:
        return img
    return np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")


# ---------------------------------------------------------------------------
# Model construction / checkpoint loading
# ---------------------------------------------------------------------------

def _is_torch_ckpt(path: str) -> bool:
    return path.endswith((".pth", ".pth.tar", ".pt"))


def build_model(spec: str, n: int = 0, m: int = 0):
    """Returns (kind, model, pad_multiple). ``n``/``m`` = 0 → per-model
    defaults (balle17 128, joint/hyperprior 192; hyperprior m 320)."""
    from ..models import DSC_PRESETS, Balle17Compressor, DSCStereoModel, JointAutoregressive

    if spec == "balle17":
        return KIND_BALLE17, Balle17Compressor(out_channel_n=n or 128), 16
    if spec == "joint":
        return KIND_JOINT, JointAutoregressive(n=n or 192), 64
    if spec.startswith("hyperprior"):
        # 'hyperprior' | 'hyperprior-sigma' (σ-normalized quantization)
        from ..models import ScaleHyperprior

        quant = "sigma-norm" if spec.endswith("-sigma") else "round"
        return (
            KIND_HYPERPRIOR,
            ScaleHyperprior(out_channel_n=n or 192, out_channel_m=m or 320,
                            quant=quant),
            64,
        )
    if spec in DSC_PRESETS:
        cfg = DSC_PRESETS[spec]
        return KIND_DSC, DSCStereoModel(cfg), cfg.code_div
    raise SystemExit(
        f"unknown model {spec!r}; choose balle17, joint, or one of "
        f"{sorted(DSC_PRESETS)}"
    )


def load_params(kind: int, model, spec: str, ckpt: str):
    """Init a template on a tiny image and restore the checkpoint into it."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    _, _, mult = build_model(spec, getattr(model, "out_channel_n", None) or getattr(model, "n", 128))
    dummy = jnp.zeros((1, 2 * mult, 2 * mult, 3), jnp.float32)
    if kind == KIND_DSC:
        template = model.init({"params": rng, "quant": rng}, dummy, dummy, train=False)
    else:
        template = model.init({"params": rng, "quant": rng}, dummy, train=False)

    if _is_torch_ckpt(ckpt):
        from ..train.torch_import import (
            import_balle17,
            import_dsc,
            import_joint,
            load_torch_state_dict,
            merge_partial,
        )

        sd = load_torch_state_dict(ckpt)
        if kind == KIND_BALLE17:
            imported = import_balle17(sd)
        elif kind == KIND_JOINT:
            imported = import_joint(sd)
        elif kind == KIND_HYPERPRIOR:
            from ..train.torch_import import import_hyperprior

            imported = import_hyperprior(sd)
        else:
            imported = import_dsc(sd, model.config)
        return {"params": merge_partial(template["params"], imported)}

    from ..train.checkpoint import load_params as load_flax

    return load_flax(template, ckpt)


# ---------------------------------------------------------------------------
# Container primitives
# ---------------------------------------------------------------------------

def _pack_bytes(b: bytes) -> bytes:
    return struct.pack("<I", len(b)) + b


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def take(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.data, self.off)
        self.off += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def take_bytes(self) -> bytes:
        n = self.take("I")
        b = self.data[self.off: self.off + n]
        self.off += n
        return b


def _header(kind: int, name: str, n: int, h: int, w: int) -> bytes:
    nb = name.encode()
    return MAGIC + struct.pack("<BB", kind, len(nb)) + nb + struct.pack("<HII", n, h, w)


def _read_header(r: _Reader) -> Tuple[int, str, int, int, int]:
    magic = r.data[:4]
    r.off = 4
    if magic != MAGIC:
        raise ValueError("not an ICZ1 bitstream")
    kind, nlen = r.take("BB")
    if kind in _RETIRED_KINDS:
        raise ValueError(
            f"kind={kind} is a retired container layout (raster-scan joint "
            "order / uint32 DSC tables); this build writes kinds "
            f"{KIND_JOINT}/{KIND_DSC}/{KIND_DSC_COMPOSITE} — re-encode the file"
        )
    name = r.data[r.off: r.off + nlen].decode()
    r.off += nlen
    n, h, w = r.take("HII")
    return kind, name, n, h, w


# ---------------------------------------------------------------------------
# Encode / decode per model kind
# ---------------------------------------------------------------------------

def encode_image(image: np.ndarray, spec: str, params, n: int = 0, m: int = 0) -> bytes:
    """image: HWC float [0,1] → serialized bitstream (bytes)."""
    import jax.numpy as jnp

    kind, model, mult = build_model(spec, n, m)
    n = getattr(model, "out_channel_n", None) or getattr(model, "n", n)
    h0, w0 = image.shape[:2]
    x = pad_to_multiple(image, mult)[None]
    head = _header(kind, spec, n, h0, w0)

    if kind == KIND_HYPERPRIOR:
        from ..models.hyperprior import compress as hp_compress

        comp = hp_compress(model, params, jnp.asarray(x))
        return (
            head
            + struct.pack(
                "<HHHHHHHIhh", model.out_channel_m,
                *comp.y_shape, *comp.z_shape, comp.max_sym, comp.z_min, comp.z_max,
            )
            + _pack_bytes(comp.y_stream)
            + _pack_bytes(comp.z_stream)
        )

    if kind == KIND_BALLE17:
        from ..models.balle17 import Analysis17
        from ..models.cheng2020 import _bit_estimator_params
        from .api import build_cdf_tables_from_bit_estimator, encode_latent

        feat = Analysis17(n).apply(
            {"params": params["params"]["encoder"]}, jnp.asarray(x)
        )
        lat = np.asarray(jnp.round(feat), np.int64)[0]
        zmin, zmax = int(lat.min()), int(lat.max())
        codec = build_cdf_tables_from_bit_estimator(
            _bit_estimator_params(params, "bit_estimator"), zmin, zmax
        )
        stream = encode_latent(codec, lat)
        lh, lw, lc = lat.shape
        return (
            head
            + struct.pack("<HHHhh", lh, lw, lc, zmin, zmax)
            + _pack_bytes(stream)
        )

    if kind == KIND_JOINT:
        from ..models.cheng2020 import compress

        comp = compress(model, params, jnp.asarray(x))
        return (
            head
            + struct.pack(
                "<HHHHHHHhh",
                *comp.y_shape, *comp.z_shape, comp.max_sym, comp.z_min, comp.z_max,
            )
            + _pack_bytes(comp.y_stream)
            + _pack_bytes(comp.z_stream)
        )

    # DSC: transmit the coarse-quantized code of im1 alone (the SI image
    # never reaches the encoder — reference models/temp.py:232-260).
    return head + _encode_dsc_payload(x, model.config, params)


def serialize_dsc_code(syms: np.ndarray, step: float, code_clip) -> bytes:
    """Serialize one DSC coarse code (h, w, c) of step-grid integer symbols:
    shape/step/table header + per-channel freq tables + rANS stream — the
    exact bytes the ``.icz`` container carries, so rate accounting elsewhere
    (eval/stereo.py) measures real file bytes, headers included."""
    from .api import build_cdf_tables_from_histogram, encode_latent

    syms = np.asarray(syms, np.int64)
    if code_clip is not None:
        lim = int(code_clip / step)
        syms = np.clip(syms, -lim, lim)
        offset, nsym = -lim, 2 * lim + 1
    else:
        offset, nsym = int(syms.min()), int(syms.max()) - int(syms.min()) + 1
    codec = build_cdf_tables_from_histogram(syms, offset=offset, nsym=nsym)
    stream = encode_latent(codec, syms)
    ch, cw, cc = syms.shape
    payload = struct.pack("<HHHfhH", ch, cw, cc, float(step), offset, nsym)
    # scale_bits=14 → every frequency ≤ 2^14 fits uint16; at single-image
    # DSC scale the per-channel tables DOMINATE the container (measured:
    # 544 B tables vs ~290 B stream on a 320×384 image), so halving table
    # bytes cuts ~30% off the real bpp.
    payload += codec.freqs.astype(np.uint16).tobytes()
    return payload + _pack_bytes(stream)


def _encode_dsc_payload(x: np.ndarray, cfg, params) -> bytes:
    """One DSC coarse-code payload: shape/step/table header + rANS stream."""
    import jax.numpy as jnp

    from ..models.dsc import _Stack

    z1 = _Stack(cfg.ga).apply({"params": params["params"]["g_a"]}, jnp.asarray(x))
    code_pre = _Stack(cfg.ga22).apply({"params": params["params"]["g_a22"]}, z1)
    step = float(cfg.coarse_step)
    syms = np.asarray(jnp.round(code_pre / step), np.int64)[0]
    return serialize_dsc_code(syms, step, cfg.code_clip)


def _decode_dsc_code(r: "_Reader") -> np.ndarray:
    """Inverse of _encode_dsc_payload → dequantized code tensor (1,h,w,c)."""
    from .api import RansCodec, decode_latent

    ch, cw, cc, step, offset, nsym = r.take("HHHfhH")
    freqs = np.frombuffer(
        r.data[r.off: r.off + 2 * cc * nsym], np.uint16
    ).reshape(cc, nsym)
    r.off += 2 * cc * nsym
    stream = r.take_bytes()
    codec = RansCodec(freqs.astype(np.uint32), offset=offset)
    syms = decode_latent(codec, stream, (ch, cw, cc))
    return (syms.astype(np.float32) * step)[None]


def encode_composite(
    image: np.ndarray, base_spec: str, base_params, reg_spec: str, reg_params,
    n: int = 128,
) -> bytes:
    """Two-stage encode (reference NewTests/test_regModel_0_0625.py:105-125):
    the base model's coarse code plus the regression stage's residual code in
    one container — the 0.0625-bpp operating point."""
    _, base_model, mult = build_model(base_spec, n)
    _, reg_model, rmult = build_model(reg_spec, n)
    h0, w0 = image.shape[:2]
    x = pad_to_multiple(image, max(mult, rmult))[None]
    rb = reg_spec.encode()
    head = (
        _header(KIND_DSC_COMPOSITE, base_spec, n, h0, w0)
        + struct.pack("<B", len(rb)) + rb
    )
    return (
        head
        + _pack_bytes(_encode_dsc_payload(x, base_model.config, base_params))
        + _pack_bytes(_encode_dsc_payload(x, reg_model.config, reg_params))
    )


def decode_composite(
    data: bytes, base_params, reg_params, si_image: np.ndarray
) -> np.ndarray:
    """clip(base_recon + residual) from a composite bitstream + SI image."""
    import jax.numpy as jnp

    from ..models import DSC_PRESETS
    from ..models.dsc import DSCDecoder

    r = _Reader(data)
    kind, base_name, n, h0, w0 = _read_header(r)
    if kind != KIND_DSC_COMPOSITE:
        raise ValueError("not a composite bitstream")
    nlen = r.take("B")
    reg_name = r.data[r.off: r.off + nlen].decode()
    r.off += nlen
    base_cfg = DSC_PRESETS[base_name]
    reg_cfg = DSC_PRESETS[reg_name]

    rb = _Reader(r.take_bytes())
    base_code = _decode_dsc_code(rb)
    rr = _Reader(r.take_bytes())
    reg_code = _decode_dsc_code(rr)

    si = pad_to_multiple(si_image, max(base_cfg.code_div, reg_cfg.code_div))[None]
    base_recon = DSCDecoder(base_cfg).apply(
        base_params, jnp.asarray(base_code), jnp.asarray(si)
    )
    residual = DSCDecoder(reg_cfg, clip=False).apply(
        reg_params, jnp.asarray(reg_code), jnp.asarray(si)
    )
    final = jnp.clip(base_recon + residual, 0.0, 1.0)
    return np.asarray(final)[0, :h0, :w0]


def decode_image(
    data: bytes, params, si_image: Optional[np.ndarray] = None, spec_hint: str = ""
) -> np.ndarray:
    """Serialized bitstream → HWC float reconstruction in [0,1]."""
    import jax.numpy as jnp

    r = _Reader(data)
    kind, name, n, h0, w0 = _read_header(r)

    if kind == KIND_BALLE17:
        from ..models.balle17 import Synthesis17
        from ..models.cheng2020 import _bit_estimator_params
        from .api import build_cdf_tables_from_bit_estimator, decode_latent

        lh, lw, lc, zmin, zmax = r.take("HHHhh")
        stream = r.take_bytes()
        codec = build_cdf_tables_from_bit_estimator(
            _bit_estimator_params(params, "bit_estimator"), zmin, zmax
        )
        lat = decode_latent(codec, stream, (lh, lw, lc)).astype(np.float32)
        recon = Synthesis17(n).apply(
            {"params": params["params"]["decoder"]}, jnp.asarray(lat[None])
        )
        return np.clip(np.asarray(recon)[0, :h0, :w0], 0.0, 1.0)

    if kind == KIND_HYPERPRIOR:
        from ..models.hyperprior import CompressedHyper
        from ..models.hyperprior import decompress as hp_decompress

        m = r.take("H")
        _, model, _ = build_model(name, n, m)
        vals = r.take("HHHHHHIhh")
        comp = CompressedHyper(
            y_stream=r.take_bytes(), z_stream=r.take_bytes(),
            y_shape=tuple(vals[:3]), z_shape=tuple(vals[3:6]),
            max_sym=vals[6], z_min=vals[7], z_max=vals[8],
            quant=model.quant,
        )
        recon = hp_decompress(model, params, comp)
        return np.asarray(recon)[0, :h0, :w0]

    if kind == KIND_JOINT:
        from ..models import JointAutoregressive
        from ..models.cheng2020 import CompressedImage, decompress

        vals = r.take("HHHHHHHhh")
        y_shape, z_shape = tuple(vals[:3]), tuple(vals[3:6])
        max_sym, z_min, z_max = vals[6], vals[7], vals[8]
        y_stream = r.take_bytes()
        z_stream = r.take_bytes()
        comp = CompressedImage(
            y_stream=y_stream, z_stream=z_stream, y_shape=y_shape,
            z_shape=z_shape, max_sym=max_sym, z_min=z_min, z_max=z_max,
        )
        recon = decompress(JointAutoregressive(n=n), params, comp)
        return np.asarray(recon)[0, :h0, :w0]

    # DSC
    from ..models import DSC_PRESETS
    from ..models.dsc import DSCDecoder

    if si_image is None:
        raise ValueError(
            f"model {name!r} is a DSC codec: decoding requires --si "
            "(the receiver's side-information image)"
        )
    cfg = DSC_PRESETS[name]
    code = _decode_dsc_code(r)
    si = pad_to_multiple(si_image, cfg.code_div)[None]
    recon = DSCDecoder(cfg).apply(params, jnp.asarray(code), jnp.asarray(si))
    return np.asarray(recon)[0, :h0, :w0]


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="codec_cli", description=__doc__.split("\n\n")[0]
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, needs_model):
        if needs_model:
            p.add_argument("--model", required=True,
                           help="balle17 | joint | DSC preset name")
        p.add_argument("--ckpt", required=True, help="flax .ckpt or torch .pth")
        p.add_argument("--n", type=int, default=0,
                       help="model channels (0 = model default)")
        p.add_argument("--m", type=int, default=0,
                       help="hyperprior M channels (0 = model default)")
        p.add_argument("--si", default="", help="side-information image (DSC)")
        p.add_argument("--reg-ckpt", default="",
                       help="rate-regression stage checkpoint → composite "
                            "two-code bitstream (0.0625-bpp operating point)")
        p.add_argument("--reg-model", default="reg_0_0625",
                       help="regression-stage DSC preset")

    pe = sub.add_parser("encode", help="image file → .icz bitstream")
    pe.add_argument("input")
    pe.add_argument("output")
    common(pe, True)

    pd = sub.add_parser("decode", help=".icz bitstream → image file")
    pd.add_argument("input")
    pd.add_argument("output")
    common(pd, False)

    pr = sub.add_parser("roundtrip", help="encode+decode in memory, report quality")
    pr.add_argument("input")
    common(pr, True)

    args = ap.parse_args(argv)

    def _load_reg(args):
        _, reg_model, _ = build_model(args.reg_model, args.n)
        return load_params(KIND_DSC, reg_model, args.reg_model, args.reg_ckpt)

    if args.cmd == "encode":
        img = load_image(args.input)
        kind, model, _ = build_model(args.model, args.n, args.m)
        params = load_params(kind, model, args.model, args.ckpt)
        if args.reg_ckpt:
            data = encode_composite(
                img, args.model, params, args.reg_model, _load_reg(args), n=args.n
            )
        else:
            data = encode_image(img, args.model, params, n=args.n, m=args.m)
        with open(args.output, "wb") as f:
            f.write(data)
        bpp = len(data) * 8.0 / (img.shape[0] * img.shape[1])
        print(json.dumps({"bytes": len(data), "bpp": round(bpp, 5)}))
        return 0

    if args.cmd == "decode":
        with open(args.input, "rb") as f:
            data = f.read()
        kind, name, n, _, _ = _read_header(_Reader(data))
        spec = {KIND_BALLE17: "balle17", KIND_JOINT: "joint"}.get(kind, name)
        # --m must reach the params template too: the payload carries M and
        # decode_image honors it, but a hyperprior checkpoint trained with a
        # non-default M would fail to load into an M=320-shaped template.
        _, model, _ = build_model(spec, n, args.m)
        params = load_params(kind, model, spec, args.ckpt)
        si = load_image(args.si) if args.si else None
        if kind == KIND_DSC_COMPOSITE:
            if si is None or not args.reg_ckpt:
                raise SystemExit("composite decode needs --si and --reg-ckpt")
            recon = decode_composite(data, params, _load_reg(args), si)
        else:
            recon = decode_image(data, params, si_image=si)
        save_image(recon, args.output)
        print(json.dumps({"output": args.output, "shape": list(recon.shape)}))
        return 0

    # roundtrip
    img = load_image(args.input)
    kind, model, _ = build_model(args.model, args.n, args.m)
    params = load_params(kind, model, args.model, args.ckpt)
    si = load_image(args.si) if args.si else None
    if args.reg_ckpt:
        reg_params = _load_reg(args)
        data = encode_composite(
            img, args.model, params, args.reg_model, reg_params, n=args.n
        )
        if si is None:
            raise SystemExit("composite roundtrip needs --si")
        recon = decode_composite(data, params, reg_params, si)
    else:
        data = encode_image(img, args.model, params, n=args.n, m=args.m)
        recon = decode_image(data, params, si_image=si)
    mse = float(np.mean((recon - img) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    bpp = len(data) * 8.0 / (img.shape[0] * img.shape[1])
    print(json.dumps({
        "bytes": len(data), "bpp": round(bpp, 5), "psnr": round(psnr, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
