"""Round-trip and rate tests for the C++ rANS coder."""

import numpy as np
import pytest

from iclr_17_compression_tpu.coding import (
    RansCodec,
    build_cdf_tables_from_bit_estimator,
    build_cdf_tables_from_histogram,
    decode_latent,
    encode_latent,
    gzip_bpp,
)
from iclr_17_compression_tpu.coding.api import _quantize_pmf


class TestQuantizePmf:
    def test_sums_and_positive(self, rng):
        for _ in range(5):
            pmf = rng.random(17)
            f = _quantize_pmf(pmf, 14)
            assert f.sum() == 1 << 14
            assert f.min() >= 1

    def test_degenerate(self):
        f = _quantize_pmf(np.array([1.0, 0.0, 0.0]), 10)
        assert f.sum() == 1 << 10
        assert f.min() >= 1


class TestRansRoundtrip:
    def test_uniform_symbols(self, rng):
        nsym, ntables = 17, 8
        freqs = np.stack([_quantize_pmf(rng.random(nsym), 14) for _ in range(ntables)])
        codec = RansCodec(freqs, offset=-8, scale_bits=14)
        vals = rng.integers(-8, 9, size=4096)
        tids = rng.integers(0, ntables, size=4096).astype(np.int32)
        stream = codec.encode(vals, tids)
        out = codec.decode(stream, tids)
        np.testing.assert_array_equal(out, vals)

    def test_skewed_compresses_near_entropy(self, rng):
        # p = [0.9, 0.05, 0.05] -> H ~ 0.569 bits/sym
        n = 20000
        vals = rng.choice([0, 1, 2], size=n, p=[0.9, 0.05, 0.05])
        codec = build_cdf_tables_from_histogram(
            vals.reshape(-1, 1), channel_axis=-1
        )
        stream = codec.encode(vals, np.zeros(n, np.int32))
        bits_per_sym = len(stream) * 8 / n
        entropy = -(0.9 * np.log2(0.9) + 2 * 0.05 * np.log2(0.05))
        assert bits_per_sym < entropy * 1.05 + 0.01
        out = codec.decode(stream, np.zeros(n, np.int32))
        np.testing.assert_array_equal(out, vals)

    def test_latent_roundtrip_nhwc(self, rng):
        lat = rng.integers(-8, 9, size=(1, 10, 20, 8))
        codec = build_cdf_tables_from_histogram(lat, channel_axis=-1)
        stream = encode_latent(codec, lat)
        out = decode_latent(codec, stream, lat.shape)
        np.testing.assert_array_equal(out, lat)

    def test_empty_ish_stream(self):
        freqs = np.stack([_quantize_pmf(np.ones(4), 10)])
        codec = RansCodec(freqs, offset=0, scale_bits=10)
        vals = np.array([1])
        stream = codec.encode(vals, np.zeros(1, np.int32))
        out = codec.decode(stream, np.zeros(1, np.int32))
        np.testing.assert_array_equal(out, vals)


class TestBitEstimatorTables:
    def test_tables_and_roundtrip(self, key, rng):
        from iclr_17_compression_tpu.ops.entropy import bit_estimator_init

        params = bit_estimator_init(key, 4)
        codec = build_cdf_tables_from_bit_estimator(params, -32, 32)
        assert codec.ntables == 4
        assert codec.nsym == 65
        lat = rng.integers(-5, 6, size=(1, 6, 6, 4))
        stream = encode_latent(codec, lat)
        out = decode_latent(codec, stream, lat.shape)
        np.testing.assert_array_equal(out, lat)

    def test_rans_beats_gzip_on_model_latents(self, key, rng):
        """The whole point of replacing the reference's gzip proxy."""
        from iclr_17_compression_tpu.ops.entropy import bit_estimator_init

        # near-laplacian latents, the regime learned codes live in
        lat = np.round(rng.standard_normal((1, 32, 32, 8)) * 3).astype(np.int64)
        n_pix = 32 * 32
        codec = build_cdf_tables_from_histogram(lat, channel_axis=-1)
        stream = encode_latent(codec, lat)
        bpp_rans = len(stream) * 8 / n_pix
        bpp_gz = gzip_bpp(lat.astype(np.float32), n_pix, offset=128.0)
        assert bpp_rans < bpp_gz
