from .api import (
    RansCodec,
    build_cdf_tables_from_bit_estimator,
    build_cdf_tables_from_histogram,
    encode_latent,
    decode_latent,
    gzip_bpp,
)

__all__ = [
    "RansCodec",
    "build_cdf_tables_from_bit_estimator",
    "build_cdf_tables_from_histogram",
    "encode_latent",
    "decode_latent",
    "gzip_bpp",
]
