"""iclr_17_compression_tpu — a TPU-native learned image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch workbench Yuval-H/iclr_17_compression (Ballé et al. ICLR-2017 codec +
learned distributed-source-coding stereo models):

- ``ops``      : functional primitives (GDN, quantizers, factorized entropy
                 model, torch-parity conv/deconv wrappers, metrics) + Pallas
                 TPU kernels for the hot fused ops.
- ``nn``       : Flax modules built on ``ops`` (GDN layer, residual/attention
                 blocks, BitEstimator).
- ``models``   : end-to-end codecs (Ballé-17 baseline, Ballé-18 transforms +
                 scale hyperprior, Cheng-2020 DSC stereo family as one
                 configurable class, enhancement nets, PASSR).
- ``coding``   : real entropy coding — C++ rANS range coder on host fed by
                 on-device CDF tables (the reference only gzip'd bytes).
- ``parallel`` : mesh / spatial-tile sharding with halo exchange for
                 multi-chip encode/decode of large images.
- ``data``     : image-folder / Kodak / stereo-pair pipelines.
- ``train``    : pjit train steps, schedules, checkpointing, torch import.
- ``eval``     : R-D sweeps, stereo eval, latent analyses.

All image tensors are NHWC (TPU-native layout); reference parity is against
the NCHW PyTorch code, with conversion handled at the import/eval boundary.
"""

__version__ = "0.1.0"
