"""tdgp — a TPU-native 3D GAN framework (rebuild of snap-research/3dgp).

A ground-up JAX/XLA/Pallas re-design of 3DGP ("3D generation on ImageNet",
ICLR 2023): an EpiGRAF-style tri-plane NeRF GAN with a learnable camera
generator, a depth adaptor feeding an RGB-D discriminator, and knowledge
distillation into the discriminator — trained patch-wise on single-view 2D
image collections with no ground-truth cameras.

Everything here is TPU-first: NHWC layouts, bf16 compute on the MXU,
functional models (flax.linen) under a single jitted train step, data
parallelism over a `jax.sharding.Mesh` via shard_map + pmean, and Pallas
kernels for the hot ops (tri-plane ray rendering, upfirdn2d).

Reference parity map lives in SURVEY.md; citations into the reference
(`/root/reference/...`) appear as `ref: file:line` in docstrings.
"""

__version__ = "0.1.0"
