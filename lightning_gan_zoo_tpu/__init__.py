"""lightning_gan_zoo_tpu — a TPU-native GAN zoo (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of ebartrum/lightning_gan_zoo
(reference at /root/reference, surveyed in SURVEY.md) designed TPU-first:
jitted alternating G/D training supersteps, device-mesh data parallelism via
``jax.sharding`` + pjit, bf16 compute policy, Pallas kernels for the hot
gather-heavy ops, and on-device FID/KID evaluation.
"""

__version__ = "0.1.0"
