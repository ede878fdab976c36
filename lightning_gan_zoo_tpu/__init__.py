"""lightning_gan_zoo_tpu — a TPU-native GAN zoo (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of ebartrum/lightning_gan_zoo
(reference at /root/reference, surveyed in SURVEY.md) designed TPU-first:
jitted alternating G/D training supersteps, device-mesh data parallelism via
``jax.sharding`` + pjit, bf16 compute policy, Pallas kernels for the hot
gather-heavy ops, and on-device FID/KID evaluation.
"""

__version__ = "0.1.0"

# Honour an explicit JAX_PLATFORMS=cpu request even under the axon TPU
# plugin: its sitecustomize hook registers 'axon' ahead of 'cpu' whenever
# PALLAS_AXON_POOL_IPS is set, silently moving "CPU" tool runs onto the
# remote chip (measured r5: `JAX_PLATFORMS=cpu python ...` reported
# platform=tpu). Popping the variable before jax's backend initialises
# restores the documented semantics; no-op everywhere else.
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    _os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover — jax missing/already initialised
        pass
del _os
