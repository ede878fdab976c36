#!/usr/bin/env python
"""Staged hardware validation for unproven Pallas kernels.

One stage per process invocation so a wedged Mosaic remote-compile (the
round-3 tunnel death, ROADMAP.md) is bounded by the caller's `timeout`
and leaves the next stage runnable once the tunnel recovers:

    timeout 300 python tools/validate_kernels_hw.py adain_tiny
    timeout 300 python tools/validate_kernels_hw.py adain_full
    timeout 420 python tools/validate_kernels_hw.py resnet_tiny
    timeout 600 python tools/validate_kernels_hw.py resnet_full

Each stage compiles + runs the kernel forward AND backward at the stated
shape, checks parity vs the plain-XLA reference, and prints one
`OK <stage> fwd+bwd max_err=...` line.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _report(stage, got, want):
    import numpy as np
    err = float(np.max(np.abs(np.asarray(got, np.float32)
                              - np.asarray(want, np.float32))))
    print(f"OK {stage} max_err={err:.3e}")


def _adain(shape, stage):
    import jax
    import jax.numpy as jnp

    from lightning_gan_zoo_tpu.ops.pallas.adain import (fused_adain_act,
                                                        plain_adain_act)
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    c = shape[-1]
    x = (jax.random.normal(k[0], shape) * 1.5).astype(jnp.bfloat16)
    s = (jax.random.normal(k[1], (shape[0], c)) + 1.0).astype(jnp.bfloat16)
    b = jax.random.normal(k[2], (shape[0], c)).astype(jnp.bfloat16)

    def loss(fn, x, s, b):
        return jnp.sum(jnp.square(fn(x, s, b)))

    fused = jax.jit(jax.value_and_grad(
        lambda *a: loss(lambda x, s, b: fused_adain_act(x, s, b, 1e-8),
                        *a), argnums=(0, 1, 2)))
    plain = jax.jit(jax.value_and_grad(
        lambda *a: loss(lambda x, s, b: plain_adain_act(x, s, b, 1e-8),
                        *a), argnums=(0, 1, 2)))
    (v1, g1) = fused(x, s, b)
    (v0, g0) = plain(x, s, b)
    jax.block_until_ready(g1)
    print(f"  value fused={float(v1):.4f} plain={float(v0):.4f}")
    _report(stage, g1[0], g0[0])


def _resnet(shape, fh, fo, stage):
    import jax
    import jax.numpy as jnp

    from lightning_gan_zoo_tpu.ops.pallas.resnet_block import (
        eligible, fused_block_core, plain_core)
    assert eligible(shape[1], shape[2], shape[3], fh, fo), "ineligible shape"
    k = jax.random.split(jax.random.PRNGKey(1), 5)
    x = (jax.random.normal(k[0], shape) * 0.8).astype(jnp.bfloat16)
    w1 = jax.random.normal(k[1], (3, 3, shape[3], fh)) * 0.1
    b1 = jax.random.normal(k[2], (fh,)) * 0.1
    w2 = jax.random.normal(k[3], (3, 3, fh, fo)) * 0.1
    b2 = jax.random.normal(k[4], (fo,)) * 0.1

    def loss(fn, x, w1, b1, w2, b2):
        return jnp.sum(jnp.square(fn(x, w1, b1, w2, b2)))

    fused = jax.jit(jax.value_and_grad(
        lambda *a: loss(fused_block_core, *a), argnums=(0, 1, 3)))
    plain = jax.jit(jax.value_and_grad(
        lambda *a: loss(plain_core, *a), argnums=(0, 1, 3)))
    v1, g1 = fused(x, w1, b1, w2, b2)
    v0, g0 = plain(x, w1, b1, w2, b2)
    jax.block_until_ready(g1)
    print(f"  value fused={float(v1):.4f} plain={float(v0):.4f}")
    _report(stage, g1[1], g0[1])


STAGES = {
    "adain_tiny": lambda: _adain((2, 8, 8, 64), "adain_tiny"),
    "adain_full": lambda: _adain((32, 64, 64, 64), "adain_full"),
    "resnet_tiny": lambda: _resnet((2, 8, 8, 16), 16, 16, "resnet_tiny"),
    "resnet_full": lambda: _resnet((8, 128, 128, 16), 16, 16, "resnet_full"),
}


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "adain_tiny"
    import jax
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    STAGES[stage]()
