#!/usr/bin/env python
"""Staged hardware validation for the production Pallas kernels.

One stage per process invocation so a wedged Mosaic remote-compile (the
round-3 tunnel death, ROADMAP.md) is bounded by the caller's `timeout`
and leaves the next stage runnable once the tunnel recovers:

    timeout 300 python tools/validate_kernels_hw.py trilinear_tiny
    timeout 600 python tools/validate_kernels_hw.py trilinear_full
    timeout 300 python tools/validate_kernels_hw.py siren_tiny
    timeout 600 python tools/validate_kernels_hw.py siren_full

Each stage compiles + runs the kernel forward AND backward at the stated
shape, checks parity vs the plain-XLA reference, and prints one
`OK <stage> max_err=...` line — or a `FAIL` line and exit code 1 when the
relative error exceeds TOL_REL (so automation gates on parity, not just
on crash/timeout).

History: this tool's original stages validated the two then-pending
kernels (fused AdaIN epilogue, fused ResNet block). Both passed
correctness on hardware (round 5) but REGRESSED their e2e supersteps in
the A/B, so the kernels were deleted — see BASELINE.md "kernel verdicts".
The remaining stages cover the two kernels that ship enabled: the
trilinear MXU resample (hologan) and the fused FiLM-SIREN trunk (pigan).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# Parity gate: the kernels run their streams in bf16 (~2-3 decimal digits)
# against an f32-accumulating XLA reference, so 5e-2 RELATIVE to the
# reference's max magnitude is the pass line (the CPU interpret-mode tests
# see ~1e-2; a broken kernel is orders of magnitude off, not percent).
TOL_REL = 5e-2


def _gate(stage, err, ref_mag):
    import math
    rel = err / max(1e-6, ref_mag)
    if not math.isfinite(err) or rel > TOL_REL:
        print(f"FAIL {stage} max_err={err:.3e} rel={rel:.3e} "
              f"(tol rel={TOL_REL})")
        sys.exit(1)
    print(f"OK {stage} max_err={err:.3e} rel={rel:.3e}")


def _report(stage, got, want):
    import numpy as np
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)))
    _gate(stage, err, float(np.max(np.abs(want))))


def _trilinear(b, d, c, stage):
    import jax
    import jax.numpy as jnp

    from lightning_gan_zoo_tpu.ops.grid_sample import trilinear_resample
    from lightning_gan_zoo_tpu.ops.pallas.trilinear import (
        trilinear_resample_mxu)
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    vox = jax.random.normal(k[0], (b, d, d, d, c))
    coords = jax.random.uniform(k[1], (b, d * d * d, 3),
                                minval=-0.5, maxval=d - 0.5)

    def loss(fn, vox, coords):
        return jnp.sum(jnp.square(fn(vox, coords)))

    mxu = jax.jit(jax.value_and_grad(
        lambda *a: loss(trilinear_resample_mxu, *a), argnums=(0,)))
    ref = jax.jit(jax.value_and_grad(
        lambda *a: loss(trilinear_resample, *a), argnums=(0,)))
    v1, g1 = mxu(vox, coords)
    v0, g0 = ref(vox, coords)
    jax.block_until_ready(g1)
    print(f"  value mxu={float(v1):.4f} ref={float(v0):.4f}")
    _report(stage, g1[0], g0[0])


def _siren(b, m, stage):
    """Fused vs plain through the IN-MODULE dispatch (SirenNet.fused),
    matching tests/test_siren_trunk.py::test_module_fused_dispatch_*
    but with the REAL (non-interpret) kernel on the chip."""
    import jax
    import jax.numpy as jnp

    from lightning_gan_zoo_tpu.nerf.siren import SirenNet
    HID, NL = 64, 4
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k[0], (b, m, 3))
    gam = jax.random.normal(k[1], (b, NL, HID)) * 0.1 + 1.0
    bet = jax.random.normal(k[2], (b, NL, HID)) * 0.1
    plain = SirenNet(HID, HID, NL, dtype=jnp.bfloat16, fused=False)
    fused = SirenNet(HID, HID, NL, dtype=jnp.bfloat16, fused=True)
    variables = plain.init(jax.random.PRNGKey(2), x, gam, bet)

    def loss(net, v, x, gam, bet):
        return jnp.sum(jnp.square(
            net.apply(v, x, gam, bet).astype(jnp.float32)))

    f1 = jax.jit(jax.value_and_grad(
        lambda v: loss(fused, v, x, gam, bet)))
    f0 = jax.jit(jax.value_and_grad(
        lambda v: loss(plain, v, x, gam, bet)))
    v1, g1 = f1(variables)
    v0, g0 = f0(variables)
    jax.block_until_ready(g1)
    print(f"  value fused={float(v1):.4f} plain={float(v0):.4f}")
    l1 = jax.tree_util.tree_leaves(g1)
    l0 = jax.tree_util.tree_leaves(g0)
    import numpy as np
    err = max(float(np.max(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b0, np.float32))))
              for a, b0 in zip(l1, l0))
    ref_mag = max(float(np.max(np.abs(np.asarray(b0, np.float32))))
                  for b0 in l0)
    _gate(stage, err, ref_mag)


STAGES = {
    "trilinear_tiny": lambda: _trilinear(2, 8, 8, "trilinear_tiny"),
    "trilinear_full": lambda: _trilinear(32, 16, 64, "trilinear_full"),
    "siren_tiny": lambda: _siren(2, 256, "siren_tiny"),
    "siren_full": lambda: _siren(8, 4096, "siren_full"),
}


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "trilinear_tiny"
    import jax
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    STAGES[stage]()
