#!/usr/bin/env python
"""Layout experiment: hologan's 3D ConvTranspose stages (VERDICT r4 #3).

Hypothesis under test: the stride-2 (3,3,3) ConvTranspose3d stages
(4³×512→8³×128 and 8³×64... production: →16³×64) underfill the MXU in
NDHWC because the transposed conv scatters into a dilated output — a
phase-decomposed reformulation (ONE dense (2,2,2)-phase conv producing
8·C_out channels, then a depth-to-space shuffle) presents XLA one
full-lane matmul per stage instead of eight scattered ones.

Measures per-call DEVICE time (profiler trace over R queued async
dispatches) for both formulations at the two production stage shapes,
checks numerical equivalence (exact: rel_err 0.0), and prints one JSON
line per stage.

MEASURED RESULT (round 5, v5e, batch 32, bf16): NEGATIVE — the phase
decomposition loses roughly 2x everywhere:

  block1 4³×512→8³×128: fwd 0.054 ms convT vs 0.115 ms phase;
                        bwd 0.144 vs 0.278
  block2 8³×128→16³×64: fwd 0.141 vs 0.291; bwd 0.186 vs 0.289

XLA's own conv_transpose lowering already keeps the MXU fed at these
shapes; the phase form pays for the d2s shuffle (an 8-way strided
transpose of the whole activation) more than it saves on lane occupancy.
Corollary that matters more: the ENTIRE ConvTranspose3d stack costs
~0.53 ms fwd+bwd per update ≈ 1.6 ms of hologan's 15.24 ms superstep
(~10%) — it was never the bottleneck. The hologan roofline record lives
in BASELINE.md "hologan bound".

Usage: python tools/layout_experiment_hologan.py [batch] [repeats]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def conv_t(x, w):
    """Reference: jax transposed conv, NDHWC, stride 2, kernel 3, SAME —
    what flax nn.ConvTranspose lowers to (models/hologan.py GenBlock3D)."""
    return jax.lax.conv_transpose(
        x, w, strides=(2, 2, 2), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_phase(x, wp):
    """Phase-decomposed equivalent: dense stride-1 (2,2,2) conv producing
    8·C_out channels, then depth-to-space. wp: (2,2,2,Cin,8*Cout)."""
    b, d, h, w_, ci = x.shape
    co8 = wp.shape[-1]
    co = co8 // 8
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1, 1, 1), padding=[(1, 0), (1, 0), (1, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # y: (b, d, h, w, 8*co) -> interleave phases into doubled spatial dims
    y = y.reshape(b, d, h, w_, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, 2 * d, 2 * h, 2 * w_, co)


def phase_pack(w):
    """Map the (3,3,3,Cin,Cout) transposed-conv kernel onto the
    (2,2,2,Cin,8*Cout) phase kernel so conv_phase == conv_t exactly.

    Measured convention (impulse test on the chip): jax conv_transpose
    (SAME, k=3, s=2) computes out[2i + (2-t)] += x[i]*w[t]. For output
    phase p = o % 2 the input offset is di = (p + t - 2)/2 in {-1, 0}
    (taps of matching parity only), which the stride-1 kernel-2 dense conv
    with padding (1, 0) realises at tap index kk = di + 1."""
    k = np.zeros((2, 2, 2) + w.shape[3:] + (8,), w.dtype)
    w = np.asarray(w)
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                p = (pz * 2 + py) * 2 + px
                for tz in range(3):
                    for ty in range(3):
                        for tx in range(3):
                            dz, rz = divmod(p // 4 + tz - 2, 2)
                            dy, ry = divmod((p // 2) % 2 + ty - 2, 2)
                            dx, rx = divmod(p % 2 + tx - 2, 2)
                            if rz or ry or rx:
                                continue
                            iz, iy, ix = 1 + dz, 1 + dy, 1 + dx
                            if not (0 <= iz < 2 and 0 <= iy < 2
                                    and 0 <= ix < 2):
                                continue
                            k[iz, iy, ix, ..., p] += w[tz, ty, tx]
    # (2,2,2,Cin,Cout,8) -> (2,2,2,Cin,8*Cout) with phase-major channel
    k = np.moveaxis(k, -1, -2)
    return jnp.asarray(k.reshape(k.shape[:4] + (-1,)))


def bench_fn(f, args, repeats, tag):
    """Device time per call from a profiler trace of `repeats` queued async
    dispatches — host wall through the axon tunnel is ~40 ms RTT per fetch
    and would swamp these sub-ms ops (first version of this tool measured
    exactly that: every cell read 40-57 ms)."""
    import shutil

    from lightning_gan_zoo_tpu.utils.profiling import device_time_ms
    y = f(*args)   # compile
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
    trace_dir = f"/tmp/layout_trace/{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(repeats):
            y = f(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
    return device_time_ms(trace_dir) / repeats


def run_stage(name, b, d, ci, co, repeats, dtype):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = (jax.random.normal(kx, (b, d, d, d, ci)) * 0.3).astype(dtype)
    w = (jax.random.normal(kw, (3, 3, 3, ci, co)) * 0.05).astype(dtype)
    wp = phase_pack(w).astype(dtype)

    # equivalence first (f32 to isolate packing math)
    y_ref = conv_t(x.astype(jnp.float32), w.astype(jnp.float32))
    y_new = conv_phase(x.astype(jnp.float32), wp.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(y_ref - y_new)))
    scale = float(jnp.max(jnp.abs(y_ref))) or 1.0

    f_t = jax.jit(conv_t)
    f_p = jax.jit(conv_phase)
    fwd_t = bench_fn(f_t, (x, w), repeats, f"{name}_fwd_t")
    fwd_p = bench_fn(f_p, (x, wp), repeats, f"{name}_fwd_p")

    def loss_t(x, w):
        return jnp.sum(jnp.square(conv_t(x, w).astype(jnp.float32)))

    def loss_p(x, wp):
        return jnp.sum(jnp.square(conv_phase(x, wp).astype(jnp.float32)))

    g_t = jax.jit(jax.grad(loss_t, argnums=(0, 1)))
    g_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    bwd_t = bench_fn(g_t, (x, w), repeats, f"{name}_bwd_t")
    bwd_p = bench_fn(g_p, (x, wp), repeats, f"{name}_bwd_p")

    print(json.dumps({
        "stage": name, "shape": [b, d, d, d, ci], "cout": co,
        "rel_err": round(err / scale, 6),
        "fwd_ms": {"conv_transpose": round(fwd_t, 3),
                   "phase_conv_d2s": round(fwd_p, 3)},
        "bwd_ms": {"conv_transpose": round(bwd_t, 3),
                   "phase_conv_d2s": round(bwd_p, 3)},
    }), flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    dtype = jnp.bfloat16
    # production hologan stages (models/hologan.py Generator: f=64)
    run_stage("block1_4to8", b, 4, 512, 128, repeats, dtype)
    run_stage("block2_8to16", b, 8, 128, 64, repeats, dtype)


if __name__ == "__main__":
    main()
