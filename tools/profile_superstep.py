#!/usr/bin/env python
"""Device-time profile of a family's train superstep.

Runs N supersteps under jax.profiler.trace and prints the top XLA ops by
device time from the captured trace.json.gz — the profile-driven-optimisation
loop used for the kernel work (ROADMAP.md "Performance").

Usage: python tools/profile_superstep.py <expt> [batch] [img] [steps]
Env:   PROF_EXTRA="k=v ..." extra config overrides.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def top_ops(trace_dir: str, n: int = 28):
    from lightning_gan_zoo_tpu.utils.profiling import (device_op_times,
                                                       device_time_ms)

    by_name = device_op_times(trace_dir)
    if not by_name:
        print(f"no trace.json.gz under {trace_dir}")
        return
    total = sum(d for d, _ in by_name.values())
    busy = device_time_ms(trace_dir)
    print(f"\n== top ops by device time (op-sum {total/1e3:.2f} ms — "
          f"fusions nest, shares are relative; device busy {busy:.2f} ms; "
          f"newest trace) ==")
    for name, (dur, cnt) in sorted(by_name.items(),
                                   key=lambda kv: -kv[1][0])[:n]:
        print(f"{dur/1e3:9.3f} ms {100*dur/max(total,1e-9):5.1f}%  "
              f"x{cnt:<4d} {name[:110]}")


def main():
    expt = sys.argv[1] if len(sys.argv) > 1 else "gan_stability_r1"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate
    from lightning_gan_zoo_tpu.parallel import mesh as pmesh
    from lightning_gan_zoo_tpu.runtime.state import create_train_state
    from lightning_gan_zoo_tpu.runtime.steps import (build_superstep,
                                                     microbatch_count)

    overrides = [f"+expt={expt}", "dataset=synthetic", "calc_fid=False",
                 "save_ckpts=False"]
    overrides += os.environ.get("PROF_EXTRA", "").split()
    if expt in ("pigan", "anigan"):
        overrides += ["machine=local"]
    cfg = compose(REPO / "conf", overrides)
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        cfg.select("variable_batch_size.batch_sizes.0")
        or cfg.train.batch_size)
    img = int(sys.argv[3]) if len(sys.argv) > 3 else int(cfg.train.img_size)
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    cfg = compose(REPO / "conf", overrides + [
        f"train.batch_size={batch}", f"train.img_size={img}"])
    task = instantiate(cfg.model.lm, cfg, "/tmp/prof")

    df, gf = int(cfg.optimisation.disc_freq), int(cfg.optimisation.gen_freq)
    mesh = pmesh.make_mesh(len(jax.devices()))
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=100)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    state = pmesh.put_replicated(
        create_train_state(g_vars, d_vars, g_tx, d_tx,
                           extra=task.initial_extra()), mesh)
    # PROF_UNROLL=1: straight-line superstep — the scanned form buries the
    # per-phase update ops inside one opaque `while` trace event
    step = pmesh.shard_superstep(
        build_superstep(task, g_tx, d_tx, df, gf,
                        unroll=os.environ.get("PROF_UNROLL") == "1"),
        mesh, donate_state=True)
    n_micro = microbatch_count(df, gf)
    batches = {
        "image": jnp.asarray(np.random.default_rng(0).normal(
            size=(n_micro, batch, img, img, 3)).astype(np.float32) * 0.5),
        "label": jnp.zeros((n_micro, batch), jnp.int32),
    }
    batches = jax.device_put(batches, pmesh.batch_sharding(mesh))

    state, metrics = step(state, batches, jax.random.PRNGKey(0))
    float(metrics["d_loss"])  # tunnel fence

    trace_dir = os.environ.get("PROF_DIR", "/tmp/prof_trace") + f"/{expt}"
    import shutil
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, metrics = step(state, batches, jax.random.PRNGKey(i + 1))
        float(metrics["d_loss"])
    print(f"[trace at {trace_dir}] {steps} supersteps × {batch*n_micro} "
          f"images")
    top_ops(trace_dir)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--parse":
        top_ops(sys.argv[2])
    else:
        main()
