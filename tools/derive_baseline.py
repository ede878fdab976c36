"""Derive defensible reference-GPU throughput anchors from measured FLOPs.

The reference (ebartrum/lightning_gan_zoo) publishes no benchmark numbers
and cannot run in this environment (no GPU, no torch-cuda), so the
volumetric rows of BASELINE.md have carried "TBM" since round 1. This tool
replaces TBM with a DERIVED anchor, clearly labelled as such:

    derived_ref_img_per_sec = gpu_peak_flops * utilisation / flops_per_image

- ``flops_per_image`` comes from XLA's own cost model on OUR superstep
  (lowered at the bench shapes; the reference computes the same math — G+D
  forward+backward at the family's disc:gen ratio — so analytic FLOPs per
  trained image are architecture-level facts, not implementation details.
  Where the two differ (e.g. the reference's chunked NeRF renderer adds
  overhead), the derived anchor OVERESTIMATES the reference, making our
  vs_baseline claims conservative).
- ``gpu_peak_flops`` defaults to a V100-SXM2's 125 TF/s fp16 tensor-core
  peak (the class of single GPU the reference's era/config targets).
- ``utilisation`` defaults to 0.20 — the middle of the 15-25% end-to-end
  MFU band that small-batch GAN training steps with per-step host RNG +
  dataloader round-trips typically reach on GPUs (the reference samples
  noise on host every step, lightning_module.py:107, and reloads
  dataloaders every epoch, run_network.py:69; published MLPerf-style
  utilisation for conv nets of this size lands in the same band).

Output: one JSON line per family with flops/img and the derived anchor at
15/20/25% utilisation. Run on CPU (compile-only cost analysis, one step
executed only to validate shapes):

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/derive_baseline.py [family ...]
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Bench scoreboard shapes (BASELINE.md tables / bench.py scoreboard).
BENCH_SHAPES = {
    "dc_gan": dict(batch=128, img=64),
    "wgan": dict(batch=64, img=64),
    "wgan_gp": dict(batch=64, img=64),
    "gan_stability_r1": dict(batch=64, img=128),
    "hologan": dict(batch=32, img=64),
    "pigan": dict(batch=32, img=64),
    "anigan": dict(batch=32, img=64),
}

V100_FP16_PEAK = 125e12      # tensor-core peak, V100-SXM2
# 5% = what small-batch GAN steps with host-side per-step RNG and
# PL-Python dispatch actually reach end-to-end (the long-documented
# 2500 img/s dc_gan anchor corresponds to 4.3% of V100 peak at the
# measured 2.15 GFLOP/img); 15-25% = an optimistic ceiling band for a
# perfectly-tuned reference. Quoting the range keeps the derived anchor
# honest in both directions.
UTILISATIONS = (0.05, 0.15, 0.25)


def derive_one(family: str) -> dict:
    import jax

    from lightning_gan_zoo_tpu.parallel import mesh as pmesh
    from lightning_gan_zoo_tpu.parallel.family_runs import (
        build_family, make_family_batches)
    from lightning_gan_zoo_tpu.runtime.state import create_train_state
    from lightning_gan_zoo_tpu.runtime.steps import (build_superstep,
                                                     microbatch_count)

    shape = BENCH_SHAPES[family]
    batch, img = shape["batch"], shape["img"]
    mesh = pmesh.make_mesh(1)
    cfg, task = bench_family(family, batch, img)
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    state = pmesh.put_state(
        create_train_state(g_vars, d_vars, g_tx, d_tx,
                           extra=task.initial_extra()), mesh)
    df = int(cfg.optimisation.disc_freq)
    gf = int(cfg.optimisation.gen_freq)
    step = pmesh.shard_superstep(build_superstep(task, g_tx, d_tx, df, gf),
                                 mesh, donate_state=False)
    batches = jax.device_put(make_family_batches(cfg, family, batch),
                             pmesh.batch_sharding(mesh))
    cost = step.lower(state, batches, jax.random.PRNGKey(1)) \
        .compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops_per_superstep = float(cost["flops"])
    n_micro = microbatch_count(df, gf)
    images_per_superstep = batch * n_micro
    flops_per_image = flops_per_superstep / images_per_superstep

    row = {
        "family": family, "batch": batch, "img": img,
        "disc_freq": df, "gen_freq": gf,
        "tflops_per_superstep": round(flops_per_superstep / 1e12, 4),
        "gflops_per_trained_image": round(flops_per_image / 1e9, 3),
        "derived_ref_img_per_sec": {
            f"{int(u * 100)}%": round(V100_FP16_PEAK * u / flops_per_image, 1)
            for u in UTILISATIONS},
        "anchor_basis": "V100 125 TF/s fp16 peak x utilisation band; "
                        "FLOPs from XLA cost model at bench shapes",
    }
    return row


def bench_family(family: str, batch: int, img: int):
    """Full-size (bench-shape) config — NOT the tiny dryrun overrides."""
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate

    # mirror bench.py's scoreboard recipe exactly (the anchors are for the
    # BENCH rows): volumetric families run machine=local at the annealing
    # START resolution with the benched batch override
    ov = [f"+expt={family}", "dataset=synthetic", "calc_fid=False",
          "save_ckpts=False", f"train.batch_size={batch}",
          f"train.img_size={img}"]
    if family in ("pigan", "anigan"):
        ov.insert(1, "machine=local")
    cfg = compose(REPO / "conf", ov)
    task = instantiate(cfg.model.lm, cfg, "/tmp/derive_baseline")
    return cfg, task


def main(argv):
    fams = argv or list(BENCH_SHAPES)
    out = []
    for fam in fams:
        row = derive_one(fam)
        print(json.dumps(row), flush=True)
        out.append(row)
    return out


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(sys.argv[1:])
