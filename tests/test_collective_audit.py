"""Compiled-HLO collective audit (VERDICT r4 #6): pin the collective
inventory GSPMD inserts for each parallelism config on the virtual 8-device
mesh, so a partitioner regression cannot silently turn tensor parallelism
into replication (or replication into resharding traffic) without a test
going red.

The reference's only collective is DDP's gradient all-reduce
(/root/reference/run_network.py:66, PL DDP → NCCL); every extra axis here
(tp/sp/ZeRO/FSDP) is a beyond-reference TPU feature whose signature in the
compiled module is asserted below.

Assertions are structural (presence/absence + ordering relations), not
exact op counts — XLA is free to split or fuse collectives between
versions, but it cannot run tensor-parallel convs without gathering /
reducing somewhere, and it must not insert gathers into a purely
replicated data-parallel step.
"""
import re

import jax
import pytest

from tests.conftest import CONF_DIR
from lightning_gan_zoo_tpu.parallel import mesh as pmesh
from lightning_gan_zoo_tpu.parallel.family_runs import (build_family,
                                                        make_family_batches)
from lightning_gan_zoo_tpu.runtime.state import create_train_state
from lightning_gan_zoo_tpu.runtime.steps import build_superstep

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def collective_inventory(family, mesh, batch=16, zero=False, fsdp=False,
                         tp_min_shard=8):
    """Op-definition counts of each collective kind in the compiled HLO of
    the full sharded superstep (the exact production jit)."""
    n_dev = mesh.devices.size
    cfg, task = build_family(CONF_DIR, family, batch, num_devices=n_dev)
    d_tx, g_tx = task.configure_optimizers(steps_per_epoch=4)
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    state = create_train_state(g_vars, d_vars, g_tx, d_tx,
                               extra=task.initial_extra())
    state = pmesh.put_state(state, mesh, min_shard=tp_min_shard, zero=zero,
                            fsdp=fsdp)
    state_sh = (pmesh.state_shardings(state, mesh, tp_min_shard, zero=zero,
                                      fsdp=fsdp)
                if pmesh.tp_size_of(mesh) > 1 or zero or fsdp else None)
    step = pmesh.shard_superstep(
        build_superstep(task, g_tx, d_tx,
                        int(cfg.optimisation.disc_freq),
                        int(cfg.optimisation.gen_freq)),
        mesh, donate_state=False, state_sh=state_sh)
    batches = jax.device_put(make_family_batches(cfg, family, batch),
                             pmesh.batch_sharding(mesh))
    txt = (step.lower(state, batches, jax.random.PRNGKey(1))
           .compile().as_text())
    # count op DEFINITIONS: `%all-reduce.3 = f32[...] all-reduce(...)` (and
    # the async `-start` forms) — uses reference `%all-reduce.3` without a
    # paren, so `kind(` with a word boundary counts each def exactly once
    return {k: len(re.findall(rf"\b{k}(?:-start)?\(", txt))
            for k in COLLECTIVES}


def test_dp_pure_allreduce():
    """8-way data parallel: the gradient psum all-reduces exist and NOTHING
    reshards — params are replicated, so any all-gather/reduce-scatter in
    the module is a partitioner regression (replication silently becoming
    resharding traffic)."""
    inv = collective_inventory("dc_gan", pmesh.make_mesh(8))
    assert inv["all-reduce"] >= 1, inv
    assert inv["all-gather"] == 0, inv
    assert inv["reduce-scatter"] == 0, inv
    assert inv["all-to-all"] == 0, inv


def test_dp_grad_of_grad_pure_allreduce():
    """WGAN-GP's double backward under dp keeps the same pure-psum
    signature — the penalty's grad-of-grad must not introduce resharding."""
    inv = collective_inventory("wgan_gp", pmesh.make_mesh(8))
    assert inv["all-reduce"] >= 1, inv
    assert inv["all-gather"] == 0, inv
    assert inv["reduce-scatter"] == 0, inv


def test_tp_actually_shards():
    """dp=2 x tp=4: channel-sharded weights MUST produce gather/reduce
    traffic in the conv graph. Zero all-gathers would mean GSPMD silently
    replicated the weights (the regression this file exists to catch)."""
    inv = collective_inventory("dc_gan", pmesh.make_mesh(8, tp=4))
    assert inv["all-reduce"] >= 1, inv
    assert inv["all-gather"] >= 1, (
        f"tp=4 compiled with no all-gathers — tensor parallelism silently "
        f"became replication: {inv}")


def test_zero1_gathers_param_updates():
    """ZeRO-1: moments shard over 'data', grads stay replicated after the
    psum, and the elementwise update runs sharded — so the module must
    all-gather the param updates on top of dp's baseline (which has 0)."""
    inv = collective_inventory("dc_gan", pmesh.make_mesh(8), zero=True)
    assert inv["all-reduce"] >= 1, inv
    assert inv["all-gather"] >= 1, (
        f"zero_opt=true compiled with no all-gathers — moment sharding "
        f"silently became replication: {inv}")


def test_fsdp_gathers_params_at_use():
    """FSDP/ZeRO-3: params shard over ('data','tp'); forward+backward must
    gather weights at use (all-gather) and reduce the grads (all-reduce or
    reduce-scatter depending on backend lowering)."""
    inv = collective_inventory("dc_gan", pmesh.make_mesh(8), fsdp=True)
    assert inv["all-gather"] >= 1, (
        f"fsdp=true compiled with no all-gathers — param sharding "
        f"silently became replication: {inv}")
    assert inv["all-reduce"] + inv["reduce-scatter"] >= 1, inv


@pytest.mark.slow
def test_sp_ray_sharding_collects():
    """dp=2 x sp=4: the NeRF renderer partitions rays over 'sp'
    (nerf/renderer.shard_rays); reassembling images / reducing grads over
    the sp axis must emit gather+reduce traffic."""
    inv = collective_inventory("pigan", pmesh.make_mesh(8, sp=4))
    assert inv["all-reduce"] >= 1, inv
    assert inv["all-gather"] >= 1, (
        f"num_sp=4 compiled with no all-gathers — ray sharding silently "
        f"became replication: {inv}")
