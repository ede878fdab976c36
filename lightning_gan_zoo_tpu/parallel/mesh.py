"""Device mesh + sharding helpers (the DDP/NCCL replacement).

The reference scales with one-process-per-GPU PL DDP and NCCL gradient
all-reduce (run_network.py:66). TPU-native equivalent: a single-controller
``jax.sharding.Mesh`` over the chips, the train superstep jitted with the
batch sharded along the 'data' axis and the state replicated — XLA inserts
the gradient psum over ICI automatically.

``cfg.num_gpus`` (reference key, conf/config.yaml:4) selects how many local
devices join the mesh. ``cfg.num_sp`` (TPU-native extra — the reference's
DDP has no counterpart) adds a second 'sp' mesh axis that the NeRF
volumetric renderer shards its RAYS over: π-GAN/ANIGAN train at reference
batch sizes as small as 4 (conf/machine/local.yaml), so pure data
parallelism stops scaling at 4 chips — ray sharding keeps every chip busy
on a slice of the per-image ray grid instead (the scaling-book "sequence
parallel" recipe applied to rays).
"""
from __future__ import annotations

import contextvars
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, sp: int = 1) -> Mesh:
    devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:4]]}...)")
        devices = devices[:num_devices]
    sp = int(sp or 1)
    if sp > 1:
        if len(devices) % sp:
            raise ValueError(
                f"num_sp={sp} does not divide the {len(devices)}-device mesh")
        # sp is the minor (fastest-varying) axis: ray-shard collectives ride
        # the shortest ICI hops, the gradient psum crosses both axes anyway
        arr = np.asarray(devices).reshape(len(devices) // sp, sp)
        return Mesh(arr, ("data", "sp"))
    return Mesh(np.asarray(devices), ("data",))


# ---------------------------------------------------------------------------
# Trace-time mesh context: modules deep inside a jitted superstep (the NeRF
# renderer, the Pallas partition rules) need the active mesh to place
# with_sharding_constraint on internal tensors. jax's own contexts don't
# carry it through tracing, so shard_superstep (and tests) wrap the traced
# function with mesh_context.

_MESH_CTX: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "lgzt_mesh", default=None)


class mesh_context:
    """``with mesh_context(mesh): ...`` — also usable as a fn wrapper via
    :func:`with_mesh_context`. Re-entrant."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        self._tok = _MESH_CTX.set(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _MESH_CTX.reset(self._tok)
        return False


def with_mesh_context(fn, mesh: Optional[Mesh]):
    def wrapped(*args, **kwargs):
        with mesh_context(mesh):
            return fn(*args, **kwargs)
    return wrapped


def current_mesh() -> Optional[Mesh]:
    return _MESH_CTX.get()


def sp_size() -> int:
    """Size of the ray-sharding axis of the active mesh (1 = off)."""
    mesh = current_mesh()
    if mesh is None or "sp" not in mesh.axis_names:
        return 1
    return int(mesh.shape["sp"])


def shard_rays(x: jax.Array, ray_axis: int = 1) -> jax.Array:
    """Constrain a (batch, rays, ...) tensor to batch-over-'data' ×
    rays-over-'sp'. No-op when no sp mesh is active or the ray count does
    not divide."""
    mesh = current_mesh()
    n_sp = sp_size()
    if n_sp <= 1 or x.shape[ray_axis] % n_sp:
        return x
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[ray_axis] = "sp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def unshard_rays(x: jax.Array) -> jax.Array:
    """Constrain back to plain batch sharding (rays replicated over 'sp') —
    the hand-off point from the ray-parallel renderer to the image-space
    discriminator."""
    mesh = current_mesh()
    if sp_size() <= 1:
        return x
    spec = [None] * x.ndim
    spec[0] = "data"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, stacked: bool = True,
                   folded: bool = False) -> NamedSharding:
    """Micro-batch-stacked pytrees are [n_micro, batch, ...]: shard the batch
    axis (axis 1); folded megastep batches are [fold, n_micro, batch, ...]
    (axis 2); plain batches shard axis 0."""
    if folded:
        return NamedSharding(mesh, P(None, None, "data"))
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


def shard_superstep(superstep, mesh: Mesh, donate_state: bool = True,
                    folded: bool = False):
    """jit the superstep with state replicated and batches data-sharded.

    The traced function runs under :func:`mesh_context` so ray-level
    sharding constraints inside the NeRF renderer see the active mesh."""
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, stacked=True, folded=folded)
    return jax.jit(
        with_mesh_context(superstep, mesh),
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def put_batch(tree: Any, mesh: Mesh, *, stacked: bool = True,
              folded: bool = False) -> Any:
    """Stage a host-local batch onto the mesh's batch sharding.

    Single-process: plain device_put. Multi-process (LGZT_MULTIHOST — the
    reference's DistributedSampler counterpart): every process holds only
    its stripe of the global batch (data/pipeline.EpochLoader stripes by
    process_index), and the global array is assembled from the per-process
    shards without any cross-host copy."""
    sh = batch_sharding(mesh, stacked=stacked, folded=folded)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def is_main_process() -> bool:
    """rank_zero_only equivalent (reference figures/types.py:61)."""
    return jax.process_index() == 0
