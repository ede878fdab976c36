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

``cfg.num_tp`` (TPU-native extra) adds a 'tp' tensor-parallel axis: model
parameters, their optimizer moments and the EMA twin shard their trailing
output-channel/feature axis over 'tp' (:func:`state_shardings`), and GSPMD
propagates the channel sharding through the conv/dense graph, inserting
the activation all-gathers / gradient reduce-scatters over ICI. This is
the scaling-book "annotate weights, let XLA place collectives" recipe —
it divides per-chip optimizer/parameter memory AND per-layer MXU work by
tp, which matters once `data` alone can no longer grow (GAN batches are
semantically capped: WGAN-GP's penalty statistics and BN stats change with
global batch). Validated by 1-device-vs-mesh equivalence in
tests/test_tp.py for ALL seven families (incl. R1's grad-of-grad through
sharded weights and the Pallas-kernel families); the NeRF families
usually prefer 'sp', which shards work rather than weights.
"""
from __future__ import annotations

import contextvars
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, sp: int = 1,
              tp: int = 1) -> Mesh:
    devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(
                f"Requested {num_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:4]]}...)")
        devices = devices[:num_devices]
    sp, tp = int(sp or 1), int(tp or 1)
    if sp * tp > 1:
        if len(devices) % (sp * tp):
            raise ValueError(
                f"num_sp={sp} x num_tp={tp} does not divide the "
                f"{len(devices)}-device mesh")
        # sp/tp are the minor (fastest-varying) axes: per-layer activation
        # all-gathers and ray-shard collectives ride the shortest ICI hops,
        # the gradient psum crosses every axis anyway
        shape = [len(devices) // (sp * tp)]
        names = ["data"]
        if sp > 1:
            shape.append(sp)
            names.append("sp")
        if tp > 1:
            shape.append(tp)
            names.append("tp")
        arr = None
        if jax.process_count() == 1 and len(devices) == len(jax.devices()):
            # single-controller TPU slice: let mesh_utils place the axes on
            # the physical ICI torus (minor axes on nearest-neighbour
            # rings) instead of raw enumeration order. Multi-process keeps
            # the process-major order — the host-local tp/sp-group
            # contract (gather_tree, batch striping) depends on it.
            try:
                from jax.experimental import mesh_utils
                arr = mesh_utils.create_device_mesh(tuple(shape),
                                                    devices=devices)
            except Exception as e:  # noqa: BLE001 — odd topologies/subsets
                print(f"[mesh] topology-aware placement unavailable "
                      f"({type(e).__name__}: {e}); using enumeration "
                      f"order", flush=True)
                arr = None
        if arr is None:
            arr = np.asarray(devices).reshape(shape)
        return Mesh(arr, tuple(names))
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


def tp_size_of(mesh: Optional[Mesh]) -> int:
    """Size of a mesh's tensor-parallel axis (1 = off)."""
    if mesh is None or "tp" not in mesh.axis_names:
        return 1
    return int(mesh.shape["tp"])


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


def _tp_leaf_spec(shape, tp: int, min_shard: int) -> P:
    """Trailing-axis ('tp') spec for one parameter leaf, or replicated.

    Shape-based on purpose: Adam moments mirror param shapes exactly, so
    the same rule shards optimizer state consistently with its parameter.
    Trailing axis = flax's output-channel/feature dim for Conv HWIO /
    ConvTranspose / Dense kernels, biases, and norm scale/bias alike.
    ``min_shard`` keeps sub-lane shards off the MXU (an 8-lane floor; a
    (..., 16) kernel split 8 ways would put 2 channels per chip)."""
    if tp <= 1 or not shape:
        return P()
    if shape[-1] % tp == 0 and shape[-1] // tp >= min_shard:
        return P(*([None] * (len(shape) - 1) + ["tp"]))
    return P()


def params_shardings(tree, mesh: Mesh, min_shard: int = 8):
    """Per-leaf 'tp' NamedShardings for a parameter (or optax-moment, or
    EMA) pytree — the :func:`_tp_leaf_spec` rule mapped over the tree."""
    tp = tp_size_of(mesh)

    def rule(x):
        return NamedSharding(mesh, _tp_leaf_spec(x.shape, tp, min_shard))

    return jax.tree.map(rule, tree)


def _zero_leaf_spec(shape, data: int, tp: int, min_shard: int) -> P:
    """ZeRO-1 trailing-axis spec for an optimizer-moment leaf: the leaf's
    'tp' placement (kept consistent with its parameter) PLUS the 'data'
    axis. Moments are elementwise-only (never touch the MXU), so unlike
    params there is no lane floor — divisibility is the only gate."""
    if not shape:
        return P()
    tp_spec = _tp_leaf_spec(shape, tp, min_shard)
    tp_on = len(tp_spec) > 0 and tp_spec[-1] == "tp"
    per = tp if tp_on else 1
    if data > 1 and shape[-1] % (data * per) == 0:
        last = ("data", "tp") if tp_on else ("data",)
        return P(*([None] * (len(shape) - 1) + [last]))
    return tp_spec


def opt_shardings(tree, mesh: Mesh, min_shard: int = 8,
                  zero: bool = False):
    """Shardings for an optax state tree: the param rule, or — with
    ``zero`` — ZeRO-1 sharding of the moments over ('data', 'tp')."""
    if not zero:
        return params_shardings(tree, mesh, min_shard)
    tp = tp_size_of(mesh)
    data = int(dict(mesh.shape).get("data", 1))

    def rule(x):
        return NamedSharding(mesh,
                             _zero_leaf_spec(x.shape, data, tp, min_shard))

    return jax.tree.map(rule, tree)


def state_shardings(state, mesh: Mesh, min_shard: int = 8,
                    zero: bool = False, fsdp: bool = False):
    """Per-leaf NamedShardings for a TrainState on a mesh.

    Model params, their optax moments, and the EMA twin shard their
    trailing axis over 'tp' (when divisible and ≥ ``min_shard`` per chip);
    mutable collections (batch_stats, spectral u — tiny, and their updates
    must stay bit-identical across chips), counters, and task extras stay
    replicated. GSPMD propagates the weight shardings through the graph.
    With no 'tp' axis every leaf is replicated (the round-2 DP path).

    ``zero`` (ZeRO-1, cfg.zero_opt): Adam moments additionally shard over
    the 'data' axis — the gradient psum leaves grads replicated, GSPMD
    runs the elementwise moment/update math on 1/data of the elements per
    chip and all-gathers only the param update. Divides per-chip optimizer
    memory (2x params for Adam) by the data-axis size at the cost of one
    update-sized all-gather per optimizer step.

    ``fsdp`` (ZeRO-3, cfg.fsdp): the params and the EMA twin shard over
    ('data', 'tp') as well (implies ``zero``) — GSPMD all-gathers each
    weight just before its conv/matmul and reduce-scatters its gradient,
    so the resident state per chip is 1/data of params+moments+EMA. The
    MXU sees the full weight either way (the gather restores it), so the
    tp lane floor doesn't apply to the 'data' factor."""
    rep = NamedSharding(mesh, P())
    zero = zero or fsdp

    def shard_tree(t):
        if fsdp:
            return opt_shardings(t, mesh, min_shard, zero=True)
        return params_shardings(t, mesh, min_shard)

    def opt_tree(t):
        return opt_shardings(t, mesh, min_shard, zero)

    def rep_tree(t):
        return jax.tree.map(lambda _: rep, t)

    return state.replace(
        g_params=shard_tree(state.g_params),
        d_params=shard_tree(state.d_params),
        g_state=rep_tree(state.g_state),
        d_state=rep_tree(state.d_state),
        g_opt=opt_tree(state.g_opt),
        d_opt=opt_tree(state.d_opt),
        g_steps=rep, d_steps=rep, step=rep,
        extra=rep_tree(state.extra),
        g_ema=(shard_tree(state.g_ema)
               if state.g_ema is not None else None),
    )


def shard_superstep(superstep, mesh: Mesh, donate_state: bool = True,
                    folded: bool = False, state_sh: Any = None):
    """jit the superstep with batches data-sharded and the state either
    replicated (default) or per-leaf sharded (``state_sh`` — a TrainState
    of NamedShardings from :func:`state_shardings`, the 'tp' path).

    The traced function runs under :func:`mesh_context` so ray-level
    sharding constraints inside the NeRF renderer see the active mesh."""
    rep = replicated(mesh)
    st = state_sh if state_sh is not None else rep
    bsh = batch_sharding(mesh, stacked=True, folded=folded)
    return jax.jit(
        with_mesh_context(superstep, mesh),
        in_shardings=(st, bsh, rep),
        out_shardings=(st, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def put_state(state, mesh: Mesh, min_shard: int = 8, zero: bool = False,
              fsdp: bool = False):
    """Stage a TrainState onto the mesh: per-leaf shardings when the mesh
    has a tensor-parallel axis or ZeRO-1/FSDP is on, plain replication
    otherwise.

    Multi-process sharded staging: ``jax.device_put`` cannot target
    shardings with non-addressable shards, so each process supplies its
    own shards from the host-replicated value via
    ``make_array_from_callback`` (every process restores/initializes the
    identical state, so slicing the local copy is exact)."""
    if tp_size_of(mesh) <= 1 and not (zero or fsdp):
        return put_replicated(state, mesh)
    sh = state_shardings(state, mesh, min_shard, zero, fsdp)
    if jax.process_count() == 1:
        return jax.device_put(state, sh)

    def stage(x, s):
        h = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(h.shape, s, lambda idx: h[idx])

    return jax.tree.map(stage, state, sh)


def _assemble_local(x) -> Optional[np.ndarray]:
    """Assemble a global array from this process's addressable shards, or
    None when they don't cover every element."""
    out = np.empty(x.shape, x.dtype)
    got = np.zeros(x.shape, bool)
    for s in x.addressable_shards:
        out[s.index] = np.asarray(s.data)
        got[s.index] = True
    return out if got.all() else None


def _gather_leaf(x):
    if not isinstance(x, jax.Array):
        return x
    if x.is_fully_addressable:
        return jax.device_get(x)
    # assemble from this process's shards when they cover the whole array —
    # the host-local 'tp' layout (tp*sp divides the local device count)
    # guarantees this, and it needs NO collective, so process-0-only
    # consumers (figure draw, checkpoint retention) never deadlock
    local = _assemble_local(x)
    if local is not None:
        return local
    # genuinely remote regions (e.g. a cross-host tp axis): collective
    # gather — every process must call gather_tree for such leaves
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def gather_tree(tree: Any) -> Any:
    """Host (numpy) copies of a pytree of possibly cross-process-sharded
    arrays — the multi-host-safe replacement for ``jax.device_get`` on a
    TrainState (checkpoint saves, preemption rescue, serving export).
    Fully-addressable leaves take the plain device_get path; host-local
    sharded leaves are assembled from local shards without a collective."""
    return jax.tree.map(_gather_leaf, tree)


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


def broadcast_metrics(metrics: dict) -> dict:
    """Replace every process's scalar metric dict with process 0's values.

    Multi-host control decisions derived from locally-computed metrics
    (best-FID improvement gating the COLLECTIVE checkpoint save) must be
    identical on every process or the mesh deadlocks; rather than assume
    bit-identical local FID computation across device generations /
    nondeterministic reductions, one tiny broadcast makes process 0
    authoritative (ADVICE r3). Single-process: returns the dict unchanged.
    Key order must match across processes (it does — same config)."""
    if jax.process_count() == 1 or not metrics:
        return metrics
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    vals = np.asarray([float(metrics[k]) for k in keys], np.float64)
    vals = np.asarray(multihost_utils.broadcast_one_to_all(vals))
    return {k: float(v) for k, v in zip(keys, vals)}


_FLAG_MAX = None


def any_process_flag(flag: bool, mesh: Mesh) -> bool:
    """Cross-process OR of a per-host flag (one tiny device all-reduce).

    Used to agree on the preemption-rescue exit boundary: a SIGTERM lands
    at different superstep boundaries on different hosts, and a process
    that breaks out of the collective train loop alone deadlocks every
    peer inside its next psum. Every process must call this at the same
    point. Single-process: returns the flag unchanged, no device work."""
    if jax.process_count() == 1:
        return bool(flag)
    global _FLAG_MAX
    if _FLAG_MAX is None:
        import jax.numpy as jnp
        _FLAG_MAX = jax.jit(jnp.max)   # one wrapper => one jit cache
    n = mesh.devices.size
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    arr = jax.make_array_from_callback(
        (n,), sh, lambda idx: np.full((1,), int(flag), np.int32))
    return bool(_FLAG_MAX(arr))
