"""Batch-partitioning rules for the Pallas kernels under a device mesh.

GSPMD/Shardy cannot see inside a custom call: an un-annotated
``pl.pallas_call`` in a data-parallel jit gets the partitioner's fallback
— all-gather the full global batch onto EVERY chip, run the kernel on the
whole thing, keep a shard of the result (measured on the 8-device virtual
mesh: the compiled HLO carries an all-gather of the feature map). That is
correct but anti-scaling: the one op the kernel was built to accelerate
stops being data-parallel.

Every kernel in ops/pallas is batch-elementwise (grid dim 0 = sample, or
row-blocks of a batch-major flattening), so the right partitioning is
trivial and static: shard operand/result dim 0 along the mesh's batch
axes, keep packed weights replicated, and all-reduce the weight-gradient
outputs (per-shard partial sums — the same psum XLA inserts for every
other parameter gradient). ``partition_by_batch`` wires exactly that
through ``jax.experimental.custom_partitioning`` with a Shardy
einsum-like rule for propagation.

The reference counterpart is implicit: its CUDA ops work under DDP because
every rank runs the whole module on its local shard (run_network.py:66);
here the same per-shard execution is restored explicitly at the op level.
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _terms(rule: str):
    """Parse 'b s c, b c -> b s c, k m' into ([opnd factor-lists],
    [result factor-lists])."""
    ops, res = rule.split("->")
    return ([t.split() for t in ops.split(",")],
            [t.split() for t in res.split(",")])


def _spec(factors, mesh) -> P:
    """dim 0 named 'b' → sharded over the batch axes; factor 'm' (the
    ray/row dim of the SIREN trunk) → sharded over the 'sp' ray axis when
    the mesh has one (parallel/mesh.make_mesh(num_sp>1)); all else
    replicated. On a plain 1-D mesh 'b' takes every axis (round-2
    behavior)."""
    names = tuple(mesh.axis_names)
    batch_axes = ("data",) if "data" in names else names
    sp_axes = ("sp",) if "sp" in names else ()
    entries = []
    for i, f in enumerate(factors):
        if i == 0 and f == "b":
            entries.append(batch_axes)
        elif i == 1 and f == "m" and factors[0] == "b" and sp_axes:
            # 'm' directly after 'b' is the ray/row dim (siren_trunk's
            # "b m i" terms); 'm' elsewhere (e.g. a packed-weight "k m")
            # stays replicated
            entries.append(sp_axes)
        else:
            entries.append(None)
    return P(*entries)


def _reduce_axes(op_terms, mesh):
    """Mesh axes that shard any input factor — exactly the axes a per-shard
    partial sum (packed weight grad) must psum over. Axes that merely
    replicate the kernel (e.g. 'sp' for an image-space kernel on a 2-D
    mesh) hold FULL copies, not partials, and must not be reduced."""
    used = []
    for t in op_terms:
        for entry in _spec(t, mesh):
            if entry is None:
                continue
            for ax in (entry if isinstance(entry, tuple) else (entry,)):
                if ax not in used:
                    used.append(ax)
    return tuple(used)


def batch_partitioned(fn: Callable, rule: str,
                      reduced_out: Tuple[int, ...] = (),
                      statics: Tuple = ()):
    """Trace-time gate around :func:`partition_by_batch`: the
    custom_partitioning wrapper engages only when a multi-device
    mesh_context is active (parallel/mesh.py — set by shard_superstep and
    the sharding tests). Single-device and no-mesh traces call the kernel
    directly, keeping the hardware-proven single-chip dispatch path
    byte-identical to the unwrapped kernel."""
    from . import mesh as pmesh
    m = pmesh.current_mesh()
    if m is None or m.devices.size <= 1:
        return lambda *arrays: fn(*arrays, *statics)
    return partition_by_batch(fn, rule, reduced_out, statics)


@functools.lru_cache(maxsize=None)
def partition_by_batch(fn: Callable, rule: str,
                       reduced_out: Tuple[int, ...] = (),
                       statics: Tuple = ()):
    """Wrap ``fn(*arrays, *statics)`` so dim 0 of every 'b'-leading term
    stays sharded under a data-parallel jit; ``reduced_out`` indexes
    results that are per-shard partial sums (packed weight grads) and get
    an in-partition psum over the batch axes.

    Cached on (fn, rule, reduced_out, statics) so repeated traces reuse
    one custom_partitioning instance (jit caching keys on fn identity).
    """
    op_terms, res_terms = _terms(rule)
    multi = len(res_terms) > 1

    @custom_partitioning
    def wrapped(*arrays):
        return fn(*arrays, *statics)

    def _out_shardings(mesh):
        shs = tuple(NamedSharding(mesh, _spec(t, mesh)) for t in res_terms)
        return shs if multi else shs[0]

    def infer(mesh, arg_shapes, result_shape):
        return _out_shardings(mesh)

    def partition(mesh, arg_shapes, result_shape):
        arg_sh = tuple(NamedSharding(mesh, _spec(t, mesh)) for t in op_terms)
        axes = _reduce_axes(op_terms, mesh)

        def lower(*arrays):
            out = fn(*arrays, *statics)
            if reduced_out and axes:
                out = list(out)
                for i in reduced_out:
                    out[i] = jax.lax.psum(out[i], axes)
                out = tuple(out)
            return out

        return mesh, lower, _out_shardings(mesh), arg_sh

    wrapped.def_partition(infer_sharding_from_operands=infer,
                          partition=partition, sharding_rule=rule)
    return wrapped
