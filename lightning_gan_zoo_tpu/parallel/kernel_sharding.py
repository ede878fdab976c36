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
    """dim 0 named 'b' → sharded over every mesh axis; all else replicated."""
    if factors and factors[0] == "b":
        return P(tuple(mesh.axis_names), *([None] * (len(factors) - 1)))
    return P(*([None] * len(factors)))


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
        axes = tuple(mesh.axis_names)

        def lower(*arrays):
            out = fn(*arrays, *statics)
            if reduced_out:
                out = list(out)
                for i in reduced_out:
                    out[i] = jax.lax.psum(out[i], axes)
                out = tuple(out)
            return out

        return mesh, lower, _out_shardings(mesh), arg_sh

    wrapped.def_partition(infer_sharding_from_operands=infer,
                          partition=partition, sharding_rule=rule)
    return wrapped
