"""Thin-plate-spline deformation in 3D, pure JAX.

The reference imports `core.submodules.tps_deformation` — an EMPTY,
unvendored git submodule (SURVEY §7.3 item 8) — so this implements the TPS
formulation from scratch:

  find_coefficients(control, target, λ): solve the regularised system
      [[K + λI, P], [Pᵀ, 0]] · W = [target; 0]
  with kernel U(r) = r (the 3D biharmonic spline) and P = [1, x, y, z];
  transform(points, control, W) evaluates
      f(p) = a₀ + A·p + Σᵢ wᵢ U(|p − cᵢ|).

Batched over the leading axis; the linear solve runs in float32 via
jnp.linalg.solve (XLA batched LU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pairwise_radial(a: jax.Array, b: jax.Array) -> jax.Array:
    """U(|a_i − b_j|) with U(r) = r. a: (B, N, 3), b: (B, M, 3) → (B, N, M)."""
    d2 = jnp.sum(jnp.square(a[:, :, None, :] - b[:, None, :, :]), axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def find_coefficients(control_points: jax.Array, target_points: jax.Array,
                      lambda_: float = 0.0) -> jax.Array:
    """Solve for TPS weights mapping control_points → target_points.

    Args:
      control_points: (B, N, 3); target_points: (B, N, 3).
    Returns:
      (B, N+4, 3) coefficients [w; a] per batch.
    """
    c = control_points.astype(jnp.float32)
    t = target_points.astype(jnp.float32)
    b, n, _ = c.shape
    k = _pairwise_radial(c, c) + lambda_ * jnp.eye(n)[None]
    p = jnp.concatenate([jnp.ones((b, n, 1)), c], axis=-1)       # (B, N, 4)
    zeros = jnp.zeros((b, 4, 4))
    top = jnp.concatenate([k, p], axis=-1)                        # (B, N, N+4)
    bottom = jnp.concatenate([jnp.swapaxes(p, 1, 2), zeros], axis=-1)
    a = jnp.concatenate([top, bottom], axis=1)                    # (B, N+4, N+4)
    rhs = jnp.concatenate([t, jnp.zeros((b, 4, 3))], axis=1)
    return jnp.linalg.solve(a, rhs)


def transform(points: jax.Array, control_points: jax.Array,
              coefficients: jax.Array) -> jax.Array:
    """Evaluate the TPS at query points.

    Args:
      points: (B, M, 3); control_points: (B, N, 3);
      coefficients: (B, N+4, 3).
    Returns:
      (B, M, 3) warped points.
    """
    pts = points.astype(jnp.float32)
    c = control_points.astype(jnp.float32)
    n = c.shape[1]
    w, affine = coefficients[:, :n], coefficients[:, n:]
    u = _pairwise_radial(pts, c)                                  # (B, M, N)
    nonrigid = jnp.einsum("bmn,bnd->bmd", u, w)
    ph = jnp.concatenate([jnp.ones(pts.shape[:-1] + (1,)), pts], axis=-1)
    rigid = jnp.einsum("bmk,bkd->bmd", ph, affine)
    return rigid + nonrigid
