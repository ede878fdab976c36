"""Fréchet distance + polynomial-MMD KID, jitted and on-device.

Replaces scipy.linalg.sqrtm (reference fid_score.py:25-80) with a
Newton–Schulz matrix square root in float64-free form (scaled f32 iteration
with a scipy fallback for ill-conditioned inputs), and sklearn's
polynomial_kernel MMD (callback_inception_metrics.py:19-58) with plain
matmuls (SURVEY §2.6 table).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def stats_from_activations(acts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, D) activations → (mu, sigma) with unbiased covariance (matches
    np.cov(rowvar=False) used by the reference, fid_score.py)."""
    acts = acts.astype(jnp.float32)
    mu = jnp.mean(acts, axis=0)
    centered = acts - mu
    sigma = centered.T @ centered / (acts.shape[0] - 1)
    return mu, sigma


def _newton_schulz_sqrtm(a: jax.Array, iters: int = 30) -> jax.Array:
    """Matrix square root of an SPD matrix via the Newton–Schulz iteration
    (stable when ||A/normA − I|| < 1; normalisation guarantees that)."""
    dim = a.shape[0]
    norm = jnp.linalg.norm(a)
    y = a / norm
    eye = jnp.eye(dim, dtype=a.dtype)
    z = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z)

    y, z = jax.lax.fori_loop(0, iters, body, (y, z))
    return y * jnp.sqrt(norm)


@partial(jax.jit, static_argnames=("eps",))
def _frechet_distance_with_residual(mu1, sigma1, mu2, sigma2,
                                    eps: float = 1e-6):
    mu1 = mu1.astype(jnp.float32)
    mu2 = mu2.astype(jnp.float32)
    diff = mu1 - mu2
    offset = eps * jnp.eye(sigma1.shape[0], dtype=jnp.float32)
    s1 = sigma1.astype(jnp.float32) + offset
    s2 = sigma2.astype(jnp.float32) + offset
    prod = s1 @ s2
    covmean = _newton_schulz_sqrtm(prod)
    # convergence check: ||covmean² − s1·s2||_F / ||s1·s2||_F
    residual = (jnp.linalg.norm(covmean @ covmean - prod)
                / jnp.maximum(jnp.linalg.norm(prod), 1e-30))
    tr_covmean = jnp.trace(covmean)
    fid = (jnp.dot(diff, diff) + jnp.trace(s1) + jnp.trace(s2)
           - 2.0 * tr_covmean)
    return fid, residual


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6,
                     residual_tol: float = 1e-2):
    """FID between two Gaussians (fid_score.py:25-80 semantics):
    |mu1−mu2|² + tr(s1 + s2 − 2·sqrtm(s1·s2)); the eps·I offset mirrors the
    reference's non-finite fallback.

    The on-device Newton–Schulz sqrtm's relative residual
    ||covmean² − s1·s2||/||s1·s2|| is checked; on non-convergence
    (ill-conditioned products) the scipy.linalg.sqrtm path is used instead
    of returning a silently wrong value."""
    fid, residual = _frechet_distance_with_residual(mu1, sigma1, mu2, sigma2,
                                                    eps)
    if not np.isfinite(float(fid)) or float(residual) > residual_tol:
        return jnp.asarray(frechet_distance_np(
            np.asarray(mu1, np.float64), np.asarray(sigma1, np.float64),
            np.asarray(mu2, np.float64), np.asarray(sigma2, np.float64),
            eps), jnp.float32)
    return fid


def frechet_distance_np(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """scipy.linalg.sqrtm ground-truth implementation (tests + fallback)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))


# ---------------------------------------------------------------------------
# KID (polynomial MMD)
# ---------------------------------------------------------------------------

def _polynomial_kernel(x, y, degree=3, gamma=None, coef0=1.0):
    gamma = gamma if gamma is not None else 1.0 / x.shape[1]
    return (x @ y.T * gamma + coef0) ** degree


def _mmd2(k_xx, k_xy, k_yy):
    """Unbiased MMD² estimate (callback_inception_metrics.py:61-141,
    unit_diagonal=False, mmd_est='unbiased')."""
    m = k_xx.shape[0]
    diag_x = jnp.diag(k_xx)
    diag_y = jnp.diag(k_yy)
    kt_xx_sum = jnp.sum(k_xx) - jnp.sum(diag_x)
    kt_yy_sum = jnp.sum(k_yy) - jnp.sum(diag_y)
    k_xy_sum = jnp.sum(k_xy)
    mmd2 = (kt_xx_sum + kt_yy_sum) / (m * (m - 1)) - 2 * k_xy_sum / (m * m)
    return mmd2


@partial(jax.jit, static_argnames=("n_subsets", "subset_size"))
def kid_from_activations(rng, acts1, acts2, n_subsets: int = 100,
                         subset_size: int = 1000):
    """Polynomial-kernel MMD averaged over random subsets
    (callback_inception_metrics.py:19-38: 100 subsets, size ≤ min(N, 1000))."""
    acts1 = acts1.astype(jnp.float32)
    acts2 = acts2.astype(jnp.float32)
    n1, n2 = acts1.shape[0], acts2.shape[0]
    sub = min(subset_size, n1, n2)

    def one(i, acc):
        r = jax.random.fold_in(rng, i)
        r1, r2 = jax.random.split(r)
        idx1 = jax.random.choice(r1, n1, (sub,), replace=False)
        idx2 = jax.random.choice(r2, n2, (sub,), replace=False)
        x = acts1[idx1]
        y = acts2[idx2]
        k_xx = _polynomial_kernel(x, x)
        k_xy = _polynomial_kernel(x, y)
        k_yy = _polynomial_kernel(y, y)
        return acc + _mmd2(k_xx, k_xy, k_yy)

    total = jax.lax.fori_loop(0, n_subsets, one, jnp.zeros((), jnp.float32))
    return total / n_subsets
