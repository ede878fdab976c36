"""GAN losses and gradient penalties, pure JAX.

Loss semantics mirror the reference training steps
(/root/reference/core/lightning_module.py:104-322 and
/root/reference/core/utils/utils.py:39-69), re-expressed as functional
transforms: the double-backward penalties (`gradient_penalty`, `compute_grad2`)
become `jax.grad`-of-`jax.vjp` compositions that XLA differentiates natively.

All penalty math runs in float32 regardless of the compute policy — mixed
precision destabilises grad-of-grad norms (SURVEY.md §7.3 hard part 1).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


Array = jax.Array


# ---------------------------------------------------------------------------
# Elementary criteria
# ---------------------------------------------------------------------------

def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically-stable binary cross entropy on logits (mean reduction).

    Matches torch.nn.BCEWithLogitsLoss (conf/config.yaml:19-20):
      max(x, 0) - x*y + log(1 + exp(-|x|))
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def wasserstein_d_loss(d_real: Array, d_fake: Array) -> Array:
    """-(E[D(real)] - E[D(fake)]) — reference lightning_module.py:173."""
    return -(jnp.mean(d_real.astype(jnp.float32))
             - jnp.mean(d_fake.astype(jnp.float32)))


def wasserstein_g_loss(d_fake: Array) -> Array:
    """-E[D(fake)] — reference lightning_module.py:180."""
    return -jnp.mean(d_fake.astype(jnp.float32))


def hinge_d_loss(d_real: Array, d_fake: Array) -> Array:
    """π-GAN hinge divergence: mean(relu(1+d_real) + relu(1-d_fake)).

    NOTE the reference's sign convention is unusual (relu(1+real)+relu(1-fake),
    lightning_module.py:289, paired with gen loss = +mean(D(fake)) at :298);
    it is reproduced faithfully so training dynamics match.
    """
    d_real = d_real.astype(jnp.float32)
    d_fake = d_fake.astype(jnp.float32)
    return jnp.mean(jax.nn.relu(1.0 + d_real) + jax.nn.relu(1.0 - d_fake))


def pigan_g_loss(d_fake: Array) -> Array:
    """mean(D(fake)) — reference lightning_module.py:296-300, kept verbatim."""
    return jnp.mean(d_fake.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Gradient penalties (double backward)
# ---------------------------------------------------------------------------

def compute_grad2(d_fn: Callable[[Array], Array], x: Array) -> Array:
    """Per-sample squared gradient norm of sum(D(x)) w.r.t. x.

    Functional equivalent of reference compute_grad2 (utils.py:60-69): returns
    a (batch,) vector of ||∂ sum(D(x)) / ∂x_i||², differentiable (the caller's
    outer grad flows through this via JAX's higher-order AD).
    """
    x = x.astype(jnp.float32)

    def scalar_out(xx):
        return jnp.sum(d_fn(xx).astype(jnp.float32))

    grad_x = jax.grad(scalar_out)(x)
    return jnp.sum(jnp.square(grad_x).reshape(x.shape[0], -1), axis=1)


def r1_penalty(d_fn: Callable[[Array], Array], real: Array) -> Array:
    """R1 regulariser mean(compute_grad2) — lightning_module.py:146,290."""
    return jnp.mean(compute_grad2(d_fn, real))


def r1_penalty_and_logits(d_fn: Callable[[Array], Array],
                          real: Array) -> tuple[Array, Array]:
    """(mean R1 penalty, D(real) logits) from ONE forward pass.

    The reference computes D(real) once and reuses the same graph for the
    BCE term and the R1 gradient (lightning_module.py:140-146 +
    utils.py:60-69, create_graph=True); sharing the linearization here
    matches that and saves a full discriminator pass per step.
    """
    real = real.astype(jnp.float32)

    def scalar_out(xx):
        out = d_fn(xx).astype(jnp.float32)
        return jnp.sum(out), out

    grad_x, d_real = jax.grad(scalar_out, has_aux=True)(real)
    reg = jnp.sum(jnp.square(grad_x).reshape(real.shape[0], -1), axis=1)
    return jnp.mean(reg), d_real


def gradient_penalty(d_fn: Callable[[Array], Array], real: Array,
                     fake: Array, rng: Array) -> Array:
    """WGAN-GP penalty E[(||∇D(x̂)||₂ − 1)²] on x̂ = α·real + (1−α)·fake.

    α is a single uniform per sample, broadcast over all pixels, as in the
    reference (utils.py:41). Differentiable w.r.t. D's parameters through the
    gradient (double backward, utils.py:48-54).
    """
    real = real.astype(jnp.float32)
    fake = fake.astype(jnp.float32)
    b = real.shape[0]
    alpha_shape = (b,) + (1,) * (real.ndim - 1)
    alpha = jax.random.uniform(rng, alpha_shape, dtype=jnp.float32)
    interp = real * alpha + fake * (1.0 - alpha)

    def scalar_out(xx):
        return jnp.sum(d_fn(xx).astype(jnp.float32))

    grads = jax.grad(scalar_out)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads).reshape(b, -1), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


# ---------------------------------------------------------------------------
# Latent-space helpers
# ---------------------------------------------------------------------------

def interpolate_sphere(z1: Array, z2: Array, t: Array | float) -> Array:
    """Spherical interpolation between latent batches (utils.py:29-37)."""
    z1 = z1.astype(jnp.float32)
    z2 = z2.astype(jnp.float32)
    p = jnp.sum(z1 * z2, axis=1, keepdims=True)
    p = p / jnp.sqrt(jnp.sum(jnp.square(z1), axis=1, keepdims=True))
    p = p / jnp.sqrt(jnp.sum(jnp.square(z2), axis=1, keepdims=True))
    omega = jnp.arccos(jnp.clip(p, -1.0, 1.0))
    sin_omega = jnp.where(jnp.abs(jnp.sin(omega)) < 1e-7, 1e-7, jnp.sin(omega))
    s1 = jnp.sin((1.0 - t) * omega) / sin_omega
    s2 = jnp.sin(t * omega) / sin_omega
    return s1 * z1 + s2 * z2
