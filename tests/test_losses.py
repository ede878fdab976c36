"""Op-level loss/penalty tests with analytic ground truths (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
from lightning_gan_zoo_tpu.ops import losses as L


def test_bce_with_logits_matches_formula():
    logits = jnp.array([-3.0, -0.5, 0.0, 2.0, 10.0])
    targets = jnp.array([0.0, 1.0, 1.0, 0.0, 1.0])
    expect = np.mean(
        np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits))))
    # XLA CPU's transcendental approximations differ from numpy at ~5e-6
    assert np.allclose(L.bce_with_logits(logits, targets), expect, atol=2e-5)


def test_bce_extreme_logits_stable():
    out = L.bce_with_logits(jnp.array([1e4, -1e4]), jnp.array([0.0, 1.0]))
    assert np.isfinite(out)


def test_wasserstein_losses():
    d_real = jnp.array([1.0, 3.0])
    d_fake = jnp.array([0.5, 0.5])
    assert np.allclose(L.wasserstein_d_loss(d_real, d_fake), -(2.0 - 0.5))
    assert np.allclose(L.wasserstein_g_loss(d_fake), -0.5)


def test_hinge_d_loss():
    d_real = jnp.array([-2.0, 0.0])
    d_fake = jnp.array([2.0, 0.0])
    # relu(1+d_real)=[0,1]; relu(1-d_fake)=[0,1] → mean of [0+0, 1+1]/2 = 1
    assert np.allclose(L.hinge_d_loss(d_real, d_fake), 1.0)


def test_compute_grad2_linear_disc():
    """For D(x)=<w,x>, grad_x sum D = w per sample → reg = ||w||² each."""
    w = jnp.arange(1.0, 13.0).reshape(3, 4) / 10.0

    def d_fn(x):
        return jnp.sum(x.reshape(x.shape[0], -1) * w.reshape(1, -1), axis=1)

    x = jnp.ones((5, 3, 4))
    reg = L.compute_grad2(d_fn, x)
    assert reg.shape == (5,)
    assert np.allclose(reg, float(jnp.sum(w ** 2)), rtol=1e-5)


def test_gradient_penalty_linear_disc():
    """Linear critic has constant gradient w → penalty = (||w||−1)² exactly."""
    w = jnp.full((2, 2, 1), 0.5)

    def d_fn(x):
        return jnp.sum(x * w[None], axis=(1, 2, 3))

    real = jnp.zeros((4, 2, 2, 1))
    fake = jnp.ones((4, 2, 2, 1))
    gp = L.gradient_penalty(d_fn, real, fake, jax.random.PRNGKey(0))
    expect = (np.sqrt(4 * 0.25) - 1.0) ** 2  # ||w||=1 → penalty 0
    assert np.allclose(gp, expect, atol=1e-5)


def test_r1_penalty_differentiable_wrt_params():
    """The R1 term must backprop into D's parameters (double backward)."""

    def loss(w):
        def d_fn(x):
            return jnp.sum(x.reshape(x.shape[0], -1) * w, axis=1)
        return L.r1_penalty(d_fn, jnp.ones((2, 4)))

    w0 = jnp.array([1.0, 2.0, 3.0, 4.0])
    g = jax.grad(loss)(w0)
    # loss = sum(w²) → dloss/dw = 2w
    assert np.allclose(g, 2 * w0, rtol=1e-5)


def test_interpolate_sphere_endpoints():
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    z2 = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    assert np.allclose(L.interpolate_sphere(z1, z2, 0.0), z1, atol=1e-4)
    assert np.allclose(L.interpolate_sphere(z1, z2, 1.0), z2, atol=1e-4)


def test_r1_penalty_and_logits_shared_forward():
    """Shared-linearization variant returns the same penalty as r1_penalty
    and the same logits as a direct forward."""
    w = jnp.arange(1.0, 9.0).reshape(2, 4) / 7.0

    def d_fn(x):
        return x.reshape(x.shape[0], -1) @ w.reshape(-1)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2, 4)),
                    jnp.float32)
    pen, logits = L.r1_penalty_and_logits(d_fn, x)
    assert np.allclose(pen, L.r1_penalty(d_fn, x), rtol=1e-6)
    assert np.allclose(logits, d_fn(x), rtol=1e-6)

    # double-backward still flows into parameters
    def loss(ww):
        def d(xx):
            return xx.reshape(xx.shape[0], -1) @ ww
        p, out = L.r1_penalty_and_logits(d, jnp.ones((2, 4)))
        return p + jnp.sum(out) * 0.0

    w0 = jnp.array([1.0, 2.0, 3.0, 4.0])
    assert np.allclose(jax.grad(loss)(w0), 2 * w0, rtol=1e-5)
