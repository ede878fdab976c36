"""The hologan ConvTranspose layout experiment is a recorded negative
result (tools/layout_experiment_hologan.py, BASELINE.md "hologan bound");
this pins its equivalence math so the measurement record stays
reproducible: the phase-decomposed conv+depth-to-space twin must equal
jax's SAME/k3/s2 conv_transpose exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.layout_experiment_hologan import conv_phase, conv_t, phase_pack


@pytest.mark.parametrize("b,d,ci,co", [(1, 2, 3, 2), (2, 4, 8, 4)])
def test_phase_decomposition_matches_conv_transpose(b, d, ci, co):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (b, d, d, d, ci))
    w = jax.random.normal(kw, (3, 3, 3, ci, co)) * 0.2
    y_ref = conv_t(x, w)
    y_new = conv_phase(x, phase_pack(w))
    assert y_new.shape == y_ref.shape == (b, 2 * d, 2 * d, 2 * d, co)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_decomposition_gradients_match():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (1, 2, 2, 2, 3))
    w = jax.random.normal(kw, (3, 3, 3, 3, 2)) * 0.2

    def loss_t(x, w):
        return jnp.sum(jnp.square(conv_t(x, w)))

    def loss_p(x, w):
        return jnp.sum(jnp.square(conv_phase(x, phase_pack_jax(w))))

    # phase_pack is numpy (host-side weight prep); for grad parity fold it
    # through a jax-traceable twin built from the same index mapping
    def phase_pack_jax(w):
        import numpy as onp
        basis = onp.zeros((3, 3, 3, 1, 1), onp.float32)
        maps = []
        for tz in range(3):
            for ty in range(3):
                for tx in range(3):
                    e = basis.copy()
                    e[tz, ty, tx, 0, 0] = 1.0
                    maps.append(onp.asarray(phase_pack(jnp.asarray(e))))
        m = jnp.asarray(onp.stack(maps))          # (27, 2,2,2, 1, 8)
        wf = w.reshape(27, w.shape[3], w.shape[4])  # (27, ci, co)
        # out[kz,ky,kx, ci, co, p] = sum_t m[t,z,y,x,p] * w[t, ci, co]
        out = jnp.einsum("tzyxp,tic->zyxicp", m.squeeze(4), wf)
        z, y, x_, ci, co, p8 = out.shape
        out = out.transpose(0, 1, 2, 3, 5, 4)      # phase-major channels
        return out.reshape(z, y, x_, ci, p8 * co)

    gx_t, gw_t = jax.grad(loss_t, argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_t),
                               rtol=1e-4, atol=1e-4)
