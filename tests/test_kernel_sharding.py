"""Pallas kernels under a data-parallel mesh (parallel/kernel_sharding.py):
each kernel must stay batch-sharded — the partitioner's fallback for an
un-annotated custom call is an all-gather of the full global batch onto
every chip. Asserts (a) sharded-vs-unsharded value/grad parity and (b) the
compiled HLO of the forward carries no all-gather. All kernels run in
interpret mode on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), ("data",))


@pytest.fixture(autouse=True)
def _mesh_ctx(mesh):
    """partition_by_batch engages only under a multi-device mesh_context
    (kernel_sharding.batch_partitioned) — enter it for every test here."""
    from lightning_gan_zoo_tpu.parallel import mesh as pmesh
    with pmesh.mesh_context(mesh):
        yield


def _shard(mesh, tree, specs):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, jax.Array))


def test_trilinear_sharded(mesh):
    from lightning_gan_zoo_tpu.ops.grid_sample import trilinear_resample
    from lightning_gan_zoo_tpu.ops.pallas.trilinear import (
        trilinear_resample_mxu)
    B, D, H, W, C, N = 8, 4, 4, 4, 8, 32
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    vox = jax.random.normal(k[0], (B, D, H, W, C))
    coords = jax.random.uniform(k[1], (B, N, 3)) * 3.0
    w = jax.random.normal(k[2], (B, N, C))

    bsh = NamedSharding(mesh, P("data"))
    fwd = jax.jit(lambda v, c: trilinear_resample_mxu(v, c, True),
                  in_shardings=(bsh, bsh), out_shardings=bsh)
    y = fwd(vox, coords)
    # sharded vs unsharded kernel: same per-sample computation, tight;
    # vs the f32 XLA fallback: bf16-matmul tolerance
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(trilinear_resample_mxu(vox, coords, True)),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(trilinear_resample(vox, coords)),
                               rtol=0.05, atol=0.02)
    hlo = fwd.lower(vox, coords).compile().as_text()
    assert "all-gather" not in hlo

    def loss_mxu(v):
        return jnp.sum(trilinear_resample_mxu(v, coords, True) * w)

    gv = jax.jit(jax.grad(loss_mxu), in_shardings=bsh)(vox)
    np.testing.assert_allclose(np.asarray(gv),
                               np.asarray(jax.grad(loss_mxu)(vox)),
                               rtol=1e-6, atol=1e-6)
    gv_ref = jax.grad(lambda v: jnp.sum(
        trilinear_resample(v, coords) * w))(vox)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=0.05, atol=0.02)


def test_siren_trunk_sharded(mesh):
    from lightning_gan_zoo_tpu.ops.pallas.siren_trunk import siren_trunk
    B, M, CIN, HID, L, NF = 8, 16, 3, 16, 3, 2
    k = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(k[0], (B, M, CIN))
    w0k = jax.random.normal(k[1], (CIN, HID)) * 0.5
    wmid = jax.random.normal(k[2], (L - 1, HID, HID)) * 0.2
    bs = jax.random.normal(k[3], (L, HID)) * 0.1
    gam = jax.random.normal(k[4], (B, NF, HID)) * 0.1 + 1.0
    bet = jax.random.normal(k[5], (B, NF, HID)) * 0.1
    w0s = (30.0, 1.0, 1.0)

    def f(x, w0k, wmid, bs, gam, bet):
        return siren_trunk(x, w0k, wmid, bs, gam, bet, w0s, True)

    ref = f(x, w0k, wmid, bs, gam, bet)            # unsharded eager
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    fwd = jax.jit(f, in_shardings=(bsh, rep, rep, rep, bsh, bsh),
                  out_shardings=bsh)
    y = fwd(x, w0k, wmid, bs, gam, bet)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-5)
    hlo = fwd.lower(x, w0k, wmid, bs, gam, bet).compile().as_text()
    assert "all-gather" not in hlo

    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32) ** 2)

    gs = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)),
                 in_shardings=(bsh, rep, rep, rep, bsh, bsh))(
        x, w0k, wmid, bs, gam, bet)
    gr = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        x, w0k, wmid, bs, gam, bet)
    for got, want in zip(gs, gr):
        # the sharded weight grads are psum'd partials — bit-order differs
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)
