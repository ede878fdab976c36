"""Fused FiLM-SIREN trunk kernel (ops/pallas/siren_trunk.py), interpret
mode: forward/grad parity vs the plain SirenNet layer loop, pad handling,
and the shared param-tree contract between fused and plain builds."""
import jax
import jax.numpy as jnp
import numpy as np

from lightning_gan_zoo_tpu.nerf.siren import SirenNet
from lightning_gan_zoo_tpu.ops.pallas.siren_trunk import siren_trunk

B, M, H, NL = 2, 640, 256, 3  # M not a TILE_M multiple → exercises padding


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, NL, H)).astype(np.float32) * .1 + 1)
    bt = jnp.asarray(rng.normal(size=(B, NL, H)).astype(np.float32) * .1)
    net = SirenNet(H, H, NL, dtype=jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, g, bt)
    p = variables["params"]
    ks = [p[f"Siren_{i}"]["Dense_0"]["kernel"] for i in range(NL + 1)]
    bs = jnp.stack([p[f"Siren_{i}"]["Dense_0"]["bias"] for i in range(NL + 1)])
    return x, g, bt, net, variables, ks[0], jnp.stack(ks[1:]), bs


W0S = (30.0,) + (1.0,) * NL


def _pack_film(g, bt):
    # FiLM rows map statically to the first n_film layers
    return g, bt


def test_param_tree_matches_plain_build():
    """Checkpoint contract: fused and plain SirenNet builds must share the
    Siren_i/Dense_0/{kernel,bias} tree (nn.Dense-compatible shapes)."""
    x, g, bt, net, variables, w0k, wmid, bs = _setup()
    p = variables["params"]
    for i in range(NL + 1):
        k = p[f"Siren_{i}"]["Dense_0"]["kernel"]
        assert k.shape == ((3, H) if i == 0 else (H, H))
        assert p[f"Siren_{i}"]["Dense_0"]["bias"].shape == (H,)


def test_forward_matches_plain_path():
    x, g, bt, net, variables, w0k, wmid, bs = _setup()
    y_plain = net.apply(variables, x, g, bt)  # CPU → plain layer loop
    gp, bp = _pack_film(g, bt)
    y_k = siren_trunk(x, w0k, wmid, bs, gp, bp, W0S, True)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_plain, np.float32),
        atol=0.04)  # sin outputs in [-1,1]; bf16 film rounding order differs


def test_gradients_match_f32_truth():
    """Kernel grads (hand-written bwd) within the bf16 noise floor of the
    f32 plain path for every parameter group, including FiLM γ/β and dx."""
    x, g, bt, _, variables, w0k, wmid, bs = _setup()
    net32 = SirenNet(H, H, NL, dtype=jnp.float32)

    def loss_plain(ww):
        xx, k0, wm, bb, gg, bb2 = ww
        p = {f"Siren_{i}": {"Dense_0": {
            "kernel": (k0 if i == 0 else wm[i - 1]), "bias": bb[i]}}
            for i in range(NL + 1)}
        return (net32.apply({"params": p}, xx, gg, bb2)
                .astype(jnp.float32) ** 2).sum()

    def loss_kernel(ww):
        xx, k0, wm, bb, gg, bb2 = ww
        gp, bp = _pack_film(gg, bb2)
        return (siren_trunk(xx, k0, wm, bb, gp, bp, W0S, True)
                .astype(jnp.float32) ** 2).sum()

    ww = (x, w0k, wmid, bs, g, bt)
    g_ref = jax.grad(loss_plain)(ww)
    g_ker = jax.grad(loss_kernel)(ww)
    for a, b, nm in zip(g_ref, g_ker, ["x", "w0k", "wmid", "bs", "g", "bt"]):
        scale = float(jnp.abs(a).max()) + 1e-8
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 0.03, f"{nm}: rel grad err {rel}"


def test_no_film_path():
    """alpha_siren (ANIGAN) calls SirenNet without gammas — the fused form
    uses γ=1/β=0 rows and must match."""
    x, g, bt, _, variables, w0k, wmid, bs = _setup()
    net = SirenNet(H, H, NL, dtype=jnp.bfloat16)
    y_plain = net.apply(variables, x)
    ones = jnp.ones((B, 1, H), jnp.float32)  # γ=1 on layer 0 ≡ no FiLM
    y_k = siren_trunk(x, w0k, wmid, bs, ones, jnp.zeros_like(ones),
                      W0S, True)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_plain, np.float32),
        atol=0.04)


def test_module_fused_dispatch_matches_plain():
    """The IN-MODULE fused dispatch (SirenNet.__call__ use_fused branch:
    lyr.dense() grandchild invocations, weight stacking, dtype casts) — not
    just the raw kernel — must match the plain layer loop. fused_interpret
    forces the branch on CPU (ADVICE r2: previously unreachable in CI)."""
    x, g, bt, _, variables, *_ = _setup()
    plain = SirenNet(H, H, NL, dtype=jnp.bfloat16, fused=False)
    fused = SirenNet(H, H, NL, dtype=jnp.bfloat16, fused_interpret=True)
    y_plain = np.asarray(plain.apply(variables, x, g, bt), np.float32)
    y_fused = np.asarray(fused.apply(variables, x, g, bt), np.float32)
    np.testing.assert_allclose(y_fused, y_plain, atol=0.04)


def test_module_fused_dispatch_no_film():
    """γ=1/β=0 packing when gammas is None: fused output equals the plain
    un-modulated stack."""
    x, *_ = _setup()
    plain = SirenNet(H, H, NL, dtype=jnp.bfloat16, fused=False)
    fused = SirenNet(H, H, NL, dtype=jnp.bfloat16, fused_interpret=True)
    variables = plain.init(jax.random.PRNGKey(1), x)
    y_plain = np.asarray(plain.apply(variables, x), np.float32)
    y_fused = np.asarray(fused.apply(variables, x), np.float32)
    np.testing.assert_allclose(y_fused, y_plain, atol=0.04)
