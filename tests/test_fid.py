"""FID/KID pipeline tests: Newton–Schulz vs scipy sqrtm, KID/FID identities,
end-to-end metrics compute (SURVEY §4, §7.3 item 5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_gan_zoo_tpu.eval import fid as F


def _random_spd(rng, d, scale=1.0):
    a = rng.normal(size=(d, d)).astype(np.float32)
    return (a @ a.T / d + np.eye(d) * 0.1) * scale


def test_newton_schulz_matches_scipy():
    rng = np.random.default_rng(0)
    d = 64
    mu1 = rng.normal(size=d).astype(np.float32)
    mu2 = rng.normal(size=d).astype(np.float32)
    s1 = _random_spd(rng, d)
    s2 = _random_spd(rng, d)
    got = float(F.frechet_distance(jnp.asarray(mu1), jnp.asarray(s1),
                                   jnp.asarray(mu2), jnp.asarray(s2)))
    expect = float(F.frechet_distance_np(mu1, s1, mu2, s2))
    assert abs(got - expect) / max(abs(expect), 1.0) < 5e-3


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(1)
    d = 32
    mu = jnp.asarray(rng.normal(size=d), jnp.float32)
    s = jnp.asarray(_random_spd(rng, d))
    assert abs(float(F.frechet_distance(mu, s, mu, s))) < 1e-1


def test_stats_match_numpy_cov():
    rng = np.random.default_rng(2)
    acts = rng.normal(size=(200, 16)).astype(np.float32)
    mu, sigma = F.stats_from_activations(jnp.asarray(acts))
    np.testing.assert_allclose(np.asarray(mu), acts.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma),
                               np.cov(acts, rowvar=False), atol=1e-4)


def test_kid_identical_sets_near_zero():
    rng = np.random.default_rng(3)
    acts = jnp.asarray(rng.normal(size=(256, 32)), jnp.float32)
    kid = float(F.kid_from_activations(jax.random.PRNGKey(0), acts, acts,
                                       n_subsets=50, subset_size=128))
    # unbiased MMD on same-distribution subsets: zero mean, finite variance
    assert abs(kid) < 0.15


def test_kid_separated_sets_positive():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.normal(size=(256, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(256, 32)) + 2.0, jnp.float32)
    kid = float(F.kid_from_activations(jax.random.PRNGKey(0), a, b,
                                       n_subsets=10, subset_size=64))
    assert kid > 0.5


@pytest.mark.slow
def test_inception_metrics_end_to_end(tmp_path):
    """Full pipeline with a random-init Inception on the synthetic dataset —
    validates plumbing (greyscale handling, batching, caching), not FID
    values."""
    from tests.conftest import CONF_DIR
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate
    from lightning_gan_zoo_tpu.eval.metrics_callback import InceptionMetrics

    cfg = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "train.img_size=16",
        "train.batch_size=4", "train.features_disc=8",
        "train.features_gen=8", "model.noise_dim=16", "precision=32",
        "val.fid_n_samples=8", f"dataset.root={tmp_path}", "dataset.n=16"])
    task = instantiate(cfg.model.lm, cfg, str(tmp_path))
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    metrics = InceptionMetrics(cfg, task, batch_size=4)
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    out = metrics.compute(dict(g_vars)["params"], g_state,
                          jax.random.PRNGKey(1))
    # random-init Inception => metrics are explicitly marked uncalibrated
    assert "fid" not in out and "kid" not in out
    assert np.isfinite(out["fid_uncalibrated"]) and \
        out["fid_uncalibrated"] >= 0
    assert np.isfinite(out["kid_uncalibrated"])
    # real-side cache written next to the dataset root, keyed by the
    # inputs that change activations (img_size / count / calibration) —
    # an unkeyed cache poisoned cross-resolution runs in round 4
    caches = list(tmp_path.glob("inception_cache_*px_*_rnd.npz"))
    assert len(caches) == 1, list(tmp_path.iterdir())
    # same config -> same cache key; a DIFFERENT resolution must miss it
    from lightning_gan_zoo_tpu.config import compose as _compose
    from tests.conftest import CONF_DIR as _CD
    assert InceptionMetrics(cfg, task,
                            batch_size=4)._cache_path() == caches[0]
    cfg32 = _compose(_CD, [
        "+expt=dc_gan", "dataset=synthetic", "train.img_size=32",
        "train.batch_size=4", "train.features_disc=8",
        "train.features_gen=8", "model.noise_dim=16", "precision=32",
        "val.fid_n_samples=8", f"dataset.root={tmp_path}", "dataset.n=16"])
    assert InceptionMetrics(cfg32, task,
                            batch_size=4)._cache_path() != caches[0]


def _export_torch_state(variables):
    """Flax Inception variables -> pytorch_fid-style state dict."""
    import torch
    state = {}

    def walk(tree, stats, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, stats.get(k, {}) if isinstance(stats, dict) else {},
                     name)
            elif k == "kernel":
                state[name.replace(".kernel", ".weight")] = torch.from_numpy(
                    np.asarray(v).transpose(3, 2, 0, 1))
            elif k == "scale":
                state[name.replace(".scale", ".weight")] = torch.from_numpy(
                    np.asarray(v))
            elif k == "bias":
                state[name] = torch.from_numpy(np.asarray(v))

    def walk_stats(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk_stats(v, name)
            elif k == "mean":
                state[name.replace(".mean", ".running_mean")] = \
                    torch.from_numpy(np.asarray(v))
            elif k == "var":
                state[name.replace(".var", ".running_var")] = \
                    torch.from_numpy(np.asarray(v))

    walk(variables["params"], variables.get("batch_stats", {}), "")
    walk_stats(variables["batch_stats"], "")
    return state


def test_torch_weight_loader_roundtrip(tmp_path):
    """Export our flax Inception params into a torch-style state dict and
    reload through load_torch_weights — outputs must be identical, proving
    the name mapping + OIHW→HWIO transposes so the real FID checkpoint
    drops in correctly."""
    import torch
    from lightning_gan_zoo_tpu.eval import inception as inc

    model, variables = inc.init_random(jax.random.PRNGKey(3))
    state = _export_torch_state(variables)
    path = tmp_path / "weights.pth"
    torch.save(state, path)
    model2, vars2 = inc.load_torch_weights(path)

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    out1 = np.asarray(model.apply(variables, x))
    out2 = np.asarray(model2.apply(vars2, x))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_frechet_fallback_on_ill_conditioned():
    """On covariance products where 30 Newton-Schulz iterations don't
    converge, frechet_distance must fall back to the scipy path instead of
    returning a silently wrong value."""
    rng = np.random.default_rng(5)
    d = 24
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    # eigenvalues spanning 14 orders of magnitude -> hopeless for f32 NS
    ev1 = np.logspace(-8, 6, d)
    ev2 = np.logspace(-6, 6, d)[::-1]
    s1 = (q * ev1) @ q.T
    s2 = (q * ev2) @ q.T
    mu1 = rng.normal(size=d)
    mu2 = rng.normal(size=d)
    got = float(F.frechet_distance(
        jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
        jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32)))
    want = float(F.frechet_distance_np(mu1, s1, mu2, s2))
    assert got == pytest.approx(want, rel=1e-3)


def test_weight_loader_rejects_bad_state_dicts(tmp_path):
    """Turn-key drop-in guarantee: a weights file that does not map EXACTLY
    onto the FID InceptionV3 (missing key, misspelled key, wrong shape)
    fails loudly instead of silently leaving random init somewhere."""
    import torch
    from lightning_gan_zoo_tpu.eval import inception as inc

    _, variables = inc.init_random(jax.random.PRNGKey(3))
    good = _export_torch_state(variables)

    missing = dict(good)
    missing.pop("Mixed_5b.branch1x1.conv.weight")
    torch.save(missing, tmp_path / "missing.pth")
    with pytest.raises(ValueError, match="missing parameters"):
        inc.load_torch_weights(tmp_path / "missing.pth")

    misspelled = dict(good)
    misspelled["Mixed_5b.branchXxX.conv.weight"] = misspelled.pop(
        "Mixed_5b.branch1x1.conv.weight")
    torch.save(misspelled, tmp_path / "misspelled.pth")
    with pytest.raises(ValueError):
        inc.load_torch_weights(tmp_path / "misspelled.pth")

    badshape = dict(good)
    badshape["Mixed_5b.branch1x1.conv.weight"] = torch.zeros(7, 7, 3, 3)
    torch.save(badshape, tmp_path / "badshape.pth")
    with pytest.raises(ValueError, match="shape mismatches"):
        inc.load_torch_weights(tmp_path / "badshape.pth")


@pytest.mark.slow   # ~90-130s: full inception compile (measured r4)
def test_metrics_calibrated_with_weights_file(tmp_path):
    """With a valid weights file configured, build() reports calibrated and
    InceptionMetrics logs plain fid/kid keys."""
    import torch
    from tests.conftest import CONF_DIR
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.eval import inception as inc
    from lightning_gan_zoo_tpu.eval.metrics_callback import InceptionMetrics
    from lightning_gan_zoo_tpu.config.registry import instantiate

    _, variables = inc.init_random(jax.random.PRNGKey(3))
    path = tmp_path / "pt_inception.pth"
    torch.save(_export_torch_state(variables), path)
    model, vars2, calibrated = inc.build(str(path))
    assert calibrated

    cfg = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "train.img_size=16",
        "train.batch_size=4", "train.features_disc=8",
        "train.features_gen=8", "model.noise_dim=16", "precision=32",
        "val.fid_n_samples=4", f"dataset.root={tmp_path}", "dataset.n=8",
        f"val.inception_weights_path={path}"])
    task = instantiate(cfg.model.lm, cfg, str(tmp_path))
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    metrics = InceptionMetrics(cfg, task, batch_size=4)
    assert metrics.calibrated
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    out = metrics.compute(dict(g_vars)["params"], g_state,
                          jax.random.PRNGKey(1))
    assert "fid" in out and "kid" in out


@pytest.mark.slow   # ~90-130s: full inception compile (measured r4)
def test_converted_model_frechet_matches_reference_formula(tmp_path):
    """On a CONVERTED model (torch state dict → flax), push two fixed image
    sets through pool3, then assert our jitted Newton–Schulz
    frechet_distance agrees numerically with the reference formula
    (gan_stability fid_score.py:25-80: scipy sqrtm of sigma1·sigma2, real
    part, trace identity) computed from the same activations."""
    import torch
    from lightning_gan_zoo_tpu.eval import inception as inc

    _, variables = inc.init_random(jax.random.PRNGKey(3))
    path = tmp_path / "pt_inception.pth"
    torch.save(_export_torch_state(variables), path)
    model, vars2 = inc.load_torch_weights(path)

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(0, 1, (12, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (12, 32, 32, 3)) ** 2, jnp.float32)
    act_a = np.asarray(model.apply(vars2, a), np.float64)
    act_b = np.asarray(model.apply(vars2, b), np.float64)

    mu_a, s_a = act_a.mean(0), np.cov(act_a, rowvar=False)
    mu_b, s_b = act_b.mean(0), np.cov(act_b, rowvar=False)
    want = float(F.frechet_distance_np(mu_a, s_a, mu_b, s_b))

    mu_a_j, s_a_j = F.stats_from_activations(jnp.asarray(act_a, jnp.float32))
    mu_b_j, s_b_j = F.stats_from_activations(jnp.asarray(act_b, jnp.float32))
    got = float(F.frechet_distance(mu_a_j, s_a_j, mu_b_j, s_b_j))
    assert got == pytest.approx(want, rel=2e-2, abs=1e-3)


def test_default_weights_path_drop_in(tmp_path, monkeypatch):
    """Zero-config calibration: a weights file at DEFAULT_WEIGHTS_PATH is
    picked up by build(None) with no val.inception_weights_path set."""
    import torch
    from lightning_gan_zoo_tpu.eval import inception as inc

    _, variables = inc.init_random(jax.random.PRNGKey(3))
    drop_in = tmp_path / "cache" / "pt_inception.pth"
    drop_in.parent.mkdir(parents=True)
    torch.save(_export_torch_state(variables), drop_in)
    monkeypatch.setattr(inc, "DEFAULT_WEIGHTS_PATH", drop_in)
    _, _, calibrated = inc.build(None)
    assert calibrated
    # explicit path still wins over the drop-in
    _, _, calibrated2 = inc.build(str(drop_in))
    assert calibrated2
    # and a missing drop-in still degrades gracefully to uncalibrated
    monkeypatch.setattr(inc, "DEFAULT_WEIGHTS_PATH",
                        tmp_path / "nope" / "missing.pth")
    _, _, calibrated3 = inc.build(None)
    assert not calibrated3


@pytest.mark.slow   # ~90-130s: full inception compile (measured r4)
def test_dump_fid_samples_writes_pngs(tmp_path):
    """val.dump_fid_samples=true writes the generated samples as PNGs under
    <logging_dir>/test_samples/ (reference parity, opt-in here)."""
    from tests.conftest import CONF_DIR
    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate
    from lightning_gan_zoo_tpu.eval.metrics_callback import InceptionMetrics

    cfg = compose(CONF_DIR, [
        "+expt=dc_gan", "dataset=synthetic", "train.img_size=16",
        "train.batch_size=4", "train.features_disc=8",
        "train.features_gen=8", "model.noise_dim=16", "precision=32",
        "val.fid_n_samples=6", f"dataset.root={tmp_path}", "dataset.n=8",
        "val.dump_fid_samples=True"])
    task = instantiate(cfg.model.lm, cfg, str(tmp_path))
    g_vars, _ = task.init(jax.random.PRNGKey(0))
    metrics = InceptionMetrics(cfg, task, batch_size=4,
                               logging_dir=str(tmp_path))
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    metrics.compute(dict(g_vars)["params"], g_state, jax.random.PRNGKey(1))
    pngs = sorted((tmp_path / "test_samples").glob("*.png"))
    assert len(pngs) == 6
    from PIL import Image
    im = Image.open(pngs[0])
    assert im.size == (16, 16)
