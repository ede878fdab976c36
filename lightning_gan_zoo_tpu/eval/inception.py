"""FID InceptionV3 (pool3, 2048-d) in flax — on-device feature extraction.

Replaces the pip ``pytorch_fid`` InceptionV3 the reference shells out to
(core/callback_inception_metrics.py:210-231; vendored twin at
core/submodules/gan_stability/metrics/inception.py:16-120). The topology is
the FID variant of InceptionV3 (TF2015 weights): torchvision InceptionV3 with
the FID tweaks — count_include_pad=False average pools inside the A/C/E
mixed blocks and a max-pooled branch_pool in the final E block.

Weights: `load_torch_weights(path)` ingests the standard
``pt_inception-2015-12-05-6726825d.pth`` state dict (module names here match
the torch names 1:1, so conversion is mechanical). Without a weights file the
network runs with deterministic random init — the FID/KID *pipeline* is
exact, but absolute values are not comparable to published numbers until the
weights file is dropped in (no network egress in this environment).

Input: NHWC float in [0, 1]; resized to 299² and remapped to [-1, 1]
(inception.py:75-77 equivalent).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool_nocount(x, window=(3, 3), strides=(1, 1), padding=(1, 1)):
    """AvgPool2d(count_include_pad=False) — the FID-specific pooling."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    pad = [padding, padding] if isinstance(padding[0], int) else padding
    pad = [tuple(p) for p in pad]
    summed = nn.pooling.pool(x, 0.0, jax.lax.add, window, strides, pad)
    counts = nn.pooling.pool(ones, 0.0, jax.lax.add, window, strides, pad)
    return summed / jnp.maximum(counts, 1.0)


def _max_pool(x, window=(3, 3), strides=(2, 2)):
    return nn.max_pool(x, window, strides=strides)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1",
                         dtype=self.dtype)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=[(2, 2), (2, 2)],
                         name="branch5x5_2", dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=[(1, 1), (1, 1)],
                         name="branch3x3dbl_2", dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=[(1, 1), (1, 1)],
                         name="branch3x3dbl_3", dtype=self.dtype)(b3)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=[(1, 1), (1, 1)],
                         name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3",
                         dtype=self.dtype)(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)],
                         name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)],
                         name="branch7x7_3", dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)],
                         name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)],
                         name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)],
                         name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)],
                         name="branch7x7dbl_5", dtype=self.dtype)(bd)
        bp = _avg_pool_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2",
                         dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1",
                         dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)],
                         name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)],
                         name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4",
                         dtype=self.dtype)(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # 'avg' (FIDInceptionE_1) | 'max' (E_2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3a = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)],
                          name="branch3x3_2a", dtype=self.dtype)(b3)
        b3b = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)],
                          name="branch3x3_2b", dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1",
                         dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=[(1, 1), (1, 1)],
                         name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bda = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)],
                          name="branch3x3dbl_3a", dtype=self.dtype)(bd)
        bdb = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)],
                          name="branch3x3dbl_3b", dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "avg":
            bp = _avg_pool_nocount(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=[(1, 1), (1, 1)])
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Blocks 0-3 of the FID InceptionV3; returns pool3 features (N, 2048)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x01):
        """x01: NHWC in [0,1], any spatial size (resized to 299²)."""
        x = jax.image.resize(x01, x01.shape[:1] + (299, 299, x01.shape[-1]),
                             method="bilinear")
        x = 2.0 * x - 1.0
        x = x.astype(self.dtype)

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3",
                        dtype=self.dtype)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(64, (3, 3), padding=[(1, 1), (1, 1)],
                        name="Conv2d_2b_3x3", dtype=self.dtype)(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=self.dtype)(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3",
                        dtype=self.dtype)(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE("avg", name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE("max", name="Mixed_7c", dtype=self.dtype)(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pool3 (N, 2048)


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def init_random(rng: Optional[jax.Array] = None):
    """Deterministic random variables (pipeline testing without weights).

    Conv kernels are He-rescaled (×√2 over the flax LeCun-normal default):
    with ~94 stacked conv+ReLU layers and identity batch-stats, LeCun init
    decays activation variance by ~2^-94 — pool3 features come out ≈ dead
    (std ~4e-4) and the *uncalibrated* FID collapses into f32 noise
    (measured: real-vs-real 1e-7 vs noise-vs-real 2e-5). He scaling keeps
    features O(1) so the fallback metric has usable dynamic range; the
    calibrated path (real weights) is untouched."""
    model = InceptionV3FID()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 32, 32, 3)))

    def _he(path, leaf):
        if leaf.ndim == 4 and path[-1].key == "kernel":
            return leaf * np.sqrt(2.0, dtype=np.float32)
        return leaf
    params = jax.tree_util.tree_map_with_path(_he, variables["params"])
    variables = dict(variables, params=params)
    return model, variables


def load_torch_weights(path: str | Path):
    """Convert the pytorch_fid FID-weights state dict into flax variables.

    Torch module names map 1:1 onto the flax module names used above
    ('Mixed_5b.branch1x1.conv.weight' → params/Mixed_5b/branch1x1/conv/kernel
    with OIHW→HWIO transpose; bn running stats land in batch_stats).
    """
    import torch
    state = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value.numpy())

    unconsumed = []
    for name, tensor in state.items():
        parts = name.split(".")
        if len(parts) >= 2 and parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"],
                tensor.permute(2, 3, 1, 0))
        elif len(parts) >= 2 and parts[-2] == "bn":
            if parts[-1] == "weight":
                put(params, parts[:-1] + ["scale"], tensor)
            elif parts[-1] == "bias":
                put(params, parts[:-1] + ["bias"], tensor)
            elif parts[-1] == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], tensor)
            elif parts[-1] == "running_var":
                put(batch_stats, parts[:-1] + ["var"], tensor)
            elif parts[-1] != "num_batches_tracked":
                unconsumed.append(name)
        elif parts[0] in ("fc", "AuxLogits") or parts[-1] == \
                "num_batches_tracked":
            pass  # logits head / aux classifier: unused for pool3 features
        else:
            unconsumed.append(name)

    # STRICT validation: the assembled tree must exactly match the model's
    # expected structure and shapes, so dropping in the real
    # pt_inception-2015-12-05 file is verified turn-key — a name-mapping
    # miss fails loudly instead of silently leaving random init somewhere.
    model = InceptionV3FID()
    variables = {"params": params, "batch_stats": batch_stats}
    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 75, 75, 3)))
    exp_flat = {"/".join(str(k.key) for k in path): v.shape
                for path, v in jax.tree_util.tree_flatten_with_path(
                    expected)[0]}
    got_flat = {"/".join(str(k.key) for k in path): v.shape
                for path, v in jax.tree_util.tree_flatten_with_path(
                    variables)[0]}
    problems = []
    if unconsumed:
        problems.append(f"unmapped torch keys: {sorted(unconsumed)[:8]}")
    missing = sorted(set(exp_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(exp_flat))
    if missing:
        problems.append(f"missing parameters: {missing[:8]}")
    if extra:
        problems.append(f"unexpected parameters: {extra[:8]}")
    bad_shapes = [f"{k}: got {got_flat[k]}, want {exp_flat[k]}"
                  for k in set(exp_flat) & set(got_flat)
                  if tuple(got_flat[k]) != tuple(exp_flat[k])]
    if bad_shapes:
        problems.append(f"shape mismatches: {sorted(bad_shapes)[:8]}")
    if problems:
        raise ValueError(
            f"Inception weights at {path} do not map onto the FID "
            f"InceptionV3: " + "; ".join(problems))
    return model, variables


#: Zero-config drop-in location for the FID weights: a file here (put
#: there by tools/fetch_inception_weights.py, or copied by hand) calibrates
#: FID automatically with `val.inception_weights_path` unset.
DEFAULT_WEIGHTS_PATH = (
    Path.home() / ".cache" / "lightning_gan_zoo_tpu"
    / "pt_inception-2015-12-05-6726825d.pth")


def build(weights_path: Optional[str] = None):
    """(model, variables, calibrated) — tries the configured weights file
    (falling back to :data:`DEFAULT_WEIGHTS_PATH` when unset), else random
    init with ``calibrated=False`` so callers can rename metrics
    (fid → fid_uncalibrated) and skip best-FID checkpoint naming."""
    if weights_path and Path(weights_path).exists():
        model, variables = load_torch_weights(weights_path)
        return model, variables, True
    if not weights_path and DEFAULT_WEIGHTS_PATH.exists():
        model, variables = load_torch_weights(DEFAULT_WEIGHTS_PATH)
        print(f"[fid] using inception weights from the drop-in cache "
              f"{DEFAULT_WEIGHTS_PATH}")
        return model, variables, True
    if weights_path:
        print(f"[fid] WARNING: inception weights not found at "
              f"{weights_path}; using random init — FID/KID values are "
              "self-consistent but not comparable to published numbers")
    else:
        print("[fid] WARNING: no inception weights configured; using random "
              "init — run tools/fetch_inception_weights.py (egress needed) "
              f"or drop pt_inception-2015-12-05 at {DEFAULT_WEIGHTS_PATH} "
              "for reference parity")
    model, variables = init_random()
    return model, variables, False
