"""FiLM-SIREN radiance fields (π-GAN) — reference core/nerf/implicit_function.py.

The SIREN MLP over B×rays×points samples is the hottest π-GAN compute
(SURVEY §3.4): it is expressed here as plain batched matmuls so XLA tiles it
straight onto the MXU. Weight init follows the SIREN rule
(implicit_function.py:31-38): U(±1/dim_in) for the first layer, else
U(±√(c/dim_in)/w0); biases share the same bound.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def siren_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SirenDense(nn.Module):
    """Parameter container matching nn.Dense's tree ('kernel' (in, out),
    'bias' (out,)) so plain and fused SirenNet builds share checkpoints.
    Returns the raw params; the caller does the affine (Siren inline, or
    the fused Pallas trunk across all layers)."""
    features: int
    w0: float
    c: float
    is_first: bool
    use_bias: bool

    @nn.compact
    def __call__(self, dim_in: int):
        w_std = (1.0 / dim_in) if self.is_first else \
            (math.sqrt(self.c / dim_in) / self.w0)
        kernel = self.param("kernel", siren_uniform(w_std),
                            (dim_in, self.features), jnp.float32)
        bias = (self.param("bias", siren_uniform(w_std),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class Siren(nn.Module):
    """One FiLM-modulated sine layer: sin(w0·(γ·(Wx+b)+β))
    (implicit_function.py:17-58)."""
    dim_out: int
    w0: float = 1.0
    c: float = 6.0
    is_first: bool = False
    use_bias: bool = True
    activation: Optional[Callable] = None  # None → Sine(w0)
    dtype: Any = jnp.float32

    def setup(self):
        self.dense = SirenDense(self.dim_out, self.w0, self.c,
                                self.is_first, self.use_bias, name="Dense_0")

    def __call__(self, x, gamma=None, beta=None):
        kernel, bias = self.dense(x.shape[-1])
        # bf16 numerics: the sine ARGUMENT must be f32 — with w0_initial=30
        # the first layer's pre-activation reaches O(10²) where bf16's 8-bit
        # mantissa gives ~radian-level error. The first layer therefore
        # computes fully in f32; later layers may matmul in the policy dtype
        # but always take the sine in f32.
        layer_dtype = jnp.float32 if self.is_first else self.dtype
        out = jnp.dot(x.astype(layer_dtype), kernel.astype(layer_dtype))
        if bias is not None:
            out = out + bias.astype(layer_dtype)
        # FiLM: γ/β are (B, dim_out); broadcast over ray/point dims
        if gamma is not None:
            g = gamma.reshape(gamma.shape[:1] + (1,) * (out.ndim - 2)
                              + gamma.shape[-1:])
            out = out * g.astype(out.dtype)
        if beta is not None:
            b = beta.reshape(beta.shape[:1] + (1,) * (out.ndim - 2)
                             + beta.shape[-1:])
            out = out + b.astype(out.dtype)
        if self.activation is None:
            # Under the bf16 policy, fast_sin's ≤7e-4 error sits an order of
            # magnitude below bf16 resolution and runs ~3× faster on the VPU
            # (SIREN is sine-bound — ops/fast_math.py). The f32 policy keeps
            # exact jnp.sin. The argument is always computed in f32: with
            # w0_initial=30 first-layer pre-activations reach O(10²) where
            # bf16 rounding means radian-level phase error.
            arg = self.w0 * out.astype(jnp.float32)
            if self.dtype == jnp.bfloat16:
                from ..ops.fast_math import fast_sin
                return fast_sin(arg).astype(self.dtype)
            return jnp.sin(arg).astype(self.dtype)
        return self.activation(out)


class SirenNet(nn.Module):
    """Stack of Siren layers, w0_initial=30 first layer
    (implicit_function.py:101-128).

    Under the bf16 policy on a real TPU the whole trunk runs as ONE fused
    Pallas kernel (ops/pallas/siren_trunk.py): weights VMEM-resident,
    activations never leave VMEM between layers, hand-written backward.
    The plain layer loop is the CPU/f32/parity path; both share one param
    tree (Siren_i/Dense_0/{kernel,bias})."""
    dim_hidden: int
    dim_out: int
    num_layers: int
    w0: float = 1.0
    w0_initial: float = 30.0
    dtype: Any = jnp.float32
    fused: bool = True
    #: test-only: run the fused branch in Pallas interpret mode on any
    #: backend, so the in-module wiring (dense() grandchild calls, γ=1/β=0
    #: packing, dtype casts) is CI-exercisable without a TPU
    fused_interpret: bool = False

    def setup(self):
        layers = []
        for i in range(self.num_layers):
            layers.append(Siren(self.dim_hidden,
                                w0=self.w0_initial if i == 0 else self.w0,
                                is_first=(i == 0), dtype=self.dtype,
                                name=f"Siren_{i}"))
        layers.append(Siren(self.dim_out, w0=self.w0, dtype=self.dtype,
                            name=f"Siren_{self.num_layers}"))
        self.layers = layers

    def __call__(self, x, gammas=None, betas=None):
        use_fused = (self.fused
                     and (self.fused_interpret
                          or (self.dtype == jnp.bfloat16
                              and jax.default_backend() == "tpu"))
                     and x.ndim == 3
                     and self.dim_out == self.dim_hidden
                     and self.dim_hidden % 128 == 0)
        if not use_fused:
            for i in range(self.num_layers):
                g = gammas[:, i] if gammas is not None else None
                b = betas[:, i] if betas is not None else None
                x = self.layers[i](x, g, b)
            return self.layers[-1](x)

        from ..ops.pallas.siren_trunk import siren_trunk
        bsz = x.shape[0]
        kparams = []
        dim_in = x.shape[-1]
        for lyr in self.layers:
            kparams.append(lyr.dense(dim_in))
            dim_in = self.dim_hidden
        w0k = kparams[0][0]
        wmid = jnp.stack([k for k, _ in kparams[1:]])
        bs = jnp.stack([b for _, b in kparams])
        if gammas is None:
            # γ=1/β=0 on layer 0 ≡ no FiLM (dummy grads flow nowhere)
            g_in = jnp.ones((bsz, 1, self.dim_hidden), jnp.float32)
            b_in = jnp.zeros_like(g_in)
        else:
            g_in = gammas.astype(jnp.float32)
            b_in = betas.astype(jnp.float32)
        w0s = (self.w0_initial,) + (self.w0,) * self.num_layers
        out = siren_trunk(x.astype(jnp.float32), w0k, wmid, bs,
                          g_in, b_in, w0s, self.fused_interpret)
        return out.astype(self.dtype)


class MappingNetwork(nn.Module):
    """z → per-head (γ, β) FiLM parameters; input L2-normalised
    (implicit_function.py:77-99)."""
    dim: int
    dim_out: int
    n_heads: int = 1
    depth: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        x = x.astype(self.dtype)
        for _ in range(self.depth):
            x = nn.leaky_relu(nn.Dense(self.dim * self.n_heads,
                                       dtype=self.dtype)(x), 0.2)
        gammas = nn.Dense(self.dim_out * self.n_heads, dtype=self.dtype)(x)
        betas = nn.Dense(self.dim_out * self.n_heads, dtype=self.dtype)(x)
        b = z.shape[0]
        return (gammas.reshape(b, self.n_heads, self.dim_out),
                betas.reshape(b, self.n_heads, self.dim_out))


class SirenRadianceField(nn.Module):
    """π-GAN radiance field: FiLM-SIREN trunk → α head; [feat‖dir] → rgb
    siren → rgb head; sigmoids on both (implicit_function.py:130-191)."""
    latent_z_dim: int
    num_layers: int
    dim_hidden: int
    dtype: Any = jnp.float32
    fused_siren: bool = True

    @nn.compact
    def __call__(self, points, directions, z, **_kw):
        """points: (B, N, P, 3) world ray points; directions: (B, N, 3)."""
        gammas, betas = MappingNetwork(self.latent_z_dim, self.dim_hidden,
                                       n_heads=self.num_layers,
                                       dtype=self.dtype)(z)
        rgb_g, rgb_b = MappingNetwork(self.latent_z_dim, self.dim_hidden,
                                      n_heads=1, dtype=self.dtype,
                                      name="rgb_mapping")(z)
        dirs = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12)
        dirs = jnp.broadcast_to(dirs[:, :, None, :], points.shape)

        # Flatten (N, P) → M for the trunk: 4-D operands give the trunk's
        # dot_generals a permuted {3,1,2,0} layout and XLA lowers their
        # BACKWARD dots to VPU multiply-reduce fusions (trace-verified);
        # with (B, M, C) operands every dot stays an MXU matmul.
        b, n, p, _ = points.shape
        pts = points.reshape(b, n * p, points.shape[-1])
        dirs = dirs.reshape(b, n * p, 3)
        x = SirenNet(self.dim_hidden, self.dim_hidden, self.num_layers,
                     dtype=self.dtype, fused=self.fused_siren)(pts, gammas,
                                                               betas)
        alpha = nn.Dense(1, dtype=self.dtype, name="to_alpha")(x)
        x = jnp.concatenate([x, dirs.astype(x.dtype)], axis=-1)
        x = Siren(self.dim_hidden, dtype=self.dtype,
                  name="to_rgb_siren")(x, rgb_g[:, 0], rgb_b[:, 0])
        rgb = nn.Dense(3, dtype=self.dtype, name="to_rgb")(x)
        return (nn.sigmoid(alpha).reshape(b, n, p, 1),
                nn.sigmoid(rgb).reshape(b, n, p, 3))


class SirenSingleShape(nn.Module):
    """ANIGAN variant: two SIREN trunks (rgb + alpha) over DEFORMED ray
    points produced by deformer.transform (implicit_function.py:193-288).

    The reference's no-deformation fallback feeds random noise
    (torch.rand(...).cuda(), :276) — reproduced with an explicit 'deform'
    rng stream."""
    latent_z_dim: int
    num_layers: int
    dim_hidden: int
    deformer: Optional[nn.Module] = None
    input_channels: int = 3
    dtype: Any = jnp.float32
    fused_siren: bool = True

    @nn.compact
    def __call__(self, points, directions, z, deformation_parameters=None,
                 deformed_verts=None, mean_shape_verts=None, kp_verts=None,
                 **_kw):
        b = points.shape[0]
        gammas, betas = MappingNetwork(self.latent_z_dim, self.dim_hidden,
                                       n_heads=self.num_layers,
                                       dtype=self.dtype)(z)
        rgb_g, rgb_b = MappingNetwork(self.latent_z_dim, self.dim_hidden,
                                      n_heads=1, dtype=self.dtype,
                                      name="rgb_mapping")(z)
        dirs = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12)
        dirs = jnp.broadcast_to(dirs[:, :, None, :],
                                points.shape[:-1] + (3,))

        n, p = points.shape[1], points.shape[2]
        if deformation_parameters is not None or deformed_verts is not None:
            flat = points.reshape(b, -1, 3)
            deformed = self.deformer.transform(
                flat, deformed_verts, mean_shape_verts, kp_verts,
                deformation_parameters)
            # stay flattened (B, M, C): 4-D trunk operands make XLA lower
            # the backward dots to VPU multiply-reduce (see
            # SirenRadianceField) — reshape heads back at exit instead
            deformed = deformed.reshape(b, n * p, self.input_channels)
        else:
            deformed = jax.random.uniform(
                self.make_rng("deform"), (b, n * p, self.input_channels))
        dirs = dirs.reshape(b, n * p, 3)

        x = SirenNet(self.dim_hidden, self.dim_hidden, self.num_layers,
                     dtype=self.dtype, fused=self.fused_siren)(deformed,
                                                               gammas, betas)
        x = jnp.concatenate([x, dirs.astype(x.dtype)], axis=-1)
        x = Siren(self.dim_hidden, dtype=self.dtype,
                  name="to_rgb_siren")(x, rgb_g[:, 0], rgb_b[:, 0])
        rgb = nn.Dense(3, dtype=self.dtype, name="to_rgb")(x)

        a = SirenNet(self.dim_hidden, self.dim_hidden, self.num_layers,
                     dtype=self.dtype, fused=self.fused_siren,
                     name="alpha_siren")(deformed)
        alpha = nn.Dense(1, dtype=self.dtype, name="to_alpha")(a)
        return (nn.sigmoid(alpha).reshape(b, n, p, 1),
                nn.sigmoid(rgb).reshape(b, n, p, 3))
