"""Volumetric renderer: coarse+fine FiLM-SIREN NeRF (π-GAN / ANIGAN).

Re-designs reference core/nerf/nerf_renderer.py TPU-first:

  * NO python chunk loop (nerf_renderer.py:188-203) and NO per-chunk
    device→host copies (:156-159): at training shapes all B×rays×points
    samples materialise at once in one fused XLA computation. When the ray
    count exceeds ``chunk_size`` (e.g. 128² figure/FID generation), rays are
    processed in ``lax.map`` tiles — the same HBM bound as the reference's
    loop but still a single compiled program (tiled-vs-fused parity tested).
  * coarse and fine passes share ONE radiance-field module (the reference
    stores the same module under both keys, nerf_renderer.py:90).
  * stratified depth jitter and fine-pass inverse-CDF sampling consume
    explicit 'depth'/'fine' RNG streams.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cameras import OrthographicCameras, world_rays_from_ndc
from .sampling import sample_pdf, stratify_depths
from .siren import SirenRadianceField, SirenSingleShape


def shifted_cumprod(x: jax.Array, shift: int = 1) -> jax.Array:
    """pytorch3d _shifted_cumprod: cumprod along the last dim, shifted right
    by `shift` with ones padded in front."""
    cp = jnp.cumprod(x, axis=-1)
    pad = jnp.ones(x.shape[:-1] + (shift,), x.dtype)
    return jnp.concatenate([pad, cp[..., :-shift]], axis=-1)


def _ea_raymarch_impl(densities, features, white_bg: bool, eps: float):
    d = densities[..., 0]
    absorption = shifted_cumprod((1.0 + eps) - d, shift=1)
    weights = d * absorption
    feats = jnp.sum(weights[..., None] * features, axis=-2)
    opacities = 1.0 - jnp.prod(1.0 - d, axis=-1, keepdims=True)
    if white_bg:
        feats = feats + (1.0 - opacities)
    return jnp.concatenate([feats, opacities], axis=-1), weights


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ea_raymarch(densities: jax.Array, features: jax.Array,
                white_bg: bool = False, eps: float = 1e-10):
    """Emission-absorption compositing (reference raymarcher.py:16-63).

    densities: (..., P, 1) in [0, 1]; features: (..., P, F).
    Returns ((..., F+1) rgba-with-opacity, (..., P) weights); weights sum
    to ≤1 per ray (the reference's invariant, raymarcher.py:38-42).

    Custom VJP: autodiff of the cumprod chain is expensive on TPU; the
    analytic backward is an exclusive-cumprod plus one affine suffix scan —
      ∂L/∂d_k = (G_k − S_k)·A_k + g_opac·Π_{i≠k}(1−d_i),
      S_k = u_{k+1} + (c−d_{k+1})·S_{k+1},  u = G·d,
    with G the total weight cotangent and A the absorption. Division-free,
    so it stays finite and exact when densities saturate to exactly 1.0
    (validated against autodiff in tests/test_nerf.py).
    """
    return _ea_raymarch_impl(densities, features, white_bg, eps)


def _ea_fwd(densities, features, white_bg, eps):
    d = densities[..., 0]
    c = 1.0 + eps
    absorption = shifted_cumprod(c - d, shift=1)
    weights = d * absorption
    feats = jnp.sum(weights[..., None] * features, axis=-2)
    one_minus = 1.0 - d
    prod_all = jnp.prod(one_minus, axis=-1, keepdims=True)
    opacities = 1.0 - prod_all
    if white_bg:
        feats = feats + (1.0 - opacities)
    out = jnp.concatenate([feats, opacities], axis=-1)
    return (out, weights), (d, features, absorption, weights)


def _ea_bwd(white_bg, eps, res, cts):
    d, features, absorption, weights = res
    g_out, g_w = cts
    c = 1.0 + eps
    g_feat = g_out[..., :-1]
    g_opac = g_out[..., -1:]
    if white_bg:
        # feats += (1 − opac): opacity picks up −Σ_f g_feat_f
        g_opac = g_opac - jnp.sum(g_feat, axis=-1, keepdims=True)

    # total cotangent on each weight: direct + through the feature sum
    g_wtot = g_w + jnp.einsum("...f,...pf->...p", g_feat, features)
    # d-gradient through w_i = d_i·Π_{j<i}(c−d_j): for i>k,
    #   ∂w_i/∂d_k = −d_i·Π_{j<i,j≠k}(c−d_j) = −A_k·Σ-free suffix product,
    # so  Σ_{i>k} g_i·∂w_i/∂d_k = −A_k·S_k  with the linear recurrence
    #   S_k = u_{k+1} + a_{k+1}·S_{k+1},  u = g_wtot·d,  a = c−d.
    # Division-free on purpose: bf16-sigmoid densities saturate to exactly
    # 1.0 and c = 1+1e-10 is exactly 1.0 in f32, so the naive
    # suffix-sum/(c−d) form hits 0/0 — whose true limit is NONZERO (the
    # product with the zero factor removed). The suffix affine scan
    # evaluates that limit exactly (validated vs autodiff incl. d==1.0 in
    # tests/test_nerf.py).
    a = c - d
    u = g_wtot * d
    a_sh = jnp.concatenate([a[..., 1:], jnp.ones_like(a[..., :1])], -1)
    u_sh = jnp.concatenate([u[..., 1:], jnp.zeros_like(u[..., :1])], -1)

    def _compose(p, q):  # suffix composition of affine maps x → A·x + B
        ap, bp = p
        aq, bq = q
        return aq * ap, aq * bp + bq

    _, s = jax.lax.associative_scan(
        _compose, (a_sh, u_sh), reverse=True, axis=a_sh.ndim - 1)
    dd = (g_wtot - s) * absorption
    # opacity term: ∂(1−Π(1−d_i))/∂d_k = Π_{i≠k}(1−d_i), as exclusive
    # prefix × suffix products (no division — safe at d→1)
    one_minus = 1.0 - d
    prefix = shifted_cumprod(one_minus, shift=1)
    suffix_p = jnp.flip(shifted_cumprod(jnp.flip(one_minus, -1), shift=1), -1)
    dd = dd + g_opac * prefix * suffix_p

    d_features = weights[..., None] * g_feat[..., None, :]
    return dd[..., None], d_features


ea_raymarch.defvjp(_ea_fwd, _ea_bwd)


class RadianceFieldRenderer(nn.Module):
    n_pts_per_ray: int
    n_pts_per_ray_fine: int
    min_depth: float
    max_depth: float
    stratified: bool
    stratified_test: bool
    chunk_size: int
    latent_z_dim: int
    siren_dim_hidden: int
    siren_num_layers: int
    white_bg: bool
    single_shape: bool
    density_noise_std: float = 0.0
    deformer: Optional[nn.Module] = None
    siren_input_channels: int = 3
    #: rematerialise the radiance field in backward — the TPU-native
    #: replacement for the reference's ray chunking as OOM control
    #: (SURVEY §2.7: trade FLOPs for HBM instead of serialising)
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.remat:
            single_cls = nn.remat(SirenSingleShape)
            field_cls = nn.remat(SirenRadianceField)
        else:
            single_cls, field_cls = SirenSingleShape, SirenRadianceField
        if self.single_shape:
            self.rad_field = single_cls(
                latent_z_dim=self.latent_z_dim,
                num_layers=self.siren_num_layers,
                dim_hidden=self.siren_dim_hidden,
                deformer=self.deformer,
                input_channels=self.siren_input_channels,
                dtype=self.dtype)
        else:
            self.rad_field = field_cls(
                latent_z_dim=self.latent_z_dim,
                num_layers=self.siren_num_layers,
                dim_hidden=self.siren_dim_hidden,
                dtype=self.dtype)

    def _render_core(self, rad_field, origins, dirs_n, depths, z,
                     fine_key, do_stratify: bool, **deform_kwargs):
        """Coarse+fine render of one set of rays. ``rad_field`` is a callable
        (pts, dirs, z, **kw) → (densities, colors)."""
        # ---- coarse pass
        pts = origins[:, :, None, :] + depths[..., None] * dirs_n[:, :, None, :]
        dens_c, cols_c = rad_field(pts, dirs_n, z, **deform_kwargs)
        rgba_c, weights_c = ea_raymarch(
            dens_c.astype(jnp.float32), cols_c.astype(jnp.float32),
            self.white_bg)

        # ---- fine pass: importance-sample the coarse weights
        # (raysampler.py:110-164); samples detach from the coarse graph
        mids = 0.5 * (depths[..., 1:] + depths[..., :-1])
        z_samples = sample_pdf(
            fine_key, mids, jax.lax.stop_gradient(weights_c[..., 1:-1]),
            self.n_pts_per_ray_fine, det=not do_stratify)
        z_samples = jax.lax.stop_gradient(z_samples)
        # gather-gradient sort: jnp.sort's scatter VJP costs more than the
        # whole SIREN trunk on this stack (ops/sorting.py)
        from ..ops.sorting import sort_last
        depths_f = sort_last(jnp.concatenate([depths, z_samples], axis=-1))
        pts_f = origins[:, :, None, :] + \
            depths_f[..., None] * dirs_n[:, :, None, :]
        dens_f, cols_f = rad_field(pts_f, dirs_n, z, **deform_kwargs)
        rgba_f, _ = ea_raymarch(
            dens_f.astype(jnp.float32), cols_f.astype(jnp.float32),
            self.white_bg)
        return rgba_f

    def __call__(self, z, cameras: OrthographicCameras, rays_xy,
                 train: bool = True, **deform_kwargs):
        """rays_xy: (B, H, W, 2) or (B, N, 2) NDC grid → (B, H, W, 4) or
        (B, N, 4) fine RGBA.

        When the ray count exceeds ``chunk_size`` the rays are processed in
        ``lax.map`` tiles — the TPU-native replacement for the reference's
        python chunk loop (core/nerf/nerf_renderer.py:188-203): same HBM
        bound, but a single compiled computation with no per-chunk host
        round-trips."""
        b = z.shape[0]
        spatial = rays_xy.shape[1:-1]
        xy = rays_xy.reshape(b, -1, 2).astype(jnp.float32)
        n_rays = xy.shape[1]

        # ray sharding: under a ('data','sp') mesh (num_sp > 1,
        # parallel/mesh.py) the whole per-ray pipeline — SIREN field,
        # raymarch, sample_pdf, sort, fine pass — partitions along the ray
        # axis; XLA reshards to plain batch sharding at the image hand-off
        # below. No-op on a plain data mesh or outside a mesh_context.
        from ..parallel import mesh as pmesh
        sp_active = (not self.is_initializing()) and pmesh.sp_size() > 1 \
            and n_rays % pmesh.sp_size() == 0
        if sp_active:
            xy = pmesh.shard_rays(xy)

        origins, directions = world_rays_from_ndc(cameras, xy)
        dirs_n = directions / jnp.maximum(
            jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12)

        depths = jnp.linspace(self.min_depth, self.max_depth,
                              self.n_pts_per_ray, dtype=jnp.float32)
        depths = jnp.broadcast_to(depths, (b, n_rays, self.n_pts_per_ray))
        do_stratify = (self.stratified and train) or \
            (self.stratified_test and not train)
        if do_stratify:
            depths = stratify_depths(self.make_rng("depth"), depths)
        fine_key = (self.make_rng("fine") if do_stratify
                    else jax.random.PRNGKey(0))

        if sp_active:
            # keep derived per-ray tensors pinned to the ray sharding (cheap
            # belt-and-braces: propagation from xy already covers them) and
            # skip lax.map tiling — the sp axis IS the ray partitioning,
            # each chip holds n_rays/sp rays
            origins = pmesh.shard_rays(origins)
            dirs_n = pmesh.shard_rays(dirs_n)
            depths = pmesh.shard_rays(depths)
            rgba_f = self._render_core(self.rad_field, origins, dirs_n,
                                       depths, z, fine_key, do_stratify,
                                       **deform_kwargs)
            rgba_f = pmesh.unshard_rays(rgba_f)
            return rgba_f.reshape((b,) + spatial + (4,))

        chunk = int(self.chunk_size) if self.chunk_size else 0
        if self.is_initializing() or chunk <= 0 or n_rays <= chunk:
            rgba_f = self._render_core(self.rad_field, origins, dirs_n,
                                       depths, z, fine_key, do_stratify,
                                       **deform_kwargs)
            return rgba_f.reshape((b,) + spatial + (4,))

        # ---- tiled path: lax.map over ray tiles of chunk_size
        rf_mod, rf_vars = self.rad_field.unbind()

        def rf_apply(pts, dirs, zz, **kw):
            return rf_mod.apply(rf_vars, pts, dirs, zz, **kw)

        n_tiles = -(-n_rays // chunk)
        pad = n_tiles * chunk - n_rays

        def tile_axes(x):  # (b, N, ...) → (T, b, chunk, ...)
            xp = jnp.concatenate(
                [x, jnp.zeros((b, pad) + x.shape[2:], x.dtype)], axis=1) \
                if pad else x
            xp = xp.reshape(b, n_tiles, chunk, *x.shape[2:])
            return jnp.moveaxis(xp, 1, 0)

        tiles = (tile_axes(origins), tile_axes(dirs_n), tile_axes(depths),
                 jax.random.split(fine_key, n_tiles))

        def render_tile(args):
            o_t, d_t, dep_t, key_t = args
            return self._render_core(rf_apply, o_t, d_t, dep_t, z, key_t,
                                     do_stratify, **deform_kwargs)

        rgba_tiles = jax.lax.map(render_tile, tiles)       # (T, b, chunk, 4)
        rgba_f = jnp.moveaxis(rgba_tiles, 0, 1).reshape(b, n_tiles * chunk, 4)
        rgba_f = rgba_f[:, :n_rays]
        return rgba_f.reshape((b,) + spatial + (4,))
