"""Minimal JAX mesh rasterizer (orthographic): Phong and Lambert shading.

Replaces the pytorch3d MeshRenderer+SoftPhongShader used ONLY by the
FullShapeAnalysis figure (reference core/figures/types.py:397-409).
``render_mesh_phong`` matches the reference's shading class: per-vertex
normals interpolated barycentrically per pixel, point light at the
reference's location (types.py:381-383), pytorch3d default light/material
coefficients (ambient 0.5 / diffuse 0.3 / specular 0.2, shininess 64),
white background. Remaining documented deviation: hard z-buffered coverage
instead of pytorch3d's sigma-blended SOFT rasterization (an anti-aliasing
refinement, not a shading-class difference). ``render_mesh_lambert`` is the
cheaper flat-shaded variant kept for smoke tests.

Brute-force barycentric coverage, scanned over face chunks to bound memory;
z-buffering via per-pixel min depth. Runs fine on TPU or CPU for
figure-sized meshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cameras import OrthographicCameras


def render_mesh_lambert(verts: jax.Array, faces: jax.Array,
                        cameras: OrthographicCameras, img_size: int,
                        light_dir=(0.0, 0.0, -1.0),
                        face_chunk: int = 512,
                        colors: jax.Array = None) -> jax.Array:
    """verts: (B, V, 3) world; faces: (F, 3) int32; → (B, S, S, 3) in [0,1].

    ``colors``: optional (B, 3) per-instance albedo in [0, 1]; the Lambert
    shade multiplies it over the white background (default: white albedo —
    identical to the historical grayscale output)."""
    b = verts.shape[0]
    s = img_size
    # world → view (pytorch3d row-vector convention)
    vview = jnp.einsum("bvj,bjk->bvk", verts.astype(jnp.float32),
                       cameras.R) + cameras.T[:, None]
    # NDC (+x left, +y up) → pixel grid matching sample_full_xys orientation
    xs = (1.0 - vview[..., 0]) * 0.5 * (s - 1)
    ys = (1.0 - vview[..., 1]) * 0.5 * (s - 1)
    zs = vview[..., 2]
    v2d = jnp.stack([xs, ys], axis=-1)                    # (B, V, 2)

    px, py = jnp.meshgrid(jnp.arange(s, dtype=jnp.float32),
                          jnp.arange(s, dtype=jnp.float32), indexing="xy")
    pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (S², 2)

    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)

    n_faces = faces.shape[0]
    pad = (-n_faces) % face_chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0) if pad else faces
    valid = jnp.concatenate(
        [jnp.ones((n_faces,), bool), jnp.zeros((pad,), bool)]) if pad else \
        jnp.ones((n_faces,), bool)
    faces_c = faces_p.reshape(-1, face_chunk, 3)
    valid_c = valid.reshape(-1, face_chunk)

    if colors is None:
        colors = jnp.ones((b, 3), jnp.float32)

    def render_one(v2d_b, zs_b, vview_b, col_b):
        def body(carry, fc):
            zbuf, shade = carry
            f, ok = fc
            tri = v2d_b[f]                                # (C, 3, 2)
            tz = zs_b[f]                                  # (C, 3)
            # barycentric coordinates of every pixel for every face
            a, bb, c = tri[:, 0], tri[:, 1], tri[:, 2]
            v0 = bb - a
            v1 = c - a
            den = v0[:, 0] * v1[:, 1] - v1[:, 0] * v0[:, 1]    # (C,)
            den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
            p = pix[None] - a[:, None]                    # (C, S², 2)
            w1 = (p[..., 0] * v1[:, None, 1]
                  - v1[:, None, 0] * p[..., 1]) / den[:, None]
            w2 = (v0[:, None, 0] * p[..., 1]
                  - p[..., 0] * v0[:, None, 1]) / den[:, None]
            w0 = 1.0 - w1 - w2
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[:, None]
            depth = (w0 * tz[:, 0, None] + w1 * tz[:, 1, None]
                     + w2 * tz[:, 2, None])
            depth = jnp.where(inside, depth, jnp.inf)
            # lambert shade per face from the view-space normal
            e0 = vview_b[f[:, 1]] - vview_b[f[:, 0]]
            e1 = vview_b[f[:, 2]] - vview_b[f[:, 0]]
            nrm = jnp.cross(e0, e1)
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
            lam = jnp.abs(nrm @ light)                    # two-sided
            face_shade = 0.25 + 0.75 * lam                # ambient + diffuse
            # best face in this chunk per pixel
            best = jnp.argmin(depth, axis=0)              # (S²,)
            best_depth = jnp.take_along_axis(depth, best[None], 0)[0]
            best_shade = face_shade[best]
            closer = best_depth < zbuf
            return (jnp.where(closer, best_depth, zbuf),
                    jnp.where(closer, best_shade, shade)), None

        init = (jnp.full((s * s,), jnp.inf),
                jnp.zeros((s * s,)))
        (zbuf, shade), _ = jax.lax.scan(body, init, (faces_c, valid_c))
        fg = jnp.isfinite(zbuf)                           # white background
        rgb = jnp.where(fg[:, None], shade[:, None] * col_b[None, :], 1.0)
        return rgb.reshape(s, s, 3)

    return jax.vmap(render_one)(v2d, zs, vview,
                                jnp.asarray(colors, jnp.float32))


def _vertex_normals(vview: jax.Array, faces: jax.Array) -> jax.Array:
    """Area-weighted per-vertex normals in view space. (V, 3) per batch."""
    e0 = vview[faces[:, 1]] - vview[faces[:, 0]]
    e1 = vview[faces[:, 2]] - vview[faces[:, 0]]
    fn = jnp.cross(e0, e1)                         # unnormalised = area-weighted
    vn = jnp.zeros_like(vview)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-9)


def render_mesh_phong(verts: jax.Array, faces: jax.Array,
                      cameras: OrthographicCameras, img_size: int,
                      light_location=(0.0, 0.0, -3.0),
                      ambient: float = 0.5, diffuse: float = 0.3,
                      specular: float = 0.2, shininess: float = 64.0,
                      face_chunk: int = 512) -> jax.Array:
    """Phong-shaded render matching the reference figure's shader class
    (SoftPhongShader + PointLights(location=[[0,0,-3]]), types.py:381-409):
    smooth barycentric-interpolated vertex normals, point-light diffuse +
    specular with pytorch3d's default coefficients. Two-sided normals (the
    analysis meshes carry no guaranteed winding). verts: (B, V, 3) world;
    faces: (F, 3) int32 → (B, S, S, 3) in [0, 1], white background."""
    b = verts.shape[0]
    s = img_size
    vview = jnp.einsum("bvj,bjk->bvk", verts.astype(jnp.float32),
                       cameras.R) + cameras.T[:, None]
    xs = (1.0 - vview[..., 0]) * 0.5 * (s - 1)
    ys = (1.0 - vview[..., 1]) * 0.5 * (s - 1)
    zs = vview[..., 2]
    v2d = jnp.stack([xs, ys], axis=-1)                    # (B, V, 2)
    vnorm = jax.vmap(_vertex_normals, in_axes=(0, None))(vview, faces)

    px, py = jnp.meshgrid(jnp.arange(s, dtype=jnp.float32),
                          jnp.arange(s, dtype=jnp.float32), indexing="xy")
    pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (S², 2)

    light_pos = jnp.asarray(light_location, jnp.float32)
    view_dir = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)  # orthographic

    n_faces = faces.shape[0]
    pad = (-n_faces) % face_chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0) if pad else faces
    valid = jnp.concatenate(
        [jnp.ones((n_faces,), bool), jnp.zeros((pad,), bool)]) if pad else \
        jnp.ones((n_faces,), bool)
    faces_c = faces_p.reshape(-1, face_chunk, 3)
    valid_c = valid.reshape(-1, face_chunk)

    def render_one(v2d_b, zs_b, vview_b, vn_b):
        def body(carry, fc):
            zbuf, shade = carry
            f, ok = fc
            tri = v2d_b[f]                                # (C, 3, 2)
            tz = zs_b[f]                                  # (C, 3)
            a, bb, c = tri[:, 0], tri[:, 1], tri[:, 2]
            v0 = bb - a
            v1 = c - a
            den = v0[:, 0] * v1[:, 1] - v1[:, 0] * v0[:, 1]
            den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
            p = pix[None] - a[:, None]                    # (C, S², 2)
            w1 = (p[..., 0] * v1[:, None, 1]
                  - v1[:, None, 0] * p[..., 1]) / den[:, None]
            w2 = (v0[:, None, 0] * p[..., 1]
                  - p[..., 0] * v0[:, None, 1]) / den[:, None]
            w0 = 1.0 - w1 - w2
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[:, None]
            depth = (w0 * tz[:, 0, None] + w1 * tz[:, 1, None]
                     + w2 * tz[:, 2, None])
            depth = jnp.where(inside, depth, jnp.inf)
            # barycentric-interpolated position + normal per pixel
            w = jnp.stack([w0, w1, w2], axis=-1)          # (C, S², 3)
            pos = jnp.einsum("cpk,ckj->cpj", w, vview_b[f])
            nrm = jnp.einsum("cpk,ckj->cpj", w, vn_b[f])
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
            ldir = light_pos[None, None] - pos
            ldir = ldir / jnp.maximum(
                jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-9)
            cosl = jnp.sum(nrm * ldir, axis=-1, keepdims=True)
            ndl = jnp.abs(cosl[..., 0])                   # two-sided
            # two-sided shading must also flip the normal for the specular
            # reflection: with the raw normal a back-winding face gets a
            # |n·l| diffuse term but a reflection vector pointing away from
            # the viewer, losing/misplacing its highlight
            nrm2 = nrm * jnp.sign(jnp.where(cosl == 0.0, 1.0, cosl))
            refl = 2.0 * jnp.abs(cosl) * nrm2 - ldir
            spec = jnp.maximum(jnp.sum(refl * view_dir, axis=-1), 0.0)
            pix_shade = jnp.clip(
                ambient + diffuse * ndl + specular * spec ** shininess,
                0.0, 1.0)                                 # (C, S²)
            best = jnp.argmin(depth, axis=0)              # (S²,)
            best_depth = jnp.take_along_axis(depth, best[None], 0)[0]
            best_shade = jnp.take_along_axis(pix_shade, best[None], 0)[0]
            closer = best_depth < zbuf
            return (jnp.where(closer, best_depth, zbuf),
                    jnp.where(closer, best_shade, shade)), None

        init = (jnp.full((s * s,), jnp.inf),
                jnp.zeros((s * s,)))
        (zbuf, shade), _ = jax.lax.scan(body, init, (faces_c, valid_c))
        img = jnp.where(jnp.isfinite(zbuf), shade, 1.0)   # white background
        return jnp.repeat(img.reshape(s, s, 1), 3, axis=-1)

    return jax.vmap(render_one)(v2d, zs, vview, vnorm)
