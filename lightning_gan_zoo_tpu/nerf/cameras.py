"""Pure-JAX orthographic camera math (the PyTorch3D replacement).

The reference leans on pytorch3d's FoVOrthographicCameras +
look_at_view_transform (core/models/pigan.py:42-66, core/nerf/raysampler.py:55,
core/utils/anigan.py:5-20). Here the same conventions are implemented in
closed form:

  * world→view:  X_view = X_world @ R + T   (pytorch3d's row-vector
    convention; R columns are the camera axes in world coords)
  * look_at(dist, elev, azim): eye = dist·(sin az·cos el, sin el,
    cos az·cos el), at=origin, up=+Y
  * FoVOrthographic defaults (scale 1, ±1 extents, znear=1, zfar=100):
    NDC x = x_view, y = y_view; NDC depth d ↔ z_view = d·(zfar−znear)+znear

Ray construction collapses the reference's unproject-two-planes trick
(raysampler.py:36-65): for an orthographic camera, rays through NDC (x, y)
start on the znear plane and run along +z_view with magnitude zfar−znear;
both are mapped to world space with R/T. This reproduces the reference's ray
geometry exactly while staying a handful of matmuls — no autocast escape
hatch needed (raysampler.py:54 forces fp32 under AMP; here the whole camera
path is fp32 by construction).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

Z_NEAR = 1.0
Z_FAR = 100.0


class OrthographicCameras(NamedTuple):
    """Batched camera extrinsics, pytorch3d convention."""
    R: jax.Array  # (B, 3, 3)
    T: jax.Array  # (B, 3)


def look_at_view_transform(dist, elev_deg, azim_deg) -> OrthographicCameras:
    """pytorch3d.renderer.look_at_view_transform for at=origin, up=+Y.

    Args accept scalars or (B,) arrays; angles in degrees.
    """
    elev = jnp.deg2rad(jnp.asarray(elev_deg, jnp.float32))
    azim = jnp.deg2rad(jnp.asarray(azim_deg, jnp.float32))
    dist = jnp.asarray(dist, jnp.float32)
    elev, azim, dist = jnp.broadcast_arrays(
        jnp.atleast_1d(elev), jnp.atleast_1d(azim), jnp.atleast_1d(dist))

    eye = jnp.stack([dist * jnp.sin(azim) * jnp.cos(elev),
                     dist * jnp.sin(elev),
                     dist * jnp.cos(azim) * jnp.cos(elev)], axis=-1)
    return cameras_from_eye(eye)


def cameras_from_eye(eye: jax.Array, at=None, up=None) -> OrthographicCameras:
    b = eye.shape[0]
    at = jnp.zeros((b, 3)) if at is None else at
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (b, 3)) if up is None \
        else up
    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    # degenerate case (up ∥ z): fall back like pytorch3d
    degenerate = jnp.sum(x_axis * x_axis, axis=-1, keepdims=True) < 1e-10
    fallback = _normalize(jnp.cross(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), z_axis.shape), z_axis))
    x_axis = jnp.where(degenerate, fallback, x_axis)
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    R = jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # columns = axes
    T = -jnp.einsum("bi,bij->bj", eye, R)
    return OrthographicCameras(R=R, T=T)


def _normalize(v, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def world_rays_from_ndc(cameras: OrthographicCameras, xy_ndc: jax.Array):
    """Orthographic rays through NDC points.

    Args:
      xy_ndc: (B, N, 2).
    Returns:
      origins (B, N, 3) on the znear plane, directions (B, N, 3) of
      magnitude (zfar − znear) — exactly the reference's two-plane
      construction (raysampler.py:36-65).
    """
    b, n, _ = xy_ndc.shape
    xy = xy_ndc.astype(jnp.float32)
    origins_view = jnp.concatenate(
        [xy, jnp.full((b, n, 1), Z_NEAR)], axis=-1)
    dir_view = jnp.array([0.0, 0.0, Z_FAR - Z_NEAR], jnp.float32)

    # view→world: X_world = (X_view − T) @ R⁻¹ = (X_view − T) @ Rᵀ
    r_t = jnp.swapaxes(cameras.R, 1, 2)
    origins = jnp.einsum("bnj,bjk->bnk", origins_view - cameras.T[:, None],
                         r_t)
    directions = jnp.broadcast_to(dir_view, (b, n, 3))
    directions = jnp.einsum("bnj,bjk->bnk", directions, r_t)
    return origins, directions


def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """(w, x, y, z) quaternions → rotation matrices (pytorch3d convention,
    used by convert_cam_pred, core/utils/anigan.py:12-15)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    m = jnp.stack([
        1.0 - (yy + zz), xy - wz, xz + wy,
        xy + wz, 1.0 - (xx + zz), yz - wx,
        xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)
    return m.reshape(quat.shape[:-1] + (3, 3))


def convert_cam_pred(cam_pred: jax.Array):
    """(scale, tx, ty, quat[4]) shape-analysis camera → orthographic cameras
    + scale. Mirrors reference core/utils/anigan.py:5-20 exactly:
    R = inverse(quat_matrix) @ diag(-1,-1,1), T = (−tx, −ty, 1)."""
    scale = cam_pred[:, 0]
    tx, ty = cam_pred[:, 1], cam_pred[:, 2]
    quat = cam_pred[:, 3:7]
    flip = jnp.diag(jnp.array([-1.0, -1.0, 1.0], jnp.float32))
    rot = quaternion_to_matrix(quat)
    # quaternion matrices are orthonormal → inverse = transpose
    R = jnp.swapaxes(rot, 1, 2) @ flip[None]
    T = jnp.stack([-tx, -ty, jnp.ones_like(tx)], axis=1)
    return OrthographicCameras(R=R, T=T), scale
