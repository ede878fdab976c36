"""ANIGAN figures: FullShapeAnalysis comparison grid + camera-orbit
turntable (reference core/figures/types.py:361-503).

The mesh row of FullShapeAnalysis renders with the JAX rasterizer
(nerf/rasterize.render_mesh_phong — interpolated vertex normals +
point-light Phong matching the reference's SoftPhongShader class; the
remaining deviation is hard vs sigma-blended coverage, an anti-aliasing
nicety). Both figures load a fixed batch of
val images + shape analyses once, as the reference does in __init__
(:370-374, :455-459), but lazily so a missing dataset fails at draw time
with a clear message instead of at trainer construction.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import instantiate
from ..nerf.cameras import OrthographicCameras, convert_cam_pred, \
    look_at_view_transform
from .image_io import make_grid
from .types import AnimationFigure, Figure, _rgb


class _ShapeAnalysisFigure:
    """Shared val-batch loading for the two ANIGAN figures."""

    def _load_batch(self, ctx, n_objs: int):
        if getattr(self, "_batch", None) is not None:
            return self._batch
        ds = instantiate(
            self.val_dataset,
            img_size=int(self.details["img_size"]),
            n_channels=int(self.details["channels_img"]),
            data_mean=float(self.details["data_mean"]),
            data_std=float(self.details["data_std"]))
        out = ds.load(list(range(n_objs)))
        if "shape_analysis" not in out:
            raise RuntimeError(
                "FullShapeAnalysis/AniganTurntable need a dataset with "
                "shape analyses (dataset=birds_analysed)")
        self._batch = out
        return out

    def _generate(self, ctx, sa, cameras, scale, n_objs):
        z = ctx.sample_z(n_objs)
        sa_j = {k: jnp.asarray(v) for k, v in sa.items()}
        deform = ctx.task.deformation_parameters(ctx.g_params, ctx.g_state,
                                                 sa_j)
        rgba = ctx.generate(
            z, cameras=cameras, ray_scale=scale,
            deformation_parameters=deform,
            deformed_verts=sa_j["verts"],
            mean_shape_verts=sa_j["mean_shape"],
            kp_verts=sa_j["kp_verts"])
        return np.asarray(rgba)


class FullShapeAnalysis(Figure, _ShapeAnalysisFigure):
    """5-row grid: real / mesh render / silhouette / generated rgb /
    generated alpha (types.py:361-441)."""

    def __init__(self, figure_details, parent_dir, monitor=None,
                 val_dataset=None, n_objs: int = 4, **kw):
        super().__init__(figure_details, parent_dir, monitor, **kw)
        self.val_dataset = val_dataset
        self.n_objs = int(n_objs)

    def draw(self, ctx):
        from ..nerf.rasterize import render_mesh_phong
        batch = self._load_batch(ctx, self.n_objs)
        sa = batch["shape_analysis"]
        img_size = int(self.details["img_size"])

        cameras, scale = convert_cam_pred(jnp.asarray(sa["cam_pred"]))
        # mesh render of the scaled analysis verts (types.py:390-409):
        # Phong shading + the reference's point light at (0,0,-3)
        verts = jnp.asarray(sa["verts"]) * scale[:, None, None]
        faces = jnp.asarray(sa["faces"][0] if sa["faces"].ndim == 3
                            else sa["faces"]).astype(jnp.int32)
        rendered = np.asarray(render_mesh_phong(verts, faces, cameras,
                                                img_size))

        # silhouette row: mask → 3ch at img_size (types.py:412-415)
        mask = sa["mask_pred"]
        m = jnp.asarray(mask)[..., None]
        m = jax.image.resize(m, (m.shape[0], img_size, img_size, 1),
                             "nearest")
        silhouette = np.repeat(np.asarray(m), 3, axis=-1)

        rgba = self._generate(ctx, sa, cameras, scale, self.n_objs)
        gen_rgb = self._prep(rgba[..., :3])
        gen_alpha = np.repeat(np.clip(rgba[..., 3:4], 0, 1), 3, axis=-1)

        real = self._prep(_rgb(batch["image"]))
        rows = np.concatenate([real, np.clip(rendered, 0, 1),
                               np.clip(silhouette, 0, 1), gen_rgb,
                               gen_alpha], axis=0)
        return make_grid(rows, ncol=self.n_objs)


class AniganTurntable(AnimationFigure, _ShapeAnalysisFigure):
    """Camera-orbit GIF with fixed deformation (types.py:443-503): per
    frame, the analysis camera rotation is composed with an azimuth orbit."""

    def __init__(self, figure_details, parent_dir, monitor=None,
                 val_dataset=None, n_frames: int = 40, n_objs: int = 4, **kw):
        super().__init__(figure_details, parent_dir, monitor,
                         n_frames=n_frames, **kw)
        self.val_dataset = val_dataset
        self.n_objs = int(n_objs)

    def draw(self, ctx):
        batch = self._load_batch(ctx, self.n_objs)
        sa = batch["shape_analysis"]
        cameras, scale = convert_cam_pred(jnp.asarray(sa["cam_pred"]))
        dist = float(ctx.cfg.generator.view_args["camera_dist"])

        frames = []
        for angle in np.linspace(0.0, 360.0, self.n_frames):
            orbit = look_at_view_transform(
                dist, np.zeros(self.n_objs), np.full(self.n_objs, angle))
            cams = OrthographicCameras(R=cameras.R @ orbit.R, T=cameras.T)
            rgba = self._generate(ctx, sa, cams, scale, self.n_objs)
            rgb = self._prep(rgba[..., :3])
            alpha = np.repeat(np.clip(rgba[..., 3:4], 0, 1), 3, axis=-1)
            rows = np.concatenate([rgb, alpha], axis=0)
            frames.append(make_grid(rows, ncol=self.n_objs))
        return frames
