"""Figure callbacks: sample grids, interpolation GIFs, pose sweeps.

Mirrors the reference figure framework (core/figures/types.py:42-359):
figures draw on validation end, either unconditionally or only when the
monitored metric (fid) improves over the callback-local best (types.py:78-91);
``save_all`` keeps per-epoch subdirectories; writing happens only on process 0.

Deviations from the reference (documented per SURVEY §7.3 item 9):
  * figure images are un-normalised with data_mean/data_std before saving
    (the reference clamps tanh outputs to [0,1], discarding the negative
    half — types.py:148; figure_details carries mean/std but never uses them)
  * AzimuthStep references an undefined ``self.camera_dist`` in the reference
    (types.py:205, latent AttributeError); here it uses the generator's
    view_args camera distance and works for both HoloGAN and π-GAN.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.losses import interpolate_sphere
from ..parallel.mesh import is_main_process
from .image_io import make_grid, save_gif, save_png, unnormalise


@dataclass
class FigureContext:
    """Everything a figure needs to draw (the pl_module stand-in)."""
    task: Any                 # GANTask
    g_params: Any
    g_state: Any
    cfg: Any                  # composed config
    epoch: int
    rng: jax.Array
    extra: Dict[str, Any] = field(default_factory=dict)

    def generate(self, z, **kwargs):
        """Jitted eval-mode generation.

        Figures call this in loops (pose-sweep GIFs: 40+ frames); eager
        flax apply would dispatch every op separately per frame — measured
        ~60 s/epoch of figure time for HoloGAN through the remote relay.
        The jitted callable caches on the TASK (contexts are rebuilt every
        epoch), keyed by the argument shapes plus any static (non-array)
        kwargs such as π-GAN's sample_res."""
        static = {k: v for k, v in kwargs.items()
                  if isinstance(v, (int, float, bool, str, type(None)))}
        arrays = {k: v for k, v in kwargs.items() if k not in static}
        cache = getattr(self.task, "_figure_jit_cache", None)
        if cache is None:
            cache = {}
            self.task._figure_jit_cache = cache
        arr_key = jax.tree_util.tree_structure(arrays), tuple(
            (jnp.shape(x), str(jnp.result_type(x)))
            for x in jax.tree_util.tree_leaves(arrays))
        key = (jnp.shape(z), tuple(sorted(static.items())), arr_key)
        fn = cache.get(key)
        if fn is None:
            task = self.task

            def fn(g_params, g_state, zz, rng, arr):
                return task.generate(g_params, g_state, zz, rng=rng,
                                     **static, **arr)

            fn = jax.jit(fn)
            cache[key] = fn
        return np.asarray(fn(self.g_params, self.g_state, z, self.rng,
                             arrays))

    def sample_z(self, n: int, salt: int = 0):
        return self.task.sample_z(jax.random.fold_in(self.rng, salt), n)

    def generate_sweep(self, z, view_ins, frames_per_call: int = 8,
                       **kwargs):
        """Pose-sweep frames of one object batch, ``frames_per_call`` frames
        per jitted dispatch (stacked along batch — HoloGAN/π-GAN generators
        are per-sample, so frames compose into one big batch). A 40-frame
        GIF becomes 5 dispatches instead of 40; on the remote-relay chip
        each dispatch costs ~0.4 s of RTT."""
        frames = []
        for i in range(0, len(view_ins), frames_per_call):
            chunk = view_ins[i:i + frames_per_call]
            zz = np.tile(np.asarray(z), (len(chunk), 1))
            vv = np.concatenate([np.asarray(v) for v in chunk], axis=0)
            fake = self.generate(jnp.asarray(zz), view_in=jnp.asarray(vv),
                                 **kwargs)
            frames.extend(np.split(fake, len(chunk), axis=0))
        return frames


class Figure:
    """PNG figure; draw() returns one HWC array in [0,1]."""

    ext = "png"

    def __init__(self, figure_details, parent_dir, monitor: Optional[str] = None,
                 **_kw):
        self.details = figure_details
        self.save_dir = Path(parent_dir) / figure_details.get("dir", "figures")
        self.filename = (figure_details.get("filename")
                         or f"{type(self).__name__}.{self.ext}")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.current_best_metric = float("inf")
        self.save_all = bool(figure_details.get("save_all", False))
        self.data_mean = float(figure_details.get("data_mean", 0.5))
        self.data_std = float(figure_details.get("data_std", 0.5))

    # -- drawing -------------------------------------------------------------
    def draw(self, ctx: FigureContext) -> np.ndarray:
        raise NotImplementedError

    def _prep(self, images: np.ndarray) -> np.ndarray:
        """Model output (normalised range) → display range [0,1]."""
        return unnormalise(images, self.data_mean, self.data_std)

    def _out_path(self, ctx: FigureContext) -> Path:
        if self.save_all:
            return self.save_dir / f"epoch_{ctx.epoch}" / self.filename
        return self.save_dir / self.filename

    def _write(self, artefact, path: Path):
        save_png(path, artefact)

    def draw_and_save(self, ctx: FigureContext):
        # draw is local-only by contract: multi-process callers pass
        # HOST-gathered params in ctx (runtime/loop.validate), so the
        # non-main processes can skip the whole draw without stranding
        # process 0 inside a cross-process computation
        if not is_main_process():
            return
        artefact = self.draw(ctx)
        self._write(artefact, self._out_path(ctx))
        # retained so the trainer can mirror fresh artifacts to TensorBoard
        self.last_artefact = artefact
        self.last_drawn_epoch = ctx.epoch

    def on_validation_end(self, ctx: FigureContext,
                          metrics: Dict[str, float]):
        if self.monitor:
            current = metrics.get(self.monitor)
            if current is None:
                return
            if current < self.current_best_metric:
                self.current_best_metric = current
                self.draw_and_save(ctx)
        else:
            self.draw_and_save(ctx)


class AnimationFigure(Figure):
    """GIF figure; draw() returns a list of HWC frames in [0,1]."""

    ext = "gif"

    def __init__(self, figure_details, parent_dir, monitor=None,
                 n_frames: int = 40, **kw):
        super().__init__(figure_details, parent_dir, monitor, **kw)
        self.n_frames = int(n_frames)

    def _write(self, artefact, path: Path):
        save_gif(path, artefact)


# ---------------------------------------------------------------------------
# Concrete figures
# ---------------------------------------------------------------------------

def _rgb(images: np.ndarray) -> np.ndarray:
    """NHWC → 3-channel (tile greyscale, drop alpha)."""
    c = images.shape[-1]
    if c == 1:
        return np.repeat(images, 3, axis=-1)
    if c > 3:
        return images[..., :3]
    return images


class SampleGrid(Figure):
    """ncol×ncol grid of fresh samples (reference types.py:169-180)."""

    def __init__(self, figure_details, parent_dir, monitor=None, ncol: int = 4,
                 **kw):
        super().__init__(figure_details, parent_dir, monitor, **kw)
        self.ncol = int(ncol)

    def draw(self, ctx):
        z = ctx.sample_z(self.ncol ** 2)
        fake = ctx.generate(z)
        return make_grid(self._prep(_rgb(fake)), ncol=self.ncol)


class Interpolation(AnimationFigure):
    """Spherical latent interpolation between two z batches, played forwards
    then backwards (types.py:241-264)."""

    def draw(self, ctx):
        z1 = ctx.sample_z(16, salt=1)
        z2 = ctx.sample_z(16, salt=2)
        frames = []
        for t in np.linspace(0.0, 1.0, self.n_frames):
            z = interpolate_sphere(z1, z2, float(t))
            fake = ctx.generate(z)
            frames.append(make_grid(self._prep(_rgb(fake)), ncol=4))
        return frames + frames[::-1]


def _view_args(ctx):
    return ctx.cfg.generator.view_args


def _view_in(azimuth_deg, elevation_deg, n):
    """6-dof pose rows [azimuth_rad, elevation_rad, scale, tx, ty, tz]."""
    v = np.array([azimuth_deg * math.pi / 180.0,
                  elevation_deg * math.pi / 180.0, 1.0, 0.0, 0.0, 0.0],
                 np.float32)
    return jnp.asarray(np.tile(v, (n, 1)))


class Interpolation3d(AnimationFigure):
    """Joint z + pose interpolation for view-conditioned generators
    (types.py:266-293)."""

    def draw(self, ctx):
        z1 = ctx.sample_z(16, salt=1)
        z2 = ctx.sample_z(16, salt=2)
        r1, r2 = jax.random.split(jax.random.fold_in(ctx.rng, 3))
        p1 = ctx.task.sample_view(r1, 16)
        p2 = ctx.task.sample_view(r2, 16)
        frames = []
        for t in np.linspace(0.0, 1.0, self.n_frames):
            z = interpolate_sphere(z1, z2, float(t))
            p = p2 * t + p1 * (1.0 - t)
            fake = ctx.generate(z, view_in=p)
            frames.append(make_grid(self._prep(_rgb(fake)), ncol=4))
        return frames + frames[::-1]


class AzimuthStep(Figure):
    """Grid: rows = objects, columns = azimuth sweep (types.py:182-215)."""

    def __init__(self, figure_details, parent_dir, monitor=None,
                 n_steps: int = 8, n_objs: int = 4, **kw):
        super().__init__(figure_details, parent_dir, monitor, **kw)
        self.n_steps, self.n_objs = int(n_steps), int(n_objs)

    def draw(self, ctx):
        va = _view_args(ctx)
        z = ctx.sample_z(self.n_objs)
        fixed_elev = (va.elevation_high + va.elevation_low) / 2.0
        views = [_view_in(az, fixed_elev, self.n_objs) for az in
                 np.linspace(va.azimuth_low, va.azimuth_high, self.n_steps)]
        cols = [self._prep(_rgb(f)) for f in ctx.generate_sweep(z, views)]
        rows = np.stack(cols, axis=1).reshape(
            (-1,) + cols[0].shape[1:])  # object-major
        return make_grid(rows, ncol=self.n_steps)


class ElevationStep(AzimuthStep):
    """Elevation sweep variant (types.py:217-239)."""

    def draw(self, ctx):
        va = _view_args(ctx)
        z = ctx.sample_z(self.n_objs)
        fixed_az = (va.azimuth_high + va.azimuth_low) / 2.0
        views = [_view_in(fixed_az, el, self.n_objs) for el in
                 np.linspace(va.elevation_low, va.elevation_high,
                             self.n_steps)]
        cols = [self._prep(_rgb(f)) for f in ctx.generate_sweep(z, views)]
        rows = np.stack(cols, axis=1).reshape((-1,) + cols[0].shape[1:])
        return make_grid(rows, ncol=self.n_steps)


class AzimuthGif(AnimationFigure):
    """Azimuth-orbit GIF of an ncol² grid (types.py:324-359)."""

    def __init__(self, figure_details, parent_dir, monitor=None, ncol: int = 4,
                 n_frames: int = 40, **kw):
        super().__init__(figure_details, parent_dir, monitor,
                         n_frames=n_frames, **kw)
        self.ncol = int(ncol)

    def draw(self, ctx):
        va = _view_args(ctx)
        z = ctx.sample_z(self.ncol ** 2)
        fixed_elev = (va.elevation_high + va.elevation_low) / 2.0
        views = [_view_in(az, fixed_elev, self.ncol ** 2) for az in
                 np.linspace(va.azimuth_low, va.azimuth_high, self.n_frames)]
        frames = [make_grid(self._prep(_rgb(f)), ncol=self.ncol)
                  for f in ctx.generate_sweep(z, views)]
        return frames + frames[::-1]


class ElevationGif(AnimationFigure):
    """Elevation-orbit GIF of 16 objects (types.py:295-322)."""

    def __init__(self, figure_details, parent_dir, monitor=None,
                 num_objs: int = 16, n_frames: int = 40, **kw):
        super().__init__(figure_details, parent_dir, monitor,
                         n_frames=n_frames, **kw)
        self.num_objs = int(num_objs)

    def draw(self, ctx):
        va = _view_args(ctx)
        z = ctx.sample_z(self.num_objs)
        fixed_az = (va.azimuth_high + va.azimuth_low) / 2.0
        views = [_view_in(fixed_az, el, self.num_objs) for el in
                 np.linspace(va.elevation_low, va.elevation_high,
                             self.n_frames)]
        frames = [make_grid(self._prep(_rgb(f)), ncol=4)
                  for f in ctx.generate_sweep(z, views)]
        return frames + frames[::-1]
