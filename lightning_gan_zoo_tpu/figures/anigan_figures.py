"""ANIGAN figures: FullShapeAnalysis comparison grid and camera-orbit
turntable (reference core/figures/types.py:361-503).

Implemented after the ANIGAN generator stack lands; placeholders raise with a
clear message if drawn before that.
"""
from __future__ import annotations

from .types import AnimationFigure, Figure


class FullShapeAnalysis(Figure):
    def __init__(self, figure_details, parent_dir, monitor=None,
                 val_dataset=None, n_objs: int = 4, **kw):
        super().__init__(figure_details, parent_dir, monitor, **kw)
        self.val_dataset = val_dataset
        self.n_objs = int(n_objs)

    def draw(self, ctx):
        raise NotImplementedError(
            "FullShapeAnalysis requires the ANIGAN mesh-render path "
            "(pending milestone)")


class AniganTurntable(AnimationFigure):
    def __init__(self, figure_details, parent_dir, monitor=None,
                 val_dataset=None, n_frames: int = 40, n_objs: int = 4, **kw):
        super().__init__(figure_details, parent_dir, monitor,
                         n_frames=n_frames, **kw)
        self.val_dataset = val_dataset
        self.n_objs = int(n_objs)

    def draw(self, ctx):
        raise NotImplementedError(
            "AniganTurntable requires the ANIGAN deformation path "
            "(pending milestone)")
