from .types import (Figure, AnimationFigure, FigureContext, SampleGrid,
                    Interpolation, Interpolation3d, AzimuthStep,
                    ElevationStep, AzimuthGif, ElevationGif)

# ANIGAN figures live in their own module (mesh rendering dependencies).
from .anigan_figures import FullShapeAnalysis, AniganTurntable  # noqa: F401

__all__ = ["Figure", "AnimationFigure", "FigureContext", "SampleGrid",
           "Interpolation", "Interpolation3d", "AzimuthStep", "ElevationStep",
           "AzimuthGif", "ElevationGif", "FullShapeAnalysis",
           "AniganTurntable"]
