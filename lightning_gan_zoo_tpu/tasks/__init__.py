from .base import GANTask, apply_model, build_noise_distn
from .gan2d import DCGAN, GANStabilityR1, WGAN, WGANGP, HOLOGAN

__all__ = ["GANTask", "apply_model", "build_noise_distn", "DCGAN",
           "GANStabilityR1", "WGAN", "WGANGP", "HOLOGAN"]


def __getattr__(name):
    # PIGAN/ANIGAN live in a heavier module (NeRF stack); import lazily.
    if name in ("PIGAN", "ANIGAN"):
        from . import nerf_gan
        return getattr(nerf_gan, name)
    raise AttributeError(name)
