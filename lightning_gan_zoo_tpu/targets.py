"""Registry population: every ``_target_`` string the config surface may name.

Reference-era target strings (core.lightning_module.*, torchvision.datasets.*,
core.models.*) are registered alongside the native
lightning_gan_zoo_tpu.* names so configs written for the reference compose
unchanged (SURVEY §5.6: keep the exact Hydra-compatible surface).
"""
from __future__ import annotations

from .config.registry import register


def _model_factory(cls, allowed=None):
    """Wrap a linen module class: drop torch-era kwargs the TPU build doesn't
    need (e.g. hologan's `gpu: True`)."""

    def factory(**kwargs):
        import dataclasses
        fields = {f.name for f in dataclasses.fields(cls)}
        clean = {k: v for k, v in kwargs.items() if k in fields}
        return cls(**clean)

    factory.__name__ = f"make_{cls.__name__}"
    return factory


# --- model zoo -------------------------------------------------------------

@register("lightning_gan_zoo_tpu.models.dcgan.Generator",
          "core.models.standard_networks.Generator")
def _dcgan_g(**kw):
    from .models import dcgan
    return _model_factory(dcgan.Generator)(**kw)


@register("lightning_gan_zoo_tpu.models.dcgan.Discriminator",
          "core.models.standard_networks.Discriminator")
def _dcgan_d(**kw):
    from .models import dcgan
    return _model_factory(dcgan.Discriminator)(**kw)


@register("lightning_gan_zoo_tpu.models.resnet_stability.Generator",
          "core.submodules.gan_stability.models.resnet.Generator")
def _resnet_g(**kw):
    from .models import resnet_stability
    return _model_factory(resnet_stability.Generator)(**kw)


@register("lightning_gan_zoo_tpu.models.resnet_stability.Discriminator",
          "core.submodules.gan_stability.models.resnet.Discriminator")
def _resnet_d(**kw):
    from .models import resnet_stability
    return _model_factory(resnet_stability.Discriminator)(**kw)


@register("lightning_gan_zoo_tpu.models.hologan.Generator",
          "core.models.hologan_generator.Generator")
def _hologan_g(**kw):
    from .models import hologan
    return _model_factory(hologan.Generator)(**kw)


@register("lightning_gan_zoo_tpu.models.hologan.Discriminator",
          "core.models.hologan_discriminator.Discriminator")
def _hologan_d(**kw):
    from .models import hologan
    return _model_factory(hologan.Discriminator)(**kw)


@register("lightning_gan_zoo_tpu.models.pigan.Generator",
          "core.models.pigan.Generator")
def _pigan_g(**kw):
    from .models import pigan
    return pigan.make_generator(**kw)


@register("lightning_gan_zoo_tpu.models.pigan.Discriminator",
          "core.models.pigan.Discriminator")
def _pigan_d(**kw):
    from .models import pigan
    return _model_factory(pigan.Discriminator)(**kw)


@register("lightning_gan_zoo_tpu.models.anigan.Generator",
          "core.models.anigan.Generator")
def _anigan_g(**kw):
    from .models import anigan
    return anigan.make_generator(**kw)


# --- tasks (the reference's LightningModules) --------------------------------

def _task(name):
    def factory(cfg, logging_dir=None, **_kw):
        from . import tasks
        cls = getattr(tasks, name)
        return cls(cfg)
    factory.__name__ = f"make_{name}"
    return factory


for _name in ("DCGAN", "GANStabilityR1", "WGAN", "WGANGP", "HOLOGAN",
              "PIGAN", "ANIGAN"):
    register(f"lightning_gan_zoo_tpu.tasks.{_name}",
             f"core.lightning_module.{_name}")(_task(_name))


# --- datasets -----------------------------------------------------------------

@register("lightning_gan_zoo_tpu.data.datasets.ImageFolder",
          "torchvision.datasets.ImageFolder")
def _image_folder(**kw):
    from .data.datasets import ImageFolder
    return ImageFolder(**kw)


@register("lightning_gan_zoo_tpu.data.datasets.MNIST",
          "torchvision.datasets.MNIST")
def _mnist(**kw):
    from .data.datasets import MNIST
    return MNIST(**kw)


@register("lightning_gan_zoo_tpu.data.datasets.Synthetic")
def _synthetic(**kw):
    from .data.datasets import Synthetic
    return Synthetic(**kw)


@register("lightning_gan_zoo_tpu.data.datasets.AnimalAnalysisFolder",
          "core.anigan.dataset.AnimalAnalysisFolder")
def _animal_folder(**kw):
    from .data.datasets import AnimalAnalysisFolder
    return AnimalAnalysisFolder(**kw)


# --- figures ---------------------------------------------------------------

def _figure(name):
    def factory(*args, **kw):
        from . import figures
        cls = getattr(figures, name)
        return cls(*args, **kw)
    factory.__name__ = f"make_{name}"
    return factory


for _name in ("SampleGrid", "Interpolation", "Interpolation3d", "AzimuthStep",
              "ElevationStep", "AzimuthGif", "ElevationGif",
              "FullShapeAnalysis", "AniganTurntable"):
    register(f"lightning_gan_zoo_tpu.figures.{_name}",
             f"core.figures.types.{_name}")(_figure(_name))


# --- deformers (ANIGAN) --------------------------------------------------------

def _deformer(name):
    def factory(**kw):
        from .anigan import deformer
        cls = getattr(deformer, name)
        return cls(**kw)
    factory.__name__ = f"make_{name}"
    return factory


for _name in ("TPSDeformer", "KernelDeformer", "RBFDeformer", "LSTMDeformer",
              "SirenDeformer", "DisplacementDeformer"):
    register(f"lightning_gan_zoo_tpu.anigan.deformer.{_name}",
             f"core.anigan.deformer.{_name}")(_deformer(_name))
