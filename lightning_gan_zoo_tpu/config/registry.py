"""``_target_`` resolution: string → factory.

The reference constructs every pluggable object (LightningModule, G, D,
datasets, noise distributions, lr schedulers, figures, deformers) through
``hydra.utils.instantiate`` on ``_target_`` dotted paths (run_network.py:41-46,
core/lightning_module.py:38-49). Here targets resolve through an explicit
registry of JAX factories. Reference-era target strings (``torch.optim.Adam``,
``core.lightning_module.DCGAN``, ...) are registered as aliases so configs
written against the reference keep working verbatim.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable

from .node import Config

_REGISTRY: dict[str, Callable] = {}


class RegistryError(Exception):
    pass


def register(*names: str):
    """Decorator: register a factory under one or more target names."""

    def deco(fn: Callable) -> Callable:
        for name in names:
            _REGISTRY[name] = fn
        return fn

    return deco


def alias(name: str, target: str):
    _REGISTRY[name] = _REGISTRY[target]


def resolve(target: str) -> Callable:
    _ensure_populated()
    if target in _REGISTRY:
        return _REGISTRY[target]
    # Fall back to a real import for targets that exist in this codebase.
    if "." in target:
        module, attr = target.rsplit(".", 1)
        try:
            mod = importlib.import_module(module)
            return getattr(mod, attr)
        except (ImportError, AttributeError):
            pass
    raise RegistryError(
        f"Unknown _target_: {target!r}. Registered: {sorted(_REGISTRY)}"
    )


def instantiate(node: Any, *args, **kwargs) -> Any:
    """Mirror of ``hydra.utils.instantiate``: a Config with ``_target_`` becomes
    a call of the resolved factory with the remaining keys as kwargs."""
    if node is None:
        return None
    if not isinstance(node, Config):
        return node
    if "_target_" not in node:
        raise RegistryError(f"instantiate() needs a _target_ key; got {list(node)}")
    target = node["_target_"]
    fn = resolve(target)
    cfg_kwargs = {k: v for k, v in node.items() if k != "_target_"}
    cfg_kwargs.update(kwargs)
    return fn(*args, **cfg_kwargs)


_populated = False


def _ensure_populated():
    """Import the modules that carry @register decorations (lazy, once)."""
    global _populated
    if _populated:
        return
    _populated = True
    for mod in (
        "lightning_gan_zoo_tpu.targets",
    ):
        importlib.import_module(mod)
