"""Serving/deployment utilities (StableHLO generator export)."""
from .export import build_exported_generator, export_generator  # noqa: F401
