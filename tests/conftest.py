"""Test environment: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile+execute without TPU hardware (SURVEY §4)."""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin (sitecustomize) registers itself ahead of 'cpu' in
# jax_platforms whenever PALLAS_AXON_POOL_IPS is set — drop it so tests run
# on the virtual CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

CONF_DIR = REPO_ROOT / "conf"

# Persistent compilation cache — XLA CPU compiles are slow on this box;
# cached reruns are ~12x faster.
import jax  # noqa: E402

# sitecustomize may already have prepended 'axon' to jax_platforms at
# interpreter boot; override before any backend initialisation.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
