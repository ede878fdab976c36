#!/usr/bin/env python
"""CLI entry point — the Hydra-compatible surface of the TPU GAN zoo.

Usage mirrors the reference (run_network.py:25-75 there):

    python run_network.py +expt=dc_gan dataset=mnist calc_fid=False
    python run_network.py +expt=pigan machine=local dataset=celeb_a
    python run_network.py +expt=wgan dataset=mnist --cfg job   # print config

Overrides: ``group=choice`` selects a config-group option, ``a.b.c=v`` sets a
value, ``+key=v`` adds, ``~key`` deletes, and
``+group@package.path=choice`` composes ``conf/<group>/<choice>.yaml`` into
an arbitrary package node (e.g. ``+figures@figures.azimuth_step=azimuth_step``
attaches an extra figure callback). ``--cfg job`` prints the composed config
and exits (Hydra's debugging flag).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

CONF_DIR = REPO_ROOT / "conf"


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    print_cfg = False
    overrides = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--cfg":
            print_cfg = True
            if i + 1 < len(argv) and argv[i + 1] in ("job", "all", "hydra"):
                i += 1
        elif a in ("-h", "--help"):
            print(__doc__)
            return 0
        else:
            overrides.append(a)
        i += 1

    # Persistent XLA compilation cache: first compile is slow (esp. the
    # 20-40s TPU cold compile), reruns are near-instant.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # Multi-host (multi-slice / DCN) training: set LGZT_MULTIHOST=1 on every
    # host (plus the usual JAX coordinator env). The input pipeline stripes
    # per process and artifact writes are process-0 gated.
    if os.environ.get("LGZT_MULTIHOST") == "1":
        jax.distributed.initialize()

    from lightning_gan_zoo_tpu.config import compose, ComposeError
    try:
        cfg = compose(CONF_DIR, overrides)
    except ComposeError as e:
        print(f"Config composition error: {e}", file=sys.stderr)
        return 2

    if print_cfg:
        import yaml
        print(yaml.safe_dump(cfg.to_container(), sort_keys=False,
                             default_flow_style=None))
        return 0

    from lightning_gan_zoo_tpu.runtime.loop import train
    train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
