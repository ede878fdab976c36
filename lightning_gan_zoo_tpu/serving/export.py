"""Serving export: freeze a trained generator into a portable StableHLO
artifact (`jax.export`).

The reference has no deployment story — generation happens inside the
Lightning validation loop. For production TPU serving this module bakes a
task's eval-mode generator (params included as constants) into ONE
serialized StableHLO blob that any JAX runtime can deserialize and call
without this framework, its config tree, or its checkpoint code:

    python -m lightning_gan_zoo_tpu.serving.export +expt=dc_gan \\
        dataset=synthetic serving.batch=8 serving.out=/tmp/g.stablehlo \\
        [serving.ckpt=/path/to/ckpt_dir]        # best-FID ckpt auto-found

    blob = Path("/tmp/g.stablehlo").read_bytes()
    g = jax.export.deserialize(blob)
    images = g.call(z, seed)          # z: (batch, z_dim) f32 · seed: i32[]

The exported callable signature is (z, seed) → images in [-1, 1] NHWC;
`seed` feeds the generator's internal RNG streams (HoloGAN view sampling,
π-GAN camera/depth jitter) so stochastic-view models stay stochastic at
serving time. When a checkpoint is given, the EMA twin of G is used if the
run trained one (train.ema_decay > 0).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport


VIEW_DIM = 6   # [azimuth, elevation, scale, tx, ty, tz] (figures/types.py)


def build_exported_generator(task, g_params, g_state, extra, batch: int,
                             pose: bool = False,
                             dynamic_batch: bool = False):
    """jax.export the task's eval-mode generate() with params baked in.

    ``pose=True`` exports a POSE-CONDITIONED callable ``(z, view_in, seed)``
    for the view-conditioned families (hologan/pigan): ``view_in`` is a
    (batch, 6) pose row [azimuth_rad, elevation_rad, scale, tx, ty, tz] —
    the serving-time counterpart of the reference's azimuth/elevation
    figure sweeps (core/figures/types.py:182-359). Default export keeps
    the (z, seed) signature with internally sampled views.

    ``dynamic_batch=True`` exports with a SYMBOLIC batch dimension
    (jax.export shape polymorphism): one artifact serves any batch size —
    the TPU-serving norm, where request batches vary and per-shape
    artifacts would each recompile. Falls back to the static ``batch``
    (reason recorded in the sidecar) if a family's lowering rejects
    symbolic shapes.

    Returns ``(exported, info)`` where ``info`` is a dict with keys
    ``dynamic`` (bool — whether the symbolic-batch export shipped) and
    ``fallback_reason`` (str or None — every downgrade taken)."""
    z_dim = int(task.noise_dim)

    if pose:
        if not hasattr(task, "sample_view"):
            raise ValueError(
                f"serving.pose=true needs a view-conditioned family; "
                f"{type(task).__name__} samples no views")

        def gen(z, view_in, seed):
            key = jax.random.PRNGKey(seed)
            return task.generate(g_params, g_state, z, rng=key, extra=extra,
                                 view_in=view_in)

        def make_args(b):
            return (jax.ShapeDtypeStruct((b, z_dim), jnp.float32),
                    jax.ShapeDtypeStruct((b, VIEW_DIM), jnp.float32),
                    jax.ShapeDtypeStruct((), jnp.int32))
    else:
        def gen(z, seed):
            key = jax.random.PRNGKey(seed)
            return task.generate(g_params, g_state, z, rng=key, extra=extra)

        def make_args(b):
            return (jax.ShapeDtypeStruct((b, z_dim), jnp.float32),
                    jax.ShapeDtypeStruct((), jnp.int32))

    def attempt(args, platforms):
        if platforms:
            return jexport.export(jax.jit(gen), platforms=platforms)(*args)
        return jexport.export(jax.jit(gen))(*args)

    # preference order: (symbolic batch if asked) x (tpu+cpu, then current
    # backend only) — an artifact must always ship, and every downgrade is
    # recorded in the sidecar so a real lowering bug can't hide
    reasons = []
    shapes = []
    if dynamic_batch:
        try:  # symbolic-dim construction itself is fallback-protected too
            shapes.append(("dynamic", make_args(
                jexport.symbolic_shape("batch")[0])))
        except Exception as e:  # noqa: BLE001
            reasons.append(f"dynamic/symbolic_shape: "
                           f"{type(e).__name__}: {e}")
    shapes.append(("static", make_args(batch)))
    for shape_kind, args in shapes:
        for platforms in (("tpu", "cpu"), None):
            try:
                exp = attempt(args, platforms)
            except Exception as e:  # noqa: BLE001 — platform-specific
                # lowerings (e.g. Pallas custom calls) reject multi-platform
                # export with NotImplementedError/ValueError, Mosaic and
                # shape-polymorphism paths raise other types
                reasons.append(f"{shape_kind}/"
                               f"{'+'.join(platforms or ('native',))}: "
                               f"{type(e).__name__}: {e}")
                continue
            return exp, {"dynamic": shape_kind == "dynamic",
                         "fallback_reason": "; ".join(reasons) or None}
    raise RuntimeError("every export attempt failed: "
                       + "; ".join(reasons))


def export_generator(conf_dir, overrides: Sequence[str], batch: int,
                     out_path, ckpt: Optional[str] = None, seed: int = 0,
                     pose: bool = False, dynamic_batch: bool = False,
                     dtype: str = "f32"):
    """Compose the config, (optionally) restore a checkpoint, export G."""
    from ..config import compose
    from ..config.registry import instantiate
    from ..runtime.checkpoint import CheckpointManager
    from ..runtime.state import create_train_state

    dtype = str(dtype or "f32").lower()
    if dtype not in ("f32", "float32", "bf16", "bfloat16"):
        raise ValueError(f"serving.dtype must be f32|bf16, got {dtype!r}")
    dtype = "bf16" if dtype in ("bf16", "bfloat16") else "f32"

    cfg = compose(conf_dir, list(overrides))
    task = instantiate(cfg.model.lm, cfg, str(Path(out_path).parent))
    g_vars, d_vars = task.init(jax.random.PRNGKey(seed))
    extra = task.initial_extra()
    if ckpt:
        d_tx, g_tx = task.configure_optimizers(steps_per_epoch=1)
        template = create_train_state(
            g_vars, d_vars, g_tx, d_tx, extra=extra,
            ema=float(cfg.train.get("ema_decay") or 0) > 0)
        path = CheckpointManager.find_ckpt(ckpt) or Path(ckpt)
        state, _meta = CheckpointManager(None).restore(path, template)
        g_params, g_state = state.eval_g_params, state.g_state
        extra = state.extra
    else:
        g_vars = dict(g_vars)
        g_params = g_vars.pop("params")
        g_state = g_vars

    if dtype == "bf16":
        # halve the baked-constant weight payload; training already runs
        # the compute path in bf16 (the precision=16 policy), so serving
        # from bf16 weights matches the trained numerics
        def _cast(x):
            x = jnp.asarray(x)
            return x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
        g_params = jax.tree.map(_cast, g_params)

    exp, info = build_exported_generator(
        task, g_params, g_state, extra, batch, pose=pose,
        dynamic_batch=dynamic_batch)
    is_dynamic, fallback_reason = info["dynamic"], info["fallback_reason"]
    blob = exp.serialize()
    out_path = Path(out_path)
    out_path.write_bytes(blob)
    sidecar = {
        "expt": str(cfg.name),
        "batch": "dynamic" if is_dynamic else batch,
        "weights_dtype": dtype,
        "z_dim": int(task.noise_dim),
        "img_size": int(cfg.train.img_size),
        "call": ("images = jax.export.deserialize(blob).call(z, view_in, "
                 "seed)" if pose else
                 "images = jax.export.deserialize(blob).call(z, seed)"),
        "platforms": list(exp.platforms),
    }
    if pose:
        sidecar["pose"] = True
        sidecar["view_dim"] = VIEW_DIM
        sidecar["view_row"] = ("[azimuth_rad, elevation_rad, scale, "
                               "tx, ty, tz]")
    if fallback_reason is not None:
        sidecar["fallback_reason"] = fallback_reason
    out_path.with_suffix(out_path.suffix + ".json").write_text(
        json.dumps(sidecar, indent=2))
    return out_path, sidecar


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    serving = {"batch": 8, "out": "generator.stablehlo", "ckpt": None,
               "pose": False, "dynamic": False, "dtype": "f32"}
    overrides = []
    for a in argv:
        if a.startswith("serving."):
            k, v = a[len("serving."):].split("=", 1)
            serving[k] = v
        else:
            overrides.append(a)
    conf_dir = Path(__file__).resolve().parents[2] / "conf"
    def flag(name):
        return str(serving[name]).lower() in ("1", "true", "yes")

    out, sidecar = export_generator(
        conf_dir, overrides, int(serving["batch"]), serving["out"],
        ckpt=serving["ckpt"], pose=flag("pose"),
        dynamic_batch=flag("dynamic"), dtype=str(serving["dtype"]))
    print(f"exported {sidecar['expt']} generator → {out} "
          f"({out.stat().st_size/1e6:.1f} MB, "
          f"batch={sidecar['batch']}, "
          f"platforms={sidecar['platforms']})")


if __name__ == "__main__":
    main()
