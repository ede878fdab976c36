"""Pose-control + identity-consistency score for the shapes evidence run.

Zero-egress quality metrics for a 3D-aware GAN (π-GAN) trained on the
procedural multi-view shapes dataset (tools/make_shapes_dataset.py) — the
volumetric counterpart of tools/digits_score.py. Random-feature FID ranks
low-level statistics; what a NeRF GAN must actually demonstrate is that it
FACTORS identity (z) from pose (camera), so this scores exactly that:

  1. POSE CONTROL — train an azimuth regressor on freshly rendered,
     labelled real views (the dataset generator knows its cameras), report
     its real-data MAE as the ceiling, then render a commanded azimuth
     sweep from the checkpoint and report MAE + Pearson r between
     commanded and predicted azimuth. A 2D GAN that memorises views has no
     azimuth knob at all; a collapsed one shows r ~ 0.
  2. IDENTITY CONSISTENCY — foreground mean-albedo spread of ONE object
     across views vs the spread ACROSS objects: intra/inter < 1 means z
     keeps controlling identity while the camera moves (albedo is
     azimuth-invariant by construction in the dataset).

Scores either volumetric family trained on the shapes dataset — the π-GAN
evidence run (default) or the HoloGAN one (``--family hologan``); both
generators take the shared 6-dof ``view_in`` rows (figures/types.py
_view_in), so the commanded-azimuth sweep is the same protocol.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/shapes_score.py \
      <ckpt_dir_or_path> [--json] [--family pigan|hologan]
  python tools/shapes_score.py --init    # untrained-generator baseline
"""
from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# per-family model config — must match the evidence-run CLI commands
# (docs/TRAINING_EVIDENCE.md) so the checkpoint template trees line up
FAMILIES = {
    "pigan": dict(
        overrides=[
            "+expt=pigan", "machine=local", "dataset=synthetic",
            "train.img_size=32",
            "nerf.siren_dim_hidden=48", "nerf.siren_num_layers=3",
            "nerf.n_pts_per_ray=8", "nerf.n_pts_per_ray_fine=8",
            "model.noise_dim=64", "train.features_disc=32",
            "resolution_annealing.resolutions=[16,32,32]",
            "variable_batch_size.batch_sizes=[16,16,16]",
            "accumulate_grad_batches=1", "nerf.white_bg=True",
            "calc_fid=False", "save_ckpts=False", "seed=42",
        ],
        img=32,
        elev_rad=0.0,          # pigan cameras: elevation 0 = equator
        sample_res=True,       # generate() takes sample_res=<img>
        tanh_range=False,      # renderer emits [0,1] RGB (+silhouette)
    ),
    "hologan": dict(
        overrides=[
            # the evidence run uses the PRODUCTION hologan config (no
            # model shrinking): batch 32, img 64, noise 128
            "+expt=hologan", "dataset=synthetic",
            "calc_fid=False", "save_ckpts=False", "seed=42",
        ],
        img=64,
        elev_rad=math.pi / 2,  # hologan view_args: elevation 90 = equator
        sample_res=False,      # fixed-resolution voxel generator
        tanh_range=True,       # tanh output in [-1, 1] -> unnormalise
    ),
}

N_OBJS, N_VIEWS = 16, 9          # GAN sweep: objects x commanded azimuths
AZ_LO, AZ_HI = 225.0, 315.0      # inside the training span (220-320)


def labelled_real(n: int, seed: int, img: int):
    """n rendered real views with known azimuth -> (imgs [0,1], azim_deg)."""
    import jax
    import jax.numpy as jnp

    from tools.make_shapes_dataset import (AZIM_LOW, AZIM_HIGH, CAM_DIST,
                                           build_instances)
    from lightning_gan_zoo_tpu.nerf.cameras import look_at_view_transform
    from lightning_gan_zoo_tpu.nerf.rasterize import render_mesh_lambert

    rng = np.random.default_rng(seed)
    render = jax.jit(render_mesh_lambert,
                     static_argnames=("img_size", "face_chunk"))
    imgs, azs = [], []
    done, bs = 0, 64
    while done < n:
        k = min(bs, n - done)
        verts, faces, colors = build_instances(rng, k)
        azim = rng.uniform(AZIM_LOW, AZIM_HIGH, k).astype(np.float32)
        cams = look_at_view_transform(CAM_DIST, np.zeros(k, np.float32),
                                      azim)
        out = render(jnp.asarray(verts), jnp.asarray(faces), cams,
                     img_size=img, colors=jnp.asarray(colors))
        imgs.append(np.asarray(jnp.clip(out, 0.0, 1.0), np.float32))
        azs.append(azim)
        done += k
    return np.concatenate(imgs)[:n], np.concatenate(azs)[:n]


def train_regressor(img: int, n_train: int = 1500, n_test: int = 400):
    from sklearn.neural_network import MLPRegressor

    x, y = labelled_real(n_train + n_test, seed=123, img=img)
    x = x.reshape(len(x), -1)
    reg = MLPRegressor(hidden_layer_sizes=(256,), max_iter=300,
                       random_state=0)
    reg.fit(x[:n_train], y[:n_train])
    pred = reg.predict(x[n_train:])
    mae = float(np.abs(pred - y[n_train:]).mean())
    return reg, mae


def sweep_from_ckpt(ckpt: Path | None, fam: dict):
    """(N_OBJS, N_VIEWS, img, img, 3) images + commanded azimuths (deg)."""
    import jax
    import jax.numpy as jnp

    from lightning_gan_zoo_tpu.config import compose
    from lightning_gan_zoo_tpu.config.registry import instantiate
    from lightning_gan_zoo_tpu.runtime.checkpoint import CheckpointManager
    from lightning_gan_zoo_tpu.runtime.state import create_train_state

    cfg = compose(REPO / "conf", fam["overrides"])
    task = instantiate(cfg.model.lm, cfg, "/tmp/shapes_score")
    g_vars, d_vars = task.init(jax.random.PRNGKey(0))
    g_params = dict(g_vars)["params"]
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    if ckpt is not None:
        d_tx, g_tx = task.configure_optimizers(steps_per_epoch=1)
        template = jax.device_get(create_train_state(
            g_vars, d_vars, g_tx, d_tx, extra=task.initial_extra()))
        path = CheckpointManager.find_ckpt(ckpt) or Path(ckpt)
        state, meta = CheckpointManager(None).restore(path, template)
        print(f"# restored {path.name} (epoch {meta.get('epoch')})")
        g_params = state.eval_g_params
        g_state = state.g_state

    azim = np.linspace(AZ_LO, AZ_HI, N_VIEWS).astype(np.float32)
    z = task.sample_z(jax.random.PRNGKey(11), N_OBJS)
    kw = {"sample_res": fam["img"]} if fam["sample_res"] else {}
    gen = jax.jit(lambda zz, vv: task.generate(
        g_params, g_state, zz, rng=jax.random.PRNGKey(3),
        view_in=vv, **kw))
    frames = []
    for az in azim:     # one dispatch per azimuth: all objects batched
        v = np.tile(np.array([np.deg2rad(az), fam["elev_rad"],
                              1.0, 0.0, 0.0, 0.0],
                             np.float32), (N_OBJS, 1))
        img = gen(z, jnp.asarray(v))[..., :3]   # pigan emits RGB+silhouette
        if fam["tanh_range"]:                   # hologan: tanh in [-1, 1]
            img = img * 0.5 + 0.5
        frames.append(np.asarray(jnp.clip(img, 0.0, 1.0), np.float32))
    return np.stack(frames, axis=1), azim   # (objs, views, H, W, 3)


def identity_consistency(sweep: np.ndarray) -> dict:
    """Foreground mean-albedo spread: one object across views vs across
    objects (albedo is pose-invariant in the dataset by construction)."""
    objs, views = sweep.shape[:2]
    means = np.zeros((objs, views, 3), np.float32)
    for i in range(objs):
        for j in range(views):
            img = sweep[i, j]
            # backgrounds are WHITE (dataset + white_bg renderer); object
            # albedos are saturated with one low channel, so foreground =
            # pixels with a clearly non-white minimum channel
            fg = img.min(-1) < 0.7
            means[i, j] = img[fg].mean(0) if fg.any() else 1.0
    intra = float(np.linalg.norm(means.std(axis=1), axis=-1).mean())
    inter = float(np.linalg.norm(means.mean(axis=1).std(axis=0)))
    # a collapsed/untrained generator (uniform gray, or no foreground at
    # all) has inter ~ 0, which would make the ratio 0/0 -> a spuriously
    # PERFECT score; report it as undefined instead
    ratio = (round(intra / inter, 4) if inter > 1e-3
             else None)
    return {"albedo_intra_view_std": round(intra, 4),
            "albedo_inter_object_std": round(inter, 4),
            "identity_ratio": ratio,
            **({} if ratio is not None else
               {"identity_note": "undefined: no inter-object albedo spread "
                                 "(collapsed or foreground-free output)"})}


def main(argv):
    as_json = "--json" in argv
    argv = [a for a in argv if a != "--json"]
    family = "pigan"
    if "--family" in argv:
        i = argv.index("--family")
        if i + 1 >= len(argv) or argv[i + 1] not in FAMILIES:
            sys.exit(f"usage: shapes_score.py [<ckpt>|--init] [--json] "
                     f"[--family {'|'.join(FAMILIES)}]")
        family = argv[i + 1]
        del argv[i:i + 2]
    fam = FAMILIES[family]
    ckpt = None if (not argv or argv[0] == "--init") else Path(argv[0])

    reg, real_mae = train_regressor(img=fam["img"])
    print(f"# azimuth regressor real-data MAE: {real_mae:.2f} deg "
          f"(90-deg span ceiling; uniform-guess baseline ~22.5)")
    sweep, azim = sweep_from_ckpt(ckpt, fam)
    flat = sweep.reshape(-1, fam["img"] * fam["img"] * 3)
    pred = reg.predict(flat).reshape(sweep.shape[:2])
    commanded = np.tile(azim, (sweep.shape[0], 1))
    # UNsupervised 3D GANs are free to learn the MIRRORED azimuth
    # convention: reflecting the camera path around the span centre
    # produces the identical training distribution, so nothing breaks the
    # symmetry. Score the best-fitting convention and report which one.
    mirrored = (AZ_LO + AZ_HI) - commanded
    mae_dir = float(np.abs(pred - commanded).mean())
    mae_mir = float(np.abs(pred - mirrored).mean())
    convention = "direct" if mae_dir <= mae_mir else "mirrored"
    r = float(np.corrcoef(commanded.ravel(), pred.ravel())[0, 1])
    out = {
        "pose_mae_deg": round(min(mae_dir, mae_mir), 2),
        "pose_convention": convention,
        "pose_abs_pearson_r": round(abs(r), 4),
        "pose_pearson_r": round(r, 4),
        "real_regressor_mae_deg": round(real_mae, 2),
        **identity_consistency(sweep),
        "family": family, "n_objects": N_OBJS, "n_views": N_VIEWS,
    }
    print(json.dumps(out) if as_json else
          "\n".join(f"{k}: {v}" for k, v in out.items()))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
