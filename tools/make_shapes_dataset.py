"""Zero-egress 3D-consistent multi-view dataset for volumetric training
evidence.

Renders random cuboid+sphere primitives with the repo's own JAX rasterizer
(nerf/rasterize.render_mesh_lambert) from cameras drawn from pi-GAN's
training view distribution (conf/expt/pigan.yaml view_args: azimuth
220-320 deg, elevation 0 — the CelebA-like frontal span the reference
hard-codes, core/conf/expt/pigan.yaml).

Each image is ONE object instance (random extents / sphere placement /
albedo, fixed canonical world orientation) seen from ONE random azimuth.
The sphere sits on the +X face of the cuboid, so appearance changes
strongly and consistently with azimuth: a 3D-aware GAN must factor
identity (z) from pose to match this distribution. This is the volumetric
counterpart of the dc_gan digits evidence run (docs/TRAINING_EVIDENCE.md):
no dataset is mounted and the environment has no network, so the evidence
dataset is produced entirely in-repo.

Usage:
    python tools/make_shapes_dataset.py <root> [n_train] [n_val] [img_size]

Writes <root>/train/shapes/NNNNN.png and <root>/val/shapes/NNNNN.png —
loadable unchanged by the ordinary class-per-subdirectory ImageFolder
(conf/dataset/celeb_a.yaml semantics) via
``dataset=celeb_a filepaths.celeb_a_root=<root>``.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


AZIM_LOW, AZIM_HIGH = 220.0, 320.0   # pigan view_args (conf/expt/pigan.yaml)
CAM_DIST = 2.0                       # orthographic: any dist > scene radius


def uv_sphere(n_lat: int = 9, n_lon: int = 16):
    """Unit UV sphere -> (V, 3) float32 verts, (F, 3) int32 faces."""
    lats = np.linspace(0.0, np.pi, n_lat + 1)
    lons = np.linspace(0.0, 2 * np.pi, n_lon, endpoint=False)
    rows = []
    for t in lats:
        rows.append(np.stack([np.sin(t) * np.cos(lons),
                              np.cos(t) * np.ones_like(lons),
                              np.sin(t) * np.sin(lons)], axis=-1))
    verts = np.concatenate(rows, 0).astype(np.float32)   # (n_lat+1)*n_lon
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append((a, b, c))
            faces.append((b, d, c))
    return verts, np.asarray(faces, np.int32)


def cuboid():
    """Unit cuboid (half-extent 1) -> (8, 3) verts, (12, 3) faces."""
    v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                  for z in (-1, 1)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2],      # -x
        [4, 6, 7], [4, 7, 5],      # +x
        [0, 4, 5], [0, 5, 1],      # -y
        [2, 3, 7], [2, 7, 6],      # +y
        [0, 2, 6], [0, 6, 4],      # -z
        [1, 5, 7], [1, 7, 3],      # +z
    ], np.int32)
    return v, f


def build_instances(rng: np.random.Generator, n: int):
    """n random cuboid+sphere instances -> verts (n, V, 3), colors (n, 3).

    Canonical orientation: sphere attached to the cuboid's +X face. The
    whole object fits inside the orthographic NDC box (radius <= ~0.75).
    """
    sv, sf = uv_sphere()
    cv, cf = cuboid()
    faces = np.concatenate([cf, sf + len(cv)], 0)

    verts = np.empty((n, len(cv) + len(sv), 3), np.float32)
    colors = np.empty((n, 3), np.float32)
    for i in range(n):
        hx = rng.uniform(0.18, 0.38)
        hy = rng.uniform(0.18, 0.38)
        hz = rng.uniform(0.18, 0.38)
        r = rng.uniform(0.14, 0.26)
        # sphere centre on the +X face, embedded a third of r into it
        cy = rng.uniform(-0.4, 0.4) * hy
        cz = rng.uniform(-0.4, 0.4) * hz
        centre = np.array([hx + 0.66 * r, cy, cz], np.float32)
        v = np.concatenate([cv * [hx, hy, hz], sv * r + centre], 0)
        # centre the bounding box and normalise to fill the orthographic
        # NDC box with a small margin (at the 16-32px annealing
        # resolutions every pixel counts)
        lo, hi = v.min(0), v.max(0)
        v -= (lo + hi) / 2
        v *= 0.85 / np.abs(v).max()
        verts[i] = v
        # saturated random albedo (one dim low, two high)
        col = rng.uniform(0.25, 1.0, 3)
        col[rng.integers(0, 3)] *= 0.25
        colors[i] = col
    return verts, faces, colors


def main():
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/shapes_data")
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    n_val = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    img_size = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from lightning_gan_zoo_tpu.nerf.cameras import look_at_view_transform
    from lightning_gan_zoo_tpu.nerf.rasterize import render_mesh_lambert

    rng = np.random.default_rng(0)
    render = jax.jit(render_mesh_lambert,
                     static_argnames=("img_size", "face_chunk"))

    for split, n in (("train", n_train), ("val", n_val)):
        out = root / split / "shapes"
        out.mkdir(parents=True, exist_ok=True)
        done = 0
        batch = 64
        while done < n:
            k = min(batch, n - done)
            verts, faces, colors = build_instances(rng, k)
            azim = rng.uniform(AZIM_LOW, AZIM_HIGH, k).astype(np.float32)
            cams = look_at_view_transform(CAM_DIST, np.zeros(k, np.float32),
                                          azim)
            imgs = render(jnp.asarray(verts), jnp.asarray(faces), cams,
                          img_size=img_size, colors=jnp.asarray(colors))
            imgs = np.asarray(jnp.clip(imgs * 255.0 + 0.5, 0, 255),
                              np.uint8)
            for j in range(k):
                Image.fromarray(imgs[j]).save(out / f"{done + j:05d}.png")
            done += k
            print(f"{split}: {done}/{n}", flush=True)
    print(f"shapes dataset at {root} (train={n_train}, val={n_val}, "
          f"{img_size}px)")


if __name__ == "__main__":
    main()
