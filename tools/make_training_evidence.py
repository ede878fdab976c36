"""Harvest the digits evidence run into docs/training_evidence/.

Builds, from a finished run directory (see docs/TRAINING_EVIDENCE.md for
the exact command):
  - loss_curves.png       d_loss / g_loss per epoch (two series)
  - fid_trajectory.png    fid_uncalibrated per val epoch (log y)
  - samples_progression.png  sample grids at selected epochs, side by side
  - interpolation.gif     final latent interpolation (copied)
  - digits IS table       from tools/digits_score.py (run separately)

Chart style follows the dataviz procedure: one axis per chart (no dual
axis), thin 2px lines, recessive grid, neutral ink for text, categorical
slots blue #2a78d6 / orange #eb6834 (a validated adjacent pair), direct
labels instead of a framed legend box where possible.

Usage:
  PYTHONPATH= python tools/make_training_evidence.py \
      /tmp/evidence_out/dc_gan/digits_run [docs/training_evidence]
"""
from __future__ import annotations

import csv
import shutil
import sys
from pathlib import Path

import numpy as np

BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED, GRID = "#1a1a19", "#6b6a63", "#e5e4dd"


def _style(ax, title, xlabel, ylabel):
    ax.set_title(title, color=INK, fontsize=12, loc="left", pad=10)
    ax.set_xlabel(xlabel, color=MUTED, fontsize=9)
    ax.set_ylabel(ylabel, color=MUTED, fontsize=9)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.7)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)


def read_metrics(run_dir: Path):
    rows = list(csv.DictReader((run_dir / "metrics.csv").open()))
    loss, fid = [], []
    for r in rows:
        if r.get("train/d_loss"):
            loss.append((int(r["step"]), float(r["train/d_loss"]),
                         float(r["train/g_loss"])))
        # calibrated runs log fid/kid; zero-egress runs fid_uncalibrated
        f = r.get("fid") or r.get("fid_uncalibrated")
        k = r.get("kid") or r.get("kid_uncalibrated") or "0"
        if f:
            fid.append((int(r["step"]), float(f), float(k)))
    return loss, fid


def plot_losses(loss, steps_per_epoch, out: Path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ep = [s / steps_per_epoch for s, _, _ in loss]
    d = [v for _, v, _ in loss]
    g = [v for _, _, v in loss]
    fig, ax = plt.subplots(figsize=(7, 3.2), dpi=150)
    ax.plot(ep, d, color=BLUE, linewidth=1.4)
    ax.plot(ep, g, color=ORANGE, linewidth=1.4)
    ax.annotate("D loss", (ep[-1], d[-1]), xytext=(6, 0),
                textcoords="offset points", color=INK, fontsize=9,
                va="center")
    ax.annotate("G loss", (ep[-1], g[-1]), xytext=(6, 0),
                textcoords="offset points", color=INK, fontsize=9,
                va="center")
    _style(ax, "Per-epoch mean losses", "epoch", "loss")
    ax.set_xlim(left=0)
    fig.tight_layout()
    fig.savefig(out, facecolor="white")
    plt.close(fig)


def plot_fid(fid, steps_per_epoch, out: Path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not fid:
        return
    ep = [s / steps_per_epoch for s, _, _ in fid]
    v = [x for _, x, _ in fid]
    fig, ax = plt.subplots(figsize=(7, 3.2), dpi=150)
    ax.plot(ep, v, color=BLUE, linewidth=1.6, marker="o", markersize=4)
    for e, y in [(ep[0], v[0]), (ep[-1], v[-1])]:
        ax.annotate(f"{y:.0f}", (e, y), xytext=(0, 8),
                    textcoords="offset points", color=INK, fontsize=9,
                    ha="center")
    ax.set_yscale("log")
    _style(ax, "fid_uncalibrated over training (log scale)",
           "epoch", "FID (uncalibrated, He-init features)")
    fig.tight_layout()
    fig.savefig(out, facecolor="white")
    plt.close(fig)


def progression(run_dir: Path, out: Path, upscale: int = 4,
                fig_name: str = "SampleGrid.png"):
    """Per-epoch figures at selected epochs, side by side, epoch-labelled."""
    from PIL import Image, ImageDraw

    fig_dir = run_dir / "figures"
    epochs = sorted(int(p.name.split("_")[1])
                    for p in fig_dir.glob("epoch_*")
                    if (p / fig_name).exists())
    if not epochs:
        return []
    if len(epochs) > 6:     # first, last, and evenly spaced between
        idx = np.linspace(0, len(epochs) - 1, 6).round().astype(int)
        epochs = [epochs[i] for i in sorted(set(idx))]
    tiles = []
    for e in epochs:
        img = Image.open(fig_dir / f"epoch_{e}" / fig_name)
        img = img.resize((img.width * upscale, img.height * upscale),
                         Image.NEAREST)
        tiles.append((e, img))
    w, h = tiles[0][1].size
    pad, label_h = 8, 22
    canvas = Image.new("RGB", (len(tiles) * (w + pad) - pad, h + label_h),
                       "white")
    draw = ImageDraw.Draw(canvas)
    for i, (e, img) in enumerate(tiles):
        x = i * (w + pad)
        canvas.paste(img, (x, label_h))
        draw.text((x + 2, 4), f"epoch {e}", fill=INK)
    canvas.save(out)
    return epochs


def main(argv):
    run_dir = Path(argv[0]) if argv else Path(
        "/tmp/evidence_out/dc_gan/digits_run")
    out_dir = Path(argv[1]) if len(argv) > 1 else \
        Path(__file__).resolve().parent.parent / "docs" / "training_evidence"
    out_dir.mkdir(parents=True, exist_ok=True)

    loss, fid = read_metrics(run_dir)
    # per-epoch logging: one loss row per epoch; step delta = steps/epoch
    spe = (loss[1][0] - loss[0][0]) if len(loss) > 1 else 1
    plot_losses(loss, spe, out_dir / "loss_curves.png")
    plot_fid(fid, spe, out_dir / "fid_trajectory.png")
    eps = progression(run_dir, out_dir / "samples_progression.png")
    # volumetric runs: azimuth-sweep progression shows pose/identity
    # factoring over training (AzimuthStep figure, rows=objects cols=views)
    az_eps = progression(run_dir, out_dir / "azimuth_progression.png",
                         upscale=2, fig_name="AzimuthStep.png")
    fig_epochs = [int(p.name.split("_")[1])
                  for p in (run_dir / "figures").glob("epoch_*")]
    last = max(fig_epochs) if fig_epochs else None
    if last is not None:
        # every animation figure the run produced (Interpolation,
        # AzimuthGif, ElevationGif, Interpolation3d, ...)
        for src in sorted((run_dir / "figures" / f"epoch_{last}").glob("*.gif")):
            shutil.copy(src, out_dir / src.name.lower())
    print(f"wrote {out_dir}: losses({len(loss)} epochs), "
          f"fid({len(fid)} points), progression epochs {eps}, "
          f"azimuth progression epochs {az_eps}, anims from epoch {last}")


if __name__ == "__main__":
    main(sys.argv[1:])
