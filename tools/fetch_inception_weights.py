"""One-command FID calibration: fetch the FID-InceptionV3 weights.

Absolute FID values comparable to published numbers require the TF2015
FID-variant InceptionV3 checkpoint the reference uses
(`pt_inception-2015-12-05-6726825d.pth` — pip pytorch_fid's download, also
pinned at reference core/submodules/gan_stability/metrics/inception.py:13).
This environment has no network egress, so the download cannot run here —
on any egress-capable machine this script fetches, sha256-verifies and
installs the file into the zero-config drop-in location
(`lightning_gan_zoo_tpu.eval.inception.DEFAULT_WEIGHTS_PATH`); the next run
with `calc_fid=true` is then calibrated automatically, no config change.

Usage:
    python tools/fetch_inception_weights.py            # install to default
    python tools/fetch_inception_weights.py --out P    # custom path, then
        set val.inception_weights_path=P

Offline alternative: copy an existing pytorch_fid cache file
(~/.cache/torch/hub/checkpoints/pt_inception-2015-12-05-6726825d.pth on any
machine that ever ran pytorch_fid) into the same location.
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import tempfile
import urllib.request
from pathlib import Path

# Reference: gan_stability/metrics/inception.py:13 (same file pytorch_fid
# downloads). The "6726825d" in the name is the sha256 prefix.
FID_WEIGHTS_URL = ("https://github.com/mseitzer/pytorch-fid/releases/"
                   "download/fid_weights/pt_inception-2015-12-05-6726825d.pth")
SHA256_PREFIX = "6726825d"


def fetch(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists() and _digest_ok(out):
        print(f"already installed: {out}")
        return out
    print(f"downloading {FID_WEIGHTS_URL}")
    with tempfile.NamedTemporaryFile(dir=out.parent, delete=False) as tmp:
        tmp_path = Path(tmp.name)
    try:
        urllib.request.urlretrieve(FID_WEIGHTS_URL, tmp_path)
        if not _digest_ok(tmp_path):
            raise RuntimeError(
                f"sha256 of the download does not start with "
                f"{SHA256_PREFIX} — corrupted or wrong file")
        tmp_path.replace(out)
    except Exception:
        tmp_path.unlink(missing_ok=True)
        raise
    print(f"installed: {out}")
    return out


def _digest_ok(path: Path) -> bool:
    h = hashlib.sha256()
    with path.open("rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(SHA256_PREFIX)


def main(argv=None) -> int:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from lightning_gan_zoo_tpu.eval.inception import DEFAULT_WEIGHTS_PATH

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=Path, default=Path(DEFAULT_WEIGHTS_PATH),
                    help="destination file (default: the zero-config "
                         "drop-in location)")
    args = ap.parse_args(argv)
    try:
        out = fetch(args.out)
    except OSError as e:
        print(f"download failed ({e}) — this environment has no network "
              "egress; run this script on an egress-capable machine or copy "
              "the file in by hand (see module docstring)", file=sys.stderr)
        return 1
    if str(out) != str(DEFAULT_WEIGHTS_PATH):
        print(f"non-default location: set "
              f"val.inception_weights_path={out} on the command line")
    else:
        print("calibrated FID is now automatic (no config change needed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
