"""Preemption-safe rescue checkpointing, exercised for real: a training
subprocess gets SIGTERM mid-run (the TPU-VM preemption / SLURM kill signal),
must drain the in-flight superstep, write ckpts_rescue/ and exit 0; a resume
run must prefer the rescue over the best-FID checkpoint and finish.

Reference counterpart: submitit requeue + resume_from_checkpoint
(run_network.py:61,71), which can only recover the last epoch-end
checkpoint; the rescue additionally captures the newest mid-epoch state.
"""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

from tests.conftest import REPO_ROOT

TINY = ["+expt=dc_gan", "dataset=synthetic", "calc_fid=False",
        "save_ckpts=True", "precision=32", "train.img_size=16",
        "train.batch_size=8", "train.features_disc=8", "train.features_gen=8",
        "model.noise_dim=16", "dataset.n=64",
        "figure_details.fid_callback=False", "~figures"]


def _child_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""      # drop any sitecustomize hooks
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_cpu")
    env.pop("XLA_FLAGS", None)  # single-device child is fine and faster
    return env


def _run(args, log: Path, timeout=420):
    with log.open("w") as f:
        proc = subprocess.Popen(
            [sys.executable, str(REPO_ROOT / "run_network.py"), *args],
            cwd=REPO_ROOT, env=_child_env(), stdout=f,
            stderr=subprocess.STDOUT)
    return proc


def _wait_for(log: Path, needle: str, timeout: float, proc) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if needle in log.read_text(errors="replace"):
            return True
        if proc.poll() is not None:
            return needle in log.read_text(errors="replace")
        time.sleep(0.5)
    return False


@pytest.mark.slow
def test_sigterm_rescue_and_resume(tmp_path):
    out = tmp_path / "run"
    log = tmp_path / "train.log"
    proc = _run(TINY + ["train.num_epochs=500", f"output_root={out}",
                        "version=v0"], log)
    try:
        # let a couple of epochs (and an epoch-end checkpoint) land first
        assert _wait_for(log, "epoch 2 [", 360, proc), log.read_text()[-2000:]
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, log.read_text()[-2000:]
    assert "[rescue] checkpointed epoch" in log.read_text()

    run_dir = out / "dc_gan" / "v0"
    # the rescue lands in the RUN-STABLE experiment-level dir (shared by
    # all versions) so a requeue chain always finds the newest rescue
    rescue = list((out / "dc_gan" / "ckpts_rescue").glob("model_*"))
    assert len(rescue) == 1, rescue
    meta = json.loads((rescue[0] / "train_meta.json").read_text())
    assert meta.get("rescue") is True
    rescued_epoch = int(meta["epoch"])
    # the regular best-FID checkpoint coexists untouched
    assert list((run_dir / "ckpts").glob("model_*"))

    # ---- resume: must pick ckpts_rescue over ckpts and run to completion
    log2 = tmp_path / "resume.log"
    proc2 = _run(TINY + [f"train.num_epochs={rescued_epoch + 2}",
                         f"train.ckpt_dir={run_dir / 'ckpts'}",
                         f"output_root={tmp_path}/resumed", "version=v0"],
                 log2)
    rc2 = proc2.wait(timeout=420)
    text = log2.read_text()
    assert rc2 == 0, text[-2000:]
    assert "Resuming from" in text and "ckpts_rescue" in text, text[:2000]
    assert f"epoch {rescued_epoch + 1} [" in text  # continued past rescue
