"""TPU-preemption handling: SIGTERM mid-training must stop the loop at a
chunk boundary, flush checkpoints + logit pickles, and leave state a new
process can resume from (SURVEY.md §5 failure-detection requirement; the
reference only handles KeyboardInterrupt, trainer.py:353-357)."""
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pathlib import Path
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.train import LogTrainer

out = Path({out!r})
ds = get_predefined_dataset("25gaussian", root=None, n_samples=512)
bundle = get_gan_model("25gaussian", loss_type="ns")
tr = LogTrainer(
    output_path=out, bundle=bundle, dataset=ds, num_steps=10**6,
    n_dis=1, batch_size=64, print_steps=50, vis_steps=10**9, log_steps=50,
    save_steps=10**6, logit_save_steps=10**9, save_logits=False, seed=0,
)
print("READY", flush=True)
tr.train()
print("FINAL_STEP", tr.global_step, flush=True)
"""


@pytest.mark.slow
def test_sigterm_saves_and_is_resumable(tmp_path):
    out = tmp_path / "exp"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize
    proc = subprocess.Popen(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO), out=str(out))],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        # wait for the training loop to actually start, then preempt
        deadline = time.time() + 300
        started = False
        for line in proc.stdout:
            if "READY" in line:
                started = True
                time.sleep(10)  # let at least one chunk land
                proc.send_signal(signal.SIGTERM)
                break
            if time.time() > deadline:
                break
        assert started, "trainer never started"
        rest = proc.communicate(timeout=300)[0]
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, rest
    # graceful path: final checkpoints were written at the interrupted step
    ckpts = list((out / "checkpoints" / "netG").glob("netG_*_steps.pth"))
    assert ckpts, rest
    step = max(int(p.stem.split("_")[1]) for p in ckpts)
    assert step > 0

    # a fresh trainer can restore from the flushed checkpoint
    sys.path.insert(0, str(REPO))
    from diagan_tpu.data import get_predefined_dataset
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train import LogTrainer

    ds = get_predefined_dataset("25gaussian", root=None, n_samples=512)
    bundle = get_gan_model("25gaussian", loss_type="ns")
    tr = LogTrainer(
        output_path=out / "resumed", bundle=bundle, dataset=ds,
        num_steps=step + 1, n_dis=1, batch_size=64, print_steps=10**9,
        vis_steps=10**9, log_steps=10**9, save_steps=10**9,
        logit_save_steps=10**9, save_logits=False, seed=0,
        netG_ckpt_file=out / "checkpoints" / "netG" / f"netG_{step}_steps.pth",
        netD_ckpt_file=out / "checkpoints" / "netD" / f"netD_{step}_steps.pth",
    )
    assert tr.global_step == step
    tr.train()
    assert tr.global_step == step + 1


SG2_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pathlib import Path
import numpy as np
from diagan_tpu.models.stylegan2 import (
    StyleGAN2Discriminator, StyleGAN2Generator,
)
from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3), np.uint8)
tr = StyleGAN2Trainer(
    Path({out!r}), StyleGAN2Generator(size=16),
    StyleGAN2Discriminator(size=16), imgs, num_steps=10**6, batch_size=2,
    log_every=1, save_every=10**6, seed=0,
)
print("READY", flush=True)
tr.train()
print("DONE", flush=True)
"""


@pytest.mark.slow
def test_stylegan2_sigterm_saves_and_is_resumable(tmp_path):
    """SIGTERM mid-run: the StyleGAN2 trainer finishes the in-flight
    chunk, flushes a checkpoint at the interrupted step, and exits
    cleanly; the checkpoint then restores into a fresh trainer.
    1-step chunks (log_every=1) because a single XLA-CPU step of the
    batch-grouped modulated-conv synthesis net runs ~20s here."""
    out = tmp_path / "sg2"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize
    proc = subprocess.Popen(
        [sys.executable, "-c",
         SG2_SCRIPT.format(repo=str(REPO), out=str(out))],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        started = False
        for line in proc.stdout:
            if "READY" in line:
                started = True
                time.sleep(3)  # handler installs at train() entry
                proc.send_signal(signal.SIGTERM)
                break
        assert started, "trainer never started"
        rest = proc.communicate(timeout=580)[0]
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, rest
    assert "SIGTERM" in rest, rest
    ckpts = sorted((out / "checkpoint").glob("*.pt"))
    assert ckpts, rest
    step = int(ckpts[-1].stem)
    assert 0 < step < 10**6

    # the flushed checkpoint restores into a fresh trainer at that step
    sys.path.insert(0, str(REPO))
    import jax
    import numpy as np
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator, StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3),
                                             np.uint8)
    tr = StyleGAN2Trainer(
        out / "resumed", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=step + 1,
        batch_size=2, log_every=1, save_every=10**6, seed=0,
    )
    assert tr.load_ckpt(ckpts[-1]) == step
    for leaf in jax.tree.leaves(tr.g_state.params) + jax.tree.leaves(
        tr.d_state.params
    ):
        assert bool(np.isfinite(np.asarray(leaf)).all())


def test_supervise_restarts_until_success():
    """Elastic-recovery supervisor: restarts a crashing command with the
    given retry budget, returns success as soon as the command does."""
    sys.path.insert(0, str(REPO))
    from scripts.supervise import supervise

    codes = iter([1, 1, 0])
    code, attempts = supervise(["x"], retries=5, backoff=0,
                               _run=lambda: next(codes))
    assert code == 0 and attempts == 3

    codes = iter([1, 1, 1])
    code, attempts = supervise(["x"], retries=2, backoff=0,
                               _run=lambda: next(codes))
    assert code == 1 and attempts == 3


@pytest.mark.slow
def test_ffhq_auto_resume_picks_latest(tmp_path):
    """--auto_resume: make_trainer resumes from the newest {iter:06d}.pt in
    the experiment dir when --ckpt is absent (process-level recovery after
    a TPU worker crash)."""
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "stylegan2"))
    import numpy as np
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator, StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer
    from train_ffhq import build_parser, make_trainer

    imgs = np.random.default_rng(0).integers(0, 255, (8, 16, 16, 3),
                                             np.uint8)
    seed_tr = StyleGAN2Trainer(
        tmp_path / "exp", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=1, batch_size=2,
        seed=0,
    )
    seed_tr._save_ckpt(3)
    seed_tr._save_ckpt(7)

    root = tmp_path / "data"
    root.mkdir()
    np.save(root / "ffhq_16.npy", imgs)
    args = build_parser().parse_args(
        ["--size", "16", "--iter", "8", "--batch", "2", "--auto_resume",
         "--work_dir", str(tmp_path), "--exp_name", "exp",
         "--root", str(root)]
    )
    trainer, start = make_trainer(args)
    assert start == 7
    args2 = build_parser().parse_args(
        ["--size", "16", "--iter", "8", "--batch", "2",
         "--work_dir", str(tmp_path), "--exp_name", "exp",
         "--root", str(root)]
    )
    _, start2 = make_trainer(args2)
    assert start2 == 0  # no flag -> no silent resume


def test_supervise_stall_watchdog():
    """The watchdog kills a child that stops producing output and the
    supervisor restarts it (a hung TPU device call never returns, so
    stdout silence is the stall signal)."""
    sys.path.insert(0, str(REPO))
    from scripts.supervise import STALL_EXIT, _run_with_watchdog, supervise

    hang = [sys.executable, "-c",
            "import time; print('up', flush=True); time.sleep(120)"]
    t0 = time.time()
    code = _run_with_watchdog(hang, stall_timeout=2)
    assert code == STALL_EXIT and time.time() - t0 < 90

    # generous stall_timeout: only the exit code is under test, and child
    # startup can take seconds on a loaded machine
    ok = [sys.executable, "-c", "print('done')"]
    code = _run_with_watchdog(ok, stall_timeout=60)
    assert code == 0

    runs = iter([STALL_EXIT, 0])
    code, attempts = supervise(["x"], retries=3, backoff=0,
                               _run=lambda: next(runs))
    assert code == 0 and attempts == 2


def test_mimicry_auto_resume_helpers(tmp_path):
    """latest_ckpt_step parses the reference checkpoint layout;
    resolve_phase2_resume prefers this experiment's own newest
    checkpoints (with its own netD_drs) over the baseline phase-1 files,
    and is a no-op without --auto_resume or without own checkpoints."""
    sys.path.insert(0, str(REPO))
    import argparse

    from diagan_tpu.cli.common import (
        latest_ckpt_step,
        phase1_ckpt_paths,
        resolve_phase2_resume,
    )

    exp = tmp_path / "exp"
    assert latest_ckpt_step(exp) is None
    for sub in ("netG", "netD", "netD_drs"):
        (exp / "checkpoints" / sub).mkdir(parents=True)
    for s in (1000, 3000, 2000):
        (exp / f"checkpoints/netG/netG_{s}_steps.pth").touch()
        (exp / f"checkpoints/netD/netD_{s}_steps.pth").touch()
    (exp / "checkpoints/netD_drs/netD_drs_3000_steps.pth").touch()
    (exp / "checkpoints/netG/junk.pth").touch()
    assert latest_ckpt_step(exp) == 3000

    base_g, base_d = phase1_ckpt_paths(tmp_path / "baseline", 40000)
    ns = argparse.Namespace(auto_resume=True)
    g, d, drs = resolve_phase2_resume(ns, exp, base_g, base_d, base_d)
    assert g.name == "netG_3000_steps.pth" and g.parent.parent.parent.parent == exp.parent
    assert d.name == "netD_3000_steps.pth"
    assert drs.name == "netD_drs_3000_steps.pth"

    ns_off = argparse.Namespace(auto_resume=False)
    g2, d2, drs2 = resolve_phase2_resume(ns_off, exp, base_g, base_d, base_d)
    assert (g2, d2, drs2) == (base_g, base_d, base_d)

    fresh = tmp_path / "fresh"
    g3, d3, drs3 = resolve_phase2_resume(ns, fresh, base_g, base_d, base_d)
    assert (g3, d3, drs3) == (base_g, base_d, base_d)
