"""Elastic-recovery supervisor: run a training command, restart it on
crash until it succeeds or the retry budget is spent.

On this platform the TPU worker process can crash or restart mid-run
(docs/VALIDATION.md); device buffers do not survive, so in-process retry
is unsound — the lossless recovery unit is the PROCESS, resuming from
the latest checkpoint. Pair with `--auto_resume` (StyleGAN2 scripts) or
`--ckpt_step`-style resume (mimicry scripts save every 1000 steps).

The reference stack has no equivalent (its trainer only catches
KeyboardInterrupt, diagan-pkg/diagan/trainer/trainer.py:353-357); this is
TPU-native hardening for preemptible/flaky fleets.

Usage:
  python scripts/supervise.py --retries 5 --backoff 60 -- \
      python stylegan2/train_ffhq.py --size 256 ... --auto_resume
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time


def supervise(cmd, retries=5, backoff=60.0, _run=None):
    """Run cmd until exit 0. Returns (exit_code, attempts).

    _run: injection point for tests (callable returning an exit code).
    """
    run = _run or (lambda: subprocess.call(cmd))
    attempts = 0
    while True:
        attempts += 1
        code = run()
        if code == 0:
            return 0, attempts
        if attempts > retries:
            return code, attempts
        print(
            f"supervise: attempt {attempts} exited {code}; "
            f"restarting in {backoff:.0f}s ({retries - attempts + 1} "
            f"retries left)",
            flush=True,
        )
        time.sleep(backoff)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--retries", type=int, default=5)
    p.add_argument("--backoff", type=float, default=60.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given")
    code, attempts = supervise(cmd, args.retries, args.backoff)
    if code != 0:
        print(f"supervise: giving up after {attempts} attempts "
              f"(last exit {code})", flush=True)
    sys.exit(code)


if __name__ == "__main__":
    main()
