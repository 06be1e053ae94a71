"""Elastic-recovery supervisor: run a training command, restart it on
crash OR stall until it succeeds or the retry budget is spent.

On this platform the TPU worker process can crash or restart mid-run
(docs/VALIDATION.md); device buffers do not survive, so in-process retry
is unsound — the lossless recovery unit is the PROCESS, resuming from
the latest checkpoint. Worker failures show up two ways: a crashed
client (nonzero exit) or a HUNG client stuck in a device call (no
progress forever). Both observed on hardware; the stall watchdog covers
the second: training logs every chunk, so stdout silence beyond
--stall_timeout means the device call never returned.

Pair with `--auto_resume` (StyleGAN2 scripts) or `--ckpt_step`-style
resume (mimicry scripts save every 1000 steps). The reference stack has
no equivalent (its trainer only catches KeyboardInterrupt,
diagan-pkg/diagan/trainer/trainer.py:353-357); this is TPU-native
hardening for preemptible/flaky fleets.

Usage:
  python scripts/supervise.py --retries 5 --backoff 60 \
      --stall_timeout 900 -- \
      python stylegan2/train_ffhq.py --size 256 ... --auto_resume
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time

STALL_EXIT = 125  # sentinel: child killed by the stall watchdog


def _run_with_watchdog(cmd, stall_timeout):
    """Run cmd, mirroring its output; kill it if no output for
    stall_timeout seconds. Returns the exit code (STALL_EXIT on kill)."""
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, bufsize=0
    )
    import threading

    last = [time.monotonic()]

    def pump():
        # read in small chunks so partial lines still reset the watchdog
        while True:
            data = proc.stdout.read(4096)
            if not data:
                return
            last[0] = time.monotonic()
            sys.stdout.buffer.write(data)
            sys.stdout.buffer.flush()

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    while True:
        code = proc.poll()
        if code is not None:
            t.join(timeout=5)
            return code
        if stall_timeout and time.monotonic() - last[0] > stall_timeout:
            print(
                f"supervise: no output for {stall_timeout:.0f}s — "
                "killing stalled child",
                flush=True,
            )
            proc.kill()
            proc.wait()
            t.join(timeout=5)
            return STALL_EXIT
        time.sleep(1.0)


def supervise(cmd, retries=5, backoff=60.0, stall_timeout=0, _run=None):
    """Run cmd until exit 0. Returns (exit_code, attempts).

    stall_timeout > 0 enables the no-output watchdog.
    _run: injection point for tests (callable returning an exit code).
    """
    run = _run or (lambda: _run_with_watchdog(cmd, stall_timeout))
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
    p.add_argument("--stall_timeout", type=float, default=0,
                   help="kill + restart the child if it prints nothing "
                        "for this many seconds (0 = off)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given")
    code, attempts = supervise(cmd, args.retries, args.backoff,
                               args.stall_timeout)
    if code != 0:
        print(f"supervise: giving up after {attempts} attempts "
              f"(last exit {code})", flush=True)
    sys.exit(code)


if __name__ == "__main__":
    main()
