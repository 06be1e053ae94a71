"""Summarize an FFHQ soak run: steps/s from checkpoint mtimes, ada_p /
r1 / path trajectories from the training log, restart/resume events, and
the projected cost to the reference's 250k-step schedule.

Usage:
  /opt/venv/bin/python scripts/soak_report.py <exp_dir> <log_file...>
"""
import re
import sys
from pathlib import Path


def main():
    exp = Path(sys.argv[1])
    logs = [Path(p) for p in sys.argv[2:]]

    ckpts = sorted(exp.glob("checkpoint/*.pt"))
    if ckpts:
        times = [(int(p.stem), p.stat().st_mtime) for p in ckpts]
        times.sort()
        print(f"checkpoints: {times[0][0]:06d}..{times[-1][0]:06d} "
              f"({len(times)} files)")
        if len(times) > 1:
            spans = []
            for (s0, t0), (s1, t1) in zip(times, times[1:]):
                if s1 > s0 and t1 > t0:
                    spans.append((s1 - s0, t1 - t0))
            steps = sum(s for s, _ in spans)
            secs = sum(t for _, t in spans)
            if secs:
                sps = steps / secs
                print(f"steady-state: {steps} steps / {secs:.0f}s = "
                      f"{sps:.3f} steps/s ({1000 / sps:.0f} ms/step)")
                rem = 250_000
                print(f"projected 250k-step cost: {rem / sps / 3600:.1f} "
                      f"chip-hours")

    # metric keys print in dict order: d, fake_score, g, path, r1,
    # real_score, then ada_p appended (stylegan2_trainer._after_chunk)
    step_re = re.compile(
        r"step (\d+): .*?path: ([\d.eE+-]+).*?r1: ([\d.eE+-]+)"
        r".*?ada_p: ([\d.eE+-]+)")
    rows = []
    restarts = resumes = 0
    for lp in logs:
        if not lp.exists():
            continue
        for line in lp.read_text(errors="replace").splitlines():
            m = step_re.search(line)
            if m:
                rows.append(tuple(float(g) for g in m.groups()))
            if "restarting in" in line:
                restarts += 1
            if "resumed from" in line or "auto-resume" in line.lower():
                resumes += 1
    print(f"log rows: {len(rows)}; supervisor restarts: {restarts}; "
          f"resume events: {resumes}")
    if rows:
        for frac in (0, 0.25, 0.5, 0.75, 1.0):
            i = min(len(rows) - 1, int(frac * (len(rows) - 1)))
            s, path, r1, p = rows[i]
            print(f"  step {int(s):>7}: ada_p={p:.4f} r1={r1:.4f} "
                  f"path={path:.4f}")


if __name__ == "__main__":
    main()
