"""Run every examples/*.py end-to-end and summarize (the round-close
examples verification in one command).

All examples are CPU-safe by default (TPU is opt-in via their
per-example env vars), so this works with the TPU tunnel down.

Usage: python scripts/run_examples.py [--timeout 1800] [--only NAME...]
Exit code: number of failed examples.
"""

import argparse
import glob
import os
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "examples", "*.py")))
    if args.only:
        files = [f for f in files
                 if any(o in os.path.basename(f) for o in args.only)]
    failures = []
    for f in files:
        name = os.path.basename(f)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, f], capture_output=True, text=True,
                timeout=args.timeout, cwd=root,
            )
            dt = time.perf_counter() - t0
            if r.returncode == 0:
                tail = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
                print(f"PASS {name:32s} {dt:7.1f}s  {tail[:80]}")
            else:
                failures.append(name)
                tail = (r.stderr.strip().splitlines() or ["?"])[-1]
                print(f"FAIL {name:32s} {dt:7.1f}s  rc={r.returncode}  "
                      f"{tail[:100]}")
        except subprocess.TimeoutExpired:
            failures.append(name)
            print(f"FAIL {name:32s} timeout after {args.timeout:.0f}s")
        sys.stdout.flush()
    print(f"\n{len(files) - len(failures)}/{len(files)} examples passed"
          + (f"; FAILED: {', '.join(failures)}" if failures else ""))
    return len(failures)


if __name__ == "__main__":
    sys.exit(main())
