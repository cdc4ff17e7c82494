"""Kernel perf regression gate.

Runs the benchkernels suite, records per-kernel timings to a JSON
baseline, and fails (exit 1) when any kernel regresses more than
--tolerance vs the stored baseline. Intended use:

    python tools/perf_gate.py --update     # record a new baseline
    python tools/perf_gate.py              # gate against it (CI / cron)

Timings through the axon tunnel vary +-15-20% run to run
(docs/PERF.md), so the default tolerance is 1.35x; persist baselines
only from quiet runs.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASE = os.path.join(HERE, "perf_baseline.json")


def run_benchkernels():
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "benchkernels.py"),
         "--json"], capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit("benchkernels failed")
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("no JSON line in benchkernels output")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true",
                    help="record the current timings as the baseline")
    ap.add_argument("--tolerance", type=float, default=1.35)
    args = ap.parse_args()

    cur = run_benchkernels()
    if args.update or not os.path.exists(BASE):
        with open(BASE, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"baseline written: {BASE}")
        return 0

    base = json.load(open(BASE))
    bad = []
    for k, v in sorted(cur.items()):
        b = base.get(k)
        if b is None or b <= 0:
            continue
        ratio = v / b
        flag = " <-- REGRESSION" if ratio > args.tolerance else ""
        print(f"{k:40s} {b*1000:9.2f} -> {v*1000:9.2f} ms "
              f"({ratio:5.2f}x){flag}")
        if ratio > args.tolerance:
            bad.append(k)
    if bad:
        print(f"\n{len(bad)} kernel(s) regressed beyond "
              f"{args.tolerance}x: {bad}")
        return 1
    print("\nperf gate OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
